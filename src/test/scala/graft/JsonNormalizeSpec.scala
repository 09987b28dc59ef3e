package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, MapType, StringType}

/** Differential coverage for the duplicate-key map normalizer: the native
  * Catalyst expression ([[graft.functions.MapDedupKeysFirstWins]], the
  * public path) and the built-in higher-order-function twin
  * ([[graft.functions.JsonNormalize.dedupMapKeysHof]]) are two independent
  * formulations of one first-wins contract — run both over every shape a
  * 100 TB JSON ingest produces and assert entry-exact agreement, plus
  * exact expected values on the crafted cases so a bug shared by BOTH
  * formulations (the differential blind spot) still has to get past the
  * hand-computed pins. The map_concat-survival end-to-end pin on the
  * control fixture lives in DegenerateSweepSpec; this spec owns shapes.
  */
class JsonNormalizeSpec extends SparkSpec {

  import graft.functions.{JsonNormalize, MapExpressions}

  /** JSON shapes: (label, json, expected first-wins entries or None for a
    * NULL map). Covers clean, empty, dup-at-head/tail, all-dup, the
    * control set's planted shapes, a ~50-key map with interleaved dups
    * (hash-set path well past the small-size regime), and malformed.
    */
  private val jsonShapes: Seq[(String, String, Option[Seq[(String, String)]])] = Seq(
    ("clean", """{"a": "1", "b": "2", "c": "3"}""",
      Some(Seq("a" -> "1", "b" -> "2", "c" -> "3"))),
    ("empty", "{}", Some(Seq())),
    ("dup_head", """{"k": "1", "k": "2", "z": "9"}""",
      Some(Seq("k" -> "1", "z" -> "9"))),
    ("dup_tail", """{"z": "9", "k": "1", "k": "2"}""",
      Some(Seq("z" -> "9", "k" -> "1"))),
    ("all_dup", """{"k": "1", "k": "2", "k": "3", "k": "4", "k": "5"}""",
      Some(Seq("k" -> "1"))),
    ("control_extracted", """{"k": "7", "k": "8"}""", Some(Seq("k" -> "7"))),
    ("control_unextracted", """{"q": "1", "q": "2", "k": "9"}""",
      Some(Seq("q" -> "1", "k" -> "9"))),
    ("triple_dup_pairs", """{"a": "1", "b": "x", "a": "2", "c": "y", "b": "z", "a": "3"}""",
      Some(Seq("a" -> "1", "b" -> "x", "c" -> "y"))),
    ("wide_interleaved",
      (0 until 50).map(i => s""""k${i % 17}": "$i"""").mkString("{", ", ", "}"),
      Some((0 until 17).map(i => s"k$i" -> s"$i"))),
    ("malformed", """{"k": [truncated""", None),
    ("not_json", "plain text", None))

  test("native expression and HOF twin agree entry-exactly on every JSON shape, and match the hand pins") {
    import spark.implicits._
    // entry ORDER is part of the contract (first occurrence, original
    // position) — read through map_entries, NOT Row.getMap, whose scala
    // Map scrambles order past a handful of entries.
    val df = jsonShapes.map { case (label, json, _) => (label, json) }
      .toDF("label", "json")
      .withColumn("native",
        map_entries(JsonNormalize.fromJsonFirstWins(col("json"))))
      .withColumn("hof", map_entries(JsonNormalize.dedupMapKeysHof(
        from_json(col("json"), MapType(StringType, StringType)))))
    val rows = df.select("label", "native", "hof").collect()
    val expected = jsonShapes.map { case (label, _, exp) => label -> exp }.toMap
    assert(rows.length == jsonShapes.length)
    rows.foreach { r =>
      val label = r.getString(0)
      def entries(i: Int): Option[Seq[(String, String)]] =
        Option(r.getSeq[org.apache.spark.sql.Row](i))
          .map(_.map(e => e.getString(0) -> e.getString(1)))
      assert(entries(1) == entries(2),
        s"$label: native and HOF diverge — native=${entries(1)}, hof=${entries(2)}")
      assert(entries(1) == expected(label).map(_.toSeq),
        s"$label: first-wins pin violated — got ${entries(1)}, want ${expected(label)}")
    }
  }

  test("non-string atomic keys and complex VALUES dedup correctly (keys must stay atomic)") {
    import spark.implicits._
    // Constructors (map, map_from_arrays, map_concat) all enforce the
    // session dedup policy at build time, so a retained-dup NON-STRING
    // map can only come from from_json + cast: Cast maps over the entries
    // elementwise without rebuilding through the dedup builder, so the
    // dup survives into map<int,string> — exactly the shape a typed
    // ingest produces. First-wins keeps 1→a.
    val intKeyed = Seq("""{"1": "a", "2": "b", "1": "c"}""").toDF("j")
      .select(from_json(col("j"), MapType(StringType, StringType))
        .cast(MapType(IntegerType, StringType)).as("m"))
    assert(intKeyed.select(size(map_keys(col("m")))).head().getInt(0) == 3,
      "cast no longer retains the duplicate key — rebuild this fixture")
    val got = intKeyed.select(MapExpressions.dedupMapKeys(col("m"))).head()
      .getMap[Int, String](0).toSeq.sortBy(_._1)
    assert(got == Seq(1 -> "a", 2 -> "b"), s"int-key first-wins violated: $got")

    // array-typed VALUES ride along untouched (only keys must be atomic)
    val arrVals = Seq("""{"k": [1, 2], "k": [3, 4]}""").toDF("j")
      .select(from_json(col("j"),
        MapType(StringType, org.apache.spark.sql.types.ArrayType(IntegerType))).as("m"))
    val gotArr = arrVals.select(MapExpressions.dedupMapKeys(col("m"))).head()
      .getMap[String, Seq[Int]](0).toSeq
    assert(gotArr == Seq("k" -> Seq(1, 2)), s"complex-value first-wins violated: $gotArr")

    // non-atomic KEY type: loud analysis-time rejection, not a silent
    // identity-based dedup (struct/array keys lack value equality)
    val structKeyed = Seq(1).toDF("x").select(
      map(struct(lit(1).as("a")), lit("v")).as("m"))
    val e = intercept[Exception] {
      structKeyed.select(MapExpressions.dedupMapKeys(col("m"))).collect()
    }
    assert(e.getMessage.contains("atomic non-binary key type"),
      s"expected the atomic-key type check to fire, got: $e")
  }

  test("seeded-random maps: native, HOF, and a driver-side reference agree three ways") {
    // Third independent formulation (house fuzz style, cf. MinhashFuzzSpec):
    // a sequential Scala first-wins walk over the generated entry list.
    // 200 seeded-random maps, keys drawn from a 6-letter alphabet so
    // duplicates are dense (P(dup) ≈ 1 for len ≥ 8), lengths 0..12 so the
    // empty map and the n=1 short-circuit both occur, run through ONE
    // Spark pass.
    import spark.implicits._
    val rnd = new scala.util.Random(4242L)
    val cases: Seq[(Int, Seq[(String, String)])] = (0 until 200).map { i =>
      val len = rnd.nextInt(13)
      i -> Seq.fill(len)(
        (s"k${('a' + rnd.nextInt(6)).toChar}", s"v${rnd.nextInt(1000)}"))
    }
    def refFirstWins(es: Seq[(String, String)]): Seq[(String, String)] = {
      val out = scala.collection.mutable.LinkedHashMap[String, String]()
      es.foreach { case (k, v) => if (!out.contains(k)) out(k) = v }
      out.toSeq
    }
    val jsons = cases.map { case (i, es) =>
      (i, es.map { case (k, v) => s""""$k": "$v"""" }.mkString("{", ", ", "}"))
    }
    val got = jsons.toDF("i", "json")
      .withColumn("native",
        map_entries(JsonNormalize.fromJsonFirstWins(col("json"))))
      .withColumn("hof", map_entries(JsonNormalize.dedupMapKeysHof(
        from_json(col("json"), MapType(StringType, StringType)))))
      .select("i", "native", "hof").collect()
      .map(r => r.getInt(0) ->
        (r.getSeq[org.apache.spark.sql.Row](1).map(e => e.getString(0) -> e.getString(1)),
          r.getSeq[org.apache.spark.sql.Row](2).map(e => e.getString(0) -> e.getString(1))))
      .toMap
    cases.foreach { case (i, es) =>
      val want = refFirstWins(es)
      val (native, hof) = got(i)
      assert(native == want,
        s"case $i: native diverged from the driver reference — entries=$es, got=$native, want=$want")
      assert(hof == want,
        s"case $i: HOF diverged from the driver reference — entries=$es, got=$hof, want=$want")
    }
  }

  test("Java-vs-SQL key equality seams: binary keys rejected, -0.0/0.0 double keys are ONE key") {
    import spark.implicits._
    // BinaryType keys: Array[Byte] equals is identity-based, so a hash-set
    // dedup would be silently vacuous — must be rejected at analysis time
    // like the struct-key case (review r15).
    val binKeyed = Seq(1).toDF("x").select(
      map(lit(Array[Byte](1, 2)), lit("v")).as("m"))
    val e = intercept[Exception] {
      binKeyed.select(MapExpressions.dedupMapKeys(col("m"))).collect()
    }
    assert(e.getMessage.contains("non-binary"),
      s"expected the binary-key rejection to fire, got: $e")

    // Floating-point negative zero: ONE key under SQL map semantics
    // (Spark's own map builder normalizes -0.0), but distinct under boxed
    // Java equals — the canonKey seam. Build the retained-dup shape via
    // from_json + cast, prove Spark agrees it's a dup (raw map_concat
    // throws), then dedup and prove first-wins + map_concat survival.
    val dz = Seq("""{"0.0": "pos", "-0.0": "neg"}""").toDF("j")
      .select(from_json(col("j"), MapType(StringType, StringType))
        .cast(MapType(DoubleType, StringType)).as("m"))
    assert(dz.select(size(map_keys(col("m")))).head().getInt(0) == 2,
      "cast no longer retains the -0.0/0.0 pair — rebuild this fixture")
    val raw = intercept[Exception] {
      dz.select(map_concat(col("m"), map(lit(9.9), lit("x")))).collect()
    }
    assert(raw.toString.contains("DUPLICATED_MAP_KEY"),
      s"Spark no longer treats -0.0/0.0 as one map key — drop canonKey: $raw")
    val got = dz.select(map_entries(MapExpressions.dedupMapKeys(col("m"))))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getDouble(0) -> r.getString(1))
    assert(got == Seq(0.0 -> "pos"), s"-0.0/0.0 first-wins violated: $got")
    assert(dz.select(map_concat(MapExpressions.dedupMapKeys(col("m")),
      map(lit(9.9), lit("x")))).head().getMap[Double, String](0).size == 2)
  }

  test("clean maps pass through the native fast path value-identical at fixture scale") {
    // Drive the native expression over the real sf0.001 events props
    // column (no planted dups there): result must equal the raw parse on
    // every row — the zero-copy fast path must never alter a clean map.
    val ev = Tables.events(spark, sf0001)
      .withColumn("raw", from_json(col("props"), MapType(StringType, StringType)))
      .withColumn("norm", graft.functions.JsonNormalize.fromJsonFirstWins(col("props")))
    val diff = ev.filter(
      (col("raw").isNotNull || col("norm").isNotNull) &&
        (col("raw").isNull || col("norm").isNull ||
          to_json(col("raw")) =!= to_json(col("norm")))).count()
    assert(diff == 0, s"fast path altered $diff clean rows")
  }

  test("graft_dedup_map_keys is callable from SQL via GraftExtensions.install") {
    graft.functions.GraftExtensions.install(spark)
    val r = spark.sql(
      """SELECT graft_dedup_map_keys(
        |         from_json('{"k": 7, "k": 8}', 'map<string,string>')) AS m""".stripMargin)
      .head().getMap[String, String](0)
    assert(r.toSeq == Seq("k" -> "7"), s"SQL path first-wins violated: $r")
    // and the normalized map survives map_concat from SQL too
    val c = spark.sql(
      """SELECT map_concat(
        |         graft_dedup_map_keys(
        |           from_json('{"k": 7, "k": 8}', 'map<string,string>')),
        |         map('tag', 'x')) AS m""".stripMargin)
      .head().getMap[String, String](0)
    assert(c.toSeq.sortBy(_._1) == Seq("k" -> "7", "tag" -> "x"))
  }
}
