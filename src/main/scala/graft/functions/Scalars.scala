package graft.functions

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, MapType, StringType}

/** SURVEY §2 B.8 scalar function families + the custom scalar UDF.
  *
  * Everything except `udf_scalar` uses codegen'd built-ins
  * (`org.apache.spark.sql.functions._`) so the whole projection stays inside
  * WholeStageCodegen. Derived int outputs are cast to long to match DuckDB's
  * BIGINT results (year(), length(), size() are 32-bit in Spark).
  */
object Scalars {

  /** LCG hash `(x*1103515245 + 12345) mod 2^31` — pure 64-bit integer
    * arithmetic on non-negative keys, so it is bit-portable to any SQL
    * dialect (SURVEY B.8 `udf_scalar`).
    */
  val lcg: Long => Long = x => (x * 1103515245L + 12345L) % 2147483648L

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "fn_string",
      (s, d) =>
        Tables.part(s, d)
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("un"),
            lower(col("p_brand")).as("lb"),
            substring(col("p_name"), 1, 5).as("s5"),
            trim(concat(lit("  "), col("p_name"), lit("  "))).as("tr"),
            concat(col("p_brand"), lit("#"), col("p_type")).as("cc"),
            lpad(col("p_brand"), 12, "*").as("lp"),
            regexp_replace(col("p_name"), lit(" "), lit("_")).as("rp"),
            length(col("p_name")).cast("long").as("len"),
            regexp_extract(col("p_type"), "[A-Za-z]+", 0).as("rx"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  UPPER(p_name) AS un, LOWER(p_brand) AS lb,
             |  SUBSTRING(p_name, 1, 5) AS s5,
             |  TRIM('  ' || p_name || '  ') AS tr,
             |  p_brand || '#' || p_type AS cc,
             |  LPAD(p_brand, 12, '*') AS lp,
             |  REPLACE(p_name, ' ', '_') AS rp,
             |  LENGTH(p_name) AS len,
             |  REGEXP_EXTRACT(p_type, '[A-Za-z]+', 0) AS rx
             |FROM part ORDER BY p_partkey""".stripMargin)),

    QueryDef(
      "fn_date",
      (s, d) =>
        Tables.orders(s, d)
          .withColumn("od", col("o_orderdate").cast("date"))
          .select(
            col("o_orderkey"), col("od"),
            year(col("od")).cast("long").as("y"),
            month(col("od")).cast("long").as("m"),
            dayofmonth(col("od")).cast("long").as("dd"),
            date_trunc("month", col("od")).cast("date").as("month_start"),
            date_add(col("od"), 30).as("plus30"),
            datediff(col("od"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
            last_day(col("od")).as("month_end"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
             |  CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS y,
             |  CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS m,
             |  CAST(day(CAST(o_orderdate AS DATE)) AS BIGINT) AS dd,
             |  CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
             |  CAST(o_orderdate AS DATE) + 30 AS plus30,
             |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
             |  last_day(CAST(o_orderdate AS DATE)) AS month_end
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    QueryDef(
      "fn_math",
      (s, d) =>
        Tables.lineitem(s, d)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            Exact.roundN(abs(col("l_quantity") - 25d), 4).as("a"),
            ceil(col("l_extendedprice")).as("c"),
            floor(col("l_extendedprice")).as("f"),
            // sqrt/ln guards (round-9 degenerate parity sweep): Spark's
            // sqrt(<0) is NaN and log(<=0) is NULL, while DuckDB SQRT/LN
            // THROW there — define both as NULL on both engines
            Exact.roundN(when(col("l_quantity") >= 0d, sqrt(col("l_quantity"))), 4).as("sq"),
            Exact.roundN(log(col("l_extendedprice")), 4).as("lg"),
            Exact.roundN(exp(col("l_discount")), 4).as("ex"),
            Exact.roundN(pow(col("l_quantity"), 2d), 4).as("pw"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some(s"""SELECT l_orderkey, l_linenumber,
              |  ${Exact.roundNSql("ABS(l_quantity - 25)", 4)} AS a,
              |  CAST(CEIL(l_extendedprice) AS BIGINT) AS c,
              |  CAST(FLOOR(l_extendedprice) AS BIGINT) AS f,
              |  ${Exact.roundNSql("CASE WHEN l_quantity >= 0 THEN SQRT(l_quantity) END", 4)} AS sq,
              |  ${Exact.roundNSql("CASE WHEN l_extendedprice > 0 THEN LN(l_extendedprice) END", 4)} AS lg,
              |  ${Exact.roundNSql("EXP(l_discount)", 4)} AS ex,
              |  ${Exact.roundNSql("POW(l_quantity, 2)", 4)} AS pw
              |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    QueryDef(
      "fn_case_cast",
      (s, d) =>
        Tables.orders(s, d)
          .select(
            col("o_orderkey"),
            when(col("o_totalprice") < 50000d, "low")
              .when(col("o_totalprice") < 150000d, "mid")
              .otherwise("high").as("band"),
            col("o_orderkey").cast("string").as("key_str"),
            col("o_custkey").cast("string").cast("long").as("key_roundtrip"),
            floor(col("o_totalprice") / 1000d).cast("long").as("price_k"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_totalprice < 50000 THEN 'low'
             |       WHEN o_totalprice < 150000 THEN 'mid'
             |       ELSE 'high' END AS band,
             |  CAST(o_orderkey AS VARCHAR) AS key_str,
             |  CAST(CAST(o_custkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
             |  CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_k
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // split/sort_array/slice are the operators under test; array outputs are
    // flattened with array_join because the driver's pandas hash compare
    // cannot process array-typed columns (round-1 FAIL(harness)).
    QueryDef(
      "fn_array",
      (s, d) =>
        Tables.documents(s, d)
          .withColumn("toks", split(col("text"), " "))
          .select(
            col("doc_id"),
            size(col("toks")).cast("long").as("n_toks"),
            array_contains(col("toks"), "spark").as("has_spark"),
            array_join(sort_array(col("toks")), ",").as("sorted_toks"),
            array_join(slice(col("toks"), 1, 3), ",").as("first3"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  len(string_split(text, ' ')) AS n_toks,
             |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
             |  array_to_string(list_sort(string_split(text, ' ')), ',') AS sorted_toks,
             |  array_to_string(string_split(text, ' ')[1:3], ',') AS first3
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Real MapType plumbing on the Spark side; the oracle avoids a JSON
    // extension dependency by regexp-extracting the single int field of
    // props (`{"k": <int>}`, FIXTURES.md).
    QueryDef(
      "fn_map",
      (s, d) =>
        Tables.events(s, d)
          // map<string,STRING>, not map<string,int>: from_json with a typed
          // int map NULLs the ENTIRE map when ANY value fails the type
          // ({"k": 7, "s": "café"} lost k — round-10 unicode parity set).
          // Real-world props are heterogeneous; parse permissively, then
          // cast only the field being extracted.
          .withColumn("m", from_json(col("props"), MapType(StringType, StringType)))
          .select(
            col("event_id"),
            // try_element_at: ANSI element_at throws on a map missing the
            // key — one malformed props row would kill the job; NULL is
            // the bad-row posture (round-8 sweep). try_cast: a non-numeric
            // k yields NULL, matching the oracle's digits-only regex.
            expr("try_cast(try_element_at(m, 'k') AS BIGINT)").as("k"))
          .orderBy("event_id"),
      // oracle extracts the "k" field specifically and NULLIF-guards the
      // cast: a digit-free or k-less props row must yield NULL (matching
      // try_element_at), not a CAST('') error or a stray digit from
      // another field (round-9 ADVICE fix).
      // EQUIVALENCE DOMAIN (round-14 control set): the regex oracle and
      // the Spark JSON parser agree on props that are well-formed OR
      // malformed-without-a-'"k": <digits>' substring (parser NULL,
      // regex no-match — both NULL; the control set plants two such
      // rows). A malformed row that still CONTAINS the k pattern
      // diverges by construction — the parser's NULL is the safe side
      // at 100 TB (no value invented from broken bytes); DuckDB's own
      // json_extract THROWS on malformed input, so a parser-faithful
      // oracle needs a json_valid() CASE guard if that shape ever needs
      // oracle coverage.
      // DUPLICATE KEYS (round-14 probe): on {"k": 1, "k": 2} every LIVE
      // reader agrees on the FIRST occurrence — from_json yields a map
      // that physically RETAINS both entries (map_keys = [k,k]) and
      // try_element_at scans to the first; get_json_object (fn_json),
      // DuckDB's json_extract, and this regex oracle are first-wins too
      // (the control set plants differing-value dups to prove the chain
      // end-to-end). Two caveats for new code: json_tuple is LAST-wins —
      // don't introduce it on dup-capable data — and the retained-dup
      // map is poison downstream (map_concat throws DUPLICATED_MAP_KEY;
      // set ops reject map columns outright), so at 100 TB normalize dup
      // keys at INGEST rather than letting such maps flow past the
      // extraction site — [[graft.functions.JsonNormalize.fromJsonFirstWins]]
      // is the shipped normalizer (round 15), proven map_concat-safe with
      // chain-matching first-wins values in DegenerateSweepSpec.
      Some("""SELECT event_id,
             |  CAST(NULLIF(regexp_extract(props, '"k"\s*:\s*(-?[0-9]+)', 1), '') AS BIGINT) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    QueryDef(
      "fn_json",
      (s, d) =>
        Tables.events(s, d)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy(col("event_type"))
          .agg(
            sum(col("k")).as("sum_k"),
            count(lit(1)).as("n"),
            Exact.roundN(sum(col("k")).cast("double") / count(lit(1)), 4).as("avg_k"))
          .orderBy("event_type"),
      Some(s"""SELECT event_type, CAST(SUM(k) AS BIGINT) AS sum_k, COUNT(*) AS n,
              |  ${Exact.roundNSql("CAST(SUM(k) AS DOUBLE) / COUNT(*)", 4)} AS avg_k
              |FROM (SELECT event_type,
              |        CAST(NULLIF(regexp_extract(props, '"k"\\s*:\\s*(-?[0-9]+)', 1), '') AS BIGINT) AS k
              |      FROM events) t
              |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QueryDef(
      "fn_explode",
      (s, d) =>
        Tables.documents(s, d)
          .select(posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
          .groupBy(col("word"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("word"))
          .limit(20),
      Some("""SELECT word, COUNT(*) AS cnt
             |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
             |GROUP BY word ORDER BY cnt DESC, word LIMIT 20""".stripMargin)),

    // printf-style formatting — same %-directives in both engines.
    //
    // KNOWN ENGINE-DEFINED DIVERGENCE (extremes sweep, round 11): for
    // doubles past 2^53, Java's Formatter %f renders the SHORTEST decimal
    // representation (1e30 → "1000…000.00") while C printf renders the
    // exact binary expansion ("…019884624838656.00"). Both are faithful
    // decimal renderings of the same double; no DuckDB builtin reproduces
    // Java's choice. Registered as the extremes set's expected failure
    // (DegenTables.extremesExpectedDivergences); the driver fixtures'
    // money-scale doubles are exactly representable, where both agree.
    QueryDef(
      "fn_format",
      (s, d) =>
        Tables.part(s, d)
          .select(
            col("p_partkey"),
            // NULL-in → NULL-out, like DuckDB's printf: Spark's
            // format_string instead renders NULL args as text ("null" /
            // a truncated pad) — round-9 degenerate parity sweep
            when(col("p_brand").isNotNull,
              format_string("%s-%07d", col("p_brand"), col("p_partkey"))).as("sku"),
            when(col("p_retailprice").isNotNull,
              format_string("%08.2f", col("p_retailprice"))).as("price_pad"),
            concat_ws("/", col("p_brand"), col("p_type")).as("path"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  printf('%s-%07d', p_brand, p_partkey) AS sku,
             |  printf('%08.2f', p_retailprice) AS price_pad,
             |  concat_ws('/', p_brand, p_type) AS path
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Trig/inverse-trig at 4dp — glibc and JDK libm agree well inside
    // [-1e3, 1e3] and the decimal re-round (Exact.roundN) absorbs the
    // final-ulp cases; verified by preflight at both gate SFs.
    QueryDef(
      "fn_trig",
      (s, d) =>
        Tables.lineitem(s, d)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            Exact.roundN(sin(col("l_discount")), 4).as("sin_d"),
            Exact.roundN(cos(col("l_discount")), 4).as("cos_d"),
            Exact.roundN(atan2(col("l_quantity"), lit(10.0d)), 4).as("at2"),
            Exact.roundN(degrees(col("l_discount")), 4).as("deg"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some(s"""SELECT l_orderkey, l_linenumber,
              |  ${Exact.roundNSql("SIN(l_discount)", 4)} AS sin_d,
              |  ${Exact.roundNSql("COS(l_discount)", 4)} AS cos_d,
              |  ${Exact.roundNSql("ATAN2(l_quantity, 10.0)", 4)} AS at2,
              |  ${Exact.roundNSql("DEGREES(l_discount)", 4)} AS deg
              |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Conditional/null scalar family: least/greatest, nvl-style coalesce
    // chains, nullif round-trip — 3-valued logic edge coverage.
    QueryDef(
      "fn_conditional",
      (s, d) =>
        Tables.lineitem(s, d)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            least(col("l_quantity"), col("l_discount") * 100d).as("least_v"),
            greatest(col("l_quantity"), col("l_discount") * 100d).as("greatest_v"),
            coalesce(nullif(col("l_tax"), lit(0.0d)), col("l_discount"), lit(-1d)).as("first_nonzero"),
            (col("l_quantity") <=> col("l_discount")).as("nullsafe_eq"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  LEAST(l_quantity, l_discount * 100) AS least_v,
             |  GREATEST(l_quantity, l_discount * 100) AS greatest_v,
             |  COALESCE(NULLIF(l_tax, 0.0), l_discount, -1) AS first_nonzero,
             |  l_quantity IS NOT DISTINCT FROM l_discount AS nullsafe_eq
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Bitwise family on keys — pure integer ops, bit-identical anywhere.
    QueryDef(
      "fn_bitwise",
      (s, d) =>
        Tables.customer(s, d)
          .select(
            col("c_custkey"),
            col("c_custkey").bitwiseAND(lit(255L)).as("low_byte"),
            col("c_custkey").bitwiseOR(lit(16L)).as("or16"),
            col("c_custkey").bitwiseXOR(lit(21L)).as("xor21"),
            shiftleft(col("c_custkey"), 3).as("shl3"),
            shiftright(col("c_custkey"), 2).as("shr2"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |  c_custkey & 255 AS low_byte,
             |  c_custkey | 16 AS or16,
             |  xor(c_custkey, 21) AS xor21,
             |  c_custkey << 3 AS shl3,
             |  c_custkey >> 2 AS shr2
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // Higher-order array functions — transform / filter / aggregate
    // (the lambda trio) over token lists, all integer arithmetic.
    QueryDef(
      "fn_higher_order",
      (s, d) =>
        Tables.documents(s, d)
          .withColumn("lens", transform(split(col("text"), " "), t => length(t).cast("long")))
          .select(
            col("doc_id"),
            size(filter(col("lens"), l => l > 4)).cast("long").as("n_long_toks"),
            aggregate(col("lens"), lit(0L), (acc, l) => acc + l).as("sum_len"),
            aggregate(col("lens"), lit(0L), (acc, l) => greatest(acc, l)).as("max_len"))
          .orderBy("doc_id"),
      // CAST: DuckDB list_aggregate sum/max over BIGINT lists returns
      // HUGEINT/INT128 — cast back to BIGINT to match Spark's dtype.
      Some("""SELECT doc_id,
             |  len(list_filter(lens, l -> l > 4)) AS n_long_toks,
             |  CAST(list_aggregate(lens, 'sum') AS BIGINT) AS sum_len,
             |  CAST(list_aggregate(lens, 'max') AS BIGINT) AS max_len
             |FROM (SELECT doc_id,
             |        list_transform(string_split(text, ' '), t -> CAST(length(t) AS BIGINT)) AS lens
             |      FROM documents) t
             |ORDER BY doc_id""".stripMargin)),

    // Z-order (Morton) interleave key over two dimensions — the
    // space-filling-curve layout primitive behind multi-dimension data
    // clustering (files sorted by z cluster BOTH p_size and brand ranges,
    // so either predicate prunes). Pure integer bit arithmetic, generated
    // identically for both engines.
    QueryDef(
      "fn_zorder_key",
      (s, d) => {
        // z = Σ_b ((size>>b & 1) << 2b) | ((brand>>b & 1) << 2b+1), b<8
        val zExprSql = (0 until 8).map { b =>
          s"(((p_size >> $b) & 1) << ${2 * b}) + (((bnum >> $b) & 1) << ${2 * b + 1})"
        }.mkString(" + ")
        Tables.part(s, d)
          // nullif: same no-match '' → ANSI cast kill as fn_regexp
          // (round-8 DegenerateSweepSpec); a NULL bnum nulls the key
          .withColumn("bnum",
            nullif(regexp_extract(col("p_brand"), "#([0-9]+)", 1), lit("")).cast("long"))
          .withColumn("z", expr(zExprSql).cast("long"))
          .select("p_partkey", "p_size", "bnum", "z")
          .orderBy("z", "p_partkey")
      },
      Some {
        val zExprSql = (0 until 8).map { b =>
          s"(((p_size >> $b) & 1) << ${2 * b}) + (((bnum >> $b) & 1) << ${2 * b + 1})"
        }.mkString(" + ")
        s"""SELECT p_partkey, p_size, bnum, CAST($zExprSql AS BIGINT) AS z
           |FROM (SELECT p_partkey, p_size,
           |        CAST(NULLIF(regexp_extract(p_brand, '#([0-9]+)', 1), '') AS BIGINT) AS bnum
           |      FROM part) t
           |ORDER BY z, p_partkey""".stripMargin
      }),

    // Base64 encode + round-trip — the binary-payload transport encoding
    // (how opaque media columns travel through JSON/text systems).
    QueryDef(
      "fn_base64",
      (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            // Spark's base64 MIME-wraps at 76 chars (\r\n); strip to the
            // canonical unwrapped form DuckDB emits.
            regexp_replace(base64(col("text").cast("binary")), "[\\r\\n]", "").as("b64"),
            (unbase64(base64(col("text").cast("binary"))).cast("string") === col("text"))
              .as("roundtrip_ok"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, to_base64(encode(text)) AS b64,
             |  decode(from_base64(to_base64(encode(text)))) = text AS roundtrip_ok
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Edit-distance fuzzy matching (record-linkage / dirty-data cleanup):
    // Levenshtein distance against a probe string, plus a normalized
    // similarity in exact integer-ratio arithmetic rounded 4dp.
    QueryDef(
      // KNOWN ENGINE-DEFINED DIVERGENCE (unicode inputs only): Spark's
      // levenshtein counts CODE POINTS while DuckDB's counts BYTES of the
      // UTF-8 encoding ('pièce détachée' vs 'small widget': Spark 13,
      // DuckDB 16 — one per two-byte accent). No DuckDB builtin computes
      // code-point edit distance, so the gap is irreconcilable in oracle
      // SQL; the driver fixtures are ASCII (units coincide) and the
      // round-10 unicode parity set carries fn_levenshtein as a
      // documented expected divergence (tools/degen_preflight.sh).
      "fn_levenshtein",
      (s, d) =>
        Tables.part(s, d)
          .select(
            col("p_partkey"), col("p_name"),
            levenshtein(col("p_name"), lit("small widget")).cast("long").as("lev"),
            Exact.roundN(
              lit(1.0d) - levenshtein(col("p_name"), lit("small widget")).cast("double") /
                greatest(length(col("p_name")), lit(12)).cast("double"), 4).as("sim"))
          .orderBy("p_partkey"),
      Some(s"""SELECT p_partkey, p_name,
              |  CAST(levenshtein(p_name, 'small widget') AS BIGINT) AS lev,
              |  ${Exact.roundNSql(
                 "1.0 - CAST(levenshtein(p_name, 'small widget') AS DOUBLE) " +
                   "/ CAST(greatest(length(p_name), 12) AS DOUBLE)", 4)} AS sim
              |FROM part ORDER BY p_partkey""".stripMargin)),

    // Cryptographic digests — the content-addressing primitives a dedup
    // pipeline keys on. Both engines emit lowercase hex for md5/sha256.
    QueryDef(
      "fn_hash",
      (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            md5(col("text").cast("binary")).as("md5_hex"),
            sha2(col("text").cast("binary"), 256).as("sha256_hex"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Regexp family: extract-with-group, replace-all, and match-test. The
    // patterns stick to char classes + anchors so Java regex and DuckDB's
    // RE2 agree (same constraint as fn_string / text_token_count).
    // The end anchor is `\z` (end-of-TEXT), not `$` (round 19, VERDICT
    // r18 #4): Java's `$` also matches BEFORE a final line terminator
    // while RE2's matches only at end-of-text, so a p_name of
    // "…widget\n" made is_widget diverge (Spark true, DuckDB false) —
    // the control degenerate set's one documented divergence for four
    // rounds. Both engines support `\z` with NO terminator exception
    // (probed: Java and RE2 both reject the trailing-LF name), so the
    // anchors now agree on ANY input and the control set runs clean;
    // DegenerateSweepSpec pins the trailing-LF behavior on the Spark
    // side so a pattern edit back to `$` goes red.
    QueryDef(
      "fn_regexp",
      (s, d) =>
        Tables.part(s, d)
          .select(
            col("p_partkey"),
            // nullif(…, ""): a brand without '#' extracts '' and the ANSI
            // string→long cast kills the job (DuckDB's CAST('') errors
            // identically) — no-match means NULL on both engines
            // (round-8 DegenerateSweepSpec)
            nullif(regexp_extract(col("p_brand"), "#([0-9]+)", 1), lit(""))
              .cast("long").as("brand_num"),
            regexp_replace(col("p_name"), " ", "_").as("name_snake"),
            col("p_name").rlike("widget\\z").as("is_widget"),
            regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  CAST(NULLIF(regexp_extract(p_brand, '#([0-9]+)', 1), '') AS BIGINT) AS brand_num,
             |  regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
             |  regexp_matches(p_name, 'widget\z') AS is_widget,
             |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Epoch extraction at exact integer grains (the serialization boundary
    // for timestamps leaving the engine): millis and micros since epoch
    // (both floor-truncating identically), plus second-of-day.
    QueryDef(
      "fn_epoch_ms",
      (s, d) =>
        Tables.events(s, d)
          .select(col("event_id"),
            expr("unix_millis(ts)").as("ems"),
            expr("unix_micros(ts)").as("eus"),
            (hour(col("ts")) * 3600 + minute(col("ts")) * 60 + second(col("ts")))
              .cast("long").as("second_of_day"))
          .orderBy("event_id"),
      Some("""SELECT event_id, epoch_ms(ts) AS ems, epoch_us(ts) AS eus,
             |  CAST(hour(ts) * 3600 + minute(ts) * 60 + CAST(FLOOR(second(ts)) AS INT) AS BIGINT) AS second_of_day
             |FROM events ORDER BY event_id""".stripMargin)),

    // Interval-overlap arithmetic: days each order's 30-day window overlaps
    // a fixed campaign window — greatest(0, min(ends) − max(starts)), the
    // exposure-measurement primitive; summed per priority in exact ints.
    QueryDef(
      "fn_interval_overlap",
      (s, d) => {
        val od = col("o_orderdate").cast("date")
        val overlap = greatest(lit(0),
          datediff(
            least(date_add(od, 30), lit("1996-07-15").cast("date")),
            greatest(od, lit("1996-06-01").cast("date"))))
        Tables.orders(s, d)
          .groupBy(col("o_orderpriority"))
          .agg(
            sum(overlap).cast("long").as("exposure_days"),
            sum(when(overlap > 0, 1).otherwise(0)).cast("long").as("n_exposed"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |  CAST(SUM(GREATEST(0, date_diff('day',
             |    GREATEST(CAST(o_orderdate AS DATE), DATE '1996-06-01'),
             |    LEAST(CAST(o_orderdate AS DATE) + 30, DATE '1996-07-15')))) AS BIGINT) AS exposure_days,
             |  CAST(SUM(CASE WHEN GREATEST(0, date_diff('day',
             |    GREATEST(CAST(o_orderdate AS DATE), DATE '1996-06-01'),
             |    LEAST(CAST(o_orderdate AS DATE) + 30, DATE '1996-07-15'))) > 0
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_exposed
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ANSI-safe arithmetic (try_divide / try_add): errors become NULL
    // instead of job failures — the data-quality posture a 100 TB pipeline
    // needs (one bad row must not kill a 6-hour job). The divisor uses
    // floor() so both engines derive the same integer (CAST double→int
    // truncates in Spark but rounds in DuckDB); the try_add probe pushes a
    // near-Long.Max literal over the edge on a deterministic stripe.
    QueryDef(
      "fn_try_arith",
      (s, d) =>
        Tables.events(s, d)
          .withColumn("k", (floor(col("value")).cast("long") % 7).cast("long"))
          .select(col("event_id"),
            expr("try_divide(value, k)").as("try_div"),
            expr("try_add(9223372036854775800L, CASE WHEN k > 5 THEN event_id ELSE 0 END)")
              .as("try_sum"))
          .orderBy("event_id"),
      // Spark's floor(DOUBLE) returns BIGINT and SATURATES out-of-range
      // inputs (JVM Double.toLong: ±1e30 → Long.Max/MinValue — a function
      // contract, not an ANSI cast, so no throw); DuckDB's FLOOR stays
      // DOUBLE and a plain CAST throws at ±1e30 (extremes sweep, round
      // 11). The oracle replicates the saturation explicitly: saturate
      // iff floor(value) ≥ 2^63 (the first double past Long.MaxValue) or
      // < -2^63, both exactly representable as doubles.
      Some("""SELECT event_id,
             |  CASE WHEN k = 0 THEN NULL ELSE value / k END AS try_div,
             |  CASE WHEN k > 5 AND event_id > 7 THEN NULL
             |       ELSE 9223372036854775800 + (CASE WHEN k > 5 THEN event_id ELSE 0 END)
             |  END AS try_sum
             |FROM (SELECT event_id, value,
             |        (CASE WHEN FLOOR(value) >= 9223372036854775808.0 THEN 9223372036854775807
             |              WHEN FLOOR(value) < -9223372036854775808.0 THEN -9223372036854775808
             |              ELSE CAST(FLOOR(value) AS BIGINT) END) % 7 AS k
             |      FROM events) t
             |ORDER BY event_id""".stripMargin)),

    // parse_url over a synthesized deterministic URL column (the fixture
    // has no URL field); the oracle re-derives host/path with anchored
    // regexes — same semantics for well-formed http(s) URLs.
    QueryDef(
      "fn_url_parse",
      (s, d) =>
        Tables.documents(s, d)
          .withColumn("url", concat(lit("https://"), col("source"),
            lit(".example.com/"), col("lang"), lit("/doc/"),
            col("doc_id").cast("string")))
          .select(col("doc_id"), col("url"),
            expr("parse_url(url, 'HOST')").as("host"),
            expr("parse_url(url, 'PATH')").as("path"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  'https://' || source || '.example.com/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) AS url,
             |  regexp_extract('https://' || source || '.example.com/' || lang || '/doc/' || CAST(doc_id AS VARCHAR),
             |    '^[a-z]+://([^/]+)', 1) AS host,
             |  regexp_extract('https://' || source || '.example.com/' || lang || '/doc/' || CAST(doc_id AS VARCHAR),
             |    '^[a-z]+://[^/]+(/.*)$', 1) AS path
             |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef(
      "udf_scalar",
      (s, d) => {
        val lcgUdf = udf(lcg)
        Tables.customer(s, d)
          .select(col("c_custkey"), lcgUdf(col("c_custkey")).as("lcg_hash"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             |  (c_custkey * 1103515245 + 12345) % 2147483648 AS lcg_hash
             |FROM customer ORDER BY c_custkey""".stripMargin))
  )
}
