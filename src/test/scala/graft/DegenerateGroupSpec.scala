package graft

import java.nio.file.Files

/** Degenerate-group posture of the statistical closed forms (round-8
  * ANSI-hazard sweep). Spark 4 runs with ANSI mode ON by default, where
  * ANY division by zero — including doubles — throws DIVIDE_BY_ZERO and
  * kills the job. Every closed form whose denominator vanishes on a
  * degenerate group (single-row for sample variance, zero variance for
  * correlation-shaped forms, zero sums for shares/weights) is now
  * nullif-guarded on the Spark side; DuckDB's division by zero is
  * already NULL, so the guard also RESTORES cross-engine parity on
  * degenerate inputs (the oracles needed no change). One bad group must
  * yield a NULL statistic, never a dead 6-hour job.
  *
  * Each test drives the registered query body over a fixture with one
  * degenerate and one healthy group and asserts null-vs-value per row.
  */
class DegenerateGroupSpec extends SparkSpec {

  private def dir(): String =
    Files.createTempDirectory("graft-degen-").toString

  private def nullAt(r: org.apache.spark.sql.Row, i: Int): Boolean = r.isNullAt(i)

  test("agg_stats / agg_skew: single-row and zero-variance segments null " +
    "out their sample statistics") {
    import spark.implicits._
    val d = dir()
    (Seq((1L, "one", 10.0)) ++ (2 to 6).map(i => (i.toLong, "flat", 42.0)) ++
      (7 to 12).map(i => (i.toLong, "vary", i * 1.5)))
      .toDF("c_custkey", "c_mktsegment", "c_acctbal")
      .write.parquet(s"$d/customer.parquet")

    val stats = Registry.queries("agg_stats")(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(nullAt(stats("one"), 4) && nullAt(stats("one"), 5),
      "n=1 variance/stddev must be NULL, not a crash")
    assert(stats("flat").getDouble(4) == 0.0d && stats("flat").getDouble(5) == 0.0d)
    assert(!nullAt(stats("vary"), 4) && stats("vary").getDouble(4) > 0.0d)

    val skew = Registry.queries("agg_skew")(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(nullAt(skew("flat"), 2) && nullAt(skew("flat"), 3),
      "zero-variance skew/kurtosis must be NULL, not a crash")
    assert(nullAt(skew("one"), 2), "n=1 skew must be NULL")
    assert(!nullAt(skew("vary"), 2))
  }

  test("win_zscore / win_share_of_group / agg_gini: single-row, all-equal " +
    "and all-zero groups null out") {
    import spark.implicits._
    val d = dir()
    (Seq((1L, "one", 10.0)) ++ (2 to 5).map(i => (i.toLong, "flat", 7.0)) ++
      (6 to 9).map(i => (i.toLong, "zero", 0.0)) ++
      (10 to 15).map(i => (i.toLong, "vary", i * 2.25)))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.parquet(s"$d/orders.parquet")

    val z = Registry.queries("win_zscore")(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(nullAt(z(1L), 3), "single-row group z-score must be NULL")
    assert(nullAt(z(3L), 3), "zero-variance group z-score must be NULL")
    assert(!nullAt(z(12L), 3))

    val share = Registry.queries("win_share_of_group")(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(nullAt(share(7L), 3), "all-zero group share must be NULL")
    assert(!nullAt(share(11L), 3))

    val gini = Registry.queries("agg_gini")(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(nullAt(gini("zero"), 1), "all-zero group gini must be NULL")
    assert(gini("flat").getDouble(1) == 0.0d && gini("one").getDouble(1) == 0.0d)
  }

  test("agg_corr / agg_spearman / agg_regression / agg_weighted_avg: " +
    "constant or zero-weight sides null out") {
    import spark.implicits._
    val d = dir()
    // Flag C: constant quantity (zero x-variance), zero quantity too →
    // also a zero weight sum. Flag V: healthy variation.
    ((1 to 5).map(i => ("C", 0.0, 0.01 * i, 100.0 + i)) ++
      (1 to 8).map(i => ("V", i * 1.0, 0.02 + 0.01 * (i % 3), 50.0 * i)))
      .toDF("l_returnflag", "l_quantity", "l_discount", "l_extendedprice")
      .write.parquet(s"$d/lineitem.parquet")

    val corr = Registry.queries("agg_corr")(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(nullAt(corr("C"), 1), "constant-x correlation must be NULL")
    assert(!nullAt(corr("V"), 1))

    val sp = Registry.queries("agg_spearman")(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(nullAt(sp("C"), 1), "all-tied-rank spearman must be NULL")

    val reg = Registry.queries("agg_regression")(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(nullAt(reg("C"), 1) && nullAt(reg("C"), 2) && nullAt(reg("C"), 3),
      "constant-x slope/intercept/r2 must be NULL")
    assert(!nullAt(reg("V"), 1))

    val wavg = Registry.queries("agg_weighted_avg")(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(nullAt(wavg("C"), 1), "zero-weight-sum weighted avg must be NULL")
    assert(!nullAt(wavg("V"), 1))
  }

  test("text_repetition_score: 1- and 2-token docs survive (padded gram " +
    "positions are NULL-skipped, not an array-index crash)") {
    import spark.implicits._
    val d = dir()
    Seq((0L, "solo", "en", "s0"), (1L, "two words", "en", "s0"),
      (2L, "a b c a b c a b c", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d/documents.parquet")
    val rep = Registry.queries("text_repetition_score")(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    // 1 token: one gram "solo" → no repetition. 2 tokens: one gram
    // "two words" (the padded tail positions are skipped by concat_ws).
    assert(rep(0L).getLong(1) == 1L && rep(0L).getLong(2) == 1L)
    assert(rep(1L).getLong(1) == 1L && rep(1L).getLong(2) == 1L)
    assert(rep(2L).getDouble(3) > 0.0d, "repeated trigrams must score > 0")
  }

  test("fn_map: a props row without the key yields NULL, not a crash; " +
    "sim_quantize_int8 survives a short vector") {
    import spark.implicits._
    val d = dir()
    val base = 1704067200L * 1000000000L
    Seq((1L, """{"k": 7}"""), (2L, """{"other": 3}"""), (3L, """not json"""))
      .zipWithIndex.map { case ((id, p), i) => (id, base + i * 1000000000L, p) }
      .toDF("event_id", "ts", "props")
      .write.parquet(s"$d/events.parquet")
    val m = Registry.queries("fn_map")(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getLong(1) == 7L)
    assert(nullAt(m(2L), 1), "missing map key must be NULL, not a crash")
    assert(nullAt(m(3L), 1), "malformed JSON must be NULL")

    val d2 = dir()
    Seq((1L, Seq.fill(64)(0.5f).updated(0, 0.0f), 1),
      (2L, Seq(0.0f, 1.0f, 0.5f), 1)) // malformed: 3 dims instead of 64
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d2/embeddings.parquet")
    val q = Registry.queries("sim_quantize_int8")(spark, d2).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(nullAt(q(2L), 2), "q_last of a short vector must be NULL, not a crash")
    assert(q(2L).getLong(3) == 383L, "checksum still sums the present dims")
  }

  test("round-9 NULL contracts: ntile's NULL bucket, all-NULL listagg, " +
    "printf NULL passthrough, NULL-smallest min_by, sqrt of negatives") {
    import spark.implicits._
    val d = dir()
    // Two NULL-balance customers (their names NULL too) alongside five
    // healthy ones; a separate all-NULL-names segment for the listagg pin.
    (Seq((1L, Some("a"), 0, Some(10.0), "SEG"), (2L, Some("b"), 0, Some(20.0), "SEG"),
      (3L, Some("c"), 0, Some(30.0), "SEG"), (4L, Some("d"), 1, Some(40.0), "SEG"),
      (5L, Some("e"), 1, Some(50.0), "SEG"),
      (6L, None: Option[String], 1, None: Option[Double], "NULLSEG"),
      (7L, None: Option[String], 1, None: Option[Double], "NULLSEG")))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$d/customer.parquet")

    // NULL balances must SURVIVE the range-bucket equi-join (dedicated -1
    // bucket) and rank first, matching Spark's NULL-smallest sort:
    // positions 0-1 of 7 rows → quartile 1 under SQL NTILE(4).
    val nt = Registry.queries("win_ntile")(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(nt.size == 7, "NULL-balance rows must not vanish in the bucket join")
    assert(nt(6L).getLong(2) == 1L && nt(7L).getLong(2) == 1L,
      "NULL balances must occupy the first quartile (NULL-smallest)")
    assert(nt(1L).getLong(2) == 2L && nt(5L).getLong(2) == 4L)

    // listagg of an all-NULL group is NULL (the standard), never ''.
    val sc = Registry.queries("agg_string_concat")(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(nullAt(sc("NULLSEG"), 1), "all-NULL listagg group must be NULL, not ''")
    assert(sc("SEG").getString(1) == "a,b,c,d,e")

    // min_by/max_by order structs with NULL SMALLEST: the NULL-balance
    // customer (lower custkey tie-break) is the group's "poorest", whose
    // name is itself NULL here; the NULL group must not vanish.
    val mm = Registry.queries("agg_minmax_by")(spark, d).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(mm(1).getString(1) == "e", "max_by must skip past NULL-smallest structs")
    assert(nullAt(mm(1), 2), "min_by lands on the NULL-balance customer (name NULL)")

    // printf-style formatting: NULL in → NULL out on both engines
    // (format_string would happily render the text \"null\").
    val d2 = dir()
    Seq((1L, Some("B1"), Some("T1"), Some(5.5)),
      (2L, None: Option[String], None: Option[String], None: Option[Double]))
      .toDF("p_partkey", "p_brand", "p_type", "p_retailprice")
      .write.parquet(s"$d2/part.parquet")
    val fm = Registry.queries("fn_format")(spark, d2).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(fm(1L).getString(1) == "B1-0000001" && fm(1L).getString(2) == "00005.50")
    assert(nullAt(fm(2L), 1) && nullAt(fm(2L), 2),
      "NULL printf args must yield NULL, not rendered text")
    assert(fm(2L).getString(3) == "", "concat_ws skips NULLs on both engines")

    // sqrt of a negative value is NULL on both engines (Spark would give
    // NaN, DuckDB would throw — the guard defines it away).
    val d3 = dir()
    Seq((1L, 1, -4.0, 100.0, 0.05), (2L, 1, 9.0, 100.0, 0.05))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
      .write.parquet(s"$d3/lineitem.parquet")
    val fmath = Registry.queries("fn_math")(spark, d3).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(nullAt(fmath(1L), 5), "sqrt(-4) must be NULL, not NaN")
    assert(fmath(2L).getDouble(5) == 3.0d)
  }

  test("ts_autocorr: a constant series nulls out, a varying one does not") {
    import spark.implicits._
    val d = dir()
    val base = 1704067200L * 1000000000L
    ((1 to 6).map(i => (i.toLong, base + i * 1000000000L, 1L, 5.0)) ++
      (7 to 14).map(i => (i.toLong, base + i * 1000000000L, 2L, i * 1.25)))
      .toDF("event_id", "ts", "user_id", "value")
      .write.parquet(s"$d/events.parquet")
    val ac = Registry.queries("ts_autocorr")(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(nullAt(ac(1L), 1), "constant-series autocorrelation must be NULL")
    assert(!nullAt(ac(2L), 1))
  }
}
