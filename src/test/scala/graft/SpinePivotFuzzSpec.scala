package graft

import java.nio.file.Files
import java.sql.Timestamp

/** Differential fuzz for the spine/pivot recipes (round-8 depth):
  * `ts_reindex_spine`, `reshape_resample_monthly`, `reshape_pivot`,
  * `reshape_pivot_multi`, `ts_seasonality_dow`, `ts_impute_mean`.
  *
  *  - the monthly SPINE lists every month between min and max including
  *    zero-activity gap months (across a year boundary), while the plain
  *    resample omits them — the contrast is the contract;
  *  - pivot cells for absent (priority, status) pairs coalesce to 0 /
  *    0.0, not NULL, and the multi-agg pivot keeps count and money sum
  *    aligned per status;
  *  - dayofweek is pinned to the Sunday=1..Saturday=7 convention on
  *    KNOWN calendar days (DuckDB's native dayofweek is Sunday=0 — the
  *    oracle's +1 shim is exactly what this pins);
  *  - ts_impute_mean fills masked rows with the user's survivor mean,
  *    and an ALL-masked user imputes NULL (null numerator short-circuits
  *    the 0-count division) rather than crashing.
  */
class SpinePivotFuzzSpec extends SparkSpec {

  private def roundN(v: Double, n: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(10, java.math.RoundingMode.HALF_UP)
      .setScale(n, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  private def ts(dt: String) = Timestamp.valueOf(s"$dt 00:00:00")

  test("ts_reindex_spine fills year-crossing gap months with 0; " +
    "reshape_resample_monthly omits them") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-spine-fuzz-").toString
    // Orders only in 2023-11 and 2024-02 → gap months 2023-12, 2024-01.
    Seq((1L, "2023-11-05", 10.0), (2L, "2023-11-20", 20.0), (3L, "2024-02-29", 30.0))
      .map { case (k, dt, p) => (k, ts(dt), p) }
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.parquet(s"$d/orders.parquet")

    val gotSpine = Registry.queries("ts_reindex_spine")(spark, d).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
    assert(gotSpine === Seq(("2023-11-01", 2L), ("2023-12-01", 0L),
      ("2024-01-01", 0L), ("2024-02-01", 1L)))

    val gotResample = Registry.queries("reshape_resample_monthly")(spark, d).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2))).toSeq
    assert(gotResample === Seq(("2023-11-01", 2L, 30.0), ("2024-02-01", 1L, 30.0)),
      "the plain resample must OMIT gap months — that contrast is the spine's contract")
  }

  test("reshape_pivot / reshape_pivot_multi: absent cells coalesce to 0/0.0") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-pivot-fuzz-").toString
    // hi: F and O only (no P). lo: P only (no F/O).
    val rows = Seq(
      ("hi", "F", 10.50), ("hi", "F", 20.25), ("hi", "O", 5.00),
      ("lo", "P", 7.75), ("lo", "P", 2.25))
    rows.zipWithIndex.map { case ((pr, st, p), i) =>
      (i.toLong, pr, st, ts("2024-03-04"), p) }
      .toDF("o_orderkey", "o_orderpriority", "o_orderstatus", "o_orderdate", "o_totalprice")
      .write.parquet(s"$d/orders.parquet")

    def cnt(pr: String, st: String) =
      rows.count(r => r._1 == pr && r._2 == st).toLong
    def money(pr: String, st: String) = {
      val vs = rows.filter(r => r._1 == pr && r._2 == st).map(_._3)
      if (vs.isEmpty) 0.0d
      else vs.map(v => BigDecimal(java.math.BigDecimal.valueOf(v))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val gotP = Registry.queries("reshape_pivot")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(gotP === Seq(("hi", 2L, 1L, 0L), ("lo", 0L, 0L, 2L)),
      "absent pivot cells must be 0, not NULL")

    val gotM = Registry.queries("reshape_pivot_multi")(spark, d).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4),
        r.getLong(5), r.getDouble(6))
    }.toSeq
    val expM = Seq("hi", "lo").map(pr =>
      (pr, cnt(pr, "F"), money(pr, "F"), cnt(pr, "O"), money(pr, "O"),
        cnt(pr, "P"), money(pr, "P")))
    assert(gotM === expM)
  }

  test("ts_seasonality_dow: Sunday=1 .. Saturday=7 on known calendar days") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-dow-fuzz-").toString
    // 2024-03-03 is a Sunday, 03-04 Monday, 03-09 Saturday.
    val rows = Seq(("2024-03-03", "sun"), ("2024-03-04", "mon"), ("2024-03-09", "sat"))
    rows.zipWithIndex.map { case ((dt, et), i) =>
      (i.toLong, ts(dt).getTime * 1000000L, et, 10.0) }
      .toDF("event_id", "ts", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = Registry.queries("ts_seasonality_dow")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("mon", 2L), ("sat", 7L), ("sun", 1L)),
      "dayofweek must be the Sunday=1 convention on both engines")
  }

  test("ts_impute_mean: survivor-mean fill; an all-masked user imputes NULL " +
    "without crashing") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-impute-fuzz-").toString
    val base = 1704067200L * 1000000000L
    // u1: survivors 100.0 (the exact boundary) and 150.5 → mean 125.25
    // fills the masked 40.0 row. u2: every value below 100 → all masked,
    // user mean NULL, imputed stays NULL (and must not DIVIDE_BY_ZERO).
    val rows = Seq(
      (1L, 1L, 100.0), (2L, 1L, 150.5), (3L, 1L, 40.0),
      (4L, 2L, 10.0), (5L, 2L, 99.99))
    rows.map { case (id, u, v) => (id, base + id * 1000000000L, u, v) }
      .toDF("event_id", "ts", "user_id", "value")
      .write.parquet(s"$d/events.parquet")
    val got = Registry.queries("ts_impute_mean")(spark, d).collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    }.toSeq
    val mean1 = roundN((BigDecimal("100.0000") + BigDecimal("150.5000")).toDouble / 2, 4)
    assert(got === Seq(
      (1L, 1L, Some(100.0), Some(100.0)),
      (1L, 2L, Some(150.5), Some(150.5)),
      (1L, 3L, None, Some(mean1)),
      (2L, 4L, None, None),
      (2L, 5L, None, None)))
  }
}
