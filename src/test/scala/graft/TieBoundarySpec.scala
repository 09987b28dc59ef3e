package graft

import java.nio.file.Files

/** Remaining small boundary pins (round-8 depth): `agg_minmax_by`,
  * `ts_interarrival`, `agg_having`.
  *
  *  - max_by/min_by order by struct(acctbal, custkey): an acctbal tie
  *    resolves by custkey INSIDE the comparison — the clause that keeps
  *    the aggregate deterministic where plain max_by is engine-defined;
  *  - ts_interarrival drops single-event users entirely (no gaps → no
  *    group), duplicate timestamps yield 0-second gaps ordered by
  *    event_id, and the gap median interpolates at (n−1)·p;
  *  - agg_having's count cut is STRICT > 5 — a group with exactly 5
  *    members is excluded.
  */
class TieBoundarySpec extends SparkSpec {

  test("agg_minmax_by: acctbal ties resolve by custkey inside the struct") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-minmax-fuzz-").toString
    // Nation 1: richest tie at 100.0 between custkeys 5 and 9 → struct
    // ordering takes custkey 9 for max, and the poorest tie at 1.0
    // between 2 and 7 takes custkey 2 for min.
    Seq((2L, "poorA", 1.0, 1L), (7L, "poorB", 1.0, 1L),
      (5L, "richA", 100.0, 1L), (9L, "richB", 100.0, 1L),
      (11L, "solo", 42.0, 2L))
      .toDF("c_custkey", "c_name", "c_acctbal", "c_nationkey")
      .write.parquet(s"$d/customer.parquet")
    val got = Registry.queries("agg_minmax_by")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got === Seq((1L, "richB", "poorA"), (2L, "solo", "solo")),
      "ties must resolve by custkey inside the struct comparison")
  }

  test("ts_interarrival: single-event users drop; duplicate timestamps " +
    "yield zero gaps; the median interpolates") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-gap-fuzz-").toString
    val base = 1704067200L
    // u1: gaps 10, 0 (duplicate ts), 30 → median of (0,10,30) = 10,
    // mean 40/3. u2: single event → absent from output.
    val rows = Seq(
      (1L, base + 0L, 1L), (2L, base + 10L, 1L), (3L, base + 10L, 1L),
      (4L, base + 40L, 1L),
      (5L, base + 100L, 2L))
    rows.map { case (id, s, u) => (id, s * 1000000000L, u) }
      .toDF("event_id", "ts", "user_id")
      .write.parquet(s"$d/events.parquet")
    def roundN(v: Double, n: Int): Double =
      java.math.BigDecimal.valueOf(v)
        .setScale(10, java.math.RoundingMode.HALF_UP)
        .setScale(n, java.math.RoundingMode.HALF_UP).doubleValue()
    val got = Registry.queries("ts_interarrival")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got === Seq((1L, 3L, roundN(40.0 / 3, 2), 10.0)),
      "u2 (no gaps) must be absent; the duplicate-ts gap is 0")
  }

  test("agg_having: a group at exactly the cut is excluded (strict > 5)") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-having-fuzz-").toString
    val rows = (1 to 5).map(i => (i.toLong, "n", 1.0, 10L)) ++ // exactly 5 → out
      (6 to 11).map(i => (i.toLong, "n", 1.0, 20L)) // 6 → in
    rows.toDF("c_custkey", "c_name", "c_acctbal", "c_nationkey")
      .write.parquet(s"$d/customer.parquet")
    val got = Registry.queries("agg_having")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((20L, 6L)), "the exactly-5 group must be excluded")
  }
}
