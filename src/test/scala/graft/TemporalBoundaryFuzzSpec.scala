package graft

import java.nio.file.Files
import java.sql.Timestamp

/** Differential fuzz for the two temporal-boundary recipes (round-8
  * depth): `join_scd2_lookup` and `win_rolling_7d`.
  *
  *  - SCD2 validity is the half-open interval `[valid_from, valid_to)`:
  *    an order dated EXACTLY on the 1996-01-01 version flip must land in
  *    version 2 only, one dated exactly on 1992-01-01 in version 1, one
  *    before 1992 matches nothing (the inner join drops it), and one on
  *    the 9999-12-31 sentinel is OUTSIDE version 2 (exclusive upper
  *    bound). A `<=`/`>` flip on either bound moves planted orders
  *    between versions.
  *  - win_rolling_7d's RANGE frame [-6, 0] over epoch_day includes ALL
  *    peer rows of the current day — including rows that come later in
  *    the (day, orderkey) total order — unlike a ROWS frame; and the
  *    trailing window must include a row exactly 6 days back but exclude
  *    one exactly 7 days back.
  *
  * Both references are plain per-row scans with the queries' decimal
  * rounding replicated bit-exactly; compares are `===`.
  */
class TemporalBoundaryFuzzSpec extends SparkSpec {

  private def ts(d: String): Timestamp = Timestamp.valueOf(s"$d 00:00:00")

  test("join_scd2_lookup: half-open validity boundaries route orders to " +
    "the exact version") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-scd2-fuzz-").toString
    // Two nations so the rate (nationkey-derived) differs per group.
    Seq((1L, "ALPHA"), (2L, "BETA"))
      .toDF("n_nationkey", "n_name").write.parquet(s"$dir/nation.parquet")
    Seq((10L, 1L), (11L, 1L), (20L, 2L))
      .toDF("c_custkey", "c_nationkey").write.parquet(s"$dir/customer.parquet")
    // Orders planted on every boundary: before v1 (dropped), the exact v1
    // start, inside v1, the last v1 day, the EXACT flip day (v2 only),
    // inside v2, and the exclusive 9999-12-31 sentinel (dropped).
    val orders = Seq(
      (100L, 10L, "1991-12-31", 100.0), // before v1 → no match
      (101L, 10L, "1992-01-01", 110.0), // v1 inclusive start
      (102L, 11L, "1994-06-15", 120.0), // v1 interior
      (103L, 20L, "1995-12-31", 130.0), // v1 last valid day
      (104L, 10L, "1996-01-01", 140.0), // flip day → v2 ONLY
      (105L, 20L, "2001-03-03", 150.0), // v2 interior
      (106L, 11L, "9999-12-31", 160.0)) // sentinel → exclusive → no match
    orders.map { case (ok, ck, dt, p) => (ok, ck, ts(dt), p) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")

    val nationOf = Map(10L -> (1L, "ALPHA"), 11L -> (1L, "ALPHA"), 20L -> (2L, "BETA"))
    def rate(nk: Long, version: Int): Double =
      if (version == 1) nk * 0.01d else nk * 0.01d + 0.005d
    val routed = orders.flatMap { case (_, ck, dt, p) =>
      val v = if (dt >= "1992-01-01" && dt < "1996-01-01") Some(1)
        else if (dt >= "1996-01-01" && dt < "9999-12-31") Some(2)
        else None
      v.map { ver => val (nk, nn) = nationOf(ck); (nn, ver, p * rate(nk, ver)) }
    }
    assert(routed.size == orders.size - 2, "exactly the two boundary-out orders drop")
    val expected = routed.groupBy { case (nn, ver, _) => (nn, ver) }.toSeq
      .map { case ((nn, ver), g) =>
        val sum8 = g.map { case (_, _, t) =>
          BigDecimal(java.math.BigDecimal.valueOf(t))
            .setScale(8, BigDecimal.RoundingMode.HALF_UP) }.sum
        (nn, ver, g.size.toLong,
          sum8.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy { case (nn, ver, _, _) => (nn, ver) }
    val got = Registry.queries("join_scd2_lookup")(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
  }

  test("win_rolling_7d: range frame includes ALL same-day peers and spans " +
    "exactly 6 trailing days") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-roll7-fuzz-").toString
    // Customer 1: three orders on the SAME day (peers — each must count
    // all three, including the later orderkeys), then one exactly 6 days
    // later (all three peers still in frame) and one exactly 7 days after
    // the peers (they fall out). Customer 2: random spacing incl. a 0-gap.
    val rnd = new scala.util.Random(89L)
    val c1 = Seq(
      (1L, 1000L, "2024-03-01", 10.01), (1L, 1001L, "2024-03-01", 20.02),
      (1L, 1002L, "2024-03-01", 30.03), (1L, 1003L, "2024-03-07", 40.04),
      (1L, 1004L, "2024-03-08", 50.05))
    val c2 = {
      var day = java.time.LocalDate.parse("2024-01-01")
      (0 until 25).map { i =>
        if (i > 0) day = day.plusDays(Seq(0L, 1L, 3L, 6L, 7L, 8L)(rnd.nextInt(6)))
        (2L, 2000L + i, day.toString, (rnd.nextInt(10000) + 1) / 100.0)
      }
    }
    val all = c1 ++ c2
    all.map { case (ck, ok, dt, p) => (ck, ok, ts(dt), p) }
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")

    def epochDay(dt: String): Long = java.time.LocalDate.parse(dt).toEpochDay
    assert(c2.groupBy(_._3).exists(_._2.size > 1), "no same-day peers in the random walk")
    val expected = all.groupBy(_._1).toSeq.flatMap { case (ck, g) =>
      g.map { case (_, ok, dt, _) =>
        val d = epochDay(dt)
        val frame = g.filter { case (_, _, dt2, _) =>
          val d2 = epochDay(dt2); d2 >= d - 6 && d2 <= d }
        val sum4 = frame.map { case (_, _, _, p) =>
          BigDecimal(java.math.BigDecimal.valueOf(p))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP) }.sum
        (ck, ok, d, frame.size.toLong,
          sum4.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.sortBy { case (ck, ok, d, _, _) => (ck, d, ok) }
    // Seam companions: the 6-day reach holds the peers, the 7-day one drops them.
    val m = expected.map(e => e._2 -> e).toMap
    assert(m(1000L)._4 == 3L && m(1002L)._4 == 3L,
      "same-day peers must all see each other (range-frame peer semantics)")
    assert(m(1003L)._4 == 4L, "exactly-6-days-back rows must stay in frame")
    assert(m(1004L)._4 == 2L, "exactly-7-days-back rows must leave the frame")
    val got = Registry.queries("win_rolling_7d")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got === expected)
  }
}
