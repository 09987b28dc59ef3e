package graft

import java.nio.file.Files
import scala.math.BigDecimal.RoundingMode

/** Differential fuzz for the stream-shaped window family (round-7
  * verification depth, companion to AsofFuzzSpec). These are the queries
  * whose Spark formulation is STRUCTURALLY different from their oracle —
  * `session_window` vs a gaps-and-islands rewrite, `window()` assignment
  * vs floor-epoch bucketing — so a semantic mismatch is not caught by
  * construction, only by data that hits the seams. `stream_session` is
  * also the one query that historically diverged only at sf0.1 (round 1):
  * its boundary behavior (an event at exactly prev + 30 min MERGES) was
  * pinned empirically off one lucky fixture gap. This spec constructs the
  * seams directly and checks the registered bodies against brute-force
  * references:
  *
  *   - events exactly ON 30-min window boundaries (and ±1 s around them),
  *     with sub-second parts of exactly 0 and .999999999;
  *   - same-user consecutive gaps of exactly 1800 s (the session
  *     merge-vs-split boundary);
  *   - cent-exact `value`s so the money-sum compare is bit-exact;
  *   - (round 14) a PRE-1970 era: a third of each corpus on a 1968 base,
  *     so every boundary/gap case also runs at negative epoch seconds,
  *     with the references computing the engine's exact
  *     truncate-ns→µs-then-floor-µs→s composite (see [[secOf]]).
  *
  * Covered: stream_tumbling, stream_sliding, stream_session,
  * stream_interval_join, stream_watermark_filter. (stream_dedup shares
  * its row_number formulation with its oracle — nothing structural to
  * cross-check.)
  */
class StreamWindowFuzzSpec extends SparkSpec {

  /** (event_id, ts nanos, user_id, event_type, value) */
  private type Ev = (Long, Long, Long, String, Double)

  /** ns→µs the way the loader does it: `div 1000` truncates toward zero
    * (Spark IntegralDivide) — on a pre-1970 ns within 999 ns above a µs
    * boundary this lands one µs HIGHER than a floor would, which is the
    * engine's actual value and therefore the reference's.
    */
  private def usOf(e: Ev): Long = e._2 / 1000L

  /** The engine composite (round-14, like AsofFuzzSpec): truncate ns→µs,
    * then date_trunc FLOORS µs→s. Differs from a single ns/1e9 only on
    * pre-1970 sub-second instants — e.g. 1 ns before a negative second
    * boundary truncates UP onto the boundary µs and so lands in the
    * LATER second; the reference must reproduce that, not idealize it.
    */
  private def secOf(e: Ev): Long = Math.floorDiv(usOf(e), 1000000L)

  private def genEvents(seed: Long): Seq[Ev] = {
    val rnd = new scala.util.Random(seed)
    val base = 1704067200L // 2024-01-01 UTC — a multiple of 86400 (and 1800)
    // 1968-01-01 UTC = -731 days: also a multiple of 86400 and 1800, so
    // the quarter-hour grid and boundary offsets mean the same thing in
    // the pre-1970 era (round 14: window/session/interval bucketing must
    // hold where naive modular or truncating arithmetic breaks).
    val preBase = -63158400L
    (0 until 600).map { i =>
      val user = rnd.nextInt(6).toLong
      val kind = Seq("purchase", "signup", "click", "view", "error")(rnd.nextInt(5))
      val off: Long = rnd.nextInt(10) match {
        case 0 | 1 | 2 => 900L * rnd.nextInt(96)   // quarter-hour grid: exact 1800-gaps + boundaries
        case 3 | 4     => 1800L * rnd.nextInt(48) +
                            (if (rnd.nextBoolean()) 1L else -1L) // ±1 s around a boundary
        case _         => rnd.nextInt(86400).toLong
      }
      val nanos: Long = rnd.nextInt(4) match {
        case 0 => 0L          // exactly on the second
        case 1 => 999999999L  // just under the next second
        case _ => rnd.nextInt(1000000000).toLong
      }
      val value = rnd.nextInt(100000) / 100.0 // cent-exact money
      // era by index (rnd stream untouched): a third of every structural
      // case relocates to pre-1970
      val b = if (i % 3 == 2) preBase else base
      (i.toLong, (b + off) * 1000000000L + nanos, user, kind, value)
    } ++ Seq(
      // Planted AFTER the random block (ids 600+, rnd stream untouched):
      // one signup exactly 7200 s before a purchase (the interval join's
      // lower bound) and one signup in the same second as a purchase (its
      // upper bound), so the TEETH inclusive→strict flips are visible
      // deterministically at every seed.
      (600L, (base + 86400L) * 1000000000L, 0L, "signup", 1.0),
      (601L, (base + 86400L + 7200L) * 1000000000L, 0L, "purchase", 1.0),
      (602L, (base + 4321L) * 1000000000L + 5L, 1L, "signup", 1.0),
      (603L, (base + 4321L) * 1000000000L + 999L, 1L, "purchase", 1.0))
  }

  /** Interval-join reference parameterized by its two bounds (VERDICT r08
    * #5 — automated teeth): signups in [purchase − 7200 s, purchase],
    * both ends inclusive as declared.
    */
  private def intervalRef(events: Seq[Ev], loInclusive: Boolean,
      hiInclusive: Boolean): Seq[(Long, Long, Long)] = {
    val sig = events.filter(_._4 == "signup").groupBy(_._3)
    events.filter(_._4 == "purchase").flatMap { p =>
      sig.getOrElse(p._3, Nil)
        .filter { s =>
          val lo = secOf(s) - (secOf(p) - 7200L)
          val hi = secOf(p) - secOf(s)
          (if (loInclusive) lo >= 0L else lo > 0L) &&
            (if (hiInclusive) hi >= 0L else hi > 0L)
        }
        .map(s => (p._1, p._3, s._1))
    }.sortBy(t => (t._1, t._3))
  }

  private def writeFixture(events: Seq[Ev]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-swin-fuzz-").toString
    events.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Spark's double→decimal(18,4) cast rounds half-up; replicate so the
    * money sums compare bit-exact (Exact.sumMoney2's shape).
    */
  private def money2(vs: Seq[Double]): Double =
    vs.map(BigDecimal(_).setScale(4, RoundingMode.HALF_UP)).sum
      .setScale(2, RoundingMode.HALF_UP).toDouble

  /** Per-user sessions over second-truncated times, 30-min inclusive merge
    * (gap > 1800 splits): (user_id, session_start_sec, n_events).
    */
  private def bruteSessions(events: Seq[Ev]): Seq[(Long, Long, Long)] =
    events.groupBy(_._3).toSeq.flatMap { case (u, g) =>
      val secs = g.map(secOf).sorted
      val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
      var start = secs.head
      var prev = secs.head
      var n = 0L
      for (t <- secs) {
        if (t - prev > 1800L) { out += ((u, start, n)); start = t; n = 0L }
        n += 1
        prev = t
      }
      out += ((u, start, n))
      out.toSeq
    }.sortBy(t => (t._1, t._2))

  for (seed <- Seq(11L, 271L, 9001L)) {

    test(s"stream-window fuzz corpus hits the seams (seed $seed)") {
      val events = genEvents(seed)
      // floorMod, not %: remainder carries the dividend's sign, so
      // pre-1970 boundary-adjacent events would land on ±1799 under %
      // and the counts would silently exclude the negative era.
      val onBoundary = events.count(e => Math.floorMod(usOf(e), 1800000000L) == 0L)
      assert(onBoundary >= 5, s"only $onBoundary events exactly on a 30-min boundary (µs-exact)")
      val nearBoundary = events.count(e => Math.floorMod(secOf(e), 1800L) == 1L ||
        Math.floorMod(secOf(e), 1800L) == 1799L)
      assert(nearBoundary >= 10, s"only $nearBoundary events within 1 s of a boundary")
      val gap1800 = events.groupBy(_._3).values.map { g =>
        val s = g.map(secOf).distinct.sorted
        s.zip(s.drop(1)).count { case (a, b) => b - a == 1800L }
      }.sum
      assert(gap1800 >= 3, s"only $gap1800 same-user consecutive gaps of exactly 1800 s")
      // round 14: the pre-1970 era must stay populated and adversarial in
      // its own right — boundary events and exact-1800 gaps at negative
      // epoch seconds, where truncating window math breaks first.
      val preEra = events.filter(e => secOf(e) < 0L)
      assert(preEra.size >= 150, s"pre-1970 era shrank to ${preEra.size} events")
      assert(preEra.count(e => Math.floorMod(usOf(e), 1800000000L) == 0L) >= 2,
        "no µs-exact 30-min boundary events left in the pre-1970 era")
      val preGap1800 = preEra.groupBy(_._3).values.map { g =>
        val s = g.map(secOf).distinct.sorted
        s.zip(s.drop(1)).count { case (a, b) => b - a == 1800L }
      }.sum
      assert(preGap1800 >= 1,
        "no exact-1800 s same-user gap left in the pre-1970 era")
    }

    test(s"stream_tumbling matches brute force (seed $seed)") {
      val events = genEvents(seed)
      val dir = writeFixture(events)
      val expected = events.groupBy(e =>
        (Math.floorDiv(usOf(e), 3600000000L) * 3600L, e._4)).toSeq
        .map { case ((w, t), g) => (w, t, g.size.toLong, money2(g.map(_._5))) }
        .sortBy(x => (x._1, x._2))
      val got = Registry.queries("stream_tumbling")(spark, dir).collect().map { r =>
        (r.getTimestamp(0).toInstant.getEpochSecond, r.getString(1), r.getLong(2), r.getDouble(3))
      }.toSeq
      assert(got === expected)
    }

    test(s"stream_sliding matches brute force (seed $seed)") {
      val events = genEvents(seed)
      val dir = writeFixture(events)
      val expected = events.flatMap { e =>
        val w = Math.floorDiv(usOf(e), 1800000000L) * 1800L
        Seq(w - 1800L, w) // every event lands in exactly two sliding windows
      }.groupBy(identity).toSeq.map { case (w, g) => (w, g.size.toLong) }.sortBy(_._1)
      val got = Registry.queries("stream_sliding")(spark, dir).collect().map { r =>
        (r.getTimestamp(0).toInstant.getEpochSecond, r.getLong(1))
      }.toSeq
      assert(got === expected)
    }

    test(s"stream_session matches brute force (seed $seed)") {
      val events = genEvents(seed)
      val dir = writeFixture(events)
      val expected = bruteSessions(events)
      val got = Registry.queries("stream_session")(spark, dir).collect().map { r =>
        (r.getLong(0), r.getTimestamp(1).toInstant.getEpochSecond, r.getLong(2))
      }.toSeq
      assert(got === expected)
      // the seed must actually exercise the merge boundary: at least one
      // session must span an exact-1800 gap (i.e. removing inclusivity
      // would change the answer)
      val strictSessions = events.groupBy(_._3).values.map { g =>
        val s = g.map(secOf).sorted
        1 + s.zip(s.drop(1)).count { case (a, b) => b - a >= 1800L && b != a }
      }.sum
      assert(expected.size < strictSessions,
        "no session spans an exact-1800 gap — boundary inclusivity untested at this seed")
    }

    test(s"stream_interval_join matches brute force (seed $seed)") {
      val events = genEvents(seed)
      val dir = writeFixture(events)
      val expected = intervalRef(events, loInclusive = true, hiInclusive = true)
      // TEETH: each inclusive bound made strict must change the output —
      // guaranteed by the planted exactly-7200s and same-second pairs.
      assert(expected != intervalRef(events, loInclusive = false, hiInclusive = true),
        "lower-bound inclusive→strict flip invisible — exactly-7200s pair missing")
      assert(expected != intervalRef(events, loInclusive = true, hiInclusive = false),
        "upper-bound inclusive→strict flip invisible — same-second pair missing")
      val got = Registry.queries("stream_interval_join")(spark, dir).collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }.toSeq
      assert(got === expected)
      assert(expected.nonEmpty, "no interval-join matches — generator rotted")
    }

    test(s"stream_watermark_filter matches brute force (seed $seed)") {
      val events = genEvents(seed)
      val dir = writeFixture(events)
      val maxSec = events.map(secOf).max
      val expected = events.filter(e => secOf(e) >= maxSec - 600L)
        .map(e => (e._1, e._3, e._4, secOf(e))).sortBy(_._1)
      val got = Registry.queries("stream_watermark_filter")(spark, dir).collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getTimestamp(3).toInstant.getEpochSecond)
      }.toSeq
      assert(got === expected)
    }
  }
}
