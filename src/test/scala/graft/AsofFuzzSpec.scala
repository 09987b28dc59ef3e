package graft

import java.nio.file.Files

/** Differential fuzz for the as-of join family (round-7 verification
  * depth). The bucketed-merge rewrite (VERDICT r05 #3) is the most
  * intricate plan in the repo — strict-vs-inclusive bounds, the
  * purchase/signup sort-order trick at equal truncated seconds, the
  * epoch-day bucket carry, and three different tie-breaks all have to
  * line up. The fixture oracles exercise whatever ties the generated
  * data happens to contain; this spec CONSTRUCTS the adversarial cases
  * and checks the registered query bodies (not re-implementations)
  * against a brute-force all-pairs reference with the declared
  * semantics:
  *
  *   - join_asof:          latest signup strictly before, ties →
  *                         (latest sec, largest id);
  *   - join_asof_forward:  earliest signup at-or-after, ties →
  *                         (earliest sec, smallest id);
  *   - join_asof_nearest:  min (|diff|, signup sec, signup id).
  *
  * Generated stress, per seed: equal-second purchase/signup ties (the
  * strict/inclusive boundary), timestamps exactly ON epoch-day bucket
  * boundaries and ±1 s around them (the local-vs-carry seam), a hot
  * user (bounded-work path), a purchase-only user (inner-join drop), a
  * signup-only user, sub-second nanos (truncation), and 'click' noise
  * rows that must be filtered out. Brute force is O(p·s) on ~600 rows —
  * exactly the formulation the bucketed merge exists to avoid at scale,
  * which is what makes it an independent reference here.
  */
class AsofFuzzSpec extends SparkSpec {

  /** (event_id, ts nanos, user_id, event_type) */
  private type Ev = (Long, Long, Long, String)

  /** The reference second is the ENGINE's composite, written out: the
    * loader truncates nanos→µs with `div 1000` (toward zero — Spark
    * IntegralDivide), then date_trunc('second') FLOORS µs→s. For
    * positive instants this equals plain ns/1e9; for pre-1970 instants
    * the two stages genuinely differ from a single floor-or-truncate by
    * 1e9 (a ns in (-(k)s − 1µs, −(k)s) truncates UP onto the −k second),
    * so the ref must mirror the composite, not idealize it.
    */
  private def sec(e: Ev): Long = Math.floorDiv(e._2 / 1000L, 1000000L)

  /** Deterministic adversarial corpus. Both epoch bases are exact
    * multiples of 86400, so "day boundary" below means "bucket boundary"
    * in the queries' floor(sec/86400) bucketing: 2024-01-01 00:00:00 UTC
    * for two thirds of the corpus, and 1968-01-01 00:00:00 UTC
    * (−731 days) for the other third — the pre-1970 era where truncating
    * division buckets a negative second into the WRONG day (round-14
    * calendar-set seam, here fuzzed at volume: floor(sec/86400) must
    * carry −1s-before-a-negative-boundary into the EARLIER bucket, and
    * the cross-era lookback means a 2024 purchase with no modern signup
    * must still find its 1968 one).
    */
  private def genEvents(seed: Long): Seq[Ev] = {
    val rnd = new scala.util.Random(seed)
    val base = 1704067200L     // 2024-01-01 00:00:00 UTC
    val preBase = -63158400L   // 1968-01-01 00:00:00 UTC = -731 * 86400
    (0 until 600).map { i =>
      val user: Long = if (i % 5 == 0) 5L else rnd.nextInt(5).toLong
      val kind = user match {
        case 3L => "purchase" // never finds a signup: inner-join drop path
        case 4L => "signup"   // never consumed
        case _  => Seq("purchase", "signup", "click")(rnd.nextInt(3))
      }
      val off: Long = rnd.nextInt(10) match {
        case 0 | 1 | 2 => 86400L * rnd.nextInt(4)                    // on a bucket boundary
        case 3 | 4     => 86400L * (1 + rnd.nextInt(3)) +
                            (if (rnd.nextBoolean()) 1L else -1L)     // ±1 s around one
        case _         => rnd.nextInt(60) * 4507L                    // 60-second pool ⇒ many ties
      }
      // era picked by index, not rnd: the draw sequence stays identical,
      // a third of the same structural cases simply relocate to pre-1970
      val b = if (i % 3 == 2) preBase else base
      val ns = (b + off) * 1000000000L + rnd.nextInt(1000000000)
      (i.toLong, ns, user, kind)
    }
  }

  /** Writes the corpus the way the driver fixtures store it: `ts` as a
    * raw int64 of nanoseconds, which Tables.events reads under the
    * nanosAsLong conf and floors to µs (FIXTURES.md events note).
    */
  private def writeFixture(events: Seq[Ev]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-asof-fuzz-").toString
    events.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def signupsByUser(events: Seq[Ev]): Map[Long, Seq[Ev]] =
    events.filter(_._4 == "signup").groupBy(_._3)

  private def purchases(events: Seq[Ev]): Seq[Ev] =
    events.filter(_._4 == "purchase")

  /** Brute-force references, parameterized by the ONE boundary each query
    * owns (VERDICT r08 #5 — automated teeth). The comparison tests call
    * them at the declared value; the TEETH test calls them flipped and
    * asserts the output CHANGES. The same-user same-second purchase/signup
    * ties the generator plants (and the seam test requires, >= 5 per seed)
    * make each flip deterministically visible: under backward-strict a
    * same-second signup is excluded and under inclusive it becomes the
    * unbeatable maximum; mirrored for forward; for nearest the diff-0
    * candidate is the unbeatable minimum.
    */
  private def asofRef(events: Seq[Ev], inclusive: Boolean): Seq[(Long, Long, Long, Long)] = {
    val sig = signupsByUser(events)
    purchases(events).flatMap { p =>
      val cands = sig.getOrElse(p._3, Nil)
        .filter(s => if (inclusive) sec(s) <= sec(p) else sec(s) < sec(p))
      if (cands.isEmpty) None
      else Some((p._1, p._3, sec(p), cands.maxBy(s => (sec(s), s._1))._1))
    }.sortBy(_._1)
  }

  private def forwardRef(events: Seq[Ev], inclusive: Boolean): Seq[(Long, Long, Long, Long)] = {
    val sig = signupsByUser(events)
    purchases(events).flatMap { p =>
      val cands = sig.getOrElse(p._3, Nil)
        .filter(s => if (inclusive) sec(s) >= sec(p) else sec(s) > sec(p))
      if (cands.isEmpty) None
      else Some((p._1, p._3, sec(p), cands.minBy(s => (sec(s), s._1))._1))
    }.sortBy(_._1)
  }

  private def nearestRef(events: Seq[Ev], includeZeroDiff: Boolean): Seq[(Long, Long, Long, Long)] = {
    val sig = signupsByUser(events)
    purchases(events).flatMap { p =>
      val cands = sig.getOrElse(p._3, Nil)
        .filter(s => includeZeroDiff || sec(s) != sec(p))
      if (cands.isEmpty) None
      else {
        val best = cands.minBy(s => (math.abs(sec(s) - sec(p)), sec(s), s._1))
        Some((p._1, p._3, best._1, math.abs(sec(best) - sec(p))))
      }
    }.sortBy(_._1)
  }

  for (seed <- Seq(7L, 42L, 1861L)) {

    test(s"fuzz corpus is actually adversarial (seed $seed)") {
      // A generator edit that silently drops the tie/boundary cases would
      // leave the differential tests green but toothless — pin the stress
      // properties the comparisons rely on.
      val events = genEvents(seed)
      val byUserSec = events.groupBy(e => (e._3, sec(e)))
      val psTies = byUserSec.values.count(g =>
        g.exists(_._4 == "purchase") && g.exists(_._4 == "signup"))
      assert(psTies >= 5, s"only $psTies same-user same-second purchase/signup ties")
      // floorMod, not %: Scala's remainder carries the dividend's sign, so
      // a pre-1970 boundary event (sec < 0, exact multiple) still lands on
      // 0 but boundary±1s events land on ±86399 — floorMod counts both
      // eras uniformly.
      val onBoundary = events.count(e => Math.floorMod(sec(e), 86400L) == 0L)
      assert(onBoundary >= 50, s"only $onBoundary events on an epoch-day bucket boundary")
      val adjacent = events.count(e => Math.floorMod(sec(e) + 1, 86400L) == 0L ||
        Math.floorMod(sec(e), 86400L) == 1L)
      assert(adjacent >= 20, s"only $adjacent events within 1 s of a boundary")
      // round 14: the pre-1970 era must stay populated, with boundary
      // events and at least one same-second purchase/signup tie of its
      // own — an innocent generator edit must not silently re-merge the
      // corpus into the modern era.
      val preEra = events.filter(e => sec(e) < 0L)
      assert(preEra.size >= 150, s"pre-1970 era shrank to ${preEra.size} events")
      assert(preEra.count(e => Math.floorMod(sec(e), 86400L) == 0L) >= 10,
        "no pre-1970 bucket-boundary events left")
      val preTies = preEra.groupBy(e => (e._3, sec(e))).values.count(g =>
        g.exists(_._4 == "purchase") && g.exists(_._4 == "signup"))
      assert(preTies >= 1, "no same-second purchase/signup tie in the pre-1970 era")
      val hot = events.count(_._3 == 5L)
      assert(hot >= 100, s"hot user has only $hot events")
      assert(events.exists(_._4 == "click"), "no noise rows to filter out")
    }

    test(s"TEETH: strict/inclusive boundary flips are visible (seed $seed)") {
      val events = genEvents(seed)
      assert(asofRef(events, inclusive = false) != asofRef(events, inclusive = true),
        "backward strict→inclusive flip invisible — no same-second tie reaches a purchase")
      assert(forwardRef(events, inclusive = true) != forwardRef(events, inclusive = false),
        "forward inclusive→strict flip invisible — no same-second tie reaches a purchase")
      assert(nearestRef(events, includeZeroDiff = true) != nearestRef(events, includeZeroDiff = false),
        "nearest diff-0 exclusion flip invisible — no zero-distance best match")
    }

    test(s"join_asof matches brute force on adversarial events (seed $seed)") {
      val events = genEvents(seed)
      val dir = writeFixture(events)
      val expected = asofRef(events, inclusive = false)
      val got = Registry.queries("join_asof")(spark, dir).collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getTimestamp(2).toInstant.getEpochSecond, r.getLong(3))
      }.toSeq
      assert(got === expected)
      assert(expected.nonEmpty, "fuzz corpus produced no backward matches — generator rotted")
    }

    test(s"join_asof_forward matches brute force on adversarial events (seed $seed)") {
      val events = genEvents(seed)
      val dir = writeFixture(events)
      val expected = forwardRef(events, inclusive = true)
      val got = Registry.queries("join_asof_forward")(spark, dir).collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getTimestamp(2).toInstant.getEpochSecond, r.getLong(3))
      }.toSeq
      assert(got === expected)
      assert(expected.nonEmpty, "fuzz corpus produced no forward matches — generator rotted")
    }

    test(s"join_asof_nearest matches brute force on adversarial events (seed $seed)") {
      val events = genEvents(seed)
      val dir = writeFixture(events)
      val expected = nearestRef(events, includeZeroDiff = true)
      val got = Registry.queries("join_asof_nearest")(spark, dir).collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }.toSeq
      assert(got === expected)
      assert(expected.nonEmpty, "fuzz corpus produced no nearest matches — generator rotted")
    }
  }
}
