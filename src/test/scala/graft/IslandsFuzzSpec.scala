package graft

import java.nio.file.Files

/** Differential fuzz for the gaps-and-islands family (VERDICT r07 #2):
  * `win_islands`, `behavior_streak_days`, `ts_sessionize` all build runs
  * from the difference-of-row_numbers / running-break-count recipe, and
  * each owns one exact boundary the fixture distribution barely probes:
  *
  *  - win_islands keeps runs with `streak_len >= 2` (a `>` flip drops the
  *    exactly-2 runs);
  *  - behavior_streak_days extends a streak iff the day delta is exactly
  *    1 (a `<= 2` flip merges across one-day gaps; duplicate days must
  *    collapse via DISTINCT first);
  *  - ts_sessionize breaks iff the gap is STRICTLY > 1800 s (a `>=` flip
  *    splits at exactly-30-min gaps; duplicate timestamps are gap 0).
  *
  * Each registered query body runs over a constructed events table and is
  * compared `===` against a brute-force per-user linear scan written with
  * plain Scala collections — no windows, no row_number, nothing shared
  * with the production recipe. The generator plants every seam and a
  * companion assertion per seam keeps the generator honest.
  */
class IslandsFuzzSpec extends SparkSpec {

  private def roundN(v: Double, n: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(10, java.math.RoundingMode.HALF_UP)
      .setScale(n, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** (event_id, ts_nanos, user_id, event_type) */
  private type Ev = (Long, Long, Long, String)

  private def gen(seed: Long): Seq[Ev] = {
    val rnd = new scala.util.Random(seed)
    val base = 1704067200L // 2024-01-01T00:00:00Z, whole epoch seconds
    // Second-grain deltas: duplicates (0), sub-session chatter, the exact
    // 1800 boundary and both neighbors, day rollover and a one-day gap.
    val deltas = Vector(0L, 0L, 1L, 60L, 1799L, 1800L, 1800L, 1801L, 3600L,
      86400L, 86400L, 172800L)
    val types = Vector("click", "view", "purchase")
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
    for (u <- 0L to 9L) {
      val n = u match {
        case 0 => 1 // single-event user: no island ≥2, one session, one day
        case _ => 40 + rnd.nextInt(21)
      }
      var ts = base + u * 10_000_000L // users far apart in time
      for (i <- 0 until n) {
        if (i > 0) ts += deltas(rnd.nextInt(deltas.size))
        val et = u match {
          case 1 => "click" // all-same-type: one maximal run
          case 2 => types(i % 2) // alternating: every run has length 1
          case _ => types(rnd.nextInt(types.size))
        }
        rows += ((ts, u, et))
      }
    }
    // Event ids are globally shuffled so each user's ids are NON-CONTIGUOUS
    // (the row_number-difference key never coincides with id arithmetic),
    // but re-sorted ascending WITHIN each user so the planted type patterns
    // (alternating, all-same) hold in the declared event_id order.
    val shuffled = rnd.shuffle((1L to rows.size.toLong).toVector)
    val ids = new Array[Long](rows.size)
    rows.indices.groupBy(i => rows(i)._2).foreach { case (_, idxs) =>
      idxs.sorted.zip(idxs.map(shuffled).sorted)
        .foreach { case (i, id) => ids(i) = id }
    }
    rows.toSeq.zipWithIndex.map { case ((ts, u, et), i) =>
      (ids(i), ts * 1000000000L, u, et)
    }
  }

  private def writeEvents(rows: Seq[Ev]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-islands-fuzz-").toString
    rows.map { case (id, ts, u, et) => (id, ts, u, et, 1.0d) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  private def sec(e: Ev): Long = e._2 / 1000000000L
  private def day(e: Ev): Long = sec(e) / 86400L

  /** The three brute-force references, each parameterized by the ONE
    * boundary its query owns. The comparison tests call them at the
    * declared value; the TEETH test calls them flipped and asserts the
    * result CHANGES on the generated corpus (VERDICT r08 #5 — automated
    * replacement for the manual sed-flip check: a defanged generator or
    * a reference drifting to the flipped convention both go red; bite
    * verified by removing the 1800s deltas from `gen` and watching both
    * the seam test and the TEETH test fail).
    */
  private def islandsRef(rows: Seq[Ev], minLen: Long): Seq[(Long, String, Long, Long)] =
    rows.groupBy(_._3).toSeq.flatMap { case (u, g) =>
      val ord = g.toSeq.sortBy(_._1) // event_id order, the declared order
      val runs = scala.collection.mutable.ArrayBuffer[(Long, String, Long, Long)]()
      for (e <- ord) runs.lastOption match {
        case Some((_, et, _, len)) if et == e._4 =>
          runs(runs.size - 1) = runs.last.copy(_4 = len + 1)
        case _ => runs += ((u, e._4, e._1, 1L))
      }
      runs.filter(_._4 >= minLen)
    }.sortBy(r => (r._1, r._3))

  private def streaksRef(rows: Seq[Ev], extendDelta: Long): Seq[(Long, Long, Long)] =
    rows.groupBy(_._3).toSeq.map { case (u, g) =>
      val days = g.map(day).toSeq.distinct.sorted
      val runLens = scala.collection.mutable.ArrayBuffer[Long]()
      for ((d, i) <- days.zipWithIndex) {
        if (i > 0 && d - days(i - 1) <= extendDelta)
          runLens(runLens.size - 1) += 1L
        else runLens += 1L
      }
      (u, runLens.max, runLens.size.toLong)
    }.sortBy(_._1)

  private def sessionsRef(rows: Seq[Ev], strictGap: Boolean): Seq[(Long, Long, Long, Double)] =
    rows.groupBy(_._3).toSeq.map { case (u, g) =>
      val ord = g.toSeq.sortBy(e => (e._2, e._1)) // (ts, event_id), as declared
      val sessLens = scala.collection.mutable.ArrayBuffer[Long]()
      for ((e, i) <- ord.zipWithIndex) {
        val break = i == 0 || {
          val gap = sec(e) - sec(ord(i - 1))
          if (strictGap) gap > 1800L else gap >= 1800L
        }
        if (break) sessLens += 1L else sessLens(sessLens.size - 1) += 1L
      }
      (u, sessLens.size.toLong, sessLens.max,
        roundN(sessLens.sum.toDouble / sessLens.size, 2))
    }.sortBy(_._1)

  for (seed <- Seq(5L, 1229L)) {
    lazy val rows = gen(seed)

    test(s"generator plants every declared seam (seed $seed)") {
      val byUser = rows.groupBy(_._3)
      assert(byUser(0L).size == 1, "single-event user missing")
      assert(byUser(1L).map(_._4).distinct.size == 1, "all-same-type user missing")
      assert(byUser(2L).toSeq.sortBy(_._1)
        .map(_._4).sliding(2).forall(p => p.head != p.last),
        "alternating-type user missing")
      val gaps = byUser.values.flatMap { g =>
        g.toSeq.sortBy(e => (e._2, e._1)).map(sec).sliding(2).collect {
          case Seq(a, b) => b - a }
      }.toSeq
      assert(gaps.contains(0L), "duplicate-timestamp seam missing")
      assert(gaps.contains(1800L), "exact-1800s boundary gap missing")
      assert(gaps.contains(1801L), "1801s just-over gap missing")
      val dayDeltas = byUser.values.flatMap { g =>
        g.map(day).toSeq.distinct.sorted.sliding(2).collect {
          case Seq(a, b) => b - a }
      }.toSeq
      assert(dayDeltas.contains(1L) && dayDeltas.contains(2L),
        "consecutive-day and one-day-gap seams missing")
      assert(byUser.values.exists(g => g.map(day).size > g.map(day).toSet.size),
        "duplicate-day seam missing")
    }

    test(s"TEETH: each query's boundary flip is visible on this corpus (seed $seed)") {
      assert(islandsRef(rows, 2L) != islandsRef(rows, 3L),
        "raising the >= 2 run cutoff changed nothing — no exactly-length-2 run")
      assert(streaksRef(rows, 1L) != streaksRef(rows, 2L),
        "merging across one-day gaps changed nothing — no exact one-day gap planted")
      assert(sessionsRef(rows, strictGap = true) != sessionsRef(rows, strictGap = false),
        "splitting at exactly-1800s gaps changed nothing — no exact-1800s gap planted")
    }

    test(s"win_islands equals the brute-force run scan (seed $seed)") {
      val expected = islandsRef(rows, 2L)
      assert(expected.exists(_._4 == 2L), "no exactly-length-2 run — >= boundary unprobed")
      assert(!expected.exists(_._1 == 2L), "alternating user must emit no runs")
      assert(expected.count(_._1 == 1L) == 1, "all-same-type user must emit one run")

      val got = Registry.queries("win_islands")(spark, writeEvents(rows)).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got === expected)
    }

    test(s"behavior_streak_days equals the brute-force day scan (seed $seed)") {
      val expected = streaksRef(rows, 1L)
      assert(expected.exists(_._2 >= 3L), "no ≥3-day streak — extension seam unprobed")
      assert(expected.exists(_._3 >= 2L), "no user with a broken streak")

      val got = Registry.queries("behavior_streak_days")(spark, writeEvents(rows))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got === expected)
    }

    test(s"ts_sessionize equals the brute-force gap scan (seed $seed)") {
      val expected = sessionsRef(rows, strictGap = true)
      assert(expected.exists(_._2 >= 2L), "no multi-session user")
      assert(expected.exists(t => t._1 == 0L && t._2 == 1L),
        "single-event user must form exactly one session")

      val got = Registry.queries("ts_sessionize")(spark, writeEvents(rows)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(got === expected)
    }
  }
}
