package graft

import java.nio.file.Files

/** Differential fuzz for the conversion-window recipes (round-8 depth):
  * `funnel_conversion`, `behavior_attribution`, `cohort_retention`. All
  * three hang on boundary clauses the fixture's smooth event stream never
  * isolates:
  *
  *  - conversion windows are OPEN at the start (`ts > anchor` — a
  *    purchase at the exact anchor instant must NOT count) and CLOSED at
  *    the end (`ts <= anchor + 7d/3d` — a purchase exactly on the bound
  *    MUST count, one second past must not);
  *  - the first-touch anchor tie-breaks equal timestamps by event_id;
  *    the funnel anchor is min(ts) over signups only, and users with no
  *    signup are absent from the funnel but present in attribution;
  *  - cohort weeks truncate to MONDAY: a Sunday-23:59:59 signup and a
  *    Monday-00:00:01 purchase sit in adjacent weeks two seconds apart.
  *
  * References are plain per-user scans over the same rows with the week
  * truncation replicated via java.time; compares are `===`.
  */
class AttributionFuzzSpec extends SparkSpec {

  private def roundN(v: Double, n: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(10, java.math.RoundingMode.HALF_UP)
      .setScale(n, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** (event_id, epochSec, user_id, event_type) */
  private type Ev = (Long, Long, Long, String)

  private def sec(d: String, hms: String = "00:00:00"): Long =
    java.time.LocalDateTime.parse(s"${d}T$hms")
      .toEpochSecond(java.time.ZoneOffset.UTC)

  private def monday(epochSec: Long): java.time.LocalDate = {
    val d = java.time.Instant.ofEpochSecond(epochSec)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
    d.`with`(java.time.temporal.TemporalAdjusters.previousOrSame(
      java.time.DayOfWeek.MONDAY))
  }

  private val D3 = 3L * 86400L
  private val D7 = 7L * 86400L

  // 2024-03-04 is a Monday.
  private def corpus(): Seq[Ev] = {
    val rows = scala.collection.mutable.ArrayBuffer[Ev]()
    var id = 0L
    def add(u: Long, s: Long, et: String): Unit = { id += 1; rows += ((id, s, u, et)) }
    // u1: purchase at the EXACT signup instant (open start: no conversion
    // from it), plus one exactly +7d (closed end: funnel-converts).
    val s1 = sec("2024-03-04", "10:00:00")
    add(1, s1, "signup"); add(1, s1, "purchase"); add(1, s1 + D7, "purchase")
    // u2: two first events at the SAME ts — lower event_id ("view") is the
    // first touch; purchase exactly +3d attribution-converts; no signup,
    // so u2 is absent from the funnel.
    val s2 = sec("2024-03-05", "08:00:00")
    add(2, s2, "view"); add(2, s2, "click"); add(2, s2 + D3, "purchase")
    // u3: Sunday-night signup, purchase 2s later on Monday — adjacent
    // cohort weeks, converts in both funnel (≤7d) and attribution (≤3d).
    add(3, sec("2024-03-10", "23:59:59"), "signup")
    add(3, sec("2024-03-11", "00:00:01"), "purchase")
    // u4: purchase strictly BEFORE the signup — denominator only.
    add(4, sec("2024-03-06", "09:00:00"), "purchase")
    add(4, sec("2024-03-06", "10:00:00"), "signup")
    // u5: two signups; the anchor is the EARLIER one; purchase at +6d of
    // the first (within 7d of first, outside 7d of... not the min test —
    // within the window either way is fine; the min matters because a
    // max-anchored run would shift the cohort week).
    add(5, sec("2024-03-04", "00:00:00"), "signup")
    add(5, sec("2024-03-13", "00:00:00"), "signup")
    add(5, sec("2024-03-10", "00:00:00"), "purchase")
    // u6: first touch "click"; purchase at +3d PLUS one second — outside.
    val s6 = sec("2024-03-07", "12:00:00")
    add(6, s6, "click"); add(6, s6 + D3 + 1L, "purchase")
    // u7: signup the following week (a second cohort row), no purchase.
    add(7, sec("2024-03-12", "09:30:00"), "signup")
    // u8: the ONLY purchase is at the exact signup instant — the open
    // start alone decides this user's funnel outcome (must NOT convert).
    val s8 = sec("2024-03-05", "14:00:00")
    add(8, s8, "signup"); add(8, s8, "purchase")
    rows.toSeq
  }

  private def write(rows: Seq[Ev]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-attr-fuzz-").toString
    rows.map { case (id, s, u, et) => (id, s * 1000000000L, u, et, 1.0d) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val rows = corpus()
  private lazy val dir = write(rows)
  private lazy val byUser = rows.groupBy(_._3)

  test("funnel_conversion: open-start/closed-end window, min-signup anchor, " +
    "signup-less users absent") {
    val perUser = byUser.toSeq.flatMap { case (u, g) =>
      val signups = g.filter(_._4 == "signup").map(_._2)
      if (signups.isEmpty) None
      else {
        val anchor = signups.min
        val converted = g.exists(e =>
          e._4 == "purchase" && e._2 > anchor && e._2 <= anchor + D7)
        Some((monday(anchor).toString, if (converted) 1 else 0))
      }
    }
    assert(perUser.size == 6, "exactly the six signup users (u2/u6 absent)")
    // u8's same-instant-only purchase must leave them unconverted: the
    // open start is the deciding clause for this user, nothing else.
    assert(perUser.count(_._2 == 0) >= 3, "open-start-decided user missing")
    val expected = perUser.groupBy(_._1).toSeq.map { case (wk, g) =>
      (wk, g.size.toLong, g.map(_._2).sum.toLong,
        roundN(g.map(_._2).sum.toDouble / g.size, 4))
    }.sortBy(_._1)
    assert(expected.size == 2, "two cohort weeks expected")
    val got = Registry.queries("funnel_conversion")(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
    // Seam companions: u1 converts ONLY via the exact +7d purchase; u4 not at all.
    assert(expected.map(_._3).sum >= 3L)
  }

  test("behavior_attribution: event_id tie-break on the first touch, " +
    "exact +3d inclusive, +3d+1s exclusive") {
    val perUser = byUser.toSeq.map { case (u, g) =>
      val first = g.minBy(e => (e._2, e._1))
      val purchased = g.exists(e =>
        e._4 == "purchase" && e._2 > first._2 && e._2 <= first._2 + D3)
      (first._4, if (purchased) 1 else 0)
    }
    // u2's equal-ts pair must anchor on "view" (lower event_id), and convert.
    assert(perUser.contains(("view", 1)), "u2 tie-break/inclusive-bound seam lost")
    // u6's +3d+1s purchase must NOT convert its "click" touch.
    assert(perUser.contains(("click", 0)), "u6 just-outside seam lost")
    // u1's same-instant purchase must not convert (its +7d one is outside 3d).
    assert(perUser.contains(("signup", 0)), "u1 open-start seam lost")
    val expected = perUser.groupBy(_._1).toSeq.map { case (ft, g) =>
      (ft, g.size.toLong, g.map(_._2).sum.toLong,
        roundN(g.map(_._2).sum.toDouble / g.size, 4))
    }.sortBy(_._1)
    val got = Registry.queries("behavior_attribution")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
  }

  test("cohort_retention: Monday truncation splits a 2-second pair into " +
    "adjacent week offsets") {
    val expected = byUser.toSeq.flatMap { case (u, g) =>
      val cohort = monday(g.map(_._2).min)
      g.map { e =>
        (cohort.toString,
          (monday(e._2).toEpochDay - cohort.toEpochDay) / 7, u)
      }.distinct
    }.groupBy { case (c, w, _) => (c, w) }.toSeq
      .map { case ((c, w), g) => (c, w, g.size.toLong) }
      .sortBy { case (c, w, _) => (c, w) }
    // u3's two events two seconds apart must land at offsets 0 and 1.
    assert(expected.exists { case (c, w, _) => c == "2024-03-04" && w == 1L },
      "adjacent-week boundary seam lost")
    val got = Registry.queries("cohort_retention")(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }
}
