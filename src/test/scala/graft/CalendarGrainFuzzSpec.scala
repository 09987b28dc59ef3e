package graft

import java.nio.file.Files
import java.sql.Timestamp

/** Differential fuzz for the calendar-grain recipes (round-8 depth):
  * `behavior_dau_wau`, `behavior_tenure`, `ts_cumulative_users`,
  * `fn_date`, `win_first_nth`. Seams:
  *
  *  - tenure is a DATE diff: two events 2 s apart across midnight are
  *    tenure 1, a same-day pair is tenure 0 (events_per_day divides by
  *    tenure+1 either way);
  *  - the cumulative-users spine lists EVERY event day — a day with
  *    activity but no first-time users must appear with an unchanged
  *    running total;
  *  - DAU/WAU cross two truncation grains of the same events;
  *  - fn_date's last_day must land on Feb 29 in a leap year and Feb 28
  *    otherwise, and +30 days must cross a year boundary;
  *  - nth_value(2) on a 1-row partition is NULL, and an equal-price tie
  *    resolves by the partkey tie-break, not insertion order.
  */
class CalendarGrainFuzzSpec extends SparkSpec {

  private def roundN(v: Double, n: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(10, java.math.RoundingMode.HALF_UP)
      .setScale(n, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  private def sec(d: String, hms: String): Long =
    java.time.LocalDateTime.parse(s"${d}T$hms")
      .toEpochSecond(java.time.ZoneOffset.UTC)

  private def dayOf(s: Long): java.time.LocalDate =
    java.time.Instant.ofEpochSecond(s).atZone(java.time.ZoneOffset.UTC).toLocalDate

  private def monday(d: java.time.LocalDate): java.time.LocalDate =
    d.`with`(java.time.temporal.TemporalAdjusters.previousOrSame(
      java.time.DayOfWeek.MONDAY))

  /** (event_id, epochSec, user_id) */
  private lazy val events: Seq[(Long, Long, Long)] = {
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    var id = 0L
    def add(u: Long, s: Long): Unit = { id += 1; rows += ((id, s, u)) }
    // u1: same-day pair → tenure 0. u2: midnight straddle → tenure 1.
    add(1, sec("2024-03-04", "08:00:00")); add(1, sec("2024-03-04", "19:00:00"))
    add(2, sec("2024-03-05", "23:59:59")); add(2, sec("2024-03-06", "00:00:01"))
    // u3: single event. u4: long tenure spanning weeks.
    add(3, sec("2024-03-07", "12:00:00"))
    add(4, sec("2024-03-04", "09:00:00")); add(4, sec("2024-03-20", "09:00:00"))
    // 2024-03-08: activity by ALREADY-SEEN users only (u1, u4) — the
    // cumulative spine must show this day with an unchanged total.
    add(1, sec("2024-03-08", "10:00:00")); add(4, sec("2024-03-08", "11:00:00"))
    rows.toSeq
  }

  private def writeEvents(): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-cal-fuzz-").toString
    events.map { case (id, s, u) => (id, s * 1000000000L, u) }
      .toDF("event_id", "ts", "user_id")
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("behavior_tenure: date-grain diffs — same-day 0, midnight straddle 1") {
    val expected = events.groupBy(_._3).toSeq.map { case (u, g) =>
      val days = g.map(e => dayOf(e._2).toEpochDay)
      val tenure = days.max - days.min
      (u, g.size.toLong, tenure,
        roundN(g.size.toDouble / (tenure + 1L), 4))
    }.sortBy(_._1)
    assert(expected.exists(e => e._3 == 1L && e._2 == 2L), "midnight straddle lost")
    val got = Registry.queries("behavior_tenure")(spark, writeEvents()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
  }

  test("ts_cumulative_users: no-new-user days keep the running total flat") {
    val firstDay = events.groupBy(_._3).map { case (_, g) => dayOf(g.map(_._2).min) }
    val expected = events.map(e => dayOf(e._2)).distinct.sorted.map { day =>
      (day.toString, firstDay.count(!_.isAfter(day)).toLong)
    }
    val m = expected.toMap
    assert(m("2024-03-08") == m("2024-03-07"),
      "a no-new-user day must keep the cumulative total flat")
    val got = Registry.queries("ts_cumulative_users")(spark, writeEvents()).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("behavior_dau_wau: day and week truncations of the same events agree " +
    "with the reference") {
    val byDay = events.groupBy(e => dayOf(e._2))
      .map { case (d, g) => d -> g.map(_._3).toSet.size.toLong }
    val byWeek = events.groupBy(e => monday(dayOf(e._2)))
      .map { case (w, g) => w -> g.map(_._3).toSet.size.toLong }
    val expected = byWeek.toSeq.map { case (wk, wau) =>
      val days = byDay.filter { case (d, _) => monday(d) == wk }.toSeq
      val sumDau = days.map(_._2).sum.toDouble
      (wk.toString, wau, days.size.toLong,
        roundN(sumDau / days.size / wau, 4))
    }.sortBy(_._1)
    val got = Registry.queries("behavior_dau_wau")(spark, writeEvents()).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
  }

  test("fn_date: leap-year last_day and year-crossing +30") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-date-fuzz-").toString
    val dates = Seq("2024-02-29", "2024-02-15", "2023-02-15", "2023-12-31",
      "2000-02-15", "1996-01-01", "2024-12-02")
    dates.zipWithIndex.map { case (dt, i) =>
      (i.toLong, Timestamp.valueOf(s"$dt 00:00:00")) }
      .toDF("o_orderkey", "o_orderdate")
      .write.parquet(s"$d/orders.parquet")
    val epoch95 = java.time.LocalDate.parse("1995-01-01").toEpochDay
    val expected = dates.zipWithIndex.map { case (dt, i) =>
      val ld = java.time.LocalDate.parse(dt)
      (i.toLong, dt, ld.getYear.toLong, ld.getMonthValue.toLong,
        ld.getDayOfMonth.toLong, ld.withDayOfMonth(1).toString,
        ld.plusDays(30).toString, ld.toEpochDay - epoch95,
        ld.withDayOfMonth(ld.lengthOfMonth).toString)
    }
    // Seam companions: Feb 29 exists, last_day lands on 29 vs 28 by year,
    // and one +30 crosses the year boundary.
    assert(expected.exists(_._9 == "2024-02-29"))
    assert(expected.exists(_._9 == "2023-02-28"))
    assert(expected.exists(e => e._2.startsWith("2023-12") && e._7.startsWith("2024-01")))
    val got = Registry.queries("fn_date")(spark, d).collect().map { r =>
      (r.getLong(0), r.getDate(1).toString, r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDate(5).toString, r.getDate(6).toString, r.getLong(7), r.getDate(8).toString)
    }.toSeq
    assert(got === expected)
  }

  test("win_first_nth: 1-row partitions yield NULL second; price ties break " +
    "by partkey") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-nth-fuzz-").toString
    val parts = Seq(
      (100L, "B1", 5.0), // singleton partition
      (201L, "B2", 9.0), (202L, "B2", 9.0), // exact tie → 201 first
      (301L, "B3", 1.0), (302L, "B3", 7.0), (303L, "B3", 7.0), (304L, "B3", 3.0))
    parts.toDF("p_partkey", "p_brand", "p_retailprice")
      .write.parquet(s"$d/part.parquet")
    val expected = parts.groupBy(_._2).toSeq.flatMap { case (b, g) =>
      val ord = g.sortBy { case (k, _, p) => (-p, k) }
      g.map { case (k, _, p) =>
        (b, k, p, ord.head._1, if (ord.size >= 2) Some(ord(1)._1) else None) }
    }.sortBy(e => (e._1, e._2))
    assert(expected.exists(_._5.isEmpty), "singleton partition lost")
    val got = Registry.queries("win_first_nth")(spark, d).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }.toSeq
    assert(got === expected)
  }
}
