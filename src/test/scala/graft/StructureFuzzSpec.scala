package graft

import java.nio.file.Files

/** Differential fuzz for the structural recipes (round-8 depth):
  * `ts_ohlc`, `win_frame_range`, `agg_collect_sorted`,
  * `text_chunk_sliding`, `text_pack_bins`. Seams:
  *
  *  - OHLC open/close pick by EVENT_ID order, not value order — a bar
  *    whose minimum value arrives mid-bar must still open with the
  *    first tick; a tick exactly on the next :00:00 starts a new bar;
  *  - the cumulative RANGE frame counts ALL same-date peers (including
  *    later orderkeys) — the range-vs-rows distinction;
  *  - collect_sorted sorts NUMERICALLY before stringifying — keys 2 and
  *    10 must join as "2,10", not the lexicographic "10,2";
  *  - sliding chunks stride 4 over window 8 with end truncation — an
  *    exactly-8-token doc still yields TWO chunks (starts 1 and 5), a
  *    1-token doc yields one;
  *  - pack bins assign by the tokens BEFORE each doc: a doc starting
  *    exactly at cumulative 512 opens bin 1, and an oversized doc still
  *    gets exactly one bin.
  */
class StructureFuzzSpec extends SparkSpec {

  test("ts_ohlc: open/close follow event_id order, bars split exactly on " +
    "the hour") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-ohlc-fuzz-").toString
    def s(hms: String): Long =
      java.time.LocalDateTime.parse(s"2024-03-04T$hms")
        .toEpochSecond(java.time.ZoneOffset.UTC)
    // user 1, hour 10: first tick is NOT the extremum on either side —
    // open 5.0 (id 1) though low is 1.0 (id 2); close 4.0 (id 4) though
    // high is 9.0 (id 3). A tick at exactly 11:00:00 opens the next bar.
    // user 2: single-tick bar → all four prices equal.
    val rows = Seq(
      (1L, s("10:00:01"), 1L, 5.0), (2L, s("10:15:00"), 1L, 1.0),
      (3L, s("10:30:00"), 1L, 9.0), (4L, s("10:59:59"), 1L, 4.0),
      (5L, s("11:00:00"), 1L, 7.0),
      (6L, s("10:05:00"), 2L, 3.25))
    rows.map { case (id, sec, u, v) => (id, sec * 1000000000L, u, v) }
      .toDF("event_id", "ts", "user_id", "value")
      .write.parquet(s"$d/events.parquet")

    val expected = rows.groupBy { case (_, sec, u, _) => (u, sec / 3600L) }
      .toSeq.map { case ((u, hr), g) =>
        val ord = g.sortBy(_._1)
        val vs = g.map(_._4)
        (u, java.time.Instant.ofEpochSecond(hr * 3600L).toString.dropRight(1)
          .replace("T", " "),
          ord.head._4, vs.max, vs.min, ord.last._4, g.size.toLong)
      }.sortBy { case (u, b, _, _, _, _, _) => (u, b) }
    val got = Registry.queries("ts_ohlc")(spark, d).collect().map { r =>
      (r.getLong(0), r.getTimestamp(1).toString.stripSuffix(".0"),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))
    }.toSeq
    assert(got === expected)
    val bar10 = got.find(g => g._1 == 1L && g._2.endsWith("10:00:00")).get
    assert(bar10._3 == 5.0 && bar10._6 == 4.0,
      "open/close must follow event_id order, not the extrema")
    assert(got.count(_._1 == 1L) == 2, "the 11:00:00 tick must open a second bar")
  }

  test("win_frame_range: cumulative range frame counts ALL same-date peers") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-frange-fuzz-").toString
    def ts(dt: String) = java.sql.Timestamp.valueOf(s"$dt 00:00:00")
    // Customer 1: three orders on one date (each must already count all
    // three), then two more on a later date (count 5 for both).
    val rows = Seq(
      (1L, "2024-03-04", 100L), (1L, "2024-03-04", 101L), (1L, "2024-03-04", 102L),
      (1L, "2024-03-07", 103L), (1L, "2024-03-07", 104L),
      (2L, "2024-03-05", 200L))
    rows.map { case (c, dt, k) => (c, ts(dt), k) }
      .toDF("o_custkey", "o_orderdate", "o_orderkey")
      .write.parquet(s"$d/orders.parquet")
    val expected = rows.map { case (c, dt, k) =>
      (c, dt, k, rows.count(r => r._1 == c && r._2 <= dt).toLong)
    }.sortBy { case (c, dt, k, _) => (c, dt, k) }
    assert(expected.take(3).forall(_._4 == 3L),
      "same-date peers must each see the full peer group")
    val got = Registry.queries("win_frame_range")(spark, d).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("agg_collect_sorted: numeric sort, not lexicographic") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-collect-fuzz-").toString
    Seq((2L, 7L), (10L, 7L), (1L, 7L), (100L, 7L), (11L, 7L), (5L, 8L))
      .toDF("c_custkey", "c_nationkey")
      .write.parquet(s"$d/customer.parquet")
    val got = Registry.queries("agg_collect_sorted")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((7L, "1,2,10,11,100"), (8L, "5")),
      "keys must sort numerically before stringifying (lexicographic " +
        "would give 1,10,100,11,2)")
  }

  test("text_chunk_sliding: stride-4/window-8 truncation across doc lengths") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-chunk-fuzz-").toString
    def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq((0L, words(1)), (1L, words(4)), (2L, words(8)),
      (3L, words(9)), (4L, words(13)))
    docs.map { case (id, t) => (id, t, "en", "s0") }
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d/documents.parquet")
    val expected = docs.flatMap { case (id, t) =>
      val toks = t.split(" ")
      (1 to math.max(toks.length, 1) by 4).zipWithIndex.map { case (st, ci) =>
        val chunk = toks.slice(st - 1, math.min(st - 1 + 8, toks.length)).mkString(" ")
        (id, ci.toLong, chunk, chunk.split(" ").length.toLong)
      }
    }.sortBy { case (id, ci, _, _) => (id, ci) }
    // Seam companions: 8 tokens → 2 chunks (the second holds 4); 9 → 3
    // (the third holds 1); 1 and 4 tokens → a single chunk.
    assert(expected.count(_._1 == 2L) == 2 && expected.count(_._1 == 3L) == 3)
    assert(expected.filter(_._1 == 3L).last._4 == 1L)
    assert(expected.count(_._1 == 0L) == 1 && expected.count(_._1 == 1L) == 1)
    val got = Registry.queries("text_chunk_sliding")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("text_pack_bins: a doc starting exactly at cumulative 512 opens the " +
    "next bin; an oversized doc gets one bin") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-pack-fuzz-").toString
    def words(n: Int): String = (1 to n).map(_ => "w").mkString(" ")
    // lang en: 256 + 256 tokens → doc 2 ENDS the first 512 exactly, so
    // doc 3 starts at cum 512 → bin 1. doc 4 is a 1300-token giant
    // (spans three bins' worth) but is assigned exactly one bin (2);
    // doc 5 lands after it at cum 1812 → bin 3.
    val docs = Seq((1L, 256), (2L, 256), (3L, 100), (4L, 1300), (5L, 10))
    docs.map { case (id, n) => (id, words(n), "en", "s0") }
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d/documents.parquet")
    var cum = 0L
    val expected = docs.map { case (id, n) =>
      val bin = cum / 512L
      cum += n
      (id, "en", n.toLong, bin)
    }
    assert(expected.map(_._4) === Seq(0L, 0L, 1L, 1L, 3L))
    val got = Registry.queries("text_pack_bins")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
  }
}
