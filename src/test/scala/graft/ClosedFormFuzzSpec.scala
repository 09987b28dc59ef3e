package graft

import java.nio.file.Files

/** Differential fuzz for three closed-form recipes (round-8 depth):
  *
  *  - `ts_active_concurrency` sweeps (boundary_ts, delta) with ends
  *    sorted BEFORE starts at the same instant — two sessions exactly
  *    30 minutes apart must count as peak 1 (the first closes as the
  *    second opens), 29:59 apart as peak 2, and n same-instant starts
  *    as peak n;
  *  - `sim_quantize_int8` maps x → round((x−mn)/(mx−mn)·255) with
  *    HALF-UP at the exact .5 boundaries (127.5 → 128, 63.75 → 64) and
  *    NULLs out degenerate all-equal vectors (0/0 → NaN → decimal cast
  *    → null, which also nulls the checksum);
  *  - `agg_gini`'s closed form must return EXACTLY 0 for single-element
  *    and all-equal groups (the decimal rank·x sums cancel bit-exactly)
  *    and match the rank formula on skewed and random groups.
  */
class ClosedFormFuzzSpec extends SparkSpec {

  private def roundN(v: Double, n: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(10, java.math.RoundingMode.HALF_UP)
      .setScale(n, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  test("ts_active_concurrency: ends close exactly-abutting sessions before " +
    "starts; same-instant starts stack") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sweep-fuzz-").toString
    val base = 1704067200L
    var id = 0L
    def ev(et: String, off: Long): (Long, Long, Long, String, Double) = {
      id += 1; (id, (base + off) * 1000000000L, 1L, et, 1.0d)
    }
    val rows =
      // exactly 30 min apart, three in a row → peak must stay 1
      Seq(ev("abut", 0L), ev("abut", 1800L), ev("abut", 3600L)) ++
      // one second short of 30 min → overlap, peak 2
      Seq(ev("short", 0L), ev("short", 1799L)) ++
      // three sessions starting at the same instant → peak 3
      Seq(ev("stack", 0L), ev("stack", 0L), ev("stack", 0L)) ++
      // random gaps around the boundary
      {
        val rnd = new scala.util.Random(97L)
        var off = 0L
        (0 until 30).map { _ =>
          off += Seq(0L, 60L, 1799L, 1800L, 1801L)(rnd.nextInt(5)); ev("rand", off)
        }
      }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")

    val expected = rows.groupBy(_._4).toSeq.map { case (et, g) =>
      val bounds = g.flatMap { case (_, ts, _, _, _) =>
        val s = ts / 1000000000L; Seq((s, 1), (s + 1800L, -1)) }
        .sortBy { case (bt, delta) => (bt, delta) }
      var live = 0L; var peak = Long.MinValue
      bounds.foreach { case (_, d) => live += d; peak = math.max(peak, live) }
      (et, peak)
    }.sortBy(_._1)
    val m = expected.toMap
    assert(m("abut") == 1L, "abutting sessions must never overlap")
    assert(m("short") == 2L && m("stack") == 3L)
    val got = Registry.queries("ts_active_concurrency")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("sim_quantize_int8: HALF-UP at exact .5 boundaries; all-equal " +
    "vectors null out including the checksum") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-quant-fuzz-").toString
    // All values are dyadic (k/256), so (x−mn)/(mx−mn)·255 is an exact
    // double and the .5 ties are EXACT ties, not representation noise.
    val rnd = new scala.util.Random(53L)
    def dyadic(): Float = (rnd.nextInt(257) / 256.0).toFloat
    val vecs: Seq[(Long, Seq[Float])] = Seq(
      // mn=0, mx=1: 0.5→127.5→128, 0.25→63.75→64, 0.75→191.25→191
      1L -> (Seq(0.0f, 1.0f, 0.5f, 0.25f, 0.75f) ++ Seq.fill(59)(dyadic())),
      2L -> Seq.fill(64)(0.125f), // all-equal → NaN → nulls
      3L -> (Seq(-0.5f, 0.5f, 0.0f) ++ Seq.fill(61)((dyadic() - 0.5f))),
      4L -> Seq.fill(64)(dyadic()))
    vecs.map { case (vid, v) => (vid, v, 1) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val expected = vecs.map { case (vid, v) =>
      val d = v.map(_.toDouble)
      val mn = d.min; val mx = d.max
      if (mn == mx) (vid, None, None, None)
      else {
        val q = d.map(x => roundN((x - mn) / (mx - mn) * 255d, 0).toLong)
        (vid, Some(q.head), Some(q.last), Some(q.sum))
      }
    }.sortBy(_._1)
    // Seam companions: the exact .5 tie is present and rounds UP.
    assert(expected.head._2.contains(0L) &&
      vecs.head._2.take(3).last == 0.5f, "boundary layout changed")
    val got = Registry.queries("sim_quantize_int8")(spark, dir).collect().map { r =>
      def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      (r.getLong(0), opt(1), opt(2), opt(3))
    }.toSeq
    assert(got === expected)
  }

  test("agg_gini: zero on degenerate groups, rank formula on skewed ones") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-gini-fuzz-").toString
    val rnd = new scala.util.Random(31L)
    val groups: Seq[(String, Seq[Double])] = Seq(
      "p0" -> Seq(123.45), // single element → 0
      "p1" -> Seq.fill(7)(50.0), // all equal → 0
      "p2" -> (Seq.fill(9)(0.01) :+ 9999.99), // extreme inequality
      "p3" -> Seq.fill(23)((rnd.nextInt(100000) + 1) / 100.0))
    groups.zipWithIndex.flatMap { case ((pr, vs), gi) =>
      vs.zipWithIndex.map { case (v, i) => (gi * 1000L + i, pr, v) } }
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")

    val expected = groups.map { case (pr, vs) =>
      val ranked = vs.zipWithIndex.map { case (v, i) => (v, i.toLong) }
        .sortBy { case (v, k) => (v, k) }.zipWithIndex
        .map { case ((v, _), rn) => (rn + 1L, v) }
      val n = vs.size.toDouble
      val sx = ranked.map { case (_, v) =>
        BigDecimal(java.math.BigDecimal.valueOf(v))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP) }.sum.toDouble
      val swx = ranked.map { case (rn, v) =>
        BigDecimal(java.math.BigDecimal.valueOf(rn * v))
          .setScale(8, BigDecimal.RoundingMode.HALF_UP) }.sum.toDouble
      (pr, roundN(2.0d * swx / (n * sx) - (n + 1.0d) / n, 4))
    }
    assert(expected.take(2).forall(_._2 == 0.0d),
      "degenerate groups must have EXACTLY zero gini")
    assert(expected(2)._2 > 0.85d, "extreme-inequality group must approach 1")
    val got = Registry.queries("agg_gini")(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got === expected)
  }
}
