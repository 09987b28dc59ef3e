package graft

import java.nio.file.Files

/** Differential fuzz for the interpolated-percentile family (VERDICT r07
  * #1): `agg_percentile`, `agg_describe`, `agg_tukey_outliers`,
  * `ts_anomaly_mad` all rest on "both engines interpolate at rank
  * (n−1)·p", proven so far only on the fixture distribution. This spec
  * drives the REGISTERED query bodies over constructed corpora that hit
  * the seams that formulation owns, against an independent order-statistic
  * reference computed with plain Scala collections:
  *
  *  - group sizes where (n−1)·p is exactly integral for each p in use
  *    (frac = 0 → the interpolation must degenerate to one order
  *    statistic, no blending);
  *  - single- and two-element groups (lo = hi and maximal-frac seams);
  *  - duplicate-heavy groups (the order statistic must tolerate ties);
  *  - negative values (fence arithmetic crosses zero).
  *
  * Values are drawn from a ≤2-dp pool so every interpolated percentile is
  * an exact ≤4-dp decimal: after the queries' own decimal(38,10)
  * round-then-cast (Exact.roundN, replicated bit-exactly below) the
  * comparison is `===` on doubles — no tolerance that could mask an
  * off-by-one rank.
  *
  * A generator-seam companion (`assertSeams`) fails the suite if a future
  * edit to the generator stops producing any of the seams, so the spec
  * cannot silently degrade into fuzzing only easy distributions.
  */
class PercentileFuzzSpec extends SparkSpec {

  /** Bit-exact replica of Exact.roundN for doubles: Spark casts double →
    * decimal(38,10) through BigDecimal.valueOf (shortest decimal repr,
    * HALF_UP at scale 10), rounds HALF_UP at n, casts back to double.
    */
  private def roundN(v: Double, n: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(10, java.math.RoundingMode.HALF_UP)
      .setScale(n, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** The (n−1)·p order-statistic interpolation both engines declare:
    * weighted blend of the two bracketing order statistics. Matches
    * Spark's Percentile aggregate formulation (lower·(hi−pos) +
    * higher·(pos−lo)); any algebraically-equivalent form lands within an
    * ulp, which the 10-dp decimal round absorbs for ≤4-dp-exact targets.
    */
  private def pct(values: Seq[Double], p: Double): Double = {
    val sorted = values.sorted.toIndexedSeq
    val pos = p * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) * (hi - pos) + sorted(hi) * (pos - lo)
  }

  /** Flipped rank conventions — present ONLY for the automated TEETH
    * check (VERDICT r08 #5, replacing the manual sed-flip ritual): the
    * teeth test asserts each flip CHANGES the expected series on the
    * generated corpora. If a generator edit stops planting the seams
    * (e.g. all groups land where the conventions coincide, or the value
    * pool degenerates to a constant), or if `pct` itself drifts toward
    * one of these conventions, the flip becomes invisible and the suite
    * goes red — the property the manual check used to verify by hand.
    */
  private def pctFloorOnly(values: Seq[Double], p: Double): Double = {
    val sorted = values.sorted.toIndexedSeq
    sorted(math.floor(p * (sorted.length - 1)).toInt) // nearest-rank-down, no blend
  }
  private def pctNBase(values: Seq[Double], p: Double): Double = {
    val sorted = values.sorted.toIndexedSeq
    val pos = math.min(p * sorted.length, (sorted.length - 1).toDouble) // n·p, not (n−1)·p
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo) else sorted(lo) * (hi - pos) + sorted(hi) * (pos - lo)
  }

  // ≤2-dp pool: central mass plus rare extremes (so Tukey fences and the
  // 3·MAD rule actually flag something) and negatives.
  private val pool = Vector(
    -12.75, -3.5, -3.5, 0.0, 0.25, 0.25, 1.5, 2.75, 7.5, 7.5, 19.99, 250.0)

  // Seam sizes: 1 and 2 (degenerate groups); 5 and 9 ((n−1)·0.25 integral);
  // 11 and 21 ((n−1)·0.5 and ·0.9 integral); 49 (nothing integral, every p
  // interpolates).
  private val seamSizes = Seq(1, 2, 5, 9, 11, 21, 49)

  private def groups(rnd: scala.util.Random): Map[String, Seq[Double]] =
    seamSizes.zipWithIndex.map { case (n, i) =>
      f"g$i%02d" -> Seq.fill(n)(pool(rnd.nextInt(pool.size)))
    }.toMap

  private def assertSeams(gs: Map[_, Seq[Double]]): Unit = {
    val sizes = gs.values.map(_.size).toSet
    assert(sizes.contains(1) && sizes.contains(2), "degenerate groups missing")
    for (p <- Seq(0.25, 0.5, 0.75, 0.9)) {
      assert(gs.values.exists(g => g.size > 1 && (p * (g.size - 1)) % 1.0 == 0.0),
        s"no group with integral (n-1)*$p — frac=0 seam defanged")
      assert(gs.values.exists(g => (p * (g.size - 1)) % 1.0 != 0.0),
        s"no group interpolating at p=$p — blend seam defanged")
    }
    assert(gs.values.exists(g => g.size >= 5 && g.distinct.size <= g.size / 2),
      "no duplicate-heavy group — tie seam defanged")
    assert(gs.values.flatten.exists(_ < 0), "no negative values")
  }

  for (seed <- Seq(11L, 907L)) {

    test(s"TEETH: flipped rank conventions are visible on this corpus (seed $seed)") {
      val gs = groups(new scala.util.Random(seed))
      assertSeams(gs)
      // The exact series the comparison tests consume: every (group, p)
      // cell after the queries' own 4-dp decimal round.
      def series(f: (Seq[Double], Double) => Double): Seq[Double] =
        for {
          p <- Seq(0.25, 0.5, 0.75, 0.9)
          (_, vs) <- gs.toSeq.sortBy(_._1)
          if vs.size > 1 // n=1 is identical under every convention by design
        } yield roundN(f(vs, p), 4)
      assert(series(pct) != series(pctFloorOnly),
        "dropping interpolation changed nothing — blend seam carries no signal")
      assert(series(pct) != series(pctNBase),
        "switching the rank base to n·p changed nothing — base seam carries no signal")
    }

    test(s"agg_percentile matches the order-statistic reference (seed $seed)") {
      import spark.implicits._
      val gs = groups(new scala.util.Random(seed))
      assertSeams(gs)
      val dir = Files.createTempDirectory("graft-pct-fuzz-").toString
      gs.toSeq.flatMap { case (seg, vs) => vs.map(v => (seg, v)) }
        .toDF("c_mktsegment", "c_acctbal")
        .write.parquet(s"$dir/customer.parquet")

      val expected = gs.toSeq.sortBy(_._1).map { case (seg, vs) =>
        (seg, roundN(pct(vs, 0.5), 3), roundN(pct(vs, 0.9), 3))
      }
      val got = Registry.queries("agg_percentile")(spark, dir).collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
      assert(got === expected)
    }

    test(s"agg_describe matches the order-statistic reference (seed $seed)") {
      import spark.implicits._
      val gs = groups(new scala.util.Random(seed * 31 + 7))
      assertSeams(gs)
      val dir = Files.createTempDirectory("graft-desc-fuzz-").toString
      gs.toSeq.flatMap { case (pr, vs) => vs.map(v => (pr, v)) }
        .toDF("o_orderpriority", "o_totalprice")
        .write.parquet(s"$dir/orders.parquet")

      val expected = gs.toSeq.sortBy(_._1).map { case (pr, vs) =>
        val sum4 = vs.map(v => BigDecimal(java.math.BigDecimal.valueOf(v))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
        (pr, vs.size.toLong, roundN(sum4.toDouble / vs.size, 4),
          roundN(pct(vs, 0.25), 4), roundN(pct(vs, 0.5), 4),
          roundN(pct(vs, 0.75), 4), vs.min, vs.max)
      }
      val got = Registry.queries("agg_describe")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))).toSeq
      assert(got === expected)
    }

    test(s"agg_tukey_outliers and ts_anomaly_mad match the reference (seed $seed)") {
      import spark.implicits._
      val rnd = new scala.util.Random(seed * 131 + 17)
      // One events table serves both queries: event_type carries the seam
      // group sizes for the Tukey fences; user_id independently re-blocks
      // the SAME rows (shuffled assignment, so the two groupings are
      // uncorrelated) with its own seam sizes for the MAD rule.
      val etPlan = seamSizes.zipWithIndex.flatMap { case (n, i) =>
        Seq.fill(n)(f"t$i%02d") }
      val uidPlan = rnd.shuffle(seamSizes.zipWithIndex.flatMap { case (n, i) =>
        Seq.fill(n)(100L + i) })
      val vals = Seq.fill(etPlan.size)(pool(rnd.nextInt(pool.size)))
      val base = 1704067200L * 1000000000L
      val rows = etPlan.indices.map(i =>
        (base + i * 1000000000L, uidPlan(i), etPlan(i), vals(i)))
      val byType = rows.groupBy(_._3).map { case (k, g) => k -> g.map(_._4) }
      val byUser = rows.groupBy(_._2).map { case (k, g) => k -> g.map(_._4) }
      assertSeams(byType)
      assertSeams(byUser)

      val dir = Files.createTempDirectory("graft-mad-fuzz-").toString
      rows.toDF("ts", "user_id", "event_type", "value")
        .write.parquet(s"$dir/events.parquet")

      val expTukey = byType.toSeq.sortBy(_._1).map { case (et, vs) =>
        val q1 = roundN(pct(vs, 0.25), 4); val q3 = roundN(pct(vs, 0.75), 4)
        val fence = 1.5d * (q3 - q1)
        (et, vs.count(v => v < q1 - fence || v > q3 + fence).toLong, vs.size.toLong)
      }
      assert(expTukey.exists(_._2 > 0), "no Tukey outlier anywhere — fence seam defanged")
      val gotTukey = Registry.queries("agg_tukey_outliers")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(gotTukey === expTukey)

      val expMad = byUser.toSeq.sortBy(_._1).map { case (u, vs) =>
        val med = roundN(pct(vs, 0.5), 4)
        val adev = vs.map(v => math.abs(v - med))
        val mad = roundN(pct(adev, 0.5), 4)
        (u, med, mad, adev.count(_ > 3.0d * mad).toLong)
      }
      assert(expMad.exists(_._4 > 0), "no MAD outlier anywhere — threshold seam defanged")
      val gotMad = Registry.queries("ts_anomaly_mad")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3))).toSeq
      assert(gotMad === expMad)
    }
  }
}
