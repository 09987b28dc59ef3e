package graft

import java.nio.file.Files

/** Differential fuzz for the per-user sequence family (round-8 depth,
  * extending VERDICT r07's program to the remaining rewrite-vs-oracle
  * recipes with no dedicated fuzz): `ts_ffill`, `ts_ewma`, `ts_drawdown`
  * all walk a user's events in event_id order, and each owns seams the
  * fixture's near-continuous `value` column barely probes:
  *
  *  - ts_ffill masks `value >= 100` — the EXACT-100 boundary decides
  *    mask-vs-keep; leading masked rows must yield NULL fills, an
  *    all-masked user stays NULL throughout;
  *  - ts_ewma renormalizes its 8 truncated taps by the weights actually
  *    present — rows 0..6 of a user and sub-8-event users exercise every
  *    partial-window denominator; the no-rounding bit-identical claim
  *    means the reference must replicate the left-to-right sum order;
  *  - ts_drawdown's running max must hold flat on monotone-increasing
  *    series (drawdown exactly 0) and on all-equal series.
  *
  * Brute force is a plain per-user linear scan; comparisons are exact
  * (`===` on doubles / Option[Double]) — EWMA works because every Spark
  * term is replicated in the identical IEEE operation order, not because
  * of tolerance.
  */
class SequenceFuzzSpec extends SparkSpec {

  /** (event_id, user_id, value) — ts is a schema requirement only. */
  private type Ev = (Long, Long, Double)

  private val pool = Vector(
    -50.0, 0.0, 42.42, 99.99, 100.0, 100.0, 100.01, 250.0, 103.75)

  private def gen(seed: Long): Seq[Ev] = {
    val rnd = new scala.util.Random(seed)
    var id = 0L
    def next(): Long = { id += 1; id }
    val rows = scala.collection.mutable.ArrayBuffer[Ev]()
    // user 0: single event (one-tap EWMA, trivial drawdown/fill)
    rows += ((next(), 0L, pool(rnd.nextInt(pool.size))))
    // user 1: strictly increasing (running max == value, drawdown 0)
    (0 until 12).foreach(i => rows += ((next(), 1L, 100.0 + i * 0.5)))
    // user 2: all equal (ties everywhere in the running max)
    (0 until 9).foreach(_ => rows += ((next(), 2L, 100.0)))
    // user 3: every value below the mask (all fills stay NULL)
    (0 until 10).foreach(_ => rows += ((next(), 3L, 99.0 - rnd.nextInt(40))))
    // user 4: three masked rows FIRST (leading-NULL fill), then mixed
    (0 until 3).foreach(_ => rows += ((next(), 4L, 50.0)))
    (0 until 20).foreach(_ => rows += ((next(), 4L, pool(rnd.nextInt(pool.size)))))
    // users 5-8: random walks, 5..40 events (covers <8 and >8 taps)
    for (u <- 5L to 8L) {
      val n = 5 + rnd.nextInt(36)
      (0 until n).foreach(_ => rows += ((next(), u, pool(rnd.nextInt(pool.size)))))
    }
    rows.toSeq
  }

  private def assertSeams(rows: Seq[Ev]): Unit = {
    val vals = rows.map(_._3)
    assert(vals.contains(100.0) && vals.contains(99.99) && vals.contains(100.01),
      "exact-100 mask boundary and neighbors missing")
    val byUser = rows.groupBy(_._2).map { case (u, g) => u -> g.sortBy(_._1) }
    assert(byUser.exists(_._2.size == 1), "single-event user missing")
    assert(byUser.exists(_._2.size < 8), "sub-8-tap user missing")
    assert(byUser.exists(_._2.size > 8), "full-tap user missing")
    assert(byUser.exists(_._2.forall(_._3 < 100.0)), "all-masked user missing")
    assert(byUser.exists(g => g._2.size > 3 && g._2.take(3).forall(_._3 < 100.0)
      && g._2.exists(_._3 >= 100.0)), "leading-masked-rows user missing")
    assert(byUser.exists(g => g._2.size > 1 &&
      g._2.map(_._3).sliding(2).forall(p => p.head < p.last)),
      "strictly-increasing user missing")
  }

  private def write(rows: Seq[Ev]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-seq-fuzz-").toString
    val base = 1704067200L * 1000000000L
    rows.map { case (id, u, v) => (id, base + id * 1000000000L, u, v) }
      .toDF("event_id", "ts", "user_id", "value")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  for (seed <- Seq(41L, 733L)) {
    lazy val rows = gen(seed)
    lazy val dir = write(rows)
    lazy val byUser = rows.groupBy(_._2).map { case (u, g) => u -> g.sortBy(_._1) }

    test(s"generator plants every declared seam (seed $seed)") {
      assertSeams(rows)
    }

    test(s"ts_ffill equals the brute-force forward-fill scan (seed $seed)") {
      // Reference parameterized by the mask boundary (VERDICT r08 #5):
      // strict=false is the declared `value >= 100` keep rule.
      def ffillRef(strict: Boolean) = byUser.toSeq.sortBy(_._1).flatMap { case (u, g) =>
        var lastKept: Option[Double] = None
        g.map { case (id, _, v) =>
          val masked = if (if (strict) v > 100.0d else v >= 100.0d) Some(v) else None
          if (masked.isDefined) lastKept = masked
          (u, id, masked, lastKept)
        }
      }
      val expected = ffillRef(strict = false)
      // TEETH: the >=→> flip must change the fill — the exact-100 values
      // the seam assertion requires are what carry the signal.
      assert(expected != ffillRef(strict = true),
        "mask-boundary flip invisible — exact-100 values carry no signal")
      val got = Registry.queries("ts_ffill")(spark, dir).collect().map { r =>
        (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))
      }.toSeq
      assert(got === expected)
    }

    test(s"ts_ewma equals the tap-replicated reference (seed $seed)") {
      // Replicates the query's operation ORDER exactly: terms summed left
      // to right starting at value*1.0, absent taps contribute 0.0 to the
      // numerator and 0.0 (not a skipped add) to the denominator.
      val expected = byUser.toSeq.sortBy(_._1).flatMap { case (u, g) =>
        val vs = g.map(_._3).toIndexedSeq
        g.zipWithIndex.map { case ((id, _, v), i) =>
          var num = v * 1.0d
          var den = 1.0d
          for (k <- 1 until 8) {
            num += (if (i - k >= 0) vs(i - k) * math.pow(0.5d, k) else 0.0d)
            den += (if (i - k >= 0) math.pow(0.5d, k) else 0.0d)
          }
          (u, id, v, num / den)
        }
      }
      val got = Registry.queries("ts_ewma")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
      assert(got === expected)
    }

    test(s"ts_drawdown equals the brute-force running-max scan (seed $seed)") {
      val expected = byUser.toSeq.sortBy(_._1).map { case (u, g) =>
        var cummax = Double.NegativeInfinity
        var minDd = Double.PositiveInfinity
        g.foreach { case (_, _, v) =>
          cummax = math.max(cummax, v)
          minDd = math.min(minDd, v - cummax)
        }
        (u, minDd, cummax)
      }
      assert(expected.exists(_._2 == 0.0d),
        "no zero-drawdown user — monotone seam defanged")
      assert(expected.exists(_._2 < 0.0d), "no user with an actual drawdown")
      val got = Registry.queries("ts_drawdown")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
      assert(got === expected)
    }
  }
}
