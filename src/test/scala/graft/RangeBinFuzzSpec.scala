package graft

import java.nio.file.Files

/** Differential fuzz for the range-join family (round-7 verification
  * depth, companion to AsofFuzzSpec / StreamWindowFuzzSpec).
  *
  * `join_range_binned` is a structural rewrite — both sides keyed by a
  * coarse bin, bands exploded into every bin they cover, BETWEEN demoted
  * to a residual on an equi-join — whose declared contract is "results
  * identical to the plain BETWEEN semantics". The driver fixtures only
  * hold integer quantities in 1..50, which never exercise the seams of
  * that claim: `l_quantity` is a DOUBLE, so fractional values in the
  * coverage gaps between bands (10.5), values exactly on band and bin
  * edges (10 vs 11, 50), just-outside values (0.999, 50.001), negatives
  * (negative floor division!), zero, far-out-of-range values, and NULLs
  * are all legal inputs. This spec feeds exactly those to the registered
  * query bodies and compares against a brute-force BETWEEN evaluation.
  * `join_range` (broadcast theta formulation, int keys) is checked on the
  * analogous integer edges.
  */
class RangeBinFuzzSpec extends SparkSpec {

  private val bands = Seq((1d, 10d), (11d, 20d), (21d, 30d), (31d, 40d), (41d, 50d))

  /** Adversarial quantity pool; weighted draw keeps every edge present. */
  private def genQuantities(seed: Long): Seq[Option[Double]] = {
    val rnd = new scala.util.Random(seed)
    val edges: Seq[Option[Double]] = Seq(
      Some(1d), Some(10d), Some(11d), Some(20d), Some(50d),      // exact band edges
      Some(0.999d), Some(10.5d), Some(20.25d), Some(40.999d),    // coverage gaps / just outside
      Some(50.001d), Some(0d), Some(-7.5d), Some(-0.5d),         // outside, negative floor
      Some(1000d), Some(10.000001d), Some(49.999999d),
      None)                                                      // NULL never matches
    (0 until 400).map { _ =>
      if (rnd.nextInt(3) == 0) edges(rnd.nextInt(edges.size))
      else Some(rnd.nextInt(60000).toDouble / 1000d - 5d)        // [-5, 55) with 3dp
    }
  }

  for (seed <- Seq(3L, 77L)) {

    test(s"join_range_binned equals plain BETWEEN on adversarial doubles (seed $seed)") {
      import spark.implicits._
      val qs = genQuantities(seed)
      // every structural edge must be present in the corpus
      Seq(1d, 10d, 11d, 10.5d, 50d, 50.001d, -7.5d).foreach(v =>
        assert(qs.contains(Some(v)), s"edge value $v missing from corpus"))
      assert(qs.contains(None), "NULL quantity missing from corpus")
      val dir = Files.createTempDirectory("graft-rangebin-fuzz-").toString
      qs.zipWithIndex.map { case (q, i) => (i.toLong, q) }
        .toDF("l_orderkey", "l_quantity")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

      def countsRef(loInc: Boolean, hiInc: Boolean): Seq[(String, Long)] =
        bands.map { case (lo, hi) =>
          val n = qs.count(_.exists(q =>
            (if (loInc) q >= lo else q > lo) && (if (hiInc) q <= hi else q < hi)))
          (f"q${lo.toInt}%02d_${hi.toInt}", n.toLong)
        }.filter(_._2 > 0L) // inner join: empty bands are absent, not zero
      val expected = countsRef(loInc = true, hiInc = true)
      // TEETH (VERDICT r08 #5): each BETWEEN bound made strict must change
      // the counts — the exact band-edge values asserted above carry the
      // signal; if they stop reaching the corpus, this goes red.
      assert(expected != countsRef(loInc = false, hiInc = true),
        "lower-bound inclusive→strict flip invisible — no value on a band's lo edge")
      assert(expected != countsRef(loInc = true, hiInc = false),
        "upper-bound inclusive→strict flip invisible — no value on a band's hi edge")
      val got = Registry.queries("join_range_binned")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got === expected)
    }

    test(s"join_range equals plain BETWEEN on integer edges (seed $seed)") {
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      val edges = Seq(0, 1, 10, 11, 20, 21, 50, 51, -3, 100)
      val sizes = (0 until 300).map { _ =>
        if (rnd.nextInt(3) == 0) edges(rnd.nextInt(edges.size)) else rnd.nextInt(60) - 4
      }
      val dir = Files.createTempDirectory("graft-range-fuzz-").toString
      sizes.zipWithIndex.map { case (sz, i) => (i.toLong, sz) }
        .toDF("p_partkey", "p_size")
        .write.mode("overwrite").parquet(s"$dir/part.parquet")

      val intBands = Seq((1, 10), (11, 20), (21, 30), (31, 40), (41, 50))
      val expected = intBands.map { case (lo, hi) =>
        (f"band_$lo%02d_$hi%02d", sizes.count(s => s >= lo && s <= hi).toLong)
      }.filter(_._2 > 0L)
      val got = Registry.queries("join_range")(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got === expected)
    }
  }
}
