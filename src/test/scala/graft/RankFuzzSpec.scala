package graft

import java.nio.file.Files

/** Differential fuzz for the rank-arithmetic trio (round-8 depth):
  *
  *  - `win_ntile` re-derives global NTILE(4) through 64 order-aligned
  *    range buckets + per-bucket row_numbers + offsets, claiming
  *    bit-identity with the naive total-order window "for any input".
  *    The claims to break: the hi==lo degenerate path, the least(63)
  *    clamp at v==hi, duplicate values straddling bucket boundaries,
  *    n % 4 in every residue class, n < 4 (q=0: only the first-r-tiles
  *    branch may ever be taken), and one-hot skew (all mass in one
  *    bucket). Reference: sort, position, the SQL NTILE position formula.
  *  - `agg_trimmed_mean` trims with `rn > n/10 && rn <= n - n/10` where
  *    `/` is DOUBLE division in both engines — n<10 keeps asymmetric
  *    tails (n=9 drops only the top row), n=10 vs 11 shift both cuts.
  *    Reference: sort per group, replicate the double-division cuts.
  *  - `agg_mode` pins ties by (count desc, value asc) — a constructed
  *    equal-count group must pick the lexicographically smaller value.
  */
class RankFuzzSpec extends SparkSpec {

  private def roundN(v: Double, n: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(10, java.math.RoundingMode.HALF_UP)
      .setScale(n, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** SQL-standard NTILE over 0-based position p of n rows in k tiles. */
  private def ntile(p: Long, n: Long, k: Long): Long = {
    val q = n / k; val r = n % k
    (if (p < r * (q + 1)) p / (q + 1) else (p - r * (q + 1)) / q + r) + 1
  }

  /** Flipped convention for the automated TEETH check (VERDICT r08 #5):
    * the n % k remainder tiles sit at the BACK instead of the SQL
    * standard's front. Differs from `ntile` at some position whenever
    * r > 0, so `runNtile` asserts the difference for every non-multiple
    * corpus — a reference drifting to this convention, or a future corpus
    * set that only ever exercises n % 4 == 0, both go red.
    */
  private def ntileBack(p: Long, n: Long, k: Long): Long = {
    val q = n / k; val r = n % k
    (if (p < (k - r) * q) (if (q == 0L) 0L else p / q)
     else (p - (k - r) * q) / (q + 1) + (k - r)) + 1
  }

  private def runNtile(rows: Seq[(Long, Double)]): Unit = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ntile-fuzz-").toString
    rows.toDF("c_custkey", "c_acctbal").write.parquet(s"$dir/customer.parquet")
    val n = rows.size.toLong
    val ordered = rows.sortBy { case (k, v) => (v, k) }.zipWithIndex
    val expected = ordered
      .map { case ((k, v), p) => (k, v, ntile(p.toLong, n, 4L)) }
      .sortBy(_._1)
    if (n % 4L != 0L) { // TEETH: for every remainder class the flip must show
      val flipped = ordered
        .map { case ((k, v), p) => (k, v, ntileBack(p.toLong, n, 4L)) }
        .sortBy(_._1)
      assert(expected != flipped,
        s"remainder-at-back flip invisible at n=$n — tile-boundary seam carries no signal")
    }
    val got = Registry.queries("win_ntile")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got === expected, s"n=$n rows=${rows.take(8)}…")
  }

  test("win_ntile: all-equal values take the hi==lo degenerate path") {
    runNtile((1L to 17L).map(k => (k, 42.0)))
  }

  test("win_ntile: n < 4 (q=0) and every n % 4 residue") {
    val rnd = new scala.util.Random(19L)
    val pool = Vector(-7.5, -7.5, 0.0, 0.0, 3.25, 3.25, 3.25, 9.0, 128.0)
    for (n <- Seq(1, 2, 3, 20, 21, 22, 23))
      runNtile((1L to n.toLong).map(k => (k, pool(rnd.nextInt(pool.size)))))
  }

  test("win_ntile: one-hot skew collapses to one bucket, max value hits the clamp") {
    runNtile((1L to 39L).map(k => (k, 0.0)) :+ (40L, 1e6))
    runNtile((1L to 40L).map(k => (k, if (k <= 2) 1e6 else 0.0)))
  }

  test("win_ntile: duplicate-heavy random draws (bucket-boundary straddles)") {
    val rnd = new scala.util.Random(271L)
    val pool = Vector(-3.0, -3.0, -1.5, 0.0, 0.5, 0.5, 0.5, 2.25, 2.25, 64.0)
    for (trial <- 1 to 4) {
      val n = 30 + rnd.nextInt(50)
      runNtile((1L to n.toLong).map(k => (k, pool(rnd.nextInt(pool.size)))))
    }
  }

  test("agg_trimmed_mean: double-division trim cuts across group sizes") {
    import spark.implicits._
    val rnd = new scala.util.Random(577L)
    val pool = Vector(-20.0, 0.25, 0.25, 10.5, 10.5, 99.99, 1000.0)
    // Sizes straddling every cut seam: n<10 (asymmetric: only the top row
    // drops at n=9), n=10, n=11, a multiple of 10, and a large odd n.
    val sizes = Seq(1, 4, 9, 10, 11, 30, 47)
    val groups = sizes.zipWithIndex.map { case (n, i) =>
      f"p$i%02d" -> (1 to n).map(j => (j.toLong + i * 1000L, pool(rnd.nextInt(pool.size))))
    }
    val dir = Files.createTempDirectory("graft-trim-fuzz-").toString
    groups.flatMap { case (pr, rs) => rs.map { case (k, v) => (k, pr, v) } }
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")

    val keptByGroup = groups.sortBy(_._1).map { case (pr, rs) =>
      val n = rs.size
      val cut = n / 10.0d
      pr -> rs.sortBy { case (k, v) => (v, k) }.zipWithIndex
        .collect { case ((_, v), i) if i + 1 > cut && i + 1 <= n - cut => v }
    }
    // An n=1 group trims to NOTHING (1 <= 1 - 0.1 is false) and must
    // vanish from the output entirely, not appear with a NaN mean.
    assert(keptByGroup.exists(_._2.isEmpty), "vanishing n=1 group not exercised")
    // Seam companion: the asymmetric n=9 group must actually drop a row.
    assert(keptByGroup.exists(_._2.size == 8), "n=9 asymmetric trim not exercised")
    // TEETH (VERDICT r08 #5): the same cuts under INTEGER division n/10
    // must keep a different row set for at least one group — n=9/10/11
    // straddle exactly that seam, so if a size edit removes them (or the
    // reference drifts to integer cuts) this goes red.
    val keptIntCut = groups.sortBy(_._1).map { case (pr, rs) =>
      val cut = (rs.size / 10).toDouble
      pr -> rs.sortBy { case (k, v) => (v, k) }.zipWithIndex
        .collect { case ((_, v), i) if i + 1 > cut && i + 1 <= rs.size - cut => v }
    }
    assert(keptByGroup != keptIntCut,
      "integer-division trim cut changed nothing — n∈{9,10,11} seam carries no signal")
    val expected = keptByGroup.filter(_._2.nonEmpty).map { case (pr, kept) =>
      val sum4 = kept.map(v => BigDecimal(java.math.BigDecimal.valueOf(v))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
      (pr, kept.size.toLong, roundN(sum4.toDouble / kept.size, 4))
    }
    val got = Registry.queries("agg_trimmed_mean")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
  }

  test("agg_mode: equal-count tie resolves to the smaller value") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mode-fuzz-").toString
    // Status F: 3×"2-HIGH" vs 3×"1-URGENT" (tie → "1-URGENT" must win,
    // and it is NOT the insertion-order winner). Status O: strict winner.
    val rows = Seq.fill(3)(("F", "2-HIGH")) ++ Seq.fill(3)(("F", "1-URGENT")) ++
      Seq.fill(2)(("O", "5-LOW")) ++ Seq.fill(1)(("O", "1-URGENT"))
    rows.zipWithIndex.map { case ((st, pr), i) => (i.toLong, st, pr) }
      .toDF("o_orderkey", "o_orderstatus", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val got = Registry.queries("agg_mode")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq(("F", "1-URGENT", 3L), ("O", "5-LOW", 2L)))
  }
}
