package graft

import java.nio.file.Files

/** Differential fuzz for the information-theoretic recipes (round-8
  * depth): `text_source_entropy`, `text_source_divergence`, `agg_benford`.
  *
  *  - a single-lang source has entropy EXACTLY 0 (−1·ln1) and a uniform
  *    k-lang source lands on the per-term-rounded ln(k); the reference
  *    replicates the round-8dp-then-decimal-sum discipline term by term;
  *  - a single-source corpus has p == q everywhere → JSD exactly 0;
  *    disjoint-vocabulary sources drive it toward ln 2;
  *  - Benford's digit is that of |value|: sub-1 values land in the
  *    digit-0 bucket, exact powers of ten in digit 1, and a NEGATIVE
  *    value must bucket by magnitude instead of feeding "-" to an ANSI
  *    string→long cast (the job-killer this round's abs() fix removes).
  */
class InfoTheoryFuzzSpec extends SparkSpec {

  private def roundN(v: Double, n: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(10, java.math.RoundingMode.HALF_UP)
      .setScale(n, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  private def docs(rows: Seq[(Long, String, String, String)], dir: String): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source").write.parquet(s"$dir/documents.parquet")
  }

  test("text_source_entropy: single-lang source is exactly 0, uniform " +
    "k-lang source is the rounded ln(k)") {
    val d = Files.createTempDirectory("graft-entropy-fuzz-").toString
    // s1: all docs one lang → 0. s2: 4 langs × 2 docs → uniform ln 4.
    // s3: skewed 3-1.
    val rows = (1 to 5).map(i => (i.toLong, "t", "aa", "s1")) ++
      (for (l <- Seq("aa", "bb", "cc", "dd"); j <- 1 to 2)
        yield ((100 + l.hashCode % 50 + j).toLong, "t", l, "s2")) ++
      (Seq.fill(3)("aa") :+ "bb").zipWithIndex.map { case (l, i) =>
        ((200 + i).toLong, "t", l, "s3") }
    docs(rows.toSeq, d)

    val expected = rows.groupBy(_._4).toSeq.map { case (src, g) =>
      val counts = g.groupBy(_._3).map(_._2.size)
      val total = counts.sum.toDouble
      val sum10 = counts.map { c =>
        val p = c / total
        BigDecimal(java.math.BigDecimal.valueOf(roundN(-p * math.log(p), 8)))
          .setScale(10, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      (src, counts.size.toLong, roundN(sum10.toDouble, 4))
    }.sortBy(_._1)
    val m = expected.map { case (s, n, e) => s -> (n, e) }.toMap
    assert(m("s1")._2 == 0.0d, "single-lang entropy must be exactly 0")
    assert(m("s2")._2 == roundN(4 * roundN(0.25 * math.log(4), 8), 4),
      "uniform 4-lang source must land on the rounded ln 4")
    val got = Registry.queries("text_source_entropy")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
  }

  test("text_source_divergence: a single-source corpus is exactly 0; " +
    "disjoint vocabularies diverge") {
    val d1 = Files.createTempDirectory("graft-jsd-one-").toString
    docs((1 to 6).map(i => (i.toLong, s"w${i % 3} w${i % 2}", "en", "solo")), d1)
    val gotSolo = Registry.queries("text_source_divergence")(spark, d1).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(gotSolo === Seq(("solo", 0.0d)),
      "p == q everywhere must give JSD exactly 0")

    val d2 = Files.createTempDirectory("graft-jsd-two-").toString
    docs(Seq((1L, "xa xb xa", "en", "sA"), (2L, "yc yd yc", "en", "sB")), d2)
    // Replicate: per (source, tok): p = c/t_src, q = c_all/t_all; JSD =
    // 0.5 * Σ roundN(p·ln(2p/(p+q)) + q·ln(2q/(p+q)), 8) in decimal.
    val toks = Seq(("sA", "xa", 2L), ("sA", "xb", 1L), ("sB", "yc", 2L), ("sB", "yd", 1L))
    val tAll = 6.0
    val expected = toks.groupBy(_._1).toSeq.map { case (src, g) =>
      val tSrc = g.map(_._3).sum.toDouble
      val sum10 = g.map { case (_, _, c) =>
        val p = c / tSrc; val q = c / tAll // disjoint: c_all == c
        BigDecimal(java.math.BigDecimal.valueOf(roundN(
          p * math.log(2.0 * p / (p + q)) + q * math.log(2.0 * q / (p + q)), 8)))
          .setScale(10, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      (src, roundN(0.5 * sum10.toDouble, 6))
    }.sortBy(_._1)
    assert(expected.forall(_._2 > 0.02d), "disjoint vocab JSD must be positive and material")
    val got2 = Registry.queries("text_source_divergence")(spark, d2).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got2 === expected)
  }

  test("agg_benford: digit of |value| — sub-1 values bucket at 0, powers " +
    "of ten at 1, negatives by magnitude (not an ANSI cast crash)") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-benford-fuzz-").toString
    val values = Seq(0.42, 0.99, 1.0, 10.0, 100.0, 9.99, 99.5, -37.2, -0.5, 250.0, 777.0)
    values.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("o_orderkey", "o_totalprice")
      .write.parquet(s"$d/orders.parquet")

    def digit(v: Double): Long = math.floor(math.abs(v)).toLong.toString.head.asDigit.toLong
    val counts = values.groupBy(digit).map { case (dg, g) => dg -> g.size.toLong }
    val total = values.size.toDouble
    val expected = counts.toSeq.sorted.map { case (dg, n) =>
      (dg, n, roundN(n / total, 4)) }
    assert(counts(0L) == 3L, "0.42, 0.99 and -0.5 must land in the digit-0 bucket")
    assert(digit(-37.2) == 3L, "negative magnitude seam lost")
    val got = Registry.queries("agg_benford")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
  }
}
