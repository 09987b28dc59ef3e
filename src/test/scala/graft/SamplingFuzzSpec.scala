package graft

import java.nio.file.Files

/** Differential fuzz for the deterministic-sampling family (round-8
  * depth): `scan_sample_hash`, `scan_sample_stratified`,
  * `scan_sample_weighted`, `scan_oversample_balance`. All four ride the
  * portable LCG `(k·1103515245 + 12345) % 2^31 % 100`; the seams:
  *
  *  - NEGATIVE keys make both % steps produce NEGATIVE remainders
  *    (Scala/Spark and DuckDB both use C-style sign-of-dividend
  *    remainder), so every negative remainder passes `< rate` — a
  *    negative-key population samples at a far higher rate. The fixture
  *    never has negative keys; this pins the (identical-on-both-engines)
  *    behavior if one ever appears;
  *  - a stratum SMALLER than the stratified quota keeps every member;
  *  - oversampling's ceil factor: the majority class gets factor 1
  *    (copied once, unchanged), a class at exactly half the majority
  *    gets factor 2 exactly.
  */
class SamplingFuzzSpec extends SparkSpec {

  private def lcg(k: Long): Long = (k * 1103515245L + 12345L) % 2147483648L

  test("scan_sample_hash: LCG replica including negative-key remainders") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-hash-sample-").toString
    val keys = (1L to 400L) ++ Seq(-1L, -7L, -123L, -999L, -54321L)
    val rows = keys.zipWithIndex.map { case (k, i) =>
      (k, if (i % 2 == 0) "A" else "N", (i % 7 + 1).toDouble) }
    rows.toDF("l_orderkey", "l_returnflag", "l_quantity")
      .write.parquet(s"$d/lineitem.parquet")

    val sampled = rows.filter { case (k, _, _) => lcg(k) % 100L < 10L }
    // Seam: at least one negative key has a NEGATIVE remainder and is
    // therefore sampled (remainder < 0 < 10).
    assert(keys.exists(k => k < 0 && lcg(k) % 100L < 0L && lcg(k) % 100L > -100L),
      "no negative-remainder key — the sign-of-dividend seam is unprobed")
    val expected = sampled.groupBy(_._2).toSeq.map { case (fl, g) =>
      val sum4 = g.map(r => BigDecimal(java.math.BigDecimal.valueOf(r._3))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
      (fl, g.size.toLong, sum4.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)
    val got = Registry.queries("scan_sample_hash")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
  }

  test("scan_sample_stratified: small strata keep everything; large strata " +
    "cut at 10 in LCG order") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-strat-sample-").toString
    val docs = (1L to 3L).map(i => (i, "rare")) ++ (10L to 40L).map(i => (i, "big"))
    docs.map { case (id, l) => (id, s"t$id", l, "s0", 1L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (l, g) =>
      g.sortBy { case (id, _) => (lcg(id), id) }.take(10).zipWithIndex
        .map { case ((id, _), i) => (id, l, i + 1L) }
    }.sortBy { case (_, l, rn) => (l, rn) }
    assert(expected.count(_._2 == "rare") == 3, "small stratum must keep all members")
    assert(expected.count(_._2 == "big") == 10)
    val got = Registry.queries("scan_sample_stratified")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("scan_sample_weighted: per-lang rates through the shared LCG") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-weight-sample-").toString
    val docs = (1L to 300L).map(i => (i, if (i % 3 == 0L) "en" else "fr", i % 50))
    docs.map { case (id, l, nc) => (id, s"t$id", l, "s0", nc) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val expected = docs.filter { case (id, l, _) =>
      lcg(id) % 100L < (if (l == "en") 30L else 80L) }
      .groupBy(_._2).toSeq
      .map { case (l, g) => (l, g.size.toLong, g.map(_._3).sum) }
      .sortBy(_._1)
    val got = Registry.queries("scan_sample_weighted")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("scan_oversample_balance: ceil factors — majority 1x, exact-half 2x, " +
    "remainder rounds up") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-oversample-").toString
    // en 12 (majority, factor 1), de 6 (exactly half, factor 2),
    // fr 5 (ceil(12/5) = 3).
    val docs = (1 to 12).map(i => (i.toLong, "en")) ++
      (20 to 25).map(i => (i.toLong, "de")) ++ (30 to 34).map(i => (i.toLong, "fr"))
    docs.map { case (id, l) => (id, s"t$id", l, "s0", 1L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = Registry.queries("scan_oversample_balance")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(("de", 6L, 2L, 12L), ("en", 12L, 1L, 12L), ("fr", 5L, 3L, 15L)),
      "factors must be ceil(majority/n): 2 at exactly half, 3 for 5-of-12")
  }
}
