package graft

import java.nio.file.Files

/** Differential fuzz for the IVF family (round-8 depth): `sim_ann_ivf`,
  * `sim_ann_recall`, `sim_kmeans_step`. A plain-Scala replica of the
  * whole pipeline (rounded-cosine assignment with centroid-id tie-break
  * → nprobe=1 cell probe → recall@5 against the exact top-5 → per-cell
  * per-dim mean) runs over an ENGINEERED embedding table:
  *
  *  - vector 21 leans toward centroid 1's axis but is similar to query
  *    8 — the exact top-5 contains it, the cell-0 probe cannot see it,
  *    so recall@5 MUST drop below 1 (an eval harness that never shows a
  *    miss proves nothing);
  *  - vector 22 is EXACTLY equidistant from centroids 0 and 1 (same
  *    arithmetic on both axes) — the assignment tie must go to the
  *    smaller centroid id;
  *  - equal-similarity exact neighbors rank by neighbor_id.
  */
class IvfFuzzSpec extends SparkSpec {

  private def axis(i: Int): Seq[Float] = Seq.tabulate(8)(j => if (j == i) 1.0f else 0.0f)

  /** (vec_id, embedding, label) — 0..7 are the seed centroids, 8..9 the
    * extra queries, 20..22 the planted candidates.
    */
  private val vecs: Seq[(Long, Seq[Float], Int)] =
    (0 until 8).map(i => (i.toLong, axis(i), i)) ++ Seq(
      (8L, axis(0), 0), // query ≅ centroid 0
      (9L, axis(1), 1), // query ≅ centroid 1
      (20L, Seq(0.9f, 0.1f, 0f, 0f, 0f, 0f, 0f, 0f), 0), // cell 0, near q8
      (21L, Seq(0.6f, 0.8f, 0f, 0f, 0f, 0f, 0f, 0f), 1), // cell 1, sim 0.6 to q8
      (22L, Seq(0.5f, 0.5f, 0f, 0f, 0f, 0f, 0f, 0f), 0)) // exact tie → cell 0

  private def roundN(v: Double, n: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(10, java.math.RoundingMode.HALF_UP)
      .setScale(n, java.math.RoundingMode.HALF_UP).doubleValue()

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // Replica of ivfAssigned: nearest seed by (rounded cosine desc, cent_id).
  private lazy val cellOf: Map[Long, Long] = vecs.map { case (id, v, _) =>
    id -> vecs.filter(_._1 < 8).map { case (cid, c, _) =>
      (-roundN(cos(v, c), 4), cid) }.min._2
  }.toMap

  private def byId(id: Long) = vecs.find(_._1 == id).get._2

  // Replica of ivfTop5 and cosineTopK(5).
  private def top5(queryId: Long, sameCellOnly: Boolean): Seq[(Long, Double)] =
    vecs.map(_._1).filter(c => c != queryId &&
        (!sameCellOnly || cellOf(c) == cellOf(queryId)))
      .map(c => (c, roundN(cos(byId(queryId), byId(c)), 4)))
      .sortBy { case (c, s) => (-s, c) }.take(5)

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-ivf-fuzz-").toString
    vecs.toDF("vec_id", "embedding", "label").write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("engineered geometry: tie goes to centroid 0, and the cell probe " +
    "must miss a true neighbor of query 8") {
    assert(cellOf(22L) == 0L, "the equidistant vector must take the smaller centroid")
    assert(cellOf(21L) == 1L)
    val exact8 = top5(8L, sameCellOnly = false).map(_._1).toSet
    val ivf8 = top5(8L, sameCellOnly = true).map(_._1).toSet
    assert(exact8.contains(21L) && !ivf8.contains(21L),
      "vector 21 must be a true neighbor the nprobe=1 probe cannot see")
  }

  test("sim_ann_ivf matches the replica cell probe") {
    val expected = vecs.map(_._1).filter(_ < 10).sorted.flatMap { q =>
      top5(q, sameCellOnly = true).map { case (c, s) => (q, cellOf(q), c, s) }
    }
    val got = Registry.queries("sim_ann_ivf")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
  }

  test("sim_ann_recall matches the replica and shows a genuine miss") {
    val expected = vecs.map(_._1).filter(_ < 10).sorted.map { q =>
      val hits = top5(q, sameCellOnly = false).map(_._1)
        .count(top5(q, sameCellOnly = true).map(_._1).contains)
      (q, hits.toLong, roundN(hits / 5.0, 4))
    }
    assert(expected.exists(_._3 < 1.0d), "no query with recall < 1 — miss seam lost")
    val got = Registry.queries("sim_ann_recall")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
  }

  test("sim_kmeans_step matches the replica per-cell per-dim means") {
    val expected = vecs.groupBy(v => cellOf(v._1)).toSeq.flatMap { case (cell, members) =>
      (0 until 8).map { dim =>
        val xs = members.map(_._2(dim).toDouble)
        val sum10 = xs.map(x => BigDecimal(java.math.BigDecimal.valueOf(x))
          .setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum
        (cell, dim.toLong, xs.size.toLong, roundN(sum10.toDouble / xs.size, 6))
      }
    }.sortBy { case (c, dm, _, _) => (c, dm) }
    val got = Registry.queries("sim_kmeans_step")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
  }
}
