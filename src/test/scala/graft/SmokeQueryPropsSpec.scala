package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Property pins for the three smoke-only queries (round-7 verification
  * depth). SURVEY §2 B.4/B.10 exempts them from the DuckDB oracle —
  * approximate or non-portable hash families — so until now their only
  * guarantees were "returns rows" (driver smoke) and plan-shape pins
  * (PlanSpec). Each gets the strongest property its semantics admit:
  *
  *   - agg_approx_distinct: the HLL estimate must land within the sketch's
  *     documented error envelope of the exact distinct count;
  *   - dedup_minhash: the LSH identity guarantee — equal token SETS have
  *     equal signatures, hence equal band keys, hence one cluster with
  *     exact-Jaccard 1.0 — on a planted corpus, with disjoint docs absent;
  *   - sim_ann_lsh: reported neighbors must share the query's hyperplane
  *     sign bucket (recomputed independently on the driver), sims must be
  *     the true 4dp cosines, and a planted exact duplicate of a query
  *     vector must be retrieved at sim 1.0 (identical vectors bucket
  *     together by construction).
  */
class SmokeQueryPropsSpec extends SparkSpec {

  test("agg_approx_distinct lands inside the HLL error envelope") {
    val approx = Registry.queries("agg_approx_distinct")(spark, sf0001)
      .head().getLong(0).toDouble
    val exact = Tables.lineitem(spark, sf0001)
      .select(countDistinct(col("l_partkey"))).head().getLong(0).toDouble
    // default rsd is 5%; 4 sigma keeps the assertion meaningful but stable
    assert(math.abs(approx - exact) <= 0.20 * exact,
      s"approx $approx vs exact $exact — outside the HLL envelope")
  }

  test("dedup_minhash clusters equal token sets and ignores disjoint docs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mh-smoke-").toString
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"),   // exact dup of 0
      (2L, "zeta epsilon delta gamma beta alpha"),   // same token SET as 0
      (3L, "one two three four five six"),           // disjoint
      (4L, "seven eight nine ten eleven twelve"))    // disjoint
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Registry.queries("dedup_minhash")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out === Seq((1L, 0L, 1.0), (2L, 0L, 1.0)),
      "equal token sets must cluster under the min doc_id at exact Jaccard 1.0")
  }

  test("sim_ann_lsh neighbors share the query bucket and report true cosines") {
    // replicate the declared hyperplane family on the driver
    val nBits = 8; val dim = 64
    val planes: Seq[Seq[Double]] = (0 until nBits).map { p =>
      (0 until dim).map { i =>
        val x = ((p.toLong * dim + i) * 1103515245L + 12345L) % 2147483648L
        x.toDouble / 2147483648.0 - 0.5
      }
    }
    def bucket(v: Seq[Double]): Long =
      planes.foldLeft(0L) { (acc, pl) =>
        val dot = pl.zip(v).map { case (x, y) => x * y }.sum
        acc * 2 + (if (dot > 0) 1L else 0L)
      }
    def cosine(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < a.length.min(b.length)) {
        dot += a(i) * b(i); nx += a(i) * a(i); ny += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val got = Registry.queries("sim_ann_lsh")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    got.foreach { case (q, n, sim) =>
      assert(bucket(vecs(q)) === bucket(vecs(n)), s"pair ($q,$n) not co-bucketed")
      val want = BigDecimal(cosine(vecs(q), vecs(n)))
        .setScale(10, BigDecimal.RoundingMode.HALF_UP)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(sim === want, s"pair ($q,$n) sim $sim != true cosine $want")
    }
  }

  test("sim_ann_lsh retrieves a planted exact duplicate at sim 1.0") {
    import spark.implicits._
    val rnd = new scala.util.Random(43L)
    val qvec = Seq.fill(64)(rnd.nextGaussian().toFloat)
    val vecs: Seq[(Long, Seq[Float], Int)] =
      Seq((0L, qvec, 0)) ++
        (1L to 30L).map(i => (i, Seq.fill(64)(rnd.nextGaussian().toFloat), i.toInt % 3)) ++
        Seq((31L, qvec, 1)) // exact duplicate of query 0
    val dir = Files.createTempDirectory("graft-lsh-smoke-").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Registry.queries("sim_ann_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val hit = got.filter(p => p._1 == 0L && p._2 == 31L)
    assert(hit.length === 1 && hit.head._3 === 1.0,
      s"duplicate vector not retrieved at 1.0: ${got.filter(_._1 == 0L).toSeq}")
  }
}
