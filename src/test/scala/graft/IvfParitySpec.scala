package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-21 value-parity pins for the window→bounded-aggregate rewrites
  * (VERDICT r20 #1 / ADVICE r20 #2): the IVF family's nearest-centroid
  * assignment and cell top-5, the LSH bucket top-5, and dedup_embedding's
  * best-prior top-1 each replaced a `row_number` window (per-task sort
  * state ∝ partition size) with the bounded TopKNeighbors aggregate.
  * Each test restates the r20 window body INLINE over the same fixture
  * tables and asserts the registered query returns exactly the same row
  * set — the same discipline TopKNeighborsSpec applied to the r20
  * sim_cosine_topk rewrite. The comparator-level equivalence (DESC NULLS
  * LAST / NaN / tie semantics) is fuzzed in TopKNeighborsSpec; these
  * tests pin the query-level wiring (grouping keys, null-restore of sim,
  * output column order).
  */
class IvfParitySpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(r =>
      (0 until r.length).map(i => Option(r.get(i)).map(_.toString).getOrElse("NULL")))
      .sortBy(_.mkString("|"))

  /** The r20 window-based assignment (restated verbatim). */
  private def windowAssigned(): DataFrame = {
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val cents = broadcast(e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("emb").as("cent")))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cent_id"))
    e.crossJoin(cents)
      .withColumn("csim", Exact.roundN(graft.llm.Similarity.cosine(col("emb"), col("cent")), 4))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("emb"), col("cent_id").as("cell"))
  }

  test("sim_ann_ivf equals the r20 window assignment + window top-5 formulation") {
    val assigned = windowAssigned()
    val q = broadcast(assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"), col("cell")))
    val c = assigned.select(col("vec_id").as("neighbor_id"), col("emb").as("ce"),
      col("cell").as("ccell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    val oldBody = q.join(c, col("cell") === col("ccell") && col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", Exact.roundN(graft.llm.Similarity.cosine(col("qe"), col("ce")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("query_id", "cell", "neighbor_id", "sim")
    val got = rows(Registry.queries("sim_ann_ivf")(spark, sf0001))
    val want = rows(oldBody)
    assert(got.nonEmpty && got == want,
      s"IVF aggregate formulation diverged from the window formulation\n got=$got\nwant=$want")
  }

  test("sim_kmeans_step equals the r20 window-assignment formulation") {
    val oldBody = windowAssigned()
      .select(col("cell"), posexplode(col("emb")).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        Exact.roundN(sum(col("x").cast("decimal(28,10)")).cast("double") /
          count(lit(1)), 6).as("centroid"))
    val got = rows(Registry.queries("sim_kmeans_step")(spark, sf0001))
    val want = rows(oldBody)
    assert(got.nonEmpty && got == want,
      s"k-means assignment diverged from the window formulation\n got=$got\nwant=$want")
  }

  test("sim_ann_lsh equals the r20 window top-5 formulation") {
    val nBits = 8
    val dim = 64
    val planes: Seq[Seq[Double]] = (0 until nBits).map { p =>
      (0 until dim).map { i =>
        val x = ((p.toLong * dim + i) * 1103515245L + 12345L) % 2147483648L
        x.toDouble / 2147483648.0 - 0.5
      }
    }
    val planeLits = array(planes.map(pl => array(pl.map(lit): _*)): _*)
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("planes", planeLits)
      .withColumn("bucket",
        aggregate(
          transform(col("planes"), pl =>
            when(aggregate(zip_with(pl, col("emb"), (x, y) => x * y),
              lit(0.0d), (acc, v) => acc + v) > 0, 1L).otherwise(0L)),
          lit(0L), (acc, b) => acc * 2 + b))
      .drop("planes")
    val q = broadcast(e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"), col("bucket")))
    val c = e.select(col("vec_id").as("neighbor_id"), col("emb").as("ce"),
      col("bucket").as("cbucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    val oldBody = q.join(c, col("bucket") === col("cbucket") && col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", Exact.roundN(graft.llm.Similarity.cosine(col("qe"), col("ce")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("query_id", "neighbor_id", "sim")
    val got = rows(Registry.queries("sim_ann_lsh")(spark, sf0001))
    val want = rows(oldBody)
    assert(got.nonEmpty && got == want,
      s"LSH aggregate top-5 diverged from the window formulation\n got=$got\nwant=$want")
  }

  test("dedup_embedding equals the r20 window top-1 formulation") {
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = broadcast(e.filter(col("vec_id") < 200)
      .select(col("vec_id"), col("v").as("qv")))
    val c = e.select(col("vec_id").as("prior_id"), col("v").as("cv"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("prior_id"))
    val oldBody = q.join(c, col("prior_id") < col("vec_id"))
      .withColumn("sim", Exact.roundN(graft.llm.Similarity.cosine(col("qv"), col("cv")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("prior_id").as("best_prior_id"), col("sim"),
        (col("sim") >= 0.95d).as("is_dup"))
    val got = rows(Registry.queries("dedup_embedding")(spark, sf0001))
    val want = rows(oldBody)
    assert(got.nonEmpty && got == want,
      s"top-1 aggregate diverged from the window formulation\n got=$got\nwant=$want")
  }
}
