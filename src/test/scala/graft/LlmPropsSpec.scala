package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic invariants of the LLM-pipeline operators (SURVEY §5.4).
  * ScalaCheck generators drive the sampling directly (the scalatestplus
  * bridge artifact is not on the offline classpath).
  */
class LlmPropsSpec extends SparkSpec {

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else a.intersect(b).size.toDouble / a.union(b).size

  private val tokGen = Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d", "e"))

  test("jaccard is symmetric and bounded in [0,1]") {
    val pairs = Gen.zip(tokGen, tokGen)
    (0 until 100).foreach { i =>
      val (x, y) = pairs.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val (a, b) = (x.toSet, y.toSet)
      val s = jaccard(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s === jaccard(b, a))
      assert(jaccard(a, a) === 1.0)
    }
  }

  test("dedup_exact is idempotent: re-deduping survivors changes nothing") {
    val once = Registry.queries("dedup_exact")(spark, sf0001)
    // survivors are distinct doc_ids; applying the same min-per-text grouping
    // to the surviving docs must return them unchanged
    val docs = Tables.documents(spark, sf0001)
    val survivors = once.select("doc_id")
    val again = docs.join(survivors, "doc_id")
      .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    assert(again.count() === survivors.count())
    assert(again.except(survivors).count() === 0)
  }

  test("union_all counts are additive") {
    val o = Tables.orders(spark, sf0001)
    val f = o.filter(col("o_orderstatus") === "F").select("o_custkey")
    val u = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    assert(f.union(u).count() === f.count() + u.count())
  }

  test("limit_topk is a prefix of the full sort") {
    val top = Registry.queries("limit_topk")(spark, sf0001).collect()
    val full = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20).collect()
    assert(top.map(_.toSeq).toSeq === full.map(_.toSeq).toSeq)
  }

  test("cosine similarity of a vector with itself is 1") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val sim = df.select(llm.Similarity.cosine(col("a"), col("b")).as("s"))
      .head().getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
  }

  test("codegen cosine expression is bit-identical to the HOF formulation") {
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.select(col("vec_id").as("qid"), col("v").as("qv")).filter(col("qid") < 20)
    val pairs = q.crossJoin(e.filter(col("vec_id") < 50))
    val diff = pairs.select(
      llm.Similarity.cosine(col("qv"), col("v")).as("native"),
      llm.Similarity.cosineHof(col("qv"), col("v")).as("hof"))
      .filter(col("native") =!= col("hof")) // exact double equality
    assert(diff.count() === 0)
  }

  test("every event lands in exactly one session window") {
    val sessions = Registry.queries("stream_session")(spark, sf0001)
    val total = sessions.agg(sum(col("n_events"))).head().getLong(0)
    assert(total === Tables.events(spark, sf0001).count())
  }
}
