package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[graft.functions.TopKNeighbors]] — the round-20 bounded top-k buffer
  * that replaced the per-query `row_number` window in sim_cosine_topk /
  * sim_knn_label (VERDICT r19 #1). Two layers of teeth, matching the
  * BottomTwo/SecondMax discipline:
  *
  *   1. randomized differential fuzz: fold+merge over an arbitrary split
  *      equals an independently-written sort-take-K reference (the
  *      reference canonicalizes −0.0 then Double.compare's; the buffer
  *      compares with explicit tie cases — different code shapes, same
  *      contract);
  *   2. end-to-end parity: the registered sim_cosine_topk output equals
  *      the ORIGINAL r19 window formulation (row_number over
  *      partitionBy(query_id) orderBy(sim DESC, neighbor_id)) re-stated
  *      inline here, on the real sf0.001 fixture.
  */
class TopKNeighborsSpec extends SparkSpec {

  import graft.functions.TopKNeighbors
  import graft.functions.TopKNeighborsTypes.In

  private val K = 5
  private val agg = new TopKNeighbors(K)

  /** Independent reference: total order by (non-null first, canonicalized
    * Double.compare DESC, key ASC), then take K. −0.0 is canonicalized to
    * 0.0 so IEEE-equal zeros tie (Double.compare separates them); all
    * NaNs are already one value to Double.compare (greatest → first under
    * DESC, matching Spark's NaN-greatest sort).
    */
  private def refTopK(vs: Seq[In]): Seq[In] = {
    def canon(x: Double): Double = if (x == 0.0) 0.0 else x
    val ord = Ordering.fromLessThan[In] { (a, b) =>
      if (a.ns != b.ns) !a.ns
      else if (a.ns) a.k < b.k
      else {
        val c = java.lang.Double.compare(canon(a.s), canon(b.s))
        if (c != 0) c > 0 else a.k < b.k
      }
    }
    vs.sorted(ord).take(K)
  }

  test("randomized: fold+merge over arbitrary splits equals sort-take-K") {
    val rnd = new scala.util.Random(271828L)
    // Pool stresses every comparator branch: IEEE-equal zeros, exact
    // duplicates (tie → key), NaN (greatest, ranks first), and a NULL-sim
    // arm (ns=true, sorts last). Keys are unique per trial — neighbor ids
    // are unique within a query group by construction.
    val simPool = Seq(0.0, -0.0, 1.5, 1.5, -1.5, 0.9999, 1.0, Double.NaN)
    for (trial <- 1 to 200) {
      val n = rnd.nextInt(14) // 0..13 values: under-full and over-full buffers
      val vs = rnd.shuffle((0 until n).toList).map { id =>
        if (rnd.nextInt(5) == 0) In(ns = true, 0.0, id.toLong)
        else In(ns = false, simPool(rnd.nextInt(simPool.size)), id.toLong)
      }
      val cut = if (n == 0) 0 else rnd.nextInt(n + 1)
      val (l, r) = vs.splitAt(cut)
      val got = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))).items
      val want = refTopK(vs)
      // In is a flat case class of primitives, but compare via the same
      // canonicalization the reference sorts with: WHICH IEEE-equal zero
      // (or NaN bit pattern) occupies a slot is fold-order dependent and
      // contractually irrelevant — rank and key identity are not.
      def key(v: In): (Boolean, Long, Boolean) = (v.ns, v.k, v.s.isNaN)
      assert(got.map(key) == want.map(key) &&
        got.zip(want).forall { case (g, w) => g.ns || g.s.isNaN || g.s == w.s },
        s"trial $trial: vs=$vs cut=$cut\n got=$got\nwant=$want")
    }
  }

  test("merge caps at K and keeps best-first order across three-way splits") {
    val vs = (0 until 20).map(i => In(ns = false, (i % 7).toDouble, i.toLong))
    val parts = Seq(vs.take(3), vs.slice(3, 11), vs.drop(11))
    val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge)
    val out = agg.finish(merged).items
    assert(out.size == K)
    assert(out == refTopK(vs))
  }

  test("sim_cosine_topk output equals the r19 row_number-window formulation") {
    val spark2 = spark
    import spark2.implicits._
    val e = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val q = broadcast(e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("qe")))
    val c = e.select(col("vec_id").as("neighbor_id"), col("emb").as("ce"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    val oldBody = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", Exact.roundN(
        graft.llm.Similarity.cosine(col("qe"), col("ce")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("query_id", "neighbor_id", "sim")
    val newBody = Registry.queries("sim_cosine_topk")(spark, sf0001)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.toString).getOrElse("NULL"))
    val got = newBody.collect().map(key).toSeq.sorted
    val want = oldBody.collect().map(key).toSeq.sorted
    assert(got.nonEmpty && got == want,
      s"aggregate top-k diverged from the window formulation\n got=$got\nwant=$want")
  }
}
