package graft

import java.nio.file.Files
import scala.math.BigDecimal.RoundingMode

/** Differential fuzz for the vector-similarity family (round-7
  * verification depth). Two seams the driver fixtures (64-dim N(0, 0.1)
  * floats, no dups, no zeros) never reach:
  *
  *  1. The native codegen'd `graft_cosine` expression on adversarial
  *     values — negatives, extreme magnitudes, length-mismatched arrays —
  *     must stay bit-identical to an independent left-to-right reference
  *     fold (the summation-order contract in VectorExpressions.scala),
  *     and must return NULL — not a truncated dot product or NaN — on
  *     the two undefined shapes: mismatched dimensions and a zero-norm
  *     side (the round-9 NULL contract, mirrored by the DuckDB oracle
  *     twin Exact.cosineSqlGuarded).
  *  2. `sim_cosine_topk`'s rank is computed on the 4dp-ROUNDED similarity
  *     with neighbor_id as the tie-break, so vectors whose true cosines
  *     differ only past the 4th decimal must rank by ID, exact duplicates
  *     must tie at 1.0, and ZERO vectors (legal in a 100 TB embedding
  *     corpus: dead inputs, padding rows) must degrade, not crash: the
  *     expression returns NULL for a zero norm (round-9 contract — was
  *     previously NaN that the ANSI decimal cast turned NULL), and NULL
  *     sims sort LAST under the descending rank (pinned here so a conf or
  *     Spark-version change that flips either behavior fails loudly
  *     instead of silently reordering top-k output).
  */
class VectorFuzzSpec extends SparkSpec {

  /** Reference fold in the declared summation order (left-to-right) —
    * independent of both the codegen and HOF paths. None on the undefined
    * shapes (mismatched dims, zero-or-NaN norm), per the round-9 NULL
    * contract extended round-10: `!(norm > 0)` so a NaN norm (from a NaN
    * input element) is NULL too, in BOTH the native expression and the
    * HOF twin.
    */
  private def refCosine(a: Seq[Double], b: Seq[Double]): Option[Double] = {
    if (a.length != b.length) return None
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); nx += a(i) * a(i); ny += b(i) * b(i)
      i += 1
    }
    if (!(nx > 0.0) || !(ny > 0.0)) None
    else Some(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }

  /** Exact.roundN(_, 4) twin: double → decimal(38,10) → round 4 → double,
    * all HALF_UP; NaN → None (the ANSI cast yields NULL).
    */
  private def round4(x: Double): Option[Double] =
    if (x.isNaN) None
    else Some(BigDecimal(x).setScale(10, RoundingMode.HALF_UP)
      .setScale(4, RoundingMode.HALF_UP).toDouble)

  test("native cosine is bit-identical to the reference fold on adversarial vectors") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(5L)
    val cases: Seq[(Seq[Double], Seq[Double])] = Seq(
      (Seq(1e150, -1e150, 2e150), Seq(1e-150, 1e150, -3e150)),  // extreme magnitudes
      (Seq(1e-300, 2e-300), Seq(3e-300, -1e-300)),              // subnormal: x·x underflows
                                                                //  to 0 → zero norm → NULL
      (Seq(-1.0, -2.0, -3.0), Seq(-1.0, -2.0, -3.0)),           // all-negative self
      (Seq(1.0, 2.0, 3.0, 4.0), Seq(1.0, 2.0)),                 // length mismatch → NULL
      (Seq(0.0, 0.0, 0.0), Seq(1.0, 2.0, 3.0)),                 // zero left norm → NULL
      (Seq(1.0, 2.0, 3.0), Seq(0.0, 0.0, 0.0)),                 // zero right norm → NULL
      (Seq(0.3, -0.7), Seq(0.7, 0.3)),                          // orthogonal (0.0, NOT NULL)
      (Seq(Double.NaN, 1.0), Seq(1.0, 2.0)),                    // NaN left norm → NULL
      (Seq(1.0, 2.0), Seq(3.0, Double.NaN))                     // NaN right norm → NULL
    ) ++ (0 until 40).map { _ =>
      (Seq.fill(16)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(9) - 4)),
        Seq.fill(16)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(9) - 4)))
    }
    val df = cases.toDF("a", "b")
    val got = df.select(llm.Similarity.cosine(col("a"), col("b")).as("s"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    // Six undefined shapes: mismatch, both explicit zero vectors, the
    // subnormal pair whose squared norms underflow to 0.0, and the two
    // NaN-element pairs whose norms are NaN — the underflow/NaN NULLs are
    // the contract working as designed (0/0 was never a cosine).
    assert(got.count(_.isEmpty) === 6, "exactly the six undefined shapes must be NULL")
    cases.zip(got).foreach { case ((a, b), g) =>
      val want = refCosine(a, b)
      assert(g.map(java.lang.Double.doubleToRawLongBits) ===
        want.map(java.lang.Double.doubleToRawLongBits),
        s"cosine($a, $b): got $g, reference $want")
    }
  }

  test("native and HOF cosine agree (both NULL) on NaN-containing vectors") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // ADVICE r09: the HOF guard `na > 0d` was NULL for a NaN norm while the
    // native `nx == 0.0` passed NaN through — the two paths disagreed
    // out-of-fixture. Pin the unified contract: one defined result (NULL)
    // from both formulations on every NaN shape, and identical non-NULL
    // bits on clean vectors evaluated alongside them.
    val cases: Seq[(Seq[Double], Seq[Double])] = Seq(
      (Seq(Double.NaN, 1.0, 2.0), Seq(1.0, 2.0, 3.0)),
      (Seq(1.0, 2.0, 3.0), Seq(Double.NaN, 2.0, 3.0)),
      (Seq(Double.NaN, Double.NaN), Seq(Double.NaN, Double.NaN)),
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))  // clean control pair
    )
    val df = cases.toDF("a", "b")
    val rows = df.select(
      llm.Similarity.cosine(col("a"), col("b")).as("native"),
      llm.Similarity.cosineHof(col("a"), col("b")).as("hof")).collect()
    rows.zip(cases).foreach { case (r, c) =>
      val nat = if (r.isNullAt(0)) None else Some(r.getDouble(0))
      val hof = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      assert(nat.map(java.lang.Double.doubleToRawLongBits) ===
        hof.map(java.lang.Double.doubleToRawLongBits),
        s"native/HOF divergence on $c: $nat vs $hof")
    }
    assert(rows.take(3).forall(_.isNullAt(0)), "NaN shapes must be NULL")
    assert(!rows(3).isNullAt(0), "the clean pair must stay defined")
  }

  test("sim_cosine_topk: 4dp-rounded rank, ID tie-breaks, and null-degrading zero vectors") {
    import spark.implicits._
    // Corpus design (queries are vec_id < 10):
    //  - id 0: unit x-axis query
    //  - id 1: ZERO query vector (all sims NaN→NULL)
    //  - ids 2-9: random queries
    //  - id 20: exact duplicate of id 0 (sim 1.0 with it)
    //  - ids 21-24: vectors at angles from id 0 whose cosines agree to
    //    4dp but differ in the 6th decimal (rank must fall to neighbor_id)
    //  - id 25: zero neighbor (NULL sim against every query — ranked last)
    //  - ids 26+: random noise
    val rnd = new scala.util.Random(19L)
    def unitAt(eps: Double): Seq[Float] =
      Seq((1.0 / math.sqrt(1 + eps * eps)).toFloat, (eps / math.sqrt(1 + eps * eps)).toFloat, 0f, 0f)
    val vecs: Seq[(Long, Seq[Float], Int)] =
      Seq(
        (0L, Seq(1f, 0f, 0f, 0f), 0),
        (1L, Seq(0f, 0f, 0f, 0f), 1)) ++
      (2L to 9L).map(i => (i, Seq.fill(4)(rnd.nextGaussian().toFloat), i.toInt % 3)) ++
      Seq(
        (20L, Seq(1f, 0f, 0f, 0f), 0),
        (21L, unitAt(1.000e-5), 1), (22L, unitAt(1.002e-5), 1),
        (23L, unitAt(1.004e-5), 2), (24L, unitAt(1.006e-5), 2),
        (25L, Seq(0f, 0f, 0f, 0f), 0)) ++
      (26L to 40L).map(i => (i, Seq.fill(4)(rnd.nextGaussian().toFloat), i.toInt % 3))
    val dir = Files.createTempDirectory("graft-vec-fuzz-").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // brute force with the declared ordering: sim desc NULLS LAST, id asc
    val asD = vecs.map { case (id, v, _) => id -> v.map(_.toDouble) }.toMap
    val expected = (0L to 9L).flatMap { q =>
      val cands = vecs.map(_._1).filter(_ != q).map { n =>
        (n, refCosine(asD(q), asD(n)).flatMap(round4))
      }
      cands.sortWith { case ((ia, sa), (ib, sb)) =>
        (sa, sb) match {
          case (Some(x), Some(y)) => if (x != y) x > y else ia < ib
          case (Some(_), None)    => true
          case (None, Some(_))    => false
          case (None, None)       => ia < ib
        }
      }.take(5).map { case (n, s) => (q, n, s) }
    }
    val got = Registry.queries("sim_cosine_topk")(spark, dir).collect().map { r =>
      (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }.toSeq
    assert(got === expected)
    // the seams must actually be present in the comparison:
    val q0 = expected.filter(_._1 == 0L)
    assert(q0.head._2 === 20L && q0.head._3 === Some(1.0), "exact duplicate must rank first at 1.0")
    assert(q0.map(_._2).containsSlice(Seq(21L, 22L, 23L, 24L)),
      "4dp-equal cosines must fall back to neighbor_id order")
    val q1 = expected.filter(_._1 == 1L)
    assert(q1.forall(_._3.isEmpty) && q1.map(_._2) === Seq(0L, 2L, 3L, 4L, 5L),
      "zero query vector must yield NULL sims ranked by neighbor_id")
  }
}
