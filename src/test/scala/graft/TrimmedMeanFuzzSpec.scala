package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Differential fuzz for the round-17 `agg_trimmed_mean` scale rewrite
  * (VERDICT r16 #1): the percentile-fence + residual-band-walk formulation
  * must be ROW-IDENTICAL to the old raw-row window formulation it
  * replaced, on every corpus shape that stresses a seam of the new
  * arithmetic:
  *
  *  - boundary-value TIES (the dropped-sum identity's whole premise: which
  *    tied rows are dropped must not matter) — tie-pool and all-equal
  *    corpora put heavy multiplicity exactly on both order statistics;
  *  - NULL prices interacting with a non-trivial bottom cut (nulls rank
  *    FIRST in the old window, so they consume bottom-cut budget before
  *    any value does — `kb = max(0, mb − #nulls)`), including the
  *    nearly-all-null group where the TOP cut swallows every non-null and
  *    the kept mean must be NULL (sum over kept all-null rows), not 0;
  *  - NULL group keys (groupBy keeps them; every internal join is
  *    null-safe);
  *  - adversarially skewed distributions (1e9-scale outlier mass next to
  *    a dense cluster) where a sloppy fence pair would miss the bracket —
  *    the sketch's rank-error bound must hold, and a violated bracket
  *    yields NULL (loud), never a wrong number;
  *  - the small-n seams (n < 10 asymmetric cut, n = 1 vanishing group)
  *    on top of RankFuzzSpec's coverage.
  *
  * The reference is the OLD body verbatim (sort per group with Spark's
  * NULLS FIRST, double-division cuts, per-value decimal(18,4) rounding,
  * sum/count over kept rows), computed in plain Scala. TEETH: a
  * nulls-LAST reference must disagree on the null-heavy corpus — if that
  * seam ever stops carrying signal, the null ordering assertion is
  * decorative and goes red here.
  */
class TrimmedMeanFuzzSpec extends SparkSpec {

  private def roundN(v: Double, n: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(10, java.math.RoundingMode.HALF_UP)
      .setScale(n, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  private def dec4(v: Double): BigDecimal =
    BigDecimal(java.math.BigDecimal.valueOf(v))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)

  /** The old window body in Scala: per group, order by (price, key) with
    * nulls first (or last, for the teeth check), keep ranks in
    * (n/10.0, n − n/10.0], return (n_kept, mean of kept non-null 4dp sums)
    * — mean None when every kept price is null or the group vanishes.
    */
  private def reference(rows: Seq[(Long, Option[String], Option[Double])],
      nullsFirst: Boolean = true): Map[Option[String], (Long, Option[Double])] =
    rows.groupBy(_._2).flatMap { case (pr, rs) =>
      val nullKey = if (nullsFirst) Double.NegativeInfinity else Double.PositiveInfinity
      // java.lang.Double.compare orders NaN above +Inf — same total order
      // as Spark's sort; a raw Ordering[Double] lt would misplace NaN.
      val sorted = rs.sortWith { case ((k1, _, v1), (k2, _, v2)) =>
        val c = java.lang.Double.compare(
          v1.getOrElse(nullKey), v2.getOrElse(nullKey))
        if (c != 0) c < 0
        else if (v1.isEmpty != v2.isEmpty) v1.isEmpty == nullsFirst
        else k1 < k2
      }
      val n = rs.size
      val cut = n / 10.0d
      val kept = sorted.zipWithIndex
        .collect { case ((_, _, v), i) if i + 1 > cut && i + 1 <= n - cut => v }
      if (kept.isEmpty) None
      else {
        val vals = kept.flatten
        val mean =
          if (vals.isEmpty) None
          else Some(roundN(vals.map(dec4).sum.toDouble / kept.size, 4))
        Some(pr -> ((kept.size.toLong, mean)))
      }
    }

  private def run(rows: Seq[(Long, Option[String], Option[Double])])
      : Map[Option[String], (Long, Option[Double])] = {
    val dir = Files.createTempDirectory("graft-trimfuzz-").toString
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderpriority", StringType),
      StructField("o_totalprice", DoubleType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (k, p, v) => Row(k, p.orNull, v.map(Double.box).orNull) }, 4),
      schema).write.parquet(s"$dir/orders.parquet")
    Registry.queries("agg_trimmed_mean")(spark, dir).collect().map { r =>
      Option(r.getString(0)) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    }.toMap
  }

  private def check(rows: Seq[(Long, Option[String], Option[Double])],
      label: String): Unit = {
    val got = run(rows)
    val want = reference(rows)
    assert(got === want, s"$label: rewrite diverges from the window body")
  }

  test("continuous random draws across group sizes (incl. n<10 and n=1)") {
    val rnd = new scala.util.Random(41L)
    val rows = Seq(1, 4, 9, 123, 1000, 2377).zipWithIndex.flatMap { case (n, g) =>
      (1 to n).map(i =>
        (g * 100000L + i, Some(s"p$g"), Some(rnd.nextDouble() * 2000 - 500)))
    }
    check(rows, "continuous")
  }

  test("tie-heavy pools put multiplicity on both order statistics") {
    val rnd = new scala.util.Random(97L)
    val pool = Vector(-7.25, -7.25, 0.0, 0.0, 0.0, 3.5, 3.5, 11.0, 11.0, 250.0)
    val rows = Seq(500, 731).zipWithIndex.flatMap { case (n, g) =>
      (1 to n).map(i => (g * 100000L + i, Some(s"t$g"), Some(pool(rnd.nextInt(pool.size)))))
    }
    check(rows, "ties")
  }

  test("all-equal values collapse fences and band to a single value") {
    check((1 to 200).map(i => (i.toLong, Some("eq"), Some(42.0))), "all-equal")
  }

  test("nulls consume the bottom cut first; nearly-all-null keeps a NULL mean") {
    val rnd = new scala.util.Random(7L)
    // g0: 25% nulls, n=400 → mb=40 cut spends itself on nulls first.
    val g0 = (1 to 400).map { i =>
      (i.toLong, Some("n0"),
        if (i % 4 == 0) None else Some(rnd.nextDouble() * 100))
    }
    // g1: 285 nulls / 15 values, n=300 → kb=0, kt=15: every non-null is
    // trimmed by the top cut; the 240 kept rows are all NULL → mean NULL.
    val g1 = (1 to 300).map { i =>
      (1000000L + i, Some("n1"),
        if (i <= 285) None else Some(rnd.nextDouble() * 10))
    }
    val rows = g0 ++ g1
    // TEETH: the nulls-first contract must be observable — a nulls-LAST
    // reference has to disagree here, or this corpus pins nothing.
    assert(reference(rows) !== reference(rows, nullsFirst = false),
      "null-ordering seam carries no signal on this corpus")
    check(rows, "nulls")
    assert(run(rows)(Some("n1"))._2.isEmpty, "nearly-all-null mean must be NULL")
  }

  test("null group key flows through the null-safe joins") {
    val rnd = new scala.util.Random(13L)
    val rows = (1 to 150).map(i => (i.toLong, None: Option[String],
      Some(rnd.nextDouble() * 50))) ++
      (1 to 40).map(i => (10000L + i, Some("k"), Some(rnd.nextDouble() * 50)))
    check(rows, "null-key")
  }

  test("adversarial skew: outlier mass and dense clusters keep the bracket") {
    val rnd = new scala.util.Random(271L)
    // 90% of mass at ~1e9, a dense 10% cluster in [0,1): both cuts land
    // inside opposite extremes of a wildly skewed sketch.
    val g0 = (1 to 1000).map { i =>
      (i.toLong, Some("skew"),
        Some(if (i <= 900) 1e9 + rnd.nextInt(3) else rnd.nextDouble()))
    }
    // one-hot: a single outlier against constant mass.
    val g1 = (1 to 97).map(i =>
      (100000L + i, Some("hot"), Some(if (i == 1) 1e12 else 5.0)))
    check(g0 ++ g1, "skew")
  }

  test("empty orders table yields an empty result") {
    assert(run(Seq.empty).isEmpty)
  }

  test("ADVICE r17: a violated bracket leaves the walk's boundary NULL — " +
      "never a silent upper-band value") {
    // The band arrays (`arr`) hold BOTH fence bands' values. The walk for
    // the LOWER cut must be bounded to ITS band [f1, f2]: an unbounded
    // p >= f1 filter would keep walking into the upper [g1, g2] band, so
    // a violated bracket (target rank beyond the lower band's mass —
    // unreachable today only because of the percentile_approx rank-error
    // bound) could "hit" at an upper-band value and return a silently
    // wrong trimmed mean instead of the declared loud NULL. Fixture: the
    // lower band [1.0, 2.0] holds 5 rows, the upper band starts at 10.0,
    // and the target rank 7 exceeds the band mass — the boundary struct's
    // value must stay NULL.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((1, 1)).toDF("g", "x").select(
      array(
        struct(lit(1.0d).as("p"), lit(2L).as("c")),
        struct(lit(2.0d).as("p"), lit(3L).as("c")),
        struct(lit(10.0d).as("p"), lit(5L).as("c")),
        struct(lit(11.0d).as("p"), lit(4L).as("c"))).as("arr"),
      lit(1.0d).as("from"), lit(2.0d).as("bandHi"), lit(7L).as("j"))
    val out = df.select(
      graft.operators.Aggregates
        .selectionWalk(col("arr"), col("from"), col("bandHi"), col("j"))("t")
        .as("t")).collect().head
    assert(out.isNullAt(0),
      s"violated bracket hit a wrong upper-band value: ${out.get(0)}")
    // An in-band target still resolves exactly: rank 4 within [1.0, 2.0]
    // lands on the 2.0 run with 2 strictly-below rows.
    val ok = df.select(
      graft.operators.Aggregates
        .selectionWalk(col("arr"), col("from"), col("bandHi"), lit(4L)).as("w"))
      .select(col("w")("t"), col("w")("cb"), col("w")("mu")).collect().head
    assert(ok.getDouble(0) === 2.0 && ok.getLong(1) === 2L && ok.getLong(2) === 3L)
  }
}
