package graft

import org.apache.spark.sql.functions._

/** Invariants for the statistics/curation operators added late in round 2:
  * each checked against a cheap independent recomputation.
  */
class StatsPropsSpec extends SparkSpec {

  test("agg_benford digit shares sum to 1 and digits lie in 1..9") {
    val b = Registry.queries("agg_benford")(spark, sf0001)
    val rows = b.collect()
    assert(rows.forall(r => r.getLong(0) >= 1 && r.getLong(0) <= 9))
    val shareSum = rows.map(_.getDouble(2)).sum
    // 4dp-rounded shares: sum within 9 half-ulps of 1
    assert(math.abs(shareSum - 1.0) < 0.0005 * rows.length)
    val total = rows.map(_.getLong(1)).sum
    assert(total === Tables.orders(spark, sf0001).count())
  }

  test("scan_oversample_balance replicates every class to at least the majority count") {
    val o = Registry.queries("scan_oversample_balance")(spark, sf0001).collect()
    val maxBefore = o.map(_.getLong(1)).max
    o.foreach { r =>
      val (before, factor, after) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(factor >= 1)
      assert(after === before * factor, s"explode must multiply exactly: $r")
      assert(after >= maxBefore, s"class still under-represented: $r")
      assert(after < maxBefore + before, s"over-replicated beyond ceil: $r")
    }
  }

  test("sim_kmeans_step cell populations are dimension-consistent and partition the corpus") {
    val k = Registry.queries("sim_kmeans_step")(spark, sf0001)
    // within a cell every dimension must report the same member count
    val inconsistent = k.groupBy("cell")
      .agg(countDistinct(col("n")).as("nn"), count(lit(1)).as("ndims"))
      .filter(col("nn") =!= 1 || col("ndims") =!= 64)
    assert(inconsistent.count() === 0)
    // cells partition the corpus: per-cell counts (at dim 0) sum to all vectors
    val total = k.filter(col("dim") === 0).agg(sum("n")).head().getLong(0)
    assert(total === Tables.embeddings(spark, sf0001).count())
  }
}
