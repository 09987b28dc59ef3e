package graft

import java.nio.file.Files

/** De-vacuates `join_anti` (VERDICT r06 #1): at every driver fixture scale
  * the query returns 0 rows (each customer has ≥1 order), so the oracle
  * compare holds vacuously — Spark and DuckDB agree on the empty set even
  * if the join type or direction were flipped. This spec runs the SAME
  * registered query body (via `Registry.queries`, not a re-implementation)
  * over a synthetic fixture where some customers have no orders and asserts
  * the exact survivor set:
  *   - flip left_anti → left_semi: survivors become the even keys → red;
  *   - flip the join direction: `c_name` no longer resolves → red;
  *   - drop the filter entirely: all ten keys survive → red.
  * Orders also contain a custkey (99) absent from customer, so an inverted
  * anti (orders-minus-customers) cannot masquerade as a pass either.
  */
class JoinAntiSpec extends SparkSpec {

  test("join_anti survivors are exactly the order-less customers") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-anti-").toString

    // Schemas mirror the driver fixture columns the query touches
    // (c_custkey int64, c_name string / o_custkey int64).
    (1L to 10L).map(k => (k, s"Customer#$k"))
      .toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    // Even customers have orders; 99 has an order but no customer row.
    (Seq(2L, 4L, 6L, 8L, 10L, 99L).zipWithIndex.map { case (ck, i) =>
      (i.toLong + 1000L, ck)
    }).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val got = Registry.queries("join_anti")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSeq

    val want = Seq(1L, 3L, 5L, 7L, 9L).map(k => (k, s"Customer#$k"))
    assert(got === want, "anti-join survivor set diverged from the " +
      "order-less customers — join type/direction changed?")
  }
}
