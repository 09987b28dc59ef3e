package graft

import java.nio.file.Files
import java.sql.Timestamp

/** Differential fuzz for the subquery family (round-8 depth):
  * `sub_correlated`, `sub_in_filter`, `sub_lateral`.
  *
  *  - the correlated predicate `price·n > group sum` is STRICT — a
  *    single-order customer (price·1 == sum) and an all-equal-orders
  *    customer (every row at exactly the sum) must emit nothing;
  *  - NOT IN is three-valued: a single NULL key in the excluded subquery
  *    empties the whole result on BOTH engines — the fixture's non-null
  *    keys make the query well-defined, and this pins what the recipe
  *    does when that assumption breaks (same collapse, no crash);
  *  - the LATERAL top-1 drops order-less customers entirely (inner
  *    lateral, not left) and breaks same-date ties by the higher
  *    orderkey (both sort keys DESC).
  */
class SubqueryFuzzSpec extends SparkSpec {

  private def ts(dt: String) = Timestamp.valueOf(s"$dt 00:00:00")

  private def writeTables(dir: String,
      customers: Seq[(Long, String)],
      orders: Seq[(Long, Option[Long], String, String, Double, String)]): Unit = {
    import spark.implicits._
    customers.toDF("c_custkey", "c_name").write.parquet(s"$dir/customer.parquet")
    orders.map { case (ok, ck, pr, st, p, dt) => (ok, ck, pr, st, p, ts(dt)) }
      .toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_orderstatus",
        "o_totalprice", "o_orderdate")
      .write.parquet(s"$dir/orders.parquet")
  }

  test("sub_correlated: price*n > sum is strict — single-order and " +
    "all-equal customers emit nothing") {
    val d = Files.createTempDirectory("graft-subcorr-fuzz-").toString
    val orders = Seq(
      (1L, Some(10L), "3-MEDIUM", "O", 50.0, "1996-01-05"), // single order
      (2L, Some(20L), "3-MEDIUM", "O", 30.0, "1996-01-06"), // all equal ×3
      (3L, Some(20L), "3-MEDIUM", "O", 30.0, "1996-01-07"),
      (4L, Some(20L), "3-MEDIUM", "O", 30.0, "1996-01-08"),
      (5L, Some(30L), "3-MEDIUM", "O", 10.0, "1996-01-09"), // mixed: 10+40
      (6L, Some(30L), "3-MEDIUM", "O", 40.0, "1996-01-10"))
    writeTables(d, Seq((10L, "a"), (20L, "b"), (30L, "c")), orders)
    // Only order 6 qualifies: 40·2 = 80 > 50; order 5: 10·2 = 20 < 50;
    // single-order and all-equal rows sit exactly AT the sum.
    val got = Registry.queries("sub_correlated")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq((6L, 30L, 40.0)))
  }

  test("sub_in_filter: normal routing, then a NULL in the NOT-IN set " +
    "empties the result (three-valued logic, no crash)") {
    val d = Files.createTempDirectory("graft-subin-fuzz-").toString
    val base = Seq(
      (1L, Some(1L), "1-URGENT", "O", 10.0, "1996-01-05"),
      (2L, Some(2L), "1-URGENT", "O", 10.0, "1996-01-05"),
      (3L, Some(3L), "1-URGENT", "O", 10.0, "1996-01-05"),
      (4L, Some(2L), "5-LOW", "F", 10.0, "1996-01-05"))
    val custs = (1L to 4L).map(k => (k, s"c$k"))
    writeTables(d, custs, base)
    val got = Registry.queries("sub_in_filter")(spark, d).collect()
      .map(r => r.getLong(0)).toSeq
    assert(got === Seq(1L, 3L), "customer 2 must be excluded by the NOT IN")

    val d2 = Files.createTempDirectory("graft-subin-null-").toString
    writeTables(d2, custs,
      base :+ ((5L, None: Option[Long], "5-LOW", "F", 10.0, "1996-01-05")))
    val gotNull = Registry.queries("sub_in_filter")(spark, d2).collect()
    assert(gotNull.isEmpty,
      "a NULL key in the NOT-IN subquery must empty the result — the " +
        "standard three-valued collapse, identically on both engines")
  }

  test("sub_lateral: order-less customers drop; same-date ties take the " +
    "higher orderkey") {
    val d = Files.createTempDirectory("graft-sublat-fuzz-").toString
    val orders = Seq(
      (1L, Some(10L), "3-MEDIUM", "O", 11.0, "1996-01-05"),
      (2L, Some(10L), "3-MEDIUM", "O", 22.0, "1996-01-05"), // same date, higher key wins
      (3L, Some(20L), "3-MEDIUM", "O", 33.0, "1996-02-01"),
      (4L, Some(20L), "3-MEDIUM", "O", 44.0, "1996-01-15")) // older → loses
    writeTables(d, Seq((10L, "a"), (20L, "b"), (30L, "orderless")), orders)
    val got = Registry.queries("sub_lateral")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq((10L, 2L, 22.0), (20L, 3L, 33.0)),
      "tie must take the higher orderkey; customer 30 must be absent")
  }
}
