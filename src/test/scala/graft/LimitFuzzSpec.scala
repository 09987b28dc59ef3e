package graft

import java.nio.file.Files

/** Differential fuzz for the pagination pair (round-8 depth):
  * `limit_topk` and `limit_offset`. Seams:
  *
  *  - ties SPANNING the cut line: identical sort values on both sides of
  *    the top-k / offset boundary must split deterministically by the
  *    declared tie-break keys, not by partition arrival order;
  *  - an offset past the end of the data yields an EMPTY page, and a
  *    partially-filled last page returns only the remaining rows.
  */
class LimitFuzzSpec extends SparkSpec {

  test("limit_topk: a tie across the k-boundary splits by the tie-break keys") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-topk-fuzz-").toString
    // 25 rows at the SAME price — the cut at k=20 falls inside one giant
    // tie, so rows 1..20 by (orderkey, linenumber) must win; plus higher-
    // and lower-priced rows bracketing the tie.
    val rows = Seq((900L, 1L, 50.0)) ++
      (1L to 25L).map(i => (i, 1L, 10.0)) ++ Seq((901L, 1L, 1.0))
    rows.toDF("l_orderkey", "l_linenumber", "l_extendedprice")
      .write.parquet(s"$d/lineitem.parquet")
    val expected = rows.sortBy { case (k, ln, p) => (-p, k, ln) }.take(20)
      .map { case (k, ln, p) => (k, ln, p) }
    val got = Registry.queries("limit_topk")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
    assert(got.head._1 == 900L && got.count(_._3 == 10.0) == 19,
      "the 19 lowest-orderkey tie members must fill the page after the 50.0 row")
  }

  test("limit_offset: pages past the end are empty; the last partial page " +
    "returns the remainder") {
    import spark.implicits._
    // 12 rows: offset 10 + limit 15 → exactly the last 2 rows by the sort.
    val d = Files.createTempDirectory("graft-offset-fuzz-").toString
    val rows = (1L to 12L).map(i => (i, (i % 4) * 100.0)) // ties every 4 rows
    rows.toDF("o_orderkey", "o_totalprice")
      .write.parquet(s"$d/orders.parquet")
    val expected = rows.sortBy { case (k, p) => (-p, k) }.drop(10)
    assert(expected.size == 2)
    val got = Registry.queries("limit_offset")(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expected)

    // Offset beyond the data → empty page, not an error.
    val d2 = Files.createTempDirectory("graft-offset-empty-").toString
    (1L to 5L).map(i => (i, i * 1.0)).toDF("o_orderkey", "o_totalprice")
      .write.parquet(s"$d2/orders.parquet")
    assert(Registry.queries("limit_offset")(spark, d2).collect().isEmpty)
  }
}
