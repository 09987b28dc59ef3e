package graft

import java.nio.file.Files

/** Differential fuzz for k-NN voting and the grouping-set recipes
  * (round-8 depth): `sim_knn_label`, `agg_cube`, `agg_rollup`.
  *
  *  - the k-NN vote tie (2-2-1 among the top-5) must resolve to the
  *    SMALLER label; the fixture keeps each query's neighbor set exact
  *    by making clusters mutually orthogonal, and equal-similarity
  *    neighbors rank by neighbor_id;
  *  - a status/nation literally named "ALL" collides with the subtotal
  *    marker after the COALESCE — the output keeps BOTH rows apart only
  *    through the grouping() flags, which is exactly what they exist
  *    for. Expected values come from brute-forcing every grouping set.
  */
class KnnCubeFuzzSpec extends SparkSpec {

  test("sim_knn_label: a 2-2 vote tie among the top-5 takes the smaller label") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-knn-fuzz-").toString
    val u = Seq.fill(4)(0.0f).updated(0, 1.0f) // e1
    val w = Seq.fill(4)(0.0f).updated(1, 1.0f) // e2, orthogonal to u
    // Queries 0 (≅ u) and 1 (≅ w); candidates 10-14 ≅ u, 20-24 ≅ w.
    val vecs = Seq(
      (0L, u, 99), (1L, w, 99),
      (10L, u, 5), (11L, u, 5), (12L, u, 3), (13L, u, 3), (14L, u, 9),
      (20L, w, 7), (21L, w, 7), (22L, w, 7), (23L, w, 1), (24L, w, 1))
    vecs.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val got = Registry.queries("sim_knn_label")(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // Query 0: top-5 = {10..14} (sim 1.0, id tie-break) → votes 5:2, 3:2,
    // 9:1 → tie resolves to label 3. Query 1: 7 has a clear 3-vote win.
    assert(got === Seq((0L, 3, 2L), (1L, 7, 3L)),
      "the 2-2 tie must take the smaller label, not the lower neighbor_id's")
  }

  private def money2(vs: Seq[Double]): Double =
    if (vs.isEmpty) 0.0d
    else vs.map(v => BigDecimal(java.math.BigDecimal.valueOf(v))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("agg_cube: a literal 'ALL' status coexists with the subtotal rows, " +
    "split only by the grouping flags") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-cube-fuzz-").toString
    val rows = Seq(
      ("ALL", "1-URGENT", 10.00), ("ALL", "5-LOW", 20.00), // literal "ALL"!
      ("F", "1-URGENT", 40.25), ("F", "5-LOW", 1.75), ("O", "1-URGENT", 7.00))
    rows.zipWithIndex.map { case ((st, pr, p), i) =>
      (i.toLong, st, pr, p, java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) }
      .toDF("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice", "o_orderdate")
      .write.parquet(s"$d/orders.parquet")

    def agg(g: Seq[(String, String, Double)]) = (g.size.toLong, money2(g.map(_._3)))
    val sets = // (status?, priority?, g_status, g_prio)
      rows.groupBy(r => (Some(r._1): Option[String], Some(r._2): Option[String]))
        .map { case ((s0, p0), g) => (s0, p0, 0L, 0L, agg(g)) } ++
      rows.groupBy(r => Some(r._1): Option[String])
        .map { case (s0, g) => (s0, None: Option[String], 0L, 1L, agg(g)) } ++
      rows.groupBy(r => Some(r._2): Option[String])
        .map { case (p0, g) => (None: Option[String], p0, 1L, 0L, agg(g)) } ++
      Seq((None: Option[String], None: Option[String], 1L, 1L, agg(rows)))
    val expected = sets.toSeq.map { case (s0, p0, gs, gp, (n, sp)) =>
      (s0.getOrElse("ALL"), p0.getOrElse("ALL"), gs, gp, n, sp) }
      .sortBy { case (s0, p0, gs, gp, _, _) => (s0, p0, gs, gp) }
    // Seam companion: the literal-ALL data subtotal and the synthetic ALL
    // rows coexist, distinguished only by the flags.
    assert(expected.count(e => e._1 == "ALL" && e._2 == "ALL") == 2,
      "literal-ALL x subtotal collision must produce two distinct rows")
    val got = Registry.queries("agg_cube")(spark, d).collect().map { r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)) }.toSeq
    assert(got === expected)
  }

  test("agg_rollup: a literal 'ALL' nation's subtotal stays separate from " +
    "the grand total") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-rollup-fuzz-").toString
    Seq((1L, "ALL"), (2L, "BETA"))
      .toDF("n_nationkey", "n_name").write.parquet(s"$d/nation.parquet")
    val custs = Seq(
      (10L, 1L, "AUTO"), (11L, 1L, "BIKE"), (12L, 2L, "AUTO"), (13L, 2L, "AUTO"))
    custs.toDF("c_custkey", "c_nationkey", "c_mktsegment")
      .write.parquet(s"$d/customer.parquet")

    val named = custs.map { case (_, nk, seg) => (if (nk == 1L) "ALL" else "BETA", seg) }
    val sets =
      named.groupBy(identity).map { case ((n0, s0), g) =>
        (n0, s0, 0L, 0L, g.size.toLong) } ++
      named.groupBy(_._1).map { case (n0, g) => (n0, "ALL", 0L, 1L, g.size.toLong) } ++
      Seq(("ALL", "ALL", 1L, 1L, named.size.toLong))
    val expected = sets.toSeq.sortBy { case (n0, s0, gn, gs, _) => (n0, s0, gn, gs) }
    assert(expected.count(e => e._1 == "ALL" && e._2 == "ALL") == 2,
      "the literal-ALL nation subtotal must coexist with the grand total")
    val got = Registry.queries("agg_rollup")(spark, d).collect().map { r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)) }.toSeq
    assert(got === expected)
  }
}
