package graft

/** Pins the AQE stage-reuse claim for the four highest-static-exchange
  * queries (VERDICT r10 #5). ExchangeBudgetSpec's counts are STATIC-tree
  * upper bounds; the round-10 audit justified them by measuring that AQE
  * materializes each multi-consumer subtree once at runtime (e.g.
  * text_source_divergence: 10 static exchanges → 9 runtime stages, 2
  * reuse markers). That measurement lived only in BASELINE.md prose — a
  * regression that breaks subtree reuse (a nondeterministic expression
  * sneaking into the shared base makes the subtrees semantically unequal,
  * so AQE re-executes the scan+aggregate base per consumer) would have
  * passed every test and only surfaced in a future manual audit. This
  * suite runs each audited query to completion and asserts the FINAL
  * adaptive plan actually reuses at least one exchange/stage.
  */
class AqeReuseSpec extends SparkSpec {

  /** (static exchange count, runtime reuse marker count) — the query is
    * executed (collect) so AdaptiveSparkPlanExec reaches its final plan,
    * then reuse is read from the final plan string: AQE prints a reused
    * subtree as a `ReusedExchange`/`ReusedQueryStage` node, and a stage
    * feeding several parents re-appears under one stage id.
    */
  private def reuseStats(name: String): (Int, Int) = {
    val df = Registry.queries(name)(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val static = "(?<![A-Za-z])Exchange ".r.findAllIn(plan).size
    val explicitMarkers = "ReusedExchange|ReusedQueryStage".r.findAllIn(plan).size
    val stageIds = "(?:Shuffle|Broadcast)QueryStage (\\d+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    val idReuse = stageIds.size - stageIds.distinct.size
    (static, explicitMarkers + idReuse)
  }

  for (q <- Seq("text_source_divergence", "behavior_lift", "sim_ann_recall")) {
    test(s"$q reuses its shared subtree at runtime under AQE") {
      val (static, reuse) = reuseStats(q)
      assert(reuse >= 1,
        s"$q: $static static exchanges but ZERO runtime reuse markers — " +
          "the shared base is being re-executed per consumer (did a " +
          "nondeterministic expression make the subtrees unequal?)")
    }
  }

  /** The fourth audited DAG is the corrected finding, not a reuse pin:
    * AQE stage reuse does NOT fire for agg_chi_square's
    * agg-over-agg-with-join-back shape (round-11 measurement, including
    * a plain-column minimal repro — the round-10 audit's reuse assumption
    * was wrong for this class), so the query now materializes its tiny
    * obs matrix once instead. The pinned property is the one that matters
    * at 100 TB: the events PARQUET SCAN must not appear in the final plan
    * at all — it runs exactly once, inside the materialization job, and
    * the four consumers read the checkpointed rows.
    */
  test("agg_chi_square scans events once via materialized obs matrix") {
    val df = Registry.queries("agg_chi_square")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val fileScans = "(?i)Scan parquet|FileScan".r.findAllIn(plan).size
    assert(fileScans == 0,
      s"agg_chi_square's final plan re-scans parquet $fileScans times — " +
        "the obs-matrix materialization is gone, so 100 TB pays one full " +
        s"events scan per consumer:\n$plan")
    assert(plan.contains("ExistingRDD") || plan.contains("LogicalRDD") ||
      "Scan\\b".r.findAllIn(plan).nonEmpty,
      s"expected the checkpointed obs matrix as the only source:\n$plan")
  }
}
