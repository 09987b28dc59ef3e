package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** AQE-FINAL exchange ratchet for the shuffle-heavy top 10 (VERDICT r12
  * #1). ExchangeBudgetSpec pins every query's INITIAL physical plan —
  * but AQE re-planning (runtime broadcast demotion/promotion, skew-join
  * splitting, stage reuse) is exactly where a 100 TB plan can silently
  * change shape AFTER the initial pin passes. This suite EXECUTES each
  * audited query to completion and pins what actually ran: the distinct
  * materialized stage counts of `AdaptiveSparkPlanExec`'s final plan,
  * recorded in a committed golden file (aqe-budget.tsv).
  *
  * Counting methodology: after `collect()`, the executed-plan string
  * renders every materialized exchange as `ShuffleQueryStage <id>` /
  * `BroadcastQueryStage <id>`; DISTINCT ids are counted, so a stage that
  * feeds several parents (AQE subtree reuse) counts once — the number
  * pinned is "shuffles/broadcasts that physically ran", which is the
  * 100 TB cost. Reuse markers (`ReusedExchange`/duplicate stage ids) are
  * pinned separately so a lost reuse is visible even when the stage
  * count happens to stay equal. Stage ids never appear in the
  * `== Initial Plan ==` section the adaptive plan string also renders,
  * so the counts are immune to that duplication (unlike raw `Exchange`
  * counting, which is why ExchangeBudgetSpec's counter cannot be reused
  * here). Scalar-subquery subtrees carry their own adaptive plans and
  * are out of scope — same fixed-methodology caveat as the initial-plan
  * budget: this is a drift detector, not an absolute census.
  *
  * The audited set is VERDICT r12's five most expensive queries plus the
  * next five shuffle-heavy ones from the same ranking — the queries where
  * an AQE shape change costs the most at scale.
  *
  * Update workflow (same as every golden-file ratchet here): when a plan
  * change is INTENTIONAL, re-run with `SPARK_GRAFT_UPDATE_AQE_BUDGET=1`
  * to regenerate src/test/resources/aqe-budget.tsv, then justify the
  * diff in the commit message. The git diff of the golden file IS the
  * review surface.
  */
class AqeBudgetSpec extends SparkSpec {

  private val budgetPath = Paths.get("src/test/resources/aqe-budget.tsv")

  private val audited = Seq(
    "dedup_components", "dedup_ngram_jaccard", "dedup_jaccard_pairs",
    "text_langid_chargram", "sub_recursive_cte", "join_asof_nearest",
    "sub_lateral", "dedup_minhash_verified", "sim_ann_ivf",
    "dedup_simhash_pairs")

  /** (distinct shuffle stages, distinct broadcast stages, reuse markers)
    * from an EXECUTED plan string. Reuse = explicit Reused* nodes plus
    * stage ids appearing more than once (AQE prints a multi-parent stage
    * under each parent with the same id).
    */
  private def finalStageCounts(plan: String): (Int, Int, Int) = {
    val shuffleIds = "ShuffleQueryStage (\\d+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    val broadcastIds = "BroadcastQueryStage (\\d+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    val explicitMarkers = "ReusedExchange|ReusedQueryStage".r.findAllIn(plan).size
    val idReuse = (shuffleIds.size - shuffleIds.distinct.size) +
      (broadcastIds.size - broadcastIds.distinct.size)
    (shuffleIds.distinct.size, broadcastIds.distinct.size, explicitMarkers + idReuse)
  }

  private def measure(name: String): (Int, Int, Int) = {
    val df = Registry.queries(name)(spark, sf0001)
    df.collect()
    finalStageCounts(df.queryExecution.executedPlan.toString)
  }

  test("the AQE-final counter has teeth: an injected extra shuffle is visible") {
    // Teeth convention: prove the counter registers the regression class
    // it guards against, on the FINAL plan of a genuinely executed query
    // — not the initial plan ExchangeBudgetSpec's teeth already cover.
    import org.apache.spark.sql.functions._
    def shuffleStages(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      finalStageCounts(df.queryExecution.executedPlan.toString)._1
    }
    val agg = spark.range(100).toDF("id").groupBy(col("id") % 7)
      .count().withColumnRenamed("count", "n")
    val base = shuffleStages(agg)
    assert(base >= 1, "aggregation produced no materialized shuffle stage")
    assert(shuffleStages(agg.repartition(8, col("n"))) === base + 1,
      "counter blind to an injected repartition in the AQE-final plan")
  }

  test("initial-plan exchange counts are invariant to shuffle-partition count") {
    // Scale-robustness teeth (VERDICT r12 "what's missing" #1 — no real
    // cluster exists here, so pin the property a cluster would change
    // first): every committed budget is measured under the test session's
    // spark.sql.shuffle.partitions=4, but a production cluster runs
    // hundreds. Partition COUNT must parameterize the exchanges, never
    // CREATE or REMOVE them — if a plan's shape depended on the setting,
    // the golden files would be artifacts of the harness, not properties
    // of the queries. Rebuild the ten audited queries in a sibling
    // session at 64 partitions and require identical initial-plan
    // exchange counts — for the ENTIRE registry, not just the audited
    // ten: plan building is cheap and a partition-dependent shape
    // anywhere is a harness artifact. (Initial plans, not AQE-final: at
    // sf0.001 AQE legitimately coalesces differently per partition
    // count; the static shape is the partition-independent observable.)
    val s64 = spark.newSession()
    s64.conf.set("spark.sql.shuffle.partitions", "64")
    def counts(s: org.apache.spark.sql.SparkSession, name: String): (Int, Int) = {
      val p = Registry.queries(name)(s, sf0001).queryExecution.executedPlan.toString
      ("(?<![A-Za-z])Exchange ".r.findAllIn(p).size,
        "(?<![A-Za-z])BroadcastExchange".r.findAllIn(p).size)
    }
    val drifted = Registry.all.map(_.name).sorted.flatMap { n =>
      val at4 = counts(spark, n)
      val at64 = counts(s64, n)
      if (at4 != at64) Some(s"$n: partitions=4 -> $at4, partitions=64 -> $at64") else None
    }
    assert(drifted.isEmpty,
      s"plan shape depends on shuffle-partition count:\n  ${drifted.mkString("\n  ")}")
  }

  test("audited queries' AQE-final stage counts match the committed budget") {
    val actual: Seq[(String, (Int, Int, Int))] =
      audited.sorted.map(n => n -> measure(n))
    if (sys.env.contains("SPARK_GRAFT_UPDATE_AQE_BUDGET")) {
      val lines = ("# query\tshuffle_stages\tbroadcast_stages\treuse_markers — " +
        "AQE-final distinct materialized stages; regenerate with " +
        "SPARK_GRAFT_UPDATE_AQE_BUDGET=1 sbt 'testOnly graft.AqeBudgetSpec'") +:
        actual.map { case (n, (s, b, r)) => s"$n\t$s\t$b\t$r" }
      Files.createDirectories(budgetPath.getParent)
      Files.write(budgetPath, lines.asJava)
      info(s"rewrote $budgetPath with ${actual.size} entries")
    }
    assert(Files.exists(budgetPath),
      s"$budgetPath missing — run once with SPARK_GRAFT_UPDATE_AQE_BUDGET=1 to seed it")
    val expected: Map[String, (Int, Int, Int)] = Files.readAllLines(budgetPath).asScala
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map { l => val f = l.split("\t"); f(0) -> ((f(1).toInt, f(2).toInt, f(3).toInt)) }.toMap

    val missing = actual.map(_._1).filterNot(expected.contains)
    val stale = expected.keys.toSeq.filterNot(actual.map(_._1).contains)
    val drifted = actual.flatMap { case (n, got) =>
      expected.get(n).collect { case want if want != got =>
        s"$n: (shuffle, broadcast, reuse) $want -> $got"
      }
    }
    assert(missing.isEmpty && stale.isEmpty && drifted.isEmpty,
      s"""AQE-final budget drift (intentional? regenerate the golden file and justify in the commit):
         |  unbudgeted queries: ${missing.mkString(", ")}
         |  stale budget rows:  ${stale.mkString(", ")}
         |  drifted counts:
         |    ${drifted.mkString("\n    ")}""".stripMargin)
  }
}
