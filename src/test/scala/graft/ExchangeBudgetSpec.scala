package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Registry-wide shuffle-budget ratchet (VERDICT r09 item 4).
  *
  * PlanSpec pins the known-risk plan shapes by hand; this suite guards
  * the other ~190 queries the same way the fuzz teeth work: the Exchange
  * counts of EVERY registered query's physical plan are recorded in a
  * committed golden file, and any drift — a new shuffle slipped into an
  * untested query by a refactor, a broadcast that silently fell back to a
  * shuffle — fails here before it ships. At sf0.001 a stray exchange
  * costs microseconds and no test would notice; at 100 TB it's a
  * full-data shuffle, which is exactly why the count is pinned rather
  * than the runtime.
  *
  * Counted on `executedPlan` (the AQE initial plan): `sparkPlan` is the
  * strategy output BEFORE EnsureRequirements, where exchanges from
  * required distributions don't exist yet, so it would undercount to
  * near-zero. Counts are parsed from the plan string because
  * AdaptiveSparkPlanExec doesn't expose its initial plan as children for
  * `collect`. Scalar-subquery subtrees render as expressions, not
  * operators, so their internal exchanges are out of scope — the budget
  * is a drift detector with a fixed methodology, not an absolute shuffle
  * census.
  *
  * The counts are STATIC-TREE upper bounds on runtime shuffles: a
  * multi-consumer subtree (e.g. text_source_divergence's per-source
  * token counts feeding three aggregations) appears once per consumer in
  * the initial plan, but AQE's stage reuse materializes identical
  * subtrees once — measured on text_source_divergence at sf0.001: 10
  * static exchanges, 9 runtime ShuffleQueryStages with 2 reuse markers,
  * so the expensive scan+explode+aggregate base runs once. Drift in the
  * static count still means a real plan change, which is what's pinned.
  *
  * Update workflow (same as the teeth checks): when a plan change is
  * INTENTIONAL, re-run with `SPARK_GRAFT_UPDATE_EXCHANGE_BUDGET=1` to
  * regenerate src/test/resources/exchange-budget.tsv, then justify the
  * diff in the commit message. The git diff of the golden file IS the
  * review surface.
  */
class ExchangeBudgetSpec extends SparkSpec {

  private val budgetPath = Paths.get("src/test/resources/exchange-budget.tsv")

  /** (shuffle, broadcast) exchange counts in the query's initial physical
    * plan. The negative lookbehind keeps `BroadcastExchange` and
    * `ReusedExchange` out of the shuffle count.
    */
  private def exchangeCounts(name: String): (Int, Int) = {
    val p = Registry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString
    val shuffles = "(?<![A-Za-z])Exchange ".r.findAllIn(p).size
    val broadcasts = "(?<![A-Za-z])BroadcastExchange".r.findAllIn(p).size
    (shuffles, broadcasts)
  }

  test("the exchange counter has teeth: added shuffles are visible") {
    // Teeth convention: before trusting the ratchet, prove the counter
    // registers the regression class it guards against. NOT built on a
    // registry query: bolting .repartition onto one that ends in orderBy
    // does not ADD an exchange — Catalyst's EliminateSorts drops the sort
    // under the repartition, swapping the range exchange for a hash one
    // (net zero; first draft of this test failed exactly that way). A
    // neutral fixture isolates the counter itself.
    import org.apache.spark.sql.functions._
    def shuffles(df: org.apache.spark.sql.DataFrame) =
      "(?<![A-Za-z])Exchange ".r
        .findAllIn(df.queryExecution.executedPlan.toString).size
    val base = spark.range(100).toDF("id")
    assert(shuffles(base) === 0)
    assert(shuffles(base.repartition(8, col("id"))) === 1,
      "counter blind to an added hash repartition")
    assert(shuffles(base.groupBy(col("id") % 7).count()) === 1,
      "counter blind to an aggregation exchange")
  }

  test("every registered query's Exchange counts match the committed budget") {
    val actual: Seq[(String, Int, Int)] = Registry.all.map(_.name).sorted.map { n =>
      val (s, b) = exchangeCounts(n)
      (n, s, b)
    }
    if (sys.env.contains("SPARK_GRAFT_UPDATE_EXCHANGE_BUDGET")) {
      val lines = ("# query\tshuffle_exchanges\tbroadcast_exchanges — regenerate with" +
        " SPARK_GRAFT_UPDATE_EXCHANGE_BUDGET=1 sbt 'testOnly graft.ExchangeBudgetSpec'") +:
        actual.map { case (n, s, b) => s"$n\t$s\t$b" }
      Files.createDirectories(budgetPath.getParent)
      Files.write(budgetPath, lines.asJava)
      info(s"rewrote $budgetPath with ${actual.size} entries")
    }
    assert(Files.exists(budgetPath),
      s"$budgetPath missing — run once with SPARK_GRAFT_UPDATE_EXCHANGE_BUDGET=1 to seed it")
    val expected: Map[String, (Int, Int)] = Files.readAllLines(budgetPath).asScala
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map { l => val f = l.split("\t"); f(0) -> (f(1).toInt, f(2).toInt) }.toMap

    val missing = actual.map(_._1).filterNot(expected.contains)
    val stale = expected.keys.toSeq.filterNot(actual.map(_._1).contains)
    val drifted = actual.flatMap { case (n, s, b) =>
      expected.get(n).collect { case (es, eb) if (es, eb) != (s, b) =>
        s"$n: shuffle $es->$s, broadcast $eb->$b"
      }
    }
    assert(missing.isEmpty && stale.isEmpty && drifted.isEmpty,
      s"""Exchange budget drift (intentional? regenerate the golden file and justify in the commit):
         |  unbudgeted queries: ${missing.mkString(", ")}
         |  stale budget rows:  ${stale.mkString(", ")}
         |  drifted counts:
         |    ${drifted.mkString("\n    ")}""".stripMargin)
  }
}
