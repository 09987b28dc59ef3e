package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Duplicate-scan audit (round 11): walk every registered query's FINAL
  * adaptive plan and count the LIVE parquet-scan subtrees per table — the
  * number of times each 100 TB table would actually be read end-to-end.
  *
  * Motivation: the round-11 `agg_chi_square` finding. Its plan was green
  * by every pinned metric (exchange budget, pushdown, broadcast shape),
  * yet AQE stage reuse silently did not fire for its agg-over-agg-with-
  * join-back shape, so the events scan ran once per consumer — four full
  * scans at 100 TB, invisible until someone measured. AqeReuseSpec pins
  * runtime reuse for the four top-static-exchange queries, but queries
  * below that cut were never runtime-audited; this main closes the gap by
  * measuring ALL of them.
  *
  * Counting is tree-walking, not string-grepping, because the AQE plan
  * STRING re-prints a reused stage's whole subtree under each consumer —
  * a grep for "Scan parquet" counts the reused subtree once per print and
  * over-reports. Here a [[QueryStageExec]] is traversed only the first
  * time its stage id is seen and a [[ReusedExchangeExec]] is a leaf, so
  * each remaining [[FileSourceScanExec]] is one real scan execution.
  * Subquery plans (scalar/IN) are traversed too — they scan like anyone
  * else.
  *
  * Output: one `[scanaudit] <query> <table>x<n> ...` line per query that
  * scans some table more than once in its final plan, then a summary
  * tally. A multi-scan line is a FINDING to classify, not automatically a
  * bug: a self-join that scans twice with different pushed filters is the
  * plan you want; two identical scan subtrees feeding different consumers
  * are the agg_chi_square bug again. Classification lives in BASELINE.md
  * (round 11); ScanBudgetSpec pins the classified counts so a regression
  * (lost reuse, a new unintended self-scan) fails a test.
  *
  * Usage: sbt "Test/runMain graft.ScanAudit [sfDir]"   (default sf0.001)
  */
object ScanAudit {

  /** One live scan subtree. `sig` is what the scan actually READS —
    * pruned columns plus pushed/partition filters — so two scans with
    * equal signatures read the same bytes at 100 TB, and the pair is a
    * scan-amortization candidate (the agg_chi_square class); different
    * signatures mean the duplication is by construction (a self-join's
    * two sides pruning different columns, a profile pass reading fewer
    * columns than the probe pass). `width` is the pruned data-column
    * count (requiredSchema, partition columns excluded) — the
    * column-pruning ratchet's unit: a projection refactor that silently
    * widens a scan back to all columns reads every byte of a 100 TB
    * table for a 2-column answer.
    */
  private[graft] final case class LiveScan(table: String, sig: String, width: Int)

  private[graft] def liveScans(
      p: SparkPlan, seen: mutable.Set[Int]): Seq[LiveScan] = p match {
    case a: AdaptiveSparkPlanExec => liveScans(a.executedPlan, seen)
    case s: QueryStageExec =>
      if (seen.add(s.id)) liveScans(s.plan, seen) else Nil
    case _: ReusedExchangeExec => Nil
    case f: FileSourceScanExec =>
      val table = f.relation.location.rootPaths.map(_.getName)
        .mkString(",").stripSuffix(".parquet")
      val sig = Seq("ReadSchema", "PushedFilters", "PartitionFilters", "DataFilters")
        .flatMap(k => f.metadata.get(k)).mkString("|")
      Seq(LiveScan(table, sig, f.requiredSchema.length))
    case other =>
      (other.children ++ other.subqueries).flatMap(liveScans(_, seen))
  }

  /** Every live scan of one query's FINAL adaptive plan, after running it
    * to completion (collect drives AQE to its final plan; streaming-shaped
    * queries in this registry are batch DataFrames, so collect is safe).
    */
  private[graft] def runLiveScans(
      spark: SparkSession, name: String, sfDir: String): Seq[LiveScan] = {
    val df = Registry.queries(name)(spark, sfDir)
    df.collect()
    liveScans(df.queryExecution.executedPlan, mutable.Set.empty[Int])
  }

  /** table → (live-scan count, distinct signature count). */
  private[graft] def groupCounts(scans: Seq[LiveScan]): Map[String, (Int, Int)] =
    scans.groupBy(_.table)
      .map { case (t, xs) => t -> (xs.size, xs.map(_.sig).distinct.size) }

  /** table → sorted read widths, one per live scan. */
  private[graft] def groupWidths(scans: Seq[LiveScan]): Map[String, Seq[Int]] =
    scans.groupBy(_.table).map { case (t, xs) => t -> xs.map(_.width).sorted }

  private[graft] def scanCounts(
      spark: SparkSession, name: String, sfDir: String): Map[String, (Int, Int)] =
    groupCounts(runLiveScans(spark, name, sfDir))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var multi = 0
    var identical = 0
    Registry.all.map(_.name).sorted.foreach { name =>
      try {
        val dups = scanCounts(spark, name, sfDir).filter(_._2._1 > 1)
        if (dups.nonEmpty) {
          multi += 1
          if (dups.exists { case (_, (n, sigs)) => sigs < n }) identical += 1
          println(s"[scanaudit] $name " +
            dups.toSeq.sorted.map { case (t, (n, sigs)) =>
              s"${t}x$n(${if (sigs < n) s"IDENTICAL:$sigs sig" else "distinct sigs"})"
            }.mkString(" "))
        }
      } catch { case e: Throwable =>
        println(s"[scanaudit] $name ERROR ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    println(s"[scanaudit] done: $multi/${Registry.all.size} queries scan some table >1x " +
      s"in their final plan; $identical of those repeat an IDENTICAL scan signature")
    spark.stop()
  }
}
