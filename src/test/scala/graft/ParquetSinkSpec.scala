package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.ParquetSink

/** Small-file control in the partitioned sink: each partition value must be
  * written by a bounded number of tasks, not one file per (task × value).
  */
class ParquetSinkSpec extends SparkSpec {

  private def parquetFilesPerDir(root: String): Map[String, Int] = {
    val base = new java.io.File(root)
    base.listFiles().filter(_.isDirectory).map { d =>
      d.getName -> d.listFiles().count(f => f.getName.endsWith(".parquet"))
    }.toMap
  }

  test("writePartitioned emits exactly one file per partition value") {
    val out = Files.createTempDirectory("graft_sink").toString
    val docs = Tables.documents(spark, sf0001).repartition(8) // naive: 8 tasks × 5 langs
    ParquetSink.writePartitioned(docs, out, Seq("lang"))
    val files = parquetFilesPerDir(out)
    assert(files.keySet.map(_.takeWhile(_ != '=')) === Set("lang"))
    assert(files.values.forall(_ === 1), s"small-file explosion: $files")
    // round-trip: nothing lost, partition pruning still applies
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    val pruned = back.filter(col("lang") === "en")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    assert(scan.contains("PartitionFilters: [isnotnull(lang"), s"no partition pruning:\n$scan")
  }

  test("filesPerPartition bounds files per partition value at N") {
    val out = Files.createTempDirectory("graft_sink_salt").toString
    val docs = Tables.documents(spark, sf0001)
    ParquetSink.writePartitioned(docs, out, Seq("lang"), filesPerPartition = 3)
    val files = parquetFilesPerDir(out)
    // HARD guarantee: ≤ N files per value (N salt values → ≤ N writer
    // tasks per value). Whether a hot value actually spreads to all N
    // writers depends on hash-partition placement — bounded, not asserted.
    assert(files.values.forall(n => n >= 1 && n <= 3), s"unexpected file counts: $files")
    assert(spark.read.parquet(out).count() === docs.count())
  }
}
