package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The point of fn_zorder_key: a z-sorted file layout clusters BOTH
  * dimensions, so parquet min/max stats skip most row groups for a
  * predicate on EITHER column. Verified against real scan metrics — the
  * same mechanism that prunes petabytes on a cluster.
  */
class ZOrderLayoutSpec extends SparkSpec {

  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-sorted layout skips row groups for predicates on either dimension") {
    val part = Registry.queries("fn_zorder_key")(spark, sf0001) // p_partkey, p_size, bnum, z
    val rows = part.count()
    val zDir = Files.createTempDirectory("graft_zorder").toString
    val nDir = Files.createTempDirectory("graft_natural").toString
    // 16 files ⇒ 16 row groups; z-sort clusters (p_size, bnum) jointly,
    // the natural (key-ordered) layout scatters both.
    val perFile = (rows / 16).toInt.max(1)
    part.orderBy("z").coalesce(1)
      .write.option("maxRecordsPerFile", perFile).mode("overwrite").parquet(zDir)
    part.orderBy("p_partkey").coalesce(1)
      .write.option("maxRecordsPerFile", perFile).mode("overwrite").parquet(nDir)

    def survivors(dir: String, cond: org.apache.spark.sql.Column): Long =
      scanOutputRows(spark.read.parquet(dir).filter(cond))

    // The natural layout may skip a little too (a 12-row file can happen
    // to miss the range); the claim under test is that the z layout skips
    // STRICTLY more on BOTH dimensions.
    for (cond <- Seq(col("p_size") <= 3, col("bnum") <= 3)) {
      val zRows = survivors(zDir, cond)
      val nRows = survivors(nDir, cond)
      assert(zRows < nRows,
        s"z-layout did not skip for $cond: z-scan=$zRows natural-scan=$nRows (total=$rows)")
    }
  }
}
