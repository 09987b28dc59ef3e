package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partitioned parquet sink with small-file control (SURVEY §1.2 sink row).
  *
  * The naive `df.write.partitionBy(cols)` writes one file per (task ×
  * partition-value): with 1,000 executors × 10,000 partition values that is
  * ten million tiny files — the classic 100 TB sink failure. The fix is to
  * shuffle rows to their output partition FIRST, so each partition value is
  * written by exactly `filesPerPartition` tasks.
  *
  * `filesPerPartition > 1` exists for skewed partition values (one giant
  * `lang=en` dir): rows salt across N writers, trading file count for
  * parallelism on the hot key.
  */
object ParquetSink {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      filesPerPartition: Int = 1): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must not be empty")
    val keyCols = partitionCols.map(col)
    val keyed =
      if (filesPerPartition <= 1) df.repartition(keyCols: _*)
      else {
        // deterministic salt from the full row keeps rows of a hot
        // partition value spread across exactly N writer tasks
        val salt = pmod(hash(df.columns.map(col): _*), lit(filesPerPartition))
        df.repartition(keyCols :+ salt: _*)
      }
    keyed.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
  }
}
