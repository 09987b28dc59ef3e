package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.IncrementalPipeline

/** End-to-end daily-update workflow: parquet source → watermark-filtered
  * delta → MERGE upsert into Derby, across three scheduled "days".
  */
class IncrementalPipelineSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftpipe;create=true"
  private val srcDir = Files.createTempDirectory("graft_incr").toString

  test("incremental loads pick up exactly the new rows; re-runs are no-ops") {
    import spark.implicits._
    graft.sources.JdbcUpsert.ensureTable(url,
      """CREATE TABLE bars (
        |  code VARCHAR(16) NOT NULL,
        |  trade_date BIGINT NOT NULL,
        |  close_px DOUBLE,
        |  PRIMARY KEY (code, trade_date))""".stripMargin)

    def runOnce() = IncrementalPipeline.run(spark, srcDir, url, "bars",
      keys = Seq("code", "trade_date"), watermarkCol = "trade_date",
      stagingColumnTypes = Some("code VARCHAR(16)"))
    def tableRows() = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "bars").load().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2))

    // day 1: full history
    Seq(("AAA", 20240101L, 10.0), ("BBB", 20240101L, 20.0))
      .toDF("code", "trade_date", "close_px")
      .write.mode("overwrite").parquet(srcDir)
    val r1 = runOnce()
    assert(r1.watermark === None && r1.deltaRows === 2)
    assert(tableRows().length === 2)

    // re-run with nothing new: no-op
    val r2 = runOnce()
    assert(r2.watermark === Some(20240101L) && r2.deltaRows === 0)

    // day 2: source grows by one day (old rows unchanged in source)
    Seq(("AAA", 20240101L, 10.0), ("BBB", 20240101L, 20.0),
        ("AAA", 20240102L, 11.0), ("BBB", 20240102L, 21.0))
      .toDF("code", "trade_date", "close_px")
      .write.mode("overwrite").parquet(srcDir)
    val r3 = runOnce()
    assert(r3.watermark === Some(20240101L) && r3.deltaRows === 2)
    assert(tableRows().toSeq === Seq(
      ("AAA", 20240101L, 10.0), ("AAA", 20240102L, 11.0),
      ("BBB", 20240101L, 20.0), ("BBB", 20240102L, 21.0)))

    // transform hook applies before the upsert
    Seq(("AAA", 20240103L, 12.0)).toDF("code", "trade_date", "close_px")
      .write.mode("append").parquet(srcDir)
    val r4 = IncrementalPipeline.run(spark, srcDir, url, "bars",
      keys = Seq("code", "trade_date"), watermarkCol = "trade_date",
      transform = df => df.withColumn("close_px", col("close_px") * 2),
      stagingColumnTypes = Some("code VARCHAR(16)"))
    assert(r4.deltaRows === 1)
    assert(tableRows().contains(("AAA", 20240103L, 24.0)))
  }
}
