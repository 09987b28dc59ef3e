package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Partition pruning capability: a Hive-partitioned layout lets a filter on
  * the partition column skip entire directories — at 100 TB the difference
  * between scanning 100 TB and scanning one partition's share. Asserted on
  * the scan's PartitionFilters and on the partition count actually read.
  */
class PartitionPruningSpec extends SparkSpec {

  test("filter on the partition column prunes directories at plan time") {
    val dir = Files.createTempDirectory("graft_part").toString
    Tables.events(spark, sf0001)
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)

    val df = spark.read.parquet(dir)
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id")
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"no partition filter in scan:\n$plan")

    // file-level proof: the scanned files all come from the one partition
    val files = df.select(input_file_name().as("f")).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty)
    assert(files.forall(_.contains("event_type=purchase")),
      s"read outside the pruned partition: ${files.mkString("\n")}")

    // parity with the unpartitioned read
    val expected = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase").count()
    assert(df.count() === expected)
  }

  test("file streaming source processes a directory incrementally") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft_stream_src").toString
    val batch = Tables.events(spark, sf0001)
      .select("event_id", "user_id", "event_type", "value").limit(500)
    batch.coalesce(1).write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream.schema(batch.schema).parquet(srcDir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val q = stream.writeStream.format("memory").queryName("file_stream_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    val got = spark.table("file_stream_out")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q.stop()
    val expected = batch.groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }
}
