package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet: CSV (schema'd, with header),
  * JSON lines, and ORC must round-trip the same rows — the multi-source
  * ingest surface an ETL engine needs. Explicit schemas on read (no
  * sampling inference) per the engine's schema discipline.
  */
class SourceFormatsSpec extends SparkSpec {

  private lazy val base = Tables.nation(spark, sf0001).orderBy("n_nationkey")

  private def roundTrip(fmt: String): Unit = {
    val dir = Files.createTempDirectory(s"graft_$fmt").toString
    base.write.format(fmt).option("header", "true").mode("overwrite").save(dir)
    val back = spark.read.format(fmt)
      .option("header", "true").schema(base.schema).load(dir)
      .orderBy("n_nationkey")
    assert(back.collect().map(_.toSeq).toSeq === base.collect().map(_.toSeq).toSeq,
      s"$fmt round-trip mismatch")
  }

  test("csv round-trips with explicit schema")(roundTrip("csv"))
  test("json round-trips with explicit schema")(roundTrip("json"))
  test("orc round-trips with explicit schema")(roundTrip("orc"))

  test("parquet schema evolution: mergeSchema unions old and new columns") {
    // The 100 TB reality: years of partitions written under different
    // schema versions must read as ONE table — new columns null-filled for
    // old files, old columns intact for new ones.
    val dir = Files.createTempDirectory("graft_evolve").toString
    base.select(col("n_nationkey"), col("n_name"))
      .write.mode("overwrite").parquet(s"$dir/v=1")
    base.select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
        lit("2024").as("ingest_tag"))
      .write.mode("overwrite").parquet(s"$dir/v=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet ===
      Set("n_nationkey", "n_name", "n_regionkey", "ingest_tag", "v"))
    val n = base.count()
    assert(merged.count() === 2 * n)
    // old files surface the evolved columns as nulls, not errors
    assert(merged.filter(col("v") === 1 && col("ingest_tag").isNull).count() === n)
    assert(merged.filter(col("v") === 2 && col("n_regionkey").isNotNull).count() === n)
  }

  test("csv malformed rows are isolated in the corrupt-record column") {
    val dir = Files.createTempDirectory("graft_badcsv").toString
    Files.writeString(java.nio.file.Path.of(dir, "data.csv"),
      "1,ALGERIA,0\nnot_a_number,BADROW,9\n3,CANADA,1\n")
    val schema = "n_nationkey INT, n_name STRING, n_regionkey INT, _corrupt_record STRING"
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir).cache()
    assert(df.filter(col("_corrupt_record").isNotNull).count() === 1)
    assert(df.filter(col("_corrupt_record").isNull).count() === 2)
    df.unpersist()
  }
}
