package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Pins `Tables.events` against every physical form `ts` has shipped in,
  * and pins the REAL fixtures' temporal schema so the next silent fixture
  * regeneration fails here instead of 45-queries-deep in the driver's
  * sweep (ADVICE r11 #1: the r10→r11 timestamp[ns]→timestamp[us] switch
  * broke every events-reading query and the harness reported green).
  */
class TablesSchemaSpec extends SparkSpec {
  import spark.implicits._

  /** One reference instant, 2024-01-01T00:00:00Z, in each physical form. */
  private val epochSec = 1704067200L

  private def freshDir(): String = {
    val d = Files.createTempDirectory("tables_schema_spec").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def writeEvents(dir: String, tsCol: org.apache.spark.sql.Column,
                          tsType: DataType): Unit = {
    Seq((0L, 1L, "click", 1.5, """{"k":1}"""))
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", tsCol.cast(tsType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
  }

  private def assertNormalized(dir: String, form: String): Unit = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      s"$form: Tables.events must normalize ts to TimestampType, " +
        s"got ${df.schema("ts").dataType}")
    val got = df.select(col("ts")).as[Timestamp].head()
    assert(got.getTime == epochSec * 1000L,
      s"$form: instant drifted — got $got")
  }

  test("events ts as BIGINT epoch-nanos (degenerate-set form) normalizes") {
    val dir = freshDir()
    writeEvents(dir, lit(epochSec * 1000000000L), LongType)
    assertNormalized(dir, "bigint-nanos")
  }

  test("events ts as TIMESTAMP_NTZ micros (r11+ fixture form) normalizes") {
    val dir = freshDir()
    writeEvents(dir, lit(epochSec).cast(TimestampType), TimestampNTZType)
    assertNormalized(dir, "timestamp-ntz")
  }

  test("events ts already TimestampType passes through") {
    val dir = freshDir()
    writeEvents(dir, lit(epochSec).cast(TimestampType), TimestampType)
    assertNormalized(dir, "timestamp-ltz")
  }

  test("real fixtures: every temporal column reads as a type the loaders handle") {
    // The loaders' contract with the CURRENT driver fixtures: whatever the
    // physical form, Tables.events exposes TimestampType, and the
    // orders/lineitem temporal columns read as a timestamp family (their
    // queries cast to DATE immediately, which both NTZ and LTZ support).
    val tsT = Tables.events(spark, sf0001).schema("ts").dataType
    assert(tsT == TimestampType, s"events.ts normalized type: $tsT")
    for ((tbl, c) <- Seq("orders" -> "o_orderdate", "lineitem" -> "l_shipdate")) {
      val t = Tables.t(spark, sf0001, tbl).schema(c).dataType
      assert(t == TimestampType || t == TimestampNTZType,
        s"$tbl.$c unexpected physical read type: $t")
    }
  }
}
