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

  test("real fixtures: full schema drift probe — names exact, types in-family") {
    // Column NAMES exact (queries reference them literally); per-column
    // type constrained to the FAMILY the queries are proven against, so a
    // benign physical re-encode (int32↔int64, ms↔us↔ns timestamps — the
    // r10→r11 regeneration changed exactly that) stays green while a
    // rename, drop, reorder, or genre change (string→binary, scalar→list)
    // fails here with the table and column named, instead of 45-queries-
    // deep in the driver sweep.
    val I = Set[DataType](IntegerType, LongType)           // integral
    val D = Set[DataType](DoubleType, FloatType)           // floating
    val S = Set[DataType](StringType)
    val T: Set[DataType] = Set(TimestampType, TimestampNTZType, DateType)
    val V: Set[DataType] = Set(ArrayType(FloatType), ArrayType(FloatType, false),
      ArrayType(DoubleType), ArrayType(DoubleType, false))
    val expected: Seq[(String, Seq[(String, Set[DataType])])] = Seq(
      "region" -> Seq("r_regionkey" -> I, "r_name" -> S),
      "nation" -> Seq("n_nationkey" -> I, "n_name" -> S, "n_regionkey" -> I),
      "customer" -> Seq("c_custkey" -> I, "c_name" -> S, "c_nationkey" -> I,
        "c_acctbal" -> D, "c_mktsegment" -> S),
      "supplier" -> Seq("s_suppkey" -> I, "s_name" -> S, "s_nationkey" -> I,
        "s_acctbal" -> D),
      "part" -> Seq("p_partkey" -> I, "p_name" -> S, "p_brand" -> S,
        "p_type" -> S, "p_size" -> I, "p_retailprice" -> D),
      "orders" -> Seq("o_orderkey" -> I, "o_custkey" -> I, "o_orderstatus" -> S,
        "o_totalprice" -> D, "o_orderdate" -> T, "o_orderpriority" -> S),
      "lineitem" -> Seq("l_orderkey" -> I, "l_partkey" -> I, "l_suppkey" -> I,
        "l_linenumber" -> I, "l_quantity" -> D, "l_extendedprice" -> D,
        "l_discount" -> D, "l_tax" -> D, "l_returnflag" -> S,
        "l_linestatus" -> S, "l_shipdate" -> T),
      "events" -> Seq("event_id" -> I, "ts" -> (T + LongType), "user_id" -> I,
        "event_type" -> S, "value" -> D, "props" -> S),
      "documents" -> Seq("doc_id" -> I, "text" -> S, "lang" -> S,
        "source" -> S, "n_chars" -> I),
      "embeddings" -> Seq("vec_id" -> I, "embedding" -> V, "label" -> I))
    val drift = for {
      (tbl, cols) <- expected
      schema = Tables.t(spark, sf0001, tbl).schema
      problem <- {
        val names = schema.fields.map(_.name).toSeq
        if (names != cols.map(_._1))
          Seq(s"$tbl: columns $names != expected ${cols.map(_._1)}")
        else cols.flatMap { case (c, allowed) =>
          val t = schema(c).dataType
          if (allowed.contains(t)) Nil
          else Seq(s"$tbl.$c: read type $t outside proven family $allowed")
        }
      }
    } yield problem
    assert(drift.isEmpty, drift.mkString("\n"))
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
