package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** The three adversarial table sets used by DegenerateSweepSpec, factored
  * out so the round-9 oracle parity sweep (tools/degen_preflight.sh) can
  * materialize the SAME fixtures on disk and run the full DuckDB compare
  * over them — converting round 8's "no input shaped like this kills the
  * job" into "and the guarded NULL paths AGREE with the oracle".
  *
  *  - "tiny": schema-complete single-row / zero-value / empty-text /
  *    zero-vector / short-vector rows — single-row groups, zero sums,
  *    zero variances, degenerate strings and vectors everywhere;
  *  - "empty": every table present with the right schema and ZERO rows;
  *  - "nulls": one row per table with NULL in every non-key column plus
  *    one healthy row, so NULL flows through split/explode/percentile/
  *    window paths while joins still resolve.
  */
object DegenTables {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s"$s 00:00:00")

  def writeTiny(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    Seq((0, "ALL"), (1, "R1"))
      .toDF("r_regionkey", "r_name").write.parquet(s"$dir/region.parquet")
    Seq((0, "ALL", 0), (1, "N1", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey").write.parquet(s"$dir/nation.parquet")
    Seq((1L, "s", 0, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.parquet(s"$dir/supplier.parquet")
    Seq((1L, "c", 0, 0.0, "SEG")) // one customer: n=1 groups, zero balance
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    Seq((1L, "p", "Brand#2", "SMALL", 0, 0.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$dir/part.parquet")
    Seq((1L, 1L, "F", 0.0, ts("1996-01-01"), "1-URGENT")) // zero price
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, 1L, 1L, 1, 0.0, 0.0, 0.0, 0.0, "N", "O", ts("1996-01-01")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate") // zero quantity AND zero price: zero weight sums
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((0L, 1704067200L * 1000000000L, 1L, "click", 0.0, """{"x":1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet") // ONE event: n=1 everything
    Seq((0L, "", "en", "s0", 0L), // empty text
      (1L, " ", "en", "s0", -5L), // whitespace-only + negative n_chars
      (2L, "w", "fr", "s1", 1L)) // single 1-char token
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Seq((0L, Seq.fill(64)(0.0f), 0), // ZERO vector (query side!)
      (1L, Seq(0.5f, 0.25f), 1), // short vector
      (2L, Seq.fill(64)(0.125f), 1)) // all-equal vector
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
  }

  def writeEmpty(spark: SparkSession, dir: String): Unit = {
    def empty(schema: StructType, name: String): Unit =
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        // one partition → Spark writes one schema-only part file, so the
        // DuckDB side of the parity sweep can read the table's schema too
        .repartition(1)
        .write.parquet(s"$dir/$name.parquet")
    empty(StructType(Seq(StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType))), "region")
    empty(StructType(Seq(StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType), StructField("n_regionkey", IntegerType))), "nation")
    empty(StructType(Seq(StructField("s_suppkey", LongType),
      StructField("s_name", StringType), StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType))), "supplier")
    empty(StructType(Seq(StructField("c_custkey", LongType),
      StructField("c_name", StringType), StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType), StructField("c_mktsegment", StringType))),
      "customer")
    empty(StructType(Seq(StructField("p_partkey", LongType),
      StructField("p_name", StringType), StructField("p_brand", StringType),
      StructField("p_type", StringType), StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType))), "part")
    empty(StructType(Seq(StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType), StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType), StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType))), "orders")
    empty(StructType(Seq(StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType), StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType), StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType), StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType), StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType), StructField("l_shipdate", TimestampType))),
      "lineitem")
    empty(StructType(Seq(StructField("event_id", LongType),
      StructField("ts", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("props", StringType))), "events")
    empty(StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType),
      StructField("source", StringType), StructField("n_chars", LongType))), "documents")
    empty(StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)), StructField("label", IntegerType))),
      "embeddings")
  }

  def writeNulls(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    Seq((0, Some("R0")), (1, None: Option[String]))
      .toDF("r_regionkey", "r_name").write.parquet(s"$dir/region.parquet")
    Seq((0, Some("N0"), Some(0)), (1, None: Option[String], None: Option[Int]))
      .toDF("n_nationkey", "n_name", "n_regionkey").write.parquet(s"$dir/nation.parquet")
    Seq((1L, Some("s"), Some(0), Some(1.0)),
      (2L, None: Option[String], None: Option[Int], None: Option[Double]))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.parquet(s"$dir/supplier.parquet")
    Seq((1L, Some("c"), Some(0), Some(5.0), Some("SEG")),
      (2L, None: Option[String], None: Option[Int], None: Option[Double],
        None: Option[String]))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    Seq((1L, Some("p"), Some("B"), Some("SMALL"), Some(1), Some(2.0)),
      (2L, None: Option[String], None: Option[String], None: Option[String],
        None: Option[Int], None: Option[Double]))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$dir/part.parquet")
    Seq((1L, 1L, Some("F"), Some(3.0), Some(ts("1996-01-01")), Some("1-URGENT")),
      (2L, 2L, None: Option[String], None: Option[Double],
        None: Option[java.sql.Timestamp], None: Option[String]))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, 1L, 1L, 1, Some(1.0), Some(2.0), Some(0.1), Some(0.0), Some("N"),
        Some("O"), Some(ts("1996-01-01"))),
      (2L, 2L, 2L, 2, None: Option[Double], None: Option[Double],
        None: Option[Double], None: Option[Double], None: Option[String],
        None: Option[String], None: Option[java.sql.Timestamp]))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((0L, Some(1704067200L * 1000000000L), Some(1L), Some("click"), Some(1.0),
        Some("""{"k": 1}""")),
      (1L, None: Option[Long], None: Option[Long], None: Option[String],
        None: Option[Double], None: Option[String]))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    Seq((0L, Some("w1 w2 w3"), Some("en"), Some("s0"), Some(8L)),
      (1L, None: Option[String], None: Option[String], None: Option[String],
        None: Option[Long]))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Seq((0L, Some(Seq.fill(64)(0.5f)), Some(1)),
      (1L, None: Option[Seq[Float]], None: Option[Int]))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
  }

  /** Fourth set (round 10): multibyte/adversarial TEXT with healthy join
    * keys and sane numerics — the class a real web corpus is full of and
    * the ASCII driver fixtures never exercise. Probes the byte-vs-codepoint
    * and casing seams between Spark (JDK string semantics) and DuckDB
    * (utf8proc): accented latin, CJK tokens, non-BMP emoji (surrogate
    * pairs in UTF-16 land, 4-byte sequences in UTF-8), combining-mark vs
    * precomposed é (byte-different, must NOT dedup together), the Greek
    * final-sigma casing context, RTL Hebrew, and an exact-duplicate
    * unicode pair so the dedup family hashes multibyte text on both
    * engines. n_chars carries CODE-POINT counts (Spark length() and
    * DuckDB length() both count code points — pinned by the parity
    * sweep over this set).
    */
  def writeUnicode(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    Seq((0, "ALL"), (1, "Régión"))
      .toDF("r_regionkey", "r_name").write.parquet(s"$dir/region.parquet")
    Seq((0, "ALL", 0), (1, "日本", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey").write.parquet(s"$dir/nation.parquet")
    Seq((1L, "Søren Kierkegård", 0, 10.5))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.parquet(s"$dir/supplier.parquet")
    Seq((1L, "Müller", 0, 20.0, "SEG"), (2L, "Ñandú", 1, 7.25, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    Seq((1L, "pièce détachée", "Brand#Ω", "SMALL", 5, 3.5))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$dir/part.parquet")
    Seq((1L, 1L, "F", 10.0, ts("1996-01-01"), "1-URGENT"),
      (2L, 2L, "O", 4.5, ts("1996-02-01"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, 1L, 1L, 1, 2.0, 10.0, 0.1, 0.0, "N", "O", ts("1996-01-01")),
      (2L, 1L, 1L, 2, 1.0, 4.5, 0.0, 0.05, "R", "F", ts("1996-02-01")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((0L, 1704067200L * 1000000000L, 1L, "click", 1.0, """{"k": 7, "s": "café"}"""),
      (1L, 1704070800L * 1000000000L, 1L, "view", 2.0, """{"k": 2, "s": "日本"}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    // é two ways: precomposed U+00E9 vs e + combining U+0301 — different
    // bytes, different tokens, and must stay that way on both engines.
    val eComb = "étoile"
    Seq(
      (0L, "héllo wörld héllo wörld naïve", "fr", "s0", 29L),
      (1L, "héllo wörld héllo wörld naïve", "fr", "s0", 29L), // exact dup of 0
      (2L, "日本語 テキスト 処理 日本語 処理", "ja", "s1", 18L),
      (3L, "emoji 🌍🌍 test 🚀 emoji", "en", "s1", 21L),
      (4L, s"étoile $eComb étoile $eComb", "fr", "s0", 29L),
      (5L, "STRASSE straße ΣΊΣΥΦΟΣ σίσυφος", "de", "s2", 30L),
      (6L, "שלום עולם hello world", "he", "s2", 21L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Seq((0L, Seq.tabulate(64)(i => (0.1f + i * 0.01f)), 0),
      (1L, Seq.tabulate(64)(i => (0.9f - i * 0.01f)), 1),
      (2L, Seq.tabulate(64)(i => (0.1f + i * 0.01f)), 0)) // dup of 0
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
  }

  val sets: Map[String, (SparkSession, String) => Unit] = Map(
    "tiny" -> writeTiny,
    "empty" -> writeEmpty,
    "nulls" -> writeNulls,
    "unicode" -> writeUnicode)
}

/** `sbt "Test/runMain graft.DegenGen <baseDir>"` — materialize all three
  * adversarial sets under `<baseDir>/{tiny,empty,nulls}` for the oracle
  * parity sweep (tools/degen_preflight.sh drives Verify + preflight.py
  * over each).
  */
object DegenGen {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: DegenGen <baseDir>")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    DegenTables.sets.foreach { case (name, write) =>
      val dir = s"${args(0)}/$name"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      write(spark, dir)
      System.err.println(s"[degen] wrote $dir")
    }
    spark.stop()
  }
}
