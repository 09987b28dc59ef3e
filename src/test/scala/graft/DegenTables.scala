package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** The adversarial table sets used by DegenerateSweepSpec (one writer
  * per set below; `sets` is the registry), factored out so the round-9
  * oracle parity sweep (tools/degen_preflight.sh) can materialize the
  * SAME fixtures on disk and run the full DuckDB compare over them —
  * converting round 8's "no input shaped like this kills the job" into
  * "and the guarded NULL paths AGREE with the oracle". The founding
  * three:
  *
  *  - "tiny": schema-complete single-row / zero-value / empty-text /
  *    zero-vector / short-vector rows — single-row groups, zero sums,
  *    zero variances, degenerate strings and vectors everywhere;
  *  - "empty": every table present with the right schema and ZERO rows;
  *  - "nulls": one row per table with NULL in every non-key column plus
  *    one healthy row, so NULL flows through split/explode/percentile/
  *    window paths while joins still resolve.
  *
  * Later rounds added unicode, extremes, skew, ties, constant, long,
  * and calendar — each documented at its writer.
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

  /** Fifth set (round 11): ±1e30-class doubles — the decimal-overflow
    * seam. Exercises the round-11 posture split end-to-end: every FINAL
    * rounding site ([[graft.Exact.roundN]], `try_cast`-based) must yield
    * NULL identically on both engines when an aggregate/ratio of a
    * poisoned column exceeds the decimal(38,10) range (~1e28), while
    * aggregation-INPUT decimal casts keep the loud ANSI throw — so the
    * queries that decimal-cast a poisoned column before aggregating are
    * this set's DOCUMENTED expected failures (both engines throw; pinned
    * by AnsiOverflowSpec and the BASELINE.md round-10 probe), listed in
    * tools/degen_preflight.sh `expected_for(extremes)`.
    *
    * Poisoned: events.value (±1e30 plus a 1e-30 underflow probe),
    * c_acctbal (±1e30), p_retailprice and s_acctbal (1e30). Deliberately
    * SANE: lineitem/orders money columns (the sumDec/sumMoney paths stay
    * on the loud side and must keep passing), n_chars (Spark sum(BIGINT)
    * throws on long overflow where DuckDB widens to HUGEINT — an
    * engine-defined divergence this set is not about), text, embeddings.
    */
  def writeExtremes(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    Seq((0, "ALL"), (1, "R1"))
      .toDF("r_regionkey", "r_name").write.parquet(s"$dir/region.parquet")
    Seq((0, "ALL", 0), (1, "N1", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey").write.parquet(s"$dir/nation.parquet")
    Seq((1L, "s1", 0, 1e30), (2L, "s2", 1, -1e30))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.parquet(s"$dir/supplier.parquet")
    Seq((1L, "c1", 0, 1e30, "SEG"), (2L, "c2", 0, -1e30, "SEG"),
      (3L, "c3", 1, 5.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    Seq((1L, "p1", "Brand#1", "SMALL", 5, 1e30), (2L, "p2", "Brand#1", "SMALL", 7, 3.5))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$dir/part.parquet")
    Seq((1L, 1L, "F", 10.0, ts("1996-01-01"), "1-URGENT"),
      (2L, 2L, "O", 4.5, ts("1996-02-01"), "2-HIGH"),
      (3L, 3L, "F", 7.25, ts("1996-02-15"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, 1L, 1L, 1, 2.0, 10.0, 0.1, 0.0, "N", "O", ts("1996-01-01")),
      (2L, 1L, 2L, 2, 1.0, 4.5, 0.0, 0.05, "R", "F", ts("1996-02-01")),
      (3L, 2L, 1L, 1, 3.0, 6.0, 0.2, 0.1, "N", "O", ts("1996-02-15")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    // Epoch-nanos BIGINT ts, like the other degen sets (preflight.py
    // normalizes). Healthy rows stay ≤ 4.0 so double sums that include a
    // ±1e30 row are absorption-exact in any order on both engines.
    val t0 = 1704067200L * 1000000000L
    val hour = 3600L * 1000000000L
    Seq((0L, t0 + 0 * hour, 1L, "click", 1e30, """{"k": 1}"""),
      (1L, t0 + 1 * hour, 1L, "view", -1e30, """{"k": 2}"""),
      (2L, t0 + 2 * hour, 1L, "click", 1.5, """{"k": 3}"""),
      (3L, t0 + 3 * hour, 2L, "click", 1e-30, """{"k": 4}"""),
      (4L, t0 + 4 * hour, 2L, "view", 2.5, """{"k": 5}"""),
      (5L, t0 + 5 * hour, 2L, "purchase", 4.0, """{"k": 6}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    Seq((0L, "the quick brown fox jumps", "en", "s0", 25L),
      (1L, "the quick brown fox jumps", "en", "s0", 25L), // exact dup of 0
      (2L, "lorem ipsum dolor sit amet", "en", "s1", 26L),
      (3L, "pack my box with five dozen jugs", "en", "s1", 32L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Seq((0L, Seq.tabulate(64)(i => 0.1f + i * 0.01f), 0),
      (1L, Seq.tabulate(64)(i => 0.9f - i * 0.01f), 1),
      (2L, Seq.tabulate(64)(i => 0.1f + i * 0.01f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
  }

  /** Sixth set (round 11, VERDICT r10 #6): HOT-KEY SKEW — the shape that
    * melts pair joins at 100 TB. One (lang, source) block holds ~all
    * 1,200 documents and the token "the" appears in every one of them, so
    * its posting list's document frequency (1,200) exceeds
    * [[graft.llm.Dedup.DfBound]] (default 1,000) and the df guard MUST
    * drop it before the pair join — without the guard that single token
    * contributes C(1200,2) ≈ 719k candidate pairs; with it, pairs come
    * only from the 60 20-doc shingle groups (sim exactly at the 0.6
    * threshold: 3 shared of 4 surviving tokens) plus one exact-dup pair
    * at 1.0. Both engines apply the same guard (the oracle QUALIFY reads
    * the same DfBound), so this is the first ORACLE-PARITY exercise of
    * the guard-engaged path — DedupGuardSpec covers it only Spark-side.
    * Events (40-vs-5 per user), orders and lineitem (one hot customer /
    * order) carry the same skew for the window/join/salting families.
    * No expected failures: skew must degrade performance gracefully,
    * never correctness.
    */
  def writeSkew(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    Seq((0, "ALL"), (1, "R1"))
      .toDF("r_regionkey", "r_name").write.parquet(s"$dir/region.parquet")
    Seq((0, "ALL", 0), (1, "N1", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey").write.parquet(s"$dir/nation.parquet")
    Seq((1L, "s1", 0, 10.0), (2L, "s2", 0, 20.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.parquet(s"$dir/supplier.parquet")
    // every customer in one nation/segment: maximally skewed group keys
    (1L to 8L).map(i => (i, s"c$i", 0, i * 10.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    Seq((1L, "p1", "Brand#1", "SMALL", 5, 10.0), (2L, "p2", "Brand#1", "SMALL", 7, 20.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$dir/part.parquet")
    // one hot customer owns 30 of 34 orders
    ((1L to 30L).map(i => (i, 1L, "F", 100.0 + i, ts("1996-01-01"), "1-URGENT")) ++
      (31L to 34L).map(i => (i, i - 29L, "O", 50.0 + i, ts("1996-02-01"), "2-HIGH")))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    // one hot order carries 30 of 34 lines
    ((1 to 30).map(i => (1L, (i % 2 + 1).toLong, 1L, i, 2.0, 10.0, 0.1, 0.0,
      "N", "O", ts("1996-01-01"))) ++
      (1 to 4).map(i => ((i + 1).toLong, 1L, 2L, i, 1.0, 5.0, 0.0, 0.05,
        "R", "F", ts("1996-02-01"))))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    val t0 = 1704067200L * 1000000000L
    val hour = 3600L * 1000000000L
    // 40 events for user 1, 5 for user 2 — hot window partitions
    ((0 until 40).map(i => (i.toLong, t0 + i * hour, 1L,
      Seq("click", "view", "purchase")(i % 3), 1.0 + i, s"""{"k": $i}""")) ++
      (0 until 5).map(i => ((40 + i).toLong, t0 + i * hour, 2L, "click",
        0.5 + i, s"""{"k": $i}""")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    // 1,200 docs, ONE block: "the" in all (df 1200 > DfBound 1000 →
    // guarded away); groups of 20 share 3 tokens (a_g b_g c_g) and keep a
    // unique u_i, so post-guard Jaccard = 3/(4+4-3) = 0.6 exactly.
    val block = (0 until 1200).map { i =>
      val g = i % 60
      val text = s"the a$g b$g c$g u$i"
      (i.toLong, text, "en", "s0", text.length.toLong)
    }
    val dupText = "the dup1 dup2 dup3"
    val extra = Seq(
      (1200L, dupText, "en", "s0", dupText.length.toLong),
      (1201L, dupText, "en", "s0", dupText.length.toLong), // exact dup pair
      (1202L, "petit texte divers", "fr", "s1", 18L),
      (1203L, "autre texte encore", "fr", "s1", 18L))
    (block ++ extra)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // a 10-vector identical cluster (hot ANN bucket) + distinct tail
    ((0 until 10).map(i => (i.toLong, Seq.tabulate(64)(j => 0.5f + j * 0.001f), 0)) ++
      (10 until 40).map(i => (i.toLong, Seq.tabulate(64)(j =>
        math.sin(i * 64 + j).toFloat), i % 4)))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
  }

  /** Seventh set (round 12): TOTAL ORDERING TIES — the shape that exposes
    * D3 (determinism) violations. Every ordering key a query could sort,
    * rank, or pick-first by is tied somewhere in this set: one instant
    * holds most of the events (same user AND across users, with fully
    * duplicated non-id rows), orders share (date, totalprice), customers
    * share acctbal within and across nations, lineitem shares
    * (quantity, extendedprice) within an order, two documents carry the
    * SAME text under DIFFERENT (lang, source), another permutes the same
    * token multiset, and two embeddings are bit-identical under different
    * labels with a third that is an exact 2× scaling (cosine ties
    * bit-exactly against any probe: ×2 and sqrt-of-4× are exact in IEEE,
    * on both engines). A query that orders by a value column without a
    * key tie-break, or uses first()/max_by without a total order, is
    * correct on the driver fixtures by luck and nondeterministic at
    * 100 TB — here it hash-diverges from DuckDB instead. No expected
    * failures: ties must never cost determinism.
    */
  def writeTies(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    Seq((0, "ALL"), (1, "R1"))
      .toDF("r_regionkey", "r_name").write.parquet(s"$dir/region.parquet")
    Seq((0, "N0", 0), (1, "N1", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey").write.parquet(s"$dir/nation.parquet")
    // identical acctbal pair (supplier ranking ties)
    Seq((1L, "s1", 0, 10.0), (2L, "s2", 1, 10.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.parquet(s"$dir/supplier.parquet")
    // acctbal tied within a nation (1,2) and across nations (3,4); two
    // segments so segment grouping stays non-trivial
    Seq((1L, "cA", 0, 100.0, "SEG"), (2L, "cB", 0, 100.0, "SEG"),
      (3L, "cC", 0, 50.0, "SEG"), (4L, "cD", 1, 50.0, "OTH"),
      (5L, "cE", 1, 75.0, "OTH"), (6L, "cF", 1, 25.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    // identical (retailprice, size) part pair
    Seq((1L, "p one", "Brand#1", "SMALL CASE", 5, 10.0),
      (2L, "p two", "Brand#2", "SMALL CASE", 5, 10.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$dir/part.parquet")
    // cust 1: four orders, SAME date, SAME totalprice (rank/topk ties);
    // cust 2: same-date pair with distinct prices; 3 and 4: one order
    // each whose totalprice ties ACROSS customers
    (Seq((1L, 1L, "F", 100.0, ts("1996-03-01"), "1-URGENT"),
      (2L, 1L, "F", 100.0, ts("1996-03-01"), "1-URGENT"),
      (3L, 1L, "O", 100.0, ts("1996-03-01"), "2-HIGH"),
      (4L, 1L, "O", 100.0, ts("1996-03-01"), "2-HIGH"),
      (5L, 2L, "F", 80.0, ts("1996-03-01"), "3-MEDIUM"),
      (6L, 2L, "O", 90.0, ts("1996-03-01"), "3-MEDIUM"),
      (7L, 3L, "F", 70.0, ts("1996-04-01"), "4-NOT SPECIFIED"),
      (8L, 4L, "O", 70.0, ts("1996-04-01"), "5-LOW")))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    // order 1: four lines with identical (quantity, extendedprice);
    // extendedprice also ties across orders 2 and 3
    ((1 to 4).map(i => (1L, (i % 2 + 1).toLong, (i % 2 + 1).toLong, i,
      2.0, 10.0, 0.1, 0.0, "N", "O", ts("1996-03-01"))) ++
      Seq((2L, 1L, 1L, 1, 3.0, 15.0, 0.0, 0.05, "R", "F", ts("1996-03-02")),
        (3L, 2L, 2L, 1, 4.0, 15.0, 0.0, 0.05, "R", "F", ts("1996-03-02"))))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    // ONE instant t0 holds 16 of 20 events: user 1 twelve times (ids 0-11,
    // ids 0 and 1 fully identical in every non-id column), user 2 three
    // times (values tying user 1's), user 3 once (single-event user).
    // User 1 returns at t0+1day (same instant thrice) for a 2-day streak.
    // BIGINT epoch-nanos on purpose — regression-covers the loader's
    // LongType branch alongside the real fixtures' timestamp[us].
    val t0 = 1704067200L * 1000000000L
    val day = 86400L * 1000000000L
    val types = Seq("click", "view", "purchase", "error")
    val u1 = (0 until 12).map { i =>
      val v = if (i < 2) 1.0 else 1.0 + (i % 3) // duplicate pair + value ties
      (i.toLong, t0, 1L, types(if (i < 2) 0 else i % 4), v, s"""{"k": ${v.toInt}}""")
    }
    val u2 = (12 until 15).map(i => (i.toLong, t0, 2L, types(i % 4), 1.0 + (i % 3), s"""{"k": 1}"""))
    val u3 = Seq((15L, t0, 3L, "click", 2.0, """{"k": 2}"""))
    val day2 = (16 until 19).map(i => (i.toLong, t0 + day, 1L, types(i % 4), 3.0, """{"k": 3}"""))
    val stray = Seq((19L, t0 + 2 * day, 2L, "view", 4.0, """{"k": 4}"""))
    (u1 ++ u2 ++ u3 ++ day2 ++ stray)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    // same text twice in (en, s0); SAME text again under (fr, s1); a
    // token-multiset permutation; an identical-n_chars pair of distinct
    // texts; two 12-token docs with tied token counts (survive the
    // clean-pipeline quality cut)
    val dup = "tie alpha beta gamma"
    val perm = "gamma beta alpha tie"
    val twelve1 = "the a b c d e f g h i j k"
    val twelve2 = "the z y x w v u t s r q p"
    Seq(
      (0L, dup, "en", "s0", dup.length.toLong),
      (1L, dup, "en", "s0", dup.length.toLong),
      (2L, dup, "fr", "s1", dup.length.toLong),
      (3L, perm, "en", "s0", perm.length.toLong),
      (4L, "aaaa bbbb", "en", "s0", 9L),
      (5L, "cccc dddd", "en", "s0", 9L),
      (6L, twelve1, "en", "s0", twelve1.length.toLong),
      (7L, twelve2, "en", "s0", twelve2.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // v0 == v1 bit-identical (different labels: knn votes tie); v2 = 2×v0
    // (cosine ties bit-exactly, norm differs); distinct tail
    val base = Seq.tabulate(64)(j => 0.25f + j * 0.0625f)
    ((Seq((0L, base, 0), (1L, base, 1), (2L, base.map(_ * 2f), 0)) ++
      (3 until 10).map(i => (i.toLong, Seq.tabulate(64)(j =>
        math.sin(i * 64 + j).toFloat), i % 3))))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
  }

  /** Eighth set (round 14): ZERO VARIANCE WITH n>1 — every value column
    * constant while keys, timestamps, and group sizes stay non-trivial.
    * The tiny set reaches zero variance only through n=1 groups, where
    * sample statistics are NULL on both engines by arithmetic (the
    * (n−1)=0 path); here n>1 makes variance EXACTLY 0.0, which is the
    * other arm of every guard: corr/spearman/regression/autocorr zero
    * both variance factors (Spark unguarded would emit IEEE NaN where
    * DuckDB's /0 is NULL — the silent-at-100-TB divergence), z-score and
    * skew divide by a 0.0 stddev, MAD is 0 with a real median, ranks are
    * all-tied with n>1, the single event_type drives entropy to 0 and
    * chi-square to a 1×k table, idf of a token present in EVERY doc is
    * log(1)=0 so tf-idf vanishes, and an 8-deep bit-identical embedding
    * cluster ties every cosine at exactly 1.0 (plus a flat vector whose
    * min==max engages the quantizer's zero-dynamic-range guard with
    * n_dims>1). A constant column is what a stuck sensor, a default-
    * filled backfill, or a single-tenant shard looks like in production —
    * the shape arrives at 100 TB whether or not a fixture rehearses it.
    * No expected failures: constants must never cost parity.
    */
  def writeConstant(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    Seq((0, "ALL"), (1, "R1"))
      .toDF("r_regionkey", "r_name").write.parquet(s"$dir/region.parquet")
    Seq((0, "N0", 0), (1, "N1", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey").write.parquet(s"$dir/nation.parquet")
    Seq((1L, "s1", 0, 42.0), (2L, "s2", 1, 42.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.parquet(s"$dir/supplier.parquet")
    // six customers, two nations, ONE balance, ONE segment (zero-entropy
    // categorical): acctbal variance is 0.0 within and across nations
    (1L to 6L).map(i => (i, s"c$i", (i % 2).toInt, 42.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    Seq((1L, "p one", "Brand#C", "SMALL CASE", 7, 42.0),
      (2L, "p two", "Brand#C", "SMALL CASE", 7, 42.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$dir/part.parquet")
    // eight orders, four customers, ONE price, ONE status, ONE priority;
    // dates span two months so calendar grains stay non-trivial
    Seq((1L, 1L, ts("1996-03-01")), (2L, 1L, ts("1996-03-01")),
      (3L, 2L, ts("1996-03-01")), (4L, 2L, ts("1996-03-01")),
      (5L, 3L, ts("1996-03-15")), (6L, 3L, ts("1996-03-15")),
      (7L, 4L, ts("1996-04-01")), (8L, 4L, ts("1996-04-01")))
      .map { case (o, c, d) => (o, c, "F", 42.0, d, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    // ten lines, ONE (quantity, extendedprice, discount, tax, flag,
    // status): corr(quantity, price) zeroes BOTH variance factors
    ((1 to 3).map(i => (1L, (i % 2 + 1).toLong, (i % 2 + 1).toLong, i)) ++
      (2L to 8L).map(o => (o, 1L, 1L, 1)))
      .map { case (o, p, sp, ln) =>
        (o, p, sp, ln, 5.0, 42.0, 0.1, 0.0, "N", "O",
          ts(if (o <= 4) "1996-03-02" else "1996-03-16")) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    // 22 events, ONE type, ONE value, ONE props; timestamps vary (hourly
    // u1, 6-hourly u2, daily u3) so sessions/streaks/interarrival still
    // compute — over a series whose variance is exactly 0.0. BIGINT
    // epoch-nanos like the sibling sets (loader LongType branch).
    val t0 = 1704067200L * 1000000000L
    val hour = 3600L * 1000000000L
    val day = 24L * hour
    ((0 until 12).map(i => (i.toLong, t0 + i * hour, 1L)) ++
      (0 until 8).map(i => ((12 + i).toLong, t0 + i * 6 * hour, 2L)) ++
      Seq((20L, t0, 3L), (21L, t0 + day, 3L)))
      .map { case (id, t, u) => (id, t, u, "click", 7.5, """{"k": 1}""") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    // one (en, s0) block of SIX bit-identical 12-token docs (idf of every
    // token is log(6/6)=0; dedup sees a 6-clique at sim 1.0) plus an
    // identical (fr, s1) pair — 12 tokens clears the clean-pipeline
    // quality cut, same sizing as the ties set
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val t2 = "un texte constant répété deux fois pour le bloc français ici"
    ((0L to 5L).map(i => (i, t1, "en", "s0", t1.length.toLong)) ++
      Seq((6L, t2, "fr", "s1", t2.length.toLong),
        (7L, t2, "fr", "s1", t2.length.toLong)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // eight bit-identical vectors under MIXED labels (every pairwise
    // cosine exactly 1.0 — top-k is pure tie-break; knn votes split) plus
    // a flat pair whose min==max engages the quantizer's zero-range
    // guard at full dimensionality
    val base = Seq.tabulate(64)(j => 0.1f + j * 0.01f)
    ((0L to 7L).map(i => (i, base, (i % 2).toInt)) ++
      Seq((8L, Seq.fill(64)(0.5f), 2), (9L, Seq.fill(64)(0.5f), 2)))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
  }

  /** Ninth set (round 14): LONG DOCUMENTS — the web-crawl shape. One
    * ~30 KB / ~6,000-token document (ASCII, so the levenshtein byte-vs-
    * codepoint seam stays out of scope — and fn_levenshtein reads part
    * names, which stay short, since its cost is quadratic in length),
    * its EXACT duplicate (content-hashing 30 KB cross-engine), and a
    * NEAR-duplicate differing in exactly one mid-document token (minhash/
    * simhash behavior at real document length: similarity must stay
    * ≈1 but fingerprints must differ), plus short healthy docs in two
    * blocks. Every text path that is linear in document length —
    * tokenize/explode, shingles, rolling-hash fingerprint, char-gram
    * langid, PII regexes, chunking, packing — must stay linear AND agree
    * with DuckDB over the same 30 KB strings; a quadratic or
    * length-capped implementation surfaces here first. events carries a
    * ~2 KB deep-ish props JSON for the JSON-path family. No expected
    * failures.
    */
  def writeLong(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    Seq((0, "ALL"), (1, "R1"))
      .toDF("r_regionkey", "r_name").write.parquet(s"$dir/region.parquet")
    Seq((0, "N0", 0), (1, "N1", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey").write.parquet(s"$dir/nation.parquet")
    Seq((1L, "s1", 0, 10.0), (2L, "s2", 1, 20.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.parquet(s"$dir/supplier.parquet")
    Seq((1L, "c1", 0, 5.0, "SEG"), (2L, "c2", 1, 7.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    // one ~200-char part name: stretches the string family without
    // making the quadratic levenshtein meaningful (200×12 ops)
    val longName = Seq.tabulate(24)(i => s"gadget$i").mkString(" ")
    Seq((1L, "small widget", "Brand#1", "SMALL", 5, 3.5),
      (2L, longName, "Brand#2", "LARGE", 9, 7.25))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$dir/part.parquet")
    Seq((1L, 1L, "F", 10.0, ts("1996-03-01"), "1-URGENT"),
      (2L, 2L, "O", 4.5, ts("1996-04-01"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, 1L, 1L, 1, 2.0, 10.0, 0.1, 0.0, "N", "O", ts("1996-03-02")),
      (2L, 2L, 2L, 1, 1.0, 4.5, 0.0, 0.05, "R", "F", ts("1996-04-02")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    // ~2 KB valid JSON props on one event: 80 keys plus a nested object —
    // the JSON-path family must parse production-sized payloads
    val bigProps = "{" + (0 until 80).map(i => s""""k$i": $i""").mkString(", ") +
      """, "nested": {"a": [1, 2, 3], "b": "x"}}"""
    val t0 = 1704067200L * 1000000000L
    val hour = 3600L * 1000000000L
    Seq((0L, t0, 1L, "click", 1.0, bigProps),
      (1L, t0 + hour, 1L, "view", 2.0, """{"k": 1}"""),
      (2L, t0 + 2 * hour, 2L, "purchase", 3.0, """{"k": 2}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    // ~6,000 tokens over a 503-word vocabulary, a period every 13th token
    // for the sentence/punctuation paths; doc 1 is byte-identical, doc 2
    // flips exactly ONE mid-document token (near-dup at full length)
    def tok(i: Int): String = if (i % 13 == 12) s"w${i % 503}." else s"w${i % 503}"
    val longText = (0 until 6000).map(tok).mkString(" ")
    val nearText = (0 until 6000)
      .map(i => if (i == 3000) "changed" else tok(i)).mkString(" ")
    val docs = Seq(
      (0L, longText, "en", "s0", longText.length.toLong),
      (1L, longText, "en", "s0", longText.length.toLong), // exact 30 KB dup
      (2L, nearText, "en", "s0", nearText.length.toLong), // 1-token near-dup
      (3L, "a short healthy document here", "en", "s0", 29L),
      (4L, "petit document sain ici", "fr", "s1", 23L),
      (5L, "autre document court", "fr", "s1", 20L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    ((0 until 8).map(i => (i.toLong, Seq.tabulate(64)(j =>
      math.sin(i * 64 + j).toFloat), i % 3)))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
  }

  /** Tenth set (round 14): CALENDAR BOUNDARIES — the instants where date
    * arithmetic conventions diverge between engines or break under naive
    * implementations, planted so every calendar-reading family crosses
    * one. Orders stay inside 1995-12-31..1996-04-30 (the month-spine
    * queries iterate min..max months — sub_recursive_cte's recursion is
    * bounded at 91, so the ORDER span must stay narrow; the wide span
    * lives in events) and hit: the 1995/1996 New Year pair (Sunday
    * ISO-week-52 vs Monday week-1 — date_trunc('week'), weekly KPIs, and
    * the dayofweek mapping all flip here), the 1996-02-29 LEAP DAY with
    * orders on 02-28/02-29/03-01 for one customer (a RANGE frame over
    * epoch days must treat them as consecutive; 365-day epoch math breaks
    * exactly here), and the 31/30-day month ends (monthly resample and
    * spine reindex must not skip or double a period). Events carry the
    * epoch seam: a PRE-1970 run (negative epoch, including one instant
    * that is NOT hour-aligned — Spark's window() bucketing is modular
    * arithmetic, which truncates toward zero unless floor-corrected;
    * DuckDB's date_trunc always floors), the exact epoch zero, exact
    * hour/half-hour window boundaries (half-open membership: an event AT
    * a window end belongs to the NEXT window on both engines), a
    * 23:59:59→00:00:00 adjacent-second pair that rolls a session across
    * the leap-day month boundary, and four session gaps of EXACTLY 1800 s
    * (the sessionize predicate is gap > 1800: equality stays in-session —
    * a >= flip surfaces here, on both engines, as a different session
    * count). All instants are second-aligned on purpose: Spark's `div`
    * (truncate toward zero) and DuckDB's `//` (floor) only diverge on
    * NON-divisible negative nanos, which D4's trunc-to-second contract
    * keeps out of scope — the fixture must not reintroduce them. A crawl
    * corpus carries corrupt pre-1970 dates and every long-lived dataset
    * crosses leap days and year ends; none of the driver fixtures reach
    * any of these instants. No expected failures: calendar edges must
    * never cost parity.
    */
  def writeCalendar(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    Seq((0, "ALL"), (1, "R1"))
      .toDF("r_regionkey", "r_name").write.parquet(s"$dir/region.parquet")
    Seq((0, "N0", 0), (1, "N1", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey").write.parquet(s"$dir/nation.parquet")
    Seq((1L, "s1", 0, 10.0), (2L, "s2", 1, 20.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.parquet(s"$dir/supplier.parquet")
    Seq((1L, "c1", 0, 5.0, "SEG"), (2L, "c2", 0, 7.0, "SEG"),
      (3L, "c3", 1, 9.0, "OTH"), (4L, "c4", 1, 11.0, "OTH"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    Seq((1L, "widget alpha", "Brand#1", "SMALL", 5, 3.5),
      (2L, "widget beta", "Brand#2", "LARGE", 9, 7.25))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$dir/part.parquet")
    // c1: the New Year adjacency (Sun 12-31 / Mon 01-01, different ISO
    // weeks) plus a far 03-01; c2: 01-31 month end, then 02-28/02-29 —
    // the leap-day adjacency, so c2's rolling-7d RANGE frame at 02-29
    // must contain exactly {02-28, 02-29}; c3/c4: 31- and 30-day month
    // ends and interior sanity rows. Prices distinct (the ties set owns
    // tie shapes).
    Seq((1L, 1L, "F", 10.0, ts("1995-12-31"), "1-URGENT"),
      (2L, 1L, "O", 20.0, ts("1996-01-01"), "2-HIGH"),
      (3L, 2L, "F", 30.0, ts("1996-01-31"), "1-URGENT"),
      (4L, 2L, "O", 40.0, ts("1996-02-28"), "2-HIGH"),
      (5L, 2L, "F", 50.0, ts("1996-02-29"), "1-URGENT"),
      (6L, 1L, "O", 60.0, ts("1996-03-01"), "2-HIGH"),
      (7L, 3L, "F", 70.0, ts("1996-03-31"), "3-MEDIUM"),
      (8L, 3L, "O", 80.0, ts("1996-04-30"), "3-MEDIUM"),
      (9L, 4L, "F", 90.0, ts("1996-02-15"), "4-NOT SPECIFIED"),
      (10L, 4L, "O", 100.0, ts("1996-04-01"), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    // shipdates cross the same edges: a leap-day shipment, the New Year
    // eve, and both month-end flavors; quantities/prices distinct
    Seq((1L, 1L, 1L, 1, 1.0, 10.0, 0.1, 0.0, "N", "O", ts("1996-01-01")),
      (2L, 2L, 2L, 1, 2.0, 20.0, 0.0, 0.05, "R", "F", ts("1996-01-31")),
      (3L, 1L, 1L, 2, 3.0, 30.0, 0.1, 0.0, "N", "O", ts("1996-02-28")),
      (4L, 2L, 2L, 2, 4.0, 40.0, 0.2, 0.1, "R", "F", ts("1996-02-29")),
      (5L, 1L, 2L, 3, 5.0, 50.0, 0.0, 0.0, "N", "O", ts("1996-03-01")),
      (6L, 2L, 1L, 3, 6.0, 60.0, 0.1, 0.05, "R", "F", ts("1996-03-31")),
      (7L, 3L, 1L, 1, 7.0, 70.0, 0.0, 0.0, "N", "O", ts("1996-04-30")),
      (8L, 3L, 2L, 2, 8.0, 80.0, 0.1, 0.0, "R", "F", ts("1995-12-31")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    // BIGINT epoch-nanos (loader LongType branch), all second-aligned.
    // u1 walks the epoch itself: a pre-1970 session whose middle instant
    // 22:30 is NOT hour-aligned (the window()-modular-arithmetic probe),
    // 23:59:59 (the last pre-epoch second), 0 (epoch zero), and exact
    // half-hour/hour window boundaries — with gaps of EXACTLY 1800 s in
    // four places and one session spanning the epoch. u2 walks the leap
    // day: 02-28 → 02-29 → the 23:59:59/00:00:00 midnight rollover into
    // March → 03-02, a 4-day streak across leap day AND month end. u3
    // straddles the New Year at noon (2-day streak; different ISO weeks).
    val sec = 1000000000L
    val y96 = 820454400L // 1996-01-01 00:00:00 UTC (9496 days post-epoch)
    val feb28 = y96 + 58L * 86400L // 1996-02-28 00:00:00 UTC
    val types = Seq("click", "view", "purchase")
    val u1 = Seq(-7200L, -5400L, -3600L, -1L, 0L, 1800L, 3600L)
    val u2 = Seq(feb28 + 23L * 3600L, // 1996-02-28 23:00:00
      feb28 + 86400L + 23L * 3600L, // 1996-02-29 23:00:00 (leap day)
      feb28 + 2L * 86400L - 1L, // 1996-02-29 23:59:59
      feb28 + 2L * 86400L, // 1996-03-01 00:00:00 (midnight rollover)
      feb28 + 3L * 86400L) // 1996-03-02 00:00:00
    val u3 = Seq(y96 - 43200L, y96 + 43200L) // noon on both New Year sides
    (u1.zipWithIndex.map { case (t, i) => (i.toLong, t * sec, 1L, types(i % 3), 1.0 + i * 0.5, s"""{"k": $i}""") } ++
      u2.zipWithIndex.map { case (t, i) => ((7 + i).toLong, t * sec, 2L, types(i % 3), 5.0 + i * 0.5, s"""{"k": ${7 + i}}""") } ++
      u3.zipWithIndex.map { case (t, i) => ((12 + i).toLong, t * sec, 3L, types(i % 3), 8.0 + i * 0.5, s"""{"k": ${12 + i}}""") })
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    // healthy short docs (calendar stresses time, not text): one exact
    // dup pair so the dedup family still emits, two (lang, source) blocks
    val dup = "a small calendar test document"
    Seq((0L, dup, "en", "s0", dup.length.toLong),
      (1L, dup, "en", "s0", dup.length.toLong),
      (2L, "another english document here", "en", "s0", 29L),
      (3L, "petit document de calendrier", "fr", "s1", 28L),
      (4L, "encore un document court", "fr", "s1", 24L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    ((0 until 8).map(i => (i.toLong, Seq.tabulate(64)(j =>
      math.sin(i * 64 + j).toFloat), i % 3)))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
  }

  /** Eleventh set (round 14): CONTROL CHARACTERS AND EXOTIC WHITESPACE —
    * the crawl artifacts ASCII-space fixtures never carry. Documents
    * embed LF, CRLF, and TAB inside text (the house tokenizer splits on
    * the literal space character on BOTH engines, so a token containing
    * a line break must stay ONE token and hash/dedup/fingerprint
    * identically), plus the invisible separators that make two visually
    * identical strings different bytes: NBSP (U+00A0), zero-width space
    * (U+200B) inside a token, and a BOM (U+FEFF) prefixing a document —
    * each of which must flow through langid, quality, chunking, and the
    * dedup family without being silently normalized away on one engine
    * only. events.props carries escaped \n and \t INSIDE a JSON string
    * value (string-escape parsing, not raw bytes). One part name ends in
    * a LINE FEED — the canonical Java-vs-RE2 anchor seam: Java's `$`
    * (Spark) matches before a final line terminator, RE2's (DuckDB)
    * matches only at end-of-text. Since round 19 (VERDICT r18 #4)
    * fn_regexp anchors on `\z` — end-of-text on BOTH engines, no
    * terminator exception — so this set has ZERO expected divergences;
    * the trailing-LF name stays as the regression canary (the sweep and
    * DegenerateSweepSpec's positive pin both go red on a `$` revert).
    * Everything must agree.
    */
  def writeControl(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    Seq((0, "ALL"), (1, "R1"))
      .toDF("r_regionkey", "r_name").write.parquet(s"$dir/region.parquet")
    Seq((0, "N0", 0), (1, "N1", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey").write.parquet(s"$dir/nation.parquet")
    Seq((1L, "s1", 0, 10.0), (2L, "s2", 1, 20.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.parquet(s"$dir/supplier.parquet")
    Seq((1L, "c1", 0, 5.0, "SEG"), (2L, "c2", 1, 7.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    // part 2's name ends in LF: the $-anchor seam (is_widget: Spark true,
    // DuckDB false). ASCII + LF only, so fn_levenshtein's byte-vs-
    // codepoint seam stays out of scope (LF is one byte).
    Seq((1L, "small widget", "Brand#1", "SMALL", 5, 3.5),
      (2L, "control widget\n", "Brand#2", "LARGE", 9, 7.25))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$dir/part.parquet")
    Seq((1L, 1L, "F", 10.0, ts("1996-03-01"), "1-URGENT"),
      (2L, 2L, "O", 4.5, ts("1996-04-01"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, 1L, 1L, 1, 2.0, 10.0, 0.1, 0.0, "N", "O", ts("1996-03-02")),
      (2L, 2L, 2L, 1, 1.0, 4.5, 0.0, 0.05, "R", "F", ts("1996-04-02")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    // escaped \n and \t INSIDE a JSON string value — the JSON-path family
    // must unescape them identically — plus MALFORMED props rows, both
    // k-pattern-free BY DESIGN: Spark's JSON parsers (from_json /
    // get_json_object) yield NULL on malformed input, and the oracles'
    // '"k"\s*:\s*(-?[0-9]+)' regex also finds nothing in these strings,
    // so both engines agree on NULL. A malformed row that still CONTAINS
    // a plausible '"k": <digits>' substring would diverge by
    // construction (regex vs parser) — that boundary of the declared
    // equivalence is documented at the fn_json/fn_map QueryDefs, and
    // this fixture deliberately stays inside it.
    //
    // DUPLICATE JSON keys (round-14 probe): real scraped data carries
    // them, and every LIVE reader takes the FIRST occurrence in
    // agreement — from_json yields a map that physically RETAINS both
    // entries (map_keys = [k,k]) and element_at/apply scans to the
    // first; get_json_object, DuckDB's json_extract, and the oracles'
    // k-regex are first-wins too. The one last-wins reader in Spark is
    // json_tuple, which no query uses (fn_map QueryDef note). Plant the
    // strong shape — a DIFFERING-value dup on the extracted key — plus a
    // differing dup on a key no query extracts; parity across the whole
    // registry proves the first-wins chain end-to-end.
    val t0 = 1704067200L * 1000000000L
    val hour = 3600L * 1000000000L
    Seq((0L, t0, 1L, "click", 1.0, """{"k": 1, "s": "a\nb\tc"}"""),
      (1L, t0 + hour, 1L, "view", 2.0, """{"k": 2}"""),
      (2L, t0 + 2 * hour, 2L, "purchase", 3.0, """{"k": 3}"""),
      (3L, t0 + 3 * hour, 2L, "view", 4.0, """{"k": [truncated"""),
      (4L, t0 + 4 * hour, 1L, "click", 5.0, "not json at all"),
      (5L, t0 + 5 * hour, 2L, "view", 6.0, """{"k": 7, "k": 8}"""),
      (6L, t0 + 6 * hour, 1L, "purchase", 7.0, """{"q": 1, "q": 2, "k": 9}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    // n_chars carries CODE-POINT counts (house rule, unicode set):
    // NBSP/ZWSP/BOM are one code point each, multibyte in UTF-8.
    val lf = "line one\nline two\nline one again"
    val tab = "tab\tseparated\tdata plus more plain words"
    val crlf = "crlf ends\r\nnext line begins here"
    val nbsp = "nbsp\u00A0joined words stay one token"
    val zwsp = "zero\u200Bwidth space inside a token"
    val bom = "\uFEFFbom prefixed document first token"
    val fr = "petit document de contrôle ici"
    val docs = Seq(
      (0L, lf, "en", "s0"), (1L, lf, "en", "s0"), // exact dup across \n
      (2L, tab, "en", "s0"), (3L, crlf, "en", "s0"),
      (4L, nbsp, "en", "s1"), (5L, zwsp, "en", "s1"), (6L, bom, "en", "s1"),
      (7L, fr, "fr", "s1"), (8L, fr, "fr", "s1")) // fr dup pair
    docs.map { case (id, t, l, src) => (id, t, l, src,
      t.codePointCount(0, t.length).toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    ((0 until 8).map(i => (i.toLong, Seq.tabulate(64)(j =>
      math.sin(i * 64 + j).toFloat), i % 3)))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
  }

  /** The extremes set's documented expected failures: every query that
    * feeds a poisoned column (events.value or c_acctbal) into an
    * aggregation-INPUT decimal cast, which by the round-11 posture keeps
    * the loud ANSI throw (NULL there would silently drop rows from
    * SUM/AVG). Both engines throw on these inputs — Spark
    * NUMERIC_VALUE_OUT_OF_RANGE, DuckDB Conversion Error (round-10
    * probe, BASELINE.md). Shared source of truth for
    * DegenerateSweepSpec's extremes test and
    * tools/degen_preflight.sh `expected_for(extremes)`, which reads
    * tools/degen_extremes_loud.txt — DegenerateSweepSpec pins file ==
    * this set, so edit BOTH together.
    */
  val extremesLoudQueries: Set[String] = Set(
    "agg_skew", "agg_stats", // sum(cast(c_acctbal as decimal(18,4)))
    "stream_tumbling", // sumMoney2(value)
    "ts_autocorr", "ts_impute_mean", "ts_seasonality_dow", // decimal sums of value
    "win_rolling_std") // windowed decimal sums of value

  /** Extremes-set VALUE divergences (query returns on both engines but
    * the rendering is engine-defined past 2^53): Java %f formats the
    * shortest decimal representation of a double, C printf the exact
    * binary expansion — documented at the fn_format QueryDef. Part of
    * the shell sweep's expected list alongside the loud throws.
    */
  val extremesExpectedDivergences: Set[String] = Set("fn_format")

  val sets: Map[String, (SparkSession, String) => Unit] = Map(
    "tiny" -> writeTiny,
    "empty" -> writeEmpty,
    "nulls" -> writeNulls,
    "unicode" -> writeUnicode,
    "extremes" -> writeExtremes,
    "skew" -> writeSkew,
    "ties" -> writeTies,
    "constant" -> writeConstant,
    "long" -> writeLong,
    "calendar" -> writeCalendar,
    "control" -> writeControl)
}

/** `sbt "Test/runMain graft.DegenGen <baseDir>"` — materialize every
  * adversarial set in [[DegenTables.sets]] under `<baseDir>/<name>` for
  * the oracle parity sweep (tools/degen_preflight.sh drives Verify +
  * preflight.py over each).
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
