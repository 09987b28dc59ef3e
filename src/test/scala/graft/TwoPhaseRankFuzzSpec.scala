package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Differential fuzz for the round-17 closed-key second-wave rewrites:
  * each TwoPhase/histogram/top-2 formulation must be ROW-IDENTICAL to the
  * raw-row window body it replaced, on every corpus shape that stresses a
  * seam of the decomposition:
  *
  *  - TIES, including FULL-DUPLICATE rows (equal value AND equal
  *    tie-break key): rank must stay peers-shared, cume_dist must stay
  *    peers-inclusive — the seam where a row_number-based rewrite would
  *    silently diverge;
  *  - NULL values (bucket −1 ranks first for ASC windows; DESC windows
  *    put null prices last — the struct sort-key's is-null flag);
  *  - NULL group keys (every internal join is null-safe);
  *  - single-valued groups (the bucket map collapses to bucket 0 — the
  *    degenerate one-bucket fallback must equal the naive plan);
  *  - single-row groups (pct_rank's n = 1 → 0.0 guard);
  *  - adversarial skew (most mass in one bucket);
  *  - empty inputs.
  *
  * The reference is the OLD body VERBATIM as an inline Spark expression
  * over the same parquet corpus — ground truth for peers semantics by
  * construction, independently executed (no shared plan fragments with
  * the rewrite's bucket/histogram machinery).
  */
class TwoPhaseRankFuzzSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def same(newDf: DataFrame, oldDf: DataFrame, label: String): Unit = {
    val (g, w) = (sortedRows(newDf), sortedRows(oldDf))
    assert(g === w, s"$label: rewrite diverges from the raw-window body")
  }

  // ------------------------------------------------------------ customer

  private val custSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_mktsegment", StringType),
    StructField("c_acctbal", DoubleType)))

  private def custDir(rows: Seq[(Long, Option[String], Option[Double])]): String = {
    val dir = tmp("graft-tpr-cust-")
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (k, s0, v) => Row(k, s0.orNull, v.map(Double.box).orNull) },
        4),
      custSchema).write.parquet(s"$dir/customer.parquet")
    dir
  }

  private def oldPctRank(d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, d)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        Exact.roundN(percent_rank().over(w), 4).as("pct_rank"),
        Exact.roundN(cume_dist().over(w), 4).as("cume"))
  }

  private def oldCumeDist(d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, d)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        Exact.roundN(cume_dist().over(w), 6).as("cd"))
  }

  private def oldPctDisc(d: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(spark, d)
      .select(col("c_mktsegment"), col("c_acctbal"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy(col("c_mktsegment"))).as("n"))
      .groupBy(col("c_mktsegment"))
      .agg(
        max(when(col("rn") === ceil(col("n") * 0.5d), col("c_acctbal"))).as("med_disc"),
        max(when(col("rn") === ceil(col("n") * 0.9d), col("c_acctbal"))).as("p90_disc"))
  }

  private def checkCustomer(rows: Seq[(Long, Option[String], Option[Double])],
      label: String): Unit = {
    val d = custDir(rows)
    same(Registry.queries("win_pct_rank")(spark, d), oldPctRank(d), s"$label/pct_rank")
    same(Registry.queries("win_cume_dist")(spark, d), oldCumeDist(d), s"$label/cume_dist")
    same(Registry.queries("agg_percentile_disc")(spark, d), oldPctDisc(d),
      s"$label/percentile_disc")
  }

  test("customer family: random draws across group sizes (incl. n=1)") {
    val rnd = new scala.util.Random(41L)
    val rows = Seq(1, 3, 57, 400, 1311).zipWithIndex.flatMap { case (n, g) =>
      (1 to n).map(i =>
        (g * 100000L + i, Some(s"s$g"), Some(rnd.nextDouble() * 2000 - 500)))
    }
    checkCustomer(rows, "random")
  }

  test("customer family: tie pools and FULL-DUPLICATE (bal, key) rows") {
    val rnd = new scala.util.Random(97L)
    val pool = Vector(-7.25, 0.0, 0.0, 3.5, 3.5, 3.5, 11.0, 250.0)
    // duplicate custkeys on purpose: i % 50 collides — with the pooled
    // balances this produces genuine full-duplicate (value, key) peers,
    // the cume_dist seam a row_number rewrite would get wrong.
    val rows = (1 to 800).map(i =>
      ((i % 50).toLong, Some(s"t${i % 2}"), Some(pool(rnd.nextInt(pool.size)))))
    checkCustomer(rows, "ties")
  }

  test("customer family: all-equal balances collapse to one bucket") {
    checkCustomer((1 to 300).map(i => (i.toLong, Some("eq"), Some(42.0))), "all-equal")
  }

  test("customer family: null balances and a null segment key") {
    val rnd = new scala.util.Random(7L)
    val rows = (1 to 500).map { i =>
      val seg = i % 3 match {
        case 0 => None
        case 1 => Some("a")
        case _ => Some("b")
      }
      val bal = if (i % 4 == 0) None else Some(rnd.nextDouble() * 100)
      (i.toLong, seg, bal)
    } ++ (1 to 40).map(i => (9000L + i, Some("allnull"), None: Option[Double]))
    checkCustomer(rows, "nulls")
  }

  test("customer family: adversarial skew packs one bucket") {
    val rnd = new scala.util.Random(271L)
    val rows = (1 to 900).map { i =>
      (i.toLong, Some("skew"),
        Some(if (i <= 850) 1e9 + rnd.nextInt(2) else rnd.nextDouble()))
    }
    checkCustomer(rows, "skew")
  }

  test("customer family: empty input yields empty results") {
    val d = custDir(Seq.empty)
    assert(Registry.queries("win_pct_rank")(spark, d).count() === 0L)
    assert(Registry.queries("win_cume_dist")(spark, d).count() === 0L)
    assert(Registry.queries("agg_percentile_disc")(spark, d).count() === 0L)
  }

  // ---------------------------------------------------------------- part

  private val partSchema = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_brand", StringType),
    StructField("p_retailprice", DoubleType)))

  private def partDir(rows: Seq[(Long, Option[String], Option[Double])]): String = {
    val dir = tmp("graft-tpr-part-")
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (k, b, v) => Row(k, b.orNull, v.map(Double.box).orNull) },
        4),
      partSchema).write.parquet(s"$dir/part.parquet")
    dir
  }

  private def oldRankDense(d: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc)
    Tables.part(spark, d)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"))
  }

  private def oldFirstNth(d: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.part(spark, d)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        first(col("p_partkey")).over(w).as("top_part"),
        nth_value(col("p_partkey"), 2).over(w).as("second_part"))
  }

  private def checkPart(rows: Seq[(Long, Option[String], Option[Double])],
      label: String): Unit = {
    val d = partDir(rows)
    same(Registry.queries("win_rank_dense")(spark, d), oldRankDense(d),
      s"$label/rank_dense")
    same(Registry.queries("win_first_nth")(spark, d), oldFirstNth(d),
      s"$label/first_nth")
  }

  test("part family: random prices, tie runs, null prices, null brand, 1-row brands") {
    val rnd = new scala.util.Random(53L)
    val pool = Vector(10.0, 10.0, 10.0, 55.5, 99.99, 99.99, 1e6)
    val rows =
      (1 to 600).map(i => (i.toLong,
        if (i % 11 == 0) None else Some(s"b${i % 7}"),
        if (i % 13 == 0) None else Some(pool(rnd.nextInt(pool.size))))) ++
        Seq((9001L, Some("solo"), Some(1.0)), (9002L, Some("soloNull"), None))
    checkPart(rows, "part-mixed")
  }

  test("part family: all-equal prices within a brand (rank 1 everywhere)") {
    checkPart((1 to 200).map(i => (i.toLong, Some(s"b${i % 3}"), Some(7.5))),
      "part-allequal")
  }

  test("part family: empty input yields empty results") {
    val d = partDir(Seq.empty)
    assert(Registry.queries("win_rank_dense")(spark, d).count() === 0L)
    assert(Registry.queries("win_first_nth")(spark, d).count() === 0L)
  }

  // -------------------------------------------------------------- events

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  private def eventsDir(rows: Seq[(Long, Option[String], Option[Long])]): String = {
    val dir = tmp("graft-tpr-ev-")
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, t, micros) =>
          Row(id, id % 7, t.orNull,
            micros.map(m => java.sql.Timestamp.from(
              java.time.Instant.EPOCH.plusNanos(m * 1000))).orNull,
            0.0)
        }, 4),
      eventsSchema).write.parquet(s"$dir/events.parquet")
    dir
  }

  private def oldConcurrency(d: String): DataFrame = {
    val bounds = Tables.events(spark, d)
      .select(col("event_type"), explode(array(
        struct(col("ts").as("bt"), lit(1).as("delta")),
        struct((col("ts") + expr("INTERVAL 30 MINUTE")).as("bt"),
          lit(-1).as("delta")))).as("b"))
      .select(col("event_type"), col("b.bt").as("bt"), col("b.delta").as("delta"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bt"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounds.withColumn("live", sum(col("delta")).over(w))
      .groupBy(col("event_type"))
      .agg(max(col("live")).cast("long").as("peak_concurrent"))
  }

  test("concurrency: bursts straddling day boundaries, one-day corpus, null type") {
    val rnd = new scala.util.Random(19L)
    val day = 86400000000L
    // bursts that OPEN before midnight and CLOSE after it — the seam
    // where a per-day-bucket decomposition must carry the offset across.
    val rows = (1 to 2000).map { i =>
      val base = (i % 5).toLong * day + (if (i % 3 == 0) day - 600000000L
                                         else rnd.nextLong(day))
      (i.toLong,
        if (i % 17 == 0) None else Some(s"t${i % 3}"),
        Some(base))
    }
    val d = eventsDir(rows)
    same(Registry.queries("ts_active_concurrency")(spark, d), oldConcurrency(d),
      "concurrency/multiday")
    // single-day corpus: the decomposition degenerates to one bucket.
    val d1 = eventsDir((1 to 300).map(i =>
      (i.toLong, Some("x"), Some((i % 1000).toLong * 1000000L))))
    same(Registry.queries("ts_active_concurrency")(spark, d1), oldConcurrency(d1),
      "concurrency/oneday")
  }

  // ----------------------------------------------------------- documents

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("text", StringType)))

  private def docsDir(rows: Seq[(Long, Option[String], Option[String])]): String = {
    val dir = tmp("graft-tpr-doc-")
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (id, l, t) => Row(id, l.orNull, t.orNull) }, 4),
      docsSchema).write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def oldPackBins(d: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .withColumn("cum", sum(col("n_toks")).over(w))
      .select(col("doc_id"), col("lang"), col("n_toks"),
        floor((col("cum") - col("n_toks")) / 512d).cast("long").as("bin"))
  }

  test("pack_bins: sparse/dense doc_id ranges, null text, null lang, empty") {
    val rnd = new scala.util.Random(23L)
    val words = (n: Int) => Seq.fill(n)("w").mkString(" ")
    val rows = (1 to 900).map { i =>
      // adversarial id spacing: dense run then huge gaps (skewed buckets)
      val id = if (i < 700) i.toLong else 1000000L + i * 997L
      (id,
        if (i % 19 == 0) None else Some(s"l${i % 4}"),
        if (i % 23 == 0) None else Some(words(1 + rnd.nextInt(300))))
    }
    val d = docsDir(rows)
    same(Registry.queries("text_pack_bins")(spark, d), oldPackBins(d), "pack/mixed")
    assert(Registry.queries("text_pack_bins")(spark, docsDir(Seq.empty)).count() === 0L)
  }

  test("pack_bins: a doc_id range wider than Long.MaxValue/Buckets must not overflow") {
    // ADVICE r17: TwoPhase.bucket computed (v − lo) · 64 on the column's
    // NATIVE type, so a long-keyed group whose id range exceeds
    // Long.MaxValue/64 overflowed the multiply — under ANSI that throws
    // and kills the job. Bucket placement only needs an approximately
    // monotone division, so the map now goes through double first.
    val rows = Seq(
      (0L, Some("l0"), Some("a b c")),
      (Long.MaxValue / 32L, Some("l0"), Some("d e")),
      (Long.MaxValue - 1L, Some("l0"), Some("f g h i")),
      (5L, Some("l1"), Some("j k")))
    val d = docsDir(rows)
    same(Registry.queries("text_pack_bins")(spark, d), oldPackBins(d), "pack/widerange")
  }

  // -------------------------------------------------------------- orders

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_orderpriority", StringType),
    StructField("o_totalprice", DoubleType)))

  private def ordersDir(rows: Seq[(Long, Option[String], Option[Double])]): String = {
    val dir = tmp("graft-tpr-ord-")
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (k, p, v) => Row(k, p.orNull, v.map(Double.box).orNull) },
        4),
      ordersSchema).write.parquet(s"$dir/orders.parquet")
    dir
  }

  /** Ground truth for agg_gini: the ORIGINAL row_number body verbatim
    * (round-2 formulation, commit dfdf749) — Σ(rank·x) over raw rows.
    * ADVICE r17: agg_gini's oracle was rewritten to the same histogram
    * closed form as the Spark body, so unlike the other eleven rewrites a
    * shared derivation mistake (the m·cnt_lt + m(m+1)/2 weight, null
    * handling) would pass both engines undetected; this pins the closed
    * form against the independent raw-rank derivation. The old body's
    * unguarded /0 (double NaN/Inf, vs the new body's declared NULL) is
    * out of scope — fixtures avoid all-zero-price groups; the nullif
    * guard is DegenerateGroupSpec's territory.
    */
  private def oldGini(d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, d)
      .withColumn("rn", row_number().over(w))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        Exact.sumDec(col("o_totalprice")).cast("double").as("sx"),
        sum((col("rn") * col("o_totalprice")).cast("decimal(28,8)"))
          .cast("double").as("swx"))
      .select(col("o_orderpriority"),
        Exact.roundN(
          lit(2.0d) * col("swx") / (col("n") * col("sx")) -
            (col("n") + 1.0d) / col("n"), 4).as("gini"))
  }

  test("gini: tie runs, null prices, null priority, 1-row groups, skewed mass") {
    val rnd = new scala.util.Random(67L)
    val pool = Vector(1.0, 1.0, 1.0, 2.5, 2.5, 40.0, 1000.0)
    val rows = (1 to 1500).map { i =>
      (i.toLong,
        if (i % 31 == 0) None else Some(s"p${i % 4}"),
        if (i % 11 == 0) None else Some(pool(rnd.nextInt(pool.size))))
    } ++ Seq(
      (9001L, Some("solo"), Some(7.0)),          // 1-row group
      (9002L, Some("allnull"), None),            // all-null-price group
      (9003L, Some("allnull"), None)) ++
      (1 to 200).map(i => (9100L + i, Some("skew"),
        Some(if (i <= 195) 0.01 else 50000.0)))  // extreme concentration
    val d = ordersDir(rows)
    same(Registry.queries("agg_gini")(spark, d), oldGini(d), "gini/mixed")
    assert(Registry.queries("agg_gini")(spark, ordersDir(Seq.empty)).count() === 0L)
  }

  // ------------------------------------------------------------ lineitem

  private val liSchema = StructType(Seq(
    StructField("l_returnflag", StringType),
    StructField("l_quantity", DoubleType),
    StructField("l_discount", DoubleType)))

  private def liDir(rows: Seq[(Option[String], Option[Double], Option[Double])]): String = {
    val dir = tmp("graft-tpr-li-")
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (f, q, di) =>
          Row(f.orNull, q.map(Double.box).orNull, di.map(Double.box).orNull)
        }, 4),
      liSchema).write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  /** Ground truth for agg_spearman's rank maps: raw-row min-rank windows
    * (rank() ASC NULLS FIRST — the pre-round-17 formulation, correct at
    * fixture scale), feeding the identical decimal closed form.
    */
  private def oldSpearman(d: String): DataFrame = {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val wq = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
    val wd = Window.partitionBy(col("l_returnflag")).orderBy(col("l_discount"))
    Tables.lineitem(spark, d)
      .select(col("l_returnflag"),
        rank().over(wq).cast("long").as("rx"),
        rank().over(wd).cast("long").as("ry"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(dec(col("rx"))).cast("double").as("sx"),
        sum(dec(col("ry"))).cast("double").as("sy"),
        sum(dec(col("rx")) * dec(col("rx"))).cast("double").as("sxx"),
        sum(dec(col("ry")) * dec(col("ry"))).cast("double").as("syy"),
        sum(dec(col("rx")) * dec(col("ry"))).cast("double").as("sxy"))
      .select(col("l_returnflag"),
        Exact.roundN(
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            nullif(sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), lit(0.0d)), 4)
          .as("spearman"))
  }

  test("spearman: tie pools, nulls in either measure, null flag, " +
      "all-tied group, empty") {
    val rnd = new scala.util.Random(83L)
    val qPool = Vector(1.0, 1.0, 2.0, 2.0, 2.0, 7.0, 50.0)
    val dPool = Vector(0.0, 0.0, 0.05, 0.1, 0.1)
    val rows = (1 to 1200).map { i =>
      (if (i % 29 == 0) None else Some(s"f${i % 3}"),
        if (i % 13 == 0) None else Some(qPool(rnd.nextInt(qPool.size))),
        if (i % 17 == 0) None else Some(dPool(rnd.nextInt(dPool.size))))
    } ++ (1 to 50).map(_ => (Some("tied"), Some(5.0), Some(0.05)))
    val d = liDir(rows)
    same(Registry.queries("agg_spearman")(spark, d), oldSpearman(d), "spearman/mixed")
    assert(Registry.queries("agg_spearman")(spark, liDir(Seq.empty)).count() === 0L)
  }

  // ------------------------------------------------- AQE coalesce toggle

  test("two-phase bodies are row-identical with AQE partition coalescing " +
      "toggled both ways (VERDICT r17 #7)") {
    // The two-phase rewrites are fuzz-pinned for row identity above, but
    // always under the session's default AQE settings. AQE partition
    // coalescing is the mechanism most likely to merge the histogram /
    // offsets stages' tiny partitions differently at cluster scale, so
    // run the whole family under BOTH settings — a decomposition that
    // accidentally depended on physical partition boundaries (the thing
    // TwoPhase.bucket's determinism contract forbids) would diverge here.
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val orig = spark.conf.get(key)
    val rnd = new scala.util.Random(143L)
    try {
      for (v <- Seq("false", "true")) {
        spark.conf.set(key, v)
        checkCustomer(
          (1 to 700).map(i => (i.toLong,
            if (i % 23 == 0) None else Some(s"s${i % 3}"),
            if (i % 9 == 0) None else Some(rnd.nextDouble() * 500 - 100))),
          s"aqe-coalesce-$v")
        val dd = docsDir((1 to 400).map { i =>
          (if (i < 300) i.toLong else 50000L + i * 31L,
            if (i % 17 == 0) None else Some(s"l${i % 3}"),
            Some(Seq.fill(1 + rnd.nextInt(40))("w").mkString(" ")))
        })
        same(Registry.queries("text_pack_bins")(spark, dd), oldPackBins(dd),
          s"aqe-coalesce-$v/pack_bins")
        val de = eventsDir((1 to 600).map(i =>
          (i.toLong, if (i % 13 == 0) None else Some(s"t${i % 2}"),
            Some((i % 4).toLong * 86400000000L + rnd.nextLong(86400000000L)))))
        same(Registry.queries("ts_active_concurrency")(spark, de),
          oldConcurrency(de), s"aqe-coalesce-$v/concurrency")
        val dp = partDir((1 to 300).map(i => (i.toLong,
          if (i % 19 == 0) None else Some(s"b${i % 5}"),
          if (i % 11 == 0) None else Some(rnd.nextInt(40) * 2.5))))
        same(Registry.queries("win_first_nth")(spark, dp), oldFirstNth(dp),
          s"aqe-coalesce-$v/first_nth")
        same(Registry.queries("win_rank_dense")(spark, dp), oldRankDense(dp),
          s"aqe-coalesce-$v/rank_dense")
        val dor = ordersDir((1 to 500).map(i => (i.toLong,
          if (i % 29 == 0) None else Some(s"p${i % 3}"),
          if (i % 7 == 0) None else Some(rnd.nextInt(30) * 1.5 + 1.0))))
        same(Registry.queries("agg_gini")(spark, dor), oldGini(dor),
          s"aqe-coalesce-$v/gini")
        val dl = liDir((1 to 500).map(i =>
          (Some(s"f${i % 2}"),
            if (i % 13 == 0) None else Some(rnd.nextInt(20) * 1.0),
            if (i % 11 == 0) None else Some(rnd.nextInt(8) * 0.01))))
        same(Registry.queries("agg_spearman")(spark, dl), oldSpearman(dl),
          s"aqe-coalesce-$v/spearman")
      }
    } finally spark.conf.set(key, orig)
  }
}
