package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TwoPhase

/** Diagnostic main (assertion-free) for the round-18 two-phase constant
  * shave (VERDICT r17 #1): times each candidate op's CURRENT registry body
  * against a restructured variant under Bench's conditions (local[32],
  * shuffle.partitions=32, count() action), interleaved reps, medians to
  * stderr. The variants all share one idea: derive the per-bucket
  * offsets/counts from the SAME windowed stream the main phase consumes —
  * both consumers then prune to the identical column set (partition keys +
  * sort keys + carried values), so their exchanges canonicalize equal and
  * AQE stage reuse collapses the second scan+shuffle the round-17 bodies
  * paid as a "load-bearingly sequential" repeat.
  *
  * Run: `sbt -batch "Test/runMain graft.TwoPhaseShaveBench [sfDir] [reps] [ops]"`.
  */
object TwoPhaseShaveBench {

  // ---- variant bodies -----------------------------------------------------

  /** win_pct_rank, offsets derived from the windowed stream (one heavy
    * exchange, AQE-reused across the offs aggregate and the output join).
    */
  def pctRankV2(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
    val stats = c.groupBy(col("c_mktsegment").as("sg"))
      .agg(min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
    val wIn = Window.partitionBy(col("c_mktsegment"), col("bkt"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    val local = c.join(broadcast(stats), col("c_mktsegment") <=> col("sg"))
      .withColumn("bkt", TwoPhase.bucket(col("c_acctbal"), col("lo"), col("hi")))
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"), col("bkt"))
      .withColumn("lrk", rank().over(wIn))
      .withColumn("lc", count(lit(1)).over(wIn)) // default frame: peers≤
    val wOff = Window.partitionBy(col("og")).orderBy(col("obkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = local
      .groupBy(col("c_mktsegment").as("og"), col("bkt").as("obkt"))
      .agg(max(col("lc")).as("cnt")) // last peer group's lc = bucket count
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("og"))))
      .select(col("og"), col("obkt"), col("off"), col("n"))
    local.join(broadcast(offs),
        col("c_mktsegment") <=> col("og") && col("bkt") === col("obkt"))
      .select(
        col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        Exact.roundN(
          when(col("n") === 1L, lit(0.0d)).otherwise(
            (col("off") + col("lrk") - lit(1L)).cast("double") /
              (col("n") - lit(1L)).cast("double")), 4).as("pct_rank"),
        Exact.roundN(
          (col("off") + col("lc")).cast("double") / col("n").cast("double"),
          4).as("cume"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** win_cume_dist, same restructure. */
  def cumeDistV2(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val stats = c.groupBy(col("c_mktsegment").as("sg"))
      .agg(min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
    val wIn = Window.partitionBy(col("c_mktsegment"), col("bkt"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    val local = c.join(broadcast(stats), col("c_mktsegment") <=> col("sg"))
      .withColumn("bkt", TwoPhase.bucket(col("c_acctbal"), col("lo"), col("hi")))
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"), col("bkt"))
      .withColumn("lc", count(lit(1)).over(wIn))
    val wOff = Window.partitionBy(col("og")).orderBy(col("obkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = local
      .groupBy(col("c_mktsegment").as("og"), col("bkt").as("obkt"))
      .agg(max(col("lc")).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("og"))))
      .select(col("og"), col("obkt"), col("off"), col("n"))
    local.join(broadcast(offs),
        col("c_mktsegment") <=> col("og") && col("bkt") === col("obkt"))
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        Exact.roundN(
          (col("off") + col("lc")).cast("double") / col("n").cast("double"),
          6).as("cd"))
      .orderBy("c_custkey")
  }

  /** agg_percentile_disc: rank ALL buckets in the shared windowed stream
    * (state still bounded by bucket population), derive counts from it,
    * select the target ranks in the final aggregate.
    */
  def pctDiscV2(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .select(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"))
    val stats = c.groupBy(col("c_mktsegment").as("sg"))
      .agg(min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
    val wIn = Window.partitionBy(col("c_mktsegment"), col("bkt"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    val local = c.join(broadcast(stats), col("c_mktsegment") <=> col("sg"))
      .withColumn("bkt", TwoPhase.bucket(col("c_acctbal"), col("lo"), col("hi")))
      .select(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"), col("bkt"))
      .withColumn("lrn", row_number().over(wIn))
    val wOff = Window.partitionBy(col("og")).orderBy(col("obkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = local
      .groupBy(col("c_mktsegment").as("og"), col("bkt").as("obkt"))
      .agg(max(col("lrn")).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("og"))))
      .select(col("og"), col("obkt"), col("off"), col("n"))
    local.join(broadcast(offs),
        col("c_mktsegment") <=> col("og") && col("bkt") === col("obkt"))
      .withColumn("rk", col("off") + col("lrn"))
      .groupBy(col("c_mktsegment"))
      .agg(
        max(when(col("rk") === ceil(col("n") * 0.5d), col("c_acctbal"))).as("med_disc"),
        max(when(col("rk") === ceil(col("n") * 0.9d), col("c_acctbal"))).as("p90_disc"))
      .orderBy("c_mktsegment")
  }

  /** text_pack_bins: tokenize once, offsets from the windowed stream
    * (running sum of non-negative n_toks ⇒ bucket total = max(lcum)).
    */
  def packBinsV2(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
    val stats = Tables.documents(s, d).select(col("lang"), col("doc_id"))
      .groupBy(col("lang").as("sg"))
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
    val wIn = Window.partitionBy(col("lang"), col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = docs.join(broadcast(stats), col("lang") <=> col("sg"))
      .withColumn("bkt", TwoPhase.bucket(col("doc_id"), col("lo"), col("hi")))
      .select(col("doc_id"), col("lang"), col("n_toks"), col("bkt"))
      .withColumn("lcum", sum(col("n_toks")).over(wIn))
    val wOff = Window.partitionBy(col("og")).orderBy(col("obkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = local
      .groupBy(col("lang").as("og"), col("bkt").as("obkt"))
      .agg(max(col("lcum")).as("tsum"))
      .withColumn("off", coalesce(sum(col("tsum")).over(wOff), lit(0L)))
      .select(col("og"), col("obkt"), col("off"))
    local.join(broadcast(offs),
        col("lang") <=> col("og") && col("bkt") === col("obkt"))
      .select(col("doc_id"), col("lang"), col("n_toks"),
        floor((col("off") + col("lcum") - col("n_toks")) / 512d)
          .cast("long").as("bin"))
      .orderBy("doc_id")
  }

  /** ts_active_concurrency: the peak is max(off + per-bucket max(lcum)) —
    * no join back onto raw rows at all; one scan, one heavy exchange.
    */
  def activeConcV2(s: SparkSession, d: String): DataFrame = {
    val bounds = Tables.events(s, d)
      .select(col("event_type"), explode(array(
        struct(col("ts").as("bt"), lit(1).as("delta")),
        struct((col("ts") + expr("INTERVAL 30 MINUTE")).as("bt"),
          lit(-1).as("delta")))).as("b"))
      .select(col("event_type"), col("b.bt").as("bt"), col("b.delta").as("delta"))
      .withColumn("bkt", date_trunc("DAY", col("bt")))
    val wIn = Window.partitionBy(col("event_type"), col("bkt"))
      .orderBy(col("bt"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perBucket = bounds
      .withColumn("lcum", sum(col("delta")).over(wIn))
      .groupBy(col("event_type"), col("bkt"))
      .agg(max(col("lcum")).as("lmax"), sum(col("delta")).as("dsum"))
    val wOff = Window.partitionBy(col("event_type")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perBucket
      .withColumn("off", coalesce(sum(col("dsum")).over(wOff), lit(0L)))
      .groupBy(col("event_type"))
      .agg(max(col("off") + col("lmax")).cast("long").as("peak_concurrent"))
      .orderBy("event_type")
  }

  /** agg_spearman: rank maps as range-frame windows directly over the cell
    * stream — no re-aggregation, no broadcast joins; one cell exchange plus
    * one tiny repartition(flag) serves all four windows and the final agg.
    */
  def spearmanV2(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity"), col("l_discount"))
      .groupBy(col("l_returnflag"), col("l_quantity"), col("l_discount"))
      .agg(count(lit(1)).as("c"))
      .repartition(col("l_returnflag"))
    def rk(v: Column, grpCols: Seq[Column], ordered: Column): Column = {
      val le = sum(col("c")).over(Window.partitionBy(col("l_returnflag"))
        .orderBy(ordered).rangeBetween(Window.unboundedPreceding, Window.currentRow))
      val grp = sum(col("c")).over(Window.partitionBy(grpCols: _*))
      le - grp + lit(1L)
    }
    def dec(c: Column) = c.cast("decimal(38,0)")
    cells
      .withColumn("rx", rk(col("l_quantity"),
        Seq(col("l_returnflag"), col("l_quantity")), col("l_quantity")))
      .withColumn("ry", rk(col("l_discount"),
        Seq(col("l_returnflag"), col("l_discount")), col("l_discount")))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("c")).cast("double").as("n"),
        sum(dec(col("c")) * dec(col("rx"))).cast("double").as("sx"),
        sum(dec(col("c")) * dec(col("ry"))).cast("double").as("sy"),
        sum(dec(col("c")) * dec(col("rx")) * dec(col("rx"))).cast("double").as("sxx"),
        sum(dec(col("c")) * dec(col("ry")) * dec(col("ry"))).cast("double").as("syy"),
        sum(dec(col("c")) * dec(col("rx")) * dec(col("ry"))).cast("double").as("sxy"))
      .select(col("l_returnflag"),
        Exact.roundN(
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            nullif(sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), lit(0.0d)), 4)
          .as("spearman"))
      .orderBy("l_returnflag")
  }

  /** win_first_nth: bounded top-2 typed aggregate (graft.functions.BottomTwo)
    * instead of the tpid-salted WindowGroupLimit pass — no map-side sort,
    * no salt-window exchange, one tiny combinable aggregate.
    */
  def firstNthV2(s: SparkSession, d: String): DataFrame = {
    val p0 = Tables.part(s, d)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
    val bottom2 = udaf(graft.functions.BottomTwo)
    val top2 = p0
      .groupBy(col("p_brand").as("tb"))
      .agg(bottom2(
        col("p_retailprice").isNull,
        coalesce(-col("p_retailprice"), lit(0.0d)),
        col("p_partkey")).as("t2"))
      .select(col("tb"), col("t2.top").as("top_part"),
        col("t2.second").as("second_part"))
    p0.join(broadcast(top2), col("p_brand") <=> col("tb"))
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        col("top_part"), col("second_part"))
      .orderBy("p_brand", "p_partkey")
  }

  /** agg_trimmed_mean with the percentile_approx accuracy lowered
    * 10000 → 2000 (bracket proof: rank error ≤ nn/2000 < grid cell
    * nn/1000 still holds with 2× margin; bands and pass 2 unchanged).
    */
  def trimmedMeanV2(s: SparkSession, d: String): DataFrame = {
    val price = col("o_totalprice")
    val zero38 = lit(java.math.BigDecimal.ZERO).cast("decimal(38,4)")
    val o = Tables.orders(s, d).select(col("o_orderpriority"), price)
    val grid = lit((0 to 1000).map(_ / 1000.0).toArray)
    val base = o.groupBy(col("o_orderpriority").as("pr"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(price.isNull, 1L).otherwise(0L)).as("n_null"),
        Exact.sumDec(price).as("total"),
        percentile_approx(price, grid, lit(2000)).as("fences"))
      .withColumn("mb", floor(col("n") / lit(10)).cast("long"))
      .withColumn("mt",
        col("n") - floor(col("n") - col("n") / lit(10)).cast("long"))
      .withColumn("nn", col("n") - col("n_null"))
      .withColumn("kb", greatest(lit(0L), col("mb") - col("n_null")))
      .withColumn("kt", least(col("mt"), col("nn")))
    def fenceAt(j: Column): (Column, Column) = {
      val q = j.cast("double") / col("nn")
      val lo = (greatest(lit(0L), floor(q * 1000) - 1) + 1).cast("int")
      val hi = (least(lit(1000L), ceil(q * 1000) + 1) + 1).cast("int")
      (element_at(col("fences"), lo), element_at(col("fences"), hi))
    }
    val withFences = {
      val (f1, f2) = fenceAt(col("kb"))
      val (g1, g2) = fenceAt(col("nn") - col("kt") + 1)
      base
        .withColumn("f1", when(col("kb") >= 1, f1))
        .withColumn("f2", when(col("kb") >= 1, f2))
        .withColumn("g1", when(col("kt") >= 1, g1))
        .withColumn("g2", when(col("kt") >= 1, g2))
    }
    val meta = Seq("n", "n_null", "total", "nn", "mb", "mt", "kb", "kt",
      "f1", "g1")
    val bands = o
      .join(broadcast(withFences.drop("fences")),
        col("o_orderpriority") <=> col("pr"))
      .withColumn("bp", when(
        (price >= col("f1") && price <= col("f2")) ||
          (price >= col("g1") && price <= col("g2")), price))
      .groupBy(col("pr") +: meta.map(col) :+ col("bp"): _*)
      .agg(
        count(price).as("c"),
        sum(when(price < col("f1"), 1L).otherwise(0L)).as("c1p"),
        Exact.sumDec(when(price < col("f1"), price)).as("s1p"),
        sum(when(price < col("g1"), 1L).otherwise(0L)).as("c1hp"),
        Exact.sumDec(when(price < col("g1"), price)).as("s1hp"))
      .groupBy(col("pr") +: meta.map(col): _*)
      .agg(
        sum(col("c1p")).as("c1"),
        coalesce(sum(col("s1p")), zero38).as("s1"),
        sum(col("c1hp")).as("c1h"),
        coalesce(sum(col("s1hp")), zero38).as("s1h"),
        sort_array(collect_list(when(col("bp").isNotNull,
          struct(col("bp").as("p"), col("c").as("c"))))).as("arr"))
    def walk(from: Column, j: Column): Column =
      aggregate(
        filter(col("arr"), x => x("p") >= from),
        struct(lit(0L).as("cum"), zero38.as("cums"),
          lit(null).cast("double").as("t"), lit(0L).as("cb"),
          zero38.as("sb"), lit(0L).as("mu")),
        (acc, x) => {
          val hit = acc("t").isNull && (acc("cum") + x("c")) >= j
          struct(
            (acc("cum") + x("c")).as("cum"),
            (acc("cums") + x("p").cast("decimal(18,4)") * x("c"))
              .cast("decimal(38,4)").as("cums"),
            when(hit, x("p")).otherwise(acc("t")).as("t"),
            when(hit, acc("cum")).otherwise(acc("cb")).as("cb"),
            when(hit, acc("cums")).otherwise(acc("sb")).as("sb"),
            when(hit, x("c")).otherwise(acc("mu")).as("mu"))
        })
    val r = bands
      .withColumn("lo", walk(col("f1"), col("kb") - col("c1")))
      .withColumn("hi",
        walk(col("g1"), col("nn") - col("kt") + 1 - col("c1h")))
    val t = r("lo")("t")
    val bottomSum = r("s1") + r("lo")("sb") +
      (r("kb") - r("c1") - r("lo")("cb")).cast("decimal(20,0)") *
        t.cast("decimal(18,4)")
    val u = r("hi")("t")
    val cntLeU = r("c1h") + r("hi")("cb") + r("hi")("mu")
    val sumLeU = r("s1h") + r("hi")("sb") +
      r("hi")("mu").cast("decimal(20,0)") * u.cast("decimal(18,4)")
    val topSum = (r("total") - sumLeU) +
      (r("kt") - (r("nn") - cntLeU)).cast("decimal(20,0)") *
        u.cast("decimal(18,4)")
    val trimmedSum = r("total") -
      when(col("kb") >= 1, bottomSum).otherwise(zero38) -
      when(col("kt") >= 1, topSum).otherwise(zero38)
    r.withColumn("n_kept", col("n") - col("mb") - col("mt"))
      .filter(col("n_kept") > 0)
      .select(col("pr").as("o_orderpriority"), col("n_kept"),
        when(col("nn") - col("kb") - col("kt") > 0,
          Exact.roundN(trimmedSum.cast("double") / col("n_kept"), 4))
          .as("trimmed_mean"))
      .orderBy("o_orderpriority")
  }

  val variants: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_first_nth" -> (firstNthV2 _),
    "agg_trimmed_mean" -> (trimmedMeanV2 _),
    "win_pct_rank" -> (pctRankV2 _),
    "win_cume_dist" -> (cumeDistV2 _),
    "agg_percentile_disc" -> (pctDiscV2 _),
    "text_pack_bins" -> (packBinsV2 _),
    "ts_active_concurrency" -> (activeConcV2 _),
    "agg_spearman" -> (spearmanV2 _))

  // ---- harness ------------------------------------------------------------

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val only = args.lift(2).filter(_ != "-")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("two-phase-shave")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries.get("scan_full").foreach(fn => fn(spark, dir).count())

    def time(fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val names = variants.keys.toSeq.sorted.filter(n => only.forall(_.contains(n)))
    // Cold mode (`cold:cur` / `cold:v2` as arg 4): time each op exactly
    // ONCE after the generic warmup — the condition Bench's sequential
    // pass measures. Compare across two fresh-JVM launches.
    args.lift(3).foreach { mode =>
      if (mode.startsWith("wsc")) {
        // which operators sit inside WholeStageCodegen spans?
        val df = Registry.queries(args(2))(spark, dir)
        df.collect()
        System.err.println(df.queryExecution.executedPlan.toString
          .linesIterator.take(60).mkString("\n"))
      } else if (mode.startsWith("plan")) {
        val pick: String => ((SparkSession, String) => DataFrame) =
          if (mode.endsWith("v2")) variants else Registry.queries(_)
        names.foreach { n =>
          val df = pick(n)(spark, dir)
          df.collect() // collect on df itself: the final ADAPTIVE plan
          val p = df.queryExecution.executedPlan.toString
          def c(s: String) = s.r.findAllIn(p).size
          System.err.println(s"[shave-plan] $mode $n reused=${c("ReusedExchange")} " +
            s"exch=${c("Exchange hashpartitioning")} scans=${c("Scan parquet")} " +
            s"bcast=${c("BroadcastExchange")} wins=${c("Window \\[")}")
          if (mode.contains("full")) System.err.println(p)
        }
      } else {
        val pick: String => ((SparkSession, String) => DataFrame) =
          if (mode.endsWith("v2")) variants else Registry.queries(_)
        names.foreach { n =>
          System.err.println(f"[shave-cold] $mode $n%-24s ${time(pick(n))}%6.3f")
        }
      }
      spark.stop()
      return
    }
    // First: value parity cur-vs-v2 (sorted-collect equality) so a broken
    // variant can never post a flattering time.
    names.foreach { n =>
      val cur = Registry.queries(n)(spark, dir)
      val v2 = variants(n)(spark, dir)
      val a = cur.collect().map(_.toString).sorted
      val b = v2.collect().map(_.toString).sorted
      val ok = a.sameElements(b)
      System.err.println(s"[shave] parity $n rows=${a.length} ok=$ok")
      if (!ok) {
        a.diff(b).take(3).foreach(r => System.err.println(s"  cur-only: $r"))
        b.diff(a).take(3).foreach(r => System.err.println(s"  v2-only:  $r"))
      }
    }
    names.foreach { n =>
      val ts = (1 to reps).flatMap { _ =>
        Seq("cur" -> time(Registry.queries(n)), "v2" -> time(variants(n)))
      }
      val cur = ts.collect { case ("cur", t) => t }
      val v2 = ts.collect { case ("v2", t) => t }
      System.err.println(f"[shave] $n%-24s cur=${median(cur)}%6.3f v2=${median(v2)}%6.3f " +
        f"(cur: ${cur.map(t => f"$t%.2f").mkString(",")} | v2: ${v2.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
