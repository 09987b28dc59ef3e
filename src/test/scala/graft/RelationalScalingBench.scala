package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-curve harness for the RELATIONAL (TPC-H star) operators —
  * fourth sibling of [[LlmScalingBench]] / [[EventsScalingBench]] /
  * [[EmbeddingsScalingBench]]; same methodology, observables, and quoting
  * rules. Completes measured-growth coverage of all four fixture
  * families.
  *
  * The star-join and subquery operators are Catalyst-standard shapes, but
  * their 100 TB posture still carries claims worth falsifying by
  * measurement: dimension sides stay broadcast as the FACT side grows
  * (a silent broadcast→SMJ flip would bend the curve), the salted skew
  * join's salt fan-out stays constant, windows partition on fixed keys
  * with growing fan-in, and the correlated-subquery rewrite stays a
  * per-key aggregate join rather than anything per-row.
  *
  * Corpus construction — ORDER replication: replica r of the sf0.1
  * `orders`/`lineitem` tables shifts `o_orderkey`/`l_orderkey` by r·10⁷
  * and keeps every other column byte-identical (replica 0 IS the
  * original); the five dimension tables (region, nation, customer,
  * supplier, part) are written through UNCHANGED. Facts grow ×k against
  * fixed dims — the honest 100 TB shape (fact tables grow, dimensions
  * don't) — every foreign key still resolves, and each order's lineitem
  * group is an exact copy of an original's, so per-order structure is
  * scale-invariant while order cardinality grows ×k.
  *
  * Output-density semantics (`rows_vs_linear`): the fixed-output ops —
  * LIMIT-k stars (q3/q10), closed-key aggregates (q5/q7, pricing
  * summary, promo share, skew-salted per-segment), per-customer top-3
  * (customer set fixed), and value concentration (each part's revenue
  * and the global average both scale ×k, so the qualifying part set is
  * invariant) — must read EXACTLY 1/k. The one per-order-output op,
  * sub_correlated, has a scale-invariant predicate (price·(k·n) > k·Σ ⟺
  * price·n > Σ per customer), so its qualifiers replicate ×k and density
  * must read EXACTLY 1.000.
  *
  * Run: `sbt -batch "Test/runMain graft.RelationalScalingBench [baseDir]
  * [k,k,…] [ops]"` (defaults /root/testdata/sf0.1, 1,8,64 —
  * 600k→38.4M lineitem rows). Prints `[scale]` / `[scale-summary]` JSON
  * lines in the LlmScalingBench format; quoted in BASELINE.md round 16.
  * Not part of any gate.
  */
object RelationalScalingBench {

  private final class TaskMetricsAgg extends SparkListener {
    val spill = new java.util.concurrent.atomic.AtomicLong(0)
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0)
    val peak = new java.util.concurrent.atomic.AtomicLong(0)
    def reset(): Unit = { spill.set(0); shuffleWrite.set(0); peak.set(0) }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        peak.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
      }
    }
  }

  /** Ops under test — the top-cost orders/lineitem-backed queries whose
    * plans carry explicit scale claims (broadcast dims, salting, fixed
    * window keys, aggregate-join subquery rewrite). Names are
    * `SparkEntry.queries` keys: the harness runs the EXACT declared
    * bodies.
    */
  private val Ops = Seq(
    "join_star_q3", // 3-table star, LIMIT 10
    "join_star_q5", // 5-table star + broadcast region/nation, per-nation agg
    "join_star_q7", // 2-nation exchange, per-(nations, year) agg
    "join_star_q10", // 4-table star, LIMIT 20
    "join_promo_share", // lineitem × broadcast part, single-row share
    "join_value_concentration", // per-part revenue vs broadcast global mean
    "join_skew_salted", // 8-way salted orders×customer, per-segment agg
    "agg_pricing_summary", // TPC-H Q1, closed (returnflag, linestatus) keys
    "win_topk_per_group", // per-customer top-3 window over orders
    "sub_correlated") // per-customer correlated aggregate over orders


  /** Full-evaluation action (round-17 harness fix): a bare `count()` lets
    * Catalyst PRUNE every expression the count does not need — for an
    * aggregate-shaped op the count needs only the grouping keys, so the
    * expensive windows/walks feeding the aggregate expressions were
    * REMOVED from the measured plan (agg_spearman's two 38M-row rank
    * windows "ran" in 0.2 s with zero shuffle — the tell). Hashing every
    * output column makes nothing prunable; the row count rides the same
    * single action.
    */
  private def evalAll(df: org.apache.spark.sql.DataFrame): Long = {
    val r = df.select(xxhash64(df.columns.map(col): _*).as("h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)")).head()
    r.getLong(0)
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 8, 64))
    val ops = args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Ops)
    // Arg 4 (round 17, VERDICT r16 #2): `table:keyCol[,table:keyCol…]` —
    // EXTRA tables to replicate ×k alongside the facts. The default
    // facts-vs-fixed-dims shape cannot grow a CUSTOMER-grain op's input
    // (win_ntile / win_cume_dist / agg_percentile_disc read only the
    // fixed customer dim), so their curves would be trivially flat.
    // Replicas shift only the key column; every orders.o_custkey still
    // resolves to an original row, and the value distribution is
    // scale-invariant (replica customers simply carry no orders —
    // irrelevant to the customer-grain ops this arm exists to grow).
    val extraRep: Seq[(String, String)] = args.lift(3)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        .map { s => val p = s.split(":"); (p(0), p(1)) })
      .getOrElse(Seq.empty)
    val outBase =
      if (extraRep.isEmpty) "target/relational_scaling"
      else "target/relational_scaling_" + extraRep.map(_._1).mkString("_")

    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("relational-scaling-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val agg = new TaskMetricsAgg
    spark.sparkContext.addSparkListener(agg)

    val orders = spark.read.parquet(s"$baseDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$baseDir/lineitem.parquet")
    val dims = Seq("region", "nation", "customer", "supplier", "part")
    val baseOrders = orders.count()
    val baseLineitem = lineitem.count()

    def replicate(df: org.apache.spark.sql.DataFrame, keyCol: String, k: Int) =
      (0 until k).map { r =>
        df.withColumn(keyCol, col(keyCol) + lit(r.toLong * 10000000L))
      }.reduce(_ unionByName _)

    def buildCorpus(k: Int): String = {
      val dir = s"$outBase/x$k"
      replicate(orders, "o_orderkey", k).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      replicate(lineitem, "l_orderkey", k).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val extraKeys = extraRep.toMap
      dims.foreach { t =>
        val base = spark.read.parquet(s"$baseDir/$t.parquet")
        extraKeys.get(t)
          .map(keyCol => replicate(base, keyCol, k).repartition(32))
          .getOrElse(base)
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
      dir
    }

    val dirs = scales.map(k => k -> buildCorpus(k)).toMap
    scales.foreach(k => println(
      s"[scale] corpus x$k built: ${k * baseOrders} orders, ${k * baseLineitem} lineitem"))

    def dropCheckpoints(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

    // Globally-unique dir string per run — busts the Tables plan cache
    // (keys on the dir STRING); see LlmScalingBench for the
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND failure the global uniqueness
    // prevents.
    val runCounter = new java.util.concurrent.atomic.AtomicInteger(0)
    def freshDir(dir: String): String = dir + ("/." * runCounter.incrementAndGet())

    case class Cell(op: String, k: Int, rows: Long, wallS: Double,
        spillMb: Double, shuffleMb: Double, peakMb: Double)

    ops.foreach { op =>
      evalAll(SparkEntry.queries(op)(spark, freshDir(dirs(scales.min))))
      dropCheckpoints()
    }

    val cells = for (op <- ops; k <- scales.sorted) yield {
      val runs = (0 until 2).map { _ =>
        dropCheckpoints()
        agg.reset()
        val t0 = System.nanoTime()
        val n = evalAll(SparkEntry.queries(op)(spark, freshDir(dirs(k))))
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(400) // let the async listener bus drain
        (wall, n, agg.spill.get / 1e6, agg.shuffleWrite.get / 1e6, agg.peak.get / 1e6)
      }
      val best = runs.minBy(_._1)
      val c = Cell(op, k, best._2, best._1, best._3, best._4, best._5)
      println(f"""[scale] {"op":"${c.op}","x":${c.k},"rows":${c.rows},""" +
        f""""wall_s":${c.wallS}%.2f,"spill_mb":${c.spillMb}%.1f,""" +
        f""""shuffle_write_mb":${c.shuffleMb}%.1f,"peak_task_mem_mb":${c.peakMb}%.1f}""")
      c
    }

    val summaries = ops.map { op =>
      val cs = cells.filter(_.op == op).sortBy(_.k)
      val xs = cs.map(c => math.log(c.k.toDouble))
      val ys = cs.map(c => math.log(c.wallS))
      val mx = xs.sum / xs.size; val my = ys.sum / ys.size
      val slope = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
        xs.map(x => (x - mx) * (x - mx)).sum
      val ratios = cs.sliding(2).map { case Seq(a, b) =>
        f""""x${a.k}_to_x${b.k}":${b.wallS / a.wallS}%.2f""" }.mkString(",")
      val r1 = cs.head.rows.toDouble
      val density = cs.map(c =>
        f""""x${c.k}":${c.rows / (c.k * r1)}%.3f""").mkString(",")
      val verdict = if (slope >= 1.5) "WEAK" else "subquadratic"
      f"""{"op":"$op","slope":$slope%.3f,"verdict":"$verdict",""" +
        f""""wall_ratios":{$ratios},"rows_vs_linear":{$density}}"""
    }
    println(s"""[scale-summary] {"base_orders":$baseOrders,"base_lineitem":$baseLineitem,""" +
      s""""scales":[${scales.mkString(",")}],"ops":[${summaries.mkString(",")}]}""")
    spark.stop()
  }
}
