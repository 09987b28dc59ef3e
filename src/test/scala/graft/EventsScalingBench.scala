package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-curve harness for the EVENTS-family operators — the sibling of
  * [[LlmScalingBench]] (round 16; same methodology, measured observables,
  * and quoting rules — see that scaladoc for the full rationale).
  *
  * The LLM harness measured the documents-family designs; this one covers
  * the other high-traffic fixture family: the behavioral / time-series
  * operators over `events` (baskets, funnels, sessionization, interarrival,
  * autocorrelation). Their 100 TB posture rests on per-user (or per-
  * (user, day)-basket) locality — one shuffle to co-locate a user's
  * stream, then window/aggregate work linear in that user's rows. Under
  * user-replication that predicts wall slope ≈1 MINUS fixed-overhead
  * amortization, and any accidental cross-user quadratic stage (an
  * unblocked self-join, a corpus-wide single-partition window) would bend
  * the curve up. This harness measures it instead of asserting it.
  *
  * Corpus construction — USER replication: replica r of the sf0.1 events
  * table shifts `user_id` by r·10⁷ and `event_id` by r·10⁸ and keeps
  * `ts`/`event_type`/`value`/`props` byte-identical (replica 0 IS the
  * original). Every per-user stream is an exact copy of an original
  * stream, so per-user structure (streaks, sessions, baskets, funnels)
  * is scale-invariant while user cardinality grows ×k — the honest
  * scale-up for operators blocked on the user key. Cross-replica rows
  * never share a user_id, so no basket, session, or transition can span
  * replicas.
  *
  * Output-density semantics differ from the LLM harness's pair check:
  * per-user-output ops (sessionize, interarrival rows, tenure) must read
  * rows÷(k·rows₁) ≈ 1.0; FIXED-KEY-OUTPUT ops (transition matrices over
  * the closed event_type set, per-week DAU/WAU, basket pair supports,
  * day-spine concurrency) have constant-cardinality output by
  * construction, so their density reads ≈1/k — the check there is that
  * it is EXACTLY 1/k (output keys did not grow), not ≈1.0.
  *
  * Run: `sbt -batch "Test/runMain graft.EventsScalingBench [baseDir]
  * [k,k,…] [ops]"` (defaults /root/testdata/sf0.1, 1,8,64, the Ops list
  * below). Prints `[scale]` / `[scale-summary]` JSON lines in the exact
  * LlmScalingBench format; quoted in BASELINE.md round 16. Not part of
  * any gate.
  */
object EventsScalingBench {

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

  /** Ops under test — the top-cost events-only queries from the r16_run1
    * sequential pass (every Behavior query reads only `events`; the four
    * ts_ picks were verified events-only — the orders-backed ts_ queries
    * cannot run against a dir that scales only events). Names are
    * `SparkEntry.queries` keys: the harness runs the EXACT declared
    * bodies.
    */
  private val Ops = Seq(
    "behavior_confidence", // basket pair support + broadcast antecedent counts
    "behavior_lift", // pair support / independence over (user, day) baskets
    "behavior_cooccurrence", // blocked basket self-join, candidates ∝ basket size
    "behavior_attribution", // ranked-first window + user-grain reduce
    "behavior_transitions", // per-user lag window → fixed transition matrix
    "cohort_retention", // two user-grain aggs + cohort agg
    "ts_sessionize", // per-user gap-based session islands
    "ts_active_concurrency", // interval overlap counts vs the day spine
    "ts_interarrival", // per-user lag deltas + distribution agg
    "ts_autocorr") // per-type lag-k autocorrelation over the daily series


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
    val outBase = "target/events_scaling"

    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("events-scaling-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val agg = new TaskMetricsAgg
    spark.sparkContext.addSparkListener(agg)

    val base = spark.read.parquet(s"$baseDir/events.parquet")
    val baseCount = base.count()

    def buildCorpus(k: Int): String = {
      val dir = s"$outBase/x$k"
      val reps = (0 until k).map { r =>
        base.select(
          (col("event_id") + lit(r.toLong * 100000000L)).as("event_id"),
          col("ts"),
          (col("user_id") + lit(r.toLong * 10000000L)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }
      reps.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }

    val dirs = scales.map(k => k -> buildCorpus(k)).toMap
    scales.foreach(k => println(s"[scale] corpus x$k built: ${k * baseCount} events"))

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
    println(s"""[scale-summary] {"base_events":$baseCount,"scales":[${scales.mkString(",")}],""" +
      s""""ops":[${summaries.mkString(",")}]}""")
    spark.stop()
  }
}
