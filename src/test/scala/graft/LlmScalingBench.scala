package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-curve harness for the top-cost LLM operators (VERDICT r15 #1/#6).
  *
  * Every 100 TB claim in this repo was, until this round, PLAN-SHAPE
  * evidence — inverted index instead of all-pairs, df-guard, banding,
  * O(log n) pointer doubling — measured only at the fixtures' fixed 5k-doc
  * scale. This harness measures wall-time GROWTH: it replays the most
  * expensive LLM queries (the in-gate r15_run4 top-cost list, plus the
  * two profile-shape siblings added after the first run's chargram
  * finding) over seeded synthetic
  * corpora at ×1/×8/×64 the sf0.1 document count and quotes per-op
  * wall-time ratios plus the least-squares log-log slope — the cheapest
  * available falsifier of the sub-quadratic designs. An op with slope ≥1.5
  * is named weak, with its offending stage, in BASELINE.md.
  *
  * Corpus construction — PERTURBED REPLICATION, preserving near-dup
  * cluster density: replica r of the sf0.1 documents table keeps every
  * row's lang/source (blocks grow ×k, the honest scale-up) and shifts
  * doc_id by r·10⁷, while every TOKEN is suffixed `~r` (replica 0 is the
  * original, byte-identical). Within a replica the near-dup structure is
  * exactly the original's; across replicas no two tokens (hence no
  * shingles, no minhash bands, no pair edges) ever match, so clusters do
  * NOT merge and both cluster-size distribution and the duplicate
  * fraction are scale-invariant. Under that construction a sub-quadratic
  * (work ∝ matches) operator should grow ~linearly (slope ≈1 plus
  * fixed-overhead amortization pulling it DOWN at small scales); an
  * accidentally all-pairs stage would show slope →2. The harness prints a
  * `pairs_vs_linear` density check per op/scale (output rows ÷ k·rows(×1))
  * — ≈1.0 certifies the clusters really didn't merge.
  *
  * Memory observables (VERDICT r15 #6): per timed run, a SparkListener
  * sums task `memoryBytesSpilled + diskBytesSpilled` and shuffle bytes
  * written and maxes `peakExecutionMemory` — after plan shape, memory
  * shape is the 100 TB failure mode, and one committed number per op
  * makes the next regression visible.
  *
  * Methodology notes:
  *  - Each timed run busts the Tables/tokenPairs plan caches by handing
  *    the query a path-equivalent but string-distinct dir (`…/x8` vs
  *    `…/x8/.`): both caches key on the dir STRING, so every run rebuilds
  *    (and re-materializes) from scratch — solo costs, no cross-op
  *    postings sharing.
  *  - min of 2 timed runs per cell, after a per-op warmup at ×1 (JIT +
  *    codegen cache); persistent RDDs (localCheckpoint residue) are
  *    unpersisted between runs so storage pressure doesn't accumulate
  *    across the 24 runs.
  *  - Absolute seconds on a shared box are indicative only (same caveat
  *    as DedupMapBench); the recorded evidence is the RATIOS/slopes
  *    within one process.
  *
  * Run: `sbt -batch "Test/runMain graft.LlmScalingBench [baseDir] [k,k,…]"`
  * (defaults /root/testdata/sf0.1 and 1,8,64). Prints one `[scale]` JSON
  * line per (op, scale) and a final `[scale-summary]` JSON line with the
  * fitted slopes; quoted in BASELINE.md round 16. Not part of any gate.
  */
object LlmScalingBench {

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

  /** The ops under test — the r15 top-cost list minus the two whose
    * cost is fixed framework overhead (sub_recursive_cte) or already a
    * verify join over banded candidates (dedup_minhash_verified is
    * represented through the same postings/banding machinery the others
    * exercise). Names are `SparkEntry.queries` keys, so the harness runs
    * the EXACT declared query bodies, not reimplementations.
    */
  private val Ops = Seq(
    "dedup_jaccard_pairs", // tokenPairs: materialized guarded postings + inverted-index join
    "dedup_ngram_jaccard", // hashed-shingle inverted index, df-guarded
    "dedup_components", // pointer-doubling CC over the pair graph, O(log n) rounds
    "text_langid_chargram", // corpus trigram profile → broadcast overlap join
    // The two siblings sharing text_langid_chargram's profile-top-k
    // window shape (Window.partitionBy(lang) over corpus-wide counts) —
    // measured once the first harness run flagged that shape's ×8→×64
    // step at 35.7× (round 16).
    "text_langid", // corpus term profile → broadcast overlap join
    "text_term_freq") // per-language top-10 terms over all token counts


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
    // arg 3: restrict to named ops (focused re-measurement — e.g. the
    // round-16 chargram funnel investigation); never set when producing
    // the full quoted table.
    val ops = args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Ops)
    val outBase = "target/llm_scaling"

    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("llm-scaling-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val agg = new TaskMetricsAgg
    spark.sparkContext.addSparkListener(agg)

    val base = spark.read.parquet(s"$baseDir/documents.parquet")
    val baseCount = base.count()

    // Build and persist each scaled corpus once (outside every timed
    // region). Token suffixing via regexp_replace: `$1~r` rewrites each
    // \S+ token; replica 0 is byte-identical to the original.
    def buildCorpus(k: Int): String = {
      val dir = s"$outBase/x$k"
      val reps = (0 until k).map { r =>
        val t = if (r == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", "$1~" + r)
        base.select(
          (col("doc_id") + lit(r.toLong * 10000000L)).as("doc_id"),
          t.as("text"), col("lang"), col("source"))
      }
      reps.reduce(_ unionByName _)
        .withColumn("n_chars", length(col("text")).cast("long"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }

    val dirs = scales.map(k => k -> buildCorpus(k)).toMap
    scales.foreach(k => println(s"[scale] corpus x$k built: ${k * baseCount} docs"))

    def dropCheckpoints(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

    // GLOBALLY-unique dir string per run: busts the Tables + tokenPairs
    // plan caches (both key on the dir string) without copying any data.
    // Uniqueness across ALL runs (not per-cell) matters: a cache hit on a
    // dir another run already used would hand back a materialized plan
    // whose localCheckpoint blocks dropCheckpoints() has since
    // unpersisted, and LocalCheckpointRDD does NOT recompute — the
    // lineage is truncated, the run dies with
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (first launch of this harness).
    val runCounter = new java.util.concurrent.atomic.AtomicInteger(0)
    def freshDir(dir: String): String = dir + ("/." * runCounter.incrementAndGet())

    case class Cell(op: String, k: Int, rows: Long, wallS: Double,
        spillMb: Double, shuffleMb: Double, peakMb: Double)

    // Warmup: each op once at ×1 (JIT/codegen; result discarded).
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

    // Least-squares slope of ln(wall) vs ln(k) per op, plus stepwise
    // ratios and the rows-vs-linear density check.
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
        f""""wall_ratios":{$ratios},"pairs_vs_linear":{$density}}"""
    }
    println(s"""[scale-summary] {"base_docs":$baseCount,"scales":[${scales.mkString(",")}],""" +
      s""""ops":[${summaries.mkString(",")}]}""")
    spark.stop()
  }
}
