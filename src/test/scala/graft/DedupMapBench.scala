package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** One-off micro-benchmark for the duplicate-key map normalizer: native
  * [[graft.functions.MapDedupKeysFirstWins]] vs the built-in HOF twin vs
  * the raw parse floor, over a synthetic props corpus shaped like real
  * ingest (8-key JSON maps, 10% of rows carrying one duplicate key).
  *
  * Run: `sbt -batch "Test/runMain graft.DedupMapBench [rows]"` (default
  * 2M). Prints one JSON line; quoted in BASELINE.md round 15. Not part of
  * any gate — timings on a shared box are indicative, which is why the
  * recorded evidence is the RATIO of the three arms in one process, not
  * absolute seconds.
  */
object DedupMapBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("dedup-map-bench")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 8 scalar keys; every 10th row repeats "k1" with a second value —
    // from_json retains the dup, exactly like scraped data.
    val json = concat(
      lit("{\"k1\": \""), col("id"), lit("\", \"k2\": \"x\", \"k3\": \"y\", \"k4\": \"z\", "),
      lit("\"k5\": \"a\", \"k6\": \"b\", \"k7\": \"c\", \"k8\": \""), (col("id") % 97),
      when(col("id") % 10 === 0, lit("\", \"k1\": \"dup\"}")).otherwise(lit("\"}")))
    val df = spark.range(rows).select(json.as("props")).cache()
    df.count() // materialize the corpus outside the timed region

    val parsed = from_json(col("props"), MapType(StringType, StringType))
    def time(label: String, c: org.apache.spark.sql.Column): Double = {
      // min of 3: JIT/page-cache warm-up lands in the discarded passes
      (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        df.select(sum(size(map_keys(c))).as("s")).collect()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val raw = time("raw", parsed)
    val native = time("native", graft.functions.MapExpressions.dedupMapKeys(parsed))
    val hof = time("hof", graft.functions.JsonNormalize.dedupMapKeysHof(parsed))
    println(f"""{"rows":$rows,"raw_parse_s":$raw%.2f,"native_s":$native%.2f,"hof_s":$hof%.2f,""" +
      f""""native_overhead_x":${native / raw}%.2f,"hof_overhead_x":${hof / raw}%.2f,""" +
      f""""native_vs_hof_x":${hof / native}%.2f}""")
    spark.stop()
  }
}
