package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** True Structured Streaming capability (SURVEY §2 B.9 note, §5.5): the
  * same logical transforms the batch twins in [[StreamShaped]] declare,
  * expressed once over an unbounded DataFrame. Spark compiles batch and
  * streaming through identical logical plans, so StreamingSpec asserts
  * `transform(MemoryStream) == transform(batch)` on the same rows.
  *
  * Event-time correctness at scale comes from the watermark: state for
  * windows older than (max event time − delay) is dropped, bounding
  * executor memory no matter how long the stream runs.
  */
object StreamingHarness {

  /** Schema of a streamed event (mirrors the events fixture, µs ts). */
  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** 1-hour tumbling counts/sums per event_type, 10-minute watermark. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.Exact.sumMoney2(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Per-user session windows with a 30-minute gap. `delay` is the
    * allowed out-of-orderness, like [[purchaseSignupJoin]]'s: sessions
    * ending more than `delay` behind the stream's max event time are
    * evicted from state, so a chunked replay over a fixture spanning
    * more than `delay` must pass a delay spanning it to match the
    * watermark-free batch twin.
    *
    * PRE-1970 LIMIT (round-14 calendar replay, pinned by StreamingSpec):
    * the streaming runtime's watermark starts at EPOCH ZERO (0 ms) and
    * never goes negative, and the session-window plan filters input rows
    * whose session would close at-or-before the watermark — so a session
    * that CLOSES before 1970-01-01 is structurally unreachable in
    * streaming mode, with any delay. (Tumbling aggregation in complete
    * mode has no such input filter and handles pre-1970 windows fine.)
    * Pre-epoch history — corrupt crawl dates included — is batch
    * backfill's job; the streaming path owns the live, post-epoch edge.
    * `session_end` is emitted so callers can state that boundary
    * exactly.
    *
    * COMPATIBILITY (round 14 → 15, ADVICE r14): round 14 widened this
    * surface — the output gained a fourth column (`session_end`, after
    * `session_start`) and the signature gained the `delay` parameter
    * (defaulted, so source-compatible). Only in-repo callers exist
    * today, but an external consumer selecting by POSITION or asserting
    * the old 3-column shape breaks silently; select by name. Any future
    * column addition must append (never reorder) and be noted here.
    */
  def sessions(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Streaming dedup on (user_id, event_type) — keeps the first arrival. */
  def dedup(events: DataFrame): DataFrame =
    events.dropDuplicates("user_id", "event_type")

  /** Stream-stream interval join: each purchase matched to signups of the
    * same user with `s_ts ∈ [p_ts − 2h, p_ts]`. Both sides carry
    * watermarks, so the join buffers only rows inside the interval ±
    * delay — state stays bounded however long the stream runs (the
    * standard Structured Streaming join-state eviction contract).
    * `delay` is the allowed out-of-orderness; tests pass a large value so
    * chunked replay can't evict rows the batch twin would keep.
    */
  def purchaseSignupJoin(events: DataFrame, delay: String = "10 minutes"): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", delay)
    val sg = events.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"),
        col("ts").as("s_ts"))
      .withWatermark("s_ts", delay)
    p.join(sg,
      col("p_user") === col("s_user") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 2 HOURS") &&
        col("s_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("p_user").as("user_id"), col("signup_id"))
  }

  /** Custom keyed state via flatMapGroupsWithState: per-user running event
    * count and running value sum, emitted on every update. This is the
    * escape hatch for stateful semantics windows can't express; state is
    * per-key and partition-local, so it scales horizontally with the key
    * space (SURVEY §1.2's "custom state" row).
    */
  def runningTotals(events: org.apache.spark.sql.Dataset[Ev]): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0
          var s = s0
          evs.foreach { e => n += 1; s += e.value }
          state.update((n, s))
          Iterator((uid, n, s))
      }
      .toDF("user_id", "n_events", "sum_value")
  }
}
