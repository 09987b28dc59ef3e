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

  /** Per-user session windows with a 30-minute gap. */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"))

  /** Streaming dedup on (user_id, event_type) — keeps the first arrival. */
  def dedup(events: DataFrame): DataFrame =
    events.dropDuplicates("user_id", "event_type")
}
