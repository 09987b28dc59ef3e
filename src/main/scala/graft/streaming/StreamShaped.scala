package graft.streaming

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2 B.9 — streaming-shaped queries computed on the batch `events`
  * table. A Structured Streaming query over the same plan produces these
  * exact aggregates (Spark compiles both through the same logical operators);
  * the true `readStream` twin lives in `StreamingHarness` and is asserted
  * equal to these in StreamingSpec.
  *
  * D4 everywhere: `events.ts` is ns in parquet but µs in Spark, so every
  * timestamp is `date_trunc`'d to second-or-coarser before compare/output.
  */
object StreamShaped {

  val defs: Seq[QueryDef] = Seq(

    // 1-hour tumbling windows per event_type — the batch twin of
    // groupBy(window($"ts", "1 hour"), $"event_type") in a stream.
    QueryDef(
      "stream_tumbling",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), Exact.sumMoney2(col("value")).as("sum_value"))
          .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
          .orderBy("window_start", "event_type"),
      // `WHERE ts IS NOT NULL` in this and the other stream-window oracles:
      // Spark's window()/session_window() DROP rows with a NULL event time
      // (no time ⇒ no window — the streaming semantic), while date_trunc
      // would keep them as a NULL group (round-9 degenerate parity sweep)
      Some(s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
              |  COUNT(*) AS n, ${Exact.sumMoney2Sql("value")} AS sum_value
              |FROM events WHERE ts IS NOT NULL
              |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)),

    // 1-hour windows sliding every 30 min: each event lands in exactly two
    // windows; the oracle unions the two 30-min-aligned starts.
    QueryDef(
      "stream_sliding",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
          .agg(count(lit(1)).as("n"))
          .select(col("w.start").as("window_start"), col("n"))
          .orderBy("window_start"),
      Some("""SELECT window_start, COUNT(*) AS n FROM (
             |  SELECT CAST(to_timestamp(CAST(FLOOR(epoch(ts) / 1800) * 1800 AS BIGINT)) AS TIMESTAMP) AS window_start FROM events WHERE ts IS NOT NULL
             |  UNION ALL
             |  SELECT CAST(to_timestamp(CAST(FLOOR(epoch(ts) / 1800) * 1800 - 1800 AS BIGINT)) AS TIMESTAMP) FROM events WHERE ts IS NOT NULL) t
             |GROUP BY window_start ORDER BY window_start""".stripMargin)),

    // Per-user session windows, 30-min gap, on second-truncated ts. Oracle
    // is the gaps-and-islands rewrite; a new session starts when the gap is
    // STRICTLY greater than 30 min. Spark's session_window merge is
    // boundary-INCLUSIVE: an event at exactly prev.ts + gap joins the
    // session (verified empirically at sf0.1 — user 511 has a 1800.0s gap
    // that Spark merges; a `>=` rewrite splits it and loses one session).
    QueryDef(
      "stream_session",
      (s, d) =>
        Tables.events(s, d)
          .withColumn("tss", date_trunc("second", col("ts")))
          .groupBy(session_window(col("tss"), "30 minutes").as("w"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))
          .orderBy("user_id", "session_start"),
      Some("""WITH e AS (
             |  SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS t, event_id
             |  FROM events WHERE ts IS NOT NULL),
             |m AS (
             |  SELECT user_id, t, event_id,
             |    CASE WHEN LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
             |           OR t - LAG(t) OVER (PARTITION BY user_id ORDER BY t, event_id) > INTERVAL 30 MINUTE
             |         THEN 1 ELSE 0 END AS brk
             |  FROM e),
             |g AS (
             |  SELECT user_id, t,
             |    SUM(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM m)
             |SELECT user_id, MIN(t) AS session_start, COUNT(*) AS n_events
             |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin)),

    // Streaming dropDuplicates analog — deterministic via min event_id, not
    // arrival order (SURVEY §7.4.4).
    QueryDef(
      "stream_dedup",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"), col("event_type")).orderBy(col("event_id"))
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_type", "event_id")
          .orderBy("user_id", "event_type")
      },
      Some("""SELECT user_id, event_type, event_id FROM (
             |  SELECT user_id, event_type, event_id,
             |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
             |  FROM events) t
             |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin)),

    // Late-data analog of withWatermark("ts", "10 minutes"): keep events
    // within 10 min of the max observed (second-truncated) timestamp.
    QueryDef(
      "stream_watermark_filter",
      (s, d) => {
        val e = Tables.events(s, d).withColumn("tss", date_trunc("second", col("ts")))
        val mx = e.agg(max(col("tss")).as("max_ts"))
        e.crossJoin(broadcast(mx))
          .filter(col("tss") >= col("max_ts") - expr("INTERVAL 10 MINUTES"))
          .select(col("event_id"), col("user_id"), col("event_type"), col("tss").as("event_ts"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, event_type,
             |  CAST(date_trunc('second', ts) AS TIMESTAMP) AS event_ts
             |FROM events
             |WHERE CAST(date_trunc('second', ts) AS TIMESTAMP) >=
             |  (SELECT MAX(CAST(date_trunc('second', ts) AS TIMESTAMP)) FROM events) - INTERVAL 10 MINUTE
             |ORDER BY event_id""".stripMargin)),

    // Batch twin of the stream-stream interval join capability
    // (StreamingHarness.purchaseSignupJoin): purchases matched to same-user
    // signups within the preceding 2 hours, on second-truncated timestamps
    // (D4). In a stream both sides carry watermarks and this exact plan
    // runs with bounded join state.
    QueryDef(
      "stream_interval_join",
      (s, d) => {
        val e = Tables.events(s, d)
          .withColumn("tss", date_trunc("second", col("ts")))
        val p = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("tss").as("p_ts"))
        val sg = e.filter(col("event_type") === "signup")
          .select(col("event_id").as("signup_id"), col("user_id").as("su"),
            col("tss").as("s_ts"))
        p.join(sg, col("user_id") === col("su") &&
            col("s_ts") >= col("p_ts") - expr("INTERVAL 2 HOURS") &&
            col("s_ts") <= col("p_ts"))
          .select("purchase_id", "user_id", "signup_id")
          .orderBy("purchase_id", "signup_id")
      },
      Some("""SELECT p.event_id AS purchase_id, p.user_id, s.event_id AS signup_id
             |FROM events p JOIN events s ON s.user_id = p.user_id
             |  AND date_trunc('second', s.ts) >= date_trunc('second', p.ts) - INTERVAL 2 HOUR
             |  AND date_trunc('second', s.ts) <= date_trunc('second', p.ts)
             |WHERE p.event_type = 'purchase' AND s.event_type = 'signup'
             |ORDER BY purchase_id, signup_id""".stripMargin))
  )
}
