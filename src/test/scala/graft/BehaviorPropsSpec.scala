package graft

import org.apache.spark.sql.functions._

/** Cross-query invariants for the behavioral/time-series family: each
  * declared query's output must be consistent with cheap recomputations
  * from the raw events table.
  */
class BehaviorPropsSpec extends SparkSpec {

  test("ts_sessionize sessions partition each user's events") {
    val sess = Registry.queries("ts_sessionize")(spark, sf0001)
    val raw = Tables.events(spark, sf0001).groupBy("user_id")
      .agg(count(lit(1)).as("cnt"))
    val joined = sess.join(raw, "user_id")
    // avg·n recovers the event total up to the 2dp rounding of avg
    val bad = joined.filter(
      col("max_session_events") > col("cnt") ||
        col("n_sessions") > col("cnt") ||
        abs(col("avg_session_events") * col("n_sessions") - col("cnt")) >
          lit(0.005d) * col("n_sessions"))
    assert(bad.count() === 0)
    assert(sess.count() === raw.count(), "a user lost all sessions")
  }

  test("funnel_conversion cohorts cover every signup user, converted <= signups") {
    val f = Registry.queries("funnel_conversion")(spark, sf0001)
    val signups = Tables.events(spark, sf0001)
      .filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    val agg = f.agg(sum("n_signups"), sum("n_converted")).head()
    assert(agg.getLong(0) === signups, "cohorts dropped or duplicated signup users")
    assert(agg.getLong(1) <= agg.getLong(0))
    assert(f.filter(col("n_converted") > col("n_signups")).count() === 0)
  }

  test("behavior_transitions probabilities sum to 1 per source state") {
    val t = Registry.queries("behavior_transitions")(spark, sf0001)
    val sums = t.groupBy("prev_type").agg(sum("p").as("psum"), sum("n").as("nsum"))
    // 4dp-rounded probabilities: row sums within 5 ulp-of-rounding of 1
    assert(sums.filter(abs(col("psum") - 1.0d) > 0.0005d).count() === 0)
    val transitions = Tables.events(spark, sf0001).count() -
      Tables.events(spark, sf0001).select("user_id").distinct().count()
    assert(sums.agg(sum("nsum")).head().getLong(0) === transitions,
      "transition counts must equal events minus one per user")
  }
}
