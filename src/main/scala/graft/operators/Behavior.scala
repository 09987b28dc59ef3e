package graft.operators

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2 B.12 — behavioral event analytics over the append-only
  * `events` log: funnel conversion and cohort retention, the two aggregate
  * shapes every product-telemetry (and training-data curation-telemetry)
  * pipeline computes.
  *
  * Scale notes: both queries reduce events to user grain before anything
  * else — `groupBy(user_id)` is one hash shuffle with map-side combine, so
  * the join input is |users|, not |events|. At 100 TB the raw event scan
  * stays embarrassingly parallel; only user-grain rows (orders of magnitude
  * smaller) flow through the joins, and the final cohort aggregate is a few
  * hundred rows.
  */
object Behavior {

  val defs: Seq[QueryDef] = Seq(

    // Signup→purchase funnel: of users whose first signup is in week W, how
    // many purchased within 7 days of that signup. The LEFT join keeps
    // non-converting users in the denominator (a funnel that drops them
    // overstates conversion).
    QueryDef(
      "funnel_conversion",
      (s, d) => {
        val e = Tables.events(s, d)
        val signup = e.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
        val conv = signup.join(e, Seq("user_id"), "left")
          .groupBy(col("user_id"),
            date_trunc("week", col("signup_ts")).cast("date").as("cohort_week"))
          .agg(max(when(col("event_type") === "purchase" &&
            col("ts") > col("signup_ts") &&
            col("ts") <= col("signup_ts") + expr("INTERVAL 7 DAY"), 1).otherwise(0))
            .as("converted"))
        conv.groupBy(col("cohort_week"))
          .agg(count(lit(1)).as("n_signups"),
            sum(col("converted")).cast("long").as("n_converted"),
            Exact.roundN(sum(col("converted")).cast("double") / count(lit(1)), 4)
              .as("conv_rate"))
          .orderBy("cohort_week")
      },
      Some(s"""WITH s AS (
              |  SELECT user_id, MIN(ts) AS signup_ts FROM events
              |  WHERE event_type = 'signup' GROUP BY 1),
              |conv AS (
              |  SELECT s.user_id, CAST(date_trunc('week', s.signup_ts) AS DATE) AS cohort_week,
              |    MAX(CASE WHEN e.event_type = 'purchase'
              |         AND e.ts > s.signup_ts
              |         AND e.ts <= s.signup_ts + INTERVAL 7 DAY THEN 1 ELSE 0 END) AS converted
              |  FROM s LEFT JOIN events e ON e.user_id = s.user_id
              |  GROUP BY 1, 2)
              |SELECT cohort_week, COUNT(*) AS n_signups,
              |  CAST(SUM(converted) AS BIGINT) AS n_converted,
              |  ${Exact.roundNSql("CAST(SUM(converted) AS DOUBLE) / COUNT(*)", 4)} AS conv_rate
              |FROM conv GROUP BY cohort_week ORDER BY cohort_week""".stripMargin)),

    // Cohort retention triangle: users cohorted by the week of their first
    // event; n_active = distinct users from cohort C active in week C+k.
    // Both engines truncate weeks to Monday, so the day-diff is always an
    // exact multiple of 7 and the /7 division is exact in ieee754.
    QueryDef(
      "cohort_retention",
      (s, d) => {
        val e = Tables.events(s, d)
        val first = e.groupBy(col("user_id"))
          .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort"))
        e.join(first, Seq("user_id"))
          .select(col("user_id"), col("cohort"),
            (datediff(date_trunc("week", col("ts")).cast("date"), col("cohort")) / 7)
              .cast("long").as("week_offset"))
          .distinct()
          .groupBy(col("cohort"), col("week_offset"))
          .agg(count(lit(1)).as("n_active"))
          .orderBy("cohort", "week_offset")
      },
      Some("""WITH fw AS (
             |  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort
             |  FROM events GROUP BY 1),
             |act AS (
             |  SELECT DISTINCT e.user_id, fw.cohort,
             |    CAST(date_diff('day', fw.cohort, CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS BIGINT) AS week_offset
             |  FROM events e JOIN fw ON e.user_id = fw.user_id)
             |SELECT cohort, week_offset, COUNT(*) AS n_active
             |FROM act GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Market-basket co-occurrence: support counts for event-type pairs
    // appearing in the same (user, day) basket — the association-mining
    // primitive. Baskets are the distinct reduce; the self-join is blocked
    // on the basket key, so candidates grow with basket size (≤ 5 types),
    // never corpus size.
    QueryDef(
      "behavior_cooccurrence",
      (s, d) => {
        val ut = Tables.events(s, d)
          .select(col("user_id"), col("ts").cast("date").as("day"), col("event_type"))
          .distinct()
        ut.alias("a")
          .join(ut.alias("b"),
            col("a.user_id") === col("b.user_id") && col("a.day") === col("b.day") &&
              col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
          .agg(count(lit(1)).as("support"))
          .orderBy("type_a", "type_b")
      },
      Some("""WITH ut AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type FROM events)
             |SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS support
             |FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.day = b.day
             |  AND a.event_type < b.event_type
             |GROUP BY 1, 2 ORDER BY type_a, type_b""".stripMargin)),

    // Association lift: P(a,b)/(P(a)·P(b)) over (user, day) baskets —
    // co-occurrence normalized by independence, the signal that separates
    // "both types are just common" from "these types travel together".
    // Lift > 1 ⇒ positive association. All probabilities are exact ratios
    // of basket counts.
    QueryDef(
      "behavior_lift",
      (s, d) => {
        val ut = Tables.events(s, d)
          .select(col("user_id"), col("ts").cast("date").as("day"), col("event_type"))
          .distinct()
        val baskets = ut.select(col("user_id"), col("day")).distinct()
          .agg(count(lit(1)).as("nb"))
        val single = ut.groupBy(col("event_type")).agg(count(lit(1)).as("s1"))
        val pairs = ut.alias("a")
          .join(ut.alias("b"),
            col("a.user_id") === col("b.user_id") && col("a.day") === col("b.day") &&
              col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
          .agg(count(lit(1)).as("s12"))
        pairs
          .join(broadcast(single.select(col("event_type").as("type_a"), col("s1").as("sa"))), "type_a")
          .join(broadcast(single.select(col("event_type").as("type_b"), col("s1").as("sb"))), "type_b")
          .crossJoin(broadcast(baskets))
          .select(col("type_a"), col("type_b"), col("s12"),
            Exact.roundN(col("s12").cast("double") * col("nb") /
              (col("sa").cast("double") * col("sb")), 4).as("lift"))
          .orderBy("type_a", "type_b")
      },
      Some(s"""WITH ut AS (
              |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type FROM events),
              |baskets AS (
              |  SELECT COUNT(*) AS nb FROM (SELECT DISTINCT user_id, day FROM ut) t),
              |single AS (SELECT event_type, COUNT(*) AS s1 FROM ut GROUP BY 1),
              |pairs AS (
              |  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS s12
              |  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.day = b.day
              |    AND a.event_type < b.event_type
              |  GROUP BY 1, 2)
              |SELECT type_a, type_b, s12,
              |  ${Exact.roundNSql(
                 "CAST(s12 AS DOUBLE) * nb / (CAST(sa.s1 AS DOUBLE) * sb.s1)", 4)} AS lift
              |FROM pairs
              |JOIN single sa ON sa.event_type = type_a
              |JOIN single sb ON sb.event_type = type_b
              |CROSS JOIN baskets
              |ORDER BY type_a, type_b""".stripMargin)),

    // Association confidence P(cons|ante) — the DIRECTIONAL rule strength
    // (lift is symmetric; confidence is not): both directions of every
    // basket pair, 4dp from exact basket-count ratios.
    QueryDef(
      "behavior_confidence",
      (s, d) => {
        val ut = Tables.events(s, d)
          .select(col("user_id"), col("ts").cast("date").as("day"), col("event_type"))
          .distinct()
        val single = ut.groupBy(col("event_type")).agg(count(lit(1)).as("s1"))
        ut.alias("a")
          .join(ut.alias("b"),
            col("a.user_id") === col("b.user_id") && col("a.day") === col("b.day") &&
              col("a.event_type") =!= col("b.event_type"))
          .groupBy(col("a.event_type").as("ante"), col("b.event_type").as("cons"))
          .agg(count(lit(1)).as("s12"))
          .join(broadcast(single.select(col("event_type").as("ante"), col("s1"))), "ante")
          .select(col("ante"), col("cons"), col("s12"),
            Exact.roundN(col("s12").cast("double") / col("s1"), 4).as("confidence"))
          .orderBy("ante", "cons")
      },
      Some(s"""WITH ut AS (
              |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type FROM events),
              |single AS (SELECT event_type, COUNT(*) AS s1 FROM ut GROUP BY 1),
              |pairs AS (
              |  SELECT a.event_type AS ante, b.event_type AS cons, COUNT(*) AS s12
              |  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.day = b.day
              |    AND a.event_type <> b.event_type
              |  GROUP BY 1, 2)
              |SELECT ante, cons, s12,
              |  ${Exact.roundNSql("CAST(s12 AS DOUBLE) / s.s1", 4)} AS confidence
              |FROM pairs JOIN single s ON s.event_type = ante
              |ORDER BY ante, cons""".stripMargin)),

    // Longest consecutive-day activity streak per user: distinct active
    // days, epoch-day minus row_number groups identical-by-construction
    // runs (gaps-and-islands at day grain — a different grain than
    // win_islands' event-type runs).
    QueryDef(
      "behavior_streak_days",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        val days = Tables.events(s, d)
          .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
        days
          .withColumn("grp",
            datediff(col("day"), lit("1970-01-01").cast("date")).cast("long") -
              row_number().over(w))
          .groupBy(col("user_id"), col("grp"))
          .agg(count(lit(1)).as("len"))
          .groupBy(col("user_id"))
          .agg(max(col("len")).as("longest_streak_days"),
            count(lit(1)).as("n_streaks"))
          .orderBy("user_id")
      },
      Some("""WITH days AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |isl AS (
             |  SELECT user_id, day,
             |    date_diff('day', DATE '1970-01-01', day)
             |      - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
             |  FROM days),
             |runs AS (SELECT user_id, grp, COUNT(*) AS len FROM isl GROUP BY 1, 2)
             |SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak_days,
             |  COUNT(*) AS n_streaks
             |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // DAU/WAU stickiness per week: weekly active users, mean daily actives,
    // and their ratio — the engagement-intensity KPI. Both distinct counts
    // are exact; the mean sums integer DAUs in decimal.
    QueryDef(
      "behavior_dau_wau",
      (s, d) => {
        val e = Tables.events(s, d)
        val dau = e.groupBy(col("ts").cast("date").as("day"))
          .agg(countDistinct(col("user_id")).as("dau"))
        val wau = e.groupBy(date_trunc("week", col("ts")).cast("date").as("wk"))
          .agg(countDistinct(col("user_id")).as("wau"))
        wau.join(dau, date_trunc("week", col("day")).cast("date") === col("wk"))
          .groupBy(col("wk"), col("wau"))
          .agg(count(col("day")).as("n_days"),
            Exact.roundN(sum(col("dau").cast("decimal(18,0)")).cast("double") /
              count(col("day")) / col("wau"), 4).as("stickiness"))
          .orderBy("wk")
      },
      Some(s"""WITH dau AS (
              |  SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS dau
              |  FROM events GROUP BY 1),
              |wk AS (
              |  SELECT CAST(date_trunc('week', ts) AS DATE) AS wk,
              |    COUNT(DISTINCT user_id) AS wau
              |  FROM events GROUP BY 1)
              |SELECT wk.wk, wau, CAST(COUNT(d.day) AS BIGINT) AS n_days,
              |  ${Exact.roundNSql(
                 "CAST(SUM(CAST(d.dau AS DECIMAL(18,0))) AS DOUBLE) / COUNT(d.day) / wau",
                 4)} AS stickiness
              |FROM wk JOIN dau d ON CAST(date_trunc('week', d.day) AS DATE) = wk.wk
              |GROUP BY wk.wk, wau ORDER BY wk.wk""".stripMargin)),

    // Tenure + engagement rate per user: days between first and last event
    // (floor-of-epoch-day diff, exact) and events per active day, 4dp —
    // the lifetime-value grain every churn model starts from.
    QueryDef(
      "behavior_tenure",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_events"),
            datediff(max(col("ts")).cast("date"), min(col("ts")).cast("date"))
              .cast("long").as("tenure_days"),
            Exact.roundN(count(lit(1)).cast("double") /
              (datediff(max(col("ts")).cast("date"), min(col("ts")).cast("date")) + 1)
                .cast("double"), 4).as("events_per_day"))
          .orderBy("user_id"),
      Some(s"""SELECT user_id, COUNT(*) AS n_events,
              |  CAST(date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE)) AS BIGINT) AS tenure_days,
              |  ${Exact.roundNSql(
                 "CAST(COUNT(*) AS DOUBLE) / (date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE)) + 1)",
                 4)} AS events_per_day
              |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Cumulative-distinct growth curve ("users to date"): per event day,
    // how many users have EVER been seen. Shape (VERDICT r03 #2): user-grain
    // first-day reduce → per-day first-seen counts (O(U) work, map-side
    // combinable) → running SUM over the |days|-row spine. The previous
    // days×users cross join did O(U·D) work — ~3.6×10¹² rows at 10⁹ users ×
    // 10 years — for an O(U+D) problem; the running sum touches each user
    // once and each day once, and the single-partition window only ever
    // sees the tiny day spine, never user-grain rows.
    QueryDef(
      "ts_cumulative_users",
      (s, d) => {
        // ts IS NOT NULL: an event with no timestamp has no day, so it can
        // neither open a user's first_day nor contribute a spine row — and
        // a NULL day would sort FIRST in Spark but LAST in DuckDB, skewing
        // every cumulative count (round-9 degenerate parity sweep)
        val e = Tables.events(s, d).filter(col("ts").isNotNull)
        val perDay = e.groupBy(col("user_id"))
          .agg(min(col("ts").cast("date")).as("first_day"))
          .groupBy(col("first_day").as("day"))
          .agg(count(lit(1)).as("n"))
        val days = e.select(col("ts").cast("date").as("day")).distinct()
        val w = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        days.join(perDay, Seq("day"), "left")
          .withColumn("cum_users", sum(coalesce(col("n"), lit(0L))).over(w))
          .select(col("day"), col("cum_users"))
          .orderBy("day")
      },
      Some("""WITH fu AS (
             |  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
             |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
             |pd AS (SELECT first_day AS day, COUNT(*) AS n FROM fu GROUP BY 1),
             |days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events WHERE ts IS NOT NULL)
             |SELECT day, CAST(SUM(COALESCE(n, 0)) OVER (
             |    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
             |FROM days LEFT JOIN pd USING (day) ORDER BY day""".stripMargin)),

    // First-touch attribution: each user credited to their FIRST event
    // type; conversion = purchase within 3 days of that first touch. The
    // window bound makes rates non-trivial (unbounded, every active user
    // eventually purchases in this fixture).
    QueryDef(
      "behavior_attribution",
      (s, d) => {
        val e = Tables.events(s, d)
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val ft = e.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("first_touch"),
            col("ts").as("first_ts"))
        ft.join(e, Seq("user_id"))
          .groupBy(col("user_id"), col("first_touch"))
          .agg(max(when(col("event_type") === "purchase" &&
            col("ts") > col("first_ts") &&
            col("ts") <= col("first_ts") + expr("INTERVAL 3 DAY"), 1).otherwise(0))
            .as("purchased"))
          .groupBy(col("first_touch"))
          .agg(count(lit(1)).as("n_users"),
            sum(col("purchased")).cast("long").as("n_purchasers"),
            Exact.roundN(sum(col("purchased")).cast("double") / count(lit(1)), 4)
              .as("conv_rate"))
          .orderBy("first_touch")
      },
      Some(s"""WITH ft AS (
              |  SELECT user_id, event_type AS first_touch, ts AS first_ts FROM (
              |    SELECT user_id, event_type, ts,
              |      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              |    FROM events) t WHERE rn = 1),
              |conv AS (
              |  SELECT ft.user_id, ft.first_touch,
              |    MAX(CASE WHEN e.event_type = 'purchase' AND e.ts > ft.first_ts
              |         AND e.ts <= ft.first_ts + INTERVAL 3 DAY THEN 1 ELSE 0 END) AS purchased
              |  FROM ft JOIN events e ON e.user_id = ft.user_id GROUP BY 1, 2)
              |SELECT first_touch, COUNT(*) AS n_users,
              |  CAST(SUM(purchased) AS BIGINT) AS n_purchasers,
              |  ${Exact.roundNSql("CAST(SUM(purchased) AS DOUBLE) / COUNT(*)", 4)} AS conv_rate
              |FROM conv GROUP BY first_touch ORDER BY first_touch""".stripMargin)),

    // First-order Markov transition matrix of event types per user stream:
    // count (prev → cur) transitions in event_id order, probability
    // normalized per prev row. One ordered per-user window (lag) + one hash
    // agg; the matrix itself is |types|² rows.
    QueryDef(
      "behavior_transitions",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        val t = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type").as("next_type"))
          .agg(count(lit(1)).as("n"))
        val w2 = Window.partitionBy(col("prev_type"))
        t.select(col("prev_type"), col("next_type"), col("n"),
            Exact.roundN(col("n").cast("double") /
              sum(col("n")).over(w2).cast("double"), 4).as("p"))
          .orderBy("prev_type", "next_type")
      },
      Some(s"""WITH t AS (
              |  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
              |  FROM (
              |    SELECT event_type,
              |      LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type
              |    FROM events) x
              |  WHERE prev_type IS NOT NULL
              |  GROUP BY 1, 2)
              |SELECT prev_type, next_type, n,
              |  ${Exact.roundNSql(
                 "CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE)", 4)} AS p
              |FROM t ORDER BY prev_type, next_type""".stripMargin))
  )
}
