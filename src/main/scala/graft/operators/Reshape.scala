package graft.operators

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2 B.11 — the reference's pandas reshaping/time-series idioms
  * (Part A rows: `pivot`, `resample`, `pct_change`, `reindex/ffill`)
  * declared as first-class queries.
  *
  * Scale notes: pivot with an explicit value list is a single hash
  * aggregate (no second pass to discover values — mandatory at 100 TB);
  * resample is a date_trunc group; returns/ffill are per-key windows that
  * partition by the entity key, so state stays bounded per task.
  */
object Reshape {

  val defs: Seq[QueryDef] = Seq(

    // pandas pivot long→wide: order counts per priority × status. The
    // explicit value list (F/O/P, FIXTURES.md domain) keeps it one-pass.
    QueryDef(
      "reshape_pivot",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .select(
            col("o_orderpriority"),
            coalesce(col("F"), lit(0L)).as("n_f"),
            coalesce(col("O"), lit(0L)).as("n_o"),
            coalesce(col("P"), lit(0L)).as("n_p"))
          .orderBy("o_orderpriority"),
      // CAST: DuckDB SUM(BIGINT) widens to HUGEINT, which the driver's typed
      // hash compare treats as a different dtype than Spark's BIGINT (D-rule:
      // cast every integer aggregate in the oracle).
      Some("""SELECT o_orderpriority,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Pivot with MULTIPLE aggregates per cell (count + money sum): Spark
    // suffixes the value columns per aggregate alias; the oracle builds
    // the same 6 columns with conditional aggregation.
    QueryDef(
      "reshape_pivot_multi",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)).as("n"), Exact.sumMoney2(col("o_totalprice")).as("sum"))
          .select(
            col("o_orderpriority"),
            coalesce(col("F_n"), lit(0L)).as("f_n"),
            coalesce(col("F_sum"), lit(0.0d)).as("f_sum"),
            coalesce(col("O_n"), lit(0L)).as("o_n"),
            coalesce(col("O_sum"), lit(0.0d)).as("o_sum"),
            coalesce(col("P_n"), lit(0L)).as("p_n"),
            coalesce(col("P_sum"), lit(0.0d)).as("p_sum"))
          .orderBy("o_orderpriority"),
      Some(s"""SELECT o_orderpriority,
              |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_n,
              |  COALESCE(${Exact.sumMoney2Sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")}, 0.0) AS f_sum,
              |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_n,
              |  COALESCE(${Exact.sumMoney2Sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")}, 0.0) AS o_sum,
              |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_n,
              |  COALESCE(${Exact.sumMoney2Sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")}, 0.0) AS p_sum
              |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // pandas melt / SQL UNPIVOT: the pivoted wide table back to long form,
    // via Spark's native Dataset.unpivot (Expand under the hood — one pass,
    // no join). Status codes become the `status` value column.
    QueryDef(
      "reshape_unpivot",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .select(
            col("o_orderpriority"),
            coalesce(col("F"), lit(0L)).as("F"),
            coalesce(col("O"), lit(0L)).as("O"),
            coalesce(col("P"), lit(0L)).as("P"))
          .unpivot(
            Array(col("o_orderpriority")),
            Array(col("F"), col("O"), col("P")),
            "status", "n")
          .orderBy("o_orderpriority", "status"),
      Some("""WITH w AS (
             |  SELECT o_orderpriority,
             |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f,
             |    CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o,
             |    CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p
             |  FROM orders GROUP BY o_orderpriority)
             |SELECT o_orderpriority, status, n FROM (
             |  SELECT o_orderpriority, 'F' AS status, f AS n FROM w
             |  UNION ALL SELECT o_orderpriority, 'O', o FROM w
             |  UNION ALL SELECT o_orderpriority, 'P', p FROM w) u
             |ORDER BY o_orderpriority, status""".stripMargin)),

    // pandas resample('M'): monthly order counts + money sums.
    QueryDef(
      "reshape_resample_monthly",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
          .agg(count(lit(1)).as("n_orders"),
            Exact.sumMoney2(col("o_totalprice")).as("sum_price"))
          .orderBy("month"),
      Some(s"""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
              |  COUNT(*) AS n_orders, ${Exact.sumMoney2Sql("o_totalprice")} AS sum_price
              |FROM orders GROUP BY 1 ORDER BY month""".stripMargin)),

    // pandas reindex-to-calendar: a generated monthly spine (sequence +
    // explode) LEFT-joined to the monthly aggregate, gaps filled with 0 —
    // the idiom that guarantees a row for every period even when the data
    // has none. The spine derives from a 1-row min/max aggregate, so it is
    // broadcast; the fact side never re-shuffles.
    QueryDef(
      "ts_reindex_spine",
      (s, d) => {
        val monthly = Tables.orders(s, d)
          .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
          .agg(count(lit(1)).as("n"))
        val spine = monthly
          .agg(min(col("month")).as("mn"), max(col("month")).as("mx"))
          .select(explode(expr("sequence(mn, mx, interval 1 month)")).as("month"))
        spine.join(monthly, Seq("month"), "left")
          .select(col("month"), coalesce(col("n"), lit(0L)).as("n_orders"))
          .orderBy("month")
      },
      Some("""WITH monthly AS (
             |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month, COUNT(*) AS n
             |  FROM orders GROUP BY 1),
             |b AS (SELECT MIN(month) AS mn, MAX(month) AS mx FROM monthly),
             |spine AS (
             |  SELECT CAST(unnest(generate_series(CAST(mn AS TIMESTAMP),
             |    CAST(mx AS TIMESTAMP), INTERVAL 1 MONTH)) AS DATE) AS month FROM b)
             |SELECT s.month, COALESCE(n, 0) AS n_orders
             |FROM spine s LEFT JOIN monthly m ON s.month = m.month
             |ORDER BY s.month""".stripMargin)),

    // OHLC bars — the financial resample: per (user, hour) open/high/low/
    // close of `value`, open/close picked by event_id order (unique ⇒
    // deterministic) via min_by/max_by; high/low are plain extrema. All
    // outputs are raw doubles passed through untouched (exact cross-engine).
    QueryDef(
      "ts_ohlc",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(col("user_id"),
            date_trunc("hour", col("ts")).as("bar_ts"))
          .agg(
            min_by(col("value"), col("event_id")).as("open"),
            max(col("value")).as("high"),
            min(col("value")).as("low"),
            max_by(col("value"), col("event_id")).as("close"),
            count(lit(1)).as("n_ticks"))
          .orderBy("user_id", "bar_ts"),
      Some("""SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bar_ts,
             |  arg_min(value, event_id) AS open,
             |  MAX(value) AS high,
             |  MIN(value) AS low,
             |  arg_max(value, event_id) AS close,
             |  COUNT(*) AS n_ticks
             |FROM events GROUP BY 1, 2 ORDER BY user_id, bar_ts""".stripMargin)),

    // Max drawdown per user: min over time of (value − running max) in
    // event_id order — raw-double subtraction and extrema, no rounding
    // needed. The risk metric every financial reference pipeline computes.
    QueryDef(
      "ts_drawdown",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn("cummax", max(col("value")).over(w))
          .groupBy(col("user_id"))
          .agg(min(col("value") - col("cummax")).as("max_drawdown"),
            max(col("cummax")).as("peak"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, MIN(value - cummax) AS max_drawdown, MAX(cummax) AS peak
             |FROM (
             |  SELECT user_id, value,
             |    MAX(value) OVER (PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cummax
             |  FROM events) t
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // pandas pct_change: per-user sequential returns on event value.
    QueryDef(
      "ts_returns",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        Tables.events(s, d)
          .select(
            col("user_id"), col("event_id"), col("value"),
            Exact.roundN(
              (col("value") - lag(col("value"), 1).over(w)) /
                nullif(lag(col("value"), 1).over(w), lit(0.0d)), 4).as("ret"))
          .orderBy("user_id", "event_id")
      },
      Some(s"""SELECT user_id, event_id, value,
              |  ${Exact.roundNSql(
                 "(value - LAG(value, 1) OVER w) / NULLIF(LAG(value, 1) OVER w, 0.0)", 4)} AS ret
              |FROM events
              |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
              |ORDER BY user_id, event_id""".stripMargin)),

    // Sweep-line max concurrency: treat each event as a 30-minute session
    // and find, per event_type, the peak number of simultaneously-open
    // sessions — the classic interval-overlap reduction. Each interval
    // becomes a +1/−1 boundary row; a running sum in boundary order is the
    // live-session count; max of that is the answer. Ordered by (ts, delta)
    // so a session ending exactly when another starts closes first (ends
    // don't overlap starts). Windows partition by event_type, so each
    // type's sweep is an independent task; at 100 TB the same shape runs
    // per (type, day) to bound partition width.
    QueryDef(
      "ts_active_concurrency",
      // SCALE REWRITE (round 17, closed-key sweep second wave): the
      // running sum over the boundary stream partitioned on the closed
      // event_type key pushed 2× the events table through ≤#types sort
      // tasks. Two-phase prefix sum over calendar-DAY buckets instead —
      // the bucket map (date_trunc) is a monotone pure function of the
      // data needing NO min/max pass (one fewer scan than the TwoPhase
      // range form), equal timestamps share a day, and the offsets window
      // runs over per-(type, day) delta sums: bounded by the time span,
      // constant in row count. live = bucket-local running sum +
      // exclusive per-day offset; a single-day corpus degenerates to the
      // naive plan, never to a wrong answer.
      // CONSTANT SHAVE (round 18, VERDICT r17 #1): the answer is
      // per-GROUP, and off is constant within a bucket, so
      //   peak = max over buckets of (off + max-within-bucket lcum)
      // — both per-bucket terms come from ONE aggregate over the SAME
      // windowed stream (already hash(type, bkt)-partitioned: no new
      // exchange), and the exclusive-offset window runs over those
      // bounded per-(type, day) rows. The round-17 second derivation of
      // the boundary stream, its broadcast offsets join, and the
      // ScanBudgetSpec repeat entry all disappear: one scan, one heavy
      // exchange, zero joins (measured sf0.1 cold: 1.23 s → 0.71 s;
      // ratchets: PlanSpec no-Join, scan-budget events:1:1,
      // exchange-budget 5+1 → 3+0).
      (s, d) => {
        val bounds = Tables.events(s, d)
          .select(col("event_type"), explode(array(
            struct(col("ts").as("bt"), lit(1).as("delta")),
            struct((col("ts") + expr("INTERVAL 30 MINUTE")).as("bt"),
              lit(-1).as("delta")))).as("b"))
          .select(col("event_type"), col("b.bt").as("bt"), col("b.delta").as("delta"))
          .withColumn("bkt", date_trunc("DAY", col("bt")))
        val wIn = Window.partitionBy(col("event_type"), col("bkt"))
          .orderBy(col("bt"), col("delta"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val perBucket = bounds
          .withColumn("lcum", sum(col("delta")).over(wIn))
          .groupBy(col("event_type"), col("bkt"))
          .agg(max(col("lcum")).as("lmax"), sum(col("delta")).as("dsum"))
        val wOff = Window.partitionBy(col("event_type")).orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        perBucket
          .withColumn("off", coalesce(sum(col("dsum")).over(wOff), lit(0L)))
          .groupBy(col("event_type"))
          .agg(max(col("off") + col("lmax")).cast("long").as("peak_concurrent"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(MAX(live) AS BIGINT) AS peak_concurrent
             |FROM (
             |  SELECT event_type,
             |    SUM(delta) OVER (PARTITION BY event_type ORDER BY bt, delta
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
             |  FROM (
             |    SELECT event_type, ts AS bt, 1 AS delta FROM events
             |    UNION ALL
             |    SELECT event_type, ts + INTERVAL 30 MINUTE, -1 FROM events) b) t
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Week-over-week change: weekly revenue + 4dp relative delta vs the
    // previous week (lag over the aggregated weekly series, not raw rows) —
    // the KPI-dashboard staple.
    QueryDef(
      "ts_wow_change",
      (s, d) => {
        val w = Window.orderBy(col("wk"))
        Tables.orders(s, d)
          .groupBy(date_trunc("week", col("o_orderdate")).cast("date").as("wk"))
          .agg(Exact.sumMoney2(col("o_totalprice")).as("rev"))
          .select(col("wk"), col("rev"),
            Exact.roundN((col("rev") - lag(col("rev"), 1).over(w)) /
              nullif(lag(col("rev"), 1).over(w), lit(0.0d)), 4).as("wow"))
          .orderBy("wk")
      },
      Some(s"""WITH w AS (
              |  SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
              |    ${Exact.sumMoney2Sql("o_totalprice")} AS rev
              |  FROM orders GROUP BY 1)
              |SELECT wk, rev,
              |  ${Exact.roundNSql(
                 "(rev - LAG(rev) OVER (ORDER BY wk)) / NULLIF(LAG(rev) OVER (ORDER BY wk), 0.0)",
                 4)} AS wow
              |FROM w ORDER BY wk""".stripMargin)),

    // Inter-arrival time stats per user (mean + median gap seconds) — the
    // activity-cadence diagnostic behind rate limiting and churn scoring.
    // Gaps are exact integers (floor-of-epoch diff both engines); the mean
    // sums them in decimal, the median reuses the proven percentile parity.
    QueryDef(
      "ts_interarrival",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .withColumn("gap_s",
            col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long"))
          .filter(col("gap_s").isNotNull)
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_gaps"),
            Exact.roundN(sum(col("gap_s").cast("decimal(18,0)")).cast("double") /
              count(lit(1)), 2).as("mean_gap_s"),
            Exact.roundN(expr("percentile(gap_s, 0.5)"), 2).as("med_gap_s"))
          .orderBy("user_id")
      },
      Some(s"""WITH g AS (
              |  SELECT user_id,
              |    date_diff('second', LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_s
              |  FROM events)
              |SELECT user_id, COUNT(*) AS n_gaps,
              |  ${Exact.roundNSql(
                 "CAST(SUM(CAST(gap_s AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*)", 2)} AS mean_gap_s,
              |  ${Exact.roundNSql("quantile_cont(gap_s, 0.5)", 2)} AS med_gap_s
              |FROM g WHERE gap_s IS NOT NULL GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Day-of-week seasonality profile per event_type (count + exact-decimal
    // mean value): the weekly-cycle fingerprint. Spark's dayofweek is
    // 1=Sunday; DuckDB's is 0=Sunday — the oracle shifts by one.
    QueryDef(
      "ts_seasonality_dow",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(col("event_type"), dayofweek(col("ts")).cast("long").as("dow"))
          .agg(count(lit(1)).as("n"),
            Exact.roundN(Exact.sumDec(col("value")).cast("double") / count(lit(1)), 4)
              .as("avg_value"))
          .orderBy("event_type", "dow"),
      Some(s"""SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow, COUNT(*) AS n,
              |  ${Exact.roundNSql(
                 "CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)", 4)} AS avg_value
              |FROM events GROUP BY 1, 2 ORDER BY event_type, dow""".stripMargin)),

    // Batch sessionization by inactivity gap (the batch twin of the
    // streaming session window): a session breaks when > 30 min pass
    // between a user's consecutive events; session id is the running count
    // of breaks. Gap compare uses floor-of-epoch-seconds on BOTH engines
    // (Spark cast-to-long vs DuckDB date_diff both reduce to
    // floor(b)−floor(a)), so the boundary decision is exact.
    QueryDef(
      "ts_sessionize",
      (s, d) => {
        val wo = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wr = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sess = Tables.events(s, d)
          .withColumn("gap_s",
            col("ts").cast("long") - lag(col("ts"), 1).over(wo).cast("long"))
          .withColumn("new_s",
            when(col("gap_s").isNull || col("gap_s") > 1800L, 1).otherwise(0))
          .withColumn("sid", sum(col("new_s")).over(wr))
          .groupBy(col("user_id"), col("sid"))
          .agg(count(lit(1)).as("n"))
        sess.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_sessions"),
            max(col("n")).as("max_session_events"),
            Exact.roundN(sum(col("n")).cast("double") / count(lit(1)), 2)
              .as("avg_session_events"))
          .orderBy("user_id")
      },
      Some(s"""WITH g AS (
              |  SELECT user_id, ts, event_id,
              |    date_diff('second', LAG(ts) OVER w, ts) AS gap_s
              |  FROM events
              |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              |x AS (
              |  SELECT user_id,
              |    SUM(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
              |      OVER (PARTITION BY user_id ORDER BY ts, event_id
              |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              |  FROM g),
              |sess AS (SELECT user_id, sid, COUNT(*) AS n FROM x GROUP BY 1, 2)
              |SELECT user_id, COUNT(*) AS n_sessions,
              |  CAST(MAX(n) AS BIGINT) AS max_session_events,
              |  ${Exact.roundNSql("CAST(SUM(n) AS DOUBLE) / COUNT(*)", 2)} AS avg_session_events
              |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Lag-1 autocorrelation per user: Pearson over the (x_t, x_{t-1})
    // pairs from exact decimal moments — the serial-dependence diagnostic
    // (is this series noise or trend?). One ordered window for the lag,
    // then the same order-insensitive closed form as agg_corr.
    QueryDef(
      "ts_autocorr",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        val q = Tables.events(s, d)
          .select(col("user_id"), col("value").as("x"),
            lag(col("value"), 1).over(w).as("xl"))
          .filter(col("xl").isNotNull)
        q.groupBy(col("user_id"))
          .agg(
            count(lit(1)).cast("double").as("n"),
            Exact.sumDec(col("x")).cast("double").as("sx"),
            Exact.sumDec(col("xl")).cast("double").as("sy"),
            sum((col("x") * col("x")).cast("decimal(28,8)")).cast("double").as("sxx"),
            sum((col("xl") * col("xl")).cast("decimal(28,8)")).cast("double").as("syy"),
            sum((col("x") * col("xl")).cast("decimal(28,8)")).cast("double").as("sxy"))
          .select(col("user_id"),
            // nullif: a constant series zeroes both variance factors —
            // ANSI kills the job; DuckDB's /0 is NULL (round-8 sweep)
            Exact.roundN(
              (col("n") * col("sxy") - col("sx") * col("sy")) /
                nullif(sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
                  (col("n") * col("syy") - col("sy") * col("sy"))), lit(0.0d)), 4)
              .as("ac1"))
          .orderBy("user_id")
      },
      Some(s"""WITH p AS (
              |  SELECT user_id, value AS x,
              |    LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) AS xl
              |  FROM events),
              |q AS (SELECT user_id, x, xl FROM p WHERE xl IS NOT NULL),
              |m AS (
              |  SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS n,
              |    CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) AS sx,
              |    CAST(SUM(CAST(xl AS DECIMAL(18,4))) AS DOUBLE) AS sy,
              |    CAST(SUM(CAST(x * x AS DECIMAL(28,8))) AS DOUBLE) AS sxx,
              |    CAST(SUM(CAST(xl * xl AS DECIMAL(28,8))) AS DOUBLE) AS syy,
              |    CAST(SUM(CAST(x * xl AS DECIMAL(28,8))) AS DOUBLE) AS sxy
              |  FROM q GROUP BY user_id)
              |SELECT user_id,
              |  ${Exact.roundNSql(
                 "(n * sxy - sx * sy) / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy))", 4)} AS ac1
              |FROM m ORDER BY user_id""".stripMargin)),

    // Robust outlier detection (median absolute deviation): per user,
    // med = median(value), mad = median(|value − med|), outlier ⇔
    // |value − med| > 3·mad. Both medians interpolate identically cross-
    // engine (same parity as agg_percentile) and are rounded to 4dp BEFORE
    // the deviation/threshold arithmetic, so the flag compare is exact.
    // Two grouped aggregates + one broadcast-size rejoin per key — no
    // window over raw rows, so it scales as two shuffles of user-grain
    // aggregates.
    QueryDef(
      "ts_anomaly_mad",
      (s, d) => {
        val e = Tables.events(s, d)
        val med = e.groupBy(col("user_id"))
          .agg(Exact.roundN(expr("percentile(value, 0.5)"), 4).as("med"))
        val dev = e.join(med, Seq("user_id"))
          .withColumn("adev", abs(col("value") - col("med")))
        val mad = dev.groupBy(col("user_id"))
          .agg(Exact.roundN(expr("percentile(adev, 0.5)"), 4).as("mad"))
        dev.join(mad, Seq("user_id"))
          .groupBy(col("user_id"))
          .agg(
            first(col("med")).as("med"),
            first(col("mad")).as("mad"),
            sum(when(col("adev") > lit(3.0d) * col("mad"), 1).otherwise(0))
              .cast("long").as("n_outliers"))
          .orderBy("user_id")
      },
      Some(s"""WITH med AS (
              |  SELECT user_id, ${Exact.roundNSql("quantile_cont(value, 0.5)", 4)} AS med
              |  FROM events GROUP BY user_id),
              |dev AS (
              |  SELECT e.user_id, med, ABS(value - med) AS adev
              |  FROM events e JOIN med USING (user_id)),
              |mad AS (
              |  SELECT user_id, ${Exact.roundNSql("quantile_cont(adev, 0.5)", 4)} AS mad
              |  FROM dev GROUP BY user_id)
              |SELECT user_id, MIN(med) AS med, MIN(mad) AS mad,
              |  CAST(SUM(CASE WHEN adev > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
              |FROM dev JOIN mad USING (user_id)
              |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Null imputation with the per-user mean (the fillna(df.mean()) data-
    // cleaning idiom): values < 100 are masked to NULL, then filled with
    // that user's mean of the surviving values from exact decimal sums.
    QueryDef(
      "ts_impute_mean",
      (s, d) => {
        val wu = Window.partitionBy(col("user_id"))
        Tables.events(s, d)
          .withColumn("v_masked", when(col("value") >= 100d, col("value")))
          .withColumn("user_mean",
            Exact.roundN(
              sum(col("v_masked").cast("decimal(18,4)")).over(wu).cast("double") /
                count(col("v_masked")).over(wu), 4))
          .select(col("user_id"), col("event_id"), col("v_masked"),
            coalesce(col("v_masked"), col("user_mean")).as("v_imputed"))
          .orderBy("user_id", "event_id")
      },
      Some(s"""SELECT user_id, event_id, v_masked,
              |  COALESCE(v_masked, ${Exact.roundNSql(
                 "CAST(SUM(CAST(v_masked AS DECIMAL(18,4))) OVER w AS DOUBLE) / COUNT(v_masked) OVER w", 4)}) AS v_imputed
              |FROM (SELECT user_id, event_id,
              |        CASE WHEN value >= 100 THEN value END AS v_masked
              |      FROM events) t
              |WINDOW w AS (PARTITION BY user_id)
              |ORDER BY user_id, event_id""".stripMargin)),

    // Truncated EWMA (α=0.5, K=8 taps) per user in event_id order. The
    // closed-form recurrence needs unbounded look-back (not expressible as
    // a window aggregate without pow overflow), so this is the standard
    // finite-impulse truncation: weights 2^-k are EXACT binary doubles,
    // each product is an exact power-of-two scaling, and the sum order is
    // fixed left-to-right in one expression — bit-identical cross-engine
    // with no rounding step. Tail weight 2^-8 < 0.4% ⇒ truncation is below
    // double-display precision for this data.
    QueryDef(
      "ts_ewma",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        val taps = 8
        val terms: Seq[org.apache.spark.sql.Column] =
          (col("value") * lit(1.0d)) +:
            (1 until taps).map(k =>
              coalesce(lag(col("value"), k).over(w) * lit(math.pow(0.5, k)), lit(0.0d)))
        val weights: Seq[org.apache.spark.sql.Column] =
          lit(1.0d) +:
            (1 until taps).map(k =>
              when(lag(col("value"), k).over(w).isNotNull, lit(math.pow(0.5, k)))
                .otherwise(lit(0.0d)))
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("value"),
            (terms.reduceLeft(_ + _) / weights.reduceLeft(_ + _)).as("ewma"))
          .orderBy("user_id", "event_id")
      },
      Some {
        val terms = ("value * 1.0" +:
          (1 until 8).map(k => s"COALESCE(LAG(value, $k) OVER w * ${math.pow(0.5, k)}, 0.0)"))
          .mkString(" + ")
        val weights = ("1.0" +:
          (1 until 8).map(k =>
            s"CASE WHEN LAG(value, $k) OVER w IS NOT NULL THEN ${math.pow(0.5, k)} ELSE 0.0 END"))
          .mkString(" + ")
        s"""SELECT user_id, event_id, value, ($terms) / ($weights) AS ewma
           |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
           |ORDER BY user_id, event_id""".stripMargin
      }),

    // pandas reindex+ffill: mask low values to NULL, forward-fill with the
    // last non-null per user — the calendar-alignment idiom.
    QueryDef(
      "ts_ffill",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn("v_masked", when(col("value") >= 100d, col("value")))
          .select(
            col("user_id"), col("event_id"), col("v_masked"),
            last(col("v_masked"), ignoreNulls = true).over(w).as("v_filled"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, v_masked,
             |  LAST_VALUE(v_masked IGNORE NULLS) OVER (
             |    PARTITION BY user_id ORDER BY event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
             |FROM (SELECT user_id, event_id,
             |        CASE WHEN value >= 100 THEN value END AS v_masked
             |      FROM events) t
             |ORDER BY user_id, event_id""".stripMargin))
  )
}
