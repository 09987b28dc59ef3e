package graft.operators

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2 B.5 window functions.
  *
  * Every window ORDER BY carries a unique tie-break key (D2). Rank outputs
  * are cast to long so the parquet schema matches DuckDB's BIGINT window
  * results. The framed sum uses a decimal operand: engines disagree on
  * sliding-sum association order (segment trees vs running subtraction),
  * decimals make that irrelevant.
  */
object Windows {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "win_topk_per_group",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) t
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    // SCALE REWRITE (round 17, closed-key sweep second wave): rank and
    // dense_rank over (p_retailprice DESC) on the closed ~25-value
    // p_brand key are pure functions of the VALUE — rank = #{> v} + 1
    // (peers share it by definition), dense = distinct-above + 1 — so
    // both derive from the per-distinct-price histogram (the
    // agg_spearman mechanism): one map-side (brand, price) count, a
    // cumulative window over DISTINCT prices (granularity-bounded,
    // constant in row count), broadcast back onto the never-shuffled
    // scan. DESC NULLS LAST ordering survives because the histogram
    // window sorts the same expression the raw window did.
    QueryDef(
      "win_rank_dense",
      (s, d) => {
        val hist = Tables.part(s, d)
          .select(col("p_brand"), col("p_retailprice"))
          .groupBy(col("p_brand").as("hb"), col("p_retailprice").as("hp"))
          .agg(count(lit(1)).as("cnt"))
        val wGt = Window.partitionBy(col("hb")).orderBy(col("hp").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val wPos = Window.partitionBy(col("hb")).orderBy(col("hp").desc)
        val rmap = hist
          .withColumn("rnk", coalesce(sum(col("cnt")).over(wGt), lit(0L)) + lit(1L))
          .withColumn("drnk", row_number().over(wPos).cast("long"))
          .select(col("hb"), col("hp"), col("rnk"), col("drnk"))
        Tables.part(s, d)
          .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
          .join(broadcast(rmap),
            col("p_brand") <=> col("hb") && col("p_retailprice") <=> col("hp"))
          .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
            col("rnk"), col("drnk"))
          .orderBy("p_brand", "rnk", "p_partkey")
      },
      Some("""SELECT p_brand, p_partkey, p_retailprice,
             |  RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk,
             |  DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS drnk
             |FROM part ORDER BY p_brand, rnk, p_partkey""".stripMargin)),

    QueryDef(
      "win_lag_lead",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        Tables.events(s, d)
          .select(
            col("user_id"), col("event_id"), col("value"),
            lag(col("value"), 1).over(w).as("prev_value"),
            lead(col("value"), 1).over(w).as("next_value"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, value,
             |  LAG(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
             |  LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS next_value
             |FROM events ORDER BY user_id, event_id""".stripMargin)),

    QueryDef(
      "win_frame_rows",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(-2, 0)
        Tables.orders(s, d)
          .select(
            col("o_custkey"), col("o_orderdate").cast("date").as("o_date"), col("o_orderkey"),
            round(sum(col("o_totalprice").cast("decimal(18,4)")).over(w), 2)
              .cast("double").as("rolling_sum"))
          .orderBy("o_custkey", "o_date", "o_orderkey")
      },
      Some("""SELECT o_custkey, CAST(o_orderdate AS DATE) AS o_date, o_orderkey,
             |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS rolling_sum
             |FROM orders ORDER BY o_custkey, o_date, o_orderkey""".stripMargin)),

    QueryDef(
      "win_frame_range",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_date"))
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d)
          .withColumn("o_date", col("o_orderdate").cast("date"))
          .select(
            col("o_custkey"), col("o_date"), col("o_orderkey"),
            count(lit(1)).over(w).as("cum_orders"))
          .orderBy("o_custkey", "o_date", "o_orderkey")
      },
      Some("""SELECT o_custkey, CAST(o_orderdate AS DATE) AS o_date, o_orderkey,
             |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
             |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_orders
             |FROM orders ORDER BY o_custkey, o_date, o_orderkey""".stripMargin)),

    // percent_rank = (rank−1)/(n−1) and cume_dist = peers≤/n in both
    // engines — pure int ratios, rounded 4dp (D5).
    //
    // SCALE REWRITE (round 17, closed-key sweep second wave): the raw-row
    // window on the closed 5-value c_mktsegment key exchanged every
    // customer into ≤5 sort tasks (measured linear per-task memory growth,
    // BASELINE.md r17). Now the win_ntile deterministic-value-bucket
    // pattern, per group (TwoPhase.bucket): rank within (segment, bucket)
    // in parallel, exclusive bucket offsets from a ≤5×66-row aggregate,
    // broadcast back. Peer semantics survive exactly: local rank() counts
    // strictly-before rows (peers share it) and the default RANGE-to-
    // CURRENT-ROW count frame includes peers — and since equal values
    // share a bucket by construction, peers never span buckets, so
    // global rank = off + local rank and peers≤ = off + local count.
    // n == 1 must yield pct_rank 0.0 (the SQL-standard guard both engines
    // apply before dividing by n−1).
    QueryDef(
      "win_pct_rank",
      (s, d) => {
        val c = Tables.customer(s, d)
          .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
        val stats = c.groupBy(col("c_mktsegment").as("sg"))
          .agg(min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
        def bucketize(df: org.apache.spark.sql.DataFrame) =
          df.join(broadcast(stats), col("c_mktsegment") <=> col("sg"))
            .withColumn("bkt",
              TwoPhase.bucket(col("c_acctbal"), col("lo"), col("hi")))
        val wOff = Window.partitionBy(col("sg")).orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = bucketize(c.select(col("c_mktsegment"), col("c_acctbal")))
          .groupBy(col("sg"), col("bkt")).agg(count(lit(1)).as("cnt"))
          .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
          .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("sg"))))
          .select(col("sg").as("og"), col("bkt").as("obkt"),
            col("off"), col("n"))
        val wIn = Window.partitionBy(col("c_mktsegment"), col("bkt"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        bucketize(c)
          .withColumn("lrk", rank().over(wIn))
          .withColumn("lc", count(lit(1)).over(wIn)) // default frame: peers≤
          .join(broadcast(offs),
            col("c_mktsegment") <=> col("og") && col("bkt") === col("obkt"))
          .select(
            col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
            graft.Exact.roundN(
              when(col("n") === 1L, lit(0.0d)).otherwise(
                (col("off") + col("lrk") - lit(1L)).cast("double") /
                  (col("n") - lit(1L)).cast("double")), 4).as("pct_rank"),
            graft.Exact.roundN(
              (col("off") + col("lc")).cast("double") / col("n").cast("double"),
              4).as("cume"))
          .orderBy("c_mktsegment", "c_custkey")
      },
      Some(s"""SELECT c_mktsegment, c_custkey, c_acctbal,
              |  ${graft.Exact.roundNSql("PERCENT_RANK() OVER w", 4)} AS pct_rank,
              |  ${graft.Exact.roundNSql("CUME_DIST() OVER w", 4)} AS cume
              |FROM customer
              |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
              |ORDER BY c_mktsegment, c_custkey""".stripMargin)),

    // SCALE REWRITE (round 17, closed-key sweep second wave): the
    // unbounded-frame first/nth_value on the closed ~25-value p_brand key
    // funneled the whole part table into ≤25 sort tasks to read TWO
    // values per brand; round 17 replaced it with tpid-salted
    // WindowGroupLimit candidates merged per brand.
    // CONSTANT SHAVE (round 18, VERDICT r17 #1): the same per-task bound
    // made direct — a typed bottom-2 aggregate
    // ([[graft.functions.BottomTwo]], the SecondMax pattern): O(1)
    // per-row push into a 2-slot state, O(1) merge, map-side combinable
    // like any built-in. This drops the salt-window exchange AND the
    // map-side sort the WGL pass paid on every partition (each task
    // sorted its whole slice on (brand, tpid, price, key) before
    // limiting — O(n log n) per task vs O(n) pushes here). The input
    // encodes (price DESC NULLS LAST, partkey ASC) as an ascending
    // (isnull, −price, key) triple; the aggregator compares −price via
    // IEEE == then Double.compare, so 0.0/−0.0 and NaN ties still fall
    // through to the key — matching Spark's normalized sort on every
    // real-valued input (TwoPhaseRankFuzzSpec pins row identity vs the
    // original window body). KNOWN NaN DIVERGENCE from the original
    // `p_retailprice.desc` window (ADVICE r18 #3): negation maps NaN to
    // NaN, and NaN is GREATEST in the ascending −price order — so a NaN
    // price ranks below all real prices here, where the original DESC
    // window (and the oracle's DESC) would rank it FIRST. Prices are
    // never NaN in any fixture (the column is parquet double from TPC-H
    // money; degenerate sets null it, and NULL is carried by `nl`), so
    // the seam is unreachable today; a NaN-bearing ingest would need
    // np = if(isnan(p), −Inf, −p) with a NaN flag column, mirroring nl.
    // The ≤25-row result broadcasts back onto the never-shuffled
    // scan (measured sf0.1 cold: 2.2 s → 1.5 s solo; ratchets: PlanSpec
    // no-Window, exchange-budget 3+1 → 2+1).
    QueryDef(
      "win_first_nth",
      (s, d) => {
        val p0 = Tables.part(s, d)
          .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
        // Shared module-level udaf (round 21, VERDICT r20 #3 pattern).
        val bottom2 = graft.functions.BottomTwoUdaf.fn
        val top2 = p0
          .groupBy(col("p_brand").as("tb"))
          .agg(bottom2(
            col("p_retailprice").isNull,
            coalesce(-col("p_retailprice"), lit(0.0d)),
            col("p_partkey")).as("t2"))
          .select(col("tb"), col("t2.top").as("top_part"),
            col("t2.second").as("second_part"))
        p0.join(broadcast(top2), col("p_brand") <=> col("tb"))
          .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
            col("top_part"), col("second_part"))
          .orderBy("p_brand", "p_partkey")
      },
      Some("""SELECT p_brand, p_partkey, p_retailprice,
             |  FIRST_VALUE(p_partkey) OVER w AS top_part,
             |  NTH_VALUE(p_partkey, 2) OVER w AS second_part
             |FROM part
             |WINDOW w AS (PARTITION BY p_brand
             |  ORDER BY p_retailprice DESC, p_partkey
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY p_brand, p_partkey""".stripMargin)),

    // Global NTILE(4) over the whole table — computed WITHOUT the naive
    // unpartitioned window, which funnels every row through one partition
    // (the classic global-ranking chokepoint at 100 TB). Instead:
    //   1. order-aligned coarse buckets from the value range (monotone
    //      value→bucket map, so bucket order == sort order and equal keys
    //      share a bucket; 1-row min/max agg, broadcast);
    //   2. row_number WITHIN each bucket (parallel window, state bounded
    //      by bucket population);
    //   3. exclusive per-bucket offsets via a window over ≤64 aggregated
    //      rows (bounded regardless of table size);
    //   4. exact 0-based global position p = offset + rn − 1, then the
    //      SQL-standard NTILE position formula: q=n div k, r=n mod k, the
    //      first r tiles get q+1 rows. Bit-identical to the oracle's
    //      NTILE(4) for any input; a fully skewed column degenerates to
    //      one bucket — i.e. to the naive plan — never to a wrong answer.
    QueryDef(
      "win_ntile",
      (s, d) => {
        val buckets = 64
        val c = Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal"))
        val stats = c.agg(min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
        // NULL balances get their own bucket BELOW the range (-1): they
        // must survive the equi-join on bkt (a NULL bkt row would
        // silently vanish) and rank first, matching Spark's
        // NULL-smallest sort — the oracle says NULLS FIRST explicitly
        // because DuckDB defaults to NULLS LAST (round-9 parity sweep)
        def withBkt(base: org.apache.spark.sql.DataFrame) =
          base.crossJoin(broadcast(stats)).withColumn("bkt",
            when(col("c_acctbal").isNull, lit(-1))
              .when(col("hi") === col("lo"), lit(0)).otherwise(
                least(lit(buckets - 1),
                  floor((col("c_acctbal") - col("lo")) * buckets /
                    (col("hi") - col("lo"))).cast("int"))))
        val bucketed = withBkt(c)
        val wIn = Window.partitionBy(col("bkt"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        val ranked = bucketed.withColumn("rn", row_number().over(wIn))
        val wOff = Window.orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wAll = Window.orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        // Per-bucket counts come from a SECOND pass over c_acctbal alone
        // (not from the ranked stream, and not via a shared exchange).
        // This is a deliberate ScanBudgetSpec exception, measured round
        // 11: AQE stage reuse does not fire for the window-vs-aggregate
        // consumer pair (column pruning makes the subtrees unequal — the
        // agg_chi_square class), and every scan-once alternative is worse
        // at 100 TB: deriving counts from `ranked` sorts the full table a
        // second time, materializing `bucketed` checkpoints a full-table
        // intermediate, and a global ORDER BY bkt window is the
        // single-partition chokepoint this query exists to avoid. The
        // repeated read is ONE pruned column that partial-aggregates to
        // ≤66 rows per task, map-side — the cheapest of the options.
        val offs = withBkt(c.select(col("c_acctbal")))
          .groupBy(col("bkt")).agg(count(lit(1)).as("cnt"))
          .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
          .withColumn("n", sum(col("cnt")).over(wAll))
        ranked.join(broadcast(offs.select("bkt", "off", "n")), "bkt")
          .withColumn("p", col("off") + col("rn") - 1)
          .withColumn("quartile", expr(
            "CAST(IF(p < (n % 4) * (n DIV 4 + 1), p DIV (n DIV 4 + 1), " +
              "(p - (n % 4) * (n DIV 4 + 1)) DIV (n DIV 4) + (n % 4)) + 1 AS BIGINT)"))
          .select(col("c_custkey"), col("c_acctbal"), col("quartile"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal,
             |  NTILE(4) OVER (ORDER BY c_acctbal NULLS FIRST, c_custkey) AS quartile
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // Gaps-and-islands: maximal runs of the same event_type per user in
    // event_id order, via the classic difference-of-row_numbers grouping
    // key. Both windows partition by user, so state stays bounded per key
    // at any scale; the island aggregate is an ordinary hash agg.
    QueryDef(
      "win_islands",
      (s, d) => {
        val wAll = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        val wTyp = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("event_id"),
            (row_number().over(wAll) - row_number().over(wTyp)).as("grp"))
          .groupBy(col("user_id"), col("event_type"), col("grp"))
          .agg(min(col("event_id")).as("start_id"), count(lit(1)).as("streak_len"))
          .filter(col("streak_len") >= 2)
          .select("user_id", "event_type", "start_id", "streak_len")
          .orderBy("user_id", "start_id")
      },
      Some("""SELECT user_id, event_type, MIN(event_id) AS start_id,
             |  COUNT(*) AS streak_len
             |FROM (
             |  SELECT user_id, event_type, event_id,
             |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id)
             |    - ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS grp
             |  FROM events) t
             |GROUP BY user_id, event_type, grp
             |HAVING COUNT(*) >= 2
             |ORDER BY user_id, start_id""".stripMargin)),

    // Per-group standardization (z-score). The moments come from exact
    // decimal window sums (order-insensitive, D1); the final
    // (x−μ)/σ arithmetic is plain IEEE doubles, identical on both engines,
    // rounded 4dp (D5). Sample variance (n−1); every priority group has
    // thousands of rows, so n>1 always holds.
    // Rolling volatility: stddev of the trailing 30 events per user from
    // exact decimal frame sums (win_zscore's discipline on a BOUNDED
    // sliding frame), full frames only.
    QueryDef(
      "win_rolling_std",
      (s, d) => {
        val wo = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        val wf = wo.rowsBetween(-29, Window.currentRow)
        Tables.events(s, d)
          .withColumn("s1", sum(col("value").cast("decimal(18,4)")).over(wf).cast("double"))
          .withColumn("s2", sum((col("value") * col("value")).cast("decimal(28,8)")).over(wf)
            .cast("double"))
          .withColumn("n", count(lit(1)).over(wf).cast("double"))
          .withColumn("rn", row_number().over(wo))
          .filter(col("rn") >= 30)
          .select(col("user_id"), col("event_id"),
            Exact.roundN(sqrt((col("s2") - col("s1") * col("s1") / col("n")) /
              (col("n") - 1d)), 4).as("vol30"))
          .orderBy("user_id", "event_id")
      },
      Some(s"""SELECT user_id, event_id,
              |  ${Exact.roundNSql("SQRT((s2 - s1 * s1 / n) / (n - 1))", 4)} AS vol30
              |FROM (
              |  SELECT user_id, event_id,
              |    CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS s1,
              |    CAST(SUM(CAST(value * value AS DECIMAL(28,8))) OVER w AS DOUBLE) AS s2,
              |    CAST(COUNT(*) OVER w AS DOUBLE) AS n,
              |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
              |  FROM events
              |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
              |    ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)) t
              |WHERE rn >= 30 ORDER BY user_id, event_id""".stripMargin)),

    // Percent-of-total contribution: each order's 6dp share of its
    // priority's decimal-exact total — the window-sum ratio behind every
    // "contribution analysis" breakdown.
    QueryDef(
      "win_share_of_group",
      // SCALE REWRITE (round 17, the closed-key ordered-window sweep):
      // the whole-partition window sum partitioned on the closed 5-value
      // priority key exchanged EVERY row into ≤5 tasks just to read a
      // 5-row total. Same values, scale shape: a map-side 5-row aggregate
      // broadcast-joined (null-safely — NULL priority is a group) back
      // onto the scan; the row side never shuffles and parallelism tracks
      // input partitions. Ratchet: PlanSpec "win_zscore and
      // win_share_of_group join broadcast group totals".
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        val totals = o.groupBy(col("o_orderpriority").as("pr"))
          .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("tot"))
        o.join(broadcast(totals), col("o_orderpriority") <=> col("pr"))
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
            // nullif: an all-zero group sums to 0 — ANSI kills the job;
            // DuckDB's /0 is NULL (round-8 sweep)
            Exact.roundN(col("o_totalprice") /
              nullif(col("tot").cast("double"), lit(0.0d)), 6)
              .as("share"))
          .orderBy("o_orderkey")
      },
      Some(s"""SELECT o_orderkey, o_orderpriority, o_totalprice,
              |  ${Exact.roundNSql(
                 "o_totalprice / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) " +
                   "OVER (PARTITION BY o_orderpriority) AS DOUBLE)", 6)} AS share
              |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Bounded sliding TIME-range frame (vs win_frame_range's cumulative
    // frame): orders within the trailing 7 DAYS of each order, per
    // customer — RANGE over epoch-days, so rows at unevenly spaced dates
    // get value-based (not row-based) neighborhoods. Epoch-day integers
    // make the frame bounds exact on both engines.
    QueryDef(
      "win_rolling_7d",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("epoch_day"))
          .rangeBetween(-6, Window.currentRow)
        Tables.orders(s, d)
          .withColumn("epoch_day",
            datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
              .cast("long"))
          .select(col("o_custkey"), col("o_orderkey"), col("epoch_day"),
            count(lit(1)).over(w).as("n_7d"),
            round(sum(col("o_totalprice").cast("decimal(18,4)")).over(w), 2)
              .cast("double").as("rev_7d"))
          .orderBy("o_custkey", "epoch_day", "o_orderkey")
      },
      Some(s"""SELECT o_custkey, o_orderkey, epoch_day,
              |  COUNT(*) OVER w AS n_7d,
              |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w, 2) AS DOUBLE) AS rev_7d
              |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
              |        date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS epoch_day
              |      FROM orders) t
              |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_day
              |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
              |ORDER BY o_custkey, epoch_day, o_orderkey""".stripMargin)),

    // Rolling 7-row median per user (order-statistic smoothing): Spark has
    // no percentile window aggregate, so the frame is materialized with
    // collect_list over ROWS BETWEEN 6 PRECEDING, sorted, and the middle
    // element picked — an O(k log k) per-row cost that is the honest price
    // of an exact sliding order statistic. Only full frames are emitted
    // (rn ≥ 7): an odd frame has ONE middle element, so the pick is an
    // exact double with no interpolation to drift cross-engine (DuckDB's
    // median interpolates on even counts). The array is intermediate only —
    // output stays flat.
    QueryDef(
      "win_rolling_median",
      (s, d) => {
        val wo = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        val wf = wo.rowsBetween(-6, Window.currentRow)
        Tables.events(s, d)
          .withColumn("rn", row_number().over(wo))
          .withColumn("frame", collect_list(col("value")).over(wf))
          .filter(col("rn") >= 7)
          .select(col("user_id"), col("event_id"),
            element_at(sort_array(col("frame")), 4).as("med7"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, med7 FROM (
             |  SELECT user_id, event_id,
             |    ROW_NUMBER() OVER w AS rn,
             |    median(value) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)) t
             |WHERE rn >= 7 ORDER BY user_id, event_id""".stripMargin)),

    // cume_dist with a fully-deterministic ordering (acctbal, custkey ⇒ no
    // peers), so cd = rank/n exactly; the int/int division is the same
    // ieee754 quotient on both engines.
    //
    // SCALE REWRITE (round 17, closed-key sweep second wave): same
    // transformation as win_pct_rank — the raw-row window on the closed
    // 5-value segment key becomes TwoPhase-bucketed local counts plus
    // broadcast exclusive offsets; the peers-inclusive count (the default
    // RANGE-to-CURRENT-ROW frame) keeps cume_dist's exact semantics even
    // on degenerate full-duplicate rows, since equal values never span
    // buckets.
    QueryDef(
      "win_cume_dist",
      (s, d) => {
        val c = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        val stats = c.groupBy(col("c_mktsegment").as("sg"))
          .agg(min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
        def bucketize(df: org.apache.spark.sql.DataFrame) =
          df.join(broadcast(stats), col("c_mktsegment") <=> col("sg"))
            .withColumn("bkt",
              TwoPhase.bucket(col("c_acctbal"), col("lo"), col("hi")))
        val wOff = Window.partitionBy(col("sg")).orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = bucketize(c.select(col("c_mktsegment"), col("c_acctbal")))
          .groupBy(col("sg"), col("bkt")).agg(count(lit(1)).as("cnt"))
          .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
          .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("sg"))))
          .select(col("sg").as("og"), col("bkt").as("obkt"),
            col("off"), col("n"))
        val wIn = Window.partitionBy(col("c_mktsegment"), col("bkt"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        bucketize(c)
          .withColumn("lc", count(lit(1)).over(wIn)) // default frame: peers≤
          .join(broadcast(offs),
            col("c_mktsegment") <=> col("og") && col("bkt") === col("obkt"))
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
            Exact.roundN(
              (col("off") + col("lc")).cast("double") / col("n").cast("double"),
              6).as("cd"))
          .orderBy("c_custkey")
      },
      Some(s"""SELECT c_custkey, c_mktsegment, c_acctbal,
              |  ${Exact.roundNSql("cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)", 6)} AS cd
              |FROM customer ORDER BY c_custkey""".stripMargin)),

    QueryDef(
      "win_zscore",
      // SCALE REWRITE (round 17): same transformation as
      // win_share_of_group — the three whole-partition moment windows on
      // the closed 5-value key become one map-side 5-row aggregate,
      // null-safely broadcast-joined back onto the (never-shuffled) scan.
      (s, d) => {
        val p = col("o_totalprice")
        val o = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"), p)
        val moments = o.groupBy(col("o_orderpriority").as("pr"))
          .agg(
            Exact.sumDec(p).cast("double").as("s1"),
            sum((p * p).cast("decimal(28,8)")).cast("double").as("s2"),
            count(lit(1)).cast("double").as("n"))
        o.join(broadcast(moments), col("o_orderpriority") <=> col("pr"))
          .select(
            col("o_orderkey"), col("o_orderpriority"), p,
            // nullif twice: a single-row group zeroes (n−1) and an
            // all-equal group zeroes σ — either way ANSI kills the job;
            // DuckDB's /0 is NULL (round-8 sweep, DegenerateGroupSpec)
            Exact.roundN(
              (p - col("s1") / col("n")) /
                nullif(sqrt((col("s2") - col("s1") * col("s1") / col("n")) /
                  nullif(col("n") - 1d, lit(0.0d))), lit(0.0d)),
              4).as("z"))
          .orderBy("o_orderkey")
      },
      Some(s"""SELECT o_orderkey, o_orderpriority, o_totalprice,
              |  ${Exact.roundNSql(
                 "(o_totalprice - s1 / n) / SQRT((s2 - s1 * s1 / n) / (n - 1))", 4)} AS z
              |FROM (
              |  SELECT o_orderkey, o_orderpriority, o_totalprice,
              |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS s1,
              |    CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(28,8))) OVER w AS DOUBLE) AS s2,
              |    CAST(COUNT(*) OVER w AS DOUBLE) AS n
              |  FROM orders
              |  WINDOW w AS (PARTITION BY o_orderpriority)) t
              |ORDER BY o_orderkey""".stripMargin))
  )
}
