package graft.operators

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2 B.4 aggregation.
  *
  * Every money/float aggregate follows Exact's decimal-sum discipline (D5):
  * partial aggregation order then cannot change the result, which is also
  * what makes these safe under AQE re-planning on a real cluster. All are
  * partial+final hash aggregates — map-side combine keeps shuffle volume at
  * |groups| × partitions regardless of input size.
  */
object Aggregates {

  private val zeroDec38 = lit(java.math.BigDecimal.ZERO).cast("decimal(38,4)")

  /** Exact selection walk over a band's sorted distinct (value, count)
    * array (`agg_trimmed_mean`): finds the first value where the running
    * count reaches rank-within-band `j`, carrying strict-below count/sum
    * and the value's multiplicity. The walk is BOUNDED to its own band
    * [from, bandHi] (ADVICE r17): the array holds BOTH fence bands'
    * values, and an unbounded `p >= from` filter could let a walk whose
    * bracket was violated (target rank beyond the band's mass) run on
    * into the upper band and "hit" at a wrong value SILENTLY — bounding
    * structurally guarantees a violated bracket leaves `t` NULL, the
    * declared loud failure. (Violation is unreachable today only because
    * of the percentile_approx rank-error bound; TrimmedMeanFuzzSpec pins
    * the guarantee directly.)
    */
  private[graft] def selectionWalk(arr: Column, from: Column, bandHi: Column,
      j: Column): Column =
    aggregate(
      filter(arr, x => x("p") >= from && x("p") <= bandHi),
      struct(lit(0L).as("cum"), zeroDec38.as("cums"),
        lit(null).cast("double").as("t"), lit(0L).as("cb"),
        zeroDec38.as("sb"), lit(0L).as("mu")),
      (acc, x) => {
        val hit = acc("t").isNull && (acc("cum") + x("c")) >= j
        struct(
          (acc("cum") + x("c")).as("cum"),
          (acc("cums") + x("p").cast("decimal(18,4)") * x("c"))
            .cast("decimal(38,4)").as("cums"),
          when(hit, x("p")).otherwise(acc("t")).as("t"),
          when(hit, acc("cum")).otherwise(acc("cb")).as("cb"),
          when(hit, acc("cums")).otherwise(acc("sb")).as("sb"),
          when(hit, x("c")).otherwise(acc("mu")).as("mu"))
      })

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q1 shape.
    QueryDef(
      "agg_pricing_summary",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(Exact.sumDec(col("l_quantity")), 2).cast("double").as("sum_qty"),
            Exact.sumMoney2(col("l_extendedprice")).as("sum_base"),
            round(Exact.sumDec8(col("l_extendedprice") * (lit(1d) - col("l_discount"))), 2)
              .cast("double").as("sum_disc"),
            Exact.roundN(Exact.sumDec(col("l_quantity")).cast("double") / count(lit(1)), 4)
              .as("avg_qty"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${Exact.sumMoney2Sql("l_quantity")} AS sum_qty,
              |  ${Exact.sumMoney2Sql("l_extendedprice")} AS sum_base,
              |  ${Exact.sumDec8Money2Sql("l_extendedprice * (1 - l_discount)")} AS sum_disc,
              |  ${Exact.roundNSql("CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)", 4)} AS avg_qty,
              |  COUNT(*) AS n
              |FROM lineitem GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    QueryDef(
      "agg_distinct",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("n_parts"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    QueryDef(
      "agg_multi_distinct",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            round(Exact.sumDec(col("l_quantity")), 2).cast("double").as("sum_qty"))
          .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
              |  COUNT(DISTINCT l_suppkey) AS n_supps,
              |  ${Exact.sumMoney2Sql("l_quantity")} AS sum_qty
              |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    QueryDef(
      "agg_having",
      (s, d) =>
        Tables.customer(s, d)
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_cust"))
          .filter(col("n_cust") > 5)
          .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey, COUNT(*) AS n_cust FROM customer
             |GROUP BY c_nationkey HAVING COUNT(*) > 5 ORDER BY c_nationkey""".stripMargin)),

    // Stats via exact decimal moments: avg/var/stddev are derived from the
    // order-insensitive decimal sums of x and x², so both engines compute
    // identical doubles (plain stddev_samp would be summation-order-
    // sensitive and could flip a rounded digit).
    QueryDef(
      "agg_stats",
      (s, d) => {
        val x = col("c_acctbal").cast("decimal(18,4)")
        Tables.customer(s, d)
          .groupBy(col("c_mktsegment"))
          .agg(
            min(col("c_acctbal")).as("min_bal"),
            max(col("c_acctbal")).as("max_bal"),
            sum(x).cast("double").as("s1"),
            sum(x * x).cast("double").as("s2"),
            count(lit(1)).as("n"))
          .select(
            col("c_mktsegment"), col("min_bal"), col("max_bal"),
            Exact.roundN(col("s1") / col("n"), 3).as("avg_bal"),
            // nullif on (n−1): a single-row group has sample-variance
            // denominator 0, which ANSI mode turns into a job-killing
            // DIVIDE_BY_ZERO; DuckDB's /0 is already NULL, so the guard
            // restores cross-engine parity (round-8 sweep, DegenerateGroupSpec)
            Exact.roundN((col("s2") - col("s1") * col("s1") / col("n")) /
              nullif(col("n") - 1, lit(0L)), 3).as("var_bal"),
            Exact.roundN(sqrt((col("s2") - col("s1") * col("s1") / col("n")) /
              nullif(col("n") - 1, lit(0L))), 3).as("std_bal"))
          .orderBy("c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, min_bal, max_bal,
              |  ${Exact.roundNSql("s1 / n", 3)} AS avg_bal,
              |  ${Exact.roundNSql("(s2 - s1 * s1 / n) / (n - 1)", 3)} AS var_bal,
              |  ${Exact.roundNSql("SQRT((s2 - s1 * s1 / n) / (n - 1))", 3)} AS std_bal
              |FROM (
              |  SELECT c_mktsegment, MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal,
              |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS s1,
              |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4)) * CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS s2,
              |    COUNT(*) AS n
              |  FROM customer GROUP BY c_mktsegment) t
              |ORDER BY c_mktsegment""".stripMargin)),

    // KNOWN ENGINE-DEFINED DIVERGENCE (rollup/cube/grouping_sets, round-9
    // degenerate parity sweep): over an EMPTY relation the SQL standard —
    // and DuckDB/Postgres — still emit the () grouping set's grand-total
    // row (count 0, NULL keys); Spark's Expand+Aggregate emits zero rows.
    // Matching the standard would take a second global aggregation pass
    // unioned in per query — a real cost at 100 TB for a zero-row corner —
    // so these three queries document Spark's semantics instead; the sweep
    // (tools/degen_preflight.sh) carries them as expected divergences on
    // the empty set only.
    QueryDef(
      "agg_rollup",
      (s, d) => {
        val c = Tables.customer(s, d)
        val n = broadcast(Tables.nation(s, d))
        c.join(n, c("c_nationkey") === n("n_nationkey"))
          .rollup(col("n_name"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n_cust"),
            grouping(col("n_name")).cast("long").as("g_nation"),
            grouping(col("c_mktsegment")).cast("long").as("g_seg"))
          .select(
            coalesce(col("n_name"), lit("ALL")).as("nation"),
            coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
            col("g_nation"), col("g_seg"), col("n_cust"))
          .orderBy("nation", "segment", "g_nation", "g_seg")
      },
      Some("""SELECT COALESCE(n_name, 'ALL') AS nation,
             |  COALESCE(c_mktsegment, 'ALL') AS segment,
             |  CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
             |  CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg,
             |  COUNT(*) AS n_cust
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY ROLLUP(n_name, c_mktsegment)
             |ORDER BY nation, segment, g_nation, g_seg""".stripMargin)),

    QueryDef(
      "agg_cube",
      (s, d) =>
        Tables.orders(s, d)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            Exact.sumMoney2(col("o_totalprice")).as("sum_price"),
            grouping(col("o_orderstatus")).cast("long").as("g_status"),
            grouping(col("o_orderpriority")).cast("long").as("g_prio"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("g_status"), col("g_prio"), col("n"), col("sum_price"))
          .orderBy("status", "priority", "g_status", "g_prio"),
      Some(s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
              |  COALESCE(o_orderpriority, 'ALL') AS priority,
              |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
              |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
              |  COUNT(*) AS n, ${Exact.sumMoney2Sql("o_totalprice")} AS sum_price
              |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
              |ORDER BY status, priority, g_status, g_prio""".stripMargin)),

    // Exercised through spark.sql to cover the SQL front door too.
    QueryDef(
      "agg_grouping_sets",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("graft_orders_gs")
        s.sql("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
                |  COALESCE(o_orderpriority, 'ALL') AS priority,
                |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
                |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
                |  COUNT(*) AS n
                |FROM graft_orders_gs
                |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
                |ORDER BY status, priority, g_status, g_prio""".stripMargin)
      },
      Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             |  COALESCE(o_orderpriority, 'ALL') AS priority,
             |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
             |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
             |  COUNT(*) AS n
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
             |ORDER BY status, priority, g_status, g_prio""".stripMargin)),

    // collect_list + sort_array is the operator under test; the output is
    // flattened to a joined string because the driver's pandas hash compare
    // cannot process array-typed columns (round-1 FAIL(harness)).
    QueryDef(
      "agg_collect_sorted",
      (s, d) =>
        Tables.customer(s, d)
          .groupBy(col("c_nationkey"))
          .agg(
            array_join(
              transform(sort_array(collect_list(col("c_custkey"))), k => k.cast("string")),
              ",").as("custkeys"))
          .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey,
             |  string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY c_custkey) AS custkeys
             |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // HLL sketch — approximate by construction, so no cross-engine oracle
    // (SURVEY B.4: smoke-only).
    QueryDef(
      "agg_approx_distinct",
      (s, d) =>
        Tables.lineitem(s, d)
          .agg(approx_count_distinct(col("l_partkey")).as("approx_parts")),
      None),

    // Boolean aggregates: every/any per group.
    QueryDef(
      "agg_bool",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            bool_and(col("l_quantity") > 0d).as("all_positive"),
            bool_or(col("l_discount") > 0.09d).as("any_big_discount"),
            bool_and(col("l_tax") < 0.01d).as("all_low_tax"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  bool_and(l_quantity > 0) AS all_positive,
             |  bool_or(l_discount > 0.09) AS any_big_discount,
             |  bool_and(l_tax < 0.01) AS all_low_tax
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Pearson correlation from exact decimal moments (same discipline as
    // agg_stats): corr = (n·Σxy − Σx·Σy) / √(n·Σx²−(Σx)²) / √(n·Σy²−(Σy)²).
    // Built-in corr() accumulates co-moments in float on both engines with
    // engine-specific ordering — the explicit decimal-sum formula is
    // order-insensitive and therefore oracle-stable.
    QueryDef(
      "agg_corr",
      (s, d) => {
        val x = col("l_quantity").cast("decimal(18,4)")
        val y = col("l_discount").cast("decimal(18,4)")
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).cast("double").as("n"),
            sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
            sum(x * x).cast("double").as("sxx"), sum(y * y).cast("double").as("syy"),
            sum(x * y).cast("double").as("sxy"))
          .select(
            col("l_returnflag"),
            // nullif: a zero-variance side makes the denominator 0 — ANSI
            // would kill the job; DuckDB's /0 is NULL (round-8 sweep).
            // greatest(_, 0): the closed-form variance of a near-constant
            // column can land ~-1e-18 from double cancellation (1·0.01 −
            // 0.1² < 0), where DuckDB SQRT throws — clamp on both engines,
            // and the nullif already maps the resulting 0 to NULL corr
            // (round-9 degenerate parity sweep)
            Exact.roundN(
              (col("n") * col("sxy") - col("sx") * col("sy")) /
                nullif(
                  sqrt(greatest(col("n") * col("sxx") - col("sx") * col("sx"), lit(0.0d))) *
                    sqrt(greatest(col("n") * col("syy") - col("sy") * col("sy"), lit(0.0d))),
                  lit(0.0d)), 4)
              .as("corr_qd"))
          .orderBy("l_returnflag")
      },
      Some(s"""SELECT l_returnflag,
              |  ${Exact.roundNSql(
                 "(n * sxy - sx * sy) / (SQRT(GREATEST(n * sxx - sx * sx, 0)) * SQRT(GREATEST(n * syy - sy * sy, 0)))", 4)} AS corr_qd
              |FROM (
              |  SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
              |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
              |    CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sy,
              |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
              |    CAST(SUM(CAST(l_discount AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS syy,
              |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sxy
              |  FROM lineitem GROUP BY l_returnflag) t
              |ORDER BY l_returnflag""".stripMargin)),

    // Ordered string aggregation (listagg): deterministic via sorting the
    // collected array before joining — collect_list order is
    // partition-dependent, sort_array normalizes it (D1 discipline).
    QueryDef(
      "agg_string_concat",
      (s, d) =>
        Tables.customer(s, d)
          .filter(col("c_custkey") < 50)
          .groupBy(col("c_mktsegment"))
          .agg(sort_array(collect_list(col("c_name"))).as("arr"))
          // listagg over zero non-NULL names is NULL (the standard, and
          // DuckDB's string_agg), not '' — collect_list skips NULLs so an
          // all-NULL group otherwise yields the empty string (round-9
          // degenerate parity sweep)
          .select(col("c_mktsegment"),
            when(size(col("arr")) > 0, array_join(col("arr"), ",")).as("names"))
          .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, string_agg(c_name, ',' ORDER BY c_name) AS names
             |FROM customer WHERE c_custkey < 50
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Exact interpolated percentiles. Spark `percentile` and DuckDB
    // `quantile_cont` both linearly interpolate at rank (n-1)*p over the
    // sorted values; rounding to 3dp absorbs the last-ulp arithmetic
    // difference of the interpolation step.
    // Tukey-fence outliers (the boxplot rule): values outside
    // [q1 − 1.5·IQR, q3 + 1.5·IQR] per event_type, quartiles rounded 4dp
    // BEFORE the fence arithmetic so the boundary compares are exact —
    // the complement of ts_anomaly_mad's median-based rule.
    QueryDef(
      "agg_tukey_outliers",
      (s, d) => {
        val e = Tables.events(s, d)
        // One array-percentile buffer, not two scalar percentile
        // aggregates (round 21, guide §1.2 step 2): each percentile(col,
        // p) call maintains its OWN per-group value buffer (all rows of
        // the group), so q1+q3 as separate aggregates doubled the
        // per-group state and the per-row buffer pushes. percentile(col,
        // array(...)) runs the identical exact-Percentile code path over
        // ONE buffer and emits both quantiles from the same sorted pass —
        // values bit-identical (pinned by the unchanged oracle).
        val q = e.groupBy(col("event_type"))
          .agg(expr("percentile(value, array(0.25, 0.75))").as("qs"))
          .select(col("event_type"),
            Exact.roundN(col("qs")(0), 4).as("q1"),
            Exact.roundN(col("qs")(1), 4).as("q3"))
        val fence = lit(1.5d) * (col("q3") - col("q1"))
        e.join(broadcast(q), "event_type")
          .groupBy(col("event_type"))
          .agg(
            sum(when(col("value") < col("q1") - fence ||
              col("value") > col("q3") + fence, 1).otherwise(0))
              .cast("long").as("n_outliers"),
            count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      Some(s"""WITH q AS (
              |  SELECT event_type,
              |    ${Exact.roundNSql("quantile_cont(value, 0.25)", 4)} AS q1,
              |    ${Exact.roundNSql("quantile_cont(value, 0.75)", 4)} AS q3
              |  FROM events GROUP BY 1)
              |SELECT e.event_type,
              |  CAST(SUM(CASE WHEN value < q1 - 1.5 * (q3 - q1)
              |    OR value > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
              |  COUNT(*) AS n
              |FROM events e JOIN q USING (event_type)
              |GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // Chi-square independence statistic for the event_type × day-of-week
    // contingency table: Σ(obs − exp)²/exp with exp = row·col/total from
    // exact integer marginals; per-cell terms rounded 8dp then summed in
    // decimal (order-independent), total 4dp — "is usage day-patterned?".
    QueryDef(
      "agg_chi_square",
      (s, d) => {
        // The obs matrix feeds FOUR consumers (o, row totals, column
        // totals, grand total). AQE stage reuse does NOT fire for this
        // agg-over-agg-with-join-back shape (measured round 11: zero
        // reuse markers even on a plain-column repro — unlike the
        // join-fed shared subtrees in behavior_lift/sim_ann_recall which
        // do reuse), so the un-materialized plan re-ran the events SCAN
        // once per consumer — 4 full scans at 100 TB. Materializing the
        // tiny |event_type|×7 matrix once (same localCheckpoint/
        // reliable-checkpoint helper as Dedup.tokenPairs) makes it one
        // scan + three re-aggregations of a handful of rows. Pinned by
        // AqeReuseSpec's single-scan assertion.
        val o = graft.llm.Dedup.materialize(Tables.events(s, d)
          .groupBy(col("event_type"), (dayofweek(col("ts")) + 0).as("dow"))
          .agg(count(lit(1)).cast("double").as("obs")))
        val rt = o.groupBy(col("event_type")).agg(sum(col("obs")).as("r"))
        val ct = o.groupBy(col("dow")).agg(sum(col("obs")).as("c"))
        val t = o.agg(sum(col("obs")).as("n"))
        val e = col("r") * col("c") / col("n")
        o.join(rt, "event_type").join(broadcast(ct), "dow").crossJoin(broadcast(t))
          .withColumn("term",
            Exact.roundN((col("obs") - e) * (col("obs") - e) / e, 8))
          .agg(
            Exact.roundN(sum(col("term").cast("decimal(28,10)")).cast("double"), 4)
              .as("chi2"),
            count(lit(1)).as("n_cells"))
      },
      Some(s"""WITH o AS (
              |  SELECT event_type, dayofweek(ts) + 1 AS dow, CAST(COUNT(*) AS DOUBLE) AS obs
              |  FROM events GROUP BY 1, 2),
              |rt AS (SELECT event_type, SUM(obs) AS r FROM o GROUP BY 1),
              |ct AS (SELECT dow, SUM(obs) AS c FROM o GROUP BY 1),
              |t AS (SELECT SUM(obs) AS n FROM o)
              |SELECT ${Exact.roundNSql(
                 "CAST(SUM(CAST(" +
                   Exact.roundNSql(
                     "(obs - r * c / n) * (obs - r * c / n) / (r * c / n)", 8) +
                   " AS DECIMAL(28,10))) AS DOUBLE)", 4)} AS chi2,
              |  CAST(COUNT(*) AS BIGINT) AS n_cells
              |FROM o JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN t""".stripMargin)),

    // Trimmed mean (robust statistic): drop the bottom and top 10% of each
    // priority's values by total-ordered rank, exact decimal mean of the
    // middle 80% — the outlier-resistant center every monitoring pipeline
    // prefers over the raw mean.
    //
    // SCALE REWRITE (round 17, VERDICT r16 #1 — the round's one `weak`
    // grade): the original row_number window partitioned on the CLOSED
    // 5-value o_orderpriority key, exchanging the whole table into ≤5 sort
    // tasks whose buffers grew linearly (measured 6.4–6.7× step per 8×
    // data, 168 MB per-task at ×64 — a single-task-funnel scale-killer at
    // 100 TB). This formulation never ranks a raw row. The trim is pure
    // arithmetic once the two boundary ORDER STATISTICS are known, because
    // which of several TIED boundary rows get dropped can never change the
    // dropped SUM — only the boundary value t and how many rows sit
    // strictly below it matter:
    //   bottom_k_sum = Σ(price < t) + (k − #{price < t})·t,  t = k-th smallest
    // (and symmetrically for the top cut), so
    //   trimmed_sum  = total − bottom_k_sum − top_k_sum    — all exact decimal.
    // The boundaries come from a percentile-fence + residual-band walk (the
    // agg_tukey_outliers shape, made exact):
    //   pass 1 (map-side): per priority — n, #nulls, exact decimal total,
    //     and a 1001-point percentile_approx grid (rank error ≤ n/10⁴,
    //     grid spacing n/10³ — the fence pair at floor/ceil(q·1000)∓1
    //     therefore PROVABLY brackets the target rank; a violated bracket
    //     yields NULL, failing the oracle loudly, never silently wrong);
    //   pass 2 (map-side): orders ⋈ broadcast(fences) — exact counts/sums
    //     strictly below each lower fence, plus per-DISTINCT-value counts
    //     inside the two fence bands (a ≤0.4%-rank-wide value interval, so
    //     its distinct-value count is bounded by value granularity ×
    //     interval width — it does NOT grow with row count);
    //   walk: aggregate() HOF over each band's sorted distinct values finds
    //     the boundary value, its strict-below count/sum, and its
    //     multiplicity — per-priority scalars, no window, no driver round
    //     trip.
    // Nulls rank FIRST (Spark window ASC default, matching the old body):
    // the bottom cut absorbs min(k, #nulls) nulls before touching values.
    // Every heavy operator is a map-side-partial aggregate over a
    // column-pruned scan; parallelism scales with input partitions, not
    // with the 5-value key. Ratchet: PlanSpec "agg_trimmed_mean finds its
    // trim cuts without a raw-row rank window"; differential fuzz vs the
    // old window formulation: TrimmedMeanFuzzSpec; trim-cut seams:
    // RankFuzzSpec.
    QueryDef(
      "agg_trimmed_mean",
      (s, d) => {
        val price = col("o_totalprice")
        val zero38 = lit(java.math.BigDecimal.ZERO).cast("decimal(38,4)")
        val o = Tables.orders(s, d).select(col("o_orderpriority"), price)

        // Pass 1: per-priority totals + fence grid (one map-side pass).
        val grid = lit((0 to 1000).map(_ / 1000.0).toArray)
        val base = o.groupBy(col("o_orderpriority").as("pr"))
          .agg(
            count(lit(1)).as("n"),
            sum(when(price.isNull, 1L).otherwise(0L)).as("n_null"),
            Exact.sumDec(price).as("total"),
            percentile_approx(price, grid, lit(10000)).as("fences"))
          // mb/mt replicate the old DOUBLE-division cuts bit-for-bit
          // (RankFuzzSpec pins the n∈{9,10,11} seams): rn > n/10.0 drops
          // floor(n/10) bottom rows; rn <= n - n/10.0 drops ceil(n/10) top.
          .withColumn("mb", floor(col("n") / lit(10)).cast("long"))
          .withColumn("mt",
            col("n") - floor(col("n") - col("n") / lit(10)).cast("long"))
          .withColumn("nn", col("n") - col("n_null"))
          // Nulls-first: the bottom cut spends min(mb, #nulls) of its
          // budget on nulls (sum 0); the top cut can only reach values.
          .withColumn("kb", greatest(lit(0L), col("mb") - col("n_null")))
          .withColumn("kt", least(col("mt"), col("nn")))

        // Fence pair bracketing rank j over nn non-null values: grid index
        // floor/ceil(1000·j/nn) ∓ 1, clamped to [0,1000]. Sketch rank
        // error (≤ nn/10⁴) < one grid cell (nn/10³), so
        // #{v < lowFence} < j ≤ #{v ≤ highFence} always holds.
        def fenceAt(j: Column): (Column, Column) = {
          val q = j.cast("double") / col("nn")
          val lo = (greatest(lit(0L), floor(q * 1000) - 1) + 1).cast("int")
          val hi = (least(lit(1000L), ceil(q * 1000) + 1) + 1).cast("int")
          (element_at(col("fences"), lo), element_at(col("fences"), hi))
        }
        val withFences = {
          val (f1, f2) = fenceAt(col("kb"))
          val (g1, g2) = fenceAt(col("nn") - col("kt") + 1)
          base
            .withColumn("f1", when(col("kb") >= 1, f1))
            .withColumn("f2", when(col("kb") >= 1, f2))
            .withColumn("g1", when(col("kt") >= 1, g1))
            .withColumn("g2", when(col("kt") >= 1, g2))
        }

        // Pass 2: exact strict-below-fence counts/sums + band histogram
        // (one map-side pass; non-band rows collapse into one NULL-bp cell
        // per priority, so the shuffle carries only distinct band values).
        // Every per-priority scalar from pass 1 rides along as an EXTRA
        // GROUPING KEY — each is functionally determined by pr, so the
        // groups are unchanged — which lets the final arithmetic run
        // directly on this frame with no join back to `base`: orders is
        // scanned exactly twice, the two-pass-selection minimum (the
        // fences must exist before a row can be band-classified; see the
        // measured ScanBudgetSpec exception entry).
        val meta = Seq("n", "n_null", "total", "nn", "mb", "mt", "kb", "kt",
          "f1", "f2", "g1", "g2")
        val bands = o
          .join(broadcast(withFences.drop("fences")),
            col("o_orderpriority") <=> col("pr"))
          .withColumn("bp", when(
            (price >= col("f1") && price <= col("f2")) ||
              (price >= col("g1") && price <= col("g2")), price))
          .groupBy(col("pr") +: meta.map(col) :+ col("bp"): _*)
          .agg(
            count(price).as("c"),
            sum(when(price < col("f1"), 1L).otherwise(0L)).as("c1p"),
            Exact.sumDec(when(price < col("f1"), price)).as("s1p"),
            sum(when(price < col("g1"), 1L).otherwise(0L)).as("c1hp"),
            Exact.sumDec(when(price < col("g1"), price)).as("s1hp"))
          .groupBy(col("pr") +: meta.map(col): _*)
          .agg(
            sum(col("c1p")).as("c1"),
            coalesce(sum(col("s1p")), zero38).as("s1"),
            sum(col("c1hp")).as("c1h"),
            coalesce(sum(col("s1hp")), zero38).as("s1h"),
            sort_array(collect_list(when(col("bp").isNotNull,
              struct(col("bp").as("p"), col("c").as("c"))))).as("arr"))

        // Exact selection walk per band ([[selectionWalk]]): each walk is
        // bounded to ITS band (ADVICE r17 — f2/g2 ride along in `meta`),
        // so a violated bracket is structurally guaranteed to yield NULL.
        val r = bands
          .withColumn("lo",
            selectionWalk(col("arr"), col("f1"), col("f2"), col("kb") - col("c1")))
          .withColumn("hi",
            selectionWalk(col("arr"), col("g1"), col("g2"),
              col("nn") - col("kt") + 1 - col("c1h")))
        val t = r("lo")("t")
        val bottomSum = r("s1") + r("lo")("sb") +
          (r("kb") - r("c1") - r("lo")("cb")).cast("decimal(20,0)") *
            t.cast("decimal(18,4)")
        val u = r("hi")("t")
        val cntLeU = r("c1h") + r("hi")("cb") + r("hi")("mu")
        val sumLeU = r("s1h") + r("hi")("sb") +
          r("hi")("mu").cast("decimal(20,0)") * u.cast("decimal(18,4)")
        val topSum = (r("total") - sumLeU) +
          (r("kt") - (r("nn") - cntLeU)).cast("decimal(20,0)") *
            u.cast("decimal(18,4)")
        val trimmedSum = r("total") -
          when(col("kb") >= 1, bottomSum).otherwise(zero38) -
          when(col("kt") >= 1, topSum).otherwise(zero38)
        r.withColumn("n_kept", col("n") - col("mb") - col("mt"))
          .filter(col("n_kept") > 0)
          // SUM over kept rows is NULL when every kept price is NULL (all
          // non-nulls fell in the cuts — the nearly-all-null group); the
          // subtraction identity would yield decimal 0 there, so gate on
          // the kept NON-NULL count, matching the old window body.
          .select(col("pr").as("o_orderpriority"), col("n_kept"),
            when(col("nn") - col("kb") - col("kt") > 0,
              Exact.roundN(trimmedSum.cast("double") / col("n_kept"), 4))
              .as("trimmed_mean"))
          .orderBy("o_orderpriority")
      },
      Some(s"""WITH r AS (
              |  SELECT o_orderpriority, o_totalprice,
              |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
              |      ORDER BY o_totalprice, o_orderkey) AS rn,
              |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
              |  FROM orders)
              |SELECT o_orderpriority, COUNT(*) AS n_kept,
              |  ${Exact.roundNSql(
                 "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)", 4)} AS trimmed_mean
              |FROM r WHERE rn > n / 10 AND rn <= n - n / 10
              |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Benford first-digit audit: the leading-digit distribution of order
    // values — the fraud/synthetic-data smoke test. The digit comes from
    // the INTEGER part's string form (floor first: CAST double→int rounds
    // in DuckDB but truncates in Spark; integer→string is identical).
    QueryDef(
      "agg_benford",
      (s, d) =>
        Tables.orders(s, d)
          // abs() before floor (round 8): a negative value floors to
          // "-4" whose first char "-" fails the ANSI string→long cast —
          // one refund row would kill the job. Benford is a magnitude
          // law, so the declared digit is that of |value| on both
          // engines (values < 1 still yield the digit-0 bucket).
          .withColumn("digit",
            substring(floor(abs(col("o_totalprice"))).cast("long").cast("string"), 1, 1)
              .cast("long"))
          .groupBy(col("digit"))
          .agg(count(lit(1)).as("n"))
          .withColumn("share",
            Exact.roundN(col("n").cast("double") /
              sum(col("n")).over(Window.partitionBy()).cast("double"), 4))
          .orderBy("digit"),
      Some(s"""SELECT digit, n, ${Exact.roundNSql(
                 "CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE)", 4)} AS share
              |FROM (
              |  SELECT CAST(substring(CAST(CAST(FLOOR(ABS(o_totalprice)) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
              |    COUNT(*) AS n
              |  FROM orders GROUP BY 1) t
              |ORDER BY digit""".stripMargin)),

    // Bitmap distinct counting (the roaring-bitmap pattern ClickHouse/Druid
    // use for COUNT DISTINCT at scale): bucket ids into 32-bit words,
    // bit_or the masks per (group, word) — a map-side-combinable integer
    // aggregate — then popcount-sum the words. Exact distinct counts with
    // no per-group hash set; shuffle carries one long per populated word.
    QueryDef(
      "agg_bitmap_distinct",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(col("event_type"), expr("user_id DIV 32").as("word"))
          .agg(expr("bit_or(shiftleft(1L, CAST(user_id % 32 AS INT)))").as("mask"))
          .groupBy(col("event_type"))
          .agg(sum(expr("bit_count(mask)")).cast("long").as("n_distinct_users"))
          .orderBy("event_type"),
      Some("""SELECT event_type, CAST(SUM(bit_count(mask)) AS BIGINT) AS n_distinct_users
             |FROM (
             |  SELECT event_type, user_id // 32 AS word,
             |    bit_or(1::BIGINT << CAST(user_id % 32 AS INT)) AS mask
             |  FROM events GROUP BY 1, 2) t
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Top-N concentration: the top-10 orders' share of each priority's
    // total revenue — "how head-heavy is this distribution" (the row-level
    // complement of agg_gini). Rank window + one conditional decimal agg.
    QueryDef(
      "agg_topn_share",
      // SCALE REWRITE (round 17, the closed-key ordered-window sweep):
      // the old top-10 rank window partitioned on the 5-value priority
      // key sorted the WHOLE table on ≤5 tasks to keep 50 rows. Two-phase
      // top-k instead (the profile-top-k superset argument: a row beaten
      // by 10 rows in its own input partition is beaten by 10 rows
      // globally): phase 1 ranks within (priority, input-partition) — a
      // parallel window — and phase 2 merges the ≤10·partitions candidate
      // VALUES inside an aggregate with a sort_array/slice/fold HOF, no
      // raw-row window anywhere. Candidate prices suffice (no keys): the
      // orderkey tie-break can only swap equal values in or out of the
      // top-10, which never changes the SUM; dropped NULL prices never
      // displace a value (desc sort puts them last on both phases).
      // top10_rev is NULL exactly when the old SUM was: n ≤ 10 with every
      // price NULL (the ELSE-0 branch otherwise feeds the sum).
      (s, d) => {
        val zero38 = lit(java.math.BigDecimal.ZERO).cast("decimal(38,4)")
        val wLoc = Window.partitionBy(col("o_orderpriority"), col("tpid"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val locals = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
          .withColumn("tpid", spark_partition_id())
          .withColumn("lrn", row_number().over(wLoc))
          .groupBy(col("o_orderpriority"), col("tpid"))
          .agg(
            count(lit(1)).as("lcnt"),
            Exact.sumDec(col("o_totalprice")).as("ltot"),
            collect_list(when(col("lrn") <= 10,
              col("o_totalprice").cast("decimal(18,4)"))).as("lcand"))
        val merged = locals.groupBy(col("o_orderpriority"))
          .agg(
            sum(col("lcnt")).as("n"),
            sum(col("ltot")).as("tot"),
            flatten(collect_list(col("lcand"))).as("cand"))
        val topSum = aggregate(
          slice(sort_array(col("cand"), asc = false), 1, 10),
          zero38, (acc, x) => (acc + x).cast("decimal(38,4)"))
        val top10 = when(size(col("cand")) > 0 || col("n") > 10, topSum)
        merged.select(col("o_orderpriority"),
            round(top10, 2).cast("double").as("top10_rev"),
            // nullif: an all-zero-price group has total 0 — ANSI kills
            // the job; DuckDB's /0 is NULL (round-8 DegenerateSweepSpec)
            Exact.roundN(top10.cast("double") /
              nullif(col("tot").cast("double"), lit(0.0d)), 4)
              .as("top10_share"))
          .orderBy("o_orderpriority")
      },
      Some(s"""WITH r AS (
              |  SELECT o_orderpriority, o_totalprice,
              |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
              |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
              |  FROM orders)
              |SELECT o_orderpriority,
              |  CAST(ROUND(SUM(CASE WHEN rn <= 10 THEN CAST(o_totalprice AS DECIMAL(18,4))
              |    ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS top10_rev,
              |  ${Exact.roundNSql(
                 "CAST(SUM(CASE WHEN rn <= 10 THEN CAST(o_totalprice AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) " +
                   "/ CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)", 4)} AS top10_share
              |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // pandas value_counts(normalize=True): category frequencies + 4dp
    // shares — the share denominator comes from an unpartitioned window
    // over the 5-row aggregate, not the raw table.
    QueryDef(
      "agg_value_counts",
      (s, d) => {
        val counts = Tables.events(s, d)
          .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        counts.select(col("event_type"), col("n"),
            Exact.roundN(col("n").cast("double") /
              sum(col("n")).over(Window.partitionBy()).cast("double"), 4).as("share"))
          .orderBy(col("n").desc, col("event_type"))
      },
      Some(s"""SELECT event_type, n,
              |  ${Exact.roundNSql(
                 "CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE)", 4)} AS share
              |FROM (SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type) t
              |ORDER BY n DESC, event_type""".stripMargin)),

    // Gini coefficient of order value per priority (inequality measure):
    // G = 2·Σ(rank·x) / (n·Σx) − (n+1)/n with ranks total-ordered by
    // (value, key).
    //
    // SCALE REWRITE (round 17, the closed-key ordered-window sweep): the
    // rank window on the closed 5-value key sorted the whole table on ≤5
    // tasks. But Σ(rank·x) over a run of TIED values is a closed form of
    // the run alone — ranks cnt_lt+1 … cnt_lt+m sum to m·cnt_lt +
    // m(m+1)/2 regardless of which tied row gets which rank (the orderkey
    // tie-break is provably irrelevant) — so the whole statistic derives
    // from the per-DISTINCT-value histogram: one map-side pass for
    // (priority, value, m), a cumulative window over distinct values
    // (bounded by value granularity, constant in row count, nulls first
    // like the old rank order on BOTH engines — NULLS FIRST is now
    // explicit in the oracle, where the old formulation silently relied
    // on DuckDB's nulls-last never being exercised), then a map-side
    // moment aggregate. The per-value weight m·cnt_lt + m(m+1)/2 is
    // computed in DOUBLE with the identical expression on both engines
    // (products exact to 2^53; the old per-row rn·x was double anyway),
    // and the oracle SQL is rewritten to the same histogram form — the
    // two engines still compute it independently.
    QueryDef(
      "agg_gini",
      (s, d) => {
        val hist = Tables.orders(s, d)
          .select(col("o_orderpriority"), col("o_totalprice"))
          .groupBy(col("o_orderpriority"), col("o_totalprice"))
          .agg(count(lit(1)).as("m"))
        val wc = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val md = col("m").cast("double")
        val weight = md * col("cnt_lt").cast("double") + md * (md + lit(1.0d)) / lit(2.0d)
        hist
          .withColumn("cnt_lt", coalesce(sum(col("m")).over(wc), lit(0L)))
          .groupBy(col("o_orderpriority"))
          .agg(
            sum(col("m")).cast("double").as("n"),
            sum(col("m").cast("decimal(20,0)") *
              col("o_totalprice").cast("decimal(18,4)")).cast("double").as("sx"),
            sum((col("o_totalprice") * weight).cast("decimal(28,8)"))
              .cast("double").as("swx"))
          .select(col("o_orderpriority"),
            // nullif: an all-zero-value group has sx = 0 — ANSI kills the
            // job; DuckDB's /0 is NULL (round-8 sweep)
            Exact.roundN(
              lit(2.0d) * col("swx") / nullif(col("n") * col("sx"), lit(0.0d)) -
                (col("n") + 1.0d) / col("n"), 4).as("gini"))
          .orderBy("o_orderpriority")
      },
      Some(s"""WITH h AS (
              |  SELECT o_orderpriority, o_totalprice, COUNT(*) AS m
              |  FROM orders GROUP BY 1, 2),
              |c AS (
              |  SELECT o_orderpriority, o_totalprice, m,
              |    COALESCE(SUM(m) OVER (PARTITION BY o_orderpriority
              |      ORDER BY o_totalprice ASC NULLS FIRST
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnt_lt
              |  FROM h),
              |g AS (
              |  SELECT o_orderpriority, CAST(SUM(m) AS DOUBLE) AS n,
              |    CAST(SUM(CAST(m AS DECIMAL(20,0)) * CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sx,
              |    CAST(SUM(CAST(o_totalprice * (CAST(m AS DOUBLE) * CAST(cnt_lt AS DOUBLE)
              |      + CAST(m AS DOUBLE) * (CAST(m AS DOUBLE) + 1) / 2) AS DECIMAL(28,8))) AS DOUBLE) AS swx
              |  FROM c GROUP BY 1)
              |SELECT o_orderpriority,
              |  ${Exact.roundNSql("(2.0 * swx) / (n * sx) - (n + 1.0) / n", 4)} AS gini
              |FROM g ORDER BY o_orderpriority""".stripMargin)),

    // Column profiling (the data-quality summary every ingest pipeline
    // runs): null/NaN-aware counts, distinct cardinality, extrema of a
    // masked measure per event_type — one hash agg, all map-side partial
    // except the exact distinct.
    QueryDef(
      "agg_profile_nulls",
      (s, d) =>
        Tables.events(s, d)
          .withColumn("v_masked", when(col("value") >= 100d, col("value")))
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n_rows"),
            sum(when(col("v_masked").isNull, 1).otherwise(0)).cast("long")
              .as("n_null"),
            countDistinct(col("v_masked")).as("n_distinct"),
            min(col("v_masked")).as("mn"),
            max(col("v_masked")).as("mx"))
          .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n_rows,
             |  CAST(SUM(CASE WHEN v_masked IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |  COUNT(DISTINCT v_masked) AS n_distinct,
             |  MIN(v_masked) AS mn, MAX(v_masked) AS mx
             |FROM (SELECT event_type, CASE WHEN value >= 100 THEN value END AS v_masked
             |      FROM events) t
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Simple OLS per returnflag: slope/intercept/r² of extendedprice on
    // quantity from exact decimal power sums (the regr_slope/regr_r2
    // family — Spark's built-ins accumulate doubles in partition order, so
    // the closed form over order-insensitive decimal sums is the
    // oracle-stable formulation, same discipline as agg_corr/agg_skew).
    QueryDef(
      "agg_regression",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).cast("double").as("n"),
            Exact.sumDec(col("l_quantity")).cast("double").as("sx"),
            Exact.sumDec(col("l_extendedprice")).cast("double").as("sy"),
            sum((col("l_quantity") * col("l_quantity")).cast("decimal(28,8)"))
              .cast("double").as("sxx"),
            sum((col("l_extendedprice") * col("l_extendedprice")).cast("decimal(38,8)"))
              .cast("double").as("syy"),
            sum((col("l_quantity") * col("l_extendedprice")).cast("decimal(28,8)"))
              .cast("double").as("sxy"))
          .select(col("l_returnflag"),
            // nullif on every S_xx-based denominator: an all-equal-x group
            // zeroes them — ANSI kills the job; DuckDB's /0 is NULL
            // (round-8 sweep, DegenerateGroupSpec)
            Exact.roundN((col("n") * col("sxy") - col("sx") * col("sy")) /
              nullif(col("n") * col("sxx") - col("sx") * col("sx"), lit(0.0d)), 4)
              .as("slope"),
            Exact.roundN((col("sy") - col("sx") *
              ((col("n") * col("sxy") - col("sx") * col("sy")) /
                nullif(col("n") * col("sxx") - col("sx") * col("sx"), lit(0.0d)))) /
              col("n"), 4).as("intercept"),
            Exact.roundN(
              ((col("n") * col("sxy") - col("sx") * col("sy")) *
                (col("n") * col("sxy") - col("sx") * col("sy"))) /
                nullif((col("n") * col("sxx") - col("sx") * col("sx")) *
                  (col("n") * col("syy") - col("sy") * col("sy")), lit(0.0d)), 4).as("r2"))
          .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag,
              |  ${Exact.roundNSql("(n * sxy - sx * sy) / (n * sxx - sx * sx)", 4)} AS slope,
              |  ${Exact.roundNSql(
                 "(sy - sx * ((n * sxy - sx * sy) / (n * sxx - sx * sx))) / n", 4)} AS intercept,
              |  ${Exact.roundNSql(
                 "((n * sxy - sx * sy) * (n * sxy - sx * sy)) / ((n * sxx - sx * sx) * (n * syy - sy * sy))",
                 4)} AS r2
              |FROM (
              |  SELECT l_returnflag,
              |    CAST(COUNT(*) AS DOUBLE) AS n,
              |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
              |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
              |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,8))) AS DOUBLE) AS sxx,
              |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS syy,
              |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) AS sxy
              |  FROM lineitem GROUP BY l_returnflag) m
              |ORDER BY l_returnflag""".stripMargin)),

    // Spearman rank correlation per returnflag: rank both measures with
    // min-rank (SQL rank()) convention — integer ranks make every moment
    // sum exact in decimal, so the closed-form Pearson-on-ranks is
    // bit-deterministic cross-engine (the scipy average-rank convention
    // would need fractional ranks; min-rank is declared and mirrored in the
    // oracle). Two ordered windows + one hash agg; ranks never leave their
    // partition.
    QueryDef(
      "agg_spearman",
      // SCALE REWRITE (round 17, the closed-key ordered-window sweep):
      // min-rank is a pure function of the VALUE — rank(v) = #{< v} + 1 —
      // so both rank maps derive from per-distinct-value histograms
      // instead of ranking every raw row through two windows on the
      // closed 3-value key. The old shape sorted the whole table TWICE on
      // ≤3 tasks (294 MB per-task sort at ×8) and then DIED at ×64 with
      // ARITHMETIC_OVERFLOW: sum(rx·rx) over ranks up to 12.8M exceeds
      // Long (measured, BASELINE r17) — a correctness-at-scale bug, not
      // just a funnel. One map-side pass aggregates (flag, qty, disc)
      // cell counts (bounded by value granularity — ~50 quantities × ~11
      // discounts — constant in row count); the moments are the identical
      // integers computed in DECIMAL (the overflow fix; DuckDB's HUGEINT
      // sums never overflowed, so equal integers → identical doubles and
      // the oracle is unchanged).
      // CONSTANT SHAVE (round 18, VERDICT r17 #1): the rank maps are now
      // RANGE-frame cumulative windows DIRECTLY over the cell stream —
      //   rank(v) = #{≤ v} − #{= v} + 1
      // with #{≤ v} a peers-inclusive range frame and #{= v} an
      // unordered window over (flag, value) — instead of re-aggregating
      // per measure and broadcast-joining back. One repartition(flag) of
      // the tiny cell stream satisfies all four windows AND the final
      // moment aggregate: 9 shuffles + 2 broadcasts → 3 shuffles, 0
      // joins (measured sf0.1 cold 1.32 s → 1.13 s; ExchangeBudgetSpec
      // pins the counts). Nulls-first survives: a null value's range
      // frame is exactly its null peer group, so rank(null) = 1.
      (s, d) => {
        val cells = Tables.lineitem(s, d)
          .select(col("l_returnflag"), col("l_quantity"), col("l_discount"))
          .groupBy(col("l_returnflag"), col("l_quantity"), col("l_discount"))
          .agg(count(lit(1)).as("c"))
          .repartition(col("l_returnflag"))
        def rankOf(v: Column): Column = {
          val le = sum(col("c")).over(Window.partitionBy(col("l_returnflag"))
            .orderBy(v).rangeBetween(Window.unboundedPreceding, Window.currentRow))
          val eq = sum(col("c")).over(Window.partitionBy(col("l_returnflag"), v))
          le - eq + lit(1L)
        }
        def dec(c: Column) = c.cast("decimal(38,0)")
        cells
          .withColumn("rx", rankOf(col("l_quantity")))
          .withColumn("ry", rankOf(col("l_discount")))
          .groupBy(col("l_returnflag"))
          .agg(
            sum(col("c")).cast("double").as("n"),
            sum(dec(col("c")) * dec(col("rx"))).cast("double").as("sx"),
            sum(dec(col("c")) * dec(col("ry"))).cast("double").as("sy"),
            sum(dec(col("c")) * dec(col("rx")) * dec(col("rx"))).cast("double").as("sxx"),
            sum(dec(col("c")) * dec(col("ry")) * dec(col("ry"))).cast("double").as("syy"),
            sum(dec(col("c")) * dec(col("rx")) * dec(col("ry"))).cast("double").as("sxy"))
          .select(col("l_returnflag"),
            // nullif: all-tied ranks on either side zero the denominator —
            // ANSI kills the job; DuckDB's /0 is NULL (round-8 sweep)
            Exact.roundN(
              (col("n") * col("sxy") - col("sx") * col("sy")) /
                nullif(sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
                  (col("n") * col("syy") - col("sy") * col("sy"))), lit(0.0d)), 4)
              .as("spearman"))
          .orderBy("l_returnflag")
      },
      Some(s"""SELECT l_returnflag,
              |  ${Exact.roundNSql(
                 "(n * sxy - sx * sy) / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy))", 4)} AS spearman
              |FROM (
              |  SELECT l_returnflag,
              |    CAST(COUNT(*) AS DOUBLE) AS n,
              |    CAST(SUM(rx) AS DOUBLE) AS sx, CAST(SUM(ry) AS DOUBLE) AS sy,
              |    CAST(SUM(rx * rx) AS DOUBLE) AS sxx, CAST(SUM(ry * ry) AS DOUBLE) AS syy,
              |    CAST(SUM(rx * ry) AS DOUBLE) AS sxy
              |  FROM (
              |    SELECT l_returnflag,
              |      RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rx,
              |      RANK() OVER (PARTITION BY l_returnflag ORDER BY l_discount) AS ry
              |    FROM lineitem) r
              |  GROUP BY l_returnflag) m
              |ORDER BY l_returnflag""".stripMargin)),

    // pandas DataFrame.describe() as one grouped aggregate: count, mean,
    // quartiles, extrema per priority — one shuffle, all map-side-partial
    // except the exact percentiles (which are the declared semantics; the
    // approx_percentile sketch is the 100 TB relaxation).
    QueryDef(
      "agg_describe",
      (s, d) =>
        // One array-percentile buffer for the three quartiles (round 21):
        // three scalar percentile(col, p) aggregates each held their own
        // full per-group value buffer — 3× the state and 3× the per-row
        // pushes for the same sorted pass. Same exact-Percentile code
        // path, values bit-identical (oracle unchanged). At sf0.1 the
        // wall moves within box noise (solo medians ~1.2 → ~1.1 s) —
        // the win is the 3× smaller per-group aggregation state, which
        // is what matters when a group is billions of rows.
        Tables.orders(s, d)
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n"),
            Exact.roundN(Exact.sumDec(col("o_totalprice")).cast("double") / count(lit(1)), 4)
              .as("mean_price"),
            expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))").as("qs"),
            min(col("o_totalprice")).as("mn"),
            max(col("o_totalprice")).as("mx"))
          .select(col("o_orderpriority"), col("n"), col("mean_price"),
            Exact.roundN(col("qs")(0), 4).as("q1"),
            Exact.roundN(col("qs")(1), 4).as("med"),
            Exact.roundN(col("qs")(2), 4).as("q3"),
            col("mn"), col("mx"))
          .orderBy("o_orderpriority"),
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n,
              |  ${Exact.roundNSql(
                 "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)", 4)} AS mean_price,
              |  ${Exact.roundNSql("quantile_cont(o_totalprice, 0.25)", 4)} AS q1,
              |  ${Exact.roundNSql("quantile_cont(o_totalprice, 0.5)", 4)} AS med,
              |  ${Exact.roundNSql("quantile_cont(o_totalprice, 0.75)", 4)} AS q3,
              |  MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx
              |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    QueryDef(
      "agg_percentile",
      (s, d) =>
        // One array-percentile buffer, not two (round 21 — see
        // agg_describe): identical exact-Percentile path, half the
        // per-group state.
        Tables.customer(s, d)
          .groupBy(col("c_mktsegment"))
          .agg(expr("percentile(c_acctbal, array(0.5, 0.9))").as("qs"))
          .select(col("c_mktsegment"),
            Exact.roundN(col("qs")(0), 3).as("med_bal"),
            Exact.roundN(col("qs")(1), 3).as("p90_bal"))
          .orderBy("c_mktsegment"),
      Some(s"""SELECT c_mktsegment,
              |  ${Exact.roundNSql("quantile_cont(c_acctbal, 0.5)", 3)} AS med_bal,
              |  ${Exact.roundNSql("quantile_cont(c_acctbal, 0.9)", 3)} AS p90_bal
              |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Exact DISCRETE percentiles (the value AT rank ⌈p·n⌉, no
    // interpolation) via the portable row_number formulation — engines
    // disagree on quantile_disc edge conventions, the rank pick doesn't.
    QueryDef(
      "agg_percentile_disc",
      // SCALE REWRITE (round 17, closed-key sweep second wave): the old
      // body ranked every raw customer row through two windows on the
      // closed 5-value segment key. The discrete percentile is a
      // SELECTION — only the rows at ranks ceil(n·q) matter — so the
      // TwoPhase bucket decomposition gets a stronger form than the rank
      // family's: per-(segment, bucket) counts locate the ONE bucket
      // whose exclusive-offset range covers each target rank (the bucket
      // histogram IS a coarse rank index), and only those ≤2 buckets per
      // segment are ranked row-by-row — a ~1/64 residual sort, in
      // parallel. Selected values are deterministic even on full-dup
      // ties: row_number may permute equal (acctbal, custkey) rows, but
      // every permutation puts the same VALUE at the target rank.
      (s, d) => {
        val c = Tables.customer(s, d)
          .select(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"))
        val stats = c.groupBy(col("c_mktsegment").as("sg"))
          .agg(min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
        def bucketize(df: org.apache.spark.sql.DataFrame) =
          df.join(broadcast(stats), col("c_mktsegment") <=> col("sg"))
            .withColumn("bkt",
              TwoPhase.bucket(col("c_acctbal"), col("lo"), col("hi")))
        val wOff = Window.partitionBy(col("sg")).orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val counts = bucketize(c.select(col("c_mktsegment"), col("c_acctbal")))
          .groupBy(col("sg"), col("bkt")).agg(count(lit(1)).as("cnt"))
          .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
          .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("sg"))))
        val k1 = ceil(col("n") * 0.5d)
        val k2 = ceil(col("n") * 0.9d)
        val covers = (k: org.apache.spark.sql.Column) =>
          col("off") < k && k <= col("off") + col("cnt")
        val targets = counts.filter(covers(k1) || covers(k2))
          .select(col("sg").as("og"), col("bkt").as("obkt"),
            col("off"), col("n"))
        val wIn = Window.partitionBy(col("c_mktsegment"), col("bkt"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        bucketize(c)
          .join(broadcast(targets),
            col("c_mktsegment") <=> col("og") && col("bkt") === col("obkt"))
          .withColumn("rk", col("off") + row_number().over(wIn))
          .groupBy(col("c_mktsegment"))
          .agg(
            max(when(col("rk") === ceil(col("n") * 0.5d), col("c_acctbal"))).as("med_disc"),
            max(when(col("rk") === ceil(col("n") * 0.9d), col("c_acctbal"))).as("p90_disc"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
             |  MAX(CASE WHEN rn = CEIL(n * 0.5) THEN c_acctbal END) AS med_disc,
             |  MAX(CASE WHEN rn = CEIL(n * 0.9) THEN c_acctbal END) AS p90_disc
             |FROM (
             |  SELECT c_mktsegment, c_acctbal,
             |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
             |      ORDER BY c_acctbal, c_custkey) AS rn,
             |    COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
             |  FROM customer) t
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    QueryDef(
      "agg_second_max",
      (s, d) => {
        // Shared module-level udaf (round 21, VERDICT r20 #3 pattern).
        val secondMax = graft.functions.SecondMaxUdaf.fn
        Tables.orders(s, d)
          .groupBy(col("o_orderstatus"))
          .agg(secondMax(col("o_totalprice")).as("second_max"))
          .filter(!isnan(col("second_max")))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, MAX(p) AS second_max FROM (
             |  SELECT o_orderstatus, o_totalprice AS p,
             |    MAX(o_totalprice) OVER (PARTITION BY o_orderstatus) AS m
             |  FROM orders) t
             |WHERE p < m GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Modal value per group, deterministic tie-break (higher count, then
    // lexicographically smaller value). Both engines' native mode() leaves
    // ties unspecified, so the count+row_number formulation is the portable
    // one — and it's also the 100 TB shape: a partial-aggregable count then
    // a window over the tiny (group × domain) table.
    QueryDef(
      "agg_mode",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("n").desc, col("o_orderpriority"))
        Tables.orders(s, d)
          .groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"), col("n"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, mode_priority, n FROM (
             |  SELECT o_orderstatus, o_orderpriority AS mode_priority, COUNT(*) AS n,
             |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
             |      ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
             |  FROM orders GROUP BY o_orderstatus, o_orderpriority) t
             |WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin)),

    // max_by/min_by with a struct ordering key: ties on acctbal are broken
    // by custkey inside the comparison itself, so the aggregate stays
    // deterministic (plain max_by leaves ties engine-defined).
    QueryDef(
      "agg_minmax_by",
      (s, d) =>
        Tables.customer(s, d)
          .groupBy(col("c_nationkey"))
          .agg(
            max_by(col("c_name"), struct(col("c_acctbal"), col("c_custkey"))).as("richest"),
            min_by(col("c_name"), struct(col("c_acctbal"), col("c_custkey"))).as("poorest"))
          .orderBy("c_nationkey"),
      // explicit NULLS FIRST/LAST: Spark's struct comparison orders NULL
      // as SMALLEST in both directions, and the hi/lo join must be
      // null-safe (IS NOT DISTINCT FROM) or the NULL nationkey group
      // vanishes — round-9 degenerate parity sweep
      Some("""WITH ranked AS (
             |  SELECT c_nationkey, c_name,
             |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
             |      ORDER BY c_acctbal DESC NULLS LAST, c_custkey DESC) AS rhi,
             |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
             |      ORDER BY c_acctbal ASC NULLS FIRST, c_custkey ASC) AS rlo
             |  FROM customer)
             |SELECT hi.c_nationkey, hi.c_name AS richest, lo.c_name AS poorest
             |FROM (SELECT c_nationkey, c_name FROM ranked WHERE rhi = 1) hi
             |JOIN (SELECT c_nationkey, c_name FROM ranked WHERE rlo = 1) lo
             |  ON hi.c_nationkey IS NOT DISTINCT FROM lo.c_nationkey
             |ORDER BY hi.c_nationkey""".stripMargin)),

    // Conditional counting — count_if in both engines (COUNT semantics, so
    // no HUGEINT widening; CAST kept for the dtype discipline anyway).
    QueryDef(
      "agg_count_if",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            count_if(col("l_discount") > 0.05d).as("n_discounted"),
            count_if(col("l_quantity") >= 25d).as("n_bulk"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_discounted,
             |  CAST(count_if(l_quantity >= 25) AS BIGINT) AS n_bulk,
             |  COUNT(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Weighted average: Σ(price·qty)/Σ(qty) in exact decimal partials
    // (order-insensitive ⇒ AQE-safe), final division in double, rounded.
    QueryDef(
      "agg_weighted_avg",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            // nullif: an all-zero-weight group sums to 0 — ANSI kills the
            // job; DuckDB's /0 is NULL (round-8 sweep)
            Exact.roundN(
              Exact.sumDec8(col("l_extendedprice") * col("l_quantity")).cast("double") /
                nullif(Exact.sumDec(col("l_quantity")).cast("double"), lit(0.0d)), 4)
              .as("wavg_price"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag,
              |  ${Exact.roundNSql(
                 "CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,8))) AS DOUBLE) " +
                   "/ CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)", 4)} AS wavg_price,
              |  COUNT(*) AS n
              |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Bitwise aggregates over keys — AND/OR/XOR fold per group (both
    // engines return BIGINT; XOR is the order-insensitive checksum trick).
    QueryDef(
      "agg_bit",
      (s, d) =>
        Tables.customer(s, d)
          .groupBy(col("c_mktsegment"))
          .agg(
            expr("bit_and(c_custkey)").as("band"),
            expr("bit_or(c_custkey)").as("bor"),
            expr("bit_xor(c_custkey)").as("bxor"))
          .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, bit_and(c_custkey) AS band,
             |  bit_or(c_custkey) AS bor, bit_xor(c_custkey) AS bxor
             |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // Skewness + excess kurtosis per segment, closed-form from exact
    // decimal power sums (built-in skewness()/kurtosis() accumulate floats
    // in partition order → oracle-unstable; decimal Σx..Σx⁴ are
    // order-insensitive, and the final moment algebra is plain IEEE doubles
    // written identically on both engines — same approach as agg_corr).
    // sqrt(v)*v instead of pow(v,1.5): pow's libm implementations differ.
    QueryDef(
      "agg_skew",
      (s, d) => {
        val x = col("c_acctbal")
        Tables.customer(s, d)
          .groupBy(col("c_mktsegment"))
          .agg(
            count(lit(1)).cast("double").as("n"),
            sum(x.cast("decimal(18,4)")).cast("double").as("s1"),
            sum((x * x).cast("decimal(28,8)")).cast("double").as("s2"),
            sum((x * x * x).cast("decimal(38,8)")).cast("double").as("s3"),
            sum((x * x * x * x).cast("decimal(38,8)")).cast("double").as("s4"))
          .select(
            col("c_mktsegment"),
            col("n").cast("long").as("n_rows"),
            // nullif on both variance-power denominators: an all-equal
            // group has zero variance — ANSI kills the job; DuckDB's /0
            // is NULL (round-8 sweep, DegenerateGroupSpec)
            Exact.roundN(
              (col("s3") / col("n") - lit(3d) * (col("s1") / col("n")) * (col("s2") / col("n")) +
                lit(2d) * (col("s1") / col("n")) * (col("s1") / col("n")) * (col("s1") / col("n"))) /
                nullif(sqrt(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n"))) *
                  (col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n"))), lit(0.0d)), 4)
              .as("skew"),
            Exact.roundN(
              (col("s4") / col("n") - lit(4d) * (col("s1") / col("n")) * (col("s3") / col("n")) +
                lit(6d) * (col("s1") / col("n")) * (col("s1") / col("n")) * (col("s2") / col("n")) -
                lit(3d) * (col("s1") / col("n")) * (col("s1") / col("n")) *
                  (col("s1") / col("n")) * (col("s1") / col("n"))) /
                nullif((col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n"))) *
                  (col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n"))), lit(0.0d)) -
                lit(3d), 4).as("kurt"))
          .orderBy("c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, CAST(n AS BIGINT) AS n_rows,
              |  ${Exact.roundNSql(
                 "(s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n)) " +
                   "/ (SQRT(s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n)))", 4)} AS skew,
              |  ${Exact.roundNSql(
                 "(s4 / n - 4 * (s1 / n) * (s3 / n) + 6 * (s1 / n) * (s1 / n) * (s2 / n) " +
                   "- 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)) " +
                   "/ ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n))) - 3", 4)} AS kurt
              |FROM (
              |  SELECT c_mktsegment,
              |    CAST(COUNT(*) AS DOUBLE) AS n,
              |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS s1,
              |    CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(28,8))) AS DOUBLE) AS s2,
              |    CAST(SUM(CAST(c_acctbal * c_acctbal * c_acctbal AS DECIMAL(38,8))) AS DOUBLE) AS s3,
              |    CAST(SUM(CAST(c_acctbal * c_acctbal * c_acctbal * c_acctbal AS DECIMAL(38,8))) AS DOUBLE) AS s4
              |  FROM customer GROUP BY c_mktsegment) t
              |ORDER BY c_mktsegment""".stripMargin)),

    // Fixed-width histogram over a metadata column — single hash aggregate
    // on the bucket key, the shape a 100 TB length-distribution scan needs.
    QueryDef(
      "agg_histogram",
      (s, d) =>
        Tables.documents(s, d)
          .withColumn("bucket", (floor(col("n_chars") / 100d) * 100).cast("long"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"))
          .orderBy("bucket"),
      Some("""SELECT CAST(FLOOR(n_chars / 100) * 100 AS BIGINT) AS bucket,
             |  COUNT(*) AS n_docs, MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
             |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin))
  )
}
