package graft.operators

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2 B.3 joins.
  *
  * Scale notes (100 TB): dimension tables (region/nation, the derived band
  * table) are broadcast so the big side never shuffles; the fact⋈fact joins
  * (orders⋈customer, events⋈events) shuffle on their equi-keys, which is the
  * partitioning a real cluster would co-locate via bucketing. The as-of
  * family is a bucketed merge: per-(user, epoch-day) running-best windows
  * plus a per-bucket carry joined on (user_id, bkt) — per-user work is
  * O(k log k) even for a hot key, never purchases × signups (VERDICT r05 #3).
  */
object Joins {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "join_inner",
      (s, d) => {
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        o.join(c, o("o_custkey") === c("c_custkey"), "inner")
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(count(col("o_orderkey")).as("n_orders"),
            Exact.sumMoney2(col("o_totalprice")).as("sum_price"))
          .orderBy("c_custkey")
      },
      Some(s"""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
              |  ${Exact.sumMoney2Sql("o_totalprice")} AS sum_price
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin)),

    QueryDef(
      "join_broadcast",
      (s, d) => {
        val c = Tables.customer(s, d)
        val n = broadcast(Tables.nation(s, d))
        val r = broadcast(Tables.region(s, d))
        c.join(n, c("c_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_cust"))
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r_name, n_name, COUNT(*) AS n_cust
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    QueryDef(
      "join_left_outer",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    QueryDef(
      "join_full_outer",
      (s, d) => {
        val cc = Tables.customer(s, d).groupBy(col("c_nationkey").as("nk_c"))
          .agg(count(lit(1)).as("n_cust"))
        val sc = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nk_s"))
          .agg(count(lit(1)).as("n_supp"))
        cc.join(sc, col("nk_c") === col("nk_s"), "full")
          .select(
            coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nationkey")
      },
      Some("""SELECT COALESCE(nk_c, nk_s) AS nationkey,
             |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
             |FROM (SELECT c_nationkey AS nk_c, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
             |FULL OUTER JOIN (SELECT s_nationkey AS nk_s, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
             |ON nk_c = nk_s ORDER BY nationkey""".stripMargin)),

    QueryDef(
      "join_semi",
      (s, d) => {
        val c = Tables.customer(s, d)
        val f = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        c.join(f, c("c_custkey") === f("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
             |ORDER BY c_custkey""".stripMargin)),

    QueryDef(
      "join_anti",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    QueryDef(
      "join_cross",
      (s, d) => {
        val r = Tables.region(s, d).select("r_name")
        val f = Tables.lineitem(s, d).select("l_returnflag").distinct()
        r.crossJoin(f).orderBy("r_name", "l_returnflag")
      },
      Some("""SELECT r_name, l_returnflag
             |FROM region CROSS JOIN (SELECT DISTINCT l_returnflag FROM lineitem) f
             |ORDER BY r_name, l_returnflag""".stripMargin)),

    QueryDef(
      "join_range",
      (s, d) => {
        import s.implicits._
        val bands = broadcast(Seq(
          ("band_01_10", 1, 10), ("band_11_20", 11, 20), ("band_21_30", 21, 30),
          ("band_31_40", 31, 40), ("band_41_50", 41, 50))
          .toDF("band", "lo", "hi"))
        Tables.part(s, d)
          .join(bands, col("p_size").between(col("lo"), col("hi")))
          .groupBy("band")
          .agg(count(lit(1)).as("n_parts"))
          .orderBy("band")
      },
      Some("""SELECT band, COUNT(*) AS n_parts FROM part
             |JOIN (VALUES ('band_01_10', 1, 10), ('band_11_20', 11, 20), ('band_21_30', 21, 30),
             |             ('band_31_40', 31, 40), ('band_41_50', 41, 50)) AS b(band, lo, hi)
             |ON p_size BETWEEN lo AND hi
             |GROUP BY band ORDER BY band""".stripMargin)),

    // As-of join: most recent signup strictly before each purchase of the
    // same user. Spark has no native as-of; the round-5 formulation was an
    // equi-join on user + per-purchase row_number, which materializes
    // purchases × signups per user — a hot user (bot account) had no bound
    // (VERDICT r05 #3). Rewritten as the bucketed merge shape:
    //  1. union both event roles, bucket by epoch DAY, and take a
    //     per-(user, bucket) running MAX over signup structs — each
    //     purchase sees the best same-bucket signup via ONE sort, so a hot
    //     key costs O(k log k), never O(p·s) pairs;
    //  2. aggregate each bucket's best signup (one row per (user, bucket),
    //     bounded by active days) and window a strictly-earlier-bucket
    //     running best over that tiny series;
    //  3. equi-join purchases back on (user_id, bkt) — the time bucket IS
    //     part of the join key (PlanSpec pins it) — and take the greatest
    //     of the two candidates.
    // Strict '<' falls out of the sort order: at equal truncated-second ts,
    // purchases sort BEFORE signups, so a same-second signup is never in a
    // purchase's preceding frame. Tie-break (latest ts, then largest id) is
    // the struct's lexicographic max. Timestamps compared at second
    // granularity on both engines (D4: parquet is ns, Spark reads µs).
    QueryDef(
      "join_asof",
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("purchase", "signup"))
          .select(col("event_id"), col("user_id"),
            date_trunc("second", col("ts")).as("tss"),
            (col("event_type") === "signup").as("is_signup"))
          .withColumn("bkt", floor(unix_timestamp(col("tss")) / 86400L))
        val sigStruct = when(col("is_signup"),
          struct(col("tss").as("bts"), col("event_id").as("bid")))
        val wIn = Window.partitionBy(col("user_id"), col("bkt"))
          .orderBy(col("tss"), col("is_signup"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val withLocal = ev.withColumn("local_best", max(sigStruct).over(wIn))
        val wCarry = Window.partitionBy(col("cu")).orderBy(col("cb"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val carry = ev.groupBy(col("user_id").as("cu"), col("bkt").as("cb"))
          .agg(max(sigStruct).as("bucket_best"))
          .withColumn("prev_best", max(col("bucket_best")).over(wCarry))
          .select(col("cu"), col("cb"), col("prev_best"))
        withLocal.filter(!col("is_signup"))
          .join(carry, col("user_id") === col("cu") && col("bkt") === col("cb"))
          .withColumn("best", greatest(col("local_best"), col("prev_best")))
          .filter(col("best").isNotNull)
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("tss").as("purchase_ts"), col("best.bid").as("signup_id"))
          .orderBy("purchase_id")
      },
      Some("""SELECT purchase_id, user_id, purchase_ts, signup_id FROM (
             |  SELECT p.event_id AS purchase_id, p.user_id,
             |    CAST(date_trunc('second', p.ts) AS TIMESTAMP) AS purchase_ts,
             |    s.event_id AS signup_id,
             |    ROW_NUMBER() OVER (PARTITION BY p.event_id
             |      ORDER BY date_trunc('second', s.ts) DESC, s.event_id DESC) AS rn
             |  FROM events p JOIN events s
             |    ON s.user_id = p.user_id
             |   AND date_trunc('second', s.ts) < date_trunc('second', p.ts)
             |  WHERE p.event_type = 'purchase' AND s.event_type = 'signup') t
             |WHERE rn = 1 ORDER BY purchase_id""".stripMargin)),

    // Existence join: the IN-subquery in the PROJECTION (not the WHERE)
    // becomes Catalyst's ExistenceJoin — rows are kept and annotated with
    // a membership flag instead of filtered. The "tag, don't drop" shape
    // data-quality pipelines use.
    QueryDef(
      "join_existence",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("graft_customer_ex")
        Tables.orders(s, d).createOrReplaceTempView("graft_orders_ex")
        s.sql("""SELECT c_custkey,
                |  c_custkey IN (SELECT o_custkey FROM graft_orders_ex
                |                WHERE o_orderpriority = '1-URGENT') AS has_urgent,
                |  c_custkey IN (SELECT o_custkey FROM graft_orders_ex
                |                WHERE o_orderstatus = 'P') AS has_pending
                |FROM graft_customer_ex ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey,
             |  c_custkey IN (SELECT o_custkey FROM orders
             |                WHERE o_orderpriority = '1-URGENT') AS has_urgent,
             |  c_custkey IN (SELECT o_custkey FROM orders
             |                WHERE o_orderstatus = 'P') AS has_pending
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // TPC-H Q7 shape: bilateral shipping volume between two nations by
    // ship year — exercises the same dimension joined TWICE under
    // different roles (supplier nation vs customer nation), a symmetric
    // OR-of-pairs filter, and year bucketing. Both nation sides broadcast,
    // and both are PRE-FILTERED to the two named nations (VERDICT r03 #3):
    // the dimension filter is implied by the OR-of-pairs predicate, so
    // pushing it into the broadcast build sides turns the two inner joins
    // into selective semi-filters that drop ~23/25 of fact rows
    // mid-pipeline instead of carrying every row to a post-join filter.
    // The OR residual stays — it rejects the (18,18)/(19,19) pairs.
    QueryDef(
      "join_star_q7",
      (s, d) => {
        val wanted = Seq("NATION_18", "NATION_19")
        val n1 = broadcast(Tables.nation(s, d)
          .filter(col("n_name").isin(wanted: _*))
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
        val n2 = broadcast(Tables.nation(s, d)
          .filter(col("n_name").isin(wanted: _*))
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(n1, col("s_nationkey") === col("s_nk"))
          .join(n2, col("c_nationkey") === col("c_nk"))
          .filter(
            (col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19") ||
              (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_18"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(round(Exact.sumDec8(col("l_extendedprice") * (lit(1d) - col("l_discount"))), 2)
            .cast("double").as("volume"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              |  CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
              |  ${Exact.sumDec8Money2Sql("l_extendedprice * (1 - l_discount)")} AS volume
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation n1 ON s_nationkey = n1.n_nationkey
              |JOIN nation n2 ON c_nationkey = n2.n_nationkey
              |WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
              |   OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
              |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    // Binned range join — the scale rewrite of join_range: both sides are
    // keyed by a coarse bin (width 10), the bands explode into every bin
    // they cover, and the BETWEEN becomes a residual filter on an EQUI-join.
    // This is the formulation that survives two BIG sides at 100 TB (a
    // plain theta join is a nested-loop); PlanSpec asserts no
    // BroadcastNestedLoopJoin is planned. The oracle states the plain
    // BETWEEN semantics — results must be identical.
    QueryDef(
      "join_range_binned",
      (s, d) => {
        import s.implicits._
        val bands = Seq(
          ("q01_10", 1, 10), ("q11_20", 11, 20), ("q21_30", 21, 30),
          ("q31_40", 31, 40), ("q41_50", 41, 50))
          .toDF("band", "lo", "hi")
        val binnedBands = broadcast(bands.withColumn("bin",
          explode(expr("sequence(CAST(floor((lo - 1) / 10) AS INT), CAST(floor((hi - 1) / 10) AS INT))"))))
        Tables.lineitem(s, d)
          .withColumn("bin", floor((col("l_quantity") - 1d) / 10d).cast("int"))
          .join(binnedBands, Seq("bin"))
          .filter(col("l_quantity").between(col("lo"), col("hi")))
          .groupBy("band")
          .agg(count(lit(1)).as("n_items"))
          .orderBy("band")
      },
      Some("""SELECT band, COUNT(*) AS n_items FROM lineitem
             |JOIN (VALUES ('q01_10', 1, 10), ('q11_20', 11, 20), ('q21_30', 21, 30),
             |             ('q31_40', 31, 40), ('q41_50', 41, 50)) AS b(band, lo, hi)
             |ON l_quantity BETWEEN lo AND hi
             |GROUP BY band ORDER BY band""".stripMargin)),

    // Forward as-of: earliest signup at-or-after each purchase — the exact
    // mirror of join_asof's bucketed merge shape (see its note): running
    // MIN over the FOLLOWING frame within (user, bucket), per-bucket best
    // carried back from strictly-later buckets, equi-join on (user_id,
    // bkt). Inclusive '>=' falls out of the same sort order (purchases
    // before signups at equal ts ⇒ a same-second signup IS in the
    // purchase's following frame); tie-break (earliest ts, smallest id) is
    // the struct's lexicographic min. Hot-user cost O(k log k), never
    // purchases × signups.
    QueryDef(
      "join_asof_forward",
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("purchase", "signup"))
          .select(col("event_id"), col("user_id"),
            date_trunc("second", col("ts")).as("tss"),
            (col("event_type") === "signup").as("is_signup"))
          .withColumn("bkt", floor(unix_timestamp(col("tss")) / 86400L))
        val sigStruct = when(col("is_signup"),
          struct(col("tss").as("bts"), col("event_id").as("bid")))
        val wIn = Window.partitionBy(col("user_id"), col("bkt"))
          .orderBy(col("tss"), col("is_signup"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val withLocal = ev.withColumn("local_best", min(sigStruct).over(wIn))
        val wCarry = Window.partitionBy(col("cu")).orderBy(col("cb"))
          .rowsBetween(1, Window.unboundedFollowing)
        val carry = ev.groupBy(col("user_id").as("cu"), col("bkt").as("cb"))
          .agg(min(sigStruct).as("bucket_best"))
          .withColumn("next_best", min(col("bucket_best")).over(wCarry))
          .select(col("cu"), col("cb"), col("next_best"))
        withLocal.filter(!col("is_signup"))
          .join(carry, col("user_id") === col("cu") && col("bkt") === col("cb"))
          .withColumn("best", least(col("local_best"), col("next_best")))
          .filter(col("best").isNotNull)
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("tss").as("purchase_ts"), col("best.bid").as("signup_id"))
          .orderBy("purchase_id")
      },
      Some("""SELECT purchase_id, user_id, purchase_ts, signup_id FROM (
             |  SELECT p.event_id AS purchase_id, p.user_id,
             |    CAST(date_trunc('second', p.ts) AS TIMESTAMP) AS purchase_ts,
             |    s.event_id AS signup_id,
             |    ROW_NUMBER() OVER (PARTITION BY p.event_id
             |      ORDER BY date_trunc('second', s.ts) ASC, s.event_id ASC) AS rn
             |  FROM events p JOIN events s
             |    ON s.user_id = p.user_id
             |   AND date_trunc('second', s.ts) >= date_trunc('second', p.ts)
             |  WHERE p.event_type = 'purchase' AND s.event_type = 'signup') t
             |WHERE rn = 1 ORDER BY purchase_id""".stripMargin)),

    // Nearest as-of: the signup closest in time to each purchase, either
    // direction, measured in whole seconds on the epoch (D4-truncated).
    // Ties → earlier signup, then smaller signup_id. Composed as BOTH
    // bucketed merge directions over one event union (see join_asof's
    // note): a backward candidate (latest signup at-or-before, ties to the
    // SMALLEST id via the (sec, −id) struct max) and a forward candidate
    // (earliest strictly-after, struct min), each with its within-bucket
    // running best + cross-bucket carry, joined back on (user_id, bkt);
    // the final pick minimizes (diff, signup_sec, signup_id) — exactly the
    // declared ordering. A same-second signup reaches the purchase through
    // the backward side only (signups sort first here, for '≤'
    // inclusivity); with diff 0 it beats any forward candidate, so the
    // asymmetry never changes the answer. Hot-user cost O(k log k).
    QueryDef(
      "join_asof_nearest",
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("purchase", "signup"))
          .select(col("event_id"), col("user_id"),
            unix_timestamp(date_trunc("second", col("ts"))).as("sec"),
            (col("event_type") === "signup").as("is_signup"))
          .withColumn("bkt", floor(col("sec") / 86400L))
        val bwStruct = when(col("is_signup"),
          struct(col("sec").as("ssec"), (-col("event_id")).as("negid")))
        val fwStruct = when(col("is_signup"),
          struct(col("sec").as("ssec"), col("event_id").as("sid")))
        val wb = Window.partitionBy(col("user_id"), col("bkt"))
          .orderBy(col("sec"), when(col("is_signup"), 0).otherwise(1))
        val withLocal = ev
          .withColumn("local_bw", max(bwStruct)
            .over(wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("local_fw", min(fwStruct)
            .over(wb.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
        val wCarry = Window.partitionBy(col("cu")).orderBy(col("cb"))
        val carry = ev.groupBy(col("user_id").as("cu"), col("bkt").as("cb"))
          .agg(max(bwStruct).as("bb"), min(fwStruct).as("bf"))
          .withColumn("prev_bw", max(col("bb"))
            .over(wCarry.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("next_fw", min(col("bf"))
            .over(wCarry.rowsBetween(1, Window.unboundedFollowing)))
          .select(col("cu"), col("cb"), col("prev_bw"), col("next_fw"))
        withLocal.filter(!col("is_signup"))
          .join(carry, col("user_id") === col("cu") && col("bkt") === col("cb"))
          .withColumn("bw", greatest(col("local_bw"), col("prev_bw")))
          .withColumn("fw", least(col("local_fw"), col("next_fw")))
          .withColumn("cand_b", when(col("bw").isNotNull, struct(
            (col("sec") - col("bw.ssec")).as("diff"),
            col("bw.ssec").as("ssec"), (-col("bw.negid")).as("sid"))))
          .withColumn("cand_f", when(col("fw").isNotNull, struct(
            (col("fw.ssec") - col("sec")).as("diff"),
            col("fw.ssec").as("ssec"), col("fw.sid").as("sid"))))
          .withColumn("pick", least(col("cand_b"), col("cand_f")))
          .filter(col("pick").isNotNull)
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("pick.sid").as("signup_id"), col("pick.diff").as("diff_sec"))
          .orderBy("purchase_id")
      },
      Some("""SELECT purchase_id, user_id, signup_id, diff_sec FROM (
             |  SELECT p.event_id AS purchase_id, p.user_id, s.event_id AS signup_id,
             |    ABS(CAST(epoch(date_trunc('second', p.ts)) AS BIGINT)
             |        - CAST(epoch(date_trunc('second', s.ts)) AS BIGINT)) AS diff_sec,
             |    ROW_NUMBER() OVER (PARTITION BY p.event_id
             |      ORDER BY ABS(CAST(epoch(date_trunc('second', p.ts)) AS BIGINT)
             |                   - CAST(epoch(date_trunc('second', s.ts)) AS BIGINT)) ASC,
             |               CAST(epoch(date_trunc('second', s.ts)) AS BIGINT) ASC,
             |               s.event_id ASC) AS rn
             |  FROM events p JOIN events s ON s.user_id = p.user_id
             |  WHERE p.event_type = 'purchase' AND s.event_type = 'signup') t
             |WHERE rn = 1 ORDER BY purchase_id""".stripMargin)),

    // TPC-H Q3 shape: top-10 unshipped orders by revenue. Ranked on the
    // ROUNDED revenue (D5) with o_orderkey tie-break.
    QueryDef(
      "join_star_q3",
      (s, d) => {
        val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") < lit("1997-01-01").cast("date"))
        val l = Tables.lineitem(s, d)
          .filter(col("l_shipdate") > lit("1997-01-01").cast("date"))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_date"))
          .agg(round(Exact.sumDec8(col("l_extendedprice") * (lit(1d) - col("l_discount"))), 2)
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_date,
              |  ${Exact.sumDec8Money2Sql("l_extendedprice * (1 - l_discount)")} AS revenue
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |WHERE c_mktsegment = 'BUILDING'
              |  AND o_orderdate < TIMESTAMP '1997-01-01'
              |  AND l_shipdate > TIMESTAMP '1997-01-01'
              |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
              |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    // TPC-H Q10 shape: returned-item revenue per customer, top-20.
    QueryDef(
      "join_star_q10",
      (s, d) => {
        val c = Tables.customer(s, d)
        val n = broadcast(Tables.nation(s, d))
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
            col("o_orderdate") < lit("1996-07-01").cast("date"))
        val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(round(Exact.sumDec8(col("l_extendedprice") * (lit(1d) - col("l_discount"))), 2)
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, n_name,
              |  ${Exact.sumDec8Money2Sql("l_extendedprice * (1 - l_discount)")} AS revenue
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |WHERE l_returnflag = 'R'
              |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
              |GROUP BY c_custkey, c_name, n_name
              |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // TPC-H Q5 shape: revenue per nation for one region + date range.
    // Ranked by the rounded revenue (D5) with n_name tie-break.
    QueryDef(
      "join_star_q5",
      (s, d) => {
        val r = broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA"))
        val n = broadcast(Tables.nation(s, d))
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
            col("o_orderdate") < lit("1998-01-01").cast("date"))
        val l = Tables.lineitem(s, d)
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(round(Exact.sumDec8(col("l_extendedprice") * (lit(1d) - col("l_discount"))), 2)
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""SELECT n_name, ${Exact.sumDec8Money2Sql("l_extendedprice * (1 - l_discount)")} AS revenue
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |WHERE r_name = 'ASIA'
              |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
              |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),

    // TPC-H Q14 shape: promo revenue share — conditional revenue over a
    // broadcast part join inside one month, a single scalar output from a
    // two-branch decimal aggregate.
    QueryDef(
      "join_promo_share",
      (s, d) => {
        val rev = (col("l_extendedprice") * (lit(1d) - col("l_discount")))
          .cast("decimal(28,8)")
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-03-01").cast("date") &&
            col("l_shipdate") < lit("1996-04-01").cast("date"))
          .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
          .agg(Exact.roundN(lit(100.0d) *
            sum(when(col("p_type") === "ECONOMY", rev)
              .otherwise(lit(0).cast("decimal(28,8)"))).cast("double") /
            sum(rev).cast("double"), 4).as("promo_share"))
      },
      Some(s"""SELECT
              |  ${Exact.roundNSql(
                 "100.0 * CAST(SUM(CASE WHEN p_type = 'ECONOMY' " +
                   "THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8)) " +
                   "ELSE CAST(0 AS DECIMAL(28,8)) END) AS DOUBLE) " +
                   "/ CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) AS DOUBLE)",
                 4)} AS promo_share
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
              |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin)),

    // TPC-H Q11 shape (adapted to the fixture universe): parts whose
    // revenue exceeds 1.5× the per-part average — a group filtered by a
    // fraction of a GLOBAL aggregate, the "important stock" idiom. The
    // 1-row totals aggregate broadcasts; the threshold is scale-invariant
    // (multiple-of-average, not absolute), so the query stays non-empty at
    // every fixture scale.
    QueryDef(
      "join_value_concentration",
      (s, d) => {
        val pr = Tables.lineitem(s, d)
          .groupBy(col("l_partkey"))
          .agg(round(Exact.sumDec8(col("l_extendedprice") * (lit(1d) - col("l_discount"))), 2)
            .cast("double").as("rev"))
        val m = pr.agg(
          sum(col("rev").cast("decimal(18,2)")).cast("double").as("t"),
          count(lit(1)).cast("double").as("np"))
        pr.crossJoin(broadcast(m))
          .filter(col("rev") > lit(1.5d) * col("t") / col("np"))
          .select(col("l_partkey"), col("rev"))
          .orderBy(col("rev").desc, col("l_partkey"))
      },
      Some(s"""WITH pr AS (
              |  SELECT l_partkey,
              |    ${Exact.sumDec8Money2Sql("l_extendedprice * (1 - l_discount)")} AS rev
              |  FROM lineitem GROUP BY l_partkey),
              |m AS (SELECT CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DOUBLE) AS t,
              |        CAST(COUNT(*) AS DOUBLE) AS np FROM pr)
              |SELECT l_partkey, rev FROM pr CROSS JOIN m
              |WHERE rev > 1.5 * t / np
              |ORDER BY rev DESC, l_partkey""".stripMargin)),

    // TPC-H Q19 shape: disjunctive multi-attribute band predicates spanning
    // BOTH join sides — the planner must keep the equi-join key and apply
    // the OR-of-ANDs as a residual; revenue + count over the union of three
    // qualification bands.
    QueryDef(
      "join_band_disjunction",
      (s, d) =>
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#2" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 20)) ||
            (col("p_brand") === "Brand#17" && col("p_size").between(10, 30) &&
              col("l_quantity").between(10, 40)) ||
            (col("p_type") === "SMALL" && col("p_size") <= 10 &&
              col("l_quantity") >= 30))
          .agg(count(lit(1)).as("n"),
            round(Exact.sumDec8(col("l_extendedprice") * (lit(1d) - col("l_discount"))), 2)
              .cast("double").as("revenue")),
      Some(s"""SELECT COUNT(*) AS n,
              |  ${Exact.sumDec8Money2Sql("l_extendedprice * (1 - l_discount)")} AS revenue
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
              |   OR (p_brand = 'Brand#17' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
              |   OR (p_type = 'SMALL' AND p_size <= 10 AND l_quantity >= 30)""".stripMargin)),

    // SCD2 dimension lookup — the warehouse idiom for "which version of
    // the dimension was true when this fact happened": a two-version
    // validity-interval dimension (synthesized deterministically from
    // nation) joined on the key PLUS a date-range residual. Planned as a
    // broadcast equi-join on nationkey with the interval predicate as a
    // cheap residual filter — at 100 TB the dim stays broadcast and the
    // fact never shuffles for the lookup.
    QueryDef(
      "join_scd2_lookup",
      (s, d) => {
        val n = Tables.nation(s, d)
        val v1 = n.select(col("n_nationkey"), col("n_name"), lit(1).as("version"),
          lit("1992-01-01").cast("date").as("valid_from"),
          lit("1996-01-01").cast("date").as("valid_to"),
          (col("n_nationkey").cast("double") * 0.01d).as("rate"))
        val v2 = n.select(col("n_nationkey"), col("n_name"), lit(2).as("version"),
          lit("1996-01-01").cast("date").as("valid_from"),
          lit("9999-12-31").cast("date").as("valid_to"),
          (col("n_nationkey").cast("double") * 0.01d + 0.005d).as("rate"))
        val dim = broadcast(v1.unionAll(v2))
        Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(dim, col("c_nationkey") === col("n_nationkey") &&
            col("o_orderdate") >= col("valid_from") &&
            col("o_orderdate") < col("valid_to"))
          .groupBy(col("n_name"), col("version"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum((col("o_totalprice") * col("rate")).cast("decimal(28,8)")), 2)
              .cast("double").as("tax_revenue"))
          .orderBy("n_name", "version")
      },
      Some("""WITH dim AS (
             |  SELECT n_nationkey, n_name, 1 AS version,
             |    DATE '1992-01-01' AS valid_from, DATE '1996-01-01' AS valid_to,
             |    CAST(n_nationkey AS DOUBLE) * 0.01 AS rate FROM nation
             |  UNION ALL
             |  SELECT n_nationkey, n_name, 2,
             |    DATE '1996-01-01', DATE '9999-12-31',
             |    CAST(n_nationkey AS DOUBLE) * 0.01 + 0.005 FROM nation)
             |SELECT n_name, version, COUNT(*) AS n_orders,
             |  CAST(ROUND(SUM(CAST(o_totalprice * rate AS DECIMAL(28,8))), 2) AS DOUBLE) AS tax_revenue
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN dim ON c_nationkey = dim.n_nationkey
             |  AND o_orderdate >= valid_from AND o_orderdate < valid_to
             |GROUP BY n_name, version ORDER BY n_name, version""".stripMargin)),

    // Null-safe equi-join (<=> / IS NOT DISTINCT FROM): keys are NULLed on
    // a synthetic 1-in-97 stripe, and NULL must MATCH NULL — the result is
    // the normal matches plus a bounded null×null block. Spark plans
    // EqualNullSafe as a real equi-join key (coalesce-wrapped hash key),
    // not a nested loop; the null-side match count is the semantic witness.
    QueryDef(
      "join_null_safe",
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(when(col("o_custkey") % 97 === 0, lit(null).cast("long"))
            .otherwise(col("o_custkey")).as("ok"))
        val c = Tables.customer(s, d)
          .select(when(col("c_custkey") % 97 === 0, lit(null).cast("long"))
            .otherwise(col("c_custkey")).as("ck"))
        o.join(c, col("ok") <=> col("ck"))
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("ok").isNull, 1).otherwise(0)).cast("long")
              .as("n_null_matches"))
      },
      Some("""SELECT COUNT(*) AS n_rows,
             |  CAST(SUM(CASE WHEN o.ok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_matches
             |FROM (SELECT CASE WHEN o_custkey % 97 = 0 THEN NULL ELSE o_custkey END AS ok
             |      FROM orders) o
             |JOIN (SELECT CASE WHEN c_custkey % 97 = 0 THEN NULL ELSE c_custkey END AS ck
             |      FROM customer) c
             |  ON o.ok IS NOT DISTINCT FROM c.ck""".stripMargin))
  )
}

/** The salted-join utility exercised as a declared query: results must be
  * IDENTICAL to the plain equi-join (salting is a physical rewrite, not a
  * semantic change), which is exactly what the oracle asserts — it runs the
  * unsalted join. At 100 TB this is the manual fallback when one fact key
  * is hot enough that AQE's skew split (which only splits partitions, not
  * single keys' hash buckets across joins) isn't sufficient.
  */
object SaltedJoinQuery {
  import org.apache.spark.sql.functions._

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "join_skew_salted",
      (s, d) => {
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
        SkewJoin.saltedJoin(o, c, col("o_custkey"), col("c_custkey"),
            col("o_custkey"), salts = 8)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            Exact.sumMoney2(col("o_totalprice")).as("sum_price"))
          .orderBy("c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
              |  ${Exact.sumMoney2Sql("o_totalprice")} AS sum_price
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))
  )
}
