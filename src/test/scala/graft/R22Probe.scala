package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch measurement harness for round-22 optimization probes (not part
  * of any suite; run via Test/runMain — the R21Probe convention). Each
  * probe is selected by name in args(1) (comma list, default all) so a
  * re-measure of one item does not pay for the rest.
  *
  * Probes (VERDICT r21 "next round" items):
  *   describe   — #1b: agg_describe array-percentile vs 3 scalar percentiles
  *   cc         — #2: dedup_components fused propagate+double round
  *   ngram      — #6: dedup_ngram_jaccard split-once shingle build
  *   fallback   — #3: dedup_embedding ObjectHashAggregate sort-fallback count
  *   except     — #8: set_except pre-distinct EXCEPT inputs
  *   trimmed    — #8: agg_trimmed_mean per-pass breakdown
  */
object R22Probe {

  private def finalPlans(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan +: finalPlans(a.executedPlan)
    case s: QueryStageExec => s.plan +: finalPlans(s.plan)
    case other =>
      other +: (other.children ++ other.subqueries).flatMap(finalPlans)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val which = args.lift(1).map(_.split(",").toSet)
      .getOrElse(Set("describe", "cc", "ngram", "fallback", "except", "trimmed"))
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries.get("scan_full").foreach(fn => fn(spark, d).count())

    def dropCheckpoints(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

    def time(tag: String, runs: Int = 3)(f: => Long): Unit = (1 to runs).foreach { r =>
      dropCheckpoints()
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag%-44s run$r ${(System.nanoTime() - t0) / 1e9}%8.3fs rows=$n")
    }

    // ----------------------------------------------------------- describe
    if (which("describe")) {
      def describeArray: DataFrame = SparkEntry.queries("agg_describe")(spark, d)
      def describeScalar: DataFrame =
        Tables.orders(spark, d)
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n"),
            Exact.roundN(Exact.sumDec(col("o_totalprice")).cast("double") / count(lit(1)), 4)
              .as("mean_price"),
            Exact.roundN(expr("percentile(o_totalprice, 0.25)"), 4).as("q1"),
            Exact.roundN(expr("percentile(o_totalprice, 0.5)"), 4).as("med"),
            Exact.roundN(expr("percentile(o_totalprice, 0.75)"), 4).as("q3"),
            min(col("o_totalprice")).as("mn"),
            max(col("o_totalprice")).as("mx"))
          .orderBy("o_orderpriority")
      // interleave A/B so JVM warmth is shared fairly; args(2) flips the
      // order so the cold-first slot can be attributed (run in TWO JVMs).
      val scalarFirst = args.lift(2).contains("scalarFirst")
      (1 to 3).foreach { r =>
        if (scalarFirst) {
          val t1 = System.nanoTime(); val n1 = describeScalar.count()
          val w1 = (System.nanoTime() - t1) / 1e9
          val t0 = System.nanoTime(); val n0 = describeArray.count()
          val w0 = (System.nanoTime() - t0) / 1e9
          println(f"[probe] describe scalar=$w1%6.3fs array=$w0%6.3fs run$r rows=$n0/$n1 (scalar first)")
        } else {
          val t0 = System.nanoTime(); val n0 = describeArray.count()
          val w0 = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime(); val n1 = describeScalar.count()
          val w1 = (System.nanoTime() - t1) / 1e9
          println(f"[probe] describe array=$w0%6.3fs scalar=$w1%6.3fs run$r rows=$n0/$n1")
        }
      }
      val diff = describeArray.exceptAll(describeScalar).count() +
        describeScalar.exceptAll(describeArray).count()
      println(s"[probe] describe parity diff=$diff")
    }

    // ----------------------------------------------------------------- cc
    if (which("cc")) {
      import graft.llm.Dedup
      // Globally-unique dir per run — busts the tokenPairs/Tables plan
      // caches so dropCheckpoints() cannot orphan a memoized plan's
      // blocks (the CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND trap the scaling
      // benches document).
      val runCounter = new java.util.concurrent.atomic.AtomicInteger(0)
      def freshDir: String = d + ("/." * runCounter.incrementAndGet())
      def edges(): DataFrame = {
        val pairs = Dedup.tokenPairsFor(spark, freshDir)
          .filter(col("sim_raw") >= 0.6d).select(col("da"), col("db"))
        pairs.union(pairs.select(col("db").as("da"), col("da").as("db")))
      }
      def fused(edgesIn: DataFrame, maxRounds: Int = 64): (DataFrame, Int) = {
        val e = Dedup.materialize(edgesIn)
        var labels = Dedup.materialize(
          e.groupBy(col("da")).agg(min(col("db")).as("mn"))
            .select(col("da").as("id"), least(col("da"), col("mn")).as("comp")))
        var rounds = 0
        var converged = false
        while (!converged) {
          if (rounds >= maxRounds) throw new IllegalStateException(s"no converge $rounds")
          rounds += 1
          val prop = e.join(labels, e("db") === labels("id"))
            .groupBy(e("da")).agg(min(col("comp")).as("ncomp"))
          val parent = labels.select(col("id").as("pid"), col("comp").as("pcomp"))
          val next = Dedup.materialize(
            labels.join(prop, labels("id") === prop("da"), "left")
              .join(parent, labels("comp") === parent("pid"), "left")
              .select(labels("id"), labels("comp").as("old"),
                least(labels("comp"),
                  coalesce(col("ncomp"), labels("comp")),
                  coalesce(col("pcomp"), labels("comp"))).as("comp")))
          converged = next.filter(col("comp") =!= col("old")).isEmpty
          labels = next.select(col("id"), col("comp"))
        }
        (labels, rounds)
      }
      // rounds on the real sf0.1 edge set, both variants
      val (incLbl, incRounds) = Dedup.connectedComponentsWithRounds(edges())
      val incSet = incLbl.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val (fusLbl, fusRounds) = fused(edges())
      val fusSet = fusLbl.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[probe] cc rounds incumbent=$incRounds fused=$fusRounds " +
        s"parity=${incSet == fusSet}")
      (1 to 3).foreach { r =>
        val t0 = System.nanoTime()
        val n0 = SparkEntry.queries("dedup_components")(spark, freshDir).count()
        val w0 = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val n1 = fused(edges())._1
          .select(col("id").as("doc_id"), col("comp").as("component"))
          .orderBy("doc_id").count()
        val w1 = (System.nanoTime() - t1) / 1e9
        println(f"[probe] cc incumbent=$w0%6.3fs fused=$w1%6.3fs run$r rows=$n0/$n1")
      }
    }

    // -------------------------------------------------------------- ngram
    if (which("ngram")) {
      def ngramNamedToks: DataFrame = {
        val toksC = col("toks")
        val nsh = greatest(size(toksC) - 2, lit(0))
        val doc = Tables.documents(spark, d)
          .select(col("doc_id"), col("lang"), col("source"),
            split(col("text"), " ").as("toks"))
          .filter(size(toksC) >= 3)
          .select(col("doc_id"), col("lang"), col("source"),
            array_distinct(transform(
              zip_with(
                slice(toksC, lit(1), nsh),
                zip_with(slice(toksC, lit(2), nsh), slice(toksC, lit(3), nsh),
                  (b, c) => concat(b, lit(" "), c)),
                (a, bc) => concat(a, lit(" "), bc)),
              sgl => xxhash64(sgl))).as("sh"))
        // dfGuard is private[llm]; replicate it (same window shape)
        val postings = doc.select(col("doc_id"), col("lang"), col("source"),
          explode(col("sh")).as("h"))
        val w = Window.partitionBy(col("lang"), col("source"), col("h"))
        val ex = graft.llm.Dedup.materialize(
          postings.withColumn("df", count(lit(1)).over(w))
            .filter(col("df") <= graft.llm.Dedup.DfBound).drop("df"))
        val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val a = ex.select(col("doc_id").as("doc_id_a"), col("lang"), col("source"), col("h"))
        val b = ex.select(col("doc_id").as("doc_id_b"), col("lang").as("lang_b"),
          col("source").as("source_b"), col("h").as("h_b"))
        val inter = a.join(b, col("lang") === col("lang_b") &&
            col("source") === col("source_b") && col("h") === col("h_b") &&
            col("doc_id_a") < col("doc_id_b"))
          .groupBy(col("doc_id_a"), col("doc_id_b"))
          .agg(count(lit(1)).cast("double").as("inter"))
        inter
          .join(sizes.select(col("doc_id").as("doc_id_a"), col("n").as("na")), "doc_id_a")
          .join(sizes.select(col("doc_id").as("doc_id_b"), col("n").as("nb")), "doc_id_b")
          .withColumn("sim_raw", col("inter") / (col("na") + col("nb") - col("inter")))
          .filter(col("sim_raw") >= 0.3d)
          .select(col("doc_id_a"), col("doc_id_b"), Exact.roundN(col("sim_raw"), 4).as("sim"))
          .orderBy("doc_id_a", "doc_id_b")
      }
      (1 to 3).foreach { r =>
        dropCheckpoints()
        val t0 = System.nanoTime()
        val n0 = SparkEntry.queries("dedup_ngram_jaccard")(spark, d).count()
        val w0 = (System.nanoTime() - t0) / 1e9
        dropCheckpoints()
        val t1 = System.nanoTime(); val n1 = ngramNamedToks.count()
        val w1 = (System.nanoTime() - t1) / 1e9
        println(f"[probe] ngram incumbent=$w0%6.3fs namedtoks=$w1%6.3fs run$r rows=$n0/$n1")
      }
      dropCheckpoints()
      val diff = SparkEntry.queries("dedup_ngram_jaccard")(spark, d)
        .exceptAll(ngramNamedToks).count() +
        ngramNamedToks.exceptAll(SparkEntry.queries("dedup_ngram_jaccard")(spark, d)).count()
      println(s"[probe] ngram parity diff=$diff")
    }

    // ---------------------------------------------------------- ngramplan
    // The registered dedup_ngram_jaccard plan truncates at the
    // materialized postings (ExistingRDD), so the split-once evidence
    // needs the PRE-materialization shingle subtree: dump the r21
    // expression-reuse form and the r22 named-column form side by side.
    if (which("ngramplan")) {
      import org.apache.spark.sql.execution.ExplainMode
      val out = java.nio.file.Paths.get("plans/r22")
      java.nio.file.Files.createDirectories(out)
      def doc(named: Boolean): DataFrame = {
        val toks = if (named) col("toks") else split(col("text"), " ")
        val nsh = greatest(size(toks) - 2, lit(0))
        val base =
          if (named) Tables.documents(spark, d).select(col("doc_id"), col("lang"),
            col("source"), split(col("text"), " ").as("toks"))
          else Tables.documents(spark, d)
        base.filter(size(toks) >= 3)
          .select(col("doc_id"), col("lang"), col("source"),
            array_distinct(transform(
              zip_with(
                slice(toks, lit(1), nsh),
                zip_with(slice(toks, lit(2), nsh), slice(toks, lit(3), nsh),
                  (b, c) => concat(b, lit(" "), c)),
                (a, bc) => concat(a, lit(" "), bc)),
              sgl => xxhash64(sgl))).as("sh"))
          .select(col("doc_id"), col("lang"), col("source"),
            explode(col("sh")).as("h"))
      }
      Seq(false -> "before", true -> "after").foreach { case (named, tag) =>
        val s = doc(named).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          out.resolve(s"dedup_ngram_shingles_$tag.txt"), s)
        val splits = "split\\(".r.findAllIn(s).size
        println(s"[probe] ngramplan $tag: split( occurrences in plan = $splits")
      }
      // explode_outer variant: no InferFiltersFromGenerate conjuncts, so
      // the shingle expression is never copied into an interpreted filter.
      def docOuter: DataFrame = {
        val toks = col("toks")
        val nsh = greatest(size(toks) - 2, lit(0))
        Tables.documents(spark, d).select(col("doc_id"), col("lang"),
            col("source"), split(col("text"), " ").as("toks"))
          .filter(size(toks) >= 3)
          .select(col("doc_id"), col("lang"), col("source"),
            array_distinct(transform(
              zip_with(
                slice(toks, lit(1), nsh),
                zip_with(slice(toks, lit(2), nsh), slice(toks, lit(3), nsh),
                  (b, c) => concat(b, lit(" "), c)),
                (a, bc) => concat(a, lit(" "), bc)),
              sgl => xxhash64(sgl))).as("sh"))
          .select(col("doc_id"), col("lang"), col("source"),
            explode_outer(col("sh")).as("h"))
          .filter(col("h").isNotNull)
      }
      val so = docOuter.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(out.resolve("dedup_ngram_shingles_outer.txt"), so)
      println(s"[probe] ngramplan outer: split( occurrences in plan = ${"split\\(".r.findAllIn(so).size}")
      // wall A/B of just the postings subtree (the part the filter taxes)
      (1 to 3).foreach { r =>
        val t0 = System.nanoTime(); val n0 = doc(true).count()
        val w0 = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime(); val n1 = docOuter.count()
        val w1 = (System.nanoTime() - t1) / 1e9
        println(f"[probe] ngramplan postings inner=$w0%6.3fs outer=$w1%6.3fs run$r rows=$n0/$n1")
      }
    }

    // ----------------------------------------------------------- fallback
    if (which("fallback")) {
      Seq("dedup_embedding", "sim_cosine_topk", "sim_ann_ivf",
          "scan_sample_stratified").foreach { q =>
        val df = SparkEntry.queries(q)(spark, d)
        // collect() (not count()) so the metrics below belong to the plan
        // that actually ran: count() builds a separate QueryExecution.
        df.collect()
        val oha = finalPlans(df.queryExecution.executedPlan)
          .collect { case o: ObjectHashAggregateExec => o }
        oha.zipWithIndex.foreach { case (o, i) =>
          val ms = o.metrics.map { case (k, m) => s"$k=${m.value}" }.mkString(" ")
          println(s"[probe] fallback $q oha#$i $ms")
        }
        if (oha.isEmpty) println(s"[probe] fallback $q: no ObjectHashAggregateExec")
      }
    }

    // ------------------------------------------------------------- except
    if (which("except")) {
      def exceptPreDistinct: DataFrame = {
        val o = Tables.orders(spark, d)
        o.filter(col("o_orderstatus") === "O").select("o_custkey").distinct()
          .except(o.filter(col("o_orderstatus") === "F").select("o_custkey").distinct())
          .orderBy("o_custkey")
      }
      (1 to 3).foreach { r =>
        val t0 = System.nanoTime()
        val n0 = SparkEntry.queries("set_except")(spark, d).count()
        val w0 = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime(); val n1 = exceptPreDistinct.count()
        val w1 = (System.nanoTime() - t1) / 1e9
        println(f"[probe] except incumbent=$w0%6.3fs predistinct=$w1%6.3fs run$r rows=$n0/$n1")
      }
      val diff = SparkEntry.queries("set_except")(spark, d)
        .exceptAll(exceptPreDistinct).count() +
        exceptPreDistinct.exceptAll(SparkEntry.queries("set_except")(spark, d)).count()
      println(s"[probe] except parity diff=$diff")
    }

    // --------------------------------------------------------- kmeansprof
    // VERDICT r21 #4: sim_kmeans_step's x4096 wall (36.9 s) is 2.1×
    // sim_ann_ivf's on the same assignment pass — profile the second
    // half (posexplode + partial hash aggregate). Builds a replicated
    // corpus the EmbeddingsScalingBench way (sign-flip replicas), then
    // times (a) the assignment pass alone, (b) the full registered body,
    // (c) a 64-column-sums variant of the second half (partial-agg
    // before explode, guide §2.3) for comparison. args(2) = scale k.
    if (which("kmeansprof")) {
      val k = args.lift(2).map(_.toInt).getOrElse(1024)
      val base = spark.read.parquet(s"$d/embeddings.parquet")
      val reps = (0 until k).map { r =>
        val signed =
          if (r == 0) col("embedding")
          else transform(col("embedding"), (x, i) => {
            val lcg = (lit(r.toLong * 64L) + i.cast("long")) * lit(1103515245L) + lit(12345L)
            when(pmod(shiftright(lcg, 20), lit(2L)) === 0L, x).otherwise(x * lit(-1.0f))
          })
        base.select((col("vec_id") + lit(r.toLong * 1000000L)).as("vec_id"),
          signed.as("embedding"), col("label"))
      }
      val dir = s"target/r22_kmeans_x$k"
      reps.reduce(_ unionByName _).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      println(s"[probe] kmeansprof corpus x$k built")
      def evalAll(df: DataFrame): Long = {
        val r = df.select(xxhash64(df.columns.map(col): _*).as("hh"))
          .agg(count(lit(1)).as("n"), expr("bit_xor(hh)")).head()
        r.getLong(0)
      }
      // restate ivfAssigned (private in Similarity)
      def assigned: DataFrame = {
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
        val cents = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cent_id"), col("emb").as("cent"))
        val centsArr = broadcast(cents
          .agg(sort_array(collect_list(struct(col("cent_id"), col("cent")))).as("cents")))
        val best = aggregate(col("cents"),
          struct(lit(null).cast("long").as("cid"), lit(null).cast("double").as("cs")),
          (b, c) => {
            val cs = Exact.roundN(graft.llm.Similarity.cosine(col("emb"), c("cent")), 4)
            when(b("cid").isNull || (cs.isNotNull && (b("cs").isNull || cs > b("cs"))),
              struct(c("cent_id").as("cid"), cs.as("cs"))).otherwise(b)
          })
        e.crossJoin(centsArr).filter(size(col("cents")) > 0)
          .select(col("vec_id"), col("emb"), best("cid").as("cell"))
      }
      def fullStep: DataFrame = assigned
        .select(col("cell"), posexplode(col("emb")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim").cast("long").as("dim"))
        .agg(count(lit(1)).as("n"),
          Exact.roundN(sum(col("x").cast("decimal(28,10)")).cast("double") /
            count(lit(1)), 6).as("centroid"))
        .orderBy("cell", "dim")
      // VERDICT r21 #5 candidate: argmax via 8 STATIC codegen'd cosine
      // columns + a packed-long greatest (p_i = s4·16 + (15−i): max s4
      // first, then smallest index) instead of the interpreted
      // aggregate() HOF loop. Whole-stage codegen spans the project.
      def assignedStatic: DataFrame = {
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
        val cents = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cent_id"), col("emb").as("cent"))
        val centsArr = broadcast(cents
          .agg(sort_array(collect_list(struct(col("cent_id"), col("cent")))).as("cents")))
        val ps = (0 until 8).map { i =>
          val c = try_element_at(col("cents"), lit(i + 1))
          val cs = Exact.roundN(graft.llm.Similarity.cosine(col("emb"), c("cent")), 4)
          val s4 = (cs.cast("decimal(6,4)") * lit(10000)).cast("long")
          (s4 * 16 + (15 - i)).as(s"p$i")
        }
        val best = greatest(ps: _*)
        val idx = (lit(15) - pmod(best, lit(16))).cast("int")
        val cell = coalesce(
          try_element_at(col("cents"), idx + 1)("cent_id"),
          try_element_at(col("cents"), lit(1))("cent_id"))
        e.crossJoin(centsArr).filter(size(col("cents")) > 0)
          .select(col("vec_id"), col("emb"), cell.as("cell"))
      }
      time(s"kmeans x$k assignment only", 4) { evalAll(assigned) }
      time(s"kmeans x$k assignment STATIC codegen argmax", 4) { evalAll(assignedStatic) }
      val adiff = assigned.select("vec_id", "cell")
        .exceptAll(assignedStatic.select("vec_id", "cell")).count() +
        assignedStatic.select("vec_id", "cell")
          .exceptAll(assigned.select("vec_id", "cell")).count()
      println(s"[probe] kmeansprof assignment parity hof-vs-static diff=$adiff")
      time(s"kmeans x$k full registered body", 2) { evalAll(fullStep) }
      // variant: 64 column sums (fixtures are 64-dim; a production
      // version would need the >64-dim tail — this is a PROBE only)
      def colSums: DataFrame = {
        val sums = (0 until 64).flatMap { i =>
          Seq(sum(when(size(col("emb")) > i, 1L)).as(s"n$i"),
            sum(try_element_at(col("emb"), lit(i + 1)).cast("decimal(28,10)")).as(s"s$i"))
        }
        assigned.groupBy(col("cell")).agg(sums.head, sums.tail: _*)
          .select(col("cell"), posexplode(array((0 until 64).map(i =>
            struct(col(s"n$i").as("n"), col(s"s$i").as("s"))): _*)).as(Seq("dim", "ns")))
          .filter(col("ns.n") > 0)
          .select(col("cell"), col("dim").cast("long").as("dim"), col("ns.n").as("n"),
            Exact.roundN(col("ns.s").cast("double") / col("ns.n"), 6).as("centroid"))
          .orderBy("cell", "dim")
      }
      time(s"kmeans x$k column-sums variant", 2) { evalAll(colSums) }
      val diff = fullStep.exceptAll(colSums).count() + colSums.exceptAll(fullStep).count()
      println(s"[probe] kmeansprof parity full-vs-colsums diff=$diff")
      // diagnostic ONLY (inexact — double sum): attributes the second
      // half's cost between the Generate row-stream and the wide-decimal
      // accumulation.
      def doubleSum: DataFrame = assigned
        .select(col("cell"), posexplode(col("emb")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim").cast("long").as("dim"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      time(s"kmeans x$k DIAGNOSTIC double-sum second half", 2) { evalAll(doubleSum) }
    }

    // ------------------------------------------------------------ ivfbisect
    // Diagnose the x2048/x4096 sim_ann_ivf wall regression after the
    // static-argmax change: time the assignment alone and the full
    // ivfTop5 under BOTH argmax forms on the x1024 corpus built by
    // kmeansprof (target/r22_kmeans_x1024).
    if (which("ivfbisect")) {
      val dir = args.lift(2).getOrElse("target/r22_kmeans_x1024")
      def evalAll(df: DataFrame): Long = {
        val r = df.select(xxhash64(df.columns.map(col): _*).as("hh"))
          .agg(count(lit(1)).as("n"), expr("bit_xor(hh)")).head()
        r.getLong(0)
      }
      def assignedWith(static: Boolean): DataFrame = {
        val e = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
        val cents = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cent_id"), col("emb").as("cent"))
        val centsArr = broadcast(cents
          .agg(sort_array(collect_list(struct(col("cent_id"), col("cent")))).as("cents")))
        val cell =
          if (static) {
            val ps = (0 until 8).map { i =>
              val c = try_element_at(col("cents"), lit(i + 1))
              val cs = Exact.roundN(graft.llm.Similarity.cosine(col("emb"), c("cent")), 4)
              val s4 = (cs.cast("decimal(6,4)") * lit(10000)).cast("long")
              s4 * 16 + (15 - i)
            }
            val bestP = greatest(ps: _*)
            val idx = (lit(15) - pmod(bestP, lit(16))).cast("int")
            coalesce(try_element_at(col("cents"), idx + 1)("cent_id"),
              try_element_at(col("cents"), lit(1))("cent_id"))
          } else {
            val best = aggregate(col("cents"),
              struct(lit(null).cast("long").as("cid"), lit(null).cast("double").as("cs")),
              (b, c) => {
                val cs = Exact.roundN(graft.llm.Similarity.cosine(col("emb"), c("cent")), 4)
                when(b("cid").isNull || (cs.isNotNull && (b("cs").isNull || cs > b("cs"))),
                  struct(c("cent_id").as("cid"), cs.as("cs"))).otherwise(b)
              })
            best("cid")
          }
        e.crossJoin(centsArr).filter(size(col("cents")) > 0)
          .select(col("vec_id"), col("emb"), cell.as("cell"))
      }
      def top5With(static: Boolean): DataFrame = {
        val assigned = assignedWith(static)
        val q = broadcast(assigned.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("emb").as("qe"), col("cell")))
        val c = assigned.select(col("vec_id").as("neighbor_id"), col("emb").as("ce"),
          col("cell").as("ccell"))
        val topk = graft.functions.TopKNeighbors.top5
        q.join(c, col("cell") === col("ccell") && col("query_id") =!= col("neighbor_id"))
          .withColumn("sim", Exact.roundN(graft.llm.Similarity.cosine(col("qe"), col("ce")), 4))
          .groupBy(col("query_id"), col("cell"))
          .agg(topk(col("sim").isNull, coalesce(col("sim"), lit(0.0d)),
            col("neighbor_id")).as("tk"))
          .select(col("query_id"), col("cell"), explode(col("tk.items")).as("it"))
          .select(col("query_id"), col("cell"), col("it.k").as("neighbor_id"),
            when(col("it.ns"), lit(null).cast("double")).otherwise(col("it.s")).as("sim"))
      }
      Seq(false -> "HOF", true -> "STATIC").foreach { case (st, tag) =>
        val op = top5With(st).queryExecution.optimizedPlan
        op.collect { case n =>
          val s = n.simpleString(Int.MaxValue)
          val cos = "graft_cosine\\(".r.findAllIn(s).size
          if (cos > 0) println(s"[probe] ivfbisect optplan $tag ${n.nodeName} cosines=$cos len=${s.length}")
        }
        val pp = top5With(st).queryExecution.executedPlan
        finalPlans(pp).foreach { n =>
          val s = n.simpleString(Int.MaxValue)
          val cos = "graft_cosine\\(".r.findAllIn(s).size
          if (cos > 0 || n.nodeName.contains("Join"))
            println(s"[probe] ivfbisect physplan $tag ${n.nodeName} cosines=$cos len=${s.length}")
        }
      }
      time("ivfbisect assignment HOF", 2) { evalAll(assignedWith(false)) }
      time("ivfbisect assignment STATIC", 2) { evalAll(assignedWith(true)) }
      time("ivfbisect top5 HOF", 2) { evalAll(top5With(false)) }
      time("ivfbisect top5 STATIC", 2) { evalAll(top5With(true)) }
    }

    // ------------------------------------------------------------ trimmed
    if (which("trimmed")) {
      // pass-1 only: the per-priority fence-grid aggregate
      val price = col("o_totalprice")
      val grid = lit((0 to 1000).map(_ / 1000.0).toArray)
      def pass1: DataFrame = Tables.orders(spark, d)
        .select(col("o_orderpriority"), price)
        .groupBy(col("o_orderpriority").as("pr"))
        .agg(count(lit(1)).as("n"),
          Exact.sumDec(price).as("total"),
          percentile_approx(price, grid, lit(10000)).as("fences"))
      time("trimmed pass1 only (fence grid agg)") { pass1.count() }
      time("trimmed full (registered)") {
        SparkEntry.queries("agg_trimmed_mean")(spark, d).count()
      }
    }

    spark.stop()
  }
}
