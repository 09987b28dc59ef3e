package graft

import org.apache.spark.sql.SparkSession

/** Scratch measurement harness for round-21 optimization probes (not part
  * of any suite; run via Test/runMain). Times labelled thunks solo.
  */
object R21Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries.get("scan_full").foreach(fn => fn(spark, d).count())

    def time(tag: String)(f: => Long): Unit = (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag%-40s run$r ${(System.nanoTime() - t0) / 1e9}%8.3fs rows=$n")
    }

    Tables.orders(spark, d).createOrReplaceTempView("o")

    // A: the registered linear recursion, full query
    time("recursive_full (registered shape)") {
      spark.sql("""WITH RECURSIVE k(i) AS (
        |  SELECT 0 UNION ALL SELECT i + 1 FROM k WHERE i < 90),
        |b AS (SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS mn,
        |             CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS mx
        |      FROM o),
        |months AS (
        |  SELECT add_months(mn, i) AS month
        |  FROM b JOIN k ON add_months(mn, i) <= mx)
        |SELECT m.month, COUNT(o.o_orderkey) AS n_orders
        |FROM months m LEFT JOIN o
        |  ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = m.month
        |GROUP BY m.month ORDER BY m.month""".stripMargin).count()
    }

    // B: just the 91-step linear recursion alone
    time("recursion_linear_alone") {
      spark.sql("""WITH RECURSIVE k(i) AS (
        |  SELECT 0 UNION ALL SELECT i + 1 FROM k WHERE i < 90)
        |SELECT COUNT(*) FROM k""".stripMargin).collect()(0).getLong(0)
    }

    // C: doubling recursion alone (O(log n) iterations)
    time("recursion_doubling_alone") {
      spark.sql("""WITH RECURSIVE k0(i, lvl) AS (
        |  SELECT 0, 1
        |  UNION ALL
        |  SELECT i + d * lvl, lvl * 2 FROM k0
        |  JOIN (SELECT explode(array(0, 1)) AS d) v
        |  WHERE i + d * lvl <= 90 AND lvl <= 90)
        |SELECT COUNT(*) FROM (SELECT DISTINCT i FROM k0)""".stripMargin)
        .collect()(0).getLong(0)
    }

    // D: full query with doubling recursion
    time("recursive_full (doubling shape)") {
      spark.sql("""WITH RECURSIVE k0(i, lvl) AS (
        |  SELECT 0, 1
        |  UNION ALL
        |  SELECT i + d * lvl, lvl * 2 FROM k0
        |  JOIN (SELECT explode(array(0, 1)) AS d) v
        |  WHERE i + d * lvl <= 90 AND lvl <= 90),
        |k AS (SELECT DISTINCT i FROM k0),
        |b AS (SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS mn,
        |             CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS mx
        |      FROM o),
        |months AS (
        |  SELECT add_months(mn, i) AS month
        |  FROM b JOIN k ON add_months(mn, i) <= mx)
        |SELECT m.month, COUNT(o.o_orderkey) AS n_orders
        |FROM months m LEFT JOIN o
        |  ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = m.month
        |GROUP BY m.month ORDER BY m.month""".stripMargin).count()
    }

    // F: full query with TWO small recursions (i = a*13 + b, a in 0..6,
    // b in 0..12 — 18 sequential iterations instead of 91)
    time("recursive_full (split 7x13 shape)") {
      spark.sql("""WITH RECURSIVE ka(a) AS (
        |  SELECT 0 UNION ALL SELECT a + 1 FROM ka WHERE a < 6),
        |kb(bb) AS (
        |  SELECT 0 UNION ALL SELECT bb + 1 FROM kb WHERE bb < 12),
        |k(i) AS (SELECT a * 13 + bb FROM ka JOIN kb),
        |b AS (SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS mn,
        |             CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS mx
        |      FROM o),
        |months AS (
        |  SELECT add_months(mn, i) AS month
        |  FROM b JOIN k ON add_months(mn, i) <= mx)
        |SELECT m.month, COUNT(o.o_orderkey) AS n_orders
        |FROM months m LEFT JOIN o
        |  ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = m.month
        |GROUP BY m.month ORDER BY m.month""".stripMargin).count()
    }

    // G: trigram generation — substring-per-position vs split-once
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, d)
    val subGrams = docs.select(col("doc_id"), col("lang"),
      explode(array_distinct(expr(
        "transform(sequence(1, greatest(length(text) - 2, 1)), i -> substring(text, i, 3))")))
        .as("gram"))
    val splitGrams = docs.select(col("doc_id"), col("lang"),
      explode(array_distinct(expr(
        """transform(sequence(1, greatest(size(split(text, '')) - 2, 1)),
          |  i -> concat(element_at(split(text, ''), i),
          |              element_at(split(text, ''), i + 1),
          |              element_at(split(text, ''), i + 2)))""".stripMargin)))
        .as("gram"))
    val zipGrams = docs
      .select(col("doc_id"), col("lang"), split(col("text"), "").as("ch"))
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(expr(
          """zip_with(
            |  slice(ch, 1, greatest(size(ch) - 2, 1)),
            |  zip_with(slice(ch, 2, greatest(size(ch) - 2, 1)),
            |           slice(ch, 3, greatest(size(ch) - 2, 1)),
            |           (b, c) -> concat(b, c)),
            |  (a, bc) -> concat(a, bc))""".stripMargin))).as("gram"))
    time("grams_substring") { subGrams.groupBy("lang", "gram").count().count() }
    time("grams_split_elementat") { splitGrams.groupBy("lang", "gram").count().count() }
    time("grams_split_zipwith") { zipGrams.groupBy("lang", "gram").count().count() }
    time("grams_substring_vs_zip_diff") {
      subGrams.exceptAll(zipGrams).union(zipGrams.exceptAll(subGrams)).count()
    }

    // H: astral/multibyte parity of substring-grams vs split-zip-grams
    {
      val s2 = spark
      import s2.implicits._
      val uni = Seq(
        (0L, "héllo wörld héllo wörld naïve", "fr"),
        (2L, "日本語 テキスト 処理 日本語 処理", "ja"),
        (3L, "emoji 🌍🌍 test 🚀 emoji", "en"),
        (4L, "étoile étoile", "fr"),
        (5L, "STRASSE straße ΣΊΣΥΦΟΣ σίσυφος", "de"),
        (6L, "שלום עולם hello world", "he"),
        (7L, "ab", "en"), (8L, "", "en"), (9L, "🚀", "en"))
        .toDF("doc_id", "text", "lang")
      val a = uni.select(col("doc_id"),
        explode(array_distinct(expr(
          "transform(sequence(1, greatest(length(text) - 2, 1)), i -> substring(text, i, 3))")))
          .as("gram"))
      val b2 = uni
        .select(col("doc_id"), split(col("text"), "").as("ch"))
        .select(col("doc_id"),
          explode(array_distinct(expr(
            """zip_with(
              |  slice(ch, 1, greatest(size(ch) - 2, 1)),
              |  zip_with(slice(ch, 2, greatest(size(ch) - 2, 1)),
              |           slice(ch, 3, greatest(size(ch) - 2, 1)),
              |           (b, c) -> concat(b, c)),
              |  (a, bc) -> concat(a, bc))""".stripMargin))).as("gram"))
      val diff = a.exceptAll(b2).union(b2.exceptAll(a))
      println(s"[probe] astral_gram_diff rows=${diff.count()}")
      diff.collect().take(20).foreach(r => println(s"[probe]   diff: $r"))
      println(s"[probe] split_of_rocket = " +
        uni.filter(col("doc_id") === 9).select(split(col("text"), "")).collect()
          .map(_.getSeq[String](0).map(s => s.codePoints().toArray.mkString("+")).mkString("[", ",", "]")).mkString)
    }

    // I: IVF assignment — aggregate (default/raised fallback) vs per-row
    // HOF argmax over a collected centroid array
    {
      val e = Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cent_id"), col("emb").as("cent"))
      def aggAssign() = {
        val top1 = graft.functions.TopKNeighbors.top1
        e.crossJoin(broadcast(cents))
          .withColumn("csim", Exact.roundN(graft.llm.Similarity.cosine(col("emb"), col("cent")), 4))
          .groupBy(col("vec_id"), col("emb"))
          .agg(top1(col("csim").isNull, coalesce(col("csim"), lit(0.0d)), col("cent_id")).as("tk"))
          .select(col("vec_id"), col("emb"), col("tk.items")(0)("k").as("cell"))
      }
      val centsArr = cents.agg(
        sort_array(collect_list(struct(col("cent_id"), col("cent")))).as("cents"))
      def hofAssign() = {
        val best = aggregate(col("cents"),
          struct(lit(-1L).as("cid"), lit(null).cast("double").as("cs")),
          (b, c) => {
            val cs = Exact.roundN(graft.llm.Similarity.cosine(col("emb"), c("cent")), 4)
            when(b("cid") === -1L ||
              (cs.isNotNull && (b("cs").isNull || cs > b("cs"))),
              struct(c("cent_id").as("cid"), cs.as("cs"))).otherwise(b)
          })
        e.crossJoin(broadcast(centsArr))
          .filter(size(col("cents")) > 0)
          .select(col("vec_id"), col("emb"), best("cid").as("cell"))
      }
      def evalCells(df: org.apache.spark.sql.DataFrame): Long =
        df.groupBy(col("cell")).agg(count(lit(1))).count()
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
      time("ivf_assign_agg_fallback128") { evalCells(aggAssign()) }
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      time("ivf_assign_agg_fallback1M") { evalCells(aggAssign()) }
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
      time("ivf_assign_hof_argmax") { evalCells(hofAssign()) }
      // parity: HOF argmax vs aggregate pick
      val a1 = aggAssign().select("vec_id", "cell")
      val a2 = hofAssign().select("vec_id", "cell")
      println(s"[probe] ivf_assign_diff rows=${a1.exceptAll(a2).union(a2.exceptAll(a1)).count()}")
    }

    // J: full IVF top-5 pipeline — HOF-assigned vs agg-assigned
    {
      val e = Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cent_id"), col("emb").as("cent"))
      val centsArr = broadcast(cents
        .agg(sort_array(collect_list(struct(col("cent_id"), col("cent")))).as("cents")))
      def hofAssigned() = {
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
      def aggAssigned() = {
        val top1 = graft.functions.TopKNeighbors.top1
        e.crossJoin(broadcast(cents))
          .withColumn("csim", Exact.roundN(graft.llm.Similarity.cosine(col("emb"), col("cent")), 4))
          .groupBy(col("vec_id"), col("emb"))
          .agg(top1(col("csim").isNull, coalesce(col("csim"), lit(0.0d)), col("cent_id")).as("tk"))
          .select(col("vec_id"), col("emb"), col("tk.items")(0)("k").as("cell"))
      }
      def top5(assigned: org.apache.spark.sql.DataFrame) = {
        val q = broadcast(assigned.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("emb").as("qe"), col("cell")))
        val c = assigned.select(col("vec_id").as("neighbor_id"), col("emb").as("ce"),
          col("cell").as("ccell"))
        val topk = graft.functions.TopKNeighbors.top5
        q.join(c, col("cell") === col("ccell") && col("query_id") =!= col("neighbor_id"))
          .withColumn("sim", Exact.roundN(graft.llm.Similarity.cosine(col("qe"), col("ce")), 4))
          .groupBy(col("query_id"), col("cell"))
          .agg(topk(col("sim").isNull, coalesce(col("sim"), lit(0.0d)), col("neighbor_id")).as("tk"))
          .select(col("query_id"), col("cell"), explode(col("tk.items")).as("it"))
          .select(col("query_id"), col("cell"), col("it.k").as("neighbor_id"),
            when(col("it.ns"), lit(null).cast("double")).otherwise(col("it.s")).as("sim"))
      }
      def evalAll(df: org.apache.spark.sql.DataFrame): Long =
        df.select(xxhash64(df.columns.map(col): _*).as("h"))
          .agg(count(lit(1)).as("n"), expr("bit_xor(h)")).head().getLong(0)
      time("ivftop5_hof_assigned") { evalAll(top5(hofAssigned())) }
      time("ivftop5_agg_assigned") { evalAll(top5(aggAssigned())) }
      time("ivf_assignedonly_hof") { evalAll(hofAssigned()) }
      time("ivf_assignedonly_agg") { evalAll(aggAssigned()) }
    }

    // E: sanity — the two k sets are identical
    time("doubling_equals_linear") {
      spark.sql("""WITH RECURSIVE k(i) AS (
        |  SELECT 0 UNION ALL SELECT i + 1 FROM k WHERE i < 90),
        |k0(i, lvl) AS (
        |  SELECT 0, 1
        |  UNION ALL
        |  SELECT i + d * lvl, lvl * 2 FROM k0
        |  JOIN (SELECT explode(array(0, 1)) AS d) v
        |  WHERE i + d * lvl <= 90 AND lvl <= 90),
        |k2 AS (SELECT DISTINCT i FROM k0)
        |SELECT (SELECT COUNT(*) FROM (SELECT i FROM k EXCEPT SELECT i FROM k2))
        |     + (SELECT COUNT(*) FROM (SELECT i FROM k2 EXCEPT SELECT i FROM k))
        |""".stripMargin).collect()(0).getLong(0)
    }

    spark.stop()
  }
}
