package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-22 value-parity pins for the profile-top-k window→TopKTerms
  * rewrites (VERDICT r21 #7): text_term_freq / text_langid /
  * text_langid_chargram replaced the r16 two-phase prof_pid-salted
  * row_number window pair with the bounded string-keyed TopKTerms
  * aggregate. Each test restates the r21 window body INLINE over the
  * same fixture tables and asserts the registered query returns exactly
  * the same rows — the IvfParitySpec discipline. The comparator itself
  * (code-point order = Spark UTF8String sort order, diverging from Java
  * UTF-16 code-unit order above the BMP) is fuzzed against Spark's own
  * window sort on constructed astral-plane terms.
  */
class ProfileTopKParitySpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(r =>
      (0 until r.length).map(i => Option(r.get(i)).map(_.toString).getOrElse("NULL")))
      .sortBy(_.mkString("|"))

  test("text_term_freq equals the r21 two-phase window formulation") {
    val wLocal = Window.partitionBy(col("lang"), col("prof_pid"))
      .orderBy(col("cnt").desc, col("term"))
    val w = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("term"))
    val oldBody = Tables.documents(spark, sf0001)
      .select(col("lang"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("prof_pid", spark_partition_id())
      .withColumn("lrn", row_number().over(wLocal))
      .filter(col("lrn") <= 10)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 10)
      .drop("prof_pid", "lrn")
    val got = rows(Registry.queries("text_term_freq")(spark, sf0001))
    val want = rows(oldBody)
    assert(got.nonEmpty && got == want,
      s"TopKTerms formulation diverged from the window formulation\n got=$got\nwant=$want")
  }

  /** The r21 window profile at arbitrary K, for the two langid tests. */
  private def windowProfile(terms: DataFrame, key: String, k: Int): DataFrame = {
    val wLocal = Window.partitionBy(col("plang"), col("prof_pid"))
      .orderBy(col("cnt").desc, col(key))
    val wProf = Window.partitionBy(col("plang")).orderBy(col("cnt").desc, col(key))
    terms.groupBy(col("lang").as("plang"), col(key))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("prof_pid", spark_partition_id())
      .withColumn("lrn", row_number().over(wLocal))
      .filter(col("lrn") <= k)
      .withColumn("prn", row_number().over(wProf))
      .filter(col("prn") <= k)
      .select("plang", key)
  }

  test("text_langid equals the r21 two-phase window-profile formulation") {
    val docs = Tables.documents(spark, sf0001)
    val terms = docs.select(col("doc_id"), col("lang"),
      explode(array_distinct(split(col("text"), " "))).as("term"))
    val profile = windowProfile(terms, "term", 20)
    val wGuess = Window.partitionBy(col("doc_id")).orderBy(col("overlap").desc, col("plang"))
    val oldBody = terms.filter(col("doc_id") < 100)
      .join(broadcast(profile), "term")
      .groupBy(col("doc_id"), col("plang"))
      .agg(count(lit(1)).as("overlap"))
      .withColumn("grn", row_number().over(wGuess))
      .filter(col("grn") === 1)
      .select(col("doc_id"), col("plang").as("guess_lang"), col("overlap"))
    val got = rows(Registry.queries("text_langid")(spark, sf0001))
    val want = rows(oldBody)
    assert(got.nonEmpty && got == want,
      s"langid TopKTerms profile diverged from the window profile\n got=$got\nwant=$want")
  }

  test("text_langid_chargram equals the r21 two-phase window-profile formulation") {
    val docs = Tables.documents(spark, sf0001)
    val ch = split(col("text"), "")
    val triExpr =
      """CASE WHEN length(text) < 3 THEN array(text) ELSE
        |  zip_with(
        |    slice(ch, 1, size(ch) - 2),
        |    zip_with(slice(ch, 2, size(ch) - 2), slice(ch, 3, size(ch) - 2),
        |             (b, c) -> concat(b, c)),
        |    (a, bc) -> concat(a, bc)) END""".stripMargin
    val grams = docs
      .select(col("doc_id"), col("lang"), col("text"), ch.as("ch"))
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(expr(triExpr))).as("gram"))
    val profile = windowProfile(grams, "gram", 30)
    val wGuess = Window.partitionBy(col("doc_id")).orderBy(col("overlap").desc, col("plang"))
    val oldBody = grams.filter(col("doc_id") < 100)
      .join(broadcast(profile), "gram")
      .groupBy(col("doc_id"), col("plang"))
      .agg(count(lit(1)).as("overlap"))
      .withColumn("grn", row_number().over(wGuess))
      .filter(col("grn") === 1)
      .select(col("doc_id"), col("plang").as("guess_lang"), col("overlap"))
    val got = rows(Registry.queries("text_langid_chargram")(spark, sf0001))
    val want = rows(oldBody)
    assert(got.nonEmpty && got == want,
      s"chargram TopKTerms profile diverged from the window profile\n got=$got\nwant=$want")
  }

  test("TopKTerms code-point comparator matches Spark's string sort above the BMP") {
    import spark.implicits._
    // The divergence case: a supplementary character (🚀 = U+1F680,
    // UTF-16 D83D DE80) sorts BELOW U+E000/U+FFFF in Java code-unit
    // order but ABOVE them in code points / UTF-8 bytes — Spark sorts
    // the latter way. Exercise ties at every boundary plus prefixes.
    val terms = Seq("a", "ab", "a￿", "a", "a🚀", "🚀", "￿",
      "", "", "z", "za", "🚀🚀", "🚀a", "a🚀b")
    val rows0 = for {
      (t, i) <- terms.zipWithIndex
      lang <- Seq("l1", "l2")
    } yield (lang, t, (i % 3 + 1).toLong) // planted count ties
    val df = rows0.toDF("lang", "term", "cnt")
    val w = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("term"))
    val want = rows(df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 10).select("lang", "term", "cnt", "rn"))
    val topk = graft.functions.TopKTerms.top10
    val got = rows(df.groupBy(col("lang"))
      .agg(topk(col("cnt"), col("term")).as("tk"))
      .select(col("lang"), posexplode(col("tk.items")).as(Seq("pos", "it")))
      .select(col("lang"), col("it.t").as("term"), col("it.c").as("cnt"),
        (col("pos") + 1).cast("long").as("rn")))
    assert(got == want,
      s"comparator diverged from Spark's sort\n got=$got\nwant=$want")
  }
}
