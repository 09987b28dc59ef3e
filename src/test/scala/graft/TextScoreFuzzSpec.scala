package graft

import java.nio.file.Files

/** Differential fuzz for the text-scoring recipes (round-8 depth):
  * `text_tfidf`, `text_term_freq`, `text_quality`, `text_token_count`.
  *
  *  - a term present in EVERY doc has idf = ln(1) = 0 and must score
  *    tfidf 0.0 regardless of its tf; the rank is taken on the ROUNDED
  *    score with a term tie-break, and docs ≥ 50 feed N and df but emit
  *    no rows (the same prune-after-profile commute langid pins);
  *  - term-freq ranks break count ties by term ascending, cut at 10;
  *  - an all-stopword doc scores ratio exactly 1.0, a stopword-free doc
  *    exactly 0.0;
  *  - the regex token count diverges from the whitespace count on
  *    punctuation, digit boundaries and uppercase (excluded by [a-z]).
  */
class TextScoreFuzzSpec extends SparkSpec {

  private def roundN(v: Double, n: Int): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(10, java.math.RoundingMode.HALF_UP)
      .setScale(n, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  private def write(docs: Seq[(Long, String)], dir: String): Unit = {
    import spark.implicits._
    docs.map { case (id, t) => (id, t, "en", "s0") }
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
  }

  test("text_tfidf: everywhere-terms score 0, rank ties break by term, " +
    "docs >= 50 shape df but emit nothing") {
    val d = Files.createTempDirectory("graft-tfidf-fuzz-").toString
    // "common" is in all 4 docs → idf 0 → tfidf 0 despite tf 3 in doc 0.
    // "rare" only in doc 0 → idf ln(4). "tie1"/"tie2" have identical tf
    // and df in doc 1 → equal rounded scores → term order decides.
    // Doc 60 (≥ 50) raises N to 4 and carries "common".
    val docs = Seq(
      (0L, "common common common rare"),
      (1L, "common tie1 tie2"),
      (2L, "common filler2"),
      (60L, "common filler60"))
    write(docs, d)
    val toks = docs.flatMap { case (id, t) => t.split(" ").map(tok => (id, tok)) }
    val n = docs.size.toDouble
    val df = toks.distinct.groupBy(_._2).map { case (t, g) => t -> g.size }
    val expected = toks.filter(_._1 < 50).groupBy(identity).toSeq
      .map { case ((id, t), g) =>
        (id, t, roundN(g.size * math.log(n / df(t)), 4)) }
      .groupBy(_._1).toSeq.flatMap { case (id, g) =>
        g.sortBy { case (_, t, s) => (-s, t) }.take(3).zipWithIndex
          .map { case ((_, t, s), i) => (id, t, s, i + 1L) }
      }.sortBy { case (id, _, _, rn) => (id, rn) }
    // Seam companions.
    assert(expected.exists { case (id, t, s, _) => t == "common" && s == 0.0d },
      "everywhere-term must score exactly 0")
    val doc1 = expected.filter(_._1 == 1L).map(_._2)
    assert(doc1.indexOf("tie1") < doc1.indexOf("tie2"), "term tie-break lost")
    assert(!expected.exists(_._1 >= 50L))
    val got = Registry.queries("text_tfidf")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("text_term_freq: count ties break by term ascending at the cut") {
    val d = Files.createTempDirectory("graft-tf-fuzz-").toString
    // 12 terms all with count 2 → the top-10 cut falls inside one big tie
    // and must keep the 10 alphabetically-smallest terms.
    val terms = ('a' to 'l').map(c => s"t$c")
    write(Seq((0L, terms.mkString(" ")), (1L, terms.mkString(" "))), d)
    val expected = terms.sorted.take(10).zipWithIndex
      .map { case (t, i) => ("en", t, 2L, i + 1L) }
    val got = Registry.queries("text_term_freq")(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("text_quality: all-stopword and stopword-free docs hit the exact " +
    "ratio endpoints") {
    val d = Files.createTempDirectory("graft-quality-fuzz-").toString
    write(Seq(
      (0L, "the a an and"), // ratio 1.0
      (1L, "quick brown fox"), // ratio 0.0
      (2L, "the fox")), d) // ratio 0.5
    val got = Registry.queries("text_quality")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(got === Seq((0L, 4L, 1.0d), (1L, 3L, 0.0d), (2L, 2L, 0.5d)))
  }

  test("text_token_count: regex tokens diverge from whitespace tokens on " +
    "punctuation, digits and case") {
    val d = Files.createTempDirectory("graft-tokcount-fuzz-").toString
    val docs = Seq(
      (0L, "hello,world x42y"), // ws 2; re: hello, world, x, 42, y = 5
      (1L, "UPPER lower"), // ws 2; re: lower only ([a-z] excludes caps) = 1
      (2L, "a  b")) // double space: ws 3 (empty middle); re 2
    write(docs, d)
    val re = "[a-z]+|[0-9]+".r
    val expected = docs.map { case (id, t) =>
      (id, t.split(" ", -1).length.toLong, re.findAllIn(t).size.toLong,
        t.length.toLong) }
    assert(expected.map(_._3) === Seq(5L, 1L, 2L), "regex-vs-ws divergence lost")
    val got = Registry.queries("text_token_count")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
  }
}
