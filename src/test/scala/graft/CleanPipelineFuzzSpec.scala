package graft

import java.nio.file.Files

/** Long-tail boundary pins (round-8 depth): `text_clean_pipeline`,
  * `text_remove_stopwords`, `text_ngram`, `win_lag_lead`.
  *
  *  - the clean pipeline keeps docs with EXACTLY 10 tokens (>=) but drops
  *    a doc at EXACTLY the 30% stopword ratio (the strict integer-
  *    arithmetic compare: 3·100 < 10·30 is false); identical texts with
  *    different langs dedup to MIN(doc_id) and MIN(lang) — the
  *    partition-order-independence clause;
  *  - an all-stopword doc cleans to the EMPTY string with every token
  *    counted as removed;
  *  - the bigram top-20 cut inside an all-equal-count tie keeps the 20
  *    alphabetically smallest bigrams; 1-token docs contribute none;
  *  - lag/lead are NULL at both partition edges and both NULL for a
  *    single-event user.
  */
class CleanPipelineFuzzSpec extends SparkSpec {

  test("text_clean_pipeline: token cut inclusive at 10, stopword ratio " +
    "strict at 30%, min-lang dedup") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-clean-fuzz-").toString
    val tenClean = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10" // 10 toks, 0 stop → in
    val docs = Seq(
      (10L, tenClean, "bb"), // exactly 10 tokens → kept
      (11L, "w1 w2 w3 w4 w5 w6 w7 w8 w9", "aa"), // 9 tokens → dropped
      (12L, "the a an w1 w2 w3 w4 w5 w6 w7", "aa"), // 3/10 = exactly 30% → dropped
      (13L, "the a w1 w2 w3 w4 w5 w6 w7 w8", "aa"), // 2/10 = 20% → kept
      (14L, tenClean, "aa")) // identical to doc 10, smaller lang
    docs.map { case (id, t, l) => (id, t, l, "s0") }
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d/documents.parquet")
    val got = Registry.queries("text_clean_pipeline")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // Survivors: doc 13 (aa) and the deduped tenClean pair → MIN(doc_id)=10,
    // MIN(lang)="aa" — so BOTH survivors land in lang aa, none in bb.
    assert(got === Seq(("aa", 2L, 20L)),
      "10-token cut must include, 30%-ratio must exclude, dedup must take min lang")
  }

  test("text_remove_stopwords: an all-stopword doc cleans to the empty string") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-stop-fuzz-").toString
    Seq((0L, "the a an and", "en", "s0"), (1L, "quick the fox", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d/documents.parquet")
    val got = Registry.queries("text_remove_stopwords")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((0L, "", 4L), (1L, "quick fox", 1L)))
  }

  test("text_ngram: the top-20 cut inside an all-equal tie keeps the " +
    "alphabetically smallest bigrams; 1-token docs contribute nothing") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-ngram-fuzz-").toString
    // 22 distinct two-token docs → 22 bigrams, each count 1; plus a
    // 1-token doc (no bigram).
    val pairs = ('a' to 'v').map(c => s"t$c u$c")
    val docs = pairs.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      ((99L, "solo"))
    docs.map { case (id, t) => (id, t, "en", "s0") }
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d/documents.parquet")
    val expected = pairs.sorted.take(20).map(b => (b, 1L))
    val got = Registry.queries("text_ngram")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("win_lag_lead: NULL at both partition edges, both NULL for a " +
    "single-event user") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-lag-fuzz-").toString
    val base = 1704067200L * 1000000000L
    Seq((1L, 1L, 10.0), (2L, 1L, 20.0), (3L, 1L, 30.0), (4L, 2L, 7.5))
      .map { case (id, u, v) => (id, base + id * 1000000000L, u, v) }
      .toDF("event_id", "ts", "user_id", "value")
      .write.parquet(s"$d/events.parquet")
    def opt(r: org.apache.spark.sql.Row, i: Int) =
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    val got = Registry.queries("win_lag_lead")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), opt(r, 3), opt(r, 4))).toSeq
    assert(got === Seq(
      (1L, 1L, 10.0, None, Some(20.0)),
      (1L, 2L, 20.0, Some(10.0), Some(30.0)),
      (1L, 3L, 30.0, Some(20.0), None),
      (2L, 4L, 7.5, None, None)))
  }
}
