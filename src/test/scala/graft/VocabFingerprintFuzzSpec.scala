package graft

import java.nio.file.Files

/** Differential fuzz for the corpus-accounting recipes (round-8 depth):
  * `text_vocab_growth` and `text_fingerprint`.
  *
  *  - vocab growth counts tokens with `first_doc < checkpoint` STRICTLY —
  *    a token first seen in doc 8 is invisible at checkpoint 8 and
  *    appears at 16; the same token in two langs counts once per lang;
  *  - the fingerprint weights each token hash by its 1-based position, so
  *    two ANAGRAM docs (same token multiset, different order) must
  *    fingerprint differently while identical docs collide; single-char
  *    tokens (first char == last char) and empty tokens from a double
  *    space exercise the hash's degenerate inputs.
  */
class VocabFingerprintFuzzSpec extends SparkSpec {

  test("text_vocab_growth: strict checkpoint boundary and per-lang isolation") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-vocab-fuzz-").toString
    // "edge" first appears in doc 8 exactly (a checkpoint value);
    // "early" in doc 0; "shared" in BOTH langs (counts once per lang);
    // "late" first in doc 31 (visible only at checkpoint 32).
    val docs = Seq(
      (0L, "early shared", "aa"), (5L, "early edge2", "aa"),
      (8L, "edge shared", "aa"), (31L, "late", "aa"),
      (1L, "shared", "bb"), (9L, "bonly", "bb"))
    docs.map { case (id, t, l) => (id, t, l, "s0") }
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d/documents.parquet")

    val firstDoc = docs.flatMap { case (id, t, l) => t.split(" ").map(tok => (l, tok, id)) }
      .groupBy { case (l, tok, _) => (l, tok) }
      .map { case ((l, tok), g) => (l, tok, g.map(_._3).min) }
    val cps = Seq(1L, 2L, 4L, 8L, 16L, 32L)
    val expected = firstDoc.map(_._1).toSeq.distinct.sorted.flatMap { l =>
      cps.map(cp =>
        (l, cp, firstDoc.count { case (l2, _, fd) => l2 == l && fd < cp }.toLong))
    }
    // Seam companions: "edge" (first_doc 8) is NOT in aa's checkpoint-8
    // vocab but IS in 16; "late" appears only at 32.
    val aa = expected.filter(_._1 == "aa").map(e => e._2 -> e._3).toMap
    assert(aa(8L) == aa(4L) + 1 && aa(16L) == aa(8L) + 1,
      "strict-< boundary seam lost (doc-5 and doc-8 tokens must split 8 vs 16)")
    assert(aa(32L) == aa(16L) + 1, "late token must appear only at 32")
    val got = Registry.queries("text_vocab_growth")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("text_fingerprint: position-weighted hash separates anagrams, " +
    "collides identical docs, survives degenerate tokens") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-fp-fuzz-").toString
    val docs = Seq(
      (0L, "alpha beta gamma"), (1L, "gamma beta alpha"), // anagrams
      (2L, "alpha beta gamma"), // identical to doc 0
      (3L, "x"), // single single-char token
      (4L, "a  b")) // double space → empty middle token
    docs.map { case (id, t) => (id, t, "en", "s0") }
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d/documents.parquet")

    def h(tok: String): Long =
      if (tok.isEmpty) 0L
      else (tok.head.toLong * 8191L + tok.reverse.head.toLong * 131L +
        tok.length * 17L) % 65536L
    val expected = docs.map { case (id, t) =>
      val fp = t.split(" ", -1).zipWithIndex
        .map { case (tok, pos) => h(tok) * (pos + 1L) }.sum % 2147483648L
      (id, fp)
    }.sortBy(_._1)
    assert(expected(0)._2 != expected(1)._2,
      "anagram docs must fingerprint differently (position weighting)")
    assert(expected(0)._2 == expected(2)._2, "identical docs must collide")
    val got = Registry.queries("text_fingerprint")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
  }
}
