package graft

import java.nio.file.Files

/** Tie-break + pruning pin for the language-ID pair (VERDICT r07 #4).
  * `text_langid` / `text_langid_chargram` guess each queried doc as the
  * language profile with the largest distinct-term overlap, ties broken
  * toward the LEXICOGRAPHICALLY SMALLER lang, with the guess side pruned
  * to `doc_id < 100` before the profile join while the profile itself
  * aggregates the WHOLE corpus. Only the fixture distribution exercised
  * either clause. This spec drives the registered query bodies over a
  * constructed corpus where:
  *
  *  - the tie doc's top overlap is shared by two langs AND the smaller
  *    lang is NOT the doc's own label — so "prefer own lang" or "larger
  *    lang wins" implementations go red, not just "no tie-break";
  *  - every profile term of the winning lang originates from doc_id >=
  *    100 docs — so building the profile AFTER the prune (the commute
  *    direction that is NOT valid) changes the guess and goes red, and
  *    dropping the prune emits extra rows and goes red.
  *
  * Expected values come from an independent plain-Scala replica of the
  * whole profile → overlap → argmax pipeline (top-K by (count desc, term
  * asc), inner-join semantics: a doc overlapping no profile emits no row).
  */
class LangidTieSpec extends SparkSpec {

  /** (doc_id, text, lang, source) — source is unused by both queries but
    * part of the documents schema.
    */
  private type Doc = (Long, String, String, String)

  /** Independent reference: per-lang top-K profile over per-doc-distinct
    * terms, then per queried doc the max-overlap lang, ties to smaller.
    */
  private def reference(docs: Seq[Doc], terms: String => Seq[String],
      topK: Int): Seq[(Long, String, Long)] = {
    val termRows = docs.flatMap { case (id, text, lang, _) =>
      terms(text).distinct.map(t => (id, lang, t)) }
    val profile: Map[String, Set[String]] = termRows
      .groupBy(_._2).map { case (lang, rows) =>
        lang -> rows.groupBy(_._3).map { case (t, rs) => (t, rs.size) }.toSeq
          .sortBy { case (t, cnt) => (-cnt, t) }.take(topK).map(_._1).toSet
      }
    docs.filter(_._1 < 100).flatMap { case (id, text, _, _) =>
      val ts = terms(text).distinct.toSet
      val overlaps = profile.toSeq
        .map { case (lang, p) => (lang, (ts & p).size.toLong) }
        .filter(_._2 > 0)
      if (overlaps.isEmpty) None
      else Some {
        val best = overlaps.map(_._2).max
        val lang = overlaps.filter(_._2 == best).map(_._1).min
        (id, lang, best)
      }
    }.sortBy(_._1)
  }

  /** Seam companion: red if the constructed corpus stops exercising the
    * clauses this spec exists to pin.
    */
  private def assertSeams(docs: Seq[Doc], terms: String => Seq[String],
      topK: Int, expected: Seq[(Long, String, Long)]): Unit = {
    // 1. The tie is engaged AND resolves AWAY from the doc's own label.
    val termRows = docs.flatMap { case (id, text, lang, _) =>
      terms(text).distinct.map(t => (id, lang, t)) }
    val profile = termRows.groupBy(_._2).map { case (lang, rows) =>
      lang -> rows.groupBy(_._3).map { case (t, rs) => (t, rs.size) }.toSeq
        .sortBy { case (t, cnt) => (-cnt, t) }.take(topK).map(_._1).toSet }
    val tiePinned = docs.filter(_._1 < 100).exists { case (id, text, own, _) =>
      val ts = terms(text).distinct.toSet
      val ovl = profile.toSeq.map { case (l, p) => (l, (ts & p).size) }.filter(_._2 > 0)
      val best = if (ovl.isEmpty) 0 else ovl.map(_._2).max
      val winners = ovl.filter(_._2 == best).map(_._1)
      winners.size >= 2 && winners.min != own
    }
    assert(tiePinned, "no queried doc ties across ≥2 profiles with the " +
      "winner differing from its own label — tie seam defanged")
    // 2. Profiles built from the full corpus differ from profiles built
    //    from the pruned (doc_id < 100) corpus alone, so the prune-before-
    //    profile commute error cannot silently pass.
    val prunedProfile = docs.filter(_._1 < 100)
      .flatMap { case (id, text, lang, _) => terms(text).distinct.map(t => (lang, t)) }
      .groupBy(_._1).map { case (l, rs) => l -> rs.map(_._2).toSet }
    assert(profile != prunedProfile,
      "full-corpus and pruned-corpus profiles coincide — pruning seam defanged")
    // 3. Docs at/above the prune boundary exist and none appears in output.
    assert(docs.exists(_._1 >= 100L))
    assert(expected.forall(_._1 < 100L))
  }

  private def run(name: String, docs: Seq[Doc]): Seq[(Long, String, Long)] = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-langid-tie-").toString
    docs.toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    Registry.queries(name)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
  }

  test("text_langid: equal-overlap tie goes to the smaller lang, not the " +
    "doc's own; profiles see the whole corpus") {
    // doc 0 (labeled bb): terms {w1, w3}. Profile aa = {w1, w3} (docs 100+
    // only); profile bb = {w1, w3, w4} (docs 110+ plus doc 0 itself).
    // Overlap aa = overlap bb = 2 → guess "aa" ≠ own label "bb".
    // doc 1 (labeled aa): term {w4} overlaps aa and bb at 1 → tie → "aa".
    val docs: Seq[Doc] = Seq(
      (0L, "w1 w3", "bb", "s0"),
      (1L, "w4 w4", "aa", "s0"),
      (100L, "w1 w3", "aa", "s1"), (101L, "w1 w3", "aa", "s1"),
      (110L, "w3 w4", "bb", "s1"), (111L, "w3 w4", "bb", "s1"))
    val words = (t: String) => t.split(" ").toSeq
    val expected = reference(docs, words, topK = 20)
    assertSeams(docs, words, topK = 20, expected)
    assert(expected === Seq((0L, "aa", 2L), (1L, "aa", 1L)))
    assert(run("text_langid", docs) === expected)
  }

  test("text_langid_chargram: equal-overlap tie goes to the smaller lang, " +
    "not the doc's own; profiles see the whole corpus") {
    // Same construction at trigram grain: doc 0 (labeled bb) shares ALL
    // five of its trigrams with both the aa profile (docs 100+, identical
    // text) and the bb profile (docs 110+ ∪ doc 0's own grams) → tie →
    // guess "aa" ≠ own label "bb".
    val docs: Seq[Doc] = Seq(
      (0L, "abc xyz", "bb", "s0"),
      (1L, "qrs", "aa", "s0"),
      (100L, "abc xyz", "aa", "s1"), (101L, "abc xyz", "aa", "s1"),
      (110L, "xyz qrs", "bb", "s1"), (111L, "xyz qrs", "bb", "s1"))
    // Replica of transform(sequence(1, greatest(length-2, 1)), substring):
    // positions are 1-based and the final 1-2 chars of short texts yield
    // shorter grams, exactly as SQL substring does.
    val grams = (t: String) => (1 to math.max(t.length - 2, 1))
      .map(i => t.substring(i - 1, math.min(i + 2, t.length)))
    val expected = reference(docs, grams, topK = 30)
    assertSeams(docs, grams, topK = 30, expected)
    assert(expected.head === ((0L, "aa", 5L)))
    assert(run("text_langid_chargram", docs) === expected)
  }
}
