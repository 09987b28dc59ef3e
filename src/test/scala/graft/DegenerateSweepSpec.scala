package graft

import java.nio.file.Files

/** Whole-surface degenerate sweep (round-8 hardening): run EVERY
  * registered query against the three adversarial table sets in
  * [[DegenTables]] (tiny / empty / NULL-laden) and assert none throws.
  * This is the shotgun that would have caught all four of round 8's
  * crash classes (ANSI divide-by-zero in ten closed forms, the
  * quantizer's zero dynamic range, out-of-bounds element_at on short
  * docs, the Benford "-" cast) before a user hit them.
  *
  * No output values are asserted here — value-level parity on the same
  * three sets is the round-9 oracle sweep (tools/degen_preflight.sh →
  * DEGENERATE_PREFLIGHT_r09.log); this suite pins only "no input shaped
  * like this kills the job", cheaply, on every `sbt test`.
  */
class DegenerateSweepSpec extends SparkSpec {

  private def sweep(dir: String): Seq[(String, String)] =
    Registry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try { q(spark, dir).collect(); None }
      catch { case e: Throwable =>
        Some(name -> e.toString.linesIterator.take(1).mkString) }
    }

  test("every registered query survives the tiny degenerate tables") {
    val d = Files.createTempDirectory("graft-degen-tiny-").toString
    DegenTables.writeTiny(spark, d)
    val failures = sweep(d)
    assert(failures.isEmpty,
      s"queries crashed on degenerate rows:\n${failures.mkString("\n")}")
  }

  test("every registered query survives completely empty tables") {
    val d = Files.createTempDirectory("graft-degen-empty-").toString
    DegenTables.writeEmpty(spark, d)
    val failures = sweep(d)
    assert(failures.isEmpty,
      s"queries crashed on empty tables:\n${failures.mkString("\n")}")
  }

  /** Third variant: one row per table with NULL in every non-key column
    * (keys stay non-null so joins still resolve), plus one healthy row so
    * aggregates see data. split(NULL), explode(NULL), percentile over
    * NULL-heavy groups, NULL timestamps through window sorts — the shapes
    * a 100 TB ingest WILL eventually contain.
    */
  test("every registered query survives NULLs in all non-key columns") {
    val d = Files.createTempDirectory("graft-degen-null-").toString
    DegenTables.writeNulls(spark, d)
    val failures = sweep(d)
    assert(failures.isEmpty,
      s"queries crashed on NULL-laden rows:\n${failures.mkString("\n")}")
  }

  /** Fourth variant (round 10): multibyte text — accents, CJK, non-BMP
    * emoji (4-byte UTF-8 / surrogate pairs), combining marks, final-sigma
    * casing, RTL — through every tokenizer, regex, hash, and dedup path.
    * A web-scale corpus is full of this; the ASCII driver fixtures never
    * reach it. Value-level cross-engine parity on the same set is the
    * degen_preflight.sh oracle sweep.
    */
  test("every registered query survives multibyte unicode text") {
    val d = Files.createTempDirectory("graft-degen-unicode-").toString
    DegenTables.writeUnicode(spark, d)
    val failures = sweep(d)
    assert(failures.isEmpty,
      s"queries crashed on unicode text:\n${failures.mkString("\n")}")

    // Seam companions (house teeth convention): the fixture must keep the
    // shapes the set exists for — an edit can't silently defang the sweep.
    val texts = spark.read.parquet(s"$d/documents.parquet")
      .select("text").collect().flatMap(r => Option(r.getString(0)))
    assert(texts.exists(_.exists(_.isSurrogate)),
      "fixture lost its non-BMP (surrogate-pair) text")
    assert(texts.exists(_.contains('́')),
      "fixture lost its combining-mark text")
    assert(texts.exists(t => t.contains('Σ') && t.contains('ς')),
      "fixture lost the capital-sigma/final-sigma casing context")
    assert(texts.exists(_.exists(c => c >= '֐' && c <= '׿')),
      "fixture lost its RTL Hebrew text")
    assert(texts.exists(_.exists(c => c >= '぀' && c <= '鿿')),
      "fixture lost its CJK text")
    assert(texts.groupBy(identity).exists(_._2.length > 1),
      "fixture lost the exact-duplicate unicode pair")
    assert(texts.exists(t => t.getBytes("UTF-8").length > t.codePointCount(0, t.length)),
      "fixture lost multibyte text entirely (bytes == code points everywhere)")
  }
}
