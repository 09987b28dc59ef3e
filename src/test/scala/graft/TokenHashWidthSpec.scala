package graft

import org.apache.spark.sql.functions._

/** ADVICE r18 #1: the portable token-hash recipes must compute in 64-bit.
  *
  * Spark's `ascii()` returns the full CODE POINT of the first character
  * (not a byte), so a token whose first or last char is astral-plane can
  * reach 1,114,111 — and `codepoint * 8191` then exceeds Int.MaxValue.
  * Under this project's ANSI posture that is a job-killing overflow; a
  * non-ANSI wrap would be worse (a silently negative lane, violating the
  * documented non-negative-BIGINT fingerprint invariant and diverging
  * from DuckDB's exact BIGINT arithmetic). The unicode degenerate set
  * never catches this: its emoji sit near U+1F300 (~128k), below the
  * ~262k threshold where the 8191 multiplier overflows 32-bit.
  *
  * Cross-engine parity for these inputs is pinned RECIPE-level here (the
  * expected values are the same lane formulas replayed in Scala Long
  * arithmetic, exactly what the oracle's per-operand CAST(... AS BIGINT)
  * computes) rather than by widening the unicode sweep set — an astral
  * char in `documents` would touch ~30 unrelated text queries whose
  * Java-vs-utf8proc behavior is out of this item's scope.
  */
class TokenHashWidthSpec extends SparkSpec {

  import spark.implicits._

  // U+100000 (Plane 16, private use): a fully valid character whose
  // codepoint 1,048,576 overflows every 32-bit lane multiplier.
  private val astral = new String(Character.toChars(0x100000))
  private val cp = 0x100000L

  // The recipes replayed in Long arithmetic live in the shared
  // TokenHashRefs replica (one test-side copy carries the drive-by-edit
  // teeth; see that object's scaladoc).
  import TokenHashRefs.{tokHash16Ref, tokHash64Ref}

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_astral").toString
    // n_chars carries CODE-POINT counts per the fixture house rule
    // (DegenTables) — text.length would count UTF-16 units and overstate
    // astral chars by one each.
    rows.map { case (id, text) =>
      (id, text, "xx", "s0", text.codePointCount(0, text.length).toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("dedup_simhash survives astral-plane first AND last chars (64-bit lanes)") {
    // Single-token docs: the majority vote of one row IS the token hash,
    // so each fingerprint must equal the Long-replayed recipe exactly.
    val dir = writeDocs(Seq(
      (0L, astral),              // 1-char token: first == last == U+100000
      (1L, s"${astral}abc"),     // astral FIRST char (pre-existing exposure)
      (2L, s"abc$astral")))      // astral LAST char (the r18 lane widening's new exposure)
    val out = Registry.queries("dedup_simhash")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = 'a'.toLong
    val c = 'c'.toLong
    assert(out(0L) === tokHash64Ref(cp, cp, 1L))
    assert(out(1L) === tokHash64Ref(cp, c, 4L))
    assert(out(2L) === tokHash64Ref(a, cp, 4L))
    assert(out.values.forall(_ >= 0L), s"negative fingerprint: $out")
  }

  test("dedup_simhash_pairs emits the astral exact-duplicate pair") {
    val dir = writeDocs(Seq(
      (0L, s"$astral dup ${astral}end"),
      (1L, s"$astral dup ${astral}end"), // exact dup of 0 → hamming 0
      (2L, "plain ascii filler")))
    val pairs = Registry.queries("dedup_simhash_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((0L, 1L, 0L)))
  }

  test("minhash tokHash survives astral-plane chars and still clusters exact dups") {
    val dir = writeDocs(Seq(
      (0L, s"$astral alpha beta gamma"),
      (1L, s"$astral alpha beta gamma"),  // exact dup of 0 → Jaccard 1.0
      (2L, "one two three four")))
    val out = Registry.queries("dedup_minhash_verified")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, 0L, 1.0)))
    // And the 16-bit recipe value itself stays in [0, 65536) — replayed
    // against the same Long reference the oracle's BIGINT casts compute.
    val th = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") === astral)
      .select(ascii(substring(col("tok"), 1, 1)).cast("long").as("a"))
      .collect()
    assert(th.head.getLong(0) === cp, "ascii() did not return the astral codepoint")
    assert(tokHash16Ref(cp, cp, 1L) >= 0L && tokHash16Ref(cp, cp, 1L) < 65536L)
  }

  // The r19 widening initially covered only Dedup.tokHash/tokHash64 — the
  // SIBLING copies of the same recipe (Sketches.tokHash behind
  // sketch_cms_heavy_hitters, the inline hash in text_fingerprint) kept the
  // 32-bit multiply, so the exact input class ADVICE r18 #1 names still
  // killed those two queries under ANSI. These two tests were RED against
  // the un-widened bodies (SparkArithmeticException in the multiply) and
  // pin the whole recipe family, not just the Dedup copy.

  test("sketch_cms_heavy_hitters survives astral-plane chars (64-bit token hash)") {
    val dir = writeDocs(Seq(
      (0L, s"$astral $astral alpha"),
      (1L, s"$astral beta beta")))
    val out = Registry.queries("sketch_cms_heavy_hitters")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(astral)._1 === 3L, s"true count wrong: $out")
    assert(out("beta")._1 === 2L)
    assert(out("alpha")._1 === 1L)
    // CMS estimates are always >= the true count (collisions only add).
    assert(out.values.forall { case (cnt, est) => est >= cnt }, s"est < true: $out")
  }

  test("text_fingerprint survives astral-plane chars and matches the Long-replayed recipe") {
    val dir = writeDocs(Seq(
      (0L, s"$astral abc$astral"), // astral first char; astral LAST char
      (1L, astral)))
    val out = Registry.queries("text_fingerprint")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = 'a'.toLong
    // fingerprint = Σ tokHash16(tok) · (1-based position) mod 2^31, replayed
    // in Long arithmetic (what the oracle's per-operand BIGINT casts compute).
    val f0 = (tokHash16Ref(cp, cp, 1L) * 1L + tokHash16Ref(a, cp, 4L) * 2L) % 2147483648L
    assert(out(0L) === f0)
    assert(out(1L) === tokHash16Ref(cp, cp, 1L) % 2147483648L)
  }
}
