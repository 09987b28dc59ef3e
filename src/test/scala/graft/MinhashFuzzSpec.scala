package graft

import java.nio.file.Files
import scala.math.BigDecimal.RoundingMode

/** Differential fuzz for `dedup_minhash_verified` (round-7 verification
  * depth) — the flagship oracle-backed dedup operator. The DuckDB oracle
  * already expresses the identical pipeline in SQL, but both run over the
  * driver fixtures; this spec adds a THIRD independent implementation —
  * a driver-side Scala walk of the declared algorithm (portable tokHash,
  * 16 LCG permutations, 4×4 banding, bucket-min representative, exact
  * Jaccard ≥ 0.5 verify, 4dp round) — over a PLANTED corpus the fixtures
  * don't resemble: explicit duplicate groups at controlled overlap levels
  * (exact copies, one-token edits, ~half overlap, just-below-threshold
  * pairs that banding may cluster but verification must drop), single
  * token documents, and an EMPTY document (split(' ') yields [""] whose
  * tokHash degenerates to 0 — a legal 100 TB input that must not crash or
  * mis-pair).
  */
class MinhashFuzzSpec extends SparkSpec {

  private val NumHashes = 16
  private val BandSize = 4
  private def aI(i: Int): Long = 1103515245L + 2L * i
  private def bI(i: Int): Long = 12345L + 7919L * i

  private def tokHash(tok: String): Long = {
    val first = if (tok.isEmpty) 0L else tok.head.toLong
    val last = if (tok.isEmpty) 0L else tok.last.toLong
    (first * 8191L + last * 131L + tok.length * 17L) % 65536L
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(10, RoundingMode.HALF_UP)
      .setScale(4, RoundingMode.HALF_UP).toDouble

  /** The declared pipeline, re-walked sequentially. */
  private def reference(docs: Seq[(Long, String)]): Seq[(Long, Long, Double)] = {
    val toks = docs.map { case (id, text) => id -> text.split(" ").distinct.toSeq }.toMap
    val sigs = toks.map { case (id, ts) =>
      val hs = ts.map(tokHash)
      id -> (0 until NumHashes).map(i => hs.map(h => (aI(i) * h + bI(i)) % 32768L).min)
    }
    val bandKey = sigs.map { case (id, sig) =>
      id -> (0 until NumHashes / BandSize).map { b =>
        (0 until BandSize).map(r => sig(b * BandSize + r))
          .reduce((acc, h) => acc * 32768L + h)
      }
    }
    val reps = bandKey.toSeq
      .flatMap { case (id, keys) => keys.zipWithIndex.map { case (k, b) => ((b, k), id) } }
      .groupBy(_._1).map { case (bk, g) => bk -> g.map(_._2).min }
    val clustered = bandKey.toSeq.map { case (id, keys) =>
      id -> keys.zipWithIndex.map { case (k, b) => reps((b, k)) }.min
    }.filter { case (id, rep) => rep < id }
    clustered.flatMap { case (id, rep) =>
      val (a, b) = (toks(id).toSet, toks(rep).toSet)
      val sim = a.intersect(b).size.toDouble / a.union(b).size.toDouble
      if (sim >= 0.5) Some((id, rep, round4(sim))) else None
    }.sortBy(_._1)
  }

  test("dedup_minhash_verified matches an independent pipeline walk on a planted corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(31L)
    // varied first char / last char / length — tokHash only sees those
    // three features, so a degenerate vocab (fixed affixes) collapses the
    // whole hash space and chains every group through banding collisions
    val vocab = (0 until 400).map { _ =>
      val len = 3 + rnd.nextInt(8)
      String.valueOf(Array.fill(len)(('a' + rnd.nextInt(26)).toChar))
    }.distinct
    def doc(n: Int): Seq[String] = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).distinct

    var id = -1L
    def nextId(): Long = { id += 1; id }
    val docs = scala.collection.mutable.ListBuffer.empty[(Long, String)]
    // 12 planted groups: base + exact copy + one-token edit + half overlap
    (0 until 12).foreach { _ =>
      val base = doc(14)
      docs += ((nextId(), base.mkString(" ")))
      docs += ((nextId(), base.mkString(" ")))                                   // exact dup
      docs += ((nextId(), (base.drop(1) :+ "zzq9").mkString(" ")))               // 1-token edit
      docs += ((nextId(), (base.take(base.size / 2) ++ doc(7)).distinct.mkString(" "))) // ~half overlap
    }
    // noise, singles, and degenerate texts
    (0 until 20).foreach(_ => docs += ((nextId(), doc(10).mkString(" "))))
    docs += ((nextId(), "lonetoken"))
    docs += ((nextId(), "lonetoken"))  // single-token exact dup
    docs += ((nextId(), "")) // empty text → [""] → tokHash 0

    val dir = Files.createTempDirectory("graft-mh-fuzz-").toString
    docs.toSeq.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val expected = reference(docs.toSeq)
    // the corpus must exercise both verify outcomes and the exact-dup path
    assert(expected.count(_._3 == 1.0) >= 13, "exact duplicates missing from expected pairs")
    assert(expected.exists(p => p._3 >= 0.5 && p._3 < 1.0), "no partial-overlap survivor")

    val got = Registry.queries("dedup_minhash_verified")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
  }
}
