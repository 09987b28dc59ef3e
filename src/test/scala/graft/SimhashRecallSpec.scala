package graft

import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** VERDICT r18 #1: pin the simhash banding's recall-COMPLETENESS, not just
  * the consistency of emitted pairs (LlmPropsSpec checks only that what IS
  * emitted satisfies the Hamming filter — a 3-band table, or a shifted
  * mask, would pass that AND the oracle, because the band table is a
  * shared recipe interpolated into both engines' SQL, while silently
  * DROPPING pairs).
  *
  * The text→vote pipeline cannot realize arbitrary 63-bit fingerprints
  * (the portable token hash's image over (first-codepoint, last-codepoint,
  * length) is ≪ 2⁶³ and not closed under bit flips), so planted-pair
  * entry is at [[Dedup.simhashBandPairs]] — the extracted stage the
  * registered query itself runs; an end-to-end test through the REGISTERED
  * query (single-token docs, unanimous vote ⇒ fingerprint = token hash,
  * replayed in Long arithmetic) pins the wiring around the seam.
  *
  * Ground truth is brute force: EVERY within-block pair at popcount ≤ 3 of
  * the planted XORs must be emitted, exactly once, with the exact Hamming
  * value — and nothing else. Teeth are LIVE, not recorded: the same
  * generator run against a 2-band table must emit exactly the model's
  * prediction (pairs whose XOR leaves ≥ 1 band untouched), which is a
  * STRICT subset — so narrowing SimhashBands to 2 bands turns the
  * completeness assertion red by construction.
  */
class SimhashRecallSpec extends SparkSpec {

  import spark.implicits._

  private val realBands = Dedup.SimhashBands
  private val bandBits: Seq[Seq[Int]] = realBands.map { case (sft, mask) =>
    (0 until java.lang.Long.bitCount(mask)).map(_ + sft)
  }

  private def flip(fp: Long, bits: Seq[Int]): Long =
    bits.foldLeft(fp)((f, b) => f ^ (1L << b))

  /** Planted fixture: 25 families of base + adversarial partners, one
    * (lang, source) block. Per base: k = 1/2/3 flips CONCENTRATED inside a
    * single random band, k = 2/3 flips SPREAD across k distinct bands
    * (one bit per band — the exact class the old 2×8-bit banding could
    * miss), and two Hamming-4 decoys: 4 flips in one band (still a
    * candidate — shares 3 bands — so it exercises the distance filter)
    * and 1 flip in each band (not even a candidate).
    */
  private lazy val planted: Seq[(Long, Long)] = {
    val rng = new scala.util.Random(0xBAD5EED)
    val rows = Seq.newBuilder[(Long, Long)]
    var id = 0L
    def add(sh: Long): Unit = { rows += ((id, sh)); id += 1 }
    (0 until 25).foreach { _ =>
      val base = rng.nextLong() & Long.MaxValue
      add(base)
      (1 to 3).foreach { k =>
        val band = bandBits(rng.nextInt(realBands.size))
        add(flip(base, rng.shuffle(band).take(k)))
      }
      (2 to 3).foreach { k =>
        val chosen = rng.shuffle(bandBits).take(k)
        add(flip(base, chosen.map(b => b(rng.nextInt(b.size)))))
      }
      add(flip(base, rng.shuffle(bandBits(rng.nextInt(realBands.size))).take(4)))
      add(flip(base, bandBits.map(b => b(rng.nextInt(b.size)))))
    }
    rows.result()
  }

  /** Brute-force ground truth: every pair at Hamming ≤ 3, with its XOR. */
  private lazy val expected: Map[(Long, Long), (Long, Long)] =
    planted.combinations(2).flatMap { case Seq((ia, fa), (ib, fb)) =>
      val x = fa ^ fb
      val h = java.lang.Long.bitCount(x).toLong
      if (h <= 3) {
        val (lo, hi) = if (ia < ib) (ia, ib) else (ib, ia)
        Some((lo, hi) -> (h, x))
      } else None
    }.toMap

  /** What a given band table MUST emit: the ≤ 3 pairs whose XOR leaves at
    * least one band untouched (candidate generation is a shared-band
    * equi-join; the Hamming filter then keeps ≤ 3).
    */
  private def modelEmit(table: Seq[(Int, Long)]): Set[(Long, Long, Long)] =
    expected.collect {
      case ((a, b), (h, x)) if table.exists { case (sft, mask) => ((x >> sft) & mask) == 0L } =>
        (a, b, h)
    }.toSet

  private def emit(table: Seq[(Int, Long)], rows: Seq[(Long, Long)] = planted,
      source: String = "s0"): Set[(Long, Long, Long)] = {
    val df = rows.toDF("doc_id", "sh")
      .withColumn("lang", lit("xx")).withColumn("source", lit(source))
      .select("doc_id", "lang", "source", "sh")
    Dedup.simhashBandPairs(df, table)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("fixture sanity: the generator plants all three distances, both shapes") {
    val byH = expected.values.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byH.getOrElse(1L, 0) >= 25, s"h=1 pairs: $byH")
    assert(byH.getOrElse(2L, 0) >= 50, s"h=2 pairs: $byH")
    assert(byH.getOrElse(3L, 0) >= 50, s"h=3 pairs: $byH")
    // The teeth fodder exists: pairs whose flips touch >= 2 distinct bands.
    val spread = expected.values.count { case (_, x) =>
      realBands.count { case (sft, mask) => ((x >> sft) & mask) != 0L } >= 2
    }
    assert(spread >= 50, s"spread-across-bands pairs: $spread")
  }

  test("4-band table is recall-complete for Hamming <= 3: emits exactly the brute-force set") {
    // Pigeonhole: <= 3 flips leave >= 1 of 4 bands untouched, so the model
    // predicts the FULL expected set — and the query must emit it exactly.
    val want = expected.map { case ((a, b), (h, _)) => (a, b, h) }.toSet
    assert(modelEmit(realBands) === want,
      "a <=3 pair touched all 4 bands — the band table no longer covers 63 bits in 4 bands")
    assert(emit(realBands) === want)
  }

  test("TEETH: a 2-band table misses planted <= 3-bit pairs (suite would go red)") {
    val two = Seq((0, (1L << 31) - 1), (31, (1L << 32) - 1))
    val want = expected.map { case ((a, b), (h, _)) => (a, b, h) }.toSet
    val predicted = modelEmit(two)
    assert(predicted.subsetOf(want) && predicted != want,
      s"generator lost its teeth: 2 bands predicted ${predicted.size} of ${want.size}")
    val got = emit(two)
    assert(got === predicted, "banding diverged from the shared-band candidate model")
    assert(got != want,
      "2-band table emitted the full set — the completeness assertion would NOT go red")
  }

  test("blocking: identical fingerprints in different (lang, source) blocks never pair") {
    val shifted = planted.map { case (id, fp) => (id + 100000L, fp) }
    val df = (planted.map { case (id, fp) => (id, "xx", "s0", fp) } ++
      shifted.map { case (id, fp) => (id, "xx", "s1", fp) })
      .toDF("doc_id", "lang", "source", "sh")
    val got = Dedup.simhashBandPairs(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = expected.map { case ((a, b), (h, _)) => (a, b, h) }.toSet
    val wantShifted = want.map { case (a, b, h) => (a + 100000L, b + 100000L, h) }
    assert(got === (want ++ wantShifted))
  }

  /** tokHash64 replayed in Long arithmetic — constants duplicated on
    * purpose (shared-recipe discipline, same as TokenHashWidthSpec) so a
    * drive-by lane-table edit in Dedup.scala goes red here too.
    */
  // Long-replayed recipe from the shared TokenHashRefs replica (one
  // test-side copy carries the drive-by-edit teeth).
  private def tokHash64Ref(first: Long, last: Long, len: Long): Long =
    TokenHashRefs.tokHash64Ref(first, last, len)

  test("end-to-end: the REGISTERED query emits exactly the brute-force pairs of replayed fingerprints") {
    // Single-token docs: unanimous vote => fingerprint == tokHash64(token).
    // 30 random tokens + 5 exact duplicates (Hamming-0 pairs guaranteed);
    // ground truth is brute force over the Long-replayed fingerprints, so
    // ANY accidental near-pair the weak hash produces is covered too.
    val rng = new scala.util.Random(19)
    val toks = Seq.fill(30)(
      (1 to (1 + rng.nextInt(12))).map(_ => ('a' + rng.nextInt(26)).toChar).mkString) ++
      (0 until 5).map(i => ('a' + i).toChar.toString * 3)  // aaa used twice below
    val docs = (toks ++ toks.takeRight(5)).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val fps = docs.map { case (id, t) =>
      (id, tokHash64Ref(t.head.toLong, t.last.toLong, t.length.toLong))
    }
    val want = fps.combinations(2).flatMap { case Seq((ia, fa), (ib, fb)) =>
      val h = java.lang.Long.bitCount(fa ^ fb).toLong
      if (h <= 3) Some((math.min(ia, ib), math.max(ia, ib), h)) else None
    }.toSet
    assert(want.exists(_._3 == 0L), "fixture must contain exact-dup pairs")

    val dir = java.nio.file.Files.createTempDirectory("graft_shrecall").toString
    docs.map { case (id, t) => (id, t, "xx", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Registry.queries("dedup_simhash_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }
}
