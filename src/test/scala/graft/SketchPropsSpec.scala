package graft

import java.nio.file.Files

/** Ground-truth pins for the two sketch queries (round-7 verification
  * depth). Both carry full DuckDB oracles, but the oracle runs the SAME
  * deterministic-LCG construction — a bug in the shared sketch recipe
  * (wrong hash row, lost bit, inverted probe) would reproduce on both
  * sides and pass the gate. Each test here replicates the sketch with a
  * third, driver-side Scala implementation on a synthetic fixture built
  * to exercise the failure mode the fixture data never reaches:
  *
  *   - sketch_cms_heavy_hitters: a planted tokHash collision ("cat"/"cut"
  *     share (first, last, length), so they share ALL FOUR rows' buckets)
  *     forces a strict overestimate; estimates must equal the replica's
  *     cell-exact values and never undershoot the true counts.
  *   - sketch_bloom_membership: a 3-key SPARSE filter (words 1/4/5/6
  *     empty) where the pre-fix inner join dropped five probes outright
  *     and reported absent probe 1000002 as present (its only populated-
  *     word bit is set; its two empty-word rows vanished). Key 64's
  *     positions are exactly probe 1000000's, planting a genuine Bloom
  *     false positive — distinguishing allowed FPs from the join bug.
  */
class SketchPropsSpec extends SparkSpec {

  private def aI(i: Int): Long = 1103515245L + 2L * i
  private def bI(i: Int): Long = 12345L + 7919L * i

  test("sketch_cms_heavy_hitters matches a driver-side replica and never underestimates") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cms-").toString

    // Distinct counts make the (true_cnt DESC, term) top-10 total; iris
    // and jolt exist only to be excluded by the limit. "cat"/"cut" is the
    // planted collision; every other term varies first/last/length.
    val counts = Seq(
      "cat" -> 20L, "cut" -> 19L, "alpha" -> 18L, "bridge" -> 17L,
      "comet" -> 16L, "dune" -> 15L, "ember" -> 14L, "forest" -> 13L,
      "glyph" -> 12L, "harbor" -> 11L, "iris" -> 2L, "jolt" -> 1L)
    counts.zipWithIndex
      .map { case ((term, n), id) => (id.toLong, Seq.fill(n.toInt)(term).mkString(" ")) }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // Replica of the declared construction (Sketches.scala): 16-bit token
    // hash from (first char, last char, length), 4 LCG rows × 256 buckets,
    // est = min over rows of the term's cell.
    def tokHash(t: String): Long =
      (t.head.toInt * 8191L + t.last.toInt * 131L + t.length * 17L) % 65536L
    def bucket(i: Int, t: Long): Long = (aI(i) * t + bI(i)) % 256L
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long].withDefaultValue(0L)
    for ((term, n) <- counts; i <- 0 until 4)
      cells((i, bucket(i, tokHash(term)))) += n
    def est(term: String): Long =
      (0 until 4).map(i => cells((i, bucket(i, tokHash(term))))).min

    assert(tokHash("cat") === tokHash("cut"), "fixture invariant: the planted pair must collide")

    val want = counts.take(10) // already in (count desc, term-irrelevant) order
      .map { case (term, n) => (term, n, est(term)) }
    val got = Registry.queries("sketch_cms_heavy_hitters")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

    assert(got === want, "CMS estimates diverged from the cell-exact replica")
    assert(got.forall { case (_, truth, e) => e >= truth },
      "a count-min estimate undershot the true count — collisions can only add")
    val catEst = got.collectFirst { case ("cat", _, e) => e }.get
    assert(catEst >= 39L,
      "the planted cat/cut collision must surface as a strict overestimate (>= 20+19)")
  }

  test("sketch_bloom_membership on a sparse filter: replica-exact, no false negatives, planted FP") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bloom-").toString

    // keys {5, 9, 64}: populates words 0/2/3/7 only. 5 and 9 are probed
    // present keys; 64's three positions (121, 232, 87) are exactly probe
    // 1000000's, so that absent probe is a true Bloom false positive.
    val keys = Seq(5L, 9L, 64L)
    keys.zipWithIndex.map { case (ck, i) => (i.toLong + 1000L, ck) }
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    // Driver-side replica: 256-bit filter as 8 longs (low 32 bits used),
    // 3 LCG positions per key, membership = all three bits set.
    def positions(k: Long): Seq[Long] = (0 until 3).map(i => (aI(i) * k + bI(i)) % 256L)
    val words = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (k <- keys; p <- positions(k)) words(p / 32) |= (1L << (p % 32))
    def maybePresent(probe: Long): Boolean =
      positions(probe).forall(p => ((words(p / 32) >> (p % 32)) & 1L) == 1L)

    val probes = (0L until 10L) ++ (1000000L until 1000010L)
    val want = probes.map(p => (p, maybePresent(p)))
    val got = Registry.queries("sketch_bloom_membership")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq

    assert(got === want, "Bloom output diverged from the bit-exact replica " +
      "(pre-fix inner join: probes 1/6/7/8/1000003 vanish, 1000002 reads true)")
    assert(got.size === 20, "every probe must produce a row even when its words are empty")
    assert(keys.filter(probes.contains).forall(k => got.contains((k, true))),
      "a present key probed false — Bloom filters admit NO false negatives")
    assert(got.contains((1000000L, true)) && !keys.contains(1000000L),
      "the planted false positive must read true — FPs are allowed, dropped rows are not")
    assert(got.count(_._2) === 3,
      "exactly {5, 9, 1000000} may read true on this fixture")
  }
}
