package graft

import java.nio.file.Files

/** Contract pins for two more shared-recipe queries (round-7 verification
  * depth, same rationale as SketchPropsSpec): the Spark body and the
  * DuckDB oracle build the result with the SAME integer recipe, so the
  * oracle proves cross-engine agreement, not that the recipe implements
  * its contract. Each test states the contract against ground truth the
  * recipe never sees:
  *
  *   - agg_bitmap_distinct claims EXACT distinct counts (the roaring-
  *     bitmap pattern). Ground truth is the generator's own key sets on a
  *     fixture that stresses the word math: ids 0/31/32/63/64 (word
  *     boundaries), duplicates within and across event types, and ids
  *     sharing a word across groups (a lost `% 32` or a mask OR'd across
  *     groups both surface as a wrong count).
  *   - fn_zorder_key claims a Morton interleave. The pin is INVERTIBILITY:
  *     a driver-side de-interleaver must recover exactly (p_size, bnum)
  *     from every z, and distinct inputs must map to distinct z — a
  *     dropped bit plane or swapped dimension survives the mirrored
  *     oracle but cannot survive decoding. (The 8-bit-per-dimension
  *     domain assumption — both coords < 256 — is the fixture's and the
  *     driver data's; values beyond it would truncate by design.)
  */
class RecipeContractSpec extends SparkSpec {

  test("agg_bitmap_distinct equals the generator's exact distinct counts") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bitmap-").toString

    val rng = new scala.util.Random(42)
    val boundary = Seq(0L, 31L, 32L, 63L, 64L, 95L)
    // click: boundary ids each twice + randoms; view: overlapping randoms
    // (same words, different bits); error: a single id (popcount 1).
    val rows =
      (boundary ++ boundary ++ Seq.fill(200)(rng.nextLong(1000).abs)).map(("click", _)) ++
        Seq.fill(150)(("view", rng.nextLong(1000).abs)) ++
        Seq(("error", 64L))
    rows.zipWithIndex.map { case ((et, uid), i) =>
      // ts: raw int64 nanoseconds — Tables.events floors it to µs on read.
      (i.toLong, uid, et, i.toLong * 1000000000L, 1.0)
    }.toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val want = rows.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.size.toLong).toMap
      .toSeq.sortBy(_._1)
    val got = Registry.queries("agg_bitmap_distinct")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    assert(got === want,
      "bitmap popcount-sum diverged from the exact distinct counts")
    assert(got.toMap.apply("error") === 1L,
      "a single id must popcount to exactly 1")
  }

  test("fn_zorder_key is an invertible Morton interleave") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-zorder-").toString

    val rng = new scala.util.Random(7)
    val corners = Seq((0, 0), (0, 255), (255, 0), (255, 255), (1, 2), (2, 1),
      (128, 127), (127, 128), (85, 170), (170, 85)) // 85/170 = alternating bits
    val pairs = (corners ++ Seq.fill(500)((rng.nextInt(256), rng.nextInt(256)))).distinct
    pairs.zipWithIndex.map { case ((size, bnum), i) =>
      (i.toLong, size, s"Brand#$bnum")
    }.toDF("p_partkey", "p_size", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")

    def interleave(x: Long, y: Long): Long =
      (0 until 8).map(b => (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))).sum
    def deinterleave(z: Long): (Long, Long) =
      (0 until 8).foldLeft((0L, 0L)) { case ((x, y), b) =>
        (x | (((z >> (2 * b)) & 1L) << b), y | (((z >> (2 * b + 1)) & 1L) << b))
      }

    val got = Registry.queries("fn_zorder_key")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq

    assert(got.size === pairs.size)
    for ((_, size, bnum, z) <- got) {
      assert(z === interleave(size.toLong, bnum),
        s"z($size, $bnum) diverged from the reference interleave")
      assert(deinterleave(z) === ((size.toLong, bnum)),
        s"decoding z=$z did not recover ($size, $bnum) — the interleave lost a bit plane")
    }
    assert(got.map(_._4).distinct.size === pairs.size,
      "distinct (size, brand) inputs must map to distinct z keys")
    // the declared ORDER BY (z, p_partkey) must hold in the returned rows
    assert(got.map(_._4) === got.map(_._4).sorted, "output must arrive z-ordered")
  }
}
