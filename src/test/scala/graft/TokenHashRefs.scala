package graft

/** The portable token-hash recipes replayed in plain Long arithmetic — the
  * ONE test-side replica of the Dedup.scala lane table and 16-bit formula
  * (shared-recipe contract style: constants duplicated from production on
  * purpose, so a drive-by edit of the lane table goes red in the consuming
  * specs). Shared by TokenHashWidthSpec and SimhashRecallSpec: one replica
  * carries the regression teeth; a second test-side copy adds none and the
  * two can silently drift apart (round-19 review finding).
  */
private[graft] object TokenHashRefs {

  /** [[graft.llm.Dedup]]'s tokHash64 (the 63-bit simhash token hash). */
  def tokHash64Ref(first: Long, last: Long, len: Long): Long = {
    val lanes = Seq((8191L, 131L, 17L, 65536L), (131L, 8191L, 257L, 65536L),
      (4093L, 521L, 127L, 65536L), (257L, 2053L, 31L, 32768L))
    lanes.zipWithIndex.map { case ((am, bm, lm, m), i) =>
      ((first * am + last * bm + len * lm) % m) << (16 * i)
    }.sum
  }

  /** The 16-bit recipe (Dedup.tokHash / Sketches.tokHash / the
    * text_fingerprint inline copy).
    */
  def tokHash16Ref(first: Long, last: Long, len: Long): Long =
    (first * 8191L + last * 131L + len * 17L) % 65536L
}
