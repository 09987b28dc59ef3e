package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2 B.10 — sketch operators with DETERMINISTIC hash families, so
  * unlike `approx_count_distinct` (engine-internal HLL ⇒ smoke-only) these
  * carry full DuckDB oracles: both engines build bit-identical sketches.
  *
  * Scale design: a sketch is a tiny fixed-size aggregate (4×256 cells /
  * 256 bits) built with map-side-combinable SUM/BIT_OR partials — the
  * canonical "bounded state over unbounded input" shape. Estimation then
  * joins the (broadcast-sized) sketch, never the raw stream.
  */
object Sketches {

  private val Rows = 4
  private val Width = 256 // power of two keeps the modulo cheap

  private def aI(i: Int): Long = 1103515245L + 2L * i
  private def bI(i: Int): Long = 12345L + 7919L * i

  /** Portable token hash — [[Dedup.tokHash]]'s widened recipe, delegated
    * (ADVICE r19 #2): the r19 widening fixed this file's copies but left
    * them COPIES — three SQL bodies that could drift constant-by-constant
    * without tripping the un-cast lint. One source of truth now lives in
    * Dedup; this file keeps only the local aliases.
    */
  private def tokHash(tok: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Dedup.tokHash(tok)

  private val tokHashSql = Dedup.tokHashSql("term")

  val defs: Seq[QueryDef] = Seq(

    // Count-min sketch heavy-hitter estimation: 4 LCG hash rows × 256
    // buckets; est(term) = MIN over rows of its bucket cell. The estimate
    // always ≥ the true count (collisions only add); both engines build
    // the identical sketch, so the overestimates match exactly.
    QueryDef(
      "sketch_cms_heavy_hitters",
      (s, d) => {
        // Tokenize and count ONCE: the sketch is built from the per-term
        // counts (Σ true_cnt per bucket ≡ token count per bucket — the
        // hash is a function of the term), not from the raw token stream.
        // The previous shape consumed `toks` twice — two identical full
        // scans AND two tokenize passes at 100 TB (round-11 ScanAudit) —
        // and its bucket aggregation ran over the token stream instead of
        // the vastly smaller vocabulary.
        val terms = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("term"))
          .withColumn("t", tokHash(col("term")))
          .groupBy(col("term"), col("t"))
          .agg(count(lit(1)).as("true_cnt"))
        val cells = terms
          .select(col("true_cnt"),
            posexplode(array((0 until Rows).map { i =>
              (lit(aI(i)) * col("t") + lit(bI(i))) % Width
            }: _*)).as(Seq("row_i", "bucket")))
          .groupBy(col("row_i"), col("bucket"))
          .agg(sum(col("true_cnt")).as("cell"))
        // Top-10 via orderBy+limit (TakeOrderedAndProject: per-partition
        // top-k then a k-row merge on the driver), NOT a global row_number
        // window — an unpartitioned WindowExec funnels the ENTIRE term
        // vocabulary through one partition, which is the classic 100 TB
        // chokepoint. The (true_cnt DESC, term) sort key is total, so the
        // selected set is deterministic and matches the oracle's rk <= 10.
        val top = terms
          .orderBy(col("true_cnt").desc, col("term"))
          .limit(10)
        val probes = top.select(col("term"), col("true_cnt"),
          posexplode(array((0 until Rows).map { i =>
            (lit(aI(i)) * col("t") + lit(bI(i))) % Width
          }: _*)).as(Seq("row_i", "bucket")))
        probes.join(cells, Seq("row_i", "bucket"))
          .groupBy(col("term"), col("true_cnt"))
          .agg(min(col("cell")).as("est_cnt"))
          .select("term", "true_cnt", "est_cnt")
          .orderBy(col("true_cnt").desc, col("term"))
      },
      Some {
        // Mirrors the Spark restructure: one terms CTE, sketch cells as
        // Σ true_cnt (≡ token count per bucket — t is a function of term).
        val cellRows = (0 until Rows).map { i =>
          s"SELECT $i AS row_i, (${aI(i)} * t + ${bI(i)}) % $Width AS bucket, true_cnt FROM terms"
        }.mkString("\n  UNION ALL ")
        val probeRows = (0 until Rows).map { i =>
          s"SELECT term, true_cnt, $i AS row_i, (${aI(i)} * t + ${bI(i)}) % $Width AS bucket FROM top"
        }.mkString("\n  UNION ALL ")
        s"""WITH toks AS (
           |  SELECT term, $tokHashSql AS t FROM (
           |    SELECT unnest(string_split(text, ' ')) AS term FROM documents) x),
           |terms AS (
           |  SELECT term, t, COUNT(*) AS true_cnt FROM toks GROUP BY 1, 2),
           |cells AS (
           |  SELECT row_i, bucket, SUM(true_cnt) AS cell FROM (
           |  $cellRows) h
           |  GROUP BY 1, 2),
           |top AS (
           |  SELECT term, t, true_cnt FROM (
           |    SELECT term, t, true_cnt,
           |      ROW_NUMBER() OVER (ORDER BY true_cnt DESC, term) AS rk
           |    FROM terms) r
           |  WHERE rk <= 10),
           |probes AS (
           |  $probeRows)
           |SELECT term, true_cnt, CAST(MIN(cell) AS BIGINT) AS est_cnt
           |FROM probes JOIN cells USING (row_i, bucket)
           |GROUP BY term, true_cnt
           |ORDER BY true_cnt DESC, term""".stripMargin
      }),

    // Bloom-filter membership: a 256-bit filter as 8 32-bit words (in BIGINTs — bit 63 would overflow DuckDB's checked shift) built
    // with BIT_OR partials over 3 LCG bit positions per key; probes report
    // whether all their bits are set. Zero false negatives by
    // construction; false positives (if any) are identical cross-engine
    // because the filters are bit-identical.
    QueryDef(
      "sketch_bloom_membership",
      (s, d) => {
        import s.implicits._
        val keys = Tables.orders(s, d).select(col("o_custkey").as("k"))
        val bits = keys.select(posexplode(array((0 until 3).map { i =>
          (lit(aI(i)) * col("k") + lit(bI(i))) % 256L
        }: _*)).as(Seq("h_i", "pos")))
          // `div` / `//`: double-division + cast differs between engines
          // (Spark truncates, DuckDB rounds) — integer division on both.
          .select(expr("CAST(pos div 32 AS INT)").as("word"),
            pmod(col("pos"), lit(32)).cast("int").as("bit"))
          .groupBy(col("word"))
          .agg(expr("bit_or(shiftleft(1L, bit))").as("bits"))
        // probes: 10 custkeys that exist + 10 beyond the key domain
        val probeIds = ((0L until 10L) ++ (1000000L until 1000010L))
        val probes = probeIds.toDF("probe")
        val probeBits = probes.select(col("probe"), posexplode(array((0 until 3).map { i =>
          (lit(aI(i)) * col("probe") + lit(bI(i))) % 256L
        }: _*)).as(Seq("h_i", "pos")))
          .select(col("probe"), expr("CAST(pos div 32 AS INT)").as("word"),
            pmod(col("pos"), lit(32)).cast("int").as("bit"))
        // LEFT join + coalesce(bits, 0): a word no key ever touched means
        // the probe's bit is NOT set — an inner join would silently drop
        // the row, over-reporting membership on sparse filters (and losing
        // the probe entirely if all its words are empty). Invisible at the
        // driver fixtures (every word is populated); pinned on a sparse
        // synthetic filter by SketchPropsSpec.
        // Broadcast the FILTER, not the probes: the aggregated sketch is ≤8
        // rows by construction (and a left join can only build right), so
        // the probe side streams with no shuffle however large it grows.
        probeBits.join(broadcast(bits), Seq("word"), "left")
          .groupBy(col("probe"))
          .agg(bool_and(
            expr("shiftright(coalesce(bits, 0L), bit) & 1") === 1).as("maybe_present"))
          .orderBy("probe")
      },
      Some {
        val bitRows = (0 until 3).map { i =>
          s"SELECT (${aI(i)} * k + ${bI(i)}) % 256 AS pos FROM keys"
        }.mkString("\n  UNION ALL ")
        val probeBitRows = (0 until 3).map { i =>
          s"SELECT probe, (${aI(i)} * probe + ${bI(i)}) % 256 AS pos FROM probes"
        }.mkString("\n  UNION ALL ")
        s"""WITH keys AS (SELECT o_custkey AS k FROM orders),
           |bits AS (
           |  SELECT CAST(pos // 32 AS INT) AS word,
           |    bit_or((CAST(1 AS BIGINT) << CAST(pos % 32 AS INT))) AS bits
           |  FROM ($bitRows) b
           |  GROUP BY 1),
           |probes AS (
           |  SELECT CAST(unnest([0, 1, 2, 3, 4, 5, 6, 7, 8, 9,
           |    1000000, 1000001, 1000002, 1000003, 1000004,
           |    1000005, 1000006, 1000007, 1000008, 1000009]) AS BIGINT) AS probe),
           |pb AS (
           |  SELECT probe, CAST(pos // 32 AS INT) AS word, CAST(pos % 32 AS INT) AS bit
           |  FROM ($probeBitRows) p)
           |SELECT probe, bool_and(((COALESCE(bits, 0) >> bit) & 1) = 1) AS maybe_present
           |FROM pb LEFT JOIN bits USING (word)
           |GROUP BY probe ORDER BY probe""".stripMargin
      })
  )
}
