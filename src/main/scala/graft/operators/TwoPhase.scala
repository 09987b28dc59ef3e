package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic value-bucket machinery for the round-17 two-phase
  * rewrites of ordered windows on CLOSED (schema-bounded) keys.
  *
  * The problem shape: `Window.partitionBy(closedKey).orderBy(value)` hash-
  * exchanges EVERY row into ≤|key| sort tasks, so per-task memory and wall
  * grow linearly with the data no matter how many executors exist — the
  * chokepoint the round-16/17 scaling harness measured on six ops before
  * these rewrites. The fix is the win_ntile pattern generalized per group:
  *
  *   1. a 1-row-per-group min/max aggregate, broadcast;
  *   2. [[bucket]] — a MONOTONE value→bucket map (bucket order == value
  *      order, equal values share a bucket), so ordered-prefix statistics
  *      decompose into (within-bucket local stat) + (exclusive per-bucket
  *      offset);
  *   3. a window WITHIN (group, bucket) — parallel, state bounded by
  *      bucket population;
  *   4. offsets from a per-(group, bucket) aggregate windowed over
  *      ≤ groups×(buckets+2) rows — bounded regardless of table size —
  *      broadcast back.
  *
  * The map is a pure function of the DATA (never of physical placement,
  * sampling, or partition ids), so independent recomputations of the
  * bucket column in separate passes agree by construction — the property
  * that makes the two-pass decomposition sound without materializing an
  * intermediate. A fully skewed column degenerates to ONE bucket — i.e.
  * to the naive plan — never to a wrong answer.
  */
object TwoPhase {

  /** Bucket count: 2× the 32-way local parallelism so the post-bucket
    * windows saturate the box even with moderate value skew.
    */
  val Buckets = 64

  /** Monotone value→bucket map over the group's [lo, hi] range. NULL
    * values get bucket −1: they must rank FIRST (matching the window
    * default ASC NULLS FIRST everywhere this helper is used) and must
    * survive downstream equi-joins on the bucket column (a NULL bucket
    * row would silently vanish — the win_ntile round-9 lesson).
    * A single-valued (or all-NULL) group collapses to bucket 0.
    * Callers pass NUMERIC columns (cast timestamps via unix_micros).
    *
    * The arithmetic runs in DOUBLE (ADVICE r17): on the native type a
    * long-keyed group whose range exceeds Long.MaxValue/Buckets
    * overflowed (v − lo) · Buckets, and under ANSI that throws. Bucket
    * placement only needs an approximately monotone division — the
    * long→double conversion is monotone non-decreasing and equal values
    * map to equal doubles, which is exactly the contract (bucket order ==
    * value order, equal values share a bucket); precision loss can only
    * merge adjacent buckets, never reorder them.
    */
  def bucket(v: Column, lo: Column, hi: Column): Column =
    when(v.isNull, lit(-1))
      .when(hi <=> lo, lit(0))
      .otherwise(least(lit(Buckets - 1),
        floor((v.cast("double") - lo.cast("double")) * Buckets /
          (hi.cast("double") - lo.cast("double"))).cast("int")))
}
