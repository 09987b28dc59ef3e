package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers implementing SURVEY.md §7.3 (rules D1–D7).
  *
  * The driver's correctness gate is a hash match against DuckDB, so every
  * floating-point output must be bit-identical across engines. Two sources
  * of divergence are neutralized here:
  *
  *  1. '''Summation order.''' `sum(double)` depends on partial-aggregation
  *     order, which differs between Spark (shuffle partials) and DuckDB
  *     (parallel hash agg). Fix: cast each row to an exact DECIMAL before
  *     summing — decimal addition is associative/commutative, so any order
  *     yields the same value on both engines.
  *  2. '''round() dialect drift.''' Spark rounds doubles via their shortest
  *     decimal representation (BigDecimal.valueOf), DuckDB via the exact
  *     binary value; `round(2.675, 2)` can differ. Fix: re-represent the
  *     double as DECIMAL(38,10) first (where both engines agree except for
  *     ~1e-16-probability boundary cases), then round in exact decimal
  *     arithmetic (HALF_UP == away-from-zero on both engines), then cast
  *     back to double.
  *
  * Raw column values passed through unchanged (min/max/filter/sort) need no
  * treatment — both engines read identical doubles from parquet.
  */
object Exact {

  /** Deterministic cross-engine round of a computed double expression.
    *
    * Overflow posture (round-11 decision, evidence pinned in BASELINE.md
    * round-10): the decimal re-representation is `try_cast`, so |x| ≥
    * ~1e28 yields NULL instead of killing the job — at 100 TB one
    * poisoned row must not abort a stats query, and NULL is an honest
    * "not representable" at a FINAL output site. DuckDB's TRY_CAST
    * returns NULL on the same inputs, so oracle parity is preserved
    * (enforced by the extremes degenerate set). This posture applies to
    * final rounding sites ONLY: aggregation-INPUT casts ([[sumDec]],
    * [[sumDec8]] and the inline decimal sums) keep the plain throwing
    * cast, because a NULL there silently drops the row from SUM/AVG —
    * a wrong answer rather than a missing one. AnsiOverflowSpec pins
    * both behaviors.
    */
  def roundN(c: Column, n: Int): Column =
    round(c.try_cast("decimal(38,10)"), n).cast("double")

  /** SQL twin of [[roundN]] for oracle text. */
  def roundNSql(expr: String, n: Int): String =
    s"CAST(ROUND(TRY_CAST($expr AS DECIMAL(38,10)), $n) AS DOUBLE)"

  /** DuckDB twin of [[graft.functions.CosineSimilarity]]'s NULL contract:
    * NULL when the vectors differ in length (raw `list_cosine_similarity`
    * THROWS there, killing the whole oracle query on one ragged row) or
    * when either norm is zero (DuckDB clamps the 0/0 NaN to -1.0; cosine
    * with a zero vector is undefined, and NULL ranks last under DESC in
    * both engines). Pinned by the round-9 degenerate parity sweep.
    */
  def cosineSqlGuarded(a: String, b: String): String =
    s"CASE WHEN len($a) = len($b)" +
      s" AND list_sum(list_transform($a, x -> x * x)) > 0" +
      s" AND list_sum(list_transform($b, x -> x * x)) > 0" +
      s" THEN list_cosine_similarity($a, $b) END"

  /** Order-insensitive sum of a money-like double (≤4 meaningful dp). */
  def sumDec(c: Column): Column = sum(c.cast("decimal(18,4)"))

  /** Order-insensitive sum for products of money doubles (needs 8 dp). */
  def sumDec8(c: Column): Column = sum(c.cast("decimal(28,8)"))

  /** sum → round(2) → double; the standard money-sum output shape. */
  def sumMoney2(c: Column): Column = round(sumDec(c), 2).cast("double")

  def sumMoney2Sql(expr: String): String =
    s"CAST(ROUND(SUM(CAST($expr AS DECIMAL(18,4))), 2) AS DOUBLE)"

  def sumDec8Money2Sql(expr: String): String =
    s"CAST(ROUND(SUM(CAST($expr AS DECIMAL(28,8))), 2) AS DOUBLE)"
}
