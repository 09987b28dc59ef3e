package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

/** Pins the round-11 decimal-overflow posture (BASELINE.md round-10
  * evidence, VERDICT r10 lead item):
  *
  *  - FINAL rounding sites ([[Exact.roundN]]) use `try_cast`, so a
  *    ±1e28-class value yields NULL instead of killing the job — one
  *    poisoned row in 100 TB must not abort a stats query, and the DuckDB
  *    twin (`TRY_CAST`, [[Exact.roundNSql]]) returns NULL on the same
  *    inputs, so cross-engine parity survives (swept end-to-end by the
  *    extremes degenerate set in tools/degen_preflight.sh).
  *  - Aggregation-INPUT casts ([[Exact.sumDec]]/[[Exact.sumDec8]]) keep
  *    the plain ANSI cast and THROW on overflow: a NULL there would
  *    silently drop the row from SUM/AVG — a wrong answer, not a missing
  *    one. DuckDB's CAST throws identically (pinned by the round-10
  *    probe), so the loud path is also engine-symmetric.
  */
class AnsiOverflowSpec extends SparkSpec {

  import spark.implicits._

  test("roundN yields NULL (not job death) past the decimal(38,10) range") {
    val out = Seq(1e30, -1e30, 1e60, Double.PositiveInfinity, Double.NaN)
      .toDF("x").select(Exact.roundN(col("x"), 2).as("r")).collect()
    assert(out.forall(_.isNullAt(0)),
      s"expected all-NULL past the representable range, got ${out.mkString(",")}")
  }

  test("roundN is unchanged inside the representable range") {
    val out = Seq(1e27, 2.675, -2.675, 0.0)
      .toDF("x").select(Exact.roundN(col("x"), 2).as("r"))
      .collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(1e27, 2.68, -2.68, 0.0))
  }

  test("roundN NULL propagates through, not poisons, an outer aggregate") {
    // avg ignores NULL: the poisoned row vanishes from a DOWNSTREAM agg
    // over the rounded column (visible, documented), while sane rows keep
    // contributing — no job death, no all-NULL contagion.
    val r = Seq(1e30, 2.0, 4.0).toDF("x")
      .select(Exact.roundN(col("x"), 2).as("r"))
      .agg(avg("r")).as[Double].head()
    assert(r == 3.0)
  }

  test("aggregation-input decimal casts still throw loudly on overflow") {
    val e = intercept[Exception] {
      Seq(1e30, 1.0).toDF("x").agg(Exact.sumDec(col("x"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.toString +: messages(x.getCause))
    assert(messages(e).exists(m =>
      m.contains("NUMERIC_VALUE_OUT_OF_RANGE") || m.contains("CAST_OVERFLOW")),
      s"expected an ANSI overflow error, got: $e")
    assert(e.isInstanceOf[SparkException] || messages(e).nonEmpty)
  }
}
