package graft

import org.apache.spark.sql.functions._

import graft.functions.{BottomTwo, BottomTwoTypes}
import BottomTwoTypes.In

/** Unit coverage for the round-18 bounded top-2 aggregate behind
  * `win_first_nth` (TwoPhaseRankFuzzSpec pins the full query against the
  * original window body; this spec pins the aggregator's own seams:
  * double-tie conventions and merge associativity).
  */
class BottomTwoSpec extends SparkSpec {

  private def run(vs: Seq[In]): (Option[Long], Option[Long]) = {
    val out = BottomTwo.finish(vs.foldLeft(BottomTwo.zero)(BottomTwo.reduce))
    (out.top, out.second)
  }

  test("orders by (null-last, -price asc, key asc); short groups leave slots unset") {
    // np is the NEGATED price: np -9.0 means price 9.0 (ranks first).
    assert(run(Seq(In(false, -9.0, 3), In(false, -7.0, 1), In(false, -8.0, 2)))
      === (Some(3L), Some(2L)))
    // a null price (nl=true) loses to any non-null price
    assert(run(Seq(In(true, 0.0, 1), In(false, -1.0, 2))) === (Some(2L), Some(1L)))
    assert(run(Seq(In(true, 0.0, 5))) === (Some(5L), None))
    assert(run(Seq.empty) === (None, None))
  }

  test("price ties break by key; 0.0/-0.0 and NaN pairs count as price ties") {
    assert(run(Seq(In(false, -5.0, 9), In(false, -5.0, 2), In(false, -5.0, 7)))
      === (Some(2L), Some(7L)))
    // IEEE 0.0 == -0.0: both rows tie on price, key decides — the
    // convention Spark's normalized double sort applies.
    assert(run(Seq(In(false, 0.0, 8), In(false, -0.0, 3))) === (Some(3L), Some(8L)))
    // NaN prices tie with each other (key decides) and lose to any
    // ordinary price (NaN sorts greatest, i.e. smallest when negated...
    // Double.compare puts NaN after every real value either way).
    assert(run(Seq(In(false, Double.NaN, 6), In(false, Double.NaN, 1),
      In(false, -2.0, 4))) === (Some(4L), Some(1L)))
  }

  test("merge is associative and order-insensitive over partition splits") {
    val vs = Seq(In(false, -3.0, 1), In(true, 0.0, 2), In(false, -3.0, 0),
      In(false, -10.0, 9), In(false, 4.0, 5), In(false, Double.NaN, 6))
    val whole = vs.foldLeft(BottomTwo.zero)(BottomTwo.reduce)
    for (cut <- 1 until vs.size) {
      val (l, r) = vs.splitAt(cut)
      val split = BottomTwo.merge(
        l.foldLeft(BottomTwo.zero)(BottomTwo.reduce),
        r.foldLeft(BottomTwo.zero)(BottomTwo.reduce))
      assert(BottomTwo.finish(split) === BottomTwo.finish(whole), s"cut=$cut")
    }
    assert(BottomTwo.finish(whole) === BottomTwoTypes.Out(Some(9L), Some(0L)))
  }

  test("randomized: fold+merge over arbitrary splits equals the sort-based top-2") {
    // Differential fuzz beyond the fixed seams: random value streams
    // (NaN, ±0.0, null-flags, duplicate keys) folded through reduce with
    // a random split-point merge must equal taking the first two of the
    // reference sort under Spark's normalized double ordering.
    val rnd = new scala.util.Random(271828L)
    def refSort(vs: Seq[In]): Seq[In] = vs.sortWith { (a, b) =>
      if (a.nl != b.nl) b.nl
      else if (a.np == b.np || (a.np.isNaN && b.np.isNaN)) a.k < b.k
      else java.lang.Double.compare(a.np, b.np) < 0
    }
    val pool = Seq(0.0, -0.0, 1.5, -1.5, Double.NaN, 7.25, 1e12, -1e12)
    for (trial <- 1 to 200) {
      val n = rnd.nextInt(9) // 0..8 values, short groups included
      val vs = Seq.fill(n)(In(
        rnd.nextInt(4) == 0,
        pool(rnd.nextInt(pool.size)),
        rnd.nextInt(5).toLong)) // duplicate keys on purpose
      val cut = if (n == 0) 0 else rnd.nextInt(n + 1)
      val (l, r) = vs.splitAt(cut)
      val got = BottomTwo.finish(BottomTwo.merge(
        l.foldLeft(BottomTwo.zero)(BottomTwo.reduce),
        r.foldLeft(BottomTwo.zero)(BottomTwo.reduce)))
      val ref = refSort(vs)
      val want = BottomTwoTypes.Out(ref.headOption.map(_.k), ref.lift(1).map(_.k))
      // ties on BOTH (price, key) make the winner among full-duplicate
      // rows ambiguous only in identity, never in the reported key.
      assert(got === want, s"trial $trial: vs=$vs cut=$cut got=$got want=$want")
    }
  }

  test("end-to-end over a DataFrame: matches first/nth_value window semantics") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, Some(10.0)), ("a", 2L, Some(30.0)), ("a", 3L, Some(30.0)),
      ("b", 4L, None: Option[Double]), ("b", 5L, Some(1.0)),
      ("c", 6L, Some(2.0))).toDF("g", "k", "p")
    val bottom2 = udaf(BottomTwo)
    val out = df.groupBy("g")
      .agg(bottom2(col("p").isNull, coalesce(-col("p"), lit(0.0d)), col("k")).as("t"))
      .select(col("g"), col("t.top"), col("t.second"))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
         Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    assert(out("a") === (Some(2L), Some(3L))) // tie at 30.0 → smaller key first
    assert(out("b") === (Some(5L), Some(4L))) // null price sorts last
    assert(out("c") === (Some(6L), None))     // 1-row group: second unset
  }
}
