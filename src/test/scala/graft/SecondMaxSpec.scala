package graft

import org.apache.spark.sql.functions._

class SecondMaxSpec extends SparkSpec {
  import functions.SecondMax

  test("second-largest distinct value per group") {
    import spark.implicits._
    val df = Seq(
      ("a", 3.0), ("a", 5.0), ("a", 5.0), ("a", 1.0),
      ("b", 2.0), ("b", 2.0), // only one distinct value → NaN
      ("c", 7.0)              // single row → NaN
    ).toDF("g", "x")
    val secondMax = udaf(SecondMax)
    val out = df.groupBy("g").agg(secondMax(col("x")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") === 3.0)
    assert(out("b").isNaN)
    assert(out("c").isNaN)
  }

  test("randomized: fold+merge over arbitrary splits equals the sort-based second-distinct") {
    // VERDICT r18 #3: the same differential discipline as BottomTwo's
    // 200-trial fuzz (commit 7c36740) — SecondMax shares the bounded-
    // buffer fold+merge pattern, so it gets the same generator: random
    // multisets with duplicates and ±0.0, a random partition cut (0 and n
    // included, so one-sided merges against `zero` are exercised), and a
    // sort-based reference. NaN inputs are excluded BY CONTRACT: NaN is
    // the aggregate's own "unset" buffer sentinel (scaladoc line 11) and
    // the callers' fixtures never contain it. ±0.0 pins the `==` distinct
    // semantics: 0.0 == -0.0, so the pair counts as ONE distinct value —
    // a reference built on Seq.distinct (equals-based, which separates
    // them) would diverge; the walk below uses numeric == on purpose.
    val rnd = new scala.util.Random(314159L)
    def refSecond(vs: Seq[Double]): Double = {
      val sorted = vs.sortWith(java.lang.Double.compare(_, _) > 0)
      sorted.headOption match {
        case None => Double.NaN
        case Some(m1) => sorted.find(v => !(v == m1)).getOrElse(Double.NaN)
      }
    }
    val pool = Seq(0.0, -0.0, 1.5, -1.5, 7.25, 1e12, -1e12, 42.0)
    for (trial <- 1 to 200) {
      val n = rnd.nextInt(9) // 0..8 values, short groups included
      val vs = Seq.fill(n)(pool(rnd.nextInt(pool.size)))
      val cut = if (n == 0) 0 else rnd.nextInt(n + 1)
      val (l, r) = vs.splitAt(cut)
      val got = SecondMax.finish(SecondMax.merge(
        l.foldLeft(SecondMax.zero)(SecondMax.reduce),
        r.foldLeft(SecondMax.zero)(SecondMax.reduce)))
      val want = refSecond(vs)
      // Numeric equality on purpose: when 0.0 and -0.0 are the same
      // distinct value, WHICH zero lands in the buffer is fold-order
      // dependent and contractually irrelevant.
      assert((got.isNaN && want.isNaN) || got == want,
        s"trial $trial: vs=$vs cut=$cut got=$got want=$want")
    }
  }

  test("merge is associative over partition splits") {
    val values = Seq(9.0, 1.0, 9.0, 4.0, 7.0, 7.0, 2.0)
    val whole = values.foldLeft(SecondMax.zero)(SecondMax.reduce)
    val (l, r) = values.splitAt(3)
    val split = SecondMax.merge(
      l.foldLeft(SecondMax.zero)(SecondMax.reduce),
      r.foldLeft(SecondMax.zero)(SecondMax.reduce))
    assert(SecondMax.finish(whole) === 7.0)
    assert(SecondMax.finish(split) === 7.0)
  }
}
