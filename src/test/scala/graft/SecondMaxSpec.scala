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
