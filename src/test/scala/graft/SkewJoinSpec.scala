package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {

  test("salted join equals the plain join on a skewed dataset") {
    import spark.implicits._
    // skew: 10k rows of one hot key + a uniform tail
    val fact = spark.range(10000).select(lit(1L).as("k"), col("id").as("payload"))
      .union(spark.range(1000).select((col("id") % 50 + 2).as("k"), col("id").as("payload")))
    val dim = spark.range(52).select(col("id").as("dk"), concat(lit("d"), col("id")).as("name"))

    val plain = fact.join(dim, col("k") === col("dk"))
      .groupBy(col("name")).agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
    val salted = SkewJoin.saltedJoin(fact, dim, col("k"), col("dk"),
        saltBy = col("payload"), salts = 8)
      .groupBy(col("name")).agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))

    val p = plain.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val s = salted.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(s.toSeq === p.toSeq)
  }

  test("salt spreads the hot key across all sub-partitions") {
    import spark.implicits._
    val fact = spark.range(10000).select(lit(1L).as("k"), col("id").as("payload"))
    val saltCounts = fact.withColumn("__salt", pmod(hash(col("payload")), lit(8)))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(saltCounts.length === 8) // every salt bucket populated
    assert(saltCounts.max < 10000 * 0.25) // no bucket holds the whole key
  }
}
