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

  test("salted join equals the plain join when keys and saltBy contain NULLs") {
    // At 100 TB null fact keys are routine (unparsed FKs, late dims). An
    // inner equi-join drops them; salting must not resurrect them via the
    // (key, salt) composite — and hash(null) in the salt column must not
    // throw or collapse every null row onto one salt of a REAL key.
    import spark.implicits._
    val fact = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (1L, 11L), (null, 12L), (null, null), (2L, null), (3L, 13L))
      .toDF("k", "payload")
    val dim = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"), (null, "n"))
      .toDF("dk", "name")
    val plain = fact.join(dim, col("k") === col("dk"))
      .select("k", "payload", "name").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    val salted = SkewJoin.saltedJoin(fact, dim, col("k"), col("dk"),
        saltBy = col("payload"), salts = 8)
      .select("k", "payload", "name").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    assert(salted.toSeq === plain.toSeq)
    // k=1 matches twice, k=2 once (null payload salts fine), k=3 has no
    // dim row, and both null-key fact rows plus the null dim key drop.
    assert(plain.length === 3, "unexpected survivor set for the null fixture")
  }

  test("AQE splits a skewed shuffle-join partition (skew=true in the adaptive plan)") {
    // The runtime half of the skew story: before reaching for manual
    // salting, AQE itself must detect and split a hot partition. Thresholds
    // are lowered so the fixture-scale hot key qualifies; broadcast is
    // disabled to force the shuffle join AQE operates on.
    val conf = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val olds = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.range(50000)
        .select(lit(1L).as("k"), concat(lit("p"), col("id")).as("pay"))
        .union(spark.range(1000)
          .select((col("id") % 50 + 2).as("k"), concat(lit("q"), col("id")).as("pay")))
      val dim = spark.range(52).select(col("id").as("dk"), col("id").as("dv"))
      val j = fact.join(dim, col("k") === col("dk"))
      // execute THIS DataFrame (count() would build its own execution and
      // leave j's adaptive plan unfinalized)
      assert(j.collect().length === 51000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in adaptive plan:\n$plan")
    } finally olds.foreach { case (k, o) =>
      o.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
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
