package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY §4 / the 100 TB playbook, alongside
  * AQE's runtime skew splitting which stays enabled).
  *
  * A hash-partitioned join sends every row of a hot key to one task; when a
  * single key holds a double-digit percentage of the fact table, that task
  * runs alone for hours. Salting splits each hot key into `salts`
  * sub-partitions: the fact side gets a deterministic salt from a
  * high-cardinality column, the (smaller) other side is replicated `salts`
  * times, and the join key becomes `(key, salt)` — the hot key's rows now
  * spread across `salts` tasks at the cost of replicating the small side.
  *
  * The salt is `pmod(hash(saltBy), salts)` — deterministic (D3), so results
  * are reproducible run to run.
  */
object SkewJoin {

  def saltedJoin(fact: DataFrame, other: DataFrame, factKey: Column,
      otherKey: Column, saltBy: Column, salts: Int): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(hash(saltBy), lit(salts)))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
      factKey === otherKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
