package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark DataFrame builder plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB as the correctness oracle.
  * Oracle `None` ⇒ the op is not SQL-expressible cross-engine (approximate
  * sketches, seeded hashes); the driver records a weaker rows-only check.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Central registry: pairs every query with its oracle in one place so
  * `SparkEntry.queries` and `SparkEntry.oracleSql` can never drift
  * (SURVEY.md §7.1 step 0).
  */
object Registry {
  lazy val all: Seq[QueryDef] =
    operators.Relational.defs ++
      operators.Joins.defs ++
      operators.SaltedJoinQuery.defs ++
      operators.Aggregates.defs ++
      operators.Windows.defs ++
      operators.Reshape.defs ++
      operators.Behavior.defs ++
      functions.Scalars.defs ++
      streaming.StreamShaped.defs ++
      llm.LlmOps.defs

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
