package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001; driver
    * smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("agg_pricing_summary")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2 (Registry keeps
    * query and oracle paired so the two maps can never drift).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
