package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-21 value-parity pin for the scan_sample_stratified rewrite: the
  * per-language LCG top-10 moved from a row_number window partitioned on
  * the closed ~5-value lang key (every row funneled into ≤#langs sort
  * tasks) to the bounded TopKNeighbors aggregate at K=10. The r20 window
  * body is restated inline and the registered query must return exactly
  * the same rows, rank values included — the rank is the slot position,
  * which equals row_number because the (lcg ASC, doc_id ASC) order is
  * total (doc_id is unique).
  */
class StratifiedParitySpec extends SparkSpec {

  test("scan_sample_stratified equals the r20 row_number-window formulation") {
    val lcg = (col("doc_id") * 1103515245L + 12345L) % 2147483648L
    val w = Window.partitionBy(col("lang")).orderBy(lcg.asc, col("doc_id").asc)
    val oldBody = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 10)
    val rows = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().toSeq.map(r => (0 until r.length)
        .map(i => Option(r.get(i)).map(_.toString).getOrElse("NULL")))
        .sortBy(_.mkString("|"))
    val got = rows(Registry.queries("scan_sample_stratified")(spark, sf0001))
    val want = rows(oldBody)
    assert(got.nonEmpty && got == want,
      s"stratified-sample aggregate diverged from the window formulation\n got=$got\nwant=$want")
  }
}
