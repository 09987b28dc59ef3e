package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    args(0).split(",").foreach { op =>
      val df = SparkEntry.queries(op)(spark, dir)
      df.count()
      println(s"===== $op (AQE final) =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
