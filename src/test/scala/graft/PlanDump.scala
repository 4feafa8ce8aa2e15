package graft

import org.apache.spark.sql.SparkSession

/** One-off plan dump for iterating on plan-shape pins: prints the
  * executed plan of each query named in args (dev tool, not a test).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    for (q <- args) {
      println(s"=====PLAN $q=====")
      println(SparkEntry.queries(q)(spark, "/root/testdata/sf0.01").queryExecution.executedPlan.toString)
    }
  }
}
