package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.core.GraftSession

/** Dump `.explain("formatted")` for named registry queries to files —
  * the optimization-round plan-evidence channel (plans/rN/<q>_<tag>.txt).
  *
  * Usage: Test/runMain graft.PlanDump <outDir> <tag> q1,q2,... [sfDir]
  *
  * NOTE: building a registry DataFrame EXECUTES any eager work inside the
  * operator (driver fits, localCheckpoints, sink writes); the dumped plan
  * is the plan of the RETURNED frame — for sink/streaming gates that is
  * the read-back aggregate, stated in the header line of each file.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sf = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("plan-dump", 32)
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val header = s"== $n ($tag) explain(formatted) of the returned frame; sf=$sf ==\n"
      Files.write(Paths.get(outDir, s"${n}_$tag.txt"),
        (header + plan).getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] wrote ${n}_$tag.txt")
    }
    spark.stop()
  }
}
