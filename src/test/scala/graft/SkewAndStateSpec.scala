package graft

import graft.core.Catalog
import graft.streaming.EventStream
import graft.transform.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewAndStateSpec extends AnyFunSuite with SharedSpark {

  test("salted inner join == plain inner join") {
    val c = Catalog(spark, sf)
    val probe = c.lineitem.select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val build = c.orders.select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
    val plain = probe.join(build, Seq("l_orderkey"))
    val salted = SkewJoin.innerSalted(probe, build, "l_orderkey", saltBuckets = 4)
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("stateful streaming running totals == batch per-user totals") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), dir.resolve("events.parquet"))
    val stream = EventStream.runningUserTotals(EventStream.readStream(spark, dir.toString))
    val q = stream.writeStream.outputMode("update").format("memory")
      .queryName("graft_state_totals").start()
    q.processAllAvailable(); q.stop()
    // last update per user == batch totals (single micro-batch here, so
    // the memory sink holds exactly the final state)
    val streamed = spark.table("graft_state_totals")
      .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("v"))
    val batch = Catalog(spark, sf).events
      .groupBy("user_id").agg(count(lit(1)).as("n"), sum("value").as("v"))
    val joined = streamed.join(batch, "user_id")
      .filter(streamed("n") =!= batch("n"))
    assert(joined.isEmpty)
  }
}
