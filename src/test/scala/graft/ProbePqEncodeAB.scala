package graft

import graft.functions.{PqCodes, PqDistanceTable, QuantizedDot}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dev-only A/B: the PQ encode scan before/after the r17 native-kernel
  * rewrite ([[graft.functions.PqOps]]).
  *
  * BEFORE = the composed expression forest (nSub × nCodes slice +
  * quantized-dot literals). At the gate geometry its generated
  * `processNext()` exceeds the JVM's 64 KB method limit, so Spark
  * silently drops the projection out of whole-stage codegen and every
  * corpus row pays interpreted eval + 128 slice copies + 16× redundant
  * subvector quantization. AFTER = [[PqCodes]] / [[PqDistanceTable]],
  * one compiled triple loop per row. Both sides are checksummed and
  * asserted identical — this is a cost A/B of one arithmetic.
  *
  * Corpus: synthetic `n` (default 2M) 64-dim float vectors from a
  * compiled sin() projection, localCheckpointed so generation cost is
  * off the clock. Each variant reduces to one row via
  * `sum(xxhash64(out))` — full evaluation forced, collect cost nil.
  *
  * Run: `sbt "Test/runMain graft.ProbePqEncodeAB"`; paste the JSON line
  * into `bench_records/r17_pq_codegen_ab.json`.
  * Size env-tunable: `SPARK_GRAFT_PQ_N=2000000`.
  */
object ProbePqEncodeAB {

  private def forestCodes(v: Column, cb: Array[Array[Array[Float]]]): Column =
    array(cb.indices.map { m =>
      val dsub = cb(m)(0).length
      array_min(array(cb(m).toIndexedSeq.zipWithIndex.map { case (c, j) =>
        val c2 = c.map { x => val q = QuantizedDot.quantize(x.toDouble); q * q }.sum
        struct(
          (lit(c2) - lit(2L) *
            QuantizedDot.of(slice(v, m * dsub + 1, dsub), typedLit(c))).as("score"),
          lit(j).as("code"))
      }: _*)).getField("code")
    }: _*)

  private def forestDtab(v: Column, cb: Array[Array[Array[Float]]]): Column =
    array(cb.indices.map(m =>
      array(cb(m).indices.map { j =>
        val dsub = cb(m)(j).length
        val c2 = cb(m)(j).map { x =>
          val q = QuantizedDot.quantize(x.toDouble); q * q
        }.sum
        lit(c2) - lit(2L) *
          QuantizedDot.of(slice(v, m * dsub + 1, dsub), typedLit(cb(m)(j)))
      }: _*)): _*)

  def main(args: Array[String]): Unit = {
    val n = sys.env.get("SPARK_GRAFT_PQ_N").map(_.toLong).getOrElse(2000000L)
    val spark = graft.core.GraftSession.local("pq_encode_ab", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    results += "n" -> n

    val cb = Array.tabulate(8, 16)((m, j) =>
      Array.tabulate(8)(i => (math.sin(m * 131 + j * 17 + i) / 2).toFloat))
    val vecs = spark.range(0, n).select(
      col("id").as("vec_id"),
      array((1 to 64).map(i => sin(col("id") * 31 + i).cast("float")): _*).as("embedding"))
      .localCheckpoint(true)

    // The measured stage is a pure PROJECTION over the checkpointed
    // corpus — the production encode shape (project then store/shuffle
    // the codes). An agg-reduced form would collapse the kernel into the
    // hash-agg's generated method, changing what fails/compiles; the
    // checksum is accumulated task-side instead, costing nothing.
    def measure(name: String, out: Column): Long = {
      var chk = 0L
      val secs = (1 to 2).map { _ =>
        val acc = spark.sparkContext.longAccumulator(name)
        val load = osBean.getSystemLoadAverage
        val t0 = System.nanoTime()
        vecs.select(xxhash64(out).as("h")).queryExecution.toRdd
          .foreach(r => acc.add(r.getLong(0)))
        val sec = (System.nanoTime() - t0) / 1e9
        chk = acc.value
        results += s"${name}_load" -> (math.rint(load * 100) / 100)
        math.rint(sec * 1000) / 1000
      }
      println(f"PROBE $name%-14s ${secs.mkString("/")} s chk=$chk")
      results += s"${name}_secs" -> secs.mkString("[", ",", "]")
      results += s"${name}_min_sec" -> secs.min
      chk
    }

    // SPARK_GRAFT_PQ_SKIP_FOREST=1 re-measures just the kernels at quiet
    // ambient (the interpreted forest runs heat the machine for minutes)
    val skipForest = sys.env.get("SPARK_GRAFT_PQ_SKIP_FOREST").contains("1")
    val cKernel = measure("codes_kernel", PqCodes.of(col("embedding"), cb))
    val dKernel = measure("dtab_kernel", PqDistanceTable.of(col("embedding"), cb))
    if (!skipForest) {
      val cForest = measure("codes_forest", forestCodes(col("embedding"), cb))
      assert(cForest == cKernel, s"codes checksum diverged: $cForest vs $cKernel")
      val dForest = measure("dtab_forest", forestDtab(col("embedding"), cb))
      assert(dForest == dKernel, s"dtab checksum diverged: $dForest vs $dKernel")
    }
    results += "codes_checksum" -> cKernel
    results += "dtab_checksum" -> dKernel

    val json = results.map {
      case (k, v: String) if v.startsWith("[") => s""""$k":$v"""
      case (k, v: String) => s""""$k":"$v""""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")
    println("PQ_ENCODE_AB_JSON " + json)
    spark.stop()
  }
}
