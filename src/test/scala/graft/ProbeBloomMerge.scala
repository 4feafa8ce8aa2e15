package graft

import graft.ext.Triangles
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Dev-only probe (r17 verdict item 3): the closureBloom executor-side
  * merge shuffles ≤ `bloomMaxPartials` full-sketch-sized partials into
  * ONE task — up to ~30 GB of shuffle at the 4·10⁸-edge regime-2 cap.
  * The r17 ceiling probe measured honesty and build success but never
  * recorded the merge stage's shuffle bytes/time, or whether 64 partials
  * is the right bound vs 16/32 (which cut the merge shuffle 2–4× at the
  * cost of larger per-task fold ranges — and, on a big cluster, lower
  * build parallelism, since the no-shuffle coalesce caps the hash-scan
  * stage at `maxPartials` tasks).
  *
  * Shape: hash source generated at MORE partitions (default 128) than
  * any variant so the coalesce engages exactly as it would under a
  * cluster-scale scan (at local[32]'s native 32 partitions, 64 is a
  * no-op and 64-vs-32 would measure nothing). Per variant, one build at
  * the ceiling with a stage-completion listener recording shuffle
  * write/read bytes, executor run time, and wall duration per stage —
  * the merge stage is the one with shuffle-read bytes. Honesty is
  * re-checked per variant (bit size vs optimal + FP on a disjoint
  * sample): a partials-count change must not change the sketch.
  *
  * Run: `SPARK_DRIVER_MEM=48g sbt "Test/runMain graft.ProbeBloomMerge"`;
  * paste the JSON line into `bench_records/r18_bloom_merge_probe.json`.
  * Tunables: `SPARK_GRAFT_BLOOM_N=400000000`,
  * `SPARK_GRAFT_BLOOM_PARTIALS=16,32,64`,
  * `SPARK_GRAFT_BLOOM_SRC_PARTS=128`.
  */
object ProbeBloomMerge {

  def main(args: Array[String]): Unit = {
    val n = sys.env.get("SPARK_GRAFT_BLOOM_N").map(_.toLong).getOrElse(400000000L)
    val variants = sys.env.get("SPARK_GRAFT_BLOOM_PARTIALS")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(16, 32, 64))
    val srcParts = sys.env.get("SPARK_GRAFT_BLOOM_SRC_PARTS").map(_.toInt).getOrElse(128)
    val spark = graft.core.GraftSession.local("bloom_merge", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    results += "n" -> n
    results += "src_partitions" -> srcParts

    // (stageId, numTasks, shuffleWriteB, shuffleReadB, execRunMs, wallMs)
    val stages = ArrayBuffer.empty[(Int, Int, Long, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages += ((si.stageId, si.numTasks,
            m.shuffleWriteMetrics.bytesWritten,
            m.shuffleReadMetrics.totalBytesRead,
            m.executorRunTime,
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)))
        }
      }
    })

    val inserted = spark.range(0, n, 1, srcParts)
      .select(col("id").as("src"), (col("id") + 10000000000L).as("dst"))
    val optimalBits = math.ceil(-n * math.log(0.01) /
      (math.log(2) * math.log(2))).toLong
    // disjoint probe keys, hashed by the engine's own xxhash64 path
    val probeSample = spark.range(0, 100000L)
      .select((col("id") + 20000000000L).as("src"),
        (col("id") + 30000000000L).as("dst"))
      .select(expr("xxhash64(src, dst)")).collect().map(_.getLong(0))

    // tree-merge candidate (measured before productizing): keep the build
    // stage WIDE (p partials) but merge in two levels — p -> fan -> 1 —
    // so the serial single-task term shrinks from p sketches to `fan`
    // while level 1 ORs in parallel. On a cluster this also restores
    // build parallelism that a small maxPartials cap sacrifices.
    def treeBloom(p: Int, fan: Int): org.apache.spark.util.sketch.BloomFilter = {
      import org.apache.spark.sql.functions.expr
      val hashes = inserted.select(expr("xxhash64(src, dst)"))
        .rdd.map(_.getLong(0))
      val bounded =
        if (hashes.getNumPartitions > p) hashes.coalesce(p) else hashes
      bounded
        .mapPartitions { it =>
          val f = org.apache.spark.util.sketch.BloomFilter.create(n, 0.01)
          it.foreach(f.putLong)
          Iterator.single(f)
        }
        .repartition(fan)
        .mapPartitions { it =>
          if (it.hasNext) {
            val acc = it.next(); it.foreach(acc.mergeInPlace); Iterator.single(acc)
          } else Iterator.empty
        }
        .repartition(1)
        .mapPartitions { it =>
          val acc = it.next(); it.foreach(acc.mergeInPlace); Iterator.single(acc)
        }
        .collect().head
    }

    val treeVariants = sys.env.get("SPARK_GRAFT_BLOOM_TREE")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq.empty)

    for (p <- variants ++ treeVariants) {
      val isTree = treeVariants.contains(p) && !variants.contains(p)
      stages.synchronized(stages.clear())
      System.gc()
      val load = osBean.getSystemLoadAverage
      val t0 = System.nanoTime()
      val bf =
        if (isTree) treeBloom(p, fan = 8)
        else Triangles.closureBloom(inserted, n, maxPartials = p)
      val sec = (System.nanoTime() - t0) / 1e9
      // wait for straggling stage-completed events before reading (the
      // listener bus is async; the merge stage's event can land after
      // collect() returns)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (stages.synchronized(stages.forall(_._4 == 0)) &&
             System.nanoTime() < deadline) Thread.sleep(50)
      val snap = stages.synchronized(stages.toList)
      // the merge stage is the (single-task) shuffle-read stage; the
      // build stage is the shuffle-write one
      val build = snap.filter(_._3 > 0)
      val merge = snap.filter(_._4 > 0)
      val writeB = build.map(_._3).sum
      val readB = merge.map(_._4).sum
      val mergeWallMs = merge.map(_._6).sum
      val buildWallMs = build.map(_._6).sum
      val fp = probeSample.count(bf.mightContainLong).toDouble / probeSample.length
      val tag = if (isTree) s"p${p}tree" else s"p$p"
      println(f"PROBE $tag%-8s total=${math.rint(sec * 1000) / 1000}%.3f s " +
        f"buildTasks=${build.map(_._2).sum}%d buildWall=${buildWallMs / 1000.0}%.1f s " +
        f"mergeRead=${readB / 1e9}%.2f GB mergeWall=${mergeWallMs / 1000.0}%.1f s " +
        f"bits=${bf.bitSize()}%d fp=$fp%.5f")
      results += s"${tag}_total_sec" -> (math.rint(sec * 1000) / 1000)
      results += s"${tag}_load" -> (math.rint(load * 100) / 100)
      results += s"${tag}_build_tasks" -> build.map(_._2).sum
      results += s"${tag}_build_wall_sec" -> (buildWallMs / 1000.0)
      results += s"${tag}_shuffle_write_gb" -> (math.rint(writeB / 1e7) / 100.0)
      results += s"${tag}_merge_read_gb" -> (math.rint(readB / 1e7) / 100.0)
      results += s"${tag}_merge_wall_sec" -> (mergeWallMs / 1000.0)
      results += s"${tag}_bit_size" -> bf.bitSize()
      results += s"${tag}_bits_optimal" -> (bf.bitSize() >= optimalBits)
      results += s"${tag}_fp_rate" -> (math.rint(fp * 100000) / 100000.0)
    }

    val json = results.map {
      case (k, v: String) => s""""$k":"$v""""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")
    println("BLOOM_MERGE_JSON " + json)
    spark.stop()
  }
}
