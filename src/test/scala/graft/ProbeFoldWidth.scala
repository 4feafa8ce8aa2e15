package graft

import org.apache.spark.sql.functions._

/** Dev-only probe (r18 verdict item 6): does the bloom probe's
  * fewer-tasks-win finding transfer to the other heavy scans?
  *
  * The r18 bloom probe found 16 build tasks beat 64 on 32 cores — but
  * that fold holds a 479 MB sketch PER TASK, so concurrent tasks thrash
  * the shared memory bus. The two heaviest non-bloom kernel scans
  * (MinHash signature build, SimHash fingerprint) hold only per-ROW
  * state inside a compiled expression — no cross-row fold array — so
  * the mechanism predicts they are compute-bound and task-count-neutral
  * down to core count. This probe measures instead of assuming: one
  * fixed md5-derived corpus, each scan swept at {8, 16, 32, 64}
  * partitions, min-of-3 wall per point, count() as the sink (no
  * collect, nothing leaves the executors).
  *
  * Run: `sbt "Test/runMain graft.ProbeFoldWidth"`; writes
  * `bench_records/r19_foldwidth_probe.json`
  * (`SPARK_GRAFT_FOLD_OUT` overrides). `SPARK_GRAFT_FOLD_DOCS` sizes
  * the corpus (default 2,000,000 docs ≈ 0.8 GB of text).
  */
object ProbeFoldWidth {

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.get("SPARK_GRAFT_FOLD_DOCS").map(_.toLong).getOrElse(2000000L)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_FOLD_OUT",
      "bench_records/r19_foldwidth_probe.json")
    val widths = Seq(8, 16, 32, 64)
    val spark = graft.core.GraftSession.local("foldwidth", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val sb = new StringBuilder
    sb ++= s"""{"probe": "ProbeFoldWidth (task-count sweep of the heavy per-row kernel scans, r18 verdict item 6)",\n"""
    sb ++= s""" "n_docs": $nDocs, "widths": "${widths.mkString(",")}",\n"""

    // ~420 chars/doc of diverse md5-derived text, same construction as
    // ProbeBucketCap's boilerplate (deterministic, no RNG)
    def corpusAt(parts: Int) = spark.range(0, nDocs, 1, parts)
      .select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 12).map(b =>
          regexp_replace(md5(concat(lit(s"w$b-"), col("id"))), "(.{4})", "$1 ")): _*)
          .as("text"))

    val scans: Seq[(String, Int => Long)] = Seq(
      "minhash_signature" -> { p: Int =>
        corpusAt(p).select(graft.functions.MinHashSignature.of(
          col("text"), 5, 64, 999999999989L).as("sig"))
          .where(element_at(col("sig"), 1).isNotNull).count()
      },
      "simhash_fingerprint" -> { p: Int =>
        corpusAt(p).select(graft.functions.SimHashFingerprint.of(col("text")).as("fp"))
          .where(length(col("fp")) === 64).count()
      })

    for ((name, run) <- scans) {
      run(32) // warm-up: JIT + codegen cache, excluded from timing
      val walls = widths.map { p =>
        val secs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          val n = run(p)
          require(n == nDocs, s"$name at p=$p returned $n rows")
          (System.nanoTime() - t0) / 1e9
        }
        p -> (math.rint(secs.min * 100) / 100)
      }
      val load = osBean.getSystemLoadAverage
      sb ++= s""" "$name": {${walls.map { case (p, s) => s""""p$p": $s""" }.mkString(", ")}, "load": ${math.rint(load * 100) / 100}},\n"""
      println(s"PROBE $name min-of-3 wall: " +
        walls.map { case (p, s) => s"p$p=${s}s" }.mkString(" "))
    }

    sb ++= s""" "note": "FILL"}\n"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      sb.toString.getBytes("UTF-8"))
    println(s"PROBE wrote $outPath")
    spark.stop()
  }
}
