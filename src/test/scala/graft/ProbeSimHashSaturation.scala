package graft

import graft.ext.SimHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only probe (r19 verdict item 2): where does the SimHash
  * pigeonhole lane's block space saturate as the corpus grows?
  *
  * The r19 bucket-cap probe surfaced the structural finding: unlike the
  * MinHash banded lane, the pigeonhole lane has NO discriminative-band
  * rescue path — every block of a near-duplicate pair is shared, so when
  * a block bucket overflows the stop-bucket cap, ALL of that pair's
  * routes through that block die together. The block space is also
  * FIXED: maxHamming=3 splits 64 bits into 4 blocks of 16 bits, so the
  * mean bucket occupancy grows as λ = n / 2¹⁶ regardless of content.
  * Once λ approaches the cap, background collisions push even
  * honest buckets over it and recall collapses — not from skew (the r19
  * finding) but from CORPUS SIZE ALONE.
  *
  * This probe measures that collapse on the most FAVORABLE corpus shape:
  * flat (every doc its own ~360-char md5 word salad — fingerprints
  * uniform over the block space, no families, no shared vocabulary),
  * with ~2000 planted twin pairs (4-char tail edit, ~95% shared mass).
  * Real corpora share vocabulary and hit the ceiling EARLIER, so the
  * measured ceiling is the optimistic bound — the right side for a
  * guard.
  *
  * Outputs per (n, cap): recall of the REACHABLE twins (true Hamming
  * ≤ 3 — the verify stage's own filter), verified-pair count, wall
  * seconds, and the block-bucket occupancy histogram (mean λ, max, and
  * the fraction of (doc, block) routes the cap drops). The cap-25 run
  * at n=2²¹ has the SAME λ/cap ratio (1.28) as the cap-50 run at
  * n=2²², so matching recalls there demonstrate λ/cap is the governing
  * ratio — the cheap form of a full cap sweep.
  *
  * The JSON record is (re)written after EVERY size, so a long sweep
  * interrupted mid-run keeps everything measured so far.
  *
  * Run: `sbt "Test/runMain graft.ProbeSimHashSaturation"`; writes
  * `bench_records/r20_simhash_saturation.json` (path via
  * `SPARK_GRAFT_SAT_OUT`). Tunables: `SPARK_GRAFT_SAT_SIZES` (doc
  * counts, default `262144,1048576,2097152,3145728,4194304`),
  * `SPARK_GRAFT_SAT_CAPSWEEP` (extra caps swept at `_SWEEP_AT`,
  * defaults `25` at `2097152`).
  */
object ProbeSimHashSaturation {

  private val TwinOffset = 1000000000L
  private val Twins = 2000L

  /** Flat corpus: n docs of unique word salad + planted twin pairs.
    * Returns (docs(doc_id, text), planted(doc_a, doc_b)).
    */
  private def corpus(spark: org.apache.spark.sql.SparkSession,
                     n: Long): (DataFrame, DataFrame) = {
    val members = spark.range(0, n, 1, 32).select(col("id").as("doc_id"))
    // ~360 chars of per-doc boilerplate: nine md5 blocks of the doc id,
    // spaced every 4 hex chars so shingle/token mass is diverse
    val boiler = concat_ws(" ", (0 until 9).map(b =>
      regexp_replace(md5(concat(lit(s"doc$b-"), col("doc_id"))),
        "(.{4})", "$1 ")): _*)
    // ~20-char unique tail; the twin edit replaces the last 4 hex chars
    def uniq(edited: Boolean) = {
      val hex = substring(md5(concat(lit("tail-"), col("doc_id"))), 1, 16)
      val h = if (edited) concat(substring(hex, 1, 12), lit("zzzz")) else hex
      regexp_replace(h, "(.{4})", "$1 ")
    }
    val baseDocs = members.select(col("doc_id"),
      concat(boiler, lit(" "), uniq(edited = false)).as("text"))
    val twinDocs = members.filter(col("doc_id") < Twins).select(
      (col("doc_id") + TwinOffset).as("doc_id"),
      concat(boiler, lit(" "), uniq(edited = true)).as("text"))
    val planted = members.filter(col("doc_id") < Twins)
      .select(col("doc_id").as("doc_a"), (col("doc_id") + TwinOffset).as("doc_b"))
    (baseDocs.unionAll(twinDocs).localCheckpoint(true),
      planted.localCheckpoint(true))
  }

  def main(args: Array[String]): Unit = {
    val sizes = sys.env.get("SPARK_GRAFT_SAT_SIZES")
      .map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(262144L, 1048576L, 2097152L, 3145728L, 4194304L))
    val capSweep = sys.env.get("SPARK_GRAFT_SAT_CAPSWEEP")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(25))
    val sweepAt = sys.env.getOrElse("SPARK_GRAFT_SAT_SWEEP_AT", "2097152").toLong
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SAT_OUT",
      "bench_records/r20_simhash_saturation.json")
    val spark = graft.core.GraftSession.local("simhash-sat", 32)
    spark.sparkContext.setLogLevel("ERROR")
    // the guard under design is the thing being measured — lift it out
    // of the probe's way so the sweep can cross the ceiling
    spark.conf.set("spark.graft.simhash.maxOccupancyPerCap", "1000000")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val sb = new StringBuilder
    sb ++= s"""{"probe": "ProbeSimHashSaturation (pigeonhole block-space saturation vs corpus size, r19 verdict item 2)",\n"""
    sb ++= s""" "sizes": [${sizes.mkString(", ")}], "maxHamming": 3, "blocks": "4 x 16 bits", "twins_planted": $Twins,\n"""

    val layout = SimHash.blockLayout(3)

    def measure(docs: DataFrame, plantedSh: DataFrame, reachable: Long,
                n: Long, cap: Int): String = {
      val t0 = System.nanoTime()
      val pairs = SimHash.pairs(docs, maxHamming = 3, bucketCap = cap)
        .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
      val nCands = pairs.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val found = plantedSh.join(pairs, Seq("doc_a", "doc_b"), "left_semi").count()
      val recall = if (reachable == 0) 0.0
        else math.rint(1000.0 * found / reachable) / 1000
      val load = math.rint(osBean.getSystemLoadAverage * 100) / 100
      println(f"PROBE n=$n%-8d cap=$cap%-4d recall=$recall%.3f ($found/$reachable) cands=$nCands (${sec}%.1f s, load $load)")
      s"""{"recall": $recall, "found": $found, "reachable": $reachable, "candidates": $nCands, "sec": ${math.rint(sec * 10) / 10}, "load": $load}"""
    }

    for (n <- sizes) {
      val (docs, planted) = corpus(spark, n)
      val fp = SimHash.fingerprints(docs).localCheckpoint(true)
      // intrinsic ceiling: only twins at true Hamming <= 3 are reachable
      // (the verify stage filters exactly this)
      val plantedSh = planted
        .join(fp.select(col("doc_id").as("doc_a"), col("simhash").as("sh_a")), "doc_a")
        .join(fp.select(col("doc_id").as("doc_b"), col("simhash").as("sh_b")), "doc_b")
        .withColumn("ham", (0 until 64).map(i =>
          when(substring(col("sh_a"), i + 1, 1) =!= substring(col("sh_b"), i + 1, 1), 1)
            .otherwise(0)).reduce(_ + _))
        .filter(col("ham") <= 3)
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint(true)
      val reachable = plantedSh.count()

      // block-bucket occupancy: group docs by (block index, exact block
      // substring) — the same buckets pairs() builds; the mass above the
      // cap is exactly what the stop-bucket drop removes
      val blocked = fp.select(col("doc_id"),
        posexplode(array(layout.map { case (off, w) =>
          substring(col("simhash"), off + 1, w) }: _*)).as(Seq("blk", "bits")))
      val occ = blocked.groupBy("blk", "bits").count().localCheckpoint(true)
      val nBuckets = occ.count()
      val maxOcc = occ.agg(max("count")).head().getLong(0)
      val lambda = math.rint(100.0 * (n + Twins) * layout.size / nBuckets) / 100
      def droppedFrac(cap: Int): Double = {
        val dropped = occ.filter(col("count") > cap)
          .agg(coalesce(sum("count"), lit(0L))).head().getLong(0)
        math.rint(1000.0 * dropped / ((n + Twins) * layout.size)) / 1000
      }
      sb ++= s""" "n_$n": {"reachable": $reachable, "buckets": $nBuckets, "mean_occupancy": $lambda, "max_occupancy": $maxOcc, "routes_dropped_cap50": ${droppedFrac(50)},\n"""
      println(f"PROBE n=$n%-8d buckets=$nBuckets meanOcc=$lambda maxOcc=$maxOcc dropped@50=${droppedFrac(50)}%.3f reachable=$reachable")
      sb ++= s"""  "cap_50": ${measure(docs, plantedSh, reachable, n, 50)}"""
      // matched-ratio sweep: cap 25 at n=sweepAt has the same λ/cap as
      // cap 50 at 2·sweepAt — does the ceiling scale with the cap?
      if (n == sweepAt) {
        for (c <- capSweep)
          sb ++= s""",\n  "cap_$c": ${measure(docs, plantedSh, reachable, n, c)}"""
      }
      sb ++= "},\n"
      fp.unpersist(); docs.unpersist(); planted.unpersist(); occ.unpersist()
      // checkpoint the record after every size — a killed sweep keeps
      // everything measured so far
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (sb.toString + s""" "note": "FILL (partial through n=$n)"}\n""").getBytes("UTF-8"))
    }

    sb ++= s""" "note": "FILL"}\n"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      sb.toString.getBytes("UTF-8"))
    println(s"PROBE wrote $outPath")
    spark.stop()
  }
}
