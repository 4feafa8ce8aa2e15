package graft

import graft.ext.{MinHashDedup, SimHash}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only probe (r18 verdict item 3): what does a 100-TB-shaped skewed
  * corpus do to LSH candidate recall when buckets overflow the
  * stop-bucket cap?
  *
  * All three banded families (MinHash bands, SimHash pigeonhole blocks,
  * NgramJaccard's banded prefilter) drop buckets above `bucketCap = 50`
  * via the shared [[MinHashDedup.pairsFromBuckets]]. Exhaustive-recall
  * pins exist at gate scale (d4b) where no bucket is hot; this probe
  * builds the adversarial shape those pins never see — TEMPLATE
  * FAMILIES, the boilerplate-heavy structure of crawl corpora — and
  * measures recall and candidate volume as a function of the cap.
  *
  * Corpus: families of geometrically spread sizes (8 … 2048 docs), each
  * family sharing a ~360-char family boilerplate (~95% of every member's
  * shingle mass) plus a ~20-char unique tail per doc — so a family of
  * size g puts ~0.8·g members into the SAME band bucket for every
  * boiler-dominated band (≈78% of bands at this mass). Planted ground
  * truth: ~200 twin pairs per size class (twin = member with a 4-char
  * tail edit, shingle Jaccard ≈ 0.97). A twin pair is recovered either
  * via a family-hot bucket (survives iff ~0.8·g ≤ cap — the knob under
  * test) or via a discriminative band containing a unique-tail hash
  * (bucket size ~2, survives any cap; probability fixed by the band
  * geometry, NOT by the cap — the intrinsic ceiling the cap=∞ run
  * measures). Deterministic: all content is md5-derived, no RNG.
  *
  * Outputs per (scale, cap): overall + per-family-size recall of the
  * planted twins, candidate-pair count, wall seconds. The SimHash lane
  * runs the same corpus through the pigeonhole-block topology (with its
  * own intrinsic ceiling: the fraction of twins at true Hamming ≤ 3,
  * measured exactly on the planted pairs first).
  *
  * Run: `sbt "Test/runMain graft.ProbeBucketCap"`; writes
  * `bench_records/r19_bucketcap_probe.json` (path overridable via
  * `SPARK_GRAFT_CAP_OUT`). Tunables: `SPARK_GRAFT_CAP_SCALE` (family
  * multiplier, default 8 ≈ 208k docs), `SPARK_GRAFT_CAP_CAPS`
  * (default `25,50,100,200`; `inf` allowed — only sane at scale 1).
  */
object ProbeBucketCap {

  private val TwinOffset = 1000000000L

  /** (family size, families at scale 1). Classes are balanced to ~5k
    * docs each at scale 1 so per-class recall has comparable support.
    */
  private val Classes = Seq((8, 625), (32, 157), (128, 40), (512, 10), (2048, 3))

  private val TwinsPerClass = 200

  /** Corpus + planted twin pairs. Returns (docs(doc_id, text),
    * planted(doc_a, doc_b, fam_size)).
    */
  private def corpus(spark: org.apache.spark.sql.SparkSession,
                     scale: Int): (DataFrame, DataFrame) = {
    var famBase = 0L
    val parts = Classes.map { case (g, m1) =>
      val m = m1 * scale
      val base = famBase
      famBase += m
      // twins: ~TwinsPerClass per class, spread over the first nFam
      // families, perFam members each — never more than the class holds
      val nFam = math.min(m, TwinsPerClass)
      val perFam = math.min(g, math.ceil(TwinsPerClass.toDouble / nFam).toInt)
      spark.range(0, m)
        .select((col("id") + base).as("family"), lit(g).as("fam_size"),
          explode(sequence(lit(0), lit(g - 1))).as("member"))
        .withColumn("doc_id", col("family") * 10000L + col("member"))
        .withColumn("plant_twin",
          col("family") < (base + nFam) && col("member") < perFam)
    }
    val members = parts.reduce(_ unionAll _)

    // ~360 chars of family boilerplate: nine md5 blocks of the family
    // id, spaced every 4 hex chars so shingles are diverse
    val boiler = concat_ws(" ", (0 until 9).map(b =>
      regexp_replace(md5(concat(lit(s"fam$b-"), col("family"))),
        "(.{4})", "$1 ")): _*)
    // ~20-char unique tail from the BASE doc id; the twin edit replaces
    // the last 4 hex chars before spacing (≈8 changed shingles of ~300)
    def uniq(edited: Boolean) = {
      val hex = substring(md5(concat(lit("doc-"), col("doc_id"))), 1, 16)
      val h = if (edited) concat(substring(hex, 1, 12), lit("zzzz")) else hex
      regexp_replace(h, "(.{4})", "$1 ")
    }
    val baseDocs = members.select(col("doc_id"),
      concat(boiler, lit(" "), uniq(edited = false)).as("text"))
    val twinDocs = members.filter(col("plant_twin")).select(
      (col("doc_id") + TwinOffset).as("twin_id"), col("doc_id"), col("family"))
      .select(col("twin_id").as("doc_id"),
        // NB: boiler/uniq reference col("family")/col("doc_id") — the
        // select above kept both, with doc_id still the BASE id
        concat(boiler, lit(" "), uniq(edited = true)).as("text"))
    val planted = members.filter(col("plant_twin"))
      .select(col("doc_id").as("doc_a"),
        (col("doc_id") + TwinOffset).as("doc_b"), col("fam_size"))
    (baseDocs.unionAll(twinDocs).localCheckpoint(true),
      planted.localCheckpoint(true))
  }

  private def recallByClass(cands: DataFrame, planted: DataFrame): Map[Int, (Long, Long)] = {
    val found = planted.join(cands, Seq("doc_a", "doc_b"), "left_semi")
      .groupBy("fam_size").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    planted.groupBy("fam_size").count().collect()
      .map(r => r.getInt(0) -> (found.getOrElse(r.getInt(0), 0L), r.getLong(1))).toMap
  }

  def main(args: Array[String]): Unit = {
    val scale = sys.env.get("SPARK_GRAFT_CAP_SCALE").map(_.toInt).getOrElse(8)
    val caps: Seq[Int] = sys.env.get("SPARK_GRAFT_CAP_CAPS")
      .map(_.split(",").map(_.trim).toSeq).getOrElse(Seq("25", "50", "100", "200"))
      .map { case "inf" => Int.MaxValue; case s => s.toInt }
    val outPath = sys.env.getOrElse("SPARK_GRAFT_CAP_OUT",
      "bench_records/r19_bucketcap_probe.json")
    val spark = graft.core.GraftSession.local("bucketcap", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val sb = new StringBuilder

    val (docs, planted) = corpus(spark, scale)
    val nDocs = docs.count()
    val nPlanted = planted.count()
    sb ++= s"""{"probe": "ProbeBucketCap (stop-bucket cap recall under template-family skew, r18 verdict item 3)",\n"""
    sb ++= s""" "scale": $scale, "n_docs": $nDocs, "n_planted": $nPlanted, "classes": "${Classes.map(_._1).mkString(",")}",\n"""
    println(s"PROBE corpus: $nDocs docs, $nPlanted planted twins, scale=$scale")

    // intrinsic SimHash ceiling: exact Hamming of the planted pairs —
    // the verify stage filters Hamming <= 3, so only this subset is
    // reachable; the SimHash lane's recall is measured against IT
    // (candidate recall of reachable pairs), not against all twins
    val fp = SimHash.fingerprints(docs)
    val plantedSh = planted
      .join(fp.select(col("doc_id").as("doc_a"), col("simhash").as("sh_a")), "doc_a")
      .join(fp.select(col("doc_id").as("doc_b"), col("simhash").as("sh_b")), "doc_b")
      .withColumn("ham", (0 until 64).map(i =>
        when(substring(col("sh_a"), i + 1, 1) =!= substring(col("sh_b"), i + 1, 1), 1)
          .otherwise(0)).reduce(_ + _))
      .filter(col("ham") <= 3)
      .select(col("doc_a"), col("doc_b"), col("fam_size"))
      .localCheckpoint(true)
    val hamLe3 = plantedSh.count()
    sb ++= s""" "simhash_twins_within_hamming3": $hamLe3,\n"""
    println(s"PROBE simhash intrinsic ceiling: $hamLe3/$nPlanted twins at Hamming<=3")

    for (cap <- caps) {
      val capTag = if (cap == Int.MaxValue) "inf" else cap.toString
      // --- MinHash banded lane ---
      var t0 = System.nanoTime()
      val mh = MinHashDedup.candidatePairs(docs, n = 5, bucketCap = cap)
        .localCheckpoint(true)
      val mhCount = mh.count()
      val mhSec = (System.nanoTime() - t0) / 1e9
      val mhRec = recallByClass(mh, planted)
      // --- SimHash block lane ---
      t0 = System.nanoTime()
      val sh = SimHash.pairs(docs, maxHamming = 3, bucketCap = cap)
        .select(col("doc_a"), col("doc_b")).localCheckpoint(true)
      val shCount = sh.count()
      val shSec = (System.nanoTime() - t0) / 1e9
      val shRec = recallByClass(sh, plantedSh)
      val load = osBean.getSystemLoadAverage
      def fmt(m: Map[Int, (Long, Long)]): String =
        Classes.map { case (g, _) =>
          val (f, t) = m.getOrElse(g, (0L, 0L))
          s""""g$g": ${if (t == 0) 0.0 else math.rint(1000.0 * f / t) / 1000}"""
        }.mkString("{", ", ", "}")
      def overall(m: Map[Int, (Long, Long)]): Double = {
        val f = m.values.map(_._1).sum; val t = m.values.map(_._2).sum
        if (t == 0) 0.0 else math.rint(1000.0 * f / t) / 1000
      }
      sb ++= s""" "cap_$capTag": {"minhash": {"recall": ${overall(mhRec)}, "by_class": ${fmt(mhRec)}, "candidates": $mhCount, "sec": ${math.rint(mhSec * 10) / 10}},\n"""
      sb ++= s"""  "simhash": {"recall": ${overall(shRec)}, "by_class": ${fmt(shRec)}, "candidates": $shCount, "sec": ${math.rint(shSec * 10) / 10}}, "load": ${math.rint(load * 100) / 100}},\n"""
      println(f"PROBE cap=$capTag%-5s minhash recall=${overall(mhRec)}%.3f cands=$mhCount%d (${mhSec}%.1f s) by_class=${fmt(mhRec)}  |  simhash recall=${overall(shRec)}%.3f cands=$shCount%d (${shSec}%.1f s)")
    }

    sb ++= s""" "note": "FILL"}\n"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      sb.toString.getBytes("UTF-8"))
    println(s"PROBE wrote $outPath")
    spark.stop()
  }
}
