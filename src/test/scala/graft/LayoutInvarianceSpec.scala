package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout invariance of the gated query surface.
  *
  * At 100 TB no table is a single parquet file: every production input
  * is a directory of part files whose row-to-file assignment the engine
  * does not control. The driver's testdata is single-file-per-table, so
  * a layout sensitivity hash-greens on the gate and surfaces only in
  * production. The r13 dev-loop sweep (scripts/make_layout_variant.py +
  * Verify + check.py over an adversarially re-laid-out sf0.01: seeded
  * global row shuffle, uneven 7-file split, small row groups) found
  * exactly one family: the streaming staging helpers byte-copied
  * `<table>.parquet` assuming a single file — `Files.copy` of a
  * directory creates an EMPTY directory (e4/e5/e6/e7/e9/e12 died with
  * UNABLE_TO_INFER_SCHEMA, e8 silently deduped only its dup slice), and
  * a raw multi-file copy then turned the file split into an arrival
  * schedule whose interleaved event time made the watermark drop rows
  * as late data (e5/e6/e7/e12 row-short vs the batch oracle).
  *
  * This spec is the in-suite regression law for both failure modes: it
  * rebuilds a shuffled multi-file variant of every sf0.001 table with
  * Spark itself, then asserts representative registry queries — every
  * staging path that actually broke, plus one batch query per risk
  * class (tie-broken top-k, sampling, bounded driver fit) — return
  * bit-identical row multisets on the canonical and variant catalogs.
  * The full-registry proof at sf0.01 stays in the dev loop (138/138,
  * ROUND_NOTES_r13.md); this pins the mechanism in `sbt test`.
  */
class LayoutInvarianceSpec extends AnyFunSuite with SharedSpark
    with org.scalatest.BeforeAndAfterAll {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private lazy val variantDir: String = {
    val dir = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_layout_spec_sf0001").toString
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    for (t <- tables) {
      // round-robin repartition spreads consecutive source rows across
      // 7 part files — event time and key ranges interleave across the
      // files, the shape that broke the streaming staging. (The
      // adversarial uneven split + row-group variant lives in the
      // dev-loop sweep; any multi-file interleaving regresses the bug.)
      spark.read.parquet(s"$sf/$t.parquet").repartition(7)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  override def afterAll(): Unit = {
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(variantDir), true)
    super.afterAll()
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** The regression set: the three distinct staging code paths that
    * failed the sweep (stagedEventsDir stateful / stream-stream joins /
    * stagedDupDocsDir), plus one batch representative per layout-risk
    * class. Batch coverage in full breadth is the dev-loop sweep's job.
    */
  private val regressionSet = Seq(
    "e4_stateful_totals",   // stagedEventsDir + mapGroupsWithState
    "e6_stream_stream_join",// stagedEventsDir + watermark eviction (worst case)
    "e8_stream_dedup",      // stagedDupDocsDir (corpus + dup-slice files)
    "q6_topk",              // global order + limit: tie-break must be total
    "t11_stratified_take",  // per-stratum take: selection must be content-keyed
    "s3_ann_ivf",           // bounded driver fit: sample must be content-keyed
    "c3_mixture_sample")    // md5 mixture sampling: must not read layout

  test("representative registry queries are bit-identical on a shuffled multi-file layout") {
    for (q <- regressionSet) {
      val base = canon(SparkEntry.queries(q)(spark, sf))
      val got = canon(SparkEntry.queries(q)(spark, variantDir))
      assert(base.nonEmpty, s"$q: empty baseline makes the law vacuous")
      assert(got == base, s"$q diverged on the multi-file shuffled layout")
    }
  }

  test("the variant actually is multi-file (the law is not vacuous)") {
    val parts = new java.io.File(s"$variantDir/events.parquet")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts >= 2, s"variant events table has $parts part files")
  }
}
