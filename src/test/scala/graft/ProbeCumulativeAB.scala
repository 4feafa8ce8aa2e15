package graft

import graft.transform.Cumulative
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only probe for the r16 verdict's item 3: `Cumulative
  * .runningTotals` documents that its input evaluates TWICE (per-bucket
  * totals pass + window pass) — at 100 TB a twice-evaluated expensive
  * upstream is real money, so the tradeoff against a one-shot
  * `localCheckpoint` of the bucketed frame must be a measured number,
  * not a judgment call.
  *
  * A/B per gated consumer input shape, `materialize = false` (ship
  * default, double evaluation) vs `true` (localCheckpoint before the
  * two passes):
  *
  *  - q59_global_index shape — the FULL corpus (doc_id + md5 order key)
  *    flows through the prefix sum; measured at sf0.1, at a 10×
  *    replicated corpus staged to parquet (clean-scan upstream, the
  *    gated shape at scale), and at 10× with the replication crossJoin
  *    left IN-PLAN (a deliberately expensive, recompute-twice upstream
  *    — the case materialization exists for);
  *  - q61_quantile_bins shape — distinct order prices + broadcast
  *    bounds (the small distinct-value frame both q61 and t17 feed);
  *  - t17_ks_drift shape — distinct n_chars with split counts + bounds.
  *
  * Evaluation is a noop-sink write (format "noop") so every output
  * column — including the window results — is computed; a count()
  * would let the optimizer collapse the unreferenced window.
  *
  * Run: `SPARK_DRIVER_MEM=48g sbt "Test/runMain graft.ProbeCumulativeAB"`;
  * paste the JSON line into `bench_records/r17_cumulative_ab.json`.
  */
object ProbeCumulativeAB {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local("cumulative_ab", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Any]

    def measure(name: String)(build: Boolean => DataFrame): Unit = {
      for (mat <- Seq(false, true)) {
        val runs = (1 to 2).map { _ =>
          spark.catalog.clearCache(); System.gc()
          val t0 = System.nanoTime()
          build(mat).write.format("noop").mode("overwrite").save()
          math.rint((System.nanoTime() - t0) / 1e6) / 1000
        }
        val tag = s"${name}_${if (mat) "mat" else "reeval"}"
        println(f"PROBE $tag%-28s min=${runs.min}%8.3f s  runs=${runs.mkString("/")}  " +
          f"load=${math.rint(osBean.getSystemLoadAverage * 100) / 100}")
        results += s"${tag}_sec" -> runs.min
        results += s"${tag}_runs" -> runs.mkString("[", ",", "]")
      }
    }

    // ---- q59 shape: full corpus through the prefix sum ----
    def q59Shape(docs: DataFrame, mat: Boolean): DataFrame =
      Cumulative.runningTotals(
        docs.select(col("doc_id"),
            md5(concat(lit("graft-r9"), lit(":"), col("doc_id").cast("string"))
              .cast("binary")).as("order_key"))
          .withColumn("_one", lit(1L)),
        "order_key", Cumulative.hexPrefixBucket(col("order_key"), 2),
        Seq("_one" -> "idx"), materialize = mat)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    measure("q59_sf01")(mat => q59Shape(docs, mat))

    // 10× corpus staged to parquet: the gated shape at scale with a
    // clean-scan upstream
    val tmp = graft.core.Scratch.path("cumab_docs10x.parquet")
    val replicas = spark.range(0, 10).select(col("id").as("replica"))
    def docs10xPlan = docs.crossJoin(broadcast(replicas))
      .withColumn("doc_id",
        concat(col("doc_id").cast("string"), lit("_r"), col("replica")))
      .drop("replica")
    docs10xPlan.write.mode("overwrite").parquet(tmp)
    val docs10x = spark.read.parquet(tmp)
    results += "docs10x_rows" -> docs10x.count()
    measure("q59_10x_scan")(mat => q59Shape(docs10x, mat))

    // 10× with the replication crossJoin left in-plan: an expensive
    // upstream that the reeval branch pays twice
    measure("q59_10x_inplan")(mat => q59Shape(docs10xPlan, mat))

    // the gated corpus is tiny (sf0.1 documents = 5000 rows; everything
    // above is sub-second, within warm-up noise) — the decision lane is
    // a 10M-row synthetic corpus where the passes take real seconds
    val big = graft.core.Scratch.path("cumab_docs_syn.parquet")
    spark.range(0, sys.env.getOrElse("SPARK_GRAFT_CUMAB_N", "10000000").toLong)
      .select(col("id").as("doc_id"))
      .write.mode("overwrite").parquet(big)
    val bigDocs = spark.read.parquet(big)
    results += "syn_rows" -> bigDocs.count()
    // clean-scan upstream at 10M (the q59 gated shape, scaled)
    measure("q59_syn_scan")(mat => q59Shape(bigDocs, mat))
    // expensive upstream at 10M: an in-plan aggregation feeding the
    // prefix sum (the recompute-twice worst case the materialization
    // option exists for)
    measure("q59_syn_agg") { mat =>
      val derived = bigDocs
        .groupBy((col("doc_id") % 2000000L).as("doc_id"))
        .agg(count(lit(1)).as("_n")).drop("_n")
      q59Shape(derived, mat)
    }

    // ---- q61 shape: distinct-value frame + broadcast bounds ----
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    measure("q61_sf01") { mat =>
      val g = orders.filter(col("o_totalprice").isNotNull)
        .groupBy(col("o_totalprice").as("v"))
        .agg(count(lit(1)).as("n_v"))
      val bounds = g.agg(min(col("v")).as("_v0"), max(col("v")).as("_v1"))
      val bucket = floor((col("v") - col("_v0")) * lit(32.0d) /
        (col("_v1") - col("_v0") + lit(1.0d))).cast("int")
      Cumulative.runningTotals(
        g.crossJoin(broadcast(bounds)), "v", bucket,
        Seq("n_v" -> "c_v"), materialize = mat)
    }

    // ---- t17 shape: distinct n_chars with split counts + bounds ----
    measure("t17_sf01") { mat =>
      val g = docs.filter(col("n_chars").isNotNull)
        .select(col("n_chars").as("v"),
          (pmod(xxhash64(col("doc_id")), lit(100)) < 50).as("in_a"))
        .groupBy(col("v"))
        .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
          sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b"))
      val bounds = g.agg(min(col("v")).as("_v0"), max(col("v")).as("_v1"))
      val bucket = floor((col("v") - col("_v0")) * lit(32L) /
        (col("_v1") - col("_v0") + lit(1L))).cast("int")
      Cumulative.runningTotals(
        g.crossJoin(broadcast(bounds)), "v", bucket,
        Seq("n_a" -> "c_a", "n_b" -> "c_b"), materialize = mat)
    }

    val json = results.map {
      case (k, v: String) if v.startsWith("[") => s""""$k":$v"""
      case (k, v: String) => s""""$k":"$v""""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")
    println("CUMULATIVE_AB_JSON " + json)
    spark.stop()
  }
}
