package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest neighbors via random-hyperplane (sign) LSH.
  *
  * Scale path for similarity search: brute force scores |Q|x|N| pairs; at
  * 100 TB that is unrunnable. Sign-LSH assigns every vector a `bits`-bit
  * code per band (sign of projection onto fixed pseudo-random +-1
  * hyperplanes); vectors sharing a (band, code) bucket are candidates,
  * turning ANN into an equi-join + a rescore of only the buckets. Recall
  * is tuned by the number of independent bands.
  *
  * The hyperplanes are not stored: component (band, bit, dim) is
  * `xxhash64(band, bit, dim) mod 2 -> +-1`, so codes are deterministic
  * with no model state. Code computation is *relational* — explode the
  * vector, equi-join a broadcast planes table, two partial-aggregates —
  * rather than one giant per-row expression (which would blow codegen at
  * 64 dims x bits x bands) ... and the same shape distributes: the heavy
  * side only shuffles (vec_id, band, bit) partial sums.
  *
  * Candidates are rescored with [[VectorOps.cosine]] (exact quantized
  * arithmetic); the recall-vs-brute-force contract is asserted in tests.
  */
object AnnLsh {

  /** Broadcast-sized table of hyperplane components: (band, bit, dim, sign). */
  def planes(spark: SparkSession, bands: Int, bits: Int, dims: Int): DataFrame = {
    import spark.implicits._
    val n = bands.toLong * bits * dims
    spark.range(n).select(
      (col("id") / (bits * dims)).cast("int").as("band"),
      (col("id") % (bits * dims) / dims).cast("int").as("bit"),
      (col("id") % dims).cast("int").as("dim"),
      when(pmod(xxhash64(col("id")), lit(2)) === 0, lit(1L)).otherwise(lit(-1L)).as("sign"))
  }

  /** (vec_id, band, code) LSH codes for every vector.
    *
    * The projection sums *quantized* components (the
    * [[VectorOps.quant]] integer grid), not raw doubles: double addition
    * is order-dependent under partial aggregation, so a near-zero
    * projection could flip sign (and thus the bucket code) across
    * runs/partitionings. Integer sums are order-independent — codes are
    * genuinely deterministic.
    */
  def codes(embeddings: DataFrame, bands: Int, bits: Int, dims: Int): DataFrame = {
    val spark = embeddings.sparkSession
    val elems = embeddings.select(
      col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
    elems
      .join(broadcast(planes(spark, bands, bits, dims)), "dim")
      .groupBy(col("vec_id"), col("band"), col("bit"))
      .agg(sum(VectorOps.quant(col("x")) * col("sign")).as("proj"))
      .groupBy(col("vec_id"), col("band"))
      .agg(sum(when(col("proj") >= 0, expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(lit(0L))).as("code"))
  }

  /** Candidate pairs (a < b) sharing any (band, code) bucket. */
  def candidatePairs(embeddings: DataFrame, bands: Int = 8, bits: Int = 12): DataFrame = {
    // cached: self-joined below; without it the code pipeline runs twice
    val c = codes(embeddings, bands, bits, dims = 64).cache()
    c.as("a")
      .join(c.as("b"),
        col("a.band") === col("b.band") && col("a.code") === col("b.code") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
  }

  /** Top-k ANN for `queries` (a subset of `embeddings` rows) restricted to
    * LSH candidates, rescored exactly.
    */
  def topK(embeddings: DataFrame, queries: DataFrame, k: Int,
           bands: Int = 8, bits: Int = 12): DataFrame = {
    val pairs = candidatePairs(embeddings, bands, bits)
    val sym = pairs.select(col("id_a").as("qid"), col("id_b").as("cid"))
      .union(pairs.select(col("id_b").as("qid"), col("id_a").as("cid")))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = embeddings.select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val scored = sym.join(q, "qid").join(c, "cid")
      .withColumn("cosine", VectorOps.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("cosine"))
  }
}
