package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Vector (embedding) column algebra over `array<float>` columns.
  *
  * North-star extension (no reference counterpart — the reference's only
  * vector columns are spark.ml `Vector`s fed to estimators,
  * `src/main/java/com/retail/ml/SegmentationModel.java:73-88`).
  *
  * Determinism: a double dot product is order-dependent under partial
  * aggregation, and float->decimal rounding is engine-specific. The engine
  * instead *quantizes* each component to a 64-bit integer grid
  * (`floor(x * 10^7)`: float widens to double exactly, the multiply and
  * floor are single IEEE ops — bit-identical everywhere), then computes
  * inner products in exact integer arithmetic (order-independent; |dot|
  * bounded by 64 * (10^7)^2 << 2^63). Quantized cosine differs from true
  * cosine by < 1e-6 relative — irrelevant for ranking/dedup — and is
  * reproducible on any partitioning and any engine.
  *
  * The higher-order functions (`zip_with`/`aggregate`) evaluate per-row
  * without shuffles; brute-force pairwise scoring is quadratic and only
  * for oracle-scale verification — the scale path is LSH bucketing
  * ([[AnnLsh]]) which turns ANN into an equi-join.
  */
object VectorOps {

  /** Quantization grid: 10^7 steps per unit. */
  val Q = 1e7

  /** Quantize a float/double element to the integer grid. */
  def quant(x: Column): Column = floor(x * lit(Q)).cast(LongType)

  /** Exact (quantized) integer inner product of two float-array columns. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => quant(x) * quant(y)),
      lit(0L),
      (acc, x) => acc + x)

  /** Cosine similarity on the quantized grid; the final sqrt/divide are
    * single IEEE double ops (deterministic).
    */
  def cosine(a: Column, b: Column): Column =
    dotQ(a, b).cast(DoubleType) /
      (sqrt(dotQ(a, a).cast(DoubleType)) * sqrt(dotQ(b, b).cast(DoubleType)))

  /** All pairs (id_a < id_b) with quantized cosine >= threshold, via a
    * broadcast nested-loop scan: the quantized matrix is broadcast once
    * and each task scans its slice of rows against it in primitive long
    * arithmetic — the block-local brute-force primitive (what an IVF cell
    * rescore runs at scale, where "all vectors" is one cell's list, not
    * the corpus). Identical doubles to [[cosine]]: same integer dot, same
    * single sqrt/divide.
    */
  def bruteForcePairs(embeddings: org.apache.spark.sql.DataFrame,
                      threshold: Double): org.apache.spark.sql.DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val quantized: Array[(Long, Array[Long])] = embeddings
      .select(col("vec_id"), transform(col("embedding"), x => quant(x)).as("q"))
      .as[(Long, Array[Long])]
      .collect()
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(quantized)
    val n = quantized.length
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        val m = bc.value
        val norms = m.map { case (_, q) =>
          var s = 0L; var d = 0
          while (d < q.length) { s += q(d) * q(d); d += 1 }
          math.sqrt(s.toDouble)
        }
        it.flatMap { ai =>
          val i = ai.toInt
          val (ida, qa) = m(i)
          (i + 1 until n).iterator.flatMap { j =>
            val (idb, qb) = m(j)
            var s = 0L; var d = 0
            while (d < qa.length) { s += qa(d) * qb(d); d += 1 }
            val cos = s.toDouble / (norms(i) * norms(j))
            if (cos >= threshold) Some((ida, idb, cos)) else None
          }
        }
      }
      .toDF("id_a", "id_b", "cosine")
  }

  /** Shared DuckDB CTE prefix: quantized elements and norms over a 64-dim
    * `embedding` column (testdata layout). `SUM(BIGINT)` is HUGEINT in
    * DuckDB, hence the casts back to BIGINT/DOUBLE.
    */
  val oracleElems: String =
    """el AS (SELECT vec_id, i,
      |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000000) AS BIGINT) AS x
      |       FROM embeddings, range(1, 65) t(i)),
      |norms AS (SELECT vec_id, CAST(SUM(x*x) AS DOUBLE) AS n2 FROM el GROUP BY vec_id)""".stripMargin
}
