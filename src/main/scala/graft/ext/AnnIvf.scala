package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** IVF (inverted-file) approximate nearest neighbors.
  *
  * The second scale path for similarity search (alongside sign-LSH,
  * [[AnnLsh]]): cluster the corpus into `nCells` Voronoi cells (seeded
  * k-means over a bounded sample — deterministic), store each vector
  * under its cell id, and at query time rescore only the `nProbe` cells
  * nearest the query. At 100 TB the cell id becomes the partition key: a
  * query's candidate scan touches nProbe/nCells of the data, and the
  * rescore is the block-local brute force primitive
  * ([[VectorOps.bruteForcePairs]]-style).
  *
  * Candidate generation is approximate (recall asserted in tests); the
  * rescore uses the same quantized-integer dot + single sqrt/divide as
  * [[VectorOps.cosine]], with per-vector norms computed ONCE in the
  * assignment projection and carried through the join — never re-derived
  * per candidate pair.
  */
object AnnIvf {

  /** Cap on vectors fed to the k-means fit. Centroids are a *summary*;
    * fitting on the full corpus would make the (iterative, driver-coupled)
    * fit the bottleneck before the first query runs at 100 TB. A bounded
    * uniform sample gives statistically equivalent centroids at constant
    * cost; the sample is seeded, so centroids stay deterministic for a
    * fixed input partitioning.
    */
  val maxFitVectors: Long = 65536L

  /** Seeded k-means cell centroids over a bounded sample (deterministic;
    * the model is derived state, recomputable from data alone).
    */
  def centroids(embeddings: DataFrame, nCells: Int, seed: Long = 42L): Array[Vector] = {
    val n = embeddings.count()
    val sampled =
      if (n <= maxFitVectors) embeddings
      else embeddings.sample(withReplacement = false, maxFitVectors.toDouble / n, seed)
    val vecs = sampled.select(array_to_vector(col("embedding")).as("features"))
    new KMeans().setK(nCells).setSeed(seed).setMaxIter(10)
      .fit(vecs).clusterCenters
  }

  /** Per-centroid `struct(score, cell)` array, where
    * `score = |c|^2 - 2 v*c` on the quantized integer grid: argmin of
    * score is argmin of squared L2 (the dropped `|v|^2` is constant per
    * row). Centroids are baked in as literals (driver-side, the moral
    * equivalent of a broadcast), products are the codegen'd
    * [[graft.functions.QuantizedDot]], and integer scores make the argmin
    * deterministic on any engine/partitioning. Ties break to the lower
    * cell id via lexicographic struct ordering.
    */
  private def cellScores(v: Column, cents: Array[Vector]): Column =
    array(cents.zipWithIndex.map { case (c, i) =>
      val cf = c.toArray.map(_.toFloat)
      val c2 = cf.map { x =>
        val q = math.floor(x.toDouble * graft.functions.QuantizedDot.Grid).toLong
        q * q
      }.sum
      struct(
        (lit(c2) - lit(2L) * VectorOps.dotQ(v, typedLit(cf))).as("score"),
        lit(i).as("cell"))
    }: _*)

  /** (vec_id, cell, embedding, nrm): nearest-centroid assignment + norm
    * as ONE narrow projection — no join, no window, no exchange
    * (PlanSpec pins the exchange-free shape). The norm rides along here
    * because it is a per-vector invariant needed by every downstream
    * rescore.
    */
  def assign(embeddings: DataFrame, cents: Array[Vector]): DataFrame =
    embeddings.select(
      col("vec_id"),
      array_min(cellScores(col("embedding"), cents)).getField("cell").as("cell"),
      col("embedding"),
      sqrt(VectorOps.dotQ(col("embedding"), col("embedding")).cast(DoubleType)).as("nrm"))

  /** (qid, qv, qn, cell): each query replicated to its `nProbe` nearest
    * cells — one projection + generate, again exchange-free; the query
    * norm is computed once, before the explode.
    */
  private def probeCells(queries: DataFrame, cents: Array[Vector], nProbe: Int): DataFrame =
    queries.select(
      col("vec_id").as("qid"), col("embedding").as("qv"),
      sqrt(VectorOps.dotQ(col("embedding"), col("embedding")).cast(DoubleType)).as("qn"),
      explode(slice(array_sort(cellScores(col("embedding"), cents)), 1, nProbe)).as("sc"))
      .select(col("qid"), col("qv"), col("qn"), col("sc.cell").as("cell"))

  /** Top-k ANN: probe nProbe cells per query, rescore exactly, rank. */
  def topK(embeddings: DataFrame, queries: DataFrame, k: Int,
           nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L): DataFrame = {
    val cents = centroids(embeddings, nCells, seed)
    val assigned = assign(embeddings, cents)
      .select(col("cell"), col("vec_id").as("cid"), col("embedding").as("cv"),
        col("nrm").as("cn"))
    val probes = probeCells(queries, cents, nProbe)
    val scored = probes.join(assigned, "cell")
      .filter(col("qid") =!= col("cid"))
      .withColumn("cosine",
        VectorOps.dotQ(col("qv"), col("cv")).cast(DoubleType) / (col("qn") * col("cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("cosine"))
  }
}
