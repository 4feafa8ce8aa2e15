package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbors.
  *
  * The second scale path for similarity search (alongside sign-LSH,
  * [[AnnLsh]]): cluster the corpus into `nCells` Voronoi cells (seeded
  * k-means over a sample — deterministic), store each vector under its
  * cell id, and at query time rescore only the `nProbe` cells nearest the
  * query. At 100 TB the cell id becomes the partition key: a query's
  * candidate scan touches nProbe/nCells of the data, and the rescore is
  * the block-local brute force primitive
  * ([[VectorOps.bruteForcePairs]]-style).
  *
  * Candidate generation is approximate (recall asserted in tests); the
  * rescore uses [[VectorOps.cosine]] (exact quantized arithmetic).
  */
object AnnIvf {

  /** Seeded k-means cell centroids (deterministic; the model is derived
    * state, recomputable from data alone).
    */
  def centroids(embeddings: DataFrame, nCells: Int, seed: Long = 42L): Array[Vector] = {
    val vecs = embeddings.select(array_to_vector(col("embedding")).as("features"))
    new KMeans().setK(nCells).setSeed(seed).setMaxIter(10)
      .fit(vecs).clusterCenters
  }

  /** (vec_id, cell, embedding): nearest-centroid assignment via a
    * broadcast centroid table + argmin — one narrow pass, no shuffle.
    */
  def assign(embeddings: DataFrame, cents: Array[Vector]): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val centDf = cents.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }.toSeq
      .toDF("cell", "centroid")
    val dist2 = aggregate(
      zip_with(col("embedding"), col("centroid"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("cell").asc)
    embeddings
      .crossJoin(broadcast(centDf))
      .withColumn("d2", dist2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"), col("embedding"))
  }

  /** Query assignment to the `nProbe` nearest cells. */
  private def probeCells(queries: DataFrame, cents: Array[Vector], nProbe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val centDf = cents.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }.toSeq
      .toDF("cell", "centroid")
    val dist2 = aggregate(
      zip_with(col("qv"), col("centroid"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy(col("qid")).orderBy(col("d2").asc, col("cell").asc)
    queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .crossJoin(broadcast(centDf))
      .withColumn("d2", dist2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("qv"), col("cell"))
  }

  /** Top-k ANN: probe nProbe cells per query, rescore exactly, rank. */
  def topK(embeddings: DataFrame, queries: DataFrame, k: Int,
           nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L): DataFrame = {
    val cents = centroids(embeddings, nCells, seed)
    val assigned = assign(embeddings, cents)
      .select(col("cell"), col("vec_id").as("cid"), col("embedding").as("cv"))
    val probes = probeCells(queries, cents, nProbe)
    val scored = probes.join(assigned, "cell")
      .filter(col("qid") =!= col("cid"))
      .withColumn("cosine", VectorOps.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("cosine"))
  }
}
