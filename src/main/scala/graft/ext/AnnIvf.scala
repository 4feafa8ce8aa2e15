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
    array(cents.toIndexedSeq.zipWithIndex.map { case (c, i) =>
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
    * norm is computed once, before the explode. `private[ext]`: the
    * IVF×PQ composition ([[AnnPq.ivfPqTopK]]) probes cells with the
    * same expression.
    */
  private[ext] def probeCells(queries: DataFrame, cents: Array[Vector], nProbe: Int): DataFrame =
    queries.select(
      col("vec_id").as("qid"), col("embedding").as("qv"),
      sqrt(VectorOps.dotQ(col("embedding"), col("embedding")).cast(DoubleType)).as("qn"),
      explode(slice(array_sort(cellScores(col("embedding"), cents)), 1, nProbe)).as("sc"))
      .select(col("qid"), col("qv"), col("qn"), col("sc.cell").as("cell"))

  /** Centroids = the vectors with the `nCells` smallest vec_ids. A
    * deterministic, SQL-replayable centroid choice: with it the WHOLE
    * IVF path (assign, probe, rescore, rank) is hash-gated by
    * [[fixedTopKOracle]] — the k-means fit is the only piece ANSI SQL
    * cannot replay, and here it drops out. Statistically worse cells
    * than k-means; byte-identical plan shape.
    */
  def fixedCentroids(embeddings: DataFrame, nCells: Int): Array[Vector] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings.orderBy(col("vec_id")).limit(nCells)
      .select(col("embedding")).as[Array[Float]].collect()
      .map(a => org.apache.spark.ml.linalg.Vectors.dense(a.map(_.toDouble)))
  }

  /** Top-k ANN: probe nProbe cells per query, rescore exactly, rank. */
  def topK(embeddings: DataFrame, queries: DataFrame, k: Int,
           nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L): DataFrame =
    topKWith(embeddings, queries, k, centroids(embeddings, nCells, seed), nProbe)

  /** [[topK]] with caller-supplied centroids (fitted or fixed). */
  def topKWith(embeddings: DataFrame, queries: DataFrame, k: Int,
               cents: Array[Vector], nProbe: Int = 4): DataFrame = {
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

  /** DuckDB oracle for [[topKWith]] + [[fixedCentroids]] over the
    * `embeddings` table with queries `vec_id < maxQid`: the same
    * quantized-integer argmin (`score = |c|^2 - 2 v*c`, ties to the
    * lower cell), the same nProbe probe, the same exact rescore and
    * deterministic rank.
    */
  def fixedTopKOracle(k: Int, maxQid: Long, nCells: Int = 16, nProbe: Int = 4,
                      candWhere: String = "TRUE"): String =
    s"""WITH ${VectorOps.oracleElems},
       |cells AS (
       |  SELECT cvec, CAST(row_number() OVER (ORDER BY cvec) - 1 AS INT) AS cell
       |  FROM (SELECT DISTINCT vec_id AS cvec FROM embeddings ORDER BY 1 LIMIT $nCells)),
       |c2 AS (
       |  SELECT c.cell, CAST(SUM(ce.x * ce.x) AS BIGINT) AS csq
       |  FROM cells c JOIN el ce ON ce.vec_id = c.cvec GROUP BY 1),
       |cdots AS (
       |  SELECT e.vec_id, c.cell, CAST(SUM(e.x * ce.x) AS BIGINT) AS dot
       |  FROM el e
       |  JOIN cells c ON TRUE
       |  JOIN el ce ON ce.vec_id = c.cvec AND ce.i = e.i
       |  GROUP BY 1, 2),
       |cellscore AS (
       |  SELECT s.vec_id, s.cell, (c2.csq - 2 * s.dot) AS score
       |  FROM cdots s JOIN c2 ON s.cell = c2.cell),
       |assigned AS (
       |  SELECT vec_id AS cid, cell FROM (
       |    SELECT vec_id, cell,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY score ASC, cell ASC) AS rn
       |    FROM cellscore) WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS qid, cell FROM (
       |    SELECT vec_id, cell,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY score ASC, cell ASC) AS rn
       |    FROM cellscore WHERE vec_id < $maxQid) WHERE rn <= $nProbe),
       |cand AS (
       |  SELECT p.qid, a.cid FROM probes p JOIN assigned a ON p.cell = a.cell
       |  WHERE a.cid <> p.qid AND ($candWhere)),
       |dots AS (
       |  SELECT q.qid, q.cid, CAST(SUM(a.x * b.x) AS DOUBLE) AS dot
       |  FROM cand q
       |  JOIN el a ON a.vec_id = q.qid
       |  JOIN el b ON b.vec_id = q.cid AND b.i = a.i
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT qid, cid, dot / (sqrt(na.n2) * sqrt(nb.n2)) AS cosine
       |  FROM dots JOIN norms na ON qid = na.vec_id JOIN norms nb ON cid = nb.vec_id),
       |ranked AS (
       |  SELECT qid, cid, cosine,
       |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rank
       |  FROM scored)
       |SELECT qid, CAST(rank AS INT) AS rank, cid, cosine FROM ranked WHERE rank <= $k""".stripMargin
}
