package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Approximate nearest neighbors via random-hyperplane (sign) LSH.
  *
  * Scale path for similarity search: brute force scores |Q|x|N| pairs; at
  * 100 TB that is unrunnable. Sign-LSH assigns every vector a `bits`-bit
  * code per band (sign of projection onto fixed pseudo-random +-1
  * hyperplanes); vectors sharing a (band, code) bucket are candidates,
  * turning ANN into an equi-join + a rescore of only the buckets. Recall
  * is tuned by the number of independent bands.
  *
  * The hyperplanes are not stored: component (band, bit, dim) is derived
  * from the parity of the first hex digit of `md5(plane_id)` — the same
  * scheme the MinHash family uses, because DuckDB can replay it: the
  * whole LSH pipeline (codes, buckets, rescore, top-k) is SQL-expressible
  * and [[topKOracle]] generates that SQL, making `s2_ann_lsh` a
  * hash-gated query rather than a rows-only one. (xxhash64 is the
  * production drop-in where oracle parity is not needed.) Codes are
  * computed by the native [[graft.functions.SignLshCodes]] expression —
  * one codegen'd pass per vector over a precomputed sign table, narrow
  * and shuffle-free; the exact integer projections make codes
  * deterministic on any partitioning and bit-identical to the oracle's
  * relational replay.
  *
  * Candidates are rescored with the exact quantized dot; per-vector norms
  * are computed ONCE (per-vector invariant) and carried through the
  * candidate joins, never re-derived per candidate pair.
  */
object AnnLsh {

  /** Default band geometry, tuned for top-k recall (ONE definition —
    * Spark path and SQL oracle must agree). Measured against brute force
    * on the testdata (moderate-similarity neighbors, cosine ~0.3-0.5):
    * 24 bands x 6 bits -> recall@5 = 0.62, vs 0.0 for the near-dup
    * geometry (8 x 12) that only buckets cosine ~0.9+ pairs. Fewer bits
    * = coarser buckets = more candidates: per-band collision for random
    * pairs is 2^-bits, so `bits` must grow with log2(corpus) at scale —
    * 6 bits is right for 10^3..10^4 vectors; a 100 TB corpus runs ~16-20
    * bits with more bands, or the IVF path ([[AnnIvf]]) whose probe
    * count is similarity-independent.
    */
  val defaultBands = 24
  val defaultBits  = 6

  /** (vec_id, band, code) LSH codes for every vector: ONE narrow
    * projection through the native [[graft.functions.SignLshCodes]]
    * expression (exact integer projections against a precomputed
    * md5-parity sign table — bit-identical to the relational
    * explode/join/aggregate formulation the SQL oracle replays, without
    * shuffling corpus x bands x bits partial sums and without the
    * seconds-long janino compile a bands x bits inlined-dot projection
    * costs). `posexplode` of the code array yields (band, code) directly.
    */
  def codes(embeddings: DataFrame, bands: Int, bits: Int, dims: Int): DataFrame =
    embeddings.select(
      col("vec_id"),
      posexplode(graft.functions.SignLshCodes.of(col("embedding"), bands, bits, dims))
        .as(Seq("band", "code")))

  /** Candidate pairs (a < b) sharing any (band, code) bucket — the
    * single-shuffle bucket-collect ([[MinHashDedup.pairsFromBuckets]]),
    * not a cached self-join.
    *
    * Stop-bucket cap: bucket sizes are ~n/2^bits per band in expectation,
    * but a skewed corpus (many near-identical vectors) or `bits` too
    * coarse for the corpus puts O(n)-member buckets in the plan, and each
    * bucket's pair fan-out is quadratic in its size — a cap is
    * ENFORCEMENT, not convention, exactly as in
    * [[MinHashDedup.candidatePairs]] and [[SimHash.pairs]]: buckets above
    * `bucketCap` members carry almost no discriminating signal and are
    * dropped before pair generation, bounding every task at O(cap^2).
    * Keep `bits` proportional to log2(n) so real near-neighbor buckets
    * stay far below the cap.
    */
  def candidatePairs(embeddings: DataFrame, bands: Int = defaultBands, bits: Int = defaultBits,
                     bucketCap: Int = 1000): DataFrame = {
    val members = codes(embeddings, bands, bits, dims = 64)
      .select(col("vec_id").as("doc_id"), col("band"), col("code"))
    MinHashDedup.pairsFromBuckets(members, col("band"), col("code"), bucketCap)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
  }

  /** Top-k ANN for `queries` (a subset of `embeddings` rows) restricted to
    * LSH candidates, rescored exactly.
    *
    * Candidates are each query's bucket-mates: the (small) query-code
    * side broadcasts into the corpus-code join, so candidate generation
    * touches |queries| x bands buckets — NOT the corpus all-pairs
    * ([[candidatePairs]], the dedup-shaped primitive, which at coarse
    * `bits` is quadratically larger than any top-k query needs).
    */
  def topK(embeddings: DataFrame, queries: DataFrame, k: Int,
           bands: Int = defaultBands, bits: Int = defaultBits): DataFrame = {
    val c = codes(embeddings, bands, bits, dims = 64)
    // query codes from the (small) query frame — same deterministic
    // pipeline, |queries| x 64 exploded rows instead of the corpus
    val qc = codes(queries, bands, bits, dims = 64)
      .select(col("vec_id").as("qid"), col("band"), col("code"))
    val sym = c.select(col("vec_id").as("cid"), col("band"), col("code"))
      .join(broadcast(qc), Seq("band", "code"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"))
      .distinct()
    // norms computed once per vector in the projection, carried through
    // the joins (per-pair dotQ(v,v) re-derivation is 2x the rescore cost)
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"),
      sqrt(VectorOps.dotQ(col("embedding"), col("embedding")).cast(DoubleType)).as("qn"))
    val c2 = embeddings.select(col("vec_id").as("cid"), col("embedding").as("cv"),
      sqrt(VectorOps.dotQ(col("embedding"), col("embedding")).cast(DoubleType)).as("cn"))
    val scored = sym.join(broadcast(q), "qid").join(c2, "cid")
      .filter(VectorOps.validNorm(col("qn")) && VectorOps.validNorm(col("cn")))
      .withColumn("cosine",
        VectorOps.dotQ(col("qv"), col("cv")).cast(DoubleType) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("cosine"))
  }

  /** DuckDB CTE block replaying [[codes]]: planes from md5 parity, the
    * same integer-grid projections, the same band/bit/dim derivation
    * (explicit floor — DuckDB CAST rounds where Spark's truncates).
    * Emits CTEs `planes`, `proj`, `codes`; expects `el` (from
    * [[VectorOps.oracleElems]]) in scope.
    */
  def codesOracleCtes(bands: Int, bits: Int, dims: Int): String = {
    val n = bands.toLong * bits * dims
    s"""planes AS (
       |  SELECT CAST(floor(t.i / ${bits * dims}) AS INT) AS band,
       |         CAST(floor((t.i % ${bits * dims}) / $dims) AS INT) AS bit,
       |         CAST(t.i % $dims AS INT) AS dim,
       |         CASE WHEN (instr('0123456789abcdef', substr(md5(CAST(t.i AS VARCHAR)), 1, 1)) - 1) % 2 = 0
       |              THEN 1 ELSE -1 END AS sign
       |  FROM range(0, $n) t(i)),
       |proj AS (
       |  SELECT el.vec_id, p.band, p.bit, CAST(SUM(el.x * p.sign) AS BIGINT) AS proj
       |  FROM el JOIN planes p ON p.dim = el.i - 1
       |  GROUP BY 1, 2, 3),
       |codes AS (
       |  SELECT vec_id, band,
       |         CAST(SUM(CASE WHEN proj >= 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS code
       |  FROM proj GROUP BY 1, 2)""".stripMargin
  }

  /** CTE chain replaying the whole [[topK]] pipeline (buckets, exact
    * rescore, deterministic rank), ending in
    * `lsh(qid, cid, cosine, rank)`. Expects `el`/`norms` in scope;
    * shared by [[topKOracle]] and the s4 recall oracle.
    */
  def lshCtes(k: Int, maxQid: Long, bands: Int = defaultBands, bits: Int = defaultBits): String =
    s"""${codesOracleCtes(bands, bits, dims = 64)},
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM codes a JOIN codes b
       |    ON a.band = b.band AND a.code = b.code AND a.vec_id < b.vec_id),
       |sym AS (
       |  SELECT id_a AS qid, id_b AS cid FROM cand
       |  UNION ALL
       |  SELECT id_b AS qid, id_a AS cid FROM cand),
       |qcand AS (SELECT qid, cid FROM sym WHERE qid < $maxQid),
       |ldots AS (
       |  SELECT q.qid, q.cid, CAST(SUM(a.x * b.x) AS DOUBLE) AS dot
       |  FROM qcand q
       |  JOIN el a ON a.vec_id = q.qid
       |  JOIN el b ON b.vec_id = q.cid AND b.i = a.i
       |  GROUP BY 1, 2),
       |lscored AS (
       |  SELECT qid, cid, dot / (sqrt(na.n2) * sqrt(nb.n2)) AS cosine
       |  FROM ldots JOIN norms na ON qid = na.vec_id JOIN norms nb ON cid = nb.vec_id
       |  WHERE na.n2 > 0 AND nb.n2 > 0),
       |lranked AS (
       |  SELECT qid, cid, cosine,
       |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rank
       |  FROM lscored),
       |lsh AS (SELECT qid, cid, cosine, rank FROM lranked WHERE rank <= $k)""".stripMargin

  /** Full DuckDB oracle for [[topK]] over the `embeddings` table with
    * queries `vec_id < maxQid` — the SQL twin of the registered
    * `s2_ann_lsh`.
    */
  def topKOracle(k: Int, maxQid: Long, bands: Int = defaultBands, bits: Int = defaultBits): String =
    s"""WITH ${VectorOps.oracleElems},
       |${lshCtes(k, maxQid, bands, bits)}
       |SELECT qid, CAST(rank AS INT) AS rank, cid, cosine FROM lsh""".stripMargin
}
