package graft.ext

import graft.functions.{RollingHash, WindowRollingHashes}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document substring (span) dedup — the span-granularity member of
  * the dedup family (MinHash/SimHash/embedding dedup are all
  * document-granularity). Training corpora carry *repeated spans* across
  * otherwise-distinct documents (boilerplate, license headers, templated
  * passages); removing or down-weighting them needs the (doc_a, doc_b,
  * span) pair stream this operator emits.
  *
  * Shape, built for 100 TB:
  *  1. per-doc grid-window Karp-Rabin hashes via the native
  *     [[graft.functions.WindowRollingHashes]] expression — one O(n) scan
  *     per doc, `stride` thins the emitted grid so shuffle volume is
  *     `len/stride` longs per doc, never per-position;
  *  2. bucket by hash — the ONLY corpus-wide shuffle, shipping
  *     `(hash, doc_id, pos)` triples, never span text (the
  *     [[Decontaminate]] rule: digests on the wire);
  *  3. stop-bucket cap — a span shared by more than `bucketCap` grid
  *     positions is boilerplate so common that pairing it is quadratic
  *     noise; the cap bounds per-bucket work exactly like
  *     [[MinHashDedup.pairsFromBuckets]];
  *  4. exact verify — surviving pairs (a capped, collision-filtered set,
  *     orders of magnitude smaller than the corpus) join back to the
  *     documents table to compare the actual substrings, so Karp-Rabin
  *     collisions can never emit a false pair.
  *
  * Grid semantics (what the oracle replays): a span is reported iff both
  * occurrences start on the sampling grid (byte offset divisible by
  * `stride`). Stride 1 is the exhaustive form; stride > 1 is the scale
  * form and detects grid-aligned repeats — exact duplicates and
  * copy-from-offset-0 near-duplicates stay detectable at any stride,
  * shifted interior repeats need stride 1 (or content-defined anchors on
  * top of the same machinery).
  */
object SpanDedup {

  /** Grid windows as `(doc_id, pos, h)` — pos is the 0-based byte offset
    * of the window start (`idx * stride` for the idx-th emitted hash).
    */
  def windows(documents: DataFrame, window: Int, stride: Int): DataFrame =
    documents
      .select(col("doc_id"),
        posexplode(WindowRollingHashes.of(col("text"), window, stride)).as(Seq("idx", "h")))
      .select(col("doc_id"), (col("idx") * stride).cast("int").as("pos"), col("h"))

  /** Exact-verified cross-document span pairs
    * `(doc_a, pos_a, doc_b, pos_b, span)`, oriented `doc_a < doc_b`.
    *
    * Same-doc grid repeats share a bucket too (and count toward its cap —
    * the oracle replays that) but are filtered from the pair output:
    * within-doc repetition is [[TextStats]] t6's job, not dedup's.
    */
  def spanPairs(documents: DataFrame, window: Int = 40, stride: Int = 8,
                bucketCap: Int = 20): DataFrame = {
    val buckets = windows(documents, window, stride)
      .groupBy(col("h"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("pos")))).as("ms"))
      .filter(size(col("ms")).between(2, bucketCap))
    // O(cap^2)-bounded pair expansion per bucket, (doc_id, pos)-sorted so
    // orientation is canonical without a distinct
    val pairs = buckets
      .select(explode(flatten(expr(
        "transform(ms, (x, i) -> transform(slice(ms, i + 2, size(ms)), " +
          "y -> struct(x.doc_id AS doc_a, x.pos AS pos_a, y.doc_id AS doc_b, y.pos AS pos_b)))"
      ))).as("p"))
      .select(col("p.doc_a"), col("p.pos_a"), col("p.doc_b"), col("p.pos_b"))
      .filter(col("doc_a") =!= col("doc_b"))
    pairs
      .join(documents.select(col("doc_id").as("doc_a"), col("text").as("text_a")), "doc_a")
      .join(documents.select(col("doc_id").as("doc_b"), col("text").as("text_b")), "doc_b")
      .withColumn("span", expr(s"substring(text_a, pos_a + 1, $window)"))
      .filter(col("span") === expr(s"substring(text_b, pos_b + 1, $window)"))
      .select(col("doc_a"), col("pos_a"), col("doc_b"), col("pos_b"), col("span"))
  }

  /** DuckDB replay of [[spanPairs]]: identical grid, identical Karp-Rabin
    * fold (via [[RollingHash.oracleSql]] on each grid substring),
    * identical hash-bucket cap, identical exact-substring verify.
    */
  def spanPairsOracle(window: Int = 40, stride: Int = 8, bucketCap: Int = 20): String =
    s"""WITH grid AS (
       |  SELECT doc_id,
       |    CAST(unnest(range(0, greatest(length(text) - ${window - 1}, 0), $stride)) AS INT) AS pos,
       |    text
       |  FROM documents),
       |win AS (
       |  SELECT doc_id, pos, substr(text, pos + 1, $window) AS span FROM grid),
       |hashed AS (
       |  SELECT doc_id, pos, span,
       |    ${RollingHash.oracleSql("span")} AS h
       |  FROM win),
       |capped AS (
       |  SELECT * FROM (
       |    SELECT doc_id, pos, span, h, count(*) OVER (PARTITION BY h) AS bsz
       |    FROM hashed)
       |  WHERE bsz BETWEEN 2 AND $bucketCap)
       |SELECT a.doc_id AS doc_a, a.pos AS pos_a, b.doc_id AS doc_b, b.pos AS pos_b,
       |       a.span AS span
       |FROM capped a JOIN capped b
       |  ON a.h = b.h AND a.doc_id < b.doc_id AND a.span = b.span""".stripMargin
}
