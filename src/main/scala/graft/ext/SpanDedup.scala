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
  * occurrences start on the sampling grid (CHARACTER offset divisible by
  * `stride`). Stride 1 is the exhaustive form; stride > 1 is the scale
  * form and detects grid-aligned repeats — exact duplicates and
  * copy-from-offset-0 near-duplicates stay detectable at any stride,
  * shifted interior repeats need stride 1 (or content-defined anchors on
  * top of the same machinery).
  */
object SpanDedup {

  /** Grid windows as `(doc_id, pos, h)` — pos is the 0-based CHARACTER
    * offset of the window start (`idx * stride` for the idx-th emitted
    * hash), the same unit every downstream `substring`/`substr` uses.
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

  /** The shared CTE chain replaying [[spanPairs]] up to the verified pair
    * set (exposed as `pairs`): identical grid, identical Karp-Rabin fold
    * (via [[RollingHash.oracleSql]] on each grid substring), identical
    * hash-bucket cap, identical exact-substring verify.
    */
  private def pairCtes(window: Int, stride: Int, bucketCap: Int): String =
    s"""grid AS (
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
       |  WHERE bsz BETWEEN 2 AND $bucketCap),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, a.pos AS pos_a, b.doc_id AS doc_b, b.pos AS pos_b,
       |         a.span AS span
       |  FROM capped a JOIN capped b
       |    ON a.h = b.h AND a.doc_id < b.doc_id AND a.span = b.span)""".stripMargin

  /** DuckDB replay of [[spanPairs]]. */
  def spanPairsOracle(window: Int = 40, stride: Int = 8, bucketCap: Int = 20): String =
    s"""WITH ${pairCtes(window, stride, bucketCap)}
       |SELECT doc_a, pos_a, doc_b, pos_b, span FROM pairs""".stripMargin

  /** Span removal — the ACT half of the detect→act pair ([[spanPairs]]
    * detects). Strips every duplicated span from all-but-the-first
    * occurrence (first = the lexicographically-least doc_id, the kept
    * side of the `doc_a < doc_b` orientation) and reconstructs the
    * surviving text, the standard boilerplate-removal step between span
    * detection and training-data writing.
    *
    * Distributed shape on top of [[spanPairs]]'s single corpus shuffle:
    *  1. removal sites `(doc_id, pos)` — pairs projected to their `b`
    *    side, distinct (one site may be flagged by many partners);
    *  2. overlapping/adjacent sites merged into maximal intervals with a
    *    gaps-and-islands pass: windows partitioned BY DOC, so the work
    *    distributes over documents and no doc's interval list ever
    *    leaves one task (a per-doc list is at most `len/stride` entries);
    *  3. per-doc interval array re-joined to the corpus (removal docs
    *    are a small fraction — the join broadcasts under AQE) and the
    *    kept segments stitched by ONE `aggregate` higher-order fold —
    *    per-row, no explode/re-group of fragment rows at corpus scale.
    *
    * Returns every input doc: `(doc_id, text, n_spans_removed,
    * removed_chars)`, untouched docs pass through with 0/0.
    */
  def removeSpans(documents: DataFrame, window: Int = 40, stride: Int = 8,
                  bucketCap: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val removals = spanPairs(documents, window, stride, bucketCap)
      .select(col("doc_b").as("doc_id"), col("pos_b").as("pos"))
      .distinct()
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
    val merged = removals
      .withColumn("prev_max_end",
        max(col("pos") + window).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max_end").isNull || col("pos") > col("prev_max_end"), 1).otherwise(0))
      .withColumn("island", sum(col("new_island")).over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + window).as("e"))
    val ivs = merged.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("ivs"))
    documents
      .join(ivs, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        when(col("ivs").isNull, col("text")).otherwise(expr(
          """aggregate(ivs, named_struct('acc', '', 'cur', 0),
            |  (st, iv) -> named_struct(
            |    'acc', concat(st.acc, substring(text, st.cur + 1, iv.s - st.cur)),
            |    'cur', iv.e),
            |  st -> concat(st.acc, substring(text, st.cur + 1, length(text) - st.cur)))"""
            .stripMargin)).as("clean_text"),
        coalesce(size(col("ivs")), lit(0)).as("n_spans_removed"),
        col("text").as("orig_text"))
      .select(
        col("doc_id"),
        col("clean_text").as("text"),
        col("n_spans_removed"),
        (length(col("orig_text")) - length(col("clean_text"))).as("removed_chars"))
  }

  /** DuckDB replay of [[removeSpans]]: the shared pair CTEs, the same
    * gaps-and-islands interval merge, segment stitching via ordered
    * `string_agg` (fragment-per-row — fine at oracle scale; the engine
    * side folds per-row instead).
    */
  def removeSpansOracle(window: Int = 40, stride: Int = 8, bucketCap: Int = 20): String =
    s"""WITH ${pairCtes(window, stride, bucketCap)},
       |removals AS (
       |  SELECT DISTINCT doc_b AS doc_id, pos_b AS pos FROM pairs),
       |isl AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN max(pos + $window) OVER (PARTITION BY doc_id ORDER BY pos ASC
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |           OR pos > max(pos + $window) OVER (PARTITION BY doc_id ORDER BY pos ASC
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |         THEN 1 ELSE 0 END AS new_island
       |  FROM removals),
       |assigned AS (
       |  SELECT doc_id, pos,
       |    SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos ASC) AS island
       |  FROM isl),
       |merged AS (
       |  SELECT doc_id, island, min(pos) AS s, max(pos) + $window AS e
       |  FROM assigned GROUP BY 1, 2),
       |segs AS (
       |  SELECT doc_id, coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s ASC), 0) AS o, s
       |  FROM merged
       |  UNION ALL
       |  SELECT doc_id, max(e) AS o, NULL AS s FROM merged GROUP BY doc_id),
       |frags AS (
       |  SELECT g.doc_id, g.o,
       |    substr(d.text, g.o + 1, coalesce(g.s, length(d.text)) - g.o) AS frag
       |  FROM segs g JOIN documents d USING (doc_id)),
       |cleaned AS (
       |  SELECT doc_id, string_agg(frag, '' ORDER BY o ASC) AS text,
       |    CAST(count(*) - 1 AS INT) AS n_spans_removed
       |  FROM frags GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(c.text, d.text) AS text,
       |  coalesce(c.n_spans_removed, 0) AS n_spans_removed,
       |  CAST(length(d.text) - length(coalesce(c.text, d.text)) AS INT) AS removed_chars
       |FROM documents d LEFT JOIN cleaned c USING (doc_id)""".stripMargin
}
