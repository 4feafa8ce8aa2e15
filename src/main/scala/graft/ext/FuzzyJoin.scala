package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity join (PassJoin-style segment blocking) —
  * the string-metric member of the near-dup family: [[MinHashDedup]]
  * catches set-overlap similarity, [[SimHash]] weighted-feature
  * similarity, this catches TYPO-class similarity (OCR noise, mangled
  * whitespace, version strings), which token-set methods miss because
  * one character edit inside a word changes the whole token.
  *
  * All-pairs `levenshtein(a, b) <= d` is the textbook quadratic trap.
  * The PassJoin blocking (Li, Deng, Feng — PVLDB 2011) makes it a
  * bucketed equi-join: split each INDEXED key into `d+1` disjoint
  * segments; by pigeonhole, any pair within edit distance `d` agrees
  * exactly on at least one segment, at an offset shifted by at most
  * the indels before it (≤ d). So the index side emits `d+1` exact
  * segments, the probe side emits every substring of segment length
  * starting within ±d of each segment's home position, candidates come
  * from ONE equi-join on (segment-index, segment-text), and the exact
  * `levenshtein` verify runs on candidates only — the same
  * generate/verify discipline as every pair operator here (d3, d6,
  * d10), with the same stop-bucket cap: a segment shared by more docs
  * than `bucketCap` is a stopword-block (degenerate boilerplate), and
  * dropping it is a deterministic, oracle-replayed coverage cap, not
  * silent truncation.
  *
  * Keys are the fixed-length document prefix (`prefixLen` chars) — the
  * equal-length regime keeps the segment grid aligned on both sides;
  * docs shorter than the prefix are excluded by a stated predicate on
  * both engines. Verification cost is `O(prefixLen²)` per candidate on
  * a capped candidate set; distances are exact integers, so the whole
  * operator hash-gates.
  */
object FuzzyJoin {

  /** @return (doc_a, doc_b, ed) for every kept pair with
    *         `levenshtein(prefix_a, prefix_b) <= maxEd`, doc_a < doc_b,
    *         ordered by (doc_a, doc_b). Defaults: 24-char keys, 3
    *         segments of 8, distance ≤ 2.
    */
  def editDistancePairs(docs: DataFrame, prefixLen: Int = 24, maxEd: Int = 2,
                        bucketCap: Int = 100): DataFrame = {
    val segs = maxEd + 1
    val segLen = prefixLen / segs
    require(segs * segLen == prefixLen, "prefixLen must divide into maxEd+1 segments")
    val lastStart = prefixLen - segLen + 1

    val k = docs.where(length(col("text")) >= prefixLen)
      .select(col("doc_id"), substring(col("text"), 1, prefixLen).as("key"))

    val idx = k
      .select(col("doc_id"), col("key"),
        explode(expr(s"sequence(0, ${segs - 1})")).as("i"))
      .select(col("doc_id"), col("i"),
        expr(s"substring(key, 1 + i * $segLen, $segLen)").as("seg"))
    // stop-bucket cap on the INDEX side: a segment text carried by more
    // than bucketCap docs generates no candidates (replayed verbatim by
    // the oracle's HAVING)
    val hotSegs = idx.groupBy(col("i"), col("seg"))
      .agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") > bucketCap)
      .select(col("i"), col("seg"))
    val idxKept = idx.join(hotSegs, Seq("i", "seg"), "left_anti")

    val probe = k
      .select(col("doc_id"), col("key"),
        explode(expr(s"sequence(0, ${segs - 1})")).as("i"))
      .select(col("doc_id"), col("key"), col("i"),
        explode(expr(s"sequence(-$maxEd, $maxEd)")).as("s"))
      .where(expr(s"1 + i * $segLen + s BETWEEN 1 AND $lastStart"))
      .select(col("doc_id"), col("i"),
        expr(s"substring(key, 1 + i * $segLen + s, $segLen)").as("seg"))
      .distinct()

    val cand = probe.as("p")
      .join(idxKept.as("x"),
        col("p.i") === col("x.i") && col("p.seg") === col("x.seg") &&
          col("p.doc_id") =!= col("x.doc_id"))
      .select(least(col("p.doc_id"), col("x.doc_id")).as("doc_a"),
        greatest(col("p.doc_id"), col("x.doc_id")).as("doc_b"))
      .distinct()

    cand
      .join(k.select(col("doc_id").as("doc_a"), col("key").as("key_a")), Seq("doc_a"))
      .join(k.select(col("doc_id").as("doc_b"), col("key").as("key_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("key_a"), col("key_b")).cast("long").as("ed"))
      .where(col("ed") <= maxEd)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** DuckDB twin of [[editDistancePairs]]: same segment grid, same ±d
    * probe offsets, same cap, same exact verify.
    */
  def editDistancePairsOracle(prefixLen: Int = 24, maxEd: Int = 2,
                              bucketCap: Int = 100): String = {
    val segs = maxEd + 1
    val segLen = prefixLen / segs
    val lastStart = prefixLen - segLen + 1
    s"""WITH k AS (
       |  SELECT doc_id, substr(text, 1, $prefixLen) AS key
       |  FROM documents WHERE length(text) >= $prefixLen),
       |idx AS (
       |  SELECT doc_id, i, substr(key, 1 + i * $segLen, $segLen) AS seg
       |  FROM k, generate_series(0, ${segs - 1}) t(i)),
       |hot AS (
       |  SELECT i, seg FROM idx GROUP BY i, seg HAVING count(*) > $bucketCap),
       |idx_kept AS (
       |  SELECT idx.* FROM idx ANTI JOIN hot USING (i, seg)),
       |probe AS (
       |  SELECT DISTINCT doc_id, i, substr(key, 1 + i * $segLen + s, $segLen) AS seg
       |  FROM k, generate_series(0, ${segs - 1}) t(i),
       |       generate_series(-$maxEd, $maxEd) u(s)
       |  WHERE 1 + i * $segLen + s BETWEEN 1 AND $lastStart),
       |cand AS (
       |  SELECT DISTINCT least(p.doc_id, x.doc_id) AS doc_a,
       |                  greatest(p.doc_id, x.doc_id) AS doc_b
       |  FROM probe p JOIN idx_kept x
       |    ON p.i = x.i AND p.seg = x.seg AND p.doc_id <> x.doc_id)
       |SELECT c.doc_a, c.doc_b,
       |  CAST(levenshtein(ka.key, kb.key) AS BIGINT) AS ed
       |FROM cand c
       |JOIN k ka ON ka.doc_id = c.doc_a
       |JOIN k kb ON kb.doc_id = c.doc_b
       |WHERE levenshtein(ka.key, kb.key) <= $maxEd
       |ORDER BY c.doc_a, c.doc_b""".stripMargin
  }
}
