package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join without an equi-key — the case Spark's planner
  * can only express as a nested-loop over the cross product (every
  * session × every window), quadratic at scale. The standard fix is to
  * discretize time onto a fixed grid: each interval explodes to the
  * grid cells it covers, the join becomes an EQUI-join on the cell, and
  * the true overlap predicate filters within cells. Cell width trades
  * replication (long intervals cover many cells) against selectivity
  * (wide cells co-locate non-overlapping pairs); it should be set near
  * the typical interval length.
  *
  * A pair overlapping k shared cells would emit k copies; instead of a
  * `distinct` (an extra corpus-wide shuffle) each pair is emitted only
  * from the FIRST cell of its overlap region: `cell ==
  * floor(max(start_l, start_r) / width)` — both intervals provably
  * cover that cell, every other shared cell is suppressed, and the
  * join output is exact without any dedup pass.
  *
  * Timestamps bin by their epoch-second floor (grid widths are whole
  * seconds, so `floor(floor_sec(t)/w) == floor(t/w)`); the overlap
  * predicate itself compares full-precision timestamps. Intervals are
  * CLOSED on both ends — `[s1,e1]` meets `[s2,e2]` iff `s1 <= e2 AND
  * s2 <= e1` — so zero-length intervals (single-event sessions) still
  * join.
  *
  * Column names of the two inputs must be disjoint.
  */
object IntervalJoin {

  def overlapBinned(left: DataFrame, lStart: String, lEnd: String,
                    right: DataFrame, rStart: String, rEnd: String,
                    binSeconds: Long): DataFrame = {
    def binned(df: DataFrame, s: String, e: String): DataFrame = df
      .withColumn("_b0", floor(unix_timestamp(col(s)) / binSeconds))
      .withColumn("_bin",
        explode(sequence(col("_b0"), floor(unix_timestamp(col(e)) / binSeconds))))

    val l = binned(left, lStart, lEnd)
    val r = binned(right, rStart, rEnd).withColumnRenamed("_b0", "_rb0")
      .withColumnRenamed("_bin", "_rbin")
    l.join(r,
        l("_bin") === r("_rbin") &&
          col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
          l("_bin") === greatest(l("_b0"), r("_rb0")))
      .drop("_b0", "_bin", "_rb0", "_rbin")
  }
}
