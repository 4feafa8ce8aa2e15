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
  * Time lives on the exact epoch-MICROSECOND integer grid throughout:
  * bins are `floor(us / (binSeconds * 1e6))` and the overlap predicate
  * compares the same integers. Epoch extraction goes through
  * [[graft.core.EventTime.epochMicros]] — an integer-typed branch on the
  * column's actual type (LTZ `unix_micros`; NTZ via the pinned
  * UTC-session cast), NOT `unix_timestamp(col)`, whose implicit
  * cast-then-parse shifts semantics silently between LTZ and NTZ inputs.
  * Mixed-type inputs (one side NTZ, one LTZ) therefore still join on one
  * coherent timeline. Intervals are CLOSED on both ends — `[s1,e1]`
  * meets `[s2,e2]` iff `s1 <= e2 AND s2 <= e1` — so zero-length
  * intervals (single-event sessions) still join.
  *
  * Column names of the two inputs must be disjoint.
  */
object IntervalJoin {

  def overlapBinned(left: DataFrame, lStart: String, lEnd: String,
                    right: DataFrame, rStart: String, rEnd: String,
                    binSeconds: Long): DataFrame = {
    val binUs = binSeconds * 1000000L
    def us(df: DataFrame, name: String) =
      graft.core.EventTime.epochMicros(df.schema(name).dataType, col(name))
    // integer floorDiv (pquot is exact on longs; epoch micros of the data
    // era are far inside double's 2^53 but there is no reason to round-trip)
    def bin(c: org.apache.spark.sql.Column) =
      floor(c.cast("decimal(20,0)") / binUs).cast("long")
    def binned(df: DataFrame, s: String, e: String): DataFrame = df
      .withColumn("_us_s", us(df, s)).withColumn("_us_e", us(df, e))
      .withColumn("_b0", bin(col("_us_s")))
      .withColumn("_bin", explode(sequence(col("_b0"), bin(col("_us_e")))))

    val l = binned(left, lStart, lEnd)
    val r = binned(right, rStart, rEnd)
      .withColumnRenamed("_b0", "_rb0").withColumnRenamed("_bin", "_rbin")
      .withColumnRenamed("_us_s", "_rus_s").withColumnRenamed("_us_e", "_rus_e")
    l.join(r,
        l("_bin") === r("_rbin") &&
          col("_us_s") <= col("_rus_e") && col("_rus_s") <= col("_us_e") &&
          l("_bin") === greatest(l("_b0"), r("_rb0")))
      .drop("_b0", "_bin", "_rb0", "_rbin", "_us_s", "_us_e", "_rus_s", "_rus_e")
  }
}
