package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left AS-OF join: for every left row, attach the payload of the
  * latest right row with `rightTs <= leftTs` on the same key (SQL
  * `ASOF LEFT JOIN`, the standard event-attribution / point-in-time
  * lookup the built-in join operators lack).
  *
  * The naive formulations both fail at scale: a theta-join
  * (`l.key = r.key AND r.ts <= l.ts` + max-per-row) plans as a
  * per-row range scan with quadratic per-key fan-out, and a
  * broadcast-nested-loop needs one side to fit in memory. This
  * operator is **join-free**: both sides are unioned with a kind
  * marker (right rows sort before left rows at equal timestamps, so
  * "at-or-before" includes same-instant matches), hash-partitioned
  * ONCE by key, sorted per partition by `(ts, kind, tie)`, and each
  * left row picks up the most recent right payload with
  * `last(col, ignoreNulls = true)` over the running frame — a single
  * linear pass per partition. One exchange, no join operator in the
  * plan at all (pinned in PlanSpec), per-key cost `O(n log n)` in the
  * partition sort rather than `O(n^2)` in a range probe.
  *
  * Ties among right rows at the same `(key, ts)` resolve to the
  * greatest `tie` column (the sort puts it last, so the running
  * `last()` wins with it) — callers replaying the result through an
  * engine whose ASOF tie choice is unspecified should pre-reduce the
  * right side to one row per `(key, ts)` with the max tie, which this
  * operator's pick matches by construction.
  */
object AsOfJoin {

  /** @param keys     equi-join key columns, present on both sides
    * @param leftTs   left-side event-time column name
    * @param rightTs  right-side event-time column name (its value is
    *                 emitted as-is on matched rows, null when no right
    *                 row is at-or-before the left row)
    * @param rightTie right-side column breaking `(key, ts)` ties
    *                 deterministically (greatest wins)
    *
    * Output: every left column, plus every non-key right column
    * (null-filled when unmatched). Left/right non-key column names
    * must be disjoint.
    */
  def leftAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightTie: String): DataFrame = {
    val lPayload = left.columns.toSeq.filterNot(keys.contains)
    val rPayload = right.columns.toSeq.filterNot(keys.contains)
    require(lPayload.intersect(rPayload).isEmpty,
      s"left/right non-key columns must be disjoint: ${lPayload.intersect(rPayload)}")

    val lU = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__asof_ts"), lit(1).as("__asof_kind"),
          lit(null).cast(right.schema(rightTie).dataType).as("__asof_tie")) ++
        lPayload.map(col) ++
        rPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rU = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__asof_ts"), lit(0).as("__asof_kind"),
          col(rightTie).as("__asof_tie")) ++
        lPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rPayload.map(col): _*)

    // Rows at equal (key, ts): right (kind 0) before left (kind 1), so a
    // same-instant right row is visible to the left row's running frame;
    // right-vs-right ties ordered by the tie column so last() = max tie.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__asof_ts").asc, col("__asof_kind").asc, col("__asof_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lU.unionByName(rU)
      .select(
        keys.map(col) ++ Seq(col("__asof_kind")) ++ lPayload.map(col) ++
          rPayload.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__asof_kind") === 1)
      .drop("__asof_kind")
  }
}
