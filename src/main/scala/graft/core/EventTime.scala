package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical event-time ingestion: whatever physical shape a parquet
  * footer hands us for a timestamp column, every consumer (batch catalog,
  * file-stream source, interval joins) sees ONE canonical type —
  * `TimestampType` (UTC-adjusted, microsecond precision).
  *
  * Arrival shapes actually observed across driver runtimes:
  *  - `TIMESTAMP(isAdjustedToUTC=false, MICROS)` — TIMESTAMP_NTZ: the
  *    current testdata footer. The naive wall-clock is the generator's
  *    UTC frame, and every graft session pins
  *    `spark.sql.session.timeZone=UTC` (see [[GraftSession]]), so the
  *    NTZ→LTZ cast is value-preserving.
  *  - `TIMESTAMP(NANOS)` read under `spark.sql.legacy.parquet.nanosAsLong`
  *    as `LongType` nanos-since-epoch (the pre-r10 runtime). Converted by
  *    integer DIV — no double round-trip, which would lose precision
  *    above 2^53 ns.
  *  - already-canonical `TimestampType` — passed through (also what the
  *    engine's own restaged parquet writes produce).
  *
  * Anything else fails loudly here, at the ingestion boundary, instead of
  * surfacing as a DATATYPE_MISMATCH three operators downstream (the r9
  * failure mode).
  */
object EventTime {

  /** Normalize `colName` on `df` to canonical `TimestampType`. */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      case TimestampType => df
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case LongType => // legacy nanosAsLong read: nanos since epoch
        df.withColumn(colName, timestamp_micros(expr(s"`$colName` DIV 1000")))
      case other =>
        throw new IllegalStateException(
          s"events column `$colName` arrived as $other — expected TIMESTAMP, " +
            "TIMESTAMP_NTZ, or LongType nanos (legacy parquet.nanosAsLong read)")
    }

  /** Epoch microseconds of a timestamp column, stable across LTZ and NTZ
    * inputs: no string parse, no silent session-dependent reinterpretation
    * beyond the documented UTC-session contract for naive inputs.
    */
  def epochMicros(dt: DataType, c: Column): Column = dt match {
    case TimestampType    => unix_micros(c)
    case TimestampNTZType => unix_micros(c.cast(TimestampType)) // UTC-session frame
    case other =>
      throw new IllegalStateException(s"epochMicros on non-timestamp type $other")
  }
}
