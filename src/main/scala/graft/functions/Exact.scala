package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Bit-exact floating aggregate helpers.
  *
  * Double summation is order-dependent, and Spark's partial aggregation
  * order differs run to run and engine to engine — a raw `sum(double)`
  * cannot hash-match a DuckDB oracle. These helpers route the aggregation
  * through an exact decimal intermediate (decimal addition is associative)
  * and cast back to double once at the end, which is deterministic and
  * engine-independent: the same pattern `CAST(SUM(CAST(x AS
  * DECIMAL(p,s))) AS DOUBLE)` on the oracle side yields bit-identical
  * doubles.
  *
  * Scale note: decimal aggregation is ~2x the cost of a double sum but
  * stays inside whole-stage codegen and partial (map-side) aggregation,
  * so it scales the same way. At 100 TB the precision-18 intermediate
  * holds sums up to 10^14 at scale 4 — callers with wider domains pass
  * their own `DecimalType`.
  *
  * CAUTION (learned at sf0.1): the final decimal->double conversion is
  * only engine-identical while the sum stays under 2^53 *quanta*
  * (digits x 10^scale). Keep aggregate scale at 4 — in particular, round
  * products (which pick up scale 8) back to scale 4 per row by passing
  * them through [[dsum]] rather than summing the raw product. Rounding
  * is HALF_UP in Spark and half-away in DuckDB — identical for the
  * non-negative monetary domains used here.
  */
object Exact {
  /** Default intermediate: values up to ~10^14 with 4 decimal places. */
  val D: DecimalType = DecimalType(18, 4)

  /** Exact decimal cast of a double column (no ties at scale 4: binary
    * doubles can never land exactly halfway between two scale-4 decimals,
    * so Spark's and DuckDB's double→decimal roundings agree).
    */
  def dec(c: Column): Column = c.cast(D)

  /** Order-independent `sum(double)`: oracle form
    * `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Order-independent `avg(double)`: exact decimal sum, then a single
    * IEEE double division. Oracle form
    * `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(x)`.
    */
  def davg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(c)

  /** Order-independent average for ARBITRARY doubles (division results
    * etc.) via the integer grid: `floor(x * grid)` is one IEEE multiply
    * plus an exact floor — bit-identical in any engine — so the sum is
    * an exact long. Needed because [[dec]]'s double→decimal rounding is
    * NOT engine-identical on arbitrary values: Spark routes through the
    * shortest decimal representation (`BigDecimal.valueOf`) while DuckDB
    * rounds the exact binary value, so a double that prints as a tie
    * (…x5) can round apart (observed on `extendedprice/quantity` at
    * sf0.01). Monetary inputs with ≤2 real decimals are safe with
    * [[dec]]; anything computed by division is not. Oracle form:
    * `CAST(SUM(CAST(floor(x * grid) AS BIGINT)) AS DOUBLE) / (grid * COUNT(x))`.
    */
  def qavg(c: Column, grid: Long = 10000L): Column =
    sum(floor(c * lit(grid.toDouble)).cast(LongType)).cast(DoubleType) /
      (lit(grid) * count(c))
}
