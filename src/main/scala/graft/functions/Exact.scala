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

  /** Saturation bound of the monetary grid. A value beyond ±MaxAbs
    * saturates to the bound instead of overflowing the decimal cast:
    * the r13 hostile-values probe showed one out-of-domain row (a 10^15
    * product of injected extremes) CRASHES the whole aggregate under
    * ANSI decimal overflow — at 100 TB hostile rows are a certainty and
    * a deterministic saturation (the [[QuantizedDot.quantize]]
    * precedent) beats a dead job. The literal has an exact scale-4
    * shortest representation, so both engines parse and cast it
    * identically.
    */
  val MaxAbs: Double = 99999999999999.9

  /** The domain guard as oracle SQL, mirroring [[dec]]'s engine
    * expression: NULL, NaN, and out-of-domain magnitudes are all NULL.
    * NULL-out (not saturation) is the policy: a value the monetary grid
    * cannot represent is not a valid measurement, and a saturated
    * ±10^14 stand-in would poison every downstream sum — it also pushed
    * hostile-corpus sums past 2^53 quanta and DuckDB's int64 decimal
    * multiply, two whole divergence classes that NULL-out removes.
    */
  def sqlGuard(x: String): String =
    s"CASE WHEN $x IS NULL OR isnan($x) OR abs($x) > 99999999999999.9 " +
      s"THEN NULL ELSE $x END"

  /** Exact decimal cast of a double column (no ties at scale 4: binary
    * doubles can never land exactly halfway between two scale-4 decimals,
    * so Spark's and DuckDB's double→decimal roundings agree — for inputs
    * whose shortest decimal representation carries ≤4 fractional digits,
    * the documented monetary domain; see the class note below). NaN maps
    * to NULL, magnitudes saturate at ±[[MaxAbs]]. Oracle form:
    * `CAST(<sqlGuard(x)> AS DECIMAL(18,4))`.
    *
    * Domain boundary (documented, not gated): a double with >4
    * fractional digits in its shortest representation rounds to the
    * grid through engine-specific paths (Spark: shortest-string
    * HALF_UP; DuckDB: exact-binary) that can land one quantum apart
    * when the shortest string prints a tie — that class must use
    * [[qavg]]-style floor-grid quantization instead (q21's week_net
    * did exactly this in the r13 hostile probe).
    */
  def dec(c: Column): Column =
    when(c.isNull || isnan(c) || abs(c) > lit(MaxAbs), lit(null))
      .otherwise(c)
      .cast(D)

  /** [[dec]] for a column that is ALREADY an exact decimal (the per-row
    * product path, e.g. `dec(price) * (1 - dec(discount))` at scale 8):
    * the clamp must stay in the decimal domain — a double-literal
    * `least`/`greatest` would coerce the exact product to double and
    * reintroduce the rounding divergence the decimal form exists to
    * avoid. Oracle form: `CAST(CASE WHEN p IS NULL THEN NULL ELSE
    * least(greatest(p, CAST(-99999999999999.9 AS DECIMAL(38,8))),
    * CAST(99999999999999.9 AS DECIMAL(38,8))) END AS DECIMAL(18,4))`.
    */
  def decFromDecimal(c: Column): Column = {
    val hi = lit(MaxAbs).cast(DecimalType(38, 8))
    when(c.isNull || abs(c) > hi, lit(null)).otherwise(c).cast(D)
  }

  /** Order-independent `sum(double)`: oracle form
    * `CAST(SUM(CAST(<sqlGuard(x)> AS DECIMAL(18,4))) AS DOUBLE)`.
    * The accumulator is widened to DECIMAL(38,4) (capacity 10^34) so
    * that with per-value saturation at 10^14 the SUM itself can never
    * overflow at any realistic row count — DuckDB's decimal SUM already
    * accumulates at precision 38, so the oracle needs no change.
    */
  def dsum(c: Column): Column = bridged(sum(dec(c).cast(DecimalType(38, 4))))

  /** Exact-decimal → double through a STRING: both engines parse
    * decimal strings with correctly-rounded IEEE semantics, while the
    * direct decimal→double casts take engine-specific paths that can
    * land one ulp apart once the sum exceeds 2^53 quanta (observed at
    * |sum| ~ 10^14 on the hostile corpus). One format per GROUP — not
    * per row — so the cost is nil. Oracle form:
    * `CAST(CAST(SUM(...) AS VARCHAR(64)) AS DOUBLE)`.
    */
  private def bridged(dec: Column): Column =
    dec.cast(org.apache.spark.sql.types.StringType).cast(DoubleType)

  /** Order-independent `avg(double)`: exact decimal sum, then a single
    * IEEE double division. Oracle form
    * `CAST(SUM(CAST(<sqlGuard(x)> AS DECIMAL(18,4))) AS DOUBLE) / COUNT(x)`.
    */
  def davg(c: Column): Column =
    bridged(sum(dec(c).cast(DecimalType(38, 4)))) / count(c)

  /** [[dsum]] for an ALREADY-DECIMAL per-row expression (exact products)
    * — routes through [[decFromDecimal]] so the clamp never leaves the
    * decimal domain.
    */
  def dsumD(c: Column): Column =
    bridged(sum(decFromDecimal(c).cast(DecimalType(38, 4))))

  /** [[qsum]] for an ALREADY-DECIMAL per-row product: the (37,8)→(18,4)
    * RESCALE rounds HALF_UP in Spark but half-toward-zero in DuckDB, so
    * a product ending in exactly ...5000 at the 5th decimal lands one
    * quantum apart (the r13 hostile probe's q1 residual — 4-decimal
    * operands manufacture such ties; 2-decimal benign data cannot).
    * `floor` over the EXACT decimal product is tie-free and engine-
    * identical, and unlike a double-product floor it never distorts an
    * exactly-representable benign value. Out-of-domain products are
    * NULL-out. Oracle form: `CAST(CAST(SUM(CAST(floor(CASE WHEN p IS NULL OR
    * abs(p) > CAST(9e14 AS DECIMAL(38,8)) THEN NULL ELSE p END * 10000)
    * AS BIGINT)) AS VARCHAR(64)) AS DOUBLE) / 10000`.
    */
  def qsumD(c: Column, grid: Long = 10000L): Column = {
    val hi = lit(QMaxAbs).cast(DecimalType(38, 8))
    val g = when(c.isNull || abs(c) > hi, lit(null)).otherwise(c)
    qbridged(sum(floor(g * lit(grid)).cast(LongType)
      .cast(org.apache.spark.sql.types.DecimalType(38, 0)))) / lit(grid)
  }

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
    * `CAST(CAST(SUM(CAST(floor(x * grid) AS BIGINT)) AS VARCHAR(64)) AS DOUBLE) / (grid * COUNT(x))`.
    */
  def qavg(c: Column, grid: Long = 10000L): Column = {
    // NOTE: single division by (grid * count) — the oracle's exact
    // expression shape; dividing by grid and count separately would
    // round twice and drift one ulp from the replay
    val g = when(c.isNull || isnan(c) || abs(c) > lit(QMaxAbs), lit(null))
      .otherwise(c)
    qbridged(sum(quanta(g, grid))) / (lit(grid) * count(c))
  }

  /** Order-independent exact SUM for ARBITRARY (computed) doubles on
    * the floor grid — the aggregate twin of [[qavg]], and the REQUIRED
    * form for any per-row computed double (products, ratios): [[dec]]'s
    * round-based path diverges between engines on >4-fractional-digit
    * inputs (see [[dec]]'s domain boundary), the floor grid never does.
    * NULL/NaN/out-of-domain (|x| > [[QMaxAbs]], where quanta would
    * leave long range) are NULL-out like [[dec]]. The long-quanta
    * accumulator's envelope is n·|x|·grid ≤ 2^63 — shard the aggregate
    * beyond it. Oracle form:
    * `CAST(CAST(SUM(CAST(floor(<sqlQGuard(x)> * grid) AS BIGINT)) AS VARCHAR(64)) AS DOUBLE) / grid`.
    */
  def qsum(c: Column, grid: Long = 10000L): Column = {
    val g = when(c.isNull || isnan(c) || abs(c) > lit(QMaxAbs), lit(null))
      .otherwise(c)
    qbridged(sum(quanta(g, grid))) / lit(grid)
  }

  /** Per-row integer quanta as an EXACT wide accumuland: the long cast
    * first (guarded, so always in range — and floor(double)->long
    * truncation is engine-identical), then long->DECIMAL(38,0) which is
    * integer-exact (a direct double->decimal cast of a >2^53 value
    * would reopen the shortest-string vs exact-binary divergence). A
    * LONG accumulator was tried first and overflowed on in-domain
    * hostile volume (one near-bound product is 9e18 quanta — the r13
    * sf0.01 hostile sweep); DECIMAL(38,0) holds 10^38 quanta, beyond
    * any corpus, and DuckDB's SUM(BIGINT) already accumulates hugeint.
    */
  private def quanta(g: Column, grid: Long): Column =
    floor(g * lit(grid.toDouble)).cast(LongType)
      .cast(org.apache.spark.sql.types.DecimalType(38, 0))

  /** Exact integer-decimal -> double through a string (see [[dsum]]'s
    * bridge): correctly-rounded in both engines at any magnitude.
    * Oracle form: `CAST(CAST(SUM(CAST(floor(...) AS BIGINT)) AS
    * VARCHAR(64)) AS DOUBLE)`.
    */
  private def qbridged(decSum: Column): Column =
    decSum.cast(org.apache.spark.sql.types.StringType).cast(DoubleType)

  /** Saturation bound for [[qavg]]'s long-quanta grid. */
  val QMaxAbs: Double = 9.0e14

  /** [[qavg]]/[[qsum]]'s guard as oracle SQL. */
  def sqlQGuard(x: String): String =
    s"CASE WHEN $x IS NULL OR isnan($x) OR abs($x) > 900000000000000.0 " +
      s"THEN NULL ELSE $x END"
}
