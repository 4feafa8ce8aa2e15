package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Derived-column operators — the engine's analog of the reference ETL's
  * `withColumn` block
  * (`src/main/java/com/retail/ingestion/FullPreprocessingPipeline.java:77-100,121-134,157-162`:
  * `net_sales`, `unit_price`, `discount_rate`, guarded division, 0/1 flags,
  * `week_no = ceil(day/7)`) and the churn job's integer day-of-week math
  * (`src/main/java/com/retail/ml/ChurnPrediction.java:130-132`:
  * `((day-1)%7)+1`, deliberately avoiding date functions).
  *
  * All per-row double arithmetic: IEEE-deterministic, identical in any
  * engine — no decimal detour needed until values are aggregated.
  * Everything stays inside whole-stage codegen.
  */
object Derive {

  /** Epoch for the integer `day` index (1-based like the reference's
    * Dunnhumby `day`). Day 1 = 1995-01-01 (min order date in testdata).
    */
  val epoch: Column = to_date(lit("1995-01-01"))

  /** 1-based integer day index from a timestamp column. */
  def dayIndex(ts: Column): Column = datediff(ts.cast("date"), epoch) + 1

  /** Pricing + calendar derivations over `lineitem`:
    *  - `net_price`   = extendedprice * (1 - discount)        [P3/F1]
    *  - `unit_price`  = guarded division (0 when qty = 0)     [P10]
    *  - `is_discounted` 0/1 flag                              [P10]
    *  - `disc_band`   3-way when/when/otherwise band          [P10]
    *  - `day`         int day index                           [F6 parity]
    *  - `week_no`     ceil(day/7)                             [F2]
    *  - `day_of_week` ((day-1) % 7) + 1                       [F1]
    */
  def pricing(lineitem: DataFrame): DataFrame = {
    val day = dayIndex(col("l_shipdate"))
    lineitem
      .withColumn("net_price", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .withColumn(
        "unit_price",
        when(col("l_quantity") > 0, col("l_extendedprice") / col("l_quantity")).otherwise(lit(0.0)))
      .withColumn("is_discounted", when(col("l_discount") > 0, lit(1)).otherwise(lit(0)))
      .withColumn(
        "disc_band",
        when(col("l_discount") >= 0.08, lit("HIGH"))
          .when(col("l_discount") >= 0.04, lit("MID"))
          .otherwise(lit("LOW")))
      .withColumn("day", day.cast("int"))
      .withColumn("week_no", ceil(col("day") / lit(7.0)).cast("int"))
      .withColumn("day_of_week", ((col("day") - 1) % 7 + 1).cast("int"))
  }

  /** DuckDB oracle for [[pricing]] projected to its derived columns. */
  val pricingOracle: String =
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice * (1.0 - l_discount) AS net_price,
      |  CASE WHEN l_quantity > 0 THEN l_extendedprice / l_quantity ELSE 0.0 END AS unit_price,
      |  CASE WHEN l_discount > 0 THEN 1 ELSE 0 END AS is_discounted,
      |  CASE WHEN l_discount >= 0.08 THEN 'HIGH'
      |       WHEN l_discount >= 0.04 THEN 'MID' ELSE 'LOW' END AS disc_band,
      |  CAST(datediff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) + 1 AS INT) AS day,
      |  CAST(CEIL((datediff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) + 1) / 7.0) AS INT) AS week_no,
      |  CAST(((datediff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE))) % 7) + 1 AS INT) AS day_of_week
      |FROM lineitem""".stripMargin
}
