package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (exact; approximate/near-dup lives in
  * [[graft.ext]]).
  *
  * The reference deduplicates with `dropDuplicates(keys)`
  * (`src/main/java/com/retail/ingestion/FullPreprocessingPipeline.java:148-152`)
  * and `distinct()` (`src/main/java/com/retail/ml/ChurnPrediction.java:91-94`).
  * `dropDuplicates` keeps an *arbitrary* row per key — non-deterministic
  * under parallelism — so the engine also provides [[dedupByKeys]], a
  * deterministic variant that keeps the first row under an explicit
  * ordering (row_number = 1), which is both oracle-checkable and stable
  * across cluster sizes.
  */
object Dedup {

  /** Full-row distinct. [P13] */
  def distinctRows(df: DataFrame): DataFrame = df.distinct()

  /** Spark-native arbitrary-representative dedup (reference parity). [P13] */
  def dropDuplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Deterministic dedup: keep the row ranked first by `ordering` within
    * each key group. One shuffle on `keys`; at scale prefer this over
    * `dropDuplicates` whenever downstream results must be reproducible.
    */
  def dedupByKeys(df: DataFrame, keys: Seq[String], ordering: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy(ordering.map(col).toIndexedSeq: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
