package graft.serve

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model-serving paths (reference entry point 3, SURVEY §3).
  *
  * The reference serves predictions by shelling out from Streamlit to
  * `spark-submit` per request (`streamlit_segmentation_app.py:21-36` →
  * `src/main/java/com/retail/ml/SegmentationPrediction.java`), paying a
  * full JVM + session per query. The engine keeps a *long-lived* session
  * and preserves the two serving modes:
  *
  *  - [[predictByKey]]: parquet feature lookup + guard + transform
  *    (`SegmentationPrediction.java:36-49`);
  *  - [[predictManual]]: one ad-hoc row from an explicit `StructType`
  *    (`SegmentationPrediction.java:74-92` — the reference's only
  *    explicit schema).
  *
  * Model persistence round-trip (save/load, [S12/M12]) mirrors
  * `SegmentationModel.java:198` / `SegmentationPrediction.java:26-27`.
  */
object Serving {

  def saveModel(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)

  def loadModel(path: String): PipelineModel = PipelineModel.load(path)

  /** Score the feature row(s) of one entity key; None when absent (the
    * reference's count()==0 guard, `SegmentationPrediction.java:40-44`).
    */
  def predictByKey(model: PipelineModel, features: DataFrame,
                   keyCol: String, key: Long): Option[DataFrame] = {
    val rows = features.filter(col(keyCol) === key)
    if (rows.isEmpty) None else Some(model.transform(rows))
  }

  /** Score one manually-specified row against a declared schema. */
  def predictManual(spark: SparkSession, model: PipelineModel,
                    schema: StructType, values: Seq[Any]): DataFrame = {
    val df = spark.createDataFrame(
      java.util.List.of(Row.fromSeq(values)), schema)
    model.transform(df)
  }
}
