package graft

import graft.core.Catalog
import graft.ml.SegmentationPipeline
import graft.serve.Serving
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Serving path + model persistence round-trip (S12/M12, reference EP3). */
class ServingSpec extends AnyFunSuite with SharedSpark {

  test("model save/load round-trip, predict by key and manual row") {
    val c = Catalog(spark, sf)
    val features = SegmentationPipeline.features(c.customer, c.orders).cache()
    val fitted = SegmentationPipeline.fitAutoK(features, 2 to 3)

    val dir = java.nio.file.Files.createTempDirectory("graft_model").toString
    Serving.saveModel(fitted.model, s"$dir/m")
    val loaded = Serving.loadModel(s"$dir/m")

    val aKey = features.head().getAs[Long]("custkey")
    val byKey = Serving.predictByKey(loaded, features, "custkey", aKey)
    assert(byKey.isDefined)
    val pred = byKey.get.select("prediction").head().getInt(0)
    assert(pred >= 0 && pred < fitted.k)

    assert(Serving.predictByKey(loaded, features, "custkey", -1L).isEmpty)

    val schema = StructType(Seq(
      StructField("custkey", LongType),
      StructField("acctbal", DoubleType),
      StructField("frequency", DoubleType),
      StructField("monetary", DoubleType),
      StructField("recency_days", DoubleType)))
    val manual = Serving.predictManual(spark, loaded, schema,
      Seq[Any](0L, 1000.0, 5.0, 20000.0, 30.0))
    assert(manual.select("prediction").head().getInt(0) >= 0)
    features.unpersist()
  }

  test("ml_model_roundtrip registry gate: loaded model rescoring matches exactly") {
    val row = graft.SparkEntry.queries("ml_model_roundtrip")(spark, sf).head()
    assert(row.getAs[Long]("n_scored") > 0)
    assert(row.getAs[Long]("n_mismatch") == 0L,
      "loaded PipelineModel assigned different clusters than the in-memory fit")
    assert(row.getAs[Long]("n_clusters") > 1)
  }
}
