package graft

import graft.functions.SignLshCodes
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SignLshSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("sign table matches Spark's md5 hex-digit parity (the oracle arithmetic)") {
    val bands = 3; val bits = 4; val dims = 8
    val table = SignLshCodes.signTable(bands, bits, dims)
    val viaSql = spark.range(bands.toLong * bits * dims)
      .select(when(pmod(conv(substring(md5(col("id").cast("string").cast("binary")), 1, 1), 16, 10)
        .cast("int"), lit(2)) === 0, lit(1)).otherwise(lit(-1)).as("s"))
      .collect().map(_.getInt(0))
    assert(table.map(_.toInt).toSeq == viaSql.toSeq)
  }

  test("codegen and interpreted paths agree; codes deterministic under repartition") {
    val dims = 8
    val vecs = (0L until 50L).map(i =>
      (i, Array.tabulate(dims)(d => math.sin(i * 31.0 + d).toFloat))).toDF("vec_id", "embedding")
    val expr = SignLshCodes.of(col("embedding"), 4, 6, dims)
    val once = vecs.select(col("vec_id"), expr.as("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // interpreted path: evaluate with codegen disabled via filter-after-collect
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = vecs.repartition(7).select(col("vec_id"), expr.as("codes")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(interp == once)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // every code fits in `bits` bits
    assert(once.values.forall(_.forall(c => c >= 0 && c < (1L << 6))))
  }

  test("kernel compiles at the 100-TB geometry its own contract calls for (32 bands x 20 bits x 768 dims)") {
    // AnnLsh's scaladoc says a 100 TB corpus runs ~16-20 bits with more
    // bands — the same "verified only below its design point" exposure
    // the IVF/PQ kernels had until r17/r18. The kernel's generated code
    // is constant-size (one triple loop over a ~491 KB addReferenceObj
    // sign table); this pin keeps that executable at the design point
    // under fallback=false, with interpreted parity at the same geometry.
    val bands = 32; val bits = 20; val dims = 768
    val data = (0L until 12L).map(i =>
      (i, Array.tabulate(dims)(d => (math.sin(i * 31.0 + d) / 2).toFloat)))
    val vecs = data.toDF("vec_id", "embedding").localCheckpoint(true)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val compiled = try {
      vecs.select(col("vec_id"), SignLshCodes.of(col("embedding"), bands, bits, dims).as("codes"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
    // LocalRelation side constant-folds through nullSafeEval — the
    // interpreted reference at the same geometry
    val interp = data.toDF("vec_id", "embedding")
      .select(col("vec_id"), SignLshCodes.of(col("embedding"), bands, bits, dims).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(compiled == interp)
    assert(compiled.values.forall(cs => cs.length == bands &&
      cs.forall(c => c >= 0 && c < (1L << bits))))
  }

  test("dimension mismatch and null elements fail loudly on both paths") {
    val bad = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception](
      bad.select(SignLshCodes.of(col("embedding"), 2, 2, 64)).collect())
    assert(e.getMessage.contains("dims") ||
      Option(e.getCause).exists(c => Option(c.getMessage).exists(_.contains("dims"))))
  }
}
