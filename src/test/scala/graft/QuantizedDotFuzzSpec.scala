package graft

import graft.functions.QuantizedDot
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Value-exact fuzz of the quantized dot product's two eval paths
  * against the documented scalar semantics ([[QuantizedDot.quantize]]:
  * floor to the 10^7 grid, NaN→0, ±Inf/overflow saturating at ±QMax).
  *
  * The r11/r12 corruption hardening moved the clamp INLINE into the
  * generated code (a branch-light three-operand form — the JVM-method
  * version measured 1.5× on d7); this spec pins that hand-inlined
  * codegen bit-for-bit to the scalar function on adversarial values, so
  * any future divergence between the two implementations of the clamp
  * is a permanent regression case, not a silent ranking skew. Also pins
  * the runtime dimension bound ([[QuantizedDot.MaxDims]]) this round's
  * ADVICE made explicit.
  */
class QuantizedDotFuzzSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val weird: Seq[Double] = Seq(
    Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
    Double.MaxValue, Double.MinValue, Double.MinPositiveValue,
    0.0, -0.0, 1e8, -1e8, 10.000000049, -10.000000049, 1e-9, -1e-9)

  private val valueGen: Gen[Double] = Gen.frequency(
    3 -> Gen.oneOf(weird),
    5 -> Gen.choose(-2.0, 2.0),
    2 -> Gen.choose(-1e9, 1e9))

  private def pairGen(maxDim: Int): Gen[(List[Double], List[Double])] = for {
    d <- Gen.choose(1, maxDim)
    a <- Gen.listOfN(d, valueGen)
    b <- Gen.listOfN(d, valueGen)
  } yield (a, b)

  private def samples[A](g: Gen[A], seed: Long, n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private def expected(a: Seq[Double], b: Seq[Double]): Long =
    a.zip(b).map { case (x, y) =>
      QuantizedDot.quantize(x) * QuantizedDot.quantize(y) }.sum

  test("whole-stage codegen path == scalar quantize semantics on adversarial doubles") {
    val cases = samples(pairGen(16), seed = 140001L, n = 64)
    val df = cases.toDF("a", "b")
      .select(QuantizedDot.of(org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")).as("dot"))
    val got = df.collect().map(_.getLong(0)).toSeq
    val want = cases.map { case (a, b) => expected(a, b) }
    assert(got == want, {
      val bad = got.zip(want).zipWithIndex.collect { case ((g, w), i) if g != w => (i, cases(i), g, w) }
      s"codegen diverged from scalar semantics: ${bad.take(3)}"
    })
  }

  test("interpreted eval path == scalar quantize semantics on adversarial doubles") {
    for (((a, b), i) <- samples(pairGen(16), seed = 140101L, n = 64).zipWithIndex) {
      val e = QuantizedDot(
        Literal.create(a.toArray, ArrayType(DoubleType)),
        Literal.create(b.toArray, ArrayType(DoubleType)))
      assert(e.eval(null) == expected(a, b), s"case $i: $a · $b")
    }
  }

  test("float inputs quantize as their double upcast (both eval paths)") {
    val floats = weird.map(_.toFloat) ++ Seq(0.1f, -0.1f, 1.5f)
    val gen = for {
      d <- Gen.choose(1, 8)
      a <- Gen.listOfN(d, Gen.oneOf(floats))
      b <- Gen.listOfN(d, Gen.oneOf(floats))
    } yield (a, b)
    val cases = samples(gen, seed = 140201L, n = 32)
    val got = cases.toDF("a", "b")
      .select(QuantizedDot.of(org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")).as("dot"))
      .collect().map(_.getLong(0)).toSeq
    val want = cases.map { case (a, b) =>
      expected(a.map(_.toDouble), b.map(_.toDouble)) }
    assert(got == want)
    for (((a, b), i) <- cases.zipWithIndex) {
      val e = QuantizedDot(
        Literal.create(a.toArray, ArrayType(FloatType)),
        Literal.create(b.toArray, ArrayType(FloatType)))
      assert(e.eval(null) == want(i), s"interpreted float case $i")
    }
  }

  test("dimension bound: MaxDims passes, MaxDims+1 fails loudly on both paths") {
    val ok = Array.fill(QuantizedDot.MaxDims.toInt)(1.0)
    val okDot = QuantizedDot(
      Literal.create(ok, ArrayType(DoubleType)),
      Literal.create(ok, ArrayType(DoubleType))).eval(null)
    assert(okDot == QuantizedDot.MaxDims.toLong *
      QuantizedDot.quantize(1.0) * QuantizedDot.quantize(1.0))

    val over = Array.fill(QuantizedDot.MaxDims.toInt + 1)(1.0)
    val exInterp = intercept[IllegalArgumentException] {
      QuantizedDot(
        Literal.create(over, ArrayType(DoubleType)),
        Literal.create(over, ArrayType(DoubleType))).eval(null)
    }
    assert(exInterp.getMessage.contains("overflow-safe"))

    val exCodegen = intercept[Exception] {
      Seq((over.toSeq, over.toSeq)).toDF("a", "b")
        .select(QuantizedDot.of(org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b")))
        .collect()
    }
    assert(exCodegen.getMessage.contains("overflow-safe") ||
      Option(exCodegen.getCause).exists(_.getMessage.contains("overflow-safe")))
  }
}
