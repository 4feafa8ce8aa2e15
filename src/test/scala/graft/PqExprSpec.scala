package graft

import graft.functions.{PqCodes, PqDistanceTable, QuantizedDot}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the native PQ kernels ([[graft.functions.PqOps]]).
  *
  * The kernels replaced an `nSub × nCodes` forest of
  * `slice` + [[QuantizedDot]] literal expressions whose generated
  * `processNext()` exceeded the JVM's 64 KB method limit at the gate
  * geometry (8×16) — janino failed and the PQ encode (the index-build
  * corpus scan) silently ran INTERPRETED. This spec keeps three facts
  * executable: (1) the kernels are bit-identical to the forest form —
  * which is also the DuckDB oracle's arithmetic — on both eval paths,
  * including adversarial values and tie-breaks; (2) they fail loudly on
  * malformed vectors, like every graft vector kernel; (3) they COMPILE
  * under whole-stage codegen where the forest form demonstrably cannot
  * (the red baseline that proves the rewrite was load-bearing, not
  * hygiene).
  */
class PqExprSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  /** The replaced expression-forest dtab, kept verbatim as the reference
    * semantics: `|c|² − 2·v_m·c` per (m, j) from slice + quantized dot
    * against a plan-literal code.
    */
  private def forestDtab(v: Column, cb: Array[Array[Array[Float]]]): Column =
    array(cb.indices.map(m =>
      array(cb(m).indices.map { j =>
        val dsub = cb(m)(j).length
        val c2 = cb(m)(j).map { x =>
          val q = QuantizedDot.quantize(x.toDouble); q * q
        }.sum
        lit(c2) - lit(2L) *
          QuantizedDot.of(slice(v, m * dsub + 1, dsub), typedLit(cb(m)(j)))
      }: _*)): _*)

  /** The replaced forest encode: per-subspace `array_min` over
    * `struct(score, code)` — ties to the lower code id by lexicographic
    * struct ordering.
    */
  private def forestCodes(v: Column, cb: Array[Array[Array[Float]]]): Column =
    array(cb.indices.map { m =>
      val dsub = cb(m)(0).length
      array_min(array(cb(m).toIndexedSeq.zipWithIndex.map { case (c, j) =>
        val c2 = c.map { x => val q = QuantizedDot.quantize(x.toDouble); q * q }.sum
        struct(
          (lit(c2) - lit(2L) *
            QuantizedDot.of(slice(v, m * dsub + 1, dsub), typedLit(c))).as("score"),
          lit(j).as("code"))
      }: _*)).getField("code")
    }: _*)

  private val rng = new scala.util.Random(170001L)
  private val weird: Seq[Float] = Seq(
    Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity,
    1e9f, -1e9f, 10.000000049f, -10.000000049f, 1e-9f, 0.0f, -0.0f)

  private def randVec(dims: Int): Array[Float] =
    Array.tabulate(dims)(_ =>
      if (rng.nextInt(8) == 0) weird(rng.nextInt(weird.size))
      else (rng.nextDouble() * 2 - 1).toFloat)

  private def gateCb: Array[Array[Array[Float]]] =
    Array.tabulate(8, 16)((m, j) =>
      Array.tabulate(8)(i => (math.sin(m * 131 + j * 17 + i) / 2).toFloat))

  test("kernels are bit-identical to the expression-forest form at the gate geometry") {
    val cb = gateCb
    // localCheckpoint: an RDD-scan leaf, so the selects below go through
    // real whole-stage stages (a LocalRelation would constant-fold into
    // the interpreted eval path only)
    val vecs = (0L until 48L).map(i => (i, randVec(64)))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    // the forest side blows the 64 KB method limit here — its janino
    // ERROR is the expected, documented event this spec exists around
    val rows = QuietExpectedThrows {
      vecs.select(
        col("vec_id"),
        PqDistanceTable.of(col("embedding"), cb).as("dtab"),
        PqCodes.of(col("embedding"), cb).as("codes"),
        forestDtab(col("embedding"), cb).as("fdtab"),
        forestCodes(col("embedding"), cb).as("fcodes")).collect()
    }
    assert(rows.length == 48)
    rows.foreach { r =>
      assert(r.getSeq[Seq[Long]](1) == r.getSeq[Seq[Long]](3),
        s"dtab mismatch at vec_id=${r.getLong(0)}")
      assert(r.getSeq[Int](2) == r.getSeq[Int](4),
        s"codes mismatch at vec_id=${r.getLong(0)}")
    }
  }

  test("interpreted path agrees on doubles at a small geometry (forest compiles there too)") {
    val cb = Array.tabulate(2, 3)((m, j) =>
      Array.tabulate(2)(i => (math.cos(m * 7 + j * 3 + i) / 3).toFloat))
    // no checkpoint: the LocalRelation constant-folds through nullSafeEval
    val vecs = (0L until 20L).map(i =>
      (i, Array.tabulate(4)(d => math.sin((i * 13 + d).toDouble) * 1.5))).toDF("vec_id", "embedding")
    val rows = vecs.select(
      PqDistanceTable.of(col("embedding"), cb).as("dtab"),
      PqCodes.of(col("embedding"), cb).as("codes"),
      forestDtab(col("embedding"), cb).as("fdtab"),
      forestCodes(col("embedding"), cb).as("fcodes")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Seq[Long]](0) == r.getSeq[Seq[Long]](2))
      assert(r.getSeq[Int](1) == r.getSeq[Int](3))
    }
  }

  test("argmin ties break to the lower code id") {
    // codes 1 and 3 of subspace 0 are byte-identical: any vector scores
    // them equally, and the code must be 1, never 3
    val cb = Array.tabulate(2, 4)((m, j) =>
      Array.tabulate(2)(i =>
        if (m == 0 && (j == 1 || j == 3)) 0.25f
        else (math.sin(m * 11 + j * 5 + i) / 2).toFloat))
    val vecs = (0L until 12L).map(i => (i, randVec(4))).toDF("vec_id", "embedding")
    val got = vecs.select(PqCodes.of(col("embedding"), cb).as("codes"),
      forestCodes(col("embedding"), cb).as("fcodes")).collect()
    got.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1))
      assert(r.getSeq[Int](0).head != 3, "tie resolved to the higher code id")
    }
  }

  test("dimension mismatch and null elements fail loudly") {
    val cb = gateCb
    def msgChain(e: Throwable): String =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .flatMap(t => Option(t.getMessage)).mkString(" | ")
    val short = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e1 = intercept[Exception](
      short.select(PqCodes.of(col("embedding"), cb)).collect())
    assert(msgChain(e1).contains("dims"))
    val hole = Seq((1L, Array[java.lang.Float](1.0f, null) ++
      Array.tabulate(62)(i => java.lang.Float.valueOf(i * 0.01f))))
      .toDF("vec_id", "embedding")
    val e2 = intercept[Exception](
      hole.select(PqDistanceTable.of(col("embedding"), cb)).collect())
    assert(msgChain(e2).contains("null element"))
  }

  test("kernels compile and match the forest arithmetic at the industry 8x256 geometry") {
    // r17's own lesson ("a path verified only below its design point hides
    // its failure exactly there") applied to this spec: the r17 pins stop
    // at the 8x16 gate geometry, but production PQ is 256 codes (8-bit)
    // per subspace. The kernel is constant-size in geometry by
    // construction — this keeps that claim executable at the geometry
    // users actually run.
    val cb = Array.tabulate(8, 256)((m, j) =>
      Array.tabulate(8)(i => (math.sin(m * 131 + j * 17 + i) / 2).toFloat))
    val data = (0L until 24L).map(i => (i, randVec(64)))
    // kernel side: RDD-backed leaf = real whole-stage codegen, and
    // fallback=false turns any janino failure into a thrown error
    val vecs = data.toDF("vec_id", "embedding").localCheckpoint(true)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val kernel = try {
      vecs.select(
        col("vec_id"),
        PqCodes.of(col("embedding"), cb).as("codes"),
        PqDistanceTable.of(col("embedding"), cb).as("dtab"))
        .collect().map(r => r.getLong(0) -> (r.getSeq[Int](1), r.getSeq[Seq[Long]](2))).toMap
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
    // reference side: the verbatim forest form on a LocalRelation —
    // constant-folded interpreted eval, so the 2048-literal forest never
    // meets janino and still supplies the reference arithmetic
    val forest = data.toDF("vec_id", "embedding").select(
      col("vec_id"),
      forestCodes(col("embedding"), cb).as("fcodes"),
      forestDtab(col("embedding"), cb).as("fdtab"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Int](1), r.getSeq[Seq[Long]](2))).toMap
    assert(kernel.keySet == forest.keySet)
    kernel.foreach { case (id, (codes, dtab)) =>
      assert(codes == forest(id)._1, s"codes mismatch at vec_id=$id")
      assert(dtab == forest(id)._2, s"dtab mismatch at vec_id=$id")
    }
  }

  test("malformed codebooks fail loudly at construction (r18 advisory guards)") {
    val v = col("embedding")
    // ragged: subspace 1 has MORE codes than subspace 0 — before the
    // guard, the extra codes were silently ignored (a plausible-but-wrong
    // index); fewer codes died as a raw ArrayIndexOutOfBounds in qcb
    val ragged = Array(
      Array.tabulate(4)(j => Array.tabulate(4)(i => (j + i).toFloat)),
      Array.tabulate(6)(j => Array.tabulate(4)(i => (j - i).toFloat)))
    val e1 = intercept[IllegalArgumentException](PqCodes.of(v, ragged))
    assert(e1.getMessage.contains("ragged codebook"))
    // empty codebook / empty subspace: named error, not AIOOBE
    val e2 = intercept[IllegalArgumentException](
      PqCodes.of(v, Array.empty[Array[Array[Float]]]))
    assert(e2.getMessage.contains("at least one subspace"))
    val e3 = intercept[IllegalArgumentException](
      PqDistanceTable.of(v, Array(Array.empty[Array[Float]])))
    assert(e3.getMessage.contains("no codes"))
    // overflow guard, EXACT per code: with saturated values (|x| >= 10
    // clamps to QMax) the fused c2 - 2*dot accumulator wraps above
    // dsub = 307 — rejected at construction with a named error
    val wide = Array(Array(Array.fill(308)(100.0f)))
    val e4 = intercept[IllegalArgumentException](PqCodes.of(v, wide))
    assert(e4.getMessage.contains("overflow-safe"))
    // 307 saturated dims sit exactly inside the bound
    PqCodes.of(v, Array(Array(Array.fill(307)(100.0f))))
    // and the guard is worst-case-EXACT, not a blanket dims cap: a
    // 768-dim NORMALIZED subspace (production embedding width) cannot
    // wrap (|score| <= 768e14 + 2e8*768e7 ~ 1.6e18 << 2^63) — accepted
    PqCodes.of(v, Array(Array(Array.fill(768)(0.5f))))
  }

  test("kernels compile and match the forest at 768-dim production embedding width") {
    // the exact overflow guard (r18) admits wide normalized geometries —
    // verify the admitted geometry actually works: 48 subspaces × 16
    // codes × 16 dims (a production PQ split of a 768-dim embedding),
    // kernel compiled under fallback=false vs the forest interpreted on
    // a LocalRelation
    val cb = Array.tabulate(48, 16)((m, j) =>
      Array.tabulate(16)(i => (math.sin(m * 131 + j * 17 + i) / 2).toFloat))
    val data = (0L until 16L).map(i => (i, randVec(768)))
    val vecs = data.toDF("vec_id", "embedding").localCheckpoint(true)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val kernel = try {
      vecs.select(
        col("vec_id"),
        PqCodes.of(col("embedding"), cb).as("codes"),
        PqDistanceTable.of(col("embedding"), cb).as("dtab"))
        .collect().map(r => r.getLong(0) -> (r.getSeq[Int](1), r.getSeq[Seq[Long]](2))).toMap
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
    val forest = data.toDF("vec_id", "embedding").select(
      col("vec_id"),
      forestCodes(col("embedding"), cb).as("fcodes"),
      forestDtab(col("embedding"), cb).as("fdtab"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Int](1), r.getSeq[Seq[Long]](2))).toMap
    assert(kernel == forest)
  }

  test("kernels compile under whole-stage codegen; the forest they replaced cannot") {
    val cb = gateCb
    val vecs = (0L until 8L).map(i => (i, randVec(64)))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    // fallback=false turns a janino compile failure from a silent
    // interpreted downgrade into a thrown error — the kernels must pass
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = vecs.select(
        PqDistanceTable.of(col("embedding"), cb).as("dtab"),
        PqCodes.of(col("embedding"), cb).as("codes"))
        .where(col("codes")(0) >= 0 && col("dtab")(0)(0).isNotNull).count()
      assert(n == 8)
      // red baseline: the forest form at the same geometry fails to
      // compile (Code grows beyond 64 KB) — proof this spec's subject
      // was a real scale defect, not taste. The FULL array must be
      // collected: any element extraction over the CreateArray forest
      // gets simplified to that one element by SimplifyExtractValueOps,
      // leaving nothing big to compile.
      val thrown = QuietExpectedThrows {
        intercept[Throwable](
          vecs.select(forestDtab(col("embedding"), cb).as("fdtab")).collect())
      }
      assert(thrown != null)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("r19 guards: ragged dsub is named at construction; per-code bound leaves ADC-sum headroom") {
    val v = col("embedding")
    // ragged dsub: code (1,1) is one dim short — previously passed
    // construction (the overflow loop iterated code.length, masking it)
    // and died task-side in the lazy qcb; now named on the driver like
    // every other shape defect
    val raggedDsub = Array(
      Array(Array.fill(4)(0.5f), Array.fill(4)(0.25f)),
      Array(Array.fill(4)(0.5f), Array.fill(3)(0.25f)))
    val e1 = intercept[IllegalArgumentException](PqCodes.of(v, raggedDsub))
    assert(e1.getMessage.contains("every code must have 4 dims"))
    // ADC-sum headroom: a 200-dim saturated code is safe ALONE
    // (worst |score| = 3·200·QMax² = 6e18 < 2^63) but AnnPq's adcSum
    // adds one such score per subspace with plain Add — two subspaces
    // sum to 1.2e19 > 2^63, a wrap the old per-code 2^63 bound admitted.
    // The guard now bounds each code by 2^63/nSub.
    val sat200 = Array(Array(Array.fill(200)(100.0f)))
    PqCodes.of(v, sat200) // nSub=1: 6e18 <= 2^63, accepted as before
    val sat200x2 = Array.fill(2)(Array(Array.fill(200)(100.0f)))
    val e2 = intercept[IllegalArgumentException](PqCodes.of(v, sat200x2))
    assert(e2.getMessage.contains("2^63/nSub"),
      s"expected the nSub-divided bound in: ${e2.getMessage}")
    // the production 8-subspace split keeps miles of headroom: a
    // normalized 96-dim code's worst case (~7e15) vs 2^63/8 (~1.2e18)
    PqCodes.of(v, Array.fill(8)(Array(Array.fill(96)(0.11f))))
  }

  test("expensive table guards run once per codebook identity across Catalyst copies (r19)") {
    import graft.functions.GuardOnce
    // fresh arrays = fresh identities, so parallel suites can't touch
    // these counters
    val cb = Array.tabulate(4, 8)((m, j) =>
      Array.tabulate(8)(i => (math.sin(m * 31 + j * 7 + i) / 2).toFloat))
    val vecs = (0L until 6L).map(i =>
      (i, Array.tabulate(32)(d => (math.cos(i * 13.0 + d) / 2).toFloat)))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    val out = vecs.select(
      PqCodes.of(col("embedding"), cb).as("codes"),
      PqDistanceTable.of(col("embedding"), cb).as("dtab"))
      .where(col("codes")(0) >= 0)
      .collect()
    assert(out.length == 6)
    // the saved cost is real: analysis/optimization re-entered the guard
    // via expression copies (and the second kernel shares the table).
    // callsFor > runsFor, not an absolute count — an optimizer that
    // copies less must not fail this with no real regression (r19
    // advisory); both kernels construct once each, so this is >= 2
    assert(GuardOnce.callsFor(cb) > GuardOnce.runsFor(cb),
      s"expected Catalyst copies to re-enter the guard, saw ${GuardOnce.callsFor(cb)}")
    // ...but the O(nSub·nCodes·dsub) validation body ran exactly once
    assert(GuardOnce.runsFor(cb) == 1,
      s"validation ran ${GuardOnce.runsFor(cb)} times for one table identity")
  }
}
