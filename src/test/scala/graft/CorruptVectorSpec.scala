package graft

import org.scalatest.funsuite.AnyFunSuite

/** Corrupted embeddings must not kill the job. Under ANSI mode a
  * zero-norm vector (all zeros, or NaN components — NaN quantizes to 0)
  * used to fail the whole ANN query with DIVIDE_BY_ZERO at the cosine,
  * and ±Inf components quantized to Long.MaxValue and tripped
  * ARITHMETIC_OVERFLOW in the scoring plans; at pipeline scale one bad
  * vector in 10^10 would abort the run.
  *
  * The contract now: NaN components quantize to 0 (an all-NaN vector
  * has zero norm and is EXCLUDED from scoring by
  * [[graft.ext.VectorOps.validNorm]], like a genuinely all-zero one);
  * ±Inf components SATURATE at the ±10-per-axis grid bound (standard
  * quantizer behavior — the vector scores as the direction it clamps
  * to, with a finite cosine), and no accumulated product can wrap.
  */
class CorruptVectorSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def corpus = Seq(
    (1L, Array.tabulate(8)(d => 0.1f * (d + 1))),
    (2L, Array.fill(8)(Float.NaN)),                       // quantizes to 0-norm
    (3L, Array.fill(8)(0.0f)),                            // genuine 0-norm
    (4L, Array.fill(8)(Float.PositiveInfinity)),          // saturates to (+10)^8
    (5L, Array.tabulate(8)(d => 0.1f * (d + 1) + 0.01f)), // near-dup of 1
    (6L, Array.tabulate(8)(d => -0.2f * (d + 1)))
  ).toDF("vec_id", "embedding")

  test("brute-force top-k excludes zero-norm vectors, saturates Inf, never NaNs") {
    val out = graft.queries.ExtensionQueries.bruteTopK(corpus, corpus, 5).collect()
    val ids = out.flatMap(r => Seq(r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    assert(!ids.contains(2L) && !ids.contains(3L), s"zero-norm vector scored: $ids")
    assert(ids.contains(4L), "the saturated Inf vector scores as its clamp direction")
    // finite vectors still rank correctly: 5 is 1's nearest neighbor
    val rank1 = out.filter(r => r.getAs[Long]("qid") == 1L && r.getAs[Int]("rank") == 1)
    assert(rank1.head.getAs[Long]("cid") == 5L)
    assert(out.forall(r => !r.getAs[Double]("cosine").isNaN))
  }

  test("IVF-Lloyd top-k survives corrupted vectors in corpus and queries") {
    val out = graft.ext.AnnIvf.topKLloyd(corpus, corpus, 5, nCells = 2, nProbe = 2).collect()
    assert(out.nonEmpty)
    val ids = out.flatMap(r => Seq(r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    assert(!ids.contains(2L) && !ids.contains(3L), s"zero-norm vector scored: $ids")
    assert(out.forall(r => !r.getAs[Double]("cosine").isNaN))
  }

  test("embedding-dup detection survives corrupted vectors") {
    val pairs = graft.ext.VectorOps.blockedAllPairs(corpus, threshold = 0.95).collect()
    val ids = pairs.flatMap(r => Seq(r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(!ids.contains(2L) && !ids.contains(3L), s"zero-norm vector paired: $ids")
    assert(ids.contains(1L) && ids.contains(5L), "the finite near-dup pair still found")
  }
}
