package graft

import graft.ext.{AnnIvf, AnnLsh}
import graft.functions.QuantizedDot
import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the ANN family on generated corpora:
  *
  *  1. IVF with EVERY cell probed is exact — cells partition the
  *     corpus, so nProbe = nCells degenerates to brute force and must
  *     return precisely the driver-computed top-k (scores bit-equal,
  *     ranks tie-broken by cid), for any corpus and any Lloyd fit.
  *     This pins the invariant that makes nProbe a pure recall dial:
  *     probing misses candidates, it never corrupts scores or order.
  *  2. Sign-LSH results are sound: every reported (qid, cid, cosine)
  *     carries the bit-exact quantized cosine of that pair, ranks are
  *     dense and ordered by (cosine desc, cid asc), at most k rows per
  *     query, self-pairs and zero-norm vectors never appear.
  *
  * The driver reference replicates the engine's arithmetic exactly:
  * integer dot on the quantized grid, one sqrt per norm, one divide —
  * so equality is on double BITS, not a tolerance. Seeded generators;
  * a zero vector is planted in every corpus to pin the exclusion law.
  */
class AnnPropertySpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val Dims = 64

  private def samples[A](g: Gen[A], seed: Long, n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val corpusGen: Gen[List[Array[Float]]] =
    Gen.choose(20, 45).flatMap { n =>
      Gen.listOfN(n, Gen.listOfN(Dims, Gen.choose(-1.0, 1.0)).map(_.map(_.toFloat).toArray))
    }.map(vs => vs :+ Array.fill(Dims)(0.0f)) // planted zero vector

  private def toDf(vs: List[Array[Float]]): DataFrame =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toDF("vec_id", "embedding")

  /** Engine-exact cosine: integer dot on the grid, sqrt per norm, one
    * divide — the same op sequence as VectorOps.dotQ + the norm product.
    */
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    def dot(x: Array[Float], y: Array[Float]): Long =
      x.zip(y).map { case (p, q) =>
        QuantizedDot.quantize(p.toDouble) * QuantizedDot.quantize(q.toDouble) }.sum
    dot(a, b).toDouble / (math.sqrt(dot(a, a).toDouble) * math.sqrt(dot(b, b).toDouble))
  }

  private def norm(a: Array[Float]): Double =
    math.sqrt(a.map(x => { val q = QuantizedDot.quantize(x.toDouble); q * q }).sum.toDouble)

  test("IVF with every cell probed ≡ driver-exact brute-force top-k") {
    val k = 5; val nCells = 4
    for ((vs, i) <- samples(corpusGen, seed = 160001L, n = 4).zipWithIndex) {
      val df = toDf(vs)
      val queries = df.filter($"vec_id" < 6)
      val got = AnnIvf.topKLloyd(df, queries, k, nCells = nCells, nProbe = nCells)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap
      val valid = vs.zipWithIndex.collect {
        case (v, id) if norm(v) > 0.0 => id.toLong -> v }.toMap
      val want = (0L until 6L).collect {
        case q if valid.contains(q) =>
          q -> valid.toSeq.filter(_._1 != q)
            .map { case (cid, v) => (cid, cos(valid(q), v)) }
            .sortBy { case (cid, c) => (-c, cid) }.take(k)
      }.toMap
      assert(got == want, s"sample $i: exhaustive-probe IVF diverged from brute force\n" +
        s"got=${got.toSeq.sortBy(_._1).take(2)}\nwant=${want.toSeq.sortBy(_._1).take(2)}")
    }
  }

  test("PQ with an exhaustive refine budget ≡ driver-exact brute-force top-k") {
    import graft.ext.AnnPq
    val k = 5
    for ((vs, i) <- samples(corpusGen, seed = 160201L, n = 3).zipWithIndex) {
      val df = toDf(vs)
      val queries = df.filter($"vec_id" < 6)
      val cb = AnnPq.fixedCodebooks(df)
      // refine budget covering the whole corpus: the ADC shortlist is
      // everything, so the exact rescore must reproduce brute force —
      // pinning `refine` as a pure recall dial, like IVF's nProbe
      val refine = (vs.size / k) + 1
      val got = AnnPq.topK(df, queries, k, cb, refine = refine)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(4)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap
      val valid = vs.zipWithIndex.collect {
        case (v, id) if norm(v) > 0.0 => id.toLong -> v }.toMap
      val want = (0L until 6L).collect {
        case q if valid.contains(q) =>
          q -> valid.toSeq.filter(_._1 != q)
            .map { case (cid, v) => (cid, cos(valid(q), v)) }
            .sortBy { case (cid, c) => (-c, cid) }.take(k)
      }.toMap
      assert(got == want, s"sample $i: exhaustive-refine PQ diverged from brute force")
    }
  }

  test("blockedAllPairs ≡ bruteForcePairs bit-exactly, invariant in the block count") {
    import graft.ext.VectorOps
    // bruteForcePairs is the documented driver-side exact-recall
    // baseline (same integer dot, same single sqrt/divide); the shipped
    // distributed plan must reproduce it pair-for-pair with bit-equal
    // cosines, and the block count must be pure partitioning — any
    // blocks value covers every unordered pair exactly once
    for ((vs, i) <- samples(corpusGen, seed = 160301L, n = 3).zipWithIndex) {
      // plant an exact duplicate so a cosine=1.0 pair always exists
      val planted = vs :+ vs.head.clone()
      val df = toDf(planted)
      val threshold = 0.10
      def pairSet(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long, Double)] =
        rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = pairSet(VectorOps.bruteForcePairs(df, threshold).collect())
      // the duplicate's cosine is s/(sqrt(s)*sqrt(s)) — within one ulp of
      // 1.0, not necessarily equal (sqrt(s)² rounds)
      assert(want.exists(_._3 > 0.9999999), s"sample $i: planted duplicate pair missing")
      assert(want.forall { case (a, b, _) => a < b }, s"sample $i: oracle pair order")
      for (blocks <- Seq(1, 3, 8)) {
        val got = pairSet(VectorOps.blockedAllPairs(df, threshold, blocks).collect())
        assert(got == want,
          s"sample $i blocks=$blocks: blockedAllPairs diverged from the exact baseline\n" +
            s"missing=${(want -- got).take(3)}\nextra=${(got -- want).take(3)}")
      }
    }
  }

  test("sign-LSH results are sound: exact scores, dense ordered ranks, no self/zero-norm pairs") {
    val k = 5
    for ((vs, i) <- samples(corpusGen, seed = 160101L, n = 4).zipWithIndex) {
      val df = toDf(vs)
      val queries = df.filter($"vec_id" < 6)
      val rows = AnnLsh.topK(df, queries, k)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      val byQ = rows.groupBy(_._1)
      val zeroId = vs.size - 1L
      for ((q, rs) <- byQ) {
        assert(rs.length <= k, s"sample $i q=$q: more than k rows")
        val sorted = rs.sortBy(_._2)
        assert(sorted.map(_._2).toSeq == (1 to sorted.length), s"sample $i q=$q: ranks not dense")
        assert(sorted.sliding(2).forall {
          case Array((_, _, c1, s1), (_, _, c2, s2)) => s1 > s2 || (s1 == s2 && c1 < c2)
          case _ => true
        }, s"sample $i q=$q: not ordered by (cosine desc, cid asc)")
        for ((qid, _, cid, score) <- rs) {
          assert(cid != qid && cid != zeroId && qid != zeroId,
            s"sample $i: self or zero-norm pair reported ($qid,$cid)")
          assert(score == cos(vs(qid.toInt), vs(cid.toInt)),
            s"sample $i ($qid,$cid): score $score != exact ${cos(vs(qid.toInt), vs(cid.toInt))}")
        }
      }
    }
  }
}
