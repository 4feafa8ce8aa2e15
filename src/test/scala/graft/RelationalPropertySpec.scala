package graft

import graft.analytics.{Repurchase, Rfm}
import graft.ext.ExactDedup
import graft.transform.{Dedup, SkewJoin}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the relational parity core — the
  * ScalaCheck lane for FRAMES, complementing NativeParityFuzzSpec's
  * text lane. The fixed-corpus oracle gates pin exact outputs on the
  * testdata; these pin ALGEBRAIC laws on generated frames the testdata
  * can't explore (hot-key pileups, duplicate keys, empty sides, windows
  * straddling band boundaries):
  *
  *  1. band-join ≡ range-join (the q7/q8 rewrite is an identity, not an
  *     approximation) on arbitrary purchase frames and windows;
  *  2. repurchase-label monotonicity in the window W (a pair repurchased
  *     within W is repurchased within any W' ≥ W, counts never shrink,
  *     and the first repurchase day is stable once found — the
  *     `ChurnPrediction.java:152-153` boundary semantics);
  *  3. RFM domain laws: recency ≥ 0, frequency ≥ 1 and bounded by the
  *     customer's order rows, monetary ≥ 0 on positive prices;
  *  4. dedup idempotence: dedup(dedup(x)) = dedup(x), group sizes
  *     partition the corpus;
  *  5. salted skew join ≡ plain inner join as multisets, any key skew;
  *  6. dropDuplicateKeys emits each surviving key exactly once, keys a
  *     subset of the input's.
  *
  * Determinism: every frame derives from an explicit ScalaCheck Seed —
  * a failure is a permanent regression case, not a flake.
  */
class RelationalPropertySpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val SampleFrames = 8

  private def samples[A](g: Gen[A], seed: Long, n: Int = SampleFrames): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  /** Small key domains on purpose: join/grouping semantics live in the
    * collision structure, and ~40 rows over 8 customers × 10 parts ×
    * 90 days collide constantly where uniform testdata rarely does.
    */
  private val ordersGen: Gen[List[(Long, Long, String)]] =
    Gen.choose(0, 40).flatMap { n =>
      Gen.listOfN(n, for {
        ok <- Gen.choose(1L, 30L)
        ck <- Gen.choose(1L, 8L)
        d <- Gen.choose(0, 90)
      } yield (ok, ck, java.time.LocalDate.of(1995, 1, 1).plusDays(d).toString))
    }

  private val lineitemGen: Gen[List[(Long, Long)]] =
    Gen.choose(0, 60).flatMap { n =>
      Gen.listOfN(n, for {
        ok <- Gen.choose(1L, 30L)
        pk <- Gen.choose(1L, 10L)
      } yield (ok, pk))
    }

  private def ordersDf(rows: List[(Long, Long, String)]): DataFrame =
    rows.toDF("o_orderkey", "o_custkey", "o_orderdate")

  private def lineitemDf(rows: List[(Long, Long)]): DataFrame =
    rows.toDF("l_orderkey", "l_partkey")

  private def rowSet(df: DataFrame, cols: String*): Map[Seq[Any], Int] =
    df.select(cols.map(col): _*).collect().toSeq
      .groupBy(_.toSeq).view.mapValues(_.size).toMap

  test("band-join ≡ range-join on arbitrary purchase frames and windows") {
    val gen = for {
      o <- ordersGen; l <- lineitemGen; w <- Gen.choose(1, 45)
    } yield (o, l, w)
    for (((o, l, w), i) <- samples(gen, seed = 120001L).zipWithIndex) {
      val cols = Seq("custkey", "partkey", "first_day",
        "first_repurchase_day", "n_repurchases", "repurchased")
      val naive = rowSet(Repurchase(ordersDf(o), lineitemDf(l), w), cols: _*)
      val band = rowSet(Repurchase.bandJoin(ordersDf(o), lineitemDf(l), w), cols: _*)
      assert(naive == band,
        s"sample $i (w=$w, ${o.size} orders, ${l.size} items): band-join diverged")
    }
  }

  test("repurchase label is monotone in the window; first repurchase day is stable") {
    val gen = for {
      o <- ordersGen.suchThat(_.nonEmpty); l <- lineitemGen
      w <- Gen.choose(1, 30); dw <- Gen.choose(1, 30)
    } yield (o, l, w, dw)
    for (((o, l, w, dw), i) <- samples(gen, seed = 120101L).zipWithIndex) {
      val cols = Seq("custkey", "partkey")
      def byPair(win: Int): Map[Seq[Any], (Long, Int, Int)] =
        Repurchase(ordersDf(o), lineitemDf(l), win)
          .collect().map { r =>
            (cols.map(c => r.getAs[Any](c)),
              (r.getAs[Long]("n_repurchases"), r.getAs[Int]("repurchased"),
                r.getAs[Int]("first_repurchase_day")))
          }.map { case (k, v) => k -> v }.toMap
      val small = byPair(w); val large = byPair(w + dw)
      assert(small.keySet == large.keySet,
        s"sample $i: the labeled pair set must not depend on the window")
      for ((k, (nS, repS, frdS)) <- small) {
        val (nL, repL, frdL) = large(k)
        assert(nL >= nS, s"sample $i $k: repurchase count shrank when W grew")
        assert(repL >= repS, s"sample $i $k: label flipped 1→0 when W grew")
        if (nS > 0)
          assert(frdL == frdS,
            s"sample $i $k: first repurchase day moved ($frdS → $frdL) when W grew")
      }
    }
  }

  test("RFM: recency ≥ 0, frequency ≥ 1 and row-bounded, monetary ≥ 0 on positive prices") {
    val gen = Gen.choose(1, 40).flatMap { n =>
      Gen.listOfN(n, for {
        ok <- Gen.choose(1L, 30L)
        ck <- Gen.choose(1L, 8L)
        d <- Gen.choose(0, 90)
        price <- Gen.choose(1, 100000)
      } yield (ok, ck,
        java.time.LocalDate.of(1995, 1, 1).plusDays(d).toString, price / 100.0))
    }
    for ((rows, i) <- samples(gen, seed = 120201L).zipWithIndex) {
      val orders = rows.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      val rowsPerCust = rows.groupBy(_._2).view.mapValues(_.size).toMap
      for (r <- Rfm(orders).collect()) {
        val ck = r.getAs[Long]("o_custkey")
        assert(r.getAs[Int]("recency_days") >= 0, s"sample $i cust $ck: negative recency")
        val freq = r.getAs[Long]("frequency")
        assert(freq >= 1 && freq <= rowsPerCust(ck),
          s"sample $i cust $ck: frequency $freq outside [1, ${rowsPerCust(ck)}]")
        assert(r.getAs[Double]("monetary") >= 0.0, s"sample $i cust $ck: negative monetary")
      }
    }
  }

  test("exact dedup is idempotent and its groups partition the corpus") {
    val textGen = Gen.oneOf(Gen.const(""), Gen.alphaStr.map(_.take(12)),
      Gen.oneOf("dup a", "dup b", "dup c"))
    val gen = Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, textGen))
    for ((texts, i) <- samples(gen, seed = 120301L).zipWithIndex) {
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
      val once = ExactDedup.dedup(docs)
      val twice = ExactDedup.dedup(once)
      assert(rowSet(once, "doc_id", "text") == rowSet(twice, "doc_id", "text"),
        s"sample $i: dedup is not idempotent")
      val groups = ExactDedup.groups(docs).collect()
      assert(groups.map(_.getAs[Long]("n_dups")).sum == texts.size,
        s"sample $i: group sizes do not partition the corpus")
      assert(once.count() == groups.length,
        s"sample $i: one representative per group")
    }
  }

  test("salted skew join ≡ plain inner join as multisets under any key skew") {
    // hot-key generator: key 1 is drawn ~half the time — the exact shape
    // salting exists for
    val keyGen = Gen.frequency(5 -> Gen.const(1L), 1 -> Gen.choose(2L, 6L))
    val gen = for {
      np <- Gen.choose(0, 50); nb <- Gen.choose(0, 20)
      probe <- Gen.listOfN(np, keyGen.flatMap(k => Gen.choose(0, 999).map(v => (k, v))))
      build <- Gen.listOfN(nb, keyGen.flatMap(k => Gen.choose(0, 999).map(v => (k, v))))
    } yield (probe, build)
    for (((p, b), i) <- samples(gen, seed = 120401L).zipWithIndex) {
      val probe = p.toDF("k", "pv")
      val build = b.toDF("k", "bv")
      val plain = rowSet(probe.join(build, Seq("k")), "k", "pv", "bv")
      val salted = rowSet(SkewJoin.innerSalted(probe, build, "k"), "k", "pv", "bv")
      assert(plain == salted, s"sample $i: salted join diverged from the plain join")
    }
  }

  test("dropDuplicateKeys: every surviving key exactly once, keys ⊆ input keys") {
    val gen = Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(1L, 10L), Gen.choose(0, 99))))
    for ((rows, i) <- samples(gen, seed = 120501L).zipWithIndex) {
      val df = rows.toDF("k", "v")
      val out = Dedup.dropDuplicateKeys(df, Seq("k")).collect()
      val outKeys = out.map(_.getAs[Long]("k")).toSeq
      assert(outKeys.distinct.size == outKeys.size, s"sample $i: duplicate keys survived")
      assert(outKeys.toSet == rows.map(_._1).toSet,
        s"sample $i: surviving keys differ from the input key set")
    }
  }
}
