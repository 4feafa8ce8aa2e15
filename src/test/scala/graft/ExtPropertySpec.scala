package graft

import graft.ext.{BfsHops, DedupClusters, PageRank, SimHash, SpanDedup}
import graft.ext.TextStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the extension families — the
  * RelationalPropertySpec lane applied to dedup, graph, and corpus
  * operators. The fixed-corpus oracles pin exact outputs on the
  * testdata; these pin the operators' DEFINING laws on generated
  * inputs the testdata cannot explore (adversarial collision
  * structure, dense repeats, arbitrary graph shapes):
  *
  *  1. SimHash pigeonhole blocking is EXACT, not approximate: with the
  *     bucket cap out of the way, pairs() ≡ the all-pairs Hamming
  *     filter — completeness is the pigeonhole principle (hamming ≤ H
  *     forces ≥1 of the H+1 blocks equal), soundness is the exact
  *     verify;
  *  2. span dedup ≡ exhaustive grid-window comparison: every
  *     cross-document window-length substring match at grid-aligned
  *     offsets is reported, and nothing else (rolling-hash collisions
  *     may merge buckets but the exact-substring verify removes them);
  *  3. connected-components labels equal a driver-side union-find's
  *     min-reachable-id, for any pair topology;
  *  4. BFS hop counts equal a driver-side multi-source BFS on any
  *     directed graph;
  *  5. PageRank output is bit-identical under input row order and
  *     partitioning — the claim the integer-arithmetic design makes;
  *  6. sequence packing preserves the corpus exactly and its
  *     (bin, bin_offset) layout is the running-sum law downstream
  *     writers rely on, invariant under input partitioning.
  *
  * Determinism: every input derives from an explicit ScalaCheck Seed —
  * a failure is a permanent regression case, not a flake.
  */
class ExtPropertySpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def samples[A](g: Gen[A], seed: Long, n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  // ---------------------------------------------------------------- 1.

  test("SimHash pairs ≡ exact all-pairs Hamming filter (pigeonhole completeness)") {
    // cluster-structured corpora: mutated copies of a few base word
    // lists, so small-Hamming pairs actually exist (uniform random text
    // almost never lands within maxHamming)
    val pool = (0 until 30).map(i => s"w$i")
    val baseGen = Gen.choose(6, 14).flatMap(k => Gen.listOfN(k, Gen.oneOf(pool)))
    val corpusGen = for {
      nBase <- Gen.choose(1, 4)
      bases <- Gen.listOfN(nBase, baseGen)
      nDocs <- Gen.choose(2, 24)
      docs <- Gen.listOfN(nDocs, for {
        b <- Gen.oneOf(bases)
        mut <- Gen.choose(0, 2)
        extra <- Gen.listOfN(mut, Gen.oneOf(pool))
      } yield (b ++ extra).mkString(" "))
      maxH <- Gen.choose(1, 4)
    } yield (docs, maxH)
    for (((texts, maxH), i) <- samples(corpusGen, seed = 130001L, n = 6).zipWithIndex) {
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
      val fps = SimHash.fingerprints(docs).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val expected = (for {
        a <- fps.keys; b <- fps.keys if a < b
        ham = fps(a).zip(fps(b)).count { case (x, y) => x != y }
        if ham <= maxH
      } yield (a, b, ham)).toSet
      val got = SimHash.pairs(docs, maxHamming = maxH, bucketCap = 100000).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == expected,
        s"sample $i (maxH=$maxH, ${texts.size} docs): " +
          s"missing=${expected -- got} spurious=${got -- expected}")
    }
  }

  // ---------------------------------------------------------------- 2.

  test("span pairs ≡ exhaustive grid-window substring comparison") {
    val window = 8; val stride = 4
    // tiny alphabet so window-length matches arise naturally
    val textGen = Gen.choose(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpusGen = Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, textGen))
    for ((texts, i) <- samples(corpusGen, seed = 130101L, n = 8).zipWithIndex) {
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
      def grid(t: String): Seq[(Int, String)] =
        (0 to t.length - window by stride).map(p => p -> t.substring(p, p + window))
      val expected = (for {
        (ta, a) <- texts.zipWithIndex; (tb, b) <- texts.zipWithIndex if a < b
        (pa, sa) <- grid(ta); (pb, sb) <- grid(tb) if sa == sb
      } yield (a.toLong, pa, b.toLong, pb, sa)).toSet
      val got = SpanDedup.spanPairs(docs, window, stride, bucketCap = 100000)
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getString(4))).toSet
      assert(got == expected,
        s"sample $i: missing=${expected -- got} spurious=${got -- expected}")
    }
  }

  // ---------------------------------------------------------------- 3.

  test("component labels ≡ driver union-find min-reachable-id on any pair topology") {
    val gen = for {
      nDocs <- Gen.choose(1, 25)
      nPairs <- Gen.choose(0, 30)
      pairs <- Gen.listOfN(nPairs,
        Gen.zip(Gen.choose(0L, nDocs - 1L), Gen.choose(0L, nDocs - 1L)))
    } yield (nDocs, pairs)
    for (((nDocs, pairs), i) <- samples(gen, seed = 130201L, n = 6).zipWithIndex) {
      val docs = (0L until nDocs.toLong).toDF("doc_id")
      val pairsDf = pairs.toDF("doc_a", "doc_b")
      // driver union-find
      val parent = Array.tabulate(nDocs)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      for ((a, b) <- pairs) {
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until nDocs).map(d => d.toLong -> find(d).toLong).toMap
      val got = DedupClusters.components(docs, pairsDf).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"sample $i ($nDocs docs, ${pairs.size} pairs)")
    }
  }

  // ---------------------------------------------------------------- 4.

  test("BFS hops ≡ driver multi-source BFS on any directed graph") {
    val seedMod = 5L; val maxHops = 3
    val gen = Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0L, 25L), Gen.choose(0L, 25L))))
    for ((edges, i) <- samples(gen, seed = 130301L, n = 6).zipWithIndex) {
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      var dist = nodes.filter(_ % seedMod == 0).map(_ -> 0L).toMap
      var frontier = dist.keySet
      for (k <- 1 to maxHops if frontier.nonEmpty) {
        val next = frontier.flatMap(n => adj.getOrElse(n, Nil)).diff(dist.keySet)
        dist ++= next.map(_ -> k.toLong)
        frontier = next
      }
      val got = BfsHops.hops(edges.toDF("src", "dst"), seedMod, maxHops)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == dist, s"sample $i (${edges.size} edges): " +
        s"missing=${dist.toSet -- got.toSet} spurious=${got.toSet -- dist.toSet}")
    }
  }

  // ---------------------------------------------------------------- 5.

  test("PageRank is bit-identical under input row order and partitioning") {
    val gen = Gen.choose(1, 60).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(1L, 20L), Gen.choose(1L, 20L))))
    for ((edges, i) <- samples(gen, seed = 130401L, n = 4).zipWithIndex) {
      val df = edges.toDF("src", "dst")
      val scrambled = df.orderBy(rand(42 + i)).repartition(13)
      val a = PageRank.ranks(df).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val b = PageRank.ranks(scrambled).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(a == b, s"sample $i: rank output depends on row order/partitioning")
    }
  }

  // ---------------------------------------------------------------- 6.

  test("MinHash verified pairs: exact Jaccard values, exact-duplicate completeness, prepared-path parity") {
    import graft.ext.MinHashDedup
    // corpora of mutated copies so near-dups exist; exact duplicates
    // planted by drawing the same base twice
    val pool = (0 until 20).map(i => s"tok$i")
    val baseGen = Gen.choose(8, 16).flatMap(k => Gen.listOfN(k, Gen.oneOf(pool)))
    val corpusGen = for {
      bases <- Gen.listOfN(3, baseGen)
      nDocs <- Gen.choose(4, 20)
      docs <- Gen.listOfN(nDocs, for {
        b <- Gen.oneOf(bases)
        mut <- Gen.choose(0, 3)
        extra <- Gen.listOfN(mut, Gen.oneOf(pool))
      } yield (b ++ extra).mkString(" "))
    } yield docs
    for ((texts, i) <- samples(corpusGen, seed = 130601L, n = 5).zipWithIndex) {
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
      val grams = docs.select(col("doc_id"),
          graft.functions.HashedNgrams.of(col("text"), 5).as("grams"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      def jac(a: Long, b: Long): Double = {
        val inter = grams(a).intersect(grams(b)).size
        inter.toDouble / (grams(a).size + grams(b).size - inter)
      }
      val got = MinHashDedup.verifiedPairs(docs, 5, 0.5, bucketCap = 100000)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // soundness: reported values are the exact Jaccard, all >= threshold
      for (((a, b), j) <- got) {
        assert(j == jac(a, b) && j >= 0.5, s"sample $i pair ($a,$b): j=$j vs exact ${jac(a, b)}")
      }
      // exact-duplicate completeness: identical signatures collide in
      // every band, so identical texts MUST be reported at jaccard 1.0
      for {
        (ta, a) <- texts.zipWithIndex; (tb, b) <- texts.zipWithIndex
        if a < b && ta == tb && ta.length >= 5
      } assert(got.get((a.toLong, b.toLong)).contains(1.0),
        s"sample $i: exact duplicate ($a,$b) not reported at 1.0")
      // the prepared-frame path emits the identical pair set
      val prep = MinHashDedup.prepared(docs, 5).cache()
      val viaPrep = MinHashDedup.verifiedPairsFromPrepared(prep, 0.5, bucketCap = 100000)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      prep.unpersist()
      assert(viaPrep == got, s"sample $i: prepared path diverged")
    }
  }

  // ---------------------------------------------------------------- 7.

  test("fuzzy join ≡ all-pairs edit-distance filter (PassJoin completeness)") {
    import graft.ext.FuzzyJoin
    val alpha = "abcdefgh"
    val charGen = Gen.oneOf(alpha.toSeq)
    val baseGen = Gen.choose(24, 32).flatMap(k => Gen.listOfN(k, charGen).map(_.mkString))
    def mutate(s: String, ops: List[(Int, Int, Char)]): String =
      ops.foldLeft(s) { case (t, (kind, pos, c)) =>
        if (t.isEmpty) t else {
          val p = pos % t.length
          kind % 3 match {
            case 0 => t.updated(p, c)                         // substitute
            case 1 => t.substring(0, p) + c + t.substring(p)  // insert
            case 2 => t.substring(0, p) + t.substring(p + 1)  // delete
          }
        }
      }
    val corpusGen = for {
      bases <- Gen.listOfN(3, baseGen)
      nDocs <- Gen.choose(4, 16)
      docs <- Gen.listOfN(nDocs, for {
        b <- Gen.oneOf(bases)
        nOps <- Gen.choose(0, 3)
        ops <- Gen.listOfN(nOps, for {
          kind <- Gen.choose(0, 2); pos <- Gen.choose(0, 40); c <- charGen
        } yield (kind, pos, c))
      } yield mutate(b, ops))
    } yield docs
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j =>
        if (i == 0) j else if (j == 0) i else 0))
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for ((texts, i) <- samples(corpusGen, seed = 130701L, n = 6).zipWithIndex) {
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
      val keys = texts.zipWithIndex.collect {
        case (t, j) if t.length >= 24 => j.toLong -> t.substring(0, 24) }.toMap
      val expected = (for {
        a <- keys.keys; b <- keys.keys if a < b
        ed = lev(keys(a), keys(b)) if ed <= 2
      } yield (a, b, ed.toLong)).toSet
      val got = FuzzyJoin.editDistancePairs(docs, bucketCap = 100000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected,
        s"sample $i: missing=${expected -- got} spurious=${got -- expected}")
    }
  }

  // ---------------------------------------------------------------- 8.

  test("Bloom membership has one-sided error; HLL is multiset- and order-insensitive") {
    import graft.ext.{BloomPrune, HyperLogLog}
    val keyGen = Gen.choose(1L, 400L).map(i => s"key_$i")
    val gen = for {
      base <- Gen.choose(1, 120).flatMap(n => Gen.listOfN(n, keyGen))
      probe <- Gen.choose(1, 60).flatMap(n => Gen.listOfN(n, keyGen))
    } yield (base, probe)
    for (((base, probe), i) <- samples(gen, seed = 130801L, n = 5).zipWithIndex) {
      val baseDf = base.toDF("key")
      val probeDf = probe.distinct.zipWithIndex
        .map { case (k, j) => (j.toLong, k) }.toDF("id", "key")
      val got = BloomPrune.membership(baseDf, probeDf, "id", "key", m = 512, numHashes = 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      assert(got.length == probe.distinct.size, s"sample $i: one row per probe key")
      for ((id, bloomHit, exactHit) <- got) {
        // the one-sided contract: a true member can NEVER miss
        assert(exactHit <= bloomHit,
          s"sample $i id=$id: false NEGATIVE (exact=$exactHit bloom=$bloomHit)")
      }
      // HLL: a cardinality sketch must ignore multiplicity and order
      def est(df: DataFrame): (Double, Int) = {
        val r = HyperLogLog.estimate(df, "key").collect()(0)
        (r.getAs[Double]("hll_estimate"), r.getAs[Int]("n_zero"))
      }
      val (e1, z1) = est(baseDf)
      val (e2, z2) = est(baseDf.union(baseDf).orderBy(rand(7 + i)).repartition(5))
      assert((e1, z1) == (e2, z2),
        s"sample $i: HLL sketch changed under duplication/shuffle ($e1/$z1 vs $e2/$z2)")
      // accuracy law on the CORRECTED estimate: the operator emits the
      // raw HLL plus n_zero precisely so a caller applies the standard
      // small-range linear-counting switch — do what the caller does
      val m = 256.0
      val corrected = if (z1 > 0 && e1 <= 2.5 * m) m * math.log(m / z1) else e1
      val exact = base.distinct.size
      assert(math.abs(corrected - exact) / exact < 0.25,
        s"sample $i: corrected estimate $corrected implausibly far from exact $exact (raw $e1, n_zero $z1)")
    }
  }

  // ---------------------------------------------------------------- 9.

  test("decontamination flags ≡ driver-side n-gram overlap; broadcast hint is semantics-free") {
    import graft.ext.Decontaminate
    val pool = (0 until 25).map(i => s"w$i")
    val textGen = Gen.choose(0, 20).flatMap(k => Gen.listOfN(k, Gen.oneOf(pool)).map(_.mkString(" ")))
    val gen = for {
      corpus <- Gen.choose(2, 20).flatMap(n => Gen.listOfN(n, textGen))
      bench <- Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, textGen))
    } yield (corpus, bench)
    for (((corpus, bench), i) <- samples(gen, seed = 130901L, n = 5).zipWithIndex) {
      val corpusDf = corpus.zipWithIndex.map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
      val benchDf = bench.zipWithIndex.map { case (t, j) => (1000L + j, t) }.toDF("doc_id", "text")
      val n = 3
      // driver reference over the engine's own gram arrays (the law under
      // test is the flagging join, not the hash function — the hash has
      // its own parity lane in NativeParityFuzzSpec)
      def grams(df: DataFrame): Map[Long, Set[Long]] =
        df.select(col("doc_id"),
            graft.ext.TextStats.hashedWordGramsCol(col("text"), n).as("g"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      val cg = grams(corpusDf)
      val bg = grams(benchDf).values.foldLeft(Set.empty[Long])(_ ++ _)
      val want = cg.map { case (id, g) => id -> g.intersect(bg).nonEmpty }
      for (bc <- Seq(true, false)) {
        val got = Decontaminate.flags(corpusDf, benchDf, n, broadcastBench = bc)
          .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
        assert(got == want, s"sample $i (broadcast=$bc): flags diverged " +
          s"diff=${(got.toSet -- want.toSet) ++ (want.toSet -- got.toSet)}")
      }
    }
  }

  // --------------------------------------------------------------- 10.

  test("incremental dedup ≡ full-corpus pairing restricted to cross pairs") {
    import graft.ext.MinHashDedup
    val pool = (0 until 20).map(i => s"tok$i")
    val baseGen = Gen.choose(8, 16).flatMap(k => Gen.listOfN(k, Gen.oneOf(pool)))
    val corpusGen = for {
      bases <- Gen.listOfN(3, baseGen)
      nDocs <- Gen.choose(6, 24)
      docs <- Gen.listOfN(nDocs, for {
        b <- Gen.oneOf(bases)
        mut <- Gen.choose(0, 3)
        extra <- Gen.listOfN(mut, Gen.oneOf(pool))
      } yield (b ++ extra).mkString(" "))
      splitAt <- Gen.choose(1, nDocs - 1)
    } yield (docs, splitAt)
    for (((texts, splitAt), i) <- samples(corpusGen, seed = 131001L, n = 5).zipWithIndex) {
      val all = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
      val existing = all.filter(col("doc_id") < splitAt)
      val arriving = all.filter(col("doc_id") >= splitAt)
      val incr = MinHashDedup.crossPairs(existing, arriving, 5, 0.5, bucketCap = 100000)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // the full-corpus pair set, restricted to (existing, arriving) and
      // re-oriented to the incremental output's (existing, arriving) order
      val full = MinHashDedup.verifiedPairs(all, 5, 0.5, bucketCap = 100000)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val fullCross = full.flatMap { case (a, b, j) =>
        if (a < splitAt && b >= splitAt) Some((a, b) -> j)
        else if (b < splitAt && a >= splitAt) Some((b, a) -> j)
        else None
      }.toMap
      assert(incr == fullCross, s"sample $i (split $splitAt/${texts.size}): " +
        s"missing=${fullCross.toSet -- incr.toSet} spurious=${incr.toSet -- fullCross.toSet}")
    }
  }

  // --------------------------------------------------------------- 11.

  test("stratified take ≡ driver md5-order selection; exact per-group counts; partition-invariant") {
    import graft.ext.TextStats
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val gen = for {
      nDocs <- Gen.choose(1, 60)
      groups <- Gen.listOfN(nDocs, Gen.choose(1, 4).map(g => s"g$g"))
      n <- Gen.choose(1, 6)
    } yield (groups, n)
    for (((groups, n), i) <- samples(gen, seed = 131101L, n = 5).zipWithIndex) {
      val docs = groups.zipWithIndex.map { case (g, j) => (j.toLong, g, "txt") }
        .toDF("doc_id", "lang", "text")
      val seedStr = s"prop$i"
      val got = TextStats.stratifiedTake(docs, "lang", n, seedStr)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      val want = groups.zipWithIndex.groupBy(_._1).flatMap { case (g, members) =>
        members.map { case (_, id) => (md5hex(s"$seedStr:$id"), id.toLong) }
          .sortBy(identity).take(n).zipWithIndex
          .map { case ((_, id), rank) => (id, g, rank + 1) }
      }.toSet
      assert(got == want,
        s"sample $i: missing=${want -- got} spurious=${got -- want}")
      val scrambled = TextStats.stratifiedTake(
          docs.orderBy(rand(3 + i)).repartition(7), "lang", n, seedStr)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
      assert(scrambled == got, s"sample $i: selection depends on input partitioning")
    }
  }

  // --------------------------------------------------------------- 12.

  test("span removal ≡ driver interval-merge over the exhaustive grid matches") {
    import graft.ext.SpanDedup
    val window = 8; val stride = 4
    val textGen = Gen.choose(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpusGen = Gen.choose(2, 10).flatMap(n => Gen.listOfN(n, textGen))
    for ((texts, i) <- samples(corpusGen, seed = 131201L, n = 6).zipWithIndex) {
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
      // driver: removal sites are the doc_b side of every cross-doc
      // grid-window match; merge overlapping-or-touching [pos, pos+w)
      // intervals; stitch the kept segments
      def grid(t: String): Seq[(Int, String)] =
        (0 to t.length - window by stride).map(p => p -> t.substring(p, p + window))
      val sites = (for {
        (ta, a) <- texts.zipWithIndex; (tb, b) <- texts.zipWithIndex if a < b
        (pa, sa) <- grid(ta); (pb, sb) <- grid(tb) if sa == sb
      } yield (b.toLong, pb)).distinct.groupBy(_._1).view.mapValues(_.map(_._2).sorted)
      val want = texts.zipWithIndex.map { case (t, j) =>
        sites.get(j.toLong) match {
          case None => (j.toLong, t, 0, 0)
          case Some(ps) =>
            val ivs = ps.foldLeft(List.empty[(Int, Int)]) {
              case ((s, e) :: rest, p) if p <= e => (s, math.max(e, p + window)) :: rest
              case (acc, p) => (p, p + window) :: acc
            }.reverse
            val kept = new StringBuilder
            var cur = 0
            for ((s, e) <- ivs) { kept ++= t.substring(cur, s); cur = e }
            kept ++= t.substring(cur)
            (j.toLong, kept.toString, ivs.size, t.length - kept.length)
        }
      }.toSet
      val got = SpanDedup.removeSpans(docs, window, stride, bucketCap = 100000)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
      assert(got == want, s"sample $i: missing=${want -- got} spurious=${got -- want}")
    }
  }

  // --------------------------------------------------------------- 13.

  test("containment join ≡ all-ordered-pairs distinct-gram containment (prefix-filter completeness)") {
    import graft.ext.{ContainmentJoin, TextStats}
    val pool = (0 until 15).map(i => s"w$i")
    val corpusGen = Gen.choose(2, 16).flatMap(nd => Gen.listOfN(nd,
      Gen.choose(0, 14).flatMap(k => Gen.listOfN(k, Gen.oneOf(pool)).map(_.mkString(" ")))))
    for ((texts, i) <- samples(corpusGen, seed = 131301L, n = 6).zipWithIndex) {
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
      val grams = docs.select(col("doc_id"),
          array_distinct(TextStats.hashedWordGramsCol(col("text"), 3)).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
        .filter(_._2.nonEmpty).toMap
      val t = 80
      val want = (for {
        (a, ga) <- grams; (b, gb) <- grams if a != b
        inter = ga.intersect(gb).size.toLong
        if inter * 100 >= ga.size.toLong * t
      } yield (a, b, ga.size.toLong, inter, inter * 100 / ga.size)).toSet
      val got = ContainmentJoin.pairs(docs, 3, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(got == want, s"sample $i: missing=${want -- got} spurious=${got -- want}")
    }
  }

  // --------------------------------------------------------------- 14.

  test("n-gram Jaccard ≡ all-pairs filter within (lang, length-bucket) blocks") {
    import graft.ext.NgramJaccard
    val pool = (0 until 20).map(i => s"tok$i")
    val corpusGen = for {
      bases <- Gen.listOfN(3, Gen.choose(8, 16).flatMap(k => Gen.listOfN(k, Gen.oneOf(pool))))
      nDocs <- Gen.choose(4, 18)
      docs <- Gen.listOfN(nDocs, for {
        b <- Gen.oneOf(bases)
        mut <- Gen.choose(0, 3)
        extra <- Gen.listOfN(mut, Gen.oneOf(pool))
        lang <- Gen.oneOf("en", "de")
      } yield ((b ++ extra).mkString(" "), lang))
    } yield docs
    for ((rows, i) <- samples(corpusGen, seed = 131401L, n = 5).zipWithIndex) {
      val bucketWidth = 20
      val docs = rows.zipWithIndex.map { case ((t, l), j) =>
        (j.toLong, t, l, t.length.toLong) }.toDF("doc_id", "text", "lang", "n_chars")
      val grams = docs.select(col("doc_id"),
          graft.functions.HashedNgrams.of(col("text"), 5).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      val block = rows.zipWithIndex.map { case ((t, l), j) =>
        j.toLong -> (l, t.length / bucketWidth) }.toMap
      val want = (for {
        a <- grams.keys; b <- grams.keys
        if a < b && block(a) == block(b)
        inter = grams(a).intersect(grams(b)).size
        j = inter.toDouble / (grams(a).size + grams(b).size - inter)
        if j >= 0.3
      } yield (a, b) -> j).toMap
      val got = NgramJaccard.pairs(docs, 5, 0.3, bucketWidth)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(got == want, s"sample $i: missing=${want.toSet -- got.toSet} " +
        s"spurious=${got.toSet -- want.toSet}")
    }
  }

  // --------------------------------------------------------------- 15.

  test("mixture epochs ≡ driver replay of the hash-bucket copy rule, order keys included") {
    import graft.ext.TextStats
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(id: Long): Long =
      java.lang.Long.parseLong(md5hex(id.toString).substring(0, 12), 16) % 100L
    val gen = for {
      nDocs <- Gen.choose(1, 50)
      srcs <- Gen.listOfN(nDocs, Gen.oneOf("web", "books", "code"))
      rWeb <- Gen.choose(0, 120)
      rBooks <- Gen.choose(0, 350)
      dflt <- Gen.choose(0, 100)
    } yield (srcs, rWeb, rBooks, dflt)
    for (((srcs, rWeb, rBooks, dflt), i) <- samples(gen, seed = 131501L, n = 5).zipWithIndex) {
      val docs = srcs.zipWithIndex.map { case (s, j) => (j.toLong, s, "txt") }
        .toDF("doc_id", "source", "text")
      val rates = Map("web" -> rWeb, "books" -> rBooks)
      val seedStr = s"mix$i"
      val want = srcs.zipWithIndex.flatMap { case (s, j) =>
        val rate = rates.getOrElse(s, dflt)
        val copies = rate / 100 + (if (bucket(j.toLong) < rate % 100) 1 else 0)
        (1 to copies).map(e => (j.toLong, s, e, md5hex(s"$seedStr:$j:$e")))
      }.toSet
      val got = TextStats.mixtureEpochs(
          docs.orderBy(rand(11 + i)).repartition(5), rates, dflt, seedStr)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3))).toSet
      assert(got == want, s"sample $i (rates=$rates dflt=$dflt): " +
        s"missing=${want -- got} spurious=${got -- want}")
    }
  }

  // --------------------------------------------------------------- 16.

  private val noisyEdgesGen: Gen[List[(Long, Long)]] =
    Gen.choose(1, 50).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0L, 18L), Gen.choose(0L, 18L))))

  private def simpleUnd(edges: List[(Long, Long)]): Set[(Long, Long)] =
    edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet

  private def triangleCounts(und: Set[(Long, Long)]): Map[Long, Long] = {
    val nbrs = (und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) })
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    nbrs.map { case (v, ns) =>
      v -> ns.toSeq.combinations(2).count {
        case Seq(a, b) => und.contains((math.min(a, b), math.max(a, b))) }.toLong
    }.filter(_._2 > 0)
  }

  test("per-node triangle counts ≡ driver enumeration on noisy multigraphs") {
    import graft.ext.Triangles
    for ((edges, i) <- samples(noisyEdgesGen, seed = 131601L, n = 6).zipWithIndex) {
      val want = triangleCounts(simpleUnd(edges))
      val got = Triangles.perNode(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"sample $i (${edges.size} edges): " +
        s"missing=${want.toSet -- got.toSet} spurious=${got.toSet -- want.toSet}")
    }
  }

  // --------------------------------------------------------------- 17.

  test("capped triangles ≡ exact triangles on the degree-bounded induced subgraph") {
    import graft.ext.Triangles
    val cap = 4L
    for ((edges, i) <- samples(noisyEdgesGen, seed = 131701L, n = 6).zipWithIndex) {
      val und = simpleUnd(edges)
      val deg = und.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val kept = deg.filter(_._2 <= cap).keySet
      val induced = und.filter { case (a, b) => kept(a) && kept(b) }
      val want = triangleCounts(induced)
      val got = Triangles.perNodeCapped(edges.toDF("src", "dst"), maxDegree = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"sample $i: missing=${want.toSet -- got.toSet} " +
        s"spurious=${got.toSet -- want.toSet}")
    }
  }

  // --------------------------------------------------------------- 18.

  test("label propagation ≡ driver synchronous replay (weighted votes, ties to smallest)") {
    import graft.ext.LabelPropagation
    for ((edges, i) <- samples(noisyEdgesGen, seed = 131801L, n = 5).zipWithIndex) {
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      // in-neighbor multiset per dst: parallel edges weight the vote
      val inN = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
      var labels = nodes.map(n => n -> n).toMap
      for (_ <- 1 to 3) {
        val prev = labels
        labels = nodes.map { n =>
          inN.get(n) match {
            case None | Some(Nil) => n -> prev(n)
            case Some(srcs) =>
              val votes = srcs.map(prev).groupBy(identity).view.mapValues(_.size).toMap
              // max votes, ties to the SMALLEST label
              n -> votes.toSeq.minBy { case (lbl, v) => (-v, lbl) }._1
          }
        }.toMap
      }
      val got = LabelPropagation.communities(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == labels, s"sample $i: " +
        s"diff=${(got.toSet -- labels.toSet) ++ (labels.toSet -- got.toSet)}")
    }
  }

  // --------------------------------------------------------------- 19.

  test("sequence packing preserves the corpus; layout is the running-sum law; partition-invariant") {
    val gen = for {
      nDocs <- Gen.choose(1, 40)
      toks <- Gen.listOfN(nDocs, Gen.choose(0L, 50L))
      budget <- Gen.choose(16, 64)
    } yield (toks, budget)
    for (((toks, budget), i) <- samples(gen, seed = 130501L, n = 6).zipWithIndex) {
      val docs = toks.zipWithIndex.map { case (t, j) => (j.toLong, "x", t) }
        .toDF("doc_id", "text", "n")
      val out = TextStats.packSequencesBy(docs, budget, nShards = 8, tokens = col("n"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      // corpus preserved exactly, token counts passed through
      assert(out.map(_._1).sorted.toSeq == (0L until toks.size.toLong),
        s"sample $i: doc set not preserved")
      assert(out.map(t => t._1 -> t._3).toMap == toks.zipWithIndex.map {
        case (t, j) => j.toLong -> t }.toMap, s"sample $i: token counts mutated")
      // per-shard running-sum law over the output's own shard assignment
      for ((_, rows) <- out.groupBy(_._2)) {
        var cum = 0L
        for ((_, _, n, bin, off) <- rows.sortBy(_._1)) {
          assert(bin == cum / budget && off == cum % budget,
            s"sample $i: layout violates the running-sum law")
          cum += n
        }
      }
      // bit-identical under partitioning and row order
      val scrambled = TextStats.packSequencesBy(
        docs.orderBy(rand(99 + i)).repartition(5), budget, nShards = 8, tokens = col("n"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).sortBy(_._1)
      assert(scrambled.toSeq == out.sortBy(_._1).toSeq,
        s"sample $i: packing depends on input partitioning")
    }
  }

  // ---------------------------------------------------------------- mm

  test("frame sampling ≡ driver codepoint chunking: content, counts, stride law") {
    import graft.ext.Multimodal
    // the engine chunks with substr()/length(), which operate on CODE
    // POINTS — the driver reference must too, or astral-plane emoji
    // (one code point, two UTF-16 units) shift every later boundary.
    // Pools mix ASCII, CJK, combining marks, and astral emoji; sizes
    // straddle the frame boundary (0, 63, 64, 65, 64k+1 ...).
    val pool: Seq[String] = Seq("a", "b", " ", "\u65e5", "\u672c",
      "\u00e9", "e\u0301", new String(Character.toChars(0x1F600)),
      new String(Character.toChars(0x1F680)))
    val gen: Gen[String] = for {
      n <- Gen.choose(0, 300)
      toks <- Gen.listOfN(n, Gen.oneOf(pool))
    } yield toks.mkString
    val frameBytes = 64
    val boundary = Seq("", "a" * 63, "a" * 64, "a" * 65,
      new String(Character.toChars(0x1F600)) * 64,
      new String(Character.toChars(0x1F600)) * 65)
    val texts = (samples(gen, 1515L, 40) ++ boundary).distinct
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

    // driver reference: code-point chunks of frameBytes, indexed
    def cpChunks(t: String): Seq[String] = {
      val cps = t.codePoints.toArray
      cps.grouped(frameBytes).map(a => new String(a, 0, a.length)).toSeq
    }
    val refRows = texts.zipWithIndex.flatMap { case (t, i) =>
      cpChunks(t).zipWithIndex.map { case (c, j) => (i.toLong, j, c) }
    }
    // reference frame_len/frame_hash computed by the ENGINE over the
    // DRIVER's chunk strings: equal multisets prove the posexplode +
    // substr chunking produced exactly the reference chunks' content
    val ref = refRows.toDF("doc_id", "frame_idx", "chunk")
      .select(col("doc_id"), col("frame_idx"),
        length(col("chunk")).as("frame_len"),
        graft.functions.RollingHash(col("chunk")).as("frame_hash"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet
    val allFrames = Multimodal.sampleFrames(docs, frameBytes, stride = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(allFrames == ref,
      "stride-1 frame sampling diverged from driver code-point chunking " +
        s"(engine-only: ${(allFrames -- ref).take(3)}; ref-only: ${(ref -- allFrames).take(3)})")
    // counts: ceil(cpLen / frameBytes), zero rows for the empty doc
    val perDoc = allFrames.groupBy(_._1).view.mapValues(_.size).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = (t.codePointCount(0, t.length) + frameBytes - 1) / frameBytes
      assert(perDoc.getOrElse(i.toLong, 0) == want,
        s"doc $i: expected $want frames, got ${perDoc.getOrElse(i.toLong, 0)}")
    }
    // stride law: stride=4 is exactly the stride-1 set filtered on index
    val strided = Multimodal.sampleFrames(docs, frameBytes, stride = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(strided == allFrames.filter(_._2 % 4 == 0),
      "stride=4 output is not the index-filtered stride-1 frame set")
  }
}
