package graft

import graft.ext.{MinHashDedup, NgramJaccard, SimHash, TextStats}
import graft.functions.{HashedNgrams, MinHashSignature}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native-expression == relational-twin parity under adversarial text.
  *
  * The fixed-corpus parity specs (ShingleHashesSpec, SimHashSpec,
  * WordGramHashesSpec) pin the equivalence on the real documents table,
  * which is ASCII-heavy. The native expressions do their own UTF-8
  * walking in codegen, so the risky inputs are exactly what a web-scale
  * corpus contains and the testdata doesn't: supplementary-plane emoji
  * (surrogate pairs), CJK, combining marks, RTL scripts, exotic
  * whitespace, control characters, and pathological lengths. A seeded
  * generator keeps the "fuzz" reproducible — a failure here is a
  * permanent regression case, not a flake.
  */
class NativeParityFuzzSpec extends AnyFunSuite with SharedSpark
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  // the session is JVM-shared across suites; a cached corpus left behind
  // trips the global drain assertions suites later in the run
  override def afterAll(): Unit = {
    docs.unpersist(blocking = true)
    super.afterAll()
  }

  private lazy val corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(20260814L)
    val alphabets: IndexedSeq[IndexedSeq[String]] = IndexedSeq(
      ('a' to 'z').map(_.toString) :+ " ",
      "äöüßéèñçøå ".map(_.toString),
      "абвгдежзийкл ".map(_.toString),
      "一二三四五六七八九十汉字测试 ".map(_.toString),
      "αβγδεζηθικλμ ".map(_.toString),
      IndexedSeq("😀", "🎉", "🚀", "🧪", "👍🏽", "🇺🇳", " "),
      IndexedSeq("é", "ä", "ñ", " "),
      "אבגדהוזחטיכל ".map(_.toString),
      IndexedSeq(" ", "\t", "\n", " ", " ", "x"),
      IndexedSeq("", "", "z"))
    val structured = Seq(
      "", " ", "   ", "\t\n", "a", "ab", "abc", "abcd", "abcde",
      "a" * 5000, "ab " * 2000 + "tail",
      "😀😀😀😀😀", "😀😀😀😀", "一二三四五", "一二三四",
      "ééééé",
      "mixed 汉字 and ascii with emoji 🚀 and rtl אבגד end")
    val random = (1 to 150).map { _ =>
      val alpha = alphabets(rnd.nextInt(alphabets.length))
      val len = rnd.nextInt(200)
      (1 to len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    (structured ++ random).zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  private lazy val docs = corpus.toDF("doc_id", "text").cache()

  test("HashedNgrams == relational charNgrams hashing on adversarial text") {
    val cmp = docs.select(
      HashedNgrams.of(col("text"), 5).as("native"),
      sort_array(NgramJaccard.hashedNgrams(col("text"), 5)).as("hof"))
    assert(cmp.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("MinHashSignature == the explode + 64-min aggregate on adversarial text") {
    val withAB = docs
      .select(col("doc_id"), explode(NgramJaccard.charNgrams(col("text"), 5)).as("shingle"))
      .withColumn("m", md5(col("shingle").cast("binary")))
      .withColumn("a", conv(substring(col("m"), 1, 12), 16, 10).cast("long") % MinHashDedup.P)
      .withColumn("b", conv(substring(col("m"), 13, 12), 16, 10).cast("long") % MinHashDedup.P)
    val aggs = (0 until MinHashDedup.numHashes)
      .map(j => min((col("a") + lit(j.toLong) * col("b")) % MinHashDedup.P).as(s"s_$j"))
    val viaAgg = withAB.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until MinHashDedup.numHashes).map(j => col(s"s_$j")): _*).as("sig"))
    val native = docs
      .select(col("doc_id"),
        MinHashSignature.of(col("text"), 5, MinHashDedup.numHashes, MinHashDedup.P).as("sig"))
      .filter(size(col("sig")) > 0)
    assert(native.count() == viaAgg.count())
    assert(native.join(viaAgg.withColumnRenamed("sig", "sig2"), "doc_id")
      .filter(col("sig") =!= col("sig2")).count() == 0)
  }

  test("SimHashFingerprint == lane-packed aggregate on adversarial text") {
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val native = asMap(SimHash.fingerprints(docs))
    val relational = asMap(SimHash.fingerprintsRelational(docs))
    assert(native == relational)
  }

  test("RegexCounts == size(regexp_extract_all) on adversarial text") {
    val patterns = Seq("\\S+", TextStats.bpeishPattern, "[0-9]+", "\\p{Punct}")
    val c = graft.functions.RegexCounts.of(col("text"), patterns).as("counts")
    val builtins = patterns.zipWithIndex.map { case (p, i) =>
      size(regexp_extract_all(col("text"), lit(p), lit(0))).as(s"b_$i")
    }
    val cmp = docs.select(c +: builtins: _*)
    val bad = patterns.indices
      .map(i => cmp.filter(element_at(col("counts"), i + 1) =!= col(s"b_$i")).count())
    assert(bad.forall(_ == 0L), s"per-pattern mismatches: $bad")
  }

  test("TokenMemberCounts == regexp_extract_all + filter/isin on adversarial text") {
    val lists = Seq(
      (Seq("the", "a", "of", "and", "to", "in", "is", "it"), false),
      (Seq("the", "and", "of", "to", "is"), true),
      (Seq("el", "la", "de", "que", "es"), true),
      (Seq("le", "la", "de", "et", "est"), true))
    val native = graft.functions.TokenMemberCounts.of(col("text"), lists).as("counts")
    val builtins = lists.zipWithIndex.map { case ((words, lowerFirst), i) =>
      TextStats.tokenMemberCount(col("text"), words, lowerFirst).as(s"b_$i")
    }
    val cmp = docs.select(native +: builtins: _*)
    val bad = lists.indices
      .map(i => cmp.filter(element_at(col("counts"), i + 1) =!= col(s"b_$i")).count())
    assert(bad.forall(_ == 0L), s"per-list mismatches: $bad")
  }

  test("WordGramHashes == relational split/md5 formulation on adversarial text") {
    for (n <- Seq(2, 3)) {
      val cmp = docs.select(
        TextStats.hashedWordGramsCol(col("text"), n).as("native"),
        TextStats.hashedWordGramsRelational(col("text"), n).as("rel"))
      assert(cmp.filter(col("native") =!= col("rel")).count() == 0, s"n=$n")
    }
  }
}
