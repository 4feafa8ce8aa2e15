package graft

import graft.ext.TextStats
import graft.functions.{BpeTokenize, RollingHash, WindowRollingHashes}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unicode parity lane for the RELATIONAL text surface — the in-suite
  * half of the r13 unicode probe.
  *
  * The DuckDB oracle gate runs on the driver's documents corpus, which
  * is 100% ASCII, so byte/character/codepoint confusions hash-green
  * there and surface only on multilingual text — exactly what a real
  * 100 TB corpus is made of. The probe (scripts/gen_unicode_docs.py +
  * Verify + scripts/check.py against the generated corpus) caught four
  * such families: byte-gridded span windows read by character-based
  * substring, per-character oracle replays of byte folds, `\b`
  * word-boundary regexes with engine-dependent unicode semantics, and
  * `ascii()`/BLOB casts in oracle SQL. The cross-engine compare needs
  * driver-side DuckDB and stays in the dev loop; THIS spec pins the
  * engine-side halves of the fixed contracts on adversarial generated
  * text, so a regression fails in `sbt test` without the probe.
  */
class UnicodeParitySpec extends AnyFunSuite with SharedSpark
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  // the session is JVM-shared across suites; a cached corpus left behind
  // trips the global drain assertions (ConcurrentQuerySpec / the hygiene
  // soak) suites later in the run
  override def afterAll(): Unit = {
    docs.unpersist(blocking = true)
    super.afterAll()
  }

  /** Adversarial corpus: CJK, Cyrillic, Greek, Hebrew, combining marks,
    * astral-plane emoji (surrogate pairs), exotic whitespace, ligatures,
    * plus seeded random mixtures. Deterministic — failures reproduce.
    */
  private lazy val corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(20260815L)
    val alphabets: IndexedSeq[IndexedSeq[String]] = IndexedSeq(
      ('a' to 'z').map(_.toString) :+ " ",
      "äöüßéèñçøå ".map(_.toString),
      "абвгдежзийкл ".map(_.toString),
      "一二三四五六七八九十汉字测试 ".map(_.toString),
      "αβγδεζηθικλμ ".map(_.toString),
      IndexedSeq("😀", "🎉", "🚀", "🧪", "👍🏽", "🇺🇳", " "),
      "אבגדהוזחטיכל ".map(_.toString),
      IndexedSeq(" ", "\t", "\n", "x", "the ", "a ", "of "))
    val structured = Seq(
      "", " ", "a", "the", " the ", "a the of and to in is it",
      "😀😀😀😀😀", "一二三四五", "ééééé", "combining á é ó marks",
      "mixed 汉字 and ascii with emoji 🚀 and rtl אבגד end",
      "Turkish İstanbul ı I dotless", "ﬃ ligature ﬄ", "ǅungla titlecase",
      "the|a|of punct the,and.of", "el la de que es", "le la de et est",
      "a" * 500, ("the quick 汉 fox " * 20) + "tail")
    val random = (1 to 120).map { _ =>
      val alpha = alphabets(rnd.nextInt(alphabets.length))
      val len = rnd.nextInt(160)
      (1 to len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    (structured ++ random).zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  private lazy val docs = corpus.toDF("doc_id", "text").repartition(5).cache()

  test("window hashes == RollingHash of the character-substring they claim to hash") {
    // the span-dedup coherence contract: grid positions are CHARACTER
    // offsets, so the hash of window idx must equal the byte fold of the
    // character-based substring at pos = idx * stride — pre-fix, byte
    // gridding broke this on every multi-byte document
    val W = 7; val S = 3
    val grid = docs
      .select(col("doc_id"), col("text"),
        posexplode(WindowRollingHashes.of(col("text"), W, S)).as(Seq("idx", "h")))
      .withColumn("pos", col("idx") * S)
      .withColumn("ref", RollingHash(expr(s"substring(text, pos + 1, $W)")))
    assert(grid.count() > 500, "grid produced implausibly few windows")
    assert(grid.filter(col("h") =!= col("ref")).count() == 0)
  }

  test("window count matches the character-length arithmetic") {
    val W = 7; val S = 3
    val got = docs
      .select(col("doc_id"), size(WindowRollingHashes.of(col("text"), W, S)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for ((id, t) <- corpus) {
      val nc = t.codePointCount(0, t.length)
      val expected = if (nc < W) 0 else (nc - W) / S + 1
      assert(got(id) == expected, s"doc $id: ${got(id)} windows, expected $expected (nc=$nc)")
    }
  }

  test("BpeTokenize == driver byte-greedy replay on adversarial text") {
    val got = docs.select(col("doc_id"), graft.functions.BpeTokenCount.of(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent reference: greedy longest ASCII-vocab match over the
    // UTF-8 bytes, 1-byte fallback — the documented byte-level contract
    val vocabBytes = BpeTokenize.vocab.map(_.getBytes("UTF-8")).sortBy(-_.length)
    for ((id, t) <- corpus) {
      val bytes = t.getBytes("UTF-8")
      var pos = 0; var n = 0L
      while (pos < bytes.length) {
        val m = vocabBytes.find(v => v.length > 1 && pos + v.length <= bytes.length &&
          java.util.Arrays.equals(bytes, pos, pos + v.length, v, 0, v.length))
        pos += m.map(_.length).getOrElse(1)
        n += 1
      }
      assert(got(id) == n, s"doc $id: engine ${got(id)} tokens, replay $n")
    }
  }

  test("quality/langid marker counts == driver token-membership replay") {
    val q = TextStats.qualityScore(docs)
      .select(col("doc_id"), col("n_stopwords")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val l = TextStats.langId(docs)
      .select(col("doc_id"), col("en_score"), col("es_score"), col("fr_score")).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "it")
    val en = Set("the", "and", "of", "to", "is")
    val es = Set("el", "la", "de", "que", "es")
    val fr = Set("le", "la", "de", "et", "est")
    for ((id, t) <- corpus) {
      // the portable contract, re-implemented independently: ASCII-alnum
      // token runs, exact membership (stopwords) / lowered membership
      // (language markers) — no \b, no whole-text lower()
      val toks = "[A-Za-z0-9]+".r.findAllIn(t).toSeq
      assert(q(id) == toks.count(stop), s"doc $id stopwords")
      val lower = toks.map(_.toLowerCase(java.util.Locale.ROOT))
      assert(l(id) == ((lower.count(en), lower.count(es), lower.count(fr))), s"doc $id markers")
    }
  }

  test("token counts: n_chars is codepoints, tokens split on ASCII whitespace only") {
    val got = TextStats.tokenCounts(docs)
      .select(col("doc_id"), col("n_chars"), col("n_words")).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2)))).toMap
    for ((id, t) <- corpus) {
      val nc = t.codePointCount(0, t.length)
      val words = "\\S+".r.findAllIn(t).size
      assert(got(id) == ((nc, words)), s"doc $id: got ${got(id)}, expected ($nc, $words)")
    }
  }
}
