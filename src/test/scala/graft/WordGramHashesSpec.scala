package graft

import graft.ext.TextStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity pin: the native [[graft.functions.WordGramHashesExpr]]
  * must equal the relational `transform(split ...)/md5/conv` formulation
  * it replaced (which in turn is what every DuckDB oracle replays) —
  * token splitting, empty-token edge cases, gram order, duplicates, and
  * the 48-bit hash itself.
  */
class WordGramHashesSpec extends AnyFunSuite with SharedSpark {

  private val edgeTexts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b",                       // shorter than n=3 -> empty
    "a b c",                     // exactly n
    "",                          // empty text
    "   ",                       // spaces only (trim -> "" -> [""])
    "\tleading tab then words here",   // trim keeps the tab -> leading "" token
    "multiple   spaces\tand\nnewlines between tokens",
    "dup dup dup dup dup",       // duplicate grams kept
    "unicode éè 中文 tokens mixed in text",
    "trailing whitespace case \t\n",
    null)                        // NULL text -> [] (the relational twin's
                                 // when/otherwise form; pinned below)

  test("native word-gram hashes == relational md5/conv formulation (edge cases)") {
    import spark.implicits._
    for (n <- Seq(2, 3, 4)) {
      val df = edgeTexts.toDF("text")
      val got = df.select(TextStats.hashedWordGramsCol(col("text"), n)).collect()
        .map(_.getSeq[Long](0))
      val want = df.select(TextStats.hashedWordGramsRelational(col("text"), n)).collect()
        .map(_.getSeq[Long](0))
      for (((g, w), t) <- got.zip(want).zip(edgeTexts))
        assert(g == w, s"n=$n text='${Option(t).map(_.take(30)).getOrElse("<null>")}'")
    }
  }

  test("NULL text yields an empty array (not NULL) — matching the relational twin") {
    import spark.implicits._
    val row = Seq(Option.empty[String]).toDF("text")
      .select(TextStats.hashedWordGramsCol(col("text"), 3).as("h"))
      .head()
    assert(!row.isNullAt(0), "hashedWordGramsCol returned NULL for NULL text")
    assert(row.getSeq[Long](0).isEmpty)
  }

  test("native == relational on the real documents table") {
    val docs = core.Catalog(spark, sf).documents
    val diff = docs.select(
        TextStats.hashedWordGramsCol(col("text"), 3).as("a"),
        TextStats.hashedWordGramsRelational(col("text"), 3).as("b"))
      .where(not(col("a") === col("b")))
      .count()
    assert(diff == 0L)
  }

  test("hash value matches the documented conv(substring(md5)) contract") {
    import spark.implicits._
    // one hand-checkable row: the gram string is "a b c"
    val got = Seq("a b c").toDF("text")
      .select(TextStats.hashedWordGramsCol(col("text"), 3)).as[Seq[Long]].head()
    val want = Seq("a b c").toDF("g")
      .select(conv(substring(md5(col("g").cast("binary")), 1, 12), 16, 10).cast("long"))
      .as[Long].head()
    assert(got == Seq(want))
  }
}
