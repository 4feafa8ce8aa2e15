package graft

import graft.core.Catalog
import graft.ext.SpanDedup
import graft.functions.{RollingHash, WindowRollingHashes}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Span-level dedup: the native grid-window hash expression against its
  * from-scratch [[RollingHash]] twin, and the pair semantics (grid
  * alignment, same-doc exclusion, orientation) on planted spans.
  */
class SpanDedupSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val W = 40
  private val S = 8

  test("WindowRollingHashes == RollingHash of each grid substring on real docs") {
    val grid = Catalog(spark, sf).documents
      .select(col("doc_id"), col("text"), length(col("text")).as("len"),
        posexplode(WindowRollingHashes.of(col("text"), W, S)).as(Seq("idx", "h")))
      .withColumn("pos", col("idx") * S)
      .withColumn("ref", RollingHash(expr(s"substring(text, pos + 1, $W)")))
    assert(grid.filter(col("h") =!= col("ref")).count() == 0)
    assert(grid.count() > 1000, "grid produced implausibly few windows")
    // emission count: floor((len - W) / S) + 1 grid positions per doc
    val counts = grid.groupBy(col("doc_id"), col("len")).count()
      .filter(col("count") =!= (floor((col("len") - W) / S) + 1))
    assert(counts.count() == 0)
  }

  test("texts shorter than the window produce an empty hash array") {
    val out = Seq((1L, ""), (2L, "x" * (W - 1)), (3L, "y" * W))
      .toDF("doc_id", "text")
      .select(col("doc_id"), size(WindowRollingHashes.of(col("text"), W, S)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(1L) == 0 && out(2L) == 0 && out(3L) == 1)
  }

  test("planted spans: grid-aligned pairs found, off-grid needs stride 1, same-doc excluded") {
    val span = "THE-QUICK-BROWN-FOX-JUMPS-OVER-LAZY-DOGS" // exactly 40 chars
    assert(span.length == W)
    val docs = Seq(
      (1L, span + "aaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),         // span at 0 (on grid)
      (2L, "bbbbbbbbbbbbbbbb" + span + "bbbb"),              // span at 16 (on grid)
      (3L, "ccccccccccccccccccc" + span),                    // span at 19 (OFF grid for S=8)
      (4L, span + "-" + span)                                // same-doc repeat: 0 on grid, 41 off
    ).toDF("doc_id", "text")

    val atS8 = SpanDedup.spanPairs(docs, W, S, 20)
      .select("doc_a", "pos_a", "doc_b", "pos_b").as[(Long, Int, Long, Int)]
      .collect().toSet
    // cross-doc grid-aligned occurrences pair up, oriented doc_a < doc_b
    assert(atS8.contains((1L, 0, 2L, 16)))
    assert(atS8.contains((1L, 0, 4L, 0)) && atS8.contains((2L, 16, 4L, 0)))
    // doc 3's occurrence is off the stride-8 grid — invisible at the scale stride
    assert(!atS8.exists(p => p._1 == 3L || p._3 == 3L))
    // the same-doc repeat in doc 4 never emits a pair
    assert(!atS8.exists(p => p._1 == p._3))

    // stride 1 (the exhaustive form) sees doc 3 and doc 4's second copy
    val atS1 = SpanDedup.spanPairs(docs, W, 1, 20)
      .select("doc_a", "pos_a", "doc_b", "pos_b").as[(Long, Int, Long, Int)]
      .collect().toSet
    assert(atS1.contains((1L, 0, 3L, 19)))
    assert(atS1.contains((1L, 0, 4L, 41)))
  }

  test("removeSpans strips later occurrences, merges overlaps, passes untouched docs through") {
    val span = "THE-QUICK-BROWN-FOX-JUMPS-OVER-LAZY-DOGS" // exactly 40 chars
    val filler = "f" * 24
    val docs = Seq(
      (1L, span + filler),                 // first holder: KEPT intact
      (2L, "bbbbbbbb" + span + "bb"),      // later holder at pos 8: span removed
      // doc 3 repeats doc 1's first 48 chars = two overlapping grid
      // windows (pos 0 and pos 8) -> ONE merged removal interval [0, 48)
      (3L, span + filler.take(8) + "ccc"),
      (4L, "no duplicated content here at all")
    ).toDF("doc_id", "text")
    val out = SpanDedup.removeSpans(docs, W, S, 20)
      .select("doc_id", "text", "n_spans_removed", "removed_chars")
      .as[(Long, String, Int, Int)].collect().map(r => r._1 -> r).toMap
    assert(out.size == 4, "every input doc must come back out")
    assert(out(1L)._2 == span + filler && out(1L)._3 == 0 && out(1L)._4 == 0)
    assert(out(2L)._2 == "bbbbbbbb" + "bb" && out(2L)._3 == 1 && out(2L)._4 == 40)
    assert(out(3L)._2 == "ccc" && out(3L)._3 == 1 && out(3L)._4 == 48)
    assert(out(4L)._2 == "no duplicated content here at all" && out(4L)._3 == 0)
  }

  test("bucket cap drops boilerplate spans shared by too many grid positions") {
    val span = "Z" * W
    val docs = (1L to 30L).map(i => (i, span + i.toString)).toDF("doc_id", "text")
    // 30 grid occurrences of the same span > cap 20 -> the bucket is dropped
    assert(SpanDedup.spanPairs(docs, W, S, 20).count() == 0)
    // raising the cap re-admits it: C(30,2) cross-doc pairs
    assert(SpanDedup.spanPairs(docs, W, S, 64).count() == 30L * 29L / 2L)
  }
}
