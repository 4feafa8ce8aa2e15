package graft

import graft.core.Catalog
import graft.ext.SimHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native SimHash expression against its lane-packed aggregate twin
  * (which the DuckDB oracle replays verbatim).
  */
class SimHashSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("native fingerprint == lane-packed aggregate formulation on real docs") {
    val docs = Catalog(spark, sf).documents.limit(200)
      .union(Seq((9001L, "  leading and   irregular\twhitespace ", "en", "t", 0L),
        (9002L, "", "en", "t", 0L), (9003L, "one", "en", "t", 3L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val native = SimHash.fingerprints(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val relational = SimHash.fingerprintsRelational(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(native == relational)
    assert(!native.contains(9002L))          // token-less doc dropped by both
    assert(native.contains(9003L))
  }

  test("wide 30-bit lanes (million-token layout) == 15-bit lanes == native") {
    val docs = Catalog(spark, sf).documents.limit(100)
    val narrow = SimHash.fingerprintsRelational(docs, laneBits = 15)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val wide = SimHash.fingerprintsRelational(docs, laneBits = 30)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val native = SimHash.fingerprints(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(wide == narrow && wide == native)
  }

  test("wide lanes raise the token guard at their own (higher) limit") {
    import spark.implicits._
    // 40k tokens: overflows 15-bit lanes (2^15 = 32768) but fits 30-bit
    val big = Seq((1L, Seq.fill(40000)("tok").mkString(" "))).toDF("doc_id", "text")
    // quarantined: the raise_error fires inside a real task, and its
    // QueryExecutionErrors.raiseError stack was the last expected throw
    // still landing in the suite log (r17 verdict item 6)
    val e = QuietExpectedThrows {
      intercept[Exception](SimHash.fingerprintsRelational(big, laneBits = 15).collect())
    }
    assert(e.getMessage.contains("lane overflow") ||
      Option(e.getCause).exists(c => Option(c.getMessage).exists(_.contains("lane overflow"))))
    val wide = SimHash.fingerprintsRelational(big, laneBits = 30).collect()
    assert(wide.length == 1 && wide.head.getString(1).length == 64)
  }

  test("token-count guard raises identically to the packed formulation's overflow") {
    val big = Seq((1L, Seq.fill(40000)("tok").mkString(" "))).toDF("doc_id", "text")
    val e = QuietExpectedThrows {
      intercept[Exception](SimHash.fingerprints(big).collect())
    }
    assert(e.getMessage.contains("lane overflow") ||
      e.getCause.getMessage.contains("lane overflow"))
  }
}
