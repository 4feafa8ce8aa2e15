package graft

import graft.ext.SimHash
import org.scalatest.funsuite.AnyFunSuite

/** Pins the SimHash pigeonhole saturation guard (r19 verdict item 2).
  *
  * The r20 saturation probe (`bench_records/r20_simhash_saturation.json`)
  * measured the lane's collapse as mean block-bucket occupancy
  * λ = n / 2^blockWidth approaches the stop-bucket cap — recall 0.95 at
  * λ/cap = 0.64, 0.355 at 1.28, with the ratio (not n alone) governing.
  * `pairs()` now rejects corpora past λ > bound × cap with a named error
  * instead of silently returning a recall-dead pair set. This spec pins
  * the guard's arithmetic, its conf override, and the named errors on
  * junk conf values — using a NARROW block layout (maxHamming=15 → 16
  * blocks of 4 bits, space 2⁴=16) so a few hundred docs cross the
  * ceiling that needs millions at the default 16-bit layout.
  */
class SimHashSaturationSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val ConfKey = "spark.graft.simhash.maxOccupancyPerCap"

  // 500 docs over 4-bit blocks: λ = 500/16 = 31.25
  private def docs = spark.range(0, 500)
    .selectExpr("id AS doc_id",
      "concat('alpha beta gamma ', md5(cast(id AS string)), ' delta ', md5(cast(id*7 AS string))) AS text")

  test("past the measured ceiling pairs() fails loudly, naming the occupancy, the bound, and the remedies") {
    // λ=31.25 > 0.5 × cap=50 = 25 → named rejection
    val e = intercept[IllegalArgumentException](
      SimHash.pairs(docs, maxHamming = 15, bucketCap = 50))
    for (needle <- Seq("block space saturated", "occupancy", ConfKey,
        "MinHash", "r20_simhash_saturation"))
      assert(e.getMessage.contains(needle),
        s"guard error must carry '$needle', got: ${e.getMessage.take(400)}")
  }

  test("the guard is the ratio to the cap, not an absolute doc count") {
    // same corpus, cap 200: λ/cap = 0.16 — healthy, runs to completion
    assert(SimHash.pairs(docs, maxHamming = 15, bucketCap = 200).count() >= 0L)
    // and an uncapped run is exempt (no stop-bucket drop ⇒ no cap-induced
    // recall loss — the caller explicitly chose the cost)
    assert(SimHash.pairs(docs, maxHamming = 15, bucketCap = Int.MaxValue).count() >= 0L)
  }

  test("conf override is honored; junk conf values are named errors carrying the key") {
    assert(SimHash.resolvedMaxOccupancyPerCap(spark) == 0.5,
      "default must be the measured 0.5 knee")
    spark.conf.set(ConfKey, "2.5")
    try {
      assert(SimHash.resolvedMaxOccupancyPerCap(spark) == 2.5)
      // bound raised → the same over-ceiling corpus now passes
      assert(SimHash.pairs(docs, maxHamming = 15, bucketCap = 50).count() >= 0L)
    } finally spark.conf.unset(ConfKey)
    for (bad <- Seq("0", "-1", "junk", "NaN")) {
      spark.conf.set(ConfKey, bad)
      try {
        val e = intercept[IllegalArgumentException](
          SimHash.resolvedMaxOccupancyPerCap(spark))
        assert(e.getMessage.contains(ConfKey),
          s"error for '$bad' must name the conf key, got: ${e.getMessage.take(200)}")
      } finally spark.conf.unset(ConfKey)
    }
  }

  test("the default 16-bit layout admits gate-scale corpora untouched") {
    // 2000 docs at the default 4×16-bit layout: λ = 2000/65536 ≈ 0.03 —
    // three orders of magnitude inside the bound; d5/d6 gates stay green
    val small = spark.range(0, 2000)
      .selectExpr("id AS doc_id",
        "concat('w x y z ', md5(cast(id AS string))) AS text")
    assert(SimHash.pairs(small).count() >= 0L)
  }
}
