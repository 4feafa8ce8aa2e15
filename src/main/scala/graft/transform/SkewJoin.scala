package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * At 100 TB a handful of hot keys (one mega-customer, one boilerplate
  * document) can pin an entire sort-merge join on one task. AQE's skew
  * join splits oversized *partitions*, but when a single key exceeds a
  * partition the classic fix is salting: replicate the build side R times
  * and scatter the probe side across the replicas, turning one hot key
  * into R evenly-loaded keys. Deterministic here: the probe-side salt is
  * `pmod(xxhash64(probe columns...), R)`, not a random draw, so results
  * are reproducible run to run.
  *
  * Semantics: inner equi-join on `key`, identical to
  * `left.join(right, key)` — verified in tests.
  */
object SkewJoin {

  def innerSalted(probe: DataFrame, build: DataFrame, key: String,
                  saltBuckets: Int = 8, probeSaltCols: Seq[String] = Nil): DataFrame = {
    val saltSrc = if (probeSaltCols.nonEmpty) probeSaltCols else probe.columns.toSeq
    val salted = probe.withColumn(
      "__salt", pmod(xxhash64(saltSrc.map(col): _*), lit(saltBuckets)).cast("int"))
    val replicated = build
      .withColumn("__salt", explode(array((0 until saltBuckets).map(lit): _*)))
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }
}
