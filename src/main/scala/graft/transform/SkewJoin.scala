package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * At 100 TB a handful of hot keys (one mega-customer, one boilerplate
  * document) can pin an entire sort-merge join on one task. AQE's skew
  * join CAN split a single-key partition (replicating the other side's
  * matching partition per chunk) — but its detection thresholds on
  * COMPRESSED shuffle bytes, and a hot key is maximally compressible (a
  * run of identical values), so a mega-key partition at many times the
  * median ROW count sits under the byte threshold and never splits:
  * measured in `bench_records/r17_skew_probe.json`, a 20M-row hot key
  * (16× median rows) left default-threshold AQE byte-identical to
  * skew-off, straggler and all. Salting is the row-oriented defense
  * that engages regardless: replicate the build side R times and
  * scatter the probe side across the replicas, turning one hot key into
  * R evenly-loaded keys (measured: straggler ÷3 at R=8 for 1.7× shuffle
  * on that probe; it also covers skewed shuffles AQE's join-split rule
  * can't touch, e.g. into aggregations). Deterministic here: the
  * probe-side salt is `pmod(xxhash64(probe columns...), R)`, not a
  * random draw, so results are reproducible run to run.
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
