package graft

import graft.sources.{Bucketing, Writers}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the IO/layout family — the one lane the
  * r12 property sweep left fixture-only. The gated roundtrips
  * (q21/q40/q41/q46/q47/q38) pin exact outputs on the testdata; these
  * laws re-prove the WRITER SEMANTICS on generated tables and update
  * sets the fixtures can't explore (empty updates, all-partitions
  * touched, duplicate keys inside a batch, keys migrating partitions):
  *
  *  1. dynamic partition-overwrite ≡ full recompute: for ANY generated
  *     update slice, read-back = updates ∪ untouched-partition rows
  *     (the q40 operation as an algebraic identity, the d12/q57
  *     incremental pattern applied to the sink);
  *  2. partition-bounded MERGE ≡ full recompute of its documented rule:
  *     untouched partitions intact, touched partitions keep only
  *     non-matching keys, updates land exactly once;
  *  3. MERGE idempotence: the same batch applied twice ≡ once (the
  *     late-arriving-replay safety production pipelines rely on);
  *  4. layout writers move bytes, never rows: range-sorted, z-ordered,
  *     hive-partitioned, and bucketed writes all read back as the exact
  *     input multiset (layout is physical placement only).
  *
  * Every table derives from an explicit ScalaCheck Seed — a failure is
  * a permanent regression case, not a flake.
  */
class WritersPropertySpec extends AnyFunSuite with SharedSpark
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private lazy val root =
    java.nio.file.Files.createTempDirectory("graft_writersprop")

  override def afterAll(): Unit = {
    import java.nio.file.{Files, Path}
    import java.util.Comparator
    if (Files.exists(root))
      Files.walk(root).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    super.afterAll()
  }

  private def dir(name: String): String = {
    java.nio.file.Files.createDirectories(root)
    root.resolve(name).toString
  }

  private def samples[A](g: Gen[A], seed: Long, n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  /** (k, part, v): tiny key/partition domains so update sets collide
    * with the base constantly — duplicate keys, keys changing
    * partition, whole-partition replacement all occur by construction.
    */
  private def tableGen(maxRows: Int): Gen[List[(Long, Long, Long)]] =
    Gen.choose(0, maxRows).flatMap { n =>
      Gen.listOfN(n, for {
        k <- Gen.choose(1L, 25L)
        p <- Gen.choose(0L, 4L)
        v <- Gen.choose(0L, 999L)
      } yield (k, p, v))
    }

  private def df(rows: List[(Long, Long, Long)]): DataFrame =
    rows.toDF("k", "part", "v")

  // partition-column type inference reads hive-layout `part` back as int
  // — cast to the written type so the multiset compare sees values only
  private def readBack(path: String): Seq[(Long, Long, Long)] =
    spark.read.parquet(path)
      .select(col("k").cast("long"), col("part").cast("long"), col("v").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  private def multiset(s: Seq[(Long, Long, Long)]): Map[(Long, Long, Long), Int] =
    s.groupBy(identity).view.mapValues(_.size).toMap

  test("dynamic partition-overwrite ≡ full recompute, for any generated update slice") {
    val gen = for { base <- tableGen(60); upd <- tableGen(20) } yield (base, upd)
    for (((base, upd), i) <- samples(gen, seed = 190001L, n = 5).zipWithIndex
         if base.nonEmpty) {
      val path = dir(s"upsert_$i")
      Writers.partitionedParquet(df(base), path, "part")
      Writers.overwritePartitions(df(upd), path, "part")
      val touched = upd.map(_._2).toSet
      val expected = upd ++ base.filterNot(r => touched.contains(r._2))
      assert(multiset(readBack(path)) == multiset(expected),
        s"sample $i: dynamic overwrite diverged from the recompute " +
          s"(touched partitions $touched)")
    }
  }

  test("partition-bounded MERGE ≡ full recompute of its rule; untouched partitions never rewritten") {
    val gen = for { base <- tableGen(60); upd <- tableGen(20) } yield (base, upd)
    for (((base, upd), i) <- samples(gen, seed = 190101L, n = 5).zipWithIndex
         if base.nonEmpty && upd.nonEmpty) {
      val path = dir(s"merge_$i")
      Writers.partitionedParquet(df(base), path, "part")
      Writers.mergePartitioned(df(upd), path, "part", Seq("k"), dir(s"merge_stg_$i"))
      val touched = upd.map(_._2).toSet
      val updKeys = upd.map(_._1).toSet
      val expected =
        base.filterNot(r => touched.contains(r._2)) ++                       // untouched slices
          base.filter(r => touched.contains(r._2) && !updKeys.contains(r._1)) ++ // kept keys
          upd                                                                 // upserts
      assert(multiset(readBack(path)) == multiset(expected),
        s"sample $i: merge diverged from the recompute rule")
    }
  }

  test("MERGE idempotence: the same batch twice ≡ once") {
    val gen = for { base <- tableGen(60); upd <- tableGen(20) } yield (base, upd)
    for (((base, upd), i) <- samples(gen, seed = 190201L, n = 4).zipWithIndex
         if base.nonEmpty && upd.nonEmpty) {
      val p1 = dir(s"idem_once_$i"); val p2 = dir(s"idem_twice_$i")
      Writers.partitionedParquet(df(base), p1, "part")
      Writers.partitionedParquet(df(base), p2, "part")
      Writers.mergePartitioned(df(upd), p1, "part", Seq("k"), dir(s"idem_stg1_$i"))
      Writers.mergePartitioned(df(upd), p2, "part", Seq("k"), dir(s"idem_stg2_$i"))
      Writers.mergePartitioned(df(upd), p2, "part", Seq("k"), dir(s"idem_stg3_$i"))
      assert(multiset(readBack(p1)) == multiset(readBack(p2)),
        s"sample $i: replaying the same merge batch changed the table")
    }
  }

  test("layout writers change bytes, never the read-back multiset (range / z-order / hive / bucketed)") {
    for ((rows, i) <- samples(tableGen(60), seed = 190301L, n = 4).zipWithIndex
         if rows.nonEmpty) {
      val in = df(rows)
      val expected = multiset(rows)

      val pRange = dir(s"layout_range_$i")
      Writers.rangeSortedParquet(in, pRange, "v", numFiles = 3)
      assert(multiset(readBack(pRange)) == expected, s"sample $i: range layout lost rows")

      val pZ = dir(s"layout_z_$i")
      Writers.zOrderedParquet(in, pZ, "k", "v", numFiles = 3)
      assert(multiset(readBack(pZ)) == expected, s"sample $i: z-order layout lost rows")

      val pHive = dir(s"layout_hive_$i")
      Writers.partitionedParquet(in, pHive, "part")
      assert(multiset(readBack(pHive)) == expected, s"sample $i: hive layout lost rows")

      val table = s"graft_prop_bucketed_$i"
      Bucketing.writeBucketed(in, table, buckets = 4, key = "k")
      val back = spark.table(table).select(col("k"), col("part"), col("v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      assert(multiset(back) == expected, s"sample $i: bucketed layout lost rows")
    }
  }
}
