package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Output sinks (SURVEY §2.1 S4-S9, S11).
  *
  * Partitioned parquet mirrors the reference's hive-style layouts
  * (`src/main/java/com/retail/ingestion/FullPreprocessingPipeline.java:175,208-211,222-225`
  * — partitionBy week_no / income_desc / department) which is what makes
  * later reads partition-prunable. Single-file outputs + stable rename
  * mirror `ProductRecommendation.java:79-108` (coalesce(1), glob the
  * part file, rename) — report-sized outputs only.
  */
object Writers {

  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)                                 // [S4]

  /** Hive-partitioned sink [S5]. The shuffle on the partition key is
    * deliberate: without it every task holding rows of week w opens its
    * own file under week_no=w, emitting up to shuffle.partitions × n_keys
    * part files (the classic small-files amplification — measured 16s vs
    * ~2s on the q21 roundtrip). Repartitioned, each key's rows land in one
    * task → one file per partition directory; a skewed key at 100 TB is
    * re-split by AQE or an explicit extra salt column, but never multiplies
    * file count by the task count.
    */
  def partitionedParquet(df: DataFrame, path: String, cols: String*): Unit =
    df.repartition(cols.map(col): _*)
      .write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Dynamic partition overwrite [beyond S5]: rewrite ONLY the partition
    * directories present in `df`, leaving every other partition intact —
    * the idempotent "upsert one day/week's slice" operation production
    * pipelines run for late-arriving fixes. The per-write OPTION (not the
    * session conf) keeps the static-overwrite default for everyone else;
    * static mode here would truncate the whole table to the new slice.
    * The same repartition-on-key discipline as [[partitionedParquet]]
    * bounds file counts.
    */
  def overwritePartitions(df: DataFrame, path: String, cols: String*): Unit =
    df.repartition(cols.map(col): _*)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(cols: _*).parquet(path)

  /** Range-sorted layout [beyond S5]: range-partition on `rangeCol` and
    * sort within partitions before writing, so each output file covers a
    * disjoint slice of the column and its parquet row-group min/max
    * stats let range predicates skip whole files/row groups at read time
    * — the third layout tool next to hive partitioning (prune by
    * directory, low-cardinality keys) and bucketing (exchange-free
    * equi-joins): the clustered layout for high-cardinality range-
    * filtered columns like timestamps. `numFiles` sizes the files, not
    * the parallelism of later readers.
    */
  def rangeSortedParquet(df: DataFrame, path: String, rangeCol: String,
                         numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(rangeCol))
      .sortWithinPartitions(col(rangeCol))
      .write.mode("overwrite").parquet(path)

  /** Z-value of two integer keys: their low `bits` bits interleaved
    * (a's bit i at position 2i+1, b's at 2i) — pure shift/mask Column
    * algebra, stays in whole-stage codegen. Keys must already be
    * non-negative and < 2^bits; at scale the usual prep is a rank- or
    * quantile-quantization of each dimension to that range.
    */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
             bits: Int = 16): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    val al = a.cast("long"); val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
  }

  /** Z-order (Morton-curve) layout [beyond S5]: cluster on the
    * interleaved bits of TWO keys so each output file covers a compact
    * rectangle in (colA, colB) space — parquet min/max stats then skip
    * files for predicates on EITHER or BOTH dimensions. This is the
    * layout tool range-sorting cannot give: a single-column sort makes
    * the second dimension's per-file ranges as wide as the table. The
    * z column orders the write and is then dropped — layout is pure
    * physical placement, schema unchanged.
    */
  def zOrderedParquet(df: DataFrame, path: String, colA: String, colB: String,
                      numFiles: Int, bits: Int = 16): Unit = {
    val z = zValue(col(colA), col(colB), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Partition-bounded row-level MERGE (upsert): update-matched +
    * insert-unmatched by `keyCols`, rewriting ONLY the partitions the
    * updates touch. The plain-parquet answer to what table formats call
    * MERGE INTO: reads back just the touched slices (semi-join on the
    * broadcast touched-partition list → partition pruning), anti-joins
    * out the rows being replaced, unions the updates, and
    * dynamic-overwrites those partitions — untouched partitions are
    * never read or written. The merged slice goes through a staging
    * directory because Spark (correctly) refuses to overwrite a path it
    * is lazily reading from; a real 100 TB deployment upgrades this to a
    * transactional table format, which changes atomicity, not the
    * dataflow.
    */
  def mergePartitioned(updates: DataFrame, path: String, partCol: String,
                       keyCols: Seq[String], staging: String): Unit = {
    val spark = updates.sparkSession
    import org.apache.spark.sql.functions.broadcast
    val touched = updates.select(col(partCol)).distinct()
    val slice = spark.read.parquet(path)
      .join(broadcast(touched), Seq(partCol), "left_semi")
    val kept = slice.join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
    kept.unionByName(updates.select(kept.columns.map(col).toIndexedSeq: _*))
      .write.mode("overwrite").parquet(staging)
    overwritePartitions(spark.read.parquet(staging), path, partCol)
  }

  def json(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)                                    // [S7]

  def textLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").text(path)                                    // [S9]

  /** Single part-file output renamed to a stable filename [S6+S11]. */
  def singleCsvFile(df: DataFrame, dir: String, fileName: String): String = {
    val spark = df.sparkSession
    val tmp = s"$dir/_tmp_${fileName.replace('.', '_')}"
    df.coalesce(1).write.mode("overwrite").options(CsvIo.faithful).csv(tmp)
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val part = fs.globStatus(new Path(s"$tmp/part-*"))(0).getPath
    val dest = new Path(s"$dir/$fileName")
    if (fs.exists(dest)) fs.delete(dest, false)
    fs.rename(part, dest)
    fs.delete(new Path(tmp), true)
    dest.toString
  }
}
