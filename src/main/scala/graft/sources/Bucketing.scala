package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed persistent tables — the 100 TB shuffle-elimination layout.
  *
  * A fact-fact equi-join (e.g. the ETL's lineitem x orders on the order
  * key) shuffles BOTH sides every run. Bucketing pays that shuffle once
  * at write time: both tables hash-partitioned into the same number of
  * buckets on the join key (and sorted within buckets), so every later
  * join on that key plans with NO exchange on either side — at 100 TB
  * this turns the nightly pipeline's dominant cost into a one-time
  * layout decision. BucketingSpec pins the exchange-free plan.
  *
  * Beyond the reference (its pipeline re-shuffles per run); the
  * conditional-partitionBy sinks ([[Writers.partitionedParquet]]) solve
  * the orthogonal problem of partition-PRUNED scans.
  */
object Bucketing {

  /** Write `df` as a bucketed, in-bucket-sorted managed parquet table.
    *
    * Overwrite must also cover a location left behind by a PREVIOUS
    * session: the local metastore is ephemeral but the warehouse dir is
    * not, and saveAsTable refuses to create a table over an orphaned
    * location (LOCATION_ALREADY_EXISTS) that DROP TABLE cannot see.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir")),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Equi-join two same-bucket-count tables on their bucket keys —
    * plans exchange-free when the layouts match.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(left).join(spark.table(right), col(leftKey) === col(rightKey))
  }
}
