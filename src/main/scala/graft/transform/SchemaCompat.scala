package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema-drift tolerance: the reference's defining ingest behavior.
  *
  * Its input CSVs come out of pandas merges, so the pipeline probes for
  * merge-residue column variants (`product_id` / `product_id_x` /
  * `product_id_y`,
  * `/root/reference/src/main/java/com/retail/ingestion/FullPreprocessingPipeline.java:137-145`),
  * derives `week_no` from `day` only when absent (`:157-162`), intersects
  * the demographic column list with what actually arrived (`:189-193`),
  * resolves requested columns case-insensitively
  * (`/root/reference/scripts/basket-analysis/MarketBasketAnalysis.java:101-117`),
  * and partitions output only when the partition column exists
  * (`FullPreprocessingPipeline.java:208-211,222-225`).
  *
  * All of it is driver-side schema arithmetic over `df.columns` — zero
  * data movement, so it costs the same at 100 TB as at 60k rows. Failure
  * is loud: a required column that no candidate satisfies throws with the
  * observed schema in the message (silent column guessing is how merge
  * residue corrupts a corpus invisibly).
  */
object SchemaCompat {

  /** Case-insensitive resolution of a logical name to the column as it
    * actually appears (first match in schema order).
    */
  def resolve(df: DataFrame, logical: String): Option[String] =
    df.columns.find(_.equalsIgnoreCase(logical))

  def resolveOrThrow(df: DataFrame, logical: String): String =
    resolve(df, logical).getOrElse(missing(df, Seq(logical)))

  /** Probe candidate spellings in priority order (merge-residue variants
    * like `product_id_x`), case-insensitively; first hit wins.
    */
  def probe(df: DataFrame, candidates: Seq[String]): Option[String] =
    candidates.iterator.flatMap(resolve(df, _)).nextOption()

  def probeOrThrow(df: DataFrame, candidates: Seq[String]): String =
    probe(df, candidates).getOrElse(missing(df, candidates))

  /** The reference's product-id probe order. */
  val productIdCandidates: Seq[String] = Seq("product_id", "product_id_x", "product_id_y")

  /** The requested columns that actually exist, in request order, under
    * their actual spellings (the demographic-intersection pattern).
    */
  def intersect(df: DataFrame, wanted: Seq[String]): Seq[String] =
    wanted.flatMap(resolve(df, _))

  /** Add `name` via `derive` only when no case-variant of it exists. */
  def ensureColumn(df: DataFrame, name: String, derive: DataFrame => Column): DataFrame =
    if (resolve(df, name).isDefined) df else df.withColumn(name, derive(df))

  /** The reference's conditional temporal derivation: `week_no` from
    * `day` (1-based 7-day buckets, `ceil(day / 7)`), with `day`
    * defaulting to 1 when absent too.
    */
  def ensureWeekNo(df: DataFrame): DataFrame = {
    val withDay = ensureColumn(df, "day", _ => lit(1).cast("int"))
    ensureColumn(withDay, "week_no",
      d => ceil(col(resolveOrThrow(d, "day")).cast("double") / 7).cast("long"))
  }

  /** Partition by `partitionCol` when (a case-variant of) it exists;
    * plain parquet otherwise — the reference's conditional partitionBy.
    */
  def writePartitionedIfPresent(df: DataFrame, path: String, partitionCol: String): Unit =
    resolve(df, partitionCol) match {
      case Some(actual) => graft.sources.Writers.partitionedParquet(df, path, actual)
      case None         => graft.sources.Writers.parquet(df, path)
    }

  private def missing(df: DataFrame, candidates: Seq[String]): Nothing =
    throw new IllegalArgumentException(
      s"none of ${candidates.mkString("[", ", ", "]")} present; " +
        s"schema has ${df.columns.mkString("[", ", ", "]")}")
}
