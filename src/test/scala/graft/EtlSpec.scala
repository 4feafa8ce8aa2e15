package graft

import graft.analytics.Etl
import graft.core.Catalog
import org.scalatest.funsuite.AnyFunSuite

/** The composed ETL job end to end: one cached base, four sinks,
  * conditional hive partitioning, readback counts consistent with the
  * registered queries (whose values the DuckDB oracle gates).
  */
class EtlSpec extends AnyFunSuite with SharedSpark {

  test("Etl.run writes four outputs with the reference's partition layout") {
    val dir = java.nio.file.Files.createTempDirectory("etl").toString
    val counts = Etl.run(spark, sf, dir)

    def partDirs(t: String, prefix: String) =
      new java.io.File(s"$dir/$t").listFiles().filter(_.getName.startsWith(prefix))
    // temporal partitioned by week_no, customer by c_mktsegment, item by
    // p_brand (all present in this schema -> partitioned branch taken)
    assert(partDirs("temporal", "week_no=").nonEmpty)
    assert(partDirs("customer", "c_mktsegment=").nonEmpty)
    assert(partDirs("item", "p_brand=").nonEmpty)
    // one file per partition dir (no small-files amplification)
    partDirs("temporal", "week_no=").foreach { d =>
      assert(d.listFiles().count(_.getName.startsWith("part-")) == 1,
        s"${d.getName} has multiple part files")
    }

    // readback counts match recomputing the outputs from the base
    val cat = Catalog(spark, sf)
    val base = Etl.cleanBase(cat.lineitem, cat.orders)
    assert(counts("transactions") == Etl.transactions(base).count())
    assert(counts("temporal") == Etl.weeklyDemand(base).count())
    assert(counts("customer") == Etl.customerProfile(base, cat.customer).count())
    assert(counts("item") == Etl.itemTable(base, cat.part).count())
    // the partition column survives the hive-layout roundtrip
    val weekly = spark.read.parquet(s"$dir/temporal")
    assert(weekly.columns.contains("week_no"))
    assert(weekly.count() == counts("temporal"))
  }

  test("cleanBase probes merge-residue product columns") {
    val cat = Catalog(spark, sf)
    // a frame carrying pandas-merge residue resolves to product_id_x
    val residue = cat.lineitem.withColumnRenamed("l_partkey", "product_id_x")
    val base = Etl.cleanBase(residue, cat.orders)
    assert(base.columns.contains("product_id"))
    assert(base.count() > 0)
  }
}
