package graft.core

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** Typed table views (`Dataset[T]`) for module boundaries where
  * compile-time field checks help (SURVEY §1: DataFrame for dynamic
  * schemas, `Dataset[T]` with case-class encoders at boundaries —
  * replacing the reference's untyped `Dataset<Row>` everywhere plus its
  * one bean encoder, `ml/SegmentationModel.java:156`).
  *
  * Case classes mirror the testdata parquet schemas exactly; `as[T]`
  * validates them at analysis time, so a schema drift fails fast instead
  * of producing nulls downstream.
  */
object Typed {

  final case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
                            c_acctbal: Double, c_mktsegment: String)

  final case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                         o_totalprice: Double, o_orderdate: java.sql.Timestamp,
                         o_orderpriority: String)

  final case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                            l_linenumber: Int, l_quantity: Double,
                            l_extendedprice: Double, l_discount: Double, l_tax: Double,
                            l_returnflag: String, l_linestatus: String,
                            l_shipdate: java.sql.Timestamp)

  final case class Document(doc_id: Long, text: String, lang: String,
                            source: String, n_chars: Long)

  implicit val customerEnc: Encoder[Customer] = Encoders.product[Customer]
  implicit val orderEnc: Encoder[Order]       = Encoders.product[Order]
  implicit val lineitemEnc: Encoder[Lineitem] = Encoders.product[Lineitem]
  implicit val documentEnc: Encoder[Document] = Encoders.product[Document]

  def customers(spark: SparkSession, dir: String): Dataset[Customer] =
    Catalog(spark, dir).customer.as[Customer]
  def orders(spark: SparkSession, dir: String): Dataset[Order] =
    Catalog(spark, dir).orders.as[Order]
  def lineitems(spark: SparkSession, dir: String): Dataset[Lineitem] =
    Catalog(spark, dir).lineitem.as[Lineitem]
  def documents(spark: SparkSession, dir: String): Dataset[Document] =
    Catalog(spark, dir).documents.as[Document]
}
