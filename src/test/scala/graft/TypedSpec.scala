package graft

import graft.core.Typed
import org.scalatest.funsuite.AnyFunSuite

class TypedSpec extends AnyFunSuite with SharedSpark {

  test("typed datasets bind the parquet schemas and support typed ops") {
    val li = Typed.lineitems(spark, sf)
    val revenue = li
      .filter(l => l.l_quantity > 0)
      .map(l => l.l_extendedprice * (1 - l.l_discount))(
        org.apache.spark.sql.Encoders.scalaDouble)
      .reduce(_ + _)
    assert(revenue > 0)
    assert(Typed.customers(spark, sf).head().c_custkey >= 0)
    assert(Typed.documents(spark, sf).filter(_.n_chars > 0).count() > 0)
    assert(Typed.orders(spark, sf).head().o_totalprice > 0)
  }
}
