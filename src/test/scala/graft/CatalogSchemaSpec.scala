package graft

import graft.core.Catalog
import org.scalatest.funsuite.AnyFunSuite

/** Whole-catalog footer-drift canary — the r9 lesson generalized. The
  * events.ts footer silently moved from TIMESTAMP(NANOS) to
  * TIMESTAMP_NTZ micros between rounds and seven queries broke three
  * operators downstream; this pins the ARRIVAL schema of every table
  * (and the canonical post-normalization type for `events`) against
  * whatever testdata the suite actually runs on, so the next
  * driver-side regeneration that changes a type fails HERE, naming the
  * table and column, instead of surfacing as a DATATYPE_MISMATCH or a
  * silent value skew inside some query.
  *
  * The timestamp columns intentionally pin to `timestamp_ntz`: that is
  * today's footer (isAdjustedToUTC=false, MICROS), and every oracle
  * computes in the same naive frame under the pinned UTC session. If
  * they start arriving as LTZ or as raw longs, the right response is a
  * deliberate normalization decision (see [[graft.core.EventTime]]),
  * not a silent pass-through.
  */
class CatalogSchemaSpec extends AnyFunSuite with SharedSpark {

  private def ddl(df: org.apache.spark.sql.DataFrame): String =
    df.schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")

  private val expected = Map(
    "region"   -> "r_regionkey:int,r_name:string",
    "nation"   -> "n_nationkey:int,n_name:string,n_regionkey:int",
    "customer" -> "c_custkey:bigint,c_name:string,c_nationkey:int,c_acctbal:double,c_mktsegment:string",
    "supplier" -> "s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double",
    "part"     -> "p_partkey:bigint,p_name:string,p_brand:string,p_type:string,p_size:int,p_retailprice:double",
    "orders"   -> ("o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,o_totalprice:double," +
      "o_orderdate:timestamp_ntz,o_orderpriority:string"),
    "lineitem" -> ("l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_extendedprice:double,l_discount:double,l_tax:double," +
      "l_returnflag:string,l_linestatus:string,l_shipdate:timestamp_ntz"),
    // events is the normalized view: ts is canonical TimestampType no
    // matter which of the three arrival shapes the footer carries
    "events"   -> "event_id:bigint,ts:timestamp,user_id:bigint,event_type:string,value:double,props:string",
    "documents" -> "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint",
    "embeddings" -> "vec_id:bigint,embedding:array<float>,label:int")

  test("every catalog table arrives with the pinned schema on the live testdata") {
    val c = Catalog(spark, sf)
    val got = Map(
      "region" -> c.region, "nation" -> c.nation, "customer" -> c.customer,
      "supplier" -> c.supplier, "part" -> c.part, "orders" -> c.orders,
      "lineitem" -> c.lineitem, "events" -> c.events,
      "documents" -> c.documents, "embeddings" -> c.embeddings)
    for ((name, df) <- got)
      assert(ddl(df) == expected(name),
        s"table `$name` drifted from the pinned schema — decide the " +
          "normalization deliberately (see EventTime) before re-pinning")
  }
}
