package graft.queries

import graft.core.Catalog
import graft.functions.Exact._
import graft.transform.{AsOfJoin, Cleaning, Dedup, Derive}
import graft.{analytics => an}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY §2.1–§2.8) as named queries over
  * the testdata star schema, each with a DuckDB oracle. Entries are
  * `name -> (query, Some(oracleSql))`.
  */
object RelationalQueries {

  private val repurchaseWindow = 30
  private val cohortSplitDay   = 1200

  def registry: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(

    // A1/A12 — multi-measure hash aggregate (TPC-H Q1 shape)
    "q1_agg" -> (
      ((s: SparkSession, d: String) => an.PricingSummary(Catalog(s, d).lineitem)),
      Some(an.PricingSummary.oracle)),

    // P1/P7/P9 — projection + conjunctive range predicates (Q6 shape)
    "q2_filter_project" -> (
      ((s: SparkSession, d: String) => Catalog(s, d).lineitem
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.04, 0.08) && col("l_quantity") < 10)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_discount"))),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND l_discount BETWEEN 0.04 AND 0.08 AND l_quantity < 10""".stripMargin)),

    // J1/J2 — star join with broadcast dims + aggregate
    "q3_join_agg" -> (
      ((s: SparkSession, d: String) => {
        val c = Catalog(s, d)
        an.RevenueByNation(c.lineitem, c.supplier, c.nation, c.region, "ASIA")
      }),
      Some(an.RevenueByNation.oracle("ASIA"))),

    // P3/P6/P10/F1/F2 — derived columns, when/otherwise, int day math
    "q4_derive" -> (
      ((s: SparkSession, d: String) => Derive.pricing(Catalog(s, d).lineitem)
        .select("l_orderkey", "l_linenumber", "net_price", "unit_price",
          "is_discounted", "disc_band", "day", "week_no", "day_of_week")),
      Some(Derive.pricingOracle)),

    // W1 — row_number window, first event per group
    "q5_window_first" -> (
      ((s: SparkSession, d: String) => an.FirstPurchase(Catalog(s, d).orders)),
      Some(an.FirstPurchase.oracle)),

    // A11/O1/O2 — top-K with deterministic tie-break
    "q6_topk" -> (
      ((s: SparkSession, d: String) => {
        val c = Catalog(s, d)
        an.TopProducts(c.lineitem, c.part, 25)
      }),
      Some(an.TopProducts.oracle(25))),

    // J4/J5/J6/A7 — range (repurchase-within-window) join, naive form
    "q7_repurchase" -> (
      ((s: SparkSession, d: String) => {
        val c = Catalog(s, d)
        an.Repurchase(c.orders, c.lineitem, repurchaseWindow)
      }),
      Some(an.Repurchase.oracle(repurchaseWindow))),

    // J4 at scale — band-join rewrite, same oracle as q7
    "q8_band_join" -> (
      ((s: SparkSession, d: String) => {
        val c = Catalog(s, d)
        an.Repurchase.bandJoin(c.orders, c.lineitem, repurchaseWindow)
      }),
      Some(an.Repurchase.oracle(repurchaseWindow))),

    // A2/A4 — RFM with countDistinct + global-max broadcast
    "q9_rfm" -> (
      ((s: SparkSession, d: String) => an.Rfm(Catalog(s, d).orders)),
      Some(an.Rfm.oracle)),

    // A9/F4 — cohort rates with expr() ratio
    "q10_cohort_rates" -> (
      ((s: SparkSession, d: String) => {
        val c = Catalog(s, d)
        an.Repurchase.cohortRates(
          an.Repurchase(c.orders, c.lineitem, repurchaseWindow), cohortSplitDay)
      }),
      Some(an.Repurchase.cohortOracle(repurchaseWindow, cohortSplitDay))),

    // P13 — deterministic keyed dedup (dropDuplicates replacement)
    "q11_dedup_keys" -> (
      ((s: SparkSession, d: String) => Dedup.dedupByKeys(
        Catalog(s, d).lineitem.select("l_partkey", "l_suppkey", "l_orderkey", "l_linenumber"),
        keys = Seq("l_partkey", "l_suppkey"),
        ordering = Seq("l_orderkey", "l_linenumber"))),
      Some("""SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber FROM (
             |  SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber,
             |    row_number() OVER (PARTITION BY l_partkey, l_suppkey
             |                       ORDER BY l_orderkey, l_linenumber) AS rn
             |  FROM lineitem) WHERE rn = 1""".stripMargin)),

    // P8/P11/P12 + J5 — left join with coalesce/na.fill defaults
    "q12_left_join_fill" -> (
      ((s: SparkSession, d: String) => {
        val c = Catalog(s, d)
        val masked = c.customer.withColumn(
          "acctbal_filled", when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
        val agg = c.orders.groupBy(col("o_custkey")).agg(
          count(lit(1)).as("order_count"), dsum(col("o_totalprice")).as("total_spent"))
        Cleaning.fillNumeric(
          masked.join(agg, col("c_custkey") === col("o_custkey"), "left"),
          Seq("acctbal_filled", "total_spent"), 0.0)
          .select(
            col("c_custkey"), col("acctbal_filled"),
            coalesce(col("order_count"), lit(0L)).as("order_count"), col("total_spent"))
      }),
      Some("""SELECT c_custkey,
             |  COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS acctbal_filled,
             |  COALESCE(o.cnt, 0) AS order_count,
             |  COALESCE(o.total, 0.0) AS total_spent
             |FROM customer LEFT JOIN (
             |  SELECT o_custkey, count(*) AS cnt,
             |    CAST(CAST(SUM(CAST(CASE WHEN o_totalprice IS NULL OR isnan(o_totalprice) OR abs(o_totalprice) > 99999999999999.9 THEN NULL ELSE o_totalprice END AS DECIMAL(18,4))) AS VARCHAR(64)) AS DOUBLE) AS total
             |  FROM orders GROUP BY 1) o ON c_custkey = o.o_custkey""".stripMargin)),

    // §2.7 — union / intersect / except (all DISTINCT semantics)
    "q13_set_ops" -> (
      ((s: SparkSession, d: String) => {
        val c = Catalog(s, d)
        val urgent   = c.orders.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("custkey"))
        val high     = c.orders.filter(col("o_orderpriority") === "2-HIGH").select(col("o_custkey").as("custkey"))
        val positive = c.customer.filter(col("c_acctbal") > 0).select(col("c_custkey").as("custkey"))
        val building = c.customer.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("custkey"))
        urgent.union(high).distinct().intersect(positive).except(building)
      }),
      Some("""SELECT custkey FROM (
             |  (SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |   UNION
             |   SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
             |  INTERSECT
             |  SELECT c_custkey FROM customer WHERE c_acctbal > 0
             |  EXCEPT
             |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""".stripMargin)),

    // left_semi join (EXISTS)
    "q14_semi_join" -> (
      ((s: SparkSession, d: String) => {
        val c = Catalog(s, d)
        c.customer
          .join(c.orders.filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
          .orderBy("c_mktsegment")
      }),
      Some("""SELECT c_mktsegment, count(*) AS n_customers FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // left_anti join (NOT EXISTS)
    "q15_anti_join" -> (
      ((s: SparkSession, d: String) => {
        val c = Catalog(s, d)
        c.customer
          .join(c.orders.filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
          .orderBy("c_mktsegment")
      }),
      Some("""SELECT c_mktsegment, count(*) AS n_customers FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // A5 — single-pass per-column non-null counts
    "q16_null_scan" -> (
      ((s: SparkSession, d: String) => Cleaning.nonNullCounts(Catalog(s, d).customer)),
      Some("""SELECT count(c_custkey) AS c_custkey, count(c_name) AS c_name,
             |  count(c_nationkey) AS c_nationkey, count(c_acctbal) AS c_acctbal,
             |  count(c_mktsegment) AS c_mktsegment, count(*) AS n_rows
             |FROM customer""".stripMargin)),

    // A4/A12 — global scalar aggregates in one row
    "q17_global_agg" -> (
      ((s: SparkSession, d: String) => {
        val o = Catalog(s, d).orders
        o.agg(
          max(Derive.dayIndex(col("o_orderdate"))).as("max_day"),
          min(Derive.dayIndex(col("o_orderdate"))).as("min_day"),
          count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_customers"))
      }),
      Some("""SELECT
             |  max(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) + 1) AS max_day,
             |  min(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) + 1) AS min_day,
             |  count(*) AS n_orders, count(DISTINCT o_custkey) AS n_customers
             |FROM orders""".stripMargin)),

    // R3 — basket building: collect_set canonicalized to a sorted string
    "q18_collect_set" -> (
      ((s: SparkSession, d: String) => Catalog(s, d).lineitem
        .groupBy(col("l_orderkey"))
        .agg(
          array_join(sort_array(collect_set(col("l_partkey"))), ",").as("basket"),
          size(collect_set(col("l_partkey"))).as("n_items"))),
      Some("""SELECT l_orderkey,
             |  array_to_string(list_sort(list(DISTINCT l_partkey)), ',') AS basket,
             |  CAST(count(DISTINCT l_partkey) AS INT) AS n_items
             |FROM lineitem GROUP BY l_orderkey""".stripMargin)),

    // A3 — pick-one-value-per-group, deterministic: min_by with a unique
    // ordering key (the engine's canonicalized form of the reference's
    // order-dependent first(col, ignoreNulls),
    // FullPreprocessingPipeline.java:195-203; SURVEY §7 hard part 4)
    "q27_pick_per_group" -> (
      ((s: SparkSession, d: String) => Catalog(s, d).orders
        .groupBy(col("o_custkey"))
        .agg(
          // pick among rows with a RECORDED priority: DuckDB's
          // arg_min/arg_max skip null values while Spark's min_by
          // faithfully returns the extreme row's null — nulling the
          // ordering key on null-priority rows makes Spark skip them
          // too (min_by ignores null keys), the portable semantics
          min_by(col("o_orderpriority"),
            when(col("o_orderpriority").isNotNull, col("o_orderkey"))).as("first_priority"),
          max_by(col("o_orderpriority"),
            when(col("o_orderpriority").isNotNull, col("o_orderkey"))).as("last_priority"),
          min(col("o_orderkey")).as("first_orderkey"))),
      Some("""SELECT o_custkey,
             |  arg_min(o_orderpriority, o_orderkey) AS first_priority,
             |  arg_max(o_orderpriority, o_orderkey) AS last_priority,
             |  min(o_orderkey) AS first_orderkey
             |FROM orders GROUP BY o_custkey""".stripMargin)),

    // F5/F7 — string split + explode + count
    "q19_explode_tokens" -> (
      ((s: SparkSession, d: String) => Catalog(s, d).part
        .select(explode(split(col("p_name"), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(50)),
      Some("""SELECT token, count(*) AS n FROM (
             |  SELECT unnest(string_split(p_name, ' ')) AS token FROM part)
             |WHERE length(token) > 0
             |GROUP BY token ORDER BY n DESC, token ASC LIMIT 50""".stripMargin)),

    // AS-OF join (purchase -> latest at-or-before click, per user): the
    // point-in-time attribution join the built-in operators lack,
    // formulated join-free (union + kind marker + one key shuffle +
    // running last(ignoreNulls) — see [[AsOfJoin.leftAsOf]] for why the
    // theta-join formulation is quadratic per key). The oracle is
    // DuckDB's native ASOF LEFT JOIN over a right side pre-reduced to
    // one row per (user, ts) with the max event_id — exactly the tie
    // the operator's (ts, kind, tie) sort order picks.
    "q48_asof_join" -> (
      ((s: SparkSession, d: String) => {
        val ev = Catalog(s, d).events
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("c_id"))
        AsOfJoin.leftAsOf(purchases, clicks, Seq("user_id"), "p_ts", "c_ts", "c_id")
          .withColumn("gap_us", unix_micros(col("p_ts")) - unix_micros(col("c_ts")))
      }),
      Some("""WITH p AS (
             |  SELECT user_id, event_id AS p_id, ts AS p_ts
             |  FROM events WHERE event_type = 'purchase'),
             |c AS (
             |  SELECT user_id, ts AS c_ts, max(event_id) AS c_id
             |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
             |SELECT p.user_id, p.p_id, p.p_ts, c.c_ts, c.c_id,
             |  epoch_us(p.p_ts) - epoch_us(c.c_ts) AS gap_us
             |FROM p ASOF LEFT JOIN c
             |  ON p.user_id = c.user_id AND p.p_ts >= c.c_ts""".stripMargin)),

    // J3 two-key equi left join + UNKNOWN-sentinel flag semantics — the
    // churn job's coupon-day pattern (distinct (household, day) event
    // days LEFT JOINed back on BOTH keys to flag the matching rows,
    // /root/reference/src/main/java/com/retail/ml/ChurnPrediction.java:91-117)
    // composed with the sentinel interplay of
    // FullPreprocessingPipeline.java:121-134: a filled 'UNKNOWN' must be
    // treated as missing by the downstream flag, not as a real value.
    // Here: promo-part purchase days flag orders; customers with
    // non-positive balance are un-enrolled -> segment 'UNKNOWN',
    // campaign_flag 0.
    "q35_coupon_flag" -> (
      ((s: SparkSession, d: String) => {
        val c = Catalog(s, d)
        val day = graft.transform.Derive.dayIndex(col("o_orderdate")).cast("int")
        val od = c.orders.select(col("o_orderkey"), col("o_custkey"), day.as("day"))
        // distinct event days: (household, day) of any PROMO-part purchase
        val promoDays = c.lineitem
          .join(broadcast(c.part.filter(col("p_type") === "PROMO").select(col("p_partkey"))),
            col("l_partkey") === col("p_partkey"))
          .join(c.orders.select(col("o_orderkey").as("po_orderkey"),
            col("o_custkey").as("cd_custkey"), day.as("coupon_day")),
            col("l_orderkey") === col("po_orderkey"))
          .select(col("cd_custkey"), col("coupon_day"))
          .distinct()
        val enrolled = c.customer.filter(col("c_acctbal") > 0)
          .select(col("c_custkey"), col("c_mktsegment"))
        od
          .join(promoDays,
            col("o_custkey") === col("cd_custkey") && col("day") === col("coupon_day"), "left")
          .join(broadcast(enrolled), col("o_custkey") === col("c_custkey"), "left")
          .withColumn("segment", coalesce(col("c_mktsegment"), lit("UNKNOWN")))
          .select(
            col("o_orderkey"), col("o_custkey"), col("day"),
            when(col("coupon_day").isNotNull, lit(1)).otherwise(lit(0)).as("coupon_flag"),
            col("segment"),
            when(col("segment") =!= "UNKNOWN", lit(1)).otherwise(lit(0)).as("campaign_flag"))
      }),
      Some("""WITH od AS (
             |  SELECT o_orderkey, o_custkey,
             |    CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) + 1 AS INT) AS day
             |  FROM orders),
             |promo AS (
             |  SELECT DISTINCT o.o_custkey AS cd_custkey,
             |    CAST(datediff('day', DATE '1995-01-01', CAST(o.o_orderdate AS DATE)) + 1 AS INT) AS coupon_day
             |  FROM lineitem l
             |  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
             |  JOIN orders o ON l.l_orderkey = o.o_orderkey),
             |enrolled AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 0)
             |SELECT od.o_orderkey, od.o_custkey, od.day,
             |  CASE WHEN pr.coupon_day IS NOT NULL THEN 1 ELSE 0 END AS coupon_flag,
             |  coalesce(e.c_mktsegment, 'UNKNOWN') AS segment,
             |  CASE WHEN coalesce(e.c_mktsegment, 'UNKNOWN') <> 'UNKNOWN' THEN 1 ELSE 0 END AS campaign_flag
             |FROM od
             |LEFT JOIN promo pr
             |  ON od.o_custkey = pr.cd_custkey AND od.day = pr.coupon_day
             |LEFT JOIN enrolled e ON od.o_custkey = e.c_custkey""".stripMargin)),

    // FULL OUTER join — the one join type not otherwise gated (inner,
    // left, semi, anti, as-of, interval, range all are). The orders
    // side is restricted to custkey > 100 so all three row regimes —
    // matched (custkeys 101..149 with events), left-only (custkeys
    // ≥ 150), right-only (user_ids ≤ 100) — appear in the gated
    // output, with a side-provenance label from the null pattern.
    "q62_full_outer" -> (
      ((s: SparkSession, d: String) => {
        val c = Catalog(s, d)
        val o = c.orders.filter(col("o_custkey") > 100)
          .groupBy(col("o_custkey").as("cust"))
          .agg(count(lit(1)).as("n_orders"))
        val e = c.events.filter(col("event_type") === "purchase")
          .groupBy(col("user_id").as("cust"))
          .agg(count(lit(1)).as("n_purchases"))
        o.join(e, Seq("cust"), "full_outer")
          .select(col("cust"), col("n_orders"), col("n_purchases"),
            (coalesce(col("n_orders"), lit(0L)) +
              coalesce(col("n_purchases"), lit(0L))).as("n_total"),
            when(col("n_orders").isNull, "events_only")
              .when(col("n_purchases").isNull, "orders_only")
              .otherwise("both").as("side"))
      }),
      Some("""WITH o AS (
             |  SELECT o_custkey AS cust, count(*) AS n_orders
             |  FROM orders WHERE o_custkey > 100 GROUP BY 1),
             |e AS (
             |  SELECT user_id AS cust, count(*) AS n_purchases
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
             |SELECT COALESCE(o.cust, e.cust) AS cust, n_orders, n_purchases,
             |  COALESCE(n_orders, 0) + COALESCE(n_purchases, 0) AS n_total,
             |  CASE WHEN n_orders IS NULL THEN 'events_only'
             |       WHEN n_purchases IS NULL THEN 'orders_only'
             |       ELSE 'both' END AS side
             |FROM o FULL OUTER JOIN e ON o.cust = e.cust""".stripMargin))
  )
}
