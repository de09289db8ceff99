package graft.rel

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, QueryCatalog}

/** Multi-operator analytics pipelines in the TPC-H shapes (Q3 shipping
  * priority, Q5 local-supplier volume) plus window distribution
  * functions — the "whole queries" complement to the per-operator
  * catalog.
  *
  * Scale notes: both join pipelines put the fact table (lineitem) on
  * the probe side; customer/supplier/nation/region are broadcast so
  * the only fact shuffle is the final aggregation on a bounded key
  * space. Filters sit directly on the scans (pushed to parquet).
  */
object AnalyticsQueries extends QueryCatalog {

  /** TPC-H Q3 shape: revenue of not-yet-shipped parts of BUILDING
    * orders placed before the cutoff. Rounded before ordering in both
    * dialects so the LIMIT boundary agrees.
    */
  private val shippingPriority = Q(
    "q_tpch_q3_shipping_priority",
    """SELECT l_orderkey,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin
  ) { (s, dir) =>
    val cutoff = "1998-06-30 00:00:00"
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit(java.sql.Timestamp.valueOf(cutoff)))
      .join(Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf(cutoff))),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: revenue by nation where customer and supplier sit
    * in the same ASIA nation. Exercises a 6-table join with two keys on
    * one edge (l_suppkey = s_suppkey AND c_nationkey = s_nationkey).
    */
  private val localSupplierVolume = Q(
    "q_tpch_q5_local_supplier",
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name ORDER BY n_name""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** TPC-H Q10 shape: revenue lost to returned items per customer.
    * Customer broadcasts; the only fact shuffle is the aggregation on
    * (custkey, ...) — bounded by the customer count. */
  private val returnedItems = Q(
    "q_tpch_q10_returned_items",
    """SELECT c_custkey, c_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  round(c_acctbal, 2) AS acctbal
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        round(col("c_acctbal"), 2).as("acctbal"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q18 shape: large-quantity orders and their customers. The
    * HAVING-filtered per-order aggregate is computed FIRST (shrinks
    * lineitem to the big-order keys), then joins back — the join
    * inputs are pre-reduced, never the raw fact table twice. */
  private val largeOrders = Q(
    "q_tpch_q18_large_orders",
    """WITH big AS (
      |  SELECT l_orderkey, sum(l_quantity) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
      |)
      |SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
      |FROM big
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin
  ) { (s, dir) =>
    val big = Tables.lineitem(s, dir)
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("total_qty"))
      .filter(col("total_qty") > 150)
    big
      .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .select("c_custkey", "c_name", "o_orderkey", "o_totalprice",
        "total_qty")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q4 shape: order counts per priority where some line item
    * shipped after the order date — a correlated EXISTS that Spark
    * plans as a left-semi join with the correlation folded into the
    * join condition. Integer-only output: fully deterministic across
    * engines with no rounding contract. */
  private val orderPriority = Q(
    "q_tpch_q4_order_priority",
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders o
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey
      |    AND l.l_shipdate > o.o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  ) { (s, dir) =>
    val l = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    o.join(l, o("o_orderkey") === l("l_orderkey") &&
        l("l_shipdate") > o("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q12 shape (l_linestatus stands in for the corpus's missing
    * l_shipmode): among late-shipped lines, split order counts into
    * high/low priority classes per status. The conditional counts are
    * count(CASE WHEN..) in both dialects — count() of a nullable
    * expression stays BIGINT in DuckDB (an integer SUM would widen to
    * HUGEINT and break the driver hash). */
  private val priorityClass = Q(
    "q_tpch_q12_priority_class",
    """SELECT l_linestatus,
      |  count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 END) AS high_line_count,
      |  count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |    THEN 1 END) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate > o_orderdate
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin
  ) { (s, dir) =>
    val highs = Seq("1-URGENT", "2-HIGH")
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate"))
      .groupBy("l_linestatus")
      .agg(
        count(when(col("o_orderpriority").isin(highs: _*), 1))
          .as("high_line_count"),
        count(when(!col("o_orderpriority").isin(highs: _*), 1))
          .as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** TPC-H Q19 shape: disjunctive brand/size/quantity predicates. The
    * OR spans both tables so it cannot push down as-is; the derived
    * single-table conjunct `p_brand IN (...)` is stated explicitly (in
    * BOTH dialects — it does not change semantics) so the part scan
    * prunes before the join. That derived-predicate trick is the
    * standard Q19 plan fix and is what makes this survive a fact table
    * 1000× the dimension. */
  private val brandRevenue = Q(
    "q_tpch_q19_brand_revenue",
    """SELECT ((CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |    * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
      |    + 50) // 100) / 100.0 AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      |  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |          AND l_quantity BETWEEN 1 AND 20)
      |    OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
      |          AND l_quantity BETWEEN 10 AND 30)
      |    OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
      |          AND l_quantity BETWEEN 20 AND 40))""".stripMargin
  ) { (s, dir) =>
    val p = Tables.part(s, dir)
      .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
    val branch = (brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =>
      col("p_brand") === brand &&
        col("p_size").between(szLo, szHi) &&
        col("l_quantity").between(qLo, qHi)
    val revenue = (expr("(u + 50) div 100") / 100.0).as("revenue")
    Tables.lineitem(s, dir)
      .join(broadcast(p), col("p_partkey") === col("l_partkey"))
      .filter(branch("Brand#1", 1, 15, 1, 20) ||
        branch("Brand#2", 10, 30, 10, 30) ||
        branch("Brand#3", 20, 50, 20, 40))
      .agg(sum(scaledNet).as("u"))
      .select(revenue)
  }

  /** Exact integer-scaled revenue term: prices and discounts carry two
    * decimals, so round(x*100) recovers the exact integer in both
    * engines and the distributed sum is integer math — immune to the
    * float-addition-order ties that round(sum(double), 2) hits at
    * .xx5 boundaries (STATUS determinism rule). Even the final
    * 2-decimal rounding stays integer ((u+50) div 100 = half-up
    * cents): Spark's round() goes through the decimal string while
    * DuckDB rounds the binary double, so an EXACT .xx5 quotient
    * diverges between engines — only the last division may be float,
    * and it is the same IEEE op on the same integer in both. */
  private def scaledNet =
    round(col("l_extendedprice") * 100).cast("bigint") *
      round((lit(1) - col("l_discount")) * 100).cast("bigint")

  /** TPC-H Q21 shape: suppliers whose line item was the strictly-last
    * to ship within a multi-supplier order — a correlated EXISTS plus
    * NOT EXISTS, planned as a left-semi then left-anti join, both
    * keyed on l_orderkey (one shuffle key for both probes, no
    * cartesian anywhere). Ties at the max ship date count for every
    * tied supplier (NOT EXISTS strictly-later), which keeps the result
    * deterministic. */
  private val lastShipper = Q(
    "q_tpch_q21_last_shipper",
    """SELECT s_name, count(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |WHERE EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > l1.l_shipdate)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 25""".stripMargin
  ) { (s, dir) =>
    val l = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val l1 = l
    val l2 = l.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
    val l3 = l.select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"),
      col("l_shipdate").as("d3"))
    l1.join(l2, col("l_orderkey") === col("o2") &&
        col("l_suppkey") =!= col("s2"), "left_semi")
      .join(l3, col("l_orderkey") === col("o3") &&
        col("l_suppkey") =!= col("s3") &&
        col("d3") > col("l_shipdate"), "left_anti")
      .join(broadcast(Tables.supplier(s, dir)),
        col("s_suppkey") === col("l_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("s_name"))
      .limit(25)
  }

  /** TPC-H Q7 shape: cross-nation shipping volume per (supplier
    * nation, customer nation, year). lineitem⋈orders is the one real
    * shuffle; supplier/customer/nation broadcast, so the fact rows
    * shuffle once on the join key and once for the bounded-key agg. */
  private val volumeShipping = Q(
    "q_tpch_q7_volume_shipping",
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  ((CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |    * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
      |    + 50) // 100) / 100.0 AS revenue
      |FROM lineitem
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE n1.n_name <> n2.n_name
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  ) { (s, dir) =>
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("nk1"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("nk2"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.supplier(s, dir)),
        col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(s, dir)),
        col("c_custkey") === col("o_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("nk1"))
      .join(broadcast(n2), col("c_nationkey") === col("nk2"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(scaledNet).as("u"))
      .select(col("supp_nation"), col("cust_nation"), col("l_year"),
        (expr("(u + 50) div 100") / 100.0).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q6 shape: the forecast-revenue-change scan — a pure
    * filter+scalar-aggregate with NO join and NO group key. All three
    * predicates sit on lineitem columns, so the whole WHERE pushes into
    * the parquet scan (PushedFilters) and the aggregate is one partial
    * sum per partition + a single-row final merge: the cheapest
    * possible shape at any scale. Revenue is summed in integer units
    * (cents × discount-percent, see scaledNet) so the distributed sum
    * is order-insensitive. */
  private val forecastRevenue = Q(
    "q_tpch_q6_forecast_revenue",
    """SELECT ((CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |    * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
      |    + 50) // 100) / 100.0 AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.02 AND 0.04
      |  AND l_quantity < 24""".stripMargin
  ) { (s, dir) =>
    val lo = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1998-01-01 00:00:00")
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit(lo) && col("l_shipdate") < lit(hi) &&
        col("l_discount").between(0.02, 0.04) && col("l_quantity") < 24)
      .agg(
        sum(round(col("l_extendedprice") * 100).cast("bigint") *
          round(col("l_discount") * 100).cast("bigint")).as("u"),
        count(lit(1)).as("n_lines"))
      .select((expr("(u + 50) div 100") / 100.0).as("revenue"),
        col("n_lines"))
  }

  /** TPC-H Q13 shape: customer distribution by order count. The scale
    * plan aggregates the FACT side first (orders → one row per custkey,
    * bounded by the customer count) and only then left-joins customer,
    * so no raw order row ever rides through the join; the second
    * aggregate's key space is the max order count (tiny). Left join
    * keeps zero-order customers with c_count = 0. */
  private val custDist = Q(
    "q_tpch_q13_custdist",
    """WITH c_orders AS (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |SELECT c_count, count(*) AS custdist
      |FROM c_orders GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin
  ) { (s, dir) =>
    val perCust = Tables.orders(s, dir)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
    Tables.customer(s, dir).select("c_custkey")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** TPC-H Q14 shape: promo revenue share for one ship month. Both the
    * promo and total sums are integer-scaled, and the percentage itself
    * is computed as half-up integer BASIS POINTS ((10000·promo + tot/2)
    * div tot) — no round(double) anywhere, so the only float op is one
    * final division by 100.0, identical in both engines. Part is
    * broadcast; the fact table never shuffles (scalar aggregate). */
  private val promoRevenue = Q(
    "q_tpch_q14_promo_revenue",
    """WITH t AS (
      |  SELECT
      |    CAST(sum(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(round(l_extendedprice * 100) AS BIGINT)
      |        * CAST(round((1 - l_discount) * 100) AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS promo,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |      * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS tot
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00')
      |SELECT ((10000 * promo + tot // 2) // tot) / 100.0 AS promo_pct
      |FROM t""".stripMargin
  ) { (s, dir) =>
    val lo = java.sql.Timestamp.valueOf("1997-03-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1997-04-01 00:00:00")
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit(lo) && col("l_shipdate") < lit(hi))
      .join(broadcast(Tables.part(s, dir)),
        col("p_partkey") === col("l_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", scaledNet).otherwise(0L))
          .as("promo"),
        sum(scaledNet).as("tot"))
      .select((expr("(10000 * promo + tot div 2) div tot") / 100.0)
        .as("promo_pct"))
  }

  /** TPC-H Q15 shape: the top supplier by quarterly revenue, selected
    * with a scalar-subquery MAX over the per-supplier aggregate. The
    * revenue CTE is computed once from the fact table (one shuffle on
    * l_suppkey); its single-row MAX is broadcast back — no second fact
    * scan, no window over the whole table. Ties all surface (WHERE
    * total = max), keeping the result deterministic. */
  private val topSupplier = Q(
    "q_tpch_q15_top_supplier",
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |      * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS u
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, ((u + 50) // 100) / 100.0 AS total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE u = (SELECT max(u) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin
  ) { (s, dir) =>
    val lo = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1997-04-01 00:00:00")
    val revenue = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit(lo) && col("l_shipdate") < lit(hi))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(scaledNet).as("u"))
    revenue
      .join(broadcast(revenue.agg(max(col("u")).as("mx"))),
        col("u") === col("mx"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("s_suppkey") === col("supplier_no"))
      .select(col("s_suppkey"), col("s_name"),
        (expr("(u + 50) div 100") / 100.0).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q16 shape: how many distinct suppliers stock qualifying
    * parts (lineitem stands in for the corpus's missing partsupp). The
    * negated brand/type filters prune part BEFORE the join (broadcast);
    * count(DISTINCT) runs two-phase with partial distinct before the
    * shuffle. Integer-only output — no rounding contract at all. */
  private val supplierCnt = Q(
    "q_tpch_q16_supplier_cnt",
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 5, 10, 15, 20, 25)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
      |LIMIT 50""".stripMargin
  ) { (s, dir) =>
    val p = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 10, 15, 20, 25))
    Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
      .join(broadcast(p), col("p_partkey") === col("l_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"),
        col("p_size"))
      .limit(50)
  }

  /** TPC-H Q17 shape: revenue from small-quantity orders of one brand,
    * where "small" is relative to the part's own average quantity — a
    * correlated scalar subquery that the scale plan turns into a
    * pre-aggregated per-part average joined back to the filtered fact
    * rows (both sides keyed on partkey, one shuffle each). Quantities
    * are integral doubles, so avg = exact-sum / count is reproducible
    * across engines; revenue is exact cents divided by the constant
    * 7.0 — the same two IEEE ops in both dialects, no rounding. */
  private val smallQtyRevenue = Q(
    "q_tpch_q17_small_qty_revenue",
    """WITH avgq AS (
      |  SELECT l_partkey AS ap, avg(l_quantity) AS aq
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT (CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |    AS BIGINT) / 7.0) / 100.0 AS avg_yearly,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN avgq ON ap = l_partkey
      |WHERE p_brand = 'Brand#11' AND l_quantity < 0.2 * aq""".stripMargin
  ) { (s, dir) =>
    val l = Tables.lineitem(s, dir)
    val avgq = l.groupBy(col("l_partkey").as("ap"))
      .agg(avg(col("l_quantity")).as("aq"))
    l.join(broadcast(Tables.part(s, dir)
        .filter(col("p_brand") === "Brand#11")),
        col("p_partkey") === col("l_partkey"))
      .join(avgq, col("ap") === col("l_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("aq"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("bigint")).as("u"),
        count(lit(1)).as("n_lines"))
      .select((col("u") / 7.0 / 100.0).as("avg_yearly"), col("n_lines"))
  }

  /** TPC-H Q22 shape: well-funded customers with no urgent orders
    * (adapted: the corpus has no phone column, and every customer has
    * SOME order, so the anti-join excludes '1-URGENT' orders instead).
    * The positive-balance average is a scalar subquery computed in
    * exact integer cents (sum of cents is a BIGINT, avg = one double
    * division) and broadcast; the NOT EXISTS is a left-anti join on
    * the pre-filtered orders. Balance totals are half-up integer cents. */
  private val globalSales = Q(
    "q_tpch_q22_global_sales",
    """WITH cents AS (
      |  SELECT c_custkey, c_mktsegment,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal
      |  FROM customer),
      |thresh AS (
      |  SELECT CAST(CAST(sum(bal) AS BIGINT) AS DOUBLE) / count(*)
      |    AS avg_bal
      |  FROM cents WHERE bal > 0)
      |SELECT c_mktsegment, count(*) AS numcust,
      |  ((CAST(sum(bal) AS BIGINT) + 50) // 100) / 100.0 AS totacctbal
      |FROM cents, thresh
      |WHERE bal > avg_bal
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  ) { (s, dir) =>
    val cents = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("bigint").as("bal"))
    val thresh = cents.filter(col("bal") > 0)
      .agg((sum(col("bal")).cast("double") / count(lit(1))).as("avg_bal"))
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey")
    cents
      .crossJoin(broadcast(thresh))
      .filter(col("bal") > col("avg_bal"))
      .join(urgent, col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"), sum(col("bal")).as("u"))
      .select(col("c_mktsegment"), col("numcust"),
        (expr("(u + 50) div 100") / 100.0).as("totacctbal"))
      .orderBy("c_mktsegment")
  }

  /** TPC-H Q8 shape: a supplier nation's market share, by order year,
    * of one part type sold into one region — the deepest join tree in
    * the catalog (lineitem ⋈ part ⋈ supplier ⋈ orders ⋈ customer ⋈
    * nation ×2 ⋈ region). Every dimension broadcasts; the fact table
    * shuffles once for the orders join and once for the 5-row-key agg.
    * The share is half-up integer basis points of integer-cent sums —
    * the same all-integer ratio contract as Q14. */
  private val marketShare = Q(
    "q_tpch_q8_market_share",
    """WITH sales AS (
      |  SELECT year(o_orderdate) AS o_year,
      |    CAST(round(l_extendedprice * 100) AS BIGINT)
      |      * CAST(round((1 - l_discount) * 100) AS BIGINT) AS vol,
      |    n2.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN part ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA' AND p_type = 'PROMO')
      |SELECT o_year,
      |  ((10000 * CAST(sum(CASE WHEN supp_nation = 'NATION_2'
      |      THEN vol ELSE 0 END) AS BIGINT)
      |    + CAST(sum(vol) AS BIGINT) // 2)
      |    // CAST(sum(vol) AS BIGINT)) / 100.0 AS mkt_share_pct
      |FROM sales GROUP BY o_year ORDER BY o_year""".stripMargin
  ) { (s, dir) =>
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("ck_nk"), col("n_regionkey"))
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("sk_nk"), col("n_name").as("supp_nation"))
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).filter(col("p_type") === "PROMO")),
        col("p_partkey") === col("l_partkey"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(s, dir)),
        col("c_custkey") === col("o_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("ck_nk"))
      .join(broadcast(n2), col("s_nationkey") === col("sk_nk"))
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_2", scaledNet).otherwise(0L))
          .as("cn"),
        sum(scaledNet).as("tot"))
      .select(col("o_year"),
        (expr("(10000 * cn + tot div 2) div tot") / 100.0)
          .as("mkt_share_pct"))
      .orderBy("o_year")
  }

  /** Skew-safe aggregation through the driver gate: the salted
    * two-phase aggregate (Scale.saltedAgg) must equal the plain GROUP
    * BY — salting spreads each hot key over 16 partial groups and
    * re-merges, changing the shuffle profile but never the answer.
    * events.user_id is exactly the shape it exists for: 15 users
    * owning ~70 rows each at sf0.001 and ~7k at sf0.1. */
  private val saltedAgg = Q(
    "q_scale_salted_agg",
    """SELECT user_id, count(*) AS n, round(sum(value), 2) AS total
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  ) { (s, dir) =>
    Scale.saltedAgg(Tables.events(s, dir), Seq("user_id"), 16)(
      Seq(count(lit(1)).as("pn"), sum(col("value")).as("ps")),
      Seq(sum(col("pn")).as("n"), round(sum(col("ps")), 2).as("total")))
      .orderBy("user_id")
  }

  /** Key-skew profile — the diagnostic that tells a 100 TB operator
    * WHEN to reach for Scale.saltedAgg / AQE skew handling: per-key
    * row counts reduced to max / median / mean and the max-to-median
    * skew ratio per key column. Two bounded aggregations (per-key,
    * then 1 row per profiled column); the ratio is half-up integer
    * percent of exact integer counts. events.user_id (15 hot users)
    * vs lineitem.l_partkey (uniform) show the two regimes. */
  private val skewProfile = Q(
    "q_scale_skew_profile",
    """WITH u AS (
      |  SELECT 'events.user_id' AS key_col, count(*) AS n
      |  FROM events GROUP BY user_id),
      |p AS (
      |  SELECT 'lineitem.l_partkey' AS key_col, count(*) AS n
      |  FROM lineitem GROUP BY l_partkey),
      |k AS (SELECT * FROM u UNION ALL SELECT * FROM p)
      |SELECT key_col, count(*) AS n_keys,
      |  CAST(max(n) AS BIGINT) AS max_n,
      |  round(quantile_cont(n, 0.50), 2) AS p50_n,
      |  (100 * CAST(max(n) AS BIGINT)
      |    + CAST(round(quantile_cont(n, 0.50)) AS BIGINT) // 2)
      |    // CAST(round(quantile_cont(n, 0.50)) AS BIGINT) AS skew_pct
      |FROM k GROUP BY key_col ORDER BY key_col""".stripMargin
  ) { (s, dir) =>
    def perKey(df: org.apache.spark.sql.DataFrame, key: String,
        label: String) =
      df.groupBy(col(key)).agg(count(lit(1)).as("n"))
        .select(lit(label).as("key_col"), col("n"))
    val k = perKey(Tables.events(s, dir), "user_id", "events.user_id")
      .unionByName(
        perKey(Tables.lineitem(s, dir), "l_partkey", "lineitem.l_partkey"))
    k.groupBy("key_col")
      .agg(count(lit(1)).as("n_keys"),
        max(col("n")).as("max_n"),
        round(expr("percentile(n, 0.50)"), 2).as("p50_n"),
        expr("""(100 * max(n)
          | + CAST(round(percentile(n, 0.50)) AS BIGINT) div 2)
          | div CAST(round(percentile(n, 0.50)) AS BIGINT)"""
          .stripMargin).as("skew_pct"))
      .orderBy("key_col")
  }

  /** TPC-H Q2 shape: the minimum-cost supplier per part within one
    * region (the corpus has no partsupp, so the part-supplier cost
    * relation is derived from lineitem: unit cost = the cheapest
    * observed extendedprice/quantity per (part, supplier), in exact
    * integer cents via `div`). The correlated MIN subquery of the
    * original decorrelates to a per-part min aggregate joined back —
    * written identically in both dialects so the algebra matches the
    * plan Spark produces. Scale shape: the only big shuffles are the
    * (partkey, suppkey) cost aggregate and the partkey min/join;
    * supplier/nation/region/part all broadcast. */
  private val minCostSupplier = Q(
    "q_tpch_q2_min_cost_supplier",
    """WITH cost AS (
      |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
      |    min(CAST(round(l_extendedprice * 100) AS BIGINT)
      |        // CAST(l_quantity AS BIGINT)) AS unit_cents
      |  FROM lineitem GROUP BY 1, 2
      |), euro AS (
      |  SELECT partkey, suppkey, unit_cents, s_name, s_acctbal, n_name
      |  FROM cost
      |  JOIN supplier ON suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'
      |), best AS (
      |  SELECT partkey AS bpartkey, min(unit_cents) AS min_cents
      |  FROM euro GROUP BY 1
      |)
      |SELECT p_partkey, p_brand, p_type, s_name, n_name,
      |  round(s_acctbal, 2) AS acctbal, unit_cents
      |FROM part
      |JOIN euro ON p_partkey = partkey
      |JOIN best ON bpartkey = p_partkey AND unit_cents = min_cents
      |WHERE p_size <= 15 AND p_type = 'STANDARD'
      |ORDER BY acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin
  ) { (s, dir) =>
    val cost = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"))
      .agg(min(expr("CAST(round(l_extendedprice * 100) AS BIGINT)" +
        " div CAST(l_quantity AS BIGINT)")).as("unit_cents"))
    val euro = cost
      .join(broadcast(Tables.supplier(s, dir)),
        col("suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("partkey", "suppkey", "unit_cents", "s_name", "s_acctbal",
        "n_name")
    val best = euro.groupBy(col("partkey").as("bpartkey"))
      .agg(min(col("unit_cents")).as("min_cents"))
    euro
      .join(best, col("bpartkey") === col("partkey") &&
        col("unit_cents") === col("min_cents"))
      .join(broadcast(Tables.part(s, dir)
        .filter(col("p_size") <= 15 && col("p_type") === "STANDARD")),
        col("p_partkey") === col("partkey"))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("s_name"),
        col("n_name"), round(col("s_acctbal"), 2).as("acctbal"),
        col("unit_cents"))
      .orderBy(desc("acctbal"), col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q9 shape: product-line profit by supplier nation and order
    * year. Supply cost is proxied as half the part's retail price
    * (partsupp is absent); profit terms are exact integers in
    * 10^-4-dollar units — cents x discount-percent minus
    * retail-half-cents x quantity x 100 — summed as BIGINT and rounded
    * half-up to cents with ONE final float division, per the
    * determinism contract. Part/supplier/nation broadcast; the fact
    * shuffles once into the orders join (orderkey) and once for the
    * bounded (nation, year) aggregate. */
  private val productProfit = Q(
    "q_tpch_q9_product_profit",
    """SELECT n_name AS nation,
      |  CAST(year(o_orderdate) AS INT) AS o_year,
      |  ((CAST(sum(
      |      CAST(round(l_extendedprice * 100) AS BIGINT)
      |        * (100 - CAST(round(l_discount * 100) AS BIGINT))
      |      - CAST(round(p_retailprice * 50) AS BIGINT)
      |        * CAST(l_quantity AS BIGINT) * 100) AS BIGINT)
      |    + 50) // 100) / 100.0 AS profit
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON o_orderkey = l_orderkey
      |WHERE p_name LIKE '%bolt%'
      |GROUP BY 1, 2
      |ORDER BY nation, o_year DESC""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .filter(col("p_name").like("%bolt%"))),
        col("p_partkey") === col("l_partkey"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
      .withColumn("u", expr(
        """CAST(round(l_extendedprice * 100) AS BIGINT)
          |  * (100 - CAST(round(l_discount * 100) AS BIGINT))
          |- CAST(round(p_retailprice * 50) AS BIGINT)
          |  * CAST(l_quantity AS BIGINT) * 100""".stripMargin))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(sum(col("u")).as("su"))
      .select(col("nation"), col("o_year"),
        (expr("(su + 50) div 100") / 100.0).as("profit"))
      .orderBy(col("nation"), desc("o_year"))
  }

  /** TPC-H Q11 shape: the "important stock" cut — per-part value held
    * by one nation's suppliers, kept only when it exceeds a global
    * threshold computed as a scalar subquery over the same aggregate.
    * The original's fixed fraction is SF-dependent; here the cut is
    * scale-free (value > 2x the mean part value, i.e. u * n_parts >
    * 2 * total) so the query stays selective at every SF. All integer
    * arithmetic; the 1-row global aggregate broadcasts under the
    * comparison. */
  private val importantStock = Q(
    "q_tpch_q11_important_stock",
    """WITH v AS (
      |  SELECT l_partkey AS partkey,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS u
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_7'
      |  GROUP BY 1)
      |SELECT partkey AS p_partkey, ((u + 50) // 100) / 100.0 AS value
      |FROM v
      |WHERE u * (SELECT count(*) FROM v)
      |  > 2 * (SELECT CAST(sum(u) AS BIGINT) FROM v)
      |ORDER BY value DESC, p_partkey""".stripMargin
  ) { (s, dir) =>
    val v = Tables.lineitem(s, dir)
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)
        .filter(col("n_name") === "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("l_partkey").as("partkey"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("u"))
    v.crossJoin(broadcast(
        v.agg(count(lit(1)).as("n_parts"), sum(col("u")).as("total"))))
      .filter(col("u") * col("n_parts") > lit(2) * col("total"))
      .select(col("partkey").as("p_partkey"),
        (expr("(u + 50) div 100") / 100.0).as("value"))
      .orderBy(desc("value"), col("p_partkey"))
  }

  /** TPC-H Q20 shape: suppliers holding excess stock of a part family
    * — the nested-IN semi-join pyramid (supplier IN (pairs passing a
    * per-(supplier, part) quantity comparison over parts IN (name
    * LIKE ...))). "Availability" is total shipped quantity across all
    * years; "demand" is the 1998 slice; excess = total > 2x the 1998
    * quantity with 1998 activity present. Part filter broadcasts as a
    * semi join BEFORE the fact aggregate; the supplier probe is a
    * broadcast semi join of the tiny qualifying-pair set. */
  private val excessSuppliers = Q(
    "q_tpch_q20_excess_suppliers",
    """WITH shipped AS (
      |  SELECT l_suppkey, l_partkey,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
      |    CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      |      AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
      |      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS yr_qty
      |  FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part
      |                      WHERE p_name LIKE 'red %')
      |  GROUP BY 1, 2)
      |SELECT s_suppkey, s_name, n_name
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_suppkey IN (SELECT l_suppkey FROM shipped
      |                    WHERE yr_qty > 0 AND total_qty > 2 * yr_qty)
      |ORDER BY s_suppkey""".stripMargin
  ) { (s, dir) =>
    val lo = java.sql.Timestamp.valueOf("1998-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1999-01-01 00:00:00")
    val redParts = Tables.part(s, dir)
      .filter(col("p_name").like("red %")).select("p_partkey")
    val shipped = Tables.lineitem(s, dir)
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"),
        "leftsemi")
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(col("l_quantity").cast("bigint")).as("total_qty"),
        sum(when(col("l_shipdate") >= lit(lo) && col("l_shipdate") < lit(hi),
          col("l_quantity").cast("bigint")).otherwise(0L)).as("yr_qty"))
    val excess = shipped
      .filter(col("yr_qty") > 0 && col("total_qty") > lit(2) * col("yr_qty"))
      .select("l_suppkey")
    Tables.supplier(s, dir)
      .join(broadcast(excess), col("s_suppkey") === col("l_suppkey"),
        "leftsemi")
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name")
      .orderBy("s_suppkey")
  }

  /** Ordered-funnel analysis — the sequential-pattern query every
    * product-analytics engine ships (MATCH_RECOGNIZE's most common
    * use, expressed relationally so both engines agree): per user,
    * stage 1 = first 'view', stage 2 = first 'click' strictly after
    * stage 1, stage 3 = first 'purchase' strictly after stage 2;
    * output is each user's deepest stage and the stage timestamps.
    * Pure timestamp MINs — no float math, exact across engines.
    *
    * Scale shape: each stage is a pushed-filter scan (event_type
    * equality reaches parquet) aggregated on user_id, then a keyed
    * join back — three bounded (|users|-row) relations chained on one
    * key; no windows over the raw stream, no correlated per-row
    * subqueries. */
  private val funnelStages = Q(
    "q_funnel_stages",
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1
      |), s2 AS (
      |  SELECT e.user_id, s1.t1, min(e.ts) AS t2
      |  FROM events e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND e.ts > s1.t1
      |  GROUP BY 1, 2
      |), s3 AS (
      |  SELECT e.user_id, s2.t2, min(e.ts) AS t3
      |  FROM events e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      |  GROUP BY 1, 2
      |)
      |SELECT s1.user_id,
      |  CASE WHEN s3.t3 IS NOT NULL THEN 3
      |       WHEN s2.t2 IS NOT NULL THEN 2 ELSE 1 END AS stage,
      |  s1.t1, s2.t2, s3.t3
      |FROM s1
      |LEFT JOIN s2 ON s2.user_id = s1.user_id
      |LEFT JOIN s3 ON s3.user_id = s1.user_id
      |ORDER BY s1.user_id""".stripMargin
  ) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1.select(col("user_id").as("u1"), col("t1")),
        col("user_id") === col("u1") && col("ts") > col("t1"))
      .groupBy(col("user_id"), col("t1"))
      .agg(min("ts").as("t2"))
      .select(col("user_id"), col("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2.select(col("user_id").as("u2"), col("t2")),
        col("user_id") === col("u2") && col("ts") > col("t2"))
      .groupBy(col("user_id"), col("t2"))
      .agg(min("ts").as("t3"))
      .select(col("user_id"), col("t3"))
    s1
      .join(s2.select(col("user_id").as("ju2"), col("t2")),
        col("user_id") === col("ju2"), "left")
      .join(s3.select(col("user_id").as("ju3"), col("t3")),
        col("user_id") === col("ju3"), "left")
      .select(col("user_id"),
        when(col("t3").isNotNull, 3)
          .when(col("t2").isNotNull, 2).otherwise(1).as("stage"),
        col("t1"), col("t2"), col("t3"))
      .orderBy("user_id")
  }

  /** Rolling 7-day distinct users (the rolling-MAU/WAU shape). COUNT
    * (DISTINCT) isn't a window function in either engine, so the
    * rolling set is built relationally: distinct (user, day) pairs,
    * a day spine joined to the trailing 7-day range, then an exact
    * distinct count per day — integer-only output.
    *
    * Scale shape: the raw stream collapses to |users| x |days| pairs
    * FIRST (one pushed-projection aggregate); each pair then explodes
    * map-side into the <=7 window days it contributes to (the
    * equi-join form of the trailing range — the oracle spells the
    * same semantics as a range join, Spark never runs one), and a
    * broadcast semi join against the ~|days|-row observed-day spine
    * drops the phantom days past the last observation. One distinct
    * aggregate on (day, user), never a nested-loop pair build. */
  private val rollingDistinct = Q(
    "q_window_rolling_distinct",
    """WITH du AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS d FROM events
      |), days AS (
      |  SELECT DISTINCT d FROM du
      |)
      |SELECT days.d AS day,
      |  count(DISTINCT du.user_id) AS active_7d
      |FROM days
      |JOIN du ON du.d <= days.d
      |  AND du.d >= days.d - INTERVAL 6 DAY
      |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, dir) =>
    val du = Tables.events(s, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .distinct()
    val days = du.select(col("d").as("day")).distinct()
    du
      .select(col("user_id"), explode(expr(
        "sequence(d, d + INTERVAL 6 DAY, INTERVAL 1 DAY)")).as("day"))
      .join(broadcast(days), Seq("day"), "leftsemi")
      .groupBy("day")
      .agg(countDistinct("user_id").as("active_7d"))
      .orderBy("day")
  }

  /** Cohort retention matrix — users grouped by first-activity day
    * (the cohort), counted again at each later activity-day offset:
    * retention[cohort, offset] = |users of that cohort active exactly
    * offset days after their first day|. The canonical growth-
    * analytics query; exact integer counts, day offsets via epoch-day
    * subtraction so both engines agree.
    *
    * Scale shape: first-day per user is one aggregate on user_id; the
    * join back is keyed on user_id against the bounded distinct
    * (user, day) relation; the output matrix is |days| x |offsets|.
    * Offsets capped at 7 to keep the driver-visible result small. */
  private val cohortRetention = Q(
    "q_cohort_retention",
    """WITH du AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS d FROM events
      |), c AS (
      |  SELECT user_id, min(d) AS cohort FROM du GROUP BY 1
      |)
      |SELECT c.cohort,
      |  CAST(date_diff('day', c.cohort, du.d) AS INT) AS offset_days,
      |  count(*) AS users
      |FROM c JOIN du ON du.user_id = c.user_id
      |WHERE date_diff('day', c.cohort, du.d) <= 7
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  ) { (s, dir) =>
    val du = Tables.events(s, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .distinct()
    val c = du.groupBy("user_id").agg(min("d").as("cohort"))
    c.join(du.select(col("user_id").as("u2"), col("d")),
        col("user_id") === col("u2"))
      .withColumn("offset_days", datediff(col("d"), col("cohort")))
      .filter(col("offset_days") <= 7)
      .groupBy("cohort", "offset_days")
      .agg(count(lit(1)).as("users"))
      .orderBy("cohort", "offset_days")
  }

  /** Window distribution functions: ntile / percent_rank / cume_dist
    * over a total per-partition order (price + unique key tiebreaks, so
    * every rank is deterministic in both engines).
    */
  private val windowDistribution = Q(
    "q_window_distribution",
    """SELECT l_orderkey, l_linenumber, l_returnflag,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_returnflag
      |             ORDER BY l_extendedprice, l_orderkey, l_linenumber)
      |ORDER BY l_returnflag, l_extendedprice, l_orderkey, l_linenumber
      |LIMIT 2000""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("l_returnflag")
      .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_extendedprice"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .orderBy("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
      .limit(2000)
      .drop("l_extendedprice")
  }

  override def all: Seq[Q] =
    Seq(shippingPriority, localSupplierVolume, returnedItems,
      largeOrders, orderPriority, priorityClass, brandRevenue,
      lastShipper, volumeShipping, forecastRevenue, custDist,
      promoRevenue, topSupplier, supplierCnt, smallQtyRevenue,
      globalSales, marketShare, minCostSupplier, productProfit,
      importantStock, excessSuppliers, funnelStages, rollingDistinct,
      cohortRetention, saltedAgg, skewProfile, windowDistribution)
}
