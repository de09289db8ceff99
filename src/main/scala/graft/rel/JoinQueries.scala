package graft.rel

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, QueryCatalog}

/** SURVEY.md §2c join operators (J1–J18) plus the diff_utils.py port.
  *
  * Scale notes: dimension sides (region/nation/customer/supplier) are
  * explicitly `broadcast()` — at 100 TB the fact side never shuffles for
  * these joins. The self-joins on `events` key on user_id, so the
  * shuffle is co-partitioned on the join key; AQE handles skew.
  */
object JoinQueries extends QueryCatalog {

  /** J1: chained LEFT joins onto dimensions
    * (ref file_summary_utils.py:64-68, two LEFT JOINs). */
  private val leftChain = Q(
    "q_join_left_chain",
    """SELECT o.o_orderkey, c.c_name, n.n_name
      |FROM orders o
      |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |ORDER BY o.o_orderkey""".stripMargin
  ) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .select(o("o_orderkey"), c("c_name"), n("n_name"))
      .orderBy("o_orderkey")
  }

  /** J2: inner join USING(key) (ref file_summary_utils.py:122-123). */
  private val innerUsing = Q(
    "q_join_inner_using",
    """SELECT c_custkey, c_name, n_name
      |FROM customer JOIN nation ON customer.c_nationkey = nation.n_nationkey
      |ORDER BY c_custkey""".stripMargin
  ) { (s, dir) =>
    // USING-style: Tables share no column name, so rename to align.
    val c = Tables.customer(s, dir).withColumnRenamed("c_nationkey", "nationkey")
    val n = Tables.nation(s, dir).withColumnRenamed("n_nationkey", "nationkey")
    c.join(broadcast(n), Seq("nationkey"))
      .select("c_custkey", "c_name", "n_name")
      .orderBy("c_custkey")
  }

  /** J9: left-semi — customers having at least one open order. */
  private val semi = Q(
    "q_join_semi",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin
  ) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** J5: left-anti (ref diff_utils.py:58-71 indicator-trick, native here) —
    * parts never shipped. */
  private val anti = Q(
    "q_join_anti",
    """SELECT p_partkey, p_name FROM part p
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
      |ORDER BY p_partkey""".stripMargin
  ) { (s, dir) =>
    val p = Tables.part(s, dir)
    // pre-project + dedup the probe side: anti-join semantics only need
    // the distinct key set, and (partkey) is ~40× narrower than the
    // lineitem row — the shuffle moves one int column instead of the
    // fact table
    val lKeys = Tables.lineitem(s, dir).select("l_partkey").distinct()
    p.join(lKeys, p("p_partkey") === lKeys("l_partkey"), "left_anti")
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")
  }

  /** J8: interval/theta join — events within 1 hour after a purchase by
    * the same user (equi part on user_id keeps the shuffle keyed). */
  private val interval = Q(
    "q_join_interval",
    """SELECT p.event_id AS purchase_id, count(*) AS events_within_hour
      |FROM events p JOIN events e
      |  ON p.user_id = e.user_id
      | AND e.ts >= p.ts AND e.ts < p.ts + INTERVAL 1 HOUR
      |WHERE p.event_type = 'purchase'
      |GROUP BY p.event_id
      |ORDER BY p.event_id""".stripMargin
  ) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
    val e = ev.select(col("user_id").as("e_user"), col("ts").as("e_ts"))
    p.join(e, col("p_user") === col("e_user")
        && col("e_ts") >= col("p_ts")
        && col("e_ts") < col("p_ts") + expr("INTERVAL 1 HOUR"))
      .groupBy("purchase_id")
      .agg(count(lit(1)).as("events_within_hour"))
      .orderBy("purchase_id")
  }

  /** J7: as-of join — each event enriched with the most recent prior (or
    * simultaneous) purchase of the same user, as a single user_id-keyed
    * window over the interleaved build+probe stream (details below). */
  private val asof = Q(
    "q_join_asof",
    """SELECT e.event_id, p.purchase_id AS last_purchase_id
      |FROM events e
      |LEFT JOIN LATERAL (
      |  SELECT p.event_id AS purchase_id
      |  FROM events p
      |  WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
      |    AND p.ts <= e.ts
      |  ORDER BY p.ts DESC, p.event_id DESC LIMIT 1
      |) p ON true
      |ORDER BY e.event_id""".stripMargin
  ) { (s, dir) =>
    // Linear as-of join (SURVEY §2c J7): instead of the quadratic
    // (events x purchases-per-user) range join + per-event row_number,
    // interleave purchase "build" rows before probe rows in one stream
    // ordered by (ts, kind, event_id) and carry the latest purchase_id
    // forward with last(ignoreNulls) over a running frame. One shuffle
    // keyed on user_id, O(n log n) in the partition — survives any
    // events:purchases ratio. Builds sort before probes at equal ts
    // (kind 0 < 1) and among equal-ts builds the highest event_id wins,
    // matching the oracle's ORDER BY ts DESC, event_id DESC LIMIT 1.
    val ev = Tables.events(s, dir)
    val builds = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(0).as("kind"),
        col("event_id"), col("event_id").as("pid"))
    val probes = ev.select(col("user_id"), col("ts"), lit(1).as("kind"),
      col("event_id"), lit(null).cast("long").as("pid"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    builds.unionByName(probes)
      .withColumn("last_purchase_id", last(col("pid"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("last_purchase_id"))
      .orderBy("event_id")
  }

  /** J4+J5+A4+U3+F10-F12: the diff_utils.py pipeline, lifted from pandas
    * to Spark — diff two grouped summaries into
    * ADDED / REMOVED / CHANGED / UNCHANGED rows (diff_utils.py:35-79).
    * "old" = orders before 1998, "new" = all orders. */
  private val summaryDiff = Q(
    "q_summary_diff",
    """WITH old AS (
      |  SELECT o_orderstatus AS status, o_orderpriority AS priority,
      |         count(*) AS old_count
      |  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY 1, 2),
      |new AS (
      |  SELECT o_orderstatus AS status, o_orderpriority AS priority,
      |         count(*) AS new_count
      |  FROM orders GROUP BY 1, 2)
      |SELECT coalesce(o.status, n.status) AS status,
      |       coalesce(o.priority, n.priority) AS priority,
      |       coalesce(o.old_count, 0) AS old_count,
      |       coalesce(n.new_count, 0) AS new_count,
      |       coalesce(n.new_count, 0) - coalesce(o.old_count, 0) AS delta,
      |       CASE WHEN o.status IS NULL THEN 'ADDED'
      |            WHEN n.status IS NULL THEN 'REMOVED'
      |            WHEN n.new_count != o.old_count THEN 'CHANGED'
      |            ELSE 'UNCHANGED' END AS status_flag
      |FROM old o FULL JOIN new n
      |  ON o.status = n.status AND o.priority = n.priority
      |ORDER BY status, priority""".stripMargin
  ) { (s, dir) =>
    val orders = Tables.orders(s, dir)
    val old = orders
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
      .groupBy(col("o_orderstatus").as("o_status"),
        col("o_orderpriority").as("o_priority"))
      .agg(count(lit(1)).as("old_count"))
    val neu = orders
      .groupBy(col("o_orderstatus").as("n_status"),
        col("o_orderpriority").as("n_priority"))
      .agg(count(lit(1)).as("new_count"))
    old.join(neu, col("o_status") === col("n_status")
        && col("o_priority") === col("n_priority"), "full_outer")
      .select(
        coalesce(col("o_status"), col("n_status")).as("status"),
        coalesce(col("o_priority"), col("n_priority")).as("priority"),
        coalesce(col("old_count"), lit(0L)).as("old_count"),
        coalesce(col("new_count"), lit(0L)).as("new_count"),
        (coalesce(col("new_count"), lit(0L))
          - coalesce(col("old_count"), lit(0L))).as("delta"),
        when(col("o_status").isNull, "ADDED")
          .when(col("n_status").isNull, "REMOVED")
          .when(col("new_count") =!= col("old_count"), "CHANGED")
          .otherwise("UNCHANGED").as("status_flag"))
      .orderBy("status", "priority")
  }

  /** Pure range join (no equi key), made scale-safe by BINNING: each
    * part's ±1.0 price interval expands to the 1.0-wide bins it
    * overlaps (≤3 rows, map-side explode), each lineitem maps to one
    * bin, and the join is an EQUI join on the bin with the exact range
    * as a post-filter. Without the bins this is a cartesian/IEJoin
    * shape — O(n·m) pairs at 100 TB; with them, pair candidates are
    * bounded by bin co-occupancy, the shuffle is keyed, and skew obeys
    * the same AQE/salting remedies as any equi join. The oracle states
    * the predicate directly (DuckDB's inequality-join handles 120M
    * candidate pairs at sf0.01); results are identical because the bin
    * expansion provably covers every row satisfying the range.
    */
  private val rangeBinned = Q(
    "q_join_range_binned",
    """WITH u AS (
      |  SELECT l_extendedprice / l_quantity AS unit FROM lineitem
      |)
      |SELECT p_partkey, count(*) AS n_close
      |FROM part JOIN u
      |  ON u.unit BETWEEN p_retailprice - 1.0 AND p_retailprice + 1.0
      |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin
  ) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
      .select((col("l_extendedprice") / col("l_quantity")).as("unit"))
      .withColumn("bin", floor(col("unit")))
    val pr = Tables.part(s, dir)
      .select(col("p_partkey"), col("p_retailprice"),
        explode(sequence(floor(col("p_retailprice") - 1.0),
          floor(col("p_retailprice") + 1.0))).as("bin"))
    li.join(pr, "bin")
      .filter(col("unit").between(col("p_retailprice") - 1.0,
        col("p_retailprice") + 1.0))
      .groupBy("p_partkey")
      .agg(count(lit(1)).as("n_close"))
      .orderBy("p_partkey")
  }

  /** J-family completion: FULL OUTER join of two filtered aggregates —
    * per-customer counts of finished ('F') vs open ('O') orders.
    * Customers holding only one status produce an exclusive row on
    * each side, so all three outer regions are exercised; keys are
    * coalesced and counts null-filled to keep the output total-orderable.
    * Scale: both inputs are pre-aggregated on the join key (bounded by
    * customer count) before the join, so the outer join shuffles group
    * rows, never raw orders. */
  private val fullOuter = Q(
    "q_join_full_outer",
    """WITH f AS (
      |  SELECT o_custkey AS fk, count(*) AS n_finished
      |  FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey),
      |o AS (
      |  SELECT o_custkey AS ok, count(*) AS n_open
      |  FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey)
      |SELECT coalesce(fk, ok) AS custkey,
      |  coalesce(n_finished, 0) AS n_finished,
      |  coalesce(n_open, 0) AS n_open
      |FROM f FULL OUTER JOIN o ON fk = ok
      |ORDER BY custkey""".stripMargin
  ) { (s, dir) =>
    val orders = Tables.orders(s, dir)
    val f = orders.filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("fk"))
      .agg(count(lit(1)).as("n_finished"))
    val o = orders.filter(col("o_orderstatus") === "O")
      .groupBy(col("o_custkey").as("ok"))
      .agg(count(lit(1)).as("n_open"))
    f.join(o, col("fk") === col("ok"), "full_outer")
      .select(coalesce(col("fk"), col("ok")).as("custkey"),
        coalesce(col("n_finished"), lit(0L)).as("n_finished"),
        coalesce(col("n_open"), lit(0L)).as("n_open"))
      .orderBy("custkey")
  }

  /** J-family completion: explicit CROSS JOIN of the two smallest
    * dimensions (region × nation = 125 rows). A cartesian product is
    * only ever a sane plan when at least one side is tiny and
    * broadcast — asserted by keeping dims only; the fact tables never
    * appear under a cross join anywhere in this catalog. */
  private val crossDims = Q(
    "q_join_cross",
    """SELECT r_name, n_name,
      |  (n_regionkey = r_regionkey) AS is_home
      |FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin
  ) { (s, dir) =>
    Tables.region(s, dir)
      .crossJoin(broadcast(Tables.nation(s, dir)))
      .select(col("r_name"), col("n_name"),
        (col("n_regionkey") === col("r_regionkey")).as("is_home"))
      .orderBy("r_name", "n_name")
  }

  /** Correlated scalar subquery in the PROJECTION — the decorrelation
    * shape Catalyst rewrites to a left outer join over a pre-aggregated
    * subquery, with the COUNT-over-no-rows = 0 fixup (the classic
    * "COUNT bug" case) handled by the rewrite. Driven through
    * spark.sql because the DataFrame API has no scalar-subquery
    * syntax. Integer-only output. */
  private val scalarSubquerySelect = Q(
    "q_subquery_select",
    """SELECT c_custkey, c_mktsegment,
      |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey)
      |    AS n_orders
      |FROM customer ORDER BY c_custkey""".stripMargin
  ) { (s, dir) =>
    Tables.customer(s, dir).createOrReplaceTempView("customer_v")
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    s.sql("""SELECT c_custkey, c_mktsegment,
      |  (SELECT count(*) FROM orders_v WHERE o_custkey = c_custkey)
      |    AS n_orders
      |FROM customer_v ORDER BY c_custkey""".stripMargin)
  }

  /** NOT IN subquery — exercises Spark's null-aware anti-join
    * planning (parquet marks l_partkey nullable, so the optimizer
    * cannot drop the null check and plans the NAAJ broadcast form).
    * Scale note: NAAJ REQUIRES broadcasting the subquery side; on a
    * subquery too big to broadcast, rewrite as NOT EXISTS (a plain
    * left-anti, shuffle-keyed) — q_join_anti and the Q21/Q22 shapes
    * are that scale-safe twin. Here the filtered key set is small and
    * shrinks further at higher selectivity, so broadcast is right. */
  private val notIn = Q(
    "q_join_not_in",
    """SELECT p_partkey, p_name FROM part
      |WHERE p_partkey NOT IN (
      |  SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
      |ORDER BY p_partkey""".stripMargin
  ) { (s, dir) =>
    Tables.part(s, dir).createOrReplaceTempView("part_v")
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
    s.sql("""SELECT p_partkey, p_name FROM part_v
      |WHERE p_partkey NOT IN (
      |  SELECT l_partkey FROM lineitem_v WHERE l_quantity > 45)
      |ORDER BY p_partkey""".stripMargin)
  }

  /** Nearest-in-time as-of join (J7's two-sided sibling): each event
    * pairs with the purchase of the same user whose timestamp is
    * CLOSEST in either direction — backward wins exact ties, equal-ts
    * backward candidates resolve to the highest event_id and forward
    * ones to the lowest (the J7 conventions, mirrored). Same linear
    * interleaved-stream shape as q_join_asof run in BOTH directions:
    * one shuffle keyed on user_id, two running-frame windows over it
    * (ascending carries the latest build at-or-before, descending the
    * earliest at-or-after), then a map-side argmin of the two integer
    * microsecond gaps. No range join, no per-event subquery. */
  private val asofNearest = Q(
    "q_join_asof_nearest",
    """SELECT e.event_id, n.purchase_id AS nearest_purchase_id, n.gap_us
      |FROM events e
      |LEFT JOIN LATERAL (
      |  SELECT p.event_id AS purchase_id,
      |    CAST(abs(epoch_us(p.ts) - epoch_us(e.ts)) AS BIGINT) AS gap_us
      |  FROM events p
      |  WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
      |  ORDER BY abs(epoch_us(p.ts) - epoch_us(e.ts)),
      |    CASE WHEN p.ts <= e.ts THEN 0 ELSE 1 END,
      |    CASE WHEN p.ts <= e.ts THEN -p.event_id ELSE p.event_id END
      |  LIMIT 1
      |) n ON true
      |ORDER BY e.event_id""".stripMargin
  ) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
    val builds = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("us"), lit(0).as("kind"),
        col("event_id"), col("event_id").as("pid"), col("us").as("pus"))
    val probes = ev.select(col("user_id"), col("ts"), col("us"),
      lit(1).as("kind"), col("event_id"),
      lit(null).cast("long").as("pid"), lit(null).cast("long").as("pus"))
    // ascending pass: latest build at-or-before (equal-ts builds sort
    // before probes; the LAST same-ts build carried is max event_id)
    val wb = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // descending pass: earliest build at-or-after (builds still first
    // at equal ts; event_id DESC makes the last-carried the minimum)
    val wf = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("kind"), col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    builds.unionByName(probes)
      .withColumn("b_pid", last(col("pid"), ignoreNulls = true).over(wb))
      .withColumn("b_us", last(col("pus"), ignoreNulls = true).over(wb))
      .withColumn("f_pid", last(col("pid"), ignoreNulls = true).over(wf))
      .withColumn("f_us", last(col("pus"), ignoreNulls = true).over(wf))
      .filter(col("kind") === 1)
      .withColumn("bg", col("us") - col("b_us"))
      .withColumn("fg", col("f_us") - col("us"))
      .select(col("event_id"),
        when(col("b_pid").isNull && col("f_pid").isNull,
          lit(null).cast("long"))
          .when(col("f_pid").isNull ||
            (col("b_pid").isNotNull && col("bg") <= col("fg")),
            col("b_pid"))
          .otherwise(col("f_pid")).as("nearest_purchase_id"),
        when(col("b_pid").isNull && col("f_pid").isNull,
          lit(null).cast("long"))
          .when(col("f_pid").isNull ||
            (col("b_pid").isNotNull && col("bg") <= col("fg")),
            col("bg"))
          .otherwise(col("fg")).as("gap_us"))
      .orderBy("event_id")
  }

  /** J17: LATERAL correlated subquery join — "top-2 line items per
    * order" as the per-row dependent subquery a SQL user writes, not
    * the rank-window rewrite. Catalyst DECORRELATES it into exactly
    * that window plan (DomainJoin → rank filter), so the lateral form
    * costs the same as the hand-written window at any scale; the point
    * of the operator is accepting the surface. Both engines spell the
    * identical SQL. */
  private val lateralTopN = Q(
    "q_join_lateral",
    """SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
      |FROM orders o,
      |LATERAL (
      |  SELECT l_linenumber, l_extendedprice FROM lineitem
      |  WHERE l_orderkey = o.o_orderkey
      |  ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) l
      |WHERE o.o_totalprice > 400000
      |ORDER BY o.o_orderkey, l.l_extendedprice DESC, l.l_linenumber""".stripMargin
  ) { (s, dir) =>
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
        |FROM orders o,
        |LATERAL (
        |  SELECT l_linenumber, l_extendedprice FROM lineitem
        |  WHERE l_orderkey = o.o_orderkey
        |  ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) l
        |WHERE o.o_totalprice > 400000
        |ORDER BY o.o_orderkey, l.l_extendedprice DESC, l.l_linenumber""".stripMargin)
  }

  /** J18: null-safe equality join (`<=>` / IS NOT DISTINCT FROM):
    * NULL keys MATCH each other instead of vanishing — the semantics
    * merge/upsert pipelines need when the business key is nullable.
    * Key = nullif(o_orderstatus, 'O'), so the NULL population is the
    * open orders (~half the table) and an ordinary equi-join would
    * silently drop them all. The aggregate shape keeps the NULL-key
    * fanout bounded: both sides collapse to per-key counts BEFORE the
    * join, so the null bucket joins 1×1 instead of n×m — the same
    * discipline a skewed hot key needs at 100 TB. */
  private val nullSafeJoin = Q(
    "q_join_null_safe",
    """WITH a AS (
      |  SELECT nullif(o_orderstatus, 'O') AS k, count(*) AS n_a
      |  FROM orders GROUP BY 1
      |), b AS (
      |  SELECT nullif(o_orderstatus, 'O') AS k, count(*) AS n_b
      |  FROM orders WHERE o_totalprice > 150000 GROUP BY 1
      |)
      |SELECT coalesce(a.k, '<null>') AS k, n_a, n_b
      |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
      |ORDER BY k""".stripMargin
  ) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val a = o.select(nullif(col("o_orderstatus"), lit("O")).as("k"))
      .groupBy("k").agg(count(lit(1)).as("n_a"))
    val b = o.filter(col("o_totalprice") > 150000)
      .select(nullif(col("o_orderstatus"), lit("O")).as("k"))
      .groupBy("k").agg(count(lit(1)).as("n_b"))
    a.join(b, a("k") <=> b("k"))
      .select(coalesce(a("k"), lit("<null>")).as("k"),
        col("n_a"), col("n_b"))
      .orderBy("k")
  }

  override def all: Seq[Q] = Seq(
    leftChain, innerUsing, semi, anti, interval, asof, summaryDiff,
    rangeBinned, fullOuter, crossDims, scalarSubquerySelect, notIn,
    asofNearest, lateralTopN, nullSafeJoin)
}
