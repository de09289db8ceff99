package graft.rel

import org.apache.spark.sql.functions._
import graft.{Q, QueryCatalog}

/** SURVEY.md §2d aggregation operators (A1–A16) on the driver corpus.
  *
  * Scale notes (100 TB): every query here is a single hash aggregate —
  * Spark plans partial (map-side) aggregation before the shuffle, so the
  * shuffle carries one row per (group × partition), not per input row.
  * Low-cardinality group keys (returnflag × linestatus = 6 groups) make
  * the exchange trivially small at any scale factor.
  */
object AggQueries extends QueryCatalog {

  /** A1+A5 flagship: TPC-H Q1-style pricing summary.
    * Ref behavior: hash agg w/ COUNT(*) as in
    * /root/reference/notebooks/utils/file_summary_utils.py:91-104.
    * Doubles rounded to fixed scale for oracle hash parity.
    */
  val pricingSummary: Q = Q(
    "q_agg_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** A2: MIN/MAX per group (ref file_summary_utils.py:132-139 MIN pair). */
  private val minMax = Q(
    "q_agg_minmax",
    """SELECT l_suppkey,
      |  min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_suppkey")
      .agg(min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"),
        count(lit(1)).as("n"))
      .orderBy("l_suppkey")
  }

  /** A3: ungrouped scalar count (ref demo.py:215 `.count()`). */
  private val scalarCount = Q(
    "q_agg_scalar_count",
    "SELECT count(*) AS n_rows FROM lineitem"
  ) { (s, dir) =>
    Tables.lineitem(s, dir).agg(count(lit(1)).as("n_rows"))
  }

  /** A4: grouped sum + first (diff_utils.py:35-49) — `first` made
    * deterministic as MIN (pandas `first` there is order-dependent;
    * the column is functionally dependent on the key anyway). */
  private val groupSummary = Q(
    "q_agg_group_summary",
    """SELECT o_orderstatus,
      |  round(sum(o_totalprice), 2) AS total_price,
      |  min(o_orderpriority) AS first_priority,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(round(sum(col("o_totalprice")), 2).as("total_price"),
        min(col("o_orderpriority")).as("first_priority"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  /** A5: COUNT(DISTINCT) — exact distinct forces a two-phase agg; Spark
    * plans partial distinct before the shuffle (expand + two exchanges). */
  private val countDistinctQ = Q(
    "q_agg_count_distinct",
    """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_custs,
      |  count(*) AS n_orders
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n_custs"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")
  }

  /** A5: approx_count_distinct (HLL++). Sketch internals differ across
    * engines, so no SQL oracle — driver does the rows-only check; the
    * exact-vs-approx sanity bound lives in the ScalaTest spec. */
  private val approxDistinct = Q.noOracle("q_agg_approx_distinct") { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
      .orderBy("l_returnflag")
  }

  /** The fully-ORACLED twin of [[approxDistinct]] (the md5-twin
    * pattern: minhash/simhash/fingerprint precedent): a hand-rolled
    * HyperLogLog over md5-derived 60-bit hashes, exact integer
    * arithmetic end to end. p=8 (256 registers): bucket = low 8 hash
    * bits, rho = leading-zero rank of the remaining 52-bit window
    * (computed via length(bin(w)) — pure string/int ops, no float
    * log), register = max rho per bucket. The harmonic sum is kept in
    * INTEGER space by scaling 2^-reg to 2^(53-reg) (≤ 2^61 total, no
    * overflow, order-independent BIGINT sum), and the single float
    * step — the raw HLL estimate alpha·m²·2^53 / S — is one IEEE
    * multiply/divide chain over exact inputs with e0 double literals,
    * bit-identical across engines. Same map-side-combinable shuffle
    * shape as approx_count_distinct; registers merge by max, so this
    * is the 100 TB rollup form too. */
  private val approxDistinctMd5 = Q(
    "q_agg_approx_distinct_md5",
    """WITH d AS (
      |  SELECT DISTINCT l_returnflag, l_partkey FROM lineitem
      |), h AS (
      |  SELECT l_returnflag,
      |    (CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
      |      AS UBIGINT))::BIGINT AS h
      |  FROM d
      |), r AS (
      |  SELECT l_returnflag, h & 255 AS bucket,
      |    max(CASE WHEN (h >> 8) = 0 THEN 53
      |        ELSE 53 - length(bin(h >> 8)) END) AS reg
      |  FROM h GROUP BY 1, 2
      |), s AS (
      |  SELECT l_returnflag,
      |    CAST(sum(CAST(1 AS BIGINT) << (53 - reg)) AS BIGINT)
      |      + (256 - count(*)) * CAST(9007199254740992 AS BIGINT)
      |      AS hll_sum,
      |    count(*) AS n_buckets
      |  FROM r GROUP BY 1
      |)
      |SELECT l_returnflag, n_buckets, hll_sum,
      |  0.7213e0 / (1.0e0 + 1.079e0/256.0e0) * 65536.0e0
      |    * 9007199254740992.0e0 / hll_sum AS approx_parts
      |FROM s ORDER BY l_returnflag""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_partkey")).distinct()
      .selectExpr("l_returnflag",
        "cast(conv(substring(md5(cast(cast(l_partkey as string) " +
          "as binary)), 1, 15), 16, 10) as bigint) as h")
      .selectExpr("l_returnflag", "h & 255 as bucket",
        "case when shiftright(h, 8) = 0 then 53 " +
          "else 53 - length(bin(shiftright(h, 8))) end as rho")
      .groupBy("l_returnflag", "bucket").agg(max("rho").as("reg"))
      .groupBy("l_returnflag")
      .agg(
        expr("cast(sum(shiftleft(cast(1 as bigint), " +
          "cast(53 - reg as int))) as bigint) + " +
          "(256 - count(*)) * cast(9007199254740992 as bigint)")
          .as("hll_sum"),
        count(lit(1)).as("n_buckets"))
      .selectExpr("l_returnflag", "n_buckets", "hll_sum",
        "0.7213e0 / (1.0e0 + 1.079e0/256.0e0) * 65536.0e0 " +
          "* 9007199254740992.0e0 / hll_sum as approx_parts")
      .orderBy("l_returnflag")
  }

  /** A5 companion (round 14): the MERGEABILITY law of the hand-rolled
    * md5-HLL, fully ORACLED — the property the binary-sketch query
    * (q_agg_hll_sketch) can only spec-check. Per-source 256-register
    * sketches over distinct document tokens, then an 'ALL' row whose
    * registers are the per-BUCKET max over the per-source registers —
    * never a re-scan of the corpus: max(max per source) ≡ max over
    * the union, so slice sketches stored per source/day answer any
    * union query. Exact distincts ride along. Same integer register
    * discipline as [[approxDistinctMd5]] (max-register is order-
    * independent → deterministic at any parallelism); the one float
    * is the final estimate division. Scale shape: one explode +
    * distinct, two bounded groupBys (sources×256, then 256). */
  private val hllUnionMd5 = Q(
    "q_agg_hll_union_md5",
    """WITH d AS (
      |  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok
      |  FROM documents
      |), h AS (
      |  SELECT source,
      |    (CAST(concat('0x', substr(md5(tok), 1, 15))
      |      AS UBIGINT))::BIGINT AS h
      |  FROM d
      |), r AS (
      |  SELECT source, h & 255 AS bucket,
      |    max(CASE WHEN (h >> 8) = 0 THEN 53
      |        ELSE 53 - length(bin(h >> 8)) END) AS reg
      |  FROM h GROUP BY 1, 2
      |), ru AS (
      |  SELECT source, bucket, reg FROM r
      |  UNION ALL
      |  SELECT 'ALL' AS source, bucket, max(reg) AS reg
      |  FROM r GROUP BY bucket
      |), s AS (
      |  SELECT source,
      |    CAST(sum(CAST(1 AS BIGINT) << (53 - reg)) AS BIGINT)
      |      + (256 - count(*)) * CAST(9007199254740992 AS BIGINT)
      |      AS hll_sum,
      |    count(*) AS n_buckets
      |  FROM ru GROUP BY 1
      |), x AS (
      |  SELECT source, count(DISTINCT tok) AS exact_toks FROM d GROUP BY 1
      |  UNION ALL
      |  SELECT 'ALL', count(DISTINCT tok) FROM d
      |)
      |SELECT s.source, s.n_buckets, s.hll_sum,
      |  0.7213e0 / (1.0e0 + 1.079e0/256.0e0) * 65536.0e0
      |    * 9007199254740992.0e0 / s.hll_sum AS approx_toks,
      |  x.exact_toks
      |FROM s JOIN x ON s.source = x.source
      |ORDER BY s.source""".stripMargin
  ) { (s, dir) =>
    val d = Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .distinct()
    val r = d
      .selectExpr("source",
        "cast(conv(substring(md5(cast(tok as binary)), 1, 15), 16, 10)" +
          " as bigint) as h")
      .selectExpr("source", "h & 255 as bucket",
        "case when shiftright(h, 8) = 0 then 53 " +
          "else 53 - length(bin(shiftright(h, 8))) end as rho")
      .groupBy("source", "bucket").agg(max("rho").as("reg"))
    val ru = r.unionByName(
      r.groupBy("bucket").agg(max("reg").as("reg"))
        .select(lit("ALL").as("source"), col("bucket"), col("reg")))
    val est = ru.groupBy("source")
      .agg(
        expr("cast(sum(shiftleft(cast(1 as bigint), " +
          "cast(53 - reg as int))) as bigint) + " +
          "(256 - count(*)) * cast(9007199254740992 as bigint)")
          .as("hll_sum"),
        count(lit(1)).as("n_buckets"))
    val exact = d.groupBy("source")
      .agg(countDistinct(col("tok")).as("exact_toks"))
      .unionByName(d.agg(countDistinct(col("tok")).as("exact_toks"))
        .select(lit("ALL").as("source"), col("exact_toks")))
    est.join(exact, "source")
      .selectExpr("source", "n_buckets", "hll_sum",
        "0.7213e0 / (1.0e0 + 1.079e0/256.0e0) * 65536.0e0 " +
          "* 9007199254740992.0e0 / hll_sum as approx_toks",
        "exact_toks")
      .orderBy("source")
  }

  /** A5 companion: MERGEABLE distinct-count sketches (DataSketches HLL
    * via hll_sketch_agg / hll_union_agg) — the 100 TB rollup pattern
    * approx_count_distinct cannot express: per-slice sketch BINARIES
    * are storable (a lake table column, one row per source/day), and
    * any slice union answers "distinct across these slices" by merging
    * registers — no re-scan of the fact data. Here: per-source token
    * sketches, plus an 'ALL' row whose estimate comes from
    * hll_union_agg over the 20 per-source sketches (never from the
    * corpus); exact counts ride along to expose the half-up-bp error.
    * Sketches are order-independent (max-register per bucket), so the
    * output is deterministic at any parallelism. No DuckDB oracle
    * (sketch internals are engine-specific): rows-only check + the
    * AggSketchSpec bounds (err < 5%, union ≡ direct global sketch). */
  private val hllSketch = Q.noOracle("q_agg_hll_sketch") { (s, dir) =>
    val toks = Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val per = toks.groupBy("source")
      .agg(hll_sketch_agg(col("tok"), lit(12)).as("sk"),
        countDistinct(col("tok")).as("exact"))
    val perOut = per.select(col("source"),
      hll_sketch_estimate(col("sk")).as("est"), col("exact"))
    val allOut = per
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .select(lit("ALL").as("source"), col("est"))
      .crossJoin(broadcast(
        toks.agg(countDistinct(col("tok")).as("exact"))))
    perOut.unionByName(allOut)
      .withColumn("err_bp", expr(
        "(10000 * abs(est - exact) + exact div 2) div exact"))
      .orderBy("source")
  }

  /** A6: ROLLUP — multi-level summaries. Group keys are COALESCEd to a
    * sentinel so Spark/DuckDB NULL-ordering differences can't bite. */
  private val rollupQ = Q(
    "q_agg_rollup",
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy("returnflag", "linestatus")
  }

  /** A6: CUBE — all grouping-set combinations. */
  private val cubeQ = Q(
    "q_agg_cube",
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  round(sum(o_totalprice), 2) AS total, count(*) AS n
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(round(sum(col("o_totalprice")), 2).as("total"),
        count(lit(1)).as("n"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("total"), col("n"))
      .orderBy("status", "priority")
  }

  /** A6: explicit GROUPING SETS, driven through the engine's SQL
    * surface (spark.sql over a registered view) rather than the
    * DataFrame API — exercises the parser/analyzer entry path the
    * reference uses for all its queries. */
  private val groupingSetsQ = Q(
    "q_agg_grouping_sets",
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus))
      |ORDER BY returnflag, linestatus""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
    s.sql("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      |FROM lineitem_v
      |GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus))
      |ORDER BY returnflag, linestatus""".stripMargin)
  }

  /** Fixed-width histogram — the data-profiling staple. Bucket
    * assignment is map-side floor division; the groupBy key space is
    * bounded by the domain (10 buckets here), so partial aggregation
    * collapses each partition to the bucket count before the shuffle.
    * min/max are order-insensitive (no float-sum determinism risk). */
  private val histogram = Q(
    "q_agg_histogram",
    """SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
      |  count(*) AS n, round(min(value), 2) AS lo, round(max(value), 2) AS hi
      |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin
  ) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(floor(col("value") / 50.0).cast("bigint").as("bucket"))
      .agg(count(lit(1)).as("n"), round(min(col("value")), 2).as("lo"),
        round(max(col("value")), 2).as("hi"))
      .orderBy("bucket")
  }

  /** PIVOT — long-to-wide reshape: quantity totals per linestatus with
    * one column per return flag. The pivot values are declared
    * explicitly (A/N/R), which is also the scale rule: an undeclared
    * pivot first runs a distinct scan to discover values, a declared
    * one is a single pass. Quantities are integral doubles, so the
    * sums are exact and cast to BIGINT for a rounding-free compare.
    * Oracle side is the CASE-sum expansion (what a pivot IS). */
  private val pivotQ = Q(
    "q_agg_pivot",
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END)
      |    AS BIGINT) AS qty_a,
      |  CAST(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END)
      |    AS BIGINT) AS qty_n,
      |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END)
      |    AS BIGINT) AS qty_r
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(col("l_quantity")))
      .select(col("l_linestatus"),
        col("A").cast("bigint").as("qty_a"),
        col("N").cast("bigint").as("qty_n"),
        col("R").cast("bigint").as("qty_r"))
      .orderBy("l_linestatus")
  }

  /** UNPIVOT (melt) — wide-to-long reshape via Dataset.unpivot: a
    * per-status aggregate with two metric columns becomes one row per
    * (status, metric). Runs AFTER aggregation, so the melt multiplies
    * group rows (bounded), never fact rows. Both metrics are BIGINT so
    * the stacked value column has one type — unpivot requires it, and
    * it keeps the compare rounding-free. Oracle is the UNION ALL
    * expansion (what an unpivot IS). */
  private val unpivotQ = Q(
    "q_unpivot",
    """WITH w AS (
      |  SELECT o_orderstatus, count(*) AS n_orders,
      |    count(DISTINCT o_custkey) AS n_custs
      |  FROM orders GROUP BY o_orderstatus)
      |SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS val FROM w
      |UNION ALL
      |SELECT o_orderstatus, 'n_custs' AS metric, n_custs AS val FROM w
      |ORDER BY o_orderstatus, metric""".stripMargin
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_custs"))
      .unpivot(
        ids = Array(col("o_orderstatus")),
        values = Array(col("n_orders"), col("n_custs")),
        variableColumnName = "metric",
        valueColumnName = "val")
      .orderBy("o_orderstatus", "metric")
  }

  /** Pearson correlation per group via explicit integer moments —
    * the deterministic twin of the built-in corr(): the five moment
    * sums (n, Σx, Σy, Σxy, Σx², Σy²) are EXACT BIGINTs (quantity is
    * integral, price is quantized to whole dollars so Σy² stays in
    * range at any SF), and only the final combination runs in float —
    * the same IEEE ops on the same integers in both engines. The
    * built-in corr() accumulates running doubles whose partial-merge
    * order varies run to run; fine when 1e-12 jitter is acceptable,
    * not under a hash compare. Partial aggregation applies to every
    * moment (they're plain sums), so the shuffle carries 6 longs per
    * group. */
  private val corrMoments = Q(
    "q_agg_corr",
    """WITH m AS (
      |  SELECT l_returnflag,
      |    count(*) AS n,
      |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sx,
      |    CAST(sum(CAST(round(l_extendedprice / 100) AS BIGINT))
      |      AS BIGINT) AS sy,
      |    CAST(sum(CAST(round(l_quantity) AS BIGINT)
      |      * CAST(round(l_extendedprice / 100) AS BIGINT)) AS BIGINT)
      |      AS sxy,
      |    CAST(sum(CAST(round(l_quantity) AS BIGINT)
      |      * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sxx,
      |    CAST(sum(CAST(round(l_extendedprice / 100) AS BIGINT)
      |      * CAST(round(l_extendedprice / 100) AS BIGINT)) AS BIGINT)
      |      AS syy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |    / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |       * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
      |    6) AS corr_qty_price
      |FROM m ORDER BY l_returnflag""".stripMargin
  ) { (s, dir) =>
    val x = round(col("l_quantity")).cast("bigint")
    val y = round(col("l_extendedprice") / 100).cast("bigint")
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .select(col("l_returnflag"), col("n"),
        round((col("n").cast("double") * col("sxy") -
          col("sx").cast("double") * col("sy")) /
          (sqrt(col("n").cast("double") * col("sxx") -
            col("sx").cast("double") * col("sx")) *
           sqrt(col("n").cast("double") * col("syy") -
            col("sy").cast("double") * col("sy"))), 6)
          .as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  override def all: Seq[Q] = Seq(
    pricingSummary, minMax, scalarCount, groupSummary, countDistinctQ,
    approxDistinct, approxDistinctMd5, hllUnionMd5, hllSketch,
    rollupQ, cubeQ,
    groupingSetsQ, histogram, pivotQ, unpivotQ, corrMoments)
}
