package graft.rel

import org.apache.spark.sql.functions._
import graft.{Q, QueryCatalog}

/** SURVEY.md §2b projection / filter / predicate operators (P1–P9, incl. the SQL-variables surface).
  *
  * Scale notes: all of these compile to a single parquet scan with the
  * filter and projection pushed into the reader (`PushedFilters` /
  * `ReadSchema` in explain) — no shuffle except the final presentation
  * sort, which only the driver-facing dump needs.
  */
object ScanFilterQueries extends QueryCatalog {

  /** P1: column projection (ref demo.py:207,211). */
  private val projection = Q(
    "q_scan_projection",
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_returnflag
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** P2: IN-list filter (ref demo.py:210 `content IN (1,2)`). */
  private val filterIn = Q(
    "q_filter_in",
    """SELECT event_id, event_type
      |FROM events
      |WHERE event_type IN ('purchase', 'signup')
      |ORDER BY event_id""".stripMargin
  ) { (s, dir) =>
    Tables.events(s, dir)
      .filter(col("event_type").isin("purchase", "signup"))
      .select("event_id", "event_type")
      .orderBy("event_id")
  }

  /** P3: equality predicate (ref demo.py:179 `case_id = 'case-2'`). */
  private val filterEq = Q(
    "q_filter_eq",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
      |ORDER BY o_orderkey""".stripMargin
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .filter(col("o_orderstatus") === lit("F")
        && col("o_orderpriority") === lit("1-URGENT"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** P4: null predicates (ref file_summary_utils.py:55,89 IS NOT NULL).
    * Corpus has no nulls, so NULLIF manufactures them first. */
  private val filterNotNull = Q(
    "q_filter_notnull",
    """SELECT l_orderkey, l_linenumber, l_discount
      |FROM lineitem
      |WHERE NULLIF(l_discount, 0.0) IS NOT NULL
      |ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(nullif(col("l_discount"), lit(0.0)).isNotNull)
      .select("l_orderkey", "l_linenumber", "l_discount")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** P5: inequality (ref file_summary_utils.py:138 `e.status != 2`). */
  private val filterNeq = Q(
    "q_filter_neq",
    """SELECT l_orderkey, l_linenumber, l_returnflag
      |FROM lineitem
      |WHERE l_returnflag != 'N'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") =!= lit("N"))
      .select("l_orderkey", "l_linenumber", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** P6: literal tag column (ref file_summary_utils.py:107 withColumn lit). */
  private val litColumn = Q(
    "q_lit_column",
    """SELECT r_regionkey, r_name, 'run-1' AS run_id
      |FROM region
      |ORDER BY r_regionkey""".stripMargin
  ) { (s, dir) =>
    Tables.region(s, dir)
      .withColumn("run_id", lit("run-1"))
      .orderBy("r_regionkey")
  }

  /** P7: distinct projection (ref cleanup_utils.py:184). */
  private val distinctProj = Q(
    "q_distinct",
    """SELECT DISTINCT l_returnflag, l_linestatus
      |FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** LIKE predicates, one per pushdown class: prefix compiles to
    * StringStartsWith, suffix to StringEndsWith, infix to
    * StringContains — all three reach the parquet scan as
    * PushedFilters (asserted in PlanSpec), so row groups whose
    * min/max exclude the prefix never decompress. */
  private val filterLike = Q(
    "q_filter_like",
    """SELECT p_partkey, p_name
      |FROM part
      |WHERE p_name LIKE 'small%' OR p_name LIKE '%bolt'
      |   OR p_name LIKE '%wid%'
      |ORDER BY p_partkey""".stripMargin
  ) { (s, dir) =>
    Tables.part(s, dir)
      .filter(col("p_name").startsWith("small") ||
        col("p_name").endsWith("bolt") ||
        col("p_name").contains("wid"))
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")
  }

  /** Source-format breadth beyond parquet: the same aggregate is
    * written to ORC, CSV, and JSON sinks and read back through each
    * format's full serialize/parse path (explicit schema on read —
    * schema inference is a second scan AND a determinism hazard for
    * CSV/JSON at scale). Values are strings + BIGINTs only: exact in
    * all three texts/binaries, so the roundtrip is value-preserving by
    * construction and the oracle is the aggregate × format-label
    * cross. ORC is the columnar alternative (predicate pushdown +
    * column pruning like parquet); CSV/JSON are the row-text ingest
    * formats a pipeline meets at its edges. */
  private val sourceFormats = Q(
    "q_source_formats",
    """WITH base AS (
      |  SELECT o_orderstatus AS status, count(*) AS n,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS total_cents
      |  FROM orders GROUP BY o_orderstatus)
      |SELECT f.fmt, b.status, b.n, b.total_cents
      |FROM base b, (VALUES ('csv'), ('json'), ('orc')) f(fmt)
      |ORDER BY fmt, status""".stripMargin
  ) { (s, dir) =>
    val base = Tables.orders(s, dir)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("bigint"))
          .as("total_cents"))
    val schema = base.schema
    val out = graft.ScratchDirs.create("graft-fmt-")
    val reads = Seq("csv", "json", "orc").map { fmt =>
      val path = out.resolve(fmt).toString
      val w = base.write.mode("overwrite").format(fmt)
      (if (fmt == "csv") w.option("header", "true") else w).save(path)
      val r = s.read.schema(schema).format(fmt)
      (if (fmt == "csv") r.option("header", "true") else r).load(path)
        .select(lit(fmt).as("fmt"), col("status"), col("n"),
          col("total_cents"))
    }
    reads.reduce(_.unionByName(_)).orderBy("fmt", "status")
  }

  /** P9 [EXT]: SQL session variables + EXECUTE IMMEDIATE (Spark 4
    * scripting surface) — a threshold DECLAREd and SET as a session
    * variable, referenced by name in one query, then the same query
    * run through parameterized EXECUTE IMMEDIATE ... USING with the
    * variable as the bind argument; the two result sets are unioned
    * with a method tag and must agree row-for-row. The variable folds
    * to a literal at analysis, so the plan is the ordinary
    * pushed-filter scan — the surface costs nothing. Oracle: the
    * constant inlined (DuckDB has no session variables). */
  private val sqlVariables = Q(
    "q_sql_variables",
    """WITH q AS (
      |  SELECT o_orderpriority, count(*) AS n FROM orders
      |  WHERE o_totalprice > 400000 GROUP BY 1
      |)
      |SELECT 'execute_immediate' AS method, o_orderpriority, n FROM q
      |UNION ALL
      |SELECT 'session_variable' AS method, o_orderpriority, n FROM q
      |ORDER BY method, o_orderpriority""".stripMargin
  ) { (s, dir) =>
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql("DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 0")
    s.sql("SET VAR price_floor = 400000")
    val byVar = s.sql(
      """SELECT 'session_variable' AS method, o_orderpriority,
        |  count(*) AS n
        |FROM orders WHERE o_totalprice > price_floor
        |GROUP BY 2""".stripMargin)
    val byExec = s.sql(
      """EXECUTE IMMEDIATE
        |'SELECT ''execute_immediate'' AS method, o_orderpriority,
        |   count(*) AS n
        | FROM orders WHERE o_totalprice > ? GROUP BY 2'
        |USING price_floor""".stripMargin)
    byExec.unionByName(byVar).orderBy("method", "o_orderpriority")
  }

  override def all: Seq[Q] = Seq(
    projection, filterIn, filterEq, filterNotNull, filterNeq, litColumn,
    distinctProj, filterLike, sourceFormats, sqlVariables)
}
