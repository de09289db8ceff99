package graft.rel

import org.apache.spark.sql.functions._
import graft.{Q, QueryCatalog}

/** SURVEY.md §2e sort/limit/top-k (O1–O4) and §2f set operations (U1–U4).
  *
  * Scale notes: ORDER BY + LIMIT plans as TakeOrderedAndProject — each
  * partition keeps only its local top-k, the driver merges k×partitions
  * rows; no global sort materializes. Full sorts below exist only for
  * the deterministic oracle dump.
  */
object SortSetQueries extends QueryCatalog {

  /** O1: multi-column sort (ref file_summary_utils.py:110). */
  private val sortMulti = Q(
    "q_sort_multi",
    """SELECT o_orderkey, o_orderdate, o_orderpriority
      |FROM orders
      |ORDER BY o_orderdate, o_orderpriority, o_orderkey""".stripMargin
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
      .orderBy("o_orderdate", "o_orderpriority", "o_orderkey")
  }

  /** O2: ORDER BY ... DESC LIMIT k (ref file_summary_utils.py:124-125) —
    * top-10 orders by price, key tiebreak for determinism. */
  private val topK = Q(
    "q_topk",
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  /** U1: UNION ALL of three homogeneous branches
    * (ref file_summary_utils.py:97-103). */
  private val unionAll = Q(
    "q_union_all",
    """SELECT * FROM (
      |  SELECT 'click' AS kind, event_id FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT 'view' AS kind, event_id FROM events WHERE event_type = 'view'
      |  UNION ALL
      |  SELECT 'error' AS kind, event_id FROM events WHERE event_type = 'error'
      |) ORDER BY kind, event_id""".stripMargin
  ) { (s, dir) =>
    val ev = Tables.events(s, dir)
    def branch(t: String) = ev.filter(col("event_type") === t)
      .select(lit(t).as("kind"), col("event_id"))
    branch("click").union(branch("view")).union(branch("error"))
      .orderBy("kind", "event_id")
  }

  /** U2: unionByName — branches with different column order
    * (ref file_summary_utils.py:164-169). */
  private val unionByNameQ = Q(
    "q_union_by_name",
    """SELECT * FROM (
      |  SELECT c_custkey AS entity_key, c_name AS entity_name, 'customer' AS entity
      |  FROM customer
      |  UNION ALL
      |  SELECT s_suppkey AS entity_key, s_name AS entity_name, 'supplier' AS entity
      |  FROM supplier
      |) ORDER BY entity, entity_key""".stripMargin
  ) { (s, dir) =>
    val c = Tables.customer(s, dir).select(
      col("c_custkey").as("entity_key"), col("c_name").as("entity_name"),
      lit("customer").as("entity"))
    // deliberately different column order — unionByName realigns
    val sup = Tables.supplier(s, dir).select(
      lit("supplier").as("entity"), col("s_name").as("entity_name"),
      col("s_suppkey").as("entity_key"))
    c.unionByName(sup).orderBy("entity", "entity_key")
  }

  /** U4: INTERSECT (distinct) — parts both large and shipped in bulk. */
  private val intersectQ = Q(
    "q_intersect",
    """SELECT p_partkey FROM part WHERE p_size >= 40
      |INTERSECT
      |SELECT l_partkey AS p_partkey FROM lineitem WHERE l_quantity >= 45
      |ORDER BY p_partkey""".stripMargin
  ) { (s, dir) =>
    val big = Tables.part(s, dir).filter(col("p_size") >= 40).select("p_partkey")
    val bulk = Tables.lineitem(s, dir).filter(col("l_quantity") >= 45)
      .select(col("l_partkey").as("p_partkey"))
    big.intersect(bulk).orderBy("p_partkey")
  }

  /** U4: EXCEPT ALL — multiset difference keeps duplicate counts. */
  private val exceptAllQ = Q(
    "q_except_all",
    """SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
      |EXCEPT ALL
      |SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
      |ORDER BY l_partkey""".stripMargin
  ) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_returnflag") === "A").select("l_partkey")
      .exceptAll(li.filter(col("l_returnflag") === "R").select("l_partkey"))
      .orderBy("l_partkey")
  }

  override def all: Seq[Q] = Seq(
    sortMulti, topK, unionAll, unionByNameQ, intersectQ, exceptAllQ)
}
