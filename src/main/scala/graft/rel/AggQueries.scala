package graft.rel

import org.apache.spark.sql.functions._
import graft.{Q, QueryCatalog}

/** SURVEY.md §2d aggregation operators (A1–A6) on the driver corpus.
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

  override def all: Seq[Q] = Seq(pricingSummary)
}
