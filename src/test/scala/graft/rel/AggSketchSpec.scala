package graft.rel

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** q_agg_hll_sketch has no DuckDB oracle (DataSketches HLL binaries are
  * engine-specific) — pin the properties that make mergeable sketches
  * trustworthy: bounded error vs exact, merge-equivalence (union of
  * per-slice sketches ≡ one global sketch), and order/parallelism
  * independence.
  */
class AggSketchSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  private def run() =
    graft.SparkEntry.queries("q_agg_hll_sketch")(spark, dir).collect()

  test("per-source and union estimates stay within 5% of exact") {
    val rows = run()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("err_bp") < 500L,
        s"${r.getAs[String]("source")}: err ${r.getAs[Long]("err_bp")} bp")
    }
  }

  test("union of per-source sketches equals one direct global sketch " +
    "(merge-equivalence, the property that makes sketches storable)") {
    val toks = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val direct = toks
      .agg(hll_sketch_estimate(hll_sketch_agg(col("tok"), lit(12)))
        .as("est")).head().getLong(0)
    val unionRow = run().find(_.getAs[String]("source") == "ALL").get
    assert(unionRow.getAs[Long]("est") === direct,
      "merged per-source sketches must estimate like one global sketch")
  }

  test("output is independent of input partitioning (register max is " +
    "order-free)") {
    val a = run().toSeq
    val toks7 = Tables.documents(spark, dir).repartition(7)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val b = toks7.groupBy("source")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("tok"), lit(12)))
        .as("est"))
      .orderBy("source").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    a.filter(_.getAs[String]("source") != "ALL").foreach { r =>
      assert(b(r.getAs[String]("source")) === r.getAs[Long]("est"))
    }
  }
}
