package graft.rel

import graft.SparkSuite
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Scale primitives: bucketed joins must drop BOTH exchanges; salted
  * aggregation must match the direct aggregation exactly.
  */
class ScaleSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("bucketed co-partitioned join plans with no Exchange on either side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Scale.bucketize(Tables.orders(spark, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice"),
        "b_orders", 8, Seq("o_orderkey"))
      Scale.bucketize(Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_quantity"),
        "b_lineitem", 8, Seq("l_orderkey"))
      val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        "bucketed join still shuffles:\n" + plan)
      assert(!plan.contains("BroadcastExchange"))
      // SelectedBucketsCount proves the scan read bucket metadata
      assert(plan.contains("Bucketed: true"), plan)
      // and the result matches the plain join
      val want = Tables.lineitem(spark, dir).join(
        Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == want)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("salted aggregation equals direct aggregation on the skewed key") {
    val ev = Tables.events(spark, dir)
    val direct = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Scale.saltedAgg(ev, Seq("user_id"), 16)(
      Seq(count(lit(1)).as("n"), sum(col("value")).as("s")),
      Seq(sum(col("n")).as("n"), round(sum(col("s")), 2).as("s")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct)
  }
}
