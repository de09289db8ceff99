package graft.llm

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Scale-shape proofs that can only be demonstrated, not inspected:
  * the shared test session caps spark.driver.maxResultSize at 32 MiB
  * (SparkSuite), so any code path that materializes O(data) on the
  * driver fails these tests loudly.
  */
class ScaleSpec extends SparkSuite {

  test("distributed cluster resolution completes on a >1M-edge pair set" +
    " without collecting the label set to the driver") {
    assert(spark.conf.get("spark.driver.maxResultSize") == "32m",
      "guard conf missing — this test would prove nothing")
    // 8M nodes in chains of four (0-1-2-3, 4-5-6-7, ...): 6M edges,
    // above the 1M localThreshold, so the adaptive router MUST take
    // the distributed min-label branch. Collecting the 8M-row label
    // output serializes >32 MiB of (lz4-compressed) task results and
    // aborts — proven by the intercept below.
    val pairs = spark.range(0, 8000000L)
      .filter(col("id") % 4 =!= 3)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val out = PipelineQueries.clusterPairs(spark, pairs)
    // Validate with distributed actions only (no driver materialize):
    // every node labeled by its chain head, exactly one keeper each.
    val stats = out.agg(
      count(lit(1)).as("n"),
      sum(when(col("cluster_id") === (col("doc_id") - col("doc_id") % 4),
        1L).otherwise(0L)).as("correct_label"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("keepers")).head()
    assert(stats.getLong(0) == 8000000L)
    assert(stats.getLong(1) == 8000000L,
      "every doc must carry its chain-head min label")
    assert(stats.getLong(2) == 2000000L, "exactly one keeper per chain")
    // Negative proof that the guard is binding at this volume: an
    // explicit driver materialize of the same output DOES trip the
    // 32 MiB cap — i.e. the pre-fix collect-based handoff could not
    // have passed this test.
    val e = intercept[org.apache.spark.SparkException](out.collect())
    assert(e.getMessage.contains("maxResultSize") ||
      e.getMessage.contains("bigger than"), e.getMessage)
  }
}
