package graft.rel

import graft.SparkSuite

/** Determinism meta-test: the driver's oracle compare hashes VALUES,
  * so every declared query must produce bit-identical output no matter
  * how Spark partitions the work. This spec re-executes the
  * float-sensitive queries (distributed float aggregation, scaled-log
  * scores, window picks over doubles, LIMIT boundaries on computed
  * columns) under a deliberately different shuffle-partition count and
  * asserts row-for-row equality with the suite-default plan — catching
  * any accidental dependence on partition order (the exact failure
  * class the integer-scaling rules in STATUS.md exist to prevent)
  * before the driver's DuckDB hash ever sees it.
  */
class DeterminismSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  /** The risk class: queries whose output flows through double math,
    * log scaling, ratio rounding, or value-ordered LIMITs. Integer-only
    * queries are structurally immune and skipped for suite time. */
  private val floatSensitive = Seq(
    "q_agg_pricing_summary",
    "q_tpch_q3_shipping_priority",
    "q_tpch_q7_volume_shipping",
    "q_tpch_q8_market_share",
    "q_tpch_q14_promo_revenue",
    "q_tpch_q17_small_qty_revenue",
    "q_tpch_q22_global_sales",
    "q_text_logprob",
    "q_text_logprob_bigram",
    "q_text_entropy",
    "q_pipe_mixture",
    "q_pipe_quantiles",
    "q_pipe_quantize",
    "q_sim_topk_brute",
    "q_sim_knn_join", // r6: left side repartitions — rank ties must not
    "q_sim_centroid",
    "q_dedup_containment",
    "q_window_first_last",
    "q_scale_salted_agg",
    // r6 curation batch: scaled-ln sums + ntile over a derived double,
    // winnowing density ratio, chunk dup fractions
    "q_pipe_importance",
    "q_text_ppl_buckets",
    "q_text_winnowing",
    "q_pipe_cdc_chunks",
    "q_dedup_semantic",
    // r6 TPC-H completion: Q2's LIMIT sits on a rounded-double DESC
    // order (acctbal) — the one new query with a float at a boundary
    "q_tpch_q2_min_cost_supplier")

  test("float-sensitive queries are partition-count invariant: " +
    "shuffle=4 and shuffle=13 produce identical rows") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    def rows(name: String): Seq[Seq[Any]] =
      graft.SparkEntry.queries(name)(spark, dir)
        .collect().toSeq.map(_.toSeq)
    floatSensitive.foreach { name =>
      spark.conf.set(key, prev)
      val base = rows(name)
      // 13 is coprime to 4 and to the file count — maximally different
      // partition boundaries, so float sums would visit rows in a
      // different order if the query depended on it
      spark.conf.set(key, "13")
      val alt = try rows(name) finally spark.conf.set(key, prev)
      assert(base == alt,
        s"$name output depends on the shuffle partitioning: " +
          s"first diff at index ${base.zip(alt).indexWhere(p => p._1 != p._2)}")
      assert(base.nonEmpty, s"$name returned no rows at sf0.001")
    }
  }
}
