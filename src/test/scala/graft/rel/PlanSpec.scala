package graft.rel

import graft.SparkSuite
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan regression tests: the properties that make these
  * queries survive a 100 TB scale-up are asserted, not hoped for —
  * column pruning into the parquet scan, predicate pushdown, broadcast
  * joins for dimension tables, partial (map-side) aggregation, and the
  * absence of cartesian products in equi-join pipelines.
  */
class PlanSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("scan projection prunes columns at the parquet reader") {
    val p = plan("q_scan_projection")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_extendedprice:double,l_returnflag:string>"), p)
    assert(!p.contains("l_comment") && !p.contains("l_partkey"))
  }

  test("IN filter is pushed to the parquet scan") {
    val p = plan("q_filter_in")
    assert(p.contains("PushedFilters: [In(event_type"), p)
  }

  test("dimension joins broadcast: no shuffle of the fact side") {
    val p = plan("q_join_left_chain")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "dimension join fell back to SMJ")
  }

  test("aggregation is partial before the exchange (map-side combine)") {
    val p = plan("q_agg_pricing_summary")
    assert(p.contains("partial_sum"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("as-of join plans as a single window, not a range join") {
    val p = plan("q_join_asof")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "as-of regressed to a quadratic join")
  }

  test("langid profile join broadcasts the tiny profile side") {
    val p = plan("q_text_langid")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("embedding cosine resolves the native vec_dot kernel, not the" +
    " UDF fallback") {
    val p = plan("q_dedup_embedding_cosine")
    assert(p.contains("vec_dot"), "native kernel not in the plan:\n" + p)
    assert(!p.toLowerCase.contains("batchevalpython") &&
      !p.contains("ScalaUDF"), "fell back to a UDF")
  }

  test("minhash LSH candidate join is an equi-join on buckets") {
    val p = plan("q_dedup_minhash_lsh")
    assert(!p.contains("CartesianProduct"),
      "LSH candidate generation degenerated to all-pairs")
  }

  test("substring coverage: equi-join on the window text, one per-doc " +
    "interval window, partial agg before the dup-count exchange, " +
    "never all-pairs") {
    val p = plan("q_dedup_substring")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "duplicated-window detection degenerated to all-pairs")
    assert(p.contains("partial_count"),
      "dup-window count must combine map-side before the exchange")
    assert("(?s)Window".r.findAllIn(p).size >= 1 &&
      p.contains("specifiedwindowframe(RowFrame, unboundedpreceding"),
      "interval union must be the running-max window, not a self-join")
  }

  test("nearest as-of runs both direction passes over ONE user-keyed " +
    "exchange: two windows, re-sorted not re-shuffled") {
    val p = plan("q_join_asof_nearest")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "nearest as-of degenerated to a range join")
    assert("""\(\d+\) Window""".r.findAllIn(p).size == 2, p.take(1500))
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      "both windows must share one user_id exchange")
  }

  test("substring rewrite picks first occurrences with a partial-" +
    "aggregable min, not a per-gram window (mega-duplicated grams " +
    "would skew a row_number partition)") {
    val p = plan("q_dedup_substring_rewrite")
    assert(p.contains("partial_min"),
      "first-occurrence selection must combine map-side")
    assert(!p.contains("row_number"),
      "rewrite must not rank occurrences with a window")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("BPE pair counting aggregates the vocabulary first: corpus-" +
    "sized work is one word count, pair explosion is post-agg, top-k " +
    "is TakeOrderedAndProject") {
    val p = plan("q_text_bpe_pairs")
    assert(p.contains("partial_count"),
      "word count must combine map-side")
    assert(p.contains("partial_sum"),
      "pair count must combine map-side")
    assert(p.contains("TakeOrderedAndProject"),
      "top-30 must not be a global sort")
    // exactly two explodes: the corpus token explode and the post-agg
    // vocab pair explode — a third would mean pair generation ran over
    // raw corpus rows ("(N) Generate" counts operators, not tree lines)
    assert("""\(\d+\) Generate""".r.findAllIn(p).size == 2, p)
  }

  test("sequence packing windows per shard, never a single global " +
    "partition") {
    val p = plan("q_pipe_pack")
    assert(p.contains("Window"), p)
    assert(!p.contains("partitionBy: []") &&
      !p.contains("SinglePartition"),
      "packing window collapsed to one partition:\n" + p)
  }

  test("split/sample/redact stay map-side: md5 bucketing and regex " +
    "scrubbing add no extra shuffle beyond the declared agg/sort") {
    // split: scan -> project(md5 bucket) -> partial agg -> exchange ->
    // agg -> sort; exactly the 1 aggregate exchange + 1 sort exchange
    val ps = plan("q_pipe_split")
    assert(ps.sliding("Exchange".length).count(_ == "Exchange") <= 4, ps)
    assert(ps.contains("partial_count"), "split agg lost map-side combine")
    // redact: no aggregate at all — a projection plus the final sort
    val pr = plan("q_text_pii_redact")
    assert(!pr.contains("HashAggregate"), pr)
    assert(!pr.contains("ScalaUDF") &&
      !pr.toLowerCase.contains("batchevalpython"),
      "redaction fell back to a UDF")
  }

  test("binned range join plans as an equi join on the bin, never a " +
    "nested-loop pair build") {
    val p = plan("q_join_range_binned")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "range join degenerated to all-pairs:\n" + p)
    assert(p.contains("Generate") && p.contains("explode(sequence"),
      "bin expansion missing:\n" + p)
  }

  test("kNN join (small-n exact path) broadcasts the vector side and " +
    "pushes the rank limit below the shuffle") {
    val p = plan("q_sim_knn_join")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "pair scoring should broadcast the compact (id, vec, norm) side:\n" + p)
    assert(p.contains("WindowGroupLimit"),
      "per-vector top-k not pushed below the rank shuffle (every pair " +
        "would shuffle at 100 TB):\n" + p)
    assert(p.contains("vec_dot"), "native kernel not in the plan:\n" + p)
  }

  test("kNN join above the exact-row threshold routes to the IVF cell " +
    "equi-join: no all-pairs join, no full-relation broadcast") {
    // emulate large-n planning: row count above the exact cap AND
    // broadcast disabled, as cost-based planning would decide at 100 TB
    spark.conf.set("spark.graft.knn.exactMaxRows", "100")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("q_sim_knn_join")
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        "large-n kNN regressed to an all-pairs join:\n" + p)
      assert(!p.contains("BroadcastExchange"),
        "large-n kNN still broadcasts a relation (the centroid table is " +
          "an embedded literal, nothing should broadcast):\n" + p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "cell candidate join missing:\n" + p)
      assert(p.contains("WindowGroupLimit"),
        "per-vector top-k not pushed below the rank shuffle:\n" + p)
      assert(p.contains("vec_dot"), "native kernel not in the plan:\n" + p)
    } finally {
      spark.conf.unset("spark.graft.knn.exactMaxRows")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("repetition filter shuffles bigram counts once, map-side partial " +
    "first, no UDF") {
    val p = plan("q_text_repetition")
    assert(p.contains("partial_count"), "bigram count lost map-side combine")
    assert(!p.contains("ScalaUDF") &&
      !p.toLowerCase.contains("batchevalpython"),
      "bigram formation fell back to a UDF:\n" + p)
  }

  test("upsampling explodes map-side: the count-distinct's two agg " +
    "exchanges plus the final sort only") {
    val p = plan("q_pipe_upsample")
    assert(p.contains("Generate") && p.contains("explode(sequence"), p)
    // formatted mode names each Exchange twice (tree + detail): 3
    // shuffles = distinct partial, final agg, presentation sort. The
    // explode itself must add none.
    assert(p.sliding("Exchange".length).count(_ == "Exchange") <= 6,
      "upsample added an unexpected shuffle:\n" + p)
  }

  test("Q6 pushes all three predicates into the parquet scan and " +
    "aggregates without any group shuffle") {
    val p = plan("q_tpch_q6_forecast_revenue")
    assert(p.contains("PushedFilters:") && p.contains("l_shipdate"),
      "date filter not pushed:\n" + p)
    assert(p.contains("partial_sum"), "scalar agg lost map-side combine")
  }

  test("Q13 aggregates orders BEFORE the customer join: the outer join " +
    "sees group rows, not raw orders") {
    val p = plan("q_tpch_q13_custdist")
    val joinIdx = p.indexOf("Join")
    val aggIdx = p.indexOf("HashAggregate")
    assert(aggIdx >= 0 && joinIdx >= 0 && aggIdx < joinIdx,
      "per-custkey pre-aggregation did not run below the join:\n" + p)
  }

  test("pivot with declared values reads the table once: no " +
    "distinct-discovery scan, map-side partial agg kept") {
    val p = plan("q_agg_pivot")
    // one "Location:" per scan node in formatted mode
    assert(p.linesIterator.count(_.trim.startsWith("Location:")) == 1,
      "pivot scanned the table more than once:\n" + p)
    assert(p.contains("partial_sum"), p)
  }

  test("full outer join of pre-aggregated sides keeps both inputs " +
    "reduced and never goes cartesian") {
    val p = plan("q_join_full_outer")
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("hamming top-k packs codes map-side: broadcast 1-row query, " +
    "TakeOrderedAndProject, no vector shuffle") {
    val p = plan("q_sim_topk_hamming")
    assert(p.contains("vec_signpack"),
      "native sign-pack kernel not in the plan:\n" + p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "vector rows shuffled for a 1-row query side:\n" + p)
  }

  test("mixture weights: one bounded group-by plus a 1-row broadcast, " +
    "no UDF, no second corpus scan above the agg") {
    val p = plan("q_pipe_mixture")
    assert(p.contains("partial_sum") && p.contains("partial_count"),
      "token sums lost map-side combine:\n" + p)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("LIKE predicates push all three string-match classes into the " +
    "parquet scan") {
    val p = plan("q_filter_like")
    assert(p.contains("StringStartsWith"), "prefix LIKE not pushed:\n" + p)
    assert(p.contains("StringEndsWith"), "suffix LIKE not pushed:\n" + p)
    assert(p.contains("StringContains"), "infix LIKE not pushed:\n" + p)
  }

  test("interleave keeps the rank window keyed on source and takes the " +
    "epoch prefix with TakeOrderedAndProject, no global-window " +
    "single partition") {
    val p = plan("q_pipe_interleave")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("partitionBy: []") && !p.contains("SinglePartition"),
      "epoch order collapsed to one partition:\n" + p)
  }

  test("relational sessionization shares one shuffle between both " +
    "windows: lag and the running boundary sum use the same " +
    "(user_id, ts, event_id) order") {
    val p = plan("q_window_sessionize")
    // windows + agg + final sort; formatted mode names each Exchange
    // twice. One extra shuffle would mean the windows diverged.
    assert(p.sliding("Exchange".length).count(_ == "Exchange") <= 6,
      "sessionization windows stopped sharing a shuffle:\n" + p)
    assert(!p.contains("SinglePartition"),
      "sessionization collapsed to one partition:\n" + p)
  }

  test("containment pairs come from the sparse shingle equi-join, " +
    "never all-pairs") {
    val p = plan("q_dedup_containment")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "containment degenerated to all-pairs:\n" + p)
  }

  test("entropy and bigram-LM scores keep map-side partial counts and " +
    "no UDFs") {
    Seq("q_text_entropy", "q_text_logprob_bigram").foreach { q =>
      val p = plan(q)
      assert(p.contains("partial_count") || p.contains("partial_sum"),
        s"$q lost map-side combine:\n" + p)
      assert(!p.contains("ScalaUDF"), s"$q fell back to a UDF:\n" + p)
    }
  }

  test("cluster-resolution edges come from an equi-join, not a " +
    "cartesian pair build") {
    val p = graft.llm.DedupQueries
      .jaccardPairs(graft.llm.DedupQueries.shingleSets(
        Tables.documents(spark, dir)), "sh")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "dup-pair generation degenerated to all-pairs:\n" + p)
  }

  test("LM-score queries scan the corpus exactly twice: model pass + " +
    "scoring pass, totals from a bounded window not a third scan") {
    Seq("q_text_logprob", "q_text_ppl_buckets", "q_pipe_importance")
      .foreach { q =>
        val p = plan(q)
        // formatted mode names each scan twice (tree + detail):
        // 2 scan nodes => 4 mentions
        val scans = "Scan parquet".r.findAllIn(p).size
        assert(scans == 4, s"$q scans the corpus ${scans / 2} times:\n" + p)
      }
  }

  test("PQ encoding, hashed classifier, and stratified sampling stay " +
    "map-side: no join, no aggregate exchange, no UDF before the sort") {
    Seq("q_sim_pq_codes", "q_text_hash_classifier", "q_pipe_stratified")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("Join"), s"$q grew a join:\n" + p)
        assert(!p.contains("HashAggregate"),
          s"$q grew a shuffling aggregate:\n" + p)
        assert(!p.contains("ScalaUDF") &&
          !p.toLowerCase.contains("batchevalpython"),
          s"$q fell back to a UDF:\n" + p)
      }
  }

  test("PQ/ADC search broadcasts only the 1-row LUT and ends in a " +
    "TakeOrderedAndProject, never a global sort of scored vectors") {
    val p = plan("q_sim_topk_adc")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k fell back to a global sort:\n" + p)
    assert(!p.contains("HashAggregate"),
      "ADC scoring grew a shuffling aggregate:\n" + p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the 1-row LUT join shuffled instead of broadcasting:\n" + p)
    assert(p.contains("pq_encode") && p.contains("pq_adc"),
      "native PQ kernels not in the plan (interpreted HOF encode " +
        "measured ~40 ms/row):\n" + p)
    val pc = plan("q_sim_pq_codes")
    assert(pc.contains("pq_encode"),
      "native PQ kernel not in the encode plan:\n" + pc)
  }

  test("token-budget selection is one corpus shuffle: the per-source " +
    "aggregate reuses the budget window's exchange") {
    val p = plan("q_pipe_token_budget")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 2, s"corpus scanned ${scans / 2} times:\n" + p)
    // formatted mode names each Exchange twice: window shuffle + the
    // bounded final sort = 2 exchanges; a third would mean the
    // source-keyed groupBy re-shuffled data the window already keyed
    val ex = p.sliding("Exchange".length).count(_ == "Exchange")
    assert(ex <= 4, s"budget selection grew an extra shuffle:\n" + p)
  }

  test("curation funnel evaluates all stages as flags — no per-stage " +
    "corpus re-scan (4 scans: flags pass + the coverage pipeline)") {
    val p = plan("q_pipe_curation_funnel")
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 8, s"funnel re-scans per stage (${scans / 2}):\n" + p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "funnel degenerated to all-pairs:\n" + p)
  }

  test("IVF-PQ serving plan is one scan, zero exchanges: map-side " +
    "coarse argmin + probe filter + kernel ADC into TakeOrdered") {
    val p = plan("q_sim_topk_ivfpq")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k fell back to a global sort:\n" + p)
    assert(!p.contains("Exchange"),
      "IVF-PQ grew a shuffle/broadcast — probe list and LUT must stay " +
        "driver-computed literals:\n" + p)
    assert(!p.contains("Join"), "IVF-PQ grew a join:\n" + p)
    assert(p.contains("pq_encode") && p.contains("pq_adc"),
      "native PQ kernels not in the plan:\n" + p)
    // the probe filter must reach the row BEFORE fine scoring, and the
    // coarse argmin must not rebuild the quantized array per element
    // (element_at over an inlined transform re-evaluates the transform)
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 2, s"corpus scanned ${scans / 2} times:\n" + p)
    assert(!p.contains("element_at(transform("),
      "coarse argmin quantizes via an inlined transform — 64x " +
        "redundant per-element work:\n" + p)
  }

  test("adapted TPC-H q2/q9/q11/q20 broadcast every dimension side and " +
    "never build a cartesian pair set") {
    Seq("q_tpch_q2_min_cost_supplier", "q_tpch_q9_product_profit",
      "q_tpch_q20_excess_suppliers")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin"),
          s"$q degenerated to all-pairs:\n" + p)
        assert(p.contains("BroadcastHashJoin"),
          s"$q shuffles a dimension join:\n" + p)
        assert(p.contains("partial_"),
          s"$q lost map-side partial aggregation:\n" + p)
      }
    // q11's global threshold joins a broadcast 1-ROW aggregate under
    // the comparison (that nested-loop join is over one row — fine);
    // no cartesian over base relations, dims still broadcast-hash.
    val p11 = plan("q_tpch_q11_important_stock")
    assert(!p11.contains("CartesianProduct"), p11)
    assert(p11.contains("BroadcastHashJoin"), p11)
    assert(p11.contains("BroadcastExchange"), p11)
    assert(p11.contains("partial_"), p11)
  }

  test("semantic dedup reuses the checkpointed cell assignment on " +
    "every side instead of recomputing the centroid pipeline") {
    val p = plan("q_dedup_semantic")
    assert(!p.contains("Scan parquet"),
      "assignment recomputed from the raw table:\n" + p)
    assert(!p.contains("Window"),
      "assignment fell back to a per-vector window:\n" + p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "cell self-join degenerated to all-pairs:\n" + p)
  }
}
