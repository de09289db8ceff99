package graft.lake

import graft.SparkSuite

/** The incremental-maintenance LAW (maintained ≡ recomputed) for the
  * two CDC-fold walks whose bench paths run incremental-only (r17 —
  * the InvertedIndexSpec precedent): with crossCheck = true each
  * window recomputes the state directly from the table and the walk
  * throws on any divergence from the incrementally maintained state.
  * The bench-path results themselves are further pinned by the
  * q_lake_incremental_agg DuckDB oracle (final state hash) and the
  * driver's determinism sweep.
  */
class IncrementalMaintenanceSpec extends SparkSuite {
  test("incremental aggregate state equals a full recompute after " +
    "every window (append, MOR delete, COW update, compact, drop)") {
    val rows = LakeQueries.incrementalAggWalk(spark,
      "/root/testdata/sf0.001", crossCheck = true).collect()
    assert(rows.nonEmpty)
    // the dropped group is gone from the maintained state
    assert(!rows.map(_.getAs[String]("grp")).contains("R"))
  }

  test("incremental MinHash signatures equal a full recompute after " +
    "every window (append, delete, update, compact)") {
    val rows = LakeQueries.incrementalMinhashWalk(spark,
      crossCheck = true).collect()
    assert(rows.map(_.getAs[String]("phase")).distinct.sorted ===
      Array("w1-seed", "w2-append-delete", "w3-update-compact-delete"))
  }
}
