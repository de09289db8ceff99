package graft.lake

import graft.SparkSuite

/** The q_lake_inverted_index invariant: BM25 served from the STORED
  * postings/doc-length tables must be bit-identical to a direct
  * corpus-scan BM25 for EVERY document, after a mixed window that both
  * inserts new docs and equality-deletes existing ones out of the
  * index. The bench-path query skips the direct recompute (it would
  * double the job count for an invariant this spec pins on every run);
  * here the scenario runs with crossCheck = true, which requires
  * full-score equality inside serve() and throws on divergence.
  */
class InvertedIndexSpec extends SparkSuite {
  test("index-served BM25 equals direct corpus-scan BM25 for every doc " +
    "after a mixed insert+delete maintenance window") {
    val rows = LakeQueries.invertedIndexScenario(spark,
      "/root/testdata/sf0.001", crossCheck = true)
      .collect()
    // both windows emitted a top-5 (the cross-check ran inside serve)
    assert(rows.length === 10)
    assert(rows.map(_.getAs[String]("phase")).distinct.sorted ===
      Array("w1-seed", "w2-grow-delete"))
    assert(rows.forall(_.getAs[Long]("score_micro") > 0L))
  }
}
