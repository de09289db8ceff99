package graft.lake

import graft.SparkSuite

/** The q_lake_vector_index invariant: IVF-PQ served from the STORED
  * (vec_id, cell, codes) index table must be bit-identical to the same
  * pipeline recomputed from the current raw vectors — after a mixed
  * window that inserts new vectors and equality-deletes indexed ones.
  * As with the inverted index, the recompute stays out of the bench
  * path and runs here with crossCheck = true (serve() throws on any
  * divergence).
  */
class VectorIndexSpec extends SparkSuite {
  test("index-served IVF-PQ top-10 equals the raw-vector recompute " +
    "after a mixed insert+delete maintenance window") {
    val rows = LakeQueries.vectorIndexScenario(spark,
      "/root/testdata/sf0.001", crossCheck = true)
      .collect()
    assert(rows.length === 20) // top-10 per window
    assert(rows.map(_.getAs[String]("phase")).distinct.sorted ===
      Array("w1-seed", "w2-grow-delete"))
    // deleted vectors must be gone from the served results
    assert(rows.filter(_.getAs[String]("phase") == "w2-grow-delete")
      .forall(r => r.getAs[Long]("vec_id") % 7 != 0))
  }
}
