package graft.tools

/** Back-compat guard: pre-r17 manifest JSON (no `ndv` key) must decode
  * through Jackson with the case-class default (empty map), never
  * null, and FileNdv's Seq[Long] must unbox cleanly (the contentAs
  * annotation trap). GraftTableSpec covers the Spark-read twin
  * (entriesDataset's null-coalesce). */
object JacksonCheck {
  def main(args: Array[String]): Unit = {
    val s = """[{"path":"data/x.parquet","content":0,"recordCount":5,
      "fileSizeBytes":10,"addedSnapshotId":1,
      "stats":{},"equalityColumns":[]}]""".stripMargin
    val es = graft.lake.Json.readManifest(s)
    println("ndv=" + es.head.ndv)
    assert(es.head.ndv != null && es.head.ndv.isEmpty,
      s"missing ndv must decode to empty map, got ${es.head.ndv}")
    val s2 = """[{"path":"d.parquet","content":0,"recordCount":1,
      "fileSizeBytes":2,"addedSnapshotId":1,"stats":{},
      "equalityColumns":[],
      "ndv":{"k":{"k":4,"hashes":[1,2]}}}]""".stripMargin
    val e2 = graft.lake.Json.readManifest(s2).head
    println("ndv2=" + e2.ndv)
    val fn = e2.ndv("k")
    assert(fn.k == 4 && fn.hashes == Seq(1L, 2L))
    // the Seq[Long] CCE trap: force unboxing
    val sum: Long = fn.hashes.sum
    println("sum=" + sum + " OK")
  }
}
