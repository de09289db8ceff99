package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Scale proof for SemDeDup overflow splitting
  * ([[CurationQueries.overflowSplit]]): on a 1M-vector corpus with a
  * fixed 5-cell vocabulary (the q_dedup_semantic failure mode — cells
  * grow linearly with the corpus), the centroid-hyperplane sub-blocking
  * must cap block sizes near `cap` so the candidate pair count stays
  * ~n·cap (O(n^1.5)) instead of the unsplit O((n/k)²).
  */
class SemanticBlockingSpec extends SparkSuite {

  test("1M-vector corpus: blocks bounded, pair count ~n·cap") {
    val n = 1000000L
    val dims = 8
    // deterministic pseudo-random vectors via xxhash64(id, dim): sign
    // of each dim is equidistributed and independent across dims
    val vecs = spark.range(n)
      .select(col("id").as("vec_id"),
        expr(s"transform(sequence(1, $dims), " +
          "j -> (CAST(pmod(xxhash64(id, j), 2000) AS DOUBLE) - 1000.0) " +
          "/ 1000.0)")
          .as("v"),
        (col("id") % 5).as("cell"))
    val cen = vecs
      .select(col("cell").as("label"),
        posexplode(col("v")).as(Seq("dim", "val")))
      .groupBy("label", "dim")
      .agg(round(avg(col("val")), 4).as("m"))
      .groupBy(col("label").as("cl"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, m))), " +
        "s -> s.m)").as("cen"))
    val caps = spark.range(1).select(greatest(lit(50L),
      (ceil(sqrt(lit(n.toDouble))) * 2).cast("long")).as("cap"))
    val cap = 2000L // = max(50, 2*ceil(sqrt(1e6))); pinned for asserts

    val blocks = CurationQueries.overflowSplit(vecs, cen, caps)
      .groupBy("cell", "sub").agg(count(lit(1)).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // every 200k-row cell split into 2^7 = 128 sub-blocks
    // (b = ceil(log2(200000/2000)) = 7)
    assert(blocks.map(_._1).distinct.length === 5)
    assert(blocks.length === 5 * 128, s"got ${blocks.length} blocks")
    // block-size bound: hyperplane splits are expected-even, not
    // guaranteed-even; 4x slack over the target cap
    val maxBlock = blocks.map(_._3).max
    assert(maxBlock <= 4 * cap, s"max block $maxBlock > ${4 * cap}")
    // candidate pair count: ~n·cap, orders of magnitude under the
    // unsplit O((n/5)²) = 2e11/5·… (a single 200k cell alone is 2e10)
    val pairs = blocks.map(b => b._3 * (b._3 - 1) / 2).sum
    assert(pairs <= n * cap, s"pair count $pairs > ${n * cap}")
    assert(pairs > 0)
  }
}
