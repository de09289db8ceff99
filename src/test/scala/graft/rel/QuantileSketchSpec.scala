package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** q_agg_quantile_sketch IS oracle-checked (integer order statistics,
  * shared md5 hashes), so cross-engine equality is already pinned.
  * What the oracle cannot pin: the MERGE LAW that makes the sketch
  * storable per slice (bottom-K of a union of bottom-Ks ≡ bottom-K of
  * the union — the property the ALL row and any lake rollup rely on),
  * and that the sample order statistics actually track true quantile
  * RANKS within the sampling error bound.
  */
class QuantileSketchSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.01"

  private def rows: DataFrame =
    SketchQueries.quantileRows(Tables.lineitem(spark, dir))

  private def asSet(df: DataFrame): Set[(String, Long, Long)] =
    df.select("slice", "v", "h").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("merge law: sketch(A ∪ B) == sketch(sketch(A) ∪ sketch(B)) " +
    "exactly, for an arbitrary row split") {
    val f = rows
    val a = f.filter(col("h") % 3 === 0)
    val b = f.filter(col("h") % 3 =!= 0)
    val direct = SketchQueries.quantileSketchOf(f)
    val merged = SketchQueries.quantileSketchOf(
      SketchQueries.quantileSketchOf(a)
        .unionByName(SketchQueries.quantileSketchOf(b)))
    assert(asSet(merged) === asSet(direct),
      "merging per-part sketches must reproduce the direct sketch " +
        "bit-for-bit")
  }

  test("sub-K slices retain everything: the sketch is exact below K") {
    val tiny = rows.filter(col("v") % 100 === 0) // sparse subset
    val counts = tiny.groupBy("slice").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assume(counts.values.exists(_ < 512))
    val sk = SketchQueries.quantileSketchOf(tiny)
    val skCounts = sk.groupBy("slice").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (s, n) =>
      assert(skCounts(s) === math.min(n, 512L), s"slice $s")
    }
  }

  test("rank error: each reported quantile's TRUE rank fraction is " +
    "within 10% of its target (4+ sigma for K=512)") {
    val f = rows.cache()
    try {
      val report = graft.SparkEntry
        .queries("q_agg_quantile_sketch")(spark, dir).collect()
      val totals = f.groupBy("slice").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val all = totals.values.sum
      report.foreach { r =>
        val slice = r.getString(0)
        val n = if (slice == "ALL") all else totals(slice)
        for ((p, i) <- Seq(25, 50, 75, 90).zipWithIndex) {
          val est = r.getLong(2 + i)
          val sliceRows =
            if (slice == "ALL") f else f.filter(col("slice") === slice)
          val below = sliceRows.filter(col("v") <= est).count()
          val frac = below.toDouble / n
          assert(math.abs(frac - p / 100.0) < 0.10,
            s"slice $slice p$p: est $est has rank fraction $frac")
        }
      }
    } finally f.unpersist()
  }
}
