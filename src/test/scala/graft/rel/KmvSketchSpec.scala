package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** q_agg_kmv_theta IS oracle-checked (integer-exact estimator, same md5
  * hashes in DuckDB), so the oracle already pins cross-engine equality.
  * What it cannot pin: that the sketch branch actually engages (at
  * sf0.001 every slice is below K and the estimator degenerates to
  * exact), that errors stay useful, and the KMV merge law that makes
  * the sketch STORABLE — the K smallest of a union of per-slice
  * K-smallest sets is exactly the global K-smallest set, so per-slice
  * sketches persisted as rows can answer any cross-slice distinct
  * later without touching facts.
  */
class KmvSketchSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.01"
  private val K = 256

  private def run(): Array[org.apache.spark.sql.Row] =
    graft.SparkEntry.queries("q_agg_kmv_theta")(spark, dir).collect()

  private def hashes(df: DataFrame): DataFrame =
    df.select(col("mode"),
      conv(substring(md5(col("okey").cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))

  private def pr: DataFrame = Tables.orders(spark, dir)
    .select(col("o_orderpriority").as("mode"), col("o_custkey").as("okey"))
    .distinct()

  test("sf0.01 engages the estimating branch (cardinality > K) and " +
    "every estimate stays within 20% of exact") {
    val rows = run()
    assert(rows.length === 15) // 5 slices + 10 pairs
    val singles = rows.filter(_.getAs[String]("b") == "*")
    assert(singles.forall(_.getAs[Long]("exact") > K),
      "slices must exceed K so the sketch actually estimates")
    assert(rows.exists(_.getAs[Long]("err_bp") > 0L),
      "some estimate must differ from exact — otherwise the sketch " +
        "path degenerated to the exact branch")
    rows.foreach { r =>
      assert(r.getAs[Long]("err_bp") < 2000L,
        s"${r.getAs[String]("a")}/${r.getAs[String]("b")}: " +
          s"err ${r.getAs[Long]("err_bp")} bp")
    }
  }

  test("count-min never underestimates, and most of the 31-type " +
    "vocabulary probes exact at d=4/w=64") {
    val rows = graft.SparkEntry.queries("q_agg_cms_freq")(spark, dir)
      .collect()
    assert(rows.length === 31)
    assert(rows.forall(_.getAs[Long]("overcount") >= 0L),
      "CMS can only overcount — an underestimate means broken hashing")
    assert(rows.count(_.getAs[Long]("overcount") == 0L) >= 28,
      "too many collisions for 31 keys in 4x64 counters")
  }

  test("CMS heavy hitters are sound AND complete vs a full exact " +
    "count (overcount-only pruning can never drop a true hitter)") {
    val got = graft.SparkEntry.queries("q_agg_cms_heavy_hitters")(
      spark, dir).collect().map(_.getAs[String]("tok")).toSet
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val total = toks.map(_._2).sum
    val want = toks.filter(_._2 * 30 > total).map(_._1).toSet
    assert(want.nonEmpty, "fixture must have heavy hitters at 1/30")
    assert(got === want)
  }

  test("KMV merge law: K smallest of the union of per-slice K-smallest " +
    "sets equals the direct global K-smallest set") {
    val perSlice = hashes(pr)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("mode").orderBy("h")))
      .filter(col("rk") <= K)
      .select("h").distinct()
      .orderBy("h").limit(K)
    val global = hashes(pr).select("h").distinct()
      .orderBy("h").limit(K)
    assert(perSlice.collect().map(_.getLong(0)).toSeq ===
      global.collect().map(_.getLong(0)).toSeq)
  }
}
