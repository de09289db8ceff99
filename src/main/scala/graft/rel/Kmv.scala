package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared KMV/theta sketch building blocks. Four surfaces build the
  * same sketch and are contractually bit-identical (each is pinned by
  * an oracle or a spec): q_agg_kmv_theta (SketchQueries), the
  * q_stream_kmv_distinct batch twin (StreamBatchQueries), the lake
  * sketch rollup (LakeQueries), and the streaming processor's JVM-side
  * fold ([[graft.streaming.Streams.kmvHash60]], whose bit-parity with
  * [[hash60]] is pinned in StreamingSpec). Change the hash prefix, the
  * domain, or the ladder here and every consumer moves together.
  */
object Kmv {

  /** 2^60 — the hash domain: 15 hex chars of md5, so values fit a
    * signed BIGINT identically in Spark and DuckDB. */
  val Dom = 1152921504606846976L
  val DomStr = "1152921504606846976"

  /** 60-bit md5 hash of a key column, bit-identical to the DuckDB
    * oracle's `CAST(concat('0x', substr(md5(CAST(k AS VARCHAR)), 1,
    * 15)) AS BIGINT)`. */
  def hash60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** Two-level salted K-smallest of `h` per slice: the salted level
    * bounds every reducer's candidate set at `salt * k` rows (no
    * reducer ever materializes a slice's full hash set), and the K
    * smallest of the union of per-salt K-smallest sets is exactly the
    * global K smallest (ScaleSpec proves both properties at 1M keys).
    * Input needs columns `slice ++ ("h")`; output keeps them. */
  def kSmallest(df: DataFrame, k: Int, slice: Seq[String],
      salt: Int = 32): DataFrame = {
    val lvl1 = df
      .withColumn("rk", row_number().over(
        Window.partitionBy(slice.map(col) :+ pmod(col("h"), lit(salt)): _*)
          .orderBy("h")))
      .filter(col("rk") <= k).drop("rk")
    lvl1
      .withColumn("rk", row_number().over(
        Window.partitionBy(slice.map(col): _*).orderBy("h")))
      .filter(col("rk") <= k).drop("rk")
  }

  /** Per-slice (cnt, theta) from a retained-hash table: theta is the
    * kth smallest when the sketch is full, else the whole domain (the
    * sketch is exact below k). */
  def thetaAggs(k: Int): Seq[Column] = Seq(
    count(lit(1)).as("cnt"),
    when(count(lit(1)) < k, expr(DomStr)).otherwise(max("h")).as("theta"))

  /** The KMV estimator over named `cnt`/`theta` columns:
    * (k-1) * 2^60 div theta, exact-count passthrough below k —
    * integer-only, bit-equal with the DuckDB HUGEINT `//` form. */
  def estimate(k: Int): Column =
    when(col("cnt") < k, col("cnt")).otherwise(expr(
      s"CAST((${k - 1} * CAST($DomStr AS DECIMAL(38,0))) div theta " +
        "AS BIGINT)"))
}
