package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out primitives the 100 TB deployment leans on: bucketed
  * co-partitioned joins (no exchange on either side) and salted
  * two-phase aggregation for skewed keys.
  *
  * These are library helpers, not query-catalog entries: they change
  * HOW a plan executes, not WHAT it computes. ScaleSpec asserts both
  * the physical-plan shape (no Exchange under the bucketed join) and
  * result equality with the unsalted/unbucketed formulations.
  */
object Scale {

  /** Persist `df` as a bucketed, sorted table so repeated equi-joins or
    * aggregations on `keys` run exchange-free: both join sides read
    * pre-hashed buckets, so the 100 TB fact table never reshuffles.
    * (Spark bucketing needs a saveAsTable catalog entry; the in-memory
    * catalog works fine locally, a metastore would back it on a
    * cluster.)
    */
  def bucketize(df: DataFrame, table: String, nBuckets: Int,
      keys: Seq[String]): Unit =
    df.write
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)

  /** Salted two-phase aggregation: spreads a hot group key over
    * `saltBuckets` partial groups, aggregates, then merges. Use when a
    * handful of keys dominate (events.user_id: 15 users at any SF) and
    * AQE's skew handling can't help because the skew is in the GROUP BY,
    * not a join. `partials` maps each aggregate column to its partial
    * expression; `merges` re-aggregates the partials.
    *
    * saltedAgg(df, Seq("user_id"), 16)(
    *   Seq(count(lit(1)).as("n"), sum($"value").as("s")),
    *   Seq(sum($"n").as("n"), sum($"s").as("s")))
    *
    * Phase 1 shuffles on (key, salt) — at most saltBuckets x |keys|
    * groups per reducer; phase 2 shuffles only |keys| pre-aggregated
    * rows.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int)(
      partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    // monotonically_increasing_id cycles through salts within each
    // partition (it embeds the partition id in the high bits), so rows
    // of one hot key spread evenly without a shuffle to assign salts
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }
}
