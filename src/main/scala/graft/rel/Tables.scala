package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver corpus (/root/repo/TESTDATA.md). Plain parquet
  * scans — Catalyst pushes filters/pruning into them for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, dir: String): DataFrame = apply(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame = apply(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = apply(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = apply(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = apply(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame = apply(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame = apply(s, dir, "region")
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; read it as raw nanos (legacy conf) and rebuild a
    * microsecond TIMESTAMP_NTZ (session tz is UTC, values are naive —
    * matches how DuckDB surfaces the same column). Integer `div` keeps
    * the math in long space: ns-since-epoch overflows double precision.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, dir, "events")
      .withColumn("ts",
        expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }
  def documents(s: SparkSession, dir: String): DataFrame = apply(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = apply(s, dir, "embeddings")
}
