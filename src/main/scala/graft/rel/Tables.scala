package graft.rel

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{DataType, LongType}

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
  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** Probed `ts` type per events path: footer reads are cheap but the
    * loader runs once per query in a 160+-query bench, so cache them. */
  private val tsTypeCache = new ConcurrentHashMap[String, DataType]()

  /** events.ts has shipped in two physical encodings: parquet
    * TIMESTAMP(NANOS) — which Spark's vectorized reader rejects unless
    * the legacy `nanosAsLong` conf surfaces it as a raw int64 — and
    * plain timestamp[us] (isAdjustedToUTC=false), which reads directly
    * as TIMESTAMP_NTZ. Probe the footer schema (with the legacy conf on
    * so a NANOS footer doesn't throw) and branch:
    *   - ts: LongType  ⇒ nanos encoding; keep the conf on for the scan
    *     and rebuild a microsecond TIMESTAMP_NTZ. Integer `div` keeps
    *     the math in long space: ns-since-epoch overflows double.
    *   - ts: timestamp ⇒ cast to TIMESTAMP_NTZ only (session tz is UTC,
    *     values are naive — matches how DuckDB surfaces the column) and
    *     leave the session conf untouched.
    * Both encodings are pinned by fixtures in TablesSpec.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val tsType = tsTypeCache.computeIfAbsent(path, _ => {
      val prev = s.conf.getOption(NanosConf)
      s.conf.set(NanosConf, "true")
      try s.read.parquet(path).schema("ts").dataType
      finally prev match {
        case Some(v) => s.conf.set(NanosConf, v)
        case None => s.conf.unset(NanosConf)
      }
    })
    tsType match {
      case LongType =>
        s.conf.set(NanosConf, "true")
        s.read.parquet(path).withColumn("ts",
          expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case _ =>
        s.read.parquet(path).withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = apply(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = apply(s, dir, "embeddings")
}
