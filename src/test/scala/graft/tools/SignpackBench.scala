package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-benchmark: vec_signpack kernel vs interpreted HOF on
  * a widened embeddings corpus (64 dims x ~512k rows via self-union). */
object SignpackBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val big = (1 to 1000).map(_ => base).reduce(_ union _).cache()
    val hof = expr(
      """aggregate(sequence(0, 31), 0L, (acc, i) ->
        |  acc + IF(element_at(embedding, i + 1) > 0D,
        |           shiftleft(1L, i), 0L))""".stripMargin)
    val native = expr("vec_signpack(embedding, 0)")
    big.count() // materialize the cache before timing
    def time(tag: String, c: org.apache.spark.sql.Column): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        big.select(c.as("code")).agg(sum("code")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: ${runs.map(t => f"$t%.2f").mkString(",")} min=${runs.min}%.2f")
      runs.min
    }
    val n = time("native", native)
    val h = time("hof", hof)
    println(f"rows=${big.count()} speedup=${h / n}%.1fx")
    spark.stop()
  }
}
