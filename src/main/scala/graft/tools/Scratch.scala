package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratchpad: schema/plan inspection while building queries.
  * Not part of the engine surface.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("events", "lineitem", "orders", "embeddings", "documents")) {
      println(s"=== $t")
      val df = spark.read.parquet(s"$dir/$t.parquet")
      df.printSchema()
      df.show(2, 60, vertical = true)
    }
    spark.stop()
  }
}
