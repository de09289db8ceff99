package graft.tools

import org.apache.spark.sql.SparkSession

/** Times one named SparkEntry query (bench conditions: local[4],
  * shuffle.partitions=4, noop write, min-of-2). Usage:
  *   runMain graft.tools.TimeOne <queryName> [sfDir]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    val times = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"$name: runs=${times.map(t => f"$t%.2f").mkString(",")} " +
      f"min=${times.min}%.2f")
    spark.stop()
  }
}
