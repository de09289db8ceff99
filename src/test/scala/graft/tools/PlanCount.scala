package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: counts how many times a regex appears in a query's
  * executed plan — used to detect CollapseProject re-inlining blowups
  * in HOF-heavy queries. Not part of the engine surface.
  * Usage: runMain graft.tools.PlanCount <queryName> <regex> [sfDir]
  */
object PlanCount {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val pat = args(1).r
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString
    println(s"occurrences of '${args(1)}': ${pat.findAllIn(p).size}")
    println(s"plan chars: ${p.length}")
    spark.stop()
  }
}
