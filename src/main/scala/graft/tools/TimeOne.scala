package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev tool: time named queries (after warmup) at a given SF. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries("q_agg_pricing_summary")(spark, dir).count()
    for (n <- names; _ <- 1 to 2) {
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(n)(spark, dir).count()
      println(f"$n rows=$c ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
