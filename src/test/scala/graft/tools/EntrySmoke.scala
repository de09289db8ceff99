package graft.tools
import org.apache.spark.sql.SparkSession
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    // deliberately NO graft.GraftExtensions — the driver's smoke session
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("entry rows: " + graft.SparkEntry.entry(spark).count())
    // also prove the vec fallback path works on a vanilla session
    println("cosine rows: " + graft.SparkEntry.queries("q_dedup_embedding_cosine")(spark, "/root/testdata/sf0.001").count())
    spark.stop()
  }
}
