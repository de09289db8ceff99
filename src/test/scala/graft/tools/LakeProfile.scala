package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Dev tool: break down where a lake scenario's wall time goes —
  * tiny-write jobs, collects, commit metadata IO. */
object LakeProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(op: => A): A = {
      val t0 = System.nanoTime(); val r = op
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e6}%8.1f ms"); r
    }
    import scala.jdk.CollectionConverters._
    val sch = StructType.fromDDL("id STRING, grp STRING, amount BIGINT")
    def df(n: Int) = spark.createDataFrame(
      (0 until n).map(i => Row(s"r$i", "g", i.toLong)).asJava, sch)
    // warm
    (1 to 3).foreach { _ =>
      val d = graft.ScratchDirs.create("lp-")
      df(3).write.mode("overwrite").parquet(d.toString + "/w")
    }
    (1 to 3).foreach { i =>
      val d = graft.ScratchDirs.create("lp-")
      time(s"tiny write.parquet #$i") {
        df(3).write.parquet(d.toString + "/t") }
      time(s"tiny collect #$i") { df(3).collect() }
      time(s"tiny groupBy collect #$i") {
        df(3).groupBy("grp").count().collect() }
      time(s"read back collect #$i") {
        spark.read.parquet(d.toString + "/t").collect() }
    }
    val wh = graft.ScratchDirs.create("lp-wh-")
    val t = time("GraftTable.create") {
      graft.lake.GraftTable.create(spark, wh.resolve("t"), "t", sch) }
    (1 to 3).foreach { i =>
      time(s"t.append 3 rows #$i") { t.append(df(3)) } }
    time("t.read.collect") { t.read().collect() }
    time("t.delete one") {
      t.delete(org.apache.spark.sql.functions.col("id") === "r1") }
    time("t.read.collect post-del") { t.read().collect() }
    spark.stop()
  }
}
