package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._

/** Dev scratchpad: schema/plan inspection while building queries.
  * Not part of the engine surface.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.lake._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // warm
    spark.range(10).selectExpr("count(*)").collect()

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val schema = StructType.fromDDL("k BIGINT, v STRING")
      val cat = new GraftCatalog(spark,
        graft.ScratchDirs.create("graft-wh-"))
      cat.createNamespace("default")
      val threeDaysMs = 3L * 24 * 3600 * 1000
      val t = time("create")(cat.createTable("default", "events", schema, Map(
        "write.delete.mode" -> "merge-on-read",
        "write.clustered-by" -> "bucket(4,k)",
        "write.clustered-by.files" -> "4",
        "maintenance.compact.min-small-files" -> "8",
        "maintenance.expire.max-age-ms" -> "1",
        "maintenance.expire.retain-last" -> "2",
        "maintenance.orphans.older-than-ms" -> threeDaysMs.toString)))
      def rowsOf(r: Range): DataFrame = spark.createDataFrame(
        r.map(i => Row(i.toLong, s"v$i")).asJava, schema)
      time("append 400")(t.append(rowsOf(0 until 400)))
      Thread.sleep(10)
      time("maintain fresh")(t.maintain())
      time("mor delete")(t.delete(col("k") % 100 === 3))
      time("eligible check")(t.bucketLocalRead("k").isDefined)
      time("deleteFiles count")(t.deleteFiles.count())
      time("pre agg")(t.read().agg(count(lit(1)), sum("k")).head())
      Thread.sleep(10)
      time("maintain compact")(t.maintain())
      time("post agg")(t.read().agg(count(lit(1)), sum("k")).head())
      time("history")(t.history.count())
      Thread.sleep(10)
      time("maintain idle")(t.maintain())
      time("4 thin appends")((0 until 4).foreach(i =>
        t.append(rowsOf(400 + i * 10 until 410 + i * 10))))
      Thread.sleep(10)
      time("maintain small")(t.maintain())
      time("dataFiles count")(t.dataFiles.count())
      time("read count")(t.read().count())
      time("maintain orphan")(t.maintain())
    }
    spark.stop()
  }
}
