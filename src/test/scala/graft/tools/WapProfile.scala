package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.lake.GraftCatalog

/** Dev tool: per-action wall-time breakdown of the q_lake_wap walk. */
object WapProfile {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import scala.jdk.CollectionConverters._
    val piiSchema = StructType.fromDDL(
      "case_id STRING, first_name STRING, email_address STRING, " +
        "key_nm STRING, secure_txt STRING, secure_key STRING, " +
        "update_date DATE")
    def seedRows = Seq(
      Row("case-1", "John", "john.doe@example.com", "key1",
        "secret text 1", "secret_key_1",
        java.sql.Date.valueOf("2023-01-01")),
      Row("case-2", "Jane", "jane.roe@example.com", "key2",
        "secret text 2", "secret_key_2",
        java.sql.Date.valueOf("2023-01-02")),
      Row("case-3", "Alice", "alice@example.com", "key3",
        "secret text 3", "secret_key_3",
        java.sql.Date.valueOf("2023-01-03")))
    def walk(label: String): Unit = {
      var last = System.nanoTime()
      def mark(what: String): Unit = {
        val now = System.nanoTime()
        println(f"[$label] $what: ${(now - last) / 1e6}%.0f ms")
        last = now
      }
      val cat = new GraftCatalog(s, graft.ScratchDirs.create("graft-wh-"))
      cat.createNamespace("default")
      val t = cat.createTable("default", "pii_data", piiSchema,
        Map("write.delete.mode" -> "merge-on-read",
          "write.update.mode" -> "copy-on-write"))
      mark("create")
      t.append(s.createDataFrame(seedRows.asJava, piiSchema))
      mark("seed-append")
      t.createBranch("staging")
      mark("createBranch")
      t.appendToBranch("staging", s.createDataFrame(Seq(
        Row("case-4", "Eve", "eve@example.com", "key4", "secret text 4",
          "secret_key_4", java.sql.Date.valueOf("2023-02-01"))).asJava,
        piiSchema))
      mark("appendToBranch")
      t.deleteOnBranch("staging", col("case_id") === "case-2")
      mark("deleteOnBranch")
      t.readRef("staging").select("case_id").collect()
      mark("readRef-collect")
      t.read().select("case_id").collect()
      mark("read-main-collect")
      t.fastForward("main", t.refSnapshotId("staging"))
      mark("fastForward")
      t.read().select("case_id").collect()
      mark("read-after-collect")
      s.conf.set("spark.wap.branch", "audit2")
      t.append(s.createDataFrame(Seq(
        Row("case-5", "Gil", "gil@example.com", "key5", "secret text 5",
          "secret_key_5", java.sql.Date.valueOf("2024-02-01"))).asJava,
        piiSchema))
      mark("wap-append")
      t.delete(col("case_id") === "case-1")
      mark("wap-delete")
      t.read().select("case_id").collect()
      mark("wap-read-staged")
      t.readAt(t.currentSnapshot.get.snapshotId).select("case_id")
        .collect()
      mark("wap-read-main")
      s.conf.unset("spark.wap.branch")
      t.fastForward("main", t.refSnapshotId("audit2"))
      mark("fastForward2")
      t.read().select("case_id").collect()
      mark("final-read")
    }
    walk("warm-up")
    walk("measured")
    s.stop()
  }
}
