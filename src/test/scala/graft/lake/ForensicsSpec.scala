package graft.lake

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** D16: the "deleted but still present" forensics chain the reference
  * demonstrates (cleanup_utils.py:133-203) — tombstones readable as
  * relations, masked rows recoverable until rewrite, orphans sweepable.
  */
class ForensicsSpec extends SparkSuite {

  private val schema = StructType.fromDDL(
    "case_id STRING, first_name STRING, update_date DATE")

  private def mkTable(): GraftTable = {
    val cat = new GraftCatalog(spark, graft.ScratchDirs.create("graft-fx-"))
    cat.createNamespace("default")
    val t = cat.createTable("default", "pii", schema,
      Map("write.delete.mode" -> "merge-on-read"))
    t.append(spark.createDataFrame(Seq(
      Row("case-1", "John", java.sql.Date.valueOf("2023-01-01")),
      Row("case-2", "Jane", java.sql.Date.valueOf("2023-01-02")),
      Row("case-3", "Alice", java.sql.Date.valueOf("2023-01-03"))
    ).asJava, schema))
    t
  }

  test("MOR-deleted rows remain recoverable from storage until rewrite " +
    "permanently applies the deletes") {
    val t = mkTable()
    t.delete(col("case_id") === "case-2")
    // table read hides the row...
    assert(!t.read().collect().map(_.getString(0)).contains("case-2"))
    // ...but forensics proves it still exists
    assert(Forensics.deleteFiles(t).count() == 1)
    val masked = Forensics.maskedButPresent(t).collect()
    assert(masked.map(_.getString(0)).toSeq == Seq("case-2"))
    assert(Forensics.positionDeleteRows(t).columns.toSeq ==
      Seq("file_path", "pos"))
    // permanent erasure: rewrite applies deletes, drops tombstones
    t.rewriteDataFiles(Map("rewrite-all" -> "true"))
    t.rewritePositionDeleteFiles()
    assert(Forensics.deleteFiles(t).count() == 0)
    assert(Forensics.maskedButPresent(t).count() == 0)
  }

  test("planted orphan is invisible to reads, found and swept by " +
    "removeOrphanFiles") {
    val t = mkTable()
    val orphan = Forensics.plantOrphan(t, spark.createDataFrame(Seq(
      Row("orphan-1", "Ghost", java.sql.Date.valueOf("2023-01-03"))
    ).asJava, schema))
    assert(Files.exists(orphan))
    assert(t.read().count() == 3) // metadata never saw the orphan
    val swept = t.removeOrphanFiles(
      System.currentTimeMillis() + 1000, force = true)
    assert(swept.contains(orphan.toString))
    assert(!Files.exists(orphan))
    assert(t.read().count() == 3)
  }
}
