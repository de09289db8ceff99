package graft.lake

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** S6 + S8: summary sink writes run_id-partitioned parquet with the
  * fixed DDL schema, appends across runs, and round-trips.
  */
class FileSummarySinkSpec extends SparkSuite {

  test("persist appends run_id partitions; empty-frame union keeps schema") {
    import scala.jdk.CollectionConverters._
    val out = graft.ScratchDirs.create("graft-summary-sink").toString
    val schema = StructType.fromDDL(FileSummary.summarySchemaDdl)
    def mk(runId: String, n: Long) = spark.createDataFrame(Seq(
      Row("wh/data", "data", "parquet",
        java.sql.Timestamp.valueOf("2023-01-01 00:01:00"), n, runId, "append")
    ).asJava, schema)

    FileSummary.persist(spark, mk("run-1", 3L), out)
    FileSummary.persist(spark, mk("run-2", 5L), out)

    val back = spark.read.parquet(out)
    assert(back.count() == 2)
    // partition pruning: reading one run touches one partition dir
    val one = back.filter(col("run_id") === "run-2")
    assert(one.collect().map(_.getAs[Long]("files_in_catalog")).toSeq == Seq(5L))
    val dirs = Files.list(java.nio.file.Paths.get(out)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("run_id=")).toSet
    assert(dirs == Set("run_id=run-1", "run_id=run-2"))
    // schema stability through the empty-frame union
    assert(spark.read.parquet(out).columns.sorted.toSeq ==
      schema.fieldNames.sorted.toSeq)
  }
}
