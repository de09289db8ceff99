package graft.lake

import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** D16 delete-file forensics — the reference's
  * `cleanup_utils.examine_delete_files` / `create_orphaned_files`
  * (/root/reference/notebooks/utils/cleanup_utils.py:73-203) as
  * relations instead of prints: each inspection returns a DataFrame so
  * the "PII persists after DELETE" evidence is queryable/joinable, not
  * console output.
  */
object Forensics {

  /** Delete files currently referenced by the table
    * (cleanup_utils.py:145-147 `files.filter("content IN (1,2)")`).
    * Empty result = "all deletes have been properly applied". */
  def deleteFiles(t: GraftTable): DataFrame =
    t.files.filter(col("content").isin(1, 2))
      .select("file_path", "content", "record_count")

  /** Raw contents of every position-delete file — the (file_path, pos)
    * tombstones (cleanup_utils.py:167). */
  def positionDeleteRows(t: GraftTable): DataFrame = {
    val paths = t.files.filter(col("content") === 1)
      .select("file_path").collect().map(_.getString(0))
    if (paths.isEmpty)
      return t.spark.createDataFrame(
        new java.util.ArrayList[Row](),
        org.apache.spark.sql.types.StructType.fromDDL(
          "file_path string, pos bigint"))
    t.spark.read.parquet(paths.toIndexedSeq: _*)
  }

  /** The reference's DANGER payoff (cleanup_utils.py:183-196): rows that
    * were "deleted" via MOR position deletes but still physically exist
    * in data files. Joins the tombstones back to the raw data-file rows
    * by (file, position) — a semi-join keyed on lineage columns, with
    * the (small) tombstone side broadcast. Empty after
    * rewriteDataFiles + rewritePositionDeleteFiles: the proof that
    * permanent erasure actually happened.
    */
  def maskedButPresent(t: GraftTable): DataFrame = {
    val dels = positionDeleteRows(t)
      .select(udfNorm(col("file_path")).as("del_file"), col("pos"))
    val dataPaths = t.files.filter(col("content") === 0)
      .select("file_path").collect().map(_.getString(0))
    if (dataPaths.isEmpty) return t.read().limit(0)
    val raw = t.spark.read.schema(t.schema).parquet(dataPaths.toIndexedSeq: _*)
      .select(col("*"),
        udfNorm(col("_metadata.file_path")).as("del_file"),
        col("_metadata.row_index").as("pos"))
    raw.join(broadcast(dels), Seq("del_file", "pos"), "left_semi")
      .drop("del_file", "pos")
  }

  /** Plant an orphan parquet file in the table's data directory,
    * bypassing the metadata log (cleanup_utils.py:73-98): it exists on
    * storage but no snapshot references it — removeOrphanFiles bait.
    * Returns the orphan's absolute path. */
  def plantOrphan(t: GraftTable, rows: DataFrame): Path = {
    val staged = t.root.resolve(s"stage-orphan-${UUID.randomUUID()}")
    rows.coalesce(1).write.parquet(staged.toString)
    val part = Files.list(staged).iterator().asScala
      .find(_.toString.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException("no parquet part written"))
    val target = t.root.resolve(
      s"data/orphaned-${UUID.randomUUID()}.parquet")
    Files.move(part, target, StandardCopyOption.ATOMIC_MOVE)
    Files.list(staged).iterator().asScala.foreach(Files.deleteIfExists(_))
    Files.deleteIfExists(staged)
    target.toAbsolutePath
  }

  private val udfNorm =
    udf((s: String) => if (s == null) null else Io.normalize(s))
}
