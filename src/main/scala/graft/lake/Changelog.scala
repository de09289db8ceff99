package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-processing for [[GraftTable.changes]] output — the two
  * refinements Iceberg's `create_changelog_view` layers on the raw
  * non-net changelog (Spark's ChangelogIterator: removeCarryovers /
  * computeUpdates; the reference's COW update `demo.py:228-235` is
  * exactly the commit shape that needs them, re-emitting every
  * carried row of the rewritten file as delete+insert and the
  * changed row as an unpaired delete+insert).
  *
  * Pure DataFrame transforms, so the SAME code serves the batch
  * changelog ([[GraftTable.changelogView]]), the CALL procedure, and
  * the `graft-changes` stream's micro-batches: both transforms only
  * ever combine rows within one `_change_ordinal`, and a micro-batch
  * always holds whole commit windows.
  *
  * Scale shape: both transforms shuffle on (row-content | identifier)
  * keys of the CHANGE WINDOW — cost is bounded by the window's row
  * delta, never the table. No collects, no windows over the whole
  * table.
  */
object Changelog {

  private val MetaCols =
    Seq("_change_type", "_change_ordinal", "_commit_snapshot_id")

  private def q(n: String) =
    col("`" + n.replace("`", "``") + "`")

  private def dataColsOf(changes: DataFrame): Seq[String] =
    changes.columns.toSeq.filterNot(MetaCols.contains)

  /** All three transforms group/order by FULL row content, which Spark
    * refuses for map-typed columns — fail fast with the constraint
    * instead of surfacing an analysis error from deep inside the plan
    * (Iceberg's ChangelogIterator has the same orderable-types
    * requirement). */
  private def requireGroupable(changes: DataFrame, op: String): Unit = {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    // recursive: a map nested in a struct/array is just as ungroupable
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val maps = changes.schema.fields.collect {
      case f if hasMap(f.dataType) => f.name
    }
    require(maps.isEmpty,
      s"$op groups changelog rows by full row content, which cannot " +
        s"include map-typed columns: ${maps.mkString(", ")} (drop or " +
        "cast them to orderable types first)")
  }

  /** Cancel carryover rows: a copy-on-write rewrite re-emits every
    * carried (untouched) row of a rewritten file as delete+insert;
    * within one commit window those pairs are content-identical and
    * net to nothing. Pairs cancel BY MULTIPLICITY — a legitimately
    * duplicated row deleted once keeps exactly one net delete: group
    * by full row content + commit window, net = inserts − deletes,
    * re-emit |net| copies of the surviving type. */
  def removeCarryovers(changes: DataFrame): DataFrame = {
    requireGroupable(changes, "remove_carryovers")
    val dataCols = dataColsOf(changes)
    val keys = dataCols ++ Seq("_change_ordinal", "_commit_snapshot_id")
    changes
      .groupBy(keys.map(q): _*)
      .agg((count(when(col("_change_type") === "insert", 1)) -
        count(when(col("_change_type") === "delete", 1))).as("__net"))
      .filter(col("__net") =!= 0)
      .withColumn("_change_type",
        when(col("__net") > 0, "insert").otherwise("delete"))
      .withColumn("__copy",
        explode(sequence(lit(1L), abs(col("__net")))))
      .select((dataCols ++ MetaCols).map(q): _*)
  }

  /** Net changes across the WHOLE window (Iceberg's `net_changes =>
    * true`): the same multiplicity netting as [[removeCarryovers]]
    * but keyed by row content ONLY — a row inserted then deleted by
    * later commits in the window vanishes; a row updated twice
    * surfaces once as its final insert (the intermediate images net
    * out); a pre-window row deleted inside the window stays a delete.
    * Survivors carry the metadata of their LATEST change in the
    * window (max ordinal + that commit's snapshot), matching Iceberg
    * ChangelogIterator.removeNetCarryovers. Mutually exclusive with
    * [[computeUpdates]] (Iceberg refuses the combination too: net
    * rows no longer share a commit window to pair within). */
  def removeNetCarryovers(changes: DataFrame): DataFrame = {
    requireGroupable(changes, "net_changes")
    val dataCols = dataColsOf(changes)
    changes
      .groupBy(dataCols.map(q): _*)
      .agg(
        (count(when(col("_change_type") === "insert", 1)) -
          count(when(col("_change_type") === "delete", 1))).as("__net"),
        max(col("_change_ordinal")).as("_change_ordinal"),
        max_by(col("_commit_snapshot_id"), col("_change_ordinal"))
          .as("_commit_snapshot_id"))
      .filter(col("__net") =!= 0)
      .withColumn("_change_type",
        when(col("__net") > 0, "insert").otherwise("delete"))
      .withColumn("__copy",
        explode(sequence(lit(1L), abs(col("__net")))))
      .select((dataCols ++ MetaCols).map(q): _*)
  }

  /** Pair delete+insert rows sharing an identifier tuple within one
    * commit window into update_before/update_after images (Iceberg
    * ChangelogIterator.computeUpdates). Rows rank per (identifier,
    * window, type) by full content so duplicated identifiers pair
    * deterministically; an unpaired delete (or insert) keeps its
    * original type. groupBy/partitionBy are null-safe, so NULL
    * identifier values pair like any other value. Run AFTER
    * [[removeCarryovers]] — a carried row would otherwise pair with
    * itself and surface as a no-op update. Requires orderable row
    * types (no map columns), same as Iceberg's identifier ordering. */
  def computeUpdates(changes: DataFrame,
      identifierCols: Seq[String]): DataFrame = {
    requireGroupable(changes, "compute_updates")
    val dataCols = dataColsOf(changes)
    require(identifierCols.nonEmpty,
      "compute_updates requires identifier_columns")
    val missing = identifierCols.filterNot(dataCols.contains)
    require(missing.isEmpty,
      s"identifier columns not in changelog: ${missing.mkString(", ")}")
    val w = Window
      .partitionBy((identifierCols ++
        Seq("_change_ordinal", "_change_type")).map(q): _*)
      .orderBy(dataCols.map(q): _*)
    val payload = struct(dataCols.map(q): _*)
    // rank within (identifier, window, type): each (key, window, rn)
    // group then holds at most ONE delete and ONE insert, so the
    // first(ignoreNulls) below is pure selection, never a tiebreak
    changes
      .withColumn("__rn", row_number().over(w))
      .groupBy((identifierCols.map(q) ++ Seq(q("_change_ordinal"),
        q("_commit_snapshot_id"), col("__rn"))): _*)
      .agg(
        first(when(col("_change_type") === "delete", payload),
          ignoreNulls = true).as("__b"),
        first(when(col("_change_type") === "insert", payload),
          ignoreNulls = true).as("__a"))
      .withColumn("__rows",
        when(col("__b").isNotNull && col("__a").isNotNull, array(
          struct(lit("update_before").as("t"), col("__b").as("p")),
          struct(lit("update_after").as("t"), col("__a").as("p"))))
          .when(col("__b").isNotNull,
            array(struct(lit("delete").as("t"), col("__b").as("p"))))
          .otherwise(
            array(struct(lit("insert").as("t"), col("__a").as("p")))))
      .select(explode(col("__rows")).as("__e"),
        q("_change_ordinal"), q("_commit_snapshot_id"))
      .select(dataCols.map(n => col("__e.p").getField(n).as(n)) ++
        Seq(col("__e.t").as("_change_type"), q("_change_ordinal"),
          q("_commit_snapshot_id")): _*)
  }
}
