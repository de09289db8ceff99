package graft.lake.sql

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, ExprId}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.lake.{GraftTable, Io}

/** Opaque holders: keep Catalyst trees out of the command's product
  * scan so the (already-resolved) command never re-enters analysis. */
final case class ExprBox(e: Expression)
final case class PlanBox(plan: LogicalPlan)

/** One WHEN MATCHED / WHEN NOT MATCHED BY SOURCE clause: either an
  * UPDATE SET (set nonEmpty) or a DELETE (set empty). */
final case class MergeWhenSpec(cond: Option[ExprBox], isDelete: Boolean,
    set: Map[String, ExprBox])

/** One WHEN NOT MATCHED THEN INSERT clause. */
final case class MergeInsertSpec(cond: Option[ExprBox],
    values: Map[String, ExprBox])

/** `MERGE INTO <graft table> USING <source> ON <cond> WHEN ...`
  * ([EXT] — the reference demo stops at UPDATE/DELETE; MERGE completes
  * the lakehouse DML surface).
  *
  * Execution is a COW transaction with the merge-appropriate two-phase
  * shape:
  *   1. DISCOVERY: full-outer join target (with file/pos lineage)
  *      against the source, once — finds (a) the affected data files,
  *      (b) cardinality violations (a target row matching >1 source
  *      row is an error when update/delete clauses exist, as in
  *      Spark/Iceberg/Delta), and (c) whether any insert applies.
  *   2. REWRITE: re-plan the lineage read over ONLY the affected
  *      files, left-join the source again, and apply first-matching-
  *      clause semantics per row; append insert rows from the
  *      discovery join. Unaffected files carry their manifest entries
  *      over verbatim.
  *
  * At 100 TB the discovery join is the inherent cost of MERGE (the ON
  * condition is arbitrary — no stats pruning is sound); the rewrite
  * cost is bounded by the matched files, and the shuffle is the join
  * keyed on the ON condition's equi-part (Catalyst extracts it).
  */
case class GraftMergeCommand(
    table: GraftSqlTable,
    source: PlanBox,
    targetIds: Set[ExprId],
    sourceIds: Set[ExprId],
    onCond: ExprBox,
    matched: Seq[MergeWhenSpec],
    notMatched: Seq[MergeInsertSpec],
    notMatchedBySource: Seq[MergeWhenSpec])
    extends LeafRunnableCommand {

  import GraftTable.{FileCol, PosCol}

  private val TgtMark = "__graft_tgt"
  private val SrcMark = "__graft_src"

  override def run(session: SparkSession): Seq[Row] = {
    if (table.pinnedSnapshot.nonEmpty)
      throw new UnsupportedOperationException(
        s"cannot MERGE into ${table.name()} at a pinned snapshot")
    val g = table.graft
    val schema = g.schema

    g.cowTransaction("merge") { (entries, readLin) =>
      val src = ColumnBridge.ofRows(session, source.plan)
        .withColumn(SrcMark, lit(true))

      /** Re-bind a command expression: target attrs resolve against
        * `tgt`, source attrs against the source frame. */
      def reb(tgt: DataFrame)(box: ExprBox): Column =
        ColumnBridge.column(box.e.transform {
          case a: AttributeReference if targetIds(a.exprId) =>
            ColumnBridge.expression(tgt(a.name))
          case a: AttributeReference if sourceIds(a.exprId) =>
            ColumnBridge.expression(src(a.name))
        })

      def whenCond(tgt: DataFrame)(s: MergeWhenSpec): Column =
        s.cond.map(reb(tgt)).getOrElse(lit(true))

      // ---- phase 1: discovery over the full table ----
      val tgt1 = readLin(entries).withColumn(TgtMark, lit(true))
      val joined = tgt1.join(src, reb(tgt1)(onCond), "full_outer")
      val isMatched = col(TgtMark).isNotNull && col(SrcMark).isNotNull
      val isNmbs = col(TgtMark).isNotNull && col(SrcMark).isNull
      val isIns = col(TgtMark).isNull && col(SrcMark).isNotNull

      if (matched.nonEmpty || notMatchedBySource.nonEmpty) {
        val dups = joined.filter(isMatched)
          .groupBy(col(FileCol), col(PosCol))
          .count().filter(col("count") > 1).limit(1).count()
        if (dups > 0) throw new UnsupportedOperationException(
          "MERGE cardinality violation: a target row matched more " +
            "than one source row")
      }

      val matchedTouches =
        if (matched.isEmpty) lit(false) else isMatched
      val nmbsTouches =
        if (notMatchedBySource.isEmpty) lit(false)
        else isNmbs &&
          notMatchedBySource.map(whenCond(tgt1)).reduce(_ || _)
      val affected = joined.filter(matchedTouches || nmbsTouches)
        .select(col(FileCol)).distinct()
        .collect().map(r => Io.normalize(r.getString(0))).toSet

      // insert rows come straight from the discovery join's
      // source-only side (first matching WHEN NOT MATCHED clause wins)
      val insertRows: DataFrame = if (notMatched.isEmpty) null else {
        val srcOnly = joined.filter(isIns)
        // first-match semantics: fold in reverse so the earliest
        // matching clause's when() ends up outermost
        val actCol = notMatched.zipWithIndex.reverse
          .foldLeft(lit(-1): Column) { case (acc, (spec, i)) =>
            when(spec.cond.map(reb(tgt1)).getOrElse(lit(true)), lit(i))
              .otherwise(acc)
          }
        val withAct = srcOnly.withColumn("__graft_act", actCol)
          .filter(col("__graft_act") >= 0)
        val cols = schema.fields.toSeq.map { f =>
          notMatched.zipWithIndex.reverse.foldLeft(
            lit(null).cast(f.dataType): Column) { case (acc, (spec, i)) =>
            when(col("__graft_act") === i,
              spec.values.get(f.name).map(reb(tgt1))
                .getOrElse(lit(null)).cast(f.dataType)).otherwise(acc)
          }.as(f.name)
        }
        withAct.select(cols: _*)
      }

      val anyInserts = insertRows != null && insertRows.limit(1).count() > 0
      if (affected.isEmpty && !anyInserts) None
      else {
        // ---- phase 2: rewrite ONLY the affected files ----
        val rewritten: DataFrame = if (affected.isEmpty) null else {
          val tgt2 = readLin(g.victimEntries(entries, affected))
            .withColumn(TgtMark, lit(true))
          val j2 = tgt2.join(src, reb(tgt2)(onCond), "left_outer")
          val m2 = col(SrcMark).isNotNull
          val KEEP = -1
          val DELBASE = 1000
          def chain(specs: Seq[MergeWhenSpec], offset: Int): Column =
            specs.zipWithIndex.reverse.foldLeft(lit(KEEP): Column) {
              case (acc, (spec, i)) =>
                val code = if (spec.isDelete) DELBASE + offset + i
                  else offset + i
                when(whenCond(tgt2)(spec), lit(code)).otherwise(acc)
            }
          val actCol =
            when(m2, if (matched.isEmpty) lit(KEEP)
              else chain(matched, 0))
            .otherwise(if (notMatchedBySource.isEmpty) lit(KEEP)
              else chain(notMatchedBySource, 100))
          val withAct = j2.withColumn("__graft_act", actCol)
            .filter(col("__graft_act") < DELBASE) // drop deletes
          def updates(specs: Seq[MergeWhenSpec], offset: Int,
              f: org.apache.spark.sql.types.StructField,
              acc: Column): Column =
            specs.zipWithIndex.filterNot(_._1.isDelete)
              .foldLeft(acc) { case (a, (spec, i)) =>
                spec.set.get(f.name) match {
                  case Some(v) => when(col("__graft_act") === offset + i,
                    reb(tgt2)(v).cast(f.dataType)).otherwise(a)
                  case None => a
                }
              }
          val cols = schema.fields.toSeq.map { f =>
            updates(notMatchedBySource, 100, f,
              updates(matched, 0, f, tgt2(f.name))).as(f.name)
          }
          withAct.select(cols: _*)
        }
        val out = (rewritten, insertRows) match {
          case (null, ins) => ins
          case (rw, null) => rw
          case (rw, ins) => rw.unionByName(ins)
        }
        Some((affected, out, Map(
          "mode" -> "copy-on-write",
          "merge-affected-files" -> affected.size.toString)))
      }
    }
    Nil
  }

  override def simpleString(maxFields: Int): String =
    s"GraftMerge ${table.name()}"
}
