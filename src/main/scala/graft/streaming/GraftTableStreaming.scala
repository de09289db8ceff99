package graft.streaming

import java.nio.file.Path

import org.apache.spark.sql.{DataFrame, Dataset, Row, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType

import graft.lake.GraftTable

/** Structured Streaming ⇄ GraftLake integration ([EXT] — the reference
  * has no streaming surface; this is the lakehouse pattern its Iceberg
  * tables would use).
  *
  * Source: `spark.readStream.format("graft-appends").option("path",
  * <table root>).load()` — snapshot ids are allocated monotonically,
  * so they ARE the stream offsets: each micro-batch reads exactly the
  * data files added by append snapshots in (lastOffset, latest]. No
  * file listing, no modification-time heuristics — the snapshot log is
  * the changelog (Iceberg incremental scan, re-expressed on the V1
  * Source API where a batch DataFrame per offset range is the whole
  * contract).
  *
  * Sink: [[GraftTableStreaming.appendSink]] — foreachBatch with
  * exactly-once appends. Each commit records (queryId, epochId) in the
  * snapshot summary; a replayed epoch (restart after a crash between
  * append and checkpoint) is detected in the snapshot log and skipped,
  * so retries cannot double-append.
  */
object GraftTableStreaming {

  val QueryKey = "streaming-query"
  val EpochKey = "streaming-epoch"

  /** Highest epoch this query ever committed to the table, if any. */
  def lastCommittedEpoch(t: GraftTable, queryId: String): Option[Long] =
    t.meta.snapshots.flatMap(s =>
      if (s.summary.get(QueryKey).contains(queryId))
        s.summary.get(EpochKey).map(_.toLong)
      else None).maxOption

  /** Exactly-once micro-batch append: skip epochs at or below the last
    * committed one (foreachBatch re-delivers an epoch after a crash
    * between the table commit and the checkpoint commit). */
  def appendBatch(t: GraftTable, queryId: String)(
      batch: DataFrame, epochId: Long): Unit = {
    if (lastCommittedEpoch(t, queryId).exists(_ >= epochId)) return
    t.append(batch,
      Map(QueryKey -> queryId, EpochKey -> epochId.toString))
  }

  /** writeStream sink for a GraftTable:
    * `df.writeStream.options(...)` → `appendSink(df, t, "my-query")
    * .start()`. */
  def appendSink(df: Dataset[Row], t: GraftTable,
      queryId: String): DataStreamWriter[Row] =
    df.writeStream.foreachBatch(appendBatch(t, queryId) _)

  /** Exactly-once micro-batch UPSERT — CDC apply, the Flink
    * upsert-writer / Iceberg RowDelta pattern as a streaming sink:
    * each micro-batch commits ONE [[GraftTable.rowDelta]] snapshot
    * whose equality-delete file masks every OLDER row matching a
    * batch key and whose data files carry the batch's upsert rows.
    * Rows with `deleteFlagCol` true are tombstones: their key is
    * deleted and no replacement is written. Epochs at or below the
    * last committed one are skipped (the [[appendBatch]] crash-replay
    * contract), so a retried micro-batch is a no-op, never a
    * double-apply. One commit per window is the 100 TB shape: one
    * metadata write, one optimistic-concurrency race, regardless of
    * how many keys the window touched.
    *
    * Within-batch ordering: rowDelta's equality delete masks only
    * STRICTLY OLDER files, so nothing inside one batch masks anything
    * else in the same batch — a consumer whose micro-batch coalesces
    * several feed commits (downtime catch-up) can carry several
    * events for one key. Pass `sequenceCol` (the feed's event
    * order — a CDC LSN, a commit ordinal, a timestamp) and the sink
    * keeps only each key's LATEST event per batch (ties broken by the
    * remaining payload for determinism), making the commit the exact
    * fold of the feed. Without it the caller promises at most one
    * event per key per batch (a compacted feed). */
  def upsertBatch(t: GraftTable, queryId: String,
      identifierCols: Seq[String],
      deleteFlagCol: Option[String] = None,
      sequenceCol: Option[String] = None)(
      batch: DataFrame, epochId: Long): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    require(identifierCols.nonEmpty,
      "upsert needs at least one identifier column")
    if (lastCommittedEpoch(t, queryId).exists(_ >= epochId)) return
    // persist BEFORE the emptiness probe: isEmpty is its own Spark job
    // reading the source, and on a busy stream every row it touched
    // would otherwise be recomputed by the dedup/commit jobs below —
    // doubling source-side work per trigger for a check that only
    // matters on idle windows
    val cached = batch.persist()
    try {
      if (cached.isEmpty) return // nothing to commit; replay identical
      val latest = sequenceCol match {
        case Some(sc) =>
          val payload = cached.columns.filterNot(c =>
            c == sc || identifierCols.contains(c)).map(col).toSeq
          val w = Window.partitionBy(identifierCols.map(col): _*)
            .orderBy((col(sc).desc +: payload.map(_.desc)): _*)
          cached.withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__rn", sc)
        case None => cached
      }
      val upserts = deleteFlagCol match {
        case Some(f) =>
          latest.filter(!coalesce(col(f), lit(false))).drop(f)
        case None => latest
      }
      val summary = Map(QueryKey -> queryId, EpochKey -> epochId.toString)
      // first load: nothing exists for an equality delete to mask, so
      // the key file would be dead weight on every later read until a
      // compaction — take the plain append path instead
      if (t.currentSnapshot.isEmpty) t.append(upserts, summary)
      else {
        // keys = every identifier the window touched: upserted keys
        // mask their older versions, tombstoned keys just vanish
        val keys = latest.select(identifierCols.map(col): _*)
        t.rowDelta(keys, upserts, summary)
      }
    } finally cached.unpersist()
  }

  /** writeStream upsert sink: `upsertSink(df, t, "q", Seq("id"),
    * Some("_deleted"), Some("_seq")).start()`. */
  def upsertSink(df: Dataset[Row], t: GraftTable, queryId: String,
      identifierCols: Seq[String],
      deleteFlagCol: Option[String] = None,
      sequenceCol: Option[String] = None): DataStreamWriter[Row] =
    df.writeStream.foreachBatch(
      upsertBatch(t, queryId, identifierCols, deleteFlagCol,
        sequenceCol) _)

  /** readStream entry point (programmatic form of format(...)). */
  def readAppends(spark: SparkSession, root: Path): DataFrame =
    spark.readStream.format("graft-appends")
      .option("path", root.toString).load()

  /** CDC readStream entry point: every row change (insert AND delete),
    * not just appends — see [[GraftChangesSource]]. */
  def readChanges(spark: SparkSession, root: Path): DataFrame =
    spark.readStream.format("graft-changes")
      .option("path", root.toString).load()

  /** `option("maxSnapshotsPerTrigger", n)` — cap each micro-batch at n
    * table commits (Iceberg's streaming rate-limit knob): a cold-start
    * consumer of a long table history pages through it instead of
    * planning the entire backlog as one batch. Unset = no cap. */
  def maxSnapshotsPerTrigger(parameters: Map[String, String]): Option[Int] =
    parameters.get("maxSnapshotsPerTrigger").map { v =>
      val n = v.toInt
      require(n > 0, s"maxSnapshotsPerTrigger must be positive, got $n")
      n
    }

  /** `option("startSnapshotId", id)` — Iceberg's stream-from-snapshot
    * knob: the stream's initial offset is the given snapshot
    * (EXCLUSIVE, matching the batch incremental convention), so a new
    * consumer skips the backfill and begins with the commits AFTER
    * it. Only the FIRST batch is affected; a restarted query resumes
    * from its checkpoint as usual. */
  def startSnapshotId(parameters: Map[String, String]): Option[Long] =
    parameters.get("startSnapshotId").map(_.toLong)

  /** The initial stream offset from either knob — `startSnapshotId`
    * or Iceberg's `stream-from-timestamp` (epoch millis): the stream
    * begins with commits AT OR AFTER the timestamp, i.e. the exclusive
    * start offset is the newest snapshot committed strictly BEFORE it
    * (none before it = stream from the beginning — a timestamp
    * predating the table is the full backfill, like Iceberg). The two
    * knobs contradict each other, so setting both refuses. */
  def initialStartSnapshot(t: GraftTable,
      parameters: Map[String, String]): Option[Long] = {
    val byId = startSnapshotId(parameters)
    val byTs = parameters.get("stream-from-timestamp").map(_.toLong)
    require(byId.isEmpty || byTs.isEmpty,
      "cannot set both startSnapshotId and stream-from-timestamp")
    // resolve against the MAIN ancestry chain only (Iceberg's
    // SnapshotUtil walks ancestors the same way): branch-staged or
    // rollback-orphaned snapshots sit in the log but are not on the
    // stream's lineage — picking one as the start offset would make
    // the CDC source's ancestry walk refuse on its first batch
    byId.orElse(byTs.flatMap(ts =>
      t.ancestorsOf(None).filter(_.timestampMs < ts)
        .maxByOption(s => (s.timestampMs, s.snapshotId))
        .map(_.snapshotId)))
  }
}

/** `format("graft-appends")` registration — source AND sink, so both
  * directions read/write GraftTables symmetrically:
  *
  *   spark.readStream.format("graft-appends").option("path", src).load()
  *     .writeStream.format("graft-appends").option("path", dst)
  *     .option("queryId", "my-pipeline").start()
  *
  * The sink delegates to [[GraftTableStreaming.appendBatch]] and gets
  * the same exactly-once epoch bookkeeping as the foreachBatch form.
  */
class GraftAppendStreamProvider extends StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-appends"

  private def table(ctx: SQLContext,
      parameters: Map[String, String]): GraftTable =
    GraftTable.load(ctx.sparkSession, Path.of(parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-appends requires option(\"path\", <table root>)"))))

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String])
      : (String, StructType) =
    (shortName(), table(ctx, parameters).schema)

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val t = table(ctx, parameters)
    new GraftAppendSource(t,
      GraftTableStreaming.maxSnapshotsPerTrigger(parameters),
      GraftTableStreaming.initialStartSnapshot(t, parameters))
  }

  override def createSink(ctx: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(partitionColumns.isEmpty,
      "partition columns are declared on the table " +
        "(write.clustered-by), not the sink")
    val t = table(ctx, parameters)
    // Epoch dedup is keyed on (queryId, epochId), so queryId must be
    // unique per logical pipeline: a shared default would make two
    // independent queries writing this table (or a restart with a
    // fresh checkpoint, whose epochs restart at 0) silently drop every
    // batch at-or-below the other's last committed epoch. No silent
    // default — take an explicit queryId, or derive one from the
    // checkpoint location (same checkpoint ⇒ same epoch sequence ⇒
    // dedup is exactly the at-least-once replay we want to suppress).
    val queryId = parameters.get("queryId")
      .orElse(parameters.get("checkpointLocation").map(p =>
        "ckpt:" + Path.of(p).toAbsolutePath.normalize.toString))
      .getOrElse(throw new IllegalArgumentException(
        "graft-appends sink requires option(\"queryId\", <stable id>) " +
          "or a checkpointLocation to derive it from: epoch " +
          "deduplication is keyed on it, and a shared default would " +
          "drop batches across unrelated queries"))
    new org.apache.spark.sql.execution.streaming.Sink {
      override def addBatch(batchId: Long,
          data: Dataset[Row]): Unit = {
        // the incoming frame is streaming-tagged and can't feed a
        // batch write directly; detach it the way Spark's own
        // ForeachBatchSink does (LogicalRDD over the compiled rows)
        val detached =
          org.apache.spark.sql.graft.ColumnBridge.detachBatch(data)
        GraftTableStreaming.appendBatch(t, queryId)(detached, batchId)
      }
      override def name(): String = s"GraftAppendSink(${t.name})"
    }
  }
}

/** `format("graft-changes")` registration: the CDC twin of
  * `graft-appends`. A consumer tailing a table that takes MOR deletes
  * or COW rewrites through the appends stream silently misses the
  * changes the batch changelog ([[GraftTable.changes]],
  * `q_lake_changelog`) reports; this source streams those same events
  * — each micro-batch IS `changes(lastOffset, latest)`, so the
  * streamed event set equals the batch changelog by construction.
  */
class GraftChangesStreamProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-changes"

  private def table(ctx: SQLContext,
      parameters: Map[String, String]): GraftTable =
    GraftTable.load(ctx.sparkSession, Path.of(parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-changes requires option(\"path\", <table root>)"))))

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String])
      : (String, StructType) =
    (shortName(), GraftChangesSource.changesSchema(table(ctx, parameters)))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val t = table(ctx, parameters)
    new GraftChangesSource(t,
      GraftTableStreaming.maxSnapshotsPerTrigger(parameters),
      GraftTableStreaming.initialStartSnapshot(t, parameters))
  }
}

object GraftChangesSource {
  /** Table schema + the changelog metadata columns, in the exact
    * order [[GraftTable.changes]] emits them. */
  def changesSchema(t: GraftTable): StructType = StructType(
    t.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_change_ordinal",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("_commit_snapshot_id",
        org.apache.spark.sql.types.LongType)))
}

/** Changelog-driven source: offset N = "all row changes committed by
  * main-lineage snapshots with id <= N have been emitted". The offset
  * is the MAIN head (`currentSnapshotId`), not the raw snapshot-log
  * tail: WAP commits staged on a branch don't advance the stream, and
  * arrive (through their fast-forwarded ancestry) only when published
  * — the same lineage rule the batch changelog applies. Each batch
  * plans only over the files its commits touched, so stream cost
  * tracks change volume, not table size. `_change_ordinal` counts
  * commits within each micro-batch's range (the same range-relative
  * contract the batch API has for its queried range). A rollback moves
  * the head off the emitted ancestry and fails the stream loudly
  * (non-ancestor start offset) rather than replaying rewritten
  * history. Schema evolution mid-stream follows Spark's file-stream
  * contract: the consumer keeps the schema the query STARTED with —
  * after a RENAME COLUMN, change rows keep arriving under the old
  * logical name (values bind positionally and stay correct, proven in
  * StreamingSpec); restart the query to pick up the new name.
  */
class GraftChangesSource(t: GraftTable,
    maxSnapshotsPerTrigger: Option[Int],
    startSnapshotId: Option[Long] = None)
    extends Source {

  override def schema: StructType = GraftChangesSource.changesSchema(t)

  // progress this source has already handed out, so a capped getOffset
  // can advance N commits past it; getBatch (including the restart
  // replay of the last checkpointed batch) keeps it current
  private var lastEnd: Option[Long] = None

  override def getOffset: Option[OffsetV1] = maxSnapshotsPerTrigger match {
    case None => t.meta.currentSnapshotId.map(LongOffset(_))
    case Some(n) =>
      // cap the micro-batch at the Nth pending main-lineage commit —
      // a cold start over a long table history pages through it
      // instead of emitting the whole changelog as one batch. If the
      // walk fails (offset expired mid-stream), fall back to head and
      // let getBatch raise the precise error.
      val target =
        try t.lineageAfter(lastEnd.orElse(startSnapshotId)).take(n)
          .lastOption
        catch { case _: Exception => t.meta.currentSnapshotId }
      target.orElse(lastEnd).map(LongOffset(_))
  }

  private def toLong(o: OffsetV1): Long = o match {
    case LongOffset(v) => v
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[OffsetV1],
      end: OffsetV1): DataFrame = {
    lastEnd = Some(toLong(end))
    org.apache.spark.sql.graft.StreamingBridge.asStreaming(
      t.changes(start.map(toLong).orElse(startSnapshotId),
        Some(toLong(end))))
  }

  override def stop(): Unit = ()
}

/** Snapshot-log-driven source: offset N = "all append snapshots with
  * id <= N have been emitted". */
class GraftAppendSource(t: GraftTable,
    maxSnapshotsPerTrigger: Option[Int],
    startSnapshotId: Option[Long] = None)
    extends Source {

  override def schema: StructType = t.schema

  // see GraftChangesSource.lastEnd — same capped-offset protocol, but
  // over the raw snapshot log (appendsBetween filters by id range)
  private var lastEnd: Option[Long] = None

  override def getOffset: Option[OffsetV1] = maxSnapshotsPerTrigger match {
    case None => t.meta.snapshots.lastOption.map(s => LongOffset(s.snapshotId))
    case Some(n) =>
      val from = lastEnd.orElse(startSnapshotId).getOrElse(Long.MinValue)
      val pending = t.meta.snapshots.map(_.snapshotId)
        .filter(_ > from).sorted
      pending.take(n).lastOption.orElse(lastEnd).map(LongOffset(_))
  }

  private def toLong(o: OffsetV1): Long = o match {
    case LongOffset(v) => v
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[OffsetV1],
      end: OffsetV1): DataFrame = {
    lastEnd = Some(toLong(end))
    org.apache.spark.sql.graft.StreamingBridge.asStreaming(
      t.appendsBetween(start.map(toLong).orElse(startSnapshotId)
        .getOrElse(Long.MinValue), toLong(end)))
  }

  override def stop(): Unit = ()
}
