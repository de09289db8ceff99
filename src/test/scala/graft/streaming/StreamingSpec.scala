package graft.streaming

import java.nio.file.{Files, Path}

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Drives the §2j streaming surface end-to-end: stages the events table
  * as 4 chronological parquet files, streams them as 4 micro-batches
  * (maxFilesPerTrigger=1), and checks the incremental results against
  * batch evaluation of the same expressions.
  */
class StreamingSpec extends SparkSuite {

  private lazy val stageDir: Path = {
    val dir = Files.createTempDirectory("graft-stream-events")
    val ev = graft.rel.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .orderBy("ts_us", "event_id")
      .collect()
    val chunks = ev.grouped(math.ceil(ev.length / 4.0).toInt).toSeq
    chunks.zipWithIndex.foreach { case (rows, i) =>
      val tmp = Files.createTempDirectory(s"graft-chunk$i")
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), Streams.eventSchema)
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = dir.resolve(f"chunk-$i%04d.parquet")
      Files.copy(part, dst)
      // chronological modification times => deterministic batch order
      dst.toFile.setLastModified(1700000000000L + i * 60000L)
    }
    dir
  }

  private def batchEvents: DataFrame =
    spark.read.schema(Streams.eventSchema).parquet(stageDir.toString)
      .withColumn("ts", timestamp_micros(col("ts_us")))

  test("streamed tumbling agg (complete mode) equals batch evaluation") {
    val stream = Streams.readEvents(spark, stageDir.toString)
    Streams.runToMemory(Streams.tumblingCounts(stream),
      "tumbling_complete", OutputMode.Complete)
    val got = spark.table("tumbling_complete")
      .collect().map(_.toSeq).toSet
    val want = Streams.tumblingCounts(batchEvents)
      .collect().map(_.toSeq).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streamed tumbling agg (append mode) emits only watermark-closed" +
    " windows, all of them correct") {
    val stream = Streams.readEvents(spark, stageDir.toString)
    Streams.runToMemory(Streams.tumblingCounts(stream),
      "tumbling_append", OutputMode.Append)
    val got = spark.table("tumbling_append").collect().map(_.toSeq).toSet
    val want = Streams.tumblingCounts(batchEvents)
      .collect().map(_.toSeq).toSet
    // append mode: emitted set = finalized windows (watermark passed
    // window end before the last batch); every emitted row must match
    // the batch result exactly, and 4 chronological batches across a
    // 30-day corpus must finalize most windows
    assert(got.subsetOf(want), s"spurious rows: ${got -- want}")
    assert(got.nonEmpty, "no windows finalized across 4 batches")
  }

  test("flatMapGroupsWithState sessionization: closed sessions emitted," +
    " open tail retained in state") {
    val stream = Streams.readEvents(spark, stageDir.toString)
    Streams.runToMemory(Streams.sessionize(stream),
      "sessions_stream", OutputMode.Append)
    val got = spark.table("sessions_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    // expected: batch sessionization minus the final (still-open)
    // session of each user
    val gapUs = 30L * 60 * 1000000
    val byUser = batchEvents.select("user_id", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).sorted }
    val want = byUser.flatMap { case (u, times) =>
      val sessions = times.foldLeft(List.empty[List[Long]]) {
        case ((cur @ (last :: _)) :: rest, t) if t - last <= gapUs =>
          (t :: cur) :: rest
        case (acc, t) => List(t) :: acc
      }.map(_.reverse).reverse
      sessions.init.map(s => (u, s.head, s.last + gapUs, s.length.toLong))
    }.toSet
    assert(got == want)
    assert(got.nonEmpty)
  }
}
