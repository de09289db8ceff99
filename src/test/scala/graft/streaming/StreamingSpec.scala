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
    val dir = graft.ScratchDirs.create("graft-stream-events")
    val ev = graft.rel.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .orderBy("ts_us", "event_id")
      .collect()
    val chunks = ev.grouped(math.ceil(ev.length / 4.0).toInt).toSeq
    chunks.zipWithIndex.foreach { case (rows, i) =>
      val tmp = graft.ScratchDirs.create(s"graft-chunk$i")
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

  test("watermark drops late data: events older than watermark - delay" +
    " never reach the aggregation") {
    // stage: batches 0-1 advance event time to T; batch 2 carries an
    // event 3 days older than T (far beyond the 1h watermark delay);
    // batch 3 closes remaining windows. The late file arrives TWO
    // batches after the max-raising events because Spark applies an
    // updated watermark with one batch of lag (the filter for batch N
    // uses the watermark committed after batch N-1).
    val dir = graft.ScratchDirs.create("graft-stream-late")
    val base = java.time.Instant.parse("2024-06-10T00:00:00Z")
    def us(i: java.time.Instant): Long =
      i.getEpochSecond * 1000000L + i.getNano / 1000
    def stage(idx: Int, rows: Seq[(Long, Long, Long, String, Double)]): Unit = {
      val tmp = graft.ScratchDirs.create(s"graft-late$idx")
      import scala.jdk.CollectionConverters._
      val df = spark.createDataFrame(rows.map { case (id, ts, u, t, v) =>
        org.apache.spark.sql.Row(id, ts, u, t, v) }.asJava,
        Streams.eventSchema)
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = dir.resolve(f"chunk-$idx%04d.parquet")
      Files.copy(part, dst)
      dst.toFile.setLastModified(1700000000000L + idx * 60000L)
    }
    stage(0, Seq(
      (1L, us(base), 1L, "view", 1.0),
      (2L, us(base.plusSeconds(3600)), 1L, "view", 1.0)))
    stage(1, Seq(
      (4L, us(base.plusSeconds(7200)), 1L, "view", 1.0)))
    stage(2, Seq(
      (3L, us(base.minusSeconds(3 * 86400)), 1L, "view", 100.0))) // LATE
    stage(3, Seq(
      (5L, us(base.plusSeconds(5 * 86400)), 1L, "view", 1.0))) // closes all

    val stream = Streams.readEvents(spark, dir.toString)
    Streams.runToMemory(Streams.tumblingCounts(stream),
      "late_drop", OutputMode.Append)
    val got = spark.table("late_drop").collect()
      .map(r => (r.getTimestamp(0).toInstant, r.getLong(2), r.getDouble(3)))
    // the late event's 3-days-earlier window must not appear, and the
    // day-of-base window counts only the 3 on-time events
    assert(!got.exists(_._1 == base.minusSeconds(3 * 86400)
      .truncatedTo(java.time.temporal.ChronoUnit.DAYS)),
      s"late event leaked into output: ${got.mkString(",")}")
    val baseDay = got.find(_._1 == base)
    assert(baseDay.exists(r => r._2 == 3L && r._3 == 3.0),
      s"base-day window wrong: ${got.mkString(",")}")
  }

  test("streaming exact dedup: replayed ids within the watermark are " +
    "dropped, first arrival wins, dedup state is watermark-bounded") {
    // stage the event files TWICE (a replayed source): every id arrives
    // at least twice across micro-batches
    val dir = graft.ScratchDirs.create("graft-dedup-stream")
    var i = 0
    Files.list(stageDir).sorted().forEach { p =>
      if (p.toString.endsWith(".parquet")) {
        for (rep <- 0 to 1) {
          val dst = dir.resolve(f"chunk-$i%04d-$rep.parquet")
          Files.copy(p, dst)
          dst.toFile.setLastModified(1700000000000L + i * 60000L + rep)
        }
        i += 1
      }
    }
    val q = Streams.runToMemory(
      Streams.dedupEvents(Streams.readEvents(spark, dir.toString)),
      "dedup_stream", OutputMode.Append())
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_stream")
      val expected = batchEvents.count()
      assert(got.count() === expected,
        "each replayed id must be emitted exactly once")
      assert(got.groupBy("event_id").count()
        .filter(col("count") > 1).count() === 0)
    } finally q.stop()
  }

  test("stream-stream join: purchases matched to prior-hour views " +
    "across micro-batches equal the batch join") {
    val left = Streams.readEvents(spark, stageDir.toString)
    val right = Streams.readEvents(spark, stageDir.toString)
    Streams.runToMemory(Streams.purchaseViewJoin(left, right),
      "pv_join_stream", OutputMode.Append)
    val got = spark.table("pv_join_stream").collect().map(_.toSeq).toSet
    val want = Streams.purchaseViewJoin(batchEvents, batchEvents)
      .collect().map(_.toSeq).toSet
    // inner-join matches are emitted eagerly (not held for the
    // watermark), and a finite AvailableNow run sees both sides in
    // full, so the streamed pair set must equal the batch join exactly
    assert(got == want,
      s"missing: ${(want -- got).take(3)} spurious: ${(got -- want).take(3)}")
    assert(got.nonEmpty, "no purchase/view pairs in the staged corpus")
  }

  test("stream-stream LEFT OUTER join: matched pairs equal the batch " +
    "join; null-view rows appear exactly for unmatched purchases the " +
    "final watermark expired") {
    val left = Streams.readEvents(spark, stageDir.toString)
    val right = Streams.readEvents(spark, stageDir.toString)
    Streams.runToMemory(Streams.purchaseViewJoinOuter(left, right),
      "pv_outer_stream", OutputMode.Append)
    val got = spark.table("pv_outer_stream").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_ => r.getLong(1)),
        r.getLong(2), r.getTimestamp(3)))
    val want = Streams.purchaseViewJoinOuter(batchEvents, batchEvents)
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_ => r.getLong(1)),
        r.getLong(2), r.getTimestamp(3)))
    // matched pairs emit eagerly: must equal the batch join's matches
    val gotMatched = got.filter(_._2.isDefined).toSet
    val wantMatched = want.filter(_._2.isDefined).toSet
    assert(gotMatched === wantMatched)
    assert(gotMatched.nonEmpty)
    // null rows emit only once the watermark proves no view can still
    // arrive: exactly the batch-unmatched purchases older than the
    // final watermark (max event time − 2h delay); younger unmatched
    // purchases stay withheld in state — THE outer-join contract
    val maxTs = batchEvents.agg(max("ts")).collect().head
      .getTimestamp(0).getTime
    val cutoff = maxTs - 2L * 3600 * 1000
    val gotNull = got.filter(_._2.isEmpty).map(_._1).toSet
    val wantNullEmitted = want.filter(t =>
      t._2.isEmpty && t._4.getTime < cutoff).map(_._1).toSet
    val wantNullAll = want.filter(_._2.isEmpty).map(_._1).toSet
    assert(gotNull.subsetOf(wantNullAll),
      "a null row emitted for a purchase that HAS a prior-hour view")
    assert(wantNullEmitted.subsetOf(gotNull),
      s"unmatched purchases past the watermark must emit null rows; " +
        s"missing ${(wantNullEmitted -- gotNull).take(5)}")
    assert(wantNullAll.nonEmpty, "fixture must have unmatched purchases")
  }

  test("stream-stream FULL OUTER join: matched pairs equal the batch " +
    "join; each side's null rows appear exactly for the unmatched rows " +
    "the final watermark expired") {
    val left = Streams.readEvents(spark, stageDir.toString)
    val right = Streams.readEvents(spark, stageDir.toString)
    Streams.runToMemory(Streams.purchaseViewJoinFull(left, right),
      "pv_full_stream", OutputMode.Append)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (Option(r.get(0)).map(_ => r.getLong(0)),
        Option(r.get(1)).map(_ => r.getLong(1)),
        r.getLong(2),
        Option(r.get(3)).map(_ => r.getTimestamp(3).getTime),
        Option(r.get(4)).map(_ => r.getTimestamp(4).getTime)))
    val got = rows(spark.table("pv_full_stream"))
    val want = rows(Streams.purchaseViewJoinFull(batchEvents, batchEvents))
    // matched pairs emit eagerly: must equal the batch join's matches
    val gotMatched = got.filter(t => t._1.isDefined && t._2.isDefined).toSet
    val wantMatched =
      want.filter(t => t._1.isDefined && t._2.isDefined).toSet
    assert(gotMatched === wantMatched)
    assert(gotMatched.nonEmpty)
    val maxTs = batchEvents.agg(max("ts")).collect().head
      .getTimestamp(0).getTime
    val cutoff = maxTs - 2L * 3600 * 1000 // final watermark
    // purchase side: a null-view row may emit only for a purchase the
    // batch join leaves unmatched, and MUST emit once the watermark
    // passes pts (views only precede purchases)
    val gotColdP = got.filter(_._2.isEmpty).flatMap(_._1).toSet
    val wantColdPAll = want.filter(_._2.isEmpty).flatMap(_._1).toSet
    val wantColdPExpired = want.filter(t =>
      t._2.isEmpty && t._4.exists(_ < cutoff)).flatMap(_._1).toSet
    assert(gotColdP.subsetOf(wantColdPAll),
      "a null-view row emitted for a purchase that HAS a prior-hour view")
    assert(wantColdPExpired.subsetOf(gotColdP),
      s"expired unmatched purchases must emit; " +
        s"missing ${(wantColdPExpired -- gotColdP).take(5)}")
    // view side: a matching purchase has pts in [vts, vts+1h), so the
    // view's null row is due once the watermark passes vts + 1h
    val gotColdV = got.filter(_._1.isEmpty).flatMap(_._2).toSet
    val wantColdVAll = want.filter(_._1.isEmpty).flatMap(_._2).toSet
    val wantColdVExpired = want.filter(t =>
      t._1.isEmpty && t._5.exists(_ + 3600 * 1000L < cutoff))
      .flatMap(_._2).toSet
    assert(gotColdV.subsetOf(wantColdVAll),
      "a null-purchase row emitted for a view a purchase followed")
    assert(wantColdVExpired.subsetOf(gotColdV),
      s"expired unmatched views must emit; " +
        s"missing ${(wantColdVExpired -- gotColdV).take(5)}")
    assert(wantColdPAll.nonEmpty && wantColdVAll.nonEmpty,
      "fixture must have unmatched rows on both sides")
  }

  test("GraftLake round trip: readStream of appends feeds an " +
    "exactly-once append sink") {
    import org.apache.spark.sql.types.StructType
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    import graft.lake.GraftTable
    val schema = StructType.fromDDL("k STRING, v BIGINT")
    def rows(prefix: String, n: Int) =
      spark.createDataFrame(
        (1 to n).map(i => Row(s"$prefix-$i", i.toLong)).asJava, schema)
    val wh = graft.ScratchDirs.create("graft-rt-")
    val src = GraftTable.create(spark, wh.resolve("src"), "d.src", schema)
    val dst = GraftTable.create(spark, wh.resolve("dst"), "d.dst", schema)
    src.append(rows("a", 3))
    val q = GraftTableStreaming.appendSink(
      GraftTableStreaming.readAppends(spark, src.root), dst, "rt-query")
      .option("checkpointLocation",
        graft.ScratchDirs.create("graft-rt-ckpt-").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(dst.read().count() === 3)
      // incremental: only the NEW append flows through the next batch
      src.append(rows("b", 2))
      q.processAllAvailable()
      assert(dst.read().count() === 5)
      assert(dst.read().collect().map(_.getString(0)).sorted.toSeq ===
        Seq("a-1", "a-2", "a-3", "b-1", "b-2"))
      // a COW update on the source is NOT an append: stream stays quiet
      src.update(col("k") === "a-1", Map("v" -> lit(99L)))
      q.processAllAvailable()
      assert(dst.read().count() === 5)
    } finally q.stop()
    // the declarative sink form: writeStream.format("graft-appends")
    val dst2 = GraftTable.create(spark, wh.resolve("dst2"), "d.dst2", schema)
    val q2 = GraftTableStreaming.readAppends(spark, src.root)
      .writeStream.format("graft-appends")
      .option("path", dst2.root.toString)
      .option("queryId", "rt-sink")
      .option("checkpointLocation",
        graft.ScratchDirs.create("graft-rt-ckpt2-").toString)
      .start()
    try {
      q2.processAllAvailable()
      assert(dst2.read().count() === 5,
        "format-based sink must land all source appends")
      assert(GraftTableStreaming.lastCommittedEpoch(dst2, "rt-sink").nonEmpty)
    } finally q2.stop()
    // sink identity: NO silent default queryId — absent an explicit
    // queryId, the sink derives one from the checkpoint location (so a
    // fresh checkpoint restarting epochs at 0 can't collide with an
    // older query's epochs), and with neither it fails fast instead of
    // silently sharing a constant across unrelated pipelines
    val dst3 = GraftTable.create(spark, wh.resolve("dst3"), "d.dst3", schema)
    val ckpt3 = graft.ScratchDirs.create("graft-rt-ckpt3-")
    val q3 = GraftTableStreaming.readAppends(spark, src.root)
      .writeStream.format("graft-appends")
      .option("path", dst3.root.toString)
      .option("checkpointLocation", ckpt3.toString)
      .start()
    try {
      q3.processAllAvailable()
      assert(dst3.read().count() === 5,
        "checkpoint-derived queryId sink must land all appends")
      val derived = "ckpt:" + ckpt3.toAbsolutePath.normalize
      assert(GraftTableStreaming.lastCommittedEpoch(dst3, derived).nonEmpty,
        "epoch bookkeeping must be keyed on the derived checkpoint id")
    } finally q3.stop()
    val noId = intercept[Exception] {
      new GraftAppendStreamProvider().createSink(
        spark.sqlContext,
        Map("path" -> dst3.root.toString), Nil,
        org.apache.spark.sql.streaming.OutputMode.Append())
    }
    assert(noId.getMessage.contains("queryId"),
      "sink without queryId or checkpointLocation must fail fast")

    // branch-staged appends must NOT leak into the appends stream:
    // stage a row on a branch of the source table and re-drain
    src.createBranch("wip")
    src.appendToBranch("wip", spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row("staged", Long.box(99L))),
      schema))
    val q4 = GraftTableStreaming.readAppends(spark, src.root)
      .writeStream.format("memory").queryName("branch_leak").start()
    try {
      q4.processAllAvailable()
      assert(spark.table("branch_leak")
        .filter(col("v") === 99L).count() === 0,
        "unpublished branch rows leaked into the appends stream")
    } finally q4.stop()

    // exactly-once: a replayed epoch is skipped, not re-appended
    val epoch = GraftTableStreaming.lastCommittedEpoch(dst, "rt-query").get
    val before = dst.meta.snapshots.size
    GraftTableStreaming.appendBatch(dst, "rt-query")(rows("dup", 1), epoch)
    assert(dst.meta.snapshots.size === before, "replayed epoch must be a no-op")
    GraftTableStreaming.appendBatch(dst, "rt-query")(rows("c", 1), epoch + 1)
    assert(dst.read().count() === 6, "next epoch appends normally")
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

  test("event-time timers close sessions on inactivity: the timer-" +
    "driven stream equals the batch gap-split for every session the " +
    "final watermark can prove closed") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val stream = Streams.readEvents(spark, stageDir.toString)
      Streams.runToMemory(Streams.inactivitySessions(stream, 30),
        "inactivity_sessions", OutputMode.Append)
      val got = spark.table("inactivity_sessions").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet

      // batch expectation: split each user's times by the 30-min gap;
      // a session is closed iff last-event + gap <= final watermark
      // (max event time - the 1s delay)
      val gapUs = 30L * 60 * 1000000
      val all = batchEvents.select("user_id", "ts_us").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val wmMs = all.map(_._2).max / 1000 - 1000
      val want = all.groupBy(_._1).flatMap { case (u, rows) =>
        val times = rows.map(_._2).sorted
        val sessions = times.foldLeft(List.empty[List[Long]]) {
          case ((cur @ (last :: _)) :: rest, t) if t - last <= gapUs =>
            (t :: cur) :: rest
          case (acc, t) => List(t) :: acc
        }.map(_.reverse).reverse
        sessions.filter(s => s.last / 1000 + 30 * 60 * 1000 <= wmMs)
          .map(s => (u, s.head, s.last + gapUs, s.length.toLong))
      }.toSet
      assert(got == want,
        s"spurious=${got -- want}\nmissing=${want -- got}")
      assert(got.nonEmpty, "no session closed before the final watermark")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("MapState first-seen detector emits each (user, type) exactly " +
    "once and equals the batch rank-1 twin") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val stream = Streams.readEvents(spark, stageDir.toString)
      Streams.runToMemory(Streams.firstSeen(stream),
        "first_seen", OutputMode.Append)
      val got = spark.table("first_seen").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
      val want = batchEvents
        .select(col("user_id"), col("event_type"), col("event_id"),
          row_number().over(w).as("rn"))
        .filter(col("rn") === 1)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(got == want, s"spurious=${got -- want}\nmissing=${want -- got}")
      assert(got.size == spark.table("first_seen").count(),
        "a (user, type) pair was emitted more than once")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState milestone counter (arbitrary state V2) " +
    "equals the batch row_number twin") {
    // the V2 state API requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val stream = Streams.readEvents(spark, stageDir.toString)
      Streams.runToMemory(Streams.milestones(stream, 25L),
        "milestones", OutputMode.Append)
      val got = spark.table("milestones").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // batch semantics: every 25th event per user in (ts, event_id)
      // order; 4 chronological micro-batches must reproduce it exactly
      // because the counter state carries across batches
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_us", "event_id")
      val want = batchEvents
        .select(col("user_id"), col("event_id"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") % 25 === 0)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1)))
        .toSet
      assert(got == want)
      assert(got.nonEmpty, "corpus too small: no user reached 25 events")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState TTL throttle carries (lastEmit, count) " +
    "state across micro-batches and equals the batch fold — " +
    "suppressed events never advance the clock") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val stream = Streams.readEvents(spark, stageDir.toString)
      Streams.runToMemory(Streams.throttled(stream),
        "throttle", OutputMode.Append)
      val got = spark.table("throttle").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
      val want = Streams.throttleBatch(batchEvents
          .select(col("event_id"),
            expr("timestamp_micros(ts_us)").as("ts"),
            col("user_id"), col("event_type"), col("value")))
        .collect()
        .map(o => (o.user_id, o.event_type, o.event_id, o.n_emitted))
        .toSet
      assert(got == want, s"spurious=${(got -- want).take(5)}\n" +
        s"missing=${(want -- got).take(5)}")
      assert(got.nonEmpty)
      // the throttle must actually suppress something, or the TTL is
      // vacuous on this corpus
      assert(got.size < batchEvents.count(),
        "TTL suppressed nothing — corpus/TTL mismatch")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState EWMA smoother carries exact integer state " +
    "across micro-batches and equals the batch secondary-sort fold") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val stream = Streams.readEvents(spark, stageDir.toString)
      Streams.runToMemory(Streams.ewmaSmoothed(stream),
        "ewma", OutputMode.Append)
      val got = spark.table("ewma").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // the recursion's state must carry across the chronological
      // micro-batches: any reset or reorder changes EVERY later y
      val want = Streams.ewmaBatch(batchEvents
          .select(col("event_id"),
            expr("timestamp_micros(ts_us)").as("ts"),
            col("user_id"), col("event_type"), col("value")))
        .collect().map(o => (o.user_id, o.event_id, o.ewma_x10000)).toSet
      assert(got == want, s"spurious=${(got -- want).take(5)}\n" +
        s"missing=${(want -- got).take(5)}")
      assert(got.size == spark.table("ewma").count(),
        "an event was emitted more than once")
      assert(got.nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("GraftLake CDC stream: append, MOR delete, and COW rewrite " +
    "events equal the batch changelog; compaction stays silent") {
    import org.apache.spark.sql.types.StructType
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    import graft.lake.GraftTable
    val schema = StructType.fromDDL("k STRING, v BIGINT")
    def rows(prefix: String, n: Int) =
      spark.createDataFrame(
        (1 to n).map(i => Row(s"$prefix-$i", i.toLong)).asJava, schema)
    val wh = graft.ScratchDirs.create("graft-cdc-")
    val t = GraftTable.create(spark, wh.resolve("src"), "d.cdc", schema)
    t.setProperties(Map("write.delete.mode" -> "merge-on-read"))
    t.append(rows("a", 3))
    // event set minus the range-relative ordinal (a streaming consumer
    // sees per-batch ranges; the batch API sees one whole range)
    def evts(df: DataFrame): Set[(String, Long, String, Long)] =
      df.select(col("k"), col("v"), col("_change_type"),
        col("_commit_snapshot_id")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2),
          r.getLong(3))).toSet
    val q = GraftTableStreaming.readChanges(spark, t.root)
      .writeStream.format("memory").queryName("cdc_stream").start()
    try {
      q.processAllAvailable()
      val afterAppend = evts(spark.table("cdc_stream"))
      assert(afterAppend == evts(t.changes()),
        "initial batch must equal the full changelog")
      assert(afterAppend.count(_._3 == "insert") == 3)
      // MOR delete: the appends stream misses this; the CDC stream
      // must emit a delete event for the masked row
      t.delete(col("k") === "a-2")
      q.processAllAvailable()
      val afterDelete = evts(spark.table("cdc_stream"))
      assert(afterDelete == evts(t.changes()),
        "MOR delete must stream a delete event")
      assert(afterDelete.exists(e => e._1 == "a-2" && e._3 == "delete"))
      // COW update: delete+insert for rewritten rows
      t.setProperties(Map("write.update.mode" -> "copy-on-write"))
      t.update(col("k") === "a-1", Map("v" -> lit(99L)))
      q.processAllAvailable()
      val afterUpdate = evts(spark.table("cdc_stream"))
      assert(afterUpdate == evts(t.changes()),
        "COW rewrite must stream delete+insert events")
      assert(afterUpdate.exists(e => e._1 == "a-1" && e._2 == 99L &&
        e._3 == "insert"))
      // data-neutral compaction: offset advances, zero new events
      val before = spark.table("cdc_stream").count()
      t.rewriteDataFiles()
      q.processAllAvailable()
      assert(spark.table("cdc_stream").count() == before,
        "replace snapshots must not emit change events")
      // WAP: branch-staged rows stay silent until fast-forwarded
      t.createBranch("cdc-wip")
      t.appendToBranch("cdc-wip", rows("staged", 1))
      q.processAllAvailable()
      assert(!evts(spark.table("cdc_stream")).exists(_._1 == "staged-1"),
        "unpublished branch rows leaked into the CDC stream")
      val branchHead = t.meta.refs("cdc-wip").snapshotId
      t.fastForward("main", branchHead)
      q.processAllAvailable()
      val afterPublish = evts(spark.table("cdc_stream"))
      assert(afterPublish.exists(e => e._1 == "staged-1" &&
        e._3 == "insert"), "published branch rows must stream")
      assert(afterPublish == evts(t.changes()),
        "final streamed event set must equal the batch changelog")
    } finally q.stop()
  }

  test("CDC stream + Changelog transforms: per-micro-batch update " +
    "images equal the batch changelogView") {
    import org.apache.spark.sql.types.StructType
    import org.apache.spark.sql.{Dataset, Row}
    import scala.jdk.CollectionConverters._
    import graft.lake.{Changelog, GraftTable}
    val schema = StructType.fromDDL("k STRING, v BIGINT")
    val wh = graft.ScratchDirs.create("graft-cdc-upd-")
    val t = GraftTable.create(spark, wh.resolve("t"), "d.upd", schema,
      Map("write.delete.mode" -> "merge-on-read",
        "write.update.mode" -> "copy-on-write"))
    t.append(spark.createDataFrame(Seq(
      Row("a-1", 1L), Row("a-2", 2L), Row("a-3", 3L)).asJava, schema))
    // the transforms are pure DataFrame functions, so the STREAM
    // applies them per micro-batch — a micro-batch always holds whole
    // commit windows, and both transforms only combine rows within
    // one window, so streamed output must equal the batch view
    val got = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Long, String)]()
    val q = GraftTableStreaming.readChanges(spark, t.root)
      .writeStream.foreachBatch { (df: Dataset[Row], _: Long) =>
        Changelog.computeUpdates(Changelog.removeCarryovers(df), Seq("k"))
          .select("k", "v", "_change_type").collect()
          .foreach(r => got.add(
            (r.getString(0), r.getLong(1), r.getString(2))))
      }.start()
    try {
      q.processAllAvailable()
      t.delete(col("k") === "a-2")
      q.processAllAvailable()
      t.update(col("k") === "a-1", Map("v" -> lit(99L)))
      q.processAllAvailable()
    } finally q.stop()
    val want = t.changelogView(Seq("k"))
      .select("k", "v", "_change_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.asScala.toSeq.sorted === want.toSeq.sorted,
      "streamed per-batch update images must equal the batch view")
    // and the images really surfaced: the COW update streamed as a
    // before/after pair, the carried a-3 row as nothing
    assert(got.asScala.count(e => e._1 == "a-1" &&
      e._3 == "update_before" && e._2 == 1L) === 1)
    assert(got.asScala.count(e => e._1 == "a-1" &&
      e._3 == "update_after" && e._2 == 99L) === 1)
    assert(!got.asScala.exists(e => e._1 == "a-3" && e._3 == "delete"))
  }

  test("CDC stream across a mid-stream RENAME COLUMN: rows keep " +
    "arriving under the query's start-time schema, values correct") {
    import org.apache.spark.sql.types.StructType
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    import graft.lake.GraftTable
    val schema = StructType.fromDDL("k STRING, v BIGINT")
    val wh = graft.ScratchDirs.create("graft-cdc-ren-")
    val t = GraftTable.create(spark, wh.resolve("t"), "d.ren", schema)
    t.append(spark.createDataFrame(Seq(Row("a", 1L)).asJava, schema))
    val q = GraftTableStreaming.readChanges(spark, t.root)
      .writeStream.format("memory").queryName("cdc_ren_stream").start()
    try {
      q.processAllAvailable()
      t.renameColumn("k", "key")
      t.append(spark.createDataFrame(Seq(Row("b", 2L)).asJava,
        StructType.fromDDL("key STRING, v BIGINT")))
      q.processAllAvailable()
      val got = spark.table("cdc_ren_stream")
      // the consumer's schema is the one the query started with
      assert(got.columns.take(2).toSeq === Seq("k", "v"))
      assert(got.orderBy("v").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq ===
        Seq("a" -> 1L, "b" -> 2L),
        "post-rename rows must bind positionally with correct values")
    } finally q.stop()
  }

  test("CDC stream maintains MinHash signatures: foreachBatch folds " +
    "over graft-changes equal a full recompute after appends, MOR " +
    "delete, COW update, and compaction") {
    import org.apache.spark.sql.types.StructType
    import org.apache.spark.sql.{DataFrame, Dataset, Row}
    import scala.jdk.CollectionConverters._
    import graft.lake.{GraftTable, LakeQueries}
    import org.apache.spark.sql.functions._
    val schema = StructType.fromDDL("doc_id BIGINT, text STRING")
    val wh = graft.ScratchDirs.create("graft-isig-")
    val t = GraftTable.create(spark, wh.resolve("docs"), "d.docs", schema,
      Map("write.delete.mode" -> "merge-on-read",
        "write.update.mode" -> "copy-on-write"))
    def append(rows: (Long, String)*): Unit =
      t.append(spark.createDataFrame(rows.map { case (i, x) =>
        Row(java.lang.Long.valueOf(i), x) }.asJava, schema))
    append(1L -> "the quick brown fox jumps",
      2L -> "the quick brown fox leaps",
      3L -> "spark lake table format rocks")
    // state lives across micro-batches; foreachBatch runs serially
    var state = LakeQueries.minhashSigs(spark.createDataFrame(
      java.util.Collections.emptyList[Row](), schema))
    val q = spark.readStream.format("graft-changes")
      .option("path", t.root.toString).load()
      .writeStream.foreachBatch { (df: Dataset[Row], _: Long) =>
        state = LakeQueries.foldSigDelta(state, df)
        ()
      }.start()
    def settled(): Array[(Long, Long, Long, Long, Long)] = {
      q.processAllAvailable()
      state.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).sortBy(_._1)
    }
    def full(): Array[(Long, Long, Long, Long, Long)] =
      LakeQueries.minhashSigs(t.read()).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).sortBy(_._1)
    try {
      assert(settled().sameElements(full()), "cold-start backfill")
      append(4L -> "the quick brown fox jumps", // exact dup of doc 1
        5L -> "completely different text entirely here")
      t.delete(col("doc_id") === 5L) // MOR delete
      assert(settled().sameElements(full()), "append + MOR delete")
      // streamed exact dup carries doc 1's exact signature
      val byId = settled().map(s => s._1 -> (s._2, s._3, s._4, s._5)).toMap
      assert(byId(4L) == byId(1L), "exact dup must collide signatures")
      t.update(col("doc_id") === 3L,
        Map("text" -> lit("spark lake table format shines"))) // COW
      t.rewriteDataFiles() // compaction must contribute NOTHING
      assert(settled().sameElements(full()), "COW update + compaction")
      // equality delete: the third delete flavor the changelog emits
      t.equalityDelete(spark.createDataFrame(
        Seq(Row(java.lang.Long.valueOf(2L))).asJava,
        StructType.fromDDL("doc_id BIGINT")))
      val after = settled()
      assert(after.sameElements(full()), "equality delete")
      assert(!after.exists(_._1 == 2L), "eq-deleted doc must leave state")
    } finally q.stop()
  }

  test("maxSnapshotsPerTrigger pages a cold start through table " +
    "history: capped micro-batches, nothing lost, on both sources") {
    import org.apache.spark.sql.types.StructType
    import org.apache.spark.sql.{Dataset, Row}
    import scala.jdk.CollectionConverters._
    import graft.lake.GraftTable
    val schema = StructType.fromDDL("k STRING, v BIGINT")
    val wh = graft.ScratchDirs.create("graft-rate-")
    val t = GraftTable.create(spark, wh.resolve("src"), "d.rate", schema)
    (1 to 5).foreach(i => t.append(spark.createDataFrame(
      Seq(Row(s"c$i-1", i.toLong), Row(s"c$i-2", i.toLong)).asJava,
      schema)))
    // CDC source: each batch may cover at most 2 commits
    val cdcBatches =
      scala.collection.concurrent.TrieMap.empty[Long, (Long, Long)]
    val q1 = spark.readStream.format("graft-changes")
      .option("path", t.root.toString)
      .option("maxSnapshotsPerTrigger", "2").load()
      .writeStream.foreachBatch { (df: Dataset[Row], id: Long) =>
        cdcBatches(id) =
          (df.count(), df.select("_commit_snapshot_id").distinct().count())
        ()
      }.start()
    try q1.processAllAvailable() finally q1.stop()
    assert(cdcBatches.values.map(_._1).sum == 10,
      s"rows lost under the cap: $cdcBatches")
    assert(cdcBatches.count(_._2._1 > 0) >= 3,
      s"5 commits at cap 2 must take >= 3 batches: $cdcBatches")
    assert(cdcBatches.values.forall(_._2 <= 2),
      s"a batch exceeded the 2-commit cap: $cdcBatches")
    // appends source: same cap protocol over the raw snapshot log
    val appBatches = scala.collection.concurrent.TrieMap.empty[Long, Long]
    val q2 = spark.readStream.format("graft-appends")
      .option("path", t.root.toString)
      .option("maxSnapshotsPerTrigger", "2").load()
      .writeStream.foreachBatch { (df: Dataset[Row], id: Long) =>
        appBatches(id) = df.count(); ()
      }.start()
    try q2.processAllAvailable() finally q2.stop()
    assert(appBatches.values.sum == 10,
      s"rows lost under the cap: $appBatches")
    assert(appBatches.count(_._2 > 0) >= 3,
      s"5 appends at cap 2 must take >= 3 batches: $appBatches")
  }

  test("streamed GDPR erasure: foreachBatch equality deletes from a " +
    "requests stream equal the one-shot batch delete, re-delivery is " +
    "a no-op, and a post-erasure re-insert stays visible") {
    import org.apache.spark.sql.types.StructType
    import org.apache.spark.sql.{Dataset, Row}
    import scala.jdk.CollectionConverters._
    import graft.lake.GraftCatalog
    val piiSchema = StructType.fromDDL("case_id STRING, email STRING")
    val wh = graft.ScratchDirs.create("graft-erasure-")
    val cat = new GraftCatalog(spark, wh)
    cat.createNamespace("default")
    val pii = cat.createTable("default", "pii", piiSchema)
    val twin = cat.createTable("default", "pii_twin", piiSchema)
    val rows = (1 to 6).map(i => Row(s"case-$i", s"u$i@example.com"))
    pii.append(spark.createDataFrame(rows.asJava, piiSchema))
    twin.append(spark.createDataFrame(rows.asJava, piiSchema))
    val reqSchema = StructType.fromDDL("case_id STRING")
    val req = cat.createTable("default", "erasure_requests", reqSchema)
    def reqRows(ids: String*) =
      spark.createDataFrame(ids.map(Row(_)).asJava, reqSchema)
    def cases(t: graft.lake.GraftTable): Seq[String] =
      t.read().select("case_id").collect().map(_.getString(0))
        .sorted.toSeq
    val q = GraftTableStreaming.readAppends(spark, req.root)
      .writeStream.foreachBatch { (b: Dataset[Row], _: Long) =>
        pii.equalityDelete(b.select("case_id")); ()
      }
      .option("checkpointLocation",
        graft.ScratchDirs.create("graft-er-ck-").toString)
      .start()
    try {
      req.append(reqRows("case-2", "case-4"))
      q.processAllAvailable()
      req.append(reqRows("case-5"))
      q.processAllAvailable()
    } finally q.stop()
    // batch twin: ONE equality delete of all requests at once
    twin.equalityDelete(reqRows("case-2", "case-4", "case-5"))
    assert(cases(pii) === cases(twin),
      "streamed wave-by-wave erasure must equal the one-shot delete")
    assert(cases(pii) === Seq("case-1", "case-3", "case-6"))
    // at-least-once retry: re-applying a processed wave is a no-op
    pii.equalityDelete(reqRows("case-2", "case-4"))
    assert(cases(pii) === Seq("case-1", "case-3", "case-6"),
      "re-delivered erasure wave must not change state")
    // Iceberg sequence rule: an equality delete masks only rows from
    // files added BEFORE it — a re-registered case is visible again
    pii.append(spark.createDataFrame(
      Seq(Row("case-2", "new2@example.com")).asJava, piiSchema))
    assert(cases(pii) === Seq("case-1", "case-2", "case-3", "case-6"),
      "a post-erasure re-insert must be visible (sequence rule)")
  }

  test("transformWithState KMV distinct-count: streamed tail estimates " +
    "equal the batch twin's math regardless of micro-batch boundaries") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      // k=8 < the fixture's 15 distinct users, so the ESTIMATING branch
      // runs here (the production K=64 twin estimates at sf>=0.01)
      val k = 8
      val stream = Streams.readEvents(spark, stageDir.toString)
      Streams.runToMemory(Streams.kmvDistinct(stream, k),
        "kmv_distinct", OutputMode.Append)
      val got = spark.table("kmv_distinct").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      // state must actually carry across the 4 chronological batches
      val perType = got.groupBy(_._1)
      assert(perType.values.forall(_.length >= 2),
        "each type must emit from more than one micro-batch")
      val finals = perType.view.mapValues(
        // the final state per type: retained-set growth is monotone, and
        // once saturated at k the estimate still grows as theta shrinks,
        // so the lexicographic (n_retained, est) max IS the last state —
        // maxBy(n_retained) alone would pick an arbitrary tied earlier
        // batch whenever saturation happens before the final one
        _.maxBy(t => (t._2, t._3))).toMap.values
        .map(t => (t._1, t._2, t._3)).toSet

      // batch expectation: same hashes, same estimator, one pass
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("h")
      val want = batchEvents
        .select(col("event_type"), col("user_id")).distinct()
        .select(col("event_type"),
          conv(substring(md5(col("user_id").cast("string")), 1, 15),
            16, 10).cast("long").as("h"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          when(count(lit(1)) < k, lit(1152921504606846976L))
            .otherwise(max("h")).as("theta"))
        .select(col("event_type"), col("cnt"),
          when(col("cnt") < k, col("cnt")).otherwise(expr(
            s"CAST((${k - 1} * CAST(1152921504606846976 AS " +
              "DECIMAL(38,0))) div theta AS BIGINT)")).as("est"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(finals === want)
      assert(want.exists(_._2 == k.toLong),
        "fixture must push at least one type into the estimating branch")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState quantile sketch: streamed tail medians " +
    "equal the batch twin's math regardless of micro-batch boundaries") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      // k=8 < every type's event count, so the sample actually
      // truncates here (the production K=64 twin truncates at sf>=0.01)
      val k = 8
      val stream = Streams.readEvents(spark, stageDir.toString)
      Streams.runToMemory(Streams.quantileSketch(stream, k),
        "quantile_sketch", OutputMode.Append)
      val got = spark.table("quantile_sketch").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      val perType = got.groupBy(_._1)
      assert(perType.values.forall(_.length >= 2),
        "each type must emit from more than one micro-batch")
      // the tail emission per type = max n_seen (the monotone
      // rows-folded counter; the median itself is NOT monotone)
      val finals = perType.view.mapValues(_.maxBy(_._2)).toMap
      // batch expectation: same hash/round/keep-K/min-v/order-stat
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type")
      val seen = batchEvents.groupBy("event_type")
        .agg(count(lit(1)).as("n_seen"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = batchEvents
        .select(col("event_type"),
          conv(substring(md5(col("event_id").cast("string")), 1, 15),
            16, 10).cast("long").as("h"),
          expr("CAST(round(value * 100) AS BIGINT)").as("v"))
        .groupBy("event_type", "h").agg(min("v").as("v"))
        .withColumn("rk", row_number().over(w.orderBy("h")))
        .filter(col("rk") <= k)
        .withColumn("rn", row_number().over(w.orderBy("v", "h")))
        .withColumn("m", count(lit(1)).over(w))
        .filter(col("rn") === expr("(m-1) * 50 div 100 + 1"))
        .select(col("event_type"), col("m").cast("long"),
          col("v").cast("long"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(want.nonEmpty)
      want.foreach { case (t, (m, p50)) =>
        val (_, gseen, gm, gp) = finals(t)
        assert(gseen === seen(t) && gm === m && gp === p50,
          s"type $t: streamed tail ($gseen, $gm, $gp) != batch " +
            s"(${seen(t)}, $m, $p50)")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("kmvHash60 is bit-identical to the SQL md5/conv hash the batch " +
    "twin and its oracle use") {
    val viaSql = batchEvents.select(col("user_id").cast("string").as("u"))
      .distinct()
      .select(col("u"),
        conv(substring(md5(col("u")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(viaSql.nonEmpty)
    viaSql.foreach { case (u, h) =>
      assert(Streams.kmvHash60(u) === h, s"hash mismatch for user $u")
    }
  }

  test("stream-static dimension join: each micro-batch broadcast-joins " +
    "the static nation table; enriched rows equal the batch twin") {
    val nation = graft.rel.Tables.nation(spark, "/root/testdata/sf0.001")
    val stream = Streams.readEvents(spark, stageDir.toString)
    Streams.runToMemory(
      Streams.nationEnrich(stream, nation)
        .select(col("event_id"), col("n_name")),
      "static_join", OutputMode.Append)
    val got = spark.table("static_join").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val want = Streams.nationEnrich(batchEvents, nation)
      .select(col("event_id"), col("n_name")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("upsert sink: per-window RowDelta commits fold a CDC feed; the " +
    "table's OWN changelog then reads as delete+insert per touched " +
    "key; a tombstone for an absent key is harmless") {
    import org.apache.spark.sql.types.StructType
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    import graft.lake.GraftTable
    import graft.streaming.GraftTableStreaming.upsertBatch
    val sch = StructType.fromDDL("id BIGINT, v STRING")
    val t = GraftTable.create(spark,
      graft.ScratchDirs.create("graft-ups-").resolve("t"), "d.t", sch,
      Map.empty)
    def batch(rows: (Long, String, Boolean)*): DataFrame =
      spark.createDataFrame(rows.map { case (k, v, d) =>
        Row(Long.box(k), v, Boolean.box(d)) }.asJava,
        StructType.fromDDL("id BIGINT, v STRING, _del BOOLEAN"))
    // window 0: seed; window 1: update 1, tombstone 2, tombstone an
    // ABSENT key 99 (CDC feeds deliver deletes for rows a consumer
    // never saw — must be a no-op, not an error)
    upsertBatch(t, "q", Seq("id"), Some("_del"))(
      batch((1L, "a", false), (2L, "b", false)), 0L)
    upsertBatch(t, "q", Seq("id"), Some("_del"))(
      batch((1L, "a2", false), (2L, "", true), (99L, "", true)), 1L)
    assert(t.read().orderBy("id").collect().toSeq ===
      Seq(Row(1L, "a2")))
    // the upserted table is itself CDC-readable: window 1 emits the
    // masked parents as deletes and the new image as an insert
    val w1 = t.changes().filter(col("_change_ordinal") === 1)
      .select("_change_type", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted
    assert(w1.toSeq === Seq(
      ("delete", 1L, "a"), ("delete", 2L, "b"), ("insert", 1L, "a2")))
    // exactly-once: replaying window 1 with different rows is skipped
    val snaps = t.meta.snapshots.size
    upsertBatch(t, "q", Seq("id"), Some("_del"))(
      batch((7L, "ghost", false)), 1L)
    assert(t.meta.snapshots.size === snaps)
    assert(t.read().filter(col("id") === 7L).count() === 0L)
  }

  test("startSnapshotId: a new consumer skips the backfill and " +
    "streams only commits AFTER the named snapshot (appends + CDC)") {
    import org.apache.spark.sql.types.StructType
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    import graft.lake.GraftTable
    val sch = StructType.fromDDL("k BIGINT, v STRING")
    val t = GraftTable.create(spark,
      graft.ScratchDirs.create("graft-ssi-").resolve("t"), "d.t", sch,
      Map.empty)
    def rows(r: (Long, String)*): DataFrame =
      spark.createDataFrame(r.map { case (k, v) =>
        Row(Long.box(k), v) }.asJava, sch)
    t.append(rows((1L, "backfill-a")))
    t.append(rows((2L, "backfill-b")))
    val mark = t.currentSnapshot.get.snapshotId
    t.append(rows((3L, "live-c")))
    // one shared table across both formats: track what lives after
    // the mark cumulatively (iteration 2 must also see iteration 1's
    // live append — only the pre-mark backfill is skipped)
    val afterMark =
      scala.collection.mutable.ArrayBuffer[(Long, String)]((3L, "live-c"))
    for ((fmt, i) <- Seq("graft-appends", "graft-changes").zipWithIndex) {
      val in = spark.readStream.format(fmt)
        .option("path", t.root.toString)
        .option("startSnapshotId", mark.toString).load()
      val name = s"ssi_${fmt.replace('-', '_')}"
      val q = in.select("k", "v").writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation",
          graft.ScratchDirs.create("graft-ssi-ck-").toString)
        .start()
      try {
        q.processAllAvailable()
        t.append(rows((4L + i, s"live-$i")))
        afterMark += ((4L + i, s"live-$i"))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(got === afterMark.sorted.toSeq,
        s"[$fmt] must skip the pre-mark backfill, got $got")
    }
  }

  test("stream-from-timestamp: the stream begins with commits AT or " +
    "AFTER the timestamp on both formats; a timestamp predating the " +
    "table is the full backfill; combining both start knobs refuses") {
    import org.apache.spark.sql.types.StructType
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    import graft.lake.GraftTable
    val sch = StructType.fromDDL("k BIGINT, v STRING")
    val t = GraftTable.create(spark,
      graft.ScratchDirs.create("graft-sft-").resolve("t"), "d.t", sch,
      Map.empty)
    def rows(r: (Long, String)*): DataFrame =
      spark.createDataFrame(r.map { case (k, v) =>
        Row(Long.box(k), v) }.asJava, sch)
    t.append(rows((1L, "backfill-a")))
    t.append(rows((2L, "backfill-b")))
    Thread.sleep(5) // distinct commit millisecond for the cutoff
    t.append(rows((3L, "live-c")))
    val ts = t.currentSnapshot.get.timestampMs // live-c's commit time
    val afterTs =
      scala.collection.mutable.ArrayBuffer[(Long, String)]((3L, "live-c"))
    for ((fmt, i) <- Seq("graft-appends", "graft-changes").zipWithIndex) {
      val in = spark.readStream.format(fmt)
        .option("path", t.root.toString)
        .option("stream-from-timestamp", ts.toString).load()
      val name = s"sft_${fmt.replace('-', '_')}"
      val q = in.select("k", "v").writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation",
          graft.ScratchDirs.create("graft-sft-ck-").toString)
        .start()
      try {
        q.processAllAvailable()
        t.append(rows((4L + i, s"live-$i")))
        afterTs += ((4L + i, s"live-$i"))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(got === afterTs.sorted.toSeq,
        s"[$fmt] must skip commits before the timestamp, got $got")
    }
    // a timestamp from before the table existed = full backfill
    assert(graft.streaming.GraftTableStreaming.initialStartSnapshot(t,
      Map("stream-from-timestamp" -> "0")).isEmpty)
    // the two start knobs contradict each other
    intercept[IllegalArgumentException] {
      graft.streaming.GraftTableStreaming.initialStartSnapshot(t,
        Map("startSnapshotId" -> "1", "stream-from-timestamp" -> "1"))
    }
  }

  test("upsert sink with sequenceCol: a coalesced batch carrying " +
    "several events per key folds to each key's LATEST event — " +
    "upsert-then-tombstone deletes, tombstone-then-upsert lives") {
    import org.apache.spark.sql.types.StructType
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    import graft.lake.GraftTable
    import graft.streaming.GraftTableStreaming.upsertBatch
    val sch = StructType.fromDDL("id BIGINT, v STRING")
    val t = GraftTable.create(spark,
      graft.ScratchDirs.create("graft-upsq-").resolve("t"), "d.t", sch,
      Map.empty)
    def batch(rows: (Long, String, Boolean, Long)*): DataFrame =
      spark.createDataFrame(rows.map { case (k, v, d, sq) =>
        Row(Long.box(k), v, Boolean.box(d), Long.box(sq)) }.asJava,
        StructType.fromDDL(
          "id BIGINT, v STRING, _del BOOLEAN, _seq BIGINT"))
    upsertBatch(t, "q", Seq("id"), Some("_del"), Some("_seq"))(
      batch((1L, "a", false, 1L), (2L, "b", false, 1L)), 0L)
    // one catch-up batch: key 1 updated twice (last wins), key 2
    // upserted then tombstoned (dies), key 3 tombstoned then
    // re-upserted (lives), key 4 plain insert
    upsertBatch(t, "q", Seq("id"), Some("_del"), Some("_seq"))(
      batch(
        (1L, "a2", false, 10L), (1L, "a3", false, 11L),
        (2L, "b2", false, 10L), (2L, "", true, 11L),
        (3L, "", true, 10L), (3L, "c", false, 11L),
        (4L, "d", false, 10L)), 1L)
    assert(t.read().orderBy("id").collect().toSeq === Seq(
      Row(1L, "a3"), Row(3L, "c"), Row(4L, "d")))
    // exactly one row per surviving key — no within-batch duplicates
    assert(t.read().count() === 3L)
  }

  test("upsert stream x maintenance x bucket-local: equality deletes " +
    "suspend join eligibility, ONE maintain() compacts them away and " +
    "restores it, rows unchanged (the full CDC-serving loop)") {
    import org.apache.spark.sql.types.StructType
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    import graft.lake.GraftTable
    import graft.streaming.GraftTableStreaming.upsertBatch
    val sch = StructType.fromDDL("id BIGINT, v STRING")
    val t = GraftTable.create(spark,
      graft.ScratchDirs.create("graft-upsm-").resolve("t"), "d.t", sch,
      Map("write.clustered-by" -> "bucket(4,id)",
        "write.clustered-by.files" -> "4",
        "maintenance.compact.min-delete-files" -> "1"))
    def batch(rows: (Long, String)*): DataFrame =
      spark.createDataFrame(rows.map { case (k, v) =>
        Row(Long.box(k), v) }.asJava, sch)
    upsertBatch(t, "q", Seq("id"))(
      batch((0L until 100L).map(k => (k, s"v$k")): _*), 0L)
    assert(t.bucketLocalRead("id").isDefined,
      "a pure-insert first window keeps the clustered layout eligible")
    // window 1 rewrites 10 keys -> an equality-delete file lands
    upsertBatch(t, "q", Seq("id"))(
      batch((0L until 10L).map(k => (k, s"new$k")): _*), 1L)
    assert(t.bucketLocalRead("id").isEmpty,
      "equality deletes must suspend the layout claim")
    val want = t.read().orderBy("id").collect().toSeq
    val acts = t.maintain().map(_._1)
    assert(acts.contains("compact-deletes"), s"got $acts")
    assert(t.bucketLocalRead("id").isDefined,
      "compaction must restore bucket-local eligibility")
    assert(t.read().orderBy("id").collect().toSeq === want)
    assert(t.read().filter(col("v") === "new3").count() === 1L)
  }

  test("streaming across SEGMENT compaction: rewrite_manifests and a " +
    "merge-on-commit fold re-bin the manifest mid-stream; both sources' " +
    "offsets stay stable and per-commit file deltas are unchanged " +
    "(segment paths are storage, not lineage)") {
    import org.apache.spark.sql.types.StructType
    import org.apache.spark.sql.{Dataset, Row}
    import scala.jdk.CollectionConverters._
    import graft.lake.GraftTable
    val sch = StructType.fromDDL("k STRING, v BIGINT")
    val wh = graft.ScratchDirs.create("graft-segstream-")
    // min-count 3 so the FOURTH commit's list (3 small segments after
    // the mid-stream rewrite_manifests) folds on commit
    val t = GraftTable.create(spark, wh.resolve("src"), "d.seg", sch,
      Map("write.delete.mode" -> "merge-on-read",
        "commit.manifests.min-count-to-merge" -> "3"))
    def append(c: Int): Unit = t.append(spark.createDataFrame(
      Seq(Row(s"c$c-1", c.toLong), Row(s"c$c-2", c.toLong)).asJava, sch))
    def headSegments(): Set[String] =
      t.manifests.select("path").collect().map(_.getString(0)).toSet
    append(1); append(2)
    val appended = scala.collection.concurrent.TrieMap.empty[String, Long]
    val events =
      scala.collection.concurrent.TrieMap.empty[(String, String), Long]
    val qa = spark.readStream.format("graft-appends")
      .option("path", t.root.toString).load()
      .writeStream.foreachBatch { (df: Dataset[Row], _: Long) =>
        df.collect().foreach(r =>
          appended.updateWith(r.getString(0))(n => Some(n.getOrElse(0L) + 1)))
        ()
      }.start()
    val qc = spark.readStream.format("graft-changes")
      .option("path", t.root.toString).load()
      .writeStream.foreachBatch { (df: Dataset[Row], _: Long) =>
        df.collect().foreach { r =>
          val key = (r.getString(0), r.getAs[String]("_change_type"))
          events.updateWith(key)(n => Some(n.getOrElse(0L) + 1))
        }
        ()
      }.start()
    try {
      qa.processAllAvailable(); qc.processAllAvailable()
      assert(appended.keySet == Set("c1-1", "c1-2", "c2-1", "c2-2"))
      val segsBefore = headSegments()
      assert(segsBefore.size == 2, "two appends = two segments")
      // metadata-only compaction mid-stream: op=replace, rows identical
      assert(t.rewriteManifests(2).isDefined)
      val segsCompacted = headSegments()
      assert(segsCompacted.size == 1 &&
        segsCompacted.intersect(segsBefore).isEmpty,
        "rewrite_manifests must re-bin into fresh segment paths")
      qa.processAllAvailable(); qc.processAllAvailable()
      assert(appended.values.forall(_ == 1L),
        s"replace commit re-emitted rows on graft-appends: $appended")
      assert(!events.exists(_._1._2 != "insert"),
        s"replace commit emitted change rows: $events")
      // two more appends: the second one's 3-segment list trips
      // merge-on-commit and folds mid-stream
      append(3); append(4)
      assert(headSegments().size < 3 &&
        headSegments().intersect(segsCompacted).isEmpty,
        "merge-on-commit must have folded the adjacent small segments")
      qa.processAllAvailable(); qc.processAllAvailable()
      assert(appended.keySet ==
        Set("c1-1", "c1-2", "c2-1", "c2-2", "c3-1", "c3-2", "c4-1", "c4-2")
        && appended.values.forall(_ == 1L),
        s"fold changed the appends file delta: $appended")
      assert(events.keySet.map(_._1) == appended.keySet &&
        events.values.forall(_ == 1L),
        s"fold changed the CDC delta: $events")
      // MOR delete still lands as a delete event, never an append
      t.delete(col("k") === "c3-1")
      qa.processAllAvailable(); qc.processAllAvailable()
      assert(events(("c3-1", "delete")) == 1L)
      assert(appended(("c3-1")) == 1L, "a delete must not re-append")
    } finally { qa.stop(); qc.stop() }
  }
}
