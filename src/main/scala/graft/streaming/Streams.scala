package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor, StreamingQuery, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}
import org.apache.spark.sql.types._

/** SURVEY.md §2j real Structured Streaming surface: file-source
  * readStream over the events schema, watermarked windowed aggregation,
  * and custom sessionization state via flatMapGroupsWithState. The
  * batch twins live in [[StreamBatchQueries]] (same window expressions,
  * DuckDB-checked); this module proves the identical logic runs
  * incrementally with state and late-data handling.
  *
  * Scale notes (100 TB / day of events): state is keyed on
  * (window x event_type) or user_id — the watermark bounds state size
  * because windows/sessions older than (max event time - delay) are
  * evicted; without it, state grows without bound. The shuffle keys
  * match the batch plans, so a batch pipeline migrates to streaming
  * without re-partitioning.
  */
object Streams {

  final case class Ev(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionOut(
      user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** Buffered open-session state per user: ascending event times (µs). */
  final case class SessionState(times: List[Long])

  /** File-source stream with the events schema. `path` must be a
    * directory of parquet files; each file becomes (at most) one
    * micro-batch under `maxFilesPerTrigger=1`. ts arrives as
    * microseconds (the spec stages files with ts pre-converted) and is
    * exposed as a proper TimestampType event-time column.
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_us", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  def readEvents(spark: SparkSession, path: String, maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)
      .withColumn("ts", timestamp_micros(col("ts_us")))

  /** Tumbling 1-day windowed counts/sums with a 1-hour watermark —
    * the streaming twin of q_stream_tumbling. Append mode emits a
    * window only once the watermark passes its end (exactly-once
    * per-window output); state for closed windows is dropped.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("total"))

  /** Streaming exact dedup — the ingestion-side twin of
    * q_dedup_exact: keep the first arrival per event_id, drop
    * replays. dropDuplicatesWithinWatermark bounds the dedup state by
    * event time (an id is only remembered while the watermark can
    * still admit a duplicate), so state is O(ids per watermark
    * window), not O(all ids ever) — the property that lets this run
    * forever on an unbounded stream.
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom state machine: per-user sessionization with a 30-minute
    * gap, implemented directly on GroupState (the surface
    * session_window compiles to internally). Each invocation folds the
    * batch's events into the open session buffer; sessions whose gap
    * has closed are emitted and evicted, the open tail stays in state.
    * The last session per user remains open until a later batch (or
    * timeout) closes it — the spec asserts exactly that semantics.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val incoming = evs.map(e => e.ts.getTime * 1000L +
            (e.ts.getNanos / 1000 % 1000)).toList
          val all = (state.getOption.map(_.times).getOrElse(Nil) ++ incoming)
            .sorted
          // split ascending times at gaps > gapUs
          val sessions = all.foldLeft(List.empty[List[Long]]) {
            case (acc, t) => acc match {
              case (cur @ (last :: _)) :: rest if t - last <= gapUs =>
                (t :: cur) :: rest
              case _ => List(t) :: acc
            }
          }.map(_.reverse).reverse
          sessions match {
            case Nil => Iterator.empty
            case _ =>
              val closed = sessions.init
              state.update(SessionState(sessions.last))
              closed.iterator.map(ts =>
                SessionOut(userId, ts.head, ts.last + gapUs, ts.length.toLong))
          }
      }
  }

  final case class MilestoneOut(user_id: Long, milestone: Long, event_id: Long)

  /** Arbitrary state V2 (`transformWithState`, the Spark 4 replacement
    * surface for flatMapGroupsWithState): per-user milestone counter
    * that emits the event completing every k-th event for that user.
    * State is a single ValueState[Long] per user — O(users), never
    * O(events) — checkpointed by the RocksDB state store the API
    * requires. Within each micro-batch the group's rows are sorted by
    * (ts, event_id) so emission follows event-time order whenever the
    * source delivers batches chronologically (the file source with
    * staged chronological files, or any log-ordered source); the batch
    * twin (q_stream_milestones) defines the same semantics with a
    * row_number window. */
  class MilestoneProcessor(k: Long)
      extends StatefulProcessor[Long, Ev, MilestoneOut] {
    @transient private var count: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long](
        "count", org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(
        userId: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[MilestoneOut] = {
      val sorted = rows.toArray.sortBy(e =>
        (e.ts.getTime * 1000L + (e.ts.getNanos / 1000 % 1000), e.event_id))
      var c = if (count.exists()) count.get() else 0L
      val out = sorted.flatMap { e =>
        c += 1
        if (c % k == 0) Some(MilestoneOut(userId, c, e.event_id)) else None
      }
      count.update(c)
      out.iterator
    }
  }

  /** Milestone stream over user events; see [[MilestoneProcessor]]. */
  def milestones(events: DataFrame, k: Long = 25L): Dataset[MilestoneOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new MilestoneProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }

  final case class EwmaOut(user_id: Long, event_id: Long,
      ewma_x10000: Long)

  /** The integer-exact EWMA recursion shared by the streaming
    * processor and the batch twin: y_1 = v_1, y_n = v_n + y_{n-1}/2
    * (truncating halving decay). Values integer-scale first
    * (floor(v·10⁴ + 0.5), half-up — values are nonnegative), so the
    * whole state machine is exact BIGINT: streaming vs batch vs the
    * DuckDB recursive-CTE oracle cannot drift by a ulp. */
  def ewmaStep(prev: Option[Long], vi: Long): Long =
    prev.map(p => vi + p / 2).getOrElse(vi)

  def eventMicros(e: Ev): Long =
    e.ts.getTime * 1000L + (e.ts.getNanos / 1000 % 1000)

  def viOf(e: Ev): Long = {
    val vi = math.floor(e.value * 10000 + 0.5).toLong
    // the exactness argument (Spark floor ≡ DuckDB // ≡ Long./) holds
    // only for nonnegative values — floor vs truncate-toward-zero
    // diverge below 0; fail loudly if datagen ever goes negative
    // instead of silently drifting from the recursive-CTE oracle
    require(vi >= 0, s"ewma requires nonnegative values, got ${e.value}")
    vi
  }

  /** Per-user EWMA smoother (ValueState[Long] — O(users), never
    * O(events)): each event emits the user's updated smoothed value.
    * Within a micro-batch rows sort by (ts, event_id) like
    * [[MilestoneProcessor]], so chronological batches reproduce the
    * batch recursion exactly — the streaming form IS the 100 TB
    * shape (state one long per user; the batch twin's per-user fold
    * replays history). */
  class EwmaProcessor extends StatefulProcessor[Long, Ev, EwmaOut] {
    @transient private var yState: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      yState = getHandle.getValueState[Long](
        "y", org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(
        userId: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[EwmaOut] = {
      val sorted = rows.toArray.sortBy(e => (eventMicros(e), e.event_id))
      var y = if (yState.exists()) Option(yState.get()) else None
      val out = sorted.map { e =>
        val ny = ewmaStep(y, viOf(e))
        y = Some(ny)
        EwmaOut(userId, e.event_id, ny)
      }
      y.foreach(yState.update)
      out.iterator
    }
  }

  /** EWMA stream over user events; see [[EwmaProcessor]]. */
  def ewmaSmoothed(events: DataFrame): Dataset[EwmaOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new EwmaProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Batch replay of the same recursion — the secondary-sort fold:
    * repartition by user, sort WITHIN partitions by (user, ts,
    * event_id), one O(1)-memory pass resetting state at each user
    * boundary. One shuffle, no per-user materialization — unlike a
    * groupByKey+toArray this holds one ROW at a time, so the twin
    * itself survives a user with unbounded history. */
  def ewmaBatch(events: DataFrame): Dataset[EwmaOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[Ev]
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
      .mapPartitions { it =>
        var user = Long.MinValue
        var y: Option[Long] = None
        it.map { e =>
          if (e.user_id != user) { user = e.user_id; y = None }
          val ny = ewmaStep(y, viOf(e))
          y = Some(ny)
          EwmaOut(e.user_id, e.event_id, ny)
        }
      }
  }

  final case class ThrottleOut(user_id: Long, event_type: String,
      event_id: Long, n_emitted: Long)

  /** TTL throttle (rate-limit dedup) contract: per (user, event_type)
    * key, an event is EMITTED iff it is the key's first or its event
    * time is ≥ the last EMITTED event's time + TTL; suppressed events
    * never advance the clock (the alerting/notification-dedup
    * semantics — "at most one page per key per 48 h"). The emission
    * decision is a recursion on the key's history: not expressible as
    * a plain window (lag() sees the previous EVENT, not the previous
    * EMISSION), so like EWMA it lives three ways — streaming
    * ValueState machine, batch secondary-sort fold, and a DuckDB
    * RECURSIVE CTE oracle — all bit-equal in integer microseconds. */
  val ThrottleTtlMicros: Long = 172800L * 1000000L // 48 h

  def throttleEmits(lastEmit: Option[Long], tus: Long): Boolean =
    lastEmit.forall(le => tus >= le + ThrottleTtlMicros)

  /** Per-(user,type) throttle (ValueState[(lastEmitMicros, nEmitted)]
    * — O(keys), never O(events)): emits only the surviving events,
    * each with its running emission ordinal. Micro-batch rows sort by
    * (ts, event_id) like [[EwmaProcessor]], so chronological batches
    * reproduce the batch recursion exactly. */
  class ThrottleProcessor
      extends StatefulProcessor[(Long, String), Ev, ThrottleOut] {
    @transient private var st: ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("emit",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong), TTLConfig.NONE)
    override def handleInputRows(
        key: (Long, String), rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[ThrottleOut] = {
      val sorted = rows.toArray.sortBy(e => (eventMicros(e), e.event_id))
      var cur = if (st.exists()) Option(st.get()) else None
      val out = sorted.flatMap { e =>
        val tus = eventMicros(e)
        if (throttleEmits(cur.map(_._1), tus)) {
          val n = cur.map(_._2).getOrElse(0L) + 1
          cur = Some((tus, n))
          Some(ThrottleOut(key._1, key._2, e.event_id, n))
        } else None
      }
      cur.foreach(st.update)
      out.iterator
    }
  }

  def throttled(events: DataFrame): Dataset[ThrottleOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[Ev]
      .groupByKey(e => (e.user_id, e.event_type))
      .transformWithState(new ThrottleProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Batch replay of the throttle recursion — the same secondary-sort
    * fold shape as [[ewmaBatch]]: one shuffle on the key, O(1) state
    * per row, survives unbounded per-key history. */
  def throttleBatch(events: DataFrame): Dataset[ThrottleOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[Ev]
      .repartition(col("user_id"), col("event_type"))
      .sortWithinPartitions(col("user_id"), col("event_type"),
        col("ts"), col("event_id"))
      .mapPartitions { it =>
        var user = Long.MinValue
        var typ = ""
        var cur: Option[(Long, Long)] = None
        it.flatMap { e =>
          if (e.user_id != user || e.event_type != typ) {
            user = e.user_id; typ = e.event_type; cur = None
          }
          val tus = eventMicros(e)
          if (throttleEmits(cur.map(_._1), tus)) {
            val n = cur.map(_._2).getOrElse(0L) + 1
            cur = Some((tus, n))
            Some(ThrottleOut(e.user_id, e.event_type, e.event_id, n))
          } else None
        }
      }
  }

  /** Event-time-timer sessionizer (the timer surface of the V2 state
    * API): per-user event times buffer in ListState; a session is
    * EMITTED the moment the watermark proves it closed (last event +
    * gap ≤ watermark) — either on arrival of newer data for that user
    * or, crucially, via a registered event-time timer when the user
    * simply goes quiet (the case arrival-driven operators like
    * [[sessionize]] can only flush on the next batch that happens to
    * carry the user's key). One timer per user, re-registered at the
    * earliest possible next close; every drain emits ALL closed
    * sessions, so a single no-data batch after the final watermark
    * advance flushes everything that can ever close. State is the open
    * tail only — watermark-bounded, O(open events per user).
    */
  class InactivitySessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Ev, SessionOut] {
    @transient private var times: ListState[Long] = _
    @transient private var pendingTimer: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      times = getHandle.getListState[Long](
        "times", org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      pendingTimer = getHandle.getValueState[Long](
        "pendingTimer", org.apache.spark.sql.Encoders.scalaLong,
        TTLConfig.NONE)
    }

    private def sessionsOf(sorted: Seq[Long]): List[List[Long]] =
      sorted.foldLeft(List.empty[List[Long]]) {
        case ((cur @ (last :: _)) :: rest, t)
          if t - last <= gapMs * 1000 => (t :: cur) :: rest
        case (acc, t) => List(t) :: acc
      }.map(_.reverse).reverse

    /** Emit every session already closed at `wmMs`, restore the open
      * tail to state, and (re)arm one timer at the earliest time the
      * next buffered session can close. */
    private def drain(userId: Long, wmMs: Long): Iterator[SessionOut] = {
      val buf = times.get().toSeq.sorted
      if (pendingTimer.exists()) {
        getHandle.deleteTimer(pendingTimer.get())
        pendingTimer.clear()
      }
      if (buf.isEmpty) return Iterator.empty
      val sessions = sessionsOf(buf)
      val (closed, open) = sessions.partition(s =>
        s.last / 1000 + gapMs <= wmMs)
      if (open.isEmpty) times.clear()
      else {
        times.put(open.flatten.toArray)
        val expiry = open.head.last / 1000 + gapMs
        getHandle.registerTimer(expiry)
        pendingTimer.update(expiry)
      }
      closed.iterator.map(s =>
        SessionOut(userId, s.head, s.last + gapMs * 1000, s.length.toLong))
    }

    override def handleInputRows(userId: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[SessionOut] = {
      rows.foreach(e => times.appendValue(
        e.ts.getTime * 1000L + (e.ts.getNanos / 1000 % 1000)))
      drain(userId, timerValues.getCurrentWatermarkInMs)
    }

    override def handleExpiredTimer(userId: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] =
      drain(userId, timerValues.getCurrentWatermarkInMs)
  }

  final case class FirstSeen(user_id: Long, event_type: String,
      event_id: Long)

  /** MapState completion of the V2 state surface: per-user map of
    * event_type -> first event id, emitting each (user, type) exactly
    * once on first occurrence (the streaming "new behavior detector").
    * State is one small map per user — bounded by the type vocabulary,
    * NOT the stream length — and lookups are per-key point reads, the
    * access pattern MapState exists for (a ValueState holding a whole
    * map would rewrite the blob on every update). Batch rows sort by
    * (ts, event_id) before folding, so with chronological batches the
    * emitted first = the event-time first, which is what the batch
    * twin (q_stream_first_seen) states as a rank-1 window. */
  class FirstSeenProcessor
      extends StatefulProcessor[Long, Ev, FirstSeen] {
    @transient private var seen: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getMapState[String, Long]("seen",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(userId: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[FirstSeen] = {
      val sorted = rows.toArray.sortBy(e =>
        (e.ts.getTime * 1000L + (e.ts.getNanos / 1000 % 1000), e.event_id))
      sorted.iterator.flatMap { e =>
        if (seen.containsKey(e.event_type)) None
        else {
          seen.updateValue(e.event_type, e.event_id)
          Some(FirstSeen(userId, e.event_type, e.event_id))
        }
      }
    }
  }

  /** First-occurrence stream per (user, event_type); see
    * [[FirstSeenProcessor]]. */
  def firstSeen(events: DataFrame): Dataset[FirstSeen] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new FirstSeenProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Timer-driven session stream over user events with a 1-second
    * watermark delay; see [[InactivitySessionProcessor]]. */
  def inactivitySessions(events: DataFrame,
      gapMinutes: Int = 30): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "1 second")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(
        new InactivitySessionProcessor(gapMinutes * 60L * 1000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Stream-stream inner join: each purchase matched to the same
    * user's views in the preceding hour. Works on both streaming and
    * batch inputs (withWatermark is a no-op in batch), so the batch
    * twin (q_stream_join) and the StreamingSpec round-trip share this
    * exact plan.
    *
    * Scale notes: both sides shuffle on user_id (the equi part keeps
    * the join keyed — never a cross product), and the time-range
    * conjunct is what lets Structured Streaming BOUND the buffered
    * state: with a 2h watermark and a 1h range, a buffered view is
    * evicted once the watermark passes its ts + 1h, so state is
    * O(events per watermark horizon), not O(stream length).
    */
  def purchaseViewJoin(left: DataFrame, right: DataFrame): DataFrame = {
    val p = left.filter(col("event_type") === "purchase")
      .withWatermark("ts", "2 hours")
      .select(col("event_id").as("purchase_id"), col("ts").as("pts"),
        col("user_id"))
    val v = right.filter(col("event_type") === "view")
      .withWatermark("ts", "2 hours")
      .select(col("event_id").as("view_id"), col("ts").as("vts"),
        col("user_id").as("v_user"))
    p.join(v, col("user_id") === col("v_user") &&
        col("vts") <= col("pts") &&
        col("vts") > col("pts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("view_id"), col("user_id"))
  }

  /** LEFT OUTER flavor of [[purchaseViewJoin]] — the "purchases with
    * no prior view" detector: same watermarks and time-range
    * condition, but unmatched purchases ALSO emit, with a null
    * view_id. In streaming the null row for an unmatched purchase can
    * only be emitted once the watermark proves no matching view can
    * still arrive (purchase ts < watermark); purchases younger than
    * the final watermark stay withheld in state — the contract
    * StreamingSpec pins against the batch twin. Carries `pts` so
    * consumers (and the spec) can apply the watermark cutoff. */
  def purchaseViewJoinOuter(left: DataFrame,
      right: DataFrame): DataFrame = {
    val p = left.filter(col("event_type") === "purchase")
      .withWatermark("ts", "2 hours")
      .select(col("event_id").as("purchase_id"), col("ts").as("pts"),
        col("user_id"))
    val v = right.filter(col("event_type") === "view")
      .withWatermark("ts", "2 hours")
      .select(col("event_id").as("view_id"), col("ts").as("vts"),
        col("user_id").as("v_user"))
    p.join(v, col("user_id") === col("v_user") &&
        col("vts") <= col("pts") &&
        col("vts") > col("pts") - expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("purchase_id"), col("view_id"), col("user_id"),
        col("pts"))
  }

  /** FULL OUTER flavor of [[purchaseViewJoin]] — completes the
    * stream-stream join matrix: matched pairs emit eagerly, unmatched
    * purchases emit a null view_id once the watermark proves no view
    * can still arrive (pts < watermark), and unmatched VIEWS emit a
    * null purchase_id once no purchase can still match (a matching
    * purchase has pts in [vts, vts+1h), so the view expires when the
    * watermark passes vts + 1h). Both sides carry their event time
    * (pts / vts) so consumers and StreamingSpec can apply each side's
    * watermark cutoff. State stays bounded exactly as in the inner
    * join: the time-range conjunct lets Spark evict both buffers at
    * the watermark horizon. */
  def purchaseViewJoinFull(left: DataFrame,
      right: DataFrame): DataFrame = {
    val p = left.filter(col("event_type") === "purchase")
      .withWatermark("ts", "2 hours")
      .select(col("event_id").as("purchase_id"), col("ts").as("pts"),
        col("user_id"))
    val v = right.filter(col("event_type") === "view")
      .withWatermark("ts", "2 hours")
      .select(col("event_id").as("view_id"), col("ts").as("vts"),
        col("user_id").as("v_user"))
    p.join(v, col("user_id") === col("v_user") &&
        col("vts") <= col("pts") &&
        col("vts") > col("pts") - expr("INTERVAL 1 HOUR"),
      "full_outer")
      .select(col("purchase_id"), col("view_id"),
        coalesce(col("user_id"), col("v_user")).as("user_id"),
        col("pts"), col("vts"))
  }

  final case class KmvOut(event_type: String, n_retained: Long, est: Long)

  /** 2^60 — the KMV hash domain, from the shared rel.Kmv contract. */
  private val KmvDom = graft.rel.Kmv.Dom

  /** 60-bit md5 hash, bit-identical to the SQL-side
    * `conv(substring(md5(cast(x as string)), 1, 15), 16, 10)` used by
    * the batch twin and its DuckDB oracle: lowercase-hex md5 of the
    * UTF-8 bytes, first 15 hex digits as a long. */
  private[streaming] def kmvHash60(key: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // 15 hex digits = first 7 bytes + the high nibble of byte 8
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  private[streaming] def kmvEstimate(retained: Array[Long], k: Int): Long =
    if (retained.length < k) retained.length.toLong
    else (BigInt(k - 1) * BigInt(KmvDom) / BigInt(retained.last)).toLong

  /** Streaming distinct-count state: one KMV sketch (the K smallest
    * 60-bit hashes, a sorted Array[Long]) per event_type — the
    * streaming form of the A17 theta/KMV operator. Folding a batch is
    * set union + re-truncate, so state is O(K) per key FOREVER (a
    * distinct-count via dropDuplicates state would grow with the true
    * cardinality — unbounded on a 100 TB/day stream); each batch emits
    * the key's running estimate. KMV folding is associative and
    * order-independent, so the emitted tail estimate equals the batch
    * twin (q_stream_kmv_distinct) exactly, whatever the micro-batch
    * boundaries were — pinned in StreamingSpec across 4 chronological
    * batches. */
  class KmvDistinctProcessor(k: Int)
      extends StatefulProcessor[String, Ev, KmvOut] {
    @transient private var retained: ValueState[Array[Long]] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      retained = getHandle.getValueState[Array[Long]]("kmv",
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[Array[Long]](),
        TTLConfig.NONE)
    override def handleInputRows(
        eventType: String, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[KmvOut] = {
      val incoming = rows.map(e => kmvHash60(e.user_id.toString))
      val prev: Array[Long] =
        if (retained.exists()) retained.get() else Array.empty[Long]
      val merged = (prev.iterator ++ incoming).toArray
        .distinct.sorted.take(k)
      retained.update(merged)
      Iterator.single(
        KmvOut(eventType, merged.length.toLong, kmvEstimate(merged, k)))
    }
  }

  final case class QuantOut(event_type: String, n_seen: Long,
      n_retained: Long, p50: Long)

  /** Half-away-from-zero integer cents of a double — bit-identical to
    * the batch twin's `CAST(round(value * 100) AS BIGINT)` (Spark
    * HALF_UP ≡ DuckDB round on doubles). scala math.round floors at
    * .5 for negatives, so it is NOT usable here. */
  private[streaming] def centsHalfUp(x: Double): Long = {
    val s = x * 100
    if (s >= 0) math.floor(s + 0.5).toLong else math.ceil(s - 0.5).toLong
  }

  /** Streaming MERGEABLE QUANTILE state: one bottom-K-by-hash row
    * sample per event_type (the A20 q_agg_quantile_sketch structure as
    * transformWithState state) — running quantiles with O(K) state per
    * key forever, where exact quantiles would buffer every value.
    * State is the K (hash, value) pairs with smallest 60-bit md5 of
    * the row-unique event_id, packed [h0,v0,h1,v1,…] sorted by h;
    * folding a batch is union + keep-K — associative and
    * order-independent, so the emitted tail equals the batch twin
    * whatever the micro-batch boundaries (StreamingSpec). Entries key
    * by h with min-v tiebreak, making re-delivered events no-ops
    * (exactly-once for free, like the KMV sketch) and hash collisions
    * deterministic in both engines. Emits the running sample median
    * (integer order statistic under the (v, h) total order) plus a
    * monotone rows-folded counter (`n_seen`) that identifies the tail
    * emission — the retained set's median is NOT monotone, so without
    * it a consumer could not tell which emission is current. State is
    * packed [n_seen, h0, v0, h1, v1, …] sorted by h. */
  class QuantileSketchProcessor(k: Int)
      extends StatefulProcessor[String, Ev, QuantOut] {
    @transient private var retained: ValueState[Array[Long]] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      retained = getHandle.getValueState[Array[Long]]("qsketch",
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[Array[Long]](),
        TTLConfig.NONE)
    override def handleInputRows(
        eventType: String, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[QuantOut] = {
      val inc = rows.map(e =>
        (kmvHash60(e.event_id.toString), centsHalfUp(e.value))).toArray
      val prev: Array[Long] =
        if (retained.exists()) retained.get() else Array(0L)
      val seen = prev(0) + inc.length
      val prevPairs = prev.drop(1).grouped(2).map(a => (a(0), a(1)))
      val merged = (prevPairs ++ inc).toSeq
        .groupMapReduce(_._1)(_._2)(math.min)
        .toArray.sortBy(_._1).take(k)
      retained.update(
        Array(seen) ++ merged.flatMap(p => Array(p._1, p._2)))
      val byV = merged.map { case (h, v) => (v, h) }.sorted
      val m = byV.length
      val rn = ((m - 1) * 50 / 100) + 1
      Iterator.single(
        QuantOut(eventType, seen, m.toLong, byV(rn - 1)._1))
    }
  }

  /** Running per-event-type sample-median estimates; see
    * [[QuantileSketchProcessor]]. */
  def quantileSketch(events: DataFrame, k: Int = 64)
      : Dataset[QuantOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[Ev]
      .groupByKey(_.event_type)
      .transformWithState(new QuantileSketchProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }

  /** Running per-event-type distinct-user estimates; see
    * [[KmvDistinctProcessor]]. */
  def kmvDistinct(events: DataFrame, k: Int = 64): Dataset[KmvOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")).as[Ev]
      .groupByKey(_.event_type)
      .transformWithState(new KmvDistinctProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }

  /** Stream-STATIC dimension enrichment — the most common production
    * streaming join: each micro-batch broadcast-joins the static
    * nation dimension (no state, no watermark — the static side is
    * simply available to every batch), keyed on user_id % 25. Shared
    * by the batch twin (q_stream_static_join) and the StreamingSpec
    * live run, which must agree exactly. */
  def nationEnrich(events: DataFrame, nation: DataFrame): DataFrame =
    events.join(broadcast(nation),
      pmod(col("user_id"), lit(25)) === col("n_nationkey"))

  /** Drain a streaming Dataset through a named memory sink, processing
    * all currently-available input (AvailableNow = run to completion in
    * maxFilesPerTrigger-sized batches, then stop).
    */
  def runToMemory(df: Dataset[_], name: String, mode: OutputMode): StreamingQuery = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
