package graft.streaming

import org.apache.spark.sql.functions._
import graft.{Q, QueryCatalog}
import graft.rel.Tables

/** SURVEY.md §2j streaming surface, evaluated batch-first: the same
  * `window()` / `session_window()` expressions run over the static
  * events table so the DuckDB oracle can check them; StreamingSpec
  * drives the identical expressions through readStream/writeStream.
  *
  * Scale notes: time-windowed aggregation shuffles on (window, keys) —
  * bounded state per window; session windows shuffle on user_id then
  * merge sessions per key, the same plan Structured Streaming uses with
  * watermark-based state eviction.
  */
object StreamBatchQueries extends QueryCatalog {

  /** Tumbling 1-day windows. DuckDB oracle uses time_bucket (both align
    * to the epoch for day/hour granularities). */
  private val tumbling = Q(
    "q_stream_tumbling",
    """SELECT time_bucket(INTERVAL '1 day', ts) AS wstart, event_type,
      |  count(*) AS n, round(sum(value), 2) AS total
      |FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin
  ) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("total"))
      .orderBy("wstart", "event_type")
  }

  /** Sliding windows: 1 day long, every 12 hours — each event lands in
    * two windows. Oracle expands the two candidate buckets per event. */
  private val sliding = Q(
    "q_stream_sliding",
    """WITH expanded AS (
      |  -- window length = 2 x slide, so each event is in exactly the
      |  -- bucket containing it and the one starting 12h earlier
      |  SELECT time_bucket(INTERVAL '12 hours', ts)
      |           - g.k * INTERVAL '12 hours' AS wstart, value
      |  FROM events, (VALUES (0), (1)) AS g(k))
      |SELECT wstart, count(*) AS n, round(sum(value), 2) AS total
      |FROM expanded GROUP BY wstart ORDER BY wstart""".stripMargin
  ) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 day", "12 hours"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("wstart"), col("n"), col("total"))
      .orderBy("wstart")
  }

  /** Session windows with a 30-minute gap per user. Spark's
    * session_window end = last event + gap; the oracle reconstructs
    * sessions with the classic lag/cumsum idiom. */
  private val session = Q(
    "q_stream_session",
    """WITH marked AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              > INTERVAL '30 minutes' OR
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events),
      |sessions AS (
      |  SELECT user_id, ts, value,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM marked)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL '30 minutes' AS session_end,
      |  count(*) AS n_events, round(sum(value), 2) AS total
      |FROM sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_start""".stripMargin
  ) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total"))
      .orderBy("user_id", "session_start")
  }

  /** Batch twin of the stream-stream join ([[Streams.purchaseViewJoin]]
    * — the SAME function builds this plan): purchases matched to the
    * same user's views in the preceding hour. The aggregate keeps the
    * output bounded for the hash compare; StreamingSpec checks the
    * per-pair rows through readStream micro-batches.
    */
  private val streamJoin = Q(
    "q_stream_join",
    """WITH j AS (
      |  SELECT p.event_id AS purchase_id, v.event_id AS view_id,
      |    p.user_id
      |  FROM events p JOIN events v
      |    ON p.user_id = v.user_id
      |    AND p.event_type = 'purchase' AND v.event_type = 'view'
      |    AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL '1 hour'
      |)
      |SELECT user_id, count(*) AS n_pairs,
      |  count(DISTINCT purchase_id) AS n_purchases
      |FROM j GROUP BY user_id ORDER BY user_id""".stripMargin
  ) { (s, dir) =>
    val ev = Tables.events(s, dir)
    Streams.purchaseViewJoin(ev, ev)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("purchase_id")).as("n_purchases"))
      .orderBy("user_id")
  }

  /** Batch twin of the watermarked stream-stream LEFT OUTER join
    * ([[Streams.purchaseViewJoinOuter]] builds this plan): purchases
    * with their preceding-hour views, PLUS purchases with no such
    * view (null view side) — the outer-join capability inner
    * stream-stream joins lack (a "purchases without prior engagement"
    * report needs exactly the null rows). Aggregated per user for the
    * hash compare; StreamingSpec proves the live run emits the
    * matched rows plus null rows for every unmatched purchase the
    * final watermark has expired, and nothing else. */
  private val streamJoinOuter = Q(
    "q_stream_join_outer",
    """WITH j AS (
      |  SELECT p.event_id AS purchase_id, v.event_id AS view_id,
      |    p.user_id
      |  FROM events p LEFT JOIN events v
      |    ON p.user_id = v.user_id AND v.event_type = 'view'
      |    AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL '1 hour'
      |  WHERE p.event_type = 'purchase'
      |)
      |SELECT user_id, count(view_id) AS n_pairs,
      |  count(*) FILTER (WHERE view_id IS NULL) AS n_unmatched
      |FROM j GROUP BY user_id ORDER BY user_id""".stripMargin
  ) { (s, dir) =>
    val ev = Tables.events(s, dir)
    Streams.purchaseViewJoinOuter(ev, ev)
      .groupBy("user_id")
      .agg(count(col("view_id")).as("n_pairs"),
        count(when(col("view_id").isNull, 1)).as("n_unmatched"))
      .orderBy("user_id")
  }

  /** Batch twin of the watermarked stream-stream FULL OUTER join
    * ([[Streams.purchaseViewJoinFull]] builds this plan) — the last
    * cell of the join matrix: matched purchase/view pairs, purchases
    * with no prior-hour view (null view side), AND views no purchase
    * followed within the hour (null purchase side). A production
    * engagement audit needs all three at once: conversion pairs,
    * cold purchases, and abandoned views. Aggregated per user for the
    * hash compare; StreamingSpec pins the live contract per side. */
  private val streamJoinFull = Q(
    "q_stream_join_full",
    """WITH p AS (
      |  SELECT event_id AS purchase_id, ts AS pts, user_id AS p_user
      |  FROM events WHERE event_type = 'purchase'
      |), v AS (
      |  SELECT event_id AS view_id, ts AS vts, user_id AS v_user
      |  FROM events WHERE event_type = 'view'
      |), j AS (
      |  SELECT purchase_id, view_id,
      |    coalesce(p_user, v_user) AS user_id
      |  FROM p FULL JOIN v
      |    ON p_user = v_user AND vts <= pts
      |    AND vts > pts - INTERVAL '1 hour'
      |)
      |SELECT user_id,
      |  count(*) FILTER (WHERE purchase_id IS NOT NULL
      |                     AND view_id IS NOT NULL) AS n_pairs,
      |  count(*) FILTER (WHERE view_id IS NULL) AS n_cold_purchases,
      |  count(*) FILTER (WHERE purchase_id IS NULL) AS n_abandoned_views
      |FROM j GROUP BY user_id ORDER BY user_id""".stripMargin
  ) { (s, dir) =>
    val ev = Tables.events(s, dir)
    Streams.purchaseViewJoinFull(ev, ev)
      .groupBy("user_id")
      .agg(
        count(when(col("purchase_id").isNotNull &&
          col("view_id").isNotNull, 1)).as("n_pairs"),
        count(when(col("view_id").isNull, 1)).as("n_cold_purchases"),
        count(when(col("purchase_id").isNull, 1)).as("n_abandoned_views"))
      .orderBy("user_id")
  }

  /** Batch twin of the transformWithState milestone counter
    * ([[Streams.milestones]]): the event completing every 25th event
    * per user, defined over total (ts, event_id) event-time order. In
    * batch the cumulative count IS a row_number window; the streaming
    * spec proves the stateful processor emits the identical rows
    * incrementally. Integer-only output. */
  private val milestonesQ = Q(
    "q_stream_milestones",
    """SELECT user_id, rn AS milestone, event_id
      |FROM (
      |  SELECT user_id, event_id,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events)
      |WHERE rn % 25 = 0
      |ORDER BY user_id, milestone""".stripMargin
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") % 25 === 0)
      .select(col("user_id"), col("rn").as("milestone"), col("event_id"))
      .orderBy("user_id", "milestone")
  }

  /** Batch twin of the MapState first-occurrence detector
    * ([[Streams.firstSeen]]): the first event of every (user,
    * event_type) in (ts, event_id) order — a rank-1 window in batch,
    * a per-user MapState point-lookup in streaming. Integer/string
    * output only. */
  private val firstSeenQ = Q(
    "q_stream_first_seen",
    """SELECT user_id, event_type, event_id
      |FROM (
      |  SELECT user_id, event_type, event_id,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("ts", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id")
      .orderBy("user_id", "event_type")
  }

  /** Batch twin of [[Streams.KmvDistinctProcessor]]: per-event-type
    * distinct-user KMV estimates (K=64), the same 60-bit md5 hashing
    * and integer estimator as rel.SketchQueries A17 — so the streaming
    * state fold, this batch plan, and the DuckDB oracle all agree
    * bit-for-bit. Two-level salted K-smallest as in A17: no reducer
    * ever holds a type's full distinct-user hash set. StreamingSpec
    * proves the live transformWithState fold's tail emissions equal
    * these rows regardless of micro-batch boundaries. */
  private val kmvDistinctQ = Q(
    "q_stream_kmv_distinct",
    """WITH pr AS (
      |  SELECT DISTINCT event_type, user_id FROM events
      |), h AS (
      |  SELECT event_type,
      |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
      |      AS BIGINT) AS h
      |  FROM pr
      |), rk AS (
      |  SELECT event_type, h,
      |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
      |  FROM h
      |), st AS (
      |  SELECT event_type, count(*) AS cnt,
      |    CASE WHEN count(*) < 64 THEN 1152921504606846976
      |      ELSE max(h) END AS theta
      |  FROM rk WHERE rk <= 64 GROUP BY event_type
      |), est1 AS (
      |  SELECT event_type, cnt AS n_retained,
      |    CASE WHEN cnt < 64 THEN cnt
      |      ELSE CAST((63 * CAST(1152921504606846976 AS HUGEINT))
      |        // theta AS BIGINT)
      |    END AS est
      |  FROM st
      |), exm AS (
      |  SELECT event_type, count(*) AS exact FROM pr GROUP BY event_type
      |)
      |SELECT e.event_type, n_retained, est, exact,
      |  (10000 * abs(est - exact) + exact // 2) // exact AS err_bp
      |FROM est1 e JOIN exm USING (event_type)
      |ORDER BY event_type""".stripMargin
  ) { (s, dir) =>
    import graft.rel.Kmv
    val K = 64
    val pr = Tables.events(s, dir)
      .select(col("event_type"), col("user_id")).distinct()
    val hashed = pr.select(col("event_type"),
      Kmv.hash60(col("user_id")).as("h"))
    val st = Kmv.kSmallest(hashed, K, Seq("event_type"))
      .groupBy("event_type")
      .agg(Kmv.thetaAggs(K).head, Kmv.thetaAggs(K).tail: _*)
    val est1 = st.select(col("event_type"), col("cnt").as("n_retained"),
      Kmv.estimate(K).as("est"))
    val exm = pr.groupBy("event_type").agg(count(lit(1)).as("exact"))
    est1.join(exm, "event_type")
      .withColumn("err_bp", expr(
        "(10000 * abs(est - exact) + exact div 2) div exact"))
      .orderBy("event_type")
  }

  /** Batch twin of [[Streams.QuantileSketchProcessor]]: per-event-type
    * running sample median from the A20 mergeable quantile sketch
    * (bottom-K=64 rows by md5(event_id), keyed by hash with a min-v
    * tiebreak so hash collisions and re-deliveries are deterministic),
    * median = the integer order statistic under the (v, h) total
    * order. Same hashing, same rounding (HALF_UP cents), same
    * selection as the streaming state fold and the DuckDB oracle —
    * StreamingSpec proves the live transformWithState tail equals
    * these rows across any micro-batch boundaries. */
  private val quantileQ = Q(
    "q_stream_quantile",
    """WITH h AS (
      |  SELECT event_type,
      |    CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
      |      AS BIGINT) AS h,
      |    CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events
      |), hh AS (
      |  SELECT event_type, h, CAST(min(v) AS BIGINT) AS v
      |  FROM h GROUP BY event_type, h
      |), rk AS (
      |  SELECT event_type, h, v,
      |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
      |  FROM hh
      |), sk AS (
      |  SELECT event_type, h, v FROM rk WHERE rk <= 64
      |), ord AS (
      |  SELECT event_type, v,
      |    row_number() OVER (PARTITION BY event_type ORDER BY v, h) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS m
      |  FROM sk
      |), ns AS (
      |  SELECT event_type, count(*) AS n_seen FROM events
      |  GROUP BY event_type
      |)
      |SELECT o.event_type, CAST(max(ns.n_seen) AS BIGINT) AS n_seen,
      |  CAST(max(m) AS BIGINT) AS n_retained,
      |  CAST(max(CASE WHEN rn = (m-1) * 50 // 100 + 1 THEN v END)
      |    AS BIGINT) AS p50
      |FROM ord o JOIN ns ON ns.event_type = o.event_type
      |GROUP BY o.event_type ORDER BY o.event_type""".stripMargin
  ) { (s, dir) =>
    import graft.rel.Kmv
    val K = 64
    val ev = Tables.events(s, dir)
    val hh = ev
      .select(col("event_type"), Kmv.hash60(col("event_id")).as("h"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .groupBy("event_type", "h").agg(min("v").cast("long").as("v"))
    val sk = Kmv.kSmallest(hh, K, Seq("event_type"))
    val ns = ev.groupBy("event_type").agg(count(lit(1)).as("n_seen"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type")
    sk.withColumn("rn", row_number().over(w.orderBy("v", "h")))
      .withColumn("m", count(lit(1)).over(w))
      .groupBy("event_type")
      .agg(max("m").cast("long").as("n_retained"),
        max(when(col("rn") === expr("(m-1) * 50 div 100 + 1"),
          col("v"))).cast("long").as("p50"))
      .join(broadcast(ns), "event_type")
      .select(col("event_type"), col("n_seen").cast("long"),
        col("n_retained"), col("p50"))
      .orderBy("event_type")
  }

  /** Batch twin of [[Streams.nationEnrich]] — stream-STATIC dimension
    * join, the everyday streaming enrichment: the static side is a
    * broadcast available to every micro-batch (no state, no
    * watermark), so this costs exactly a map-side hash probe per
    * event at any stream rate. StreamingSpec proves the live
    * micro-batched run emits the identical enriched rows. */
  private val staticJoinQ = Q(
    "q_stream_static_join",
    """SELECT n.n_name, count(*) AS n_events,
      |  count(DISTINCT e.user_id) AS n_users
      |FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
      |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin
  ) { (s, dir) =>
    Streams.nationEnrich(Tables.events(s, dir), Tables.nation(s, dir))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"))
      .orderBy("n_name")
  }

  /** Batch twin of the ValueState EWMA smoother
    * ([[Streams.ewmaSmoothed]]): the integer-exact recursion
    * y_1 = v_1, y_n = v_n + y_{n-1}/2 per user in (ts, event_id)
    * order. The Spark side replays it as a secondary-sort fold (one
    * shuffle keyed by user, sorted within partitions, O(1)-memory
    * pass — [[Streams.ewmaBatch]]); the oracle replays it as a
    * RECURSIVE CTE stepping row_number n → n+1 across all users at
    * once (depth = max events per user, ≤ 99 at sf0.1). Everything
    * is truncating BIGINT arithmetic on half-up-scaled values, so
    * streaming state, batch fold, and the SQL recursion are
    * bit-equal. Unlike [[q_window_ewma]]'s fixed 8-term window, this
    * is the UNBOUNDED recursion — the state-machine form. */
  private val ewmaQ = Q(
    "q_stream_ewma",
    """WITH RECURSIVE v AS (
      |  SELECT user_id, event_id,
      |    CAST(floor(value * 10000 + 0.5) AS BIGINT) AS vi,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events
      |), r AS (
      |  SELECT user_id, event_id, rn, vi AS y FROM v WHERE rn = 1
      |  UNION ALL
      |  SELECT v.user_id, v.event_id, v.rn, v.vi + r.y // 2 AS y
      |  FROM v JOIN r ON v.user_id = r.user_id AND v.rn = r.rn + 1
      |)
      |SELECT user_id, event_id, y AS ewma_x10000
      |FROM r ORDER BY event_id""".stripMargin
  ) { (s, dir) =>
    Streams.ewmaBatch(Tables.events(s, dir))
      .toDF()
      .select(col("user_id"), col("event_id"), col("ewma_x10000"))
      .orderBy("event_id")
  }

  /** Batch twin of [[Streams.ThrottleProcessor]] — TTL throttle /
    * notification-dedup ("at most one emission per (user, type) per
    * 48 h; suppressed events don't advance the clock"). The emission
    * decision recurses on the key's EMISSION history, so no plain
    * window expresses it (lag() sees the previous event, not the
    * previous emission); the oracle is a DuckDB RECURSIVE CTE over
    * exact integer microseconds, the batch form is the secondary-sort
    * fold, and StreamingSpec pins the live ValueState machine equal
    * across micro-batch boundaries. One shuffle on the key, O(1)
    * state per row — the 100 TB shape. */
  private val throttleQ = Q(
    "q_stream_throttle",
    """WITH RECURSIVE v AS (
      |  SELECT user_id, event_type, event_id,
      |    epoch_us(ts) AS tus,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events
      |), r AS (
      |  SELECT user_id, event_type, event_id, rn,
      |    TRUE AS emitted, tus AS last_emit,
      |    CAST(1 AS BIGINT) AS n_emitted
      |  FROM v WHERE rn = 1
      |  UNION ALL
      |  SELECT v.user_id, v.event_type, v.event_id, v.rn,
      |    v.tus >= r.last_emit + 172800000000 AS emitted,
      |    CASE WHEN v.tus >= r.last_emit + 172800000000
      |      THEN v.tus ELSE r.last_emit END,
      |    r.n_emitted + CASE WHEN v.tus >= r.last_emit + 172800000000
      |      THEN 1 ELSE 0 END
      |  FROM v JOIN r ON v.user_id = r.user_id
      |    AND v.event_type = r.event_type AND v.rn = r.rn + 1
      |)
      |SELECT user_id, event_type, event_id, n_emitted
      |FROM r WHERE emitted
      |ORDER BY user_id, event_type, n_emitted""".stripMargin
  ) { (s, dir) =>
    Streams.throttleBatch(Tables.events(s, dir))
      .toDF()
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("n_emitted"))
      .orderBy("user_id", "event_type", "n_emitted")
  }

  override def all: Seq[Q] =
    Seq(tumbling, sliding, session, streamJoin, streamJoinOuter,
      streamJoinFull, milestonesQ, firstSeenQ, throttleQ,
      kmvDistinctQ, quantileQ, staticJoinQ, ewmaQ)
}
