package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, QueryCatalog}

/** SURVEY.md §2d A17: KMV/theta-style distinct sketches with SET
  * ALGEBRA — the capability HLL (A16) lacks. An HLL union can answer
  * "distinct across slices", but only a theta-family sketch can answer
  * "distinct IN BOTH slices" (intersection) without re-scanning facts.
  *
  * The sketch here is a K-minimum-values summary held as ROWS, not an
  * opaque binary: per slice, the K smallest 60-bit hashes of the member
  * keys. That representation is Spark-first — building it is a salted
  * top-K window, merging two sketches is a union + re-rank, and
  * intersecting them is an equi-join on the hash — and it makes the
  * whole operator ORACLE-CHECKABLE, because DuckDB computes the exact
  * same md5-derived hashes and the estimator is integer-only math
  * (`(K-1) * 2^60 div theta`), bit-equal across engines. DataSketches'
  * theta sketch is the same estimator with the rows packed into one
  * binary value.
  *
  * Query: per o_orderpriority, the distinct-o_custkey estimate vs
  * exact; per priority PAIR, the theta-intersection estimate
  * (customers who placed orders at BOTH priorities) vs exact. The
  * exact columns are the verification harness riding along at test
  * scale — at 100 TB only the sketch path runs: the 5 sketches are K
  * rows each, every set operation after the one fact scan touches
  * ≤ 5·K rows.
  *
  * Scale notes: the fact table is touched exactly once (the distinct
  * (mode, okey) projection). The K-smallest selection is two-level —
  * a 32-way salted window bounds every partition's candidate set at
  * K rows before the final per-mode window sees ≤ 32·K survivors — so
  * no single reducer ever materializes a mode's full hash set (the
  * single-window form would put all distinct keys of a mode on one
  * reducer). The reference has no sketch surface (its aggregates are
  * exact, notebooks/utils/file_summary_utils.py:91-104); this extends
  * the engine the way its Iceberg tables extend to 100 TB lakes.
  */
object SketchQueries extends QueryCatalog {

  /** Sketch size. 255/256 gives ~1/sqrt(K-2) ≈ 6% stderr on the
    * per-mode estimates; intersections inherit the union's theta. */
  private val K = 256

  private val Dom = Kmv.DomStr

  private val kmvTheta = Q(
    "q_agg_kmv_theta",
    s"""WITH pr AS (
      |  SELECT DISTINCT o_orderpriority AS mode, o_custkey AS okey FROM orders
      |), h AS (
      |  SELECT mode,
      |    CAST(concat('0x', substr(md5(CAST(okey AS VARCHAR)), 1, 15))
      |      AS BIGINT) AS h
      |  FROM pr
      |), rk AS (
      |  SELECT mode, h,
      |    row_number() OVER (PARTITION BY mode ORDER BY h) AS rk
      |  FROM h
      |), kmv AS (
      |  SELECT mode, h FROM rk WHERE rk <= $K
      |), st AS (
      |  SELECT mode, count(*) AS cnt,
      |    CASE WHEN count(*) < $K THEN $Dom ELSE max(h) END AS theta
      |  FROM kmv GROUP BY mode
      |), est1 AS (
      |  SELECT mode,
      |    CASE WHEN cnt < $K THEN cnt
      |      ELSE CAST((${K - 1} * CAST($Dom AS HUGEINT)) // theta AS BIGINT)
      |    END AS est
      |  FROM st
      |), exm AS (
      |  SELECT mode, count(*) AS exact FROM pr GROUP BY mode
      |), single AS (
      |  SELECT e.mode AS a, '*' AS b, est, exact
      |  FROM est1 e JOIN exm USING (mode)
      |), comm AS (
      |  SELECT ka.mode AS a, kb.mode AS b, ka.h AS h
      |  FROM kmv ka JOIN kmv kb ON ka.h = kb.h AND ka.mode < kb.mode
      |), surv AS (
      |  SELECT c.a, c.b, least(sa.theta, sb.theta) AS tmin,
      |    count(*) FILTER (WHERE c.h < least(sa.theta, sb.theta)) AS n
      |  FROM comm c
      |  JOIN st sa ON sa.mode = c.a
      |  JOIN st sb ON sb.mode = c.b
      |  GROUP BY c.a, c.b, least(sa.theta, sb.theta)
      |), expair AS (
      |  SELECT pa.mode AS a, pb.mode AS b, count(*) AS exact
      |  FROM pr pa JOIN pr pb ON pa.okey = pb.okey AND pa.mode < pb.mode
      |  GROUP BY pa.mode, pb.mode
      |), pairs AS (
      |  SELECT x.a, x.b,
      |    coalesce(CAST((CAST(s.n AS HUGEINT) * $Dom) // s.tmin AS BIGINT),
      |      0) AS est,
      |    x.exact
      |  FROM expair x LEFT JOIN surv s ON s.a = x.a AND s.b = x.b
      |)
      |SELECT a, b, est, exact,
      |  (10000 * abs(est - exact) + exact // 2) // exact AS err_bp
      |FROM (SELECT * FROM single UNION ALL SELECT * FROM pairs)
      |ORDER BY a, b""".stripMargin
  ) { (s, dir) =>
    val pr = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("mode"), col("o_custkey").as("okey"))
      .distinct()
    val hashed = pr.select(col("mode"), Kmv.hash60(col("okey")).as("h"))
    // two-level salted K-smallest: see Kmv.kSmallest (ScaleSpec-proven)
    val kmv = Kmv.kSmallest(hashed, K, Seq("mode"))

    val st = kmv.groupBy("mode").agg(
      Kmv.thetaAggs(K).head, Kmv.thetaAggs(K).tail: _*)
    val est1 = st.select(col("mode"), Kmv.estimate(K).as("est"))
    val exm = pr.groupBy("mode").agg(count(lit(1)).as("exact"))
    val single = est1.join(exm, "mode")
      .select(col("mode").as("a"), lit("*").as("b"), col("est"),
        col("exact"))

    // theta intersection: survivors are hashes retained by BOTH
    // sketches below the pair's min theta; 5 sketches x K rows, so
    // everything below is metadata-sized regardless of fact scale.
    val ka = kmv.select(col("mode").as("a"), col("h"))
    val kb = kmv.select(col("mode").as("b"), col("h"))
    val thA = st.select(col("mode").as("a"), col("theta").as("ta"))
    val thB = st.select(col("mode").as("b"), col("theta").as("tb"))
    val surv = ka.join(kb, "h").filter(col("a") < col("b"))
      .join(broadcast(thA), "a").join(broadcast(thB), "b")
      .withColumn("tmin", least(col("ta"), col("tb")))
      .groupBy("a", "b", "tmin")
      .agg(count(when(col("h") < col("tmin"), 1)).as("n"))
      .withColumn("est", expr(
        s"CAST((n * CAST($Dom AS DECIMAL(38,0))) div tmin AS BIGINT)"))
      .select("a", "b", "est")
    val pa = pr.select(col("mode").as("a"), col("okey"))
    val pb = pr.select(col("mode").as("b"), col("okey"))
    val exPair = pa.join(pb, "okey").filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("exact"))
    val pairs = exPair.join(surv, Seq("a", "b"), "left")
      .select(col("a"), col("b"), coalesce(col("est"), lit(0L)).as("est"),
        col("exact"))

    single.unionByName(pairs)
      .withColumn("err_bp", expr(
        "(10000 * abs(est - exact) + exact div 2) div exact"))
      .orderBy("a", "b")
  }

  /** A18: count-min sketch — mergeable FREQUENCY estimates, the third
    * sketch capability (HLL/KMV answer "how many distinct", CMS answers
    * "how often does X occur" from d·w counters regardless of corpus
    * size; merging slices is counter addition). Unlike HLL, CMS is
    * fully deterministic AND integer-only — counters are plain sums
    * over fixed md5-derived bucket hashes — so like KMV it oracles
    * bit-for-bit in DuckDB.
    *
    * Build: each token occurrence lands in one bucket per depth row
    * (d=4 independent hashes, w=64 buckets); the sketch is the
    * (depth, bucket) → count table — 256 rows total, produced by ONE
    * shuffle whose map-side partial aggregation collapses every
    * partition to ≤ 256 rows, so the exchange is O(d·w·partitions) no
    * matter the corpus. Probe: est(tok) = min over depths of its
    * bucket's counter — ≥ exact always (only hash collisions inflate,
    * never deflate); the query probes the full 31-type vocabulary and
    * reports est vs exact with the overcount. The exact side is the
    * test-scale harness; at 100 TB only the 256-row sketch is stored
    * and probed.
    */
  private val cmsFreq = Q(
    "q_agg_cms_freq",
    """WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
      |), b AS (
      |  SELECT tok, d.d,
      |    CAST(concat('0x', substr(md5(d.d || ':' || tok), 1, 15))
      |      AS BIGINT) % 64 AS bucket
      |  FROM tok, (VALUES (0), (1), (2), (3)) AS d(d)
      |), cms AS (
      |  SELECT d, bucket, CAST(count(*) AS BIGINT) AS c
      |  FROM b GROUP BY d, bucket
      |), probes AS (
      |  SELECT DISTINCT tok FROM tok
      |), pb AS (
      |  SELECT p.tok, d.d,
      |    CAST(concat('0x', substr(md5(d.d || ':' || p.tok), 1, 15))
      |      AS BIGINT) % 64 AS bucket
      |  FROM probes p, (VALUES (0), (1), (2), (3)) AS d(d)
      |), est AS (
      |  SELECT pb.tok, min(cms.c) AS est
      |  FROM pb JOIN cms USING (d, bucket) GROUP BY pb.tok
      |), ex AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS exact
      |  FROM tok GROUP BY tok
      |)
      |SELECT e.tok, est, exact, est - exact AS overcount
      |FROM est e JOIN ex USING (tok)
      |ORDER BY tok""".stripMargin
  ) { (s, dir) =>
    val D = 4
    val W = 64
    val toks = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
    def bucketed(df: org.apache.spark.sql.DataFrame) = df
      .select(col("tok"), posexplode(array((0 until D).map(d =>
        pmod(conv(substring(md5(concat(lit(s"$d:"), col("tok"))), 1, 15),
          16, 10).cast("long"), lit(W))): _*)).as(Seq("d", "bucket")))
    // the CMS: one shuffle, map-side combine collapses each partition
    // to <= D*W rows before the exchange
    val cms = bucketed(toks)
      .groupBy("d", "bucket").agg(count(lit(1)).as("c"))
    val probes = toks.distinct()
    val est = bucketed(probes)
      .join(cms, Seq("d", "bucket"))
      .groupBy("tok").agg(min("c").as("est"))
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
    est.join(exact, "tok")
      .withColumn("overcount", col("est") - col("exact"))
      .orderBy("tok")
  }

  /** A19: heavy hitters via CMS candidates + exact verify — the
    * classic count-min application, and the sound two-pass shape for
    * 100 TB frequency mining: because CMS can only OVERcount, every
    * true heavy hitter (exact > total/30) is necessarily a sketch
    * candidate (est > total/30), so the expensive exact pass runs
    * only over the candidate-filtered stream (a broadcast semi-join
    * on the token, never a full-vocabulary aggregate) and the final
    * exact filter removes collision-inflated false candidates. The
    * threshold's total also comes FROM the sketch (sum of depth-0
    * counters = total token occurrences) — no extra corpus pass.
    * Deterministic integer math end to end; oracled like A18.
    * Comparisons use `exact*30 > total` (cross-multiplied) so no
    * division rounding can diverge. */
  private val cmsHeavy = Q(
    "q_agg_cms_heavy_hitters",
    """WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
      |), b AS (
      |  SELECT tok, d.d,
      |    CAST(concat('0x', substr(md5(d.d || ':' || tok), 1, 15))
      |      AS BIGINT) % 64 AS bucket
      |  FROM tok, (VALUES (0), (1), (2), (3)) AS d(d)
      |), cms AS (
      |  SELECT d, bucket, CAST(count(*) AS BIGINT) AS c
      |  FROM b GROUP BY d, bucket
      |), tot AS (
      |  SELECT CAST(sum(c) AS BIGINT) AS total FROM cms WHERE d = 0
      |), pb AS (
      |  SELECT p.tok, d.d,
      |    CAST(concat('0x', substr(md5(d.d || ':' || p.tok), 1, 15))
      |      AS BIGINT) % 64 AS bucket
      |  FROM (SELECT DISTINCT tok FROM tok) p,
      |    (VALUES (0), (1), (2), (3)) AS d(d)
      |), cand AS (
      |  SELECT pb.tok FROM pb JOIN cms USING (d, bucket), tot
      |  GROUP BY pb.tok, total HAVING min(cms.c) * 30 > total
      |), ex AS (
      |  SELECT t.tok, CAST(count(*) AS BIGINT) AS exact
      |  FROM tok t JOIN cand ON cand.tok = t.tok
      |  GROUP BY t.tok
      |)
      |SELECT tok, exact,
      |  (10000 * exact + total // 2) // total AS share_bp
      |FROM ex, tot WHERE exact * 30 > total
      |ORDER BY exact DESC, tok""".stripMargin
  ) { (s, dir) =>
    val D = 4
    val W = 64
    val toks = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
    def bucketed(df: org.apache.spark.sql.DataFrame) = df
      .select(col("tok"), posexplode(array((0 until D).map(d =>
        pmod(conv(substring(md5(concat(lit(s"$d:"), col("tok"))), 1, 15),
          16, 10).cast("long"), lit(W))): _*)).as(Seq("d", "bucket")))
    val cms = bucketed(toks)
      .groupBy("d", "bucket").agg(count(lit(1)).as("c"))
    val tot = cms.filter(col("d") === 0)
      .agg(sum("c").cast("bigint").as("total"))
    val cand = bucketed(toks.distinct())
      .join(cms, Seq("d", "bucket"))
      .crossJoin(broadcast(tot))
      .groupBy("tok", "total")
      .agg(min("c").as("est"))
      .filter(col("est") * 30 > col("total"))
      .select("tok")
    toks.join(broadcast(cand), "tok")
      .groupBy("tok").agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(tot))
      .filter(col("exact") * 30 > col("total"))
      .select(col("tok"), col("exact"),
        expr("(10000 * exact + total div 2) div total").as("share_bp"))
      .orderBy(desc("exact"), col("tok"))
  }

  /** Rows the quantile sketch retains per slice. Sample-quantile rank
    * stderr is sqrt(p(1-p)/K) ≈ 2.2% at the median for K=512. */
  private val QK = 512

  /** A20 [EXT] MERGEABLE QUANTILE SKETCH — completes the sketch family
    * (HLL/KMV cover distinct, CMS covers frequency; quantiles were
    * exact-only): a bottom-K-by-hash uniform ROW sample (Cohen &
    * Kaplan's bottom-k sampling applied to rank queries), the KMV
    * trick pointed at order statistics. Each slice retains the K rows
    * with the smallest 60-bit md5 hash of a row-unique key — a uniform
    * multiset sample whose order statistics estimate the slice's
    * quantiles — and the sketch is AS ROWS, so it stores per-slice in
    * a lake table exactly like q_lake_sketch_rollup's KMV rows.
    *
    * MERGE = union the sketches, keep the K smallest hashes: the
    * bottom-K of a union of bottom-Ks is exactly the bottom-K of the
    * union (same closure KMV relies on), so per-day/per-file sketches
    * fold into any rollup without touching raw data — the ALL row
    * here is computed ONLY from the three slice sketches.
    * QuantileSketchSpec pins the merge law exactly and the rank-error
    * bound; determinism is by construction (md5, no RNG).
    *
    * Determinism: values are integer cents, hashes are the shared
    * Kmv.hash60, quantile selection is the pure-integer order
    * statistic rn = (m-1)·p div 100 + 1 under the total order (v, h) —
    * no interpolation, no floats, so DuckDB matches bit-for-bit.
    * The exact_p50 column is the test-scale verification ride-along,
    * computed by histogram refinement (coarse bucket counts locate
    * the median's bucket, row_number runs only inside it — never a
    * corpus-wide sort); at 100 TB only the sketch path runs.
    * Scale shape: the K-smallest selection is the salted
    * two-level Kmv.kSmallest ladder (no reducer ever holds a slice's
    * full hash set); everything after the one fact scan touches
    * ≤ 4·K rows. */
  private val quantileSketch = Q(
    "q_agg_quantile_sketch",
    s"""WITH f AS (
      |  SELECT l_returnflag AS slice,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
      |    CAST(concat('0x', substr(md5(concat(
      |      CAST(l_orderkey AS VARCHAR), ':',
      |      CAST(l_linenumber AS VARCHAR))), 1, 15)) AS BIGINT) AS h
      |  FROM lineitem
      |), rk AS (
      |  SELECT slice, v, h,
      |    row_number() OVER (PARTITION BY slice ORDER BY h) AS rk
      |  FROM f
      |), sk AS (
      |  SELECT slice, v, h FROM rk WHERE rk <= $QK
      |), mrk AS (
      |  SELECT v, h, row_number() OVER (ORDER BY h) AS rk FROM sk
      |), un AS (
      |  SELECT * FROM sk
      |  UNION ALL SELECT 'ALL' AS slice, v, h FROM mrk WHERE rk <= $QK
      |), ord AS (
      |  SELECT slice, v,
      |    row_number() OVER (PARTITION BY slice ORDER BY v, h) AS rn,
      |    count(*) OVER (PARTITION BY slice) AS m
      |  FROM un
      |), qs AS (
      |  SELECT slice, CAST(max(m) AS BIGINT) AS n_retained,
      |    CAST(max(CASE WHEN rn = (m-1) * 25 // 100 + 1 THEN v END)
      |      AS BIGINT) AS p25,
      |    CAST(max(CASE WHEN rn = (m-1) * 50 // 100 + 1 THEN v END)
      |      AS BIGINT) AS p50,
      |    CAST(max(CASE WHEN rn = (m-1) * 75 // 100 + 1 THEN v END)
      |      AS BIGINT) AS p75,
      |    CAST(max(CASE WHEN rn = (m-1) * 90 // 100 + 1 THEN v END)
      |      AS BIGINT) AS p90
      |  FROM ord GROUP BY slice
      |), bkt AS (
      |  SELECT slice, v, h, v // 16384 AS b FROM f
      |), bcs AS (
      |  SELECT slice, b, count(*) AS bc FROM bkt GROUP BY slice, b
      |), bc AS (
      |  SELECT * FROM bcs
      |  UNION ALL SELECT 'ALL' AS slice, b, CAST(sum(bc) AS BIGINT) AS bc
      |  FROM bcs GROUP BY b
      |), ns AS (
      |  SELECT slice, (CAST(sum(bc) AS BIGINT) - 1) * 50 // 100 + 1 AS r
      |  FROM bc GROUP BY slice
      |), cum AS (
      |  SELECT slice, b, bc, sum(bc) OVER (PARTITION BY slice ORDER BY b
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM bc
      |), tgt AS (
      |  SELECT c.slice, c.b, n.r - (c.cum - c.bc) AS rr
      |  FROM cum c JOIN ns n USING (slice)
      |  WHERE c.cum >= n.r AND c.cum - c.bc < n.r
      |), inb AS (
      |  SELECT t.slice, k.v, t.rr, row_number() OVER (
      |    PARTITION BY t.slice ORDER BY k.v, k.h) AS rn
      |  FROM bkt k JOIN tgt t
      |    ON t.b = k.b AND (t.slice = k.slice OR t.slice = 'ALL')
      |), ex AS (
      |  SELECT slice, CAST(v AS BIGINT) AS exact_p50 FROM inb
      |  WHERE rn = rr
      |)
      |SELECT qs.slice, n_retained, p25, p50, p75, p90, ex.exact_p50
      |FROM qs JOIN ex USING (slice) ORDER BY qs.slice""".stripMargin
  ) { (s, dir) => quantileSketchReport(s, dir) }

  /** The q_agg_quantile_sketch engine, factored so QuantileSketchSpec
    * can drive the same builders over arbitrary inputs. */
  private[graft] def quantileRows(df: DataFrame): DataFrame =
    df.select(col("l_returnflag").as("slice"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"),
      Kmv.hash60(concat_ws(":", col("l_orderkey"),
        col("l_linenumber"))).as("h"))

  /** Bottom-K row sample per slice — the sketch itself (K rows of
    * (slice, v, h)); merge = union + another pass through this. */
  private[graft] def quantileSketchOf(df: DataFrame,
      slice: Seq[String] = Seq("slice")): DataFrame =
    Kmv.kSmallest(df, QK, slice)

  /** Order statistics (p25/50/75/90) of a retained sample. */
  private[graft] def quantilesOf(sample: DataFrame): DataFrame = {
    val w = Window.partitionBy("slice")
    val ord = sample
      .withColumn("rn", row_number().over(w.orderBy("v", "h")))
      .withColumn("m", count(lit(1)).over(w))
    ord.groupBy("slice").agg(
      max("m").cast("long").as("n_retained"),
      Seq(25, 50, 75, 90).map(p =>
        max(when(col("rn") === expr(s"(m-1) * $p div 100 + 1"),
          col("v"))).cast("long").as(s"p$p")): _*)
  }

  private[graft] def quantileSketchReport(s: org.apache.spark.sql
      .SparkSession, dir: String): DataFrame = {
    // (slice, v, h) is read by the sketch ladder AND the exact-median
    // aggregates — materialize the projection (and its md5) once
    // instead of rescanning the fact per consumer (the
    // shingleSetsMaterialized idiom; the 600k-row md5 is the query's
    // dominant irreducible cost at oracle grade)
    val f = quantileRows(Tables.lineitem(s, dir)).localCheckpoint()
    val sk = quantileSketchOf(f)
    // the ALL row merges the three SLICE SKETCHES, never the fact
    val merged = quantileSketchOf(
      sk.withColumn("slice", lit("ALL")))
    val qs = quantilesOf(sk.unionByName(merged))
    // exact-median ride-along via HISTOGRAM REFINEMENT, not a global
    // sort: a corpus-wide row_number would put each slice on one
    // reducer (6.5 s at sf0.1). Instead: coarse per-(slice, bucket)
    // counts locate the bucket holding the target rank (cumulative
    // window over ~700 bucket rows), then row_number runs only INSIDE
    // that bucket (~n/buckets rows) — the scalable exact-order-
    // statistic plan (whole query 6.5 s → ~2.9 s at sf0.1).
    // the ALL histogram derives from the per-slice bucket counts (an
    // aggregate of the aggregate) — the corpus is bucketed ONCE, never
    // unioned with itself
    val bkt = f.withColumn("b", expr("v div 16384"))
    val bcs = bkt.groupBy("slice", "b").agg(count(lit(1)).as("bc"))
    val bc = bcs.unionByName(bcs.groupBy("b")
      .agg(sum("bc").cast("long").as("bc"))
      .withColumn("slice", lit("ALL"))
      .select("slice", "b", "bc"))
    val ns = bc.groupBy("slice").agg(
      expr("(CAST(sum(bc) AS BIGINT) - 1) * 50 div 100 + 1").as("r"))
    val cum = bc.withColumn("cum", sum("bc").over(
      Window.partitionBy("slice").orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tgt = cum.join(ns, "slice")
      .filter(col("cum") >= col("r") && col("cum") - col("bc") < col("r"))
      .select(col("slice").as("tslice"), col("b"),
        (col("r") - (col("cum") - col("bc"))).as("rr"))
    val ex = bkt.join(broadcast(tgt),
        bkt("b") === tgt("b") &&
          (col("tslice") === bkt("slice") || col("tslice") === "ALL"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("tslice").orderBy("v", "h")))
      .filter(col("rn") === col("rr"))
      .select(col("tslice").as("slice"),
        col("v").cast("long").as("exact_p50"))
    qs.join(ex, "slice").orderBy("slice")
  }

  override def all: Seq[Q] =
    Seq(kmvTheta, cmsFreq, cmsHeavy, quantileSketch)
}
