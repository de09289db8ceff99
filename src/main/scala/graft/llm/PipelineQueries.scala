package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, QueryCatalog}
import graft.rel.Tables

/** SURVEY.md §2l [EXT] training-data-pipeline operators beyond the
  * dedup/similarity/text families: near-dup cluster resolution
  * (connected components), deterministic train/val/test splitting,
  * stratified sampling, sequence packing, vocabulary/IDF statistics,
  * corpus distribution quantiles, embedding quantization, and PII
  * detection/redaction (the text-side twin of the reference's
  * table-level PII deletion).
  *
  * Scale design (100 TB):
  *  - cluster resolution iterates min-label propagation over the DUP
  *    PAIR set, which is orders of magnitude smaller than the corpus
  *    (only docs sharing a shingle pair up); per iteration it is one
  *    equi-join + partial-agg-friendly min. Iterations = component
  *    diameter, and near-dup components are shallow by construction
  *    (a chain needs an unbroken run of >=0.5-Jaccard neighbors). For
  *    adversarial graphs swap the loop body for alternating
  *    large-star/small-star contraction (same join shape, O(log n)
  *    rounds) — the surrounding fixpoint scaffold is unchanged.
  *  - split/sample key on md5(doc_id), a pure map-side projection: no
  *    shuffle to assign, reproducible across runs and engines, and
  *    immune to input order (the failure mode of rand()-based splits).
  *  - packing windows over a shard key, never a global ORDER BY: each
  *    shard packs independently, so parallelism = shard count.
  *  - quantiles use exact percentile here (oracle parity); the 100 TB
  *    path is approx_percentile with the same call shape.
  *  - quantization is per-row map-side HOF math — no shuffle at all.
  */
object PipelineQueries extends QueryCatalog {

  /** Near-dup cluster resolution: take the trigram-Jaccard dup pairs
    * (q_dedup_ngram_jaccard's edges) and resolve transitive closure so
    * each document maps to a canonical cluster id (the component's min
    * doc_id) — the step that turns pairwise dedup output into a
    * keep/drop decision. `keep` marks the cluster representative.
    *
    * Spark: min-label propagation to a fixpoint. Labels only ever
    * decrease, so sum(label) strictly decreases until convergence —
    * one cheap scalar per iteration detects the fixpoint.
    * Oracle: recursive CTE computing min reachable node per node.
    */
  private val dedupClusters = Q(
    "q_dedup_clusters",
    """WITH RECURSIVE t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |), dt AS (
      |  SELECT DISTINCT doc_id, unnest(list_transform(
      |    range(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM t
      |), sz AS (
      |  SELECT doc_id, count(*) AS n FROM dt GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      |  FROM dt a JOIN dt b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT id_a, id_b FROM inter
      |  JOIN sz sa ON sa.doc_id = id_a
      |  JOIN sz sb ON sb.doc_id = id_b
      |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
      |), edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION ALL
      |  SELECT id_b, id_a FROM pairs
      |), reach(id, lbl) AS (
      |  SELECT DISTINCT src, src FROM edges
      |  UNION
      |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
      |)
      |SELECT id AS doc_id, min(lbl) AS cluster_id,
      |  CAST(id = min(lbl) AS BOOLEAN) AS keep
      |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    clusterPairs(s, DedupQueries
      .jaccardPairs(DedupQueries.shingleSetsMaterialized(Tables.documents(s, dir)), "sh")
      .filter(col("jac") >= 0.5)
      .select(col("id_a"), col("id_b")))
  }

  /** Survivorship resolution (round 14) — the step AFTER clustering
    * that production dedup actually ships: within each near-dup
    * cluster, the canonical SURVIVOR is the highest-quality member
    * (longest by n_chars; ties break to the smallest doc_id), not the
    * arbitrary min-id — dedup keeps the best copy, and every victim
    * row carries its survivor for provenance/redirect maps. Composes
    * [[clusterPairs]] with a per-cluster argmax: the rank filter sits
    * directly on the window (WindowGroupLimit pre-reduces per
    * partition; clusters are small, the key space is the cluster
    * set). The oracle replays the same recursive label propagation
    * and picks the survivor with an identical rank window. */
  private val survivorship = Q(
    "q_dedup_survivorship",
    """WITH RECURSIVE t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |), dt AS (
      |  SELECT DISTINCT doc_id, unnest(list_transform(
      |    range(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM t
      |), sz AS (
      |  SELECT doc_id, count(*) AS n FROM dt GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      |  FROM dt a JOIN dt b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT id_a, id_b FROM inter
      |  JOIN sz sa ON sa.doc_id = id_a
      |  JOIN sz sb ON sb.doc_id = id_b
      |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
      |), edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION ALL
      |  SELECT id_b, id_a FROM pairs
      |), reach(id, lbl) AS (
      |  SELECT DISTINCT src, src FROM edges
      |  UNION
      |  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id
      |), mem AS (
      |  SELECT id AS doc_id, min(lbl) AS cluster_id
      |  FROM reach GROUP BY id
      |), q AS (
      |  SELECT m.doc_id, m.cluster_id, d.n_chars
      |  FROM mem m JOIN documents d ON d.doc_id = m.doc_id
      |), surv AS (
      |  SELECT cluster_id, doc_id AS survivor_id FROM (
      |    SELECT cluster_id, doc_id,
      |      row_number() OVER (PARTITION BY cluster_id
      |        ORDER BY n_chars DESC, doc_id) AS r
      |    FROM q) WHERE r = 1
      |)
      |SELECT q.doc_id, q.cluster_id, s.survivor_id,
      |  q.doc_id = s.survivor_id AS is_survivor, q.n_chars
      |FROM q JOIN surv s ON s.cluster_id = q.cluster_id
      |ORDER BY q.cluster_id, q.doc_id""".stripMargin
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val mem = clusterPairs(s, DedupQueries
        .jaccardPairs(DedupQueries.shingleSetsMaterialized(docs), "sh")
        .filter(col("jac") >= 0.5)
        .select(col("id_a"), col("id_b")))
      .select("doc_id", "cluster_id")
    val q = mem.join(docs.select("doc_id", "n_chars"), "doc_id")
    val w = Window.partitionBy("cluster_id")
      .orderBy(desc("n_chars"), col("doc_id"))
    val surv = q.withColumn("r", row_number().over(w))
      .filter(col("r") === 1)
      .select(col("cluster_id"), col("doc_id").as("survivor_id"))
    q.join(surv, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("survivor_id"),
        (col("doc_id") === col("survivor_id")).as("is_survivor"),
        col("n_chars"))
      .orderBy("cluster_id", "doc_id")
  }

  /** PageRank centrality over the near-dup graph (round 15 — the
    * second graph-analytics operator after connected components):
    * within a duplication neighborhood, the most-linked document is
    * the canonical/authoritative copy, so curation pipelines rank by
    * centrality where survivorship's single argmax is too blunt.
    * Four fixed power iterations in EXACT INTEGER micro-units
    * (pr0 = 1e6; pr' = 0.15e6 + 0.85e6·Σ pr(u) div deg(u), all BIGINT
    * with truncating division — identical on both engines, so the
    * result hash-checks with zero float tolerance; symmetric edges
    * mean no dangling nodes). Scale shape: per iteration ONE
    * equi-join of the edge list against the score table plus a
    * partial-agg'd sum — rounds are fixed (4), never data-dependent,
    * and the score table is one row per node sharing a dup pair
    * (orders of magnitude smaller than the corpus). The oracle
    * unrolls the four rounds as chained CTEs (aggregates are illegal
    * in a RECURSIVE term). */
  private val pagerank = Q(
    "q_graph_pagerank",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |), dt AS (
      |  SELECT DISTINCT doc_id, unnest(list_transform(
      |    range(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM t
      |), sz AS (
      |  SELECT doc_id, count(*) AS n FROM dt GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      |  FROM dt a JOIN dt b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT id_a, id_b FROM inter
      |  JOIN sz sa ON sa.doc_id = id_a
      |  JOIN sz sb ON sb.doc_id = id_b
      |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
      |), edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION ALL
      |  SELECT id_b, id_a FROM pairs
      |), deg AS (
      |  SELECT src, count(*) AS d FROM edges GROUP BY src
      |), n AS (
      |  SELECT DISTINCT src AS id FROM edges
      |), r0 AS (
      |  SELECT id, CAST(1000000 AS BIGINT) AS pr FROM n
      |), c1 AS (
      |  SELECT e.dst AS id, CAST(sum(r.pr // g.d) AS BIGINT) AS c
      |  FROM edges e JOIN r0 r ON r.id = e.src
      |  JOIN deg g ON g.src = e.src GROUP BY 1
      |), r1 AS (
      |  SELECT n.id, CAST(150000 +
      |    (850000 * COALESCE(c.c, 0)) // 1000000 AS BIGINT) AS pr
      |  FROM n LEFT JOIN c1 c ON c.id = n.id
      |), c2 AS (
      |  SELECT e.dst AS id, CAST(sum(r.pr // g.d) AS BIGINT) AS c
      |  FROM edges e JOIN r1 r ON r.id = e.src
      |  JOIN deg g ON g.src = e.src GROUP BY 1
      |), r2 AS (
      |  SELECT n.id, CAST(150000 +
      |    (850000 * COALESCE(c.c, 0)) // 1000000 AS BIGINT) AS pr
      |  FROM n LEFT JOIN c2 c ON c.id = n.id
      |), c3 AS (
      |  SELECT e.dst AS id, CAST(sum(r.pr // g.d) AS BIGINT) AS c
      |  FROM edges e JOIN r2 r ON r.id = e.src
      |  JOIN deg g ON g.src = e.src GROUP BY 1
      |), r3 AS (
      |  SELECT n.id, CAST(150000 +
      |    (850000 * COALESCE(c.c, 0)) // 1000000 AS BIGINT) AS pr
      |  FROM n LEFT JOIN c3 c ON c.id = n.id
      |), c4 AS (
      |  SELECT e.dst AS id, CAST(sum(r.pr // g.d) AS BIGINT) AS c
      |  FROM edges e JOIN r3 r ON r.id = e.src
      |  JOIN deg g ON g.src = e.src GROUP BY 1
      |), r4 AS (
      |  SELECT n.id, CAST(150000 +
      |    (850000 * COALESCE(c.c, 0)) // 1000000 AS BIGINT) AS pr
      |  FROM n LEFT JOIN c4 c ON c.id = n.id
      |)
      |SELECT id AS doc_id, pr FROM r4 ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val (score, cache) = pagerankScore(s, dir)
    // sever lineage before unpersisting the edge cache (4 rounds of
    // self-referencing plans would otherwise recompute the shingle
    // join once per round); node set is dup-pair-bounded, tiny
    val out = severLineage(s, score
      .select(col("id").as("doc_id"), col("pr"))
      .orderBy("doc_id"))
    cache.unpersist()
    out
  }

  /** The pagerank iteration pipeline, pre-sever: returns the 4-round
    * score frame plus the cached frame backing it (caller unpersists
    * after severing). Factored so the plan tool can explain the
    * iteration plan — after severLineage the bench-visible plan is
    * only a Scan ExistingRDD.
    *
    * r17 optimization (guide §2.4, measured hash-identical at sf0.1):
    *  - the iteration cache is (src, dst, d) — out-degree folded in —
    *    instead of raw edges, so the per-iteration deg aggregation +
    *    join (4 recomputes of a groupBy over the cache) leaves the
    *    plan; the cache grows by one BIGINT per edge, same order.
    *  - edges are SYMMETRIC (both directions of every pair), so every
    *    node has >= 1 in-edge and the contribution aggregate already
    *    covers the full node set: the old per-iteration
    *    `nodes LEFT JOIN contrib` + coalesce(c, 0) dressed 4 joins
    *    around a provably-never-firing default and is dropped.
    * Iteration phase 5.3 s -> 1.3 s warm at sf0.1/local[32]. */
  private[graft] def pagerankScore(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val pairs = DedupQueries
      .jaccardPairs(DedupQueries.shingleSetsMaterialized(Tables.documents(s, dir)),
        "sh")
      .filter(col("jac") >= 0.5)
      .select(col("id_a"), col("id_b"))
    val edges = pairs
      .union(pairs.select(col("id_b"), col("id_a")))
      .toDF("src", "dst")
    val withDeg = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("d")), "src")
      .persist()
    withDeg.count() // one materialization; 4 iterations reuse the cache
    var score = withDeg.select(col("src").as("id")).distinct()
      .withColumn("pr", lit(1000000L))
    for (_ <- 1 to 4) {
      score = withDeg
        .join(score.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(expr("pr div d")).cast("bigint").as("c"))
        .select(col("id"),
          (lit(150000L) + expr("850000 * c div 1000000"))
            .cast("bigint").as("pr"))
    }
    (score, withDeg)
  }

  /** Deterministic weighted sampling (priority sampling / bottom-k
    * with weights): keep the k docs per source whose priority
    * h(doc_id) div n_chars is smallest — longer documents get
    * proportionally smaller priorities, so inclusion probability
    * grows with weight while staying a PURE FUNCTION of (doc_id,
    * n_chars): reproducible across runs, engines, and input order,
    * the same reason the split family keys on md5. One map-side
    * projection plus a per-source WindowGroupLimit top-k — no global
    * sort, no rand(). The md5-based h is [[graft.rel.Kmv.hash60]],
    * the engine's one hash source. */
  private val weightedSample = Q(
    "q_pipe_weighted_sample",
    """WITH pri AS (
      |  SELECT source, doc_id, n_chars,
      |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |      AS BIGINT) // n_chars AS priority
      |  FROM documents WHERE n_chars > 0
      |), rk AS (
      |  SELECT source, doc_id, n_chars, priority,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY priority, doc_id) AS rk
      |  FROM pri
      |)
      |SELECT source, doc_id, n_chars, priority, rk
      |FROM rk WHERE rk <= 10
      |ORDER BY source, rk""".stripMargin
  ) { (s, dir) =>
    import graft.rel.Kmv
    val pri = Tables.documents(s, dir)
      .filter(col("n_chars") > 0)
      .withColumn("h", Kmv.hash60(col("doc_id")))
      .select(col("source"), col("doc_id"), col("n_chars"),
        expr("h div n_chars").as("priority"))
    val w = Window.partitionBy("source")
      .orderBy(col("priority"), col("doc_id"))
    pri.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .orderBy("source", "rk")
  }

  /** Resolve the transitive closure of (id_a, id_b) dup pairs into
    * canonical min-id clusters: (doc_id, cluster_id, keep) sorted by
    * doc_id. Adaptive, like a broadcast-join decision: when the edge
    * set fits on the driver (it is orders of magnitude smaller than
    * the corpus — only docs sharing a shingle pair up), union-find
    * locally with zero scheduled rounds; otherwise run distributed
    * min-label propagation to a fixpoint. Both paths produce
    * identical output (spec-asserted). The threshold is tunable via
    * `spark.graft.dedup.clusterLocalThreshold` (default 1M edges) —
    * set it to 0 to force the distributed branch, the declared
    * 100 TB path, on any corpus (how the sf1 scaling smoke exercises
    * it); an explicit `localThreshold >= 0` argument overrides the
    * conf. */
  private[llm] def clusterPairs(s: SparkSession, pairs: DataFrame,
      localThreshold: Long = -1L): DataFrame = {
    val threshold =
      if (localThreshold >= 0) localThreshold
      else confLong(s, "spark.graft.dedup.clusterLocalThreshold", 1000000L)
    def truncate(df: DataFrame): DataFrame = severLineage(s, df)
    val edges = pairs
      .union(pairs.select(col("id_b"), col("id_a")))
      .toDF("src", "dst")
      .persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .persist()
    // Materialize the edge cache with ONE action before the loop: the
    // expensive shingle-pair join must compute exactly once. Without
    // this, round 1's plan references the unmaterialized cache from two
    // independent stages and Spark computes the join once per stage.
    val nEdges = edges.count()
    if (nEdges == 0 || nEdges <= threshold) {
      // collect, union-find (union by min root, path compression),
      // emit sorted by doc_id — identical output to the loop below
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      edges.unpersist()
      labels.unpersist()
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val nx = parent.getOrElse(c, c); parent(c) = r; c = nx
        }
        r
      }
      for ((a, b) <- es) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val ids = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val rows = ids.map(id => org.apache.spark.sql.Row(
        id, find(id), id == find(id)))
      import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}
      s.createDataFrame(java.util.Arrays.asList(rows: _*),
        StructType(Seq(StructField("doc_id", LongType),
          StructField("cluster_id", LongType),
          StructField("keep", BooleanType))))
    } else {
      // One round folds TWO signals into each node's label: the min
      // label among its neighbors (classic propagation — advances the
      // component min one hop per round) and its own label's label
      // (POINTER JUMPING / path halving — the distance to the min
      // shrinks geometrically, so a diameter-d chain converges in
      // O(log d) rounds, not d). Without the jump, a >cap-diameter
      // dup CHAIN — exactly the adversarial spam shape a 100 TB
      // corpus contains — would exhaust the round cap; with it, 64
      // rounds cover any component that fits in storage. The jump
      // preserves the invariant (lbl(v) is always a node of v's
      // component: initially self, neighbor-min picks a neighbor's
      // component node, the jump picks that node's component node),
      // and the fixpoint is unchanged (component min everywhere), so
      // output stays identical to the local union-find — the branch
      // equality spec and ClusterAb keep proving it.
      def hop(ls: DataFrame): DataFrame = {
        val viaNeighbor = edges
          .join(ls.withColumnRenamed("id", "src_id"),
            col("src") === col("src_id"))
          .groupBy(col("dst").as("id"))
          .agg(min("lbl").as("nlbl"))
        val viaParent = ls.as("l")
          .join(ls.as("p"), col("l.lbl") === col("p.id"), "left")
          .select(col("l.id").as("id"), col("l.lbl").as("lbl"),
            col("p.lbl").as("plbl"))
        viaParent.join(viaNeighbor.as("n"), Seq("id"), "left")
          .select(col("id"),
            least(col("lbl"),
              coalesce(col("plbl"), col("lbl")),
              coalesce(col("n.nlbl"), col("lbl")))
              .as("lbl"))
      }
      // Labels only decrease, so sum(lbl) strictly decreases until the
      // fixpoint — one scalar action per round detects convergence.
      var converged = false
      var rounds = 0
      var curSum = labels.agg(sum("lbl")).head.getLong(0)
      // Checkpoint CADENCE (`spark.graft.dedup.checkpointInterval`):
      // off-rounds persist + materialize (the convergence sum below
      // forces a full evaluation either way), truncation rounds also
      // sever lineage. With eager localCheckpoint (local default) a
      // truncation costs the same as the persist it replaces, so
      // skipping it saves NOTHING and only grows the plan 3× per
      // skipped round — measured in ClusterAb (sf1: every-round
      // 1.99 s vs every-2nd 2.32 s), hence default 1. With a RELIABLE
      // checkpoint dir each truncation is a real write to shared
      // storage, so the default stretches to every 2nd round (the
      // jump preserves correctness; plan growth caps at 3^2
      // references to the last checkpoint). Convergence detection and
      // the fixpoint are cadence-blind; ClusterAb asserts output
      // equality across settings.
      // clamp into [1, 64] BEFORE narrowing — the loop caps at 64
      // rounds, and a bare .toInt would wrap huge values
      val interval = math.max(1L, math.min(64L, confLong(s,
        "spark.graft.dedup.checkpointInterval",
        if (s.conf.getOption("spark.graft.checkpoint.dir").isDefined) 2L
        else 1L))).toInt
      while (!converged && rounds < 64) {
        val hopped = hop(labels)
        val next = if ((rounds + 1) % interval == 0) truncate(hopped)
          else hopped.persist()
        val nextSum = next.agg(sum("lbl")).head.getLong(0)
        labels.unpersist()
        labels = next
        converged = nextSum == curSum
        curSum = nextSum
        rounds += 1
      }
      // a silent cap-out would emit WRONG clusters; with pointer
      // jumping 64 rounds cover ~2^64 diameters, so hitting this is a
      // logic bug, never data — fail loudly either way
      if (!converged) throw new IllegalStateException(
        s"connected components did not converge after $rounds rounds " +
          "— refusing to emit incomplete cluster labels")
      // Eager truncation materializes the result (executor block
      // managers, or the reliable checkpoint dir when configured) and
      // severs lineage, so the cached edge/label frames can be
      // unpersisted without recompute and — crucially — the label set
      // (billions of rows at 100 TB dup rates) never funnels through
      // the driver. ScaleSpec proves this branch completes under
      // driver.maxResultSize=32m.
      val out = truncate(labels
        .select(col("id").as("doc_id"), col("lbl").as("cluster_id"),
          (col("id") === col("lbl")).as("keep"))
        .orderBy("doc_id"))
      edges.unpersist()
      labels.unpersist()
      out
    }
  }

  /** Eagerly materialize `df` and sever its lineage.
    * `spark.graft.checkpoint.dir`, when set, routes through a
    * RELIABLE checkpoint (HDFS/object store): on a real cluster an
    * executor loss after the sever then recomputes from replicated
    * storage instead of failing the job — the 100 TB setting for the
    * iterative dedup/graph paths, whose severed plans cannot
    * recompute from source once upstream caches are unpersisted.
    * Unset (local/test) uses eager localCheckpoint, whose
    * executor-local blocks a single-JVM run cannot lose. */
  private def severLineage(s: SparkSession, df: DataFrame): DataFrame =
    s.conf.getOption("spark.graft.checkpoint.dir") match {
      case Some(dir) =>
        // setCheckpointDir mints a fresh UUID subdir per call, so only
        // re-point when the root the current dir lives under differs
        // from the configured root (compared path-only, since Spark
        // stores the QUALIFIED uri) — but DO re-point then: a
        // checkpoint dir pre-set elsewhere must not silently win over
        // the explicit graft conf (checkpoints landing on the wrong
        // store defeats the fault-tolerance contract).
        val wantedRaw = new org.apache.hadoop.fs.Path(dir).toUri.getPath
        // a RELATIVE configured dir must absolutize before comparing,
        // or it never matches the qualified root Spark stores and
        // every call re-points (a fresh UUID subdir per checkpoint)
        val wanted =
          if (wantedRaw.startsWith("/")) wantedRaw
          else new java.io.File(wantedRaw).getAbsolutePath
        val currentRoot = s.sparkContext.getCheckpointDir.map(u =>
          new org.apache.hadoop.fs.Path(u).getParent.toUri.getPath)
        if (!currentRoot.contains(wanted))
          s.sparkContext.setCheckpointDir(dir)
        // persist first: reliable checkpoint materializes the RDD in
        // a SECOND job after the eager action — without the cache
        // every truncation would compute the plan twice. Deployments
        // should set spark.cleaner.referenceTracking.cleanCheckpoints
        // =true (checkpoint files otherwise outlive the loop for the
        // app's lifetime).
        val cached = df.persist()
        val out = df.checkpoint(true)
        cached.unpersist()
        out
      case None => df.localCheckpoint(true)
    }

  /** Integer conf with a descriptive failure — a malformed value must
    * name the conf it came from, not surface as a bare
    * NumberFormatException mid-query. */
  private def confLong(s: SparkSession, key: String, default: Long): Long =
    s.conf.getOption(key).map { v =>
      try v.trim.toLong catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"conf $key must be an integer, got '$v'")
      }
    }.getOrElse(default)

  /** Deterministic train/val/test split: bucket on the first 8 hex
    * digits of md5(doc_id) — reproducible, order-independent, and
    * engine-portable (md5 is md5 everywhere, unlike murmur/xxhash).
    * 80/10/10; output is the per-(lang, split) contingency table.
    */
  private val trainSplit = Q(
    "q_pipe_split",
    """WITH b AS (
      |  SELECT lang,
      |    CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |      AS UBIGINT) % 100 AS BIGINT) AS bucket
      |  FROM documents
      |)
      |SELECT lang,
      |  CASE WHEN bucket < 80 THEN 'train'
      |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
      |  count(*) AS n_docs
      |FROM b GROUP BY 1, 2 ORDER BY lang, split""".stripMargin
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("lang"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("bigint") % 100).as("bucket"))
      .select(col("lang"),
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test").as("split"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "split")
  }

  /** Leakage-safe train/test split — [[trainSplit]] hardened with the
    * near-dup guard every serious LM data pipeline needs: after the
    * deterministic 90/10 md5 split, any TRAIN document whose trigram-
    * shingle Jaccard with some TEST document is ≥ 0.5 is flagged as
    * LEAKY (a near-copy of held-out data would otherwise inflate every
    * eval). Output is the per-lang contingency: split sizes, leaky
    * train docs, and the clean train count a release would keep.
    * Scale shape: the split is map-side; cross-split candidates
    * materialize only on exact shingle collisions (the sparse
    * ngram-jaccard join, never all-pairs); the leak set is a tiny
    * distinct id list joined back for the rollup. */
  private val splitDecontaminated = Q(
    "q_pipe_split_decontaminated",
    """WITH b AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN CAST(CAST(concat('0x',
      |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
      |        AS UBIGINT) % 100 AS BIGINT) < 90
      |      THEN 'train' ELSE 'test' END AS split
      |  FROM documents
      |), t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |), dt AS (
      |  SELECT DISTINCT doc_id, unnest(list_transform(
      |    range(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM t
      |), sz AS (
      |  SELECT doc_id, count(*) AS n FROM dt GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS id_tr, x.doc_id AS id_te, count(*) AS i
      |  FROM dt a
      |  JOIN b ba ON ba.doc_id = a.doc_id AND ba.split = 'train'
      |  JOIN dt x ON x.sh = a.sh
      |  JOIN b bx ON bx.doc_id = x.doc_id AND bx.split = 'test'
      |  GROUP BY 1, 2
      |), leak AS (
      |  SELECT DISTINCT id_tr FROM inter
      |  JOIN sz sa ON sa.doc_id = id_tr
      |  JOIN sz sb ON sb.doc_id = id_te
      |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
      |)
      |SELECT b.lang,
      |  CAST(sum(CASE WHEN b.split = 'train' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_train,
      |  CAST(sum(CASE WHEN b.split = 'test' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_test,
      |  CAST(sum(CASE WHEN l.id_tr IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_leaky_train,
      |  CAST(sum(CASE WHEN b.split = 'train' AND l.id_tr IS NULL
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_clean_train
      |FROM b LEFT JOIN leak l ON l.id_tr = b.doc_id
      |GROUP BY b.lang ORDER BY b.lang""".stripMargin
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val b = docs.select(col("doc_id"), col("lang"),
      when(conv(substring(md5(col("doc_id").cast("string")), 1, 8),
        16, 10).cast("bigint") % 100 < 90, "train")
        .otherwise("test").as("split"))
    val sets = DedupQueries.shingleSetsMaterialized(docs)
    val tagged = sets.join(b.select("doc_id", "split"), "doc_id")
    val sizes = sets.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = tagged.filter(col("split") === "train").as("a")
      .join(tagged.filter(col("split") === "test").as("x"),
        col("a.sh") === col("x.sh"))
      .groupBy(col("a.doc_id").as("id_tr"), col("x.doc_id").as("id_te"))
      .agg(count(lit(1)).as("i"))
    val leak = inter
      .join(sizes.as("sa"), col("id_tr") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("id_te") === col("sb.doc_id"))
      .filter(col("i").cast("double") /
        (col("sa.n") + col("sb.n") - col("i")) >= 0.5)
      .select("id_tr").distinct()
    b.join(leak, b("doc_id") === leak("id_tr"), "left")
      .groupBy("lang")
      .agg(
        sum(when(col("split") === "train", 1L).otherwise(0L))
          .cast("long").as("n_train"),
        sum(when(col("split") === "test", 1L).otherwise(0L))
          .cast("long").as("n_test"),
        sum(when(col("id_tr").isNotNull, 1L).otherwise(0L))
          .cast("long").as("n_leaky_train"),
        sum(when(col("split") === "train" && col("id_tr").isNull, 1L)
          .otherwise(0L)).cast("long").as("n_clean_train"))
      .orderBy("lang")
  }

  /** Stratified deterministic sample: the first 20 docs per language in
    * md5 order — a reproducible "random" sample with exact per-stratum
    * size control (what rand()-based sampling can't guarantee).
    * Scale note: the window partitions by lang (few, large groups); at
    * 100 TB pre-reduce per input partition first (each partition keeps
    * its own top-k by the same md5 key, then the window ranks only
    * partitions*k survivors — the TakeOrderedAndProject trick applied
    * per stratum).
    */
  private val sample = Q(
    "q_pipe_sample",
    """WITH r AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents
      |)
      |SELECT doc_id, lang, rk FROM r WHERE rk <= 20
      |ORDER BY lang, rk""".stripMargin
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        row_number().over(Window.partitionBy("lang")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id")))
          .as("rk"))
      .filter(col("rk") <= 20)
      .orderBy("lang", "rk")
  }

  /** Sequence packing: assign docs to contiguous token-budget batches
    * (the pre-tokenization step that turns a corpus into fixed-budget
    * training batches). Docs pack within a shard (doc_id % 32) in
    * doc_id order; batch = floor(tokens-before-this-doc / budget), so
    * a doc that crosses the boundary starts in the batch its first
    * token falls into. Output is the per-batch manifest.
    */
  private val pack = Q(
    "q_pipe_pack",
    """WITH t AS (
      |  SELECT doc_id, doc_id % 32 AS shard,
      |    len(string_split(text, ' ')) AS tok
      |  FROM documents
      |), c AS (
      |  SELECT shard, tok,
      |    sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) - tok AS tok_before
      |  FROM t
      |)
      |SELECT shard, CAST(floor(tok_before / 512.0) AS BIGINT) AS batch_id,
      |  count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS total_tokens
      |FROM c GROUP BY 1, 2 ORDER BY shard, batch_id""".stripMargin
  ) { (s, dir) =>
    val t = Tables.documents(s, dir)
      .select(col("doc_id"), (col("doc_id") % 32).as("shard"),
        size(split(col("text"), " ")).as("tok"))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.select(col("shard"), col("tok"),
        (sum("tok").over(w) - col("tok")).as("tok_before"))
      .select(col("shard"),
        floor(col("tok_before") / 512.0).cast("bigint").as("batch_id"),
        col("tok"))
      .groupBy("shard", "batch_id")
      .agg(count(lit(1)).as("n_docs"), sum("tok").as("total_tokens"))
      .orderBy("shard", "batch_id")
  }

  /** Vocabulary statistics: document frequency + smoothed IDF per
    * token. The df aggregate is partial-agg-friendly (distinct
    * (doc_id, tok) pairs, then a count per tok); the scalar corpus
    * size broadcasts into the projection.
    */
  private val vocab = Q(
    "q_pipe_vocab",
    """WITH dt AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
      |  FROM documents
      |), n AS (SELECT count(*) AS total FROM documents)
      |SELECT tok, count(*) AS df,
      |  round(ln(CAST(total AS DOUBLE) / count(*)), 4) AS idf
      |FROM dt CROSS JOIN n
      |GROUP BY tok, total ORDER BY df DESC, tok""".stripMargin
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val dt = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("tok"))
    val n = docs.agg(count(lit(1)).as("total"))
    dt.crossJoin(broadcast(n))
      .groupBy("tok", "total")
      .agg(count(lit(1)).as("df"))
      .select(col("tok"), col("df"),
        round(log(col("total").cast("double") / col("df")), 4).as("idf"))
      .orderBy(desc("df"), asc("tok"))
  }

  /** Corpus distribution quantiles per language: exact interpolated
    * percentiles of document length (both engines use the same linear
    * interpolation; at 100 TB swap in approx_percentile, same shape).
    */
  private val quantiles = Q(
    "q_pipe_quantiles",
    """SELECT lang,
      |  round(quantile_cont(n_chars, 0.25), 2) AS p25,
      |  round(quantile_cont(n_chars, 0.50), 2) AS p50,
      |  round(quantile_cont(n_chars, 0.75), 2) AS p75,
      |  round(quantile_cont(n_chars, 0.95), 2) AS p95
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .groupBy("lang")
      .agg(
        round(expr("percentile(n_chars, 0.25)"), 2).as("p25"),
        round(expr("percentile(n_chars, 0.50)"), 2).as("p50"),
        round(expr("percentile(n_chars, 0.75)"), 2).as("p75"),
        round(expr("percentile(n_chars, 0.95)"), 2).as("p95"))
      .orderBy("lang")
  }

  /** The 100 TB twin of q_pipe_quantiles: approx_percentile (a
    * mergeable t-digest-style sketch — partial-aggregates map-side and
    * merges across partitions, so percentile cost stops scaling with
    * row count). No oracle: sketch internals have no DuckDB twin;
    * LlmSpec bounds its error against the exact percentiles instead.
    */
  private val quantilesApprox = Q.noOracle("q_pipe_quantiles_approx") {
    (s, dir) =>
      Tables.documents(s, dir)
        .groupBy("lang")
        .agg(
          expr("approx_percentile(n_chars, 0.25, 10000)").as("p25"),
          expr("approx_percentile(n_chars, 0.50, 10000)").as("p50"),
          expr("approx_percentile(n_chars, 0.75, 10000)").as("p75"),
          expr("approx_percentile(n_chars, 0.95, 10000)").as("p95"))
        .orderBy("lang")
  }

  /** The fully-ORACLED twin of [[quantilesApprox]] (the md5-twin
    * pattern): approximate per-lang percentiles from a DETERMINISTIC
    * bottom-k hash sample — the k=256 rows with the smallest
    * md5(doc_id) per lang are a uniform sample (the KMV/bottom-k
    * sampling law), and exact rank selection over the sample gives
    * the estimate. Everything is integer/string ops both engines
    * compute identically. Scale shape: bottom-k by hash is MERGEABLE
    * (per-partition k-smallest merge associatively — the same
    * kSmallest machinery as the quantile sketch), so at 100 TB this
    * is one map-side-combinable pass, never a global sort; groups
    * smaller than k degrade to exact percentiles. */
  private val quantilesSample = Q(
    "q_pipe_quantiles_sample",
    """WITH h AS (
      |  SELECT lang, n_chars, md5(CAST(doc_id AS VARCHAR)) AS hk,
      |    doc_id
      |  FROM documents
      |), s AS (
      |  SELECT lang, n_chars,
      |    row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id)
      |      AS rn
      |  FROM h
      |), r AS (
      |  SELECT lang, n_chars,
      |    row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS r,
      |    count(*) OVER (PARTITION BY lang) AS c
      |  FROM s WHERE rn <= 256
      |)
      |SELECT lang,
      |  CAST(max(CASE WHEN r = 1 + ((c-1)*25)//100 THEN n_chars END)
      |    AS BIGINT) AS p25,
      |  CAST(max(CASE WHEN r = 1 + ((c-1)*50)//100 THEN n_chars END)
      |    AS BIGINT) AS p50,
      |  CAST(max(CASE WHEN r = 1 + ((c-1)*75)//100 THEN n_chars END)
      |    AS BIGINT) AS p75,
      |  CAST(max(CASE WHEN r = 1 + ((c-1)*95)//100 THEN n_chars END)
      |    AS BIGINT) AS p95
      |FROM r GROUP BY lang ORDER BY lang""".stripMargin
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .selectExpr("lang", "n_chars",
        "md5(cast(cast(doc_id as string) as binary)) as hk", "doc_id")
      .selectExpr("lang", "n_chars",
        "row_number() over (partition by lang order by hk, doc_id) as rn")
      .filter(col("rn") <= 256)
      .selectExpr("lang", "n_chars",
        "row_number() over (partition by lang order by n_chars) as r",
        "count(*) over (partition by lang) as c")
      .groupBy("lang")
      .agg(
        expr("cast(max(case when r = 1 + ((c-1)*25) div 100 " +
          "then n_chars end) as bigint)").as("p25"),
        expr("cast(max(case when r = 1 + ((c-1)*50) div 100 " +
          "then n_chars end) as bigint)").as("p50"),
        expr("cast(max(case when r = 1 + ((c-1)*75) div 100 " +
          "then n_chars end) as bigint)").as("p75"),
        expr("cast(max(case when r = 1 + ((c-1)*95) div 100 " +
          "then n_chars end) as bigint)").as("p95"))
      .orderBy("lang")
  }

  /** Int8 scalar quantization of embeddings: symmetric per-vector
    * scale (max |x| -> 127), plus the reconstruction RMSE — the
    * compression step before shipping vectors to an ANN index. All
    * math in double (the float column is widened first) so both
    * engines compute bit-identical scales.
    */
  private val quantize = Q(
    "q_pipe_quantize",
    """WITH t AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |), sc AS (
      |  SELECT vec_id, v,
      |    list_max(list_transform(v, x -> abs(x))) AS maxabs
      |  FROM t
      |), q AS (
      |  SELECT vec_id, v, maxabs,
      |    list_transform(v, x -> CAST(round(x / maxabs * 127) AS INTEGER))
      |      AS qv
      |  FROM sc
      |)
      |SELECT vec_id, round(maxabs, 4) AS scale,
      |  CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
      |  round(sqrt(list_sum(list_transform(range(1, len(v) + 1),
      |    i -> pow(v[i] - qv[i] * maxabs / 127, 2))) / len(v)), 6)
      |    AS rmse
      |FROM q ORDER BY vec_id""".stripMargin
  ) { (s, dir) =>
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("maxabs",
        expr("array_max(transform(v, x -> abs(x)))"))
      .withColumn("qv",
        expr("transform(v, x -> CAST(round(x / maxabs * 127) AS INT))"))
      .select(col("vec_id"), round(col("maxabs"), 4).as("scale"),
        expr("CAST(aggregate(transform(qv, x -> abs(x)), 0, " +
          "(a, x) -> a + x) AS BIGINT)").as("q_l1"),
        round(sqrt(expr(
          "aggregate(zip_with(v, qv, (x, q) -> pow(x - q * maxabs / 127, 2)), " +
            "CAST(0 AS DOUBLE), (a, x) -> a + x)") / size(col("v"))), 6)
          .as("rmse"))
      .orderBy("vec_id")
  }

  /** PII detection + redaction over text — the unstructured-text twin
    * of the reference's table-level PII erasure (README.md:11: "remove
    * PII"). The corpus is synthetic and contains no natural PII, so the
    * query first embeds deterministic identifiers derived from real
    * columns (email, phone, card, IPv4), then detects and scrubs them
    * with anchored regexes; the oracle replays both halves, so the
    * match is on the redaction logic, not the synthesis. Pure map-side
    * regexp work — at 100 TB this is a zero-shuffle projection.
    */
  private val piiRedact = Q(
    "q_text_pii_redact",
    """WITH aug AS (
      |  SELECT doc_id,
      |    concat(text, ' contact user', CAST(doc_id AS VARCHAR),
      |      '@mail', CAST(doc_id % 7 AS VARCHAR),
      |      '.com phone 555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
      |      ' card 411111111111', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
      |      ' ip 10.', CAST(doc_id % 256 AS VARCHAR), '.0.1') AS text
      |  FROM documents
      |)
      |SELECT doc_id,
      |  len(regexp_extract_all(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
      |  len(regexp_extract_all(text, '\b555-[0-9]{4}\b')) AS n_phone,
      |  len(regexp_extract_all(text, '\b[0-9]{16}\b')) AS n_card,
      |  len(regexp_extract_all(text,
      |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ip,
      |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |    '\b555-[0-9]{4}\b', '[PHONE]', 'g'),
      |    '\b[0-9]{16}\b', '[CARD]', 'g'),
      |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g')
      |    AS redacted
      |FROM aug ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\b555-[0-9]{4}\\b"
    val card = "\\b[0-9]{16}\\b"
    val ip = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    Tables.documents(s, dir)
      .select(col("doc_id"),
        concat(col("text"), lit(" contact user"),
          col("doc_id").cast("string"), lit("@mail"),
          (col("doc_id") % 7).cast("string"), lit(".com phone 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" card 411111111111"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" ip 10."), (col("doc_id") % 256).cast("string"),
          lit(".0.1")).as("text"))
      .select(col("doc_id"),
        regexp_count(col("text"), lit(email)).as("n_email"),
        regexp_count(col("text"), lit(phone)).as("n_phone"),
        regexp_count(col("text"), lit(card)).as("n_card"),
        regexp_count(col("text"), lit(ip)).as("n_ip"),
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          col("text"),
          email, "[EMAIL]"), phone, "[PHONE]"), card, "[CARD]"),
          ip, "[IP]").as("redacted"))
      .orderBy("doc_id")
  }

  /** Unigram-LM quality score: per-doc average negative log-likelihood
    * under the corpus unigram distribution — the classic cheap
    * perplexity proxy for filtering gibberish/outlier documents.
    * The per-token -ln p values are scaled to integers BEFORE the
    * distributed sum (integer addition is order-independent; a double
    * sum over shuffled rows is not), so the result hashes identically
    * in both engines. */
  private val logprob = Q(
    "q_text_logprob",
    """WITH dt AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |  FROM documents
      |), freq AS (
      |  SELECT tok, c, CAST(sum(c) OVER () AS BIGINT) AS total
      |  FROM (SELECT tok, count(*) AS c FROM dt GROUP BY tok)
      |)
      |SELECT doc_id,
      |  round(sum(CAST(round(-ln(CAST(c AS DOUBLE) / total) * 1000000)
      |      AS BIGINT)) / (1000000.0 * count(*)), 4) AS nll
      |FROM dt JOIN freq USING (tok)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val dt = Tables.documents(s, dir).select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    // total tokens via a global window over the vocab-sized freq table
    // — one corpus scan for freq, one for scoring, never a third
    val freq = dt.groupBy("tok").agg(count(lit(1)).as("c"))
      .withColumn("total", sum("c").over(Window.partitionBy()))
    dt.join(broadcast(freq), "tok")
      .select(col("doc_id"),
        round(-log(col("c").cast("double") / col("total")) * 1000000)
          .cast("bigint").as("scaled"))
      .groupBy("doc_id")
      .agg(round(sum("scaled") / (lit(1000000.0) * count(lit(1))), 4)
        .as("nll"))
      .orderBy("doc_id")
  }

  /** Bigram-LM quality score: per-doc average negative conditional
    * log-likelihood -ln p(w2 | w1) under corpus bigram statistics —
    * one LM order above q_text_logprob's unigram proxy, and the level
    * where repetitive/templated text separates cleanly from fluent
    * text. p = c(w1 w2) / c(w1 ·) with both counts from the same
    * bigram table (31-word vocab ⇒ ≤ 961 rows, broadcast). Same
    * determinism contract as the unigram score: per-bigram -ln p is
    * scaled to an integer BEFORE the distributed sum. */
  private val logprobBigram = Q(
    "q_text_logprob_bigram",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |), db AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
      |    i -> toks[i] || ' ' || toks[i+1])) AS big
      |  FROM t WHERE len(toks) >= 2
      |), bc AS (
      |  SELECT big, count(*) AS c FROM db GROUP BY big
      |), cc AS (
      |  SELECT string_split(big, ' ')[1] AS w1, CAST(sum(c) AS BIGINT) AS ct
      |  FROM bc GROUP BY 1
      |)
      |SELECT doc_id,
      |  round(sum(CAST(round(-ln(CAST(c AS DOUBLE) / ct) * 1000000)
      |      AS BIGINT)) / (1000000.0 * count(*)), 4) AS nll2
      |FROM db
      |JOIN bc USING (big)
      |JOIN cc ON cc.w1 = string_split(big, ' ')[1]
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val db = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> concat_ws(' ', toks[i], toks[i+1]))")).as("big"))
    val bc = db.groupBy("big").agg(count(lit(1)).as("c"))
    val cc = bc
      .groupBy(split(col("big"), " ").getItem(0).as("w1"))
      .agg(sum(col("c")).as("ct"))
    db.join(broadcast(bc), "big")
      .join(broadcast(cc),
        split(col("big"), " ").getItem(0) === col("w1"))
      .select(col("doc_id"),
        round(-log(col("c").cast("double") / col("ct")) * 1000000)
          .cast("bigint").as("scaled"))
      .groupBy("doc_id")
      .agg(round(sum("scaled") / (lit(1000000.0) * count(lit(1))), 4)
        .as("nll2"))
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: flag corpus documents sharing any
    * 5-token n-gram with the held-out eval slice (source='src4' stands
    * in for the benchmark set). The cross-set equi-join on the n-gram
    * is the standard decontamination shape — candidate pairs only
    * materialize where an exact n-gram collides, never all-pairs. */
  private val decontaminate = Q(
    "q_pipe_decontaminate",
    """WITH corpus AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |  WHERE source <> 'src4'
      |), eval AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |  WHERE source = 'src4'
      |), cg AS (
      |  SELECT DISTINCT doc_id, unnest(list_transform(
      |    range(1, len(toks) - 3),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
      |      toks[i+3] || ' ' || toks[i+4])) AS g
      |  FROM corpus
      |), eg AS (
      |  SELECT DISTINCT unnest(list_transform(
      |    range(1, len(toks) - 3),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
      |      toks[i+3] || ' ' || toks[i+4])) AS g
      |  FROM eval
      |)
      |SELECT doc_id, count(*) AS n_shared_ngrams
      |FROM cg JOIN eg USING (g)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    def grams(df: org.apache.spark.sql.DataFrame) =
      DedupQueries.wordGrams(df, 5, Seq("doc_id"))
    val docs = Tables.documents(s, dir)
    // The benchmark side is small by definition — broadcast its gram
    // set and filter the corpus BEFORE any corpus-wide shuffle: the
    // per-doc distinct then runs over matched grams only (tiny), so
    // the corpus is never shuffled, only map-scanned.
    val eg = grams(docs.filter(col("source") === "src4")).select("g")
      .distinct()
    grams(docs.filter(col("source") =!= "src4"))
      .join(broadcast(eg), "g")
      .distinct()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_ngrams"))
      .orderBy("doc_id")
  }

  /** MinHash+LSH with md5-derived hash functions — the fully
    * oracle-checkable twin of q_dedup_minhash_lsh (whose xxhash64 has
    * no DuckDB equivalent). 16 minhashes (h_i = first 15 hex digits of
    * md5(i || shingle), 60 bits so it fits a signed BIGINT in both
    * engines), banded 4x4; candidate pairs from a band-signature
    * equi-join; exact shingle-Jaccard >= 0.5 verification filters false
    * positives. Same scale shape as the production query: candidates
    * only materialize on bucket collisions, never all-pairs. */
  private val NumH = 16
  private val BandsH = 4
  private val RowsH = NumH / BandsH

  private val minhashMd5 = Q(
    "q_dedup_minhash_md5", {
      val hashAggs = (0 until NumH).map(i =>
        s"min(CAST(concat('0x', substr(md5(CAST($i AS VARCHAR) || sh), " +
          s"1, 15)) AS UBIGINT)::BIGINT) AS h$i").mkString(",\n      ")
      val bandSelects = (0 until BandsH).map { b =>
        val sig = (0 until RowsH).map(r => s"h${b * RowsH + r}")
          .mkString("CAST(", " AS VARCHAR) || '-' || CAST(", " AS VARCHAR)")
        s"SELECT doc_id, $b AS band, $sig AS sig FROM sigs"
      }.mkString("\n      UNION ALL ")
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |), dt AS (
         |  SELECT DISTINCT doc_id, unnest(list_transform(
         |    range(1, len(toks) - 1),
         |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
         |  FROM t
         |), sigs AS (
         |  SELECT doc_id,
         |      $hashAggs
         |  FROM dt GROUP BY doc_id
         |), bands AS (
         |      $bandSelects
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.sig = b.sig
         |      AND a.doc_id < b.doc_id
         |), sz AS (
         |  SELECT doc_id, count(*) AS n FROM dt GROUP BY doc_id
         |), inter AS (
         |  SELECT c.id_a, c.id_b, count(*) AS i
         |  FROM cand c
         |  JOIN dt x ON x.doc_id = c.id_a
         |  JOIN dt y ON y.doc_id = c.id_b AND y.sh = x.sh
         |  GROUP BY 1, 2
         |)
         |SELECT id_a, id_b,
         |  round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jaccard
         |FROM inter
         |JOIN sz sa ON sa.doc_id = id_a
         |JOIN sz sb ON sb.doc_id = id_b
         |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin
    }
  ) { (s, dir) =>
    val dt = DedupQueries.shingleSetsMaterialized(Tables.documents(s, dir))
    val hashCols = (0 until NumH).map(i =>
      min(conv(substring(md5(concat(lit(i.toString), col("sh"))), 1, 15),
        16, 10).cast("bigint")).as(s"h$i"))
    val sigs = dt.groupBy("doc_id").agg(hashCols.head, hashCols.tail: _*)
    val bands = (0 until BandsH).map { b =>
      val sig = concat_ws("-", (0 until RowsH).map(r =>
        col(s"h${b * RowsH + r}").cast("string")): _*)
      sigs.select(col("doc_id"), lit(b).as("band"), sig.as("sig"))
    }.reduce(_ unionByName _)
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val sizes = dt.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(dt.as("x"), col("x.doc_id") === col("id_a"))
      .join(dt.as("y"), col("y.doc_id") === col("id_b") &&
        col("y.sh") === col("x.sh"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("i"))
    // no broadcast hint: `sizes` is one row per DOCUMENT (see
    // DedupQueries.jaccardPairs) — plain equi-joins, AQE decides
    inter
      .join(sizes.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.doc_id"))
      .filter(col("i").cast("double") /
        (col("sa.n") + col("sb.n") - col("i")) >= 0.5)
      .select(col("id_a"), col("id_b"),
        round(col("i").cast("double") /
          (col("sa.n") + col("sb.n") - col("i")), 4).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** Training-mix domain upsampling: each source gets a repeat factor
    * (the "epochs over this domain" knob in every LM data recipe —
    * high-quality sources repeated, bulk sources passed once). A doc
    * expands to `factor` copies map-side via explode(sequence(...)) —
    * narrow, no shuffle, no driver loop; the copy ordinal feeds the
    * downstream shuffle-shard assignment so repeated copies land in
    * different training shards (xxhash-bucket here mirrors
    * q_pipe_split's md5 bucketing but stays oracle-free of hashing by
    * deriving the shard from (doc_id, copy) arithmetic).
    */
  private val upsample = Q(
    "q_pipe_upsample",
    """WITH f AS (
      |  SELECT doc_id, source,
      |    CASE source WHEN 'src0' THEN 3 WHEN 'src1' THEN 2 ELSE 1 END
      |      AS factor
      |  FROM documents
      |), x AS (
      |  SELECT doc_id, source, CAST(u.copy AS BIGINT) AS copy,
      |    (doc_id * 7 + u.copy) % 8 AS shard
      |  FROM f, unnest(generate_series(1, factor)) AS u(copy)
      |)
      |SELECT source, shard, count(*) AS n_rows,
      |  count(DISTINCT doc_id) AS n_docs
      |FROM x GROUP BY source, shard ORDER BY source, shard""".stripMargin
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        when(col("source") === "src0", 3)
          .when(col("source") === "src1", 2).otherwise(1).as("factor"))
      .select(col("doc_id"), col("source"),
        explode(expr("sequence(1L, CAST(factor AS BIGINT))")).as("copy"))
      .select(col("source"),
        ((col("doc_id") * 7 + col("copy")) % 8).as("shard"),
        col("doc_id"))
      .groupBy("source", "shard")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy("source", "shard")
  }

  /** Sliding-window document chunking: 32-token windows every 24
    * tokens (8-token overlap) — how long documents become
    * context-window-sized training/RAG units. Chunk starts explode
    * map-side from a sequence over ceil(n/stride); the slice+join is
    * per-row HOF math, so the whole operator is narrow until the
    * presentation sort. At 100 TB this is the shape that matters:
    * chunking never shuffles the corpus, and downstream operators see
    * (doc_id, chunk_id) keys that inherit the document partitioning.
    */
  private val chunk = Q(
    "q_pipe_chunk",
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |)
      |SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_id,
      |  len(toks[u.i * 24 + 1 : u.i * 24 + 32]) AS n_tokens,
      |  array_to_string(toks[u.i * 24 + 1 : u.i * 24 + 32], ' ') AS chunk
      |FROM t, unnest(generate_series(0,
      |  CAST(ceil(len(toks) / 24.0) AS BIGINT) - 1)) AS u(i)
      |ORDER BY doc_id, chunk_id""".stripMargin
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(expr("sequence(0L, " +
          "CAST(ceil(size(toks) / 24.0) AS BIGINT) - 1)")).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        expr("size(slice(toks, CAST(chunk_id * 24 + 1 AS INT), 32))")
          .as("n_tokens"),
        expr("array_join(slice(toks, CAST(chunk_id * 24 + 1 AS INT), 32)," +
          " ' ')").as("chunk"))
      .orderBy("doc_id", "chunk_id")
  }

  /** Training-mix weights: temperature-scaled source sampling
    * (weight_s ∝ n_tokens_s^0.5 — the standard multiplicative-rebalance
    * that upweights small sources; alpha = 0.5 specifically because
    * IEEE sqrt is correctly rounded and therefore bit-identical across
    * engines, unlike pow(x, 0.7) whose libm differs). All arithmetic
    * after the sqrt is integer: the scaled weight is floored to a
    * BIGINT, the normalizer is an exact integer sum, and the final
    * share is half-up integer PARTS PER MILLION — no float sum, no
    * round(double) anywhere. One bounded groupBy(source) + a 1-row
    * broadcast: nothing here grows with the corpus. */
  private val mixture = Q(
    "q_pipe_mixture",
    """WITH counts AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
      |      AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |w AS (
      |  SELECT source, n_docs, n_tokens,
      |    CAST(floor(sqrt(n_tokens) * 1000000) AS BIGINT) AS wgt
      |  FROM counts),
      |t AS (SELECT CAST(sum(wgt) AS BIGINT) AS tw FROM w)
      |SELECT source, n_docs, n_tokens,
      |  (1000000 * wgt + tw // 2) // tw AS weight_ppm
      |FROM w, t ORDER BY source""".stripMargin
  ) { (s, dir) =>
    val w = Tables.documents(s, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .withColumn("wgt",
        floor(sqrt(col("n_tokens")) * 1000000d).cast("bigint"))
    w.crossJoin(broadcast(w.agg(sum(col("wgt")).as("tw"))))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("(1000000L * wgt + tw div 2) div tw").as("weight_ppm"))
      .orderBy("source")
  }

  /** Deterministic training-order interleave: round-robin across
    * sources (the standard way to avoid long single-source runs in a
    * training stream without a shuffle-by-random). rank-within-source
    * is one window keyed on source (parallel across sources); the
    * epoch order IS the (rank, source) sort — deliberately NOT
    * materialized as a global row_number, which would be a
    * single-partition window; a prefix of the epoch is a plain
    * TakeOrderedAndProject and a full epoch write is a range-
    * partitioned sort, both scale-safe. */
  private val interleave = Q(
    "q_pipe_interleave",
    """SELECT doc_id, source,
      |  row_number() OVER (PARTITION BY source ORDER BY doc_id)
      |    AS rank_in_source
      |FROM documents
      |ORDER BY rank_in_source, source LIMIT 200""".stripMargin
  ) { (s, dir) =>
    val perSource = Window.partitionBy("source").orderBy("doc_id")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        row_number().over(perSource).as("rank_in_source"))
      .orderBy("rank_in_source", "source")
      .limit(200)
  }

  /** Weighted interleave — the mixture × order composition: each
    * source's docs explode map-side into `factor` copies (the same
    * explicit mix config as q_pipe_upsample: src0×3, src1×2, rest ×1 —
    * data-derived sqrt-temperature factors all round to 1 on this
    * deliberately-uniform corpus, so the config keeps the epoch
    * demonstrably weighted), then the epoch paces sources
    * PROPORTIONALLY: a source with factor f emits f items per round
    * (round = (rank-1) div f), so every epoch prefix carries the
    * target mix — not just the epoch as a whole. Pure integer
    * arithmetic throughout, so the epoch is bit-reproducible; the
    * prefix plans as TakeOrderedAndProject, never a global-window
    * single partition. */
  private val mixInterleave = Q(
    "q_pipe_mix_interleave",
    """WITH x AS (
      |  SELECT doc_id, source, factor, CAST(u.copy AS BIGINT) AS copy
      |  FROM (
      |    SELECT doc_id, source,
      |      CASE source WHEN 'src0' THEN 3 WHEN 'src1' THEN 2 ELSE 1 END
      |        AS factor
      |    FROM documents) d,
      |    unnest(generate_series(1, d.factor)) AS u(copy)),
      |r AS (
      |  SELECT doc_id, source, copy,
      |    row_number() OVER (PARTITION BY source ORDER BY copy, doc_id)
      |      AS rank_in_source,
      |    factor
      |  FROM x)
      |SELECT doc_id, source, copy,
      |  (rank_in_source - 1) // factor AS round, rank_in_source
      |FROM r ORDER BY round, source, rank_in_source
      |LIMIT 300""".stripMargin
  ) { (s, dir) =>
    pacedInterleave(Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        when(col("source") === "src0", 3L)
          .when(col("source") === "src1", 2L).otherwise(1L).as("factor")))
      .limit(300)
  }

  /** The pacing core of the weighted interleave: docs with a per-row
    * upsample `factor` explode map-side into `factor` copies; a source
    * with factor f then emits f items per round ((rank-1) div f), so
    * every epoch prefix carries the target mix. Shared by the
    * fixed-config oracle query above and the data-derived
    * sqrt-temperature path (LlmSpec exercises it on a skewed slice
    * where the derived factors exceed 1). */
  private[llm] def pacedInterleave(docsWithFactor: DataFrame): DataFrame = {
    val perSource = Window.partitionBy("source").orderBy("copy", "doc_id")
    docsWithFactor
      .select(col("doc_id"), col("source"), col("factor"),
        explode(expr("sequence(1L, factor)")).as("copy"))
      .withColumn("rank_in_source", row_number().over(perSource))
      .select(col("doc_id"), col("source"), col("copy"),
        expr("(rank_in_source - 1) div factor").as("round"),
        col("rank_in_source"))
      .orderBy("round", "source", "rank_in_source")
  }

  /** Data-derived sqrt-temperature upsample factors: a source's factor
    * is round(sqrt(T_max / T_s)) over per-source total token counts,
    * floored at 1 — small sources repeat, the largest never does (the
    * standard temperature-sampling shape, τ = 2). Integer-rounded so
    * pacing stays exact; on a deliberately uniform corpus every factor
    * rounds to 1 (why the oracle query uses an explicit config). */
  private[llm] def sqrtTemperatureFactors(docs: DataFrame): DataFrame = {
    val totals = docs
      .select(col("source"), expr("size(split(text, ' '))").as("toks"))
      .groupBy("source").agg(sum("toks").as("t"))
    val tMax = totals.agg(max("t")).head.getLong(0)
    totals.select(col("source"),
      greatest(lit(1L),
        round(sqrt(lit(tMax.toDouble) / col("t"))).cast("long"))
        .as("factor"))
  }

  /** Stratified sampling with per-stratum rates — the `sampleBy`
    * operation of every corpus-rebalancing recipe (downsample the
    * dominant language, keep the tail), made deterministic and
    * repeatable by hashing the stable doc_id instead of drawing RNG
    * state: a doc survives iff md5(doc_id) mod 100 falls under its
    * stratum's rate (en is ~43% of the corpus, so it samples at 10%;
    * every other language keeps 50%). Unlike q_pipe_sample (exact
    * top-N per stratum via a window shuffle), this is the 100 TB
    * shape: a pure map-side filter — no shuffle, no per-stratum
    * ordering, each executor decides each row locally, and the same
    * doc set survives any re-run or partial re-read. */
  private val stratified = Q(
    "q_pipe_stratified",
    """SELECT doc_id, lang,
      |  CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |    AS UBIGINT)::BIGINT % 100 AS INT) AS bucket
      |FROM documents
      |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |    AS UBIGINT)::BIGINT % 100
      |  < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
      |ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 15),
      16, 10).cast("bigint") % 100
    Tables.documents(s, dir)
      .withColumn("bucket", bucket.cast("int"))
      .filter(col("bucket") <
        when(col("lang") === "en", 10).otherwise(50))
      .select("doc_id", "lang", "bucket")
      .orderBy("doc_id")
  }

  /** Dataset card — the per-(lang, source) summary artifact every
    * training-data release ships: document and token volumes plus
    * exact-duplication rates, composed from the substring-coverage
    * pipeline. Integer everywhere: token shares as half-up basis
    * points, mean doc length as integer division. One coverage pass
    * (already partial-agg shaped) + one slice-keyed groupBy. */
  private val datasetCard = Q(
    "q_pipe_dataset_card",
    """WITH t AS (
      |  SELECT doc_id, lang, source, string_split(text, ' ') AS toks,
      |    len(string_split(text, ' ')) AS n
      |  FROM documents
      |), occ AS (
      |  SELECT doc_id, i AS p,
      |    concat_ws(' ', toks[i+1], toks[i+2], toks[i+3], toks[i+4],
      |      toks[i+5]) AS g
      |  FROM t, unnest(generate_series(0, n - 5)) AS u(i)
      |  WHERE n >= 5
      |), dup AS (
      |  SELECT g FROM occ GROUP BY g HAVING count(*) > 1
      |), hits AS (
      |  SELECT o.doc_id, o.p FROM occ o JOIN dup USING (g)
      |), cov AS (
      |  SELECT doc_id,
      |    greatest(0, (p + 5) - greatest(p,
      |      coalesce(max(p + 5) OVER (PARTITION BY doc_id ORDER BY p
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))) AS c
      |  FROM hits
      |), per AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS dup_tokens
      |  FROM cov GROUP BY doc_id
      |)
      |SELECT t.lang, t.source,
      |  count(*) AS n_docs,
      |  CAST(sum(t.n) AS BIGINT) AS total_tokens,
      |  CAST(sum(t.n) // count(*) AS BIGINT) AS mean_doc_tokens,
      |  CAST(sum(CASE WHEN coalesce(per.dup_tokens, 0) > 0
      |    THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_dups,
      |  CAST((10000 * CAST(sum(coalesce(per.dup_tokens, 0)) AS BIGINT)
      |    + CAST(sum(t.n) AS BIGINT) // 2)
      |    // CAST(sum(t.n) AS BIGINT) AS BIGINT) AS dup_token_share_bp
      |FROM t LEFT JOIN per USING (doc_id)
      |GROUP BY t.lang, t.source
      |ORDER BY t.lang, t.source""".stripMargin
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val cov = DedupQueries.substringCoverageOver(docs)
      .select(col("doc_id"), col("total_tokens"), col("dup_tokens"))
    docs.select(col("doc_id"), col("lang"), col("source"))
      .join(cov, Seq("doc_id"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum("total_tokens").cast("long").as("total_tokens"),
        expr("CAST(sum(total_tokens) div count(1) AS BIGINT)")
          .as("mean_doc_tokens"),
        sum(when(col("dup_tokens") > 0, 1L).otherwise(0L))
          .cast("long").as("docs_with_dups"),
        expr("CAST((10000 * sum(dup_tokens) + sum(total_tokens) div 2)" +
          " div sum(total_tokens) AS BIGINT)").as("dup_token_share_bp"))
      .orderBy("lang", "source")
  }

  /** Token-budget data selection — the fine-tuning-mix op: each source
    * contributes its BEST documents (greedy by quality, here the
    * type-token ratio in integer basis points) until a per-source
    * token budget (500) is exhausted. A doc is selected iff it fits
    * the remaining budget in (quality desc, doc_id) order — the greedy
    * prefix, expressed as one running-sum window per source.
    *
    * Scale design: the per-source sort is ONE shuffle keyed by source
    * (skew bounded by source cardinality; a hot source salts like any
    * skewed agg). That per-source total order is the honest cost of
    * EXACT best-first selection — the approximate 100 TB variant
    * computes a per-source quality threshold from quantiles
    * (q_pipe_quantiles' shape) and selects by comparison, map-side.
    * All math is integer: the quality score uses integer division,
    * budgets/token counts are BIGINTs.
    */
  private val tokenBudget = Q(
    "q_pipe_token_budget",
    """WITH t AS (
      |  SELECT doc_id, source,
      |    len(string_split(text, ' ')) AS n_tok,
      |    len(list_distinct(string_split(text, ' '))) AS n_distinct
      |  FROM documents
      |), q AS (
      |  SELECT doc_id, source, n_tok,
      |    (10000 * n_distinct) // n_tok AS quality_bp
      |  FROM t
      |), r AS (
      |  SELECT source, n_tok, quality_bp,
      |    sum(n_tok) OVER (PARTITION BY source
      |      ORDER BY quality_bp DESC, doc_id
      |      ROWS UNBOUNDED PRECEDING) - n_tok AS tok_before
      |  FROM q
      |)
      |SELECT source,
      |  count(*) AS docs_considered,
      |  count(CASE WHEN tok_before + n_tok <= 500 THEN 1 END)
      |    AS docs_selected,
      |  CAST(coalesce(sum(CASE WHEN tok_before + n_tok <= 500
      |    THEN n_tok END), 0) AS BIGINT) AS tokens_selected,
      |  CAST(min(CASE WHEN tok_before + n_tok <= 500
      |    THEN quality_bp END) AS BIGINT) AS cutoff_quality_bp
      |FROM r GROUP BY source ORDER BY source""".stripMargin
  ) { (s, dir) =>
    val t = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).as("n_tok"),
        size(array_distinct(split(col("text"), " "))).as("n_distinct"))
    val q = t.select(col("doc_id"), col("source"), col("n_tok"),
      expr("(10000 * n_distinct) div n_tok").as("quality_bp"))
    val w = Window.partitionBy("source")
      .orderBy(desc("quality_bp"), asc("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sel = (col("tok_before") + col("n_tok")) <= 500
    q.select(col("source"), col("n_tok"), col("quality_bp"),
        (sum("n_tok").over(w) - col("n_tok")).as("tok_before"))
      .groupBy("source")
      .agg(count(lit(1)).as("docs_considered"),
        count(when(sel, 1)).as("docs_selected"),
        coalesce(sum(when(sel, col("n_tok"))), lit(0L)).cast("bigint")
          .as("tokens_selected"),
        min(when(sel, col("quality_bp"))).cast("bigint")
          .as("cutoff_quality_bp"))
      .orderBy("source")
  }

  /** The curation FUNNEL — the integration artifact every dataset
    * release ships: sequential gates (length ≥ 30 tokens → type-token
    * quality ≥ 4000 bp → substring-duplication ≤ 2000 bp among the
    * gate survivors → per-source 500-token best-first budget) with
    * per-stage survivor doc/token counts. Composes the engine's own
    * stages (q_text_stats / q_pipe_token_budget shapes and the
    * q_dedup_substring coverage pipeline via
    * [[DedupQueries.substringCoverageOver]]) into one five-row report.
    *
    * Scale design: all four gates are evaluated as FLAGS in one pass
    * (a doc carries p1..p4 booleans; conditional aggregates produce
    * every stage's totals from a single frame) — the per-stage counts
    * never re-scan the corpus. The only non-map-side stages are the
    * coverage pipeline's window-text groupBy (the q_dedup_substring
    * shape, sparse equi-join, never all-pairs) and the budget's
    * per-source running-sum window (one shuffle keyed by source);
    * non-surviving rows contribute 0 to the budget window, so no
    * second survivor-only pass exists.
    */
  private val curationFunnel = Q(
    "q_pipe_curation_funnel",
    """WITH t AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS toks,
      |    len(string_split(text, ' ')) AS n,
      |    len(list_distinct(string_split(text, ' '))) AS nd
      |  FROM documents
      |), f AS (
      |  SELECT doc_id, source, toks, n, (10000 * nd) // n AS ttr FROM t
      |), s2 AS (
      |  SELECT * FROM f WHERE n >= 30 AND ttr >= 4000
      |), occ AS (
      |  SELECT doc_id, i AS p,
      |    concat_ws(' ', toks[i+1], toks[i+2], toks[i+3], toks[i+4],
      |      toks[i+5]) AS g
      |  FROM s2, unnest(generate_series(0, n - 5)) AS u(i)
      |  WHERE n >= 5
      |), dup AS (
      |  SELECT g FROM occ GROUP BY g HAVING count(*) > 1
      |), hits AS (
      |  SELECT o.doc_id, o.p FROM occ o JOIN dup USING (g)
      |), cov AS (
      |  SELECT doc_id,
      |    greatest(0, (p + 5) - greatest(p,
      |      coalesce(max(p + 5) OVER (PARTITION BY doc_id ORDER BY p
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)))
      |      AS c
      |  FROM hits
      |), per AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS dup_tokens
      |  FROM cov GROUP BY doc_id
      |), dbp AS (
      |  SELECT s2.doc_id,
      |    CAST((10000 * coalesce(per.dup_tokens, 0) + s2.n // 2) // s2.n
      |      AS BIGINT) AS dup_bp
      |  FROM s2 LEFT JOIN per USING (doc_id)
      |), fl AS (
      |  SELECT f.doc_id, f.source, f.n, f.ttr,
      |    f.n >= 30 AS p1,
      |    f.n >= 30 AND f.ttr >= 4000 AS p2,
      |    f.n >= 30 AND f.ttr >= 4000
      |      AND coalesce(d.dup_bp <= 2000, FALSE) AS p3
      |  FROM f LEFT JOIN dbp d USING (doc_id)
      |), fb AS (
      |  SELECT *,
      |    sum(CASE WHEN p3 THEN n ELSE 0 END) OVER (PARTITION BY source
      |      ORDER BY ttr DESC, doc_id ROWS UNBOUNDED PRECEDING)
      |      - CASE WHEN p3 THEN n ELSE 0 END AS tok_before
      |  FROM fl
      |), fx AS (
      |  SELECT *, p3 AND tok_before + n <= 500 AS p4 FROM fb
      |), a AS (
      |  SELECT count(*) AS d0, CAST(sum(n) AS BIGINT) AS t0,
      |    count(CASE WHEN p1 THEN 1 END) AS d1,
      |    CAST(coalesce(sum(CASE WHEN p1 THEN n END), 0) AS BIGINT) AS t1,
      |    count(CASE WHEN p2 THEN 1 END) AS d2,
      |    CAST(coalesce(sum(CASE WHEN p2 THEN n END), 0) AS BIGINT) AS t2,
      |    count(CASE WHEN p3 THEN 1 END) AS d3,
      |    CAST(coalesce(sum(CASE WHEN p3 THEN n END), 0) AS BIGINT) AS t3,
      |    count(CASE WHEN p4 THEN 1 END) AS d4,
      |    CAST(coalesce(sum(CASE WHEN p4 THEN n END), 0) AS BIGINT) AS t4
      |  FROM fx
      |)
      |SELECT 0 AS stage_ord, 'ingest' AS stage, d0 AS docs, t0 AS tokens
      |FROM a
      |UNION ALL SELECT 1, 'length', d1, t1 FROM a
      |UNION ALL SELECT 2, 'quality', d2, t2 FROM a
      |UNION ALL SELECT 3, 'dedup', d3, t3 FROM a
      |UNION ALL SELECT 4, 'budget', d4, t4 FROM a
      |ORDER BY stage_ord""".stripMargin
  ) { (s, dir) =>
    val f = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("text"),
        size(split(col("text"), " ")).as("n"),
        size(array_distinct(split(col("text"), " "))).as("nd"))
      .withColumn("ttr", expr("(10000 * nd) div n"))
    val s2 = f.filter(col("n") >= 30 && col("ttr") >= 4000)
    val dbp = DedupQueries.substringCoverageOver(
        s2.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("dup_bp"))
    val fl = f.join(dbp, Seq("doc_id"), "left")
      .withColumn("p1", col("n") >= 30)
      .withColumn("p2", col("p1") && col("ttr") >= 4000)
      .withColumn("p3",
        col("p2") && coalesce(col("dup_bp") <= 2000, lit(false)))
    val w = Window.partitionBy("source")
      .orderBy(desc("ttr"), asc("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val contrib = when(col("p3"), col("n")).otherwise(lit(0))
    val fx = fl
      .withColumn("tok_before", sum(contrib).over(w) - contrib)
      .withColumn("p4",
        col("p3") && (col("tok_before") + col("n")) <= 500)
    def dt(p: String, i: Int) = Seq(
      count(when(col(p), 1)).as(s"d$i"),
      coalesce(sum(when(col(p), col("n"))), lit(0)).cast("bigint")
        .as(s"t$i"))
    val aggs = Seq(sum("n").cast("bigint").as("t0")) ++
      dt("p1", 1) ++ dt("p2", 2) ++ dt("p3", 3) ++ dt("p4", 4)
    val a = fx.agg(count(lit(1)).as("d0"), aggs: _*)
    a.selectExpr(
      "stack(5, 0, 'ingest', d0, t0, 1, 'length', d1, t1, " +
        "2, 'quality', d2, t2, 3, 'dedup', d3, t3, " +
        "4, 'budget', d4, t4) AS (stage_ord, stage, docs, tokens)")
      .orderBy("stage_ord")
  }

  /** Sequence-length bucketing + padding-waste report — the batch-
    * efficiency metric sequence packing (q_pipe_pack) exists to fix:
    * docs bucket to the next power-of-two-ish boundary (16/32/64/128
    * tokens), and each bucket reports real vs padded token volume and
    * the waste in half-up basis points. Pure map-side bucketing + one
    * bounded groupBy (≤4 groups at any SF), all-integer math. */
  private val lengthBuckets = Q(
    "q_pipe_length_buckets",
    """WITH t AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
      |), b AS (
      |  SELECT doc_id, n,
      |    CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
      |         WHEN n <= 64 THEN 64 ELSE 128 END AS bucket
      |  FROM t
      |)
      |SELECT bucket, count(*) AS n_docs,
      |  CAST(sum(n) AS BIGINT) AS real_tokens,
      |  CAST(count(*) * bucket AS BIGINT) AS padded_tokens,
      |  (10000 * (count(*) * bucket - CAST(sum(n) AS BIGINT))
      |    + count(*) * bucket // 2) // (count(*) * bucket) AS waste_bp
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
  ) { (s, dir) =>
    val t = Tables.documents(s, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    t.withColumn("bucket",
        when(col("n") <= 16, 16).when(col("n") <= 32, 32)
          .when(col("n") <= 64, 64).otherwise(128))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum("n").cast("bigint").as("real_tokens"))
      .withColumn("padded_tokens",
        (col("n_docs") * col("bucket")).cast("bigint"))
      .withColumn("waste_bp", expr(
        "(10000 * (padded_tokens - real_tokens) + padded_tokens div 2)" +
          " div padded_tokens"))
      .orderBy("bucket")
  }

  /** Curriculum ordering — the easy→hard training schedule of an LM
    * data pipeline: documents are staged by a difficulty signal (mean
    * token length, the [[q_text_quality]] expression) and shuffled
    * deterministically WITHIN each stage, so training consumes simple
    * text first without ever reading in a data-dependent order twice.
    * Stage boundaries are the sample quartiles from the deterministic
    * bottom-k md5 sample ([[quantilesSample]]'s KMV law) — picked via
    * sort+limit, which Spark plans as TakeOrderedAndProject (per-
    * partition partial top-k, tiny merge on one reducer: never a
    * global sort of the corpus; ntile would shuffle-sort 100 TB) —
    * then ONE tiny broadcast, so stage assignment is map-side. The
    * within-stage order is md5('cur42:'||doc_id) — reproducible and
    * seed-switchable. Output: the first 25 schedule slots per stage;
    * the `row_number ≤ 25` filter lets Spark's WindowGroupLimit rule
    * pre-reduce each map partition to 25 rows per stage BEFORE the
    * stage shuffle, so the schedule windows are per-stage top-k, not
    * corpus-wide sorts. */
  private val curriculum = Q(
    "q_pipe_curriculum",
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(n_chars - (len(string_split(text, ' ')) - 1) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS diff
      |  FROM documents
      |), s AS (
      |  SELECT diff,
      |    row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
      |      doc_id) AS rn
      |  FROM t
      |), r AS (
      |  SELECT diff, row_number() OVER (ORDER BY diff, rn) AS r
      |  FROM s WHERE rn <= 256
      |), bounds AS (
      |  SELECT max(CASE WHEN r = 64 THEN diff END) AS b1,
      |    max(CASE WHEN r = 128 THEN diff END) AS b2,
      |    max(CASE WHEN r = 192 THEN diff END) AS b3
      |  FROM r
      |), staged AS (
      |  SELECT t.doc_id, t.diff,
      |    1 + CASE WHEN t.diff > b.b1 THEN 1 ELSE 0 END
      |      + CASE WHEN t.diff > b.b2 THEN 1 ELSE 0 END
      |      + CASE WHEN t.diff > b.b3 THEN 1 ELSE 0 END AS stage
      |  FROM t CROSS JOIN bounds b
      |), sched AS (
      |  SELECT stage, doc_id, diff,
      |    row_number() OVER (PARTITION BY stage
      |      ORDER BY md5('cur42:' || CAST(doc_id AS VARCHAR)), doc_id)
      |      AS seq
      |  FROM staged
      |)
      |SELECT stage, seq, doc_id, round(diff, 4) AS difficulty
      |FROM sched WHERE seq <= 25 ORDER BY stage, seq""".stripMargin
  ) { (s, dir) =>
    val t = Tables.documents(s, dir)
      .select(col("doc_id"),
        ((col("n_chars") - (size(split(col("text"), " ")) - 1))
          .cast("double") / size(split(col("text"), " "))).as("diff"))
    // sample quartile boundaries: bottom-256 by md5(doc_id) via
    // sort+limit (TakeOrderedAndProject — distributed partial top-k,
    // no corpus-wide window), exact ranks 64/128/192 over the sample
    // ordered by (diff, sample rank)
    val bounds = t
      .withColumn("h",
        expr("md5(cast(cast(doc_id as string) as binary))"))
      .orderBy(col("h"), col("doc_id")).limit(256)
      .selectExpr("diff", "row_number() over (order by h, doc_id) as rn")
      .selectExpr("diff", "row_number() over (order by diff, rn) as r")
      .agg(
        expr("max(case when r = 64 then diff end)").as("b1"),
        expr("max(case when r = 128 then diff end)").as("b2"),
        expr("max(case when r = 192 then diff end)").as("b3"))
    val staged = t.crossJoin(broadcast(bounds))
      .select(col("doc_id"), col("diff"),
        (lit(1) + when(col("diff") > col("b1"), 1).otherwise(0)
          + when(col("diff") > col("b2"), 1).otherwise(0)
          + when(col("diff") > col("b3"), 1).otherwise(0)).as("stage"))
    val w = Window.partitionBy("stage").orderBy(
      md5(concat(lit("cur42:"), col("doc_id").cast("string"))
        .cast("binary")), col("doc_id"))
    staged.withColumn("seq", row_number().over(w))
      .filter(col("seq") <= 25)
      .select(col("stage"), col("seq"), col("doc_id"),
        round(col("diff"), 4).as("difficulty"))
      .orderBy("stage", "seq")
  }

  /** Water-filling token-budget allocation across domains (round 14)
    * — the max-min-fair mixture solver of an LM data pipeline: given
    * a token budget B (total÷3 here), every domain gets
    * min(its size, cap) where the common water level `cap` exhausts
    * B; small domains keep everything, big domains are clipped to the
    * same level (the fairness property upsampling/downsampling
    * schedules start from). Exact integer algorithm: sort domains by
    * size, count how many are fully satisfiable
    * (prefix + size·(remaining) ≤ B — a monotone prefix property),
    * cap = floor((B − P_j)/(n − j)), and the ≤(n−j−1)-token remainder
    * goes one token each to the first unsatisfied domains in size
    * order — fully deterministic, no floats anywhere. Scale shape:
    * the corpus pass is ONE partial-agg'd groupBy(source); every
    * window after that runs over the DOMAIN table (bounded — tens,
    * not corpus-sized), so the unpartitioned windows are safe at any
    * corpus scale. */
  private val waterfill = Q(
    "q_pipe_waterfill",
    """WITH tok AS (
      |  SELECT source,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS size
      |  FROM documents GROUP BY source
      |), tot AS (
      |  SELECT CAST(sum(size) AS BIGINT) // 3 AS b FROM tok
      |), ord AS (
      |  SELECT source, size,
      |    row_number() OVER (ORDER BY size, source) AS k,
      |    CAST(sum(size) OVER (ORDER BY size, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS pfx,
      |    count(*) OVER () AS n
      |  FROM tok
      |), sat AS (
      |  SELECT o.*, t.b,
      |    CASE WHEN (o.pfx - o.size) + o.size * (o.n - o.k + 1) <= t.b
      |      THEN 1 ELSE 0 END AS is_sat
      |  FROM ord o CROSS JOIN tot t
      |), lvl AS (
      |  SELECT CAST(sum(is_sat) AS BIGINT) AS j,
      |    CAST(coalesce(sum(CASE WHEN is_sat = 1 THEN size END), 0)
      |      AS BIGINT) AS pj,
      |    max(b) AS b, max(n) AS n
      |  FROM sat
      |), cap AS (
      |  SELECT j, pj, b, n,
      |    CASE WHEN j < n THEN (b - pj) // (n - j) ELSE NULL END AS cap,
      |    CASE WHEN j < n
      |      THEN b - pj - ((b - pj) // (n - j)) * (n - j)
      |      ELSE CAST(0 AS BIGINT) END AS rem
      |  FROM lvl
      |)
      |SELECT s.source, s.size AS size_tokens,
      |  CASE WHEN s.is_sat = 1 THEN s.size
      |    ELSE c.cap + (CASE WHEN s.k - c.j <= c.rem THEN 1 ELSE 0 END)
      |    END AS alloc_tokens,
      |  s.is_sat AS fully_satisfied
      |FROM sat s CROSS JOIN cap c
      |ORDER BY s.source""".stripMargin
  ) { (s, dir) =>
    val tok = Tables.documents(s, dir)
      .groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long"))
        .cast("bigint").as("size"))
    val tot = tok.agg(expr("sum(size) div 3").cast("bigint").as("b"))
    val w = Window.orderBy("size", "source")
    val ord = tok.crossJoin(broadcast(tot))
      .select(col("source"), col("size"), col("b"),
        row_number().over(w).cast("long").as("k"),
        sum("size").over(w.rowsBetween(
          Window.unboundedPreceding, Window.currentRow))
          .cast("bigint").as("pfx"),
        count(lit(1)).over(Window.partitionBy()).as("n"))
    val sat = ord.withColumn("is_sat",
      when((col("pfx") - col("size"))
        + col("size") * (col("n") - col("k") + 1) <= col("b"), 1)
        .otherwise(0))
    val lvl = sat.agg(
      sum("is_sat").cast("bigint").as("j"),
      coalesce(sum(when(col("is_sat") === 1, col("size"))), lit(0L))
        .cast("bigint").as("pj"),
      max("b").as("b"), max("n").as("n"))
      .withColumn("cap", expr(
        "CASE WHEN j < n THEN (b - pj) div (n - j) ELSE NULL END"))
      .withColumn("rem", expr(
        "CASE WHEN j < n THEN b - pj - ((b - pj) div (n - j)) * (n - j)" +
          " ELSE CAST(0 AS BIGINT) END"))
    sat.crossJoin(broadcast(lvl))
      .select(col("source"), col("size").as("size_tokens"),
        expr("CASE WHEN is_sat = 1 THEN size" +
          " ELSE cap + (CASE WHEN k - j <= rem THEN 1 ELSE 0 END) END")
          .as("alloc_tokens"),
        col("is_sat").as("fully_satisfied"))
      .orderBy("source")
  }

  override def all: Seq[Q] = Seq(dedupClusters, survivorship, pagerank,
    weightedSample, trainSplit,
    splitDecontaminated, sample, pack,
    vocab, quantiles, quantilesApprox, quantilesSample, quantize,
    piiRedact, logprob,
    logprobBigram, decontaminate, minhashMd5, upsample, chunk,
    mixture, interleave, mixInterleave, stratified, datasetCard,
    tokenBudget, curationFunnel, lengthBuckets, curriculum, waterfill)
}
