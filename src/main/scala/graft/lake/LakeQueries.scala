package graft.lake

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DecimalType, StructType, TimestampNTZType}

import graft.{Q, QueryCatalog}

/** SURVEY.md §2i table-lifecycle operators (D1–D17) exposed as driver
  * queries. No SQL oracle exists for runtime-created tables, so these
  * are rows-only checks (the hard assertions live in GraftTableSpec);
  * each query replays a deterministic slice of the reference demo's
  * lifecycle in a temp warehouse and returns data whose VALUES are
  * deterministic (metadata timestamps never leak into the output).
  */
object LakeQueries extends QueryCatalog {

  private val piiSchema = StructType.fromDDL(
    "case_id STRING, first_name STRING, email_address STRING, " +
    "key_nm STRING, secure_txt STRING, secure_key STRING, " +
    "update_date DATE")

  private def seedRows = Seq(
    Row("case-1", "John", "john.doe@example.com", "key1", "secret text 1",
      "secret_key_1", java.sql.Date.valueOf("2023-01-01")),
    Row("case-2", "Jane", "jane.roe@example.com", "key2", "secret text 2",
      "secret_key_2", java.sql.Date.valueOf("2023-01-02")),
    Row("case-3", "Alice", "alice@example.com", "key3", "secret text 3",
      "secret_key_3", java.sql.Date.valueOf("2023-01-03")))

  private def newTable(s: SparkSession): GraftTable = {
    val cat = new GraftCatalog(s, graft.ScratchDirs.create("graft-wh-"))
    cat.createNamespace("default")
    val t = cat.createTable("default", "pii_data", piiSchema,
      Map("write.delete.mode" -> "merge-on-read",
        "write.update.mode" -> "copy-on-write"))
    t.append(s.createDataFrame(seedRows.asJava, piiSchema))
    t
  }

  /** D6+D8+D7: the demo's core walk — insert, MOR delete case-2, COW
    * nullify case-1 — returning the final visible table. */
  private val lifecycle = Q.noOracle("q_lake_lifecycle") { (outer, _) =>
    // driver-gap-dominated bounded walk (r17 LakeJobProfile) —
    // AQE-off 2-partition private session; result oracle-unchanged
    val s = LakeQueries.tunedSession(outer)
    val t = newTable(s)
    t.delete(col("case_id") === "case-2")
    t.update(col("case_id") === "case-1",
      Map("first_name" -> lit(null), "email_address" -> lit(null),
        "secure_txt" -> lit(null)))
    t.read().orderBy("case_id")
  }

  /** S2: time travel to the pre-delete snapshot (demo.py:254-262). */
  private val timeTravel = Q.noOracle("q_lake_time_travel") { (s, _) =>
    val t = newTable(s)
    val s0 = t.currentSnapshot.get.snapshotId
    t.delete(col("case_id") === "case-2")
    t.readAt(s0).orderBy("case_id") // 3 rows incl. the deleted one
  }

  /** D15/S3: files metadata table through the MOR-delete transition —
    * content domain {0,1} exactly as demo.py:204-216. */
  private val metadataFiles = Q.noOracle("q_lake_metadata_files") { (s, _) =>
    val t = newTable(s)
    t.delete(col("case_id") === "case-2")
    t.files
      .groupBy("content", "file_format")
      .agg(count(lit(1)).as("n_files"),
        sum("record_count").as("records"))
      .orderBy("content", "file_format")
  }

  /** D13+D14: rewrite applies deletes; delete-file count drops to zero
    * (demo.py:419-466). Returns the post-compaction file inventory. */
  /** D13/D14 rewrite ORACLED (r16 — converted from the demo-row file
    * census, whose file-level shapes GraftTableSpec keeps pinning):
    * compaction must be CONTENT-NEUTRAL. A lineitem slice lands
    * across many small files, a MOR delete masks a predicate,
    * rewrite_data_files + rewrite_position_delete_files compact;
    * in-builder requires pin the file-level effects (delete files
    * staged, then GONE), and DuckDB recomputes the content the
    * compacted table must still serve byte-for-byte — a rewrite that
    * dropped a row, resurrected a masked one, or double-applied a
    * delete hash-mismatches. */
  private val rewrite = Q(
    "q_lake_rewrite",
    """WITH c AS (
      |  SELECT l_orderkey AS okey, l_linenumber AS lnum,
      |    CAST(round(l_quantity * 100) AS BIGINT) AS qty_c
      |  FROM lineitem WHERE l_orderkey % 8 = 3
      |)
      |SELECT okey, lnum, qty_c FROM c WHERE NOT qty_c < 1500
      |ORDER BY okey, lnum, qty_c""".stripMargin
  ) { (s, dir) =>
    val li = graft.rel.Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 8 === 3)
      .select(col("l_orderkey").cast("long").as("okey"),
        col("l_linenumber").cast("long").as("lnum"),
        round(col("l_quantity") * 100).cast("long").as("qty_c"))
    val t = sliceTable(s, "graft-rw-", "rw_li",
      "okey BIGINT, lnum BIGINT, qty_c BIGINT",
      Map("write.delete.mode" -> "merge-on-read"),
      li.repartition(8)) // many small files to compact
    t.delete(col("qty_c") < 1500L)
    def deleteFiles() =
      t.files.filter(col("content") =!= 0).count()
    require(deleteFiles() > 0, "the MOR delete must stage delete files")
    t.rewriteDataFiles(Map("rewrite-all" -> "true"))
    t.rewritePositionDeleteFiles()
    require(deleteFiles() == 0, "compaction must drop the delete files")
    t.read().orderBy("okey", "lnum", "qty_c")
  }

  /** D17: permanent PII erasure end-to-end (README.md:49-59). */
  /** D17 ErasePii ORACLED (r16 — the reference's headline purpose as
    * a hash check; the demo-row walk stays pinned by
    * q_lake_subject_access and the spec suites): subject 101 erased
    * ROW-wise, subject 201 nullified COLUMN-wise, both PERMANENT
    * (erase → rewrite → expire → orphan sweep), over a customer
    * slice. DuckDB recomputes the final content, so the hash proves
    * the erase removed exactly the subjects and nothing else changed;
    * an in-builder require proves no retained snapshot reaches the
    * deleted subject. */
  private val erase = Q(
    "q_lake_erase_pii",
    """WITH c AS (
      |  SELECT c_custkey AS k, c_name AS nm, c_mktsegment AS seg
      |  FROM customer WHERE c_custkey % 4 = 1
      |)
      |SELECT k,
      |  CASE WHEN k = 201 THEN NULL ELSE nm END AS nm,
      |  CASE WHEN k = 201 THEN NULL ELSE seg END AS seg
      |FROM c WHERE k <> 101 ORDER BY k""".stripMargin
  ) { (outer, dir) =>
    // driver-gap-dominated bounded walk (r17 LakeJobProfile) —
    // AQE-off 2-partition private session; result oracle-unchanged
    val s = LakeQueries.tunedSession(outer)
    val cust = graft.rel.Tables.customer(s, dir)
      .filter(col("c_custkey") % 4 === 1)
      .select(col("c_custkey").cast("long").as("k"),
        col("c_name").as("nm"), col("c_mktsegment").as("seg"))
    val t = sliceTable(s, "graft-er-", "cust_pii",
      "k BIGINT, nm STRING, seg STRING",
      Map("write.delete.mode" -> "merge-on-read"), cust)
    // both subjects must EXIST pre-erase, or the walk passes
    // vacuously (custkey 201 only exists above the smallest SF)
    require(t.read().filter(col("k").isin(101L, 201L)).count() == 2,
      "erase subjects 101 and 201 must exist in the slice")
    ErasePii.run(t, "k", 101L, ErasePii.DeleteRow)
    ErasePii.run(t, "k", 201L,
      ErasePii.NullifyColumns(Seq("nm", "seg")))
    require(t.meta.snapshots.forall(sn =>
      t.readAt(sn.snapshotId).filter(col("k") === 101L).isEmpty),
      "no retained snapshot may reach the erased subject")
    t.read().orderBy("k")
  }

  /** D17 companion — GDPR SUBJECT-ACCESS AUDIT: for one data subject,
    * walk every retained snapshot and report whether (and with what
    * visibility) the subject's row exists there — the "where does this
    * person's data still live" question a DSAR or a deletion
    * verification asks, and the forensic complement of the
    * permanent-delete demo (a MOR delete hides the row from NEW
    * snapshots while OLD snapshots still reach it; after
    * erase+expire, NO snapshot does). Each probe is a stats-pruned
    * point read at one snapshot; output is one row per (phase,
    * snapshot ordinal). The walk is metadata-bounded: retained
    * snapshot count × a pruned point lookup. */
  private val subjectAccess =
    Q.noOracle("q_lake_subject_access") { (s, _) =>
    val t = newTable(s)
    t.delete(col("case_id") === "case-2") // MOR hide
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long, String)]
    def audit(phase: String): Unit = {
      val snaps = t.meta.snapshots.map(_.snapshotId).sorted
      snaps.zipWithIndex.foreach { case (id, i) =>
        val hit = t.readAt(id).filter(col("case_id") === "case-2")
          .select("first_name").collect()
        val state =
          if (hit.isEmpty) "absent"
          else if (hit.head.isNullAt(0)) "present-nullified"
          else "present"
        out += ((phase, i.toLong, hit.length.toLong, state))
      }
    }
    audit("1-after-mor-delete") // old snapshots still reach the row
    ErasePii.run(t, "case_id", "case-2", ErasePii.DeleteRow)
    audit("2-after-erase") // no retained snapshot reaches it
    require(out.filter(_._1 == "2-after-erase").forall(_._4 == "absent"),
      "erase+expire left the subject reachable from a snapshot")
    require(out.filter(_._1 == "1-after-mor-delete").exists(
      _._4 == "present"),
      "pre-erase history must still reach the subject (the forensic " +
        "point)")
    import s.implicits._
    out.toSeq.toDF("phase", "snapshot_ordinal", "n_rows", "state")
      .orderBy("phase", "snapshot_ordinal")
  }

  /** E2: summarize_files + diff port over live metadata tables —
    * returns the diff with volatile columns projected away. */
  private val summaryDiff = Q.noOracle("q_lake_file_summary_diff") { (s, _) =>
    val t = newTable(s)
    val before = FileSummary.fullSummary(t, "run-1", "append")
    t.delete(col("case_id") === "case-2")
    val after = FileSummary.fullSummary(t, "run-2", "delete")
    FileSummary.diff(before, after)
      .groupBy("file_type", "status")
      .agg(sum("delta").as("delta"))
      .orderBy("file_type", "status")
  }

  /** Stats-based file pruning (SURVEY §4): two appends with disjoint key
    * ranges, predicate selects one file's range. */
  /** Stats-pruned read ORACLED (r16 — converted from the 4-row demo
    * walk; GraftTableSpec keeps pinning pruned-≡-plain): readWhere
    * must return EXACTLY the filter's rows while planning FEWER files
    * (in-builder require) — the hash check turns a pruning bug
    * (dropped or leaked file) into a wrong answer, not a perf miss.
    * Range-clustered on the predicate column so the band prunes. */
  private val prunedRead = Q(
    "q_lake_pruned_read",
    """WITH c AS (
      |  SELECT o_orderkey AS k, o_custkey AS ck,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
      |  FROM orders WHERE o_orderkey % 3 = 1
      |)
      |SELECT k, ck, total_c FROM c
      |WHERE k >= 1000 AND k < 3000 ORDER BY k""".stripMargin
  ) { (s, dir) =>
    val o = graft.rel.Tables.orders(s, dir)
      .filter(col("o_orderkey") % 3 === 1)
      .select(col("o_orderkey").cast("long").as("k"),
        col("o_custkey").cast("long").as("ck"),
        round(col("o_totalprice") * 100).cast("long").as("total_c"))
    val t = sliceTable(s, "graft-pr-", "ord_pr",
      "k BIGINT, ck BIGINT, total_c BIGINT",
      Map("write.clustered-by" -> "k",
        "write.clustered-by.files" -> "8"), o)
    val pruned = t.readWhere(col("k") >= 1000L && col("k") < 3000L)
    require(pruned.inputFiles.length < t.read().inputFiles.length,
      "the band predicate must prune files on a range-clustered table")
    pruned.orderBy("k")
  }

  /** D8 equality-delete flavor (content=2): rows masked by key tuples,
    * no position capture needed — the write is O(|keys|), all masking
    * cost moves to the read-side anti-join. */
  /** Equality delete ORACLED (r16 — converted from the 3-row demo
    * walk, whose shape GraftTableSpec keeps pinning): the production
    * form — delete KEYS arrive as a DATASET (every custkey an orders
    * slice references), masking rows by key equality without knowing
    * positions. DuckDB replays the mask as an anti-join. */
  private val equalityDelete = Q(
    "q_lake_equality_delete",
    """WITH c AS (
      |  SELECT c_custkey AS k, c_name AS nm,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
      |  FROM customer WHERE c_custkey % 4 = 1
      |), gone AS (
      |  SELECT DISTINCT o_custkey AS k FROM orders
      |  WHERE o_orderkey % 50 = 0
      |)
      |SELECT c.k, c.nm, c.bal_c
      |FROM c LEFT JOIN gone ON c.k = gone.k
      |WHERE gone.k IS NULL ORDER BY c.k""".stripMargin
  ) { (s, dir) =>
    val cust = graft.rel.Tables.customer(s, dir)
      .filter(col("c_custkey") % 4 === 1)
      .select(col("c_custkey").cast("long").as("k"),
        col("c_name").as("nm"),
        round(col("c_acctbal") * 100).cast("long").as("bal_c"))
    val t = sliceTable(s, "graft-eq-", "cust_eq",
      "k BIGINT, nm STRING, bal_c BIGINT", Map.empty, cust)
    // no .distinct() here — equalityDelete distincts its keys itself
    t.equalityDelete(graft.rel.Tables.orders(s, dir)
      .filter(col("o_orderkey") % 50 === 0)
      .select(col("o_custkey").cast("long").as("k")))
    t.read().orderBy("k")
  }

  /** Scratch graft table over a testdata slice — the shared setup of
    * the oracled lifecycle walks (r16): fresh single-table warehouse,
    * `default` namespace, schema from `ddl`, `df` appended as the
    * first commit. */
  private def sliceTable(s: SparkSession, prefix: String, name: String,
      ddl: String, props: Map[String, String],
      df: DataFrame): GraftTable = {
    val cat = new GraftCatalog(s, graft.ScratchDirs.create(prefix))
    cat.createNamespace("default")
    val t = cat.createTable("default", name,
      StructType.fromDDL(ddl), props)
    t.append(df)
    t
  }

  private def ensureSqlCatalog(s: SparkSession): Unit =
    if (!s.conf.getOption("spark.sql.catalog.graft").exists(_.nonEmpty)) {
      s.conf.set("spark.sql.catalog.graft",
        "graft.lake.sql.GraftSqlCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse",
        graft.ScratchDirs.create("graft-sqlwh-").toString)
    }

  /** The demo lifecycle driven ENTIRELY through spark.sql — the
    * reference's real UX (demo.py:67-262): DDL + INSERT + MOR DELETE +
    * COW UPDATE through the DataSourceV2 catalog, result identical to
    * q_lake_lifecycle's Scala-API walk. */
  private val sqlLifecycle = Q.noOracle("q_lake_sql_lifecycle") { (s, _) =>
    ensureSqlCatalog(s)
    val ns = s"sqlns_${System.nanoTime()}"
    s.sql(s"CREATE NAMESPACE graft.$ns")
    val tbl = s"graft.$ns.pii_data"
    s.sql(
      s"""CREATE TABLE $tbl (
         |  case_id STRING, first_name STRING, email_address STRING,
         |  key_nm STRING, secure_txt STRING, secure_key STRING,
         |  update_date DATE)
         |USING graft TBLPROPERTIES (
         |  'write.delete.mode'='merge-on-read',
         |  'write.update.mode'='copy-on-write')""".stripMargin)
    s.sql(
      s"""INSERT INTO $tbl VALUES
         |('case-1','John','john.doe@example.com','key1','secret text 1','secret_key_1',DATE'2023-01-01'),
         |('case-2','Jane','jane.roe@example.com','key2','secret text 2','secret_key_2',DATE'2023-01-02'),
         |('case-3','Alice','alice@example.com','key3','secret text 3','secret_key_3',DATE'2023-01-03')""".stripMargin)
    s.sql(s"DELETE FROM $tbl WHERE case_id = 'case-2'")
    s.sql(s"UPDATE $tbl SET first_name = NULL, email_address = NULL, " +
      "secure_txt = NULL WHERE case_id = 'case-1'")
    s.sql(s"SELECT * FROM $tbl ORDER BY case_id")
  }

  /** D32 metadata version retention as a driver-visible query: with
    * delete-after-commit enabled and previous-versions-max=2, six
    * commits leave exactly 3 version files (current + 2 previous) and
    * a log trimmed to match, while history and reads stay complete.
    * Emits one row per observation with deterministic values. */
  private val metadataRetention =
    Q.noOracle("q_lake_metadata_retention") { (s, _) =>
      import s.implicits._
      val cat = new GraftCatalog(s, graft.ScratchDirs.create("graft-wh-"))
      cat.createNamespace("default")
      val t = cat.createTable("default", "pii_data", piiSchema,
        Map("write.delete.mode" -> "merge-on-read",
          "write.metadata.delete-after-commit.enabled" -> "true",
          "write.metadata.previous-versions-max" -> "2"))
      t.append(s.createDataFrame(seedRows.asJava, piiSchema))
      val early = t.currentSnapshot.get.snapshotId
      (1 to 4).foreach(i => t.append(s.createDataFrame(Seq(
        Row(s"case-x$i", s"N$i", s"n$i@example.com", s"k$i", s"s$i",
          s"sk$i", java.sql.Date.valueOf("2024-01-01"))).asJava,
        piiSchema)))
      t.delete(col("case_id") === "case-2")
      val versionFiles = Io.listRecursive(t.root.resolve("metadata"))
        .map(_.getFileName.toString)
        .count(_.matches("v\\d+\\.metadata\\.json"))
      Seq(
        ("version_files_on_disk", versionFiles.toLong),
        ("metadata_log_entries", t.metadataLogEntries.count()),
        ("history_commits", t.history.count()),
        ("live_rows", t.read().count()),
        ("rows_at_earliest_snapshot", t.readAt(early).count()))
        .toDF("observation", "value").orderBy("observation")
    }

  /** Schema evolution as a driver-visible query: RENAME COLUMN is
    * metadata-only (physical names stay on the files), ALTER COLUMN
    * TYPE widens int→long in place, and reads span files written
    * before and after both changes. Deterministic rows; no-oracle
    * (runtime temp catalog), semantics pinned by GraftSqlSpec. */
  private val schemaEvolution = Q.noOracle("q_lake_schema_evolution") { (s, _) =>
    ensureSqlCatalog(s)
    val ns = s"sqlns_${System.nanoTime()}"
    s.sql(s"CREATE NAMESPACE graft.$ns")
    val tbl = s"graft.$ns.evo"
    s.sql(s"CREATE TABLE $tbl (id INT, label STRING) USING graft")
    s.sql(s"INSERT INTO $tbl VALUES (1, 'a'), (2, 'b')")
    s.sql(s"ALTER TABLE $tbl RENAME COLUMN label TO tag")
    s.sql(s"INSERT INTO $tbl VALUES (3, 'c')")
    s.sql(s"ALTER TABLE $tbl ALTER COLUMN id TYPE BIGINT")
    s.sql(s"INSERT INTO $tbl VALUES (${Int.MaxValue.toLong + 5}, 'big')")
    s.sql(s"UPDATE $tbl SET tag = 'z' WHERE id = 1")
    s.sql(s"SELECT id, tag FROM $tbl ORDER BY id")
  }

  /** MERGE INTO oracled (r17, closing the r16 verdict's #2): the
    * reference's two-pass merge LIFECYCLE — an upsert merge (`WHEN
    * MATCHED THEN UPDATE / WHEN NOT MATCHED THEN INSERT`) followed by
    * an erase merge (`WHEN MATCHED THEN DELETE`), the upsert-then-
    * forget flow its PII notebook runs — over a customer testdata
    * slice, with DuckDB replaying both passes as CTE set logic
    * (upsert = left-join coalesce ∪ anti-join inserts; erase = an
    * anti filter). Distinct from [[sqlMerge]]'s single three-verb
    * statement: here each verb lands as its OWN snapshot, pinned by
    * an in-builder require. All-integer cents so the hash check has
    * zero float tolerance. Scale shape: each merge is one
    * broadcast/shuffle join bounded to files whose key stats admit
    * source keys — never a full-table rewrite. */
  private val mergeUpsert = Q(
    "q_lake_merge",
    """WITH t0 AS (
      |  SELECT c_custkey AS k,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS acct_c,
      |    c_mktsegment AS seg
      |  FROM customer WHERE c_custkey % 3 IN (0, 1)
      |), src AS (
      |  SELECT c_custkey AS k,
      |    CAST(round(c_acctbal * 100) AS BIGINT) + 11 AS val,
      |    c_mktsegment AS seg
      |  FROM customer WHERE c_custkey % 3 IN (1, 2)
      |), m1 AS (
      |  SELECT t0.k,
      |    CASE WHEN src.k IS NOT NULL THEN src.val ELSE t0.acct_c END
      |      AS acct_c,
      |    t0.seg
      |  FROM t0 LEFT JOIN src ON t0.k = src.k
      |  UNION ALL
      |  SELECT src.k, src.val, src.seg
      |  FROM src LEFT JOIN t0 ON src.k = t0.k WHERE t0.k IS NULL
      |), m2 AS (
      |  SELECT * FROM m1 WHERE k % 7 <> 0
      |)
      |SELECT seg, CAST(sum(acct_c) AS BIGINT) AS sum_acct_c,
      |  count(*) AS n
      |FROM m2 GROUP BY seg ORDER BY seg""".stripMargin
  ) { (s, dir) =>
    ensureSqlCatalog(s)
    val ns = s"sqlns_${System.nanoTime()}"
    s.sql(s"CREATE NAMESPACE graft.$ns")
    val tbl = s"graft.$ns.cust_merge"
    s.sql(s"CREATE TABLE $tbl (k BIGINT, acct_c BIGINT, seg STRING) " +
      "USING graft")
    s.sql(
      s"""INSERT INTO $tbl
         |SELECT CAST(c_custkey AS BIGINT),
         |  CAST(round(c_acctbal * 100) AS BIGINT), c_mktsegment
         |FROM parquet.`$dir/customer.parquet`
         |WHERE c_custkey % 3 IN (0, 1)""".stripMargin)
    // pass 1 — upsert: overlapping keys (≡1 mod 3) update in place,
    // new keys (≡2 mod 3) insert
    s.sql(
      s"""MERGE INTO $tbl t
         |USING (
         |  SELECT CAST(c_custkey AS BIGINT) AS k,
         |    CAST(round(c_acctbal * 100) AS BIGINT) + 11 AS val,
         |    c_mktsegment AS seg
         |  FROM parquet.`$dir/customer.parquet`
         |  WHERE c_custkey % 3 IN (1, 2)) s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET acct_c = s.val
         |WHEN NOT MATCHED THEN INSERT (k, acct_c, seg)
         |  VALUES (s.k, s.val, s.seg)""".stripMargin)
    // pass 2 — erase: the forget-these-keys merge
    s.sql(
      s"""MERGE INTO $tbl t
         |USING (
         |  SELECT CAST(c_custkey AS BIGINT) AS k
         |  FROM parquet.`$dir/customer.parquet`
         |  WHERE c_custkey % 7 = 0) gone
         |ON t.k = gone.k
         |WHEN MATCHED THEN DELETE""".stripMargin)
    // each merge pass is its own snapshot on top of the load
    val snaps = s.sql(s"SELECT count(*) FROM graft.$ns.cust_merge" +
      ".snapshots").head.getLong(0)
    require(snaps == 3L, s"expected load + 2 merge snapshots, got $snaps")
    s.sql(
      s"""SELECT seg, CAST(sum(acct_c) AS BIGINT) AS sum_acct_c,
         |  count(*) AS n
         |FROM $tbl GROUP BY seg ORDER BY seg""".stripMargin)
  }

  /** Streaming ⇄ lake round trip as a driver-checkable query: a
    * GraftTable append stream (snapshot-id offsets) feeds an
    * exactly-once foreachBatch append sink into a second table; the
    * result is the sink table's final content — deterministic rows,
    * exercised end-to-end through a real StreamingQuery. */
  private val streamRoundTrip = Q.noOracle("q_lake_stream_roundtrip") { (s, _) =>
    import graft.streaming.GraftTableStreaming
    val wh = graft.ScratchDirs.create("graft-rt-wh-")
    val cat = new GraftCatalog(s, wh)
    cat.createNamespace("default")
    val src = cat.createTable("default", "src", piiSchema)
    val dst = cat.createTable("default", "dst", piiSchema)
    src.append(s.createDataFrame(seedRows.asJava, piiSchema))
    val q = GraftTableStreaming.appendSink(
      GraftTableStreaming.readAppends(s, src.root), dst, "q_rt")
      .option("checkpointLocation",
        graft.ScratchDirs.create("graft-rt-ck-").toString)
      .start()
    try {
      q.processAllAvailable()
      // second append streams through incrementally
      src.append(s.createDataFrame(Seq(
        Row("case-4", "Dana", "dana@example.com", "key4", "s4", "sk4",
          java.sql.Date.valueOf("2023-02-01"))).asJava, piiSchema))
      q.processAllAvailable()
    } finally q.stop()
    dst.read().orderBy("case_id")
  }

  /** Streaming UPSERT sink (CDC apply): a change feed — upserts plus
    * tombstones — streams into a graft table through
    * [[graft.streaming.GraftTableStreaming.upsertSink]], ONE RowDelta
    * commit per micro-batch (equality-delete masks older versions of
    * every touched key, tombstoned keys vanish, the window's rows
    * land). The Flink-upsert-writer / Iceberg-RowDelta pattern a CDC
    * consumer runs at 100 TB: commit cost per WINDOW, not per key.
    * In-query requires: final state equals the fold of the feed,
    * exactly one snapshot per non-empty window, and a crash-replayed
    * epoch is a no-op (exactly-once). */
  private val streamUpsert = Q.noOracle("q_lake_stream_upsert") { (s, _) =>
    import graft.streaming.GraftTableStreaming
    val feedSchema = StructType.fromDDL("k STRING, v STRING, op STRING")
    val tblSchema = StructType.fromDDL("k STRING, v STRING")
    val wh = graft.ScratchDirs.create("graft-ups-wh-")
    val cat = new GraftCatalog(s, wh)
    cat.createNamespace("default")
    val feed = cat.createTable("default", "feed", feedSchema)
    val dst = cat.createTable("default", "dst", tblSchema)
    def rows(r: (String, String, String)*): DataFrame =
      s.createDataFrame(r.map { case (k, v, op) =>
        Row(k, v, op) }.asJava, feedSchema)
    feed.append(rows(("a", "1", "U"), ("b", "2", "U"), ("c", "3", "U")))
    val in = GraftTableStreaming.readAppends(s, feed.root)
      .withColumn("_del", col("op") === "D").drop("op")
    val q = GraftTableStreaming.upsertSink(in, dst, "q_ups",
      Seq("k"), Some("_del"))
      .option("checkpointLocation",
        graft.ScratchDirs.create("graft-ups-ck-").toString)
      .start()
    try {
      q.processAllAvailable()
      // window 2: update a, tombstone b, insert d
      feed.append(rows(("a", "9", "U"), ("b", "", "D"), ("d", "4", "U")))
      q.processAllAvailable()
    } finally q.stop()
    val got = dst.read().orderBy("k").collect().toSeq
    require(got == Seq(Row("a", "9"), Row("c", "3"), Row("d", "4")),
      s"upsert fold diverged: $got")
    val snaps = dst.meta.snapshots.size
    require(snaps == 2, s"one commit per window, got $snaps")
    // crash replay: re-deliver epoch 0 — the sink must skip it
    GraftTableStreaming.upsertBatch(dst, "q_ups", Seq("k"), Some("_del"))(
      rows(("z", "666", "U")).withColumn("_del", col("op") === "D")
        .drop("op"), 0L)
    require(dst.meta.snapshots.size == snaps &&
      dst.read().filter(col("k") === "z").count() == 0L,
      "replayed epoch must be a no-op")
    dst.read().orderBy("k")
  }

  /** CDC ORACLED (r16 — upgraded from the demo-walk spec to a DuckDB
    * hash check, per the r15 verdict's "shrink the no-oracle set"
    * item): three staged deterministic commits over lineitem slices —
    * insert slice A, MOR-delete a predicate subset, insert slice B —
    * read back as insert/delete row events (Iceberg
    * create_changelog_view semantics). DuckDB replays the windows as
    * plain set logic: window 0 inserts = A, window 1 deletes = the
    * predicate subset of A, window 2 inserts = B. The demo-walk CDC
    * shapes (COW update pairs, update images, carryover cancellation)
    * stay pinned by q_lake_changelog_updates and
    * q_lake_stream_changes. */
  private val changelog = Q(
    "q_lake_changelog",
    """WITH a AS (
      |  SELECT l_orderkey AS okey, l_linenumber AS lnum,
      |    CAST(round(l_quantity * 100) AS BIGINT) AS qty_c
      |  FROM lineitem WHERE l_orderkey % 6 = 1
      |), b AS (
      |  SELECT l_orderkey AS okey, l_linenumber AS lnum,
      |    CAST(round(l_quantity * 100) AS BIGINT) AS qty_c
      |  FROM lineitem WHERE l_orderkey % 6 = 2
      |), ev AS (
      |  SELECT okey, lnum, qty_c, 'insert' AS _change_type,
      |    0 AS _change_ordinal FROM a
      |  UNION ALL
      |  SELECT okey, lnum, qty_c, 'delete', 1 FROM a WHERE qty_c < 1000
      |  UNION ALL
      |  SELECT okey, lnum, qty_c, 'insert', 2 FROM b
      |)
      |SELECT CAST(okey AS BIGINT) AS okey, CAST(lnum AS BIGINT) AS lnum,
      |  qty_c, _change_type,
      |  CAST(_change_ordinal AS INT) AS _change_ordinal
      |FROM ev ORDER BY _change_ordinal, okey, lnum, qty_c""".stripMargin
  ) { (outer, dir) =>
    // driver-gap-dominated bounded walk (r17 LakeJobProfile) —
    // AQE-off 2-partition private session; result oracle-unchanged
    val s = LakeQueries.tunedSession(outer)
    val li = graft.rel.Tables.lineitem(s, dir)
      .select(col("l_orderkey").cast("long").as("okey"),
        col("l_linenumber").cast("long").as("lnum"),
        round(col("l_quantity") * 100).cast("long").as("qty_c"))
    val t = sliceTable(s, "graft-cdc-", "cdc_li",
      "okey BIGINT, lnum BIGINT, qty_c BIGINT",
      Map("write.delete.mode" -> "merge-on-read"),
      li.filter(col("okey") % 6 === 1))
    t.delete(col("qty_c") < 1000L)
    t.append(li.filter(col("okey") % 6 === 2))
    t.changes()
      .select(col("okey"), col("lnum"), col("qty_c"),
        col("_change_type"), col("_change_ordinal"))
      // (okey, lnum) is NOT unique in the synthetic corpus — qty_c
      // completes the total order the hash compare needs
      .orderBy("_change_ordinal", "okey", "lnum", "qty_c")
  }

  /** CDC with UPDATE IMAGES — the same demo walk read through
    * `changelogView(identifier_columns => case_id)` (Iceberg
    * `create_changelog_view(compute_updates => true)`): the COW
    * nullify's carried case-3 delete+insert pair cancels, and its
    * case-1 delete+insert pair folds into update_before/update_after
    * — the re-pair-by-hand work a production UPSERT consumer
    * otherwise does on every COW commit. In-query requires prove the
    * raw changelog DID carry case-3 rows in the update window (so the
    * cancellation is real), that the update images carry the right
    * before/after values, and that no carryover survives. */
  private val changelogUpdates =
    Q.noOracle("q_lake_changelog_updates") { (outer, _) =>
      // driver-gap-dominated fixed walk (r17 LakeJobProfile: 21 jobs,
      // 1.3 s compute, 1.9 s gap) — AQE-off 2-partition private session
      val s = LakeQueries.tunedSession(outer)
      val t = newTable(s)
      t.delete(col("case_id") === "case-2")
      t.update(col("case_id") === "case-1",
        Map("first_name" -> lit(null), "email_address" -> lit(null),
          "secure_txt" -> lit(null)))
      val raw = t.changes()
      // the COW rewrite window (last ordinal) re-emits carried case-3
      val lastOrd = 2
      require(raw.filter(col("_change_ordinal") === lastOrd &&
        col("case_id") === "case-3").count() == 2,
        "raw changelog must carry case-3 delete+insert in the COW window")
      val view = t.changelogView(Seq("case_id"))
      val updWindow = view.filter(col("_change_ordinal") === lastOrd)
        .select("case_id", "_change_type", "email_address")
        .collect().sortBy(_.getString(1))
      require(updWindow.length == 2 &&
        updWindow.forall(_.getString(0) == "case-1"),
        "update window must hold exactly the case-1 image pair, got " +
          updWindow.mkString("; "))
      require(updWindow(0).getString(1) == "update_after" &&
        updWindow(0).isNullAt(2),
        "update_after must carry the nullified email")
      require(updWindow(1).getString(1) == "update_before" &&
        updWindow(1).getString(2) == "john.doe@example.com",
        "update_before must carry the pre-image email")
      view
        .select(col("case_id"), col("first_name"),
          col("email_address").isNull.as("email_nulled"),
          col("_change_type"), col("_change_ordinal"))
        .orderBy("_change_ordinal", "_change_type", "case_id")
    }

  /** Streaming CDC: the changelog walk of q_lake_changelog consumed
    * through a live graft-changes stream — micro-batch offsets are
    * main-head snapshot ids, each batch plans only the files its
    * commits touched. Returns the streamed insert/delete events
    * (deterministic columns; snapshot ids and the range-relative
    * ordinal projected away), which StreamingSpec proves equal the
    * batch changelog event-for-event. */
  private val streamChanges = Q.noOracle("q_lake_stream_changes") { (outer, _) =>
    // driver-gap-dominated bounded walk (r17 LakeJobProfile) —
    // AQE-off 2-partition private session; result oracle-unchanged
    val s = LakeQueries.tunedSession(outer)
    import graft.streaming.GraftTableStreaming
    val t = newTable(s)
    val mem = s"cdc_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val q = GraftTableStreaming.readChanges(s, t.root)
      .writeStream.format("memory").queryName(mem).start()
    try {
      q.processAllAvailable()
      t.delete(col("case_id") === "case-2")
      q.processAllAvailable()
      t.update(col("case_id") === "case-1",
        Map("first_name" -> lit(null), "email_address" -> lit(null),
          "secure_txt" -> lit(null)))
      q.processAllAvailable()
      val rows = s.table(mem)
        .select(col("case_id"), col("first_name"), col("_change_type"))
        .collect().toSeq
      s.createDataFrame(rows.asJava, s.table(mem)
        .select(col("case_id"), col("first_name"), col("_change_type"))
        .schema)
        .orderBy("_change_type", "case_id", "first_name")
    } finally {
      q.stop()
      s.catalog.dropTempView(mem)
    }
  }

  /** `<t>.partitions` clustering summary: a range-clustered table's
    * layout — one row per clustered key range with file/row counts
    * (sizes projected away: byte counts vary with the writer). The
    * SHOW PARTITIONS answer for a format that clusters by sorted
    * range instead of partition tuple. */
  private val partitionsRel = Q.noOracle("q_lake_partitions") { (s, _) =>
    val cat = new GraftCatalog(s, graft.ScratchDirs.create("graft-wh-"))
    cat.createNamespace("default")
    // partition-transform clustering: file ranges render in the
    // TRANSFORMED spaces (days → dates, truncate → prefixes)
    val t = cat.createTable("default", "clustered", piiSchema,
      Map("write.clustered-by" -> "days(update_date),truncate(4,case_id)",
        "write.clustered-by.files" -> "2"))
    t.append(s.createDataFrame(seedRows.asJava, piiSchema))
    t.partitionsTable.select("cluster_columns", "range_min", "range_max",
      "file_count", "record_count")
  }

  /** D24/D25: write-audit-publish — stage an append and a COW delete
    * on a branch (main untouched), audit via the branch read, publish
    * with fastForward. Returns (phase, case_id) rows proving main
    * only moved at publish time. */
  private val wap = Q.noOracle("q_lake_wap") { (outer, _) =>
    // driver-gap-dominated fixed walk (r17: 15 jobs, 0.5 s compute,
    // 1.4 s gap) — AQE-off 2-partition private session
    val s = LakeQueries.tunedSession(outer)
    import s.implicits._
    val t = newTable(s)
    t.createBranch("staging")
    t.appendToBranch("staging", s.createDataFrame(Seq(
      Row("case-4", "Eve", "eve@example.com", "key4", "secret text 4",
        "secret_key_4", java.sql.Date.valueOf("2023-02-01"))).asJava,
      piiSchema))
    t.deleteOnBranch("staging", col("case_id") === "case-2")
    val staged = t.readRef("staging").select("case_id")
      .as[String].collect().sorted.map(("staged", _))
    val mainBefore = t.read().select("case_id")
      .as[String].collect().sorted.map(("main-before-publish", _))
    t.fastForward("main", t.refSnapshotId("staging"))
    val mainAfter = t.read().select("case_id")
      .as[String].collect().sorted.map(("main-after-publish", _))
    // second audit cycle driven ONLY by the spark.wap.branch session
    // conf (Iceberg WAP contract): plain append/delete/read route to
    // the branch, which is auto-created on first write
    s.conf.set("spark.wap.branch", "audit2")
    val (confStaged, confMain) = try {
      t.append(s.createDataFrame(Seq(
        Row("case-5", "Gil", "gil@example.com", "key5", "secret text 5",
          "secret_key_5", java.sql.Date.valueOf("2024-02-01"))).asJava,
        piiSchema))
      t.delete(col("case_id") === "case-1")
      (t.read().select("case_id")
        .as[String].collect().sorted.map(("conf-staged", _)),
       // "main" is the implicit current-snapshot pointer, not a named
       // ref — read it directly to show it is untouched mid-audit
       t.readAt(t.currentSnapshot.get.snapshotId).select("case_id")
        .as[String].collect().sorted.map(("conf-main-unpublished", _)))
    } finally s.conf.unset("spark.wap.branch")
    t.fastForward("main", t.refSnapshotId("audit2"))
    val confAfter = t.read().select("case_id")
      .as[String].collect().sorted.map(("conf-after-publish", _))
    (mainBefore ++ staged ++ mainAfter ++ confStaged ++ confMain ++
      confAfter).toSeq
      .toDF("phase", "case_id").orderBy("phase", "case_id")
  }

  /** Snapshot-management trio — the UNDO half of the permanent-delete
    * story the reference demos (demo.py:289-296 shows only expiry;
    * Iceberg core pairs expiry with rollback): `rollback_to_snapshot`
    * walks the pointer back to an ancestor (a MOR delete is undone —
    * the forensic point: nothing is gone until expire+rewrite),
    * `set_current_snapshot` jumps it FORWARD again (the redo rollback
    * refuses), and `cherrypick_snapshot` replays ONE staged branch
    * commit onto main as a new commit — the surgical alternative to
    * fastForward when a WAP branch holds more than one audited change.
    * Phases prove the visible row set at every step; all pointer moves
    * are metadata-only commits (zero jobs). GraftSqlSpec drives the
    * same trio through CALL procedures; GraftTablePropSpec pins that
    * rollback can never resurrect PII once erase+expire ran. */
  private val rollback = Q.noOracle("q_lake_rollback") { (s, _) =>
    import s.implicits._
    val t = newTable(s)
    val s0 = t.currentSnapshot.get.snapshotId
    t.delete(col("case_id") === "case-2")
    val s1 = t.currentSnapshot.get.snapshotId
    def phase(name: String): Array[(String, String)] =
      t.read().select("case_id").as[String].collect().sorted
        .map((name, _))
    val afterDelete = phase("1-after-delete")
    t.rollbackTo(s0) // the MOR delete is undone by a pointer move
    val afterRollback = phase("2-after-rollback")
    t.setCurrentSnapshot(s1) // redo: the forward jump rollback refuses
    val afterRedo = phase("3-after-set-current")
    t.createBranch("wap")
    t.appendToBranch("wap", s.createDataFrame(Seq(
      Row("case-4", "Eve", "eve@example.com", "key4", "secret text 4",
        "secret_key_4", java.sql.Date.valueOf("2023-02-01"))).asJava,
      piiSchema))
    val beforePick = phase("4-main-before-pick")
    t.cherrypickSnapshot(t.refSnapshotId("wap"))
    val afterPick = phase("5-after-cherrypick")
    (afterDelete ++ afterRollback ++ afterRedo ++ beforePick ++
      afterPick).toSeq
      .toDF("phase", "case_id").orderBy("phase", "case_id")
  }

  /** CDC-driven incremental aggregate maintenance — the canonical
    * 100 TB consumer of the changelog: a downstream per-group
    * (count, sum) is kept current by folding each commit window's
    * change rows with signed weights (+1 insert, −1 delete) instead
    * of re-scanning the fact table. The non-net changelog makes this
    * robust for free: a COW rewrite emits delete+insert for every
    * carried row (net zero under signed aggregation), compaction
    * emits nothing, MOR/equality deletes emit exactly the masked
    * rows. Window deltas partial-aggregate map-side; the state merge
    * is a union + re-agg keyed by group — cost bounded by GROUP
    * cardinality, not fact-table size. Each window cross-checks the
    * incremental state against a full recompute and fails loudly on
    * divergence (the maintenance LAW: maintained ≡ recomputed), and
    * the FINAL maintained state is the emitted result — DuckDB
    * replays the three windows' net effect as plain filters over the
    * lineitem slice and hash-checks it (r17, closing the r16
    * verdict's #3: the law now rests on an oracle, not only on the
    * in-query requires).
    */
  private val incrementalAgg = Q(
    "q_lake_incremental_agg",
    """WITH f AS (
      |  SELECT l_returnflag AS grp,
      |    CAST(round(l_quantity * 100) AS BIGINT) AS amount,
      |    CAST(round(l_discount * 100) AS BIGINT) AS disc_c
      |  FROM lineitem WHERE l_orderkey % 4 IN (0, 1)
      |), k1 AS (
      |  SELECT * FROM f WHERE disc_c < 9
      |), k2 AS (
      |  SELECT grp,
      |    CASE WHEN disc_c = 0 THEN amount + 100 ELSE amount END
      |      AS amount
      |  FROM k1 WHERE grp <> 'R'
      |)
      |SELECT grp, count(*) AS cnt, CAST(sum(amount) AS BIGINT) AS total
      |FROM k2 GROUP BY grp ORDER BY grp""".stripMargin
  ) { (outer, dir) =>
    // the walk's shuffle BYTES are group-bounded (state is one row
    // per grp after map-side partial agg; DML hit discovery is
    // file-bounded) even though the ingest windows are corpus slices
    // — AQE has nothing to adapt, and its per-stage re-planning cost
    // 2.7 s of driver gap across 32 tiny jobs (LakeJobProfile, r17)
    incrementalAggWalk(LakeQueries.tunedSession(outer), dir,
      crossCheck = false)
  }

  /** The q_lake_incremental_agg scenario. `crossCheck = true` (the
    * spec run) additionally recomputes the aggregate directly over the
    * table after EVERY window and requires equality with the
    * maintained state — kept out of the bench path (r17, the
    * invertedIndexScenario precedent): the final state is now
    * DuckDB-hash-checked, so the per-window full recompute tripled the
    * walk's fact scans + collects for a law the spec pins on every
    * `sbt test`. */
  private[graft] def incrementalAggWalk(s: SparkSession, dir: String,
      crossCheck: Boolean): DataFrame = {
      val factSchema = StructType.fromDDL(
        "grp STRING, amount BIGINT, disc_c BIGINT")
      val cat = new GraftCatalog(s, graft.ScratchDirs.create("graft-wh-"))
      cat.createNamespace("default")
      val t = cat.createTable("default", "fact", factSchema,
        Map("write.delete.mode" -> "merge-on-read"))
      def slice(rem: Int): DataFrame =
        graft.rel.Tables.lineitem(s, dir)
          .filter(col("l_orderkey") % 4 === rem)
          .select(col("l_returnflag").as("grp"),
            expr("cast(round(l_quantity * 100) as bigint)")
              .as("amount"),
            expr("cast(round(l_discount * 100) as bigint)")
              .as("disc_c"))
      val empty = s.createDataFrame(
        java.util.Collections.emptyList[Row](),
        StructType.fromDDL("grp STRING, cnt BIGINT, total BIGINT"))
      var state = empty
      var from: Option[Long] = None
      def advance(phase: String): Unit = {
        val head = t.currentSnapshot.get.snapshotId
        val delta = t.changes(from, Some(head))
          .select(col("grp"),
            when(col("_change_type") === "insert", lit(1L))
              .otherwise(lit(-1L)).as("cnt"),
            when(col("_change_type") === "insert", col("amount"))
              .otherwise(-col("amount")).as("total"))
        state = state.unionByName(delta)
          .groupBy("grp")
          .agg(sum("cnt").as("cnt"), sum("total").as("total"))
          .filter(col("cnt") > 0)
          .localCheckpoint() // pin: later windows fold onto THIS state
        from = Some(head)
        if (crossCheck) {
          val incr = state.collect()
            .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
            .sorted
          val full = t.read().groupBy("grp")
            .agg(count(lit(1)).as("cnt"), sum("amount").as("total"))
            .collect()
            .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
            .sorted
          require(incr.sameElements(full),
            s"incremental state diverged at $phase: " +
              s"incr=${incr.toSeq} full=${full.toSeq}")
        }
      }
      t.append(slice(0))
      advance("w1-seed")
      t.append(slice(1))
      t.delete(col("disc_c") >= 9) // MOR position deletes
      advance("w2-append-delete")
      t.update(col("disc_c") === 0, // COW rewrite: delete+insert pairs
        Map("amount" -> (col("amount") + lit(100L))))
      t.rewriteDataFiles() // compaction: must contribute NOTHING
      t.delete(col("grp") === "R") // drops one group entirely
      advance("w3-update-compact-drop")
      // the MAINTAINED state is the answer — the oracle recomputes it
      // from the parquet slice with plain set logic
      state.select(col("grp"), col("cnt"),
        col("total").cast("long").as("total")).orderBy("grp")
    }

  /** CDC-driven incremental MinHash maintenance — how a 100 TB
    * training-data pipeline keeps its dedup index current: per-doc
    * MinHash signatures are UPSERTED from each commit window's change
    * rows (signatures recomputed only for changed docs, map-side over
    * the window), never by rescanning the corpus. The non-net
    * changelog needs one rule: the LAST change per doc in the window
    * wins, with insert beating delete at the same ordinal (a COW
    * rewrite emits delete+insert at one ordinal for carried rows);
    * compaction emits nothing and must leave the state untouched.
    * Each window cross-checks the maintained state against a full
    * recompute and fails loudly on divergence; emitted rows are the
    * per-window signature table. */
  /** 4 md5-derived MinHashes over trigram shingles — the signature
    * table maintained by [[foldSigDelta]]. */
  private[graft] def minhashSigs(docs: DataFrame): DataFrame = {
    val dt = graft.llm.DedupQueries.shingleSets(docs)
    val hashCols = (0 until 4).map(i =>
      min(conv(substring(md5(concat(lit(i.toString), col("sh"))),
        1, 15), 16, 10).cast("bigint")).as(s"h$i"))
    dt.groupBy("doc_id").agg(hashCols.head, hashCols.tail: _*)
  }

  /** Fold one changelog window (batch `changes()` slice OR a
    * graft-changes micro-batch — same columns) into a signature
    * state: last change per doc wins, insert beats delete at one
    * ordinal (COW rewrites emit both for carried rows). Signatures
    * are recomputed only for the window's upserted docs, map-side. */
  private[graft] def foldSigDelta(state: DataFrame,
      delta: DataFrame): DataFrame = {
    val last = delta
      .groupBy("doc_id")
      .agg(max(struct(col("_change_ordinal"),
        (col("_change_type") === "insert").cast("int").as("is_ins"),
        col("text"))).as("m"))
      .select(col("doc_id"), col("m.is_ins").as("is_ins"),
        col("m.text").as("text"))
    val changed = last.select("doc_id")
    val upserts = last.filter(col("is_ins") === 1).select("doc_id", "text")
    state.join(changed, Seq("doc_id"), "left_anti")
      .unionByName(minhashSigs(upserts))
      .localCheckpoint() // pin: later windows fold onto THIS state
  }

  private val incrementalMinhash =
    Q.noOracle("q_lake_incremental_minhash") { (outer, _) =>
      // fixed 6-doc corpus: every frame is metadata-sized, so the
      // AQE-off 2-partition private session applies (r17)
      incrementalMinhashWalk(LakeQueries.tunedSession(outer),
        crossCheck = false)
    }

  /** The q_lake_incremental_minhash scenario. `crossCheck = true` (the
    * spec run) recomputes every window's signatures from the full
    * table and requires equality with the incrementally maintained
    * state — kept out of the bench path (r17, invertedIndexScenario
    * precedent): the full recompute re-ran the corpus-shingle
    * aggregation once per window for a law the spec pins on every
    * `sbt test`; the bench path exercises only the incremental
    * maintenance a 100 TB pipeline actually runs. */
  private[graft] def incrementalMinhashWalk(s: SparkSession,
      crossCheck: Boolean): DataFrame = {
      val docSchema = StructType.fromDDL("doc_id BIGINT, text STRING")
      def sigsOf(docs: DataFrame): DataFrame = minhashSigs(docs)
      val cat = new GraftCatalog(s, graft.ScratchDirs.create("graft-wh-"))
      cat.createNamespace("default")
      val t = cat.createTable("default", "docs", docSchema,
        Map("write.delete.mode" -> "merge-on-read",
          "write.update.mode" -> "copy-on-write"))
      def append(rows: (Long, String)*): Unit =
        t.append(s.createDataFrame(rows.map { case (i, x) =>
          Row(java.lang.Long.valueOf(i), x) }.asJava, docSchema))
      var state = sigsOf(s.createDataFrame(
        java.util.Collections.emptyList[Row](), docSchema))
      var from: Option[Long] = None
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, String)]
      def advance(phase: String): Unit = {
        val head = t.currentSnapshot.get.snapshotId
        state = foldSigDelta(state, t.changes(from, Some(head)))
        from = Some(head)
        val incr = state.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).sortBy(_._1)
        if (crossCheck) {
          val full = sigsOf(t.read()).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
              r.getLong(3), r.getLong(4))).sortBy(_._1)
          require(incr.sameElements(full),
            s"incremental signatures diverged at $phase: " +
              s"incr=${incr.toSeq} full=${full.toSeq}")
        }
        incr.foreach { case (id, h0, h1, h2, h3) =>
          out += ((phase, id, s"$h0-$h1-$h2-$h3")) }
      }
      append(1L -> "the quick brown fox jumps",
        2L -> "the quick brown fox leaps",
        3L -> "spark lake table format rocks",
        4L -> "completely different text entirely here")
      advance("w1-seed")
      append(5L -> "spark lake table format rules",
        6L -> "the quick brown fox jumps") // exact dup of doc 1
      t.delete(col("doc_id") === 4L) // MOR position delete
      advance("w2-append-delete")
      t.update(col("doc_id") === 3L,
        Map("text" -> lit("spark lake table format shines"))) // COW
      t.rewriteDataFiles() // compaction: must contribute NOTHING
      t.delete(col("doc_id") === 2L)
      advance("w3-update-compact-delete")
      import s.implicits._
      out.toSeq.toDF("phase", "doc_id", "sig")
        .orderBy("phase", "doc_id")
    }

  /** Streaming GDPR erasure — the reference's permanent-delete theme
    * (README.md:1-20, notebooks/iceberg_pii_deletion_demo.py) run as a
    * LIVE pipeline: erasure REQUESTS arrive as appends to a requests
    * table, and each micro-batch applies them to the PII table as
    * equality deletes (`erase_pii` is the batch twin). foreachBatch is
    * the canonical Spark sink for engine DML; checkpointed offsets
    * give at-least-once delivery, and equality deletes are idempotent
    * by construction (masking an already-masked key is a no-op), so
    * the composed sink is effectively exactly-once. StreamingSpec
    * proves the streamed end-state equals a one-shot batch equality
    * delete and that re-delivering a processed request wave leaves
    * the state byte-identical.
    */
  private val streamErasure = Q.noOracle("q_lake_stream_erasure") { (s, _) =>
    import graft.streaming.GraftTableStreaming
    val wh = graft.ScratchDirs.create("graft-er-wh-")
    val cat = new GraftCatalog(s, wh)
    cat.createNamespace("default")
    val pii = cat.createTable("default", "pii", piiSchema)
    pii.append(s.createDataFrame(seedRows.asJava, piiSchema))
    val reqSchema = StructType.fromDDL("case_id STRING")
    val req = cat.createTable("default", "erasure_requests", reqSchema)
    val q = GraftTableStreaming.readAppends(s, req.root)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        pii.equalityDelete(batch.select("case_id")); ()
      }
      .option("checkpointLocation",
        graft.ScratchDirs.create("graft-er-ck-").toString)
      .start()
    try {
      req.append(s.createDataFrame(Seq(Row("case-2")).asJava, reqSchema))
      q.processAllAvailable()
      // a later wave streams through incrementally
      req.append(s.createDataFrame(Seq(Row("case-1")).asJava, reqSchema))
      q.processAllAvailable()
    } finally q.stop()
    pii.read().orderBy("case_id")
  }

  /** KMV sketches STORED in a lake table and maintained incrementally —
    * the production shape behind SketchQueries' A17 operator: one row
    * per (slice, retained-hash), ≤ K rows per slice, upserted per
    * ingest window from the window's NEW keys only (KMV folding is
    * associative: k-smallest of old-sketch ∪ window-hashes). Distinct
    * questions — per slice AND across slices — are then answered from
    * the sketch table alone, never re-scanning facts; because the
    * sketch lives in a snapshot-versioned lake table, time travel
    * answers "distinct as of window 1" for free from K rows. KMV (like
    * all theta-family sketches) is insert-only — deletes require a
    * rebuild — so ingest here is append-only by design. Each window
    * cross-checks the sketch-table answers against a full recompute
    * bound (exact ride-along) and fails loudly if the estimate leaves
    * ±25%; emitted rows are the per-window report. */
  private val sketchRollup = Q.noOracle("q_lake_sketch_rollup") { (outer, _) =>
    // every frame here is sketch-sized (≤ K × slices rows; the fact
    // windows are a few hundred rows) — run on the AQE-off
    // 2-partition private session (r17; the quantile-rollup idiom:
    // LakeJobProfile read 46 jobs / 2.0 s compute / 2.5 s driver gap,
    // nearly all per-tiny-job AQE planning overhead)
    val s = LakeQueries.tunedSession(outer)
    import graft.rel.Kmv
    val K = 128
    val factSchema = StructType.fromDDL("slice STRING, key BIGINT")
    val skSchema = StructType.fromDDL("slice STRING, h BIGINT")
    val cat = new GraftCatalog(s, graft.ScratchDirs.create("graft-wh-"))
    cat.createNamespace("default")
    val fact = cat.createTable("default", "fact", factSchema)
    val sk = cat.createTable("default", "sketches", skSchema)
    def hashes(df: DataFrame): DataFrame =
      df.select(col("slice"), Kmv.hash60(col("key")).as("h"))
    def kSmallest(df: DataFrame, part: Seq[String]): DataFrame =
      Kmv.kSmallest(df, K, part)
    def estOf(df: DataFrame): Map[String, Long] = df
      .groupBy("slice")
      .agg(Kmv.thetaAggs(K).head, Kmv.thetaAggs(K).tail: _*)
      .select(col("slice"), Kmv.estimate(K).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ingest(rows: Seq[(String, Long)]): Unit = {
      import s.implicits._
      val w = rows.toDF("slice", "key")
      fact.append(w)
      // fold: k-smallest of stored sketch UNION window hashes
      sk.overwriteAll(kSmallest(
        sk.read().unionByName(hashes(w).distinct()).distinct(),
        Seq("slice")))
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long, Long)]
    def report(phase: String): Unit = {
      val stored = sk.read()
      // per-slice + ALL (k-smallest of the union of slice sketches =
      // the global sketch — the KMV merge law) from STORED rows only.
      // ONE estimate job over slices ∪ the merged-ALL sketch and ONE
      // exact job (per-slice counts ∪ the global distinct) — r17, the
      // quantile-rollup single-pass pattern; it was 4 driver actions
      // per report before (two estimate collects, two exact actions)
      val est = estOf(stored.unionByName(
        kSmallest(stored.select("h").distinct()
          .withColumn("slice", lit("ALL")).select("slice", "h"),
          Seq("slice"))))
      val dk = fact.read().select("slice", "key").distinct()
      val exact = dk
        .groupBy("slice").agg(count(lit(1)).as("n"))
        .unionByName(dk.select("key").distinct()
          .agg(count(lit(1)).as("n"))
          .withColumn("slice", lit("ALL")).select("slice", "n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      est.toSeq.sortBy(_._1).foreach { case (slice, e) =>
        val x = exact(slice)
        require(math.abs(e - x) * 4 <= x,
          s"$phase/$slice: sketch answer $e left ±25% of exact $x")
        out += ((phase, slice, e, x))
      }
    }
    ingest((1L to 500L).map(k => ("s1", k)) ++
      (301L to 800L).map(k => ("s2", k)))
    report("w1-seed")
    val w1Snap = sk.currentSnapshot.get.snapshotId
    ingest((501L to 900L).map(k => ("s1", k)) ++
      (701L to 1200L).map(k => ("s2", k)))
    report("w2-grow")
    // re-ingesting known keys must not move any sketch (set semantics)
    ingest((200L to 600L).map(k => ("s1", k)))
    report("w3-idempotent-refeed")
    Seq("s1", "s2", "ALL").foreach { sl =>
      def estAt(ph: String) =
        out.find(o => o._1 == ph && o._2 == sl).get._3
      require(estAt("w3-idempotent-refeed") == estAt("w2-grow"),
        s"refeed of known keys moved the $sl sketch")
    }
    // storability across time: window-1's answers re-derive from the
    // sketch table's OLD SNAPSHOT — K rows, no fact history needed
    val w1est = estOf(sk.readAt(w1Snap))
    Seq("s1", "s2").foreach { sl =>
      require(w1est(sl) == out.find(o => o._1 == "w1-seed" && o._2 == sl)
        .get._3, s"time-travel sketch answer drifted for $sl")
      out += (("w4-travel-to-w1", sl, w1est(sl), out.find(o =>
        o._1 == "w1-seed" && o._2 == sl).get._4))
    }
    import s.implicits._
    out.toSeq.toDF("phase", "scope", "est", "exact")
      .orderBy("phase", "scope")
  }

  /** D38: QUANTILE sketches stored in a graft table — the A20
    * mergeable bottom-K row sample as lake-resident state, completing
    * the lake sketch-rollup story (D34 stores KMV distinct sketches;
    * this stores the quantile sample the same way): ≤K rows per slice
    * of (slice, h, v), folded incrementally per ingest window
    * (k-smallest of stored ∪ window — the same closure), entries keyed
    * by md5(key) with a min-v tiebreak so refeeding known rows is a
    * no-op. Every report answers medians (per-slice AND ALL via the
    * merge law) from the SKETCH TABLE ONLY — the fact table could be
    * 100 TB of history; the quantile state a reader needs is K rows —
    * with an exact ride-along computed from the fact at test scale and
    * a rank-error guard (the reported median's true rank must sit
    * within ±15% of 0.5). Time travel re-derives window-1 medians from
    * the sketch table's old snapshot.
    *
    * ORACLED r17 (closing the r16 verdict's #8): the windows are
    * lineitem slices, so DuckDB replays every phase's sketch state as
    * phase-cumulative bottom-K set logic — the same integer
    * (v, h)-order-statistic law q_agg_quantile_sketch already pins —
    * and hash-checks all four phases' (n_retained, p50), including
    * the ALL rows built from the merge law and the time-travel
    * re-derivation. */
  /** Bottom-K retained per slice by the lake-resident quantile
    * sketch — shared between the builder and its DuckDB replay. */
  private val QRK = 128

  private val quantileRollup = Q(
    "q_lake_quantile_rollup",
    s"""WITH f AS (
      |  SELECT l_returnflag AS slice,
      |    l_orderkey * 10 + l_linenumber AS key,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
      |    l_orderkey % 16 AS w
      |  FROM lineitem WHERE l_orderkey % 16 IN (0, 1)
      |), hh AS (
      |  SELECT slice, w, CAST(concat('0x', substr(md5(concat(
      |    slice, ':', CAST(key AS VARCHAR))), 1, 15)) AS BIGINT) AS h, v
      |  FROM f
      |), ph AS (
      |  SELECT 'w1-seed' AS phase, slice, h, v FROM hh WHERE w = 0
      |  UNION ALL SELECT 'w2-grow', slice, h, v FROM hh
      |  UNION ALL SELECT 'w3-idempotent-refeed', slice, h, v FROM hh
      |  UNION ALL SELECT 'w4-travel-to-w1', slice, h, v FROM hh
      |    WHERE w = 0
      |), g AS (
      |  SELECT phase, slice, h, min(v) AS v
      |  FROM ph GROUP BY phase, slice, h
      |), rk AS (
      |  SELECT phase, slice, h, v, row_number() OVER (
      |    PARTITION BY phase, slice ORDER BY h) AS rk
      |  FROM g
      |), sk AS (
      |  SELECT phase, slice, h, v FROM rk WHERE rk <= $QRK
      |), mg AS (
      |  SELECT phase, h, min(v) AS v FROM sk
      |  WHERE phase <> 'w4-travel-to-w1' GROUP BY phase, h
      |), mrk AS (
      |  SELECT phase, h, v, row_number() OVER (
      |    PARTITION BY phase ORDER BY h) AS rk
      |  FROM mg
      |), un AS (
      |  SELECT * FROM sk
      |  UNION ALL SELECT phase, 'ALL' AS slice, h, v FROM mrk
      |  WHERE rk <= $QRK
      |), ord AS (
      |  SELECT phase, slice, v, row_number() OVER (
      |    PARTITION BY phase, slice ORDER BY v, h) AS rn,
      |    count(*) OVER (PARTITION BY phase, slice) AS m
      |  FROM un
      |)
      |SELECT phase, slice AS scope,
      |  CAST(max(m) AS BIGINT) AS n_retained,
      |  CAST(max(CASE WHEN rn = (m - 1) * 50 // 100 + 1 THEN v END)
      |    AS BIGINT) AS p50
      |FROM ord GROUP BY phase, slice
      |ORDER BY phase, scope""".stripMargin
  ) { (outer, dir) =>
    import graft.rel.Kmv
    // every frame here is sketch-sized (≤ K × slices rows): AQE's
    // per-stage materialization turns each tiny action into 3-4 jobs
    // whose ~60 ms driver-side planning gaps dominate the scenario
    // (LakeJobProfile: 40 jobs, 1.8 s compute, 2.5 s gap). Disable it
    // on a scenario-PRIVATE session (same SparkContext and extensions,
    // isolated SQL conf), so a query running concurrently on the
    // caller's session never executes under the overrides and no
    // restore is needed (r11 advice). The private session is CACHED
    // per caller: fresh-SessionState init costs ~0.9 s across this
    // walk's ~40 tiny jobs (measured sf0.1 A/B), so repeat runs — the
    // bench's min-of-N — must reuse the warmed one.
    val s = LakeQueries.tunedSession(outer)
    val K = QRK
    val factSchema = StructType.fromDDL(
      "slice STRING, key BIGINT, v BIGINT")
    val skSchema = StructType.fromDDL("slice STRING, h BIGINT, v BIGINT")
    val cat = new GraftCatalog(s, graft.ScratchDirs.create("graft-wh-"))
    cat.createNamespace("default")
    val fact = cat.createTable("default", "qfact", factSchema)
    val sk = cat.createTable("default", "qsketches", skSchema)
    def hashed(df: DataFrame): DataFrame = df
      // hash the (slice, key) ROW identity, not the bare key: slices
      // share key spaces, and a key-only hash would collapse
      // cross-slice rows in the ALL merge (a sample of distinct keys
      // instead of rows — measured 0.27 rank fraction for the median)
      .select(col("slice"),
        Kmv.hash60(concat_ws(":", col("slice"), col("key"))).as("h"),
        col("v"))
      .groupBy("slice", "h").agg(min("v").cast("long").as("v"))
    def fold(stored: DataFrame, window: DataFrame): DataFrame =
      Kmv.kSmallest(
        stored.unionByName(window)
          .groupBy("slice", "h").agg(min("v").cast("long").as("v")),
        K, Seq("slice"))
    def ingest(w: DataFrame): Unit = {
      fact.append(w)
      sk.overwriteAll(fold(sk.read(), hashed(w)))
    }
    // windows are LINEITEM slices so DuckDB can replay the walk:
    // slice = returnflag, row key = orderkey*10 + linenumber (unique:
    // linenumber ≤ 7), v = price cents — all integer, md5-hashed
    def window(pred: org.apache.spark.sql.Column): DataFrame =
      graft.rel.Tables.lineitem(s, dir).filter(pred)
        .select(col("l_returnflag").as("slice"),
          (col("l_orderkey") * 10 + col("l_linenumber"))
            .cast("long").as("key"),
          expr("cast(round(l_extendedprice * 100) as bigint)").as("v"))
    def medians(stored: DataFrame): Map[String, (Long, Long)] = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("slice")
      stored
        .withColumn("rn", row_number().over(w.orderBy("v", "h")))
        .withColumn("m", count(lit(1)).over(w))
        .filter(col("rn") === expr("(m - 1) * 50 div 100 + 1"))
        .select(col("slice"), col("m").cast("long"),
          col("v").cast("long"))
        .collect().map(r =>
          r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, Long, Long)]
    def report(phase: String, guard: Boolean = false): Unit = {
      val stored = sk.read()
      // per-slice + ALL — ALL merges the SLICE SKETCHES (merge law),
      // never the fact table
      // ONE medians job over slices ∪ the merged-ALL sketch (the ALL
      // kSmallest plans into the same pass)
      val est = medians(stored.unionByName(Kmv.kSmallest(
        stored.groupBy("h").agg(min("v").cast("long").as("v"))
          .withColumn("slice", lit("ALL"))
          .select("slice", "h", "v"),
        K, Seq("slice"))))
      // Rank-error guard — ONE aggregation job for every scope
      // (per-slice AND ALL): each row compares v against its slice's
      // sketch median (tiny map literal) and against the global one.
      // r17: the guard's fact scan runs on the FINAL window only —
      // every phase's (n_retained, p50) is now DuckDB-hash-checked,
      // so the in-builder scan is the test-scale ride-along for the
      // deepest state, not a per-window re-proof (which tripled the
      // walk's fact scans for numbers the oracle already pins).
      if (guard) {
        val sliceP50 = typedlit(est.collect {
          case (sl, (_, p)) if sl != "ALL" => sl -> p
        })
        val allP50 = est("ALL")._2
        val stats = fact.read().groupBy("slice", "key")
          .agg(min("v").as("v"))
          .groupBy("slice")
          .agg(count(lit(1)).as("n"),
            count(when(col("v") <= element_at(sliceP50, col("slice")),
              1)).as("below_own"),
            count(when(col("v") <= lit(allP50), 1)).as("below_all"))
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
        val allN = stats.values.map(_._1).sum
        val allBelow = stats.values.map(_._3).sum
        est.toSeq.sortBy(_._1).foreach { case (slice, (m, p50)) =>
          val (n, below) =
            if (slice == "ALL") (allN, allBelow)
            else (stats(slice)._1, stats(slice)._2)
          val frac = below.toDouble / n
          require(math.abs(frac - 0.5) < 0.15,
            s"$phase/$slice: sketch median $p50 has rank fraction $frac")
        }
      }
      est.toSeq.sortBy(_._1).foreach { case (slice, (m, p50)) =>
        out += ((phase, slice, m, p50))
      }
    }
    ingest(window(col("l_orderkey") % 16 === 0))
    report("w1-seed")
    val w1Snap = sk.currentSnapshot.get.snapshotId
    ingest(window(col("l_orderkey") % 16 === 1))
    report("w2-grow")
    // refeeding known (key, v) rows must not move any sketch
    ingest(window(col("l_orderkey") % 32 === 0))
    report("w3-idempotent-refeed", guard = true)
    out.collect { case ("w2-grow", sl, _, _) => sl }.foreach { sl =>
      def at(ph: String) =
        out.find(o => o._1 == ph && o._2 == sl).get
      require(at("w3-idempotent-refeed")._4 == at("w2-grow")._4 &&
        at("w3-idempotent-refeed")._3 == at("w2-grow")._3,
        s"refeed of known rows moved the $sl quantile sketch")
    }
    // storability: window-1 medians re-derive from the old snapshot
    val w1est = medians(sk.readAt(w1Snap))
    w1est.keys.toSeq.sorted.foreach { sl =>
      require(w1est(sl)._2 == out.find(o =>
        o._1 == "w1-seed" && o._2 == sl).get._4,
        s"time-travel quantile answer drifted for $sl")
      out += (("w4-travel-to-w1", sl, w1est(sl)._1, w1est(sl)._2))
    }
    // the report is local rows — surface it on the CALLER's session so
    // downstream writes run under the caller's conf, not the overrides
    import outer.implicits._
    out.toSeq.toDF("phase", "scope", "n_retained", "p50")
      .orderBy("phase", "scope")
  }

  /** Inverted index maintained in lake tables — the production
    * retrieval architecture behind q_text_bm25: postings
    * (doc_id, tok, tf) and doc lengths live in graft tables, serving
    * reads ONLY the index (query-term postings + stats; nothing
    * tokenizes at query time), and the index is maintained from the
    * corpus table's CDC windows — inserted docs tokenize map-side
    * (changed docs only), deleted docs drop their index rows via an
    * EQUALITY DELETE on doc_id (the engine's own DML doing the index
    * maintenance). Each window serves the fixed BM25 query from the
    * stored index and requires bit-identical scores vs a direct
    * corpus-scan BM25 — the associativity that makes index-serving
    * trustworthy. Emitted rows: the per-window top-5. */
  private val invertedIndex = Q.noOracle("q_lake_inverted_index") { (s, dir) =>
    invertedIndexScenario(s, dir, crossCheck = false)
  }

  /** The q_lake_inverted_index scenario. `crossCheck = true` (the
    * InvertedIndexSpec run) additionally recomputes BM25 directly over
    * the corpus table after the mixed window and requires bit-equality
    * with the index-served scores for EVERY doc — kept out of the
    * bench path because the recompute doubles the query's job count
    * for an invariant the spec pins on every `sbt test`. */
  private[lake] def invertedIndexScenario(
      outer: org.apache.spark.sql.SparkSession, dir: String,
      crossCheck: Boolean): DataFrame = {
    // bounded 500-doc corpus slice: postings/index frames are small
    // and the walk is many tiny actions — AQE-off 2-partition private
    // session (r17, the quantile-rollup idiom)
    val s = LakeQueries.tunedSession(outer)
    import graft.llm.TextQueries
    val docSchema = StructType.fromDDL("doc_id BIGINT, text STRING")
    val cat = new GraftCatalog(s, graft.ScratchDirs.create("graft-wh-"))
    cat.createNamespace("default")
    val corpus = cat.createTable("default", "corpus", docSchema,
      Map("write.delete.mode" -> "merge-on-read"))
    // the postings table is the WHOLE index: per-doc lengths (and so
    // N / avgdl) derive from it as sum(tf) per doc — one table, one
    // maintenance path, no second relation to keep consistent
    val postings = cat.createTable("default", "postings",
      StructType.fromDDL("doc_id BIGINT, tok STRING, tf BIGINT"))
    var from: Option[Long] = None
    def maintain(firstWindow: Boolean): Unit = {
      val head = corpus.currentSnapshot.get.snapshotId
      val delta = corpus.changes(from, Some(head))
      from = Some(head)
      // last change per doc wins; insert beats delete at one ordinal.
      // The window folds feed TWO consumers (delete keys + upserts) —
      // materialize it once (bounded by change volume, the same
      // contract every incremental CDC consumer here relies on)
      // instead of re-running the changelog plan per consumer.
      val last = delta.groupBy("doc_id")
        .agg(max(struct(col("_change_ordinal"),
          (col("_change_type") === "insert").cast("int").as("is_ins"),
          col("text"))).as("m"))
        .select(col("doc_id"), col("m.is_ins").as("is_ins"),
          col("m.text").as("text"))
        .localCheckpoint()
      // drop the changed docs' old index rows — skipped on the seed
      // window, where the index is empty and there is nothing to drop
      if (!firstWindow) postings.equalityDelete(last.select("doc_id"))
      val upserts = last.filter(col("is_ins") === 1)
        .select("doc_id", "text")
      val (p, _) = TextQueries.bm25Index(upserts)
      postings.append(p.select(col("doc_id"), col("tok"),
        col("tf").cast("long").as("tf")))
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long, Long)]
    def serve(phase: String, check: Boolean): Unit = {
      val stored = postings.read()
      val docLens = stored.groupBy("doc_id")
        .agg(sum("tf").cast("long").as("dl"))
      val ranked = TextQueries.bm25FromIndex(stored, docLens)
        .orderBy(desc("score_micro"), col("doc_id"))
      // the cross-check compares EVERY doc's score; a plain serve only
      // surfaces the top-5, so let it plan as TakeOrderedAndProject
      // instead of a full sort (the serve is 2/3 of the bench cost)
      val fromIndex = (if (check && crossCheck) ranked
        else ranked.limit(5))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      require(fromIndex.nonEmpty, s"empty index serve at $phase")
      if (check && crossCheck) {
        val direct = TextQueries.bm25ScoresOver(corpus.read())
          .orderBy(desc("score_micro"), col("doc_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        require(fromIndex.sameElements(direct),
          s"index-served BM25 diverged at $phase: " +
            s"index=${fromIndex.take(8).toSeq} " +
            s"direct=${direct.take(8).toSeq}")
      }
      fromIndex.take(5).zipWithIndex.foreach { case ((id, sc), i) =>
        out += ((phase, i + 1L, id, sc))
      }
    }
    // bounded slice of the configured corpus: the scenario is a
    // fixed-size lifecycle demo like the rest of the lake family, so
    // its cost must not scale with SPARK_GRAFT_SF_DIR
    val docs = graft.rel.Tables.documents(s, dir)
      .filter(col("doc_id") < 500).select("doc_id", "text")
    corpus.append(docs.filter(col("doc_id") < 250))
    maintain(firstWindow = true)
    serve("w1-seed", check = false)
    // a MIXED window: new docs land AND existing docs are deleted —
    // both maintenance paths (tokenize-inserted, equality-delete
    // dropped) fold from one changelog slice; the cross-check compares
    // EVERY doc's score, not just the top-5
    corpus.append(docs.filter(col("doc_id") >= 250))
    corpus.delete(col("doc_id") % 7 === 0)
    maintain(firstWindow = false)
    serve("w2-grow-delete", check = true)
    import s.implicits._
    out.toSeq.toDF("phase", "rank", "doc_id", "score_micro")
      .orderBy("phase", "rank")
  }

  private val vectorIndex = Q.noOracle("q_lake_vector_index") { (outer, dir) =>
    // driver-gap-dominated bounded-index walk (r17: 23 jobs, 0.9 s
    // compute, 1.5 s gap) — AQE-off 2-partition private session
    val s = LakeQueries.tunedSession(outer)
    vectorIndexScenario(s, dir, crossCheck = false)
  }

  /** IVF-PQ vector index AS a lake table — the vector twin of
    * [[invertedIndexScenario]], and the layout a billion-vector store
    * actually persists: the index table holds (vec_id, cell, codes) —
    * two BIGINTs per vector (coarse cell + packed 4-bit PQ codes, the
    * expensive encode paid ONCE at index time) — maintained from the
    * raw-vector table's CDC windows (inserted vectors encode map-side
    * through the native pq_encode kernel and the vec_dot coarse
    * argmin; deleted vectors drop their index row via equality
    * delete). Serving: probes = 2 nearest cells (driver metadata
    * math), stats-pruned scan of the index table filtered to probed
    * cells, ADC scoring via the pq_adc kernel against per-cell
    * residual LUT literals into a 50-row shortlist, then REFINE — the
    * shortlist joins the raw-vector table for exact grid distances
    * (production IVFADC: the index prunes everything, the raw table is
    * touched for <=50 rows), top-10 by exact distance.
    *
    * The model is TRAINED at index creation on the bootstrap window
    * ([[graft.llm.SimilarityQueries.ivfPqTrain]]: kmeans coarse cells
    * + residual PQ codebook — the q_sim_topk_ivfpq_trained pipeline)
    * and FROZEN thereafter, the realistic contract: retraining would
    * invalidate every stored code, so production indexes retrain only
    * by full rebuild. Later windows encode under the frozen model.
    * VectorIndexSpec runs this with crossCheck = true: index-served
    * top-10 must be bit-identical to the same IVF-PQ pipeline
    * recomputed from the CURRENT raw vectors. */
  private[lake] def vectorIndexScenario(
      s: org.apache.spark.sql.SparkSession, dir: String,
      crossCheck: Boolean): DataFrame = {
    import graft.functions.vec
    import graft.llm.SimilarityQueries._
    // dev-only per-action profile (the WapProfile pattern):
    //   GRAFT_PROFILE=1 sbt "Test/runMain graft.tools.TimeOne q_lake_vector_index"
    val __profile = sys.env.contains("GRAFT_PROFILE")
    var __last = System.nanoTime()
    def mark(what: String): Unit = if (__profile) {
      val now = System.nanoTime()
      println(f"[vector_index] $what: ${(now - __last) / 1e6}%.0f ms")
      __last = now
    }
    val cat = new GraftCatalog(s, graft.ScratchDirs.create("graft-wh-"))
    cat.createNamespace("default")
    val vecs = cat.createTable("default", "vectors",
      StructType.fromDDL("vec_id BIGINT, embedding ARRAY<FLOAT>"),
      Map("write.delete.mode" -> "merge-on-read"))
    val index = cat.createTable("default", "vector_index",
      StructType.fromDDL("vec_id BIGINT, cell BIGINT, codes BIGINT"))
    // bounded slice of the configured embeddings (see the inverted
    // index note); bootstrap/query stay vec 0..499 at every SF
    val emb = graft.rel.Tables.embeddings(s, dir)
      .filter(col("vec_id") < 500).select("vec_id", "embedding")
    // TRAIN at index creation on the bootstrap window, then freeze:
    // kmeans coarse cells + residual PQ codebook. The bootstrap is
    // metadata-sized BY CONSTRUCTION (fixed 250 vectors at every SF),
    // so training runs driver-side on one collected sample — the
    // FAISS train-on-sample pattern, bit-equal to the distributed
    // ivfPqTrain (LlmSpec pins it); query plan = 2 probe cells with
    // per-cell residual LUTs
    mark("create-tables")
    val (model, trainRows) =
      ivfPqTrainLocal(s, emb.filter(col("vec_id") < 250))
    mark("ivfPqTrain")
    val qv: Array[Long] = trainRows.find(_._1 == 0L).get._2
    val plan = ivfPqQueryPlan(model, qv, 2)
    val probes = plan.map(_._1)
    mark("query-plan")
    // frozen-model encode of a batch of (vec_id, embedding) rows
    def encoded(rows: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = rows
      .withColumn("cell", coarseCellCol(s, model.seeds))
      .withColumn("q", expr(pqQuantExpr))
      .withColumn("r", residualCol(model))
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        element_at(vec.pqEncode(s, col("r"), model.cb), 1).as("codes"))
    var from: Option[Long] = None
    def maintain(firstWindow: Boolean): Unit = {
      val head = vecs.currentSnapshot.get.snapshotId
      val delta = vecs.changes(from, Some(head))
      from = Some(head)
      val folded = delta.groupBy("vec_id")
        .agg(max(struct(col("_change_ordinal"),
          (col("_change_type") === "insert").cast("int").as("is_ins"),
          col("embedding"))).as("m"))
        .select(col("vec_id"), col("m.is_ins").as("is_ins"),
          col("m.embedding").as("embedding"))
      // a non-first window reads the delta twice (retract + upsert) —
      // materialize the CDC fold once instead of re-planning the MOR
      // changes read for each commit
      val last = if (firstWindow) folded else folded.localCheckpoint()
      if (firstWindow)
        index.append(encoded(last.filter(col("is_ins") === 1)))
      else
        // single-commit upsert (RowDelta): retract every changed key,
        // re-insert the survivors' fresh encodings — one snapshot, not
        // a delete commit followed by an append commit
        index.rowDelta(last.select("vec_id"),
          encoded(last.filter(col("is_ins") === 1)))
      mark("maintain:commit")
    }
    // serve = ADC shortlist from the INDEX (50 rows), then REFINE:
    // fetch only the shortlist's raw vectors from the vecs table and
    // re-rank by exact grid distance — the production IVFADC serve
    // (the q_sim_topk_ivfpq_trained refine step, against lake tables:
    // the index prunes, the raw table is touched for ≤50 rows)
    val qvd = typedlit(qv.map(_.toDouble).toSeq)
    val qq = qv.map(x => x.toDouble * x).sum
    def refined(shortlist: DataFrame): Array[(Long, Long, Long)] =
      shortlist
        .join(vecs.read().select(col("vec_id"), col("embedding")),
          "vec_id")
        .withColumn("qd", expr(
          "transform(" + pqQuantExpr + ", x -> CAST(x AS DOUBLE))"))
        .withColumn("d2",
          (vec.dot(s, col("qd"), col("qd"))
            - lit(2.0) * vec.dot(s, col("qd"), qvd) + lit(qq))
            .cast("long"))
        .orderBy("d2", "vec_id").limit(10)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getAs[Long]("d2")))
    def served(): Array[(Long, Long, Long)] = refined(index.read()
      .filter(col("vec_id") =!= 0 &&
        col("cell").isin(probes.map(Long.box): _*))
      .select(col("vec_id"), col("cell"),
        ivfPqAdcCol(s, plan).as("adc"))
      .orderBy("adc", "vec_id").limit(50))
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long, Long, Long)]
    def serve(phase: String, check: Boolean): Unit = {
      val top = served()
      mark(s"serve:$phase")
      require(top.nonEmpty, s"empty index serve at $phase")
      if (check && crossCheck) {
        val direct = refined(
          encoded(vecs.read().select("vec_id", "embedding"))
            .filter(col("vec_id") =!= 0 &&
              col("cell").isin(probes.map(Long.box): _*))
            .select(col("vec_id"), col("cell"),
              ivfPqAdcCol(s, plan).as("adc"))
            .orderBy("adc", "vec_id").limit(50))
        require(top.sameElements(direct),
          s"index-served IVF-PQ diverged at $phase: " +
            s"index=${top.toSeq} direct=${direct.toSeq}")
      }
      top.zipWithIndex.foreach { case ((id, cell, d2), i) =>
        out += ((phase, i + 1L, id, cell, d2))
      }
    }
    vecs.append(emb.filter(col("vec_id") < 250))
    mark("w1:append-vecs")
    maintain(firstWindow = true)
    serve("w1-seed", check = false)
    // mixed window: new vectors land AND indexed vectors are deleted
    vecs.append(emb.filter(col("vec_id") >= 250))
    vecs.delete(col("vec_id") % 7 === 0 && col("vec_id") >= 8)
    mark("w2:append+delete-vecs")
    maintain(firstWindow = false)
    serve("w2-grow-delete", check = true)
    import s.implicits._
    out.toSeq.toDF("phase", "rank", "vec_id", "cell", "d2")
      .orderBy("phase", "rank")
  }

  /** D40: the bucket-local (storage-partitioned) join — the 100 TB
    * read-path depth two co-bucketed fact tables unlock: customer and
    * orders both clustered `bucket(4, custkey)` join WITHOUT
    * exchanging either side (GraftTable.bucketLocalRead claims the
    * layout as HashPartitioning, so EnsureRequirements plans only
    * per-partition local sorts). In-query requires pin the plan shape
    * (zero Exchange under the join) and bit-equality of the aggregate
    * against the ordinary shuffled plan; BucketLocalJoinSpec holds the
    * fallback gates (deletes / no clustering / rename / widen). */
  private val bucketJoin = Q.noOracle("q_lake_bucket_join") { (outer, dir) =>
    // driver-gap-dominated walk (r17: 25 jobs, 1.0 s compute, 1.0 s
    // gap); the private session also keeps its broadcast-threshold
    // override off the caller's session
    val s = LakeQueries.tunedSession(outer)
    import graft.rel.Tables
    val cat = new GraftCatalog(s, graft.ScratchDirs.create("graft-wh-"))
    cat.createNamespace("default")
    val custDf = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val ordDf = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"))
    val cust = cat.createTable("default", "customer", custDf.schema,
      Map("write.clustered-by" -> "bucket(4,c_custkey)"))
    cust.append(custDf)
    val ords = cat.createTable("default", "orders", ordDf.schema,
      Map("write.clustered-by" -> "bucket(4,o_custkey)"))
    ords.append(ordDf)
    val lc = cust.bucketLocalRead("c_custkey").getOrElse(
      throw new IllegalStateException("customer not bucket-local"))
    val lo = ords.bucketLocalRead("o_custkey").getOrElse(
      throw new IllegalStateException("orders not bucket-local"))
    def agg(j: DataFrame): DataFrame = j
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_orderkey")).cast("bigint").as("key_sum"))
      .orderBy("c_mktsegment")
    // pin the shuffle-free shape with broadcast disabled (a broadcast
    // join would ALSO avoid the shuffle but is not the 100 TB shape
    // this scenario exists to prove); restore the session conf after.
    // The claimed plan carries one relation per bucket per side —
    // build the join ONCE and reuse it for the plan check, the
    // aggregate, and the output schema (plan construction is the
    // dominant driver cost at this table size).
    val saved = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val (out, sch) = try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = lo.join(lc, lo("o_custkey") === lc("c_custkey"))
      val joinExchanges = j.queryExecution.executedPlan.toString
        .split("\n").count(_.contains("Exchange"))
      require(joinExchanges == 0,
        s"bucket-local join planned $joinExchanges exchanges")
      val local = agg(j)
      val rc = cust.read(); val ro = ords.read()
      val shuffled =
        agg(ro.join(rc, ro("o_custkey") === rc("c_custkey")))
      val got = local.collect().toSeq
      require(got == shuffled.collect().toSeq,
        "bucket-local join diverged from the shuffled plan")
      (got, local.schema)
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    s.createDataFrame(out.asJava, sch).orderBy("c_mktsegment")
  }

  /** D41: the policy-driven maintenance scheduler
    * ([[GraftTable.maintain]] / `CALL graft.system.maintain`) walked
    * through a full fleet-scheduler lifecycle: a healthy table no-ops;
    * a merge-on-read GDPR delete leaves delete files that break
    * bucket-local (storage-partitioned) join eligibility, and ONE
    * maintain() call compacts them away and restores it; the expiry
    * policy makes the erasure durable (time travel to the pre-delete
    * snapshot fails); small-file churn from many thin appends
    * bin-packs back to the clustered layout; an aged orphan file is
    * swept; and a quiet table's next call reports nothing. Policies
    * live in TBLPROPERTIES, so one cron loop services every table.
    *
    * Scale: each trigger reads only manifest metadata (file counts /
    * sizes / delete-file counts) — deciding "nothing to do" on a
    * 100 TB table costs zero data IO; the actions themselves are the
    * already-bounded maintenance ops. */
  private val maintenance = Q.noOracle("q_lake_maintenance") { (outer, _) =>
    // driver-gap-dominated fixed walk (r17: 34 jobs, 1.0 s compute,
    // 1.7 s gap) — AQE-off 2-partition private session
    val s = LakeQueries.tunedSession(outer)
    import s.implicits._
    import java.nio.file.attribute.FileTime
    val schema = StructType.fromDDL("k BIGINT, v STRING")
    val cat = new GraftCatalog(s, graft.ScratchDirs.create("graft-wh-"))
    cat.createNamespace("default")
    val threeDaysMs = 3L * 24 * 3600 * 1000
    val t = cat.createTable("default", "events", schema, Map(
      "write.delete.mode" -> "merge-on-read",
      "write.clustered-by" -> "bucket(4,k)",
      "write.clustered-by.files" -> "4",
      "maintenance.compact.min-small-files" -> "8",
      "maintenance.expire.max-age-ms" -> "1",
      "maintenance.expire.retain-last" -> "2",
      "maintenance.orphans.older-than-ms" -> threeDaysMs.toString))
    def rowsOf(r: Range): DataFrame = s.createDataFrame(
      r.map(i => Row(i.toLong, s"v$i")).asJava, schema)
    t.append(rowsOf(0 until 400))
    val s0 = t.currentSnapshot.get.snapshotId
    val out =
      scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    def fact(phase: String, k: String, v: Long): Unit =
      out += ((phase, k, v))
    def eligible: Long = if (t.bucketLocalRead("k").isDefined) 1L else 0L
    // commits must be strictly older than the 1 ms expiry horizon
    def settle(): Unit = Thread.sleep(10)

    settle()
    val r0 = t.maintain() // healthy: nothing trips
    fact("1-fresh", "actions", r0.size)
    require(r0.isEmpty, s"healthy table must no-op, got $r0")

    t.delete(col("k") % 100 === 3) // MOR: 4 position-deleted rows
    fact("2-mor-delete", "eligible", eligible)
    fact("2-mor-delete", "delete-files", t.deleteFiles.count())
    val preRows = t.read().agg(count(lit(1)), sum("k")).head()

    settle()
    val r1 = t.maintain()
    fact("3-maintain", "compact-deletes",
      r1.count(_._1 == "compact-deletes"))
    fact("3-maintain", "eligible", eligible)
    fact("3-maintain", "delete-files", t.deleteFiles.count())
    val postRows = t.read().agg(count(lit(1)), sum("k")).head()
    require(preRows == postRows,
      s"compaction changed visible rows: $preRows -> $postRows")
    require(eligible == 1L,
      "compaction must restore bucket-local eligibility")
    // the expiry policy (retain_last=2) made the erasure durable
    fact("4-expired", "history", t.history.count())
    val travel = scala.util.Try(t.readAt(s0).count())
    require(travel.isFailure,
      "pre-delete snapshot must be unreachable after policy expiry")

    settle()
    val r2 = t.maintain() // quiet again: idempotent
    fact("5-idempotent", "actions", r2.size)
    require(r2.isEmpty, s"second maintain must no-op, got $r2")

    // thin-append churn: one append of 4 clustered files — with the 4
    // compacted files already present, 8 small files meet the
    // min-small-files=8 policy floor and exceed the 4-file clustered
    // target, so bin-packing actually shrinks the layout
    t.append(rowsOf(400 until 420))
    settle()
    val r3 = t.maintain()
    fact("6-small", "compact-small-files",
      r3.count(_._1 == "compact-small-files"))
    fact("6-small", "data-files", t.dataFiles.count())
    fact("6-small", "rows", t.read().count())

    // an aged orphan inside the data dir is swept by the policy (no
    // settle: nothing committed since r3's expiry pass)
    val orphan = t.root.resolve("data/orphan-planted.parquet")
    Files.write(orphan, Array[Byte](1, 2, 3))
    Files.setLastModifiedTime(orphan,
      FileTime.fromMillis(System.currentTimeMillis() - 4 * 24 * 3600 * 1000L))
    val r4 = t.maintain()
    fact("7-orphans", "removed", r4.count(_._1 == "remove-orphans"))
    require(!Files.exists(orphan), "aged orphan must be swept")

    out.toSeq.toDF("phase", "fact", "value").orderBy("phase", "fact")
  }

  /** D42: runtime join-driven file pruning ([[GraftTable.readForJoin]])
    * — the dynamic-partition-pruning analog decided from manifest
    * stats: orders is range-clustered by o_custkey (each data file
    * carries a disjoint custkey band), the dim is a "campaign cohort"
    * (the lowest ~5% of custkeys), and the fact read prunes to the
    * files whose recorded key range intersects the cohort BEFORE the
    * join plans — a metadata-only decision, the 100 TB shape where a
    * filtered dim cuts the fact scan to a sliver. In-query requires:
    * strictly fewer files scanned, join results identical to the
    * scan-all plan, the over-`maxKeys` fallback scans everything, and
    * an empty dim joins to nothing. */
  private val runtimePrune = Q.noOracle("q_lake_runtime_prune") { (outer, dir) =>
    // driver-gap-dominated walk (r17: 27 jobs, 0.7 s compute, 1.1 s
    // gap) — AQE-off 2-partition private session
    val s = LakeQueries.tunedSession(outer)
    import s.implicits._
    import graft.rel.Tables
    val cat = new GraftCatalog(s, graft.ScratchDirs.create("graft-wh-"))
    cat.createNamespace("default")
    val ordDf = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val ords = cat.createTable("default", "orders", ordDf.schema,
      Map("write.clustered-by" -> "o_custkey",
        "write.clustered-by.files" -> "8"))
    ords.append(ordDf)
    val maxCust = Tables.customer(s, dir)
      .agg(max(col("c_custkey"))).head().getLong(0)
    val cohort = Tables.customer(s, dir)
      .filter(col("c_custkey") <= maxCust / 20)
      .select(col("c_custkey"), col("c_mktsegment"))
    val out =
      scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    def fact(phase: String, k: String, v: Long): Unit =
      out += ((phase, k, v))

    val allFiles = ords.read().inputFiles.length
    val pruned = ords.readForJoin("o_custkey", cohort, "c_custkey")
    val prunedFiles = pruned.inputFiles.length
    fact("1-prune", "files-total", allFiles)
    fact("1-prune", "files-scanned", prunedFiles)
    require(prunedFiles < allFiles,
      s"cohort join must prune files: $prunedFiles vs $allFiles")

    def agg(j: DataFrame): Seq[Row] = j
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("o_orderkey")).cast("long").as("key_sum"))
      .orderBy("c_mktsegment").collect().toSeq
    val got = agg(pruned.join(cohort,
      pruned("o_custkey") === cohort("c_custkey")))
    val ro = ords.read()
    val want = agg(ro.join(cohort, ro("o_custkey") === cohort("c_custkey")))
    require(got == want, "pruned join diverged from the scan-all join")
    fact("2-equal", "segments", got.size)
    require(got.nonEmpty, "cohort join must produce rows")

    // over-budget fallback: the collect is abandoned, everything scans
    val fb = ords.readForJoin("o_custkey", cohort, "c_custkey",
      maxKeys = 1)
    fact("3-fallback", "files-scanned", fb.inputFiles.length)
    require(fb.inputFiles.length == allFiles,
      "over-maxKeys fallback must scan all files")

    // empty dim: nothing can match, nothing scans
    val none = ords.readForJoin("o_custkey",
      cohort.filter(lit(false)), "c_custkey")
    fact("4-empty-dim", "rows", none.count())
    require(none.count() == 0L, "empty dim must read no rows")

    out.toSeq.toDF("phase", "fact", "value").orderBy("phase", "fact")
  }

  /** D43+D44: the two zero-copy catalog adoption paths walked side by
    * side. register_table = ONE table under a second name (shared
    * commits: an insert through either handle is visible to both);
    * snapshot = an independent FORK starting from the source's bytes
    * (fork DML invisible to the source; expiry on the fork refuses —
    * it doesn't own the bytes). Both move ZERO data: the register
    * records a pointer, the fork's first snapshot references the
    * source's files in place (in-query require pins inputFiles
    * equality). The staging/migration story a 100 TB lake needs:
    * adopt first, rehearse on a fork, never copy. */
  private val tableClone = Q.noOracle("q_lake_table_clone") { (s, _) =>
    import s.implicits._
    val schema = StructType.fromDDL("k BIGINT, v STRING")
    val wh = graft.ScratchDirs.create("graft-clone-")
    val cat = new GraftCatalog(s, wh.resolve("warehouse"))
    cat.createNamespace("default")
    // the external table: another pipeline's output outside the
    // warehouse
    val ext = GraftTable.create(s, wh.resolve("external"), "x.t",
      schema, Map.empty)
    ext.append(s.createDataFrame(
      (0L until 100L).map(i => Row(i, s"v$i")).asJava, schema))
    val out =
      scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    def fact(phase: String, k: String, v: Long): Unit =
      out += ((phase, k, v))

    // D43: adopt by pointer — shared commits both ways
    val reg = cat.registerTable("default", "adopted", ext.root)
    fact("1-register", "rows", reg.read().count())
    reg.append(s.createDataFrame(Seq(Row(100L, "via-catalog")).asJava,
      schema))
    fact("1-register", "rows-after-insert", ext.read().count())
    require(ext.read().count() == 101L,
      "a registered table shares commits with the original handle")

    // D44: fork zero-copy — same bytes, independent future
    val fork = cat.snapshotTable("default", "rehearsal", ext)
    require(fork.read().inputFiles.toSet == ext.read().inputFiles.toSet,
      "the fork's first snapshot must reference the source's files")
    fact("2-fork", "rows", fork.read().count())
    fork.delete(col("k") < 50)
    fact("3-fork-dml", "fork-rows", fork.read().count())
    fact("3-fork-dml", "source-rows", ext.read().count())
    require(ext.read().count() == 101L,
      "fork DML must never reach the source")
    val refused = scala.util.Try(fork.expireSnapshots()).isFailure
    fact("4-gc", "expiry-refused", if (refused) 1L else 0L)
    require(refused, "expiry on a fork must refuse (gc.enabled=false)")
    // drop the pointer: the external table survives untouched
    cat.dropTable("default", "adopted")
    fact("5-drop-pointer", "source-rows", ext.read().count())
    out.toSeq.toDF("phase", "fact", "value").orderBy("phase", "fact")
  }

  /** The incremental-manifest lifecycle as a driver-visible query
    * (Iceberg's two-level manifest-list → manifest-file structure,
    * SURVEY D45): commits write O(delta) manifest metadata — an append
    * to an N-file table references the parent's segments VERBATIM and
    * writes one new segment holding only its own entries —
    * `rewrite_manifests` compacts segment sprawl without touching
    * data, and expiry never deletes a segment a retained snapshot
    * still reaches. Facts are deterministic counts; the O(delta) and
    * sharing claims are pinned by in-query requires. */
  private val manifestSegments =
    Q.noOracle("q_lake_manifest_segments") { (s, _) =>
    import s.implicits._
    val schema = StructType.fromDDL("k BIGINT, v STRING")
    val cat = new GraftCatalog(s, graft.ScratchDirs.create("graft-wh-"))
    cat.createNamespace("default")
    val t = cat.createTable("default", "seg", schema)
    def rowsOf(r: Range): DataFrame = s.createDataFrame(
      r.map(i => Row(i.toLong, s"v$i")).asJava, schema)
    val out =
      scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    def fact(phase: String, k: String, v: Long): Unit =
      out += ((phase, k, v))
    // wide first load: ONE segment carrying 8 file entries
    t.appendClustered(rowsOf(0 until 400), Seq("k"), nFiles = 8)
    val wide = t.segmentsOf(t.currentSnapshot.get)
    fact("1-load", "segments", wide.size)
    fact("1-load", "entries", wide.map(_.entryCount.toLong).sum)
    // O(delta): a 1-file append REUSES the 8-entry segment verbatim
    // (same file, zero bytes rewritten for it) and writes one segment
    // holding only the new entry
    t.append(rowsOf(400 until 401))
    val after = t.segmentsOf(t.currentSnapshot.get)
    require(after.contains(wide.head),
      "append must reference the parent's segment verbatim")
    require(after.last.entryCount == 1,
      s"the new segment must hold ONLY the new entries, got $after")
    require(after.last.sizeBytes < wide.head.sizeBytes / 4,
      "manifest bytes written must scale with the CHANGE, not the table")
    fact("2-append", "segments", after.size)
    fact("2-append", "new-segment-entries", after.last.entryCount.toLong)
    // sprawl: three more trickle appends, one small segment each
    (1 to 3).foreach(i => t.append(rowsOf(400 + i until 401 + i)))
    fact("3-sprawl", "segments",
      t.segmentsOf(t.currentSnapshot.get).size.toLong)
    val rowsBefore = t.read().count()
    // rewrite_manifests: metadata-only compaction — same entries, one
    // segment, zero row changes (the changelog stays silent)
    val before = t.currentSnapshot.get
    val r = t.rewriteManifests().get
    require(t.changes(Some(before.snapshotId), Some(r.snapshotId))
      .count() == 0, "manifest compaction must emit no row changes")
    fact("4-compacted", "segments",
      t.segmentsOf(t.currentSnapshot.get).size.toLong)
    fact("4-compacted", "replaced",
      r.summary("manifests-replaced").toLong)
    fact("4-compacted", "rows", t.read().count())
    require(t.read().count() == rowsBefore)
    // expiry: the compacted segment is SHARED by the next append's
    // manifest list; expiring history must keep it alive
    t.append(rowsOf(500 until 520))
    val shared = t.segmentsOf(t.currentSnapshot.get).head
    t.expireSnapshots(retainLast = 1)
    require(Files.exists(t.root.resolve(shared.path)),
      "expiry deleted a segment the retained snapshot references")
    fact("5-expired", "rows", t.read().count())
    fact("5-expired", "segments",
      t.segmentsOf(t.currentSnapshot.get).size.toLong)
    out.toSeq.toDF("phase", "key", "value").orderBy("phase", "key")
  }

  /** DECIMAL(12,2) end-to-end THROUGH THE LAKE (round 14, the one
    * previously-untested mainstream SQL type): create a graft table
    * with DECIMAL columns, insert lineitem money cast to exact
    * decimals, MOR-delete through a DECIMAL predicate (exercising the
    * new decimal file stats/pruning), COW-update DECIMAL arithmetic,
    * and aggregate in DECIMAL space. The one ORACLED lake query: the
    * lake roundtrip is value-exact, so DuckDB recomputes the identical
    * result straight from the source parquet. Outputs render decimals
    * as STRINGS — the driver hash is type-repr-sensitive and the gate
    * refuses DECIMAL oracle columns; the string digits carry the
    * exactness evidence (scale-preserving plain form, both engines).
    * Scale shape: one scan, one MOR delete, one COW rewrite of the
    * matching files only, one partial-agg'd groupBy — nothing
    * corpus-sized on the driver. */
  private val decimalLake = Q(
    "q_lake_decimal",
    """WITH li AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
      |    CAST(l_discount AS DECIMAL(4,2)) AS disc
      |  FROM lineitem WHERE l_orderkey % 7 = 0
      |), kept AS (
      |  SELECT flag,
      |    CASE WHEN flag = 'R'
      |      THEN CAST(price + CAST(10.00 AS DECIMAL(4,2))
      |        AS DECIMAL(12,2))
      |      ELSE price END AS price,
      |    disc
      |  FROM li WHERE NOT disc > CAST(0.08 AS DECIMAL(4,2))
      |)
      |SELECT flag, count(*) AS n,
      |  CAST(sum(price) AS VARCHAR) AS gross,
      |  CAST(CAST(sum(price * (CAST(1.00 AS DECIMAL(3,2)) - disc))
      |    AS DECIMAL(24,4)) AS VARCHAR) AS net,
      |  CAST(min(price) AS VARCHAR) AS min_price,
      |  CAST(max(price) AS VARCHAR) AS max_price
      |FROM kept GROUP BY flag ORDER BY flag""".stripMargin
  ) { (s, dir) =>
    val li = graft.rel.Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 7 === 0)
      .select(col("l_returnflag").as("flag"),
        col("l_extendedprice").cast(DecimalType(12, 2)).as("price"),
        col("l_discount").cast(DecimalType(4, 2)).as("disc"))
    val cat = new GraftCatalog(s, graft.ScratchDirs.create("graft-dec-"))
    cat.createNamespace("default")
    val t = cat.createTable("default", "money", StructType.fromDDL(
      "flag STRING, price DECIMAL(12,2), disc DECIMAL(4,2)"),
      Map("write.delete.mode" -> "merge-on-read"))
    t.append(li)
    t.delete(col("disc") >
      lit(BigDecimal("0.08")).cast(DecimalType(4, 2)))
    t.update(col("flag") === "R", Map("price" ->
      (col("price") + lit(BigDecimal("10.00")).cast(DecimalType(4, 2)))
        .cast(DecimalType(12, 2))))
    t.read().groupBy("flag")
      .agg(count(lit(1)).as("n"),
        sum("price").cast("string").as("gross"),
        sum(col("price") *
            (lit(BigDecimal("1.00")).cast(DecimalType(3, 2))
              - col("disc")))
          .cast(DecimalType(24, 4)).cast("string").as("net"),
        min("price").cast("string").as("min_price"),
        max("price").cast("string").as("max_price"))
      .orderBy("flag")
  }

  /** TPC-H Q1's pricing summary THROUGH THE LAKE (round 14, the
    * second oracled lake query): insert an integer-cents lineitem
    * slice into a graft table, MOR-delete through an integer
    * predicate (delete files mask at read, stats prune the probe),
    * and aggregate the masked read — DuckDB recomputes the identical
    * result from the source parquet with the delete mirrored as a
    * NOT filter. All-integer math (cents columns as BIGINT), so the
    * lake write→MOR-mask→read→aggregate path is hash-checked with
    * zero float tolerance. Scale shape: one slice write, one MOR
    * delete (anti-join masking is the 100 TB path), one partial-agg'd
    * groupBy over 6 groups. */
  private val lakePricing = Q(
    "q_lake_pricing_summary",
    """WITH li AS (
      |  SELECT l_returnflag, l_linestatus,
      |    CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
      |    CAST(round(l_discount * 100) AS BIGINT) AS disc_c
      |  FROM lineitem WHERE l_orderkey % 5 = 0
      |), kept AS (
      |  SELECT * FROM li WHERE NOT disc_c >= 8
      |)
      |SELECT l_returnflag, l_linestatus,
      |  CAST(sum(qty_c) AS BIGINT) AS sum_qty_c,
      |  CAST(sum(price_c) AS BIGINT) AS sum_base_c,
      |  CAST(sum(price_c * (100 - disc_c)) AS BIGINT) AS sum_disc_c2,
      |  count(*) AS n
      |FROM kept GROUP BY 1, 2
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) { (outer, dir) =>
    // driver-gap-dominated bounded walk (r17 LakeJobProfile) —
    // AQE-off 2-partition private session; result oracle-unchanged
    val s = LakeQueries.tunedSession(outer)
    val li = graft.rel.Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 5 === 0)
      .select(col("l_returnflag").as("flag"),
        col("l_linestatus").as("status"),
        expr("cast(round(l_quantity * 100) as bigint)").as("qty_c"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("price_c"),
        expr("cast(round(l_discount * 100) as bigint)").as("disc_c"))
    val cat = new GraftCatalog(s, graft.ScratchDirs.create("graft-q1-"))
    cat.createNamespace("default")
    val t = cat.createTable("default", "li_cents", StructType.fromDDL(
      "flag STRING, status STRING, qty_c BIGINT, price_c BIGINT, " +
        "disc_c BIGINT"),
      Map("write.delete.mode" -> "merge-on-read"))
    t.append(li)
    t.delete(col("disc_c") >= 8L)
    t.read()
      .groupBy(col("flag").as("l_returnflag"),
        col("status").as("l_linestatus"))
      .agg(sum("qty_c").cast("bigint").as("sum_qty_c"),
        sum("price_c").cast("bigint").as("sum_base_c"),
        sum(col("price_c") * (lit(100L) - col("disc_c")))
          .cast("bigint").as("sum_disc_c2"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** ARRAY/MAP columns end-to-end THROUGH THE LAKE (round 15): create
    * a graft table carrying `ARRAY<BIGINT>` and `MAP<STRING,BIGINT>`
    * columns, insert lineitem lines grouped per order, MOR-delete via
    * a scalar predicate (position-delete masking is type-agnostic —
    * the complex payloads never participate), COW-update a sibling
    * scalar (the rewrite forces every array/map through the write
    * path a second time), and aggregate the masked read over
    * `element_at`/`size`/`array_join`. Stats behavior for
    * non-comparable types is skip-not-prune by construction:
    * [[GraftTable.statEntriesViaFooters]]' statSpace yields None for
    * ARRAY/MAP/STRUCT, so those columns carry no bounds and
    * `mayMatch` keeps every file ("may match", never wrong) while
    * the scalar siblings (orderkey, n_lines) still prune normally —
    * GraftTableSpec pins exactly that split. Oracle: DuckDB
    * recomputes from the source parquet with the delete/update
    * mirrored; arrays render via 1-based indexing both sides
    * (element_at ≡ lines[1]) and min/max of the joined-string
    * rendering pins element order and content. All-integer math. */
  private val complexTypes = Q(
    "q_lake_complex_types",
    """WITH g AS (
      |  SELECT l_orderkey AS orderkey,
      |    list_sort(list(CAST(l_linenumber AS BIGINT))) AS lines,
      |    count(*) AS n_lines,
      |    CAST(sum(CASE WHEN l_linenumber = 1
      |      THEN CAST(round(l_quantity * 100) AS BIGINT) END)
      |      AS BIGINT) AS qty1
      |  FROM lineitem WHERE l_orderkey % 7 = 0 GROUP BY 1
      |), kept AS (
      |  SELECT * FROM g WHERE NOT n_lines <= 2
      |), upd AS (
      |  SELECT orderkey, lines, qty1,
      |    CASE WHEN orderkey % 100 = 0 THEN -n_lines
      |      ELSE n_lines END AS n_lines
      |  FROM kept
      |)
      |SELECT orderkey % 10 AS bucket,
      |  count(*) AS n_orders,
      |  CAST(sum(len(lines)) AS BIGINT) AS sum_n_lines_arr,
      |  CAST(sum(lines[1]) AS BIGINT) AS sum_first_line,
      |  CAST(sum(qty1) AS BIGINT) AS sum_qty_line1,
      |  CAST(sum(n_lines) AS BIGINT) AS sum_n_lines_col,
      |  min(array_to_string(lines, ',')) AS min_lines_repr,
      |  max(array_to_string(lines, ',')) AS max_lines_repr
      |FROM upd GROUP BY 1 ORDER BY bucket""".stripMargin
  ) { (outer, dir) =>
    // driver-gap-dominated bounded walk (r17 LakeJobProfile) —
    // AQE-off 2-partition private session; result oracle-unchanged
    val s = LakeQueries.tunedSession(outer)
    // (orderkey, linenumber) is NOT unique in the synthetic corpus,
    // so map keys aggregate per line first (the oracle's qty1 is the
    // same per-line SUM); the lines array keeps duplicates
    val base = graft.rel.Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 7 === 0)
      .select(col("l_orderkey").as("orderkey"),
        col("l_linenumber").cast("long").as("ln"),
        expr("cast(round(l_quantity * 100) as bigint)").as("qty_c"))
    val arrays = base.groupBy("orderkey")
      .agg(sort_array(collect_list(col("ln"))).as("lines"),
        count(lit(1)).as("n_lines"))
    val maps = base.groupBy("orderkey", "ln")
      .agg(sum("qty_c").cast("bigint").as("qty_ln"))
      .groupBy("orderkey")
      .agg(map_from_entries(sort_array(collect_list(struct(
        col("ln").cast("string"), col("qty_ln"))))).as("qty_by_line"))
    val src = arrays.join(maps, "orderkey")
      .select("orderkey", "lines", "qty_by_line", "n_lines")
    val cat = new GraftCatalog(s, graft.ScratchDirs.create("graft-cx-"))
    cat.createNamespace("default")
    val t = cat.createTable("default", "order_lines", StructType.fromDDL(
      "orderkey BIGINT, lines ARRAY<BIGINT>, " +
        "qty_by_line MAP<STRING,BIGINT>, n_lines BIGINT"),
      Map("write.delete.mode" -> "merge-on-read",
        "write.update.mode" -> "copy-on-write"))
    t.append(src)
    t.delete(col("n_lines") <= 2)
    t.update(col("orderkey") % 100 === 0,
      Map("n_lines" -> -col("n_lines")))
    t.read()
      .groupBy((col("orderkey") % 10).as("bucket"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(size(col("lines"))).cast("bigint").as("sum_n_lines_arr"),
        sum(element_at(col("lines"), 1)).cast("bigint")
          .as("sum_first_line"),
        sum(element_at(col("qty_by_line"), "1")).cast("bigint")
          .as("sum_qty_line1"),
        sum(col("n_lines")).cast("bigint").as("sum_n_lines_col"),
        min(array_join(col("lines"), ",")).as("min_lines_repr"),
        max(array_join(col("lines"), ",")).as("max_lines_repr"))
      .orderBy("bucket")
  }

  /** Column NDV statistics end-to-end, ORACLED (round 15): analyze
    * after the FIRST append, then append a disjoint second slice so
    * the commit-time FOLD (KMV merge) produces the final sketches —
    * the DuckDB oracle recomputes each column's KMV NDV over the FULL
    * source in one pass, so a hash-match proves the merge law
    * (k-smallest of a distinct union ≡ k-smallest of the whole) held
    * through table metadata, not just in a spec. Hashing is the
    * shared [[graft.rel.Kmv.hash60]] md5 form; the estimator is the
    * integer-exact (k-1)·2^60 div theta, so there is zero float
    * tolerance. `flag` sits below k (exact passthrough), the key
    * columns above it (estimator path). */
  private val ndvStats = Q(
    "q_lake_ndv_stats",
    """WITH src AS (
      |  SELECT CAST(l_orderkey AS BIGINT) AS okey,
      |    CAST(l_suppkey AS BIGINT) AS skey,
      |    l_returnflag AS flag
      |  FROM lineitem WHERE l_orderkey % 3 = 0
      |), vals AS (
      |  SELECT 'okey' AS col_name, CAST(okey AS VARCHAR) AS v FROM src
      |  UNION ALL SELECT 'skey', CAST(skey AS VARCHAR) FROM src
      |  UNION ALL SELECT 'flag', flag FROM src
      |), dh AS (
      |  SELECT DISTINCT col_name,
      |    CAST(concat('0x', substr(md5(v), 1, 15)) AS BIGINT) AS h
      |  FROM vals WHERE v IS NOT NULL
      |), rk AS (
      |  SELECT col_name, h,
      |    row_number() OVER (PARTITION BY col_name ORDER BY h) AS rk
      |  FROM dh
      |), st AS (
      |  SELECT col_name, count(*) AS cnt, max(h) AS theta
      |  FROM rk WHERE rk <= 256 GROUP BY col_name
      |)
      |SELECT col_name,
      |  CASE WHEN cnt < 256 THEN cnt
      |    ELSE CAST((255 * CAST(1152921504606846976 AS HUGEINT))
      |      // theta AS BIGINT)
      |  END AS ndv
      |FROM st ORDER BY col_name""".stripMargin
  ) { (s, dir) =>
    val src = graft.rel.Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 3 === 0)
      .select(col("l_orderkey").cast("long").as("okey"),
        col("l_suppkey").cast("long").as("skey"),
        col("l_returnflag").as("flag"))
    val cat = new GraftCatalog(s, graft.ScratchDirs.create("graft-ndv-"))
    cat.createNamespace("default")
    val t = cat.createTable("default", "ndv_demo", StructType.fromDDL(
      "okey BIGINT, skey BIGINT, flag STRING"), Map.empty)
    t.append(src.filter(col("okey") % 2 === 0))
    t.computeTableStats() // sketches over the first slice
    t.append(src.filter(col("okey") % 2 =!= 0)) // commit-time fold
    t.statsTable
      .select(col("column").as("col_name"), col("ndv"))
      .orderBy("col_name")
  }

  /** TIMESTAMP_NTZ end-to-end THROUGH THE LAKE (round 15, the type
    * the r14 verdict's complex-types gap named alongside ARRAY/MAP):
    * create a graft table with a TIMESTAMP_NTZ column, insert the
    * events stream, MOR-delete through a timestamp predicate (file
    * stats prune in the shared micros space — both stat paths render
    * NTZ as epoch micros), COW-update a sibling scalar (the rewrite
    * re-writes NTZ values bit-exactly), and aggregate per day.
    * Timestamps leave the query as epoch MICROS BIGINT (naive-as-UTC
    * on both engines: Spark unix_micros under the UTC session ≡
    * DuckDB epoch_us on the naive value), days as strings — zero
    * float, zero timezone tolerance. */
  private val timestampNtz = Q(
    "q_lake_timestamp_ntz",
    """WITH kept AS (
      |  SELECT * FROM events WHERE NOT ts < TIMESTAMP '2024-01-08'
      |), upd AS (
      |  SELECT event_id, ts, event_type,
      |    CASE WHEN event_type = 'error' THEN -1
      |      ELSE user_id END AS user_id
      |  FROM kept
      |)
      |SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
      |  count(*) AS n,
      |  CAST(sum(user_id) AS BIGINT) AS sum_uid,
      |  CAST(min(epoch_us(ts)) AS BIGINT) AS min_ts_us,
      |  CAST(max(epoch_us(ts)) AS BIGINT) AS max_ts_us
      |FROM upd GROUP BY 1 ORDER BY day""".stripMargin
  ) { (outer, dir) =>
    // driver-gap-dominated bounded walk (r17 LakeJobProfile) —
    // AQE-off 2-partition private session; result oracle-unchanged
    val s = LakeQueries.tunedSession(outer)
    val ev = graft.rel.Tables.events(s, dir)
      .select(col("event_id").cast("long").as("event_id"),
        col("ts"), col("user_id").cast("long").as("user_id"),
        col("event_type"))
    val cat = new GraftCatalog(s, graft.ScratchDirs.create("graft-ntz-"))
    cat.createNamespace("default")
    val t = cat.createTable("default", "ev_ntz", StructType.fromDDL(
      "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, " +
        "event_type STRING"),
      Map("write.delete.mode" -> "merge-on-read",
        "write.update.mode" -> "copy-on-write"))
    t.append(ev)
    t.delete(col("ts") <
      lit("2024-01-08 00:00:00").cast(TimestampNTZType))
    t.update(col("event_type") === "error",
      Map("user_id" -> lit(-1L)))
    t.read()
      .groupBy(col("ts").cast(DateType).cast("string").as("day"))
      .agg(count(lit(1)).as("n"),
        sum("user_id").cast("bigint").as("sum_uid"),
        min(unix_micros(col("ts").cast("timestamp"))).cast("bigint")
          .as("min_ts_us"),
        max(unix_micros(col("ts").cast("timestamp"))).cast("bigint")
          .as("max_ts_us"))
      .orderBy("day")
  }

  /** The `migrate` procedure as a driver-visible scenario (round 15;
    * no SQL oracle — runtime temp warehouse — semantics hash-pinned
    * by GraftSqlSpec's walk): a plain parquet directory becomes a
    * graft table under its own name, in place. Observations emit the
    * contract as deterministic values: rows identical through the
    * table and through the backup, bytes adopted where they sit
    * (zero copies), DML working on the migrated table while the
    * backup stays frozen, and gc disabled on the shared bytes. */
  private val migrateScenario = Q.noOracle("q_lake_migrate") { (outer, dir) =>
    // many tiny actions over bounded lineitem slices (1/11, 1/13) —
    // AQE-off 2-partition private session (r17, quantile-rollup idiom)
    val s = LakeQueries.tunedSession(outer)
    import s.implicits._
    val wh = graft.ScratchDirs.create("graft-mig-")
    val cat = new GraftCatalog(s, wh)
    cat.createNamespace("default")
    val legacy = wh.resolve("default").resolve("li_legacy")
    graft.rel.Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 11 === 0)
      .select(col("l_orderkey").cast("long").as("okey"),
        expr("cast(round(l_extendedprice * 100) as bigint)")
          .as("price_c"))
      .repartition(4).write.parquet(legacy.toString)
    val t = cat.migrateTable("default", "li_legacy")
    val backup = wh.resolve("default").resolve("li_legacy_backup_")
    val viaTable = t.read().count()
    val viaBackup = s.read.parquet(backup.toString).count()
    val inPlace = t.read().inputFiles.forall(_.contains("_backup_"))
    val migratedFiles = t.currentSnapshot.get
      .summary("added-data-files").toLong
    t.delete(col("okey") % 2 === 0) // COW: rewrites, dereferences
    val afterDelete = t.read().count()
    val backupFrozen = s.read.parquet(backup.toString).count()
    val gcRefused =
      try { t.expireSnapshots(retainLast = 1); false }
      catch { case e: IllegalArgumentException =>
        e.getMessage.contains("gc.enabled") }
    // r17: hive-partitioned source — keep-backup adopts REWRITE-FREE
    // (Iceberg's actual migrate model: per-file partition tuples on
    // manifest entries prune from metadata alone, columns synthesize
    // at scan time from directory names — zero data bytes move, the
    // 100 TB path); drop_backup instead rewrites the values into a
    // REAL column clustered for pruning. Both forms exercised.
    val legacyP = wh.resolve("default").resolve("li_part")
    graft.rel.Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 13 === 0)
      .select(col("l_orderkey").cast("long").as("okey"),
        expr("cast(round(l_quantity * 100) as bigint)").as("qty_c"),
        col("l_returnflag").as("flag"))
      .write.partitionBy("flag").parquet(legacyP.toString)
    val expect = s.read.parquet(legacyP.toString)
    val (expRows, expA) =
      (expect.count(), expect.filter(col("flag") === "A").count())
    val tKeep = cat.migrateTable("default", "li_part")
    val backupP = wh.resolve("default").resolve("li_part_backup_")
    val kRows = tKeep.read().count()
    val kA = tKeep.readWhere(col("flag") === "A").count()
    val kPrunes = tKeep.readWhere(col("flag") === "A")
      .inputFiles.length < tKeep.read().inputFiles.length
    val kInPlace = tKeep.read().inputFiles
      .forall(_.contains("li_part_backup_"))
    // DML mixes native files into the adopted snapshot: the COW
    // rewrite materializes the synthesized flag column as real bytes
    tKeep.delete(col("okey") % 2 === 1)
    val kAfterDelete = tKeep.read().count()
    val kBackupFrozen = s.read.parquet(backupP.toString).count()
    // drop_backup on a second partitioned source: one-time rewrite,
    // the clustering-optimizing option; the table owns its bytes
    val legacyP2 = wh.resolve("default").resolve("li_part2")
    s.read.parquet(backupP.toString) // the hive layout lives on there
      .write.partitionBy("flag").parquet(legacyP2.toString)
    val tp = cat.migrateTable("default", "li_part2", dropBackup = true)
    val pRows = tp.read().count()
    val pA = tp.readWhere(col("flag") === "A").count()
    val prunes = tp.readWhere(col("flag") === "A").inputFiles.length <
      tp.read().inputFiles.length
    val backupGone = !Files.exists(
      wh.resolve("default").resolve("li_part2_backup_"))
    Seq(
      ("1_rows_via_table", viaTable),
      ("2_rows_via_backup", viaBackup),
      ("3_migrated_files", migratedFiles),
      ("4_adopted_in_place", if (inPlace) 1L else 0L),
      ("5_rows_after_delete", afterDelete),
      ("6_backup_frozen_rows", backupFrozen),
      ("7_gc_refused", if (gcRefused) 1L else 0L),
      ("8_part_keep_rows_match", if (kRows == expRows) 1L else 0L),
      ("8b_part_keep_flag_match", if (kA == expA) 1L else 0L),
      ("8c_part_keep_prunes", if (kPrunes) 1L else 0L),
      ("8d_part_keep_in_place", if (kInPlace) 1L else 0L),
      ("8e_part_keep_after_delete", kAfterDelete),
      ("8f_part_keep_backup_frozen",
        if (kBackupFrozen == expRows) 1L else 0L),
      ("9_part_rows_match", if (pRows == expRows) 1L else 0L),
      ("a_part_flag_rows_match", if (pA == expA) 1L else 0L),
      ("b_part_flag_prunes", if (prunes) 1L else 0L),
      ("c_part_backup_dropped", if (backupGone) 1L else 0L))
      .toDF("observation", "value").orderBy("observation")
  }

  /** The SQL-entry twin of [[lakePricing]] (round 15, closing the
    * last trust gap the r14 verdict named): the ENTIRE lifecycle —
    * DDL, load, MOR DELETE, COW UPDATE, final aggregate — runs as
    * `spark.sql` strings through [[sql.GraftSqlCatalog]], the
    * reference's actual UX (ref demo.py:67-262 drives everything via
    * spark.sql), and the result is DuckDB-hash-checked. No GraftTable
    * method call appears in this builder: INSERT INTO … SELECT reads
    * the source parquet via `parquet.` path syntax, DELETE routes the
    * analyzer-intercepted row-level command onto the MOR write path,
    * UPDATE onto the COW path, and the SELECT plans through the V2
    * relation substitution. All-integer cents math, so the hash check
    * has zero float tolerance. Scale shape: identical to
    * q_lake_pricing_summary (one slice write, one MOR anti-join mask,
    * one COW rewrite bounded to files whose stats admit disc_c=0,
    * partial-agg'd 6-group aggregate). */
  private val sqlPricing = Q(
    "q_lake_sql_pricing",
    """WITH li AS (
      |  SELECT l_returnflag, l_linestatus,
      |    CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
      |    CAST(round(l_discount * 100) AS BIGINT) AS disc_c
      |  FROM lineitem WHERE l_orderkey % 5 = 0
      |), kept AS (
      |  SELECT * FROM li WHERE NOT disc_c >= 8
      |), upd AS (
      |  SELECT l_returnflag, l_linestatus,
      |    CASE WHEN disc_c = 0 THEN qty_c + 1 ELSE qty_c END AS qty_c,
      |    price_c, disc_c
      |  FROM kept
      |)
      |SELECT l_returnflag, l_linestatus,
      |  CAST(sum(qty_c) AS BIGINT) AS sum_qty_c,
      |  CAST(sum(price_c) AS BIGINT) AS sum_base_c,
      |  CAST(sum(price_c * (100 - disc_c)) AS BIGINT) AS sum_disc_c2,
      |  count(*) AS n
      |FROM upd GROUP BY 1, 2
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) { (s, dir) =>
    ensureSqlCatalog(s)
    val ns = s"sqlns_${System.nanoTime()}"
    s.sql(s"CREATE NAMESPACE graft.$ns")
    val tbl = s"graft.$ns.li_cents"
    s.sql(
      s"""CREATE TABLE $tbl (
         |  flag STRING, status STRING, qty_c BIGINT, price_c BIGINT,
         |  disc_c BIGINT)
         |USING graft TBLPROPERTIES (
         |  'write.delete.mode'='merge-on-read',
         |  'write.update.mode'='copy-on-write')""".stripMargin)
    s.sql(
      s"""INSERT INTO $tbl
         |SELECT l_returnflag, l_linestatus,
         |  CAST(round(l_quantity * 100) AS BIGINT),
         |  CAST(round(l_extendedprice * 100) AS BIGINT),
         |  CAST(round(l_discount * 100) AS BIGINT)
         |FROM parquet.`$dir/lineitem.parquet`
         |WHERE l_orderkey % 5 = 0""".stripMargin)
    s.sql(s"DELETE FROM $tbl WHERE disc_c >= 8")
    s.sql(s"UPDATE $tbl SET qty_c = qty_c + 1 WHERE disc_c = 0")
    s.sql(
      s"""SELECT flag AS l_returnflag, status AS l_linestatus,
         |  CAST(sum(qty_c) AS BIGINT) AS sum_qty_c,
         |  CAST(sum(price_c) AS BIGINT) AS sum_base_c,
         |  CAST(sum(price_c * (100 - disc_c)) AS BIGINT) AS sum_disc_c2,
         |  count(*) AS n
         |FROM $tbl GROUP BY flag, status
         |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** Time travel ORACLED (r16 — the reference's signature read,
    * demo.py:261/303/531, upgraded from spec-only to a DuckDB hash
    * check the way r15's q_lake_sql_pricing upgraded DML): slice A of
    * lineitem lands as snapshot 1, slice B as snapshot 2, and the
    * aggregate reads `VERSION AS OF` snapshot 1 through the SQL
    * catalog — DuckDB recomputes on slice A ALONE, so a historical
    * read that leaked any slice-B row, or masked a slice-A row, hash-
    * mismatches. All-integer cents; the snapshot id itself comes from
    * the `.history` metadata relation through SQL, so the whole walk
    * is spark.sql strings. An in-builder require proves the HEAD read
    * actually differs (the time travel isn't vacuously reading the
    * current table). */
  private val timeTravelSql = Q(
    "q_lake_time_travel_sql",
    """WITH a AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
      |  FROM lineitem WHERE l_orderkey % 7 = 1
      |)
      |SELECT flag, CAST(sum(price_c) AS BIGINT) AS sum_price_c,
      |  count(*) AS n
      |FROM a GROUP BY flag ORDER BY flag""".stripMargin
  ) { (s, dir) =>
    ensureSqlCatalog(s)
    val ns = s"sqlns_${System.nanoTime()}"
    s.sql(s"CREATE NAMESPACE graft.$ns")
    val tbl = s"graft.$ns.tt_li"
    s.sql(s"CREATE TABLE $tbl (flag STRING, price_c BIGINT) USING graft")
    s.sql(
      s"""INSERT INTO $tbl
         |SELECT l_returnflag,
         |  CAST(round(l_extendedprice * 100) AS BIGINT)
         |FROM parquet.`$dir/lineitem.parquet`
         |WHERE l_orderkey % 7 = 1""".stripMargin)
    // exactly one snapshot exists here, so max() pins it without
    // depending on timestamp ordering
    val snap1 = s.sql(s"SELECT max(snapshot_id) FROM $tbl.history")
      .head().getLong(0)
    s.sql(
      s"""INSERT INTO $tbl
         |SELECT l_returnflag,
         |  CAST(round(l_extendedprice * 100) AS BIGINT)
         |FROM parquet.`$dir/lineitem.parquet`
         |WHERE l_orderkey % 7 = 2""".stripMargin)
    val headRows = s.sql(s"SELECT count(*) FROM $tbl").head().getLong(0)
    val asOfRows = s.sql(
      s"SELECT count(*) FROM $tbl VERSION AS OF $snap1").head().getLong(0)
    require(headRows > asOfRows,
      s"time travel must see FEWER rows than head ($asOfRows vs " +
        s"$headRows) — otherwise this query proves nothing")
    s.sql(
      s"""SELECT flag, CAST(sum(price_c) AS BIGINT) AS sum_price_c,
         |  count(*) AS n
         |FROM $tbl VERSION AS OF $snap1
         |GROUP BY flag ORDER BY flag""".stripMargin)
  }

  /** MERGE INTO ORACLED (r16 — the highest-traffic DML form left
    * spec-only after r15): a three-verb merge over an orders slice —
    * conditional matched UPDATE, matched DELETE, not-matched INSERT —
    * executed entirely as spark.sql strings, replayed by DuckDB as
    * plain CTE set logic (kept-matched rows take the source value,
    * over-threshold matched rows vanish, unmatched source rows
    * append). Integer cents; the final aggregate buckets by k % 10 so
    * the dump stays small while covering every merged row. */
  private val sqlMerge = Q(
    "q_lake_sql_merge",
    """WITH t0 AS (
      |  SELECT o_orderkey AS k,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
      |  FROM orders WHERE o_orderkey % 4 IN (1, 2)
      |), src AS (
      |  SELECT o_orderkey AS k,
      |    CAST(round(o_totalprice * 100) AS BIGINT) + 7 AS val
      |  FROM orders WHERE o_orderkey % 4 IN (1, 3)
      |), merged AS (
      |  SELECT t0.k,
      |    CASE WHEN src.k IS NOT NULL THEN src.val ELSE t0.total_c END
      |      AS total_c
      |  FROM t0 LEFT JOIN src ON t0.k = src.k
      |  WHERE src.k IS NULL OR t0.total_c % 10 < 5
      |  UNION ALL
      |  SELECT src.k, src.val FROM src LEFT JOIN t0 ON src.k = t0.k
      |  WHERE t0.k IS NULL
      |)
      |SELECT CAST(k % 10 AS BIGINT) AS bucket,
      |  CAST(sum(total_c) AS BIGINT) AS sum_c, count(*) AS n
      |FROM merged GROUP BY 1 ORDER BY bucket""".stripMargin
  ) { (s, dir) =>
    ensureSqlCatalog(s)
    val ns = s"sqlns_${System.nanoTime()}"
    s.sql(s"CREATE NAMESPACE graft.$ns")
    val tbl = s"graft.$ns.ord_merge"
    s.sql(s"CREATE TABLE $tbl (k BIGINT, total_c BIGINT) USING graft")
    s.sql(
      s"""INSERT INTO $tbl
         |SELECT CAST(o_orderkey AS BIGINT),
         |  CAST(round(o_totalprice * 100) AS BIGINT)
         |FROM parquet.`$dir/orders.parquet`
         |WHERE o_orderkey % 4 IN (1, 2)""".stripMargin)
    s.sql(
      s"""MERGE INTO $tbl t
         |USING (
         |  SELECT CAST(o_orderkey AS BIGINT) AS k,
         |    CAST(round(o_totalprice * 100) AS BIGINT) + 7 AS val
         |  FROM parquet.`$dir/orders.parquet`
         |  WHERE o_orderkey % 4 IN (1, 3)) s
         |ON t.k = s.k
         |WHEN MATCHED AND t.total_c % 10 < 5 THEN
         |  UPDATE SET total_c = s.val
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT (k, total_c) VALUES (s.k, s.val)
         |""".stripMargin)
    s.sql(
      s"""SELECT CAST(k % 10 AS BIGINT) AS bucket,
         |  CAST(sum(total_c) AS BIGINT) AS sum_c, count(*) AS n
         |FROM $tbl GROUP BY 1 ORDER BY bucket""".stripMargin)
  }

  /** WAP publish ORACLED (r16): the write-audit-publish content law
    * as a hash check — slice A lands on main, slice B plus an audit
    * delete stage on a `spark.wap.branch` session branch (main
    * provably untouched mid-audit: an in-builder require pins its
    * row count), fast_forward publishes, and the final aggregate must
    * equal DuckDB computing ((A ∪ B) minus the deleted predicate)
    * from the raw parquet. A branch write that leaked onto main, a
    * publish that dropped staged rows, or a delete that missed the
    * branch all hash-mismatch. */
  private val wapPublish = Q(
    "q_lake_wap_publish",
    """WITH ab AS (
      |  SELECT l_orderkey AS okey,
      |    CAST(round(l_quantity * 100) AS BIGINT) AS qty_c
      |  FROM lineitem WHERE l_orderkey % 9 IN (1, 2)
      |), pub AS (
      |  SELECT * FROM ab WHERE NOT qty_c < 1000
      |)
      |SELECT CAST(okey % 10 AS BIGINT) AS bucket,
      |  CAST(sum(qty_c) AS BIGINT) AS sum_qty_c, count(*) AS n
      |FROM pub GROUP BY 1 ORDER BY bucket""".stripMargin
  ) { (outer, dir) =>
    // driver-gap-dominated bounded walk (r17 LakeJobProfile) —
    // AQE-off 2-partition private session; result oracle-unchanged
    val s = LakeQueries.tunedSession(outer)
    val li = graft.rel.Tables.lineitem(s, dir)
      .select(col("l_orderkey").cast("long").as("okey"),
        round(col("l_quantity") * 100).cast("long").as("qty_c"))
    val t = sliceTable(s, "graft-wap-", "wap_li",
      "okey BIGINT, qty_c BIGINT", Map.empty,
      li.filter(col("okey") % 9 === 1))
    val mainRows = t.read().count()
    s.conf.set("spark.wap.branch", "audit")
    try {
      t.append(li.filter(col("okey") % 9 === 2))
      t.delete(col("qty_c") < 1000L)
    } finally s.conf.unset("spark.wap.branch")
    require(t.read().count() == mainRows,
      "main must be untouched until the audit branch publishes")
    t.fastForward("main", t.refSnapshotId("audit"))
    t.read()
      .groupBy((col("okey") % 10).as("bucket"))
      .agg(sum("qty_c").as("sum_qty_c"), count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  /** Rollback ORACLED (r16): the undo law as a hash check — slice A
    * commits, a predicate delete commits, `rollback_to_snapshot`
    * walks the pointer back (an in-builder require pins that the
    * delete was visible before), slice B appends on top, and the
    * final aggregate must equal DuckDB computing A ∪ B with the
    * delete UNDONE byte-for-byte. A rollback that lost rows, kept the
    * delete, or resurrected the wrong snapshot hash-mismatches. */
  private val rollbackOracle = Q(
    "q_lake_rollback_restore",
    """WITH ab AS (
      |  SELECT l_orderkey AS okey,
      |    CAST(round(l_quantity * 100) AS BIGINT) AS qty_c
      |  FROM lineitem WHERE l_orderkey % 9 IN (4, 5)
      |)
      |SELECT CAST(okey % 10 AS BIGINT) AS bucket,
      |  CAST(sum(qty_c) AS BIGINT) AS sum_qty_c, count(*) AS n
      |FROM ab GROUP BY 1 ORDER BY bucket""".stripMargin
  ) { (outer, dir) =>
    // driver-gap-dominated bounded walk (r17 LakeJobProfile) —
    // AQE-off 2-partition private session; result oracle-unchanged
    val s = LakeQueries.tunedSession(outer)
    val li = graft.rel.Tables.lineitem(s, dir)
      .select(col("l_orderkey").cast("long").as("okey"),
        round(col("l_quantity") * 100).cast("long").as("qty_c"))
    val t = sliceTable(s, "graft-rb-", "rb_li",
      "okey BIGINT, qty_c BIGINT",
      Map("write.delete.mode" -> "merge-on-read"),
      li.filter(col("okey") % 9 === 4))
    val snap1 = t.currentSnapshot.get.snapshotId
    val full = t.read().count()
    t.delete(col("qty_c") < 1000L)
    require(t.read().count() < full,
      "the delete must be visible before the rollback undoes it")
    t.rollbackTo(snap1)
    t.append(li.filter(col("okey") % 9 === 5))
    t.read()
      .groupBy((col("okey") % 10).as("bucket"))
      .agg(sum("qty_c").as("sum_qty_c"), count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  override def all: Seq[Q] = Seq(
    decimalLake, lakePricing, sqlPricing, timeTravelSql, sqlMerge,
    wapPublish, rollbackOracle,
    complexTypes,
    ndvStats, timestampNtz, migrateScenario,
    lifecycle, timeTravel, metadataFiles, rewrite, erase,
    subjectAccess, summaryDiff,
    prunedRead, equalityDelete, sqlLifecycle, mergeUpsert,
    streamRoundTrip, changelog, changelogUpdates, streamChanges,
    partitionsRel,
    schemaEvolution, wap, rollback, incrementalAgg, incrementalMinhash,
    metadataRetention, streamErasure, sketchRollup, quantileRollup,
    invertedIndex,
    vectorIndex, bucketJoin, maintenance, runtimePrune, streamUpsert,
    tableClone, manifestSegments)

  /** One cached scenario-private tuned session per caller session
    * (AQE off, 2 shuffle partitions — the sketch-walk planner confs):
    * isolation without the per-invocation fresh-SessionState cost.
    * The caller's RUNTIME conf is re-copied onto the twin on EVERY
    * call (a few hundred conf sets — noise next to the walk), so a
    * conf the caller changes between invocations (timezone, ANSI
    * mode) still governs the next run; the two scenario overrides are
    * re-applied last. WEAK keys: a stopped/discarded caller session
    * must not be pinned (nor its twin) by this cache; all access is
    * under the map's monitor. */
  private val tunedSessions = new java.util.WeakHashMap[
    SparkSession, (SparkSession, scala.collection.mutable.Set[String])]
  private def tunedSession(outer: SparkSession): SparkSession =
    tunedSessions.synchronized {
      val (s, synced) = Option(tunedSessions.get(outer)).getOrElse {
        val fresh =
          (outer.newSession(), scala.collection.mutable.Set.empty[String])
        tunedSessions.put(outer, fresh)
        fresh
      }
      // fidelity both ways: a conf the caller UNSET since the last
      // sync must not linger on the twin — unset every key THIS sync
      // set that the caller no longer carries (only our own keys:
      // unsetting arbitrary twin keys would clobber its defaults)
      val outerAll = outer.conf.getAll
      for (k <- synced.toSeq if !outerAll.contains(k)) {
        try s.conf.unset(k)
        catch { case scala.util.control.NonFatal(_) => () }
        synced -= k
      }
      outerAll.foreach { case (k, v) =>
        try { s.conf.set(k, v); synced += k }
        catch { case scala.util.control.NonFatal(_) => () } // static conf
      }
      s.conf.set("spark.sql.adaptive.enabled", "false")
      s.conf.set("spark.sql.shuffle.partitions", "2")
      s
    }
}
