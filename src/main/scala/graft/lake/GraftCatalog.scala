package graft.lake

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Namespace + table registry over a warehouse directory — the
  * Spark-native stand-in for the reference's REST catalog
  * (/root/reference/docker-compose.yml:28-29) with the DDL surface the
  * demo uses (D1–D5, demo.py:67-85,166-171; .ipynb SHOW TBLPROPERTIES).
  *
  * Layout: <warehouse>/<namespace>/<table>/{data,metadata}.
  */
class GraftCatalog(spark: SparkSession, val warehouse: Path) {

  private def nsDir(ns: String): Path = warehouse.resolve(ns)
  private def tableDir(ns: String, t: String): Path = nsDir(ns).resolve(t)

  /** D1: CREATE NAMESPACE IF NOT EXISTS (demo.py:71). */
  def createNamespace(ns: String): Unit =
    Files.createDirectories(nsDir(ns))

  def namespaceExists(ns: String): Boolean = Files.isDirectory(nsDir(ns))

  /** D2: CREATE TABLE [IF NOT EXISTS] (demo.py:74-85). */
  def createTable(ns: String, name: String, schema: StructType,
      properties: Map[String, String] = Map.empty,
      ifNotExists: Boolean = true): GraftTable = {
    require(namespaceExists(ns), s"namespace $ns does not exist")
    if (tableExists(ns, name)) {
      if (ifNotExists) return loadTable(ns, name)
      throw new IllegalArgumentException(s"table $ns.$name already exists")
    }
    // a leftover registration pointer whose target vanished would make
    // the new table unloadable (resolution always follows the pointer)
    // — refuse loudly instead of creating an invisible table
    require(!Files.exists(tableDir(ns, name).resolve("location.text")),
      s"$ns.$name holds a stale registration pointer (its target is " +
        "gone); DROP TABLE it before creating a table under this name")
    GraftTable.create(spark, tableDir(ns, name), s"$ns.$name", schema,
      properties)
  }

  /** A registered (pointer) entry holds only `location.text` naming
    * the real table root; everything else resolves through it. */
  private def resolvedOf(dir: Path): Path = {
    val ptr = dir.resolve("location.text")
    if (Files.exists(ptr))
      Path.of(new String(Files.readAllBytes(ptr), "UTF-8").trim)
    else dir
  }

  def tableExists(ns: String, name: String): Boolean =
    Files.exists(resolvedOf(tableDir(ns, name))
      .resolve("metadata/version-hint.text"))

  def loadTable(ns: String, name: String): GraftTable =
    GraftTable.load(spark, resolvedOf(tableDir(ns, name)))

  /** register_table (Iceberg SparkCatalog procedure parity): adopt an
    * EXISTING graft table directory into this catalog as `ns.name`
    * WITHOUT copying or moving anything — the catalog records a
    * location pointer and every read/write resolves through it. The
    * workflows this serves: a table restored from backup, produced in
    * another pipeline's warehouse, or handed between catalogs.
    * Registering one table in several catalogs is safe: all handles
    * share one metadata directory and the fail-if-exists version
    * publish arbitrates concurrent commits exactly as it does for
    * same-catalog writers. [[dropTable]] on a registered entry deletes
    * only the pointer, never the target's data — Iceberg's
    * drop-without-purge semantics, automatically. */
  def registerTable(ns: String, name: String, location: Path): GraftTable = {
    require(namespaceExists(ns), s"namespace $ns does not exist")
    require(!tableExists(ns, name),
      s"table $ns.$name already exists")
    require(Files.exists(location.resolve("metadata/version-hint.text")),
      s"$location is not a graft table (no metadata/version-hint.text)")
    val dir = tableDir(ns, name)
    Files.createDirectories(dir)
    Files.write(dir.resolve("location.text"),
      location.toAbsolutePath.toString.getBytes("UTF-8"))
    loadTable(ns, name)
  }

  /** The Iceberg `snapshot` procedure: a zero-copy FORK of `source`
    * as `ns.name` — the new table's first snapshot references the
    * source's current data files in place (stats carried verbatim, so
    * pruning and bucket-local eligibility survive), and its future
    * writes land under its own directory without touching the source.
    * The fork is created with `gc.enabled=false`: expiry on it refuses
    * loudly, because it would delete bytes the SOURCE still owns —
    * exactly Iceberg's snapshot-table contract. Unlike
    * [[registerTable]] (one table, two names, shared commits), a fork
    * is an independent table that merely starts from the source's
    * bytes — the cheap staging/test copy a 100 TB migration rehearses
    * on. */
  def snapshotTable(ns: String, name: String,
      source: GraftTable): GraftTable = {
    require(namespaceExists(ns), s"namespace $ns does not exist")
    require(!tableExists(ns, name), s"table $ns.$name already exists")
    val t = GraftTable.create(spark, tableDir(ns, name), s"$ns.$name",
      source.schema, source.properties + ("gc.enabled" -> "false"))
    // forkInto refuses ineligible sources (MOR delete files, renamed
    // columns: "compact first"); don't leave the half-created empty
    // fork registered — a retry after compaction would then fail with
    // "table already exists". A cleanup failure must not mask the
    // actionable refusal: suppress it onto the original.
    try source.forkInto(t)
    catch {
      case scala.util.control.NonFatal(e) =>
        try dropTable(ns, name)
        catch { case scala.util.control.NonFatal(c) => e.addSuppressed(c) }
        throw e
    }
    t
  }

  /** The Iceberg `migrate` procedure — the third member of the import
    * trio (add_files = zero-rewrite file import, snapshot = zero-copy
    * fork, migrate = in-place takeover): convert a plain parquet
    * directory sitting at `ns.name` (a non-graft "source table", the
    * analog of Iceberg migrating a Hive/parquet table) into a graft
    * table under the SAME name. Sequence, mirroring Iceberg's
    * snapshot-then-take-over-the-name contract:
    *
    *  1. the source dir is atomically renamed to `<name>_backup_`
    *     (Iceberg's backup-table semantics — still readable as raw
    *     parquet afterwards);
    *  2. a graft table is created at `ns.name` with the files'
    *     inferred schema;
    *  3. the backup's files are adopted IN PLACE via absolute-path
    *     entries — no bytes move or copy, so a 100 TB migrate is
    *     metadata-only — and the table gets `gc.enabled=false`
    *     because its data files are shared with the backup (exactly
    *     the snapshot-fork discipline);
    *  4. with `dropBackup=true` the files are instead RENAMED into
    *     the table's own data dir (same-filesystem rename: still
    *     metadata-only) and the emptied backup dir is removed — the
    *     table owns its bytes, gc stays enabled, no backup remains.
    *
    * Any failure after step 1 tears the half-created table down and
    * moves the backup (including any files a partial step 4 already
    * renamed out) back to the source name — the source survives
    * byte-identical (file NAMES inside it may change; a raw parquet
    * dir reads by glob, not by name).
    *
    * Hive-partitioned sources (directory-encoded column values):
    * keep-backup adopts them REWRITE-FREE via
    * [[migratePartitionedInPlace]] (partition tuples on manifest
    * entries, columns synthesized at scan time); drop_backup runs
    * [[migratePartitioned]]'s one-time rewrite — the
    * clustering-optimizing option. */
  def migrateTable(ns: String, name: String,
      dropBackup: Boolean = false): GraftTable = {
    require(namespaceExists(ns), s"namespace $ns does not exist")
    val dir = tableDir(ns, name)
    require(Files.isDirectory(dir), s"$ns.$name does not exist")
    require(!tableExists(ns, name),
      s"$ns.$name is already a graft table; migrate converts plain " +
        "parquet directories")
    require(!Files.exists(dir.resolve("location.text")),
      s"$ns.$name is a registration pointer, not a migratable source")
    val srcFiles = Io.listRecursive(dir)
      .filter(_.getFileName.toString.endsWith(".parquet"))
    require(srcFiles.nonEmpty, s"no parquet files under $dir to migrate")
    // Hive-partitioned layouts encode column VALUES in directory
    // names. The keep-backup form adopts them REWRITE-FREE (r17,
    // Iceberg's actual migrate model): per-file partition tuples land
    // as manifest-entry min=max stats (pruning) and the columns are
    // synthesized at scan time from the directory names — zero bytes
    // touched. The drop_backup form instead runs a ONE-TIME rewrite
    // (values injected as real columns, clustered on the former
    // partition columns) — the clustering-optimizing option.
    val partitionDirs = srcFiles.flatMap { p =>
      dir.relativize(p).iterator().asScala.toSeq.init
        .map(_.toString).filter(_.contains("="))
    }.distinct
    // with drop_backup the source directory is deleted afterwards —
    // refuse if it holds anything beyond parquet + KNOWN write
    // artifacts, or user bytes would vanish. The whitelist names the
    // actual artifact shapes writers leave (not "any leading _ or ."
    // — a user's '.env' or '_notes.md' must refuse, not get swept).
    if (dropBackup) {
      val strays = Io.listRecursive(dir).filter { p =>
        val n = p.getFileName.toString
        !n.endsWith(".parquet") && !GraftCatalog.isWriteArtifact(n)
      }
      require(strays.isEmpty,
        s"$ns.$name holds non-parquet content (${strays.take(3)
          .mkString(", ")}); migrate without drop_backup, or move " +
          "those files out first")
    }
    if (partitionDirs.nonEmpty)
      return if (dropBackup) migratePartitioned(ns, name, dir, srcFiles)
        else migratePartitionedInPlace(ns, name, dir)
    // schema inference must succeed BEFORE the source is touched —
    // unreadable/conflicting files refuse with the source intact
    val schema = spark.read.parquet(srcFiles.map(_.toString): _*).schema
    val backup = nsDir(ns).resolve(s"${name}_backup_")
    require(!Files.exists(backup),
      s"backup target $backup already exists; remove or rename it first")
    Files.move(dir, backup)
    try {
      val files = Io.listRecursive(backup)
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .sortBy(_.toString)
      val props = if (dropBackup) Map.empty[String, String]
        else Map("gc.enabled" -> "false")
      val t = GraftTable.create(spark, dir, s"$ns.$name", schema, props)
      t.importParquetFiles(files,
        placement = if (dropBackup) "move" else "in-place",
        origin = "migrate")
      if (dropBackup) {
        val leftovers = Files.walk(backup)
        try leftovers.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
        finally leftovers.close()
      }
      t
    } catch {
      case scala.util.control.NonFatal(e) =>
        try {
          // files a partial move-placement already renamed into the
          // half-created table go back into the backup first
          val data = dir.resolve("data")
          if (Files.isDirectory(data))
            Io.listRecursive(data)
              .filter(_.getFileName.toString.endsWith(".parquet"))
              .foreach(p => Files.move(p, backup.resolve(p.getFileName)))
          dropTable(ns, name)
          Files.move(backup, dir)
        } catch {
          case scala.util.control.NonFatal(c) => e.addSuppressed(c)
        }
        throw e
    }
  }

  /** Hive-partitioned migrate, keep-backup form (r17): REWRITE-FREE
    * adoption — the model Iceberg's own migrate uses for partitioned
    * warehouses. The source dir renames to `<name>_backup_` (same-FS,
    * metadata-only), the graft table adopts the files IN PLACE via
    * absolute-path entries, each entry carrying its directory-derived
    * partition tuple as min=max column stats (partition predicates
    * prune from the manifest alone), and scans synthesize the columns
    * from the directory names under `basePath` — Spark's native
    * partitioned read, typed by the inferred schema. No data byte
    * moves, copies, or rewrites: a 100 TB partitioned migrate stays
    * metadata-only. gc.enabled=false because the backup still owns
    * the bytes (the snapshot-fork discipline). All validation happens
    * inside [[GraftTable.importHivePartitioned]] BEFORE its commit; a
    * failure tears the half-created table down and restores the
    * source byte-identical (nothing ever moves out of the backup). */
  private def migratePartitionedInPlace(ns: String, name: String,
      dir: Path): GraftTable = {
    // schema inference (typed partition discovery included) must
    // succeed BEFORE the source is touched; partition columns land
    // LAST in the inferred schema, typed by Spark's partition
    // inference (date/int/string) — same as a raw partitioned read
    val schema = spark.read.parquet(dir.toString).schema
    val backup = nsDir(ns).resolve(s"${name}_backup_")
    require(!Files.exists(backup),
      s"backup target $backup already exists; remove or rename it first")
    Files.move(dir, backup)
    try {
      val files = Io.listRecursive(backup)
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .sortBy(_.toString)
      val t = GraftTable.create(spark, dir, s"$ns.$name", schema,
        Map("gc.enabled" -> "false",
          GraftTable.AdoptedBaseProp ->
            backup.toAbsolutePath.normalize().toString))
      t.importHivePartitioned(files, backup)
      t
    } catch {
      case scala.util.control.NonFatal(e) =>
        try {
          dropTable(ns, name)
          Files.move(backup, dir)
        } catch {
          case scala.util.control.NonFatal(c) => e.addSuppressed(c)
        }
        throw e
    }
  }

  /** Hive-partitioned migrate, drop_backup form (r16):
    * directory-encoded partition VALUES become real columns via a
    * ONE-TIME rewrite — unlike the keep-backup adoption this is NOT
    * metadata-only, which is what makes it the CLUSTERING-optimizing
    * option (the rewrite re-lays the bytes). The rewritten table
    * CLUSTERS on the former partition columns (`write.clustered-by`
    * identity fields, nesting order preserved), so the day/key
    * predicates that pruned directories before the migrate keep
    * pruning via file stats after it. Partition column TYPES come
    * from Spark's partition inference (date/int/string), same as a
    * raw partitioned read. Failure before the rewrite commits tears
    * the half-created table down and restores the source dir —
    * byte-identical, since the rewrite never renames source files. */
  private def migratePartitioned(ns: String, name: String, dir: Path,
      srcFiles: Seq[Path]): GraftTable = {
    // partition column order = directory nesting order of the leafs
    val partCols = dir.relativize(srcFiles.head).iterator().asScala
      .toSeq.init.map(_.toString).filter(_.contains("="))
      .map(_.split("=", 2)(0))
    require(partCols.nonEmpty, s"$ns.$name: no partition columns found")
    // schema inference (partition discovery included) must succeed
    // BEFORE the source is touched
    val schema = spark.read.parquet(dir.toString).schema
    partCols.foreach(c => require(
      schema.fieldNames.exists(_.equalsIgnoreCase(c)),
      s"partition column $c missing from inferred schema " +
        s"(${schema.fieldNames.mkString(",")})"))
    val backup = nsDir(ns).resolve(s"${name}_backup_")
    require(!Files.exists(backup),
      s"backup target $backup already exists; remove or rename it first")
    Files.move(dir, backup)
    // rollback scope ends at the rewrite COMMIT: once append() landed
    // the table owns the only complete copy of the rows, so a failure
    // during the backup sweep below must KEEP the table — rolling
    // back there would drop the committed table and restore a backup
    // the sweep already partially deleted (permanent data loss)
    val t = try {
      val df = spark.read.parquet(backup.toString)
      val tt = GraftTable.create(spark, dir, s"$ns.$name", schema,
        Map(GraftTable.ClusterProp -> partCols.mkString(",")))
      tt.append(df)
      tt
    } catch {
      case scala.util.control.NonFatal(e) =>
        try {
          dropTable(ns, name)
          Files.move(backup, dir)
        } catch {
          case scala.util.control.NonFatal(c) => e.addSuppressed(c)
        }
        throw e
    }
    try {
      val leftovers = Files.walk(backup)
      try leftovers.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally leftovers.close()
    } catch {
      case scala.util.control.NonFatal(e) =>
        throw new IllegalStateException(
          s"migrate committed $ns.$name (the table is complete and " +
            s"usable) but could not remove the backup at $backup — " +
            "remove it manually", e)
    }
    t
  }

  /** D3: DROP TABLE IF EXISTS (demo.py:70) — recursive delete, like the
    * demo's REST purge (demo.py:67). */
  def dropTable(ns: String, name: String): Boolean = {
    val dir = tableDir(ns, name)
    if (!Files.exists(dir)) return false
    val all = Files.walk(dir)
    try all.sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(Files.deleteIfExists(_))
    finally all.close()
    true
  }

  def listTables(ns: String): Seq[String] =
    if (!namespaceExists(ns)) Nil
    else Files.list(nsDir(ns)).iterator().asScala
      .filter(p => Files.exists(
        resolvedOf(p).resolve("metadata/version-hint.text")))
      .map(_.getFileName.toString).toSeq.sorted

  /** D4: ALTER TABLE SET TBLPROPERTIES (demo.py:166-171). */
  def setTableProperties(ns: String, name: String,
      props: Map[String, String]): Unit =
    loadTable(ns, name).setProperties(props)

  /** D5: SHOW TBLPROPERTIES as a relation (.ipynb:214,393) — includes
    * the synthetic keys the reference's Iceberg output shows
    * (current-snapshot-id / format / format-version). */
  def showTableProperties(ns: String, name: String): DataFrame = {
    import spark.implicits._
    loadTable(ns, name).enrichedProperties.toSeq.sortBy(_._1)
      .toDF("key", "value")
  }

  /** DESCRIBE EXTENDED as a relation (ref README.md:66): column schema
    * followed by the detailed section — location, format, snapshot
    * state, and the write-mode properties that decide COW vs MOR. */
  def describeExtended(ns: String, name: String): DataFrame = {
    import spark.implicits._
    val t = loadTable(ns, name)
    val cols = t.schema.fields.toSeq.map(f =>
      (f.name, f.dataType.simpleString, ""))
    val snaps = t.meta.snapshots
    val detail = Seq(
      ("", "", ""),
      ("# Detailed Table Information", "", ""),
      ("Name", t.name, ""),
      ("Location", t.root.toAbsolutePath.toString, ""),
      ("Provider", "graft", ""),
      ("Format", "graft/parquet", ""),
      ("Format-version", t.meta.formatVersion.toString, ""),
      ("Current-snapshot-id",
        t.currentSnapshot.map(_.snapshotId.toString).getOrElse("none"), ""),
      ("Snapshot-count", snaps.size.toString, ""),
      ("Last-operation", snaps.lastOption.map(_.operation)
        .getOrElse("none"), ""),
      ("Delete-mode", t.properties.getOrElse("write.delete.mode",
        "copy-on-write"), ""),
      ("Update-mode", t.properties.getOrElse("write.update.mode",
        "copy-on-write"), "")) ++
      t.properties.toSeq.sortBy(_._1).map { case (k, v) =>
        (s"Property: $k", v, "")
      }
    (cols ++ detail).toDF("col_name", "data_type", "comment")
  }
}

object GraftCatalog {
  /** The write-artifact names a parquet writer (Spark, Hadoop
    * committers) leaves next to data files — the ONLY non-parquet
    * content `migrate(drop_backup)` may silently destroy. Anything
    * else in the source dir refuses the drop_backup form. */
  private[lake] def isWriteArtifact(name: String): Boolean =
    name == "_SUCCESS" || name == "_metadata" ||
      name == "_common_metadata" || name.endsWith(".crc") ||
      name.startsWith("_committed_") || name.startsWith("_started_") ||
      name.startsWith("_temporary")
}
