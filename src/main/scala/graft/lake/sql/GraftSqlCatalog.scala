package graft.lake.sql

import java.nio.file.{Files, Path}
import java.util.{Collections, Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.{GraftCatalog, GraftTable}

/** GraftLake's Spark catalog plugin — the piece that makes the
  * reference's SQL surface work verbatim through `spark.sql` with no
  * custom parser (ref notebooks/iceberg_pii_deletion_demo.py):
  *
  *   spark.conf.set("spark.sql.catalog.graft",
  *     "graft.lake.sql.GraftSqlCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/path/wh")
  *
  *   CREATE NAMESPACE graft.pii                      (demo.py:71)
  *   CREATE TABLE graft.pii.pii_data (...) USING graft
  *     TBLPROPERTIES (...)                           (demo.py:74-85)
  *   INSERT INTO graft.pii.pii_data VALUES (...)     (demo.py:105-110)
  *   ALTER TABLE ... SET TBLPROPERTIES (...)         (demo.py:166-171)
  *   DELETE FROM ... WHERE case_id = 'x'             (demo.py:177-180)
  *   UPDATE ... SET ... WHERE ...                    (demo.py:228-235)
  *   SELECT * FROM t VERSION AS OF <id>              (demo.py:261)
  *   SELECT * FROM graft.pii.pii_data.files          (demo.py:120,205)
  *   CALL graft.system.expire_snapshots(...)         (demo.py:289-296)
  *   CALL graft.system.remove_orphan_files(...)      (demo.py:341-369)
  *   CALL graft.system.rewrite_data_files(...)       (demo.py:419-433)
  *   CALL graft.system.rewrite_position_delete_files (demo.py:437-447)
  *
  * Tables resolve lazily per call (metadata lives on disk), so
  * concurrent sessions see each other's commits. Identifier layout:
  * namespace directories under the warehouse, one directory per table.
  */
class GraftSqlCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catalogName: String = "graft"
  private var warehouse: Path = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Path.of(options.getOrDefault("warehouse",
      s"spark-warehouse/$name"))
  }

  override def name(): String = catalogName

  private def session: SparkSession = SparkSession.active
  private def cat: GraftCatalog = new GraftCatalog(session, warehouse)
  private def nsPath(namespace: Array[String]): String =
    namespace.mkString("/")

  // ---- namespaces ----

  override def namespaceExists(namespace: Array[String]): Boolean =
    cat.namespaceExists(nsPath(namespace))

  override def listNamespaces(): Array[Array[String]] = {
    if (!Files.isDirectory(warehouse)) return Array.empty
    Files.list(warehouse).iterator().asScala
      .filter(Files.isDirectory(_))
      .map(p => Array(p.getFileName.toString)).toArray
  }

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    else Array.empty

  override def loadNamespaceMetadata(namespace: Array[String])
      : JMap[String, String] =
    if (namespaceExists(namespace)) Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    if (namespaceExists(namespace))
      throw new NamespaceAlreadyExistsException(namespace)
    cat.createNamespace(nsPath(namespace))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "GraftLake namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    if (!cascade && listTables(namespace).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty")
    val dir = namespace.foldLeft(warehouse)(_.resolve(_))
    val all = Files.walk(dir)
    try all.sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(Files.deleteIfExists(_))
    finally all.close()
    true
  }

  // ---- tables ----

  /** The Iceberg-style metadata relations, addressable as a fourth
    * identifier part: `SELECT * FROM graft.<ns>.<table>.files` (ref
    * demo.py:120,205; file_summary_utils.py drives history/snapshots/
    * all_entries the same way). */
  private val metadataTables = Set("files", "history", "snapshots",
    "all_entries", "all_manifests", "metadata_log_entries", "refs",
    "position_deletes", "entries", "manifests", "data_files",
    "delete_files", "all_files", "all_data_files", "all_delete_files",
    "partitions", "stats")

  override def tableExists(ident: Identifier): Boolean =
    cat.tableExists(nsPath(ident.namespace), ident.name) ||
      metadataIdent(ident).isDefined

  private def metadataIdent(ident: Identifier)
      : Option[(GraftTable, String)] =
    if (ident.namespace.length >= 2 && metadataTables(ident.name) &&
        cat.tableExists(nsPath(ident.namespace.init),
          ident.namespace.last)) {
      Some((cat.loadTable(nsPath(ident.namespace.init),
        ident.namespace.last), ident.name))
    } else None

  override def loadTable(ident: Identifier): Table = {
    if (cat.tableExists(nsPath(ident.namespace), ident.name))
      new GraftSqlTable(fullName(ident),
        cat.loadTable(nsPath(ident.namespace), ident.name))
    else metadataIdent(ident) match {
      case Some((t, kind)) =>
        new GraftMetadataSqlTable(fullName(ident), t, kind)
      case None => throw new NoSuchTableException(ident)
    }
  }

  /** `VERSION AS OF <snapshot-id | 'ref-name'>` (ref demo.py:261
    * snapshot-id read; demo.py:300-306 shows the expired-snapshot
    * failure, which surfaces here at read time via snapshotOrFail).
    * A non-numeric version resolves as a branch/tag name, like
    * Iceberg's VERSION AS OF 'branch'. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val base = loadTable(ident)
    base match {
      case g: GraftSqlTable =>
        val snapId = try version.toLong catch {
          case _: NumberFormatException =>
            try g.graft.refSnapshotId(version) catch {
              // an unknown ref becomes the clearer neither-id-nor-ref
              // message; anything else (e.g. main on an empty table:
              // "branch main has no snapshots yet") names the real
              // cause and must pass through
              case _: graft.lake.UnknownRefException =>
                throw new IllegalArgumentException(
                  s"'$version' is neither a snapshot id nor a " +
                    s"branch/tag of ${fullName(ident)}")
            }
        }
        new GraftSqlTable(fullName(ident), g.graft, Some(snapId))
      case other => other
    }
  }

  /** `TIMESTAMP AS OF` — Spark hands micros since epoch; resolve to
    * the latest MAIN-ancestry snapshot at or before that instant
    * ([[GraftTable.snapshotAsOfMs]] — branch/WAP-staged snapshots
    * share the snapshot list but were never published, so a timestamp
    * read must not see them). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val base = loadTable(ident)
    base match {
      case g: GraftSqlTable =>
        val ms = timestamp / 1000L
        val snap = g.graft.snapshotAsOfMs(ms).getOrElse(
          throw new IllegalArgumentException(
            s"no snapshot of ${fullName(ident)} at or before $ms"))
        new GraftSqlTable(fullName(ident), g.graft, Some(snap.snapshotId))
      case other => other
    }
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    cat.listTables(nsPath(namespace))
      .map(t => Identifier.of(namespace, t)).toArray
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: JMap[String, String]): Table = {
    // PARTITIONED BY maps to range-clustered appends: every insert
    // clusters files on these fields so per-file stats prune like
    // partition pruning — without directory explosion on
    // high-cardinality keys (the 100 TB ingest path, now SQL-visible).
    // The full Iceberg transform ladder carries through to
    // ClusterSpec: identity, hours/days/months/years, bucket, truncate.
    val clusterCols = partitions.toSeq.map { tr =>
      def ref: String = tr.references().head.fieldNames().mkString(".")
      def intArg: Int = tr.arguments().collectFirst {
        case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
          l.value() match {
            case i: java.lang.Integer => i.intValue()
            case l2: java.lang.Long => l2.intValue()
          }
      }.getOrElse(throw new UnsupportedOperationException(
        s"${tr.name()} transform needs an integer argument: " +
          tr.describe()))
      tr.name() match {
        case "identity" => ref
        case "hours" => s"hours($ref)"
        case "days" => s"days($ref)"
        case "months" => s"months($ref)"
        case "years" => s"years($ref)"
        case "bucket" => s"bucket($intArg,$ref)"
        case "truncate" => s"truncate($intArg,$ref)"
        case other => throw new UnsupportedOperationException(
          s"GraftLake supports identity, hours, days, months, years, " +
            s"bucket, and truncate PARTITIONED BY transforms; got " +
            s"$other in ${tr.describe()}")
      }
    }
    if (cat.tableExists(nsPath(ident.namespace), ident.name))
      throw new TableAlreadyExistsException(ident)
    if (!namespaceExists(ident.namespace))
      throw new NoSuchNamespaceException(ident.namespace)
    // provider/location/owner are Spark bookkeeping, not table props
    val props = properties.asScala.toMap -- Seq(
      TableCatalog.PROP_PROVIDER, TableCatalog.PROP_LOCATION,
      TableCatalog.PROP_OWNER, TableCatalog.PROP_EXTERNAL,
      TableCatalog.PROP_COMMENT) ++
      (if (clusterCols.nonEmpty)
        Map("write.clustered-by" -> clusterCols.mkString(","))
      else Map.empty)
    val t = cat.createTable(nsPath(ident.namespace), ident.name, schema,
      props, ifNotExists = false)
    new GraftSqlTable(fullName(ident), t)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val t = cat.loadTable(nsPath(ident.namespace), ident.name)
    val sets = changes.collect {
      case s: TableChange.SetProperty => s.property -> s.value
    }.toMap
    val removes = changes.collect {
      case r: TableChange.RemoveProperty => r.property
    }
    // nested paths (struct subfields at ANY depth, "a.b.c…") route to
    // the *NestedColumn ops with the dotted parent path — GraftTable
    // resolves and refuses non-struct segments loudly
    def parentPath(names: Array[String]): String =
      names.init.mkString(".")
    val adds = changes.collect {
      case a: TableChange.AddColumn if a.fieldNames.length == 1 =>
        StructField(a.fieldNames.head, a.dataType, nullable = true)
    }
    val nestedAdds = changes.collect {
      case a: TableChange.AddColumn if a.fieldNames.length != 1 =>
        parentPath(a.fieldNames) ->
          StructField(a.fieldNames.last, a.dataType, nullable = true)
    }
    val drops = changes.collect {
      case d: TableChange.DeleteColumn if d.fieldNames.length == 1 =>
        d.fieldNames.head
    }
    val nestedDrops = changes.collect {
      case d: TableChange.DeleteColumn if d.fieldNames.length != 1 =>
        parentPath(d.fieldNames) -> d.fieldNames.last
    }
    val renames = changes.collect {
      case r: TableChange.RenameColumn if r.fieldNames.length == 1 =>
        r.fieldNames.head -> r.newName
    }
    val nestedRenames = changes.collect {
      case r: TableChange.RenameColumn if r.fieldNames.length != 1 =>
        (parentPath(r.fieldNames), r.fieldNames.last, r.newName)
    }
    val retypes = changes.collect {
      case u: TableChange.UpdateColumnType if u.fieldNames.length == 1 =>
        u.fieldNames.head -> u.newDataType
    }
    val nestedRetypes = changes.collect {
      case u: TableChange.UpdateColumnType if u.fieldNames.length != 1 =>
        (parentPath(u.fieldNames), u.fieldNames.last, u.newDataType)
    }
    val unsupported = changes.filter {
      case _: TableChange.SetProperty | _: TableChange.RemoveProperty |
           _: TableChange.AddColumn | _: TableChange.DeleteColumn |
           _: TableChange.RenameColumn | _: TableChange.UpdateColumnType =>
        false
      case _ => true
    }
    if (unsupported.nonEmpty) throw new UnsupportedOperationException(
      s"unsupported ALTER TABLE changes: ${unsupported.mkString(", ")}")
    if (adds.nonEmpty) t.addColumns(adds)
    nestedAdds.foreach { case (p, f) => t.addNestedColumn(p, f) }
    if (drops.nonEmpty) t.dropColumns(drops)
    nestedDrops.foreach { case (p, s) => t.dropNestedColumn(p, s) }
    renames.foreach { case (from, to) => t.renameColumn(from, to) }
    nestedRenames.foreach { case (p, f, to) =>
      t.renameNestedColumn(p, f, to) }
    retypes.foreach { case (c, to) => t.widenColumn(c, to) }
    nestedRetypes.foreach { case (p, s, to) =>
      t.widenNestedColumn(p, s, to) }
    if (removes.nonEmpty) t.updateProperties(removes, sets)
    else if (sets.nonEmpty) t.setProperties(sets)
    new GraftSqlTable(fullName(ident), t)
  }

  override def dropTable(ident: Identifier): Boolean =
    cat.dropTable(nsPath(ident.namespace), ident.name)

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent))
      throw new TableAlreadyExistsException(newIdent)
    val from = oldIdent.namespace.foldLeft(warehouse)(_.resolve(_))
      .resolve(oldIdent.name)
    val to = newIdent.namespace.foldLeft(warehouse)(_.resolve(_))
      .resolve(newIdent.name)
    Files.createDirectories(to.getParent)
    Files.move(from, to)
  }

  private def fullName(ident: Identifier): String =
    (catalogName +: ident.namespace :+ ident.name).mkString(".")

  // ---- procedures (CALL graft.system.<proc>(...)) ----

  override def listProcedures(namespace: Array[String])
      : Array[Identifier] =
    GraftProcedures.names.map(n =>
      Identifier.of(Array("system"), n)).toArray

  override def loadProcedure(ident: Identifier): UnboundProcedure =
    GraftProcedures.load(this, ident.name).getOrElse(
      throw new IllegalArgumentException(
        s"unknown procedure ${ident.name}; expected one of " +
          GraftProcedures.names.mkString(", ")))

  private[sql] def resolveTableArg(tableName: String): GraftTable = {
    val (ns, t) = splitTableArg(tableName)
    cat.loadTable(ns, t)
  }

  private[sql] def registerTableArg(tableName: String,
      location: String): GraftTable = {
    val (ns, t) = splitTableArg(tableName)
    cat.registerTable(ns, t, Path.of(location))
  }

  private[sql] def snapshotTableArg(sourceTable: String,
      tableName: String): GraftTable = {
    val (ns, t) = splitTableArg(tableName)
    cat.snapshotTable(ns, t, resolveTableArg(sourceTable))
  }

  private[sql] def migrateTableArg(tableName: String,
      dropBackup: Boolean): (GraftTable, Option[String]) = {
    val (ns, t) = splitTableArg(tableName)
    val table = cat.migrateTable(ns, t, dropBackup)
    val backup = if (dropBackup) None
      else Some(warehouse.resolve(ns).resolve(s"${t}_backup_")
        .toAbsolutePath.toString)
    (table, backup)
  }

  private def splitTableArg(tableName: String): (String, String) = {
    val parts = tableName.split("\\.").toSeq
    val cleaned = if (parts.headOption.contains(catalogName))
      parts.tail else parts
    require(cleaned.length >= 2,
      s"table argument must be <namespace>.<table>, got '$tableName'")
    (cleaned.init.mkString("/"), cleaned.last)
  }
}

/** The maintenance procedures the reference invokes via SQL CALL
  * (demo.py:289-296,341-369,419-447), surfaced through Spark 4's
  * native ProcedureCatalog — no parser extension needed. */
private object GraftProcedures {

  val names: Array[String] = Array("expire_snapshots",
    "remove_orphan_files", "rewrite_data_files",
    "rewrite_position_delete_files", "rewrite_manifests",
    "rollback_to_snapshot",
    "set_current_snapshot", "cherrypick_snapshot",
    "create_changelog_view", "create_branch", "create_tag",
    "drop_ref", "fast_forward", "add_files", "ancestors_of",
    "maintain", "register_table", "snapshot", "migrate",
    "compute_table_stats")

  private def param(name: String, dt: DataType) =
    ProcedureParameter.in(name, dt).build()

  private def paramD(name: String, dt: DataType, default: String) =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private def outRow(values: Any*): InternalRow =
    InternalRow.fromSeq(values.map {
      case s: String => UTF8String.fromString(s)
      case other => other
    })

  private def resultScan(schema: StructType,
      result: Seq[InternalRow]): java.util.Iterator[Scan] = {
    val resultRows = result.toArray
    val scan: Scan = new LocalScan {
      override def rows(): Array[InternalRow] = resultRows
      override def readSchema(): StructType = schema
    }
    Collections.singletonList(scan).iterator()
  }

  def load(catalog: GraftSqlCatalog, name: String)
      : Option[UnboundProcedure] = name match {
    // Both pruning knobs optional, as in Iceberg's CALL signature
    // (ref README.md:88-93 shows the timestamp form): older_than
    // alone, retain_last alone ("keep the newest n"), or both.
    case "expire_snapshots" => Some(procedure(name,
      Seq(param("table", StringType),
        paramD("older_than", TimestampType, "NULL"),
        paramD("retain_last", IntegerType, "1"),
        // Iceberg's targeted form: expire EXACTLY these ids (refuses
        // the current snapshot and ref-pinned ones); when given, the
        // time-horizon knobs are ignored
        paramD("snapshot_ids", ArrayType(LongType), "NULL")),
      StructType.fromDDL("expired_snapshot_id BIGINT"),
      (args: InternalRow) => {
        val t = catalog.resolveTableArg(args.getUTF8String(0).toString)
        if (!args.isNullAt(3)) {
          val ids = args.getArray(3).toLongArray().toSeq
          t.expireSnapshotsByIds(ids).map(id => outRow(id))
        } else {
          val olderThanMs =
            if (args.isNullAt(1)) System.currentTimeMillis()
            else args.getLong(1) / 1000L
          val retain = args.getInt(2)
          t.expireSnapshots(olderThanMs, retain).map(id => outRow(id))
        }
      }))
    case "ancestors_of" => Some(procedure(name,
      Seq(param("table", StringType),
        paramD("snapshot_id", LongType, "NULL")),
      StructType.fromDDL(
        "snapshot_id BIGINT, timestamp_ms BIGINT, parent_id BIGINT"),
      (args: InternalRow) => {
        val t = catalog.resolveTableArg(args.getUTF8String(0).toString)
        val start = if (args.isNullAt(1)) None else Some(args.getLong(1))
        t.ancestorsOf(start).map(s =>
          outRow(s.snapshotId, s.timestampMs, s.parentId.orNull))
      }))
    case "remove_orphan_files" => Some(procedure(name,
      Seq(param("table", StringType),
        param("older_than", TimestampType),
        param("force", BooleanType)),
      StructType.fromDDL("orphan_file_location STRING"),
      (args: InternalRow) => {
        val t = catalog.resolveTableArg(args.getUTF8String(0).toString)
        val olderThanMs = args.getLong(1) / 1000L
        t.removeOrphanFiles(olderThanMs, force = args.getBoolean(2))
          .map(p => outRow(p))
      }))
    case "rewrite_data_files" => Some(procedure(name,
      Seq(param("table", StringType),
        param("rewrite_all", BooleanType),
        param("target_file_size_bytes", LongType),
        // Iceberg's strategy=>'sort' analog: "c1,c2" range-clusters,
        // "zorder(c1,c2)" interleaves — empty means bin-pack only
        paramD("sort_order", StringType, "''")),
      StructType.fromDDL("rewritten_data_files_count INT"),
      (args: InternalRow) => {
        val t = catalog.resolveTableArg(args.getUTF8String(0).toString)
        val sortOrder = Option(args.getUTF8String(3))
          .map(_.toString.trim).filter(_.nonEmpty)
        val snap = t.rewriteDataFiles(Map(
          "rewrite-all" -> args.getBoolean(1).toString,
          "target-file-size-bytes" -> args.getLong(2).toString) ++
          sortOrder.map("sort-order" -> _))
        val n = snap.flatMap(_.summary.get("rewritten-data-files"))
          .map(_.toInt).getOrElse(0)
        Seq(outRow(n))
      }))
    // Iceberg rewrite_manifests parity: compact the current
    // snapshot's manifest SEGMENTS into one (metadata-only; data
    // files untouched) once at least min_count_to_rewrite exist
    case "rewrite_manifests" => Some(procedure(name,
      Seq(param("table", StringType),
        paramD("min_count_to_rewrite", IntegerType, "2")),
      StructType.fromDDL(
        "rewritten_manifests_count INT, added_manifests_count INT"),
      (args: InternalRow) => {
        val t = catalog.resolveTableArg(args.getUTF8String(0).toString)
        t.rewriteManifests(args.getInt(1)) match {
          case Some(s) => Seq(outRow(
            s.summary.getOrElse("manifests-replaced", "0").toInt,
            s.summary.getOrElse("manifests-created", "0").toInt))
          case None => Seq(outRow(0, 0))
        }
      }))
    // the scheduler entry point: evaluate the table's TBLPROPERTIES
    // maintenance policies and run whatever tripped (GraftTable
    // .maintain scaladoc documents the policy surface) — a cron loop
    // over `CALL graft.system.maintain(table => ...)` is the whole
    // fleet scheduler
    // Iceberg SparkCatalog register_table parity: adopt an existing
    // table directory into the catalog (location = the table root; our
    // metadata is a directory, not a single metadata_file) — no data
    // moves, drop removes only the pointer
    case "register_table" => Some(procedure(name,
      Seq(param("table", StringType),
        param("location", StringType)),
      StructType.fromDDL("table STRING, current_snapshot_id BIGINT"),
      (args: InternalRow) => {
        val tbl = args.getUTF8String(0).toString
        val t = catalog.registerTableArg(tbl,
          args.getUTF8String(1).toString)
        Seq(outRow(tbl,
          t.currentSnapshot.map(_.snapshotId).getOrElse(-1L)))
      }))
    // Iceberg snapshot-procedure parity: zero-copy FORK (independent
    // table starting from the source's bytes; gc disabled on the fork)
    case "snapshot" => Some(procedure(name,
      Seq(param("source_table", StringType),
        param("table", StringType)),
      StructType.fromDDL("table STRING, current_snapshot_id BIGINT"),
      (args: InternalRow) => {
        val tbl = args.getUTF8String(1).toString
        val t = catalog.snapshotTableArg(
          args.getUTF8String(0).toString, tbl)
        Seq(outRow(tbl,
          t.currentSnapshot.map(_.snapshotId).getOrElse(-1L)))
      }))
    // Iceberg compute_table_stats parity (the Puffin-NDV procedure):
    // ANALYZE per-column KMV NDV sketches into table metadata;
    // readable back via <table>.stats, folded forward by appends,
    // consumed by the runtime-prune route's refuse decision.
    case "compute_table_stats" => Some(procedure(name,
      Seq(param("table", StringType),
        paramD("columns", ArrayType(StringType), "NULL")),
      StructType.fromDDL("column STRING, ndv BIGINT"),
      (args: InternalRow) => {
        val t = catalog.resolveTableArg(args.getUTF8String(0).toString)
        val cols = if (args.isNullAt(1)) Nil
          else args.getArray(1).toObjectArray(StringType)
            .map(_.asInstanceOf[UTF8String].toString).toSeq
        t.computeTableStats(cols).toSeq.sortBy(_._1)
          .map { case (c, n) => outRow(c, n) }
      }))
    // Metadata-only NDV repair (r17, no Iceberg analog — Puffin
    // can't subtract either): re-derive the table sketches from the
    // per-file sketches on surviving entries after a mass delete —
    // zero Spark jobs, no corpus re-scan. Returns the refreshed
    // (column, ndv) rows, or zero rows when the table is ineligible
    // (live delete files, uncovered entries, no sketches) — callers
    // then fall back to compute_table_stats; maintain() already runs
    // this refold-first ordering automatically.
    case "refold_column_stats" => Some(procedure(name,
      Seq(param("table", StringType),
        paramD("columns", ArrayType(StringType), "NULL")),
      StructType.fromDDL("column STRING, ndv BIGINT"),
      (args: InternalRow) => {
        val t = catalog.resolveTableArg(args.getUTF8String(0).toString)
        val cols = if (args.isNullAt(1)) Nil
          else args.getArray(1).toObjectArray(StringType)
            .map(_.asInstanceOf[UTF8String].toString).toSeq
        t.refoldColumnStats(cols).map(_.toSeq.sortBy(_._1)
          .map { case (c, n) => outRow(c, n) }).getOrElse(Nil)
      }))
    // Iceberg migrate parity — the import trio's third member (with
    // add_files and snapshot/register_table): convert the plain
    // parquet directory at the table's name into a graft table that
    // takes over the name in place; the source survives as
    // <name>_backup_ (readable raw parquet, bytes shared with the new
    // table, gc disabled) unless drop_backup renames the files into
    // the table and removes the backup. Failure leaves the source
    // intact under its original name (GraftCatalog.migrateTable).
    case "migrate" => Some(procedure(name,
      Seq(param("table", StringType),
        paramD("drop_backup", BooleanType, "false")),
      StructType.fromDDL(
        "table STRING, migrated_files_count BIGINT, " +
          "backup_location STRING"),
      (args: InternalRow) => {
        val tbl = args.getUTF8String(0).toString
        val dropB = !args.isNullAt(1) && args.getBoolean(1)
        val (t, backup) = catalog.migrateTableArg(tbl, dropB)
        val n = t.currentSnapshot
          .flatMap(_.summary.get("added-data-files"))
          .map(_.toLong).getOrElse(0L)
        Seq(outRow(tbl, n, backup.orNull))
      }))
    case "maintain" => Some(procedure(name,
      Seq(param("table", StringType)),
      StructType.fromDDL("action STRING, detail STRING"),
      (args: InternalRow) => {
        val t = catalog.resolveTableArg(args.getUTF8String(0).toString)
        t.maintain().map { case (a, d) => outRow(a, d) }
      }))
    case "rewrite_position_delete_files" => Some(procedure(name,
      Seq(param("table", StringType)),
      StructType.fromDDL("removed_delete_files_count INT"),
      (args: InternalRow) => {
        val t = catalog.resolveTableArg(args.getUTF8String(0).toString)
        val snap = t.rewritePositionDeleteFiles()
        val n = snap.flatMap(_.summary.get("removed-delete-files"))
          .map(_.toInt).getOrElse(0)
        Seq(outRow(n))
      }))
    case "create_branch" | "create_tag" => Some(procedure(name,
      Seq(param("table", StringType),
        param("ref", StringType),
        // -1 means the current head
        paramD("snapshot_id", LongType, "-1"),
        // Iceberg's RETAIN: ref lapses during expire_snapshots once
        // its snapshot is older than this. -1 = inherit the table's
        // history.expire.max-ref-age-ms (immortal when unset); 0 =
        // explicit RETAIN FOREVER — the ref never lapses even on a
        // table whose default ages refs out (Iceberg's 'RETAIN
        // FOREVER' encoding for SQL callers)
        paramD("max_ref_age_ms", LongType, "-1")),
      StructType.fromDDL("ref STRING, snapshot_id BIGINT"),
      (args: InternalRow) => {
        val t = catalog.resolveTableArg(args.getUTF8String(0).toString)
        val refName = args.getUTF8String(1).toString
        val snapId = Some(args.getLong(2)).filter(_ >= 0)
        val refAge = args.getLong(3) match {
          case -1 => None // inherit table default
          // explicit RETAIN FOREVER (procedure-arg sentinel ONLY — the
          // TABLE property keeps Iceberg's contract where 0 ms lapses
          // refs immediately; see GraftTable.RetainForever)
          case 0 => Some(GraftTable.RetainForever)
          case v if v > 0 => Some(v)
          case v => throw new IllegalArgumentException(
            s"max_ref_age_ms must be positive, 0 (RETAIN FOREVER) or " +
              s"-1 (inherit table default); got $v")
        }
        val refType = if (name == "create_branch") "branch" else "tag"
        val r = t.createRef(refName, refType, snapId, refAge)
        Seq(outRow(refName, r.snapshotId))
      }))
    case "add_files" => Some(procedure(name,
      Seq(param("table", StringType),
        param("source_dir", StringType)),
      StructType.fromDDL("added_files_count INT, added_records BIGINT"),
      (args: InternalRow) => {
        val t = catalog.resolveTableArg(args.getUTF8String(0).toString)
        val snap = t.addFiles(Path.of(args.getUTF8String(1).toString))
        Seq(outRow(
          snap.summary("added-data-files").toInt,
          snap.summary("added-records").toLong))
      }))
    case "drop_ref" => Some(procedure(name,
      Seq(param("table", StringType), param("ref", StringType)),
      StructType.fromDDL("dropped_ref STRING"),
      (args: InternalRow) => {
        val t = catalog.resolveTableArg(args.getUTF8String(0).toString)
        val refName = args.getUTF8String(1).toString
        t.dropRef(refName)
        Seq(outRow(refName))
      }))
    case "fast_forward" => Some(procedure(name,
      Seq(param("table", StringType),
        param("branch", StringType),
        // -1 means the current head
        paramD("to_snapshot_id", LongType, "-1")),
      StructType.fromDDL("branch STRING, snapshot_id BIGINT"),
      (args: InternalRow) => {
        val t = catalog.resolveTableArg(args.getUTF8String(0).toString)
        val branch = args.getUTF8String(1).toString
        val to = Some(args.getLong(2)).filter(_ >= 0)
          .orElse(t.currentSnapshot.map(_.snapshotId)).getOrElse(
            throw new IllegalArgumentException("table has no snapshots"))
        val r = t.fastForward(branch, to)
        Seq(outRow(branch, r.snapshotId))
      }))
    case "create_changelog_view" => Some(procedure(name,
      Seq(param("table", StringType),
        param("changelog_view", StringType),
        // -1 means unbounded (start-snapshot-id is EXCLUSIVE,
        // end-snapshot-id INCLUSIVE, the Iceberg convention)
        paramD("start_snapshot_id", LongType, "-1"),
        paramD("end_snapshot_id", LongType, "-1"),
        // Iceberg options: compute_updates pairs same-identifier
        // delete+insert within a commit window into
        // update_before/update_after images (and implies carryover
        // removal); net_changes nets by content across the WHOLE
        // window (final state of every row delta) and refuses
        // compute_updates, like Iceberg. net_changes is APPENDED
        // after the pre-existing params so positional CALLs keep
        // their meaning.
        paramD("compute_updates", BooleanType, "false"),
        paramD("identifier_columns", StringType, "''"),
        paramD("net_changes", BooleanType, "false")),
      StructType.fromDDL("changelog_view STRING"),
      (args: InternalRow) => {
        val t = catalog.resolveTableArg(args.getUTF8String(0).toString)
        val view = args.getUTF8String(1).toString
        val from = Some(args.getLong(2)).filter(_ >= 0)
        val to = Some(args.getLong(3)).filter(_ >= 0)
        val computeUpdates = args.getBoolean(4)
        val idCols = args.getUTF8String(5).toString
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val netChanges = args.getBoolean(6)
        require(!(computeUpdates && netChanges),
          "net_changes cannot be combined with compute_updates")
        val df =
          if (computeUpdates) {
            require(idCols.nonEmpty, "compute_updates => true " +
              "requires identifier_columns")
            t.changelogView(idCols, from, to)
          } else if (netChanges)
            t.changelogView(Nil, from, to, netChanges = true)
          else t.changes(from, to)
        df.createOrReplaceTempView(view)
        Seq(outRow(view))
      }))
    case "rollback_to_snapshot" => Some(procedure(name,
      Seq(param("table", StringType),
        param("snapshot_id", LongType)),
      StructType.fromDDL("current_snapshot_id BIGINT"),
      (args: InternalRow) => {
        val t = catalog.resolveTableArg(args.getUTF8String(0).toString)
        Seq(outRow(t.rollbackTo(args.getLong(1)).snapshotId))
      }))
    case "set_current_snapshot" => Some(procedure(name,
      Seq(param("table", StringType),
        param("snapshot_id", LongType)),
      StructType.fromDDL("current_snapshot_id BIGINT"),
      (args: InternalRow) => {
        val t = catalog.resolveTableArg(args.getUTF8String(0).toString)
        Seq(outRow(t.setCurrentSnapshot(args.getLong(1)).snapshotId))
      }))
    case "cherrypick_snapshot" => Some(procedure(name,
      Seq(param("table", StringType),
        param("snapshot_id", LongType)),
      StructType.fromDDL(
        "source_snapshot_id BIGINT, current_snapshot_id BIGINT"),
      (args: InternalRow) => {
        val t = catalog.resolveTableArg(args.getUTF8String(0).toString)
        val picked = args.getLong(1)
        Seq(outRow(picked, t.cherrypickSnapshot(picked).snapshotId))
      }))
    case _ => None
  }

  private def procedure(procName: String,
      params: Seq[ProcedureParameter], outSchema: StructType,
      run: InternalRow => Seq[InternalRow]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String =
        s"GraftLake maintenance procedure $procName"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String =
            s"GraftLake maintenance procedure $procName"
          override def parameters(): Array[ProcedureParameter] =
            params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow)
              : java.util.Iterator[Scan] =
            resultScan(outSchema, run(input))
        }
    }
}
