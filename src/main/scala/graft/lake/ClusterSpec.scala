package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Partition-transform clustering fields (Iceberg's transform
  * vocabulary over GraftLake's range-clustered file layout): the
  * `write.clustered-by` property holds a comma-separated list of
  * specs — `col` (identity), `hours(col)`/`days(col)`/`months(col)`/
  * `years(col)`, `bucket(n,col)`, `truncate(w,col)` — and every append
  * range-clusters files on the TRANSFORMED values, so per-file stats
  * prune like partition pruning without a directory layout:
  *
  *  - `days(ts)` (and the hours/months/years ladder): files cover
  *    time-aligned timestamp ranges; the raw ts min/max stats are
  *    granule-tight, so existing stats pruning answers time
  *    predicates exactly.
  *  - `truncate(w,col)`: files cover truncated-prefix ranges; raw
  *    stats stay prefix-tight, so prefix/range predicates prune.
  *  - `bucket(n,col)`: files cover hash-bucket ranges. Raw min/max is
  *    useless under hashing, so writes record a derived
  *    `graft:bucket(n,col)` stat (the file's bucket-id range) and
  *    equality/IN predicates prune against it. Bucketing uses Spark's
  *    murmur3 `hash()` — engine-internal, not Iceberg-binary-
  *    compatible (documented divergence).
  *
  * The reference's table is unpartitioned
  * (notebooks/iceberg_pii_deletion_demo.py:74-85), so no behavior is
  * cited; this is the `PARTITIONED BY (days(ts))` surface a real lake
  * user hits first.
  */
sealed trait ClusterField {
  /** underlying (logical) column the transform applies to */
  def column: String
  /** canonical spec string, round-trips through parse */
  def spec: String
  /** clustering expression over the column (dt = the column's type) */
  def expr(dt: DataType, c: Column): Column
  /** same field over a renamed column */
  def withColumn(c: String): ClusterField
}

final case class IdentityField(column: String) extends ClusterField {
  def spec: String = column
  def expr(dt: DataType, c: Column): Column = c
  def withColumn(c: String): ClusterField = copy(column = c)
}

final case class DaysField(column: String) extends ClusterField {
  def spec: String = s"days($column)"
  def expr(dt: DataType, c: Column): Column = dt match {
    case TimestampType | TimestampNTZType | DateType => c.cast("date")
    case other => throw new IllegalArgumentException(
      s"days() needs a timestamp/date column; $column is " +
        other.simpleString)
  }
  def withColumn(c: String): ClusterField = copy(column = c)
}

/** `hours(ts)`: files cover hour-aligned ranges — the finer end of
  * Iceberg's time-transform ladder, for streams where a day of data is
  * too much to scan per predicate. Same stats story as days(): range
  * clustering on the truncated value keeps raw ts min/max hour-tight.
  */
final case class HoursField(column: String) extends ClusterField {
  def spec: String = s"hours($column)"
  def expr(dt: DataType, c: Column): Column = dt match {
    case TimestampType | TimestampNTZType => date_trunc("HOUR", c)
    case other => throw new IllegalArgumentException(
      s"hours() needs a timestamp column; $column is " +
        other.simpleString)
  }
  def withColumn(c: String): ClusterField = copy(column = c)
}

/** `months(ts)`: month-aligned file ranges (coarse time layout for
  * long-retention tables). Raw stats stay month-tight under the range
  * clustering, so any predicate at month-or-coarser granularity prunes
  * from the existing min/max — no derived stat needed. */
final case class MonthsField(column: String) extends ClusterField {
  def spec: String = s"months($column)"
  def expr(dt: DataType, c: Column): Column = dt match {
    case TimestampType | TimestampNTZType | DateType =>
      trunc(c.cast("date"), "MM")
    case other => throw new IllegalArgumentException(
      s"months() needs a timestamp/date column; $column is " +
        other.simpleString)
  }
  def withColumn(c: String): ClusterField = copy(column = c)
}

/** `years(ts)`: year-aligned file ranges; see [[MonthsField]]. */
final case class YearsField(column: String) extends ClusterField {
  def spec: String = s"years($column)"
  def expr(dt: DataType, c: Column): Column = dt match {
    case TimestampType | TimestampNTZType | DateType =>
      trunc(c.cast("date"), "YYYY")
    case other => throw new IllegalArgumentException(
      s"years() needs a timestamp/date column; $column is " +
        other.simpleString)
  }
  def withColumn(c: String): ClusterField = copy(column = c)
}

final case class BucketField(n: Int, column: String) extends ClusterField {
  require(n > 0, s"bucket count must be positive, got $n")
  def spec: String = s"bucket($n,$column)"
  def expr(dt: DataType, c: Column): Column = pmod(hash(c), lit(n))
  def withColumn(c: String): ClusterField = copy(column = c)
  /** manifest stat key for the derived bucket-id range, spelled with
    * the file-side (physical) column name */
  def statKey(physColumn: String): String = s"graft:bucket($n,$physColumn)"
}

final case class TruncateField(width: Int, column: String)
    extends ClusterField {
  require(width > 0, s"truncate width must be positive, got $width")
  def spec: String = s"truncate($width,$column)"
  def expr(dt: DataType, c: Column): Column = dt match {
    case StringType => substring(c, 1, width)
    case ByteType | ShortType | IntegerType | LongType =>
      // Iceberg semantics: v - (v mod w), floored for negatives
      c - pmod(c, lit(width))
    case other => throw new IllegalArgumentException(
      s"truncate() needs a string/integral column; $column is " +
        other.simpleString)
  }
  def withColumn(c: String): ClusterField = copy(column = c)
}

object ClusterSpec {
  private val Bucket = """(?i)bucket\(\s*(\d+)\s*,\s*([^)]+?)\s*\)""".r
  private val Days = """(?i)days\(\s*([^)]+?)\s*\)""".r
  private val Hours = """(?i)hours\(\s*([^)]+?)\s*\)""".r
  private val Months = """(?i)months\(\s*([^)]+?)\s*\)""".r
  private val Years = """(?i)years\(\s*([^)]+?)\s*\)""".r
  private val Trunc = """(?i)truncate\(\s*(\d+)\s*,\s*([^)]+?)\s*\)""".r

  def parse(s: String): ClusterField = s.trim match {
    case Bucket(n, c) => BucketField(n.toInt, c)
    case Days(c) => DaysField(c)
    case Hours(c) => HoursField(c)
    case Months(c) => MonthsField(c)
    case Years(c) => YearsField(c)
    case Trunc(w, c) => TruncateField(w.toInt, c)
    case c => IdentityField(c)
  }

  /** Split a `write.clustered-by` value on top-level commas only —
    * `bucket(16,user_id),days(ts)` has commas inside the transforms. */
  def parseList(spec: String): Seq[ClusterField] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    spec.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case ch => cur += ch
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty).map(parse)
  }

  def render(fields: Seq[ClusterField]): String =
    fields.map(_.spec).mkString(",")

  /** Per-entry clustered-range display bound for the `partitions`
    * relation: each field renders in its TRANSFORMED value space
    * (days → dates, bucket → bucket ids, truncate → truncated values),
    * identity stays raw — the ranges an operator actually partitioned
    * by. None when the table is unclustered. STATIC — no table state —
    * so the distributed partitions path renders bounds on executors
    * with the EXACT function the driver path uses. */
  def rangeBound(fields: Seq[ClusterField], sch: StructType,
      mapping: Map[String, String])(e: ManifestEntry,
      pick: ColStat => String): Option[String] = {
    def display(f: ClusterField): String = {
      val field = sch.fields.find(_.name.equalsIgnoreCase(f.column))
      // fall back through the MAPPING even when the clustered column
      // left the schema: a dropped-but-clustered column's stats still
      // live under its physical name
      val phys = {
        val logical = field.map(_.name).getOrElse(f.column)
        mapping.getOrElse(logical, logical)
      }
      def raw: Option[String] = e.stats.get(phys).map(pick)
      f match {
        case b: BucketField =>
          e.stats.get(b.statKey(phys)).map(pick).getOrElse("null")
        case _: IdentityField => raw.getOrElse("null")
        case _: DaysField => raw.map { s =>
          try {
            val days = field.map(_.dataType) match {
              case Some(DateType) => s.toLong // stat space: epoch days
              case _ => // timestamps: stat space is epoch micros
                Math.floorDiv(BigDecimal(s).toLong, 86400000000L)
            }
            java.time.LocalDate.ofEpochDay(days).toString
          } catch { case _: NumberFormatException => s }
        }.getOrElse("null")
        case _: HoursField => raw.map { s =>
          try { // timestamps only: stat space is epoch micros
            val hours = Math.floorDiv(BigDecimal(s).toLong, 3600000000L)
            java.time.LocalDateTime
              .ofEpochSecond(hours * 3600L, 0, java.time.ZoneOffset.UTC)
              .toString
          } catch { case _: NumberFormatException => s }
        }.getOrElse("null")
        case mf @ (_: MonthsField | _: YearsField) => raw.map { s =>
          try {
            val days = field.map(_.dataType) match {
              case Some(DateType) => s.toLong
              case _ => Math.floorDiv(BigDecimal(s).toLong, 86400000000L)
            }
            val d = java.time.LocalDate.ofEpochDay(days)
            (if (mf.isInstanceOf[MonthsField]) d.withDayOfMonth(1)
             else d.withDayOfYear(1)).toString
          } catch { case _: NumberFormatException => s }
        }.getOrElse("null")
        case t: TruncateField => raw.map { s =>
          field.map(_.dataType) match {
            case Some(StringType) => s.take(t.width)
            case _ => try {
              val v = BigDecimal(s).toLong
              (v - Math.floorMod(v, t.width.toLong)).toString
            } catch { case _: NumberFormatException => s }
          }
        }.getOrElse("null")
      }
    }
    if (fields.isEmpty) None
    else Some(fields.map(display).mkString(","))
  }

  /** Bucket id of a LITERAL under `bucket(n, col)` — driver-side twin
    * of the write path's `pmod(hash(col), n)` (murmur3, seed 42).
    * `v` is a Catalyst-internal value with its data type, exactly as
    * destructured from an analyzed conjunct. */
  def bucketOfLiteral(n: Int, v: Any, dt: DataType): Int = {
    val h = new org.apache.spark.sql.catalyst.expressions.Murmur3Hash(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal(v, dt)))
      .eval(null).asInstanceOf[Int]
    ((h % n) + n) % n
  }
}
