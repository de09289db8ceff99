package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named operator query from SURVEY.md §2.
  *
  * `build` constructs the DataFrame against the parquet tables under
  * `sfDir`; `oracle` is the equivalent ANSI SQL the driver runs in DuckDB
  * over the same tables. Queries without a SQL-expressible oracle (e.g.
  * table-lifecycle ops) leave `oracle` empty and get a rows-only check.
  *
  * Determinism contract (BASELINE.md / SURVEY.md §5): every oracle-checked
  * query ends in a total ORDER BY (with key tiebreaks) before any LIMIT,
  * and floating aggregates are rounded to a fixed scale in BOTH dialects
  * so Spark/DuckDB double math cannot diverge in the hash compare.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): Q =
    Q(name, build, Some(oracle))

  def noOracle(name: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(name, build, None)
}

/** A group of related queries (one file per SURVEY.md §2 section). */
trait QueryCatalog {
  def all: Seq[Q]
}
