package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator catalog in the engine. Each SURVEY.md §2
  * operator is one named query; `oracleSql` holds the DuckDB-equivalent
  * ANSI SQL for the hash compare.
  */
object SparkEntry {

  /** Every query catalog in the engine, in SURVEY.md §2 order. */
  private val catalogs: Seq[QueryCatalog] = Seq(
    rel.ScanFilterQueries,
    rel.JoinQueries,
    rel.AggQueries,
    rel.SketchQueries,
    rel.AnalyticsQueries,
    rel.SortSetQueries,
    rel.FuncQueries,
    rel.WindowQueries,
    streaming.StreamBatchQueries,
    lake.LakeQueries,
    llm.DedupQueries,
    llm.SimilarityQueries,
    llm.TextQueries,
    llm.MultimodalQueries,
    llm.PipelineQueries,
    llm.CurationQueries)

  private lazy val allQueries: Seq[Q] = {
    val qs = catalogs.flatMap(_.all)
    val dup = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(", ")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    rel.AggQueries.pricingSummary.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
