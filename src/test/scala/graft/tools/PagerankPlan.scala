package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev diagnostic (r17): print q_graph_pagerank's INTERNAL iteration
  * plan — the score frame as composed just before the severLineage
  * localCheckpoint (the bench-visible plan after the sever is only a
  * Scan ExistingRDD, so the optimization evidence lives here).
  * Usage: runMain graft.tools.PagerankPlan [sfDir] */
object PagerankPlan {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def write(path: String, content: String): Unit = {
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(path).getParent)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(path), content)
      println(s"wrote $path")
    }
    if (args.length > 1 && args(1) == "old") {
      // the pre-r17 composition, reconstructed verbatim for the
      // before-plan artifact
      import org.apache.spark.sql.functions._
      import graft.llm.DedupQueries
      val pairs = DedupQueries
        .jaccardPairs(DedupQueries.shingleSets(
          graft.rel.Tables.documents(spark, dir)), "sh")
        .filter(col("jac") >= 0.5)
        .select(col("id_a"), col("id_b"))
      val edges = pairs.union(pairs.select(col("id_b"), col("id_a")))
        .toDF("src", "dst").persist()
      edges.count()
      val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
      val withDeg = edges.join(deg, "src")
      val nodes = edges.select(col("src").as("id")).distinct()
      var score = nodes.withColumn("pr", lit(1000000L))
      for (_ <- 1 to 4) {
        val contrib = withDeg
          .join(score.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id"))
          .agg(sum(expr("pr div d")).cast("bigint").as("c"))
        score = nodes.join(contrib, Seq("id"), "left")
          .select(col("id"),
            (lit(150000L) + expr("850000 * coalesce(c, 0) div 1000000"))
              .cast("bigint").as("pr"))
      }
      write("plans/r17/q_graph_pagerank_before.txt",
        "q_graph_pagerank — INTERNAL iteration plan (the score frame\n" +
          "just before severLineage; post-sever the bench-visible plan\n" +
          "is a Scan ExistingRDD), pre-r17 composition.\n\n" +
          score.queryExecution
            .explainString(ExplainMode.fromString("formatted")))
      edges.unpersist()
    } else {
      val (score, cache) =
        graft.llm.PipelineQueries.pagerankScore(spark, dir)
      write("plans/r17/q_graph_pagerank_after.txt",
        "q_graph_pagerank — INTERNAL iteration plan (the score frame\n" +
          "just before severLineage; post-sever the bench-visible plan\n" +
          "is a Scan ExistingRDD), r17-optimized composition.\n\n" +
          score.queryExecution
            .explainString(ExplainMode.fromString("formatted")))
      cache.unpersist()
    }
    spark.stop()
  }
}
