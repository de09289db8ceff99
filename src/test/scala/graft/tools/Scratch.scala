package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: schema/plan inspection while building queries.
  * Not part of the engine surface.
  *
  * Current use (r17): old-vs-new pagerank iteration A/B at a given
  * scale (adjudicating the sf1 scaling reading).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def release(): Unit = spark.sparkContext.getPersistentRDDs
      .valuesIterator.foreach(_.unpersist(blocking = true))
    graft.rel.Tables.names.foreach { t =>
      try graft.rel.Tables(spark, dir, t).limit(1000)
        .selectExpr("count(*)").collect()
      catch { case _: Throwable => () }
    }
    import graft.llm.DedupQueries
    val docs = graft.rel.Tables.documents(spark, dir)
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      // OLD shape
      val pairsA = DedupQueries
        .jaccardPairs(DedupQueries.shingleSetsMaterialized(docs), "sh")
        .filter(col("jac") >= 0.5)
        .select(col("id_a"), col("id_b"))
      val edgesA = pairsA.union(pairsA.select(col("id_b"), col("id_a")))
        .toDF("src", "dst").persist()
      time("OLD pairs+edges count")(edgesA.count())
      val degA = edgesA.groupBy("src").agg(count(lit(1)).as("d"))
      val withDegA = edgesA.join(degA, "src")
      val nodesA = edgesA.select(col("src").as("id")).distinct()
      var scoreA = nodesA.withColumn("pr", lit(1000000L))
      for (_ <- 1 to 4) {
        val contrib = withDegA
          .join(scoreA.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id"))
          .agg(sum(expr("pr div d")).cast("bigint").as("c"))
        scoreA = nodesA.join(contrib, Seq("id"), "left")
          .select(col("id"),
            (lit(150000L) + expr("850000 * coalesce(c, 0) div 1000000"))
              .cast("bigint").as("pr"))
      }
      val hA = time("OLD 4 iterations")(
        scoreA.localCheckpoint(true)
          .selectExpr("sum(hash(id, pr))").head.getLong(0))
      edgesA.unpersist(); release()
      // NEW shape (the shipped pagerankScore)
      val t0 = System.nanoTime()
      val (scoreB, cacheB) =
        graft.llm.PipelineQueries.pagerankScore(spark, dir)
      val hB = scoreB.localCheckpoint(true)
        .selectExpr("sum(hash(id, pr))").head.getLong(0)
      println(f"  NEW pairs+iterations total: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      cacheB.unpersist(); release()
      println(s"  hashOld=$hA hashNew=$hB equal=${hA == hB}")
    }
    spark.stop()
  }
}
