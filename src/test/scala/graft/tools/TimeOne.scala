package graft.tools

import org.apache.spark.sql.SparkSession

/** Times named SparkEntry queries under bench-like conditions (warm
  * shared JVM, noop write, min-of-N). Usage:
  *   runMain graft.tools.TimeOne <q1[,q2,...]> [sfDir]
  * Env: SPARK_GRAFT_CPUS (default 4), SPARK_GRAFT_RUNS (default 2).
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same warmup as Bench: soak classloading/codegen/shuffle machinery
    graft.rel.Tables.names.foreach { t =>
      try graft.rel.Tables(spark, dir, t).limit(1000)
        .selectExpr("count(*)").collect()
      catch { case _: Throwable => () }
    }
    try graft.SparkEntry.queries("q_agg_pricing_summary")(spark, dir).count()
    catch { case _: Throwable => () }
    // Bench's per-run hygiene: drop pinned RDD blocks after every run
    // and settle between queries — without this, lake-walk numbers
    // inflate 30-50% from accumulated localCheckpoint blocks.
    def release(): Unit = spark.sparkContext.getPersistentRDDs
      .valuesIterator.foreach(_.unpersist(blocking = true))
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        release()
        t
      }
      System.gc(); Thread.sleep(200)
      println(f"$name: runs=${times.map(t => f"$t%.2f").mkString(",")} " +
        f"min=${times.min}%.2f")
    }
    spark.stop()
  }
}
