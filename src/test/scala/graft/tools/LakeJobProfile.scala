package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: for one lake query, split wall time into Spark-job time
  * vs driver-side gaps (scheduling, metadata IO, planning). */
object LakeJobProfile {
  def main(args: Array[String]): Unit = {
    val qnames = args.headOption.getOrElse("q_lake_incremental_agg")
      .split(',').toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import scala.jdk.CollectionConverters._
    val jobs = new ConcurrentLinkedQueue[(Long, Long)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, j.time)
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.getOrDefault(j.jobId, j.time)
        jobs.add((s, j.time))
      }
    })
    def release(): Unit = spark.sparkContext.getPersistentRDDs
      .valuesIterator.foreach(_.unpersist(blocking = true))
    qnames.foreach { qname =>
      val q = graft.SparkEntry.queries(qname)
      // warm
      q(spark, dir).write.format("noop")
        .mode("overwrite").save()
      release()
      jobs.clear()
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop")
        .mode("overwrite").save()
      val wallMs = (System.nanoTime() - t0) / 1e6
      release()
      Thread.sleep(500)
      val js = jobs.asScala.toSeq.sortBy(_._1)
      val jobMs = js.map { case (s, e) => e - s }.sum
      // merged busy time (jobs can overlap)
      var busy = 0L; var cur = (0L, 0L)
      js.foreach { case (s, e) =>
        if (s > cur._2) { busy += cur._2 - cur._1; cur = (s, e) }
        else cur = (cur._1, math.max(cur._2, e))
      }
      busy += cur._2 - cur._1
      println(f"$qname: wall=${wallMs}%.0f ms, jobs=${js.size}, " +
        f"sum(job)=${jobMs} ms, merged-busy=${busy} ms, " +
        f"driver-gap=${wallMs - busy}%.0f ms")
      val top = js.map { case (s, e) => e - s }.sorted.reverse.take(10)
      println(s"top job durations: ${top.mkString(", ")} ms")
    }
    spark.stop()
  }
}
