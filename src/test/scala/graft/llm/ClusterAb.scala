package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B the two clusterPairs branches at scale (r14 verdict item 2):
  * the SAME materialized dup-pair set resolves through the local
  * union-find and through the forced distributed min-label
  * propagation (`localThreshold = 0`, what
  * `spark.graft.dedup.clusterLocalThreshold=0` does in production);
  * asserts bit-identical cluster output and prints min-of-2 wall
  * times for both. Pairs are staged to parquet first so the A/B
  * times cluster RESOLUTION, not the shingle join.
  *
  * Usage: Test/runMain graft.llm.ClusterAb [sfDir]
  * Env: SPARK_GRAFT_CPUS (default 32).
  */
object ClusterAb {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val staged = java.nio.file.Files
      .createTempDirectory("cluster-ab-").resolve("pairs.parquet")
    DedupQueries.jaccardPairs(
      DedupQueries.shingleSets(graft.rel.Tables.documents(spark, dir)),
      "sh")
      .filter(col("jac") >= 0.5)
      .select(col("id_a"), col("id_b"))
      .write.parquet(staged.toString)
    val pairs = spark.read.parquet(staged.toString)
    println(s"pairs=${pairs.count()}")
    def run(threshold: Long): (Seq[(Long, Long, Boolean)], Double) = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        PipelineQueries.clusterPairs(spark, pairs, threshold)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val rows = PipelineQueries.clusterPairs(spark, pairs, threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSeq
      (rows, times.min)
    }
    val (localOut, tLocal) = run(Long.MaxValue)
    val (distOut, tDist) = run(0L) // default cadence (local: every round)
    require(localOut == distOut,
      s"branch outputs differ: ${localOut.size} vs ${distOut.size} rows")
    // checkpoint cadence A/B (r15 verdict #8): the every-2nd-round
    // setting a reliable-checkpoint deployment defaults to — the jump
    // preserves correctness either way, so only the constant moves;
    // assert output equality too. Measured r16: every-round 1.99 s vs
    // every-2nd 2.32 s locally (localCheckpoint materializes like the
    // persist it replaces, so skipping truncations only grows plans).
    spark.conf.set("spark.graft.dedup.checkpointInterval", "2")
    // finally: a throw mid-A/B must not leak the cadence conf into
    // any later use of this session (silently changed cadence)
    val (every2Out, tEvery2) =
      try run(0L)
      finally spark.conf.unset("spark.graft.dedup.checkpointInterval")
    require(every2Out == distOut,
      "checkpoint cadence must not change cluster output")
    println(f"docs_clustered=${localOut.size} " +
      f"local_s=$tLocal%.2f distributed_s=$tDist%.2f " +
      f"ratio=${tDist / tLocal}%.2f dist_ckpt_every2_s=$tEvery2%.2f " +
      f"identical=true")
    spark.stop()
  }
}
