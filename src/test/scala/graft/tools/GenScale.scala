package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scaling-smoke data generator (round 14, dev tooling — NEVER a
  * query input in SparkEntry): synthesizes an N×-scaled copy of a
  * testdata dir under /tmp so the top bench queries can be timed at
  * 10× rows and checked for superlinear surprises. Each copy shifts
  * every key space (doc/event/user/order ids) so per-key structure is
  * preserved, and rewrites document TOKENS with a per-copy suffix so
  * cross-copy text overlap is ZERO — without that, 10 identical
  * copies would square the dedup family's candidate-pair count and
  * the smoke would measure an artifact, not scaling.
  *
  * Usage: Test/runMain graft.tools.GenScale <srcDir> <dstDir> <copies>
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val copies = args(2).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[genscale] $name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }
    def read(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    def scaled(df: DataFrame)(variant: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(i => variant(df, i)).reduce(_ unionAll _)

    // key shift = a constant comfortably above any source id
    val shift = 1000000000L

    write("documents", scaled(read("documents")) { (d, i) =>
      if (i == 0) d
      else d
        .withColumn("doc_id", col("doc_id") + lit(i * shift))
        // per-copy token suffix: same lengths/shape, zero cross-copy
        // shingle overlap (see scaladoc)
        .withColumn("text", concat_ws(" ",
          transform(split(col("text"), " "),
            w => concat(w, lit(s"~$i")))))
        .withColumn("n_chars", length(col("text")))
    })
    write("events", scaled(read("events")) { (d, i) =>
      if (i == 0) d
      else d
        .withColumn("event_id", col("event_id") + lit(i * shift))
        .withColumn("user_id", col("user_id") + lit(i * shift))
    })
    write("embeddings", scaled(read("embeddings")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("vec_id", col("vec_id") + lit(i * shift))
    })
    write("lineitem", scaled(read("lineitem")) { (d, i) =>
      if (i == 0) d
      else d
        .withColumn("l_orderkey", col("l_orderkey") + lit(i * shift))
        .withColumn("l_partkey", col("l_partkey") + lit(i * shift))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * shift))
    })
    write("orders", scaled(read("orders")) { (d, i) =>
      if (i == 0) d
      else d
        .withColumn("o_orderkey", col("o_orderkey") + lit(i * shift))
        .withColumn("o_custkey", col("o_custkey") + lit(i * shift))
    })
    write("customer", scaled(read("customer")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("c_custkey", col("c_custkey") + lit(i * shift))
    })
    write("supplier", scaled(read("supplier")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("s_suppkey", col("s_suppkey") + lit(i * shift))
    })
    write("part", scaled(read("part")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("p_partkey", col("p_partkey") + lit(i * shift))
    })
    // tiny dims copy through unchanged
    Seq("region", "nation").foreach(t => write(t, read(t)))
    spark.stop()
  }
}
