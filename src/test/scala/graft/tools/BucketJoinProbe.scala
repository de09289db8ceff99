package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.{GraftCatalog, GraftTable}
import graft.rel.Tables

/** Dev probe: per-phase timing of the q_lake_bucket_join scenario. */
object BucketJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    for (round <- 1 to 2) {
      var t0 = System.nanoTime()
      def lap(nm: String): Unit = {
        val t = System.nanoTime()
        println(f"[$round] $nm: ${(t - t0) / 1e9}%.2f s")
        t0 = t
      }
      val cat = new GraftCatalog(spark,
        graft.ScratchDirs.create("graft-wh-"))
      cat.createNamespace("default")
      val custDf = Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"))
      val ordDf = Tables.orders(spark, dir)
        .select(col("o_custkey"), col("o_orderkey"))
      val cust = cat.createTable("default", "customer", custDf.schema,
        Map("write.clustered-by" -> "bucket(8,c_custkey)"))
      lap("create")
      cust.append(custDf)
      lap("append customer")
      val ords = cat.createTable("default", "orders", ordDf.schema,
        Map("write.clustered-by" -> "bucket(8,o_custkey)"))
      ords.append(ordDf)
      lap("append orders")
      val lc = cust.bucketLocalRead("c_custkey").get
      val lo = ords.bucketLocalRead("o_custkey").get
      lap("bucketLocalRead x2")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = lo.join(lc, lo("o_custkey") === lc("c_custkey"))
      println("exchanges: " + j.queryExecution.executedPlan.toString
        .split("\n").count(_.contains("Exchange")))
      lap("join plan build")
      def agg(d: org.apache.spark.sql.DataFrame) = d
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("c_custkey")).as("n_customers"),
          sum(col("o_orderkey")).cast("bigint").as("key_sum"))
        .orderBy("c_mktsegment")
      val got = agg(j).collect().toSeq
      lap("local agg collect")
      val rc = cust.read(); val ro = ords.read()
      val want = agg(ro.join(rc, ro("o_custkey") === rc("c_custkey")))
        .collect().toSeq
      lap("shuffled agg collect")
      println(s"equal: ${got == want}")
    }
    spark.stop()
  }
}
