package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratchpad: schema/plan inspection while building queries.
  * Not part of the engine surface.
  *
  * Current use (r17): per-statement phase timing of q_lake_merge.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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

    // warm
    graft.SparkEntry.queries("q_lake_merge")(spark, dir)
      .write.format("noop").mode("overwrite").save()

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val ns = s"sqlns_scr_${System.nanoTime()}"
      spark.sql(s"CREATE NAMESPACE graft.$ns")
      val tbl = s"graft.$ns.cust_merge"
      time("create")(spark.sql(
        s"CREATE TABLE $tbl (k BIGINT, acct_c BIGINT, seg STRING) " +
          "USING graft"))
      time("insert")(spark.sql(
        s"""INSERT INTO $tbl
           |SELECT CAST(c_custkey AS BIGINT),
           |  CAST(round(c_acctbal * 100) AS BIGINT), c_mktsegment
           |FROM parquet.`$dir/customer.parquet`
           |WHERE c_custkey % 3 IN (0, 1)""".stripMargin))
      time("merge1-upsert")(spark.sql(
        s"""MERGE INTO $tbl t
           |USING (
           |  SELECT CAST(c_custkey AS BIGINT) AS k,
           |    CAST(round(c_acctbal * 100) AS BIGINT) + 11 AS val,
           |    c_mktsegment AS seg
           |  FROM parquet.`$dir/customer.parquet`
           |  WHERE c_custkey % 3 IN (1, 2)) s
           |ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET acct_c = s.val
           |WHEN NOT MATCHED THEN INSERT (k, acct_c, seg)
           |  VALUES (s.k, s.val, s.seg)""".stripMargin))
      time("merge2-delete")(spark.sql(
        s"""MERGE INTO $tbl t
           |USING (
           |  SELECT CAST(c_custkey AS BIGINT) AS k
           |  FROM parquet.`$dir/customer.parquet`
           |  WHERE c_custkey % 7 = 0) gone
           |ON t.k = gone.k
           |WHEN MATCHED THEN DELETE""".stripMargin))
      time("snapshots")(spark.sql(
        s"SELECT count(*) FROM graft.$ns.cust_merge.snapshots").head)
      time("final agg noop")(spark.sql(
        s"""SELECT seg, CAST(sum(acct_c) AS BIGINT) AS sum_acct_c,
           |  count(*) AS n
           |FROM $tbl GROUP BY seg ORDER BY seg""".stripMargin)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
