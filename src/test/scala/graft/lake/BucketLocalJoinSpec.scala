package graft.lake

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** The bucket-local (storage-partitioned) join: two tables clustered
  * `bucket(n, k)` on the join key join with ZERO Exchange nodes —
  * partition i of each side reads exactly bucket i's files and the
  * claimed HashPartitioning satisfies the join's distribution as-is.
  * Pins the no-shuffle plan shape, bit-equality with the shuffled
  * plan, survival across a column rename, and every fallback gate
  * (deletes, no clustering, straddling files, widen refusal). */
class BucketLocalJoinSpec extends SparkSuite {

  private val schemaA = StructType.fromDDL("k BIGINT, a STRING")
  private val schemaB = StructType.fromDDL("k BIGINT, b BIGINT")

  private def mkTables(n: Int = 8): (GraftTable, GraftTable) = {
    val wh = graft.ScratchDirs.create("graft-blj-")
    val props = Map("write.clustered-by" -> s"bucket($n,k)")
    val ta = GraftTable.create(spark, wh.resolve("a"), "d.a", schemaA,
      props)
    val tb = GraftTable.create(spark, wh.resolve("b"), "d.b", schemaB,
      props)
    ta.append(spark.createDataFrame(
      (1L to 5000L).map(i => Row(i % 997, s"a$i")).asJava, schemaA))
    ta.append(spark.createDataFrame(
      (1L to 1000L).map(i => Row(i % 31, s"x$i")).asJava, schemaA))
    tb.append(spark.createDataFrame(
      (1L to 3000L).map(i => Row(i % 499, i)).asJava, schemaB))
    (ta, tb)
  }

  private def exchanges(df: DataFrame): Int =
    df.queryExecution.executedPlan.toString.split("\n")
      .count(_.contains("Exchange"))

  private def grouped(j: DataFrame): Seq[Row] =
    j.groupBy("k").agg(count(lit(1)).as("n"),
      sum("b").cast("bigint").as("s")).orderBy("k").collect().toSeq

  test("co-bucketed join plans zero Exchange and matches the shuffled " +
    "plan bit-for-bit") {
    val (ta, tb) = mkTables()
    val la = ta.bucketLocalRead("k")
    val lb = tb.bucketLocalRead("k")
    assert(la.isDefined && lb.isDefined)
    val sessionThreshold =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val local = la.get.join(lb.get, "k")
      assert(exchanges(local) === 0,
        s"bucket-local join must not shuffle:\n" +
          local.queryExecution.executedPlan)
      val shuffled = ta.read().join(tb.read(), "k")
      assert(exchanges(shuffled) > 0,
        "control: the plain read join should shuffle")
      assert(grouped(local) === grouped(shuffled))
      // layout claim is LITERALLY true: partition i holds bucket i
      val misplaced = la.get.select(
        spark_partition_id().as("p"),
        pmod(hash(col("k")), lit(8)).as("b"))
        .filter(col("p") =!= col("b")).count()
      assert(misplaced === 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      sessionThreshold)
  }

  test("bucket-local read also feeds key-grouped AGGREGATION without " +
    "an exchange (partial+final collapse into one stage)") {
    val (ta, _) = mkTables()
    val la = ta.bucketLocalRead("k").get
    val agg = la.groupBy("k").agg(count(lit(1)).as("n"))
    assert(exchanges(agg) === 0,
      s"grouped agg on the bucket key must not shuffle:\n" +
        agg.queryExecution.executedPlan)
    val want = ta.read().groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy("k").collect().toSeq
    assert(agg.orderBy("k").collect().toSeq === want)
  }

  test("bucket-local read survives a RENAME of the key column " +
    "(stat keys are physical-name stable)") {
    val (ta, tb) = mkTables()
    ta.renameColumn("k", "kid")
    val la = ta.bucketLocalRead("kid")
    assert(la.isDefined, "rename must not break bucket-local reads")
    val a = la.get
    val b = tb.bucketLocalRead("k").get
    val j = a.join(b, a("kid") === b("k"))
    assert(exchanges(j) === 0)
    val ra = ta.read(); val rb = tb.read()
    assert(j.count() === ra.join(rb, ra("kid") === rb("k")).count())
  }

  test("fallback gates: MOR deletes, unbucketed tables, and missing " +
    "stats all decline; mismatched bucket counts still join correctly " +
    "through the ordinary shuffle") {
    val (ta, tb) = mkTables()
    // unbucketed
    val wh = graft.ScratchDirs.create("graft-blj-plain-")
    val plain = GraftTable.create(spark, wh.resolve("p"), "d.p", schemaB,
      Map.empty)
    plain.append(spark.createDataFrame(
      (1L to 100L).map(i => Row(i % 7, i)).asJava, schemaB))
    assert(plain.bucketLocalRead("k").isEmpty)
    // live position deletes break the layout claim
    val tdel = GraftTable.create(spark, wh.resolve("q"), "d.q", schemaB,
      Map("write.clustered-by" -> "bucket(8,k)",
        "write.delete.mode" -> "merge-on-read"))
    tdel.append(spark.createDataFrame(
      (1L to 100L).map(i => Row(i % 7, i)).asJava, schemaB))
    assert(tdel.bucketLocalRead("k").isDefined)
    tdel.delete(col("b") === 5L)
    assert(tdel.bucketLocalRead("k").isEmpty,
      "MOR delete files must disable the bucket-local path")
    // different n on the two sides: both eligible, Spark inserts the
    // exchanges it needs, result still right
    val (tc, _) = mkTables(n = 4)
    val l4o = tc.bucketLocalRead("k")
    val l8o = tb.bucketLocalRead("k")
    assert(l4o.isDefined && l8o.isDefined)
    val l4 = l4o.get; val l8 = l8o.get
    val j = l4.join(l8, l4("k") === l8("k"))
    val rc = tc.read(); val rb = tb.read()
    assert(j.count() === rc.join(rb, rc("k") === rb("k")).count())
  }

  test("pushdown distributes over the claim: a filter over a " +
    "bucket-local read reaches every per-bucket parquet scan, column " +
    "pruning trims the ReadSchema, and the layout claim survives a " +
    "key rename through the pushed projection") {
    val (ta, tb) = mkTables()
    val la = ta.bucketLocalRead("k").get
    val filtered = la.filter(col("k") > 100L).select("k")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(k), GreaterThan(k,100)]"),
      s"filter must reach the parquet scans:\n$plan")
    assert(plan.contains("ReadSchema: struct<k:bigint>"),
      s"projection must prune the scans to the key column:\n$plan")
    assert(filtered.count() ===
      ta.read().filter(col("k") > 100L).count())
    // a renaming projection pushes below AND the claim follows the
    // alias: the join on the renamed key still plans exchange-free
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ra = ta.bucketLocalRead("k").get
        .select(col("k").as("kk"), col("a"))
        .filter(col("kk") < 400L)
      val rb = tb.bucketLocalRead("k").get.filter(col("k") < 400L)
      val j = ra.join(rb, ra("kk") === rb("k"))
      assert(exchanges(j) === 0,
        s"claim must survive the pushed rename:\n" +
          j.queryExecution.executedPlan)
      val pa = ta.read(); val pb = tb.read()
      assert(j.count() === pa.filter(col("k") < 400L)
        .join(pb.filter(col("k") < 400L), pa("k") === pb("k")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      saved)
  }

  test("lifecycle: a MOR delete disables the bucket-local path and " +
    "compaction restores it (masks folded, stats re-derived)") {
    val wh = graft.ScratchDirs.create("graft-blj-life-")
    val t = GraftTable.create(spark, wh.resolve("t"), "d.t", schemaB,
      Map("write.clustered-by" -> "bucket(8,k)",
        "write.delete.mode" -> "merge-on-read"))
    t.append(spark.createDataFrame(
      (1L to 2000L).map(i => Row(i % 499, i)).asJava, schemaB))
    assert(t.bucketLocalRead("k").isDefined)
    t.delete(col("b") % 10L === 0L)
    assert(t.bucketLocalRead("k").isEmpty,
      "delete files must disable the layout claim")
    t.rewriteDataFiles()
    val la = t.bucketLocalRead("k")
    assert(la.isDefined,
      "compaction folds the masks and re-derives bucket stats")
    assert(la.get.count() === t.read().count())
    assert(la.get.select(spark_partition_id().as("p"),
      pmod(hash(col("k")), lit(8)).as("b"))
      .filter(col("p") =!= col("b")).count() === 0,
      "post-compaction layout claim must hold row-for-row")
  }

  test("scale shape: 32-bucket layout over many files assembles from " +
    "manifest metadata alone and still joins exchange-free") {
    val wh = graft.ScratchDirs.create("graft-blj-scale-")
    val props = Map("write.clustered-by" -> "bucket(32,k)",
      "write.clustered-by.files" -> "16")
    val ta = GraftTable.create(spark, wh.resolve("a"), "d.a", schemaA,
      props)
    val tb = GraftTable.create(spark, wh.resolve("b"), "d.b", schemaB,
      props)
    // 4 appends x 16 files = 64 files per side, buckets straddled
    (1 to 4).foreach { w =>
      ta.append(spark.createDataFrame((1L to 20000L)
        .map(i => Row(i % 4999, s"a$w-$i")).asJava, schemaA))
      tb.append(spark.createDataFrame((1L to 10000L)
        .map(i => Row(i % 997, i)).asJava, schemaB))
    }
    assert(ta.files.filter("content = 0").count() >= 32)
    val la = ta.bucketLocalRead("k")
    val lb = tb.bucketLocalRead("k")
    assert(la.isDefined && lb.isDefined)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = la.get.join(lb.get, "k")
      assert(exchanges(j) === 0)
      assert(j.rdd.getNumPartitions === 32)
      val ra = ta.read(); val rb = tb.read()
      assert(j.count() === ra.join(rb, "k").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      saved)
  }

  test("widening a bucket-clustered key is refused (type-sensitive " +
    "hash would falsify every file's bucket stat)") {
    val wh = graft.ScratchDirs.create("graft-blj-widen-")
    val sch = StructType.fromDDL("k INT, v STRING")
    val t = GraftTable.create(spark, wh.resolve("w"), "d.w", sch,
      Map("write.clustered-by" -> "bucket(4,k)"))
    t.append(spark.createDataFrame(
      (1 to 50).map(i => Row(i, s"v$i")).asJava, sch))
    val e = intercept[IllegalArgumentException](
      t.widenColumn("k", LongType))
    assert(e.getMessage.contains("bucket"))
    // widening a NON-clustered column stays allowed
    val t2 = GraftTable.create(spark, wh.resolve("w2"), "d.w2", sch,
      Map("write.clustered-by" -> "bucket(4,k)"))
    t2.append(spark.createDataFrame(
      (1 to 10).map(i => Row(i, s"v$i")).asJava, sch))
    t2.widenColumn("v", StringType) // no-op same-type passes
  }

  test("partially-clustered read: splitFactor f claims " +
    "HashPartitioning(key, n*f) — parallelism beyond the bucket " +
    "count, zero exchanges when both sides share f, identical results") {
    val (ta, tb) = mkTables(n = 4)
    val sessionThreshold =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val la = ta.bucketLocalRead("k", splitFactor = 2).get
      val lb = tb.bucketLocalRead("k", splitFactor = 2).get
      // 4 buckets × factor 2 = 8 partitions: more tasks than buckets
      assert(la.rdd.getNumPartitions === 8)
      // the n*f claim is LITERALLY true: partition j holds exactly
      // pmod(hash(k), 8) = j (each bucket's files re-read behind the
      // finer residual)
      val misplaced = la.select(
        spark_partition_id().as("p"),
        pmod(hash(col("k")), lit(8)).as("b"))
        .filter(col("p") =!= col("b")).count()
      assert(misplaced === 0)
      val local = la.join(lb, "k")
      assert(exchanges(local) === 0,
        s"same-factor sides must stay exchange-free:\n" +
          local.queryExecution.executedPlan)
      val shuffled = ta.read().join(tb.read(), "k")
      assert(grouped(local) === grouped(shuffled))
      // MIXED factors (8-way vs 4-way) still return identical rows —
      // Spark re-shuffles one side instead of mis-joining
      val mixed = la.join(tb.bucketLocalRead("k").get, "k")
      assert(grouped(mixed) === grouped(shuffled))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      sessionThreshold)
  }

  test("bucket-count operational guard: maxBucketBytes refuses an " +
    "under-bucketed read (self-vetting fallback); maintain() surfaces " +
    "the advisory") {
    val (ta, tb) = mkTables(n = 2) // all bytes across only 2 buckets
    val key = "spark.graft.bucketLocalJoin.maxBucketBytes"
    try {
      spark.conf.set(key, "1") // anything over 1 byte/bucket refuses
      assert(ta.bucketLocalRead("k").isEmpty,
        "over-cap bucket load must fall back to the shuffled read")
      // the fallback is the ordinary read — nothing breaks, only the
      // layout claim is withheld
      assert(ta.read().count() === 6000)
    } finally spark.conf.unset(key)
    assert(ta.bucketLocalRead("k").isDefined, "uncapped read claims")
    // fleet-sweep advisory: report-only row, no commit
    val v0 = ta.version
    ta.setProperties(Map(
      "maintenance.bucket.max-bytes-per-bucket" -> "1",
      "maintenance.compact.min-small-files" -> "1000",
      "maintenance.compact.min-delete-files" -> "1000"))
    val report = ta.maintain()
    assert(report.map(_._1) === Seq("bucket-load-warning"))
    assert(ta.version === v0 + 1,
      "advisory must not commit (the only new version is setProperties')")
  }

  test("a projection aliasing a DIFFERENT column to the key's name " +
    "must NOT keep the layout claim (key tracked by exprId, not name) " +
    "— while a legitimate rename of the key itself does") {
    val (ta, _) = mkTables()
    val la = ta.bucketLocalRead("k").get
    // hijack: drop the bucketed key, alias another column to its name.
    // A name-based claim would bind HashPartitioning to the hijacker,
    // elide the aggregation exchange, and return per-bucket partial
    // groups (wrong results).
    val hijacked = la.select(col("a").as("k"))
    val agg = hijacked.groupBy("k").agg(count(lit(1)).as("n"))
    assert(exchanges(agg) > 0,
      "false layout claim elided a required exchange:\n" +
        agg.queryExecution.executedPlan)
    val expected = ta.read().select(col("a").as("k"))
      .groupBy("k").agg(count(lit(1)).as("n"))
    assert(agg.orderBy("k").collect().toSeq ===
      expected.orderBy("k").collect().toSeq)
    // control: renaming the KEY keeps the claim (exprId survives)
    val renamed = la.select(col("k").as("kk"))
    val agg2 = renamed.groupBy("kk").agg(count(lit(1)).as("n"))
    assert(exchanges(agg2) === 0,
      "legitimate key rename must keep the zero-exchange claim:\n" +
        agg2.queryExecution.executedPlan)
  }
}
