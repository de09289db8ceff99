package graft.lake

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Runtime join-driven file pruning ([[GraftTable.readForJoin]]) —
  * the DPP / runtime-filtering analog over manifest stats: a bounded
  * dim key set prunes the fact's file list pre-plan (range stats for
  * range-clustered layouts, bucket stats for bucket-clustered ones)
  * and the IN filter still reaches the parquet scan. Pins pruning on
  * both layouts, the over-budget and null-masking fallbacks, empty /
  * all-null dims, and filter pushdown in the executed plan. */
class RuntimePruneSpec extends SparkSuite {

  private val factSchema = StructType.fromDDL("k BIGINT, v BIGINT")
  private val dimSchema = StructType.fromDDL("dk BIGINT, tag STRING")

  private def mkFact(props: Map[String, String]): GraftTable = {
    val wh = graft.ScratchDirs.create("graft-rtp-")
    val t = GraftTable.create(spark, wh.resolve("fact"), "d.fact",
      factSchema, props ++ Map("write.clustered-by.files" -> "8"))
    t.append(spark.createDataFrame(
      (0L until 8000L).map(i => Row(i, i * 3)).asJava, factSchema))
    t
  }

  private def dimOf(keys: Seq[java.lang.Long]): DataFrame =
    spark.createDataFrame(
      keys.map(k => Row(k, "t")).asJava, dimSchema)

  test("range-clustered fact: a narrow dim key band prunes to the " +
    "files whose recorded range intersects it; join rows identical") {
    val t = mkFact(Map("write.clustered-by" -> "k"))
    val all = t.read().inputFiles.length
    assert(all >= 8, s"expected >=8 clustered files, got $all")
    val dim = dimOf((100L to 140L).map(Long.box))
    val pruned = t.readForJoin("k", dim, "dk")
    assert(pruned.inputFiles.length < all,
      s"narrow band must prune: ${pruned.inputFiles.length} vs $all")
    val got = pruned.join(dim, pruned("k") === dim("dk"))
      .select("k", "v").orderBy("k").collect().toSeq
    val ro = t.read()
    val want = ro.join(dim, ro("k") === dim("dk"))
      .select("k", "v").orderBy("k").collect().toSeq
    assert(got === want)
    assert(got.size === 41)
  }

  test("bucket-clustered fact: scattered keys prune by bucket stat " +
    "(range stats are useless there)") {
    val t = mkFact(Map("write.clustered-by" -> "bucket(8,k)"))
    val all = t.read().inputFiles.length
    assert(all >= 4, s"expected several bucket files, got $all")
    // two keys land in at most two buckets; six-plus files prune
    val dim = dimOf(Seq(Long.box(17L), Long.box(4242L)))
    val pruned = t.readForJoin("k", dim, "dk")
    assert(pruned.inputFiles.length < all,
      s"bucket stats must prune: ${pruned.inputFiles.length} vs $all")
    val got = pruned.join(dim, pruned("k") === dim("dk")).count()
    assert(got === 2L)
  }

  test("the IN filter reaches the parquet scan (PushedFilters)") {
    val t = mkFact(Map("write.clustered-by" -> "k"))
    // two keys: a single-element IN would fold to EqualTo in Catalyst
    val pruned = t.readForJoin("k",
      dimOf(Seq(Long.box(5L), Long.box(7L))), "dk")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(k"),
      s"IN must push to the scan:\n$plan")
  }

  test("over-maxKeys falls back to the scan-all read; a null in a " +
    "TRUNCATED key batch must not make the set look complete") {
    val t = mkFact(Map("write.clustered-by" -> "k"))
    val all = t.read().inputFiles.length
    val wide = dimOf((0L to 50L).map(Long.box))
    assert(t.readForJoin("k", wide, "dk", maxKeys = 10)
      .inputFiles.length === all)
    // 3 distinct values (1, 2, null) with maxKeys = 2: the collect is
    // truncated; dropping the null first would leave exactly 2 keys
    // and silently prune against an incomplete set
    val withNull = dimOf(Seq(Long.box(1L), Long.box(2L), null))
    assert(t.readForJoin("k", withNull, "dk", maxKeys = 2)
      .inputFiles.length === all)
  }

  test("empty and all-null dims read no rows (an equi-join can never " +
    "match them)") {
    val t = mkFact(Map("write.clustered-by" -> "k"))
    assert(t.readForJoin("k", dimOf(Nil), "dk").count() === 0L)
    assert(t.readForJoin("k", dimOf(Seq(null, null)), "dk")
      .count() === 0L)
  }

  test("unknown key column refuses loudly") {
    val t = mkFact(Map("write.clustered-by" -> "k"))
    intercept[IllegalArgumentException](
      t.readForJoin("nope", dimOf(Seq(Long.box(1L))), "dk"))
  }

  test("computeTableStats: KMV NDV within 15% of exact on sf0.1 " +
    "lineitem columns; appends fold in-place; .stats staleness " +
    "tracks row-removing commits; re-analyze refreshes") {
    val li = spark.read
      .parquet("/root/testdata/sf0.1/lineitem.parquet")
      .selectExpr("CAST(l_orderkey AS BIGINT) AS l_orderkey",
        "CAST(l_partkey AS BIGINT) AS l_partkey",
        "CAST(l_suppkey AS BIGINT) AS l_suppkey",
        "CAST(l_returnflag AS STRING) AS l_returnflag")
    val wh = graft.ScratchDirs.create("graft-ndv-")
    val t = GraftTable.create(spark, wh.resolve("li"), "d.li",
      StructType.fromDDL("l_orderkey BIGINT, l_partkey BIGINT, " +
        "l_suppkey BIGINT, l_returnflag STRING"), Map.empty)
    t.append(li)
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_returnflag")
    val ndv = t.computeTableStats(cols)
    val exact = cols.map(c =>
      c -> li.agg(countDistinct(col(c))).head.getLong(0)).toMap
    for (c <- cols) {
      val (e, got) = (exact(c), ndv(c))
      assert(math.abs(got - e) <= 0.15 * e,
        s"$c: estimate $got vs exact $e exceeds 15%")
    }
    // a tiny domain sits below k: the sketch is exact there
    assert(ndv("l_returnflag") === exact("l_returnflag"))
    // the .stats relation: fresh right after the analyze
    def stats() = t.statsTable.collect()
      .map(r => r.getString(0) -> r).toMap
    assert(cols.forall(c => !stats()(c).getBoolean(5)),
      "sketches must be fresh right after ANALYZE")
    // appends FOLD without re-analyzing: new disjoint keys show up
    val shift = 10000000L
    t.append(spark.range(5000).selectExpr(
      s"id + $shift AS l_orderkey", s"id + $shift AS l_partkey",
      s"id + $shift AS l_suppkey", "'Z' AS l_returnflag"))
    val after = t.columnNdv("l_orderkey").get
    val exactAfter = exact("l_orderkey") + 5000
    assert(math.abs(after - exactAfter) <= 0.15 * exactAfter,
      s"folded estimate $after vs exact $exactAfter exceeds 15%")
    assert(t.columnNdv("l_returnflag").contains(
      exact("l_returnflag") + 1), "below-k fold stays exact")
    assert(!stats()("l_orderkey").getBoolean(5),
      "append folds keep the sketch fresh")
    // a row-removing commit flips stale (estimate = upper bound)...
    t.delete(col("l_returnflag") === "Z")
    assert(stats()("l_returnflag").getBoolean(5),
      "a delete must mark sketches stale")
    assert(t.columnNdv("l_returnflag").contains(
      exact("l_returnflag") + 1),
      "stale sketch keeps the pre-delete upper bound")
    // a LATER append must not clear the stale flag the delete earned
    // (hashes still fold — the estimate keeps covering the new rows)
    val beforeLateFold = t.columnNdv("l_orderkey").get
    t.append(spark.range(1000).selectExpr(
      s"id + ${2 * shift} AS l_orderkey",
      s"id + ${2 * shift} AS l_partkey",
      s"id + ${2 * shift} AS l_suppkey", "'Y' AS l_returnflag"))
    assert(stats()("l_orderkey").getBoolean(5),
      "an append after a delete must NOT clear staleness")
    assert(t.columnNdv("l_orderkey").get > beforeLateFold,
      "hashes still fold while stale")
    // ...and a re-analyze refreshes to the live domain
    val re = t.computeTableStats(Seq("l_returnflag"))
    assert(re("l_returnflag") === exact("l_returnflag") + 1,
      "live flags after the Z-delete and Y-append: A,N,R,Y")
    assert(!stats()("l_returnflag").getBoolean(5))
    // a BRANCH append never folds and flips stale once fast-forwarded
    // (its rows entered main lineage without ever entering the sketch)
    t.computeTableStats(Seq("l_orderkey"))
    assert(!stats()("l_orderkey").getBoolean(5))
    t.createRef("staged", "branch")
    t.appendToBranch("staged", spark.range(10).selectExpr(
      s"id + ${3 * shift} AS l_orderkey",
      s"id + ${3 * shift} AS l_partkey",
      s"id + ${3 * shift} AS l_suppkey", "'B' AS l_returnflag"))
    assert(!stats()("l_orderkey").getBoolean(5),
      "a branch append alone leaves main-lineage sketches fresh")
    t.fastForward("main", t.refSnapshotId("staged"))
    assert(stats()("l_orderkey").getBoolean(5),
      "fast-forwarded branch rows were never folded: stale must flip")
    // sketches key by PHYSICAL name: a logical RENAME keeps them
    // (same reason file stats survive renames)
    val preRename = t.columnNdv("l_suppkey")
    t.renameColumn("l_suppkey", "supp")
    assert(t.columnNdv("supp") === preRename,
      "a renamed column must keep its sketch")
    assert(t.columnNdv("l_suppkey").isEmpty,
      "the old logical name no longer resolves")
    // unknown and complex columns both refuse
    intercept[IllegalArgumentException](
      t.computeTableStats(Seq("no_such_column")))
    val tc = GraftTable.create(spark, wh.resolve("cx"), "d.cx",
      StructType.fromDDL("id BIGINT, xs ARRAY<BIGINT>"), Map.empty)
    val eCx = intercept[IllegalArgumentException](
      tc.computeTableStats(Seq("xs")))
    assert(eCx.getMessage.contains("no NDV space"), eCx.getMessage)
    // the default column set silently SKIPS ineligible types
    assert(tc.computeTableStats().keySet === Set("id"))
  }

  test("∀ layout x random key set (incl. nulls, misses, duplicates, " +
    "over-budget): readForJoin.join ≡ read.join — the pruned frame is " +
    "always join-equivalent") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.rng.Seed
    // one table per layout, built once (the property varies only the
    // dim side — layout correctness is what the generators stress)
    val tables = Seq(
      "range" -> mkFact(Map("write.clustered-by" -> "k")),
      "bucket" -> mkFact(Map("write.clustered-by" -> "bucket(8,k)")),
      "none" -> mkFact(Map.empty))
    val genKey: Gen[java.lang.Long] = Gen.frequency(
      (8, Gen.choose(0L, 7999L).map(Long.box)), // hits
      (2, Gen.choose(8000L, 20000L).map(Long.box)), // misses
      (1, Gen.const(null: java.lang.Long))) // nulls never match
    val genKeys = Gen.choose(0, 40).flatMap(Gen.listOfN(_, genKey))
    val genMax = Gen.oneOf(3, 10000) // force the fallback sometimes
    val prop = Prop.forAll(genKeys, genMax) { (keys, maxKeys) =>
      tables.forall { case (label, t) =>
        val dim = dimOf(keys)
        val pruned = t.readForJoin("k", dim, "dk", maxKeys)
        val got = pruned.join(dim, pruned("k") === dim("dk"))
          .select("k", "v").collect().map(r =>
            (r.getLong(0), r.getLong(1))).sorted.toSeq
        val ro = t.read()
        val want = ro.join(dim, ro("k") === dim("dk"))
          .select("k", "v").collect().map(r =>
            (r.getLong(0), r.getLong(1))).sorted.toSeq
        if (got != want)
          println(s"[$label] keys=$keys maxKeys=$maxKeys: " +
            s"${got.size} vs ${want.size}")
        got == want
      }
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(
        sys.props.get("graft.prune.runs").map(_.toInt).getOrElse(30))
      .withInitialSeed(Seed(4242L))
      .withWorkers(1)
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
