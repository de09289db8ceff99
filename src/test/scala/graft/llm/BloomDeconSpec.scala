package graft.llm

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.SparkSuite
import graft.rel.Tables

/** q_pipe_bloom_decontaminate is oracle-checked for exactness (the
  * confirm join removes bloom false positives), so what the spec pins
  * is the bloom layer itself: the prefilter passes every truly-shared
  * gram (no false negatives — the property that makes the confirm join
  * sufficient), prunes the corpus gram stream by orders of magnitude
  * (the property that makes it worth running), and the native
  * bloom_might_contain kernel agrees with the library probe bit-for-
  * bit and lands in the executed plan.
  */
class BloomDeconSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.01"

  private def grams(srcFilter: org.apache.spark.sql.Column) =
    DedupQueries.wordGrams(
      Tables.documents(spark, dir).filter(srcFilter), 5, Seq("doc_id"))

  private def evalFilter(): BloomFilter = {
    val egs = grams(col("source") === "src4").select("g").distinct()
      .collect().map(_.getString(0))
    val f = BloomFilter.create(math.max(egs.length.toLong, 1024L), 0.001)
    egs.foreach(g => f.putBinary(g.getBytes(UTF_8)))
    f
  }

  test("bloom prefilter: no false negatives, and the corpus gram " +
    "stream prunes to well under 1% before the confirm join") {
    val bf = evalFilter()
    val corpus = grams(col("source") =!= "src4").select("g").distinct()
      .collect().map(_.getString(0))
    val eval = grams(col("source") === "src4").select("g").distinct()
      .collect().map(_.getString(0)).toSet
    val survivors = corpus.filter(g => bf.mightContainBinary(g.getBytes(UTF_8)))
    val trueShared = corpus.filter(eval.contains)
    assert(trueShared.forall(survivors.contains),
      "a bloom filter must never drop a truly-shared gram")
    assert(trueShared.nonEmpty, "fixture must actually be contaminated")
    assert(survivors.length < corpus.length / 100,
      s"prune too weak: ${survivors.length} of ${corpus.length} survive")
  }

  test("native bloom_might_contain matches the library probe on every " +
    "corpus gram and appears in the executed plan") {
    val bf = evalFilter()
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val corpus = grams(col("source") =!= "src4").select("g").distinct()
    val viaKernel = corpus
      .filter(call_function("bloom_might_contain", lit(bytes), col("g")))
      .collect().map(_.getString(0)).toSet
    val viaLib = corpus.collect().map(_.getString(0))
      .filter(g => bf.mightContainBinary(g.getBytes(UTF_8))).toSet
    assert(viaKernel === viaLib)

    val q = graft.SparkEntry.queries("q_pipe_bloom_decontaminate")(spark, dir)
    q.collect()
    assert(q.queryExecution.executedPlan.toString
      .contains("bloom_might_contain"),
      "the native kernel must be in the executed plan, not the fallback")
  }

  test("null gram probes to null; a non-foldable filter is rejected " +
    "at analysis") {
    val df = spark.range(1).select(
      lit(null).cast("string").as("g"), lit(Array[Byte](1, 2)).as("junk"))
    val bf = evalFilter()
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val r = df.select(
      call_function("bloom_might_contain", lit(bytes), col("g")).as("p"))
      .collect()
    assert(r.head.isNullAt(0))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("bloom_might_contain", col("junk"), lit("x")))
        .collect()
    }
    assert(err.getMessage.contains("foldable"))
  }
}
