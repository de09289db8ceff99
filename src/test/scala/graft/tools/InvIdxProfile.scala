package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.lake.GraftCatalog
import graft.llm.TextQueries

/** Dev probe: per-phase timing of q_lake_inverted_index. */
object InvIdxProfile {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (round <- 1 to 2) {
      var t0 = System.nanoTime()
      def lap(nm: String): Unit = {
        val t = System.nanoTime()
        println(f"[$round] $nm: ${(t - t0) / 1e9}%.2f s"); t0 = t
      }
      val docSchema = StructType.fromDDL("doc_id BIGINT, text STRING")
      val cat = new GraftCatalog(s, graft.ScratchDirs.create("graft-wh-"))
      cat.createNamespace("default")
      val corpus = cat.createTable("default", "corpus", docSchema,
        Map("write.delete.mode" -> "merge-on-read"))
      val postings = cat.createTable("default", "postings",
        StructType.fromDDL("doc_id BIGINT, tok STRING, tf BIGINT"))
      lap("create x2")
      var from: Option[Long] = None
      def maintain(firstWindow: Boolean): Unit = {
        val head = corpus.currentSnapshot.get.snapshotId
        val delta = corpus.changes(from, Some(head))
        from = Some(head)
        val last = delta.groupBy("doc_id")
          .agg(max(struct(col("_change_ordinal"),
            (col("_change_type") === "insert").cast("int").as("is_ins"),
            col("text"))).as("m"))
          .select(col("doc_id"), col("m.is_ins").as("is_ins"),
            col("m.text").as("text"))
        if (!firstWindow) postings.equalityDelete(last.select("doc_id"))
        lap("  maintain.eqdelete")
        val upserts = last.filter(col("is_ins") === 1)
          .select("doc_id", "text")
        val (p, _) = TextQueries.bm25Index(upserts)
        postings.append(p.select(col("doc_id"), col("tok"),
          col("tf").cast("long").as("tf")))
        lap("  maintain.append")
      }
      def serve(phase: String): Unit = {
        val stored = postings.read()
        val docLens = stored.groupBy("doc_id")
          .agg(sum("tf").cast("long").as("dl"))
        val fromIndex = TextQueries.bm25FromIndex(stored, docLens)
          .orderBy(desc("score_micro"), col("doc_id"))
          .collect()
        lap(s"  serve.$phase (${fromIndex.length} rows)")
      }
      val docs = graft.rel.Tables.documents(s, dir)
        .filter(col("doc_id") < 500).select("doc_id", "text")
      corpus.append(docs.filter(col("doc_id") < 250))
      lap("append w1")
      maintain(firstWindow = true)
      serve("w1")
      corpus.append(docs.filter(col("doc_id") >= 250))
      lap("append w2")
      corpus.delete(col("doc_id") % 7 === 0)
      lap("delete w2")
      maintain(firstWindow = false)
      serve("w2")
    }
    s.stop()
  }
}
