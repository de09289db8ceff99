package graft.llm

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Structural invariants for the round-6 curation operators, beyond the
  * DuckDB hash oracle: the winnowing detection guarantee, the
  * content-defined chunker's insertion robustness, normalization-dedup
  * twin pairing, and DSIR weight separation on a corpus where the
  * target language actually has a distinct distribution (the driver
  * corpus shares one vocabulary across langs, so the oracle checks the
  * math while this spec checks the discrimination).
  */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  private val run = 1 to 40

  test("winnowing guarantee: docs sharing a token run of >= k+w-1 " +
    "share at least one fingerprint; disjoint docs share none") {
    val shared = "alpha beta gamma delta epsilon zeta"  // 6 = k+w-1 tokens
    val docs = Seq(
      (1L, s"one two three four five $shared six seven eight"),
      (2L, s"$shared nine ten eleven twelve thirteen fourteen"),
      (3L, "p q r s t u v w x y z aa bb cc")).toDF("doc_id", "text")
    val fp = CurationQueries.winnowingFingerprints(docs)
      .select("doc_id", "fp").as[(Long, Long)].collect()
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      "shared >= k+w-1 run must yield a shared fingerprint")
    assert((byDoc(1L) & byDoc(3L)).isEmpty &&
      (byDoc(2L) & byDoc(3L)).isEmpty,
      "no common trigram => no shared fingerprint")
  }

  test("content-defined chunking: a prefix insertion leaves every " +
    "chunk after the next boundary identical (the rsync property), " +
    "and a 1-token doc is exactly one chunk") {
    val base = run.map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, s"inserted $base"), (3L, "solo"))
      .toDF("doc_id", "text")
    val ch = CurationQueries.cdcChunkTexts(docs)
      .select("doc_id", "chunk_idx", "ctext")
      .as[(Long, Int, String)].collect()
    val byDoc = ch.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // all chunks except each side's first (differing) ones realign
    assert((byDoc(1L).toSet & byDoc(2L).toSet).size >= byDoc(1L).size - 1,
      s"chunks must realign after the insertion point: ${byDoc(1L)} " +
        s"vs ${byDoc(2L)}")
    assert(byDoc(3L) == Seq("solo"))
    // chunk texts reassemble the doc exactly
    assert(byDoc(1L).mkString(" ") == base)
  }

  test("normalization dedup pairs every doc with its noised twin on " +
    "the real corpus slice") {
    val out = graft.SparkEntry.queries("q_dedup_normalized")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val n = out.length / 2
    assert(out.count(_._3) == n, "exactly one keeper per pair")
    // every twin (id + 1000000) resolves to its original as canonical
    out.filter(_._1 >= 1000000L).foreach { case (id, canon, keep) =>
      assert(canon == id - 1000000L && !keep,
        s"twin $id must canonicalize to ${id - 1000000L}, got $canon")
    }
  }

  test("DSIR importance weights separate target-distributed docs when " +
    "the target language has a distinct vocabulary") {
    val en = (1 to 20).map(i =>
      (i.toLong, "en", run.map(j => s"w${j % 7}").mkString(" ")))
    val other = (1 to 20).map(i =>
      (100L + i, "zz", run.map(j => s"v${j % 9}").mkString(" ")))
    val docs = (en ++ other).toDF("doc_id", "lang", "text")
    val w = CurationQueries.importanceWeights(docs, "en")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val enAvg = w.filter(_._1 < 100).map(_._2).sum / 20
    val otherAvg = w.filter(_._1 >= 100).map(_._2).sum / 20
    assert(enAvg > 0 && otherAvg < 0,
      s"target docs must score positive, others negative " +
        s"(got en=$enAvg other=$otherAvg)")
  }

  test("semantic dedup: drop decisions are exactly 'has a smaller-id " +
    "near neighbor in my cell', and every vector appears once") {
    val out = graft.SparkEntry.queries("q_dedup_semantic")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getBoolean(3)))
    assert(out.map(_._1).distinct.length == out.length)
    // keep=false requires at least one near-dup; n_dups=0 implies keep
    out.foreach { case (id, _, nDups, keep) =>
      if (!keep) assert(nDups > 0, s"vec $id dropped without a dup")
    }
    // the smallest vec_id of every cell is always kept (it can have no
    // smaller-id neighbor)
    out.groupBy(_._2).foreach { case (cell, vs) =>
      val smallest = vs.minBy(_._1)
      assert(smallest._4, s"cell $cell smallest ${smallest._1} dropped")
    }
  }

  test("perplexity buckets: per-lang tertile counts differ by at most " +
    "one and bucket NLL ranges are ordered head <= middle <= tail") {
    val out = graft.SparkEntry.queries("q_text_ppl_buckets")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    out.groupBy(_._1).foreach { case (lang, rows) =>
      val counts = rows.map(_._3)
      assert(counts.max - counts.min <= 1,
        s"$lang tertiles unbalanced: ${rows.mkString(", ")}")
      val byBucket = rows.map(r => r._2 -> (r._4, r._5)).toMap
      for (Seq(lo, hi) <- Seq("head", "middle", "tail")
          .filter(byBucket.contains).sliding(2) if byBucket.size > 1) {
        assert(byBucket(lo)._2 <= byBucket(hi)._1 + 1e-9,
          s"$lang: $lo max NLL must not exceed $hi min NLL")
      }
    }
  }
}
