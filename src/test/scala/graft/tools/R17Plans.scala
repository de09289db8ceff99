package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** r17 plan-evidence dumps: writes plans/r17/<q>_{before,after}.txt
  * for the queries whose optimization is a PLAN change. "before"
  * plans are the pre-r17 compositions reconstructed verbatim;
  * "after" plans come from the live query registry.
  * Usage: runMain graft.tools.R17Plans [sfDir] */
object R17Plans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    def write(path: String, content: String): Unit = {
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(path).getParent)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(path), content)
      println(s"wrote $path")
    }
    def after(q: String): Unit =
      write(s"plans/r17/${q}_after.txt",
        s"$q — r17-optimized plan.\n\n" +
          fmt(graft.SparkEntry.queries(q)(spark, dir)))

    // ---- q_window_mad: pre-r17 shape (filter-pushdown duplication) --
    {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val wf = w.rowsBetween(-9, Window.currentRow)
      val before = graft.rel.Tables.events(spark, dir)
        .withColumn("vi",
          expr("cast(floor(value * 10000 + 0.5) as bigint)"))
        .withColumn("rn", row_number().over(w))
        .withColumn("win", array_sort(collect_list(col("vi")).over(wf)))
        .filter(col("rn") >= 10)
        .withColumn("med", expr("win[4]"))
        .withColumn("mad", expr(
          "array_sort(transform(win, x -> abs(x - win[4])))[4]"))
        .filter(expr("abs(vi - med) > 3 * mad"))
        .select(col("user_id"), col("event_id"), col("vi"), col("med"),
          col("mad"), lit(1).as("anomaly"))
        .orderBy("user_id", "event_id")
      write("plans/r17/q_window_mad_before.txt",
        "q_window_mad — pre-r17 composition (note the Filter node:\n" +
          "the med/mad projection is inlined into the condition, so\n" +
          "the interpreted array_sort lambda appears 4x).\n\n" +
          fmt(before))
      after("q_window_mad")
    }

    // ---- q_text_langid_chargram: pre-r17 shape (explode twice) -----
    {
      val docs = graft.rel.Tables.documents(spark, dir)
      val items = docs.filter(length(col("text")) >= 2)
        .select(col("doc_id"), col("lang"),
          explode(expr("transform(sequence(1, length(text) - 1), " +
            "i -> substring(text, i, 2))")).as("item"))
      val top = items.groupBy("lang", "item").agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("lang").orderBy(desc("c"), asc("item"))))
        .filter(col("rk") <= 20)
        .select(col("lang").as("cand_lang"), col("item"))
      val di = items.select("doc_id", "item").distinct()
      val scores = di.join(broadcast(top), Seq("item"))
        .groupBy("doc_id", "cand_lang").agg(count(lit(1)).as("score"))
      val grid = docs.select("doc_id", "lang")
        .crossJoin(broadcast(
          docs.select(col("lang").as("cand_lang")).distinct()))
      val before = grid.join(scores, Seq("doc_id", "cand_lang"), "left")
        .na.fill(0L, Seq("score"))
        .withColumn("rk", row_number().over(Window.partitionBy("doc_id")
          .orderBy(desc("score"), asc("cand_lang"))))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("lang"),
          col("cand_lang").as("pred_lang"), col("score"))
        .orderBy("doc_id")
      write("plans/r17/q_text_langid_chargram_before.txt",
        "q_text_langid_chargram — pre-r17 composition (the char-bigram\n" +
          "explode subplan appears under BOTH the profile aggregate\n" +
          "and the per-doc distinct — different exchange keys, no\n" +
          "ReuseExchange).\n\n" + fmt(before))
      after("q_text_langid_chargram")
    }
    spark.stop()
  }
}
