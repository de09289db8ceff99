package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratchpad: schema/plan inspection while building queries.
  * Not part of the engine surface.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("warmup count")(docs.count())

    // A: current HOF formulation, no distinct
    val hofNoDistinct = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 3), " +
          "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))")).as("sh"))
    (1 to 2).foreach(i => time(s"A hof no-distinct $i")(hofNoDistinct.count()))

    // B: with distinct
    (1 to 2).foreach(i => time(s"B hof distinct $i")(hofNoDistinct.distinct().count()))

    // C: posexplode + window-free shingling via substring over rejoined text?
    //    Instead: slice-based — explode positions, 3 array reads outside lambda
    val c = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 3)).as("i"))
      .select(col("doc_id"), concat_ws(" ",
        element_at(col("toks"), col("i") + 1),
        element_at(col("toks"), col("i") + 2),
        element_at(col("toks"), col("i") + 3)).as("sh"))
    (1 to 2).foreach(i => time(s"C posexplode $i")(c.count()))
    (1 to 2).foreach(i => time(s"C distinct $i")(c.distinct().count()))

    // D: typed flatMap
    import spark.implicits._
    val d = docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = text.split(' ')
        if (t.length < 3) Iterator.empty
        else t.iterator.sliding(3).map(w => (id, w.mkString(" ")))
      }.toDF("doc_id", "sh")
    (1 to 2).foreach(i => time(s"D flatMap $i")(d.count()))
    (1 to 2).foreach(i => time(s"D distinct $i")(d.distinct().count()))

    spark.stop()
  }
}
