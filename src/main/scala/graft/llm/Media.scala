package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2l [EXT]): media payloads
  * travel as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extraction / frame-sampling run as typed Dataset
  * transformations over `mapPartitions` (the JVM analog of
  * `mapInPandas`: one iterator per partition, so per-batch setup — a
  * real codec context, an inference session — amortizes across the
  * partition instead of per row).
  *
  * The decode step uses the JDK's bundled image codecs
  * (javax.imageio: PNG/JPEG/BMP/GIF) when the payload is a decodable
  * image, and falls back to a deterministic byte-derived stub for
  * everything else (the demo corpus carries text bytes; audio/video
  * codecs aren't in this container). Schema, encoders,
  * partition-iterator batch shape, frame slicing, and downstream
  * aggregation are identical on both paths and tested (LlmSpec).
  *
  * Scale notes (100 TB): media rows are heavy, so every transform here
  * is narrow (no shuffle); features are projected BEFORE any groupBy so
  * the shuffle carries only small numeric columns, never the payload.
  * `spark.sql.files.maxPartitionBytes` governs task sizing for large
  * binary scans.
  */
object Media {

  final case class MediaRecord(
      doc_id: Long, source: String, fmt: String, media: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long, source: String, n_bytes: Long,
      width: Int, height: Int, mean_byte: Double, max_byte: Int)

  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Attach a binary media column + metadata to `documents`. The demo
    * corpus has no real media, so the payload is the UTF-8 text bytes —
    * the pipeline treats it as opaque either way.
    */
  def attach(docs: DataFrame): Dataset[MediaRecord] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"), col("source"), lit("img/fake").as("fmt"),
      col("text").cast("binary").as("media"))
      .as[MediaRecord]
  }

  /** REAL decode via the JDK's bundled codecs (javax.imageio reads
    * PNG/JPEG/BMP/GIF with no external libraries): width/height from
    * the decoded raster, mean/max over the gray level of every pixel.
    * Returns None when the payload isn't a decodable image, and the
    * caller falls back to [[decodeStub]] — same interface either way.
    */
  private[llm] def decodeImage(bytes: Array[Byte])
      : Option[(Int, Int, Double, Int)] =
    try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var max = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val gray = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
              (rgb & 0xff)) / 3
            sum += gray
            if (gray > max) max = gray
            x += 1
          }
          y += 1
        }
        (w, h, sum.toDouble / (w.toLong * h), max)
      }
    } catch { case _: Throwable => None }

  /** Decode entry point: real codec first, deterministic stub for
    * non-image payloads (the demo corpus carries text bytes). */
  private[llm] def decode(bytes: Array[Byte]): (Int, Int, Double, Int) =
    decodeImage(bytes).getOrElse(decodeStub(bytes))

  /** STUB decode: derives (width, height) and byte statistics
    * deterministically from the payload so tests are reproducible on
    * non-image payloads.
    */
  private[llm] def decodeStub(bytes: Array[Byte]): (Int, Int, Double, Int) = {
    val n = bytes.length
    val width = 64 + (n % 512)
    val height = 64 + (if (n > 0) bytes(0) & 0x3f else 0)
    var sum = 0L
    var max = 0
    var i = 0
    while (i < n) { val b = bytes(i) & 0xff; sum += b; if (b > max) max = b; i += 1 }
    val mean = if (n == 0) 0.0 else sum.toDouble / n
    (width, height, mean, max)
  }

  /** Feature extraction over partition iterators — the hot path never
    * leaves the executor, and per-partition setup cost (codec init in a
    * real build) is paid once per task.
    */
  def decodeFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val s = ds.sparkSession
    import s.implicits._
    ds.mapPartitions { it =>
      // ImageIO caches reader instances per thread; per-partition
      // setup for a heavier codec/inference session would go here
      it.map { r =>
        val (w, h, mean, max) = decode(r.media)
        MediaFeatures(r.doc_id, r.source, r.media.length.toLong, w, h, mean, max)
      }
    }
  }

  /** Frame sampling: slice the payload into fixed-size frames and keep
    * every `stride`-th one (video keyframe analog). Narrow flatMap —
    * output rows stay on their input partition.
    */
  def sampleFrames(ds: Dataset[MediaRecord], frameSize: Int, stride: Int): Dataset[Frame] = {
    val s = ds.sparkSession
    import s.implicits._
    ds.flatMap { r =>
      val nFrames = (r.media.length + frameSize - 1) / frameSize
      (0 until nFrames by stride).map { f =>
        val from = f * frameSize
        val until = math.min(from + frameSize, r.media.length)
        Frame(r.doc_id, f, java.util.Arrays.copyOfRange(r.media, from, until))
      }
    }
  }
}
