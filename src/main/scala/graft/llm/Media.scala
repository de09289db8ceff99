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
  * The decode step is a STUB: this container has no image/audio codec
  * libraries, so `decodeStub` derives deterministic fake dimensions /
  * features from the bytes. Everything around it — schema, encoders,
  * partition-iterator batch shape, frame slicing, downstream
  * aggregation — is real and tested (LlmSpec).
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

  /** STUB decode: a real build would invoke an image codec here; the
    * fake derives (width, height) and byte statistics deterministically
    * from the payload so tests are reproducible.
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
      // per-partition setup for a real codec would go here
      it.map { r =>
        val (w, h, mean, max) = decodeStub(r.media)
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
