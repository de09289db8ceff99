package graft.llm

import org.apache.spark.sql.functions._
import graft.{Q, QueryCatalog}
import graft.rel.Tables

/** SURVEY.md §2l [EXT] multimodal queries: array columns carried
  * through joins/aggregates, plus the binary media pipeline from
  * [[Media]] (decode stubbed, plumbing real).
  */
object MultimodalQueries extends QueryCatalog {

  /** Docs ⋈ embeddings by id with the vector column flowing through the
    * join into an aggregate — the "modalities joined by key" shape. The
    * embeddings side would be bucketed on vec_id at scale; here both
    * sides shuffle on the equi-key.
    */
  private val mmJoin = Q(
    "q_mm_join",
    """SELECT d.lang, e.label, count(*) AS n,
      |  round(avg(CAST(e.embedding[1] AS DOUBLE)), 4) AS avg_dim0
      |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      |GROUP BY d.lang, e.label ORDER BY d.lang, e.label""".stripMargin
  ) { (s, dir) =>
    Tables.documents(s, dir).as("d")
      .join(Tables.embeddings(s, dir).as("e"),
        col("d.doc_id") === col("e.vec_id"))
      .groupBy(col("d.lang"), col("e.label"))
      .agg(count(lit(1)).as("n"),
        round(avg(element_at(col("e.embedding"), 1).cast("double")), 4)
          .as("avg_dim0"))
      .orderBy(col("lang"), col("label"))
  }

  /** Binary decode + feature extraction, aggregated per source. The
    * payload is dropped before the shuffle (only numeric features move).
    * No oracle: byte-level decode has no DuckDB analog; LlmSpec pins
    * the stub's outputs.
    */
  private val mmDecode = Q.noOracle("q_mm_decode") { (s, dir) =>
    val feats = Media.decodeFeatures(Media.attach(Tables.documents(s, dir)))
    // decode_status is part of the output contract (round 14): stub
    // features are labeled 'stub' — a downstream consumer can never
    // mistake placeholder dims/stats for a real decode
    feats.toDF()
      .groupBy("source", "decode_status")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("mean_byte")), 4).as("avg_mean_byte"),
        max(col("max_byte")).as("max_byte"))
      .orderBy("source", "decode_status")
  }

  /** REAL video path, end to end with zero external codecs (round 14):
    * per sampled doc, render three 8x8 gray rasters from the doc's
    * bytes, JPEG-encode them with the JDK codec, mux into an MJPEG
    * AVI (RIFF container), then run the production demux+decode:
    * [[Media.decodeFeatures]] must label every row 'video-mjpeg' and
    * [[Media.videoFrames]] yields per-frame features. Everything is
    * a narrow map — payloads never shuffle; only numeric features do.
    * No oracle (byte-level container math has no DuckDB analog);
    * the in-query require pins the no-stub contract and LlmSpec pins
    * exact frame values on an authored AVI. */
  private val mmVideo = Q.noOracle("q_mm_video") { (s, dir) =>
    import s.implicits._
    // materialized ONCE: two consumers (decodeFeatures + videoFrames)
    // would otherwise re-run the JPEG encode + mux per branch; the
    // sampled payload set is small (1/20 of docs), so the default
    // localCheckpoint level is fine
    val media = Tables.documents(s, dir)
      .filter(col("doc_id") % 20 === 0)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, src, text) =>
        val bytes = text.getBytes("UTF-8")
        val frames = (0 until 3).map { f =>
          val gray = Array.tabulate[Byte](64) { i =>
            if (bytes.isEmpty) 0
            else bytes((f * 64 + i) % bytes.length)
          }
          Media.encodeJpegGray(gray, 8, 8)
        }
        Media.MediaRecord(id, src, "video/x-mjpeg-avi",
          Media.muxMjpegAvi(frames, 8, 8))
      })
      .localCheckpoint(true)
    val feats = Media.decodeFeatures(media).toDF()
    val perFrame = Media.videoFrames(media, stride = 1).toDF()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        max(col("max_gray")).as("frame_max_gray"))
    // decode_status rides in the OUTPUT (all rows must read
    // 'video-mjpeg'; LlmSpec pins the no-stub contract on an authored
    // AVI — an in-query require would re-execute the whole pipeline)
    feats
      .join(perFrame, Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("decode_status"),
        col("width"), col("height"), col("n_frames"),
        col("max_byte"), col("frame_max_gray"))
      .orderBy("doc_id")
  }

  /** Frame sampling through the real binary path (16-byte frames,
    * every 4th kept), with counts oracle-checked against pure length
    * arithmetic in DuckDB — the ascii corpus guarantees
    * octet_length(media) == length(text).
    */
  private val mmFrames = Q(
    "q_mm_frame_sample",
    """SELECT doc_id, length(text) AS n_bytes,
      |  CAST(ceil(length(text) / 16.0) AS BIGINT) AS n_frames,
      |  CAST(ceil(ceil(length(text) / 16.0) / 4.0) AS BIGINT) AS n_sampled
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val media = Media.attach(Tables.documents(s, dir))
    val sampled = Media.sampleFrames(media, frameSize = 16, stride = 4)
      .groupBy("doc_id").agg(count(lit(1)).as("n_sampled"))
    val all = Media.sampleFrames(media, frameSize = 16, stride = 1)
      .groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
    media.toDF().select(col("doc_id"),
        octet_length(col("media")).cast("bigint").as("n_bytes"))
      .join(all, Seq("doc_id"))
      .join(sampled, Seq("doc_id"))
      .select(col("doc_id"), col("n_bytes"), col("n_frames"), col("n_sampled"))
      .orderBy("doc_id")
  }

  /** Resize every payload to a 16x16 gray thumbnail ([[Media.resize]]:
    * real raster sampling for decodable images, deterministic stub
    * raster otherwise), then per-source thumbnail stats INCLUDING a
    * distinct-thumbnail count — the perceptual-dedup shape: identical
    * payloads collapse to one md5(thumb) key, and at 100 TB only the
    * 256-byte thumbnails (1/1000th of the media volume) reach the
    * shuffle. No oracle (byte-level decode); LlmSpec pins resize
    * semantics on an authored PNG and on the stub path. */
  private val mmResize = Q.noOracle("q_mm_resize") { (s, dir) =>
    Media.resize(Media.attach(Tables.documents(s, dir)), 16, 16)
      .toDF()
      .select(col("source"), md5(col("thumb")).as("tkey"),
        col("mean_byte"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("tkey")).as("n_distinct_thumbs"),
        round(avg(col("mean_byte")), 4).as("avg_thumb_byte"))
      .orderBy("source")
  }

  /** Windowed audio features per source — the classic pre-embedding /
    * voice-activity descriptors (per-window energy, peak window,
    * zero-crossing rate), extracted in ONE narrow mapPartitions pass:
    * the payload never shuffles, 5 integers per clip do. Real WAV
    * payloads decode through javax.sound; the demo corpus' text bytes
    * take the deterministic stub-PCM path (the decode/resize
    * convention). Pure integer milli-scaled math end to end; LlmSpec
    * pins exact windowed values on an authored WAV and stub
    * determinism. */
  private val mmAudio = Q.noOracle("q_mm_audio_features") { (s, dir) =>
    Media.audioFeat(Media.attach(Tables.documents(s, dir)), 64)
      .toDF()
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_windows").cast("long").as("n_windows"),
        expr("CAST((1000 * sum(mean_energy_milli) + count(*) div 2) " +
          "div count(*) AS BIGINT)").as("avg_energy_micro"),
        max("peak_energy_milli").cast("long").as("max_peak_energy"),
        expr("CAST((1000 * sum(zcr_milli) + count(*) div 2) " +
          "div count(*) AS BIGINT)").as("avg_zcr_micro"))
      .orderBy("source")
  }

  override def all: Seq[Q] =
    Seq(mmJoin, mmDecode, mmFrames, mmResize, mmAudio, mmVideo)
}
