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
  * The decode step uses the JDK's bundled codecs — javax.imageio
  * (PNG/JPEG/BMP/GIF) for decodable images, javax.sound.sampled
  * (WAV/AIFF/AU with PCM payloads) for decodable audio, and a pure
  * RIFF demuxer + the JDK JPEG codec for MJPEG-in-AVI video (round
  * 14: real frame-accurate video decode with zero external codecs) —
  * and falls back to a deterministic byte-derived stub for everything
  * else (the demo corpus carries text bytes; non-MJPEG video codecs
  * aren't in this container). Every decoded row carries a
  * decode_status ('image'/'video-mjpeg'/'audio'/'stub') so stub
  * features can never masquerade as real ones. Schema, encoders,
  * partition-iterator batch shape, frame slicing, and downstream
  * aggregation are identical on all paths and tested (LlmSpec).
  *
  * Scale notes (100 TB): media rows are heavy, so every transform here
  * is narrow (no shuffle); features are projected BEFORE any groupBy so
  * the shuffle carries only small numeric columns, never the payload.
  * `spark.sql.files.maxPartitionBytes` governs task sizing for large
  * binary scans.
  */
object Media {

  // ImageIO.read(InputStream) defaults to a FILE-backed stream cache
  // (getUseCache=true): every decode creates, writes, and deletes a
  // temp file under java.io.tmpdir — pure disk traffic that's useless
  // for in-memory ByteArrayInputStream sources and made the decode
  // stage uniquely sensitive to box IO contention (q_mm_resize flagged
  // as variance-prone in three rounds' bench artifacts; r16 verdict
  // suspected exactly this). Memory-cached streams decode the same
  // bytes with zero filesystem involvement. JVM-global, set once when
  // the executor classloads this object.
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaRecord(
      doc_id: Long, source: String, fmt: String, media: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long, source: String, n_bytes: Long,
      width: Int, height: Int, mean_byte: Double, max_byte: Int,
      decode_status: String)

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

  /** REAL audio decode via the JDK's bundled javax.sound.sampled
    * (WAV/AIFF/AU containers with PCM payloads — no external codecs):
    * the feature tuple reuses the image slots as (sample rate,
    * channels, mean, max) over the unsigned PCM bytes, so the
    * downstream schema is identical. None for non-audio payloads
    * (container sniffing needs the RIFF/FORM/.snd magic, so text or
    * image bytes never false-positive here). */
  /** Container magic sniff (RIFF/WAVE, FORM/AIFF, .snd/AU) so the hot
    * decode path never pays an UnsupportedAudioFileException per
    * non-audio row — exceptions as control flow cost ~1 s per 60k docs
    * in the bench. */
  private def looksLikeAudio(b: Array[Byte]): Boolean =
    (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
      b(11) == 'E') ||
    (b.length >= 4 && b(0) == 'F' && b(1) == 'O' && b(2) == 'R' &&
      b(3) == 'M') ||
    (b.length >= 4 && b(0) == '.' && b(1) == 's' && b(2) == 'n' &&
      b(3) == 'd')

  private[llm] def decodeAudio(bytes: Array[Byte])
      : Option[(Int, Int, Double, Int)] =
    if (!looksLikeAudio(bytes)) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val pcm = in.readAllBytes()
        var sum = 0L
        var max = 0
        var i = 0
        while (i < pcm.length) {
          val b = pcm(i) & 0xff
          sum += b
          if (b > max) max = b
          i += 1
        }
        val mean = if (pcm.isEmpty) 0.0 else sum.toDouble / pcm.length
        Some((fmt.getSampleRate.toInt, fmt.getChannels, mean, max))
      } finally in.close()
    } catch { case _: Throwable => None }

  /** MJPEG-in-AVI demux (round 14): pure RIFF chunk walking — NO
    * codec. An AVI file is RIFF('AVI ' LIST('hdrl' …) LIST('movi'
    * '##dc'/'##db' chunks…)); for MJPEG streams every movi frame
    * chunk is a complete JFIF/JPEG image the JDK's own javax.imageio
    * can decode. Returns the frame payloads, or None when the bytes
    * aren't a RIFF AVI (WAV is RIFF+"WAVE", so audio never routes
    * here). Truncated/garbage chunk sizes stop the walk — partial
    * frames are better than a throw on a corrupt corpus row. */
  private[llm] def demuxMjpegAvi(b: Array[Byte])
      : Option[Vector[Array[Byte]]] = {
    def fcc(off: Int) = new String(b, off, 4,
      java.nio.charset.StandardCharsets.US_ASCII)
    def le32(off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    if (b.length < 12 || fcc(0) != "RIFF" || fcc(8) != "AVI ")
      return None
    val frames = Vector.newBuilder[Array[Byte]]
    def isFrame(id: String) = id(0).isDigit && id(1).isDigit &&
      (id.endsWith("dc") || id.endsWith("db"))
    // iterative depth-first walk with an explicit range stack — same
    // traversal (and frame) order as recursion, but a crafted payload
    // of deeply nested LIST headers degrades (partial frames) instead
    // of blowing the task's call stack
    var stack = List((12, b.length))
    while (stack.nonEmpty) {
      val (off, until) = stack.head
      stack = stack.tail
      if (off + 8 <= until) {
        val id = fcc(off)
        val sz = le32(off + 4)
        val dataStart = off + 8
        if (sz >= 0 && sz <= Int.MaxValue && dataStart + sz <= until) {
          val size = sz.toInt
          // continue this range after the chunk (pushed first so the
          // LIST's contents, pushed second, pop before it — DFS order)
          stack ::= (dataStart + size + (size & 1), until)
          if (id == "LIST" && size >= 4)
            stack ::= (dataStart + 4, dataStart + size)
          else if (isFrame(id) && size > 0)
            frames += java.util.Arrays.copyOfRange(
              b, dataStart, dataStart + size)
        } // truncated/garbage size: stop this range, keep the rest
      }
    }
    Some(frames.result())
  }

  /** REAL video decode for MJPEG-in-AVI: demux the container (pure
    * chunk walking), decode every frame with the JDK JPEG codec, and
    * report (first frame's width/height, mean of per-frame gray
    * means, max gray over all frames). None when the payload isn't an
    * AVI or carries no decodable frame (a non-MJPEG codec inside the
    * container) — the caller then falls back to the stub WITH the
    * stub status, so placeholder features are never mistakable. */
  private[llm] def decodeVideo(bytes: Array[Byte])
      : Option[(Int, Int, Double, Int)] =
    demuxMjpegAvi(bytes).flatMap { fr =>
      val decoded = fr.flatMap(decodeImage)
      if (decoded.isEmpty) None
      else {
        val (w, h, _, _) = decoded.head
        // fixed iteration order over one row's frames: deterministic
        val mean = decoded.map(_._3).sum / decoded.size
        Some((w, h, mean, decoded.map(_._4).max))
      }
    }

  /** Minimal MJPEG-AVI muxer (tests + the q_mm_video builder): a
    * spec-shaped RIFF with an avih header LIST and the movi frame
    * LIST. Enough structure for any MJPEG-aware demuxer — including
    * [[demuxMjpegAvi]], which this feeds in encode→mux→demux→decode
    * round-trip tests. */
  private[llm] def muxMjpegAvi(frames: Seq[Array[Byte]], w: Int,
      h: Int): Array[Byte] = {
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if ((data.length & 1) == 1) Array(0.toByte) else Array.empty[Byte])
    val avih = le32(33333) ++ le32(0) ++ le32(0) ++ le32(0x10) ++
      le32(frames.size) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ Array.fill(16)(0.toByte)
    val hdrl = chunk("LIST", "hdrl".getBytes("US-ASCII") ++
      chunk("avih", avih))
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      frames.flatMap(f => chunk("00dc", f)).toArray)
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
  }

  /** Gray raster → JPEG via the JDK's own codec (test/builder helper
    * for the MJPEG round-trip). */
  private[llm] def encodeJpegGray(gray: Array[Byte], w: Int,
      h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, gray)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Decode entry point: real codecs first (image, then MJPEG-AVI
    * video, then audio), deterministic stub for everything else (the
    * demo corpus carries text bytes). The status names which path
    * produced the features — a downstream user can never mistake stub
    * features for real ones (round-14 honesty contract). */
  private[llm] def decodeWithStatus(bytes: Array[Byte])
      : (Int, Int, Double, Int, String) =
    decodeImage(bytes) match {
      case Some((w, h, m, x)) => (w, h, m, x, "image")
      case None => decodeVideo(bytes) match {
        case Some((w, h, m, x)) => (w, h, m, x, "video-mjpeg")
        case None => decodeAudio(bytes) match {
          case Some((w, h, m, x)) => (w, h, m, x, "audio")
          case None =>
            val (w, h, m, x) = decodeStub(bytes)
            (w, h, m, x, "stub")
        }
      }
    }

  private[llm] def decode(bytes: Array[Byte]): (Int, Int, Double, Int) = {
    val (w, h, m, x, _) = decodeWithStatus(bytes)
    (w, h, m, x)
  }

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
        val (w, h, mean, max, status) = decodeWithStatus(r.media)
        MediaFeatures(r.doc_id, r.source, r.media.length.toLong,
          w, h, mean, max, status)
      }
    }
  }

  /** REAL per-frame video features for MJPEG-AVI payloads: demux, keep
    * every `stride`-th frame, decode each with the JDK JPEG codec.
    * Narrow flatMap — the payload never shuffles, only per-frame
    * numeric features move. Non-AVI payloads emit nothing (the honest
    * contract: no stub frames pretending to be video). */
  final case class VideoFrameFeat(doc_id: Long, source: String,
      frame_idx: Int, width: Int, height: Int, mean_gray: Double,
      max_gray: Int)

  def videoFrames(ds: Dataset[MediaRecord],
      stride: Int): Dataset[VideoFrameFeat] = {
    val s = ds.sparkSession
    import s.implicits._
    ds.flatMap { r =>
      demuxMjpegAvi(r.media).toSeq.flatMap { fr =>
        fr.indices.by(stride).flatMap { i =>
          decodeImage(fr(i)).map { case (w, h, mean, max) =>
            VideoFrameFeat(r.doc_id, r.source, i, w, h, mean, max)
          }
        }
      }
    }
  }

  final case class AudioFeat(
      doc_id: Long, source: String, n_windows: Long,
      mean_energy_milli: Long, peak_window: Int, peak_energy_milli: Long,
      zcr_milli: Long)

  /** PCM amplitudes 0..255: real audio decodes through javax.sound
    * (the decodeAudio path); any other payload treats its raw bytes as
    * the stub PCM — deterministic and schema-identical either way
    * (the decode/resize convention). */
  private[llm] def pcmSamples(bytes: Array[Byte]): Array[Int] =
    (if (looksLikeAudio(bytes))
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try in.readAllBytes() finally in.close()
      } catch { case _: Throwable => bytes }
    else bytes).map(_ & 0xff)

  /** Windowed audio features — the classic pre-embedding / VAD
    * descriptors, in pure integer math so every path is reproducible:
    * per window of `win` samples (trailing partial window dropped),
    * energy = Σ(s−128)²; report the half-up-milli mean per-sample
    * energy, the argmax window (ties → earliest), its energy, and the
    * whole-clip zero-crossing rate of (s−128) in half-up milli
    * crossings per transition slot. Clips shorter than one window
    * report zeros. */
  private[llm] def audioFeatures(samples: Array[Int], win: Int)
      : (Long, Long, Int, Long, Long) = {
    val nw = samples.length / win
    if (nw == 0) return (0L, 0L, -1, 0L, 0L)
    var peakW = 0
    var peakE = Long.MinValue
    var total = 0L
    var w = 0
    while (w < nw) {
      var e = 0L
      var i = w * win
      val end = i + win
      while (i < end) {
        val d = samples(i) - 128L
        e += d * d
        i += 1
      }
      if (e > peakE) { peakE = e; peakW = w }
      total += e
      w += 1
    }
    val denom = nw.toLong * win
    val meanMilli = (1000L * total + denom / 2) / denom
    var crossings = 0L
    var i = 1
    val n = nw * win
    while (i < n) {
      if ((samples(i - 1) - 128 >= 0) != (samples(i) - 128 >= 0))
        crossings += 1
      i += 1
    }
    // n == 1 (win=1, single-sample clip) has zero transition slots —
    // report zcr 0 instead of dividing by zero.
    val zcrMilli =
      if (n > 1) (1000L * crossings + (n - 1) / 2) / (n - 1) else 0L
    (nw.toLong, meanMilli, peakW, peakE, zcrMilli)
  }

  /** Distributed audio feature extraction: narrow mapPartitions, the
    * payload never shuffles — only 5 integers per clip move. */
  def audioFeat(ds: Dataset[MediaRecord], win: Int): Dataset[AudioFeat] = {
    val s = ds.sparkSession
    import s.implicits._
    ds.mapPartitions(_.map { r =>
      val (nw, mean, peakW, peakE, zcr) =
        audioFeatures(pcmSamples(r.media), win)
      AudioFeat(r.doc_id, r.source, nw, mean, peakW, peakE, zcr)
    })
  }

  final case class Thumb(doc_id: Long, source: String, tw: Int, th: Int,
      thumb: Array[Byte], mean_byte: Double)

  /** Nearest-neighbor resize to a (tw x th) gray thumbnail — the
    * preprocessing step every vision pipeline runs before feature
    * extraction / embedding. Decodable images sample the real raster
    * (same JDK codec as [[decodeImage]]); opaque payloads are treated
    * as a row-major gray raster of the SAME stub dimensions
    * [[decodeStub]] reports (cyclic byte sampling), so both paths are
    * deterministic and schema-identical. Narrow map — payload-heavy
    * rows never shuffle; the thumbnail is 256 bytes regardless of
    * input size, so anything grouped downstream moves ~1/1000th of
    * the media volume. */
  private[llm] def resizeBytes(bytes: Array[Byte], tw: Int,
      th: Int): Array[Byte] = {
    val out = new Array[Byte](tw * th)
    val dec =
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Throwable => None }
    dec match {
      case Some(img) =>
        val w = img.getWidth; val h = img.getHeight
        var y = 0
        while (y < th) {
          var x = 0
          while (x < tw) {
            val rgb = img.getRGB(x * w / tw, y * h / th)
            val g = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
              (rgb & 0xff)) / 3
            out(y * tw + x) = g.toByte
            x += 1
          }
          y += 1
        }
      case None =>
        val n = bytes.length
        val w = 64 + (n % 512)
        val h = 64 + (if (n > 0) bytes(0) & 0x3f else 0)
        var y = 0
        while (y < th) {
          var x = 0
          while (x < tw) {
            val g =
              if (n == 0) 0
              else bytes(((y * h / th) * w + (x * w / tw)) % n) & 0xff
            out(y * tw + x) = g.toByte
            x += 1
          }
          y += 1
        }
    }
    out
  }

  def resize(ds: Dataset[MediaRecord], tw: Int, th: Int): Dataset[Thumb] = {
    val s = ds.sparkSession
    import s.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val t = resizeBytes(r.media, tw, th)
        var sum = 0L; var i = 0
        while (i < t.length) { sum += t(i) & 0xff; i += 1 }
        val mean = if (t.isEmpty) 0.0 else sum.toDouble / t.length
        Thumb(r.doc_id, r.source, tw, th, t, mean)
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
