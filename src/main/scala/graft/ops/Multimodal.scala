package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque BINARY
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators (builder prompt: first-class pipeline ops).
  *
  * The actual codec step is STUBBED with a deterministic fake (image
  * and audio libraries are not in this container): `FakeDecoder`
  * derives pixel statistics from the payload bytes. Everything around
  * it — the binary-column schema, the metadata struct, the
  * mapPartitions batch shape, partition parallelism, and the
  * explode-based frame sampling — is the real Spark plumbing a
  * production decoder would drop into (swap `FakeDecoder.decode` for a
  * JNI/javacpp codec; the operator contracts don't change).
  *
  * Scale notes: decode runs as mapPartitions over the binary column —
  * embarrassingly parallel, no shuffle; frame sampling explodes to one
  * row per sampled frame *after* per-row pruning (sample stride applied
  * inside the row, not post-explode).
  */
object Multimodal {

  final case class MediaMeta(format: String, width: Int, height: Int, nBytes: Long)
  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte], meta: MediaMeta)
  final case class ImageFeatures(doc_id: Long, n_bytes: Long, mean_byte: Double,
      max_byte: Int, width: Int, height: Int)

  /** Deterministic stand-in for an image/audio codec. */
  object FakeDecoder {
    /** "Decode" a payload: interpret bytes as grayscale pixels. */
    def decode(payload: Array[Byte]): (Double, Int) = {
      if (payload.isEmpty) (0.0, 0)
      else {
        var sum = 0L
        var max = 0
        payload.foreach { b => val u = b & 0xff; sum += u; if (u > max) max = u }
        (sum.toDouble / payload.length, max)
      }
    }
  }

  /** A REAL image codec needing no native libraries: PPM (P6) — ASCII
    * header `P6\n<w> <h>\n<maxval>\n` + RGB raster. One format decodes
    * for real (byte-level header parse + raster extraction, loud errors
    * on corrupt input); png/wav/mp4 stay behind FakeDecoder because
    * their codecs aren't in this container. Demonstrates that the
    * binary-column plumbing carries genuine decoding, not just the
    * stub. */
  object PpmCodec {
    def encode(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
      require(pixels.length == 3 * width * height, "raster size mismatch")
      val header = s"P6\n$width $height\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val out = new Array[Byte](header.length + pixels.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(pixels, 0, out, header.length, pixels.length)
      out
    }

    /** Parse a P6 payload → (width, height, rgb raster). Handles
      * whitespace runs and `#` comments per the PPM spec; throws on a
      * bad magic number, maxval ≠ 255, or a truncated raster. */
    def decode(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
      var i = 0
      def skipWsAndComments(): Unit = {
        var go = true
        while (go && i < payload.length) {
          val c = payload(i).toChar
          if (c == '#') { while (i < payload.length && payload(i) != '\n') i += 1 }
          else if (c.isWhitespace) i += 1
          else go = false
        }
      }
      def token(): String = {
        skipWsAndComments()
        val start = i
        while (i < payload.length && !payload(i).toChar.isWhitespace) i += 1
        new String(payload, start, i - start, java.nio.charset.StandardCharsets.US_ASCII)
      }
      val magic = token()
      if (magic != "P6") throw new IllegalArgumentException(s"not a P6 PPM (magic '$magic')")
      val w = token().toInt
      val h = token().toInt
      val maxval = token().toInt
      if (maxval != 255) throw new IllegalArgumentException(s"unsupported maxval $maxval")
      i += 1 // single whitespace after maxval, then raster
      val need = 3 * w * h
      if (payload.length - i < need)
        throw new IllegalArgumentException(
          s"truncated raster: need $need bytes, have ${payload.length - i}")
      (w, h, java.util.Arrays.copyOfRange(payload, i, i + need))
    }
  }

  /** Build the media table from `documents`: payload = UTF-8 bytes of
    * the text (a deterministic opaque blob), metadata derived from it.
    * In production this is `spark.read.format("binaryFile")` or a
    * parquet table with a BINARY column — same schema either way. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val mediaType = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        MediaRow(id, mediaType,
          payload,
          MediaMeta(mediaType match {
            case "image" => "png"
            case "audio" => "wav"
            case _ => "mp4"
          }, (nChars % 640).toInt, (nChars % 480).toInt, payload.length.toLong))
      }
  }

  /** Decode + feature-extract over the binary column (mapPartitions —
    * the Scala analog of a pandas-batched UDF). */
  def imageFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .mapPartitions { rows =>
        rows.map { r =>
          val (mean, max) = FakeDecoder.decode(r.payload)
          ImageFeatures(r.doc_id, r.meta.nBytes,
            math.round(mean * 10000).toDouble / 10000, max, r.meta.width, r.meta.height)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Real decode end-to-end: deterministic PPM images (pixel i =
    * (doc_id·31 + i) mod 256) are ENCODED to genuine P6 binary on the
    * executors, then DECODED back — header parse, raster extraction —
    * and reduced to per-channel means. The oracle recomputes the same
    * stats arithmetically from the pixel formula, so a decoder bug
    * (off-by-one in the header skip, channel interleave mixup) is a
    * value mismatch, not a silent pass. */
  def ppmFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id")).where(col("doc_id") % 3 === 0)
      .as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (8 + id % 16).toInt
          val h = (6 + id % 12).toInt
          val pixels = Array.tabulate(3 * w * h)(i => ((id * 31 + i) % 256).toByte)
          (id, PpmCodec.encode(w, h, pixels))
        }
      }
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val (w, h, raster) = PpmCodec.decode(payload)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var i = 0
          while (i < raster.length) {
            val v = raster(i) & 0xff
            (i % 3) match {
              case 0 => sr += v
              case 1 => sg += v
              case _ => sb += v
            }
            i += 1
          }
          val n = w * h
          def r4(x: Double) = math.round(x * 10000).toDouble / 10000
          (id, w, h, raster.length.toLong,
            r4(sr.toDouble / n), r4(sg.toDouble / n), r4(sb.toDouble / n))
        }
      }
      .toDF("doc_id", "width", "height", "n_bytes", "mean_r", "mean_g", "mean_b")
      .orderBy("doc_id")
  }

  /** Resize: pure metadata + payload transform (stub keeps every k-th
    * byte — the contract is payload' + updated meta, like a real
    * resampler). */
  def resize(spark: SparkSession, dir: String, maxDim: Int): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .filter(_.media_type == "image")
      .map { r =>
        val scale = math.max(1, math.max(r.meta.width, r.meta.height) / math.max(maxDim, 1))
        val resized = r.payload.zipWithIndex.collect { case (b, i) if i % scale == 0 => b }
        r.copy(payload = resized,
          meta = r.meta.copy(width = r.meta.width / scale, height = r.meta.height / scale,
            nBytes = resized.length.toLong))
      }
      .map(r => (r.doc_id, r.meta.width, r.meta.height, r.meta.nBytes))
      .toDF("doc_id", "width", "height", "n_bytes")
      .orderBy("doc_id")
  }

  /** Frame sampling for "video" payloads: frame = 256-byte chunk, keep
    * every `stride`-th frame; one output row per sampled frame. */
  def frameSample(spark: SparkSession, dir: String, stride: Int): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .filter(_.media_type == "video")
      .flatMap { r =>
        val nFrames = r.payload.length / 256
        (0 until nFrames by stride).map { f =>
          val frame = r.payload.slice(f * 256, (f + 1) * 256)
          val (mean, _) = FakeDecoder.decode(frame)
          (r.doc_id, f, math.round(mean * 10000).toDouble / 10000)
        }
      }
      .toDF("doc_id", "frame_idx", "frame_mean")
      .orderBy("doc_id", "frame_idx")
  }
}
