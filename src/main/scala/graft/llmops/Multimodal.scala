package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2.B.12): opaque `binary` payloads
  * with typed metadata, processed in distributed batches.
  *
  * Image payloads decode for REAL ([[ImageCodec]]: PNG/PPM, CRC
  * validated) and so do audio payloads ([[AudioCodec]]: RIFF/WAVE PCM).
  * Only VIDEO keeps the documented deterministic pseudo-decode
  * (`fakeDecode`) — container/video codecs are genuinely out of scope
  * for a pure-JVM kernel. The Spark-side plumbing is real throughout:
  * schema, batch iteration via `mapPartitions` (the Scala equivalent of
  * `mapInPandas` batch processing), and partition-friendly layout.
  */
object Multimodal {

  /** Media row schema: payload + typed metadata, the BinaryType +
    * metadata-struct layout of SURVEY §1.5 / §2.B.12. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType), // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** The deterministic raster for media id `id`: dimensions and pixel
    * values derive arithmetically from the id, so a SQL oracle can
    * recompute EXPECTED pixels while the engine round-trips the REAL
    * encoded bytes through [[ImageCodec]]. Pixels stay in 32..127
    * (ASCII-safe) so an md5 over them equals an md5 over the oracle's
    * chr()-built string. */
  def genImage(id: Long): ImageCodec.Image = {
    val w = (id % 13 + 1).toInt
    val h = (id % 7 + 1).toInt
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          px((y * w + x) * 3 + c) = (((id + x * 7 + y * 11 + c * 5) % 96) + 32).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    ImageCodec.Image(w, h, 3, px)
  }

  /** The deterministic clip for media id `id`: mono 8-bit PCM at
    * 8 kHz whose length and sample values derive arithmetically from
    * the id — the audio twin of [[genImage]], so a SQL oracle can
    * recompute EXPECTED samples while the engine round-trips the REAL
    * RIFF/WAVE bytes through [[AudioCodec]]. Samples stay in 32..127
    * (ASCII-safe) so an md5 over them equals an md5 over the oracle's
    * chr()-built string. */
  val AudioRate = 8000
  def genAudio(id: Long): AudioCodec.Audio = {
    val n = (id % 40 + 5).toInt
    val s = new Array[Int](n)
    var i = 0
    while (i < n) {
      s(i) = (((id + i * 13) % 96) + 32).toInt
      i += 1
    }
    AudioCodec.Audio(AudioRate, 1, 8, s)
  }

  /** Pack a text table into media payloads. Image rows carry REAL
    * encoded images (PNG for even ids, PPM for odd — both decoders
    * exercised): [[genImage]] rendered through [[ImageCodec]]. Audio
    * rows carry REAL RIFF/WAVE PCM: [[genAudio]] rendered through
    * [[AudioCodec]]. Video rows keep document bytes as opaque
    * payloads — that codec stays out of scope, and [[extractMeta]]'s
    * fallback documents the boundary. */
  def packAsMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val out = StructType(Seq(
      StructField("media_id", LongType), StructField("kind", StringType),
      StructField("payload", BinaryType)))
    val rdd = docs.select(col("doc_id"), encode(col("text"), "UTF-8")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        (id % 3) match {
          case 0 =>
            val img = genImage(id)
            val bytes =
              if (id % 2 == 0) ImageCodec.encodePng(img) else ImageCodec.encodePpm(img)
            Row(id, "image", bytes)
          case 1 => Row(id, "audio", AudioCodec.encodeWav(genAudio(id)))
          case _ => Row(id, "video", r.getAs[Array[Byte]](1))
        }
      }
    }
    spark.createDataFrame(rdd, out)
  }

  /** Deterministic pseudo-metadata for payloads with no in-container
    * codec (video only, now that audio decodes for real): derived
    * purely from the bytes so tests stay exact. A real deployment
    * plugs ffmpeg-class decoders in at the same `mapPartitions`
    * boundary the image and audio paths already use. */
  def fakeDecode(payload: Array[Byte]): (Long, Int, Int, Long) = {
    val n = payload.length.toLong
    val w = (if (n > 0) (payload(0) & 0xff) else 0) + 1
    val h = (if (n > 1) (payload(1) & 0xff) else 0) + 1
    (n, w, h, n * 10)
  }

  /** Batch feature extraction over partitions — the mapInPandas-shaped
    * path: one iterator pass per partition, no driver involvement.
    * Image payloads go through the REAL raster decoder ([[ImageCodec]]):
    * n_bytes is the decoded pixel count, width/height the raster
    * dimensions, duration 0. Audio payloads go through the REAL WAV
    * decoder ([[AudioCodec]]): n_bytes is the decoded sample count,
    * width the channel count, height the bit depth, duration_ms the
    * clip length. Video falls back to [[fakeDecode]]. */
  def extractMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = StructType(Seq(
      StructField("media_id", LongType), StructField("kind", StringType),
      StructField("n_bytes", LongType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("duration_ms", LongType)))
    val rdd = media.select("media_id", "kind", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        ImageCodec.decode(payload) match {
          case Some(img) =>
            Row(r.getLong(0), r.getString(1), img.pixels.length.toLong,
              img.width, img.height, 0L)
          case None if AudioCodec.isWav(payload) =>
            val a = AudioCodec.decodeWav(payload)
            Row(r.getLong(0), r.getString(1), a.samples.length.toLong,
              a.channels, a.bitsPerSample, a.durationMs)
          case None =>
            val (n, w, h, d) = fakeDecode(payload)
            Row(r.getLong(0), r.getString(1), n, w, h, d)
        }
      }
    }
    spark.createDataFrame(rdd, out)
  }

  /** Per-clip sample statistics over decoded audio — the feature-
    * extraction face of the audio path (decode is the expensive step;
    * the stats are one register pass over the samples). Non-audio
    * payloads are skipped. Integer sums keep the SQL oracle exact. */
  def audioStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = StructType(Seq(
      StructField("media_id", LongType), StructField("sample_rate", IntegerType),
      StructField("n_samples", IntegerType), StructField("duration_ms", LongType),
      StructField("sum_amp", LongType), StructField("peak_amp", IntegerType)))
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val p = r.getAs[Array[Byte]]("payload")
        if (!AudioCodec.isWav(p)) None
        else {
          val a = AudioCodec.decodeWav(p)
          var sum = 0L
          var peak = Int.MinValue
          var i = 0
          while (i < a.samples.length) {
            sum += a.samples(i)
            if (a.samples(i) > peak) peak = a.samples(i)
            i += 1
          }
          Some(Row(r.getLong(0), a.sampleRate, a.samples.length, a.durationMs,
            sum, if (a.samples.isEmpty) 0 else peak))
        }
      }
    }
    spark.createDataFrame(rdd, out)
  }

  /** Box-filter downscale by integer `factor` — the RESIZE kernel of
    * the multimodal family (sampleBytes decimates; this averages):
    * each output pixel is the integer mean of its `factor × factor`
    * source box, edge boxes clamped to the raster. Images only (the
    * one payload kind with a real decoder); one `mapPartitions` pass,
    * embarrassingly parallel, zero shuffle. Averaging of 32..127
    * pixels stays in 32..127, so the SQL oracle can md5 the same
    * ASCII-safe byte string it rebuilds arithmetically. */
  def downscale(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = media.sparkSession
    val out = StructType(Seq(
      StructField("media_id", LongType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("resized", BinaryType)))
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        ImageCodec.decode(r.getAs[Array[Byte]]("payload")).map { img =>
          val ow = (img.width + factor - 1) / factor
          val oh = (img.height + factor - 1) / factor
          val outPx = new Array[Byte](ow * oh * img.channels)
          var y = 0
          while (y < oh) {
            var x = 0
            while (x < ow) {
              var c = 0
              while (c < img.channels) {
                var sum = 0
                var n = 0
                var dy = 0
                while (dy < factor && y * factor + dy < img.height) {
                  var dx = 0
                  while (dx < factor && x * factor + dx < img.width) {
                    sum += img.pixels(((y * factor + dy) * img.width +
                      (x * factor + dx)) * img.channels + c) & 0xff
                    n += 1
                    dx += 1
                  }
                  dy += 1
                }
                outPx((y * ow + x) * img.channels + c) = (sum / n).toByte
                c += 1
              }
              x += 1
            }
            y += 1
          }
          Row(r.getLong(0), ow, oh, outPx)
        }
      }
    }
    spark.createDataFrame(rdd, out)
  }

  /** Frame/byte sampling. Image payloads DECODE and decimate by
    * `stride` in both axes (out(x,y) = src(stride·x, stride·y) — the
    * thumbnail/frame-sample kernel over real pixels); audio payloads
    * DECODE and keep every stride-th sample frame ([[AudioCodec
    * .decimate]]), emitting the decimated clip's raw PCM data bytes;
    * other payloads keep the byte-stride sample. Binary in, binary
    * out, metadata updated — one `mapPartitions` pass either way. */
  def sampleBytes(media: DataFrame, stride: Int): DataFrame = {
    val spark = media.sparkSession
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("sampled", BinaryType),
      StructField("n_sampled", IntegerType)))
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val p = r.getAs[Array[Byte]]("payload")
        ImageCodec.decode(p) match {
          case None if AudioCodec.isWav(p) =>
            val a = AudioCodec.decimate(AudioCodec.decodeWav(p), stride)
            val bytesPer = a.bitsPerSample / 8
            val s = new Array[Byte](a.samples.length * bytesPer)
            var i = 0
            while (i < a.samples.length) {
              if (bytesPer == 1) s(i) = a.samples(i).toByte
              else {
                s(i * 2) = a.samples(i).toByte
                s(i * 2 + 1) = (a.samples(i) >> 8).toByte
              }
              i += 1
            }
            Row(r.getLong(0), s, a.samples.length)
          case Some(img) =>
            val outW = (img.width + stride - 1) / stride
            val outH = (img.height + stride - 1) / stride
            val s = new Array[Byte](outW * outH * img.channels)
            var y = 0
            while (y < outH) {
              var x = 0
              while (x < outW) {
                var c = 0
                while (c < img.channels) {
                  s((y * outW + x) * img.channels + c) =
                    img.pixels(((y * stride) * img.width + x * stride) * img.channels + c)
                  c += 1
                }
                x += 1
              }
              y += 1
            }
            Row(r.getLong(0), s, s.length)
          case None =>
            val s = p.indices.collect { case i if i % stride == 0 => p(i) }.toArray
            Row(r.getLong(0), s, s.length)
        }
      }
    }
    spark.createDataFrame(rdd, out)
  }
}
