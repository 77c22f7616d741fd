package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2.B.12): opaque `binary` payloads
  * with typed metadata, processed in distributed batches.
  *
  * The decode step itself is STUBBED (this container has no image/audio
  * codecs — see the builder brief): `fakeDecode` derives deterministic
  * pseudo-metadata from the payload bytes. The Spark-side plumbing is
  * real: schema, batch iteration via `mapPartitions` (the Scala
  * equivalent of `mapInPandas` batch processing), and partition-friendly
  * layout.
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

  /** Pack a text table into media payloads. Image rows carry REAL
    * encoded images (PNG for even ids, PPM for odd — both decoders
    * exercised): [[genImage]] rendered through [[ImageCodec]]. Audio/
    * video rows keep document bytes as opaque payloads — those codecs
    * stay out of scope, and [[extractMeta]]'s fallback documents the
    * boundary. */
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
          case 1 => Row(id, "audio", r.getAs[Array[Byte]](1))
          case _ => Row(id, "video", r.getAs[Array[Byte]](1))
        }
      }
    }
    spark.createDataFrame(rdd, out)
  }

  /** Deterministic pseudo-metadata for payloads with no in-container
    * codec (audio/video): derived purely from the bytes so tests stay
    * exact. A real deployment plugs ffmpeg-class decoders in at the
    * same `mapPartitions` boundary the image path already uses. */
  def fakeDecode(payload: Array[Byte]): (Long, Int, Int, Long) = {
    val n = payload.length.toLong
    val w = (if (n > 0) (payload(0) & 0xff) else 0) + 1
    val h = (if (n > 1) (payload(1) & 0xff) else 0) + 1
    (n, w, h, n * 10)
  }

  /** Batch feature extraction over partitions — the mapInPandas-shaped
    * path: one iterator pass per partition, no driver involvement.
    * Image payloads go through the REAL decoder ([[ImageCodec]]):
    * n_bytes is the decoded pixel count, width/height the raster
    * dimensions, duration 0. Other media fall back to [[fakeDecode]]. */
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
          case None =>
            val (n, w, h, d) = fakeDecode(payload)
            Row(r.getLong(0), r.getString(1), n, w, h, d)
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
    * thumbnail/frame-sample kernel over real pixels); other payloads
    * keep the byte-stride sample. Binary in, binary out, metadata
    * updated — one `mapPartitions` pass either way. */
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
