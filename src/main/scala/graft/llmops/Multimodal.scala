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

  /** Pack a text table into opaque media payloads (test fixture: the
    * container has no real media, so documents stand in as payload
    * bytes; at scale this column arrives from the lake as-is). */
  def packAsMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decode — deterministic fake in place of a real codec
    * (??? in spirit: a real deployment plugs libjpeg/ffmpeg here).
    * Derives metadata purely from payload bytes so tests are exact. */
  def fakeDecode(payload: Array[Byte]): (Long, Int, Int, Long) = {
    val n = payload.length.toLong
    val w = (if (n > 0) (payload(0) & 0xff) else 0) + 1
    val h = (if (n > 1) (payload(1) & 0xff) else 0) + 1
    (n, w, h, n * 10)
  }

  /** Batch feature extraction over partitions — the mapInPandas-shaped
    * path: one iterator pass per partition, no driver involvement. */
  def extractMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = StructType(Seq(
      StructField("media_id", LongType), StructField("kind", StringType),
      StructField("n_bytes", LongType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("duration_ms", LongType)))
    val rdd = media.select("media_id", "kind", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val (n, w, h, d) = fakeDecode(r.getAs[Array[Byte]]("payload"))
        Row(r.getLong(0), r.getString(1), n, w, h, d)
      }
    }
    spark.createDataFrame(rdd, out)
  }

  /** "Resize"/frame-sample stub: byte-stride sampling of the payload —
    * real plumbing (binary in, binary out, metadata updated), fake
    * kernel. */
  def sampleBytes(media: DataFrame, stride: Int): DataFrame = {
    val spark = media.sparkSession
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("sampled", BinaryType),
      StructField("n_sampled", IntegerType)))
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val p = r.getAs[Array[Byte]]("payload")
        val s = p.indices.collect { case i if i % stride == 0 => p(i) }.toArray
        Row(r.getLong(0), s, s.length)
      }
    }
    spark.createDataFrame(rdd, out)
  }
}
