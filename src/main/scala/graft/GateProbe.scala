package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llmops.Dedup

/** ×10 posture probe for the ARRIVAL path of incremental/streaming
  * near-dup (round 10): how does the per-batch probe cost grow with the
  * RESIDENT index size? The scale claim under test: a batch probe is
  * batch-bound work against the index's two narrow sorted columns
  * (band, sig) — the resident corpus text is never read, so a 10×
  * index should cost far less than 10× per arrival. Builds banded
  * signature indexes over the first 5k and all ~50k probe documents,
  * then times `Dedup.incrementalKeep` for the SAME 500-doc batch (half
  * colliding with residents, half fresh) against each, min-over-3.
  * Also asserts the decision is exactly right at both sizes: the
  * colliding half is dropped, the fresh half kept.
  *
  * Prints one JSON line for BASELINE.md. Run:
  * `SPARK_GRAFT_SF_DIR=target/probe10x sbt "runMain graft.GateProbe"`.
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/probe10x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cacheRoot = s"target/gateprobe-${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val total = docs.count()
      def index(key: String, n: Long) = Dedup.residentBandIndex(
        spark, cacheRoot, key, docs.filter(col("doc_id") < n), "doc_id", "text", 16, 4)
      val small = index("small", 5000L)
      val large = index("large", total)
      // 500-arrival batch: 250 exact duplicates of resident docs (ids
      // shifted out of the resident keyspace), 250 fresh salted texts
      val dups = docs.filter(col("doc_id") < 250)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      // genuinely fresh: synthetic per-id token sequences sharing no
      // 3-gram with anything (a salted PREFIX on a resident text is NOT
      // fresh — it keeps jaccard ≈ 0.93 and the gate rightly drops it,
      // which the first draft of this probe learned the hard way)
      val fresh = docs.filter(col("doc_id") < 250)
        .select((col("doc_id") + 20000000L).as("doc_id"),
          concat_ws(" ",
            concat(lit("qa"), col("doc_id")), concat(lit("qb"), col("doc_id")),
            concat(lit("qc"), col("doc_id")), concat(lit("qd"), col("doc_id")),
            concat(lit("qe"), col("doc_id"))).as("text"))
      val batch = dups.unionByName(fresh).localCheckpoint(true)

      def time(idx: org.apache.spark.sql.DataFrame): (Double, Long) = {
        var best = Double.MaxValue; var kept = -1L
        (0 until 3).foreach { _ =>
          val t0 = System.nanoTime()
          kept = Dedup.incrementalKeep(idx, batch, "doc_id", "text", 16, 4).count()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        (best, kept)
      }
      val (tSmall, keptSmall) = time(small)
      val (tLarge, keptLarge) = time(large)
      // decision correctness at both sizes: every dup dropped (its text
      // is resident in BOTH indexes), every fresh doc kept
      require(keptSmall == 250 && keptLarge == 250,
        s"expected 250 kept (fresh only): small=$keptSmall large=$keptLarge")
      println(s"""{"metric":"gate_probe","resident_small":5000,""" +
        s""""resident_large":$total,"probe_small_sec":$tSmall,""" +
        s""""probe_large_sec":$tLarge,"batch":500,"kept":$keptLarge,"sf":"$sfDir"}""")
    } finally {
      graft.load.Store.tryDeleteRecursively(java.nio.file.Paths.get(cacheRoot))
      spark.stop()
    }
  }
}
