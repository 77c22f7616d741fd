package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llmops.TextOps

/** BPE encode posture probe: learn a merge table once (sf0.01 — the
  * model is corpus-shape, not corpus-size), then time the map-only
  * encode kernel over sf0.1 and the ×10 probe dir if present. The
  * number that matters is the wall RATIO across the 10× row step — the
  * kernel has no shuffle, so anything near-linear-or-better says the
  * per-task word cache is doing its Zipfian job. Prints one JSON line
  * for BASELINE.md. Run: `sbt "runMain graft.TokProbe"`. */
object TokProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val merges = TextOps.learnBpeMerges(
      spark.read.parquet("/root/testdata/sf0.01/documents.parquet"), "text", 32)
      .map { case (_, l, r, _) => (l, r) }

    def run(dir: String): (Double, Long, Long) = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      def once(): (Double, Long, Long) = {
        val t0 = System.nanoTime()
        val r = TextOps.bpeTokenStats(docs, "doc_id", "text", merges)
          .agg(sum(col("n_bpe_tokens")), sum(col("n_words"))).head()
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, r.getLong(0), r.getLong(1))
      }
      val runs = (1 to 3).map(_ => once())
      (runs.map(_._1).min, runs.head._2, runs.head._3)
    }

    val (s1, tok1, w1) = run("/root/testdata/sf0.1")
    val x10dir = "target/sf1probe"
    val x10 = if (new java.io.File(s"$x10dir/documents.parquet").exists())
      Some(run(x10dir)) else None
    val x10s = x10.map { case (s, t, _) =>
      s""","x10_sec":$s,"x10_tokens":$t,"ratio":${math.rint(s / s1 * 100) / 100}"""
    }.getOrElse("")
    println(s"""{"probe":"bpe_encode","merges":${merges.size},""" +
      s""""sf01_sec":$s1,"sf01_bpe_tokens":$tok1,"sf01_words":$w1$x10s}""")
    spark.stop()
  }
}
