package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llmops.Similarity

/** Persisted-IVF serving probe: build the partitioned index once on
  * the ×10 embeddings (or sf0.1 fallback), then compare the COLD
  * partition-pruned serve against the in-memory route that scans and
  * assigns the corpus per query batch. Also reports the pruned
  * fraction (probed cells / k). One JSON line for BASELINE.md. Run:
  * `sbt "runMain graft.IvfProbe"`. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = if (new java.io.File("target/sf1probe/embeddings.parquet").exists())
      "target/sf1probe/embeddings.parquet"
    else "/root/testdata/sf0.1/embeddings.parquet"
    val emb = spark.read.parquet(src)
    val dir = "target/ivfindex_probe"
    val t0 = System.nanoTime()
    // build STAMPED with the source fingerprint (r13 #9) so the serve
    // below runs through the stale probe — the production wiring
    val cents = Similarity.buildIvfIndex(emb, "vec_id", "embedding", 16, 256, dir,
      source = Some(src))
    val buildS = (System.nanoTime() - t0) / 1e9
    graft.load.IndexKeys.requireFresh(dir, src) // refuses if stale
    val qids = (0L to 4L).toSeq
    def time(f: => Long): (Double, Long) = {
      val runs = (1 to 3).map { _ =>
        val t = System.nanoTime(); val n = f; ((System.nanoTime() - t) / 1e9, n)
      }
      (runs.map(_._1).min, runs.head._2)
    }
    val (coldS, nCold) = time(
      Similarity.ivfIndexTopK(spark, dir, qids, 4, 10, source = Some(src)).count())
    val (warmS, nWarm) = time(
      Similarity.ivfTopKWith(emb, "vec_id", "embedding", cents, 4, qids, 10).count())
    assert(nCold == nWarm, s"route mismatch: $nCold vs $nWarm")
    println(s"""{"probe":"ivf_index","src":"$src","build_sec":$buildS,""" +
      s""""cold_serve_sec":$coldS,"inmem_serve_sec":$warmS,"rows":$nCold,""" +
      s""""probed_fraction":${4.0 / 16}}""")
    spark.stop()
  }
}
