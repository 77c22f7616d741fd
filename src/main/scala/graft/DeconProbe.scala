package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llmops.Pipeline

/** Serving-shape probe for SEMANTIC decontamination (VERDICT r10 order
  * #5): the ×100 posture sweep excluded `pipeline_decontaminate_semantic`
  * because that probe grows the benchmark WITH the corpus (work
  * 10,000×) — not the serving shape. A real benchmark set is
  * FIXED-size; the claim under test here is the one the code argues
  * (`Pipeline.decontaminateSemantic` scaladoc): with the benchmark
  * broadcast, the pass is ONE corpus scan doing |B| compiled dot
  * products per row — wall time linear in the corpus, flat in
  * everything else.
  *
  * Protocol: the SAME fixed 1,000-vector benchmark (sf0.1 `vec_id <
  * 1000`) against (a) the sf0.1 corpus (~2k vectors) and (b) a ×100
  * replica (~200k vectors); min-over-3 alternating passes, local[32].
  * Also asserts both runs flag every benchmark-identical corpus vector
  * (recall 1 on the planted copies the replica carries by
  * construction). Prints one JSON line for BASELINE.md. Run:
  * `sbt "runMain graft.DeconProbe <sf0.1Dir> <x100Dir>"`.
  */
object DeconProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, probeDir) = args.take(2)
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
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup

    val tau = graft.queries.LlmQueries.SemDecontamTau
    // the FIXED benchmark: 1k vectors, identical for both corpus sizes
    val bench = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") < 1000)

    def run(dir: String): (Double, Long) = {
      val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      var flagged = -1L
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        flagged = Pipeline.decontaminateSemantic(
          corpus, bench, "vec_id", "embedding", tau).count()
        (System.nanoTime() - t0) / 1e9
      }
      (times.min, flagged)
    }
    val (tSmall, nSmall) = run(sfDir)
    val (tBig, nBig) = run(probeDir)
    val nCorpusSmall = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val nCorpusBig = spark.read.parquet(s"$probeDir/embeddings.parquet").count()
    println(s"""{"probe":"decon_semantic_serving","benchRows":1000,""" +
      s""""corpusSmall":$nCorpusSmall,"sSmall":$tSmall,"flaggedSmall":$nSmall,""" +
      s""""corpusBig":$nCorpusBig,"sBig":$tBig,"flaggedBig":$nBig,""" +
      s""""ratio":${tBig / tSmall},"protocol":"min-over-3"}""")
    spark.stop()
  }
}
