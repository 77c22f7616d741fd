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
    // SPARK_GRAFT_SF_DIR overrides (the ×100 posture run points it at
    // target/sf100probe); default stays the ×10 probe with sf0.1 fallback
    val src = sys.env.get("SPARK_GRAFT_SF_DIR").map(d => s"$d/embeddings.parquet")
      .getOrElse(
        if (new java.io.File("target/sf1probe/embeddings.parquet").exists())
          "target/sf1probe/embeddings.parquet"
        else "/root/testdata/sf0.1/embeddings.parquet")
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

    // IVF-PQ (round 14): the composed index on the same corpus — build
    // (train both quantizers + encode + partitioned write), cold serve
    // (ADC narrow-column shortlist + exact re-rank, both partition-
    // pruned), in-memory composed route, and recall of the composed
    // path vs brute-force exact top-10 (the honest quality number: the
    // ADC shortlist can drop true neighbors the plain-IVF route keeps).
    val dir2 = "target/ivfpqindex_probe"
    val t2 = System.nanoTime()
    val (cents2, books2) = Similarity.buildIvfPqIndex(
      emb, "vec_id", "embedding", 16, 4, 16, 256, dir2, source = Some(src))
    val buildPq = (System.nanoTime() - t2) / 1e9
    val (coldPq, nColdPq) = time(
      Similarity.ivfPqIndexTopK(spark, dir2, qids, 4, 10, source = Some(src)).count())
    val (warmPq, nWarmPq) = time(
      Similarity.ivfPqTopKWith(emb, "vec_id", "embedding", cents2, books2,
        4, qids, 10).count())
    assert(nColdPq == nWarmPq, s"ivfpq route mismatch: $nColdPq vs $nWarmPq")
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qids, 10)
      .select(col("qid"), col("nn")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.ivfPqIndexTopK(spark, dir2, qids, 4, 10, source = Some(src))
      .select(col("qid"), col("nn")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    println(s"""{"probe":"ivfpq_index","src":"$src","build_sec":$buildPq,""" +
      s""""cold_serve_sec":$coldPq,"inmem_serve_sec":$warmPq,"rows":$nColdPq,""" +
      s""""recall_at_10":$recall}""")

    // RESIDUAL IVF-PQ (round 15): same layout, codes encode
    // r = unit(v) − c_cell (IVFADC) — the marker-governed decode must
    // keep the cold route equal to the in-memory residual route, at
    // the same (id, codes, rn) narrow-page serve cost
    val dir3 = "target/ivfpqres_probe"
    val t3 = System.nanoTime()
    val (cents3, books3) = Similarity.buildIvfPqIndex(
      emb, "vec_id", "embedding", 16, 4, 16, 256, dir3, source = Some(src),
      residual = true)
    val buildRes = (System.nanoTime() - t3) / 1e9
    val (coldRes, nColdRes) = time(
      Similarity.ivfPqIndexTopK(spark, dir3, qids, 4, 10, source = Some(src)).count())
    val (warmRes, nWarmRes) = time(
      Similarity.ivfPqResidualTopKWith(emb, "vec_id", "embedding", cents3,
        books3, 4, qids, 10).count())
    assert(nColdRes == nWarmRes, s"residual route mismatch: $nColdRes vs $nWarmRes")
    val gotRes = Similarity.ivfPqIndexTopK(spark, dir3, qids, 4, 10, source = Some(src))
      .select(col("qid"), col("nn")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallRes = gotRes.intersect(exact).size.toDouble / exact.size
    println(s"""{"probe":"ivfpq_residual_index","src":"$src","build_sec":$buildRes,""" +
      s""""cold_serve_sec":$coldRes,"inmem_serve_sec":$warmRes,"rows":$nColdRes,""" +
      s""""recall_at_10":$recallRes}""")
    spark.stop()
  }
}
