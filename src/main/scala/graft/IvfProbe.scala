package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llmops.Similarity

/** Persisted-IVF serving probe: build the partitioned index once on
  * the ×10 embeddings (or sf0.1 fallback), then compare the COLD
  * partition-pruned serve against the in-memory route that scans and
  * assigns the corpus per query batch. Also reports the pruned
  * fraction (probed cells / k). One JSON line per section for
  * BASELINE.md. Run: `sbt "runMain graft.IvfProbe"`.
  * `GRAFT_IVF_APPEND_ONLY=1` skips the four build/serve sections and
  * runs only the arrival-append section against the ALREADY-BUILT
  * 64-bit layout from a prior full run — the append cost is
  * arrival-sized by design, so it should not have to pay four index
  * rebuilds to be measured. */
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
    val qids = (0L to 4L).toSeq
    def time(f: => Long): (Double, Long) = {
      val runs = (1 to 3).map { _ =>
        val t = System.nanoTime(); val n = f; ((System.nanoTime() - t) / 1e9, n)
      }
      (runs.map(_._1).min, runs.head._2)
    }
    val dir4 = "target/ivfpqres64_probe"
    val nTrainBig = sys.env.getOrElse("GRAFT_KM_NTRAIN", "8192").toInt
    val appendOnly = sys.env.get("GRAFT_IVF_APPEND_ONLY").contains("1")
    var build64 = -1.0 // carried into the append line for scale context

    if (!appendOnly) {
      val dir = "target/ivfindex_probe"
      val t0 = System.nanoTime()
      // build STAMPED with the source fingerprint (r13 #9) so the serve
      // below runs through the stale probe — the production wiring
      val cents = Similarity.buildIvfIndex(emb, "vec_id", "embedding", 16, 256, dir,
        source = Some(src))
      val buildS = (System.nanoTime() - t0) / 1e9
      graft.load.IndexKeys.requireFresh(dir, src) // refuses if stale
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

      // 64-BIT residual rung PERSISTED (r17): m=8 × nCodes=256 trained
      // at GRAFT_KM_NTRAIN (8192 at the posture runs — BASELINE #93's
      // quality rung) served from the same partitioned layout; the probe
      // extends #91's flat-serve claim to the byte-code configuration
      // (ADC reconstructs against a 64 KB/subspace codebook literal —
      // still broadcast-config-sized) and walks the nProbe ladder the
      // #93 row named as the next quality lever (4 → 8 of 16 cells:
      // 2× the pruned scan buys whatever cell-miss recall is left).
      val t4 = System.nanoTime()
      val (cents4, books4) = Similarity.buildIvfPqIndex(
        emb, "vec_id", "embedding", 16, 8, 256, nTrainBig, dir4,
        source = Some(src), residual = true)
      build64 = (System.nanoTime() - t4) / 1e9
      val (cold64, nCold64) = time(
        Similarity.ivfPqIndexTopK(spark, dir4, qids, 4, 10, source = Some(src)).count())
      val (warm64, nWarm64) = time(
        Similarity.ivfPqResidualTopKWith(emb, "vec_id", "embedding", cents4,
          books4, 4, qids, 10).count())
      assert(nCold64 == nWarm64, s"64-bit route mismatch: $nCold64 vs $nWarm64")
      def recallOf(nProbe: Int): Double = {
        val g = Similarity.ivfPqIndexTopK(spark, dir4, qids, nProbe, 10,
            source = Some(src))
          .select(col("qid"), col("nn")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        g.intersect(exact).size.toDouble / exact.size
      }
      val (recall64p4, recall64p8) = (recallOf(4), recallOf(8))
      val (cold64p8, _) = time(
        Similarity.ivfPqIndexTopK(spark, dir4, qids, 8, 10, source = Some(src)).count())
      println(s"""{"probe":"ivfpq_residual64_index","src":"$src",""" +
        s""""ntrain":$nTrainBig,"build_sec":$build64,""" +
        s""""cold_serve_sec":$cold64,"inmem_serve_sec":$warm64,"rows":$nCold64,""" +
        s""""recall_at_10_probe4":$recall64p4,"recall_at_10_probe8":$recall64p8,""" +
        s""""cold_serve_probe8_sec":$cold64p8}""")
    }

    // ARRIVAL APPEND on the 64-bit persisted rung (r17): a ~1% batch
    // encodes against the FROZEN quantizers and lands as additional
    // cell files — the cost must be arrival-sized (assign + encode +
    // write of the batch), never corpus-sized (no retrain, no rewrite
    // of resident cells), and the very next serve must find appended
    // ids through the ids side table with zero index surgery.
    val total = emb.count()
    val batchN = math.max(1L, total / 100L)
    val maxId = emb.agg(max(col("vec_id"))).head.getLong(0)
    val arrivals = emb.filter(col("vec_id") < batchN)
      .withColumn("vec_id", col("vec_id") + lit(maxId + 1L))
    val tApp = System.nanoTime()
    val nApp = Similarity.appendToIvfPqIndex(spark, dir4, arrivals,
      "vec_id", "embedding", source = Some(src))
    val appendS = (System.nanoTime() - tApp) / 1e9
    val (servedApp, nServedApp) = time(
      Similarity.ivfPqIndexTopK(spark, dir4, Seq(maxId + 1L, 0L), 4, 10,
        source = Some(src)).count())
    println(s"""{"probe":"ivfpq_append","src":"$src","appended":$nApp,""" +
      s""""corpus_rows":$total,"append_sec":$appendS,""" +
      s""""build_sec_for_scale":$build64,""" +
      s""""post_append_serve_sec":$servedApp,"served_rows":$nServedApp}""")
    spark.stop()
  }
}
