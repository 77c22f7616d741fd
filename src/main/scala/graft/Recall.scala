package graft

import org.apache.spark.sql.SparkSession
import graft.llmops.Similarity

/** Recall@k probe for the approximate similarity paths (VERDICT r7
  * missing #4's "measure recall"): brute-force cosine top-k is ground
  * truth; the sampled-centroid IVF and the [[Similarity.trainKMeans]]
  * trained IVF are scored by mean per-query overlap. Run against
  * `SPARK_GRAFT_SF_DIR` (and the ×100 embedding probe) — prints one
  * JSON line for BASELINE.md.
  *
  * Correctness of the search pipeline is the oracle's job
  * (`sim_ivf_topk` / `sim_ivf_trained_topk` hash-match DuckDB); this
  * main measures the QUALITY effect of training the coarse quantizer,
  * which no equality oracle can see.
  */
object Recall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // GRAFT_RECALL_MOG=<rows>: score on a deterministic mixture-of-
    // Gaussians corpus whose ids are NOT cluster-aligned (VERDICT r8
    // order #6). The driver fixture's id-aligned seeds make
    // first-N-by-id sampling coincide with the generator's natural
    // clusters, so training could only reach parity there (BASELINE.md
    // #9); here cluster membership is a hash of the id, so sampled
    // centroids are arbitrary points and the training path's value is
    // measurable. splitmix64 + Box-Muller: same corpus every run, no
    // RNG state.
    val emb = sys.env.get("GRAFT_RECALL_MOG") match {
      case Some(nStr) =>
        import spark.implicits._
        val n = nStr.toLong; val dim = 64; val kTrue = 16
        // noise/separation ratio: 0.5 = crisply separated clusters,
        // ≥2.0 = heavy overlap (where quantizer quality starts to
        // matter — see the BASELINE.md finding)
        val noise = sys.env.getOrElse("GRAFT_RECALL_MOG_NOISE", "0.5").toDouble
        def mix(x0: Long): Long = {
          var x = x0 + 0x9E3779B97F4A7C15L
          x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
          x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
          x ^ (x >>> 31)
        }
        def unif(s: Long): Double = (mix(s) >>> 11).toDouble / (1L << 53).toDouble
        def gauss(s: Long): Double = {
          val u1 = math.max(unif(2 * s), 1e-12)
          math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * unif(2 * s + 1))
        }
        spark.range(n).map { id =>
          val c = (mix(id) & Long.MaxValue) % kTrue // id ↛ cluster
          val v = Array.tabulate(dim) { d =>
            (3.0 * gauss(c * 1000003L + d) + noise * gauss(mix(id) * 131L + d)).toFloat
          }
          (id, v)
        }.toDF("vec_id", "embedding")
      case None => spark.read.parquet(s"$sfDir/embeddings.parquet")
    }
    val k = 10
    val qids = (0L until 20L).toSeq
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "nn").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val truth = topSets(Similarity.bruteForceTopK(emb, "vec_id", "embedding", qids, k))
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = topSets(df)
      val per = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }
      per.sum / per.size
    }
    val nTrain = sys.env.getOrElse("GRAFT_KM_NTRAIN", "256").toInt
    val iters = sys.env.getOrElse("GRAFT_KM_ITERS", "2").toInt
    val cents = Similarity.trainKMeans(emb, "vec_id", "embedding", 16, nTrain, iters)
    val sampled = recallOf(Similarity.ivfTopK(
      emb, "vec_id", "embedding", 16, 4, qids, k))
    val trained = recallOf(Similarity.ivfTopKWith(
      emb, "vec_id", "embedding", cents, 4, qids, k))
    // uncapped pair isolates QUANTIZER quality from the hot-cell
    // candidate cap (which truncates every cell once occupancy
    // outgrows it — at sf0.1 the cap, not the quantizer, dominates)
    val sampledU = recallOf(Similarity.ivfTopK(
      emb, "vec_id", "embedding", 16, 4, qids, k, capPerCell = Int.MaxValue))
    val trainedU = recallOf(Similarity.ivfTopKWith(
      emb, "vec_id", "embedding", cents, 4, qids, k, capPerCell = Int.MaxValue))
    // compression rungs, same ground truth: int8 symmetric quantization
    // and 4×16 product quantization — the recall cost of 4× and ~128×
    // smaller corpus representations respectively
    val quantized = recallOf(Similarity.quantizedTopK(
      emb, "vec_id", "embedding", qids, k))
    val pq = recallOf(Similarity.pqTopK(
      emb, "vec_id", "embedding", 4, 16, qids, k))
    val pqBooks = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
      4, 16, nTrain, iters)
    val pqTrained = recallOf(Similarity.pqTopKWith(
      emb, "vec_id", "embedding", pqBooks, qids, k))
    val pqRerank = recallOf(Similarity.pqRerankTopK(
      emb, "vec_id", "embedding", 4, 16, qids, k))
    // the composed IVF-PQ rung (round 15 — the r14 newcomer joins the
    // recall ladder): coarse cells prune the scan, ADC shortlists on
    // codes, exact re-rank on the shortlist; its recall compounds the
    // IVF probe miss AND the ADC shortlist miss, so it must sit at or
    // below min(trained_ivf, pq_rerank) — the honest composed number
    val ivfPq = recallOf(Similarity.ivfPqTopKWith(
      emb, "vec_id", "embedding", cents, pqBooks, 4, qids, k))
    // residual-encoded IVFADC (round 15): codes spend their resolution
    // on within-cell variation — the clustered-corpus fix
    val residBooks = Similarity.trainResidualPqCodebooks(
      emb, "vec_id", "embedding", cents, 4, 16, nTrain, iters)
    val ivfPqR = recallOf(Similarity.ivfPqResidualTopKWith(
      emb, "vec_id", "embedding", cents, residBooks, 4, qids, k))
    // uncapped pair isolates CODE quality from the hot-cell cap (the
    // same device as the ivf uncapped pair above): on a clustered
    // corpus every true neighbor shares the query's cell, so the cap
    // — not the codes — bounds the capped numbers
    val ivfPqU = recallOf(Similarity.ivfPqTopKWith(
      emb, "vec_id", "embedding", cents, pqBooks, 4, qids, k,
      capPerCell = Int.MaxValue))
    val ivfPqRU = recallOf(Similarity.ivfPqResidualTopKWith(
      emb, "vec_id", "embedding", cents, residBooks, 4, qids, k,
      capPerCell = Int.MaxValue))
    // the 32-BIT residual rung (r16, VERDICT r15 order #3): m=8
    // sub-quantizers on the same residual machinery — #85 measured the
    // 16-bit budget as the binding constraint on crisp MoG
    val residBooks8 = Similarity.trainResidualPqCodebooks(
      emb, "vec_id", "embedding", cents, 8, 16, nTrain, iters)
    val ivfPqR8 = recallOf(Similarity.ivfPqResidualTopKWith(
      emb, "vec_id", "embedding", cents, residBooks8, 4, qids, k))
    val ivfPqR8U = recallOf(Similarity.ivfPqResidualTopKWith(
      emb, "vec_id", "embedding", cents, residBooks8, 4, qids, k,
      capPerCell = Int.MaxValue))
    // the 48-BIT rung: m=8 × nCodes=64 — measures whether codeword
    // COUNT (not just subspace count) is the remaining ceiling; only
    // meaningful at the ladder's nTrain (env, 2048 at the MoG runs)
    // where 64-codeword books have data to learn
    val residBooks8c64 = Similarity.trainResidualPqCodebooks(
      emb, "vec_id", "embedding", cents, 8, 64, nTrain, iters)
    val ivfPqR8c64 = recallOf(Similarity.ivfPqResidualTopKWith(
      emb, "vec_id", "embedding", cents, residBooks8c64, 4, qids, k))
    val ivfPqR8c64U = recallOf(Similarity.ivfPqResidualTopKWith(
      emb, "vec_id", "embedding", cents, residBooks8c64, 4, qids, k,
      capPerCell = Int.MaxValue))
    // the 64-BIT rung (r17, VERDICT r16 order #3): m=8 × nCodes=256 —
    // the standard byte-code IVFADC layout. Trained at the ladder's
    // nTrain (GRAFT_KM_NTRAIN); run the probe at 2048 AND 8192 to
    // measure the TRAINING-SIZE lever #89 identified ("nCodes > 16
    // needs nTrain ≫ 256") separately from the code-budget lever.
    // An OPQ rotation rung is deliberately absent: the MoG residuals
    // are isotropic Gaussians, so any orthogonal rotation leaves their
    // distribution (hence PQ distortion) unchanged by symmetry — the
    // ladder would measure exactly 0 gain at real cost.
    val residBooks8c256 = Similarity.trainResidualPqCodebooks(
      emb, "vec_id", "embedding", cents, 8, 256, nTrain, iters)
    val ivfPqR8c256 = recallOf(Similarity.ivfPqResidualTopKWith(
      emb, "vec_id", "embedding", cents, residBooks8c256, 4, qids, k))
    val ivfPqR8c256U = recallOf(Similarity.ivfPqResidualTopKWith(
      emb, "vec_id", "embedding", cents, residBooks8c256, 4, qids, k,
      capPerCell = Int.MaxValue))
    // the CELL-COUNT rung (r17 — #93's "next honest lever is
    // nProbe/cell count"): 64 cells probed at nProbe=16 keeps the
    // scanned fraction at the ladder's ¼ while quartering each cell's
    // diameter — the residual the codes must describe shrinks, so the
    // SAME 64-bit code budget spends on finer detail. Separates the
    // partition-granularity lever from the code/training levers the
    // ladder already isolates (only meaningful at ladder nTrain:
    // 64-cell k-means needs ≫64 training vectors).
    val cents64 = Similarity.trainKMeans(emb, "vec_id", "embedding", 64, nTrain, iters)
    val trained64 = recallOf(Similarity.ivfTopKWith(
      emb, "vec_id", "embedding", cents64, 16, qids, k))
    val trained64U = recallOf(Similarity.ivfTopKWith(
      emb, "vec_id", "embedding", cents64, 16, qids, k,
      capPerCell = Int.MaxValue))
    val residBooks64c = Similarity.trainResidualPqCodebooks(
      emb, "vec_id", "embedding", cents64, 8, 256, nTrain, iters)
    val ivfPqR64c = recallOf(Similarity.ivfPqResidualTopKWith(
      emb, "vec_id", "embedding", cents64, residBooks64c, 16, qids, k))
    val ivfPqR64cU = recallOf(Similarity.ivfPqResidualTopKWith(
      emb, "vec_id", "embedding", cents64, residBooks64c, 16, qids, k,
      capPerCell = Int.MaxValue))
    // cross-corpus LSH join recall: exact τ-pairs between the even/odd
    // halves are ground truth (brute-force, probe-scale only); the
    // bucketed join's pairs are a subset by construction, so recall =
    // |got| / |truth| — the same measured-honesty discipline as the
    // in-corpus LSH family (BASELINE #17).
    import org.apache.spark.sql.functions._
    val tau = 0.30
    val left = emb.filter(col("vec_id") % 2 === 0)
    val right = emb.filter(col("vec_id") % 2 === 1)
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val vL = left.select(col("vec_id").as("lid"),
      col("embedding").cast("array<double>").as("v1"))
      .withColumn("n1", Similarity.norm(col("v1")))
    val vR = right.select(col("vec_id").as("rid"),
      col("embedding").cast("array<double>").as("v2"))
      .withColumn("n2", Similarity.norm(col("v2")))
    val exactPairs = pairsOf(vL.crossJoin(vR)
      .filter(Similarity.dot(col("v1"), col("v2")) / (col("n1") * col("n2")) >= tau))
    val gotPairs = pairsOf(graft.llmops.Dedup.crossSimilarityJoin(
      left, right, "vec_id", "embedding", 64, 4, 4, tau))
    val crossRecall =
      if (exactPairs.isEmpty) 1.0 else gotPairs.size.toDouble / exactPairs.size
    println(f"""{"metric":"recall_at_$k","sampled_ivf":$sampled%.4f,""" +
      f""""trained_ivf":$trained%.4f,"sampled_ivf_uncapped":$sampledU%.4f,""" +
      f""""trained_ivf_uncapped":$trainedU%.4f,""" +
      f""""int8":$quantized%.4f,"pq":$pq%.4f,"pq_trained":$pqTrained%.4f,""" +
      f""""pq_rerank":$pqRerank%.4f,"ivfpq":$ivfPq%.4f,""" +
      f""""ivfpq_residual":$ivfPqR%.4f,""" +
      f""""ivfpq_uncapped":$ivfPqU%.4f,"ivfpq_residual_uncapped":$ivfPqRU%.4f,""" +
      f""""ivfpq_residual_m8":$ivfPqR8%.4f,"ivfpq_residual_m8_uncapped":$ivfPqR8U%.4f,""" +
      f""""ivfpq_residual_m8c64":$ivfPqR8c64%.4f,""" +
      f""""ivfpq_residual_m8c64_uncapped":$ivfPqR8c64U%.4f,""" +
      f""""ivfpq_residual_m8c256":$ivfPqR8c256%.4f,""" +
      f""""ivfpq_residual_m8c256_uncapped":$ivfPqR8c256U%.4f,""" +
      f""""trained_ivf_c64":$trained64%.4f,""" +
      f""""trained_ivf_c64_uncapped":$trained64U%.4f,""" +
      f""""ivfpq_residual_m8c256_c64":$ivfPqR64c%.4f,""" +
      f""""ivfpq_residual_m8c256_c64_uncapped":$ivfPqR64cU%.4f,""" +
      f""""ntrain":$nTrain,""" +
      f""""cross_join_pairs":$crossRecall%.4f,"cross_join_truth_n":${exactPairs.size},""" +
      f""""sf_dir":"$sfDir"}""")
    spark.stop()
  }
}
