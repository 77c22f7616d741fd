package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline query set on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":…,"value":N,"unit":"sec","queries":{…},"sf":…}`.
  *
  * The headline set covers the engine's scale-relevant spine — scans,
  * hash-agg, broadcast + shuffle joins, multi-hop traversal joins,
  * window functions, event-time windows, top-k, and the LLM-ops
  * pipeline (exact dedup, MinHash-LSH, cosine top-k, text metrics,
  * multimodal batch decode). Each query is fully materialized through
  * the noop sink (count() could skip projection work).
  */
object Bench {

  val headline: Seq[String] = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSeq).getOrElse(Seq(
    "scan_counts",
    "agg_pricing_summary",
    "agg_count_distinct",
    "join_inner_dims",
    "join_left",
    "match_2hop_revenue",
    "traverse_varlen",
    "connected_components",
    "window_running",
    "window_tumbling",
    "sort_topk",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "sim_topk",
    "text_quality",
    "multimodal_meta"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/session init shouldn't bill the first query
    spark.range(1000000).selectExpr("sum(id)").collect()
    val qs = SparkEntry.queries
    // a failed query records -1 (NOT its partial elapsed time, which
    // would silently flatter the total); repeated names (the A/B timing
    // feature of SPARK_GRAFT_BENCH_ONLY) get a #k suffix so the JSON
    // has no duplicate keys and survives strict parsers
    val results = headline.filter(qs.contains).map { name =>
      val t0 = System.nanoTime()
      val ok =
        try { qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val seen = scala.collection.mutable.Map[String, Int]()
    val qjson = results.map { case (k, v) =>
      val n = seen.getOrElse(k, 0); seen(k) = n + 1
      val key = if (n == 0) k else s"$k#${n + 1}"
      "\"" + key + "\":" + v
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val failJson = if (failed.isEmpty) "" else s""","failed":[${failed.mkString(",")}]"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qjson$failJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
