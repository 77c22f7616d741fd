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
    val results = headline.filter(qs.contains).map { name =>
      val t0 = System.nanoTime()
      try qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qjson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qjson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
