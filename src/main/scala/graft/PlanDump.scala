package graft

import org.apache.spark.sql.SparkSession

/** Plan capture for the optimization rounds: writes each named query's
  * `explain("formatted")` physical plan to `<outDir>/<name>_<tag>.txt`
  * so before/after plan diffs are committed evidence (guide §1.4/§7.2),
  * not claims. Usage:
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> <tag> [query ...]"
  * With no query names, dumps every declared query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val tag = args(2)
    val only = args.drop(3).toSet
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
    java.nio.file.Files.createDirectories(outDir)
    val qs = SparkEntry.queries
    val names = if (only.isEmpty) qs.keys.toSeq.sorted
                else qs.keys.filter(only).toSeq.sorted
    names.foreach { n =>
      try {
        val df = qs(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(outDir.resolve(s"${n}_$tag.txt"), plan)
        System.err.println(s"[plandump] $n -> ${n}_$tag.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n FAILED: $e")
      }
    }
    spark.stop()
  }
}
