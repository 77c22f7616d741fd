package graft

import org.apache.spark.sql.SparkSession

/** Per-query cost breakdown probe (optimization rounds): for each named
  * query, times (a) DataFrame CONSTRUCTION (parse/compile/build — pure
  * driver work), (b) first noop execution (includes planning + AQE),
  * (c) second noop execution (plan warm; isolates recompute cost).
  * Prints one line per query. Usage:
  *   sbt "runMain graft.QProbe <sfDir> <query> [query ...]"
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
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
    spark.range(1000000).selectExpr("sum(id)").collect()
    val qs = SparkEntry.queries
    def t[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    names.filter(qs.contains).foreach { n =>
      val (tb, df) = t(qs(n)(spark, sfDir))
      val (t1, _) = t(df.write.format("noop").mode("overwrite").save())
      val (t2, _) = t(df.write.format("noop").mode("overwrite").save())
      println(f"[qprobe] $n%-40s build=$tb%7.3f exec1=$t1%7.3f exec2=$t2%7.3f")
    }
    spark.stop()
  }
}
