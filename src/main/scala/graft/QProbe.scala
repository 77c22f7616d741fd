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
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("GRAFT_PROBE_WSCG", "true"))
      .config("spark.sql.codegen.hugeMethodLimit",
        sys.env.getOrElse("GRAFT_PROBE_HUGE", "65535"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val qs = SparkEntry.queries
    def t[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    // job/stage/task counters: how much of a query's wall is scheduler
    // round-trips vs task work (guide §7.1's event-timeline question,
    // answered headlessly)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks)
        }
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskInfo != null) taskMs.addAndGet(e.taskInfo.duration)
      })
    def snap(): (Int, Int, Int, Long) =
      (jobs.get, stages.get, tasks.get, taskMs.get)
    names.filter(qs.contains).foreach { n =>
      val (j0, s0, k0, m0) = snap()
      val (tb, df) = t(qs(n)(spark, sfDir))
      val (jb, sb, kb, mb) = snap()
      val (t1, _) = t(df.write.format("noop").mode("overwrite").save())
      val (j1, s1, k1, m1) = snap()
      val (t2, _) = t(df.write.format("noop").mode("overwrite").save())
      val (j2, s2, k2, m2) = snap()
      println(f"[qprobe] $n%-40s build=$tb%7.3f (j=${jb - j0}%3d st=${sb - s0}%3d tk=${kb - k0}%4d ms=${mb - m0}%6d) " +
        f"exec1=$t1%7.3f (j=${j1 - jb}%3d st=${s1 - sb}%3d tk=${k1 - kb}%4d ms=${m1 - mb}%6d) " +
        f"exec2=$t2%7.3f (j=${j2 - j1}%3d st=${s2 - s1}%3d tk=${k2 - k1}%4d ms=${m2 - m1}%6d)")
    }
    spark.stop()
  }
}
