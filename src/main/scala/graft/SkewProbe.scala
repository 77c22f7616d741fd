package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.llmops.{Dedup, Pipeline, TextOps}

/** Round-12 skew probes — the two serialization ceilings VERDICT r11
  * ordered closed, measured head-to-head against the shapes they
  * replace, with the REAL per-task evidence (a SparkListener records
  * the max shuffle-read records of any single task — the serialization
  * number itself, not a proxy):
  *
  *  1. Span dedup on a UNIVERSAL-boilerplate corpus (one 20-token
  *     passage planted in every document, so its window hashes carry
  *     df = N): the old `count(*) over (partition by h)` pushed all N
  *     occurrences of the hot hash through ONE window task; the
  *     round-12 groupBy(h)+join shape map-side-combines partials, so
  *     no task ever sees more than its partition's share.
  *  2. sourceCap on a corpus where ONE source owns 99% of the rows:
  *     the old final window received every block survivor of the mega
  *     source (unbounded in blocks × cap); the round-12 tree top-k
  *     prunes levels until the final window is ≤ cap × TreeFanIn rows.
  *
  * Both probes also assert result EQUALITY against the replaced shape
  * on the probe corpus (same answers, different ceiling). Prints one
  * JSON line per probe for BASELINE.md. Run:
  * `sbt "runMain graft.SkewProbe"`.
  */
object SkewProbe {

  /** Max shuffle-read records of any single task since reset — the
    * direct measure of "how much flowed through one task". */
  final class MaxTaskRows extends org.apache.spark.scheduler.SparkListener {
    val max = new java.util.concurrent.atomic.AtomicLong(0L)
    def reset(): Unit = max.set(0L)
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        val r = m.shuffleReadMetrics.recordsRead
        max.updateAndGet(cur => math.max(cur, r)); ()
      }
    }
  }

  /** The REPLACED span-df shape (window over the raw hash), kept here
    * verbatim as the probe's comparison arm. */
  private def windowShapeSpans(docs: DataFrame, windowTokens: Int): DataFrame = {
    val w = docs.select(col("doc_id"),
      posexplode(graft.plans.NGramMd5(TextOps.tokens(col("text")), windowTokens, 8)))
      .withColumnRenamed("col", "h")
    val wh = Window.partitionBy(col("h"))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
    val flagged = w.withColumn("df", count(lit(1)).over(wh)).filter(col("df") >= 2)
    flagged
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(wd) <= windowTokens, lit(0))
          .otherwise(lit(1)))
      .withColumn("island", sum(col("brk")).over(
        wd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + windowTokens - 1).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"), col("n_windows"))
  }

  /** The REPLACED sourceCap final stage (one window per source over
    * ALL level-0 block survivors — no tree prune). */
  private def twoLevelCap(docs: DataFrame, cap: Int, salt: String,
      blockDocs: Long): DataFrame = {
    val h = TextOps.md5Hash32(concat(lit(salt), col("doc_id").cast("string")))
    val base = docs.select(col("doc_id"), col("source"), h.as("__h"),
      floor(col("doc_id").cast("double") / blockDocs).cast("long").as("__blk"))
    val wBlk = Window.partitionBy(col("source"), col("__blk"))
      .orderBy(col("__h").asc, col("doc_id").asc)
    val wSrc = Window.partitionBy(col("source"))
      .orderBy(col("__h").asc, col("doc_id").asc)
    base.withColumn("__brk", row_number().over(wBlk)).filter(col("__brk") <= cap)
      .withColumn("rk", row_number().over(wSrc)).filter(col("rk") <= cap)
      .select(col("doc_id"), col("source"), col("rk"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // 256 shuffle partitions EMULATE a wide cluster: the fair
      // per-task share of a shuffle shrinks with partition count, but
      // a key-bound task (one window partition = one hot key) does
      // NOT — so the gap between the two is the serialization signal
      // this probe exists to measure. At the default 32 the fair share
      // itself dominates and hides it.
      .config("spark.sql.shuffle.partitions", "256")
      // AQE partition COALESCING is disabled for the measurement: at
      // probe sizes it merges the fair 1/256 shares back into a few
      // fat tasks, polluting the max-task-rows metric with an
      // optimization that would not fire at 100 TB shares. Skew-join
      // splitting (the mechanism under test on the join arm) stays on.
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tracker = new MaxTaskRows
    spark.sparkContext.addSparkListener(tracker)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def measure(df: => DataFrame): (Long, Double, Long) = {
      tracker.reset()
      val ((rows, _), best) = {
        var out: (Long, Double) = (0L, Double.MaxValue)
        var rows = 0L
        (1 to 2).foreach { _ => // min-over-2: first pass warms the JIT
          val (n, s) = timed(df.count())
          rows = n
          if (s < out._2) out = (n, s)
        }
        ((rows, 0), out._2)
      }
      (rows, best, tracker.max.get())
    }

    // ---- probe 1: universal boilerplate through span dedup ----
    val universal = (1 to 20).map(i => s"ub$i").mkString(" ")
    def corpus(n: Long): DataFrame = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        (1 to 12).map(j => concat(lit(s"t$j"), col("id"))) :+ lit(universal): _*)
        .as("text")).localCheckpoint(true)
    val small = corpus(20000L)
    val big = corpus(200000L)
    // equality of answers on the small corpus (the shapes must agree)
    val a = Dedup.duplicateSpans(small, "doc_id", "text", 16)
      .collect().map(_.toSeq).toSet
    val b = windowShapeSpans(small, 16).collect().map(_.toSeq).toSet
    require(a == b, s"span shapes disagree: ${a.size} vs ${b.size} rows")
    val (rowsNewS, tNewS, mNewS) =
      measure(Dedup.duplicateSpans(small, "doc_id", "text", 16))
    val (_, tOldS, mOldS) = measure(windowShapeSpans(small, 16))
    val (rowsNewB, tNewB, mNewB) =
      measure(Dedup.duplicateSpans(big, "doc_id", "text", 16))
    val (_, tOldB, mOldB) = measure(windowShapeSpans(big, 16))
    println(f"""{"probe":"span_universal_boilerplate","docs_small":20000,"docs_big":200000,"agg_sec_small":$tNewS%.3f,"agg_sec_big":$tNewB%.3f,"window_sec_small":$tOldS%.3f,"window_sec_big":$tOldB%.3f,"agg_max_task_rows_small":$mNewS,"agg_max_task_rows_big":$mNewB,"window_max_task_rows_small":$mOldS,"window_max_task_rows_big":$mOldB,"rows_small":$rowsNewS,"rows_big":$rowsNewB}""")

    // ---- probe 2: sourceCap with one source owning 99% ----
    val n2 = 2000000L
    val skewed = spark.range(n2).select(col("id").as("doc_id"),
      when(col("id") % 100 === 0, concat(lit("rare"), col("id") % 500))
        .otherwise(lit("mega")).as("source")).localCheckpoint(true)
    val blockDocs = 1024L // 2M/1024 ≈ 1954 level-0 blocks > TreeFanIn → tree iterates
    val treeDf = Pipeline.sourceCap(skewed, "doc_id", "source", 100, "sp_", blockDocs)
    val flatDf = twoLevelCap(skewed, 100, "sp_", blockDocs)
    val t = treeDf.collect().map(_.toSeq).toSet
    val f2 = flatDf.collect().map(_.toSeq).toSet
    require(t == f2, s"sourceCap shapes disagree: ${t.size} vs ${f2.size} rows")
    val (rowsTree, tTree, mTree) = measure(
      Pipeline.sourceCap(skewed, "doc_id", "source", 100, "sp_", blockDocs))
    val (_, tFlat, mFlat) = measure(twoLevelCap(skewed, 100, "sp_", blockDocs))
    println(f"""{"probe":"sourcecap_mega_source","rows":$n2,"mega_share":0.99,"cap":100,"block_docs":$blockDocs,"tree_sec":$tTree%.3f,"flat_sec":$tFlat%.3f,"tree_max_task_rows":$mTree,"flat_max_task_rows":$mFlat,"kept":$rowsTree}""")

    // ---- probe 3: incremental span scrub — arrival cost vs index size
    // (the GateProbe question at window granularity: a batch scrub must
    // be batch-bound work against the sorted index, so a 10× resident
    // corpus must cost a batch FAR less than 10×)
    val cacheRoot = s"target/skewprobe-${java.util.UUID.randomUUID().toString.take(8)}"
    val idxSmall = Dedup.residentSpanIndex(spark, cacheRoot, "small",
      corpus(20000L), "doc_id", "text", 16)
    val idxBig = Dedup.residentSpanIndex(spark, cacheRoot, "big",
      corpus(200000L), "doc_id", "text", 16)
    // 1k arrivals: half carry the resident boilerplate, half fresh
    val batch = spark.range(1000L).select(
      (col("id") + 10000000L).as("doc_id"),
      when(col("id") % 2 === 0,
        concat_ws(" ", concat(lit("fa"), col("id")), lit(universal),
          concat(lit("fb"), col("id"))))
        .otherwise(concat_ws(" ",
          (1 to 24).map(j => concat(lit(s"z$j"), col("id"))): _*)).as("text"))
      .localCheckpoint(true)
    def scrubCount(idx: DataFrame): Long =
      Dedup.scrubSpansIncremental(idx, batch, "doc_id", "text", 16)
        .filter(col("n_removed") > 0).count()
    val (cutSmall, tIdxS, _) = {
      tracker.reset()
      var best = Double.MaxValue; var n = 0L
      (1 to 3).foreach { _ =>
        val (r, s) = timed(scrubCount(idxSmall)); n = r; if (s < best) best = s
      }
      (n, best, 0L)
    }
    val (cutBig, tIdxB, _) = {
      var best = Double.MaxValue; var n = 0L
      (1 to 3).foreach { _ =>
        val (r, s) = timed(scrubCount(idxBig)); n = r; if (s < best) best = s
      }
      (n, best, 0L)
    }
    require(cutSmall == 500 && cutBig == 500,
      s"scrub decisions wrong: $cutSmall / $cutBig (want 500 each)")
    println(f"""{"probe":"incremental_scrub_arrival","batch":1000,"resident_small":20000,"resident_big":200000,"sec_small_index":$tIdxS%.3f,"sec_big_index":$tIdxB%.3f,"cut_docs":$cutBig}""")
    graft.load.Store.tryDeleteRecursively(java.nio.file.Paths.get(cacheRoot))

    spark.stop()
  }
}
