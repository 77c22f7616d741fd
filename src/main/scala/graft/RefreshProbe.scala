package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llmops.{Pipeline, Refresh}

/** Scale probe for the composed INCREMENTAL corpus refresh (round-13
  * order #1): an identical arrival batch refreshes against a resident
  * corpus and against a 10× resident corpus, and the claim under test
  * is that the text-bound arrival cost is BATCH-bound — flat in
  * resident size — because every stage probes persisted epoch
  * authorities instead of re-scanning resident text. Measured
  * separately: the snapshot diff (declaredly linear in snapshot size,
  * but a column-pruned md5 scan that never shuffles text) and the
  * arrival `process` pass (gate → scrub-probe → star-probe → Bloom —
  * the flat part). The probe also:
  *
  *  - asserts NO stage of the arrival path re-scans the snapshot
  *    parquet (executed-plan check, the PipelineE2E discipline);
  *  - hash-asserts EXACT incrementality at the 10× corpus:
  *    (resident ∖ deletes) ∪ upserts ≡ one full epoch run over the
  *    new snapshot, doc-for-doc and byte-for-byte;
  *  - packs the upserts into delta shards above the resident shard
  *    range and exports them (the append-plus-tombstone last mile).
  *
  * Prints JSON lines for BASELINE.md. Run:
  * `sbt "runMain graft.RefreshProbe [smallDir largeDir]"` (defaults
  * `target/sf1probe` / `target/sf100probe`, built by
  * `tools/make_sf_probe.py`). */
/** MemoryStream row for the streaming-gate phase (top-level: implicit
  * product encoders need a stable, outer-free class). */
case class ProbeDoc(doc_id: Long, text: String, lang: String,
    source: String, seq: Long)

object RefreshProbe {
  def main(args: Array[String]): Unit = {
    val smallDir = if (args.length > 0) args(0) else "target/sf1probe"
    val largeDir = if (args.length > 1) args(1) else "target/sf100probe"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cacheRoot = s"target/refreshprobe-${java.util.UUID.randomUUID().toString.take(8)}"
    val rules = Pipeline.GateRules(minTokens = 5, maxTokens = 100000,
      minStopRatio = 0.0, minTtr = 0.2, maxDupTrigram = 0.5)

    def docsOf(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))

    try {
      // ONE benchmark set for both sizes (epoch input, not arrival work)
      val benchmark = docsOf(smallDir)
        .filter(Pipeline.samplePct(col("doc_id"), "refresh_bench") < 1)
        .localCheckpoint(true)

      /** The identical churn against either resident corpus: ids
        * 0..49999 exist in both. 250 removed, 250 changed (tail
        * marker), 500 added (250 exact duplicates of residents — must
        * drop via the index probe — and 250 genuinely fresh synthetic
        * docs — must survive). */
      def churn(resident: DataFrame): DataFrame = {
        val base = resident.filter(!col("doc_id").isin((0L until 250L): _*))
        val changed = resident
          .filter(col("doc_id") >= 250 && col("doc_id") < 500)
          .withColumn("text", concat(col("text"), lit(" refreshed edition marker")))
        val dupAdds = resident.filter(col("doc_id") >= 500 && col("doc_id") < 750)
          .withColumn("doc_id", col("doc_id") + 10000000L)
        val freshAdds = resident.filter(col("doc_id") >= 750 && col("doc_id") < 1000)
          .select((col("doc_id") + 20000000L).as("doc_id"),
            // every trigram spans a per-id token → zero cross-doc
            // shingles → genuinely fresh (a shared template phrase
            // gets MinHash-banded into mega-buckets; the first run of
            // this probe dropped 58/250 "fresh" docs exactly that way)
            concat_ws(" ",
              concat(lit("qa"), col("doc_id")), lit("the"),
              concat(lit("qb"), col("doc_id")), lit("of"),
              concat(lit("qc"), col("doc_id")), lit("and"),
              concat(lit("qd"), col("doc_id")), lit("in"),
              concat(lit("qe"), col("doc_id")), lit("the"),
              concat(lit("qf"), col("doc_id")), lit("end")).as("text"),
            lit("en").as("lang"), lit("probe").as("source"))
        base.filter(!(col("doc_id") >= 250 && col("doc_id") < 500))
          .unionByName(changed).unionByName(dupAdds).unionByName(freshAdds)
      }

      def run(label: String, dir: String): (Long, Double) = {
        val resident = docsOf(dir).withColumn("seq", col("doc_id"))
        val nResident = resident.count()
        var t0 = System.nanoTime()
        // mBits sized to the benchmark's shingle mass (~250k 8-grams ×
        // k=4 ≈ 1M set bits): 2²⁴ bits ≈ 6% fill ≈ 1.3e-5 FP/shingle —
        // a 2 MB driver bitmap. The first runs of this probe used the
        // 2¹⁸ default (80% full, 18% of genuinely fresh arrivals
        // false-positived into the decon drop) and then 2²² (20% full,
        // ~2.4 expected FP per 250-doc batch, one observed) — the
        // bitmap must be sized m ≈ k·n/ln2 · margin, not defaulted
        val epoch = Refresh.buildEpoch(spark, cacheRoot, label, resident,
          benchmark, "doc_id", "seq", "text", "lang", rules, mBits = 1 << 24)
        // open-vs-build: force the authorities to disk before timing arrivals
        val idxRows = epoch.bandIndex.count() + epoch.spanIndex.count()
        val buildSec = (System.nanoTime() - t0) / 1e9

        t0 = System.nanoTime()
        val residentKept = Refresh.process(epoch, resident,
          "doc_id", "seq", "text", "lang").localCheckpoint(true)
        val nKept = residentKept.count()
        val epochRunSec = (System.nanoTime() - t0) / 1e9

        val snapshot = churn(resident.drop("seq")).localCheckpoint(true)
        val maxSeq = nResident + 1000L

        // the measured quantity: min-over-3 of the WHOLE refresh
        // (diff + arrival processing), plus the diff alone — their
        // difference is the batch-bound part the flat claim covers
        def diffOnly(): Double = {
          val t = System.nanoTime()
          Pipeline.corpusDiff(resident, snapshot, "doc_id", "text")
            .groupBy("status").count().collect()
          (System.nanoTime() - t) / 1e9
        }
        var bestRefresh = Double.MaxValue
        var nUp = -1L; var nDel = -1L
        var upserts: DataFrame = null; var deletes: DataFrame = null
        (0 until 3).foreach { _ =>
          val t = System.nanoTime()
          val (u, d) = Refresh.refreshDelta(epoch, resident, snapshot,
            "doc_id", "seq", "text", "lang", maxSeq)
          val uu = u.localCheckpoint(true)
          nUp = uu.count(); nDel = d.count()
          bestRefresh = math.min(bestRefresh, (System.nanoTime() - t) / 1e9)
          upserts = uu; deletes = d
        }
        val diffSec = (0 until 3).map(_ => diffOnly()).min

        // composition discipline: the arrival stages must read the
        // checkpointed batch + the index parquet, never the snapshot
        val plan = Refresh.process(epoch,
            snapshot.join(deletes, Seq("doc_id"), "left_anti").limit(0)
              .withColumn("seq", col("doc_id")).localCheckpoint(true),
            "doc_id", "seq", "text", "lang")
          .queryExecution.executedPlan.toString
        require(!plan.contains("documents.parquet"),
          "arrival path re-scans the snapshot parquet")

        // arrival verdicts: every duplicate add dropped, fresh adds kept
        val upIds = upserts.select("doc_id")
        val dupKept = upIds.filter(col("doc_id") >= 10000000L && col("doc_id") < 20000000L).count()
        val freshKept = upIds.filter(col("doc_id") >= 20000000L).count()
        require(dupKept == 0, s"$dupKept duplicate adds survived the index probe")
        require(freshKept == 250, s"only $freshKept/250 fresh adds kept")

        // EXACT incrementality, hash-asserted over (id, text) content
        def contentHash(df: DataFrame): java.math.BigDecimal = df
          .select(conv(substring(md5(concat_ws("|",
            col("doc_id").cast("string"), col("text"))), 1, 15), 16, 10)
            .cast("decimal(38,0)").as("h"))
          .agg(sum(col("h"))).head.getDecimal(0)
        val full = Refresh.process(epoch,
          snapshot.withColumn("seq",
            when(col("doc_id") >= nResident, col("doc_id") + maxSeq)
              .when(col("doc_id") >= 250 && col("doc_id") < 500,
                col("doc_id") + maxSeq)
              .otherwise(col("doc_id"))),
          "doc_id", "seq", "text", "lang")
        val applied = residentKept.join(deletes, Seq("doc_id"), "left_anti")
          .select("doc_id", "text")
          .unionByName(upserts.select("doc_id", "text"))
        require(applied.count() == full.count() &&
            contentHash(applied) == contentHash(full),
          "incremental apply diverged from the full epoch run")

        // the append-plus-tombstone last mile: delta shards above the
        // resident shard range
        val residentShards = Pipeline.shardAssign(residentKept, "doc_id",
          "lang", 1 << 20)
        val shardBase = residentShards.agg(max(col("shard"))).head.getLong(0) + 1
        val deltaPacked = upserts.join(
          Pipeline.shardAssign(upserts, "doc_id", "lang", 1 << 20)
            .select(col("doc_id"), (col("shard") + shardBase).as("shard")),
          Seq("doc_id"))
        val outDir = s"$cacheRoot/delta-$label"
        Pipeline.exportJsonl(deltaPacked, outDir, "shard", "doc_id")
        require(spark.read.json(outDir).count() == nUp, "delta export lost rows")

        println(f"""{"probe":"refresh","resident":"$label","n_resident":$nResident,"n_kept":$nKept,"index_rows":$idxRows,"epoch_build_sec":$buildSec%.2f,"epoch_run_sec":$epochRunSec%.2f,"diff_sec":$diffSec%.2f,"refresh_sec":$bestRefresh%.2f,"upserts":$nUp,"deletes":$nDel}""")
        (nResident, bestRefresh)
      }

      val (nS, tS) = run("small", smallDir)
      val (nL, tL) = run("large", largeDir)
      println(f"""{"probe":"refresh_flatness","resident_ratio":${nL.toDouble / nS}%.1f,"refresh_ratio":${tL / tS}%.2f}""")

      /** Streaming twin (r12 order #10): the SAME large-corpus churn
        * arrivals through [[graft.streaming.EventsStream.refreshGate]]
        * in 4 seq-ordered micro-batches — per-batch wall is the
        * arrival-cost row, and the union of sunk batches must equal
        * the batch refresh's upserts id-for-id (the streaming ≡ batch
        * theorem at probe scale, on top of the spec's small-graph
        * proof). The epoch opens from the persisted cache (same key as
        * the batch phase — open, not rebuild). */
      def streamRun(label: String, dir: String): Unit = {
        import spark.implicits._
        implicit val sqlCtx = spark.sqlContext
        val resident = docsOf(dir).withColumn("seq", col("doc_id"))
        val nResident = resident.count()
        val epoch = Refresh.buildEpoch(spark, cacheRoot, label, resident,
          benchmark, "doc_id", "seq", "text", "lang", rules, mBits = 1 << 24)
        val maxSeq = nResident + 1000L
        val snapshot = churn(resident.drop("seq")).localCheckpoint(true)
        val diff = Pipeline.corpusDiff(resident, snapshot, "doc_id", "text")
        val arrivals = snapshot
          .join(diff.filter(col("status").isin("added", "changed"))
            .select("doc_id"), Seq("doc_id"), "left_semi")
          .withColumn("seq", lit(maxSeq) + col("doc_id"))
          .select("doc_id", "text", "lang", "source", "seq")
          .as[ProbeDoc].collect().sortBy(_.seq) // 1000 rows, probe-sized
        val batches = arrivals.grouped((arrivals.length + 3) / 4).toSeq
        val deltaDir = s"$cacheRoot/stream-delta-$label"
        val got = scala.collection.mutable.ArrayBuffer[Long]()
        val mem = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[ProbeDoc]
        val q = graft.streaming.EventsStream.refreshGate(epoch, deltaDir,
          mem.toDF(), "doc_id", "seq", "text", "lang") { kept =>
          got.synchronized {
            got ++= kept.select("doc_id").collect().map(_.getLong(0))
          }
        }
        val walls = batches.map { b =>
          val t = System.nanoTime()
          mem.addData(b: _*); q.processAllAvailable()
          (System.nanoTime() - t) / 1e9
        }
        q.stop()
        val (u, _) = Refresh.refreshDelta(epoch, resident, snapshot,
          "doc_id", "seq", "text", "lang", maxSeq)
        val want = u.select("doc_id").collect().map(_.getLong(0)).toSet
        require(got.toSet == want,
          s"streaming gate ≠ batch refresh: ${got.size} vs ${want.size} kept")
        println(f"""{"probe":"refresh_stream","resident":"$label","n_resident":$nResident,"batches":${batches.size},"batch_secs":[${walls.map(wv => f"$wv%.2f").mkString(",")}],"total_sec":${walls.sum}%.2f,"kept":${got.size}}""")
      }
      streamRun("large", largeDir)
    } finally {
      graft.load.Store.tryDeleteRecursively(java.nio.file.Paths.get(cacheRoot))
    }
    spark.stop()
  }
}
