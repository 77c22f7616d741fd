package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{EventRow, EventsStream, QuotaDoc}

case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double, event_id: Long)
case class Doc(ts: Timestamp, doc_id: Long, text: String)
case class SrcDoc(ts: Timestamp, doc_id: Long, source: String, text: String)
case class DeconV(vec_id: Long, embedding: Seq[Double])
case class RefDoc(doc_id: Long, text: String, lang: String, source: String, seq: Long)

/** ✚ Structured Streaming extension (SURVEY §2.B.10): the same
  * declarative plans run incrementally — MemoryStream in, memory sink
  * out, watermark semantics observed. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1704067200000L + minute * 60000L) // 2024-01-01 UTC

  test("tumbling window aggregation runs incrementally and matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val events = Seq(
      Ev(ts(1), 1, "click", 1.0, 1), Ev(ts(5), 1, "click", 2.0, 2),
      Ev(ts(12), 2, "view", 3.0, 3), Ev(ts(25), 1, "click", 4.0, 4))
    val q = EventsStream.tumblingCounts(mem.toDF(), "10 minutes", "15 minutes")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append()).start()
    mem.addData(events: _*)
    q.processAllAvailable()
    // advance watermark far past the data so all windows close
    mem.addData(Ev(ts(120), 9, "noop", 0.0, 99))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("tumbling").filter($"event_type" =!= "noop")
    val batch = EventsStream.tumblingCounts(events.toDF(), "10 minutes", "15 minutes")
    assert(streamed.count() == 3)
    val s = streamed.orderBy("w_start", "event_type").collect().map(_.toSeq)
    val b = batch.orderBy("w_start", "event_type").collect().map(_.toSeq)
    assert(s.toSeq == b.toSeq)
  }

  test("dropDuplicatesWithinWatermark dedups inside the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventsStream.dedupWithinWatermark(mem.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      Ev(ts(1), 1, "click", 1.0, 1), Ev(ts(2), 1, "click", 9.0, 2), // dup key in-horizon
      Ev(ts(3), 2, "view", 3.0, 3))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup").count() == 2)
  }

  test("flatMapGroupsWithState sessionization matches session_window semantics") {
    import graft.streaming.EventRow
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val data = Seq(
      Ev(ts(0), 1, "a", 1.25, 1), Ev(ts(10), 1, "a", 2.50, 2), // user1 session A
      Ev(ts(60), 1, "a", 4.00, 3),                             // user1 session B (gap 50m)
      Ev(ts(5), 2, "b", 0.75, 4))                              // user2 session
    val q = EventsStream.sessionizeStateful(mem.toDF().as[EventRow], 30)
      .writeStream.format("memory").queryName("statesessions")
      .outputMode(OutputMode.Append()).start()
    mem.addData(data: _*)
    q.processAllAvailable()
    // two watermark advances: first moves the watermark past every
    // lastTs+gap, second runs the timeout-firing batch
    mem.addData(Ev(ts(600), 9, "noop", 0.0, 8)); q.processAllAvailable()
    mem.addData(Ev(ts(700), 9, "noop", 0.0, 9)); q.processAllAvailable()
    q.stop()
    val got = spark.table("statesessions").filter($"user_id" =!= 9)
      .select($"user_id", $"session_start", $"n_events", $"sum_value")
      .orderBy("user_id", "session_start").collect().map(_.toSeq).toSeq
    // ground truth: the batch session_window over the same events
    val batch = data.toDF()
      .groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        (sum((round($"value" * 100)).cast("long")) / lit(100.0)).as("sum_value"))
      .select($"user_id", $"session_window.start".as("session_start"),
        $"n_events", $"sum_value")
      .orderBy("user_id", "session_start").collect().map(_.toSeq).toSeq
    assert(got == batch)
    assert(got.length == 3)
  }

  test("stateful as-of join matches the batch operator under out-of-order arrival") {
    import graft.streaming.EventRow
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventsStream.asofStateful(mem.toDF().as[EventRow], "30 minutes")
      .writeStream.format("memory").queryName("asofstream")
      .outputMode(OutputMode.Append()).start()
    // purchase 101 arrives BEFORE the view that precedes it in event
    // time; a naive processing-order join would bind it to view@5
    mem.addData(
      Ev(ts(20), 1, "purchase", 0.0, 101),
      Ev(ts(5), 1, "view", 1.0, 11),
      Ev(ts(35), 1, "view", 3.0, 13),
      Ev(ts(2), 2, "purchase", 0.0, 201))
    q.processAllAvailable()
    // the LATE view@15 is inside the watermark and must win purchase 101
    mem.addData(Ev(ts(15), 1, "view", 2.0, 12), Ev(ts(40), 1, "purchase", 0.0, 102))
    q.processAllAvailable()
    // advance the watermark past everything; second batch fires timeouts
    mem.addData(Ev(ts(600), 9, "view", 0.0, 999)); q.processAllAvailable()
    mem.addData(Ev(ts(700), 9, "view", 0.0, 998)); q.processAllAvailable()
    q.stop()
    val got = spark.table("asofstream")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)), Option(r.get(3))))
      .toSet
    assert(got.size == 3)
    assert(got.contains((101L, 1L, Some(2.0), Some(ts(15).getTime))),
      s"late view must win purchase 101, got $got")
    // ground truth: the BATCH as-of operator over the same rows
    val all = Seq(
      Ev(ts(20), 1, "purchase", 0.0, 101), Ev(ts(5), 1, "view", 1.0, 11),
      Ev(ts(35), 1, "view", 3.0, 13), Ev(ts(2), 2, "purchase", 0.0, 201),
      Ev(ts(15), 1, "view", 2.0, 12), Ev(ts(40), 1, "purchase", 0.0, 102))
    val purchases = all.toDF().filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val views = all.toDF().filter($"event_type" === "view")
      .select($"user_id", $"ts", $"value")
    val batch = graft.operators.AsOfJoin.asofJoin(purchases, views, "user_id", "ts", Seq("value"))
      .select($"event_id", $"user_id", $"asof_value", unix_millis($"asof_ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)), Option(r.get(3))))
      .toSet
    assert(got == batch, s"streamed $got != batch $batch")
  }

  test("as-of watermark boundary: strict flush never strands a purchase at ts == wm (ADVICE r7)") {
    // Spark 4.1 DROPS rows with event time <= watermark in stateful
    // operators (WatermarkSupport.watermarkExpression builds
    // LessThanOrEqual — verified by disassembly), so an equal-boundary
    // view can never arrive and the flush boundary (< vs <=) cannot
    // change ANSWERS on this version. The strict `< wm` flush is the
    // version-robust choice; what this test pins is its LIVENESS: a
    // purchase sitting exactly on the watermark keeps buffering, and
    // the wm+1 timeout clamp still fires it exactly once (an unclamped
    // setTimeoutTimestamp(wm) would throw and kill the query).
    import graft.streaming.EventRow
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventsStream.asofStateful(mem.toDF().as[EventRow], "30 minutes")
      .writeStream.format("memory").queryName("asofboundary")
      .outputMode(OutputMode.Append()).start()
    // batch 1: the purchase, a prior view, and a rider pinning the
    // watermark AT the purchase's event time (60m − 30m delay = ts(30))
    mem.addData(Ev(ts(30), 1, "purchase", 0.0, 301), Ev(ts(10), 1, "view", 7.0, 302),
      Ev(ts(60), 9, "view", 0.0, 900))
    q.processAllAvailable()
    // batch 2: the purchase sits exactly on the watermark — still
    // buffered (strict flush), timeout re-armed at wm+1
    mem.addData(Ev(ts(30), 2, "view", 0.0, 903))
    q.processAllAvailable()
    // watermark advances; the timeout path must flush it exactly once
    mem.addData(Ev(ts(700), 9, "view", 0.0, 999)); q.processAllAvailable()
    mem.addData(Ev(ts(800), 9, "view", 0.0, 998)); q.processAllAvailable()
    q.stop()
    val got = spark.table("asofboundary").filter($"user_id" === 1)
      .collect().map(r => (r.getLong(0), Option(r.get(2)), Option(r.get(3)))).toSeq
    assert(got == Seq((301L, Some(7.0), Some(ts(10).getTime))), s"got $got")
  }

  test("streaming boilerplate scrub: resident index cuts arrivals, equals batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.llmops.Dedup
    val passage = (1 to 20).map(i => s"sg$i").mkString(" ")
    def uniq(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val resident = Seq((1L, s"${uniq("r1", 4)} $passage"),
      (2L, s"${uniq("r2", 4)} $passage")).toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graftscrubgate").toString
    Dedup.residentSpanIndex(spark, root, "g1", resident, "doc_id", "text", 16)
    val scrubbed = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    val mem = MemoryStream[Doc]
    val q = EventsStream.scrubGate(s"$root/g1", mem.toDF(), "doc_id", "text", 16) { out =>
      scrubbed.synchronized {
        scrubbed ++= out.collect().map(r =>
          (r.getLong(0), r.getString(1), r.getLong(2)))
      }
    }
    val arrivals = Seq(
      Doc(ts(1), 100L, s"${uniq("a", 3)} $passage ${uniq("b", 2)}"),
      Doc(ts(2), 101L, uniq("c", 25)))
    mem.addData(arrivals: _*)
    q.processAllAvailable()
    q.stop()
    assert(scrubbed.sortBy(_._1).toSeq == Seq(
      (100L, s"${uniq("a", 3)} ${uniq("b", 2)}", 20L),
      (101L, uniq("c", 25), 0L)))
    // streaming ≡ batch: the same batch through the batch API agrees
    val batchOut = Dedup.scrubSpansIncremental(
        spark.read.parquet(s"$root/g1"),
        arrivals.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"),
        "doc_id", "text", 16)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(batchOut == scrubbed.toSet)
  }

  test("streaming near-dup dedup: signature kernels run incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    // MinHash signature computed by the compiled kernels inside the
    // streaming plan; near-dups collapse on signature equality with
    // watermark-bounded state — the streaming form of dedup_minhash
    val sig = graft.plans.MinHashSig(
      graft.plans.NGramMd5(graft.llmops.TextOps.tokens($"text"), 3, 8),
      graft.llmops.Dedup.permParams(16))
    val q = mem.toDF().withWatermark("ts", "10 minutes")
      .select($"ts", $"doc_id", sig.as("sig"))
      .dropDuplicatesWithinWatermark(Seq("sig"))
      .writeStream.format("memory").queryName("streamdedup")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      Doc(ts(1), 1, "spark streams dedup the corpus fast"),
      Doc(ts(2), 2, "spark streams dedup the corpus fast"), // exact dup → same sig
      Doc(ts(3), 3, "an entirely different document body here"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("streamdedup").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L)) // dup doc 2 suppressed within the horizon
  }

  test("streaming ingest into the persisted store maintains full-text postings") {
    // the streaming → store bridge: foreachBatch lands each microbatch
    // through the SAME validated append sink DML uses, so every store
    // invariant — atomic manifest swap per batch, UNIQUE validation,
    // postings segments per append — holds for streamed data with no
    // extra machinery. (This is the Spark-native shape of continuous
    // ingestion into the reference's store.)
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graftstreamstore").toString
    graft.load.GraphLoader.writeGraph(spark, sfDir, out)
    val mem = MemoryStream[Doc]
    // the main-code bridge (EventsStream.ingestTo) — the spec drives
    // the same entry point a user gets, not an inline composition
    val q = EventsStream.ingestTo(out, mem.toDF()
      .select(($"doc_id" + 3900000L).as("id"), lit("Part").as("label"),
        $"text".as("name")))
    mem.addData(Doc(ts(1), 1L, "streamed widget alpha"),
      Doc(ts(2), 2L, "streamed sprocket beta"))
    q.processAllAvailable()
    mem.addData(Doc(ts(3), 3L, "streamed zzgizmo gamma"))
    q.processAllAvailable()
    q.stop()
    val m = graft.load.Store.readManifest(out)
    val nodes = graft.load.Store.readEntity(spark, out, "nodes")
    assert(nodes.filter($"label" === "Part" && $"id" >= 3900000L).count() == 3)
    // postings followed each microbatch's append (one ft segment per
    // batch that appended rows) and serve the streamed tokens
    val post = graft.load.Store.readFt(spark, out, "nodes", "Part", "name", m).get
    assert(post.filter($"tk" === "streamed").count() == 3)
    assert(post.filter($"tk" === "zzgizmo").count() == 1)
    // and the dialect route sees them through a store-backed graph
    val g = graft.load.GraphLoader.openGraph(spark, out)
    val served = graft.query.ArcadeSql.compile(g, graft.load.GraphLoader.schema,
      "SELECT name FROM Part WHERE name CONTAINSTEXT 'zzgizmo'")
    assert(served.collect().map(_.getString(0)).toSeq == Seq("streamed zzgizmo gamma"))
  }

  test("streaming near-dup gate drops arrivals colliding with earlier batches") {
    implicit val sqlCtx = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("graftgateidx").toString
    val keptRows = scala.collection.mutable.ArrayBuffer[Long]()
    val mem = MemoryStream[Doc]
    val q = EventsStream.neardupGate(idx, mem.toDF(), "doc_id", "text") { kept =>
      keptRows.synchronized {
        keptRows ++= kept.select("doc_id").collect().map(_.getLong(0))
      }
    }
    // batch 1: 2 is an exact dup of 1 (intra-batch star rule)
    mem.addData(
      Doc(ts(1), 1L, "spark streams dedup the corpus fast"),
      Doc(ts(2), 2L, "spark streams dedup the corpus fast"),
      Doc(ts(3), 3L, "an entirely different document body here"))
    q.processAllAvailable()
    assert(keptRows.sorted == Seq(1L, 3L))
    // batch 2: 4 collides with RESIDENT doc 1 (cross-batch, via the
    // persisted index — doc 1's text is never re-read); 5 is new
    mem.addData(
      Doc(ts(4), 4L, "spark streams dedup the corpus fast"),
      Doc(ts(5), 5L, "completely novel fifth arrival text okay"))
    q.processAllAvailable()
    q.stop()
    assert(keptRows.sorted == Seq(1L, 3L, 5L))
    // the index grew by exactly the kept documents' bands (4 each)
    assert(spark.read.parquet(idx).select("doc_id").distinct().count() == 3)
  }

  test("streaming ANN ingest maintains the persisted IVF-PQ index; replays are idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import graft.llmops.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graftanningest").toString
    val base = emb.filter($"vec_id" < 400L) // the sf0.001 table holds 500
    val (cents, books) = Similarity.buildIvfPqIndex(
      base, "vec_id", "embedding", 8, 4, 16, 128, dir, residual = true)
    def rowsOf(lo: Long, hi: Long): Seq[DeconV] = emb
      .filter($"vec_id" >= lo && $"vec_id" < hi)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .collect().map(r => DeconV(r.getLong(0), r.getSeq[Double](1))).toSeq
    val sunk = scala.collection.mutable.ArrayBuffer[Long]()
    val mem = MemoryStream[DeconV]
    val q = EventsStream.annIngestGate(dir, mem.toDF(), "vec_id", "embedding") {
      fresh => sunk.synchronized {
        sunk ++= fresh.select("vec_id").collect().map(_.getLong(0))
      }
    }
    mem.addData(rowsOf(400L, 420L): _*)
    q.processAllAvailable()
    assert(sunk.sorted == (400L until 420L))
    // REPLAYED arrivals (at-least-once) plus genuinely new ones: the
    // anti-join admits only the new ids — nothing delivered twice, and
    // the serve path's duplicate-id refusal never fires
    mem.addData(rowsOf(400L, 420L) ++ rowsOf(420L, 430L): _*)
    q.processAllAvailable()
    q.stop()
    assert(sunk.sorted == (400L until 430L))
    val ids = spark.read.parquet(s"$dir/ids").select("vec_id")
      .collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length && ids.length == 430)
    // the ingested index serves appended ids and EQUALS the in-memory
    // route over the full corpus with the build's frozen quantizers
    val qids = Seq(0L, 405L, 425L)
    val cold = Similarity.ivfPqIndexTopK(spark, dir, qids, 2, 10)
    val warm = Similarity.ivfPqResidualTopKWith(
      emb.filter($"vec_id" < 430L), "vec_id", "embedding", cents, books,
      2, qids, 10)
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select($"qid", $"nn", $"rank", round($"cos", 6).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(shape(cold) == shape(warm))
  }

  test("quality gate runs unchanged under streaming and equals batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.llmops.Pipeline
    val rules = Pipeline.GateRules(3, 100, 0.0, 0.2, 0.9)
    val docs = Seq(
      Doc(ts(1), 1L, "the quick brown fox jumps over a lazy dog today"),
      Doc(ts(2), 2L, "a b"), // too_short
      Doc(ts(3), 3L, "x x x x x x x x x x x x")) // low_ttr + repetitive
    def gate(df: org.apache.spark.sql.DataFrame) =
      Pipeline.qualityGate(df.withColumn("lang", lit("en")), "doc_id", "text", "lang", rules)
    val mem = MemoryStream[Doc]
    val q = gate(mem.toDF()).writeStream.format("memory").queryName("qgate")
      .outputMode(OutputMode.Append()).start()
    mem.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("qgate").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getBoolean(3))).toSet
    val batch = gate(docs.toDF()).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getBoolean(3))).toSet
    assert(streamed == batch)
    assert(streamed.exists { case (id, reasons, keep) => id == 2L && reasons.contains("too_short") && !keep })
  }

  test("entropy gate is stateless: streaming equals batch, flood gated out") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      Doc(ts(1), 1L, "The quick brown fox jumps over the lazy dog."),
      Doc(ts(2), 2L, "aaaaaaaaaaaaaaaaaaaaaaaa")) // 0-bit flood
    def gate(df: org.apache.spark.sql.DataFrame) =
      graft.llmops.TextOps.entropyGate(df, "doc_id", "text", 2.0, 5.5)
    val mem = MemoryStream[Doc]
    val q = gate(mem.toDF()).writeStream.format("memory").queryName("egate")
      .outputMode(OutputMode.Append()).start()
    mem.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("egate").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3))).toSet
    val batch = gate(docs.toDF()).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3))).toSet
    assert(streamed == batch)
    assert(streamed.exists { case (id, e, keep) => id == 2L && e == 0.0 && !keep })
    assert(streamed.exists { case (id, _, keep) => id == 1L && keep })
  }

  test("source-mix monitor: windowed shares + drift match batch, absent source visible") {
    implicit val sqlCtx = spark.sqlContext
    val targets = Map("web" -> 0.6, "books" -> 0.4)
    // window 1 (minutes 0-10): web 8 tokens, forum 4 — books ABSENT
    // (its target-0.4 row must still appear, drifted); forum is
    // outside the target mix and pools into __other
    val docs = Seq(
      SrcDoc(ts(1), 1L, "web", "a b c d e f g h"),
      SrcDoc(ts(3), 2L, "forum", "x y z w"),
      // window 2 (minutes 10-20): web 6, books 4 — shares 0.6/0.4, no drift
      SrcDoc(ts(11), 3L, "web", "a b c d e f"),
      SrcDoc(ts(12), 4L, "books", "p q r s"))
    def mon(df: org.apache.spark.sql.DataFrame) =
      EventsStream.mixMonitor(df, "ts", "source", "text",
        targets, "10 minutes", "15 minutes", 0.1)
    val mem = MemoryStream[SrcDoc]
    val q = mon(mem.toDF()).writeStream.format("memory").queryName("mixmon")
      .outputMode(OutputMode.Append()).start()
    mem.addData(docs: _*)
    q.processAllAvailable()
    mem.addData(SrcDoc(ts(120), 9L, "web", "noop")) // close the windows
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5))
    val streamed = spark.table("mixmon")
      .filter($"w_start" < ts(100)).collect().map(key).toSet
    val batch = mon(docs.toDF()).collect().map(key).toSet
    assert(streamed == batch)
    // window 1: web share 8/12, books 0 (drifted), __other 4/12 (drifted)
    val w1 = streamed.filter(_._1 == new Timestamp(1704067200000L))
    assert(w1.exists(r => r._2 == "web" && r._4 == 0.666667 && !r._6))
    assert(w1.exists(r => r._2 == "books" && r._3 == 0L && r._4 == 0.0 && r._6))
    assert(w1.exists(r => r._2 == "__other" && r._4 == 0.333333 && r._6))
    // window 2: exactly on target — nothing drifts
    val w2 = streamed.filter(_._1 == new Timestamp(1704067200000L + 600000L))
    assert(w2.size == 3 && w2.forall(r =>
      (r._2 == "__other" && r._3 == 0L) || !r._6))
  }

  test("semantic decon gate is stateless: streaming equals batch, flags the plant") {
    implicit val sqlCtx = spark.sqlContext
    val benchmark = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0))
    val rows = Seq(
      DeconV(1L, Seq(1.0, 0.0, 0.0)),  // = benchmark[0] → contaminated, cos 1
      DeconV(2L, Seq(0.0, 0.0, 1.0)),  // orthogonal to both → clean
      DeconV(3L, Seq(0.1, 0.99, 0.0))) // near benchmark[1] → contaminated
    def gate(df: org.apache.spark.sql.DataFrame) =
      EventsStream.deconGate(df, benchmark, "embedding", 0.9)
    val mem = MemoryStream[DeconV]
    val q = gate(mem.toDF()).writeStream.format("memory").queryName("dgate")
      .outputMode(OutputMode.Append()).start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    def shape(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("vec_id"), r.getAs[Boolean]("contaminated"),
        Option(r.getAs[java.lang.Double]("max_cos")).map(_.toDouble))
    val streamed = spark.table("dgate").collect().map(shape(_)).toSet
    val batch = gate(rows.toDF()).collect().map(shape(_)).toSet
    assert(streamed == batch)
    assert(streamed.collect { case (id, true, _) => id } == Set(1L, 3L))
    assert(streamed.exists { case (1L, _, cos) => cos.contains(1.0); case _ => false })
  }

  test("bloom decon gate is stateless: streaming equals batch, flags the plant") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // benchmark: one 12-token doc; bitmap built ONCE (the serving shape)
    val evalD = Seq((100L, (1 to 12).map(i => s"e$i").mkString(" ")))
      .toDF("doc_id", "text")
    val words = graft.llmops.Pipeline.bloomWords(evalD, "text", 8, 1 << 12, 4)
    val rows = Seq(
      Doc(new java.sql.Timestamp(0L), 1L,
        "x1 x2 " + (2 to 11).map(i => s"e$i").mkString(" ")), // shares 8-grams
      Doc(new java.sql.Timestamp(0L), 2L,
        (1 to 20).map(i => s"z$i").mkString(" ")))            // clean
    def gate(df: org.apache.spark.sql.DataFrame) =
      EventsStream.bloomGate(df, words, 1 << 12, 4, "text", 8)
    val mem = MemoryStream[Doc]
    val q = gate(mem.toDF()).writeStream.format("memory").queryName("bgate")
      .outputMode(OutputMode.Append()).start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    def shape(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_hits"),
        r.getAs[Boolean]("contaminated"))
    val streamed = spark.table("bgate").collect().map(shape(_)).toSet
    val batch = gate(rows.toDF()).collect().map(shape(_)).toSet
    assert(streamed == batch)
    assert(streamed.collect { case (id, _, true) => id } == Set(1L))
    // doc 1 embeds e2..e11 verbatim → ≥ 3 of its colliding 8-grams hit
    assert(streamed.exists { case (1L, h, _) => h >= 3; case _ => false })
  }

  test("ppl gate is stateless: streaming equals batch, gibberish gated out") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // reference: a tiny in-domain "language"; model built ONCE
    val ref = Seq.tabulate(20)(i => (1000L + i, "the cat sat here and " +
      "the cat sat here and the cat sat here")).toDF("doc_id", "text")
    val model = graft.llmops.Pipeline.lmModel(ref, "text", 512, 256)
    val rows = Seq(
      Doc(new java.sql.Timestamp(0L), 1L, "the cat sat here and the cat sat"),
      Doc(new java.sql.Timestamp(0L), 2L, "zq wq vq kq jq xq qq pq mq nq"),
      Doc(new java.sql.Timestamp(0L), 3L, "solo")) // unscorable
    def gate(df: org.apache.spark.sql.DataFrame) =
      EventsStream.pplGate(df, model, "text", tau = 3.0)
    val mem = MemoryStream[Doc]
    val q = gate(mem.toDF()).writeStream.format("memory").queryName("pgate")
      .outputMode(OutputMode.Append()).start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    def shape(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_scored"),
        Option(r.getAs[Any]("xent")), r.getAs[Boolean]("keep"))
    val streamed = spark.table("pgate").collect().map(shape(_)).toSet
    val batch = gate(rows.toDF()).collect().map(shape(_)).toSet
    assert(streamed == batch)
    // in-domain doc keeps; gibberish and the unscorable doc gate out
    assert(streamed.collect { case (id, _, _, true) => id } == Set(1L))
    assert(streamed.exists { case (3L, 0L, None, false) => true; case _ => false })
  }

  test("nb gate is stateless: streaming equals batch AND the declarative classifier") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // train on a separable seed (the nbClassifier fixture), serve the gate
    val seed = Seq(
      (1L, "aa bb aa", 1), (2L, "aa aa bb bb", 1),
      (3L, "cc dd cc", 0), (4L, "cc dd dd dd", 0)).toDF("doc_id", "text", "y")
    val (vocab, prior) = graft.llmops.Pipeline.nbModel(seed, "text", $"y" === 1, 4)
    val rows = Seq(
      Doc(new java.sql.Timestamp(0L), 10L, "aa bb"),   // positive-speak
      Doc(new java.sql.Timestamp(0L), 11L, "cc dd dd"), // negative-speak
      Doc(new java.sql.Timestamp(0L), 12L, ""),         // prior-only
      Doc(new java.sql.Timestamp(0L), 13L, "zz zz"))    // all-OOV
    def gate(df: org.apache.spark.sql.DataFrame) =
      EventsStream.nbGate(df, vocab, prior, "text")
    val mem = MemoryStream[Doc]
    val q = gate(mem.toDF()).writeStream.format("memory").queryName("ngate")
      .outputMode(OutputMode.Append()).start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    def shape(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_scored"),
        r.getAs[Double]("score"), r.getAs[Boolean]("keep"))
    val streamed = spark.table("ngate").collect().map(shape(_)).toSet
    val batch = gate(rows.toDF()).collect().map(shape(_)).toSet
    assert(streamed == batch)
    assert(streamed.collect { case (id, _, _, true) => id } == Set(10L))
    // prior-only rows: zero scored tokens, score = round(prior, 4)
    val p4 = math.rint(prior * 1e4) / 1e4
    assert(streamed.exists { case (12L, 0L, s, _) => s == p4; case _ => false })
    assert(streamed.exists { case (13L, 0L, s, _) => s == p4; case _ => false })
    // kernel scores agree with the DECLARATIVE classifier on the seed
    val kern = gate(seed.select($"doc_id", $"text",
        lit(new java.sql.Timestamp(0L)).as("ts")))
      .select($"doc_id", $"n_scored", $"score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val decl = graft.llmops.Pipeline.nbClassifier(seed, "doc_id", "text", $"y" === 1, 4)
      .select($"doc_id", $"n_scored", $"score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(kern == decl)
  }

  test("drift monitor: shifted window flags, matching window scores 0, streaming == batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.EventsStream
    // reference: 50/50 mass in buckets 0 and 1 (width 40, lattice 3)
    val ref = Seq(50L, 50L, 0L)
    // window A (minutes 0-9): values 10 and 50 evenly — matches ref;
    // window B (minutes 10-19): all values 90 — total shift
    val evs = (1 to 20).map(i => Ev(ts(i % 10), 1, "m",
        if (i % 2 == 0) 10.0 else 50.0, i)) ++
      (21 to 40).map(i => Ev(ts(10 + i % 10), 1, "m", 90.0, i))
    def run(df: org.apache.spark.sql.DataFrame) =
      EventsStream.driftMonitor(df, "ts", col("value"), 0L, 40L, 3, ref, 0.1)
    val mem = MemoryStream[Ev]
    val q = run(mem.toDF()).writeStream.format("memory").queryName("drift")
      .outputMode(OutputMode.Append()).start()
    mem.addData(evs: _*)
    q.processAllAvailable()
    mem.addData(Ev(ts(600), 9, "m", 10.0, 999)); q.processAllAvailable()
    mem.addData(Ev(ts(700), 9, "m", 10.0, 998)); q.processAllAvailable()
    q.stop()
    def shape(r: org.apache.spark.sql.Row) =
      (r.getLong(1), r.getDouble(2), r.getBoolean(3))
    val streamed = spark.table("drift").collect().map(shape(_))
      .filter(_._1 >= 10) // drop the watermark-rider windows
      .toSet
    // A: 10+10 values matching ref exactly → ks 0; B: 20 values all in
    // bucket 2 → max |cumWin·100 − cumRef·20| peaks at b=1:
    // |0 − 100·20| = 2000 → ks = 2000/(20·100) = 1.0 (total shift)
    assert(streamed == Set((20L, 0.0, false), (20L, 1.0, true)), streamed.toString)
    // streaming equals the same plan run as batch
    val batch = run(evs.toDF()).collect().map(shape(_)).toSet
    assert(streamed == batch)
  }

  test("stateful attribution matches the batch operator under out-of-order arrival") {
    import graft.streaming.EventRow
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // lookback 10 minutes
    val q = EventsStream.attributionStateful(mem.toDF().as[EventRow],
        600000L, "30 minutes")
      .writeStream.format("memory").queryName("attrstream")
      .outputMode(OutputMode.Append()).start()
    // purchase@20 arrives before its true touches (late but inside the
    // watermark); lookback 10 min from minute 20 → [10, 20], so view@5
    // is OUTSIDE; click@15 is first, view@18 last; user 2 has no touch
    mem.addData(
      Ev(ts(20), 1, "purchase", 0.0, 101),
      Ev(ts(5), 1, "view", 1.0, 11),
      Ev(ts(2), 2, "purchase", 0.0, 201))
    q.processAllAvailable()
    mem.addData(Ev(ts(15), 1, "click", 0.0, 12), Ev(ts(18), 1, "view", 0.0, 13))
    q.processAllAvailable()
    // advance the watermark far past everything; timeouts flush
    mem.addData(Ev(ts(600), 9, "view", 0.0, 999)); q.processAllAvailable()
    mem.addData(Ev(ts(700), 9, "view", 0.0, 998)); q.processAllAvailable()
    q.stop()
    def shape(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), Option(r.get(3)), Option(r.get(4)),
        Option(r.get(5)), Option(r.get(6)), r.getBoolean(7))
    val got = spark.table("attrstream").collect().map(shape(_)).toSet
    assert(got.size == 2)
    // purchase 101: last = view@18, first = click@15 (view@5 outside)
    assert(got.contains((101L, 1L, Some("view"), Some(ts(18).getTime),
      Some("click"), Some(ts(15).getTime), true)), got.toString)
    assert(got.contains((201L, 2L, None, None, None, None, false)))
    // ground truth: the BATCH operator over the same rows (µs ↔ ms)
    val all = Seq(
      Ev(ts(20), 1, "purchase", 0.0, 101), Ev(ts(5), 1, "view", 1.0, 11),
      Ev(ts(2), 2, "purchase", 0.0, 201), Ev(ts(15), 1, "click", 0.0, 12),
      Ev(ts(18), 1, "view", 0.0, 13))
    val batch = graft.operators.Attribution.attribute(all.toDF(),
        "user_id", "ts", "event_id",
        col("event_type").isin("view", "click"),
        col("event_type") === "purchase", 600000000L)
      .select($"event_id", $"user_id", $"last_type", $"last_us",
        $"first_type", $"first_us", $"attributed")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)),
        Option(r.get(3)).map(_.asInstanceOf[Long] / 1000),
        Option(r.get(4)), Option(r.get(5)).map(_.asInstanceOf[Long] / 1000),
        r.getBoolean(6))).toSet
    assert(got == batch, s"streamed $got != batch $batch")
  }

  test("session windows merge events within the gap (streaming)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventsStream.sessionize(mem.toDF())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      Ev(ts(0), 1, "a", 1.0, 1), Ev(ts(10), 1, "a", 1.0, 2),  // session 1
      Ev(ts(60), 1, "a", 1.0, 3),                             // session 2
      Ev(ts(300), 9, "noop", 0.0, 9))                         // close watermark
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sessions").filter($"user_id" === 1)
      .orderBy("session_start").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n_events") == 2)
    assert(rows(1).getAs[Long]("n_events") == 1)
  }

  test("stratifiedSample runs unchanged under streaming and equals batch") {
    // the sampler is a pure id-hash predicate (stateless by design —
    // the rerun-stability contract), so the SAME plan streams: the
    // deconGate/bloomGate pattern, asserted end-to-end
    implicit val sqlCtx = spark.sqlContext
    import graft.llmops.Pipeline
    val docs = (1L to 40L).map(i =>
      Doc(ts(i.toInt), i, if (i % 2 == 0) s"even doc $i" else s"odd doc $i"))
    def sample(df: org.apache.spark.sql.DataFrame) =
      Pipeline.stratifiedSample(
        df.withColumn("lang", when($"doc_id" % 2 === 0, "en").otherwise("fr")),
        "doc_id", "lang", Map("en" -> 60), 20, "graft_mix_")
    val mem = MemoryStream[Doc]
    val q = sample(mem.toDF()).writeStream.format("memory").queryName("ssample")
      .outputMode(OutputMode.Append()).start()
    mem.addData(docs.take(20): _*)
    q.processAllAvailable()
    mem.addData(docs.drop(20): _*) // second batch: same rule, no state
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ssample").select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    val batch = sample(docs.toDF()).select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(streamed == batch && batch.nonEmpty)
  }

  test("stream-static enrichment joins the dimension incrementally and equals batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "acme"), (2L, "globex")).toDF("cust_id", "cust_name")
    def enrich(df: org.apache.spark.sql.DataFrame) =
      df.join(broadcast(dim), $"user_id" === $"cust_id")
        .select($"event_id", $"cust_name", $"value")
    val evs = Seq(Ev(ts(1), 1, "view", 1.5, 1), Ev(ts(2), 2, "view", 2.5, 2),
      Ev(ts(3), 7, "view", 9.0, 3)) // user 7 has no dimension row → dropped
    val mem = MemoryStream[Ev]
    val q = enrich(mem.toDF()).writeStream.format("memory").queryName("enrich")
      .outputMode(OutputMode.Append()).start()
    mem.addData(evs.take(2): _*); q.processAllAvailable()
    mem.addData(evs.drop(2): _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("enrich").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val batch = enrich(evs.toDF()).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(streamed == batch)
    assert(streamed == Set((1L, "acme", 1.5), (2L, "globex", 2.5)))
  }

  test("anomaly gate flags a volume burst under streaming") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // trained moments: ~2 events/min, sd 1 → a 30-event minute is z=28
    val q = EventsStream.anomalyGate(mem.toDF(), mu = 2.0, sigma = 1.0)
      .writeStream.format("memory").queryName("agate")
      .outputMode(OutputMode.Append()).start()
    val calm = (1 to 4).map(m => Ev(ts(m), m.toLong, "view", 0, m.toLong))
    val burst = (1 to 30).map(i => Ev(ts(10), 100L + i, "view", 0, 100L + i))
    mem.addData(calm ++ burst: _*)
    mem.addData(Ev(ts(600), 9, "noop", 0, 999)) // advance the watermark
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("agate")
      .select(col("window.start").cast("long").as("w"), col("n"), col("anomaly"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val flagged = rows.filter(_._3)
    assert(flagged.length == 1 && flagged(0)._2 == 30L, rows.mkString(","))
    assert(rows.count(!_._3) >= 4) // the calm minutes pass
  }

  test("stateful funnel matches the batch operator under out-of-order arrival") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      // user 1 completes all three — the click arrives OUT OF ORDER
      // (later batch, earlier ts, within watermark)
      Ev(ts(0), 1, "view", 0, 1), Ev(ts(40), 1, "purchase", 0, 3),
      // user 2: click before any view — must not advance past view
      Ev(ts(0), 2, "click", 0, 4), Ev(ts(5), 2, "view", 0, 5),
      // user 5: click at the same ts as the view — strict > says no
      Ev(ts(10), 5, "view", 0, 6), Ev(ts(10), 5, "click", 0, 7))
    val late = Ev(ts(20), 1, "click", 0, 2) // user 1's out-of-order click
    val stages = Seq("view", "click", "purchase")
    val mem = MemoryStream[Ev]
    val q = EventsStream.funnelStateful(mem.toDF().as[EventRow], stages)
      .writeStream.format("memory").queryName("sfunnel")
      .outputMode(OutputMode.Append()).start()
    mem.addData(data: _*)
    q.processAllAvailable()
    mem.addData(late); q.processAllAvailable()
    // advance the watermark far enough to flush every buffered event
    mem.addData(Ev(ts(600), 9, "view", 0, 8)); q.processAllAvailable()
    mem.addData(Ev(ts(700), 9, "view", 0, 9)); q.processAllAvailable()
    q.stop()
    val got = spark.table("sfunnel").filter($"user_id" =!= 9)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // furthest stage per user ≡ the batch operator on the same events
    val batch = graft.operators.Funnel.funnel(
        (data :+ late).toDF(), "user_id", "ts", stages.map(s => s -> ($"event_type" === s)))
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    val furthest = got.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).max }
    assert(furthest == batch, s"streaming $furthest vs batch $batch")
    assert(batch == Map(1L -> 3, 2L -> 1, 5L -> 1))
    // every intermediate advance was emitted exactly once, in order
    assert(got.filter(_._1 == 1L).map(_._2).sorted.toSeq == Seq(1, 2, 3))
  }

  test("stateful funnel: idle state expires on the TTL and the funnel restarts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // 2-minute idle TTL: user 1's half-done funnel expires while idle,
    // so a later view RE-EMITS stage 1 (fresh state) — the observable
    // proof the per-user times were dropped, not retained forever
    val q = EventsStream.funnelStateful(mem.toDF().as[EventRow],
        Seq("view", "click"), watermark = "1 minute", idleTtlMs = 2 * 60000L)
      .writeStream.format("memory").queryName("sfunnel_ttl")
      .outputMode(OutputMode.Append()).start()
    mem.addData(Ev(ts(0), 1, "view", 0, 1)); q.processAllAvailable()
    // idle: push the watermark far past lastMs + TTL (timeout fires)
    mem.addData(Ev(ts(100), 9, "view", 0, 2)); q.processAllAvailable()
    mem.addData(Ev(ts(200), 9, "view", 0, 3)); q.processAllAvailable()
    // user 1 returns: a fresh stage-1 advance proves the restart
    mem.addData(Ev(ts(300), 1, "view", 0, 4)); q.processAllAvailable()
    mem.addData(Ev(ts(400), 9, "view", 0, 5)); q.processAllAvailable()
    mem.addData(Ev(ts(500), 9, "view", 0, 6)); q.processAllAvailable()
    q.stop()
    val u1 = spark.table("sfunnel_ttl").filter($"user_id" === 1)
      .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._2)
    assert(u1.map(_._1).toSeq == Seq(1, 1), s"got ${u1.toSeq}")
  }

  test("quotaGate: first arrivals hold their admission across batches; cap enforced") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[QuotaDoc]
    val q = EventsStream.quotaGate(mem.toDS(), cap = 2)
      .writeStream.format("memory").queryName("quota")
      .outputMode(OutputMode.Append()).start()
    // batch 1: three src-a docs (unsorted arrival) + one src-b
    mem.addData(QuotaDoc(7L, "a"), QuotaDoc(3L, "a"), QuotaDoc(9L, "a"),
      QuotaDoc(1L, "b"))
    q.processAllAvailable()
    val b1 = spark.table("quota").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // within the batch, smallest ids win the quota; 9 is rejected
    assert(b1 == Set((3L, "a", 1L), (7L, "a", 2L), (1L, "b", 1L)), s"got $b1")
    // batch 2: src-a is FULL — even a smaller id (2) is refused (early
    // arrivals hold their admission); src-b admits one more, then closes
    mem.addData(QuotaDoc(2L, "a"), QuotaDoc(8L, "b"), QuotaDoc(4L, "b"))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("quota").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(all == b1 ++ Set((4L, "b", 2L)), s"got $all")
    // single-batch twin: the quota over one batch is the first-cap-by-id
    // rank — the degenerate-stream ≡ batch check
    val batch = Seq(QuotaDoc(7L, "a"), QuotaDoc(3L, "a"), QuotaDoc(9L, "a"),
      QuotaDoc(1L, "b")).toDS()
    val one = EventsStream.quotaGate(batch, cap = 2).collect()
      .map(r => (r.doc_id, r.source, r.qrank)).toSet
    assert(one == b1)
  }

  test("composed refresh gate: gate→scrub→neardup→bloom→quota, streaming ≡ batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.llmops.{Pipeline, Refresh}
    val rules = Pipeline.GateRules(minTokens = 5, maxTokens = 10000,
      minStopRatio = 0.0, minTtr = 0.0, maxDupTrigram = 1.0)
    def en(b: String) = s"the story of $b and the end of it all"
    val resident = Seq(
      (1L, en("a quiet village in the north where rivers meet the sea")),
      // 2 and 3 share a long passage → the epoch's span authority
      (2L, en("chapter one all rights reserved printed in the year of the press edition") + " tail two"),
      (3L, en("chapter one all rights reserved printed in the year of the press edition") + " tail three"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("seq", col("doc_id"))
    val benchmark = Seq(
      (100L, en("the secret benchmark passage about the seven bridges of the river city")))
      .toDF("doc_id", "text")
    val cacheRoot = java.nio.file.Files.createTempDirectory("refresh-gate").toString
    val epoch = Refresh.buildEpoch(spark, cacheRoot, "se1", resident, benchmark,
      "doc_id", "seq", "text", "lang", rules,
      windowTokens = 8, numPerms = 16, bands = 4, bloomN = 8)

    // every stage gets a planted arrival; quota cap 2 per source
    val arrivals = Seq(
      RefDoc(20L, en("a quiet village in the north where rivers meet the sea"), "en", "a", 20L), // resident dup → star drop
      RefDoc(21L, en("a baker whose ovens warm the street before the sun is up"), "en", "a", 21L), // keep (a #1)
      RefDoc(22L, en("a baker whose ovens warm the street before the sun is up"), "en", "a", 22L), // intra-batch dup → drop
      RefDoc(23L, "notes on " + en("the secret benchmark passage about the seven bridges of the river city"), "en", "a", 23L), // Bloom → drop
      RefDoc(24L, "tiny doc", "en", "b", 24L), // gate → drop
      RefDoc(25L, en("chapter one all rights reserved printed in the year of the press edition") + " a genuinely new ending about the glassblower and the furnace", "en", "b", 25L), // span cut, keep (b #1)
      RefDoc(26L, en("a cartographer who maps the coast from a rowing boat in the fog"), "en", "a", 26L), // keep (a #2)
      RefDoc(27L, en("a baker whose ovens warm the street before the sun is up"), "en", "b", 27L), // CROSS-BATCH dup of 21 → delta drop
      RefDoc(28L, en("a glazier who sets the coloured windows of the winter chapel"), "en", "a", 28L), // survives stages, quota a full → drop
      RefDoc(29L, en("a printer who sets the morning news by lamplight in the cellar"), "en", "b", 29L)) // keep (b #2)

    // `gates` is a list of GATE INSTANCES, each fed its own batches over
    // the SAME deltaDir — instance boundaries model a gate restart (the
    // persisted star/quota state must carry across; batch ids restart
    // at 0 in the new instance, so per-instance state dirs are load-bearing)
    def run(gates: Seq[Seq[Seq[RefDoc]]]): Set[(Long, String)] = {
      val deltaDir = java.nio.file.Files.createTempDirectory("refresh-delta").toString
      val got = scala.collection.mutable.ArrayBuffer[(Long, String)]()
      gates.foreach { batches =>
        val mem = MemoryStream[RefDoc]
        val q = EventsStream.refreshGate(epoch, deltaDir, mem.toDF(),
          "doc_id", "seq", "text", "lang", quota = Some(("source", 2))) { kept =>
          got.synchronized {
            got ++= kept.select("doc_id", "text").collect()
              .map(r => (r.getLong(0), r.getString(1)))
          }
        }
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        q.stop()
      }
      got.toSet
    }

    // batch twin: ONE Refresh.process over all arrivals + the quota once
    // (cap smallest-seq kept per source — the gate's declared semantics)
    val kept = Refresh.process(epoch, arrivals.toDF(),
      "doc_id", "seq", "text", "lang")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"seq")
    val twin = kept.withColumn("rk", row_number().over(w)).filter($"rk" <= 2)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

    // three seq-ordered micro-batches ≡ the batch twin, doc-for-doc
    val streamed = run(Seq(Seq(arrivals.take(4), arrivals.slice(4, 7), arrivals.drop(7))))
    assert(streamed === twin, s"streaming ≠ batch: $streamed vs $twin")
    // the planted verdicts, by name
    assert(streamed.map(_._1) === Set(21L, 25L, 26L, 29L))
    val t25 = streamed.find(_._1 == 25L).get._2
    assert(t25.contains("glassblower") && !t25.contains("rights reserved"),
      s"arrival span cut wrong: $t25")
    // slicing invariance: the same arrivals as ONE batch, same answer
    assert(run(Seq(Seq(arrivals))) === twin)
    // restart continuity: stop after two batches, bring up a FRESH gate
    // on the same deltaDir for the rest — cross-batch dup 27 and the
    // source-a quota (21+26 fill it before 28) must still resolve
    // through the PERSISTED state, and the new instance's batch ids
    // (restarting at 0) must not clobber the predecessor's
    assert(run(Seq(Seq(arrivals.take(4), arrivals.slice(4, 7)),
      Seq(arrivals.drop(7)))) === twin)
  }
}
