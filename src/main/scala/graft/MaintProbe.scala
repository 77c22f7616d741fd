package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.load.{GraphLoader, Store}

/** ×100 posture probe for the store MAINTENANCE paths (VERDICT r8
  * order #5): on a FULL_TEXT-indexed label at the ×100 documents probe,
  * measure (a) `BACKUP DATABASE` wall time, and (b) two DML appends —
  * asserting that postings maintenance builds ONE segment per append
  * from the APPENDED rows only and never rewrites an existing
  * generation (old gen files must remain bit-for-bit untouched: the
  * probe records their paths and mtimes and re-checks after both
  * appends). The append is measured against a BACKUP CLONE of the doc
  * store so the bench's cached store stays pristine.
  *
  * Prints one JSON line for BASELINE.md. Run:
  * `SPARK_GRAFT_SF_DIR=target/probe100 sbt "runMain graft.MaintProbe"`.
  */
object MaintProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    // section filter, the GraphProbe discipline: default = all
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY").map(_.split(",").toSet)
    def want(s: String): Boolean = only.forall(_.contains(s))

    // ── CHECK DATABASE FIX at scale (r17, VERDICT r16 order #6) ──
    // The repair path's 100 TB statement: damage is diagnosed by a
    // GATED report (no row scans over a manifest pointing at deleted
    // files), and the repair cost splits into (a) one edge-scan-sized
    // dangling probe (two anti-joins — O(edges), no rewrite) and
    // (b) rewrites bounded to the AFFECTED labels only. The store is
    // built through the same validated bulk-load path
    // ([[GraphLoader.writeGraphFrom]]) with a scale-parametric shape —
    // the TPC-H fixture loader's fixed per-label offsets loudly refuse
    // ×100 key spans (the documented keyspace bound), and the probe
    // needs ONE comparable shape at every scale anyway: Doc nodes
    // (corpus-scale, FULL_TEXT on text), Topic nodes (config-scale),
    // HAS_TOPIC doc→topic (the label the damage dangles), and SIMILAR
    // doc→doc at 20 edges/doc — the BULK of the store, which must come
    // through bit-for-bit untouched (mtime-checked). Lost Topic
    // generation + lost Doc/text postings generation are the inflicted
    // damage; one atomic manifest commit repairs both.
    if (want("fix")) {
      val gdir = s"target/fixprobe-${java.util.UUID.randomUUID().toString.take(8)}"
      def fsecs(t0: Long): Double = (System.nanoTime() - t0) / 1e9
      try {
        import org.apache.spark.sql.types.{StringType, StructField, StructType}
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id").cast(LongType).as("id"),
            lit("Doc").as("label"), col("text"), col("lang"))
        val nDocs = docs.agg(max(col("id"))).head.getLong(0) + 1
        val topicOff = 800000000L
        val nTopics = math.min(5000L, nDocs)
        val topics = spark.range(nTopics)
          .select((col("id") + topicOff).as("id"), lit("Topic").as("label"),
            concat(lit("t"), col("id")).as("name"))
        val nodes = docs.unionByName(topics, allowMissingColumns = true)
        val hasTopic = docs.select(col("id").as("src"),
          (pmod(col("id"), lit(nTopics)) + topicOff).as("dst"),
          lit("HAS_TOPIC").as("label"))
        val similar = docs
          .select(col("id").as("src"),
            explode(sequence(lit(0L), lit(19L))).as("k"))
          .select(col("src"),
            pmod(col("src") * lit(1000003L) + col("k") * lit(7919L),
              lit(nDocs)).as("dst"),
            lit("SIMILAR").as("label"))
        val edgesIn = hasTopic.unionByName(similar)
        def st(fields: (String, org.apache.spark.sql.types.DataType)*) =
          StructType(fields.map { case (nm, t) => StructField(nm, t) })
        val gs = graft.model.GraphSchema(
          labels = Seq(
            graft.model.LabelSchema("Doc", "vertex",
              st("text" -> StringType, "lang" -> StringType)),
            graft.model.LabelSchema("Topic", "vertex", st("name" -> StringType)),
            graft.model.LabelSchema("HAS_TOPIC", "edge", st()),
            graft.model.LabelSchema("SIMILAR", "edge", st())),
          indexes = Seq(graft.model.IndexDesc("node", "Doc", "text",
            unique = false, isArray = false, fulltext = true)))
        val tl = System.nanoTime()
        GraphLoader.writeGraphFrom(spark, gdir, nodes, edgesIn, gs, sfDir)
        val loadSec = fsecs(tl)
        def treeBytes(sub: String): Long = {
          import scala.jdk.CollectionConverters._
          val root = java.nio.file.Paths.get(gdir, sub)
          if (!java.nio.file.Files.isDirectory(root)) 0L
          else {
            val w = java.nio.file.Files.walk(root)
            try w.iterator().asScala
              .filter(java.nio.file.Files.isRegularFile(_))
              .map(java.nio.file.Files.size(_)).sum
            finally w.close()
          }
        }
        val totalBytes = treeBytes("")
        val m0 = Store.readManifest(gdir)
        val nEdges = Store.readEntity(spark, gdir, "edges").count()
        // pre-damage baseline: on REPLICATED probe data the natural
        // keys repeat across copies, so CHECK legitimately reports
        // UNIQUE violations on a healthy store — FIX repairs damage
        // classes, never data-quality classes (by design), so the
        // clean criterion is "back to the pre-damage report", not zero
        val tb0 = System.nanoTime()
        val baselineIssues =
          graft.server.Dml.executeReturning(spark, gdir, "CHECK DATABASE").count
        val checkHealthySec = fsecs(tb0)
        // inflict the damage classes of the e2e corrupt test (CliSpec
        // r16) on the BIG store: lost node generation (Topic →
        // HAS_TOPIC dangles), lost postings generation (Doc/text)
        val topicGen = Store.genPathsOf(gdir, m0)
          .find(_.contains("/nodes/Topic/")).get
        val ftGen = Store.genPathsOf(gdir, m0)
          .find(_.contains("/ft/nodes/Doc/text/")).get
        Store.tryDeleteRecursively(java.nio.file.Paths.get(topicGen))
        Store.tryDeleteRecursively(java.nio.file.Paths.get(ftGen))
        // every generation file OUTSIDE the two labels FIX may rewrite
        // must survive bit-for-bit (rewrite-boundedness, the probe's
        // core claim — CONTAINS alone is ~the whole store here)
        def genFiles(): Map[String, Long] = {
          import scala.jdk.CollectionConverters._
          val w = java.nio.file.Files.walk(java.nio.file.Paths.get(gdir))
          try w.iterator().asScala
            .filter(p => java.nio.file.Files.isRegularFile(p) &&
              p.toString.contains("gen-") &&
              !p.toString.contains("/edges/HAS_TOPIC/") &&
              !p.toString.contains("/ft/nodes/Doc/text/"))
            .map(p => p.toString ->
              java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
          finally w.close()
        }
        val before = genFiles()
        val tc = System.nanoTime()
        val damaged = graft.server.Dml.executeReturning(spark, gdir, "CHECK DATABASE")
        val checkDamagedSec = fsecs(tc)
        // the damaged report GATES on the lost generations (no row
        // scans → data-quality classes absent), so its count is not
        // comparable to the baseline — assert the damage CLASS showed
        require(damaged.returned.exists(_.exists(
            _.contains("\"check\":\"missing_generation\""))),
          "damaged store must report its missing generations")
        val tf = System.nanoTime()
        val fixes = GraphLoader.fixStore(spark, gdir)
        val fixSec = fsecs(tf)
        val tr = System.nanoTime()
        val clean = graft.server.Dml.executeReturning(spark, gdir, "CHECK DATABASE")
        val recheckSec = fsecs(tr)
        require(clean.count == baselineIssues,
          s"re-CHECK after FIX must match the pre-damage report " +
            s"($baselineIssues issues), got ${clean.count}")
        val after = genFiles()
        val touched = before.filter { case (p, t) => after.get(p).forall(_ != t) }
        require(touched.isEmpty,
          s"FIX must not rewrite unaffected labels; touched: ${touched.keys.take(3)}")
        val rewrittenBytes =
          treeBytes("edges/HAS_TOPIC") + treeBytes("ft/nodes/Doc/text")
        println(s"""{"metric":"fix_probe","edges":$nEdges,""" +
          s""""load_sec":$loadSec,"store_bytes":$totalBytes,""" +
          s""""baseline_issues":$baselineIssues,""" +
          s""""check_healthy_sec":$checkHealthySec,""" +
          s""""check_damaged_sec":$checkDamagedSec,"fix_sec":$fixSec,""" +
          s""""recheck_sec":$recheckSec,"fixes":${fixes.size},""" +
          s""""rewritten_bytes":$rewrittenBytes,"sf":"$sfDir"}""")
      } finally {
        Store.tryDeleteRecursively(java.nio.file.Paths.get(gdir))
      }
    }

    if (!want("append")) { spark.stop(); return }
    val src = graft.queries.DocQueries.ensure(spark, sfDir)
    val nDocs = Store.readEntity(spark, src, "nodes").count()
    val dest = s"target/maintprobe-${java.util.UUID.randomUUID().toString.take(8)}"
    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    val tb = System.nanoTime()
    val copied = Store.backup(src, dest)
    val backupSec = secs(tb)
    // the multi-hundred-MB clone must not outlive a failed probe run
    // (code-review r9 #5): clean up on ANY exit, happy or raised
    try {

    // snapshot every existing generation file (data + postings): the
    // append path must never touch one
    def genFiles(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(dest)
      val walk = java.nio.file.Files.walk(root)
      try walk.iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          p.toString.contains("gen-"))
        .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toMap
      finally walk.close()
    }
    val before = genFiles()
    val m0 = Store.readManifest(dest)
    val ftSegs0 = m0.ft(("nodes", "Doc", "text")).size

    def batch(shift: Long) =
      spark.read.parquet(s"$sfDir/documents.parquet").limit(5000)
        .select((col("doc_id").cast(LongType) + shift).as("id"),
          lit("Doc").as("label"), col("text"), col("lang"), col("source"),
          col("n_chars").cast(LongType).as("nchars"))
    val ta1 = System.nanoTime()
    GraphLoader.appendNodes(spark, dest, batch(100000000L))
    val append1Sec = secs(ta1)
    val ta2 = System.nanoTime()
    GraphLoader.appendNodes(spark, dest, batch(200000000L))
    val append2Sec = secs(ta2)

    val m1 = Store.readManifest(dest)
    val ftSegs1 = m1.ft(("nodes", "Doc", "text")).size
    require(ftSegs1 == ftSegs0 + 2,
      s"expected one postings segment per append: $ftSegs0 -> $ftSegs1")
    val after = genFiles()
    val touched = before.filter { case (p, t) => after.get(p).forall(_ != t) }
    require(touched.isEmpty,
      s"append must never touch existing generations; touched: ${touched.keys.take(3)}")

    // the appended rows are postings-served through the dialect route
    val served = graft.query.ArcadeSql.compile(
      GraphLoader.openGraph(spark, dest), graft.queries.DocQueries.docSchema,
      "SELECT id FROM Doc WHERE text CONTAINSTEXT 'dup'")
    val hits = served.count()
    val plan = served.queryExecution.executedPlan.toString
    require(plan.contains("/ft/nodes/Doc/text/"), "route must stay postings-served")

    println(s"""{"metric":"maint_probe","docs":$nDocs,"backup_sec":$backupSec,""" +
      s""""backup_files":$copied,"append_5k_sec":$append1Sec,""" +
      s""""append2_5k_sec":$append2Sec,"ft_segments":$ftSegs1,""" +
      s""""containstext_hits":$hits,"sf":"$sfDir"}""")

    // EXPORT → IMPORT round-trip posture (round 15: the IMPORT
    // newcomer gets the family probe discipline). Export the CLONE
    // (it now carries the two appended batches — the bigger frame),
    // re-ingest the JSONL tree through the validated bulk-load path
    // into a fresh store, and prove the row count round-trips. The
    // interesting scale question is whether import stays one
    // distributed JSON scan + the standard bulk-load validations —
    // i.e. the same O(rows) as the original load, no inference pass.
    val expDir = s"$dest-export"
    val impDir = s"$dest-import"
    try {
      val te = System.nanoTime()
      val nExported = Store.exportJson(spark, dest, expDir)
      val exportSec = secs(te)
      val ti = System.nanoTime()
      val nImported = GraphLoader.importJson(spark, expDir, impDir)
      val importSec = secs(ti)
      require(nImported == nExported,
        s"round-trip lost records: exported $nExported, imported $nImported")
      val nDst = Store.readEntity(spark, impDir, "nodes").count()
      require(nDst == nDocs + 10000,
        s"imported store holds $nDst docs, expected ${nDocs + 10000}")
      println(s"""{"metric":"import_probe","records":$nImported,""" +
        s""""export_sec":$exportSec,"import_sec":$importSec,"sf":"$sfDir"}""")
    } finally {
      Store.tryDeleteRecursively(java.nio.file.Paths.get(expDir))
      Store.tryDeleteRecursively(java.nio.file.Paths.get(impDir))
    }
    } finally {
      Store.deleteRecursively(java.nio.file.Paths.get(dest))
      spark.stop()
    }
  }
}
