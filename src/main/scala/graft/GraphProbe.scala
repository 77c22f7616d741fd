package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{KCore, Triangles}

/** Graph-analytics posture probe: k-core peel depth and wall on the
  * sf0.1 co-purchase graph (the same edge list the triangle family
  * benches on). Reports the 3-core size, the full coreness profile
  * (max core + distribution mass), and walls. One JSON line for
  * BASELINE.md. Run: `sbt "runMain graft.GraphProbe"`.
  * `SPARK_GRAFT_PROBE_ONLY=kcore,lpa,cc,centrality,hits_walks` filters
  * sections — the ×10-SF posture runs skip the slow legacy sections
  * (the peel alone is ~17 min at 12M edges). */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY").map(_.split(",").toSet)
    def want(s: String): Boolean = only.forall(_.contains(s))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // ×100 probes run 100M-edge frames through a single big-heap JVM:
      // a long GC pause must not let the self-heartbeat reap the
      // in-process executor (observed at 119M edges / 96g heap)
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val edges = Triangles.cooccurrenceEdges(
      spark.read.parquet(s"$sfDir/lineitem.parquet"),
      "l_orderkey", "l_partkey", 50).localCheckpoint(true)
    val nEdges = edges.count()

    if (want("kcore")) {
    val t0 = System.nanoTime()
    val c3 = KCore.kCore(edges, 3).count()
    val s3 = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val core = KCore.coreness(edges).localCheckpoint(true)
    val maxCore = core.agg(max(col("core"))).head().getInt(0)
    val s = (System.nanoTime() - t1) / 1e9
    val top = core.groupBy(col("core")).agg(count(lit(1)).as("n"))
      .orderBy(col("core").desc).limit(3)
      .collect().map(r => s""""${r.getInt(0)}":${r.getLong(1)}""").mkString(",")

    // the replaced level peel, timed beside the h-index fixpoint AND
    // asserted identical on the full dense graph (VERDICT r12 order #5).
    // SPARK_GRAFT_PROBE_PEEL=0 skips it (LOUDLY — the JSON says so):
    // the peel is the REFERENCE implementation, ~10× the h-index cost,
    // and at ×100 its only job (the equality assert) re-proves what the
    // sf0.1/×10 runs already hold on the identical disjoint-copy
    // structure.
    val runPeel = sys.env.get("SPARK_GRAFT_PROBE_PEEL").forall(_ != "0")
    val peelJson = if (runPeel) {
      val tp = System.nanoTime()
      val corePeel = KCore.corenessPeel(edges).localCheckpoint(true)
      val sPeel = (System.nanoTime() - tp) / 1e9
      val diverged = core.join(
          corePeel.withColumnRenamed("core", "cp"), Seq("n"), "full_outer")
        .filter(!(col("core") <=> col("cp"))).count()
      require(diverged == 0, s"h-index coreness diverged from the peel on $diverged vertices")
      s""""coreness_peel_sec":$sPeel,"peel_equal":true,"""
    } else """"peel_skipped":true,"""

    println(s"""{"probe":"kcore","edges":$nEdges,"core3_vertices":$c3,""" +
      s""""core3_sec":$s3,"max_core":$maxCore,"coreness_sec":$s,""" +
      peelJson +
      s""""top_cores":{$top}}""")
    }

    if (want("lpa")) {
    val t2 = System.nanoTime()
    val lpa = graft.operators.Communities.labelPropagation(edges, 5)
      .localCheckpoint(true)
    val nComm = lpa.select(col("community")).distinct().count()
    val sLpa = (System.nanoTime() - t2) / 1e9
    // modularity of the LPA assignment (r15 posture for the r14
    // newcomer): one edge-sized assignment join + two community-keyed
    // map-combinable aggregates — the wall must stay linear in the
    // edge scan across ×10/×100
    val tm = System.nanoTime()
    val mod = graft.operators.Communities.modularity(edges, lpa).head()
    val sMod = (System.nanoTime() - tm) / 1e9
    println(s"""{"probe":"lpa","edges":$nEdges,"rounds":5,""" +
      s""""communities":$nComm,"sec":$sLpa,""" +
      s""""modularity":${mod.getDouble(1)},"modularity_sec":$sMod}""")
    }

    if (want("lpa_knob")) {
    // dense/sparse crossover bracket (r17, VERDICT r16 order #7): the
    // 1/8 frontier threshold was chosen, not measured — time the SAME
    // 5-round LPA at divisors 2/8/32 in one JVM, forward then reverse
    // order (the #82/#88 A/B discipline: the throttle tax moves with
    // position, min-per-divisor cancels it). Divisor 1 ~= always-dense
    // (the r15 shape) rides along as the control.
    val divisors = Seq(1L, 2L, 8L, 32L)
    val best = scala.collection.mutable.Map[Long, Double]()
    Seq(divisors, divisors.reverse).foreach(_.foreach { dv =>
      val t0 = System.nanoTime()
      val n = graft.operators.Communities.labelPropagation(edges, 5, dv)
        .select(col("community")).distinct().count()
      val s = (System.nanoTime() - t0) / 1e9
      if (!best.get(dv).exists(_ <= s)) best(dv) = s
      System.err.println(s"[lpa_knob] div=$dv sec=$s communities=$n")
    })
    val js = divisors.map(dv => s""""$dv":${best(dv)}""").mkString(",")
    println(s"""{"probe":"lpa_knob","edges":$nEdges,"rounds":5,""" +
      s""""min_sec_by_divisor":{$js}}""")
    }

    if (want("ppr")) {
    // personalized PageRank posture (r15, VERDICT r14 order #3): the
    // seed-sparse iteration on the co-purchase graph DIRECTED a→b —
    // rank frames grow with the reached set, so the per-round cost is
    // reach-bounded while the edge layout is built once; across
    // ×10/×100 the wall must track the one-time edge build + reach,
    // not |E| per round
    val verts = edges.select(col("a").as("id"))
      .unionAll(edges.select(col("b").as("id"))).distinct()
      .localCheckpoint(true)
    val nVert = verts.count()
    val seeds = verts.orderBy(col("id")).limit(5)
      .collect().map(_.getLong(0)).toSeq // config-sized
    val tp2 = System.nanoTime()
    val nz = graft.operators.PageRank.personalizedPageRankDf(verts,
        edges.select(col("a").as("src"), col("b").as("dst")), seeds, 10)
      .filter(col("pagerank") > 0).count()
    val sPpr = (System.nanoTime() - tp2) / 1e9
    println(s"""{"probe":"ppr","edges":$nEdges,"vertices":$nVert,""" +
      s""""seeds":5,"iters":10,"nonzero":$nz,"sec":$sPpr}""")
    }

    if (want("cc")) {
    val t3 = System.nanoTime()
    val ccDf = graft.operators.Communities.connectedComponentsDf(edges)
      .localCheckpoint(true)
    val nCompDf = ccDf.select(col("component")).distinct().count()
    val sDf = (System.nanoTime() - t3) / 1e9
    val t4 = System.nanoTime()
    val ccGx = graft.graphx.GraphXBridge.componentsOfPairs(spark,
      edges.select(col("a").as("src"), col("b").as("dst")))
    val nCompGx = ccGx.select(col("component")).distinct().count()
    val sGx = (System.nanoTime() - t4) / 1e9
    println(s"""{"probe":"cc_df_vs_graphx","edges":$nEdges,""" +
      s""""df_components":$nCompDf,"df_sec":$sDf,""" +
      s""""graphx_components":$nCompGx,"graphx_sec":$sGx}""")
    }

    if (want("centrality")) {
    // centrality posture (r13 order #8): sampled-source closeness and
    // Brandes betweenness — the cost driver is |S| × BFS levels, so
    // the probe reports walls for the declared-query source counts;
    // scale across SF probes shows edge-linearity per level
    val verts = edges.select(col("a").as("v"))
      .unionAll(edges.select(col("b").as("v"))).distinct()
      .localCheckpoint(true)
    val nVert = verts.count()
    val srcs32 = verts.orderBy(col("v")).limit(32)
      .collect().map(_.getLong(0)).toSeq
    val t5 = System.nanoTime()
    val clo = graft.operators.Centrality.closeness(edges, srcs32.take(8))
      .localCheckpoint(true)
    val maxReach = clo.agg(max(col("n_reached"))).head().getLong(0)
    val sClo = (System.nanoTime() - t5) / 1e9
    // the MS-BFS packed path, same 8 sources AND the full 32 (the
    // packed win grows with |S| — one edge join per level regardless)
    val tp8 = System.nanoTime()
    graft.operators.Centrality.closenessPacked(edges, srcs32.take(8))
      .localCheckpoint(true).count()
    val sPack8 = (System.nanoTime() - tp8) / 1e9
    val tp32 = System.nanoTime()
    graft.operators.Centrality.closenessPacked(edges, srcs32)
      .localCheckpoint(true).count()
    val sPack32 = (System.nanoTime() - tp32) / 1e9
    val t6 = System.nanoTime()
    val bc = graft.operators.Centrality
      .betweenness(edges, srcs32, Some(nVert)).localCheckpoint(true)
    val nBc = bc.count()
    val sBc = (System.nanoTime() - t6) / 1e9
    println(s"""{"probe":"centrality","edges":$nEdges,"vertices":$nVert,""" +
      s""""closeness_sources":8,"closeness_sec":$sClo,""" +
      s""""closeness_packed8_sec":$sPack8,"closeness_packed32_sec":$sPack32,""" +
      s""""max_reached":$maxReach,""" +
      s""""betweenness_sources":32,"betweenness_sec":$sBc,"bc_vertices":$nBc}""")
    }

    // HITS + random walks (round 13; split into per-operator sections
    // in round 14 — each prints IMMEDIATELY, so a later section's crash
    // can't lose earlier walls, and ×100 runs can skip the heavy
    // node2vec expansion): posture across SF probes shows edge-linearity.
    // `hits_walks` keeps running all three for compatibility.
    var hitsRes: Option[(Long, Double)] = None
    var walksRes: Option[(Long, Double)] = None
    var n2vRes: Option[(Long, Double)] = None
    if (want("hits_walks") || want("hits")) {
    val t7 = System.nanoTime()
    val hits = graft.operators.Hits.hitsTop(
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey").as("s"), col("l_partkey").as("d")), 4, 20)
    val nHits = hits.count()
    val sHits = (System.nanoTime() - t7) / 1e9
    hitsRes = Some((nHits, sHits))
    println(s"""{"probe":"hits","edges":$nEdges,""" +
      s""""hits_iters":4,"hits_rows":$nHits,"hits_sec":$sHits}""")
    }
    if (want("hits_walks") || want("walks")) {
    val t8 = System.nanoTime()
    val walks = graft.operators.RandomWalks.randomWalks(edges, "probe", 4)
      .localCheckpoint(true)
    val nWalks = walks.count()
    val sWalks = (System.nanoTime() - t8) / 1e9
    walksRes = Some((nWalks, sWalks))
    println(s"""{"probe":"walks","edges":$nEdges,""" +
      s""""walk_len":4,"walks":$nWalks,"walks_sec":$sWalks}""")
    }
    if (want("hits_walks") || want("n2v")) {
    val t9 = System.nanoTime()
    val n2v = graft.operators.RandomWalks
      .node2vecWalks(edges, "probe", 4, 2L, 4L, 2L).localCheckpoint(true)
    val nN2v = n2v.count()
    val sN2v = (System.nanoTime() - t9) / 1e9
    n2vRes = Some((nN2v, sN2v))
    println(s"""{"probe":"n2v","edges":$nEdges,""" +
      s""""node2vec_walks":$nN2v,"node2vec_sec":$sN2v}""")
    }
    if (want("n2v_capped")) {
    // the maxDeg-capped node2vec (r15, VERDICT r14 order #1): candidate
    // volume per step is ≤ walks × maxDeg instead of Σdeg(cur) — the
    // shape that must COMPLETE at ×100 within the box's shuffle disk
    // where the uncapped form exhausted it (BASELINE #74)
    val tc = System.nanoTime()
    val n2vc = graft.operators.RandomWalks
      .node2vecWalks(edges, "probe", 4, 2L, 4L, 2L, maxDeg = 32)
      .localCheckpoint(true)
    val nC = n2vc.count()
    val sC = (System.nanoTime() - tc) / 1e9
    println(s"""{"probe":"n2v_capped","edges":$nEdges,"max_deg":32,""" +
      s""""node2vec_walks":$nC,"node2vec_capped_sec":$sC}""")
    }
    // the legacy r13 COMBINED record, kept when the combined section
    // key is requested (ADVICE r14 #5: the split per-operator records
    // silently broke any parser keyed on this schema) — same fields,
    // emitted AFTER the per-operator lines so both forms survive
    if (want("hits_walks")) (hitsRes, walksRes, n2vRes) match {
      case (Some((nH, sH)), Some((nW, sW)), Some((nN, sN))) =>
        println(s"""{"probe":"hits_walks","edges":$nEdges,""" +
          s""""hits_iters":4,"hits_rows":$nH,"hits_sec":$sH,""" +
          s""""walk_len":4,"walks":$nW,"walks_sec":$sW,""" +
          s""""node2vec_walks":$nN,"node2vec_sec":$sN}""")
      case _ => ()
    }

    if (want("dualpath")) {
    // DF-native vs GraphX dual paths (round 14): PageRank and weighted
    // SSSP on the FULL property graph — the posture evidence for the
    // pagerank_df / dijkstra_df rows (not bench headlines)
    val g = graft.query.PropertyGraph(
      graft.load.GraphLoader.nodes(spark, sfDir),
      graft.load.GraphLoader.edges(spark, sfDir))
    val tq = System.nanoTime()
    graft.operators.PageRank.pageRankDf(
      g.nodes.select(col("id")), g.edges.select(col("src"), col("dst")), 10)
      .localCheckpoint(true).count()
    val sPrDf = (System.nanoTime() - tq) / 1e9
    val tg = System.nanoTime()
    graft.graphx.GraphXBridge.pageRank(spark, g, 10).count()
    val sPrGx = (System.nanoTime() - tg) / 1e9
    val td = System.nanoTime()
    graft.operators.ShortestPath.dijkstraDf(
      g.edges.filter(col("label").isin("IN_NATION", "IN_REGION"))
        .select(col("src"), col("dst"), lit(1.0).as("w")),
      graft.load.GraphLoader.SupplierOff).count()
    val sDjDf = (System.nanoTime() - td) / 1e9
    val tg2 = System.nanoTime()
    graft.graphx.GraphXBridge.dijkstra(spark, g, Seq("IN_NATION", "IN_REGION"),
      lit(1.0), graft.load.GraphLoader.SupplierOff).count()
    val sDjGx = (System.nanoTime() - tg2) / 1e9
    // personalized PageRank (round 14): same iteration shape with the
    // seed-sparse frames — the wall shows what sparsity buys when the
    // reached set is a small fraction of |V|
    val tp = System.nanoTime()
    graft.operators.PageRank.personalizedPageRankDf(
      g.nodes.select(col("id")), g.edges.select(col("src"), col("dst")),
      Seq(1L, 2L, 3L, 4L, 5L).map(graft.load.GraphLoader.CustomerOff + _), 10)
      .filter(col("pagerank") > 0).count()
    val sPpr = (System.nanoTime() - tp) / 1e9
    println(s"""{"probe":"dualpath","pagerank_df_sec":$sPrDf,""" +
      s""""pagerank_graphx_sec":$sPrGx,"ppr_df_sec":$sPpr,""" +
      s""""dijkstra_df_sec":$sDjDf,""" +
      s""""dijkstra_graphx_sec":$sDjGx}""")
    }

    if (want("hub")) {
    // planted MEGA-HUB posture (VERDICT r13 watch #1 / order #4): one
    // vertex adjacent to EVERY other vertex, on top of the co-purchase
    // graph. The r13 collect_list adjacency would materialize the hub
    // as ONE |V|-element row (×100: a multi-GB single row); the row-
    // form adjacency keeps it |V| ordinary rows, and each walk step
    // probes exactly one (u, idx) row — the wall must stay in the
    // un-hubbed band.
    val verts = edges.select(col("a").as("v"))
      .unionAll(edges.select(col("b").as("v"))).distinct()
      .localCheckpoint(true)
    val nVert = verts.count()
    val hubEdges = edges.unionByName(
        verts.filter(col("v") =!= 0L)
          .select(lit(0L).as("a"), col("v").as("b")))
      .localCheckpoint(true)
    val th = System.nanoTime()
    val hw = graft.operators.RandomWalks.randomWalks(hubEdges, "probe", 4)
      .localCheckpoint(true)
    val nHw = hw.count()
    val sHw = (System.nanoTime() - th) / 1e9
    println(s"""{"probe":"hub_walks","edges":$nEdges,"hub_degree":${nVert - 1},""" +
      s""""walks":$nHw,"walks_sec":$sHw}""")
    // node2vec at a mega-hub is its own section ("hub_n2v"): every
    // walk VISITING the hub must weigh all deg(hub) candidates — that
    // O(deg) per visit is the ALGORITHM's cost (any implementation
    // weighs the full neighbor distribution), not this shape's; at
    // ×100 (2M-degree hub, ~thousands of visiting walks) the candidate
    // expansion is tens of billions of rows — run it only where the
    // caller asks (real pipelines degree-cap upstream, the documented
    // posture)
    if (want("hub_n2v")) {
      val th2 = System.nanoTime()
      val hn = graft.operators.RandomWalks
        .node2vecWalks(hubEdges, "probe", 4, 2L, 4L, 2L).localCheckpoint(true)
      val nHn = hn.count()
      val sHn = (System.nanoTime() - th2) / 1e9
      println(s"""{"probe":"hub_n2v","edges":$nEdges,"hub_degree":${nVert - 1},""" +
        s""""node2vec_walks":$nHn,"node2vec_sec":$sHn}""")
    }
    }
    spark.stop()
  }
}
