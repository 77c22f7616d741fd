package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected edge list — the clustering /
  * community-density primitive (the third graph-global metric beside
  * connected components and PageRank; ArcadeDB exposes graph analytics
  * through Gremlin, which the reference does NOT depend on — this is
  * the Spark-native equivalent the survey's §2.B.12 analytics family
  * calls for).
  *
  * Algorithm: the classic distributed DEGREE-ORDERED orientation
  * (node-iterator++ / MPC triangle counting): orient every undirected
  * edge from its lower-(degree, id) endpoint to the higher one, build
  * wedges u→v→w through the middle vertex, and semi-probe the closing
  * edge u→w. Each triangle {x ≺ y ≺ z} materializes exactly one wedge
  * (x→y→z closed by x→z), so the count needs no /3 or /6 correction.
  * The orientation is the scale decision: wedge volume is bounded by
  * Σ min-degree² (the arboricity bound) instead of Σ degree² — a hub
  * of degree d in a skewed graph contributes d wedges as a SOURCE only
  * toward its few higher-ranked neighbors, never d² through its whole
  * neighborhood. The wedge and closing joins are plain equi-joins (AQE
  * skew-splittable); nothing shuffles more than the wedge set.
  */
object Triangles {

  /** Materialize `df` unless it already IS a materialized LogicalRDD —
    * i.e. the caller handed a checkpointed frame (the co-purchase cache
    * hands every family operator one). The defensive re-checkpoint each
    * operator paid copied the whole edge list once more per query
    * (guide §1.2: an eager materialization is a full extra pass). */
  private[graft] def materialized(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case _: org.apache.spark.sql.execution.LogicalRDD => df
      case _ => df.localCheckpoint(true)
    }

  /** Canonical co-occurrence edge list from a (group, item) membership
    * table: items sharing a group get an undirected edge (a < b),
    * distinct across groups. The self-join is per-group QUADRATIC in
    * group size — the standard market-basket bound — so groups larger
    * than `maxGroupSize` are dropped first (the df-cap discipline: a
    * degenerate mega-group adds no community signal and would dominate
    * the join; the cap bounds work at cap² × groups). */
  /** The df-capped distinct (g, i) membership universe shared by
    * [[cooccurrenceEdges]] and [[associationRules]] — exposed so a
    * caller serving both can derive (and checkpoint) it once (r18). */
  def cappedMembershipOf(membership: DataFrame, groupCol: String,
      itemCol: String, maxGroupSize: Int): DataFrame = {
    val m = membership.select(col(groupCol).as("g"), col(itemCol).as("i")).distinct()
    val ok = m.groupBy(col("g")).agg(count(lit(1)).as("sz"))
      .filter(col("sz") <= maxGroupSize).select(col("g"))
    m.join(ok, Seq("g"), "left_semi")
  }

  def cooccurrenceEdges(membership: DataFrame, groupCol: String,
      itemCol: String, maxGroupSize: Int = 50): DataFrame = {
    require(maxGroupSize >= 2, "groups below 2 members carry no edges")
    val mm = cappedMembershipOf(membership, groupCol, itemCol, maxGroupSize)
    mm.as("x").join(mm.as("y"), Seq("g"))
      .filter(col("x.i") < col("y.i"))
      .select(col("x.i").as("a"), col("y.i").as("b"))
      .distinct()
  }

  /** Degree-ordered orientation of a canonical edge list, MATERIALIZED
    * once (localCheckpoint — the [[graft.llmops.Dedup.simhashPairs]]
    * self-join discipline): the oriented edges feed both the adjacency
    * build and the edge probe, and without materialization each arm
    * would recompute the upstream co-occurrence self-join. The
    * checkpoint is edge-set-sized, i.e. the algorithm's own input. */
  private def orient(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a"), col("b"))
    val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.select(col("n").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("deg").as("db")), Seq("b"))
    val aFirst = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"))
      .localCheckpoint(true)
  }

  /** Per-edge triangle closure via ADJACENCY INTERSECTION (the
    * edge-iterator form): each oriented edge (u, v) carries the
    * out-neighbor lists of BOTH endpoints and closes |adj(u) ∩ adj(v)|
    * triangles in-row. This was chosen over the naive wedge join
    * (e1 ⋈ e2 then a closing semi probe) on measurement: the wedge
    * form SHUFFLES the full wedge set — Σ out-deg² rows, ~34× the
    * edge count at sf0.1 — into the closing join, where this shape
    * shuffles only edge-sized tables (two node-keyed adjacency joins)
    * and the intersections run inside codegen. Out-degree under the
    * degree-ordered orientation is bounded by O(√m) (arboricity), so
    * a carried adjacency list is √m-sized worst case — a hub's
    * neighbors land on ITS few higher-ranked peers, never back on it.
    * Returns (u, v, ws = the closing third corners). */
  private def edgeClosures(oe: DataFrame): DataFrame = {
    val adj = oe.groupBy(col("src")).agg(collect_list(col("dst")).as("nbrs"))
    oe.join(adj.select(col("src"), col("nbrs").as("au")), Seq("src"))
      .join(adj.select(col("src").as("dst"), col("nbrs").as("av")), Seq("dst"), "left")
      .select(col("src").as("u"), col("dst").as("v"),
        when(col("av").isNull,
          array().cast(org.apache.spark.sql.types.ArrayType(oe.schema("src").dataType)))
          .otherwise(array_intersect(col("au"), col("av"))).as("ws"))
  }

  /** The CLOSED-EDGE frame (u, v, ws) of a canonical (a < b) edge
    * list: every degree-ordered oriented edge with the third corners
    * that close it — the whole triangle family's shared intermediate
    * ([[triangleCountFrom]] / [[topTriangleVerticesFrom]] /
    * [[clusteringTopFrom]] / [[transitivityFrom]] are aggregates over
    * it). Output-sized: |E| rows carrying one corner per triangle
    * (Σ|ws| = T — 1.9 M at sf0.1 against 1.2 M edges), so a caller
    * serving several family queries from one source can derive it ONCE
    * and checkpoint it (the co-purchase-layout discipline — r18; each
    * query had re-run the orientation joins AND the adjacency-
    * intersection pass per execution). */
  def closedEdges(edges: DataFrame): DataFrame = edgeClosures(orient(edges))

  /** Total triangle count of a canonical (a < b) undirected edge list.
    * Returns one row (n_triangles). */
  def triangleCount(edges: DataFrame): DataFrame =
    triangleCountFrom(closedEdges(edges))

  /** [[triangleCount]] over a precomputed [[closedEdges]] frame. */
  def triangleCountFrom(closed: DataFrame): DataFrame =
    closed.agg(coalesce(sum(size(col("ws"))), lit(0)).cast("long").as("n_triangles"))

  /** Per-vertex triangle counts over ALL vertices (no top-k cut) —
    * shared by [[topTriangleVertices]] and the clustering family.
    * ONE generate pass over the closed-edge frame (guide §2.4: the
    * earlier 3-arm union re-read the whole un-checkpointed closure
    * subtree per arm — r17 plan audit showed the closing joins
    * TRIPLICATED in `graph_clustering_top`'s plan): u and v credit
    * |ws| and each third corner credits 1, emitted as a single
    * generated array per row, so the closure subtree is scanned once
    * and the credits flow into one vertex-keyed map-side-combinable
    * sum. Row volume is identical to the union form (2 + |ws| rows per
    * closed edge). Returns (n, n_triangles > 0). */
  private def vertexTriangles(closed: DataFrame): DataFrame = {
    val sz = size(col("ws")).cast("long")
    closed.select(explode(concat(
        array(struct(col("u").as("n"), sz.as("c")),
          struct(col("v").as("n"), sz.as("c"))),
        transform(col("ws"), w => struct(w.as("n"), lit(1L).as("c"))))).as("x"))
      .select(col("x.n").as("n"), col("x.c").as("c"))
      .groupBy(col("n")).agg(sum(col("c")).as("n_triangles"))
  }

  /** Per-vertex LOCAL CLUSTERING COEFFICIENT, top-k: cc(v) = t(v) /
    * C(deg(v), 2) — the fraction of a vertex's neighbor pairs that are
    * themselves connected. Restricted to deg ≥ `minDeg` (tiny-degree
    * vertices hit cc = 1 trivially and drown the ranking in ties).
    *
    * Determinism discipline: t and deg are EXACT integer aggregates;
    * cc is ONE double division + round(6) per row — no float sums, so
    * the DuckDB twin reproduces it bit-for-bit. The edge list is
    * checkpointed once (it feeds both the degree aggregate and the
    * orientation) — without it the upstream co-occurrence self-join
    * would run twice. Ties (cc, deg desc, n asc) → deterministic cut.
    * Returns (n, deg, n_triangles, cc). */
  def clusteringTop(edges: DataFrame, minDeg: Int, k: Int): DataFrame = {
    val e = materialized(edges)
    clusteringTopFrom(e, closedEdges(e), minDeg, k)
  }

  /** [[clusteringTop]] over a precomputed [[closedEdges]] frame (the
    * degree aggregate still reads the edge list — degrees are not
    * derivable from the oriented closures). */
  def clusteringTopFrom(edges: DataFrame, closed: DataFrame,
      minDeg: Int, k: Int): DataFrame = {
    require(minDeg >= 2, "cc is undefined below degree 2")
    val e = edges
    val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= minDeg)
    val tri = vertexTriangles(closed.filter(size(col("ws")) > 0))
    deg.join(tri, Seq("n"), "left")
      .select(col("n"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("cc", round(
        col("n_triangles").cast("double") * 2.0 /
          (col("deg") * (col("deg") - 1)).cast("double"), 6))
      .orderBy(col("cc").desc, col("deg").desc, col("n").asc).limit(k)
  }

  /** Global TRANSITIVITY (the graph clustering coefficient): 3 × the
    * triangle count over the wedge count Σ C(deg(v), 2). Chosen over
    * the average-of-local-cc form deliberately: both numerator and
    * denominator are EXACT integer sums divided ONCE (the data-card
    * ratio discipline) — an average of per-vertex doubles would make
    * the result depend on float summation order across partitions.
    * Returns one row (n_triangles, n_wedges, transitivity). */
  def transitivity(edges: DataFrame): DataFrame = {
    val e = materialized(edges)
    transitivityFrom(e, closedEdges(e))
  }

  /** [[transitivity]] over a precomputed [[closedEdges]] frame. */
  def transitivityFrom(edges: DataFrame, closed: DataFrame): DataFrame = {
    val e = edges
    // Σ deg(deg−1) summed as LONG, halved once with integer DIV (the
    // sum is even by construction) — `/` would detour through double.
    val wedges = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
      .agg(coalesce(sum(col("deg") * (col("deg") - 1)), lit(0L)).as("s2"))
      .select(expr("s2 DIV 2").as("n_wedges"))
    val tri = triangleCountFrom(closed)
    tri.crossJoin(wedges)
      .select(col("n_triangles"), col("n_wedges"),
        when(col("n_wedges") === 0, lit(0.0)).otherwise(round(
          col("n_triangles").cast("double") * 3.0 / col("n_wedges").cast("double"), 6))
          .as("transitivity"))
  }

  /** Pairwise ASSOCIATION RULES over the membership table — the
    * market-basket classic (support / confidence / lift for item
    * pairs), mined on the SAME capped co-occurrence machinery as the
    * triangle family: pair support comes from the per-group self-join
    * (quadratic per basket, bounded by the group-size cap), item
    * support from one membership aggregate, and the ratios are exact
    * integer counts divided ONCE per output column. Both rule
    * directions (a→b, b→a) emit from the one canonical pair row.
    * Top-k by (lift, pair support, antecedent) — rounded before
    * ranking so the cut is engine-stable. Returns
    * (ante, cons, n_pair, n_ante, n_baskets, confidence, lift). */
  /** `cappedMembership`: a precomputed (checkpointed) capped (g, i)
    * universe for the same (membership, maxGroupSize) — the distinct +
    * size-cap + semi stage shared with the co-purchase derivation
    * (r18, the derived-layout discipline); built here when absent. */
  def associationRules(membership: DataFrame, groupCol: String,
      itemCol: String, maxGroupSize: Int, minSupport: Long, k: Int,
      cappedMembership: Option[DataFrame] = None): DataFrame = {
    require(minSupport >= 1 && k >= 1, "support floor and k must be positive")
    // ONE capped universe for every count — pair, item, and basket
    // totals all come from the same post-cap membership, so the ratios
    // are internally consistent
    val mm = cappedMembership.getOrElse(
      cappedMembershipOf(membership, groupCol, itemCol, maxGroupSize)
        .localCheckpoint(true)) // feeds basket count, item support, pair join
    val nB = mm.agg(countDistinct(col("g")).as("n_baskets"))
    val pairs = mm.as("x").join(mm.as("y"), Seq("g"))
      .filter(col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("a"), col("y.i").as("b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minSupport)
    val item = mm.groupBy(col("i")).agg(count(lit(1)).as("n_item"))
    val both = pairs
      .join(item.select(col("i").as("a"), col("n_item").as("na")), Seq("a"))
      .join(item.select(col("i").as("b"), col("n_item").as("nb")), Seq("b"))
      .crossJoin(broadcast(nB))
    // both rule directions from ONE pass over the canonical pair row
    // (r17, guide §2.4): the fwd/rev union re-read the un-checkpointed
    // pairs+item join chain twice — same plan-duplication shape as the
    // old vertexTriangles credit arms
    both.select(explode(array(
        struct(col("a").as("ante"), col("b").as("cons"), col("n_pair"),
          col("na").as("n_ante"), col("nb").as("n_cons"), col("n_baskets")),
        struct(col("b").as("ante"), col("a").as("cons"), col("n_pair"),
          col("nb").as("n_ante"), col("na").as("n_cons"), col("n_baskets"))))
        .as("r"))
      .select(col("r.ante").as("ante"), col("r.cons").as("cons"),
        col("r.n_pair").as("n_pair"), col("r.n_ante").as("n_ante"),
        col("r.n_cons").as("n_cons"), col("r.n_baskets").as("n_baskets"))
      .select(col("ante"), col("cons"), col("n_pair"), col("n_ante"), col("n_baskets"),
        round(col("n_pair").cast("double") / col("n_ante"), 6).as("confidence"),
        round(col("n_pair").cast("double") * col("n_baskets") /
          (col("n_ante").cast("double") * col("n_cons")), 6).as("lift"))
      .orderBy(col("lift").desc, col("n_pair").desc, col("ante").asc, col("cons").asc)
      .limit(k)
  }

  /** Degree ASSORTATIVITY (Newman's r): the Pearson correlation of
    * endpoint degrees over the symmetrized edge ends — do hubs attach
    * to hubs (r > 0, social graphs) or to leaves (r < 0, hub-and-spoke
    * topologies)? The symmetrized sums collapse to ONE pass over the
    * edge list (Σx = Σ(dₐ+d_b), Σx² = Σ(dₐ²+d_b²), Σxy = Σ2dₐd_b — no
    * doubled union), all EXACT integer aggregates divided once at the
    * end (the [[graft.operators.Profile.correlations]] discipline,
    * including the nullif pin: a degree-regular graph zeroes the
    * variance and the engines disagree on 0-division). Degrees join
    * onto the edges as two node-keyed equi-joins — edge-sized shuffle,
    * AQE-splittable. Like correlations, callers must keep Σd² · M
    * inside a long (rescale/cap first at extreme scale). Returns one
    * row (m = directed end count, r). */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val e = materialized(edges)
    val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    val s = e
      .join(deg.select(col("n").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("deg").as("db")), Seq("b"))
      .agg((count(lit(1)) * 2).as("m"),
        sum(col("da") + col("db")).as("sx"),
        sum(col("da") * col("da") + col("db") * col("db")).as("qx"),
        sum(col("da") * col("db") * 2).as("p"))
    def d(c: Column) = c.cast("double")
    s.select(col("m"),
      round((d(col("m")) * d(col("p")) - d(col("sx")) * d(col("sx"))) /
        nullif(d(col("m")) * d(col("qx")) - d(col("sx")) * d(col("sx")),
          lit(0.0)), 6).as("r"))
  }

  /** Per-vertex triangle participation (top-k by count, ties → id): the
    * local-clustering numerator. Both closed-edge endpoints credit the
    * intersection size; each third corner credits 1 via an explode that
    * is OUTPUT-sized (3 rows per triangle, never wedge-sized). The tail
    * is one vertex-keyed aggregate + TakeOrdered. */
  def topTriangleVertices(edges: DataFrame, k: Int): DataFrame =
    // single-pass credits ([[vertexTriangles]]) — the closure subtree
    // is read once, so the r13 checkpoint that de-triplicated the
    // three credit arms is no longer needed (one fewer eager
    // materialization job per call)
    topTriangleVerticesFrom(closedEdges(edges), k)

  /** [[topTriangleVertices]] over a precomputed [[closedEdges]] frame. */
  def topTriangleVerticesFrom(closed: DataFrame, k: Int): DataFrame =
    vertexTriangles(closed.filter(size(col("ws")) > 0))
      .orderBy(col("n_triangles").desc, col("n").asc).limit(k)
}
