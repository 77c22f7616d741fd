package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The graph-query surface of the engine (SURVEY §2.B.3): ArcadeDB's
  * traversal operators (`out/in/both/outE/inE/…`, `MATCH` patterns,
  * `TRAVERSE`) re-expressed as relational joins over `nodes`/`edges` —
  * "the join IS the traversal". Every hop is an equi-join on `src`/`dst`
  * that Catalyst plans as broadcast or shuffle join as sizes dictate;
  * per-label filters hit the `label` partition column of the persisted
  * layout, so a hop over one edge label reads only that label's files.
  *
  * Column discipline: each binding (`as`) prefixes its node columns, so
  * a chained pattern yields a flat DataFrame of bindings, like the
  * ArcadeDB `MATCH {as: a}…RETURN a.x, b.y` form.
  */
final case class PropertyGraph(nodes: DataFrame, edges: DataFrame,
    /** Persisted full-text postings provider: (vertex label, property)
      * → `(tk, id, tf)` frame when the store maintains a FULL_TEXT
      * index for it ([[graft.load.FullText]]). The query compiler
      * routes eligible CONTAINSTEXT predicates through it; the default
      * (no store attached) serves every predicate from the scan. */
    ftIndex: (String, String) => Option[DataFrame] = (_, _) => None) {

  def nodesOf(label: String): DataFrame = nodes.filter(col("label") === label)
  def edgesOf(label: String): DataFrame = edges.filter(col("label") === label)

  /** Start a pattern at all nodes with `label`, bound as `as`. */
  def v(label: String, as: String): Traversal = {
    val start = nodesOf(label).select(
      nodes.columns.map(c => col(c).as(s"${as}_$c")).toIndexedSeq: _*)
    Traversal(this, start, as)
  }

  /** Out-degree per node over one edge label — the `out('L').size()`
    * graph-scalar (SURVEY §2.B.7), computed as a partial-aggregated
    * groupBy (map-side combine), never a per-node subquery. */
  def outDegree(edgeLabel: String): DataFrame =
    edgesOf(edgeLabel).groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))

  def inDegree(edgeLabel: String): DataFrame =
    edgesOf(edgeLabel).groupBy(col("dst").as("id")).agg(count(lit(1)).as("degree"))

  /** TRAVERSE … WHILE (SURVEY §2.B.3 variable-length path): bounded
    * breadth-first expansion as an iterative driver loop of joins, one
    * join per depth, with distinct-on-(start,node) dedup (the explicit
    * visited set — SURVEY §7 risk note). `direction` ∈ {"out","in",
    * "both"}; `whileNode` is the ArcadeDB `while:` guard — a predicate
    * over the node row that must hold for the traversal to CONTINUE
    * THROUGH a node (guarded nodes are still reported, but not
    * expanded; the start frontier is always expanded). Lineage is cut
    * with `localCheckpoint` every few iterations. For unbounded forms
    * use the GraphX Pregel paths (shortestPathsTo runs to fixpoint).
    *
    * Returns (start_id, node_id, depth) with depth = first (minimal)
    * depth at which node_id is reached from start_id; depth 0 = start.
    */
  def traverse(startNodes: DataFrame, edgeLabels: Seq[String], direction: String,
      maxDepth: Int, whileNode: Column = lit(true)): DataFrame = {
    val hop = hopRelation(edgeLabels, direction)
    // nodes passing the while-guard (joined to decide expansion)
    val expandable = nodes.filter(whileNode).select(col("id").as("node_id"))
    var frontier = startNodes.select(col("id").as("start_id"), col("id").as("node_id"),
      lit(0).as("depth"))
    var visited = frontier
    var d = 0
    while (d < maxDepth) {
      d += 1
      val expanding =
        if (d == 1) frontier // the start frontier always expands
        else frontier.join(expandable, Seq("node_id"), "left_semi")
      // distinct BEFORE tagging the (constant) depth: the dedup and the
      // anti-join then share the (start_id, node_id) partitioning, so
      // Catalyst reuses one exchange instead of re-shuffling the full
      // frontier twice per depth
      val next = expanding.join(hop, expanding("node_id") === hop("from"))
        .select(col("start_id"), col("to").as("node_id"))
        .distinct()
      // keep only first-reach depth (minimal-depth semantics)
      frontier = next.join(visited.select("start_id", "node_id"),
        Seq("start_id", "node_id"), "left_anti")
        .select(col("start_id"), col("node_id"), lit(d).as("depth"))
      if (d % 3 == 0) frontier = frontier.localCheckpoint()
      visited = visited.unionByName(frontier)
    }
    visited
  }

  /** TRAVERSE with LINEAGE (`$path`, SURVEY §2.B.3): the same
    * breadth-first loop as [[traverse]]/[[traverseUnbounded]], carrying
    * the id array of ONE canonical root-to-node path. Canonical =
    * minimal depth, ties to the lexicographically smallest id array —
    * deterministic and engine-independent, so a SQL oracle reproduces
    * it. The induction that makes one array per frontier row enough:
    * every minimal-depth-d path to a node runs through a parent whose
    * own minimal depth is exactly d−1 (a shallower parent would give
    * the node a shallower path), and all candidate arrays share length
    * d, so `min(parent.path) ++ node` IS the global minimum — computed
    * as ONE map-side-combinable min aggregate per (start, node), never
    * an enumeration of paths. Paths never revisit a node: the frontier
    * anti-joins the visited set, exactly like the path-free loops, so
    * cycles terminate (GraphSpec). `maxDepth` None runs to fixpoint.
    * Returns (start_id, node_id, depth, path) with path(0) = start_id
    * and path(depth) = node_id. */
  def traversePaths(startNodes: DataFrame, edgeLabels: Seq[String],
      direction: String, maxDepth: Option[Int],
      whileNode: Option[Column] = None): DataFrame = {
    val hop = hopRelation(edgeLabels, direction).localCheckpoint(true)
    val expandable = whileNode.map(p =>
      nodes.filter(p).select(col("id").as("node_id")).localCheckpoint(true))
    var frontier = startNodes.select(col("id").as("start_id"),
        col("id").as("node_id"), lit(0).as("depth"), array(col("id")).as("path"))
      .localCheckpoint(true)
    var visited = frontier
    var d = 0
    var drained = false
    while (!drained && maxDepth.forall(d < _)) {
      d += 1
      val expanding = expandable match {
        case Some(exp) if d > 1 => frontier.join(exp, Seq("node_id"), "left_semi")
        case _ => frontier // no guard, or the start frontier (always expands)
      }
      // candidate arrays fold through a partial-aggregated min on the
      // (start, node) key — the dedup the path-free loop does with
      // distinct(), with the canonical-path pick riding the same shuffle
      val reached = expanding.join(hop, expanding("node_id") === hop("from"))
        .select(col("start_id"), col("to").as("node_id"),
          concat(col("path"), array(col("to"))).as("path"))
        .groupBy(col("start_id"), col("node_id"))
        .agg(min(col("path")).as("path"))
        .localCheckpoint(true)
      if (reached.isEmpty) drained = true
      else {
        frontier = reached.join(visited.select("start_id", "node_id"),
          Seq("start_id", "node_id"), "left_anti")
          .select(col("start_id"), col("node_id"), lit(d).as("depth"), col("path"))
          .localCheckpoint(true)
        drained = frontier.isEmpty
        visited = visited.unionByName(frontier)
        if (d % 8 == 0) visited = visited.localCheckpoint(true)
      }
    }
    visited
  }

  /** The (from, to) relation a traversal expands over. Parallel edges
    * are collapsed up front: BFS reachability only needs edge
    * EXISTENCE, and deduping once here (e.g. SUPPLIED_BY carries one
    * row per lineitem, ~3× per distinct endpoint pair) shrinks every
    * downstream frontier join by the same factor — the multiplication
    * would otherwise be paid again at every depth. */
  private def hopRelation(edgeLabels: Seq[String], direction: String): DataFrame = {
    val es = edges.filter(col("label").isin(edgeLabels: _*))
    val hop = direction match {
      case "out" => es.select(col("src").as("from"), col("dst").as("to"))
      case "in" => es.select(col("dst").as("from"), col("src").as("to"))
      case "both" => es.select(col("src").as("from"), col("dst").as("to"))
        .unionByName(es.select(col("dst").as("from"), col("src").as("to")))
    }
    hop.distinct()
  }

  /** Unbounded `TRAVERSE … [WHILE <pred>]` (SURVEY §2.B.3): breadth-first
    * expansion run to FIXPOINT — the loop ends when the frontier is
    * empty, no depth bound required. Termination is guaranteed on any
    * graph, cyclic or not, because the frontier is left-anti-joined
    * against the visited set each step: (start, node) pairs are visited
    * at most once and the node set is finite, so the visited relation
    * grows strictly until the frontier drains. Each iteration is
    * materialized via `localCheckpoint` (lineage would otherwise grow
    * unboundedly — on a cluster, substitute a reliable `checkpoint`);
    * the per-step emptiness probe is a count over the just-materialized
    * blocks, not a recompute. Semantics match [[traverse]]: guarded
    * nodes are reported but not expanded; the start frontier always
    * expands; depth = minimal reach depth.
    */
  def traverseUnbounded(startNodes: DataFrame, edgeLabels: Seq[String],
      direction: String, whileNode: Option[Column] = None): DataFrame = {
    val hop = hopRelation(edgeLabels, direction).localCheckpoint(true) // reused every depth
    // guard relation built only when a guard exists — the unguarded form
    // must not pay a frontier×nodes semi-join per depth
    val expandable = whileNode.map(p =>
      nodes.filter(p).select(col("id").as("node_id")).localCheckpoint(true))
    var frontier = startNodes.select(col("id").as("start_id"), col("id").as("node_id"),
      lit(0).as("depth")).localCheckpoint(true)
    var visited = frontier
    var d = 0
    var drained = false
    while (!drained) {
      d += 1
      val expanding = expandable match {
        case Some(exp) if d > 1 => frontier.join(exp, Seq("node_id"), "left_semi")
        case _ => frontier // no guard, or the start frontier (always expands)
      }
      // reached is materialized BEFORE the visited anti-join: at the
      // draining depth the expansion comes up empty, and short-
      // circuiting here avoids shuffling the (by now largest) visited
      // relation one last useless time — AQE launches both join stages
      // concurrently, so the empty left side alone would not save it.
      // distinct excludes the constant depth tag so the dedup and the
      // anti-join share one (start_id, node_id) exchange.
      val reached = expanding.join(hop, expanding("node_id") === hop("from"))
        .select(col("start_id"), col("to").as("node_id"))
        .distinct()
        .localCheckpoint(true)
      if (reached.isEmpty) drained = true
      else {
        frontier = reached.join(visited.select("start_id", "node_id"),
          Seq("start_id", "node_id"), "left_anti")
          .select(col("start_id"), col("node_id"), lit(d).as("depth"))
          .localCheckpoint(true)
        drained = frontier.isEmpty
        visited = visited.unionByName(frontier)
        if (d % 8 == 0) visited = visited.localCheckpoint(true)
      }
    }
    visited
  }
}

/** A pattern-match in progress: `bound` holds the prefixed columns of
  * every binding so far; `cur` names the binding at the head. */
final case class Traversal(g: PropertyGraph, bound: DataFrame, cur: String) {

  private def prefixed(df: DataFrame, as: String): DataFrame =
    df.select(df.columns.map(c => col(c).as(s"${as}_$c")).toIndexedSeq: _*)

  /** Follow edges with `edgeLabel` out of the current binding into nodes
    * labeled `nodeLabel`, bound as `as`. `out('L'){as: b}`. */
  def out(edgeLabel: String, nodeLabel: String, as: String): Traversal =
    hop(edgeLabel, nodeLabel, as, reverse = false)

  /** `in('L')`: follow edges arriving at the current binding. */
  def in(edgeLabel: String, nodeLabel: String, as: String): Traversal =
    hop(edgeLabel, nodeLabel, as, reverse = true)

  /** `both('L')`: union of out and in. */
  def both(edgeLabel: String, nodeLabel: String, as: String): Traversal = {
    val o = hop(edgeLabel, nodeLabel, as, reverse = false)
    val i = hop(edgeLabel, nodeLabel, as, reverse = true)
    copy(bound = o.bound.unionByName(i.bound), cur = as)
  }

  private def hop(edgeLabel: String, nodeLabel: String, as: String,
      reverse: Boolean): Traversal = {
    val (fromCol, toCol) = if (reverse) ("dst", "src") else ("src", "dst")
    val e = g.edgesOf(edgeLabel)
    val eSel = prefixed(e, s"${as}_e")
    val joinedE = bound.join(eSel,
      bound(s"${cur}_id") === eSel(s"${as}_e_$fromCol"))
    val n = prefixed(g.nodesOf(nodeLabel), as)
    val joined = joinedE.join(n, joinedE(s"${as}_e_$toCol") === n(s"${as}_id"))
    Traversal(g, joined, as)
  }

  /** Label-untyped hops (the GraphQL surface: an edge label determines
    * its endpoints by construction, so the target node set is joined
    * without a label filter — same join shape, one filter fewer). */
  def outAny(edgeLabel: String, as: String): Traversal = hopAny(edgeLabel, as, reverse = false)
  def inAny(edgeLabel: String, as: String): Traversal = hopAny(edgeLabel, as, reverse = true)
  def bothAny(edgeLabel: String, as: String): Traversal = {
    val o = hopAny(edgeLabel, as, reverse = false)
    val i = hopAny(edgeLabel, as, reverse = true)
    copy(bound = o.bound.unionByName(i.bound), cur = as)
  }

  private def hopAny(edgeLabel: String, as: String, reverse: Boolean): Traversal = {
    val (fromCol, toCol) = if (reverse) ("dst", "src") else ("src", "dst")
    val eSel = prefixed(g.edgesOf(edgeLabel), s"${as}_e")
    val joinedE = bound.join(eSel,
      bound(s"${cur}_id") === eSel(s"${as}_e_$fromCol"))
    val n = prefixed(g.nodes, as)
    Traversal(g, joinedE.join(n, joinedE(s"${as}_e_$toCol") === n(s"${as}_id")), as)
  }

  /** `outE('L')`: stop at the edge level (SURVEY §2.B.3 edge-level hop);
    * edge columns prefixed `<as>_`. */
  def outE(edgeLabel: String, as: String): Traversal = {
    val eSel = prefixed(g.edgesOf(edgeLabel), as)
    Traversal(g, bound.join(eSel, bound(s"${cur}_id") === eSel(s"${as}_src")), as)
  }

  def inE(edgeLabel: String, as: String): Traversal = {
    val eSel = prefixed(g.edgesOf(edgeLabel), as)
    Traversal(g, bound.join(eSel, bound(s"${cur}_id") === eSel(s"${as}_dst")), as)
  }

  /** `inV()` / `outV()` after an edge-level hop: join the edge's dst/src
    * endpoint into nodes labeled `nodeLabel`. */
  def inV(nodeLabel: String, as: String): Traversal = endpoint(nodeLabel, as, "dst")
  def outV(nodeLabel: String, as: String): Traversal = endpoint(nodeLabel, as, "src")

  private def endpoint(nodeLabel: String, as: String, end: String): Traversal = {
    val n = prefixed(g.nodesOf(nodeLabel), as)
    Traversal(g, bound.join(n, bound(s"${cur}_$end") === n(s"${as}_id")), as)
  }

  /** `{…, optional: true}` hop (MATCH's left-join step): the edge and
    * its target node — filtered by the node's own `where` BEFORE the
    * join, like Cypher's OPTIONAL MATCH — LEFT-join onto the pattern,
    * so an unmatched row survives with null `<as>_*` columns instead
    * of being dropped. Same equi-join shape as the inner hop (the edge
    * → node join runs first, then one left equi-join on the binding
    * key), so the plan stays broadcast/shuffle-joinable at scale. */
  def hopOptional(dir: String, edgeLabel: String, nodeLabel: Option[String],
      as: String, nodeFilter: Option[Column]): Traversal = {
    def side(reverse: Boolean): DataFrame = {
      val (fromCol, toCol) = if (reverse) ("dst", "src") else ("src", "dst")
      val eSel = prefixed(g.edgesOf(edgeLabel), s"${as}_e")
      val n = prefixed(nodeLabel.map(g.nodesOf).getOrElse(g.nodes), as)
      eSel.join(n, eSel(s"${as}_e_$toCol") === n(s"${as}_id"))
        .withColumn(s"__${as}_from", col(s"${as}_e_$fromCol"))
    }
    val hopF0 = dir match {
      case "out" => side(false)
      case "in" => side(true)
      case "both" => side(false).unionByName(side(true))
      case other => throw new IllegalArgumentException(s"bad hop direction: $other")
    }
    val hopF = nodeFilter.map(hopF0.filter).getOrElse(hopF0)
    val joined = bound.join(hopF, bound(s"${cur}_id") === hopF(s"__${as}_from"), "left")
      .drop(s"__${as}_from")
    Traversal(g, joined, as)
  }

  def filter(cond: Column): Traversal = copy(bound = bound.filter(cond))
  def result: DataFrame = bound
}
