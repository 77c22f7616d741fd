package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition over an undirected canonical (a < b) edge list
  * — the degeneracy / dense-subgraph primitive beside triangles and
  * connected components (ArcadeDB exposes graph analytics through
  * Gremlin, which the reference does not depend on; this is the
  * Spark-native member of the §2.B.12 analytics family).
  *
  * Peeling is an inherently ITERATIVE fixpoint (recompute degrees,
  * drop vertices under k, repeat until stable), so like BPE learning
  * it is spec-proven rather than oracle-twinned: a DuckDB recursive
  * CTE cannot express shrink-until-fixpoint (its working-table
  * semantics either terminate on repeated rows before the fixpoint is
  * observable or never terminate on an iteration tag).
  *
  * Scale: every iteration is one vertex-keyed degree aggregate
  * (map-side combinable) + two edge-sized LEFT SEMI probes — nothing
  * ever shuffles more than the current edge set, and the set only
  * shrinks. The per-iteration driver traffic is ONE count (loop
  * control, 1 row — the config-sized discipline). Edge sets are
  * localCheckpoint'ed per round so lineage stays flat across the
  * fixpoint loop. Round count is bounded by the peel depth (the
  * degeneracy ordering's longest cascade), the classic distributed
  * k-core bound.
  */
object KCore {

  /** The k-core: the maximal subgraph where every vertex has degree
    * ≥ k. Returns the surviving vertices with their IN-CORE degrees
    * (n, deg) — empty when no such subgraph exists. */
  def kCore(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be at least 1")
    coreEdges(edges.select(col("a"), col("b")).localCheckpoint(true), k) match {
      case None => degrees(edges).filter(lit(false)) // empty, schema kept
      case Some(e) => degrees(e)
    }
  }

  /** Per-vertex CORENESS (the largest k whose k-core contains the
    * vertex), by monotone peeling: the (k+1)-core is a subgraph of the
    * k-core, so each level starts from the previous level's survivors
    * — the total work telescopes instead of restarting from the full
    * graph per level. `maxK` bounds the loop (vertices still in the
    * maxK-core report coreness = maxK). Returns (n, core ≥ 1);
    * isolated input vertices never appear (an edge list carries none).
    */
  def coreness(edges: DataFrame, maxK: Int = 64): DataFrame = {
    require(maxK >= 1, "maxK must be at least 1")
    var cur = edges.select(col("a"), col("b")).distinct().localCheckpoint(true)
    var out = degrees(cur).select(col("n"), lit(1).as("core")).filter(lit(false))
    var k = 1
    var done = false
    while (k <= maxK && !done) {
      coreEdges(cur, k) match {
        case None => // k-core empty: everything left peels at k-1
          out = out.unionByName(
            degrees(cur).select(col("n"), lit(k - 1).as("core")))
          done = true
        case Some(e) =>
          val inCore = degrees(e).select(col("n"))
          val dropped = degrees(cur).select(col("n"))
            .join(inCore, Seq("n"), "left_anti")
            .select(col("n"), lit(k - 1).as("core"))
          out = out.unionByName(dropped).localCheckpoint(true)
          cur = e
          if (k == maxK)
            out = out.unionByName(inCore.select(col("n"), lit(k).as("core")))
          k += 1
      }
    }
    out.filter(col("core") >= 1)
  }

  private def degrees(e: DataFrame): DataFrame =
    e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))

  /** Fixpoint edge set of the k-core, or None when it is empty. */
  private def coreEdges(edges: DataFrame, k: Int): Option[DataFrame] = {
    var e = edges
    var prev = -1L
    var cur = e.count()
    while (cur != prev && cur > 0) {
      val keep = degrees(e).filter(col("deg") >= k).select(col("n"))
      val ne = e
        .join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
        .localCheckpoint(true)
      prev = cur
      cur = ne.count() // 1-row loop control — the only driver traffic
      e = ne
    }
    if (cur == 0) None else Some(e)
  }
}
