package graft.graphx

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.graphx.lib.ShortestPaths
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.query.PropertyGraph

/** GraphX bridge for iterative graph analytics (BASELINE.json
  * spark_approach: "GraphX for batch graph analytics" — analytics only;
  * bulk relational hops stay DataFrame joins, SURVEY §7).
  *
  * The reference exposes `shortestPath`/`dijkstra`/TRAVERSE through
  * ArcadeDB SQL (SURVEY §2.B.3 [dep]); unbounded/iterative forms cannot
  * be one Catalyst plan, so they run as Pregel jobs here. Vertex
  * attributes are kept to the minimum the algorithm needs (never whole
  * property rows) so the shuffled state stays small at scale.
  */
object GraphXBridge {

  /** Materialize the (small, vertex-sized) result eagerly, then release
    * every cached graph: Pregel/GraphX pin RDDs at MEMORY_AND_DISK, and
    * leaving them resident starves later queries of executor memory
    * (observed: a 10× slowdown of unrelated queries run after a GraphX
    * job in the same session). */
  private def finish(df: DataFrame, graphs: Graph[_, _]*): DataFrame = {
    val out = df.localCheckpoint(true)
    graphs.foreach(_.unpersist(blocking = false))
    out
  }

  /** Project a PropertyGraph down to a GraphX topology (ids only). */
  def toGraphX(g: PropertyGraph, edgeLabels: Seq[String] = Nil): Graph[Unit, String] = {
    val es = (if (edgeLabels.isEmpty) g.edges
              else g.edges.filter(col("label").isin(edgeLabels: _*)))
      .select("src", "dst", "label").rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), r.getString(2)))
    val vs = g.nodes.select("id").rdd.map(r => (r.getLong(0), ()))
    Graph(vs, es, (), StorageLevel.MEMORY_AND_DISK, StorageLevel.MEMORY_AND_DISK)
  }

  /** Connected components over a label-restricted subgraph; vertices are
    * those incident to the subgraph's edges (isolated nodes would
    * otherwise flood the result with singleton components). Returns
    * (id, component) with component = min vertex id, GraphX's canonical
    * representative. */
  def connectedComponents(spark: SparkSession, g: PropertyGraph,
      edgeLabels: Seq[String]): DataFrame = {
    import spark.implicits._
    val es = g.edges.filter(col("label").isin(edgeLabels: _*))
      .select("src", "dst").rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val base = Graph.fromEdges(es, (), StorageLevel.MEMORY_AND_DISK,
      StorageLevel.MEMORY_AND_DISK)
    val cc = base.connectedComponents()
    finish(cc.vertices.map { case (id, comp) => (id, comp) }.toDF("id", "component"),
      base, cc)
  }

  /** Landmark shortest-path distances (unweighted BFS Pregel), the
    * `shortestPath(a, b)` equivalent. Returns (id, landmark, dist). */
  def shortestPathsTo(spark: SparkSession, g: PropertyGraph,
      edgeLabels: Seq[String], landmarks: Seq[VertexId]): DataFrame = {
    import spark.implicits._
    val base = toGraphX(g, edgeLabels)
    val res = ShortestPaths.run(base, landmarks)
    finish(res.vertices.flatMap { case (id, spmap) =>
      spmap.map { case (lm, d) => (id, lm, d) }
    }.toDF("id", "landmark", "dist"), base, res)
  }

  /** Fixed-iteration PageRank (deterministic given iteration count). */
  def pageRank(spark: SparkSession, g: PropertyGraph, iters: Int,
      resetProb: Double = 0.15): DataFrame = {
    import spark.implicits._
    val base = toGraphX(g)
    val res = base.staticPageRank(iters, resetProb)
    finish(res.vertices.map { case (id, pr) => (id, pr) }.toDF("id", "pagerank"),
      base, res)
  }

  /** Weighted single-source shortest path (the `dijkstra(a,b,'w')`
    * equivalent) via Pregel over double weights. `weight` is any Column
    * over the edge row (a property or a constant). */
  def dijkstra(spark: SparkSession, g: PropertyGraph, edgeLabels: Seq[String],
      weight: org.apache.spark.sql.Column, source: VertexId): DataFrame = {
    import spark.implicits._
    val es = g.edges.filter(col("label").isin(edgeLabels: _*))
      .select(col("src"), col("dst"), weight.cast("double").as("w")).rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), r.getDouble(2)))
    val graph = Graph.fromEdges(es, Double.PositiveInfinity,
      StorageLevel.MEMORY_AND_DISK, StorageLevel.MEMORY_AND_DISK)
      .mapVertices((id, _) => if (id == source) 0.0 else Double.PositiveInfinity)
    val res = graph.pregel(Double.PositiveInfinity)(
      (_, dist, msg) => math.min(dist, msg),
      t => if (t.srcAttr + t.attr < t.dstAttr) Iterator((t.dstId, t.srcAttr + t.attr))
           else Iterator.empty,
      (a, b) => math.min(a, b))
    finish(res.vertices.filter(_._2 < Double.PositiveInfinity)
      .map { case (id, d) => (id, d) }.toDF("id", "dist"), graph, res)
  }
}
