package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** Canonical co-occurrence edge list from a (group, item) membership
    * table: items sharing a group get an undirected edge (a < b),
    * distinct across groups. The self-join is per-group QUADRATIC in
    * group size — the standard market-basket bound — so groups larger
    * than `maxGroupSize` are dropped first (the df-cap discipline: a
    * degenerate mega-group adds no community signal and would dominate
    * the join; the cap bounds work at cap² × groups). */
  def cooccurrenceEdges(membership: DataFrame, groupCol: String,
      itemCol: String, maxGroupSize: Int = 50): DataFrame = {
    require(maxGroupSize >= 2, "groups below 2 members carry no edges")
    val m = membership.select(col(groupCol).as("g"), col(itemCol).as("i")).distinct()
    val ok = m.groupBy(col("g")).agg(count(lit(1)).as("sz"))
      .filter(col("sz") <= maxGroupSize).select(col("g"))
    val mm = m.join(ok, Seq("g"), "left_semi")
    mm.as("x").join(mm.as("y"), Seq("g"))
      .filter(col("x.i") < col("y.i"))
      .select(col("x.i").as("a"), col("y.i").as("b"))
      .distinct()
  }

  /** Total triangle count of a canonical (a < b) undirected edge list.
    * Returns one row (n_triangles). */
  def triangleCount(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a"), col("b"))
    val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.select(col("n").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("deg").as("db")), Seq("b"))
    val aFirst = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    val oe = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"))
    val wedges = oe.as("e1").join(oe.as("e2"), col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("u"), col("e1.dst").as("v"), col("e2.dst").as("w"))
    wedges.join(oe.as("e3"),
        col("u") === col("e3.src") && col("w") === col("e3.dst"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Per-vertex triangle participation (top-k by count, ties → id): the
    * local-clustering numerator. Each closed wedge credits all three
    * corners; the credit explode is output-sized (3 rows per triangle)
    * and the tail is one vertex-keyed aggregate + TakeOrdered. */
  def topTriangleVertices(edges: DataFrame, k: Int): DataFrame = {
    val e = edges.select(col("a"), col("b"))
    val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.select(col("n").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("deg").as("db")), Seq("b"))
    val aFirst = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    val oe = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"))
    val closed = oe.as("e1").join(oe.as("e2"), col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("u"), col("e1.dst").as("v"), col("e2.dst").as("w"))
      .join(oe.as("e3"),
        col("u") === col("e3.src") && col("w") === col("e3.dst"), "left_semi")
    closed.select(explode(array(col("u"), col("v"), col("w"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("n_triangles").desc, col("n").asc).limit(k)
  }
}
