package graft

import org.apache.spark.sql.functions._
import graft.load.GraphLoader
import graft.query.PropertyGraph
import graft.graphx.GraphXBridge

/** Traversal combinators (SURVEY §2.B.3) and GraphX analytics against
  * the sf0.001 graph, cross-checked with relational ground truth. */
class GraphSpec extends SparkSpec {

  lazy val g = PropertyGraph(GraphLoader.nodes(spark, sfDir), GraphLoader.edges(spark, sfDir))

  test("out(): Customer-PLACED->Order matches orders count") {
    val hops = g.v("Customer", "c").out("PLACED", "Order", "o").result
    assert(hops.count() == spark.read.parquet(s"$sfDir/orders.parquet").count())
  }

  test("in() equals out() with reversed direction") {
    val inn = g.v("Order", "o").in("PLACED", "Customer", "c").result.count()
    val out = g.v("Customer", "c").out("PLACED", "Order", "o").result.count()
    assert(inn == out)
  }

  test("outE/inV chain: order→lineitem→part equals lineitem count") {
    val r = g.v("Order", "o").outE("CONTAINS", "l").inV("Part", "p").result
    assert(r.count() == spark.read.parquet(s"$sfDir/lineitem.parquet").count())
  }

  test("traverse: minimal-depth BFS with dedup (region in*1..2)") {
    val t = g.traverse(g.nodesOf("Region"), Seq("IN_REGION", "IN_NATION"), "in", 2)
    val d1 = t.filter(col("depth") === 1).count()
    val d2 = t.filter(col("depth") === 2).count()
    assert(d1 == 25) // nations
    assert(d2 == 160) // customers + suppliers
    // no node appears at two depths for the same start
    assert(t.groupBy("start_id", "node_id").count().filter(col("count") > 1).count() == 0)
  }

  test("degree: outDegree(PLACED) sums to order count") {
    val deg = g.outDegree("PLACED").agg(sum("degree")).collect()(0).getLong(0)
    assert(deg == 1500)
  }

  test("GraphX connectedComponents: one component per region on IN_REGION") {
    val cc = GraphXBridge.connectedComponents(spark, g, Seq("IN_REGION"))
    assert(cc.select("component").distinct().count() == 5)
    assert(cc.count() == 30) // 25 nations + 5 regions
  }

  test("GraphX shortestPaths: customers are 2 hops from their region") {
    val sp = GraphXBridge.shortestPathsTo(spark, g, Seq("IN_NATION", "IN_REGION"),
      (0L until 5L).toSeq)
      .filter(col("id") >= GraphLoader.CustomerOff && col("id") < GraphLoader.SupplierOff)
    assert(sp.count() == 150) // each customer reaches exactly one region
    assert(sp.filter(col("dist") =!= 2).count() == 0)
  }

  test("GraphX dijkstra: supplier0 distances up the hierarchy") {
    val d = GraphXBridge.dijkstra(spark, g, Seq("IN_NATION", "IN_REGION"),
      lit(1.0), GraphLoader.SupplierOff).collect()
    assert(d.length == 3) // self, nation, region
    assert(d.map(_.getDouble(1)).sorted.toSeq == Seq(0.0, 1.0, 2.0))
  }

  test("saltedJoin is bag-equal to the plain equi-join") {
    import graft.query.Skew
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val part = spark.read.parquet(s"$sfDir/part.parquet")
    val plain = li.join(part, li("l_partkey") === part("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_name")
    val salted = Skew.saltedJoin(li, part, "l_partkey", "p_partkey", 8)
      .select("l_orderkey", "l_linenumber", "p_name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("keyProfile surfaces the hottest join keys") {
    import graft.query.Skew
    val prof = Skew.keyProfile(
      spark.read.parquet(s"$sfDir/lineitem.parquet"), "l_returnflag", 3).collect()
    assert(prof.length == 3 && prof(0).getLong(1) >= prof(1).getLong(1))
  }

  test("PageRank is stable across runs (fixed iterations, up to float reduce order)") {
    // message combining reduces doubles in nondeterministic partition
    // order, so runs agree only to ~1e-12 relative — which is why the
    // pagerank query has no hashed oracle (rows-only check) and rounds
    val a = GraphXBridge.pageRank(spark, g, 5).orderBy(col("id")).collect()
    val b = GraphXBridge.pageRank(spark, g, 5).orderBy(col("id")).collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))
      assert(math.abs(x.getDouble(1) - y.getDouble(1)) < 1e-9)
    }
  }
}
