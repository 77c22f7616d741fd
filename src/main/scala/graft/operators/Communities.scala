package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community detection by SYNCHRONOUS label propagation over an
  * undirected canonical (a < b) edge list — the near-linear community
  * primitive beside connected components (which merges everything
  * touching) and k-core (which strips by density). Like k-core it is
  * an inherently iterative fixpoint, so it is spec-proven rather than
  * oracle-twinned.
  *
  * Determinism: all vertices update SIMULTANEOUSLY each round (no
  * processing-order dependence — the asynchronous variant's
  * nondeterminism is exactly what this forfeits), each taking the most
  * frequent label among its neighbors with ties to the SMALLEST label
  * (encoded as `max(struct(cnt, −label))`, exact for any id >
  * Long.MinValue). Labels initialize to vertex ids. Synchronous LPA
  * can oscillate on bipartite-like structures, so the loop runs a
  * FIXED `iters` rounds (the GraphX LabelPropagation contract) rather
  * than to convergence.
  *
  * Scale: each round is one edge-sized join (labels onto the
  * bidirectional edge list) + one (vertex, label)-keyed
  * map-side-combinable count + one vertex-keyed argmax — nothing
  * shuffles more than the directed edge set; labels checkpoint per
  * round to keep lineage flat. Returns (n, community). */
object Communities {

  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "need at least one round")
    val e = edges.select(col("a"), col("b")).localCheckpoint(true)
    val bi = e.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
    var labels = bi.select(col("src").as("n")).distinct()
      .select(col("n"), col("n").as("community"))
      .localCheckpoint(true)
    (1 to iters).foreach { _ =>
      val prev = labels
      labels = bi
        .join(labels.withColumnRenamed("n", "src"), Seq("src"))
        .groupBy(col("dst").as("n"), col("community").as("lbl"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("n"))
        .agg(max(struct(col("cnt"), (-col("lbl")).as("neg"))).as("__m"))
        .select(col("n"), (-col("__m.neg")).as("community"))
        .localCheckpoint(true)
      prev.unpersist()
    }
    labels
  }
}
