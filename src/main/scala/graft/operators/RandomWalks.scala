package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DETERMINISTIC random walks over an undirected canonical (a < b)
  * edge list — the DeepWalk/node2vec corpus generator (Perozzi et al.,
  * KDD 2014): graph-embedding training data is walks-as-sentences, and
  * at 100 TB the walk generator must be replayable (a re-run of a
  * failed shard must emit the SAME walks) and auditable — so the
  * "randomness" is a salted md5 of (salt, start, step, current),
  * exactly the [[graft.llmops.Pipeline.samplePct]] doctrine: change
  * the salt for a fresh walk set, keep it for a bit-identical re-run.
  * That also makes the operator SQL-expressible — the DuckDB twin
  * replays every hop (`graph_random_walks` is hash-green), which is
  * the strongest correctness statement available for a sampler.
  *
  * Shape: ONE materialized adjacency frame (vertex → sorted neighbor
  * list + degree — the [[graft.query.ArcadeSql]] hop-projection
  * frame), then `length` equi joins of the walk table against it; the
  * walk table stays one row per start for the whole run (the path
  * accumulates in-row). No vertex in the bidirectional view is a dead
  * end, so walks never truncate. Neighbor lists are degree-sized —
  * the co-occurrence caps upstream bound them exactly like the
  * triangle family's adjacency intersection.
  *
  * Returns (start, walk) with the walk as a "v0->v1->…" string (the
  * array-stringify comparison discipline of `asql_hop_projection`). */
object RandomWalks {

  def randomWalks(edges: DataFrame, salt: String, length: Int): DataFrame = {
    require(length >= 1, "walks need at least one step")
    val e = edges.select(col("a"), col("b")).distinct()
    val bi = e.select(col("a").as("u"), col("b").as("w"))
      .unionAll(e.select(col("b").as("u"), col("a").as("w")))
    val adj = bi.groupBy(col("u"))
      .agg(sort_array(collect_list(col("w"))).as("nbrs"),
        count(lit(1)).as("deg"))
      .localCheckpoint(true) // probed once per step
    var st = adj.select(col("u").as("start"), col("u").as("cur"),
      col("u").cast("string").as("walk"))
    (1 to length).foreach { t =>
      val h = graft.llmops.TextOps.md5Hash32(concat_ws("|",
        lit(salt), col("start").cast("string"), lit(t.toString),
        col("cur").cast("string")))
      st = st.join(adj, st("cur") === adj("u"))
        .withColumn("__nxt",
          element_at(col("nbrs"), ((h % col("deg")) + 1).cast("int")))
        .select(col("start"), col("__nxt").as("cur"),
          concat(col("walk"), lit("->"), col("__nxt").cast("string"))
            .as("walk"))
    }
    st.select(col("start"), col("walk"))
  }
}
