package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DETERMINISTIC random walks over an undirected canonical (a < b)
  * edge list — the DeepWalk/node2vec corpus generator (Perozzi et al.,
  * KDD 2014; Grover & Leskovec, KDD 2016): graph-embedding training
  * data is walks-as-sentences, and at 100 TB the walk generator must
  * be replayable (a re-run of a failed shard must emit the SAME walks)
  * and auditable — so the "randomness" is a salted md5 of
  * (salt, start, step, current), exactly the
  * [[graft.llmops.Pipeline.samplePct]] doctrine: change the salt for a
  * fresh walk set, keep it for a bit-identical re-run. That also makes
  * the operator SQL-expressible — the DuckDB twin replays every hop
  * (`graph_random_walks` is hash-green), which is the strongest
  * correctness statement available for a sampler.
  *
  * Shape (VERDICT r13 watch #1 — the earlier `collect_list` adjacency
  * made a 10M-degree hub ONE giant row): the adjacency is kept in ROW
  * form, (u, idx, w) with idx = the neighbor's 1-based rank in sorted
  * order (a per-vertex window — partial-sorted per key, never a global
  * row_number), beside a vertex-sized degree frame. Each step is then
  * one vertex-sized join (degree → pick = h mod deg + 1) and one
  * (u, idx)-keyed equi join (pick → neighbor) — a mega-hub's adjacency
  * stays deg ordinary rows spread across partitions, and each walk
  * probes exactly one of them. The walk table stays one row per start
  * for the whole run (the path accumulates in-row). No vertex in the
  * bidirectional view is a dead end, so walks never truncate. The
  * chosen neighbor is IDENTICAL to the list form's `nbrs[pick]`
  * (sorted rank = sorted-array index), so the r13 oracle replay holds
  * unchanged.
  *
  * Returns (start, walk) with the walk as a "v0->v1->…" string (the
  * array-stringify comparison discipline of `asql_hop_projection`). */
object RandomWalks {

  /** (adjacency rows (u, idx, w) sorted-rank-indexed, degree frame
    * (u, deg)) for the bidirectional view of a canonical edge list. */
  private def adjacency(edges: DataFrame): (DataFrame, DataFrame) = {
    val e = edges.select(col("a"), col("b")).distinct()
    val bi = e.select(col("a").as("u"), col("b").as("w"))
      .unionAll(e.select(col("b").as("u"), col("a").as("w")))
    val adj = bi.withColumn("idx",
        row_number().over(Window.partitionBy(col("u")).orderBy(col("w"))))
      .localCheckpoint(true) // probed once per step
    val deg = adj.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true) // vertex-sized, probed once per step
    (adj, deg)
  }

  def randomWalks(edges: DataFrame, salt: String, length: Int): DataFrame = {
    require(length >= 1, "walks need at least one step")
    val (adj, deg) = adjacency(edges)
    var st = deg.select(col("u").as("start"), col("u").as("cur"),
      col("u").cast("string").as("walk"))
    (1 to length).foreach { t =>
      val h = graft.llmops.TextOps.md5Hash32(concat_ws("|",
        lit(salt), col("start").cast("string"), lit(t.toString),
        col("cur").cast("string")))
      val pick = st.join(deg, st("cur") === deg("u"))
        .select(col("start"), col("cur"), col("walk"),
          ((h % col("deg")) + 1).cast("int").as("__pick"))
      st = pick.join(adj,
          pick("cur") === adj("u") && pick("__pick") === adj("idx"))
        .select(col("start"), col("w").as("cur"),
          concat(col("walk"), lit("->"), col("w").cast("string"))
            .as("walk"))
    }
    st.select(col("start"), col("walk"))
  }
}
