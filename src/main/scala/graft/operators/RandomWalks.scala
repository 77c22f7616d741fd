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
  * row_number), beside a vertex-sized degree frame. Each step is a
  * vertex-sized pick join (degree → pick = h mod deg + 1; the salted
  * md5 evaluates ONCE PER WALK here — folding the pick into the
  * adjacency join as a residual predicate was measured 2× worse, the
  * hash re-evaluating per candidate row) followed by a (u, idx)-keyed
  * equi join into the adjacency rows — a mega-hub stays deg ordinary
  * rows spread across partitions, each walk probes exactly one (the
  * GraphProbe planted-hub posture: hub wall ≡ un-hubbed wall). The
  * walk table stays one row per start for the whole run (the path
  * accumulates in-row). No vertex in the bidirectional view is a dead
  * end, so walks never truncate. The chosen neighbor is IDENTICAL to
  * the list form's `nbrs[pick]` (sorted rank = sorted-array index),
  * so the r13 oracle replay holds unchanged.
  *
  * Returns (start, walk) with the walk as a "v0->v1->…" string (the
  * array-stringify comparison discipline of `asql_hop_projection`). */
object RandomWalks {

  /** (adjacency rows (u, idx, w, deg) sorted-rank-indexed with the
    * vertex degree ON each row, degree frame (u, deg)) for the
    * bidirectional view of a canonical edge list. */
  private def adjacency(edges: DataFrame): (DataFrame, DataFrame) = {
    val e = edges.select(col("a"), col("b")).distinct()
    val bi = e.select(col("a").as("u"), col("b").as("w"))
      .unionAll(e.select(col("b").as("u"), col("a").as("w")))
    val byU = Window.partitionBy(col("u"))
    val adj = bi
      .withColumn("idx", row_number().over(byU.orderBy(col("w"))))
      .withColumn("deg", count(lit(1)).over(byU))
      .localCheckpoint(true) // probed once per step
    val deg = adj.groupBy(col("u")).agg(first(col("deg")).as("deg"))
      .localCheckpoint(true) // vertex-sized
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

  /** node2vec BIASED walks (Grover & Leskovec, KDD 2016) on the same
    * replayable-salt doctrine as [[randomWalks]]: per step, each
    * candidate neighbor w of the current vertex weighs
    *
    *   - `wReturn` when w IS the previous vertex (the 1/p return bias),
    *   - `wIn`     when w is a neighbor of the previous vertex
    *               (distance 1 — the BFS-ish stay-local bias),
    *   - `wOut`    otherwise (distance 2 — the DFS-ish explore bias,
    *               1/q),
    *
    * with the weights as INTEGERS (the caller scales 1/p and 1/q to
    * exact integers — e.g. p = 2, q = 2 at scale 4 is (2, 4, 2)), so
    * the weighted choice is EXACT arithmetic: r = h mod Σwt, pick the
    * first candidate (sorted-neighbor order) whose cumulative weight
    * exceeds r. No transcendentals, no floats — the DuckDB twin
    * replays every hop bit-identically (`graph_node2vec`), which a
    * Gumbel/exponential race could never promise across engines.
    *
    * Step 1 has no previous vertex (prev = cur seeds it): no candidate
    * equals prev (the canonical list carries no self-loops) and every
    * candidate is a neighbor of prev — all `wIn`, i.e. the standard
    * uniform first step. Shape: per step one candidate expansion
    * (walk ⋈ adjacency rows — Σ deg(cur) rows, edge-bounded), one
    * edge-marker anti-probe (is (prev, w) an edge — a left join on the
    * bidirectional set), and a per-walk cumulative window whose
    * partition is ONE vertex's candidate list (deg-sized — the skew
    * bound is walks-at-hub × deg, not a materialized giant row). */
  def node2vecWalks(edges: DataFrame, salt: String, length: Int,
      wReturn: Long, wIn: Long, wOut: Long): DataFrame = {
    require(length >= 1, "walks need at least one step")
    require(wReturn > 0 && wIn > 0 && wOut > 0, "weights must be positive")
    val (adj, deg) = adjacency(edges)
    val marker = adj.select(col("u").as("__mu"), col("w").as("__mw"),
      lit(true).as("__isNbr"))
    var st = deg.select(col("u").as("start"), col("u").as("prev"),
      col("u").as("cur"), col("u").cast("string").as("walk"))
    (1 to length).foreach { t =>
      val h = graft.llmops.TextOps.md5Hash32(concat_ws("|",
        lit(salt), col("start").cast("string"), lit(t.toString),
        col("cur").cast("string"), col("prev").cast("string")))
      val byWalk = Window.partitionBy(col("start"))
      val cands = st.join(adj, st("cur") === adj("u"))
        .join(marker,
          col("prev") === col("__mu") && col("w") === col("__mw"), "left")
        .withColumn("__wt",
          when(col("w") === col("prev"), lit(wReturn))
            .when(col("__isNbr").isNotNull, lit(wIn))
            .otherwise(lit(wOut)))
        .withColumn("__cum", sum(col("__wt")).over(byWalk.orderBy(col("idx"))))
        .withColumn("__tot", sum(col("__wt")).over(byWalk))
      st = cands.filter(col("__cum") > (h % col("__tot")))
        .groupBy(col("start"), col("cur"), col("walk"))
        .agg(min(struct(col("idx"), col("w"))).as("__m"))
        .select(col("start"), col("cur").as("prev"),
          col("__m.w").as("cur"),
          concat(col("walk"), lit("->"), col("__m.w").cast("string"))
            .as("walk"))
    }
    st.select(col("start"), col("walk"))
  }
}
