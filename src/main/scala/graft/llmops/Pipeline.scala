package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline composition (SURVEY §2.B.12 north star): the
  * corpus-prep operators a 100 TB pretraining job chains AFTER the
  * per-document metrics — gating, deterministic sampling, shard
  * packing. All decisions are pure column arithmetic (md5-seeded where
  * randomness is wanted), so reruns are idempotent and the DuckDB
  * oracle reproduces every decision bit-for-bit — the property that
  * makes a data pipeline auditable.
  */
object Pipeline {

  /** Row ceiling for the FORCED eval-sized broadcasts ([[deconReport]],
    * [[noveltyScore]]): a `broadcast()` hint overrides
    * `autoBroadcastJoinThreshold`, so a caller handing a corpus-scale
    * frame to the "eval-sized by contract" side would OOM every
    * executor building the hash relation instead of failing the plan.
    * The guard counts the (already materialized) side and refuses
    * loudly with the measured size. 20 M distinct shingle rows ≈ a few
    * hundred MB of hash relation per executor — about where a forced
    * broadcast stops being the right plan on any realistic executor. */
  val MaxBroadcastRows: Long = 20L * 1000 * 1000

  /** Materialize an eval-sized frame, measure it, and refuse the
    * forced broadcast beyond `maxRows` (overridable for tests). The
    * localCheckpoint doubles as the broadcast input's materialization,
    * so the guard count reads cached blocks, and the join never
    * re-derives the frame. */
  private def guardBroadcastSize(df: DataFrame, what: String,
      maxRows: Long): DataFrame = {
    val m = df.localCheckpoint(true)
    val n = m.count()
    require(n <= maxRows,
      s"$what has $n rows — beyond the forced-broadcast ceiling ($maxRows): " +
        "this side is eval-sized by contract; a corpus-scale frame here " +
        "needs a shuffled-join formulation, not a forced broadcast")
    m
  }

  /** Driver-resident capped stupid-backoff LM model (parallel column
    * seqs, sorted/indexed inside [[graft.plans.LmXent]]): top-k bigram
    * rows (key hash, count, prefix count), top-k unigram rows
    * (key hash, count), and the reference token total. Config-sized by
    * the top-k contract. */
  case class LmModel(bgKeys: Seq[Long], bgC2: Seq[Long], bgC1p: Seq[Long],
      uniKeys: Seq[Long], uniC1: Seq[Long], nRef: Long)

  /** Corpus prep gate + exact dedup, the canonical prep chain:
    * keep documents whose predicted language agrees with the label
    * (cheap LID quality gate), whose token count is in bounds, then
    * collapse exact duplicates keeping the smallest doc_id.
    * Scale: gates are map-only; the dedup is ONE hash-agg shuffle on
    * the text key. */
  def prepCorpus(docs: DataFrame, minTokens: Int, maxTokens: Int): DataFrame =
    docs
      .withColumn("pred_lang", TextOps.predictLang(col("text")))
      .withColumn("n_tokens", size(TextOps.tokens(col("text"))))
      .filter(col("pred_lang") === col("lang") &&
        col("n_tokens").between(minTokens, maxTokens))
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"),
        min_by(col("lang"), col("doc_id")).as("lang"),
        max(col("n_tokens")).as("n_tokens"), // constant within a text group
        count(lit(1)).as("n_copies"))
      .select("doc_id", "lang", "n_tokens", "n_copies")

  /** Deterministic percent-bucket for an id: md5-fold of salt+id in
    * [0, 100). Sampling by hash instead of rand() makes the sample
    * stable across reruns and cluster sizes — rerunning the pipeline on
    * the same corpus yields the same sample (idempotent backfills). */
  def samplePct(id: Column, salt: String): Column =
    TextOps.md5Hash32(concat(lit(salt), id.cast("string"))) % 100

  /** Default absolute budget for driver-side threshold samples: ~50k
    * doubles (≈400 KB collected), the size the ×100 E2E has always
    * collected — now an INVARIANT of the corpus size instead of a
    * proportion of it (VERDICT r16 watch #1). */
  val SampleBudgetDocs: Long = 50000L

  /** Size-capped sample rate in 1e-7 units (per ten million): the rate
    * that lands ~`targetDocs` expected hits at corpus size `n`, capped
    * ABOVE by `basePct` (the historical fixed rate) so a small corpus
    * keeps today's exact sample, and BELOW by one granule. Expected
    * sample size is ≤ targetDocs + n·10⁻⁷ — bounded by 2·targetDocs
    * for any corpus up to 10¹² documents (granularity floor), where
    * the old fixed 10 % would collect 10¹¹. */
  def sampleRate7(n: Long, targetDocs: Long, basePct: Int): Long = {
    require(targetDocs > 0, s"sample budget must be positive, got $targetDocs")
    require(basePct >= 1 && basePct <= 100, s"base percent out of range: $basePct")
    val cap = basePct * 100000L
    if (n <= 0) cap
    else math.min(cap, math.max(1L, (10000000L * targetDocs + n - 1) / n))
  }

  /** Budget-capped deterministic sample filter (VERDICT r16 watch #1 /
    * r17 order #4): selects an expected `min(basePct% · n, ~targetDocs)`
    * documents. Built so that whenever the computed rate is a WHOLE
    * percent (in particular whenever the budget doesn't bind and the
    * rate caps at `basePct`), the selected set is EXACTLY the
    * historical `samplePct(id, salt) < basePct` set — the sub-percent
    * residue refines WITHIN the next percent bucket through an
    * independent salt, so engaging the cap never reshuffles the
    * already-selected percent buckets. One driver-side rate decision
    * (callers pass `n` from a single count aggregate), map-only
    * evaluation. */
  def sampleBudget(id: Column, salt: String, n: Long, targetDocs: Long,
      basePct: Int = 10): Column = {
    val r7 = sampleRate7(n, targetDocs, basePct)
    val whole = (r7 / 100000L).toInt
    val frac = (r7 % 100000L).toInt
    val pct = samplePct(id, salt)
    if (frac == 0) pct < whole
    else {
      val fine =
        TextOps.md5Hash32(concat(lit(s"$salt#fine"), id.cast("string"))) % 100000
      (pct < whole) || (pct === whole && fine < frac)
    }
  }

  /** Stratified sampling: per-stratum keep-rates (percent), e.g. keep
    * 60% of "en", 20% of everything else — the data-mixing primitive.
    * Map-only (no shuffle, no count pass). */
  def stratifiedSample(docs: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Int], defaultPct: Int, salt: String): DataFrame = {
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (stratum, pct)) =>
        when(col(stratumCol) === stratum, lit(pct)).otherwise(acc)
    }
    docs.withColumn("pct", samplePct(col(idCol), salt))
      .withColumn("rate", rate)
      .filter(col("pct") < col("rate"))
  }

  /** Weighted sampling WITHOUT replacement — the A-ES exponential race
    * (Efraimidis–Spirakis): each row draws a deterministic uniform
    * u ∈ (0,1) from its salted md5 and competes with key = ln(u)/w;
    * the n LARGEST keys are exactly a weight-proportional
    * without-replacement sample (a heavy row's key concentrates near
    * 0⁻, a light row's dives). The canonical use is token-mass- or
    * quality-score-proportional corpus subsampling where Bernoulli
    * rates can't hit an exact n.
    *
    * Scale: map-only key pass + TakeOrdered — no shuffle beyond the
    * top-n reduction, rerun-stable under the salt (the samplePct
    * determinism contract). Keys are ROUND(·, 12) so the oracle ranks
    * the identical doubles (ln last-ulp discipline); ties break by id.
    * Non-positive weights are excluded (they cannot race). Returns
    * (id, weight, key) — the n winners. */
  def weightedSample(docs: DataFrame, idCol: String, weight: Column,
      n: Int, salt: String): DataFrame = {
    require(n >= 1, "sample size must be positive")
    val u = (TextOps.md5Hash32(concat(lit(salt), col(idCol).cast("string")))
      + 0.5) / 4294967296.0
    docs.select(col(idCol), weight.cast("double").as("weight"))
      .filter(col("weight") > 0)
      .withColumn("key", round(log(u) / col("weight"), 12))
      .orderBy(col("key").desc, col(idCol).asc).limit(n)
  }

  /** Two-sample distribution DRIFT over fixed buckets — the
    * Kolmogorov–Smirnov statistic between two corpus slices (snapshot
    * vs snapshot, source vs source) on a numeric column: did the
    * length/score/quality distribution MOVE? The detector a refresh
    * pipeline alarms on before retraining.
    *
    * Exactness discipline: bucket on FIXED edges (lo + i·width,
    * config-sized by construction), count per bucket map-side, then
    * compare cumulative masses as INTEGERS — the max of
    * |cumA·N_B − cumB·N_A| — and divide by N_A·N_B ONCE at the end
    * (an a_i/N_A − b_i/N_B float subtract per bucket would reintroduce
    * summation-order noise; this never leaves ℤ until the last op).
    * The cumulative window runs over ≤ nBuckets+2 rows (out-of-range
    * values clamp to the edge buckets), the trending boundedness
    * argument. Like correlations: keep cum·N inside a long (rescale
    * at extreme scale). Returns one row
    * (n_a, n_b, ks_bucket, ks = round 6dp, drifted). */
  def distributionDrift(a: DataFrame, b: DataFrame, value: Column,
      lo: Long, width: Long, nBuckets: Int, tau: Double): DataFrame = {
    require(nBuckets >= 1 && width >= 1, "need a positive bucket lattice")
    // INTEGER bucket lattice (lo + i·width): no float boundary can
    // disagree with the oracle's; out-of-range values clamp to the
    // edge buckets
    def bucketed(df: DataFrame) = df.select(
        least(lit(nBuckets - 1), greatest(lit(0),
          floor((value.cast("long") - lo) / width).cast("int"))).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val ab = bucketed(a).withColumnRenamed("n", "na")
      .join(bucketed(b).withColumnRenamed("n", "nb"), Seq("bucket"), "full_outer")
      .select(col("bucket"), coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0) // ≤ nBuckets rows total
    val cum = ab
      .withColumn("ca", sum(col("na")).over(w))
      .withColumn("cb", sum(col("nb")).over(w))
    val tot = cum.agg(coalesce(max(col("ca")), lit(0L)).as("n_a"),
      coalesce(max(col("cb")), lit(0L)).as("n_b"))
    val best = cum.crossJoin(broadcast(tot))
      .select(col("bucket"),
        abs(col("ca") * col("n_b") - col("cb") * col("n_a")).as("num"))
      .orderBy(col("num").desc, col("bucket").asc).limit(1)
    // ALWAYS one row out (tot aggregates even over nothing), and a
    // slice that VANISHED is a detection, not a clean bill: ks stays
    // 0.0 (the statistic is undefined against an empty sample) but
    // `drifted` forces true when exactly one side is empty — a total
    // data loss must alarm the refresh pipeline, not pass it
    // (code-review r12). Both-empty reports (0, 0, 0.0, false).
    tot.join(best, lit(true), "left")
      .select(col("n_a"), col("n_b"), col("bucket").as("ks_bucket"),
        when(col("n_a") === 0 || col("n_b") === 0, lit(0.0))
          .otherwise(round(col("num").cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double")), 6)).as("ks"))
      .withColumn("drifted",
        ((col("n_a") === 0) =!= (col("n_b") === 0)) || col("ks") > tau)
  }

  /** T5/UL2-style SPAN-CORRUPTION pair generation: turn raw documents
    * into (input-with-sentinels, target-spans) denoising examples —
    * the objective-preparation step between a cleaned corpus and an
    * encoder-decoder training run. Masking is at BLOCK granularity
    * (`blockTokens` consecutive tokens): block b of doc d masks iff
    * md5(salt‖d‖'_'‖b) % 100 < maskPct — deterministic, rerun-stable,
    * and non-overlapping BY CONSTRUCTION (the reason for blocks over
    * per-token Bernoulli + merge: greedy run-merging is a sequential
    * fold the oracle can't replay cheaply, where the block lattice is
    * pure arithmetic both engines agree on). Each masked block gets
    * its own ordinal sentinel `<extra_id_k>` (k in block order; the
    * documented simplification vs T5's merge-adjacent-spans — adjacent
    * masked blocks keep distinct sentinels).
    *
    * Map-only: the whole construction is one `aggregate` fold over the
    * per-doc block lattice — no explode, no join, no shuffle. Returns
    * (id, n_tokens, n_masked, input_text, target_text). */
  def spanCorruption(docs: DataFrame, idCol: String, textCol: String,
      blockTokens: Int, maskPct: Int, salt: String): DataFrame = {
    require(blockTokens >= 1, "block size must be positive")
    require(maskPct >= 0 && maskPct <= 100, "mask percent is a percentage")
    // tokenization MATERIALIZED as a column first (the chunkTokens
    // lambda-re-evaluation rule, applied here in r17): the HOF lambdas
    // below are CodegenFallback, so nothing eliminates common
    // subexpressions — referencing the raw split() Column re-ran the
    // tokenizer ~10× per row (visible verbatim in the r17 before-plan).
    // CollapseProject keeps the alias because it is non-cheap and
    // multiply referenced. Same expressions, same values — map-only
    // shape unchanged.
    val tk = col("__tk")
    val nTok = size(tk)
    val nBlocks = ceil(nTok.cast("double") / blockTokens).cast("int")
    val blockIdx = sequence(lit(0), greatest(nBlocks - 1, lit(0)))
    val masked = transform(blockIdx, b =>
      when(nTok === 0, lit(false)).otherwise(
        TextOps.md5Hash32(concat(lit(salt), col(idCol).cast("string"),
          lit("_"), b.cast("string"))) % 100 < maskPct))
    // fold over blocks: acc = (input parts, target parts, sentinel k)
    val zero = struct(
      array().cast("array<string>").as("inp"),
      array().cast("array<string>").as("tgt"),
      lit(0).as("k"))
    val folded = aggregate(
      zip_with(blockIdx, masked, (b, m) => struct(b.as("b"), m.as("m"))),
      zero,
      (acc, bm) => {
        val blockToks = slice(tk, bm.getField("b") * blockTokens + 1, lit(blockTokens))
        val sent = concat(lit("<extra_id_"), acc.getField("k").cast("string"), lit(">"))
        when(bm.getField("m"),
          struct(
            concat(acc.getField("inp"), array(sent)).as("inp"),
            concat(acc.getField("tgt"), array(sent), blockToks).as("tgt"),
            (acc.getField("k") + 1).as("k")))
          .otherwise(struct(
            concat(acc.getField("inp"), blockToks).as("inp"),
            acc.getField("tgt").as("tgt"),
            acc.getField("k").as("k")))
      })
    docs.select(col(idCol),
        filter(TextOps.tokens(col(textCol)), t => t =!= "").as("__tk"))
      .select(col(idCol), nTok.cast("long").as("n_tokens"),
        folded.as("__f"),
        aggregate(zip_with(blockIdx, masked, (b, m) =>
            when(m, least(nTok - b * blockTokens, lit(blockTokens)))
              .otherwise(lit(0))),
          lit(0L), (a, x) => a + x).as("n_masked"))
      .select(col(idCol), col("n_tokens"), col("n_masked"),
        array_join(col("__f.inp"), " ").as("input_text"),
        array_join(col("__f.tgt"), " ").as("target_text"))
  }

  /** FILL-IN-MIDDLE transformation (the infilling objective of code
    * models): split each document's tokens at two deterministic cut
    * points and emit the PSM rearrangement
    * `<PRE> prefix <SUF> suffix <MID> middle` — the model learns to
    * produce the middle conditioned on both sides. Cuts are salted-md5
    * draws over [0, n] (order-normalized), so the transform is
    * rerun-stable and the oracle replays it with pure slicing
    * arithmetic. `fimPct` controls the classic mixed objective: docs
    * whose draw lands ≥ fimPct pass through unchanged (plain CLM text,
    * fim = false). Map-only — no explode, no join, no shuffle (the
    * spanCorruption posture). Returns
    * (id, n_tokens, n_middle, fim, fim_text). */
  def fimTransform(docs: DataFrame, idCol: String, textCol: String,
      fimPct: Int, salt: String): DataFrame = {
    require(fimPct >= 0 && fimPct <= 100, "fim percent is a percentage")
    val tk = filter(TextOps.tokens(col(textCol)), t => t =!= "")
    val n = size(tk)
    def h(tag: String) = TextOps.md5Hash32(
      concat(lit(salt), col(idCol).cast("string"), lit(tag)))
    val doFim = h("_q") % 100 < fimPct && n > 0
    val c1 = (h("_a") % (n + 1)).cast("int")
    val c2 = (h("_b") % (n + 1)).cast("int")
    val lo = least(c1, c2)
    val hi = greatest(c1, c2)
    val pre = slice(tk, lit(1), lo)
    val mid = slice(tk, lo + 1, hi - lo)
    val suf = slice(tk, hi + 1, n - hi)
    docs.select(col(idCol), n.cast("long").as("n_tokens"),
      when(doFim, (hi - lo).cast("long")).otherwise(lit(0L)).as("n_middle"),
      doFim.as("fim"),
      when(doFim, array_join(
          concat(array(lit("<PRE>")), pre, array(lit("<SUF>")), suf,
            array(lit("<MID>")), mid), " "))
        .otherwise(array_join(tk, " ")).as("fim_text"))
  }

  /** CATEGORICAL drift — [[distributionDrift]]'s twin for label-valued
    * columns (language mix, source mix, predicted-class shares):
    * TOTAL-VARIATION distance between two slices' category
    * distributions, tvd = ½ Σ|pA(c) − pB(c)|. Same exactness
    * discipline: per-category counts (map-side combinable) full-outer
    * joined, the sum computed as Σ|cntA·N_B − cntB·N_A| INTEGERS with
    * ONE division by 2·N_A·N_B at the end; same vanished-slice rule
    * (one empty side forces `drifted`, both-empty reports the quiet
    * zero row). The category set is the OBSERVED union — bounded by
    * label cardinality, the trending argument. Returns one row
    * (n_a, n_b, n_categories, tvd, drifted). */
  def categoricalDrift(a: DataFrame, b: DataFrame, category: Column,
      tau: Double): DataFrame = {
    def counted(df: DataFrame) = df.select(category.cast("string").as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("n"))
    val ab = counted(a).withColumnRenamed("n", "na")
      .join(counted(b).withColumnRenamed("n", "nb"), Seq("c"), "full_outer")
      .select(col("c"), coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    val tot = ab.agg(coalesce(sum(col("na")), lit(0L)).as("n_a"),
      coalesce(sum(col("nb")), lit(0L)).as("n_b"))
    ab.crossJoin(broadcast(tot))
      .agg(coalesce(first(col("n_a")), lit(0L)).as("n_a"),
        coalesce(first(col("n_b")), lit(0L)).as("n_b"),
        count(lit(1)).as("n_categories"),
        coalesce(sum(abs(col("na") * col("n_b") - col("nb") * col("n_a"))),
          lit(0L)).as("__num"))
      .select(col("n_a"), col("n_b"), col("n_categories"),
        when(col("n_a") === 0 || col("n_b") === 0, lit(0.0))
          .otherwise(round(col("__num").cast("double") /
            (lit(2.0) * col("n_a").cast("double") * col("n_b")), 6)).as("tvd"))
      .withColumn("drifted",
        ((col("n_a") === 0) =!= (col("n_b") === 0)) || col("tvd") > tau)
  }

  /** Data-REPETITION planner — the data-constrained-scaling decision:
    * given integer mixture weights (parts) and a total token budget,
    * how many EPOCHS of each source does the mix demand? A source
    * whose share exceeds its mass repeats (epochs > 1, the
    * repeated-data regime worth flagging); one with surplus
    * subsamples (epochs < 1, [[stratifiedSample]] / [[sourceCap]]
    * territory).
    *
    * Exactness: per-source token masses are ONE map-side-combinable
    * aggregate; the part table rides as literals (config-sized);
    * targets are integer `budget·part DIV Σparts` over the OBSERVED
    * sources' parts (absent sources claim no share — the mixRates
    * visibility rule applies to the caller's part map, not here); the
    * only float is the final round(target/mass, 4) per row. Returns
    * (source, n_tokens, part, target_tokens, epochs, repeats). */
  def epochsPlan(docs: DataFrame, sourceCol: String, textCol: String,
      parts: Map[String, Long], defaultPart: Long, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "token budget must be positive")
    require(defaultPart >= 0 && parts.values.forall(_ >= 0), "parts are non-negative")
    val mass = docs.select(col(sourceCol).as("source"),
        size(filter(TextOps.tokens(col(textCol)), t => t =!= ""))
          .cast("long").as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).as("n_tokens"))
      .withColumn("part", parts.toSeq.sortBy(_._1).foldLeft(lit(defaultPart)) {
        case (acc, (s, p)) => when(col("source") === s, lit(p)).otherwise(acc)
      })
    val tot = mass.agg(sum(col("part")).as("total_parts"))
    mass.crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"), col("part"),
        expr(s"CAST($budgetTokens AS BIGINT) * part DIV total_parts")
          .as("target_tokens"))
      .withColumn("epochs",
        when(col("n_tokens") === 0, lit(null).cast("double"))
          .otherwise(round(col("target_tokens").cast("double") / col("n_tokens"), 4)))
      .withColumn("repeats", coalesce(col("epochs") > 1.0, lit(false)))
  }

  /** Eval-integrity CANARIES — the contamination-testing primitive:
    * plant deterministic unique strings in a corpus, run the pipeline,
    * then ask which survived into the output (a canary in a training
    * shard proves the decontamination/dedup path leaks; one missing
    * from a supposedly-lossless transform proves data loss). Canary
    * strings derive from salted md5 (regenerable anywhere, including
    * the SQL oracle — no stored registry needed). */
  def canaryStrings(n: Int, salt: String): Seq[String] = {
    require(n >= 1, "need at least one canary")
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until n).map { i =>
      md.reset()
      "canary-" + md.digest(s"$salt$i".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(24)
    }
  }

  /** Union `n` canary documents into the corpus (ids from `idBase`,
    * one canary string per doc, a dedicated source label). Map-only. */
  def insertCanaries(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, n: Int, salt: String, idBase: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val canaries = canaryStrings(n, salt).zipWithIndex
      .map { case (cs, i) => (idBase + i, cs, "__canary") }
      .toDF(idCol, textCol, sourceCol)
    docs.select(col(idCol), col(textCol), col(sourceCol)).unionByName(canaries)
  }

  /** Detect which canaries appear anywhere in the corpus: ONE
    * aggregate — per canary a `max(contains)` partial (map-side
    * combinable boolean), the summary derived from the 1-row result.
    * O(docs × n) substring probes, n config-sized by contract.
    * Returns one row (n_canaries, n_detected, all_present). */
  def detectCanaries(docs: DataFrame, textCol: String, n: Int,
      salt: String): DataFrame = {
    val cs = canaryStrings(n, salt)
    val hits = cs.zipWithIndex.map { case (c, i) =>
      max(col(textCol).contains(c)).as(s"__c$i")
    }
    docs.agg(hits.head, hits.tail: _*)
      .select(lit(n.toLong).as("n_canaries"),
        size(filter(array((0 until n).map(i =>
            coalesce(col(s"__c$i"), lit(false))): _*), x => x))
          .cast("long").as("n_detected"))
      .withColumn("all_present", col("n_detected") === col("n_canaries"))
  }

  /** POPULATION STABILITY INDEX — the third drift lens beside
    * [[distributionDrift]] (KS: max CDF gap, tail-sensitive) and
    * [[categoricalDrift]] (TVD: mass moved): psi = Σ (pA−pB)·ln(pA/pB)
    * over the same integer bucket lattice, the score-monitoring
    * industry's standard alarm (rule of thumb: > 0.2 = significant
    * shift). Buckets and counts follow the KS twin exactly; empty
    * buckets take the standard ε = 1e-6 floor on each proportion
    * (ln of a zero share is undefined — the floor is part of the
    * metric's definition, mirrored verbatim in the oracle). The
    * per-bucket terms are float (ln), summed over the ≤ nBuckets
    * lattice and rounded 6dp — the lmScore ulp rule at 20-term scale.
    * Same vanished-slice alarm semantics. Returns one row
    * (n_a, n_b, psi, drifted). */
  def psiDrift(a: DataFrame, b: DataFrame, value: Column,
      lo: Long, width: Long, nBuckets: Int, tau: Double): DataFrame = {
    require(nBuckets >= 1 && width >= 1, "need a positive bucket lattice")
    def bucketed(df: DataFrame) = df.select(
        least(lit(nBuckets - 1), greatest(lit(0),
          floor((value.cast("long") - lo) / width).cast("int"))).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val ab = bucketed(a).withColumnRenamed("n", "na")
      .join(bucketed(b).withColumnRenamed("n", "nb"), Seq("bucket"), "full_outer")
      .select(coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    val tot = ab.agg(coalesce(sum(col("na")), lit(0L)).as("n_a"),
      coalesce(sum(col("nb")), lit(0L)).as("n_b"))
    val eps = 1e-6
    // the ln branch runs ONLY when both sides are populated (a /0
    // share would ride through as Infinity, not null); empty sides
    // take the vanished-slice row — exactly one row out either way
    val scored = ab.crossJoin(broadcast(tot))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .select(col("n_a"), col("n_b"),
        (greatest(col("na").cast("double") / col("n_a"), lit(eps)) -
          greatest(col("nb").cast("double") / col("n_b"), lit(eps))).as("__d"),
        log(greatest(col("na").cast("double") / col("n_a"), lit(eps)) /
          greatest(col("nb").cast("double") / col("n_b"), lit(eps))).as("__l"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(round(sum(col("__d") * col("__l")), 6).as("psi"))
    scored
      .unionByName(tot.select(col("n_a"), col("n_b"), lit(0.0).as("psi"))
        .filter(col("n_a") === 0 || col("n_b") === 0))
      .withColumn("drifted",
        ((col("n_a") === 0) =!= (col("n_b") === 0)) || col("psi") > tau)
  }

  /** Documents per prefix-sum block in the packers below. 2^16 ids per
    * block keeps the block-total table metadata-sized (a 100 B-doc
    * corpus yields ~1.5 M block rows — broadcastable) while bounding
    * every within-block window partition to ~65k documents of work. */
  val PackBlockDocs: Long = 1L << 16

  /** Two-phase distributed prefix sum — the scale-safe running-offset
    * kernel shared by [[shardAssign]] and [[packSequences]]. A naive
    * `Window.partitionBy(stratum)` serializes EACH STRATUM through one
    * task: strata are languages/domains, so at 100 TB a single window
    * partition is terabytes. Instead the classic two-phase shape:
    *
    *  1. block every row by a DETERMINISTIC contiguous-in-order key
    *     (`floor(id / blockDocs)` — deterministic where
    *     `spark_partition_id()` after `repartitionByRange` is not:
    *     range-bound sampling can resolve differently between the
    *     offset job and the assignment job, desyncing the phases);
    *  2. aggregate per-(stratum, block) token totals — map-side
    *     combinable, so the shuffle moves block-count partials, not
    *     rows;
    *  3. cumulate block totals into per-block start offsets with a
    *     window over the BLOCK TABLE (metadata-sized: rows = blocks,
    *     not documents);
    *  4. broadcast the offsets back and finish with a window
    *     partitioned by (stratum, block) — every partition is bounded
    *     by `blockDocs` ids regardless of stratum skew, so the heavy
    *     pass parallelizes with the data.
    *
    * `rows` must carry `stratum` and `n_tokens` columns plus the order
    * columns; `idCol` must be numeric (block derivation divides it).
    * Returns `rows`' columns + `start_offset`, in that order. */
  private def blockedStartOffset(rows: DataFrame, idCol: String,
      orderCols: Seq[Column], blockDocs: Long): DataFrame = {
    require(blockDocs > 0, "prefix-sum block size must be positive")
    // a non-numeric id would cast to NULL below, collapsing every row
    // into ONE block — silently reinstating the single-task window the
    // two-phase shape exists to avoid (ADVICE r11); refuse loudly
    require(rows.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"blocked prefix sum needs a numeric id column (block derivation " +
        s"divides it); $idCol is ${rows.schema(idCol).dataType.simpleString}")
    val u = rows.withColumn("__blk",
      floor(col(idCol).cast("long").cast("double") / blockDocs).cast("long"))
    val wb = Window.partitionBy(col("stratum")).orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val blockOffsets = u.groupBy(col("stratum"), col("__blk"))
      .agg(sum(col("n_tokens")).as("__bsum"))
      .withColumn("__boff", coalesce(sum(col("__bsum")).over(wb), lit(0L)))
      .select(col("stratum"), col("__blk"), col("__boff"))
    val wi = Window.partitionBy(col("stratum"), col("__blk"))
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    u.join(broadcast(blockOffsets), Seq("stratum", "__blk"))
      .withColumn("start_offset",
        col("__boff") + coalesce(sum(col("n_tokens")).over(wi), lit(0L)))
      .select(rows.columns.map(col) :+ col("start_offset"): _*)
  }

  /** Token-budget shard assignment: within each stratum, documents are
    * packed in id order into shards of ~`capTokens` tokens (a document
    * lands in the shard its START offset falls into, the streaming-pack
    * rule). Running offsets come from the two-phase
    * [[blockedStartOffset]] prefix sum, so no stratum ever serializes
    * through a single window task — the heavy window partitions by
    * (stratum, id-block) and parallelizes with the data. */
  def shardAssign(docs: DataFrame, idCol: String, stratumCol: String,
      capTokens: Int, blockDocs: Long = PackBlockDocs): DataFrame = {
    val base = docs.select(col(idCol), col(stratumCol).as("stratum"),
      size(TextOps.tokens(col("text"))).as("n_tokens"))
    blockedStartOffset(base, idCol, Seq(col(idCol)), blockDocs)
      .withColumn("shard",
        floor(col("start_offset").cast("double") / capTokens).cast("long"))
  }

  /** Per-shard packing QA over [[shardAssign]]'s output — the report a
    * packing run publishes beside its shards: docs, token mass, and
    * fill factor vs the capacity. Fill can exceed 1 by at most one
    * document's tokens (the streaming-pack rule lands a doc in the
    * shard its START offset falls into), and the LAST shard per
    * stratum underfills — both visible here, which is the point.
    * ONE map-side-combinable aggregate on the (stratum, shard) key. */
  def shardStats(shards: DataFrame, capTokens: Int): DataFrame = {
    require(capTokens > 0, "shard capacity must be positive")
    shards.groupBy(col("stratum"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .withColumn("fill", round(col("n_tokens").cast("double") / capTokens, 6))
  }

  /** Corpus DATA CARD — the per-source release report a pretraining
    * pipeline publishes with a corpus drop: document and token mass
    * (absolute and as a share of the whole corpus), mean document
    * length, the source's distinct-token ratio, its predicted-language
    * majority, and its exact-duplicate rate (share of the source's
    * docs whose normalized fingerprint occurs ≥ 2 times ANYWHERE in
    * the corpus — cross-source duplication is exactly what a
    * per-source card must surface).
    *
    * Scale shape: one slim projection (id, source, counts, lang,
    * fingerprint) eagerly checkpointed (consumed by four aggregates —
    * the clusterBalance recompute-vs-checkpoint precedent), then only
    * map-side-combinable aggregates: per-source moments (one hash
    * agg), the language majority as (source, lang) counts argmaxed
    * per source (two partial aggs — never a mode over raw rows, so a
    * monolingual mega-source contributes one partial per partition),
    * and the duplicate rate via the fingerprint-df aggregate +
    * semi-probe (the span-dedup discipline: a universal fingerprint
    * contributes one partial per partition, never a window
    * partition). The corpus total is a 1-row broadcast cross join.
    * All ratios divide INTEGER sums once, so the DuckDB twin is
    * bit-identical (no order-dependent float accumulation). Output is
    * source-cardinality. */
  def corpusCard(docs: DataFrame, idCol: String, sourceCol: String,
      textCol: String): DataFrame = {
    val tk = TextOps.tokens(col(textCol))
    val base = docs.select(col(idCol), col(sourceCol),
      size(tk).cast("long").as("__nt"),
      size(array_distinct(tk)).cast("long").as("__nd"),
      TextOps.predictLang(col(textCol)).as("__lang"),
      TextOps.fingerprint(col(textCol)).as("__fp"))
      .localCheckpoint(true)
    val moments = base.groupBy(col(sourceCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(col("__nt")).as("n_tokens"),
      sum(col("__nd")).as("__ndist"))
    val langTop = base.groupBy(col(sourceCol), col("__lang"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(sourceCol))
      .agg(max(struct(col("__c"), col("__lang"))).as("__b"))
      .select(col(sourceCol), col("__b.__lang").as("top_lang"))
    val dupFp = base.groupBy(col("__fp")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= 2).select(col("__fp"))
    val dupDocs = base.join(dupFp, Seq("__fp"), "left_semi")
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("__dup"))
    val total = base.agg(sum(col("__nt")).as("__tot"))
    moments
      .join(langTop, Seq(sourceCol))
      .join(dupDocs, Seq(sourceCol), "left")
      .crossJoin(broadcast(total))
      .select(col(sourceCol).as("source"),
        col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("__tot").cast("double"), 6).as("share_tokens"),
        round(col("n_tokens") / col("n_docs").cast("double"), 2).as("avg_tokens"),
        round(col("__ndist") / col("n_tokens").cast("double"), 6).as("distinct_ratio"),
        col("top_lang"),
        round(coalesce(col("__dup"), lit(0L)) / col("n_docs").cast("double"), 4)
          .as("dup_rate"))
  }

  /** Sequence packing — the last mile of corpus prep: pack UNITS
    * (typically [[TextOps.chunkTokens]] chunks) in (docId, unitId)
    * order into fixed-`capTokens` training sequences per stratum, a
    * unit landing in the sequence its START offset falls into (the
    * same streaming-pack rule as [[shardAssign]], at unit granularity
    * with a composite order key). Offsets come from the same two-phase
    * [[blockedStartOffset]] prefix sum (blocked on the DOC id, so all
    * of a document's units share a block and the composite order is
    * preserved). Returns the units annotated with
    * (start_offset, seq_id). */
  def packSequences(units: DataFrame, docIdCol: String, unitIdCol: String,
      stratumCol: String, nTokensCol: String, capTokens: Int,
      blockDocs: Long = PackBlockDocs): DataFrame = {
    require(capTokens > 0, "sequence capacity must be positive")
    val base = units.select(col(docIdCol), col(unitIdCol),
      col(stratumCol).as("stratum"), col(nTokensCol).as("n_tokens"))
    blockedStartOffset(base, docIdCol, Seq(col(docIdCol), col(unitIdCol)),
        blockDocs)
      .withColumn("seq_id",
        floor(col("start_offset").cast("double") / capTokens).cast("long"))
  }

  /** Length-bucket batching audit — the padding-efficiency report a
    * serving/training stack runs before fixing its batch shapes: every
    * document lands in the smallest power-of-two token bucket that
    * holds it (floor `minBucket`, cap `maxBucket` — longer docs
    * truncate into the cap, the max-sequence-length rule), and each
    * bucket reports how much of its capacity real tokens fill. The
    * bucket ladder is a closed CASE chain of exact integer compares
    * (never ceil(log2(n)) — a float log at a power-of-two boundary is
    * exactly the off-by-one that flips a bucket), so the DuckDB twin
    * replays it verbatim. Map-only token count + one bucket-keyed
    * config-sized aggregate. Returns per bucket:
    * (bucket, n_docs, total_tokens, capacity, padding_frac 6dp). */
  def lengthBuckets(docs: DataFrame, idCol: String, textCol: String,
      minBucket: Int = 16, maxBucket: Int = 2048): DataFrame = {
    require(minBucket > 0 && Integer.bitCount(minBucket) == 1, "minBucket must be a power of two")
    require(maxBucket >= minBucket && Integer.bitCount(maxBucket) == 1, "maxBucket must be a power of two")
    val ladder = Iterator.iterate(minBucket)(_ * 2).takeWhile(_ <= maxBucket).toSeq
    val n = size(TextOps.tokens(col(textCol)))
    val bucket = ladder.init.foldRight(lit(maxBucket): Column) {
      (b, rest) => when(n <= b, lit(b)).otherwise(rest)
    }
    docs.select(bucket.as("bucket"), least(n, lit(maxBucket)).as("eff"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("eff")).as("total_tokens"))
      .withColumn("capacity", col("n_docs") * col("bucket"))
      .withColumn("padding_frac",
        round(lit(1.0) - col("total_tokens").cast("double")
          / col("capacity").cast("double"), 6))
  }

  /** N-gram novelty scoring — the memorization/novelty metric: what
    * fraction of a document's n-gram POSITIONS are absent from a
    * reference set (training-set memorization checks score generated
    * text this way; as a filter it spots documents that are pure
    * recombinations of reference phrases). Positions, not distinct
    * grams: a doc that repeats one seen phrase fifty times is 100%
    * seen, which is the honest memorization number. Same machinery as
    * [[decontaminate]] with the aggregate turned into a ratio: the
    * reference's distinct hashes broadcast into a LEFT semi-ish join
    * (here a left join + null-count, since the MISSES are the signal),
    * one doc-key aggregate, novelty rounded 6dp. Docs with fewer than
    * `n` tokens report novelty NULL (no grams to judge). Returns
    * (id, n_grams, n_seen, novelty). */
  def noveltyScore(corpus: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, n: Int, maxRefRows: Long = MaxBroadcastRows): DataFrame = {
    val refSh = guardBroadcastSize(
      reference.select(
          explode(graft.plans.NGramMd5(TextOps.tokens(col(textCol)), n, 8)).as("sh"))
        .distinct().withColumn("__hit", lit(1)),
      "noveltyScore reference shingle set", maxRefRows)
    corpus.select(col(idCol),
        explode_outer(graft.plans.NGramMd5(TextOps.tokens(col(textCol)), n, 8)).as("sh"))
      .join(broadcast(refSh), Seq("sh"), "left")
      .groupBy(col(idCol))
      .agg(count(col("sh")).as("n_grams"),
        count(col("__hit")).as("n_seen"))
      .withColumn("novelty",
        when(col("n_grams") === 0, lit(null).cast("double"))
          .otherwise(round(lit(1.0) - col("n_seen").cast("double") / col("n_grams"), 6)))
  }

  /** Corpus snapshot diff — the change-detection pass an INCREMENTAL
    * pipeline runs before re-processing: classify every id across two
    * corpus versions as added / removed / changed / unchanged, content
    * compared by md5 so the diff never moves document bodies through
    * the shuffle — only (id, 32-char hash) pairs meet in ONE id-keyed
    * full-outer join. Downstream stages then re-run on
    * `added ∪ changed` instead of the corpus ([[Dedup.incremental]]'s
    * arrival-vs-resident discipline, at the snapshot granularity).
    * Returns (id, status). */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // presence travels as EXPLICIT flags, never inferred from hash
    // nullability: a NULL-text document would null its md5 and read
    // as absent, misclassifying an unchanged row as added forever
    // (review r11); the content compare is null-safe for the same
    // reason (NULL text ≡ NULL text is unchanged)
    def hashed(df: DataFrame, h: String, p: String) =
      df.select(col(idCol), md5(col(textCol)).as(h), lit(1).as(p))
    hashed(oldDocs, "h_old", "in_old")
      .join(hashed(newDocs, "h_new", "in_new"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("in_old").isNull, lit("added"))
          .when(col("in_new").isNull, lit("removed"))
          .when(col("h_old") <=> col("h_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Leakage-free train/eval split: split on near-duplicate GROUPS,
    * never documents — a doc-level hash split leaks every near-dup
    * pair that straddles the cut (the eval set then "tests" lightly
    * paraphrased training data, the classic inflated-eval bug).
    * Groups come from the LSH star-edge components
    * ([[Dedup.minhashStarEdges]] → GraphX, the dedup-groups pipeline);
    * each group routes WHOLE by the salted md5 of its component id —
    * deterministic, rerun-stable, and independent of group size
    * (a giant boilerplate group is one coin flip, not a bias).
    * Singleton docs are their own group. `evalPct` is the target eval
    * share in percent (realized share varies with group sizes — the
    * price of the no-leak contract). Scale: the signature/edge/CC
    * machinery is the dedup-groups posture (O(members) star edges,
    * never cliques); the split itself is one map-only hash per row.
    * Returns (id, group, split ∈ train|eval). */
  def splitLeakFree(docs: DataFrame, idCol: String, textCol: String,
      rows: Int, bands: Int, evalPct: Int, salt: String): DataFrame = {
    require(evalPct >= 0 && evalPct <= 100,
      s"eval percent must be in [0, 100], got $evalPct")
    val sigs = Dedup.minhashSignatures(docs, idCol, textCol, rows)
    val cands = Dedup.minhashStarEdges(sigs, idCol, rows, bands)
    val comp = graft.graphx.GraphXBridge.componentsOfPairs(docs.sparkSession,
      cands.select(col("d1").as("src"), col("d2").as("dst")))
    docs.join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("group", coalesce(col("component"), col(idCol)))
      .select(col(idCol), col("group"),
        when(TextOps.md5Hash32(concat(lit(salt), col("group").cast("string")))
            % 100 < evalPct, lit("eval")).otherwise(lit("train")).as("split"))
  }

  /** Per-source frequency cap — the Common-Crawl-style domain cap:
    * keep at most `cap` documents per source/domain, chosen by a
    * salted-md5 rank so the kept subset is deterministic, rerun-stable,
    * and unbiased within source (hash order is independent of crawl
    * order — capping a boilerplate-heavy domain by arrival order would
    * keep correlated pages). A single
    * `row_number() over (partition by source)` serializes EACH SOURCE
    * through one task — and unlike [[clusterBalance]]'s cells, sources
    * have no occupancy bound (one domain can be half the corpus). So
    * the rank runs as a TWO-LEVEL blocked top-k:
    *
    *  1. rank within (source, id-block) — every window partition is
    *     bounded by `blockDocs` ids regardless of source skew — and
    *     keep rank ≤ cap: a row ranked > cap within its own block has
    *     ≥ cap better rows in that block alone, so it cannot be
    *     top-`cap` globally (safe pruning, no false negatives);
    *  2. iterate: while more than `TreeFanIn` blocks remain at the
    *     current level, merge `TreeFanIn` blocks into one coarser block
    *     (span ×= TreeFanIn) and re-rank the survivors within it,
    *     keeping rank ≤ cap — each level is a geometric reduction over
    *     an already cap×blocks-bounded survivor set (the tree top-k);
    *  3. re-rank the survivors per source and keep the global
    *     top-`cap`. The iteration bounds the FINAL window's partition
    *     at cap × TreeFanIn rows REGARDLESS of corpus share — round 12
    *     closed the residual where a source owning millions of blocks
    *     under a large cap re-concentrated in the final window
    *     (VERDICT r11 Wrong #3).
    *
    * The level count derives from the id RANGE — min(id) AND max(id),
    * ONE map-side-combined column-scan aggregate, paid once per call
    * (and the reason `idCol` must be NUMERIC: block derivation divides
    * the id. A non-numeric id would cast to NULL and collapse every
    * row into one block — refused loudly here, ADVICE r11). Counting
    * from max alone would under-count when ids go NEGATIVE (signed
    * hashes as ids): negative blocks the loop never saw would exit it
    * early and quietly void the cap × TreeFanIn bound on the final
    * window (code-review r12 #6).
    *
    * Returns (id, source, rk ∈ [1, cap]) — identical to the one-window
    * formulation (the equivalence is asserted in the spec). */
  def sourceCap(docs: DataFrame, idCol: String, sourceCol: String,
      cap: Int, salt: String, blockDocs: Long = PackBlockDocs): DataFrame = {
    require(cap > 0, "per-source cap must be positive")
    require(blockDocs > 0, "rank block size must be positive")
    require(docs.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"sourceCap needs a numeric id column (block derivation divides it); " +
        s"$idCol is ${docs.schema(idCol).dataType.simpleString}")
    val h = TextOps.md5Hash32(concat(lit(salt), col(idCol).cast("string")))
    val base = docs.select(col(idCol), col(sourceCol), h.as("__h"),
      col(idCol).cast("long").as("__id"))
    val bounds = base.agg(min(col("__id")), max(col("__id"))).head
    if (bounds.isNullAt(0)) // empty corpus: empty result, correct schema
      return base.withColumn("rk", lit(1)).filter(lit(false))
        .select(col(idCol), col(sourceCol), col("rk"))
    val (minId, maxId) = (bounds.getLong(0), bounds.getLong(1))
    def nBlocks(span: Long): Long =
      Math.floorDiv(maxId, span) - Math.floorDiv(minId, span) + 1
    def level(df: DataFrame, span: Long): DataFrame = {
      val wBlk = Window.partitionBy(col(sourceCol),
          floor(col("__id").cast("double") / span).cast("long"))
        .orderBy(col("__h").asc, col(idCol).asc)
      df.withColumn("__brk", row_number().over(wBlk))
        .filter(col("__brk") <= cap).drop("__brk")
    }
    var span = blockDocs
    var cur = level(base, span)
    while (nBlocks(span) > TreeFanIn) {
      // saturating: a near-Long-range id span exits via nBlocks ≤ 2
      span = if (span > Long.MaxValue / TreeFanIn) Long.MaxValue
             else span * TreeFanIn
      cur = level(cur, span)
    }
    val wSrc = Window.partitionBy(col(sourceCol))
      .orderBy(col("__h").asc, col(idCol).asc)
    cur
      .withColumn("rk", row_number().over(wSrc))
      .filter(col("rk") <= cap)
      .select(col(idCol), col(sourceCol), col("rk"))
  }

  /** Blocks merged per tree-top-k level in [[sourceCap]]: the final
    * per-source window sees at most cap × TreeFanIn survivor rows. */
  val TreeFanIn: Long = 256L

  /** Contamination REPORT — the audit face of [[decontaminate]]: for
    * every benchmark document that shares at least one length-`n`
    * shingle with the corpus, how many distinct corpus documents hit
    * it (`n_docs`) and how many of ITS OWN distinct shingles are
    * compromised (`n_shingles`). Decontamination tells you which
    * corpus docs to drop; this tells you which EVAL ITEMS are burned —
    * the number a model-eval report has to disclose. Same scale shape
    * as the drop pass: both sides dedupe their (doc, shingle) pairs,
    * the benchmark side is eval-sized and broadcasts, the corpus side
    * streams through one map-side join, and the aggregate keys on the
    * BENCHMARK id — output is benchmark-sized by construction. */
  def deconReport(corpus: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String, n: Int, maxEvalRows: Long = MaxBroadcastRows): DataFrame = {
    def shingles(df: DataFrame, as: String) = df.select(col(idCol).as(as),
        explode(graft.plans.NGramMd5(TextOps.tokens(col(textCol)), n, 8)).as("sh"))
      .distinct()
    val ev = guardBroadcastSize(shingles(evalDocs, "eid"),
      "deconReport benchmark (eid, shingle) set", maxEvalRows)
    val co = shingles(corpus, "cid")
    co.join(broadcast(ev), Seq("sh"))
      .groupBy(col("eid"))
      .agg(countDistinct(col("cid")).as("n_docs"),
        countDistinct(col("sh")).as("n_shingles"))
  }

  /** Shard export — the LAST physical mile: write documents as
    * JSON-lines partitioned by their [[shardAssign]] shard id, the
    * layout a training dataloader consumes (`shard=K/part-*.json`,
    * one JSON object per line). `filesPerShard` caps files per shard
    * (1 = exactly one file per shard — repartition by the shard
    * column so each write task owns whole shards; more splits a big
    * shard across tasks by hashing the ROW id — a sub-key derived
    * from the shard column would be constant within the shard and
    * split nothing, the trap the spec pins). `filesPerShard` > 1 is an
    * UPPER bound, not an exact count: hash collisions of
    * (shard, sub-key) across repartition targets can merge sub-splits
    * (ADVICE r11), and the bound costs one extra distinct-count job
    * over the (column-pruned) shard column per export. Column order
    * inside each JSON object follows the input schema; readers key by
    * name. */
  def exportJsonl(docs: DataFrame, outDir: String, shardCol: String,
      idCol: String, filesPerShard: Int = 1): Unit = {
    require(filesPerShard >= 1, "files per shard must be ≥ 1")
    val parted =
      if (filesPerShard == 1) docs.repartition(col(shardCol))
      else {
        // EXPLICIT partition count: an unnumbered repartition lets AQE
        // coalesce the sub-splits right back into one task per shard
        // (exactly what filesPerShard exists to prevent); the distinct
        // shard count is config-sized by the packing contract
        val nShards = docs.select(col(shardCol)).distinct().count().toInt.max(1)
        docs.repartition(nShards * filesPerShard, col(shardCol),
          pmod(crc32(col(idCol).cast("string")), lit(filesPerShard)))
      }
    parted.write.mode("overwrite").partitionBy(shardCol).json(outDir)
  }

  /** Benchmark decontamination — the standard pretraining hygiene
    * pass: flag every corpus document sharing ANY length-`n` token
    * shingle with the eval/benchmark set (n ≈ 8–13 in practice; short
    * n-grams over-flag on common phrases). Both sides shingle through
    * the compiled [[graft.plans.NGramMd5]] kernel; the check is ONE
    * left-semi join on the 32-bit-truncated shingle hash — the eval
    * side is benchmark-sized and broadcastable, the corpus side
    * streams, so the pass is map-heavy and scales like the dedup
    * family. A hash collision can only OVER-flag (a doc is dropped
    * that didn't need to be) — the safe direction for contamination
    * hygiene; widen the hash if the corpus makes that rate matter.
    * Returns the distinct contaminated ids. */
  def decontaminate(corpus: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    def shingles(df: DataFrame) = df.select(col(idCol),
      explode(graft.plans.NGramMd5(TextOps.tokens(col(textCol)), n, 8)).as("sh"))
    val evalSh = shingles(evalDocs).select(col("sh")).distinct()
    shingles(corpus).join(evalSh, Seq("sh"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** SEMANTIC decontamination — the embedding-space complement of the
    * shingle pass above: flag every corpus vector whose cosine against
    * ANY benchmark vector reaches `tau` (paraphrased contamination that
    * shares no 8-gram). Exact by design: decontamination wants
    * recall = 1 on the benchmark, so no LSH/IVF pruning on this path.
    * The benchmark is eval-sized by contract, so it rides into a
    * compiled max-cos kernel as a LITERAL matrix (the IVF-centroid
    * pattern): ONE corpus scan does the |B| dot products, the τ
    * filter, the max, and the count per row — map-only, ZERO shuffle,
    * output-linear. This replaced the broadcast-NLJ + per-id max-agg
    * formulation, which materialized one row per (corpus, benchmark)
    * pair: measured at the serving shape (fixed 1k benchmark), the
    * kernel cut the ×100-corpus pass ~4× (BASELINE.md round 11) while
    * staying bit-identical (same IEEE accumulation order per pair).
    * Returns (cid, max_cos rounded 6dp, n_hits) per flagged id. */
  def decontaminateSemantic(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, vecCol: String, tau: Double): DataFrame = {
    // eval-sized collect (the mixRates/centroid discipline: config- or
    // benchmark-sized tables may land on the driver; corpora never do)
    val bench = benchmark.select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0)).toSeq
    val h = graft.plans.MaxCosHits(col(vecCol).cast("array<double>"), bench, tau)
    corpus.select(col(idCol).as("cid"), h.as("h"))
      .filter(col("h").isNotNull)
      .select(col("cid"), round(col("h.max_cos"), 6).as("max_cos"),
        col("h.n_hits").as("n_hits"))
  }

  /** Size a Bloom bitmap for a benchmark: `bitsPerShingle` × the
    * benchmark's EXACT distinct shingle count, rounded up to a word
    * boundary. At 10 bits/shingle and k = 4 the expected fill is
    * 1 − e^(−0.4) ≈ 0.33 and the false-positive rate ≈ 1.2% — far
    * under the [[bloomWords]] saturation guard. This is the sizing a
    * caller MUST do when the benchmark scale isn't fixed: the ×100
    * PipelineE2E run proved a hard-coded mBits is a silent kill
    * switch (a 2^18-bit map sized for a 500-doc slice saturated at
    * the 5000-doc slice and false-positived 48 of 64 clean canaries
    * out of the corpus — over-flagging is only "the safe direction"
    * while the rate stays calibrated). One exact count-distinct
    * aggregate over the benchmark; the corpus is never touched. */
  def bloomBitsFor(evalDocs: DataFrame, textCol: String, n: Int,
      bitsPerShingle: Int = 10): Int = {
    require(bitsPerShingle > 0, "bitsPerShingle must be positive")
    val distinct = evalDocs
      .select(explode(graft.plans.NGramMd5(TextOps.tokens(col(textCol)), n, 8)).as("h"))
      .agg(countDistinct(col("h"))).head.getLong(0)
    val want = math.max(64L, distinct * bitsPerShingle.toLong)
    val bits = ((want + 63) / 64) * 64
    require(bits <= Int.MaxValue - 63,
      s"benchmark needs $bits bloom bits (> 2^31): shard the benchmark or lower bitsPerShingle")
    bits.toInt
  }


  /** The bitmap build half of [[decontaminateBloom]], exposed so the
    * serving path (build ONCE from the benchmark, gate forever — incl.
    * the streaming face, [[graft.streaming.EventsStream.bloomGate]])
    * can hold the words without re-collecting per use.
    *
    * The build is DISTRIBUTED (round 12, VERDICT r11 Wrong #2): each
    * shingle hash explodes into its `k` probe-bit positions, positions
    * fold into per-word OR partials on the executors (`bit_or` is a
    * map-side-combinable aggregate, and idempotent — so no distinct
    * pass is needed anywhere), and only the finished ≤ mBits/64 word
    * rows reach the driver. The formulation this replaces collected
    * EVERY distinct benchmark shingle hash to the driver first — at
    * the operator's own motivating size (eval suites of hundreds of
    * millions of shingles) that is multi-GB of driver heap to build a
    * ~mBits/8-byte bitmap; now the driver holds exactly the bitmap. */
  def bloomWords(evalDocs: DataFrame, textCol: String, n: Int,
      mBits: Int, k: Int): Seq[Long] = {
    require(mBits > 0 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
    val pos = evalDocs
      .select(explode(graft.plans.NGramMd5(TextOps.tokens(col(textCol)), n, 8)).as("h"))
      .select(explode(array(Dedup.permParams(k).map { case (a, b) =>
        (lit(a) * (col("h") % Dedup.P31) + lit(b)) % Dedup.P31 % mBits
      }: _*)).as("p"))
    val words = pos
      .select(floor(col("p") / 64).cast("long").as("w"),
        // functions.shiftleft takes a literal Int amount; the per-row
        // bit index needs the SQL form (column-valued shift amount)
        expr("shiftleft(1L, cast(p % 64 as int))").as("b"))
      .groupBy(col("w")).agg(bit_or(col("b")).as("bits"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val out = (0 until mBits / 64).map(i => words.getOrElse(i, 0L))
    // Saturation guard (×100 E2E lesson): past ~50% fill the k=4
    // false-positive rate crosses 6% and the gate starts deleting
    // CLEAN documents wholesale — fail loudly instead of silently
    // over-flagging. fill ≈ 1 − e^(−k·n/m); size via [[bloomBitsFor]].
    val fill = out.iterator.map(java.lang.Long.bitCount(_).toLong).sum.toDouble / mBits
    require(fill <= 0.5,
      f"bloom bitmap saturated (fill = $fill%.2f > 0.50): mBits=$mBits is undersized " +
        "for this benchmark — size it with Pipeline.bloomBitsFor")
    out
  }

  /** Bloom-gated decontamination — the memory-bounded serving shape of
    * the shingle pass: the benchmark's distinct shingle hashes fold
    * into an `mBits`-bit Bloom bitmap (driver-side, benchmark-sized —
    * the [[decontaminateSemantic]] collect discipline) that rides into
    * ONE compiled membership kernel ([[graft.plans.BloomHits]]). The
    * corpus pass is then map-only — no broadcast hash relation, no
    * semi-join, no shuffle at all — and the bitmap costs ~10 bits per
    * benchmark shingle instead of the exact set's tens of bytes per
    * entry: the difference between a multi-GB and a ~100 MB per-executor
    * footprint when the eval suite has hundreds of millions of
    * shingles. A false positive can only OVER-flag (safe direction for
    * hygiene; rate ≈ (1 − e^(−k·n/m))^k, sized by `mBits`); every flag
    * of [[decontaminate]] is flagged here too (no false negatives).
    * Returns (id, n_hits) with n_hits = hitting shingle POSITIONS —
    * counted per occurrence so the kernel needs no per-document set. */
  def decontaminateBloom(corpus: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String, n: Int, mBits: Int = 1 << 16, k: Int = 4): DataFrame = {
    val words = bloomWords(evalDocs, textCol, n, mBits, k)
    corpus
      .select(col(idCol), graft.plans.BloomHits(
        graft.plans.NGramMd5(TextOps.tokens(col(textCol)), n, 8),
        words, mBits, Dedup.permParams(k)).as("n_hits"))
      .filter(col("n_hits") > 0)
  }

  /** Trainable Naive-Bayes text classifier — the fasttext-style
    * quality/domain filter of the GPT-3/CCNet lineage (train a cheap
    * linear model on self-labeled seed classes, score the corpus,
    * keep/weight by the score), distributed as three aggregates and a
    * broadcast:
    *
    *  1. TRAIN: one token-keyed aggregate counts each token's mass per
    *     class (map-side combinable), cut to the top-`vocabCap` tokens
    *     by total frequency (tf desc, token asc — deterministic) — the
    *     model is CONFIG-sized by construction, never vocabulary-tail
    *     sized.
    *  2. MODEL: Laplace-smoothed log-likelihood ratio per vocab token,
    *     llr(t) = ln((c₁+1)/(N₁+V)) − ln((c₀+1)/(N₀+V)), with class
    *     totals over the SAME capped vocab (one 1-row broadcast); the
    *     class-prior ln(n₁/n₀) folds into the score.
    *  3. SCORE: explode_outer tokens → broadcast-join the model →
    *     ONE doc-key aggregate (the lmScore shape: no corpus-sized
    *     rejoin; empty docs ride the outer row and score prior-only).
    *     Out-of-vocab tokens are skipped — the cap IS the model.
    *
    * Scores sum doubles, so the result is round(·,4) — the lmScore
    * rule absorbing cross-engine ln/summation last-ulp noise. Both
    * classes must be non-empty (the prior is a log odds). Returns
    * (id, n_scored, score, pred = score > 0). */
  def nbClassifier(docs: DataFrame, idCol: String, textCol: String,
      positive: Column, vocabCap: Int): DataFrame = {
    val (model, prior) = nbModelFrames(docs, textCol, positive, vocabCap)
    docs.select(col(idCol),
        explode_outer(filter(TextOps.tokens(col(textCol)), t => t =!= "")).as("t"))
      .join(broadcast(model), Seq("t"), "left")
      .crossJoin(broadcast(prior))
      .groupBy(col(idCol))
      .agg(count(col("llr")).as("n_scored"),
        round(first(col("p")) + coalesce(sum(col("llr")), lit(0.0)), 4).as("score"))
      .withColumn("pred", col("score") > 0)
  }

  /** Shared NB model construction: (capped llr vocabulary, 1-row
    * prior). See [[nbClassifier]] for the arithmetic. */
  private def nbModelFrames(docs: DataFrame, textCol: String,
      positive: Column, vocabCap: Int): (DataFrame, DataFrame) = {
    require(vocabCap >= 1, "vocab cap must be positive")
    val toks = docs.select(positive.cast("long").as("y"),
      explode(filter(TextOps.tokens(col(textCol)), t => t =!= "")).as("t"))
    val vocab = toks.groupBy(col("t"))
      .agg(sum(col("y")).as("c1"), sum(lit(1L) - col("y")).as("c0"),
        count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("t").asc).limit(vocabCap)
    val tot = vocab.agg(sum(col("c1")).as("n1"), sum(col("c0")).as("n0"),
      count(lit(1)).as("v"))
    val model = vocab.crossJoin(broadcast(tot))
      .select(col("t"),
        (log((col("c1") + 1.0) / (col("n1") + col("v"))) -
          log((col("c0") + 1.0) / (col("n0") + col("v")))).as("llr"))
    // the documented both-classes-non-empty precondition fails LOUDLY
    // at execution (a silent ln(n/0) → null would ripple null scores
    // through every document and surface as an opaque NPE downstream)
    val prior = docs.agg(
      when(sum(positive.cast("long")) === 0 ||
          sum(lit(1L) - positive.cast("long")) === 0,
        raise_error(lit("nbClassifier needs BOTH classes non-empty " +
          "(the prior is a log odds)")).cast("double"))
        .otherwise(log(sum(positive.cast("long")).cast("double") /
          sum(lit(1L) - positive.cast("long")))).as("p"))
    (model, prior)
  }

  /** Collected NB model for SERVING (the [[lmModel]] discipline): the
    * capped llr vocabulary + prior as driver values — vocab-cap-sized
    * by contract, i.e. config-sized, never corpus-sized — to embed in
    * the compiled [[graft.plans.NbScore]] kernel for the streaming
    * gate. Returns (vocab llr pairs, prior). */
  def nbModel(docs: DataFrame, textCol: String, positive: Column,
      vocabCap: Int): (Seq[(String, Double)], Double) = {
    val (model, prior) = nbModelFrames(docs, textCol, positive, vocabCap)
    (model.collect().map(r => r.getString(0) -> r.getDouble(1)).toSeq,
      prior.head().getDouble(0))
  }

  /** Threshold set for [[qualityGate]] (Gopher-family filter rules). */
  final case class GateRules(minTokens: Int, maxTokens: Int,
      minStopRatio: Double, minTtr: Double, maxDupTrigram: Double)

  /** Composite quality gate — the filter DECISION a prep pipeline
    * branches on: every per-document signal (token bounds, stopword
    * ratio, type-token ratio, duplicate-trigram fraction via the
    * compiled shingle kernel, LID agreement) evaluated in ONE map-only
    * pass; failures reported by rule name in a fixed order, keep = no
    * failures. Stateless per-row columns, so the same plan runs under
    * Structured Streaming unchanged. Returns
    * (id, n_tokens, reasons, keep). */
  def qualityGate(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, r: GateRules): DataFrame = {
    val tk = TextOps.tokens(col(textCol))
    val nTok = size(tk)
    // stopword hits against the LABEL's marker set — the English-only
    // formulation flagged every correctly-labeled non-English doc
    // (ADVICE r10). ONE TokenSetCount pass evaluates all five sets;
    // the label selects its element; unlabeled/unknown labels fall
    // back to the English set (and fail lang_mismatch anyway).
    val setCounts = graft.plans.TokenSetCount(tk, TextOps.LangMarkers.map(_._2))
    val stopHits = TextOps.LangMarkers.zipWithIndex.foldLeft(
        element_at(setCounts, 1)) {
      case (acc, ((lang, _), i)) =>
        when(col(langCol) === lang, element_at(setCounts, i + 1)).otherwise(acc)
    }
    val stopRatio = stopHits / nTok.cast("double")
    val ttr = size(array_distinct(tk)) / nTok.cast("double")
    val sh = graft.plans.NGramMd5(tk, 3, 8)
    val dup3 = when(size(sh) > 0,
      (size(sh) - size(array_distinct(sh))).cast("double") / size(sh).cast("double"))
      .otherwise(0.0)
    val checks: Seq[(String, Column)] = Seq(
      "too_short" -> (nTok < r.minTokens),
      "too_long" -> (nTok > r.maxTokens),
      "low_stopwords" -> (stopRatio < r.minStopRatio),
      "low_ttr" -> (ttr < r.minTtr),
      "repetitive" -> (dup3 > r.maxDupTrigram),
      // null-safe: an UNLABELED doc is a mismatch, not a silent pass —
      // plain =!= evaluates to null on a null label and the when()
      // would skip the rule entirely (review r10)
      "lang_mismatch" -> !(TextOps.predictLang(col(textCol)) <=> col(langCol)))
    val reasons = concat_ws(",", checks.map { case (n, c) => when(c, lit(n)) }: _*)
    docs.select(col(idCol), nTok.as("n_tokens"),
      reasons.as("reasons"), (reasons === "").as("keep"))
  }

  /** Deterministic global training-order shuffle: assign every
    * document a corpus-wide position by ranking on
    * (md5(salt‖id), id) — the data-ordering step before sharding a
    * training run (a corpus read in source order trains on one domain
    * at a time; a hash order interleaves sources uniformly, and the
    * salt makes each epoch's order fresh yet rerun-STABLE, unlike
    * rand()). The global rank is the [[blockedStartOffset]] two-phase
    * prefix sum with unit weights, blocked on hash ranges: the hash is
    * uniform on [0, 2³²), so `blockSpan`-wide ranges give balanced
    * blocks, the block-count table is metadata-sized (≤ 2³²/blockSpan
    * rows), and no window partition ever exceeds a block — a global
    * row_number() (one task for the whole corpus) is exactly the
    * serialization this avoids. Returns (id, pos) with pos a
    * permutation of [0, N). */
  def globalShuffle(docs: DataFrame, idCol: String, salt: String,
      blockSpan: Long = 1L << 16): DataFrame = {
    val base = docs.select(col(idCol),
        TextOps.md5Hash32(concat(lit(salt), col(idCol).cast("string"))).as("__h"))
      .withColumn("stratum", lit(""))
      .withColumn("n_tokens", lit(1L))
    blockedStartOffset(base, "__h", Seq(col("__h"), col(idCol)), blockSpan)
      .select(col(idCol), col("start_offset").as("pos"))
  }

  /** Curriculum ordering — the training-order refinement of
    * [[globalShuffle]]: documents take a global position ordered by
    * DIFFICULTY BIN first (ascending — the caller's score semantics
    * decide what "easy" means) and by deterministic salted hash within
    * each bin, so a curriculum run sees easy bins first but each bin
    * is internally shuffled (the curriculum-learning shape: ordered
    * phases, unbiased order inside a phase). `binEdges` are explicit
    * ascending score thresholds — bin = number of edges at or below
    * the score (quantile edges are a driver-side choice; explicit
    * edges keep the operator deterministic and rerun-stable).
    *
    * Scale: the position is the same blocked two-phase prefix sum as
    * [[globalShuffle]] over a composite numeric key
    * (bin << 32 | hash32) — block boundaries can never straddle bins
    * because 2^32 is a multiple of the block span, so block order IS
    * bin-major order and no global-sort or single-task row_number
    * appears anywhere. Returns (id, bin, pos). */
  def curriculumOrder(docs: DataFrame, idCol: String, scoreCol: String,
      binEdges: Seq[Double], salt: String,
      blockSpan: Long = 1L << 16): DataFrame = {
    require(binEdges.nonEmpty, "curriculum needs at least one bin edge")
    require(binEdges == binEdges.sorted && binEdges.distinct == binEdges,
      s"bin edges must be strictly ascending, got $binEdges")
    require(blockSpan > 0 && (1L << 32) % blockSpan == 0,
      s"block span must divide 2^32 (bins must own whole blocks), got $blockSpan")
    val bin = binEdges.foldLeft(lit(0L)) { (acc, e) =>
      acc + when(col(scoreCol) >= e, 1L).otherwise(0L)
    }
    val h = TextOps.md5Hash32(concat(lit(salt), col(idCol).cast("string")))
    val base = docs.select(col(idCol), bin.as("__bin"), h.as("__h"))
      .withColumn("__k", (col("__bin") * (1L << 32)) + col("__h"))
      .withColumn("stratum", lit(""))
      .withColumn("n_tokens", lit(1L))
    blockedStartOffset(base, "__k", Seq(col("__k"), col(idCol)), blockSpan)
      .select(col(idCol), col("__bin").as("bin"),
        col("start_offset").as("pos"))
  }

  /** Token-budget selection — assemble a training run of ~`budget`
    * tokens: documents take their [[globalShuffle]] position (salted
    * hash order — every source interleaved, rerun-stable), running
    * token offsets accumulate along that order through the blocked
    * two-phase prefix sum, and a document is kept iff its START
    * offset falls inside the budget (the [[shardAssign]] streaming-
    * pack rule, so the realized size overshoots by at most one
    * document). Changing the salt draws a fresh budget's worth;
    * changing the budget extends/truncates the SAME order (nested
    * samples — the property that makes scaling-law subsets
    * comparable). Scale: the shuffle-position pass + one blocked
    * prefix sum, both already serialization-free. The id column may be
    * ANY type (unlike [[sourceCap]]): blocks derive from the salted
    * HASH of the id, never the id itself. Returns
    * (id, pos, n_tokens, start_offset, kept). */
  def budgetSelect(docs: DataFrame, idCol: String, textCol: String,
      budget: Long, salt: String, blockDocs: Long = PackBlockDocs): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val pos = globalShuffle(docs, idCol, salt, blockDocs)
    val base = docs.join(pos, Seq(idCol))
      .select(col(idCol), col("pos"), lit("").as("stratum"),
        size(TextOps.tokens(col(textCol))).as("n_tokens"))
    blockedStartOffset(base, "pos", Seq(col("pos")), blockDocs)
      .withColumn("kept", col("start_offset") < budget)
      .select(col(idCol), col("pos"), col("n_tokens"),
        col("start_offset"), col("kept"))
  }

  /** N-gram LM cross-entropy scoring — the CCNet-style quality axis
    * (Wenzek et al. 2020): train a capped stupid-backoff bigram model
    * (Brants et al. 2007) on a trusted REFERENCE slice, score every
    * corpus document by its per-token cross-entropy under that model.
    * Documents that read like the reference score low; gibberish and
    * boilerplate score high — the perplexity complement of the
    * rule-based [[qualityGate]].
    *
    * Model: top-`topBigrams` bigrams by count carrying their TRUE
    * prefix counts, plus top-`topUnigrams` unigrams and the reference
    * token total. All keys are 60-bit [[graft.plans.NGramMd5]] hashes
    * (md5-fold of the n-gram text, the house hash): signatures compile
    * to ONE kernel pass per document instead of the interpreted
    * `transform`+`concat_ws` HOF chain (measured 98 s → see
    * BASELINE.md for the fold), join keys are fixed-width longs
    * instead of strings, and a 60-bit collision merely merges two
    * count rows (P ≈ |model|²/2⁶¹ — negligible, and the oracle replays
    * the same hashes bit-for-bit). Ties in the top-k cuts break on the
    * hash (total order). Scoring backs off bigram → 0.4·unigram-MLE →
    * 0.4/N (unseen), the stupid-backoff schedule; xent = −mean ln p
    * over a document's bigram positions, rounded to 4 decimals so the
    * cross-engine last-ulp noise of `ln` and of partial-sum
    * reassociation (both ≲1e-11 here) can never reach the compared
    * digits.
    *
    * Scale: training is a vocabulary-sized hash agg + top-k (the
    * text_vocab posture — never a total sort); the capped model is
    * config-sized BY CONSTRUCTION and broadcasts; scoring is one
    * map-side kernel+zip explode + two broadcast joins + one
    * partial-aggregated doc-key shuffle. Nothing anywhere scales
    * super-linearly with the corpus. Returns (id, n_scored, xent);
    * documents with fewer than two tokens keep a row with
    * n_scored = 0 and NULL xent.
    */
  /** Model-frame halves of [[lmScore]]'s training pass, shared with
    * the driver-side [[lmModel]] collector. Returns
    * (bgModel(bgh, c2, c1p), uniTop(uh, c1), nRef(n_ref)). */
  private def lmModelFrames(reference: DataFrame, textCol: String,
      topBigrams: Int, topUnigrams: Int): (DataFrame, DataFrame, DataFrame) = {
    require(topBigrams > 0 && topUnigrams > 0,
      "LM model caps must be positive")
    def tk = TextOps.tokens(col(textCol))
    val refPre = reference.select(
      graft.plans.NGramMd5(tk, 2, 15).as("bgh_arr"),
      graft.plans.NGramMd5(tk, 1, 15).as("uh_arr"))
    val uni = refPre.select(explode(col("uh_arr")).as("uh"))
      .groupBy(col("uh")).agg(count(lit(1)).as("c1"))
    val nRef = uni.agg(sum(col("c1")).as("n_ref")) // 1-row scalar bind
    val uniTop = uni.orderBy(col("c1").desc, col("uh").asc).limit(topUnigrams)
    // bigram hash zipped with its PREFIX hash (uh_arr[i] prefixes
    // bgh_arr[i]) — the backoff denominator is the TRUE prefix count,
    // which always exists (a reference bigram's prefix is a reference
    // token); the unigram CAP must not starve it, so join uncapped
    val bgTop = refPre
      .select(col("bgh_arr"),
        slice(col("uh_arr"), lit(1),
          greatest(size(col("uh_arr")) - 1, lit(0))).as("pfx_arr"))
      .select(explode(arrays_zip(col("bgh_arr"), col("pfx_arr"))).as("z"))
      .select(col("z.bgh_arr").as("bgh"), col("z.pfx_arr").as("pfxh"))
      .groupBy(col("bgh"), col("pfxh")).agg(count(lit(1)).as("c2"))
      .orderBy(col("c2").desc, col("bgh").asc).limit(topBigrams)
    val bgModel = bgTop
      .join(uni.select(col("uh").as("pfxh"), col("c1").as("c1p")), Seq("pfxh"))
      .select(col("bgh"), col("c2"), col("c1p"))
    (bgModel, uniTop, nRef)
  }

  /** Collect the capped LM model to the driver — config-sized BY
    * CONSTRUCTION (top-k caps), the bloomWords/centroid discipline:
    * build ONCE from the reference, serve forever, including the
    * streaming face ([[graft.streaming.EventsStream.pplGate]]) where
    * the model rides inside the compiled [[graft.plans.LmXent]]
    * kernel. */
  def lmModel(reference: DataFrame, textCol: String,
      topBigrams: Int, topUnigrams: Int): LmModel = {
    val (bgModel, uniTop, nRef) = lmModelFrames(reference, textCol,
      topBigrams, topUnigrams)
    // ONE action for all three frames (tag-union): separate collects
    // re-ran the shared reference scan + unigram aggregate per frame —
    // three jobs for one model, measured 2.50 s vs 0.76 s for the
    // whole bucket operator at sf0.1; in a single plan the identical
    // `uni` subtrees collapse into one exchange via ReuseExchange
    val packed = bgModel.select(lit("b").as("t"),
        col("bgh").as("k"), col("c2").as("v1"), col("c1p").as("v2"))
      .unionAll(uniTop.select(lit("u").as("t"),
        col("uh").as("k"), col("c1").as("v1"), lit(0L).as("v2")))
      .unionAll(nRef.select(lit("n").as("t"),
        lit(0L).as("k"), col("n_ref").as("v1"), lit(0L).as("v2")))
      .collect()
    val bg = packed.filter(_.getString(0) == "b")
    val un = packed.filter(_.getString(0) == "u")
    val nR = packed.filter(_.getString(0) == "n")
    LmModel(bg.map(_.getLong(1)).toSeq, bg.map(_.getLong(2)).toSeq,
      bg.map(_.getLong(3)).toSeq, un.map(_.getLong(1)).toSeq,
      un.map(_.getLong(2)).toSeq, nR.head.getLong(2))
  }

  def lmScore(corpus: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, topBigrams: Int, topUnigrams: Int): DataFrame = {
    def tk = TextOps.tokens(col(textCol))
    def pre(df: DataFrame, keep: Column*) = df.select(keep :+
      graft.plans.NGramMd5(tk, 2, 15).as("bgh_arr") :+
      graft.plans.NGramMd5(tk, 1, 15).as("uh_arr"): _*)
    val (bgModel, uniTop, nRef) = lmModelFrames(reference, textCol,
      topBigrams, topUnigrams)
    // corpus positions: bigram hash zipped with the NEXT token's hash
    // (uh_arr[i+1] — the unigram-backoff key). explode_OUTER keeps a
    // null position row for <2-token documents, so the per-doc
    // aggregate itself yields their (0, NULL) rows — no corpus-sized
    // rejoin at the end (the first formulation's id-join planned as a
    // corpus×corpus sort-merge join; this plan's only shuffle is the
    // doc-key aggregate)
    val cb = pre(corpus, col(idCol))
      .select(col(idCol), col("bgh_arr"),
        slice(col("uh_arr"), lit(2),
          greatest(size(col("uh_arr")) - 1, lit(0))).as("nx_arr"))
      .select(col(idCol),
        explode_outer(arrays_zip(col("bgh_arr"), col("nx_arr"))).as("z"))
      .select(col(idCol), col("z.bgh_arr").as("bgh"), col("z.nx_arr").as("nxh"))
    cb.join(broadcast(bgModel), Seq("bgh"), "left")
      .join(broadcast(uniTop.select(col("uh").as("nxh"), col("c1").as("c1n"))),
        Seq("nxh"), "left")
      .crossJoin(broadcast(nRef))
      .withColumn("logp",
        when(col("bgh").isNull, lit(null).cast("double")) // the outer row
          .when(col("c2").isNotNull, log(col("c2") / col("c1p")))
          .when(col("c1n").isNotNull,
            log(lit(0.4) * col("c1n") / col("n_ref")))
          .otherwise(log(lit(0.4) / col("n_ref"))))
      .groupBy(col(idCol))
      .agg(count(col("bgh")).as("n_scored"),
        round(-(sum(col("logp")) / count(col("bgh"))), 4).as("xent"))
  }

  /** Head/middle/tail perplexity bucketing — the DECISION face of
    * [[lmScore]] (CCNet partitions its corpus into exactly these three
    * buckets by cross-entropy tertile and trains preferentially on the
    * head). Tertile thresholds come from a deterministic md5-bucket
    * sample of the SCORED documents (rate-`samplePctN`, the
    * [[samplePct]] rule): threshold estimation needs a sample, not the
    * corpus, and the hash rule makes it rerun-stable. The sampled xent
    * values are a config-sized table by the sampling contract (pick
    * `samplePctN` so ~10³–10⁴ docs land in it at the target corpus;
    * estimation error shrinks as 1/√n regardless of corpus size), so
    * they may collect to the driver — the mixRates/centroid
    * discipline. Thresholds are the ceil(S/3)- and ceil(2S/3)-th
    * smallest sampled xents (order statistics of a rounded multiset —
    * no interpolation arithmetic to drift cross-engine). The bucket
    * pass itself is map-only over [[lmScore]]'s output. Returns
    * (id, n_scored, xent, bucket ∈ head|middle|tail|unscored). */
  def lmBucket(corpus: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, topBigrams: Int, topUnigrams: Int,
      samplePctN: Int, salt: String): DataFrame = {
    require(samplePctN > 0 && samplePctN <= 100,
      s"sample percent must be in (0, 100], got $samplePctN")
    // train ONCE and serve both passes from the compiled kernel (the
    // pplGate shape, proven ≡ lmScore per-doc by LlmSpec): the first
    // formulation called lmScore twice — threshold sample + full
    // corpus — and each call re-ran the model-training aggregates,
    // because the two passes are separate ACTIONS (sharing the frame
    // DataFrames shares no computation across actions). The collected
    // model is config-sized by the top-k contract; scoring becomes one
    // map-only kernel column, and the threshold action scans only the
    // sampled docs (the id-hash filter pushes below the kernel
    // project). Measured at sf0.1: 1.19 s → 0.76 s — provided the
    // model collect is ONE action (see lmModel: the three-collect
    // formulation re-ran training per frame and measured 2.50 s,
    // SLOWER than the double-score it replaced).
    val m = lmModel(reference, textCol, topBigrams, topUnigrams)
    def kernelScore(df: DataFrame) = df.select(col(idCol),
        graft.plans.LmXent(TextOps.tokens(col(textCol)), m).as("__s"))
      .select(col(idCol), col("__s.n_scored").as("n_scored"),
        col("__s.xent").as("xent"))
    // budget-capped sample (r17 order #4): `samplePctN` stays the
    // rate UP TO the absolute budget — one count aggregate sizes the
    // corpus, and while samplePctN% of it fits the budget (every
    // declared/benched corpus does) the sampled set is EXACTLY the
    // historical samplePct < samplePctN set, so oracles replaying the
    // percent rule stay hash-identical; only a corpus whose percent
    // sample would outgrow the budget shrinks the rate
    val nCorpus = corpus.count()
    val sampled = kernelScore(
        corpus.filter(sampleBudget(col(idCol), salt, nCorpus,
          SampleBudgetDocs, samplePctN)))
      .filter(col("n_scored") > 0)
      .select(col("xent")).collect().map(_.getDouble(0)).sorted
    val scored = kernelScore(corpus)
    require(sampled.nonEmpty,
      "lmBucket: the threshold sample is empty — raise samplePctN")
    val s = sampled.length
    val t1 = sampled(math.ceil(s / 3.0).toInt - 1)
    val t2 = sampled(math.ceil(2 * s / 3.0).toInt - 1)
    scored.withColumn("bucket",
      when(col("n_scored") === 0, lit("unscored"))
        .when(col("xent") <= t1, lit("head"))
        .when(col("xent") <= t2, lit("middle"))
        .otherwise(lit("tail")))
  }

  /** DSIR-style importance weighting — data selection via importance
    * resampling (Xie et al. 2023): weight every corpus document by how
    * much more likely its hashed-bigram features are under the TARGET
    * distribution (the trusted reference slice) than under the RAW
    * distribution (a hash-sample of the corpus itself),
    * log w(x) = Σ_f [ln p̂_t(f) − ln p̂_r(f)] over the document's bigram
    * features, p̂ = add-1-smoothed bucket frequencies. Features hash
    * into a FIXED `buckets`-sized space (the paper's hashed n-gram
    * trick), so both models are config-sized BY CONSTRUCTION —
    * independent of vocabulary or corpus — and broadcast; the raw
    * model trains on the [[samplePct]]-sampled slice (rate-`rawPct`),
    * never the full corpus. The per-doc sum is intentionally UNNORMALIZED
    * (paper semantics: a long on-target document carries more target
    * evidence than a short one). Scale: two bucket-keyed count aggs
    * (≤ `buckets` rows each) + one kernel explode + two broadcast
    * joins + one doc-key aggregate; explode_outer folds featureless
    * docs (< 2 tokens) in as (0, NULL, false) rows — no corpus rejoin
    * (the lmScore lesson). round(·,4) absorbs ln/summation last-ulp
    * noise. Returns (id, n_feat, log_w, keep = log_w > tau). */
  def dsirWeights(corpus: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, buckets: Int, rawPct: Int, salt: String,
      tau: Double): DataFrame = {
    require(buckets > 0, "feature-bucket count must be positive")
    require(rawPct > 0 && rawPct <= 100,
      s"raw-sample percent must be in (0, 100], got $rawPct")
    def tk = TextOps.tokens(col(textCol))
    def bucketCounts(df: DataFrame) = df
      .select(explode(graft.plans.NGramMd5(tk, 2, 15)).as("h"))
      .groupBy((col("h") % buckets).as("b")).agg(count(lit(1)).as("c"))
    val tgt = bucketCounts(reference)
    val raw = bucketCounts(corpus.filter(samplePct(col(idCol), salt) < rawPct))
    val nT = tgt.agg(sum(col("c")).as("n_t")) // 1-row scalar binds
    val nR = raw.agg(sum(col("c")).as("n_r"))
    corpus
      .select(col(idCol),
        explode_outer(graft.plans.NGramMd5(tk, 2, 15)).as("h"))
      .withColumn("b", col("h") % buckets)
      .join(broadcast(tgt.withColumnRenamed("c", "c_t")), Seq("b"), "left")
      .join(broadcast(raw.withColumnRenamed("c", "c_r")), Seq("b"), "left")
      .crossJoin(broadcast(nT)).crossJoin(broadcast(nR))
      .withColumn("lw",
        when(col("h").isNull, lit(null).cast("double")).otherwise(
          log((coalesce(col("c_t"), lit(0L)) + lit(1.0)) /
              (col("n_t") + lit(buckets.toDouble))) -
          log((coalesce(col("c_r"), lit(0L)) + lit(1.0)) /
              (col("n_r") + lit(buckets.toDouble)))))
      .groupBy(col(idCol))
      .agg(count(col("h")).as("n_feat"),
        round(sum(col("lw")), 4).as("log_w"))
      .withColumn("keep", coalesce(col("log_w") > tau, lit(false)))
  }

  /** Mixture targeting — the planning half of data mixing: given
    * target token-share weights per stratum (summing to 1), compute the
    * per-stratum keep RATES that realize the mixture while discarding
    * as little as possible. The achievable corpus size is bounded by
    * the scarcest stratum relative to its target, T = min_s(tokens_s /
    * w_s); stratum s keeps w_s·T of its tokens_s, i.e. rate_s =
    * w_s·T / tokens_s, with the binding stratum at rate 1. Output is
    * one row per TARGETED stratum — including strata the corpus does
    * not contain, which surface with n_tokens = 0 and collapse T (and
    * so every rate) to 0: an impossible mixture is visible in the
    * plan's own output, never silently renormalized over the strata
    * that happen to exist (ADVICE r10). [[stratifiedSample]] applies
    * the rates downstream. Scale: ONE hash agg over the stratum key +
    * a broadcast scalar bind — the decision table is config-sized no
    * matter the corpus. */
  def mixRates(docs: DataFrame, stratumCol: String, textCol: String,
      targets: Map[String, Double]): DataFrame = {
    // a zero weight divides to Infinity (t_max) and multiplies back to
    // NaN rates; negative weights flip the min — refuse loudly (the
    // clusterBalance degenerate-parameter discipline, review r10)
    require(targets.values.forall(_ > 0),
      s"mixRates needs strictly positive target weights, got $targets")
    val spark = docs.sparkSession
    import spark.implicits._
    val targetDf = targets.toSeq.sortBy(_._1).toDF("stratum", "target_w")
    val tokens = docs.groupBy(col(stratumCol).as("stratum"))
      .agg(sum(size(TextOps.tokens(col(textCol)))).as("n_tokens"))
    // left join FROM the config-sized target table: a targeted stratum
    // absent from the corpus keeps its row. The token aggregate is
    // stratum-sized, so it broadcasts (an outer join can only build
    // its non-preserved side — hinting the target table would be a
    // silent no-op)
    val withW = targetDf.join(broadcast(tokens), Seq("stratum"), "left")
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
    val tmax = withW.agg(min(col("n_tokens") / col("target_w")).as("t_max"))
    withW.crossJoin(broadcast(tmax)) // 1-row scalar bind
      .select(col("stratum"), col("n_tokens"), col("target_w"),
        // absent stratum: 0 tokens would divide 0/0 → NaN; pin rate 0.
        // least() guards the binding stratum against a +1-ulp overshoot
        when(col("n_tokens") === 0, lit(0.0)).otherwise(
          round(least(lit(1.0), col("target_w") * col("t_max") / col("n_tokens")), 6))
          .as("rate"))
  }

  /** Temperature-tempered mixture planning — the multilingual-sampling
    * classic (weights ∝ tokens^α, α < 1 upsampling low-resource
    * strata): given the observed per-stratum token mass n_s, plan keep
    * rates realizing the α-tempered mixture w_s ∝ n_s^α while
    * discarding as little as possible. Normalization cancels inside
    * rate_s = w_s·T/n_s (T = min_t n_t/w_t), so the raw tempered
    * weight is used directly — no order-sensitive floating SUM crosses
    * the engine boundary, keeping the oracle bit-exact. The SMALLEST
    * stratum binds at rate 1 (the α-tempering shape: keep everything
    * rare, downsample the big strata ∝ n^(α−1)). α = 0.5 computes via
    * `sqrt` (correctly rounded per IEEE in BOTH engines — the declared
    * twin's setting); other α use `pow`, whose last-ulp behavior is
    * libm-specific (fine for the library, not for a hash-matched
    * oracle). Same scale posture as [[mixRates]]: ONE stratum agg +
    * a broadcast scalar bind. */
  def mixRatesTemperature(docs: DataFrame, stratumCol: String, textCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1,
      s"temperature exponent must be in (0, 1], got $alpha")
    val tokens = docs.groupBy(col(stratumCol).as("stratum"))
      .agg(sum(size(TextOps.tokens(col(textCol)))).as("n_tokens"))
    val wRaw =
      if (alpha == 0.5) sqrt(col("n_tokens").cast("double"))
      else pow(col("n_tokens").cast("double"), alpha)
    val withW = tokens.withColumn("w_raw", wRaw)
    val tmax = withW.agg(min(col("n_tokens") / col("w_raw")).as("t_max"))
    withW.crossJoin(broadcast(tmax)) // 1-row scalar bind (mixRates pattern)
      .select(col("stratum"), col("n_tokens"),
        round(col("w_raw"), 6).as("w_raw"),
        round(least(lit(1.0), col("w_raw") * col("t_max") / col("n_tokens")), 6)
          .as("rate"))
  }

  /** Apply a target mixture end-to-end: [[mixRates]] plans the
    * per-stratum keep rates, then [[stratifiedSample]]'s md5-bucket
    * rule applies them (rates quantized to integer percent — the
    * sampler's deterministic unit). The rate table is stratum-sized, so
    * the collect is config-sized by construction; the sampling pass
    * itself stays map-only. Realized token shares approach the targets
    * up to percent quantization and per-bucket hash variance. */
  def applyMix(docs: DataFrame, idCol: String, stratumCol: String,
      textCol: String, targets: Map[String, Double], salt: String): DataFrame = {
    val planned = mixRates(docs, stratumCol, textCol, targets)
      .select(col("stratum"), col("rate")).collect()
    // a rate of 0 can only mean a targeted stratum the corpus lacks
    // (present strata all get rate ≥ w_s·T/tokens_s > 0) — the mixture
    // is unrealizable, so refuse loudly rather than keep the 1% floor
    // of nothing (ADVICE r10)
    val absent = planned.filter(_.getDouble(1) == 0.0).map(_.getString(0))
    require(absent.isEmpty,
      s"applyMix: targeted strata absent from the corpus: ${absent.mkString(",")}")
    val rates = planned
      // floor at 1%: a planned rate below the sampler's percent unit
      // must round UP, not to zero — rounding a 0.4% rate to 0 would
      // DROP the stratum entirely (total mixture error), while keeping
      // 1% overshoots only that stratum's small share (review r10)
      .map(r => r.getString(0) ->
        (r.getDouble(1) * 100).round.toInt.max(1).min(100)).toMap
    val targeted = docs.filter(col(stratumCol).isin(rates.keys.toSeq: _*))
    stratifiedSample(targeted, idCol, stratumCol, rates, defaultPct = 0, salt)
  }

  /** Apply an α-tempered mixture end-to-end — [[applyMix]]'s sibling
    * with [[mixRatesTemperature]] as the planner: plan keep rates
    * ∝ tokensᵅ⁻¹, then run them through [[stratifiedSample]]'s
    * md5-bucket rule (rates quantized to integer percent, floored at
    * 1% — the applyMix rounding discipline). Every observed stratum
    * plans a positive rate by construction (its own tokens bound T),
    * so there is no absent-stratum failure mode here; unplanned strata
    * simply aren't sampled (defaultPct 0). */
  def applyMixTemperature(docs: DataFrame, idCol: String, stratumCol: String,
      textCol: String, alpha: Double, salt: String): DataFrame = {
    val rates = mixRatesTemperature(docs, stratumCol, textCol, alpha)
      .select(col("stratum"), col("rate")).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1) * 100).round.toInt.max(1).min(100)).toMap
    stratifiedSample(docs, idCol, stratumCol, rates, defaultPct = 0, salt)
  }

  /** Cluster-balanced sampling — the data-mixing primitive over an
    * EMBEDDING clustering rather than a label column (D4/DataComp-style
    * rebalancing): assign every vector to its nearest centroid cell
    * (map-only, broadcast-literal centroids — [[Similarity.ivfCell]]),
    * then keep the same number of rows from every cell so no cluster
    * dominates the mix. The kept subset per cell is the `target`
    * smallest by a salted md5 rank — deterministic, rerun-stable, and
    * unbiased within cell (hash order is independent of id order).
    * Shuffles: one config-sized cell-count aggregation (nCells rows,
    * broadcast back as a scalar) + ONE window shuffle on the cell key.
    * At 100 TB the window partitions by cell (nCells × corpus/nCells
    * rows each) — bounded by the same occupancy argument as the IVF
    * candidate cap; a skewed cell costs its occupancy, never O(N²). */
  def clusterBalance(emb: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Long, Seq[Double])], salt: String): DataFrame = {
    // an empty quantizer would make every cell assignment null — refuse
    // loudly instead of returning an empty "balanced" sample
    require(centroids.nonEmpty, "clusterBalance needs at least one centroid")
    val v = emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nv", Similarity.norm(col("v")))
    val assigned = v
      .withColumn("cell", Similarity.ivfCell(col("v"), col("nv"), centroids))
      .select(col(idCol), col("cell"))
    // `assigned` is consumed twice (cell-count aggregate + window) and
    // the subtrees share no exchange, so the scan + argmax pass DOES
    // run twice — but materializing it was MEASURED slower at sf0.1
    // (0.46→0.83 s) AND at ×100 (0.97→1.33 s): the narrow (id, cell)
    // recompute is map-parallel and cheap, while an eager checkpoint
    // is a serial barrier + write. Recompute wins; re-measure before
    // "fixing" this again (review r10 finding rejected by measurement).
    val target = assigned.groupBy(col("cell")).agg(count(lit(1)).as("csz"))
      .agg(min(col("csz")).as("target"))
    val w = Window.partitionBy(col("cell")).orderBy(
      TextOps.md5Hash32(concat(lit(salt), col(idCol).cast("string"))).asc,
      col(idCol).asc)
    assigned
      .withColumn("rn", row_number().over(w))
      .crossJoin(broadcast(target)) // 1-row scalar bind, same as the other scalar binds
      .filter(col("rn") <= col("target"))
      .select(col(idCol), col("cell"), col("rn"), col("target"))
  }
}
