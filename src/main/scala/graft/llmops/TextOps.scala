package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline surface
  * (SURVEY §2.B.12): tokenization, shingling, fingerprints, quality
  * metrics, language-ID. Everything is built from codegen'd builtin
  * functions (no UDFs) and deterministic integer/string arithmetic, so
  * results are engine-reproducible (the DuckDB oracle re-derives them).
  *
  * Scale: all per-document column expressions — embarrassingly parallel,
  * no shuffle; shuffles appear only in corpus-level aggregations built
  * on top (e.g. dedup joins).
  */
object TextOps {

  /** Whitespace tokenization (keeps empties, limit -1, so the count
    * matches SQL string_split exactly). */
  def tokens(text: Column): Column = split(text, " ", -1)

  /** Word n-gram shingles as space-joined strings; empty array when the
    * document has fewer than n tokens. */
  def shingles(text: Column, n: Int): Column = {
    val tk = tokens(text)
    when(size(tk) >= n,
      transform(sequence(lit(0), size(tk) - n),
        i => concat_ws(" ", slice(tk, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** 32-bit integer hash of a string via the first 8 hex chars of md5 —
    * md5 is available identically in Spark and DuckDB (and is the
    * reference's own hash primitive, `HashUtils.java:17,23`). Output in
    * [0, 2^32). */
  def md5Hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** 60-bit variant (15 hex chars — stays within signed-long range). */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Polynomial rolling hash over the document's characters
    * (Karp-Rabin style): fold (acc*31 + codepoint) mod p, seed 0, so
    * the first step yields ascii(c1) — matching DuckDB's list_reduce
    * (which seeds with the first element). Runs as the compiled
    * [[graft.plans.RollingHash]] kernel — one JVM loop per row instead
    * of an interpreted expression-tree walk per CHARACTER (the HOF
    * form is kept in LlmSpec as the bit-identity cross-check). */
  val RollMod = 1000000007L
  def rollingHash(text: Column): Column =
    graft.plans.RollingHash(text, RollMod)

  /** The interpreted HOF formulation, kept for cross-checking the
    * native kernel in tests. */
  def rollingHashHof(text: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(text)), i => ascii(substring_index_at(text, i))),
      lit(0L),
      (acc, x) => (acc * 31 + x) % RollMod)

  // substring(text, i, 1) with a Column position (Scala API only takes Int)
  private def substring_index_at(text: Column, i: Column): Column =
    text.substr(i, lit(1))

  /** Document fingerprint: md5 of the lowercased text (exact-dup grade)
    * — the distributed analogue of content hashing. */
  def fingerprint(text: Column): Column = md5(lower(text))

  /** Unicode canonicalization (NFC + accent strip + root-locale
    * lowercase) via the compiled [[graft.plans.NormalizeText]] kernel —
    * run BEFORE exact/fingerprint dedup so composed, decomposed, and
    * cased spellings of the same text collapse to one key. Map-only. */
  def normalizeText(text: Column): Column =
    graft.plans.NormalizeText(text)

  /** Winnowing fingerprints (MOSS — Schleimer et al. 2003): the sparse
    * position-robust fingerprint set of a document, selected as the
    * rightmost minimum of every `w`-window over the `k`-gram md5
    * hashes via the compiled [[graft.plans.WinnowSelect]] kernel.
    * Two documents sharing any `w + k − 1`-token run share a
    * fingerprint — the guarantee plain sampling (every i-th hash)
    * cannot give. Map-only. Returns array<struct<pos, fp>>. */
  def winnow(text: Column, k: Int, w: Int): Column =
    graft.plans.WinnowSelect(graft.plans.NGramMd5(tokens(text), k, 8), w)

  /** Fixture subword vocabulary for [[subwordCount]] — frequent English
    * digraphs/trigraphs plus common whole words, the shape of the head
    * of a trained BPE merge table. FIXED by design: a deterministic
    * vocab is what makes the greedy segmentation reproducible across
    * engines (the oracle interpolates this same list). Single
    * characters need no entries — they are the tokenizer's implicit
    * fallback. */
  val SubwordVocab: Seq[String] = Seq(
    "the", "ing", "ion", "and", "ent", "tion", "that", "with",
    "er", "an", "re", "on", "at", "en", "ed", "es", "or", "te",
    "in", "st", "ar", "al", "le", "de", "co", "un", "th", "is",
    "it", "ou", "se", "ve", "ly", "ro", "ra", "ri")

  /** Tokenizer-faithful token count: the number of subword tokens a
    * greedy longest-match (MaxMatch/WordPiece-style) segmentation over
    * [[SubwordVocab]] produces for the lowercased whitespace words —
    * the count a training pipeline budgets sequences by when the real
    * tokenizer is subword, not whitespace. Compiled one-pass kernel
    * ([[graft.plans.SubwordCount]]); whitespace [[tokens]] stays the
    * default everywhere else. */
  def subwordCount(text: Column): Column =
    graft.plans.SubwordCount(tokens(lower(text)), SubwordVocab)

  /** Language-ID by stopword-marker scoring (n-gram heuristic): count
    * marker-token hits per language, argmax with a fixed tie-break
    * order. Deterministic; SQL-expressible. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "la", "de", "y", "los"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "zh" -> Seq("de", "le", "he", "shi", "zai"))

  /** Marker-hit count via the native [[graft.plans.TokenSetCount]]
    * kernel — value-identical to the interpreted
    * `size(filter(tokens, _.isin(markers)))` it replaces (LlmSpec
    * asserts the bit-identity), but one compiled pass per row. */
  def langHits(text: Column, markers: Seq[String]): Column =
    element_at(graft.plans.TokenSetCount(tokens(text), Seq(markers)), 1)

  def predictLang(text: Column): Column = {
    // ONE kernel pass counts all five marker sets; Catalyst's
    // subexpression elimination evaluates the shared array once
    val counts = graft.plans.TokenSetCount(tokens(text), LangMarkers.map(_._2))
    val hits = LangMarkers.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(counts, i + 1)
    }
    // argmax with declaration-order tie-break
    hits.tail.foldLeft((hits.head._2, lit(hits.head._1))) {
      case ((bestScore, bestLang), (lang, score)) =>
        (when(score > bestScore, score).otherwise(bestScore),
          when(score > bestScore, lit(lang)).otherwise(bestLang))
    }._2
  }

  /** [[predictLang]] with a CONFIDENCE margin — the gate a real LID
    * pipeline thresholds on: (pred_lang, margin = best − second-best
    * marker hits). A margin of 0 means the argmax was a coin flip on
    * the tie-break order; production gates demand margin ≥ m before
    * trusting the label. Same ONE TokenSetCount kernel pass; the fold
    * tracks (best, second, lang) as pure column expressions, so the
    * SQL twin replays it step for step. */
  def predictLangMargin(text: Column): (Column, Column) = {
    val counts = graft.plans.TokenSetCount(tokens(text), LangMarkers.map(_._2))
    val hits = LangMarkers.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(counts, i + 1)
    }
    val init = (hits.head._2, lit(0), lit(hits.head._1))
    val (best, second, lang) = hits.tail.foldLeft(init) {
      case ((b, s2, l), (lg, h)) =>
        (when(h > b, h).otherwise(b),
          when(h > b, b).otherwise(when(h > s2, h).otherwise(s2)),
          when(h > b, lit(lg)).otherwise(l))
    }
    (lang, best - second)
  }

  /** Quality metrics: lengths, token stats, stopword ratio (identical
    * expression trees on the SQL side make the double ratios exact). */
  def qualityColumns(text: Column): Seq[Column] = {
    val tk = tokens(text)
    val nTok = size(tk)
    val stop = langHits(text, LangMarkers.head._2)
    Seq(
      length(text).as("n_chars_m"),
      nTok.as("n_tokens"),
      size(array_distinct(tk)).as("n_distinct_tokens"),
      (size(array_distinct(tk)) / nTok.cast("double")).as("ttr"),
      stop.as("stop_hits"),
      (stop / nTok.cast("double")).as("stop_ratio"))
  }

  /** Boilerplate DISCOVERY report — the human-readable face of the
    * span-dedup family: the top-`k` repeated `windowTokens`-token
    * passages by corpus-wide position count, with how many distinct
    * documents carry each ([[graft.llmops.Dedup.duplicateSpans]] tells
    * you WHERE repeated passages sit; this tells you WHAT they are —
    * the license headers / templated intros a scrub policy is written
    * against). Scale shape: one map-only gram explode, ONE
    * map-side-combinable aggregate on the gram string (a universal
    * boilerplate gram is a hot GROUP-BY key — partial rows, never a
    * window partition; the distinct-doc count is the standard two-phase
    * distinct aggregate), then a TakeOrdered top-k — no global sort.
    * Ordering is total ((count desc, gram asc) — gram is unique after
    * the groupBy), so the report is deterministic. Returns
    * (gram, n_positions ≥ 2, n_docs). */
  def boilerplateTop(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int, k: Int): DataFrame = {
    require(windowTokens >= 2, "boilerplate windows need ≥ 2 tokens")
    require(k > 0, "top-k must be positive")
    docs.select(col(idCol), explode(shingles(col(textCol), windowTokens)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_positions"),
        count_distinct(col(idCol)).as("n_docs"))
      .filter(col("n_positions") >= 2)
      .orderBy(col("n_positions").desc, col("gram").asc)
      .limit(k)
  }

  /** Context-window chunking — split each document into fixed-size
    * token windows with a stride (overlapping when stride < size, the
    * training-sequence shape): chunk i covers tokens [i·stride,
    * i·stride + size), the last chunk clipping at the document end.
    * The token array is MATERIALIZED as a column before the explode so
    * the split runs once per document, not once per chunk (the same
    * lambda-re-evaluation trap [[cleanColumns]] documents). Map-only:
    * zero shuffle, output-linear in total chunks — the plan a 100 TB
    * corpus chunking job wants. Returns (id, chunk_id, chunk_text,
    * n_chunk_tokens). */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      size_ : Int, stride: Int): DataFrame = {
    require(size_ > 0 && stride > 0, "chunk size and stride must be positive")
    // null text normalizes to "" (one empty token, one empty chunk):
    // size(null) = -1 would otherwise make sequence(0, -1) count DOWN,
    // emitting chunk_ids 0 and -1 with -1 token counts (review r10)
    docs.select(col(idCol), tokens(coalesce(col(textCol), lit(""))).as("tk"))
      // chunk starts 0, stride, 2·stride … while start < n_tokens
      .withColumn("chunk_id",
        explode(sequence(lit(0),
          floor((size(col("tk")) - 1).cast("double") / stride).cast("int"))))
      .select(col(idCol), col("chunk_id"),
        concat_ws(" ", slice(col("tk"), col("chunk_id") * stride + 1, lit(size_)))
          .as("chunk_text"),
        size(slice(col("tk"), col("chunk_id") * stride + 1, lit(size_)))
          .as("n_chunk_tokens"))
  }

  /** Scrub patterns for [[cleanColumns]] — written in the common subset
    * of Java regex (Spark) and RE2 (DuckDB): no backreferences, no
    * lookaround, so ONE literal serves both engines (the constants are
    * interpolated into the oracle SQL, drift-proof by construction). */
  val UrlRe = "https?://[^ ]+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Text normalization / scrubbing — the pre-tokenization hygiene pass
    * of a pretraining pipeline: strip URLs and e-mail addresses (PII /
    * boilerplate), collapse whitespace runs, then collapse ADJACENT
    * duplicate tokens (the boilerplate-stutter rule — RE2 has no
    * backreferences, so the dedupe is positional array arithmetic both
    * engines express identically rather than a `(\w+) \1` regex).
    * All per-row column expressions: embarrassingly parallel, no
    * shuffle, survives any scale-up by construction. */
  /** Top-`k` TF-IDF terms per document — the keyword-extraction /
    * topic-fingerprint primitive (and the classic relevance weight:
    * Spärck Jones 1972). score = tf · ln(N / df) with raw counts (no
    * sublinear damping — keeps the expression tree trivially mirrored
    * in SQL), ranked per document on the 4-decimal-ROUNDED score so
    * the cross-engine last-ulp noise of `ln` can never flip an
    * ordering the hash would see; ties break on the term string.
    * Scale: one (doc, term) hash agg (map-combinable), a
    * vocabulary-sized df agg that BROADCASTS back, a 1-row N bind, and
    * a window partitioned by DOCUMENT — partitions are doc-sized, the
    * one per-key window shape with a genuine occupancy bound. Returns
    * (id, tk, tf, df, score, rk ∈ [1, k]). */
  def tfIdfTop(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, "tf-idf top-k must be positive")
    val tf = docs.select(col(idCol), explode(tokens(col(textCol))).as("tk"))
      .groupBy(col(idCol), col("tk")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tk")).agg(count(lit(1)).as("df"))
    val n = docs.select(col(idCol)).agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("tk").asc)
    tf.join(broadcast(df), Seq("tk"))
      .crossJoin(broadcast(n)) // 1-row scalar bind
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("tk"), col("tf"), col("df"), col("score"), col("rk"))
  }

  /** Top-`k` collocations by pointwise mutual information — the
    * corpus-analysis classic (Church & Hanks 1990): score every
    * adjacent token pair by pmi = ln(c₂·N / (c₁(a)·c₁(b))) over
    * POSITIONAL marginals (c₁(a) = a's count as a left element,
    * c₁(b) = b's as a right one, N = total bigram positions — the
    * formulation whose probabilities sum to 1 over the pair space),
    * keep pairs seen at least `minCount` times (raw PMI is
    * noise-dominated at low counts — the standard guard), rank on the
    * 4dp-ROUNDED score so cross-engine ln noise can't flip a hashed
    * order; ties break on the pair text. Scale: bigram- and
    * position-keyed aggs (vocabulary-sized, map-combinable), marginals
    * BROADCAST back, 1-row N bind, and a top-k that must plan as
    * TakeOrderedAndProject — never a total sort. Returns
    * (t1, t2, c2, pmi). */
  def pmiTop(docs: DataFrame, textCol: String, minCount: Int, k: Int): DataFrame = {
    require(k > 0 && minCount > 0, "pmi top-k and min count must be positive")
    val tk = tokens(col(textCol))
    val pairs = docs.select(explode(arrays_zip(
        slice(tk, lit(1), greatest(size(tk) - 1, lit(0))),
        slice(tk, lit(2), greatest(size(tk) - 1, lit(0))))).as("z"))
      .select(col("z").getField("0").as("t1"), col("z").getField("1").as("t2"))
    val big = pairs.groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("c2"))
    val uni = pairs.select(col("t1").as("t")).groupBy(col("t"))
      .agg(count(lit(1)).as("c1a"))
    val uniB = pairs.select(col("t2").as("t")).groupBy(col("t"))
      .agg(count(lit(1)).as("c1b"))
    val n = big.agg(sum(col("c2")).as("n_pairs")) // 1-row scalar bind
    big.filter(col("c2") >= minCount)
      .join(broadcast(uni.withColumnRenamed("t", "t1")), Seq("t1"))
      .join(broadcast(uniB.withColumnRenamed("t", "t2")), Seq("t2"))
      .crossJoin(broadcast(n))
      .withColumn("pmi", round(log(col("c2").cast("double") * col("n_pairs") /
        (col("c1a") * col("c1b"))), 4))
      .orderBy(col("pmi").desc, col("t1").asc, col("t2").asc)
      .limit(k)
      .select(col("t1"), col("t2"), col("c2"), col("pmi"))
  }

  /** BM25 ranked retrieval (Robertson/Spärck Jones; the Lucene idf
    * form) for a FIXED query-term set: score(d) = Σ_t idf(t) ·
    * tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with
    * idf = ln((N−df+0.5)/(df+0.5) + 1), ranked on the 4dp-ROUNDED
    * score (ln noise ≤ the compared digits), ties → doc id. Scale:
    * the term filter lands BEFORE the tf aggregate, so only MATCHING
    * postings shuffle; doc lengths are a map-only column on the
    * corpus scan; N/avgdl are a 1-row bind; the postings join is
    * deliberately UNHINTED — selective terms broadcast under AQE,
    * stopword-like terms make the postings corpus-scale and must
    * degrade to a shuffle join rather than an OOMing forced
    * broadcast (review r11); top-k is TakeOrderedAndProject. Returns
    * (id, n_hit, score, rk). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && k > 0, "BM25 needs query terms and k > 0")
    val base = docs.select(col(idCol),
      size(tokens(col(textCol))).as("dl"),
      tokens(col(textCol)).as("__tk"))
    val tf = base.select(col(idCol), explode(col("__tk")).as("tk"))
      .filter(col("tk").isin(queryTerms: _*))
      .groupBy(col(idCol), col("tk")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tk")).agg(count(lit(1)).as("df"))
    val stats = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    // NO forced broadcast on tf: it is query-sized only for SELECTIVE
    // terms — a stopword-like query term makes it corpus-scale, and a
    // broadcast hint would OOM the driver where a shuffle join
    // degrades gracefully (review r11). AQE still picks broadcast
    // whenever the postings actually are small.
    val scored = base.select(col(idCol), col("dl"))
      .join(tf, Seq(idCol))
      .join(broadcast(df), Seq("tk"))
      .crossJoin(broadcast(stats)) // 1-row scalar bind
      .withColumn("idf", log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1))
      .withColumn("s", col("idf") * col("tf") * lit(k1 + 1) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") /
          (col("sum_dl").cast("double") / col("n_docs")))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit"), round(sum(col("s")), 4).as("score"))
      // top-k as orderBy+limit (TakeOrderedAndProject — never a global
      // window, which would serialize the match set through one task);
      // the rank column is derived on the K-ROW result, where a single
      // window partition is the point, not a bottleneck
      .orderBy(col("score").desc, col(idCol).asc).limit(k)
    scored.withColumn("rk", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col(idCol).asc)))
  }

  /** Out-of-vocabulary rate per document against the corpus's OWN
    * top-`vocabSize` token vocabulary — the tokenizer-fit diagnostic a
    * pretraining run checks before committing a vocab: a doc whose
    * tokens mostly fall outside the head of the frequency distribution
    * is noise, another script, or markup. Vocabulary tie-break is
    * (count desc, token asc) — deterministic at the K boundary.
    *
    * Scale: the vocab is ONE map-side-combinable token count (a hot
    * token contributes one partial per partition) cut to K by
    * TakeOrdered — config-sized however large the corpus — and
    * broadcast back onto the token stream (an explicit hint: the K-row
    * side must never shuffle the corpus-scale token stream); the
    * per-doc tail is one doc-keyed aggregate. Returns
    * (id, n_tokens, n_oov, oov_rate ∈ [0,1]). */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("tk"))
    val vocab = toks.groupBy(col("tk")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("tk").asc).limit(vocabSize)
      .select(col("tk"), lit(1).as("__inv"))
    toks.join(broadcast(vocab), Seq("tk"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__inv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col(idCol), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6).as("oov_rate"))
  }

  /** Distributed BPE merge LEARNING — the training side of the subword
    * story (the compiled [[graft.plans.SubwordCount]] kernel applies a
    * vocab; this learns one): iteratively count adjacent symbol pairs
    * and merge the most frequent, `numMerges` times. Ties break
    * (count desc, left asc, right asc) — fully deterministic.
    *
    * Scale: the corpus collapses ONCE into a word-frequency table (one
    * map-side-combinable aggregate — VOCAB-sized regardless of corpus
    * rows, the classic BPE trick: a 100 TB crawl and a 1 GB sample
    * share the same word-type count ceiling), and every iteration runs
    * over that table: pair counts explode ~|word| rows per word type
    * but combine map-side onto the pair key; the argmax is TakeOrdered
    * 1. The ONLY collects are the per-iteration 1-row argmax — the
    * config-sized discipline. Merges apply as an `aggregate` HOF fold
    * (greedy non-overlapping left-to-right, the reference BPE rule);
    * the table is localCheckpoint'ed per iteration so lineage stays
    * flat across merges. No end-of-word marker (documented choice —
    * the fixture corpus is whitespace-tokenized already).
    * Returns (rank, left, right, pair_count) per learned merge; stops
    * early when no pair repeats. */
  def learnBpeMerges(docs: DataFrame, textCol: String,
      numMerges: Int): Seq[(Int, String, String, Long)] = {
    require(numMerges >= 1, "need at least one merge")
    var cur = docs.select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(split(col("w"), "").as("syms"), col("freq"))
      .localCheckpoint(true)
    val learned = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val top = cur
        .select(col("freq"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .filter(col("cnt") >= 2)
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect() // 1-row argmax — the iteration's only collect
      if (top.isEmpty) done = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((rank, l, r, cnt))
        // greedy non-overlapping left-to-right merge of (l, r) → l+r
        val prev = cur
        cur = cur.withColumn("syms",
          aggregate(col("syms"), array().cast("array<string>"), (acc, x) =>
            when(size(acc) > 0 &&
                element_at(acc, -1) === lit(l) && x === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
              .otherwise(concat(acc, array(x)))))
          .localCheckpoint(true)
        prev.unpersist()
        rank += 1
      }
    }
    learned.result()
  }

  /** Per-doc BPE token accounting under a LEARNED merge table — the
    * apply side of [[learnBpeMerges]], i.e. the count a
    * trained-tokenizer budget pipeline bills by (subwordCount's
    * MaxMatch is the vocab-driven approximation; this is the exact
    * rank-priority encode). One compiled map-only pass via
    * [[graft.plans.BpeEncodeCount]] — no shuffle, the merge table
    * rides the expression, word-type caching collapses Zipfian
    * repetition per task. Returns (id, n_words, n_chars, n_bpe_tokens,
    * compression = chars per BPE token, 6dp): compression ≈ the
    * fertility diagnostic tokenizer teams track per language/source. */
  def bpeTokenStats(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val tk = filter(tokens(col(textCol)), t => t =!= "")
    docs.select(col(idCol),
        size(tk).cast("long").as("n_words"),
        aggregate(transform(tk, t => length(t).cast("long")),
          lit(0L), (a, x) => a + x).as("n_chars"),
        graft.plans.BpeEncodeCount(tk, merges).cast("long").as("n_bpe_tokens"))
      .withColumn("compression",
        when(col("n_bpe_tokens") === 0, lit(0.0))
          .otherwise(round(col("n_chars").cast("double") / col("n_bpe_tokens"), 6)))
  }

  /** Compression-ratio quality signal (the Gopher/MassiveText filter
    * family): bytes / deflate(bytes) per document via the compiled
    * [[graft.plans.DeflateSize]] kernel — low-entropy boilerplate and
    * keyword stuffing compress far harder than natural prose. Map-only;
    * `keep` gates docs whose ratio stays UNDER `maxRatio` (junk is the
    * high side). Returns (id, n_bytes, n_deflated, ratio 6dp, keep). */
  def compressionGate(docs: DataFrame, idCol: String, textCol: String,
      maxRatio: Double): DataFrame = {
    docs.select(col(idCol),
        octet_length(col(textCol)).cast("long").as("n_bytes"),
        graft.plans.DeflateSize(col(textCol)).cast("long").as("n_deflated"))
      .withColumn("ratio",
        when(col("n_deflated") === 0, lit(0.0))
          .otherwise(round(col("n_bytes").cast("double") / col("n_deflated"), 6)))
      .withColumn("keep", col("ratio") <= maxRatio)
  }

  /** Character-entropy quality signal — the DIRECT form of the
    * low-entropy-junk test [[compressionGate]] proxies through zlib:
    * Shannon bits/char of the code-point distribution via the compiled
    * [[graft.plans.CharEntropy]] kernel (per-row count table, map-only,
    * no per-character explode — the shape that stays a scan at 100 TB).
    * Natural prose sits ~3.5–4.5 bits/char; floods/templates fall
    * below `minBits`, base64/hex blobs rise above `maxBits` — the gate
    * keeps the middle band. Returns (id, n_chars, entropy 6dp, keep). */
  def entropyGate(docs: DataFrame, idCol: String, textCol: String,
      minBits: Double, maxBits: Double): DataFrame = {
    docs.select(col(idCol),
        length(col(textCol)).cast("long").as("n_chars"),
        round(graft.plans.CharEntropy(col(textCol)), 6).as("entropy"))
      .withColumn("keep", col("entropy") >= minBits && col("entropy") <= maxBits)
  }

  def cleanColumns(text: Column): Seq[Column] = {
    val scrubbed = regexp_replace(regexp_replace(text, UrlRe, " "), EmailRe, " ")
    val squashed = trim(regexp_replace(scrubbed, " +", " "))
    val tk = tokens(squashed)
    // keep token i when first or different from its left neighbor.
    // Formulated as zip_with against a null-headed SHIFTED copy, never
    // element_at(tk, i) inside a lambda: higher-order lambda bodies get
    // no subexpression elimination, so an indexed re-reference would
    // re-run the regex+split chain PER TOKEN (measured 28 s vs 0.6 s at
    // sf0.1 — a quadratic hiding in an innocent-looking expression).
    // Here tk's chain evaluates per ROW and the zip is a linear pass.
    val prev = concat(array(lit(null).cast("string")), slice(tk, lit(1), size(tk) - 1))
    val kept = filter(
      zip_with(tk, prev, (cur, prv) => when(prv.isNull || cur =!= prv, cur)),
      x => x.isNotNull)
    Seq(
      concat_ws(" ", kept).as("clean_text"),
      size(regexp_extract_all(text, lit(UrlRe), lit(0))).as("n_urls"),
      size(regexp_extract_all(text, lit(EmailRe), lit(0))).as("n_emails"),
      size(tk).as("n_tokens_raw"),
      size(kept).as("n_tokens_clean"))
  }

  /** PII redaction patterns, ordered — each applies to the text AFTER
    * its predecessors, and the order is load-bearing (cards and SSNs
    * would otherwise be half-eaten by the looser phone pattern; IPs by
    * phone's digit groups). Same Java-regex ∩ RE2 discipline as
    * [[UrlRe]]: no backreferences, no lookaround, ASCII classes only,
    * so one literal serves both engines. The phone rule requires a
    * separator between digit groups on purpose — an unseparated digit
    * run is more often an id than a phone number, and a redactor that
    * eats ids destroys more signal than it protects. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    (EmailRe, "<EMAIL>"),
    ("\\b\\d{4}[- ]?\\d{4}[- ]?\\d{4}[- ]?\\d{4}\\b", "<CARD>"),
    ("\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("\\+?\\d{1,3}[-. ]\\(?\\d{2,4}\\)?[-. ]\\d{3,4}[-. ]?\\d{2,4}\\b",
      "<PHONE>"))

  /** PII redaction — replace emails / card numbers / SSN-shaped ids /
    * IPv4s / phone numbers with typed placeholders, keeping the
    * surrounding prose (the redact-not-drop rule: a doc with one phone
    * number is still training data once the number is gone). Counts
    * are per applied STAGE (pattern i counts matches in the text
    * patterns < i already cleaned), so categories never double-count
    * one span. Pure per-row column arithmetic: map-only, no shuffle,
    * streams unchanged. Returns (clean_text, n_redacted). */
  def redactPii(text: Column): Seq[Column] = {
    val (cleaned, n) = PiiPatterns.foldLeft((text, lit(0))) {
      case ((acc, cnt), (p, r)) =>
        (regexp_replace(acc, p, r),
          cnt + size(regexp_extract_all(acc, lit(p), lit(0))))
    }
    Seq(cleaned.as("clean_text"), n.cast("long").as("n_redacted"))
  }
}
