package graft

import org.apache.spark.sql.functions._
import graft.llmops.Pipeline

/** Training-data pipeline composition ops (SURVEY §2.B.12 north star):
  * gating+dedup, deterministic sampling, shard packing. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("prepCorpus gates on LID agreement and collapses exact dups to min id") {
    val d = Seq(
      (10L, "en", "the cat a dog of things and more is here"), // en-predicted, kept
      (11L, "en", "the cat a dog of things and more is here"), // exact dup of 10
      (12L, "fr", "the cat a dog of things and more is here"), // pred en ≠ lang fr → gated
      (13L, "en", "too short"),                                // < 5 tokens → gated
      (14L, "en", "the quick brown fox jumps over a lazy dog again"))
      .toDF("doc_id", "lang", "text")
    val out = Pipeline.prepCorpus(d, 5, 512).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10L, 14L))
    val kept = out.find(_.getLong(0) == 10L).get
    assert(kept.getAs[Long]("n_copies") == 2)
  }

  test("stratifiedSample is idempotent and respects per-stratum rates") {
    val a = Pipeline.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 60), 20, "s_")
    val b = Pipeline.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 60), 20, "s_")
    assert(a.select("doc_id").exceptAll(b.select("doc_id")).count() == 0)
    assert(a.count() == b.count())
    assert(a.filter($"pct" >= $"rate").count() == 0)
    assert(a.filter($"lang" === "en" && $"rate" =!= 60).count() == 0)
    assert(a.filter($"lang" =!= "en" && $"rate" =!= 20).count() == 0)
    // a different salt draws a different (but still valid) sample
    val c = Pipeline.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 60), 20, "t_")
    assert(c.select("doc_id").exceptAll(a.select("doc_id")).count() > 0)
  }

  test("decontaminate flags exactly the docs sharing an n-gram with the eval set") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // contains the planted 4-gram
      (2L, "totally unrelated words all the way through here"),
      (3L, "beta gamma delta epsilon trailing tail tokens")) // shares it too
      .toDF("doc_id", "text")
    val evalSet = Seq((100L, "prefix beta gamma delta epsilon suffix"))
      .toDF("doc_id", "text")
    val flagged = Pipeline.decontaminate(corpus, evalSet, "doc_id", "text", 4)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(1L, 3L))
    // longer n than any shared run → nothing flagged
    assert(Pipeline.decontaminate(corpus, evalSet, "doc_id", "text", 6).count() == 0)
  }

  test("shardAssign packs in id order with monotone offsets from zero") {
    val sh = Pipeline.shardAssign(docs, "doc_id", "lang", 4096)
    // first document of every stratum starts at offset 0
    val firsts = sh.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("stratum").orderBy("doc_id")))
      .filter($"rn" === 1)
    assert(firsts.filter($"start_offset" =!= 0).count() == 0)
    // offsets are the exclusive prefix sum: next start = prev start + prev tokens
    val w = org.apache.spark.sql.expressions.Window.partitionBy("stratum").orderBy("doc_id")
    val bad = sh.withColumn("expected",
        lag($"start_offset" + $"n_tokens", 1).over(w))
      .filter($"expected".isNotNull && $"start_offset" =!= $"expected")
    assert(bad.count() == 0)
    // shards respect the cap rule: a doc's start offset is inside its shard
    assert(sh.filter(floor($"start_offset" / 4096) =!= $"shard").count() == 0)
  }

  test("packers: two-phase prefix sum is block-size invariant (blocked ≡ degenerate)") {
    // tiny blocks force MANY (stratum, block) window partitions — the
    // shape that parallelizes a single giant stratum at 100 TB; the
    // offsets must equal the one-block-per-stratum degenerate case
    val fine = Pipeline.shardAssign(docs, "doc_id", "lang", 4096, blockDocs = 8)
    val coarse = Pipeline.shardAssign(docs, "doc_id", "lang", 4096)
    assert(fine.exceptAll(coarse).count() == 0 && coarse.exceptAll(fine).count() == 0)
    // the heavy window must key on the block, not the bare stratum
    val plan = fine.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("__blk"), "blocked prefix sum missing from plan")
    // packSequences: composite (doc, unit) order across block boundaries
    val units = (0 until 200).map(i =>
      (i / 4L, i % 4, if (i % 2 == 0) "en" else "fr", 100))
      .toDF("doc_id", "chunk_id", "lang", "n_tok")
    val f2 = Pipeline.packSequences(units, "doc_id", "chunk_id", "lang", "n_tok",
      1024, blockDocs = 16)
    val c2 = Pipeline.packSequences(units, "doc_id", "chunk_id", "lang", "n_tok", 1024)
    assert(f2.exceptAll(c2).count() == 0 && c2.exceptAll(f2).count() == 0)
  }

  test("end-to-end prep chain: gate → cap → mix → pack composes and conserves rows") {
    // the composition a real corpus-prep job runs, on the fixture:
    // quality gate, per-source cap, target mixing, shard packing —
    // each stage only ever narrows, and the final packing covers
    // every surviving doc exactly once
    import graft.llmops.{Pipeline, TextOps}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val gated = Pipeline.qualityGate(docs, "doc_id", "text", "lang",
        Pipeline.GateRules(8, 512, 0.0, 0.2, 0.9))
      .filter($"keep").select("doc_id")
      .join(docs, Seq("doc_id"))
    assert(gated.count() > 0 && gated.count() <= docs.count())
    val capped = Pipeline.sourceCap(gated, "doc_id", "source", 20, "e2e_")
      .select("doc_id").join(gated, Seq("doc_id"))
    assert(capped.groupBy("source").count()
      .filter($"count" > 20).count() == 0)
    // mix over SOURCES (domain mixing): the fixture's LID gate keeps
    // only label-agreeing docs, which at sf0.01 is the en slice — so
    // language targets would be single-stratum; domains all survive
    val mixed = Pipeline.applyMix(capped, "doc_id", "source", "text",
      Map("src1" -> 0.5, "src2" -> 0.5), "e2e_")
    assert(mixed.select("source").distinct().collect()
      .map(_.getString(0)).toSet == Set("src1", "src2"))
    val packed = Pipeline.shardAssign(
      mixed.select("doc_id", "source", "text"), "doc_id", "source", 2048)
    // packing covers every mixed doc exactly once, shards start at 0
    assert(packed.count() == mixed.count())
    assert(packed.select("doc_id").distinct().count() == mixed.count())
    assert(packed.groupBy("stratum").agg(min("shard").as("m"))
      .filter($"m" =!= 0).count() == 0)
  }

  test("exportJsonl: shard-partitioned JSONL round-trips and lays out per shard") {
    import graft.llmops.Pipeline
    val out = java.nio.file.Files.createTempDirectory("graftjsonl").toString
    val packed = Pipeline.shardAssign(docs, "doc_id", "lang", 4096)
      .join(docs.select($"doc_id", $"text"), Seq("doc_id"))
      .select($"doc_id", $"text", $"stratum", $"shard")
    Pipeline.exportJsonl(packed, out, "shard", "doc_id")
    // layout: one directory per shard, one file each (filesPerShard = 1)
    val shardDirs = new java.io.File(out).listFiles
      .filter(_.getName.startsWith("shard=")).toSeq
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { dir =>
      assert(dir.listFiles.count(_.getName.endsWith(".json")) == 1, dir.getName)
    }
    // filesPerShard > 1 must ACTUALLY split a shard across files —
    // the sub-key hashes the row id, not the shard column (a
    // shard-derived sub-key is constant per shard and splits nothing:
    // review r11)
    val out2 = java.nio.file.Files.createTempDirectory("graftjsonl2").toString
    Pipeline.exportJsonl(packed, out2, "shard", "doc_id", filesPerShard = 4)
    val biggest = new java.io.File(out2).listFiles
      .filter(_.getName.startsWith("shard="))
      .maxBy(d => d.listFiles.count(_.getName.endsWith(".json")))
    assert(biggest.listFiles.count(_.getName.endsWith(".json")) > 1,
      s"filesPerShard=4 produced no split in ${biggest.getName}")
    assert(spark.read.json(out2).count() == packed.count())
    // round-trip: every row and text survives byte-for-byte
    val back = spark.read.json(out)
    assert(back.count() == packed.count())
    val a = packed.select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = back.select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("budgetSelect: nested under budget growth, overshoot bounded by one doc") {
    import graft.llmops.Pipeline
    val small = Pipeline.budgetSelect(docs, "doc_id", "text", 2000L, "bs_")
    val large = Pipeline.budgetSelect(docs, "doc_id", "text", 8000L, "bs_")
    val sk = small.filter($"kept").select("doc_id").collect().map(_.getLong(0)).toSet
    val lk = large.filter($"kept").select("doc_id").collect().map(_.getLong(0)).toSet
    // nested-sample property: the small budget is a subset of the large
    assert(sk.subsetOf(lk) && sk.nonEmpty && lk.size > sk.size)
    // realized size: >= budget - (nothing), < budget + max doc (START rule)
    val tok = small.filter($"kept").agg(sum("n_tokens")).collect()(0).getLong(0)
    val maxDoc = small.agg(max("n_tokens")).collect()(0).getInt(0)
    assert(tok >= 2000L - maxDoc && tok < 2000L + maxDoc, s"tok=$tok")
    // a different salt draws a different budget's worth
    val other = Pipeline.budgetSelect(docs, "doc_id", "text", 2000L, "bs2_")
      .filter($"kept").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(other != sk)
  }

  test("corpusDiff: each status fires on its planted case") {
    import graft.llmops.Pipeline
    val oldV = Seq((1L, "same"), (2L, "will change"), (3L, "will vanish")).toDF("doc_id", "text")
    val newV = Seq((1L, "same"), (2L, "changed now"), (4L, "brand new")).toDF("doc_id", "text")
    val r = Pipeline.corpusDiff(oldV, newV, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"), r.toString)
    // NULL text: present in both snapshots ⇒ unchanged, never 'added'
    // (presence is an explicit flag, not hash nullability — review r11)
    val oldN = Seq((7L, null.asInstanceOf[String]), (8L, "x")).toDF("doc_id", "text")
    val newN = Seq((7L, null.asInstanceOf[String]), (8L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val rn = Pipeline.corpusDiff(oldN, newN, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(rn == Map(7L -> "unchanged", 8L -> "changed"), rn.toString)
  }

  test("sourceCap: two-level top-k is block-size invariant on the fixture corpus") {
    // same invariance discipline as the packers: the block level may
    // prune differently per block size, but the kept set and ranks are
    // the global top-cap either way (degenerate = one block ≡ one
    // global window)
    val fine = Pipeline.sourceCap(docs, "doc_id", "source", 7, "inv_", blockDocs = 8)
    val coarse = Pipeline.sourceCap(docs, "doc_id", "source", 7, "inv_",
      blockDocs = 1L << 40)
    assert(fine.exceptAll(coarse).count() == 0 && coarse.exceptAll(fine).count() == 0)
    // the block-rank prune is actually in the fine plan
    val plan = fine.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("__brk"), "block-level rank missing from plan")
  }

  test("sampleBudget: expected sample bounded by the budget at ANY corpus " +
       "size; exact percent-set equality while the cap binds (r17 order #4)") {
    val target = Pipeline.SampleBudgetDocs
    // rate math: expected hits n·r/10⁷ never exceed 2·target, at any n
    // (granularity floor included), and a corpus whose 10 % fits the
    // budget keeps the full historical rate
    for (n <- Seq(1000L, 500000L, 50000000L, 2000000000L,
                  10000000000L, 1000000000000L)) {
      val r7 = Pipeline.sampleRate7(n, target, 10)
      val expected = n.toDouble * r7 / 1e7
      assert(expected <= 2.0 * target,
        s"n=$n rate7=$r7 expected=$expected exceeds 2x budget")
      if (n * 10 / 100 <= target)
        assert(r7 == 10L * 100000L, s"cap must bind at n=$n, got $r7")
    }
    // while the cap binds (every bench corpus), the selected SET is
    // EXACTLY the historical samplePct < 10 set — oracle replays and
    // recorded gate decisions are unchanged by construction
    val hist = docs.filter(Pipeline.samplePct(col("doc_id"), "sb") < 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val small = docs.filter(Pipeline.sampleBudget(col("doc_id"), "sb",
        docs.count(), target)).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small == hist, "capped rate must reproduce the percent set")
    // once the budget engages (simulated 10B-doc corpus → sub-percent
    // rate), the sample SHRINKS MONOTONICALLY: a subset of the
    // historical set, never a reshuffle
    val huge = docs.filter(Pipeline.sampleBudget(col("doc_id"), "sb",
        10000000000L, target)).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(huge.subsetOf(hist),
      s"budget-capped sample must refine the percent buckets, " +
        s"got ${huge.diff(hist).size} rows outside them")
  }
}
