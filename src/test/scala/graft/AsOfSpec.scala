package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** AsOfJoin semantics: inclusive ties, latest-prior selection,
  * left-join nulls, and the column-clash guard. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks the latest prior right row per key, inclusive at ties") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (3L, 9L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 1.0), (1L, 15L, 2.0), (1L, 21L, 3.0), (2L, 7L, 4.0))
      .toDF("k", "t", "v")
    val got = AsOfJoin.asofJoin(left, right, "k", "t", Seq("v"))
      .select($"tag", $"asof_v", $"asof_ts")
      .collect().map(r => r.getString(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got("a") == (Some(1.0), Some(10L))) // inclusive: rts == lts matches
    assert(got("b") == (Some(2.0), Some(15L))) // latest prior, never the future 21
    assert(got("d") == (None, None))           // key with no right rows at all
    assert(got("c") == (None, None))           // right exists but only in the future
    // a null-timestamp right row must never become anyone's "prior"
    val rWithNull = right.unionByName(
      Seq((1L, "x", 99.0)).toDF("k", "t2", "v")
        .select($"k", lit(null).cast("long").as("t"), $"v"))
    val got2 = AsOfJoin.asofJoin(left, rWithNull, "k", "t", Seq("v"))
      .select($"tag", $"asof_v").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got2("a") == Some(1.0) && got2("d") == None)
  }

  test("duplicate (key,ts) right rows tie-break deterministically; NULL payloads carry whole-row") {
    val left = Seq((1L, 20L, "a"), (1L, 40L, "b")).toDF("k", "t", "tag")
    // two right rows at t=10: the greatest payload tuple (7.0) must win,
    // regardless of partition order; at t=30 the matched row's payload is
    // NULL and must be carried as NULL (not the older 7.0 resurrected)
    val right = Seq((1L, 10L, Some(3.0)), (1L, 10L, Some(7.0)), (1L, 30L, None))
      .toDF("k", "t", "v")
    val got = AsOfJoin.asofJoin(left, right, "k", "t", Seq("v"))
      .select($"tag", $"asof_v", $"asof_ts").collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(got("a") == ((Some(7.0), Some(10L))), "greatest payload struct wins the tie")
    assert(got("b") == ((None, Some(30L))), "matched row's NULL payload, its own asof_ts")
    // repartitioned differently, the answer is identical (determinism)
    val got2 = AsOfJoin.asofJoin(left, right.repartition(7), "k", "t", Seq("v"))
      .select($"tag", $"asof_v", $"asof_ts").collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(got2 == got)
  }

  test("salted as-of equals the plain as-of, hot key included") {
    // one pathological hot key (0) holding most rows, plus normal keys;
    // duplicate (key,ts) right rows exercise the tie rule under salting
    val left = spark.range(0, 2000).select(
      when($"id" < 1500, 0L).otherwise($"id" % 7).as("k"), ($"id" * 3).as("t"),
      $"id".as("tag"))
    val right = spark.range(0, 400).select(
      when($"id" < 300, 0L).otherwise($"id" % 7).as("k"), (($"id" % 100) * 20).as("t"),
      ($"id" % 50).cast("double").as("v"))
    val plain = AsOfJoin.asofJoin(left, right, "k", "t", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)))).toSet
    Seq(2, 8).foreach { s =>
      val salted = AsOfJoin.asofJoinSalted(left, right, "k", "t", Seq("v"), s)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          Option(r.get(3)), Option(r.get(4)))).toSet
      assert(salted == plain, s"salts=$s diverged from the plain as-of")
    }
    // the salted window partitions by (key, salt): the hot key's sort
    // splits across subpartitions instead of serializing on one core
    val plan = AsOfJoin.asofJoinSalted(left, right, "k", "t", Seq("v"), 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), "salt column must reach the window partitioning")
  }

  test("range join matches the brute-force inequality join across band boundaries") {
    import graft.operators.RangeJoin
    // timestamps engineered to straddle band edges: delta = 100, rows
    // at 0, 99, 100, 101, 199, 200 exercise same-band, previous-band,
    // and exactly-delta (excluded) cases
    val mk = (rows: Seq[(Long, Long)]) => rows.toDF("k", "us")
      .select($"k", timestamp_micros($"us").as("ts"), $"us".cast("double").as("value"))
    val left = mk(Seq((1L, 100L), (1L, 200L), (1L, 101L), (2L, 150L)))
    val right = mk(Seq((1L, 0L), (1L, 99L), (1L, 100L), (1L, 101L), (1L, 199L), (2L, 149L)))
    val got = RangeJoin.rangeJoin(left, right, "k", "ts", 100L, Seq("value"))
      .select($"k", unix_micros($"ts").as("lus"), unix_micros($"r_ts").as("rus"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force: same key, rus in [lus - 100, lus)
    val want = (for {
      (lk, lus) <- Seq((1L, 100L), (1L, 200L), (1L, 101L), (2L, 150L))
      (rk, rus) <- Seq((1L, 0L), (1L, 99L), (1L, 100L), (1L, 101L), (1L, 199L), (2L, 149L))
      if lk == rk && rus >= lus - 100 && rus < lus
    } yield (lk, lus, rus)).toSet
    assert(got == want)
    assert(want.contains((1L, 100L, 0L)), "window start is inclusive")
    assert(!got.exists { case (_, l, r) => r == l }, "window end is exclusive")
    // the plan is an equi-join on (key, band), not a cartesian/theta join
    val plan = RangeJoin.rangeJoin(left, right, "k", "ts", 100L, Seq("value"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("as-of join scales shape: one shuffle on the key, no range join") {
    val left = spark.range(0, 1000).select(($"id" % 10).as("k"), $"id".as("t"))
    val right = spark.range(0, 100).select(($"id" % 10).as("k"),
      ($"id" * 10).as("t"), $"id".cast("double").as("v"))
    val joined = AsOfJoin.asofJoin(left, right, "k", "t", Seq("v"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "as-of must not plan a range/cartesian join")
    // spot-check: left (k=0, t=990); right rows for k=0 sit at
    // t = 0, 100, …, 900 with v = t/10 → latest prior is v=90
    assert(joined.filter($"k" === 0 && $"t" === 990).select($"asof_v")
      .head.getDouble(0) == 90.0)
    // clash guard fails loudly
    intercept[IllegalArgumentException](AsOfJoin.asofJoin(
      left.withColumn("asof_v", lit(1)), right, "k", "t", Seq("v")))
  }

  test("funnel: stages advance only strictly after the previous completion") {
    import java.sql.Timestamp
    def ts(m: Long) = new Timestamp(1704067200000L + m * 60000L)
    val e = Seq(
      // user 1 completes all three in order
      (1L, ts(0), "view"), (1L, ts(5), "click"), (1L, ts(9), "purchase"),
      // user 2: click BEFORE the first view — must not advance;
      // purchase after view but with no qualifying click → stage 1
      (2L, ts(0), "click"), (2L, ts(3), "view"), (2L, ts(7), "purchase"),
      // user 3: view only
      (3L, ts(1), "view"),
      // user 4: never views → not in the funnel at all
      (4L, ts(2), "purchase"),
      // user 5: click at the SAME ts as the view — strictly-after says no
      (5L, ts(0), "view"), (5L, ts(0), "click"), (5L, ts(4), "click")
    ).toDF("user_id", "ts", "event_type")
    val r = graft.operators.Funnel.funnel(e, "user_id", "ts", Seq(
        "view" -> ($"event_type" === "view"),
        "click" -> ($"event_type" === "click"),
        "purchase" -> ($"event_type" === "purchase")))
      .collect().map(x => x.getLong(0) -> x.getInt(4)).toMap
    assert(r == Map(1L -> 3, 2L -> 1, 3L -> 1, 5L -> 2), r.toString)
    // user 5's qualifying click is the LATER one (strictly after ts 0)
    val u5 = graft.operators.Funnel.funnel(e, "user_id", "ts", Seq(
        "view" -> ($"event_type" === "view"),
        "click" -> ($"event_type" === "click")))
      .filter($"user_id" === 5L).collect()(0)
    assert(u5.getTimestamp(2) == ts(4))
  }

  test("rfm: scores rank the axes; recency inverts; segments concatenate") {
    import org.apache.spark.sql.functions.{col, lit}
    // 4 customers with strictly ordered axes: day/count/spend
    val d = (1 to 4).flatMap { c =>
      (1 to c).map(i => (c.toLong, (c * 10 + i).toLong, c * 100L))
    }.toDF("cust", "day", "cents")
    val r = graft.operators.Rfm.rfm(d, "cust", col("day"), col("cents"))
      .collect().map(x => x.getLong(0) ->
        ((x.getInt(4), x.getInt(5), x.getInt(6), x.getString(7)))).toMap
    // customer 4: most recent (r=0 → top), most frequent, top spend
    assert(r(4L) == ((4, 4, 4, "444")), r.toString)
    // customer 1: oldest last day → r_score 1; least frequent/spend
    assert(r(1L) == ((1, 1, 1, "111")), r.toString)
    // monotone: every axis score non-decreasing in the customer index
    val scores = (1 to 4).map(c => r(c.toLong))
    assert(scores.map(_._1) == scores.map(_._1).sorted)
    assert(scores.map(_._2) == scores.map(_._2).sorted)
    assert(scores.map(_._3) == scores.map(_._3).sorted)
  }

  test("retention: offsets count from each user's own first day") {
    import java.sql.Timestamp
    def ts(day: Int, h: Int = 12) =
      new Timestamp(1704067200000L + (day * 24L + h) * 3600000L)
    val e = Seq(
      // user 1: cohort day d, active d, d+1, d+3 (twice on d+1 — one row)
      (1L, ts(0)), (1L, ts(1)), (1L, ts(1, 20)), (1L, ts(3)),
      // user 2: cohort day d+1, active d+1 and d+3 (offset 2!)
      (2L, ts(1)), (2L, ts(3))
    ).toDF("user_id", "ts")
    val r = graft.operators.Funnel.retention(e, "user_id", "ts")
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    val d0 = 1704067200000L / 86400000L // epoch day of the base ts
    assert(r == Map(
      (d0, 0L) -> 1L, (d0, 1L) -> 1L, (d0, 3L) -> 1L,        // user 1
      (d0 + 1, 0L) -> 1L, (d0 + 1, 2L) -> 1L), r.toString)   // user 2
  }

  test("cohortLtv: cumulative revenue per cohort head, exact cents") {
    import graft.operators.Funnel
    def ts(day: Int) = new java.sql.Timestamp(day * 86400000L)
    // cohort day 0: users 1, 2 (user 2 silent after day 0);
    // cohort day 1: user 3
    val ev = Seq(
      (1L, ts(0), 10.00), (2L, ts(0), 5.00),
      (1L, ts(1), 2.50),
      (3L, ts(1), 1.00), (3L, ts(3), 4.00)
    ).toDF("user_id", "ts", "value")
    val out = Funnel.cohortLtv(ev, "user_id", "ts", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    // cohort 0 offset 0: both users, 1500c; offset 1: user 1, 250c,
    // cum 1750c, ltv = 1750/2 = 875.0
    assert(out((0L, 0L)) == ((2L, 1500L, 1500L, 2L, 750.0)))
    assert(out((0L, 1L)) == ((1L, 250L, 1750L, 2L, 875.0)))
    // cohort 1: user 3 alone; offset 2 cum = 100 + 400
    assert(out((1L, 0L)) == ((1L, 100L, 100L, 1L, 100.0)))
    assert(out((1L, 2L)) == ((1L, 400L, 500L, 1L, 500.0)))
    assert(out.size == 4)
  }

  test("attribution: last vs first touch, lookback bound exact, equal-ts inclusive") {
    import graft.operators.Attribution
    def ts(us: Long) = new java.sql.Timestamp(us / 1000) // whole-ms fixtures
    // user 1: view@1s, click@5s, purchase@10s → last=click, first=view;
    // user 2: view@0s, purchase@100s with lookback 50s → unattributed;
    // user 3: touch at EXACTLY conv ts (inclusive) and a stale one
    val ev = Seq(
      (1L, 1L, ts(1000000L), "view"), (2L, 1L, ts(5000000L), "click"),
      (3L, 1L, ts(10000000L), "purchase"),
      (4L, 2L, ts(0L), "view"), (5L, 2L, ts(100000000L), "purchase"),
      (6L, 3L, ts(7000000L), "click"), (7L, 3L, ts(7000000L), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Attribution.attribute(ev, "user_id", "ts", "event_id",
        col("event_type").isin("view", "click"),
        col("event_type") === "purchase", 50000000L)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)), Option(r.get(6)), r.getBoolean(9)))).toMap
    assert(out(3L) == ((Some("click"), Some("view"), true)))
    assert(out(5L) == ((None, None, false)))
    assert(out(7L) == ((Some("click"), Some("click"), true)))
    // ages are exact integer microseconds
    val ages = Attribution.attribute(ev, "user_id", "ts", "event_id",
        col("event_type").isin("view", "click"),
        col("event_type") === "purchase", 50000000L)
      .filter(col("event_id") === 3L).head()
    assert(ages.getLong(5) == 5000000L && ages.getLong(8) == 9000000L)
  }
}
