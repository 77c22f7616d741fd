package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Qh._

/** SURVEY §2.B.8 (✚ window functions — absent in ArcadeDB 22.8.1,
  * declared as extension) and §2.B.10 ✚ streaming-shaped analytics over
  * `events`, run here in batch form (the reference's freshness model is
  * batch rebuild; true incremental execution of the same queries lives
  * in graft.streaming and its tests).
  */
object WindowQueries {

  def queries: Seq[Q] = Seq(

    // ranking trio: row_number over a unique order; rank/dense_rank over
    // a coarse key (real ties), all deterministic
    Q("window_rank",
      (s, d) => {
        val c = t(s, d, "customer").withColumn("bal_k", floor(col("c_acctbal") / 1000))
        val wUnique = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("bal_k").desc, col("c_custkey").asc)
        val wCoarse = Window.partitionBy(col("c_mktsegment")).orderBy(col("bal_k").desc)
        c.select(col("c_custkey"), col("c_mktsegment"), col("bal_k"),
            row_number().over(wUnique).as("rn"),
            rank().over(wCoarse).as("rnk"),
            dense_rank().over(wCoarse).as("drnk"),
            lag(col("c_custkey"), 1).over(wUnique).as("prev_ck"),
            lead(col("c_custkey"), 1).over(wUnique).as("next_ck"))
          .filter(col("rn") <= 8)
      },
      Some("""SELECT c_custkey, c_mktsegment, bal_k, rn, rnk, drnk, prev_ck, next_ck
        FROM (SELECT c_custkey, c_mktsegment, CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_k,
          CAST(row_number() OVER w1 AS INTEGER) AS rn,
          CAST(rank() OVER w2 AS INTEGER) AS rnk,
          CAST(dense_rank() OVER w2 AS INTEGER) AS drnk,
          lag(c_custkey, 1) OVER w1 AS prev_ck,
          lead(c_custkey, 1) OVER w1 AS next_ck
        FROM customer
        WINDOW w1 AS (PARTITION BY c_mktsegment ORDER BY floor(c_acctbal / 1000) DESC, c_custkey ASC),
               w2 AS (PARTITION BY c_mktsegment ORDER BY floor(c_acctbal / 1000) DESC)) q
        WHERE rn <= 8""")),

    // running aggregate + lag/lead over an event stream ordering
    // ✚ as-of join (AsOfJoin scaladoc): each purchase aligned to the
    // user's latest PRIOR view — one shuffle + sort, oracle = DuckDB's
    // native ASOF LEFT JOIN. Staleness in exact integer microseconds.
    // ✚ k-stage funnel (operators.Funnel): per user, earliest
    // completion of view → click → purchase with each stage strictly
    // after the previous one's completion; stage frames are user-sized
    // aggregates joined on the key they already shuffle on. Times
    // cross the engine boundary as epoch micros (exact integers).
    Q("events_funnel",
      (s, d) => {
        val e = events(s, d)
        graft.operators.Funnel.funnel(e, "user_id", "ts", Seq(
            "view" -> (col("event_type") === "view"),
            "click" -> (col("event_type") === "click"),
            "purchase" -> (col("event_type") === "purchase")))
          .select(col("user_id"),
            unix_micros(col("t_view")).as("t_view"),
            unix_micros(col("t_click")).as("t_click"),
            unix_micros(col("t_purchase")).as("t_purchase"),
            col("stage"))
      },
      Some("""WITH u1 AS (SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        u2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
          JOIN u1 ON e.user_id = u1.user_id
          WHERE e.event_type = 'click' AND e.ts > u1.t1 GROUP BY e.user_id),
        u3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
          JOIN u2 ON e.user_id = u2.user_id
          WHERE e.event_type = 'purchase' AND e.ts > u2.t2 GROUP BY e.user_id)
        SELECT u1.user_id, epoch_us(t1) AS t_view, epoch_us(t2) AS t_click,
          epoch_us(t3) AS t_purchase,
          CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
            ELSE 1 END AS stage
        FROM u1 LEFT JOIN u2 ON u1.user_id = u2.user_id
          LEFT JOIN u3 ON u1.user_id = u3.user_id""")),

    // ✚ touch attribution (round 12): every purchase credits its
    // last- and first-touch view/click within a 1-day lookback — ONE
    // range-framed user window over exact integer microseconds (no
    // join, no second pass); struct-order tie-breaks mirrored verbatim
    // by the oracle's ORDER BY.
    Q("events_attribution",
      (s, d) => graft.operators.Attribution.attribute(events(s, d),
        "user_id", "ts", "event_id",
        col("event_type").isin("view", "click"),
        col("event_type") === "purchase", 86400000000L),
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us,
          event_type FROM events),
        t AS (SELECT * FROM e WHERE event_type IN ('view', 'click')),
        c AS (SELECT * FROM e WHERE event_type = 'purchase'),
        cand AS (SELECT c.event_id AS cid, t.event_type AS ty,
            t.us AS tus, t.event_id AS tid
          FROM c JOIN t ON t.user_id = c.user_id
            AND t.us BETWEEN c.us - 86400000000 AND c.us),
        lastp AS (SELECT cid, ty, tus, row_number() OVER (PARTITION BY cid
          ORDER BY tus DESC, ty DESC, tid DESC) AS rn FROM cand),
        firstp AS (SELECT cid, ty, tus, row_number() OVER (PARTITION BY cid
          ORDER BY tus ASC, ty ASC, tid ASC) AS rn FROM cand)
        SELECT c.event_id, c.user_id, c.us AS conv_us,
          l.ty AS last_type, l.tus AS last_us, c.us - l.tus AS last_age_us,
          f.ty AS first_type, f.tus AS first_us, c.us - f.tus AS first_age_us,
          l.ty IS NOT NULL AS attributed
        FROM c
          LEFT JOIN lastp l ON l.cid = c.event_id AND l.rn = 1
          LEFT JOIN firstp f ON f.cid = c.event_id AND f.rn = 1""")),

    // ✚ event-type transition matrix: per-user (prev → next) counts in
    // (ts, id) order — the Markov-chain summary of behavioral data
    // (what follows what); one user-partitioned lag window + one
    // pair-keyed count agg (≤ |types|² rows out).
    Q("events_transitions",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("us").asc, col("event_id").asc)
        events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
          epoch_us(ts) AS us FROM events),
        g AS (SELECT event_type, lag(event_type, 1) OVER (PARTITION BY user_id
          ORDER BY us ASC, event_id ASC) AS prev_type FROM e)
        SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
        FROM g WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type""")),

    // ✚ trending report (round 12): top-3 event types per tumbling
    // hour by count — the dashboard "what's hot now" query. One
    // windowed count agg (map-side partials) + a rank window whose
    // partitions are (hour)-keyed with ≤ |event types| rows each —
    // bounded by the TYPE cardinality, not the data, so the rank can
    // never serialize corpus-scale rows through one task.
    Q("events_trending",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("hr")).orderBy(col("n").desc, col("event_type").asc)
        events(s, d)
          .select(floor(unix_micros(col("ts")) / 3600000000L).cast("long").as("hr"),
            col("event_type"))
          .groupBy(col("hr"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
      },
      Some("""WITH e AS (SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hr,
          event_type FROM events),
        g AS (SELECT hr, event_type, CAST(count(*) AS BIGINT) AS n
          FROM e GROUP BY hr, event_type)
        SELECT hr, event_type, n, CAST(row_number() OVER (PARTITION BY hr
          ORDER BY n DESC, event_type ASC) AS INTEGER) AS rank
        FROM g QUALIFY rank <= 3""")),

    // ✚ stream-static enrichment: events bind their user's dimension
    // row (customer) through a BROADCAST join — the canonical
    // streaming enrichment shape (Structured Streaming runs the same
    // stream-static join incrementally, asserted in StreamingSpec);
    // per-type spend aggregates per nation.
    Q("events_enrich",
      (s, d) => events(s, d)
        .join(broadcast(t(s, d, "customer")),
          col("user_id") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("event_type"))
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value")),
      Some(s"""SELECT c_nationkey, event_type, CAST(count(*) AS BIGINT) AS n,
        ${sqlMoneySum("value")} AS sum_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_nationkey, event_type""")),

    // ✚ inter-arrival gaps (the lag/lead family applied): per user,
    // the µs gap to the previous event (NULL for the first) and each
    // user's mean gap — gaps are exact integer µs, the mean divides
    // two exact integers (one IEEE op, identical both engines). The
    // window partitions by USER (occupancy-bounded).
    Q("events_interarrival",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("us").asc, col("event_id").asc)
        events(s, d)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
          .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
          .withColumn("mean_gap_us",
            round(avg(col("gap_us")).over(
              org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))), 1))
          .select(col("user_id"), col("event_id"), col("gap_us"), col("mean_gap_us"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        g AS (SELECT user_id, event_id,
          us - lag(us, 1) OVER (PARTITION BY user_id
            ORDER BY us ASC, event_id ASC) AS gap_us FROM e)
        SELECT user_id, event_id, gap_us,
          round(avg(gap_us) OVER (PARTITION BY user_id), 1) AS mean_gap_us
        FROM g""")),

    // ✚ per-minute anomaly z-scores: bucket events into exact
    // epoch-minutes, then z = (c − μ)/σ from EXACT integer sums (the
    // correlations discipline — Σc and Σc² are BIGINTs, the float
    // arithmetic happens once on identical integers), rounded 6dp;
    // |z| > 3 flags the minute. One count agg + a 1-row moment bind.
    Q("events_anomaly",
      (s, d) => {
        val m = events(s, d).select(
          expr("unix_micros(ts) div 60000000").as("minute"))
          .groupBy(col("minute")).agg(count(lit(1)).as("c"))
        val stats = m.agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
          sum(col("c") * col("c")).as("qc"))
        m.crossJoin(broadcast(stats))
          // zero variance (every minute equal) → σ = 0: nullif pins z
          // to NULL in BOTH engines (Spark NULL-divides, DuckDB infs —
          // review r11); nothing is anomalous in a flat stream
          .withColumn("z", round(
            (col("c") - col("sc").cast("double") / col("n")) /
              nullif(sqrt(col("qc").cast("double") / col("n") -
                (col("sc").cast("double") / col("n")) *
                (col("sc").cast("double") / col("n"))), lit(0.0)), 6))
          .select(col("minute"), col("c"), col("z"),
            coalesce(abs(col("z")) > 3, lit(false)).as("anomaly"))
      },
      Some("""WITH m AS (SELECT epoch_us(ts) // 60000000 AS minute,
          CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1),
        st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS sc,
          CAST(sum(c * c) AS BIGINT) AS qc FROM m)
        SELECT minute, c, round((c - CAST(sc AS DOUBLE) / n) /
            nullif(sqrt(CAST(qc AS DOUBLE) / n -
              (CAST(sc AS DOUBLE) / n) * (CAST(sc AS DOUBLE) / n)), 0.0), 6) AS z,
          coalesce(abs(round((c - CAST(sc AS DOUBLE) / n) /
            nullif(sqrt(CAST(qc AS DOUBLE) / n -
              (CAST(sc AS DOUBLE) / n) * (CAST(sc AS DOUBLE) / n)), 0.0), 6)) > 3,
            false) AS anomaly
        FROM m CROSS JOIN st""")),

    // ✚ cohort retention (operators.Funnel.retention): users cohorted
    // by first active epoch-day, counted per (cohort, offset) — all
    // day arithmetic in exact integer epoch-days.
    Q("events_retention",
      (s, d) => graft.operators.Funnel.retention(events(s, d), "user_id", "ts"),
      Some("""WITH days AS (SELECT DISTINCT user_id,
          epoch_us(ts) // 86400000000 AS day FROM events),
        cohort AS (SELECT user_id, min(day) AS cohort_day FROM days
          GROUP BY user_id)
        SELECT c.cohort_day, d.day - c.cohort_day AS offset_days,
          CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
        FROM days d JOIN cohort c ON d.user_id = c.user_id
        GROUP BY 1, 2""")),

    // ✚ cohort lifetime value (round 12): retention's revenue twin —
    // integer cents, calendar-bounded cumulative window, one rounded
    // division per row.
    Q("events_ltv",
      (s, d) => graft.operators.Funnel.cohortLtv(events(s, d), "user_id", "ts",
        "value"),
      Some("""WITH base AS (SELECT user_id,
          epoch_us(ts) // 86400000000 AS day,
          CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        cohort AS (SELECT user_id, min(day) AS cohort_day FROM base
          GROUP BY user_id),
        sized AS (SELECT cohort_day,
          CAST(count(DISTINCT user_id) AS BIGINT) AS cohort_size
          FROM cohort GROUP BY 1),
        per AS (SELECT c.cohort_day, b.day - c.cohort_day AS offset_days,
            CAST(count(DISTINCT b.user_id) AS BIGINT) AS n_users,
            CAST(sum(b.cents) AS BIGINT) AS rev_cents
          FROM base b JOIN cohort c ON b.user_id = c.user_id
          GROUP BY 1, 2),
        cum AS (SELECT *, CAST(sum(rev_cents) OVER (PARTITION BY cohort_day
            ORDER BY offset_days ROWS UNBOUNDED PRECEDING) AS BIGINT)
            AS cum_rev_cents FROM per)
        SELECT cum.cohort_day, offset_days, n_users, rev_cents,
          cum_rev_cents, s.cohort_size,
          round(CAST(cum_rev_cents AS DOUBLE) / s.cohort_size, 2) AS ltv_cents
        FROM cum JOIN sized s ON s.cohort_day = cum.cohort_day""")),

    Q("asof_events",
      (s, d) => {
        val e = events(s, d)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        // right side deduped per (user, ts) to match the DuckDB oracle
        // exactly (the operator itself resolves duplicates by its
        // deterministic greatest-payload tie rule)
        val views = e.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max_by(col("value"), col("event_id")).as("value"))
        graft.operators.AsOfJoin.asofJoin(purchases, views, "user_id", "ts",
          Seq("value"))
          .select(col("event_id"), col("user_id"),
            col("asof_value").as("view_value"),
            (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("staleness_us"))
      },
      Some("""WITH l AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase'),
        r AS (SELECT user_id, ts, arg_max(value, event_id) AS value FROM events
          WHERE event_type = 'view' GROUP BY user_id, ts)
        SELECT l.event_id, l.user_id, r.value AS view_value,
          epoch_us(l.ts) - epoch_us(r.ts) AS staleness_us
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""")),

    // ✚ skew-resilient as-of (the 100 TB hot-key refinement named in
    // the r6 audit): left rows salt into 8 subpartitions, right rows
    // replicate per salt — IDENTICAL results to asof_events, proven
    // against the same DuckDB native-ASOF oracle
    Q("asof_events_salted",
      (s, d) => {
        val e = events(s, d)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = e.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max_by(col("value"), col("event_id")).as("value"))
        graft.operators.AsOfJoin.asofJoinSalted(purchases, views, "user_id", "ts",
          Seq("value"), salts = 8)
          .select(col("event_id"), col("user_id"),
            col("asof_value").as("view_value"),
            (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("staleness_us"))
      },
      Some("""WITH l AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase'),
        r AS (SELECT user_id, ts, arg_max(value, event_id) AS value FROM events
          WHERE event_type = 'view' GROUP BY user_id, ts)
        SELECT l.event_id, l.user_id, r.value AS view_value,
          epoch_us(l.ts) - epoch_us(r.ts) AS staleness_us
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""")),

    // ✚ banded range join (RangeJoin scaladoc): per purchase, the
    // count/cents of the user's views in the preceding hour — an
    // equi-join on (user, Δ-band) + residual filter, never the
    // inequality theta-join's per-key cartesian. Zero-view purchases
    // kept via the left join of aggregates back onto purchases.
    Q("range_join_events",
      (s, d) => {
        val e = events(s, d)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("value"))
        val hourUs = 3600L * 1000 * 1000
        val pairs = graft.operators.RangeJoin.rangeJoin(
          purchases, views, "user_id", "ts", hourUs, Seq("value"))
        val agg = pairs.groupBy(col("event_id"))
          .agg(count(lit(1)).as("n_views"), sum(cents(col("r_value"))).as("view_cents"))
        purchases.join(agg, Seq("event_id"), "left")
          .select(col("event_id"), col("user_id"),
            coalesce(col("n_views"), lit(0L)).as("n_views"),
            coalesce(col("view_cents"), lit(0L)).as("view_cents"))
      },
      Some("""WITH l AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase'),
        r AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view')
        SELECT l.event_id, l.user_id,
          CAST(count(r.ts) AS BIGINT) AS n_views,
          CAST(coalesce(sum(CAST(round(r.value * 100) AS BIGINT)), 0) AS BIGINT) AS view_cents
        FROM l LEFT JOIN r ON l.user_id = r.user_id
          AND r.ts >= l.ts - INTERVAL 1 HOUR AND r.ts < l.ts
        GROUP BY l.event_id, l.user_id""")),

    Q("window_running",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").asc)
        events(s, d).select(
          col("event_id"), col("user_id"),
          (sum(cents(col("value"))).over(w.rowsBetween(Window.unboundedPreceding, 0)) / lit(100.0))
            .as("running_value"),
          lag(col("event_id"), 1).over(w).as("prev_id"),
          lead(col("event_id"), 1).over(w).as("next_id"))
      },
      Some(s"""SELECT event_id, user_id,
        CAST(SUM(${sqlCents("value")}) OVER (PARTITION BY user_id ORDER BY event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0 AS running_value,
        lag(event_id, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_id,
        lead(event_id, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS next_id
        FROM events""")),

    // distribution/analytic family: percent_rank, cume_dist, ntile,
    // first_value/last_value over explicit frames (unique total order)
    Q("window_dist",
      (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_custkey").asc)
        val c = t(s, d, "customer")
        // pr/cd pass through unrounded: (rank-1)/(n-1) and peers/n are
        // single IEEE divisions of exact integers — bit-determined on
        // both engines (rounding would be the risk, per the Qh doctrine)
        c.select(col("c_custkey"), col("c_mktsegment"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"),
            ntile(4).over(w).as("quartile"),
            first(col("c_custkey")).over(
              w.rowsBetween(Window.unboundedPreceding, 0)).as("first_ck"),
            last(col("c_custkey")).over(
              w.rowsBetween(0, Window.unboundedFollowing)).as("last_ck"))
          .filter(col("c_custkey") % 10 === 0)
      },
      Some("""SELECT c_custkey, c_mktsegment,
        percent_rank() OVER w AS pr,
        cume_dist() OVER w AS cd,
        CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        first_value(c_custkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_ck,
        last_value(c_custkey) OVER (w ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_ck
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_custkey ASC)
        QUALIFY c_custkey % 10 = 0""")),

    // RANGE frame: sum over a sliding value-range of the ordering key
    Q("window_range_frame",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").asc)
          .rangeBetween(-100, 0)
        events(s, d).select(col("event_id"), col("user_id"),
          (sum(cents(col("value"))).over(w) / lit(100.0)).as("range_sum"))
      },
      Some(s"""SELECT event_id, user_id,
        CAST(SUM(${sqlCents("value")}) OVER (PARTITION BY user_id ORDER BY event_id
          RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0 AS range_sum
        FROM events""")),

    // tumbling event-time window (epoch-aligned, same as time_bucket)
    Q("window_tumbling",
      (s, d) => events(s, d)
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), (sum(cents(col("value"))) / lit(100.0)).as("sum_value"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
          col("event_type"), col("cnt"), col("sum_value")),
      Some(s"""SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
        event_type, CAST(count(*) AS BIGINT) AS cnt,
        CAST(SUM(${sqlCents("value")}) AS BIGINT) / 100.0 AS sum_value
        FROM events GROUP BY 1, 2""")),

    // sliding event-time windows (10-min window, 5-min slide): each
    // event lands in two windows; the oracle unnests the two candidate
    // starts per event
    Q("window_sliding",
      (s, d) => events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
          col("event_type"), col("cnt")),
      Some("""SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start, event_type,
        CAST(count(*) AS BIGINT) AS cnt FROM (
          SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                         time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes']) AS w_start,
            event_type FROM events) q
        GROUP BY 1, 2""")),

    // session windows (30-min gap), batch form of session_window —
    // the oracle is the classic gaps-and-islands rewrite
    Q("window_session",
      (s, d) => events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), (sum(cents(col("value"))) / lit(100.0)).as("sum_value"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events"), col("sum_value")),
      Some(s"""WITH o AS (SELECT user_id, event_id, ts, value,
          CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
            OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= INTERVAL '30 minutes'
            THEN 1 ELSE 0 END AS brk FROM events),
        s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM o)
        SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
          CAST(count(*) AS BIGINT) AS n_events,
          CAST(SUM(${sqlCents("value")}) AS BIGINT) / 100.0 AS sum_value
        FROM s GROUP BY user_id, grp"""))
  )
}
