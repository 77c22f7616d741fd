package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Qh._

/** SURVEY §2.B.1–§2.B.7: the relational query surface of the embedded
  * ArcadeDB SQL engine, re-expressed on the DataFrame API. Each entry is
  * a declared query with a DuckDB oracle twin over the same parquet.
  *
  * Scale notes are per-query; the common doctrine: filters/projections
  * sit directly on the parquet scan (pushdown + pruning), aggregations
  * are hash-aggs with map-side partials, dimension joins are broadcast,
  * fact-fact joins shuffle on their keys and AQE re-plans at runtime.
  */
object Relational {

  /** One SQL text, two engines (Spark parser + DuckDB oracle). */
  val SqlInterfaceText: String =
    """SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n_orders,
      CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)/CAST(100.0 AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name"""

  def queries: Seq[Q] = Seq(

    // ——— §2.B.1 scans ———————————————————————————————————————————
    Q("scan_type", // SELECT FROM <type> (ArcadeDB type scan)
      (s, d) => t(s, d, "region").select(col("r_regionkey"), col("r_name")),
      Some("SELECT r_regionkey, r_name FROM region")),

    Q("scan_counts", // SELECT count(*) per type — metadata-only in parquet
      (s, d) => Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
        .map(n => t(s, d, n).agg(count(lit(1)).as("cnt"))
          .select(lit(n).as("table_name"), col("cnt")))
        .reduce(_.unionByName(_)),
      Some(Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
        .map(n => s"SELECT '$n' AS table_name, CAST(count(*) AS BIGINT) AS cnt FROM $n")
        .mkString(" UNION ALL "))),

    Q("point_lookup", // WHERE key = k (index lookup → parquet pushdown)
      (s, d) => t(s, d, "customer").filter(col("c_custkey") === 42)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal")),
      Some("SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer WHERE c_custkey = 42")),

    // ——— §2.B.2 projection / predicates ——————————————————————————
    Q("projection_compute",
      (s, d) => t(s, d, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        (col("c_acctbal") * 2).as("bal2"),
        length(col("c_mktsegment")).as("seg_len")),
      Some("""SELECT c_custkey, upper(c_name) AS uname, c_acctbal * 2 AS bal2,
        CAST(length(c_mktsegment) AS INTEGER) AS seg_len FROM customer""")),

    Q("filter_predicates", // comparison + boolean connectives + IN
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_quantity").between(10, 20) && col("l_discount") > 0.05
          && !(col("l_returnflag") === "A") && col("l_linestatus").isin("O", "F"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty")),
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt, SUM(l_quantity) AS sum_qty
        FROM lineitem WHERE l_quantity BETWEEN 10 AND 20 AND l_discount > 0.05
        AND NOT (l_returnflag = 'A') AND l_linestatus IN ('O','F')
        GROUP BY l_returnflag""")),

    Q("filter_like", // LIKE / ILIKE / MATCHES(regex)
      (s, d) => t(s, d, "part")
        .filter(col("p_name").like("%widget%") || col("p_name").ilike("BLUE%")
          || col("p_name").rlike("^small .*(bolt|rod)$"))
        .select(col("p_partkey"), col("p_name")),
      Some("""SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%widget%'
        OR p_name ILIKE 'BLUE%' OR regexp_matches(p_name, '^small .*(bolt|rod)$')""")),

    Q("filter_null", // IS NULL / IS DEFINED (A7: absent ≡ null)
      (s, d) => t(s, d, "orders")
        .withColumn("s2", expr("nullif(o_orderstatus, 'O')"))
        .groupBy(col("o_orderpriority"))
        .agg(count(col("s2")).as("non_null_cnt"), count(lit(1)).as("total"),
          sum(when(col("s2").isNull, 1).otherwise(0)).cast("long").as("null_cnt")),
      Some("""SELECT o_orderpriority,
        CAST(count(nullif(o_orderstatus,'O')) AS BIGINT) AS non_null_cnt,
        CAST(count(*) AS BIGINT) AS total,
        CAST(SUM(CASE WHEN nullif(o_orderstatus,'O') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cnt
        FROM orders GROUP BY o_orderpriority""")),

    Q("array_ops", // CONTAINS/CONTAINSALL/size/first over typed arrays
      (s, d) => t(s, d, "part")
        .withColumn("tags", split(col("p_name"), " "))
        .select(col("p_partkey"),
          size(col("tags")).as("n_tags"),
          array_contains(col("tags"), "widget").as("has_widget"),
          // CONTAINSALL → forall; CONTAINSANY → arrays_overlap
          forall(col("tags"), t => t.isin("cold", "widget", "blue", "rod",
            "small", "large", "bolt", "red", "green", "metal")).as("all_known"),
          arrays_overlap(col("tags"), array(lit("widget"), lit("rod"))).as("any_wr"),
          element_at(col("tags"), 1).as("first_tag"),
          array_join(array_sort(col("tags")), ",").as("sorted_tags")),
      Some("""SELECT p_partkey, CAST(len(string_split(p_name,' ')) AS INTEGER) AS n_tags,
        list_contains(string_split(p_name,' '), 'widget') AS has_widget,
        len(list_filter(string_split(p_name,' '), t -> t IN ('cold','widget','blue','rod','small','large','bolt','red','green','metal')))
          = len(string_split(p_name,' ')) AS all_known,
        len(list_intersect(string_split(p_name,' '), ['widget','rod'])) > 0 AS any_wr,
        string_split(p_name,' ')[1] AS first_tag,
        array_to_string(list_sort(string_split(p_name,' ')), ',') AS sorted_tags
        FROM part""")),

    Q("text_contains", // CONTAINSTEXT-style substring search
      (s, d) => t(s, d, "documents").filter(col("text").contains("spark"))
        .groupBy(col("lang")).agg(count(lit(1)).as("cnt")),
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS cnt FROM documents
        WHERE contains(text, 'spark') GROUP BY lang""")),

    // ——— §2.B.3 joins ————————————————————————————————————————————
    Q("join_inner_dims", // traversal-as-join over dimension tables;
      // broadcast both dims (SURVEY §2.B.3 "broadcast choice")
      (s, d) => t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          moneySum(col("c_acctbal")).as("sum_acctbal")),
      Some(s"""SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_cust,
        ${sqlMoneySum("c_acctbal")} AS sum_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey GROUP BY r_name, n_name""")),

    Q("join_left",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey")).agg(count(col("o_orderkey")).as("n_orders")),
      Some("""SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey""")),

    Q("join_semi", // WHERE id IN (subquery) → left_semi
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("cnt")),
      Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment""")),

    Q("join_anti", // WHERE id NOT IN (subquery) → left_anti
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name")),
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")),

    Q("join_theta", // non-equi predicate across bindings (LET-style)
      (s, d) => {
        val a = t(s, d, "nation").select(col("n_regionkey").as("rk"),
          col("n_nationkey").as("k1"), col("n_name").as("n1"))
        val b = t(s, d, "nation").select(col("n_regionkey").as("rk2"),
          col("n_nationkey").as("k2"), col("n_name").as("n2"))
        a.join(b, col("rk") === col("rk2") && col("k1") < col("k2"))
          .select(col("n1"), col("n2"))
      },
      Some("""SELECT a.n_name AS n1, b.n_name AS n2 FROM nation a JOIN nation b
        ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey""")),

    // ——— §2.B.4 aggregation ———————————————————————————————————————
    Q("agg_pricing_summary", // the TPC-H Q1 shape: hash-agg w/ partials
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          avg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("cnt")),
      Some(s"""SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty,
        ${sqlMoneySum("l_extendedprice")} AS sum_base_price,
        ${sqlMoneySum("l_extendedprice*(1-l_discount)")} AS sum_disc_price,
        AVG(l_quantity) AS avg_qty, CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    Q("agg_first_last", // first(x)/last(x) — declared only with an
      // explicit (unique) order, realized as min_by/max_by (SURVEY §2.B.4)
      (s, d) => t(s, d, "orders").groupBy(col("o_orderpriority"))
        .agg(min_by(col("o_totalprice"), col("o_orderkey")).as("first_price"),
          max_by(col("o_totalprice"), col("o_orderkey")).as("last_price"),
          min(col("o_orderkey")).as("first_key"),
          max(col("o_orderkey")).as("last_key")),
      Some("""SELECT o_orderpriority,
        arg_min(o_totalprice, o_orderkey) AS first_price,
        arg_max(o_totalprice, o_orderkey) AS last_price,
        min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
        FROM orders GROUP BY o_orderpriority""")),

    // ✚ extension (SURVEY §2.B.9: absent in ArcadeDB): rollup subtotals
    Q("agg_rollup",
      (s, d) => t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty")),
      Some("""SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS cnt,
        SUM(l_quantity) AS sum_qty FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)""")),

    Q("agg_count_distinct",
      (s, d) => t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("cnt")),
      Some("""SELECT l_returnflag, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
        CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part,
        CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY l_returnflag""")),

    Q("agg_stats", // stddev/variance (rounded: order-dependent floats)
      (s, d) => t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(round(stddev_samp(col("l_quantity")), 4).as("std_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(stddev_samp(col("l_extendedprice")), 2).as("std_price")),
      Some("""SELECT l_returnflag, round(stddev_samp(l_quantity), 4) AS std_qty,
        round(var_samp(l_quantity), 4) AS var_qty,
        round(stddev_samp(l_extendedprice), 2) AS std_price
        FROM lineitem GROUP BY l_returnflag""")),

    Q("agg_percentiles", // median/percentile (exact, integer-valued col)
      (s, d) => t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(median(col("l_quantity")).as("med_qty"),
          percentile(col("l_quantity"), lit(0.25)).as("p25_qty"),
          percentile(col("l_quantity"), lit(0.75)).as("p75_qty")),
      Some("""SELECT l_returnflag, median(l_quantity) AS med_qty,
        quantile_cont(l_quantity, 0.25) AS p25_qty,
        quantile_cont(l_quantity, 0.75) AS p75_qty
        FROM lineitem GROUP BY l_returnflag""")),

    Q("agg_mode", // mode() with deterministic (count desc, value asc) tie-break
      (s, d) => {
        val counts = t(s, d, "lineitem").groupBy(col("l_returnflag"), col("l_quantity"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("cnt").desc, col("l_quantity").asc)
        counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("cnt").as("mode_cnt"))
      },
      Some("""SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_cnt FROM (
        SELECT l_returnflag, l_quantity, CAST(count(*) AS BIGINT) AS cnt,
          row_number() OVER (PARTITION BY l_returnflag
            ORDER BY count(*) DESC, l_quantity ASC) AS rn
        FROM lineitem GROUP BY l_returnflag, l_quantity) q WHERE rn = 1""")),

    Q("agg_collect", // list()/set() collectors, canonicalized by sort
      (s, d) => t(s, d, "orders").groupBy(col("o_orderpriority"))
        .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), "|").as("statuses"),
          count(lit(1)).as("cnt")),
      Some("""SELECT o_orderpriority,
        array_to_string(list_sort(list(DISTINCT o_orderstatus)), '|') AS statuses,
        CAST(count(*) AS BIGINT) AS cnt FROM orders GROUP BY o_orderpriority""")),

    Q("agg_collect_map", // map(k,v) collector → map_from_entries;
      // keys/values extracted via map_keys/map_values (§2.B.7 map family)
      (s, d) => {
        val c = t(s, d, "orders").groupBy(col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("cnt"))
        c.groupBy(col("o_orderpriority"))
          .agg(map_from_entries(array_sort(collect_list(struct(col("o_orderstatus"), col("cnt")))))
            .as("m"))
          .select(col("o_orderpriority"),
            array_join(map_keys(col("m")), "|").as("statuses"),
            array_join(transform(map_values(col("m")), _.cast("string")), "|").as("counts"))
      },
      Some("""WITH c AS (SELECT o_orderpriority, o_orderstatus,
          CAST(count(*) AS BIGINT) AS cnt FROM orders GROUP BY 1, 2),
        m AS (SELECT o_orderpriority,
          map_from_entries(list_sort(list(struct_pack(k := o_orderstatus, v := cnt)))) AS mp
          FROM c GROUP BY 1)
        SELECT o_orderpriority, array_to_string(map_keys(mp), '|') AS statuses,
          array_to_string(list_transform(map_values(mp), x -> CAST(x AS VARCHAR)), '|') AS counts
        FROM m""")),

    Q("agg_having", // HAVING via nested select (ArcadeDB form)
      (s, d) => t(s, d, "orders").groupBy(col("o_custkey"))
        .agg(moneySum(col("o_totalprice")).as("total_spent"), count(lit(1)).as("n"))
        .filter(col("n") >= 3),
      Some(s"""SELECT o_custkey, ${sqlMoneySum("o_totalprice")} AS total_spent,
        CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY o_custkey
        HAVING count(*) >= 3""")),

    Q("distinct_rows",
      (s, d) => t(s, d, "orders").select(col("o_orderstatus"), col("o_orderpriority")).distinct(),
      Some("SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders")),

    // ✚ extension (absent in ArcadeDB 22.8.1): HLL approximate distinct.
    // The sketch estimate itself is implementation-specific, so the
    // hashed contract is the oracle-computable part: the exact count
    // plus a boolean attesting the estimate sits within 15% ≈ 3σ of it
    // (HLL++ at rsd=0.05 — rsd is a standard DEVIATION, not a bound, so
    // attesting 1σ would turn an in-spec estimate at another scale into
    // a spurious correctness failure; 3σ holds for any dataset the
    // sketch meets its contract on).
    Q("approx_distinct",
      (s, d) => t(s, d, "lineitem")
        .agg(approx_count_distinct(col("l_partkey"), 0.05).as("approx"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("exact_parts"),
          (abs(col("approx") - col("exact_parts")).cast("double")
            / col("exact_parts") <= 0.15).as("within_3sigma")),
      Some("""SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        true AS within_3sigma FROM lineitem""")),

    // ✚ one-pass column profiler (operators.Profile scaladoc): counts,
    // exact distincts, min/max per column from ONE scan; money
    // profiled in integer cents so min/max strings render identically
    // in both engines
    Q("profile_columns",
      (s, d) => graft.operators.Profile.profile(t(s, d, "orders"), Seq(
        "o_orderstatus" -> col("o_orderstatus"),
        "o_custkey" -> col("o_custkey"),
        "o_totalprice_cents" -> cents(col("o_totalprice")))),
      Some("""SELECT * FROM (
        SELECT 'o_orderstatus' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
          CAST(count(o_orderstatus) AS BIGINT) AS n_nonnull,
          CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
          CAST(min(o_orderstatus) AS VARCHAR) AS min_val,
          CAST(max(o_orderstatus) AS VARCHAR) AS max_val FROM orders
        UNION ALL SELECT 'o_custkey', CAST(count(*) AS BIGINT),
          CAST(count(o_custkey) AS BIGINT), CAST(count(DISTINCT o_custkey) AS BIGINT),
          CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM orders
        UNION ALL SELECT 'o_totalprice_cents', CAST(count(*) AS BIGINT),
          CAST(count(c) AS BIGINT), CAST(count(DISTINCT c) AS BIGINT),
          CAST(min(c) AS VARCHAR), CAST(max(c) AS VARCHAR)
          FROM (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders) t
      ) p""")),

    // ✚ equi-width histogram (operators.Profile.histogram): 20 buckets
    // over o_totalprice in EXACT integer cents — floor-then-cast both
    // sides (Spark's double→long cast truncates, DuckDB's rounds),
    // bounds as a 1-row bind, output 20 rows regardless of table size
    Q("profile_histogram",
      (s, d) => graft.operators.Profile.histogram(t(s, d, "orders"),
        cents(col("o_totalprice")), 20),
      Some(s"""WITH v AS (SELECT ${sqlCents("o_totalprice")} AS v FROM orders),
        b AS (SELECT min(v) AS mn, max(v) AS mx FROM v),
        k AS (SELECT CASE WHEN mx = mn THEN 0
            ELSE least(19, CAST(floor((v - mn) * 20 / (mx - mn)) AS BIGINT))
          END AS bucket FROM v CROSS JOIN b),
        g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM k GROUP BY bucket)
        SELECT bucket, mn + bucket * (mx - mn) / 20 AS lo, n
        FROM g CROSS JOIN b""")),

    // ✚ dense variant (round 12, the ADVICE r11 densify note): exactly
    // nBuckets rows, empty buckets at n = 0 — a metadata-sized
    // bucket-range left join over the sparse aggregate
    Q("profile_histogram_dense",
      (s, d) => graft.operators.Profile.histogramDense(t(s, d, "orders"),
        cents(col("o_totalprice")), 256),
      Some(s"""WITH v AS (SELECT ${sqlCents("o_totalprice")} AS v FROM orders),
        b AS (SELECT min(v) AS mn, max(v) AS mx FROM v),
        k AS (SELECT CASE WHEN mx = mn THEN 0
            ELSE least(255, CAST(floor((v - mn) * 256 / (mx - mn)) AS BIGINT))
          END AS bucket FROM v CROSS JOIN b),
        g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM k GROUP BY bucket),
        r AS (SELECT unnest(generate_series(0, 255)) AS bucket)
        SELECT r.bucket, mn + r.bucket * (mx - mn) / 256 AS lo,
          CAST(coalesce(g.n, 0) AS BIGINT) AS n
        FROM r CROSS JOIN b LEFT JOIN g ON g.bucket = r.bucket""")),

    // ✚ pairwise Pearson correlations (operators.Profile.correlations):
    // all sums accumulate as EXACT BIGINTs over integer inputs, the
    // float arithmetic happens once at the end on identical integers —
    // the determinism doctrine applied to second moments; one scan for
    // all pairs
    Q("profile_correlations",
      (s, d) => graft.operators.Profile.correlations(t(s, d, "lineitem"), Seq(
        "l_quantity" -> col("l_quantity").cast("long"),
        // whole DOLLARS, not cents: sum(b^2) over cents overflows BIGINT
        // already at sf0.1 (1e14 per row x 6e5 rows); dollars keep the
        // x100 probe at ~6e17, inside the exact-long envelope
        "l_extendedprice_dollars" -> round(col("l_extendedprice"), 0).cast("long"),
        "l_discount_pct" -> round(col("l_discount") * 100, 0).cast("long"))),
      Some("""WITH v AS (SELECT CAST(l_quantity AS BIGINT) AS a,
          CAST(round(l_extendedprice) AS BIGINT) AS b,
          CAST(round(l_discount * 100) AS BIGINT) AS c FROM lineitem),
        w AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(a) AS BIGINT) AS sa, CAST(sum(a*a) AS BIGINT) AS qa,
          CAST(sum(b) AS BIGINT) AS sb, CAST(sum(b*b) AS BIGINT) AS qb,
          CAST(sum(c) AS BIGINT) AS sc, CAST(sum(c*c) AS BIGINT) AS qc,
          CAST(sum(a*b) AS BIGINT) AS pab, CAST(sum(a*c) AS BIGINT) AS pac,
          CAST(sum(b*c) AS BIGINT) AS pbc FROM v)
        SELECT 'l_quantity' AS x_col, 'l_extendedprice_dollars' AS y_col,
          round((CAST(n AS DOUBLE) * pab - CAST(sa AS DOUBLE) * sb) /
            nullif(sqrt(CAST(n AS DOUBLE) * qa - CAST(sa AS DOUBLE) * sa) *
             sqrt(CAST(n AS DOUBLE) * qb - CAST(sb AS DOUBLE) * sb), 0.0), 6) AS r
          FROM w
        UNION ALL SELECT 'l_quantity', 'l_discount_pct',
          round((CAST(n AS DOUBLE) * pac - CAST(sa AS DOUBLE) * sc) /
            nullif(sqrt(CAST(n AS DOUBLE) * qa - CAST(sa AS DOUBLE) * sa) *
             sqrt(CAST(n AS DOUBLE) * qc - CAST(sc AS DOUBLE) * sc), 0.0), 6) FROM w
        UNION ALL SELECT 'l_extendedprice_dollars', 'l_discount_pct',
          round((CAST(n AS DOUBLE) * pbc - CAST(sb AS DOUBLE) * sc) /
            nullif(sqrt(CAST(n AS DOUBLE) * qb - CAST(sb AS DOUBLE) * sb) *
             sqrt(CAST(n AS DOUBLE) * qc - CAST(sc AS DOUBLE) * sc), 0.0), 6) FROM w""")),

    // ✚ RFM segmentation (operators.Rfm): recency/frequency/monetary
    // quartile scores per customer — exact-integer axes, percentile
    // boundaries (the agg_percentiles cross-engine precedent), integer
    // comparisons, NO ntile global window.
    Q("orders_rfm",
      (s, d) => graft.operators.Rfm.rfm(t(s, d, "orders"), "o_custkey",
        // NTZ → session-UTC timestamp is the identity instant here
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000"),
        cents(col("o_totalprice"))),
      Some(s"""WITH per AS (SELECT o_custkey,
          max(epoch_us(o_orderdate) // 86400000000) AS last_day,
          CAST(count(*) AS BIGINT) AS f,
          CAST(sum(${sqlCents("o_totalprice")}) AS BIGINT) AS m_cents
          FROM orders GROUP BY o_custkey),
        mx AS (SELECT max(last_day) AS maxd FROM per),
        b AS (SELECT per.*, maxd - last_day AS r_days FROM per CROSS JOIN mx),
        q AS (SELECT quantile_cont(r_days, 0.25) AS rq1, quantile_cont(r_days, 0.5) AS rq2,
          quantile_cont(r_days, 0.75) AS rq3, quantile_cont(f, 0.25) AS fq1,
          quantile_cont(f, 0.5) AS fq2, quantile_cont(f, 0.75) AS fq3,
          quantile_cont(m_cents, 0.25) AS mq1, quantile_cont(m_cents, 0.5) AS mq2,
          quantile_cont(m_cents, 0.75) AS mq3 FROM b),
        sc AS (SELECT o_custkey, r_days, f, m_cents,
          5 - (1 + CAST(r_days > rq1 AS INTEGER) + CAST(r_days > rq2 AS INTEGER)
            + CAST(r_days > rq3 AS INTEGER)) AS r_score,
          1 + CAST(f > fq1 AS INTEGER) + CAST(f > fq2 AS INTEGER)
            + CAST(f > fq3 AS INTEGER) AS f_score,
          1 + CAST(m_cents > mq1 AS INTEGER) + CAST(m_cents > mq2 AS INTEGER)
            + CAST(m_cents > mq3 AS INTEGER) AS m_score
          FROM b CROSS JOIN q)
        SELECT o_custkey, r_days, f, m_cents, r_score, f_score, m_score,
          CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
            || CAST(m_score AS VARCHAR) AS segment
        FROM sc""")),

    // ——— §2.B.5 sort / limit / pagination / set ops ————————————————
    Q("sort_topk", // ORDER BY + LIMIT → TakeOrderedAndProject (no total sort)
      (s, d) => t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc).limit(10)
        .select(col("o_orderkey"), col("o_totalprice")),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    Q("sort_pagination", // SKIP m LIMIT n
      (s, d) => t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .offset(20).limit(10)
        .select(col("o_orderkey"), col("o_totalprice")),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 20""")),

    Q("set_union", // unionall() — bag semantics
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .unionByName(t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))),
      Some("""SELECT c_nationkey AS nationkey FROM customer
        UNION ALL SELECT s_nationkey AS nationkey FROM supplier""")),

    Q("set_intersect", // intersect() — distinct semantics
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))),
      Some("""SELECT c_nationkey AS nationkey FROM customer
        INTERSECT SELECT s_nationkey AS nationkey FROM supplier""")),

    Q("set_except", // difference()
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .except(t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))),
      Some("""SELECT c_nationkey AS nationkey FROM customer
        EXCEPT SELECT s_nationkey AS nationkey FROM supplier""")),

    Q("set_symdiff", // symmetricDifference()
      (s, d) => {
        val a = t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        val b = t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))
        a.except(b).unionByName(b.except(a))
      },
      Some("""(SELECT c_nationkey AS nationkey FROM customer
          EXCEPT SELECT s_nationkey FROM supplier)
        UNION ALL
        (SELECT s_nationkey AS nationkey FROM supplier
          EXCEPT SELECT c_nationkey FROM customer)""")),

    // ——— §2.B.6 reshaping ————————————————————————————————————————
    Q("unwind_explode", // UNWIND arrayField
      (s, d) => t(s, d, "part").select(explode(split(col("p_name"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt")),
      Some("""SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM (
        SELECT unnest(string_split(p_name, ' ')) AS token FROM part) u
        GROUP BY token""")),

    Q("subquery_from", // SELECT FROM (SELECT …)
      (s, d) => t(s, d, "orders").groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 5)
        .groupBy(col("n")).agg(count(lit(1)).as("n_customers")),
      Some("""SELECT n, CAST(count(*) AS BIGINT) AS n_customers FROM (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY o_custkey) q
        WHERE n >= 5 GROUP BY n""")),

    Q("let_scalar", // LET $avg = (subquery) … WHERE x > $avg
      (s, d) => {
        val c = t(s, d, "customer")
        val avgCents = c.agg((sum(cents(col("c_acctbal"))) / count(lit(1))).as("avg_cents"))
        c.crossJoin(avgCents).filter(cents(col("c_acctbal")) > col("avg_cents"))
          .select(col("c_custkey"), col("c_name"))
      },
      Some(s"""SELECT c_custkey, c_name FROM customer
        WHERE ${sqlCents("c_acctbal")} >
          (SELECT CAST(SUM(${sqlCents("c_acctbal")}) AS BIGINT) * 1.0 / count(*) FROM customer)""")),

    // ——— §2.B.7 scalar function families ——————————————————————————
    Q("string_funcs",
      (s, d) => t(s, d, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("up"),
        lower(col("c_name")).as("lo"),
        substring(col("c_name"), 10, 6).as("sub"),
        length(col("c_name")).as("len"),
        concat(col("c_mktsegment"), lit("_"), col("c_name")).as("cat"),
        regexp_replace(col("c_name"), "0+", "0").as("rre"),
        md5(col("c_name")).as("h"), // the shim's own hash fn (HashUtils.java:17,23)
        instr(col("c_name"), "00").cast("int").as("pos"),
        trim(lit("  x  ")).as("trimmed")),
      Some("""SELECT c_custkey, upper(c_name) AS up, lower(c_name) AS lo,
        substr(c_name, 10, 6) AS sub, CAST(length(c_name) AS INTEGER) AS len,
        c_mktsegment || '_' || c_name AS cat,
        regexp_replace(c_name, '0+', '0', 'g') AS rre, md5(c_name) AS h,
        CAST(instr(c_name, '00') AS INTEGER) AS pos, trim('  x  ') AS trimmed
        FROM customer""")),

    // second string batch: the §2.B.7 method-chain forms not in
    // string_funcs (left/right/charAt/split/format/pad/repeat/affix)
    Q("string_funcs2",
      (s, d) => t(s, d, "customer").select(
        col("c_custkey"),
        left(col("c_name"), lit(8)).as("l8"),
        right(col("c_name"), lit(3)).as("r3"),
        substring(col("c_name"), 1, 1).as("ch1"), // charAt(0)
        element_at(split(col("c_name"), "#"), 2).as("numpart"),
        format_string("%s_%d", col("c_mktsegment"), col("c_custkey")).as("fmt"),
        lpad(col("c_custkey").cast("string"), 9, "0").as("padded"),
        repeat(lit("ab"), 3).as("rep"),
        col("c_name").startsWith("Customer").as("sw"),
        col("c_name").endsWith("1").as("ew")),
      Some("""SELECT c_custkey, left(c_name, 8) AS l8, right(c_name, 3) AS r3,
        substr(c_name, 1, 1) AS ch1, string_split(c_name, '#')[2] AS numpart,
        printf('%s_%d', c_mktsegment, c_custkey) AS fmt,
        lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS padded,
        repeat('ab', 3) AS rep,
        starts_with(c_name, 'Customer') AS sw,
        ends_with(c_name, '1') AS ew
        FROM customer""")),

    Q("math_funcs",
      (s, d) => t(s, d, "part").select(
        col("p_partkey"),
        abs(col("p_size") * -1).as("abs_v"),
        ceil(col("p_retailprice")).as("ceil_v"),
        floor(col("p_retailprice")).as("floor_v"),
        sqrt(col("p_size").cast("double")).as("sqrt_v"),
        pow(col("p_size"), 2).as("pow_v"),
        (col("p_size") % 7).as("mod_v"),
        round(exp(col("p_size") / lit(100.0)), 6).as("exp_v"),
        round(log(col("p_size").cast("double") + 1), 6).as("ln_v")),
      Some("""SELECT p_partkey, abs(p_size * -1) AS abs_v,
        CAST(ceil(p_retailprice) AS BIGINT) AS ceil_v,
        CAST(floor(p_retailprice) AS BIGINT) AS floor_v,
        sqrt(CAST(p_size AS DOUBLE)) AS sqrt_v,
        pow(p_size, 2) AS pow_v, p_size % 7 AS mod_v,
        round(exp(p_size / 100.0), 6) AS exp_v,
        round(ln(CAST(p_size AS DOUBLE) + 1), 6) AS ln_v FROM part""")),

    Q("date_funcs",
      (s, d) => t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d_str"),
        to_date(col("o_orderdate")).as("d"),
        datediff(to_date(lit("1999-01-01")), to_date(col("o_orderdate"))).as("days_to")),
      Some("""SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
        CAST(month(o_orderdate) AS INTEGER) AS mo,
        CAST(day(o_orderdate) AS INTEGER) AS dom,
        strftime(o_orderdate, '%Y-%m-%d') AS d_str,
        CAST(o_orderdate AS DATE) AS d,
        CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INTEGER) AS days_to
        FROM orders""")),

    Q("conversion_cast", // the 8-type lattice casts (SURVEY §1.2)
      (s, d) => t(s, d, "lineitem").select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_quantity").cast("int").as("qty_int"),
        col("l_quantity").cast("long").as("qty_long"),
        col("l_quantity").cast("string").as("qty_str"),
        col("l_extendedprice").cast("float").as("price_f"),
        (col("l_linenumber") % 2).cast("boolean").as("odd_line"),
        col("l_linenumber").cast("byte").as("line_b"),
        col("l_linenumber").cast("short").as("line_s"),
        substring(col("l_returnflag"), 1, 1).as("flag_c")),
      Some("""SELECT l_orderkey, l_linenumber, CAST(l_quantity AS INTEGER) AS qty_int,
        CAST(l_quantity AS BIGINT) AS qty_long, CAST(l_quantity AS VARCHAR) AS qty_str,
        CAST(l_extendedprice AS FLOAT) AS price_f,
        CAST(l_linenumber % 2 AS BOOLEAN) AS odd_line,
        CAST(l_linenumber AS TINYINT) AS line_b, CAST(l_linenumber AS SMALLINT) AS line_s,
        substr(l_returnflag, 1, 1) AS flag_c FROM lineitem""")),

    Q("json_funcs", // HTTP layer JSON ↔ records (declared over events.props)
      (s, d) => t(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"),
        to_json(struct(col("event_id"), col("event_type"))).as("j")),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
        '{"event_id":' || event_id || ',"event_type":"' || event_type || '"}' AS j
        FROM events""")),

    // The SQL surface itself (ArcadeDB's primary interface is SQL over
    // HTTP): register per-table temp views and run the IDENTICAL SQL
    // text through Spark's parser — the oracle twin IS the same string.
    Q("sql_interface",
      (s, d) => {
        Seq("customer", "orders", "nation").foreach(n =>
          t(s, d, n).createOrReplaceTempView(n))
        s.sql(SqlInterfaceText)
      },
      Some(SqlInterfaceText)),

    Q("conditional_funcs", // if()/ifnull()/coalesce
      (s, d) => t(s, d, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 100000, "big")
          .when(col("o_totalprice") > 50000, "mid").otherwise("small").as("bucket"),
        coalesce(expr("nullif(o_orderstatus,'O')"), lit("OPEN")).as("status2")),
      Some("""SELECT o_orderkey,
        CASE WHEN o_totalprice > 100000 THEN 'big'
          WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS bucket,
        coalesce(nullif(o_orderstatus,'O'), 'OPEN') AS status2 FROM orders"""))
  )
}
