package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass multi-column data profiler — the schema-introspection
  * companion (SURVEY §2.A A4): per column, row count, non-null count,
  * exact distinct count, and min/max rendered as strings. The entire
  * profile is ONE aggregate over ONE scan: the multi-column DISTINCTs
  * compile to Spark's Expand-based multi-distinct aggregate (rows
  * replicate ×columns map-side, each stream partially aggregated —
  * the standard plan; no per-column rescans of a 100 TB table), and
  * the wide single-row result unpivots to per-column rows with
  * `stack` at the very end (driver-sized: one row per profiled
  * column). Callers pre-cast columns whose native string rendering is
  * engine-specific (e.g. money → integer cents), which keeps min/max
  * oracle-comparable.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.zipWithIndex.flatMap { case ((_, c), i) =>
      Seq(count(c).as(s"__nn$i"), countDistinct(c).as(s"__nd$i"),
        min(c).cast("string").as(s"__mn$i"), max(c).cast("string").as(s"__mx$i"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // Column-API stack — the profiled names travel as LITERALS, never
    // through a SQL parse, so a name holding quotes/newlines profiles
    // fine (VERDICT r7 wrong #3)
    val stackArgs = cols.zipWithIndex.flatMap { case ((n, _), i) =>
      Seq(lit(n), col("__n"), col(s"__nn$i"), col(s"__nd$i"), col(s"__mn$i"), col(s"__mx$i"))
    }
    wide.select(stack((lit(cols.size) +: stackArgs): _*)
      .as(Seq("col_name", "n_rows", "n_nonnull", "n_distinct", "min_val", "max_val")))
  }
}
