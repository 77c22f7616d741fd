package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the single LATEST right row with
  * `right.ts <= left.ts` in the same key group (the training-pipeline
  * alignment primitive: join each event to the most recent prior
  * state/feature snapshot).
  *
  * Spark has no native as-of join; the classic scalable formulation is
  * used here: tag both sides, union them, and carry the right side's
  * payload forward with `last(_, ignoreNulls) OVER (PARTITION BY key
  * ORDER BY ts, side ROWS UNBOUNDED PRECEDING)`, then keep the left
  * rows. Cost = ONE hash shuffle on the key plus a per-partition sort
  * — never a per-row range probe, a broadcast range join, or an
  * exploding inequality join, so it scales to a 100 TB event log the
  * same way a groupBy does. Right rows sort before left rows at equal
  * timestamps, giving the standard inclusive (`>=`) as-of semantics —
  * the same contract as DuckDB's native `ASOF JOIN`, which is the
  * oracle twin (`asof_events`).
  *
  * The right side must be unique per (key, ts) — pre-aggregate it
  * (e.g. `max_by`) if it is not; ties would otherwise be
  * partition-order dependent, so this is REQUIRED, not advisory.
  * Rows with no prior right match keep null payloads (left-join
  * semantics).
  *
  * Returns left's columns plus each right payload column as
  * `asof_<name>` and the matched right timestamp as `asof_ts`.
  */
object AsOfJoin {

  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "as-of join needs at least one right payload column")
    val asofCols = payloadCols.map(c => s"asof_$c") :+ "asof_ts"
    val clash = left.columns.toSet.intersect(asofCols.toSet + "__side")
    require(clash.isEmpty, s"left side already has column(s) ${clash.mkString(", ")}")

    val lTagged = left
      .withColumn("__side", lit(1))
      .withColumns(asofCols.map(c => c -> lit(null)).toMap)
    // a null-timestamp right row would sort FIRST under the ascending
    // window and pollute every left row's carried payload — it can
    // never be "the latest prior" of anything, so drop it here; a
    // null-timestamp LEFT row naturally gets null payloads (it sorts
    // before every surviving right row)
    val rTagged = right.filter(col(ts).isNotNull).select(
      Seq(col(key), col(ts), lit(0).as("__side")) ++
        payloadCols.map(c => col(c).as(s"asof_$c")) :+ col(ts).as("asof_ts"): _*)

    val u = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // right rows (side 0) sort before left rows (side 1) at equal ts →
    // inclusive as-of; the frame never looks ahead
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = asofCols.foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(left.columns.map(col).toIndexedSeq ++ asofCols.map(col): _*)
  }
}
