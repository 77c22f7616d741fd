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
  * ORDER BY ts, side, payload ROWS UNBOUNDED PRECEDING)`, then keep the
  * left rows. Cost = ONE hash shuffle on the key plus a per-partition
  * sort — never a per-row range probe, a broadcast range join, or an
  * exploding inequality join, so it scales to a 100 TB event log the
  * same way a groupBy does. Right rows sort before left rows at equal
  * timestamps, giving the standard inclusive (`>=`) as-of semantics —
  * the same contract as DuckDB's native `ASOF JOIN`, which is the
  * oracle twin (`asof_events`).
  *
  * All carried fields come from ONE right row: the payload columns and
  * the matched timestamp travel as a single struct, so a matched row
  * with a NULL payload value yields that NULL (never an older row's
  * non-null value resurrected field-by-field).
  *
  * Duplicate right rows per (key, ts) are resolved DETERMINISTICALLY,
  * not by partition order: the payload struct participates in the
  * window sort, so at equal (key, ts) the row with the greatest payload
  * tuple (field-by-field, in `payloadCols` order) wins. This makes the
  * former "right side must be unique" precondition a defined tie rule
  * instead of a silent-wrong-answer hazard. Corollary: payload columns
  * must be orderable types (atomic / struct / array); an unorderable
  * payload (e.g. map) is rejected loudly at planning time — pre-pack it
  * into an orderable surrogate or pre-aggregate the right side.
  *
  * Rows with no prior right match keep null payloads (left-join
  * semantics).
  *
  * Returns left's columns plus each right payload column as
  * `asof_<name>` and the matched right timestamp as `asof_ts`.
  */
object AsOfJoin {

  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      payloadCols: Seq[String]): DataFrame =
    asofImpl(left, right, key, ts, payloadCols, salts = 1)

  /** Skew-resilient two-level variant: a single pathological hot key
    * hash-partitions all of its rows into ONE partition's sort in the
    * plain as-of (the same exposure as any groupBy, but a window
    * cannot be AQE-skew-split) — so here left rows additionally salt
    * into `salts` subpartitions by a deterministic row hash, and right
    * rows REPLICATE to every salt of their key. Each (key, salt)
    * subpartition then holds all right rows of the key plus 1/salts of
    * its left rows, so the per-partition sort shrinks by the salt
    * factor while every left row still sees the full right timeline —
    * results are IDENTICAL to [[asofJoin]], tie rule included. Cost:
    * the right side shuffles ×salts (it is the small state/feature
    * side in the alignment workload; pick salts ≈ the skew factor). */
  def asofJoinSalted(left: DataFrame, right: DataFrame, key: String, ts: String,
      payloadCols: Seq[String], salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    asofImpl(left, right, key, ts, payloadCols, salts)
  }

  private def asofImpl(left: DataFrame, right: DataFrame, key: String, ts: String,
      payloadCols: Seq[String], salts: Int): DataFrame = {
    require(payloadCols.nonEmpty, "as-of join needs at least one right payload column")
    val asofCols = payloadCols.map(c => s"asof_$c") :+ "asof_ts"
    val clash = left.columns.toSet.intersect(
      asofCols.toSet ++ Set("__side", "__asof", "__salt", "__carry"))
    require(clash.isEmpty, s"left side already has column(s) ${clash.mkString(", ")}")

    // left rows salt by a stable row hash (identical rows are
    // interchangeable, so hash-determinism is enough); salts=1 (the
    // plain join) degenerates to a constant
    val saltCol =
      if (salts == 1) lit(0)
      else pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(salts))
    // one struct carries the matched row whole; payload fields lead so
    // struct order IS the tie rule at equal ts (recency itself is the
    // window's ts column, never the struct)
    val lTagged = left.withColumn("__side", lit(1)).withColumn("__salt", saltCol)
    // a null-timestamp right row would sort FIRST under the ascending
    // window and pollute every left row's carried payload — it can
    // never be "the latest prior" of anything, so drop it here; a
    // null-timestamp LEFT row naturally gets null payloads (it sorts
    // before every surviving right row)
    val rBase = right.filter(col(ts).isNotNull).select(
      col(key), col(ts), lit(0).as("__side"),
      struct(payloadCols.map(c => col(c).as(s"asof_$c")) :+ col(ts).as("asof_ts"): _*)
        .as("__asof"))
    // right rows replicate to every salt: each subpartition carries the
    // key's whole right timeline
    val rTagged =
      if (salts == 1) rBase.withColumn("__salt", lit(0))
      else rBase.withColumn("__salt",
        explode(sequence(lit(0), lit(salts - 1)).cast("array<long>")))

    val u = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // right rows (side 0) sort before left rows (side 1) at equal ts →
    // inclusive as-of; among right rows at the SAME (key, ts) the
    // greatest payload struct sorts last and therefore wins the
    // last(ignoreNulls) carry — the deterministic tie rule. Left rows'
    // null __asof sorts first within their side group (harmless).
    val w = Window.partitionBy(col(key), col("__salt"))
      .orderBy(col(ts).asc, col("__side").asc, col("__asof").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__carry", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col).toIndexedSeq ++
        asofCols.map(c => col(s"__carry.$c").as(c)): _*)
  }
}
