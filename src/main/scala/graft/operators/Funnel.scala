package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-stage funnel analysis over an event table — the events-analytics
  * classic: for each user, the earliest completion time of every
  * successive stage, where stage i counts only STRICTLY AFTER stage
  * i−1's completion (an out-of-order click before the first view does
  * not advance a view→click funnel). The per-user result is the
  * furthest stage reached plus its timestamps; the corpus-level funnel
  * (users per stage) is one aggregation away.
  *
  * Shape: stage i is a filtered user-keyed `min` aggregate joined to
  * stage i−1's (user, t) frame — each frame is USER-sized (far smaller
  * than the event table), every join keys on the user id the
  * aggregates already shuffle on, and the event scan is pruned to the
  * stage's predicate each pass. The alternative single-pass
  * collect-and-fold holds a user's whole event list in one row; the
  * per-stage aggregates never materialize more than (user, timestamp)
  * pairs, so a power user costs their event count in the scan, not in
  * memory. Completion times are monotone by construction
  * (tᵢ non-null ⇒ tᵢ₋₁ non-null and tᵢ > tᵢ₋₁).
  *
  * Returns one row per user who completed stage 1:
  * (userCol, t_<stage1>, …, t_<stageK> [nullable], stage = furthest
  * 1-based stage index reached).
  */
object Funnel {

  def funnel(events: DataFrame, userCol: String, tsCol: String,
      stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "a funnel needs at least one stage")
    require(stages.map(_._1).distinct.length == stages.length,
      "stage names must be distinct")
    val frames = stages.zipWithIndex.map { case ((name, _), i) =>
      (s"t_$name", i)
    }
    val stageFrames = stages.zipWithIndex.foldLeft(List.empty[DataFrame]) {
      case (acc, ((name, pred), i)) =>
        val tcol = s"t_$name"
        val filtered = events.filter(pred)
        val frame = acc.headOption match {
          case None =>
            filtered.groupBy(col(userCol)).agg(min(col(tsCol)).as(tcol))
          case Some(prev) =>
            val prevT = prev.columns.last
            filtered.join(prev.select(col(userCol), col(prevT)), Seq(userCol))
              .filter(col(tsCol) > col(prevT))
              .groupBy(col(userCol)).agg(min(col(tsCol)).as(tcol))
        }
        frame :: acc
    }.reverse
    val joined = stageFrames.tail.foldLeft(stageFrames.head) {
      case (acc, f) => acc.join(f, Seq(userCol), "left")
    }
    // ascending fold ⇒ the OUTERMOST when checks the deepest stage
    // first; completion times are monotone, so the first non-null hit
    // is the furthest stage (rows exist only for stage-1 completers,
    // so the 0 seed is unreachable)
    val stageExpr = frames.foldLeft(lit(0)) {
      case (acc, (tcol, i)) =>
        when(col(tcol).isNotNull, lit(i + 1)).otherwise(acc)
    }
    joined.withColumn("stage", stageExpr)
  }

  /** Cohort retention — the second events-analytics classic beside the
    * funnel: users cohorted by their FIRST active day, then counted as
    * retained per (cohort, day offset). Day arithmetic runs entirely
    * in exact integer epoch-days (`unix_micros div 86400e6` — the
    * Qh cents discipline for time), so an SQL oracle matches
    * bit-for-bit with no date-type seams. Shuffles: one distinct on
    * (user, day) — the activity set, far smaller than the event
    * table — a user-keyed min aggregate, one user-keyed join, and a
    * cohort-sized final count. Returns
    * (cohort_day, offset_days, n_users). */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val usPerDay = 86400000000L
    val days = events.select(col(userCol),
        expr(s"unix_micros($tsCol) div $usPerDay").as("day"))
      .distinct()
    val cohort = days.groupBy(col(userCol)).agg(min(col("day")).as("cohort_day"))
    days.join(cohort, Seq(userCol))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset_days"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Cohort LIFETIME VALUE — retention's revenue twin: users cohorted
    * by first-active epoch-day, revenue accumulated per (cohort,
    * day-offset) and CUMULATED along the offset axis, normalized per
    * cohort head. Monetary values ride as exact integer cents (the RFM
    * rule) and the running sum is a window whose partitions hold at
    * most the corpus's day-span rows per cohort — bounded by the
    * calendar, never by users or events (the trending boundedness
    * argument). ltv divides two exact integers ONCE per row. Returns
    * (cohort_day, offset_days, n_users, rev_cents, cum_rev_cents,
    * cohort_size, ltv_cents). */
  def cohortLtv(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val usPerDay = 86400000000L
    val base = events.select(col(userCol),
      expr(s"unix_micros($tsCol) div $usPerDay").as("day"),
      round(col(valueCol) * 100).cast("long").as("cents"))
    val cohort = base.groupBy(col(userCol)).agg(min(col("day")).as("cohort_day"))
    val sized = cohort.groupBy(col("cohort_day"))
      .agg(countDistinct(col(userCol)).as("cohort_size"))
    val per = base.join(cohort, Seq(userCol))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset_days"))
      .agg(countDistinct(col(userCol)).as("n_users"),
        sum(col("cents")).as("rev_cents"))
    val w = Window.partitionBy(col("cohort_day")).orderBy(col("offset_days"))
      .rowsBetween(Window.unboundedPreceding, 0)
    per.withColumn("cum_rev_cents", sum(col("rev_cents")).over(w))
      .join(sized, Seq("cohort_day"))
      .withColumn("ltv_cents",
        round(col("cum_rev_cents").cast("double") / col("cohort_size"), 2))
  }
}

/** RFM segmentation — the customer-analytics classic: per customer,
  * Recency (days since last order, from the corpus max day), Frequency
  * (order count), Monetary (spend in exact cents); each axis scored
  * 1–4 by its corpus quartiles (recency INVERTED — recent = good).
  * All inputs are exact integers, quartile boundaries come from the
  * interpolated `percentile` both engines compute identically on
  * integer-valued columns (the agg_percentiles precedent), and scores
  * are integer comparisons against those boundaries — no ntile global
  * window (which would serialize every customer through one task).
  * Shuffles: one customer-keyed agg + two 1-row binds. Returns
  * (custCol, r_days, f, m_cents, r_score, f_score, m_score, segment).
  */
object Rfm {
  def rfm(orders: DataFrame, custCol: String, dayCol: Column,
      moneyCents: Column): DataFrame = {
    val per = orders.groupBy(col(custCol)).agg(
      max(dayCol).as("last_day"), count(lit(1)).as("f"),
      sum(moneyCents).as("m_cents"))
    val maxDay = per.agg(max(col("last_day")).as("__maxd"))
    val base = per.crossJoin(broadcast(maxDay)) // 1-row bind
      .withColumn("r_days", col("__maxd") - col("last_day"))
    val qs = base.agg(
      percentile(col("r_days"), lit(0.25)).as("rq1"),
      percentile(col("r_days"), lit(0.5)).as("rq2"),
      percentile(col("r_days"), lit(0.75)).as("rq3"),
      percentile(col("f"), lit(0.25)).as("fq1"),
      percentile(col("f"), lit(0.5)).as("fq2"),
      percentile(col("f"), lit(0.75)).as("fq3"),
      percentile(col("m_cents"), lit(0.25)).as("mq1"),
      percentile(col("m_cents"), lit(0.5)).as("mq2"),
      percentile(col("m_cents"), lit(0.75)).as("mq3"))
    def up(v: Column, q1: String, q2: String, q3: String) =
      lit(1) + (v > col(q1)).cast("int") + (v > col(q2)).cast("int") +
        (v > col(q3)).cast("int")
    base.crossJoin(broadcast(qs)) // 1-row bind
      .withColumn("r_score", lit(5) - up(col("r_days"), "rq1", "rq2", "rq3"))
      .withColumn("f_score", up(col("f"), "fq1", "fq2", "fq3"))
      .withColumn("m_score", up(col("m_cents"), "mq1", "mq2", "mq3"))
      .select(col(custCol), col("r_days"), col("f"), col("m_cents"),
        col("r_score"), col("f_score"), col("m_score"),
        concat(col("r_score"), col("f_score"), col("m_score")).as("segment"))
  }
}
