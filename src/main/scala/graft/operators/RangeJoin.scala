package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join — pairs every left row with the right rows of the
  * same key whose timestamp falls in the half-open window
  * `[left.ts - delta, left.ts)` (the "context in the preceding Δ"
  * primitive: views before a purchase, logs before a crash, features
  * in a trailing window).
  *
  * A naive `l JOIN r ON key AND r.ts BETWEEN …` plans an inequality
  * theta-join — per-key cartesian, quadratic in the hot key. Banding
  * makes it scale-safe: both sides bucket their timestamps into
  * Δ-width bands, the right side duplicates into (band, band+1), and
  * the join becomes a plain equi-join on (key, band) followed by the
  * exact residual range filter. Any window of width Δ overlaps at most
  * two bands, so candidate volume is ≤ 2·|matches-per-band-pair| —
  * output-linear, one shuffle, AQE-skew-splittable like any hash join.
  * (The general k-band window is the same construction with k+1
  * duplicates; Δ here equals the band width by design.)
  */
object RangeJoin {

  /** `tsCol` must be a timestamp; `deltaUs` the window width in
    * microseconds. Returns the matched pairs: left's columns plus the
    * right payload columns prefixed `r_` and the right timestamp as
    * `r_ts`. */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      deltaUs: Long, payloadCols: Seq[String]): DataFrame = {
    require(deltaUs > 0, "range-join window must be positive")
    val outCols = payloadCols.map(c => s"r_$c") :+ "r_ts"
    val clash = left.columns.toSet.intersect(outCols.toSet)
    require(clash.isEmpty, s"left side already has column(s) ${clash.mkString(", ")}")

    val l = left.withColumn("__lus", unix_micros(col(ts)))
      .withColumn("__band", floor(col("__lus") / deltaUs))
    val r0 = right.select(
      Seq(col(key), unix_micros(col(ts)).as("__rus"), col(ts).as("r_ts")) ++
        payloadCols.map(c => col(c).as(s"r_$c")): _*)
    // a Δ-window ending in band b starts in band b or b-1 → the right
    // row is a candidate for bands (its own, its own + 1)
    val rExp = r0.withColumn("__band",
      explode(array(floor(col("__rus") / deltaUs), floor(col("__rus") / deltaUs) + 1)))
    l.join(rExp, Seq(key, "__band"))
      .filter(col("__rus") >= col("__lus") - deltaUs && col("__rus") < col("__lus"))
      .select(left.columns.map(col).toIndexedSeq ++ outCols.map(col): _*)
  }
}
