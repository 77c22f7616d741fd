package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marketing-style touch ATTRIBUTION over an event stream: each
  * conversion event credits the touch events that preceded it within a
  * lookback window — LAST-touch (the decision credit) and FIRST-touch
  * (the discovery credit) in one pass, the two book-ends every
  * multi-touch model interpolates between.
  *
  * Shape: one RANGE-framed window per user over exact integer
  * microseconds — `max(struct)` / `min(struct)` of the touch rows
  * inside `[conv − lookback, conv]` (conversion rows ride the same
  * frame as null contributions). Partitions are USER-sized (the
  * events_interarrival occupancy bound) and the frame bound makes the
  * lookback exact — no post-hoc null-out, no join, no second pass.
  * Tie-breaks at equal timestamps are the struct orders — last:
  * (us, type, id) max; first: (us, type, id) min — mirrored verbatim
  * by the oracle's ORDER BY. Returns one row per conversion:
  * (id, user, conv_us, last/first type + us + age_us, attributed). */
object Attribution {

  def attribute(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, isTouch: Column, isConversion: Column,
      lookbackUs: Long, typeCol: String = "event_type"): DataFrame = {
    require(lookbackUs > 0, "lookback must be positive")
    val rows = events.filter(isTouch || isConversion)
      .select(col(idCol), col(userCol),
        unix_micros(col(tsCol)).as("us"),
        isTouch.as("__touch"), isConversion.as("__conv"),
        col(typeCol).as("__ty"))
    val w = Window.partitionBy(col(userCol)).orderBy(col("us"))
      .rangeBetween(-lookbackUs, 0)
    val touchS = when(col("__touch"),
      struct(col("us"), col("__ty"), col(idCol).as("tid")))
    rows
      .withColumn("__last", max(touchS).over(w))
      .withColumn("__first", min(touchS).over(w))
      .filter(col("__conv"))
      .select(col(idCol), col(userCol), col("us").as("conv_us"),
        col("__last.__ty").as("last_type"), col("__last.us").as("last_us"),
        (col("us") - col("__last.us")).as("last_age_us"),
        col("__first.__ty").as("first_type"), col("__first.us").as("first_us"),
        (col("us") - col("__first.us")).as("first_age_us"),
        col("__last").isNotNull.as("attributed"))
  }
}
