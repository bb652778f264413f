package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable event-funnel / cohort-retention operators — the ClickHouse
  * `windowFunnel()` / `retention()` surface (the reference's explorer
  * queries lean on ClickHouse for these; here they are library
  * operators over any event frame).
  *
  * Scale design: both are built from per-key aggregation passes only —
  * no per-user event collection (a power user costs aggregation, not
  * executor memory) and no window over the whole stream. The funnel's
  * N passes all hash-partition on the user key, so Spark reuses one
  * exchange across them.
  */
object EventOps {

  /** Ordered-step funnel: per user, the number of `steps` completed in
    * order — every step strictly after the previous one and within
    * `windowUs` of the FIRST step's match (ClickHouse windowFunnel
    * semantics). One aggregation pass per step; NULL propagation does
    * the gating (a missed step makes every later `when` null).
    * Output: (userCol, steps long).
    */
  def funnel(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], windowUs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel: at least one step")
    val e = events.select(
      col(userCol), col(tsCol).as("_us"), col(typeCol).as("_ty"))
    val first = e.groupBy(userCol)
      .agg(min(when(col("_ty") === steps.head, col("_us"))).as("_t0"))
    val withAll = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (step, i)) =>
        val prev = col(s"_t${i - 1}")
        val carried = (0 until i).map(j => col(s"_t$j"))
        e.join(acc, Seq(userCol))
          .groupBy(col(userCol) +: carried: _*)
          .agg(min(when(col("_ty") === step &&
            col("_us") > prev && col("_us") <= col("_t0") + windowUs,
            col("_us"))).as(s"_t$i"))
    }
    // highest completed step: the fold leaves the DEEPEST step's check
    // outermost (i ascending, each new `when` wraps the accumulator)
    val highest = steps.indices.foldLeft(lit(0L): Column) { (acc, i) =>
      when(col(s"_t$i").isNotNull, lit((i + 1).toLong)).otherwise(acc)
    }
    withAll.select(col(userCol), highest.as("steps"))
  }

  /** Cohort retention: users active on the earliest day of the frame,
    * re-counted at the given day offsets. `dayCol` must be an integer
    * day index (e.g. epoch-days). Output: (day_offset, n_active). */
  def retention(
      activity: DataFrame, userCol: String, dayCol: String,
      offsets: Seq[Long]): DataFrame = {
    val act = activity.select(col(userCol), col(dayCol).as("_day")).distinct()
    val d0 = act.agg(min(col("_day")).as("_day0"))
    val cohort = act.crossJoin(broadcast(d0))
      .where(col("_day") === col("_day0"))
      .select(userCol)
    act.crossJoin(broadcast(d0))
      .withColumn("day_offset", col("_day") - col("_day0"))
      .where(col("day_offset").isin(offsets: _*))
      .join(cohort, Seq(userCol), "left_semi")
      .groupBy("day_offset")
      .agg(countDistinct(col(userCol)).as("n_active"))
  }
}
