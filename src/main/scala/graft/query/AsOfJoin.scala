package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the latest right row with
  * `rightTime <= leftTime` within the same key (the time-series join
  * the reference's explorer queries approximate with block-height
  * range scans, and a staple of feature/training-data pipelines).
  *
  * Spark has no native as-of join; the composition here is the
  * scalable union-and-carry formulation, not a per-key loop:
  * tag both sides, union, sort within key by (time, side), and carry
  * the last right payload forward with `last(..., ignoreNulls)` over an
  * unbounded-preceding window. One shuffle on the key, linear scan per
  * key partition, no range-explosion — survives arbitrarily long
  * histories as long as a single key's rows fit a partition (same
  * contract as any windowed operator; salt keys beyond that).
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     history side (its columns get carried)
    * @param leftKey   join key column on `left`
    * @param rightKey  join key column on `right`
    * @param leftTime  event-time column on `left` (any orderable type)
    * @param rightTime event-time column on `right` (same type)
    * @param rightCols right columns to attach (null when no match)
    */
  def backward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1)) // probes sort AFTER same-time history
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightCols.map(col): _*).schema.fields)))
    val r = right
      .select((Seq(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__side"),
        struct(rightCols.map(col): _*).as("__r")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val unioned = l.select(
      (Seq(col("__k"), col("__t"), col("__side"), col("__r")) ++
        leftCols.map(col)): _*)
      .unionByName(r)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    rightCols.foldLeft(
      carried.select((leftCols.map(col) :+ col("__match")): _*)) {
      (df, c) => df.withColumn(c, col("__match").getField(c))
    }.drop("__match")
  }

  /** Forward as-of join — for each left row, the EARLIEST right row with
    * `rightTime >= leftTime` within the same key ("time to next event":
    * next purchase after a view, next restock after a stock-out, …).
    * Mirror of [[backward]]: probes sort BEFORE same-time history so an
    * equal-time right row matches, and the match is pulled back with
    * `first(..., ignoreNulls)` over an unbounded-following frame. Same
    * scale contract: one shuffle on the key, linear per key partition.
    * Ties among right rows at the same (key, time) are resolved by the
    * caller pre-deduplicating the right side (as q37 does) — the carry
    * takes whichever sorts first otherwise. */
  def forward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(0)) // probes sort BEFORE same-time history
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightCols.map(col): _*).schema.fields)))
    val r = right
      .select((Seq(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(1).as("__side"),
        struct(rightCols.map(col): _*).as("__r")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val unioned = l.select(
      (Seq(col("__k"), col("__t"), col("__side"), col("__r")) ++
        leftCols.map(col)): _*)
      .unionByName(r)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = unioned
      .withColumn("__match", first(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 0)
    rightCols.foldLeft(
      carried.select((leftCols.map(col) :+ col("__match")): _*)) {
      (df, c) => df.withColumn(c, col("__match").getField(c))
    }.drop("__match")
  }
}
