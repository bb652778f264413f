package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — for each left row, the nearest right row at-or-before
  * ([[backward]]) or at-or-after ([[forward]]) its time within the same
  * key (the time-series join the reference's explorer queries
  * approximate with block-height range scans, and a staple of
  * feature/training-data pipelines).
  *
  * Spark has no native as-of join; the composition here is the
  * scalable union-and-carry formulation, not a per-key loop: tag both
  * sides, union, sort within key, and carry the nearest right payload
  * with `last(..., ignoreNulls)` over an unbounded-PRECEDING frame.
  * Both directions scan in the carry direction (forward simply sorts
  * descending), because Spark evaluates the unbounded-preceding frame
  * incrementally in O(n) per partition while an unbounded-FOLLOWING
  * frame re-evaluates suffix aggregates per row — O(n²) on a long key
  * history. One shuffle on the key, linear scan per key partition, no
  * range-explosion — survives arbitrarily long histories as long as a
  * single key's rows fit a partition (same contract as any windowed
  * operator; salt keys beyond that).
  *
  * Null join keys follow SQL equi-join semantics: null-key right rows
  * are dropped, null-key left rows carry no match. Null TIMES follow
  * SQL inequality semantics the same way: `rightTime <= NULL` (and
  * `>= NULL`) is never true, so null-time probes carry no match and
  * null-time history rows match nothing — both bypass the window scan
  * entirely (a sort-order formulation would get this wrong: desc is
  * NULLS LAST, so a null-time probe would sort after all history and
  * pick up the minimum-time row).
  */
object AsOfJoin {

  /** Backward as-of: the LATEST right row with `rightTime <= leftTime`.
    *
    * @param left      probe side
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
      rightCols: Seq[String]): DataFrame =
    carryJoin(left, right, leftKey, rightKey, leftTime, rightTime,
      rightCols, descending = false)

  /** Forward as-of: the EARLIEST right row with `rightTime >= leftTime`
    * ("time to next event": next purchase after a view, next restock
    * after a stock-out, …). Ties among right rows at the same
    * (key, time) are resolved by the caller pre-deduplicating the right
    * side (as q37 does) — which of the tied rows the carry picks is
    * otherwise unspecified. */
  def forward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String]): DataFrame =
    carryJoin(left, right, leftKey, rightKey, leftTime, rightTime,
      rightCols, descending = true)

  /** The shared union-and-carry machinery. `descending=false` scans
    * ascending (history at-or-before wins); `descending=true` scans
    * descending (history at-or-after wins). In both scans history rows
    * (__side=0) sort before same-time probes (__side=1), which makes
    * the equal-time match inclusive. */
  private def carryJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String], descending: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val matchType = org.apache.spark.sql.types.StructType(
      right.select(rightCols.map(col): _*).schema.fields)
    // null-key AND null-time probes can never match (SQL equi/inequality
    // semantics) — bypass the shuffle entirely rather than funneling
    // null keys into the single null window partition (a skew hazard
    // when null keys are common) or letting a null time sort to the far
    // end of the scan and pick up the extremum-time history row
    val nullProbes = left.where(col(leftKey).isNull || col(leftTime).isNull)
    val l = left
      .where(col(leftKey).isNotNull && col(leftTime).isNotNull)
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(matchType))
    val r = right
      // SQL semantics: a null key or null time never matches anything
      .where(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select((Seq(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__side"),
        struct(rightCols.map(col): _*).as("__r")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val unioned = l.select(
      (Seq(col("__k"), col("__t"), col("__side"), col("__r")) ++
        leftCols.map(col)): _*)
      .unionByName(r)
    val timeOrd: Column = if (descending) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(col("__k"))
      .orderBy(timeOrd, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val joined = rightCols.foldLeft(
      carried.select((leftCols.map(col) :+ col("__match")): _*)) {
      (df, c) => df.withColumn(c, col("__match").getField(c))
    }.drop("__match")
    joined.unionByName(
      nullProbes.withColumn("__match", lit(null).cast(matchType))
        .select((leftCols.map(col) ++
          rightCols.map(c => col("__match").getField(c).as(c))): _*))
  }
}
