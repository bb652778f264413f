package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join — pairs within a bounded distance on an ordered
  * axis. Spark plans a plain `|a.t - b.t| <= d` predicate as a
  * broadcast-nested-loop (O(n·m) comparisons); this formulation buckets
  * the axis at width `d`, equi-joins on (key, bucket) with each left
  * row probing its own and adjacent buckets, and re-checks the exact
  * predicate — O(matches) work after one equi-shuffle, the standard
  * interval-join trick (same idea as Structured Streaming's
  * time-interval stream-stream join).
  */
object RangeJoin {

  /** Self-join: pairs (a, b) sharing `keyCol`, with
    * 0 < b.time − a.time <= maxGap (ordered pairs, no self-pairs).
    * Output: key, a-id, b-id, gap. */
  def selfWithinGap(
      df: DataFrame, keyCol: String, idCol: String, timeCol: String,
      maxGap: Long): DataFrame = {
    val base = df.select(
      col(keyCol).as("k"), col(idCol).as("id"), col(timeCol).as("t"),
      (col(timeCol) / maxGap).cast("long").as("b"))
    // left probes its own bucket and the next (a pair within maxGap
    // spans at most adjacent buckets)
    val probe = base.withColumn("pb", explode(array(col("b"), col("b") + 1)))
      .select(col("k"), col("id").as("id_a"), col("t").as("t_a"),
        col("pb").as("b"))
    probe.join(
      base.select(col("k"), col("id").as("id_b"), col("t").as("t_b"), col("b")),
      Seq("k", "b"))
      .where(col("t_b") > col("t_a") && col("t_b") - col("t_a") <= maxGap)
      .select(col("k"), col("id_a"), col("id_b"),
        (col("t_b") - col("t_a")).as("gap"))
      .dropDuplicates("id_a", "id_b")
  }
}
