package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling utilities for shuffle joins and aggregations at scale.
  *
  * Layered defense (in preference order):
  *  1. AQE skew-join splitting — on by default, handles detected
  *     partition-size skew at runtime; nothing to do.
  *  2. `broadcast()` the small side — every dimension join in the query
  *     pack does this; no shuffle of the big side at all.
  *  3. Explicit salting (this file) — for the residual case: a
  *     shuffle join/aggregation whose KEY distribution is so hot (one
  *     account, one event type) that a single key exceeds an executor.
  */
object Skew {

  /** Salted equi-join: the big side gets a deterministic salt in
    * [0, salts); the small side is replicated `salts` ways; the join key
    * becomes (key, salt), splitting each hot key's rows across `salts`
    * reducers. Semantics identical to `big.join(small, keys)` for
    * unique-keyed `small` (replication would duplicate matches
    * otherwise — same caveat as any salting).
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int = 16, joinType: String = "inner"): DataFrame = {
    // salt derived from the row's own key-independent entropy: hash of
    // all big-side columns → deterministic per row, uniform across rows
    // of the same key
    val bigSalted = big.withColumn(
      "__salt", pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(salts)))
    val smallSalted = small.withColumn(
      "__salt", explode(array((0 until salts).map(lit): _*)))
    bigSalted.join(smallSalted, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase (salted) aggregation: partial aggregate on (key, salt),
    * then final on key. Spark's partial/final HashAggregate already does
    * this for algebraic functions; this explicit form is for
    * `collect_list`/`collect_set`-style holistic aggregates where the
    * map-side combine doesn't bound the hot key's reducer.
    */
  def saltedCollectSet(
      df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn(
      "__salt", pmod(xxhash64(col(valueCol)), lit(salts)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(collect_set(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(array_distinct(flatten(collect_list(col("__partial"))))
        .as(s"${valueCol}_set"))
  }
}
