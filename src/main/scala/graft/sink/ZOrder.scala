package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file layout — multi-dimensional data skipping
  * for scans that filter on EITHER of two columns.
  *
  * The single-key layout ([[Replacing.idempotentWrite]]: bucket dirs +
  * in-file sort) makes parquet row-group min/max stats selective for the
  * leading key only; a 100 TB table queried by both `user_id` and time
  * ranges would full-scan on whichever column is not the sort key.
  * Interleaving the bits of both columns' 16-bit min-max ranks and
  * range-partitioning + sorting by that Morton value clusters files in
  * BOTH dimensions at once (each of N files spans ~1/√N of each
  * column's range), so footer stats prune on either predicate — the
  * open-table-format OPTIMIZE ZORDER BY semantics, expressed directly
  * over parquet.
  *
  * Everything is a column expression (the bit interleave is 32 shift/or
  * terms, codegen'd); the only driver-side data is the 4-value bounds
  * row. ZOrderSpec measures the per-file span contraction on both
  * dimensions.
  */
object ZOrder {

  /** 16-bit min-max rank of a numeric column given global bounds (a
    * degenerate range collapses to rank 0). Min-max ranks are exact for
    * roughly-uniform keys; heavily skewed keys would want quantile
    * ranks — at the cost of a sort — before the same interleave. */
  def rank16(v: Column, lo: Column, hi: Column): Column =
    when(hi <= lo, lit(0L)).otherwise(
      floor((v.cast("double") - lo) / (hi - lo) * 65535d).cast("long"))

  /** Morton interleave of two 16-bit ranks: bit i of `a` lands at
    * position 2i+1, bit i of `b` at 2i. */
  def zValue(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Write `df` as `numFiles` parquet files range-partitioned and
    * sorted by the Morton value of (`colA`, `colB`). One tiny bounds
    * aggregate reaches the driver; the layout pass itself is one range
    * shuffle + per-file sort. */
  def zOrderWrite(
      df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int = 64, bloomCols: Seq[String] = Nil): Unit = {
    val b = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    val (loA, hiA, loB, hiB) =
      (b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3))
    val z = zValue(
      rank16(col(colA), lit(loA), lit(hiA)),
      rank16(col(colB), lit(loB), lit(hiB)))
    val writer = df
      .withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite")
    bloomCols.foldLeft(writer) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
    }.parquet(path)
  }
}
