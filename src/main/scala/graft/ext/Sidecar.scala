package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The tombstone-sidecar discipline shared by all three persisted
  * index families (minhash, IVF, sign-LSH band): a LOGICAL delete
  * appends ids to `dir/tombstones` (no index file touched), readers
  * anti-join the sidecar, and a family-specific compactor later
  * rewrites the affected partitions physically and clears the sidecar
  * LAST (it is the done-marker — an interrupted compact re-runs in
  * full, and each partition rewrite is idempotent). Three families
  * previously carried three verbatim copies of this; a fix applied to
  * one (the IVF resurrection path) missed the others — hence the
  * single shared implementation. */
private[ext] object Sidecar {

  /** Append `ids` (cast to the layout's long id contract, distinct)
    * to the sidecar. */
  def append(dir: String, tombstones: DataFrame, idCol: String): Unit =
    tombstones.select(col(idCol).cast("long").as("id")).distinct()
      .write.mode("append").parquet(s"$dir/tombstones")

  /** The sidecar's distinct id set, if one exists. */
  def read(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = java.nio.file.Paths.get(dir, "tombstones")
    if (java.nio.file.Files.isDirectory(p))
      Some(spark.read.parquet(p.toString).select(col("id")).distinct())
    else None
  }

  /** Serve `df` minus the sidecar (broadcast anti-join) — the logical
    * delete, visible before any compaction. */
  def applyTo(spark: SparkSession, dir: String, df: DataFrame): DataFrame =
    read(spark, dir).fold(df)(t =>
      df.join(broadcast(t), Seq("id"), "left_anti"))

  /** Remove `ids` from the sidecar (the resurrection path: a deleted
    * id re-ingested must drop off the tombstone list once its stale
    * rows are scrubbed). Tiny table — full crash-completable rewrite. */
  def remove(spark: SparkSession, dir: String, ids: DataFrame): Unit =
    graft.util.Fs.rewriteSwap(
      spark, java.nio.file.Paths.get(dir, "tombstones"))(
      _.join(broadcast(ids.select(col("id"))), Seq("id"), "left_anti"))

  /** Clear the sidecar — the compactor's final step. */
  def clear(dir: String): Unit =
    graft.util.Fs.deleteRecursively(
      java.nio.file.Paths.get(dir, "tombstones"))
}
