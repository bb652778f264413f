package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Manifest

/** The tombstone-sidecar discipline shared by all persisted index
  * families (minhash, IVF, IVF-PQ, sign-LSH band): a LOGICAL delete
  * appends ids to the index's `tombstones` table (no index file
  * touched), readers anti-join the sidecar, and a family-specific
  * compactor later rewrites the affected partitions physically and
  * retires the sidecar IN THE SAME [[graft.util.Manifest]] flip that
  * publishes the compacted tables — "compacted" and "sidecar cleared"
  * are one atomic transition, and an interrupted compact re-runs in
  * full (the old manifest still lists the sidecar). Three families
  * previously carried three verbatim copies of this; a fix applied to
  * one (the IVF resurrection path) missed the others — hence the
  * single shared implementation. All resolution goes through the
  * manifest (legacy plain-dir layouts read unchanged), and the first
  * read of a root sweeps any stranded pre-manifest rewrite residue
  * ([[graft.util.Fs.sweepSwapResidue]]). */
private[ext] object Sidecar {

  /** Append `ids` (cast to the layout's long id contract, distinct)
    * to the sidecar — creating it (and its manifest entry, on
    * manifest roots) if absent. Append-in-place is reader-safe:
    * parquet files land whole, and a reader's listing sees either
    * snapshot of an append-only table. */
  def append(dir: String, tombstones: DataFrame, idCol: String): Unit = {
    val root = java.nio.file.Paths.get(dir)
    val ids = tombstones.select(col(idCol).cast("long").as("id")).distinct()
    Manifest.resolve(root, "tombstones") match {
      case Some(p) => ids.write.mode("append").parquet(p.toString)
      case None if Manifest.read(root).isDefined =>
        // manifest root without a sidecar yet: write the table first,
        // then commit its entry with one flip (a crash in between
        // leaves an orphan the next publish GCs — the delete is only
        // durable once the flip lands, same as any other publish)
        val name = Manifest.nextVersion(root, "tombstones")
        ids.write.mode("overwrite").parquet(root.resolve(name).toString)
        Manifest.flip(root, Manifest.entries(root) + ("tombstones" -> name))
      case None =>
        ids.write.mode("append")
          .parquet(root.resolve("tombstones").toString)
    }
  }

  /** The sidecar's distinct id set, if one exists — resolved from the
    * caller's manifest SNAPSHOT, so the sidecar epoch always matches
    * the data tables the caller resolved from the same snapshot (a
    * fresh read here could straddle a compaction's flip and pair old
    * data with the already-retired sidecar, resurrecting deleted
    * rows). Mounts the one-shot legacy-residue sweep: this is the
    * shared open path every family's reader passes through. */
  def read(spark: SparkSession, snap: Manifest.Snapshot)
      : Option[DataFrame] = {
    if (snap.mapping.isEmpty) graft.util.Fs.sweepSwapResidue(snap.root)
    snap.resolve("tombstones")
      .filter(java.nio.file.Files.isDirectory(_))
      .map(p => spark.read.parquet(p.toString).select(col("id")).distinct())
  }

  def read(spark: SparkSession, dir: String): Option[DataFrame] =
    read(spark, Manifest.snapshot(dir))

  /** Serve `df` minus the sidecar (broadcast anti-join) — the logical
    * delete, visible before any compaction. */
  def applyTo(
      spark: SparkSession, snap: Manifest.Snapshot, df: DataFrame)
      : DataFrame =
    read(spark, snap).fold(df)(t =>
      df.join(broadcast(t), Seq("id"), "left_anti"))

  def applyTo(spark: SparkSession, dir: String, df: DataFrame): DataFrame =
    applyTo(spark, Manifest.snapshot(dir), df)

  /** The tombstones [[Manifest.TableRewrite]] removing `ids` — the
    * ONLY mutation shape besides [[append]]: scrub paths retire
    * resurrected ids IN THE SAME flip as their partition rewrites,
    * and compactors clear the sidecar by passing
    * `drop = Seq("tombstones")` to their own publish. (Standalone
    * remove/clear entry points were deliberately dropped: a second
    * publish path would split one atomic transition into two flips —
    * the mixed-state window this layer exists to close.) */
  def removeRewrite(ids: DataFrame): Manifest.TableRewrite =
    Manifest.TableRewrite("tombstones", None,
      _.join(broadcast(ids.select(col("id"))), Seq("id"), "left_anti"))
}
