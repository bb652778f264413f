package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ReplacingMergeTree semantics over parquet (SURVEY.md §4.2): all 8
  * reference tables use `ENGINE = ReplacingMergeTree` — duplicate rows
  * with the same ORDER BY key collapse asynchronously, giving
  * idempotent at-least-once ingest (README.md:176,218,237,...).
  *
  * Parquet has no storage-level analog, so the engine provides the two
  * halves explicitly:
  *  - write path: [[idempotentWrite]] — dynamic partition overwrite of
  *    block-height buckets. Replaying any block range rewrites exactly
  *    the buckets it covers; at 1000-executor scale each bucket is an
  *    independent file set, no global coordination.
  *  - read path: [[dedupView]] — `row_number() OVER (PARTITION BY key
  *    ORDER BY version DESC) = 1`, the standard dedup-on-read view for
  *    data that may carry duplicates anyway.
  *
  * Write layout doubles as the index machinery (§4.2): rows sorted by
  * the table's ORDER BY key within buckets → parquet row-group min/max
  * stats serve range scans (ClickHouse minmax idx); per-column bloom
  * filters serve point lookups (bloom_filter idx).
  */
object Replacing {

  /** Height-bucket column: 1 bucket = `step` consecutive blocks. */
  def heightBucket(heightCol: String, step: Long = 1000L) =
    (col(heightCol) - (col(heightCol) % step)).as("height_bucket")

  private def layoutWriter(
      df: DataFrame, heightCol: String, orderKey: Seq[String],
      bloomCols: Seq[String], step: Long, mode: SaveMode) = {
    val writer = df
      .withColumn("height_bucket", heightBucket(heightCol, step))
      .repartition(col("height_bucket"))
      .sortWithinPartitions(orderKey.map(col): _*)
      .write
      .mode(mode)
      .partitionBy("height_bucket")
    bloomCols.foldLeft(writer) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
    }
  }

  /** Batch-backfill write: partition dirs by height bucket, rows sorted
    * by `orderKey` within files, bloom filters on `bloomCols`.
    * `SaveMode.Overwrite` + dynamic partitionOverwriteMode replaces
    * only the buckets present in `df` — idempotent ONLY when `df`
    * covers every block of every bucket it touches (a backfill of
    * complete ranges). Streaming micro-batches must use [[appendWrite]]
    * instead: overwriting would clobber earlier batches sharing a
    * bucket. */
  def idempotentWrite(
      df: DataFrame, path: String, heightCol: String,
      orderKey: Seq[String], bloomCols: Seq[String] = Nil,
      step: Long = 1000L): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try layoutWriter(df, heightCol, orderKey, bloomCols, step,
      SaveMode.Overwrite).parquet(path)
    finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  /** Streaming micro-batch write: same layout, `SaveMode.Append`.
    * At-least-once — crash-replays can duplicate rows, which is exactly
    * the ReplacingMergeTree insert contract; [[dedupView]] is the
    * collapse. The sink cursor filter upstream keeps duplication to
    * crash windows only. */
  def appendWrite(
      df: DataFrame, path: String, heightCol: String,
      orderKey: Seq[String], bloomCols: Seq[String] = Nil,
      step: Long = 1000L): Unit =
    layoutWriter(df, heightCol, orderKey, bloomCols, step, SaveMode.Append)
      .parquet(path)

  /** Dedup-on-read view: latest row (by `versionCol` descending, or
    * arbitrary-but-deterministic when absent) per ORDER BY key. */
  def dedupView(
      df: DataFrame, orderKey: Seq[String],
      versionCol: Option[String] = None): DataFrame = {
    val w = Window.partitionBy(orderKey.map(col): _*)
      .orderBy(versionCol.map(col(_).desc)
        .getOrElse(monotonically_increasing_id().asc))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Simple dedup for exact-duplicate rows (all columns equal). */
  def dropExactDuplicates(df: DataFrame, orderKey: Seq[String]): DataFrame =
    df.dropDuplicates(orderKey)

  /** The background MERGE — the half of ReplacingMergeTree that
    * [[dedupView]] defers: physically collapse duplicate ORDER-BY keys
    * and compact the small files streaming appends accumulate
    * (ClickHouse runs this as its background merge; an open-table
    * format calls it OPTIMIZE). Per height bucket: read, collapse via
    * the same [[dedupView]] policy, rewrite sorted. Buckets are
    * independent file sets, so `buckets` can scope the merge to the
    * recently-appended range — at 100 TB the nightly merge touches the
    * hot tail, never the whole table — and each bucket's rewrite is a
    * dynamic-partition overwrite (crash before commit leaves the old
    * files in place).
    *
    * Reads after a merge see exactly what [[dedupView]] showed before
    * it (MergeSpec pins this), so the view stays the read contract and
    * the merge is purely a storage optimization. */
  def merge(
      spark: org.apache.spark.sql.SparkSession, path: String,
      orderKey: Seq[String], versionCol: Option[String] = None,
      buckets: Option[Seq[Long]] = None): Unit = {
    val table = spark.read.parquet(path)
    val scoped = buckets match {
      case Some(bs) => table.where(col("height_bucket").isin(bs: _*))
      case None => table
    }
    val collapsed = dedupView(scoped, orderKey, versionCol)
      .repartition(col("height_bucket"))
      .sortWithinPartitions(orderKey.map(col): _*)
    // Spark refuses to overwrite a path it is reading, so the merge
    // writes to a sibling temp dir and swaps bucket dirs by FS rename —
    // per-bucket near-atomic, and a crash mid-merge leaves every bucket
    // either fully old or fully new.
    val tmpPath = s"${path.stripSuffix("/")}__merge_tmp"
    collapsed.write.mode(SaveMode.Overwrite)
      .partitionBy("height_bucket").parquet(tmpPath)
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged = fs.listStatus(new org.apache.hadoop.fs.Path(tmpPath))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("height_bucket="))
    merged.foreach { st =>
      val target = new org.apache.hadoop.fs.Path(hPath, st.getPath.getName)
      fs.delete(target, true)
      fs.rename(st.getPath, target)
    }
    fs.delete(new org.apache.hadoop.fs.Path(tmpPath), true)
  }

  /** TTL retention (ClickHouse `TTL ... DELETE` at part granularity):
    * drop every height bucket strictly below `keepFromBucket`. Because
    * the layout partitions by `height_bucket=` directories, expiry is a
    * METADATA operation — directory deletes, never a rewrite of
    * surviving data — which is the only retention mechanism that holds
    * at 100 TB (a `DELETE WHERE` rewrite of a petabyte table does not).
    * Buckets are independent file sets, so a crash mid-drop leaves each
    * bucket either fully present or fully gone; re-running converges.
    * Returns the bucket values dropped. */
  def dropBucketsBelow(
      spark: org.apache.spark.sql.SparkSession, path: String,
      keepFromBucket: Long): Seq[Long] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) return Nil
    val expired = fs.listStatus(hPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("height_bucket="))
      .flatMap { s =>
        val v = s.getPath.getName.stripPrefix("height_bucket=")
        scala.util.Try(v.toLong).toOption.filter(_ < keepFromBucket)
          .map(b => (b, s.getPath))
      }
      .sortBy(_._1)
    // report only buckets the filesystem actually deleted — a false
    // return (permission/lock) must not be recorded as expired
    expired.filter { case (_, p) => fs.delete(p, true) }.map(_._1)
  }

  /** K1: sink-side retry with exponential backoff
    * (/root/reference/src/click.rs:50-85: 10 tries, 100 ms ×2). */
  def retry[T](
      tries: Int = 10, firstDelayMs: Long = 100L)(f: => T): T = {
    var attempt = 0
    var delay = firstDelayMs
    while (true) {
      try return f
      catch {
        case e: Throwable =>
          attempt += 1
          if (attempt >= tries) throw e
          Thread.sleep(delay)
          delay *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
