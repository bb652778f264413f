package graft.sink

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout — the co-located join machinery (SURVEY §2.4
  * note on pre-partitioned joins): writing both sides of a hot join
  * bucketed by the join key lets every subsequent join run with ZERO
  * exchanges — each task reads matching bucket files from both tables.
  * At 100 TB this converts the nightly fact-to-fact join from a
  * full-table shuffle (the single largest network event in a naive
  * plan) into an embarrassingly parallel local merge.
  *
  * Bucket pruning also applies: an equality predicate on the bucket key
  * scans 1/`buckets` of the files.
  *
  * Spark only honors bucket metadata through the catalog, so these are
  * `saveAsTable` externals (explicit `path`), not bare parquet dirs;
  * the bucket count must match on both sides of the join (or divide
  * evenly) for the exchange-free plan.
  */
object Bucketed {

  /** Write `df` as an external bucketed+sorted table. */
  def writeBucketed(
      df: DataFrame, tableName: String, path: String,
      bucketCol: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(tableName)
}
