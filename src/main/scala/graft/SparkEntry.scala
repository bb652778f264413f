package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.query.{EventQueries, Q, RelationalQueries, Tables}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each pack contributes `Q`s (Spark plan + optional DuckDB oracle SQL);
  * this object flattens them into the driver's two maps.
  */
object SparkEntry {

  def packs: Seq[Q] =
    RelationalQueries.all ++
      EventQueries.all ++
      graft.query.TimeSeriesQueries.all ++
      graft.query.StatQueries.all ++
      graft.ext.DedupQueries.all ++
      graft.ext.SimilarityQueries.all ++
      graft.ext.MultimodalQueries.all ++
      graft.ext.TextQueries.all ++
      graft.ext.ClassifierQueries.all ++
      graft.etl.PipelineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q2_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    *
    * Timestamp portability note: the Spark side keeps the engine
    * contract `events.ts` = Long epoch NANOS ([[graft.query.Tables
    * .load]] derives it when the fixture ships a native µs timestamp);
    * the ORACLES are authored against DuckDB's native reading of the
    * same parquet (`epoch_us(ts)`), which is identical for both
    * physical encodings (TIMESTAMP_NS truncates to µs exactly where
    * the Spark side's `ts div 1000` does). */
  def oracleSql: Map[String, String] =
    packs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
