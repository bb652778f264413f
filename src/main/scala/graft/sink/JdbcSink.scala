package graft.sink

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** JDBC sink with ReplacingMergeTree-style replay semantics (the
  * BASELINE.json north-star "Structured Streaming + JDBC sink"; insert
  * machinery mirrors /root/reference/src/click.rs:50-85 — buffered
  * batch insert, retry with exponential backoff, idempotent replay).
  *
  * Idempotence: each batch covers a contiguous height range; the write
  * deletes that range then appends inside [[Replacing.retry]] — a
  * replayed batch rewrites exactly its own rows, like the reference's
  * ReplacingMergeTree collapse, but synchronous. Use from
  * `foreachBatch`:
  * {{{
  * .foreachBatch { (df, _) =>
  *   JdbcSink.replacingWrite(df, url, "account_txs", "tx_block_height")
  * }
  * }}}
  * Only scalar-typed tables go over JDBC (the 5 explorer tables are
  * all-scalar by design); the array-typed actions/events tables stay on
  * parquet.
  */
object JdbcSink {

  def replacingWrite(
      df: DataFrame, url: String, table: String, heightCol: String,
      props: Properties = new Properties): Unit = {
    val range = df.agg(
      min(col(heightCol)).as("lo"), max(col(heightCol)).as("hi")).head()
    if (range.isNullAt(0)) return
    val (lo, hi) = (range.getLong(0), range.getLong(1))
    Replacing.retry() {
      val conn = DriverManager.getConnection(url, props)
      try {
        val st = conn.createStatement()
        // Spark's JDBC writer quotes COLUMN names (case-preserved) but
        // not the table name — match that here
        try st.executeUpdate(
          s"""DELETE FROM $table WHERE "$heightCol" BETWEEN $lo AND $hi""")
        finally st.close()
      } finally conn.close()
      df.write.mode(SaveMode.Append).jdbc(url, table, props)
    }
  }

  /** Resume cursor against the JDBC sink — the reference's
    * `SELECT max(block_height) FROM t` (/root/reference/src/click.rs:27-34). */
  def cursor(
      url: String, table: String, heightCol: String,
      props: Properties = new Properties): Long = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          s"""SELECT MAX("$heightCol") FROM $table""")
        if (rs.next() && rs.getObject(1) != null) rs.getLong(1) else -1L
      } finally st.close()
    } catch { case _: java.sql.SQLException => -1L }
    finally conn.close()
  }
}
