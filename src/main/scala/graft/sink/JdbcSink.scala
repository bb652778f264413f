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

  /** Replay-idempotence dialect seam. The write shape is
    * pre-statement → batch insert; what the pre-statement must do
    * depends on the engine:
    *
    *  - [[AnsiDialect]] (default, what embedded Derby / Postgres /
    *    MySQL need): a synchronous `DELETE ... BETWEEN lo AND hi` so
    *    the re-insert rewrites exactly its own range.
    *  - [[ReplacingMergeTreeDialect]] (ClickHouse): NO pre-statement.
    *    The reference relies on the table engine itself — replayed rows
    *    are duplicate (sorting-key) entries that collapse at merge time
    *    (ReplacingMergeTree semantics; `/root/reference/README.md:33`'s
    *    DDL, `src/click.rs:50-85` inserts without ever deleting) — and
    *    reads go through `SELECT ... FINAL` or the dedup-on-read view,
    *    exactly like our parquet `Replacing.dedupView`. A synchronous
    *    DELETE on ClickHouse would be an ALTER-TABLE mutation: async,
    *    heavyweight, and wrong for a per-batch path.
    *
    * The seam keeps `replacingWrite` engine-agnostic without a
    * ClickHouse driver in the build (zero-egress container): the
    * dialect is data (an optional SQL string), so JdbcSinkSpec can pin
    * both behaviors against embedded Derby. */
  trait SinkDialect extends Serializable {
    /** Statement to run before re-inserting the [lo, hi] height range;
      * None when the engine collapses duplicates itself. */
    def preInsertSql(
        table: String, heightCol: String, lo: Long, hi: Long): Option[String]
  }

  /** Generic ANSI engines: delete the range, then re-insert. */
  object AnsiDialect extends SinkDialect {
    // Spark's JDBC writer quotes COLUMN names (case-preserved) but not
    // the table name — match that here
    override def preInsertSql(
        table: String, heightCol: String, lo: Long, hi: Long) =
      Some(s"""DELETE FROM $table WHERE "$heightCol" BETWEEN $lo AND $hi""")
  }

  /** ClickHouse ReplacingMergeTree: insert-only; duplicates collapse at
    * merge time and reads dedup (FINAL / view). */
  object ReplacingMergeTreeDialect extends SinkDialect {
    override def preInsertSql(
        table: String, heightCol: String, lo: Long, hi: Long) = None
  }

  def replacingWrite(
      df: DataFrame, url: String, table: String, heightCol: String,
      props: Properties = new Properties,
      dialect: SinkDialect = AnsiDialect): Unit = {
    val range = df.agg(
      min(col(heightCol)).as("lo"), max(col(heightCol)).as("hi")).head()
    if (range.isNullAt(0)) return
    val (lo, hi) = (range.getLong(0), range.getLong(1))
    Replacing.retry() {
      dialect.preInsertSql(table, heightCol, lo, hi).foreach { sql =>
        val conn = DriverManager.getConnection(url, props)
        try {
          val st = conn.createStatement()
          try st.executeUpdate(sql)
          finally st.close()
        } finally conn.close()
      }
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
