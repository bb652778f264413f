package graft

import org.apache.spark.sql.functions._
import graft.etl.{TxCorrelator, TxFanout}
import graft.fixtures.BlockFixtures
import graft.schema.Blocks
import graft.sink.JdbcSink

/** JDBC sink against embedded Derby: append path, replay idempotence,
  * sink-derived cursor (the north-star "Structured Streaming + JDBC
  * sink" wiring, exercised end-to-end minus the network). */
class JdbcSinkSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("replacingWrite is idempotent under replay; cursor resumes") {
    import Blocks.encoder
    val ds = spark.createDataset(BlockFixtures.blocks(6))(encoder)
    val acct = TxFanout.accountTxs(TxCorrelator.correlateBatch(ds)).cache()
    val n = acct.count()

    // first write creates the table via Spark's JDBC writer (VARCHAR
    // override — Derby's default string mapping is CLOB, which can't
    // even be equality-compared)
    acct.write.mode("overwrite")
      .option("createTableColumnTypes",
        "account_id VARCHAR(128), transaction_hash VARCHAR(128), " +
          "signer_id VARCHAR(128)")
      .jdbc(url, "account_txs", new java.util.Properties)
    // replay the same batch through the replacing write — no dupes
    JdbcSink.replacingWrite(acct, url, "account_txs", "tx_block_height")
    JdbcSink.replacingWrite(acct, url, "account_txs", "tx_block_height")

    val back = spark.read.jdbc(url, "account_txs", new java.util.Properties)
    assert(back.count() === n)
    // content round-trips
    assert(back.where(col("transaction_hash") === "tx100")
      .count() === acct.where(col("transaction_hash") === "tx100").count())

    // cursor = max height present
    val maxH = acct.agg(max("tx_block_height")).head().getLong(0)
    assert(JdbcSink.cursor(url, "account_txs", "tx_block_height") === maxH)
    // missing table → -1
    assert(JdbcSink.cursor(url, "nope", "tx_block_height") === -1L)

    // partial replay of a sub-range only rewrites that range
    val sub = acct.where(col("tx_block_height") === 100L)
    JdbcSink.replacingWrite(sub, url, "account_txs", "tx_block_height")
    assert(spark.read.jdbc(url, "account_txs", new java.util.Properties)
      .count() === n)
  }

  test("dialect seam: ReplacingMergeTree dialect is insert-only") {
    import Blocks.encoder
    val ds = spark.createDataset(BlockFixtures.blocks(4))(encoder)
    val acct = TxFanout.accountTxs(TxCorrelator.correlateBatch(ds)).cache()
    val n = acct.count()
    acct.write.mode("overwrite")
      .option("createTableColumnTypes",
        "account_id VARCHAR(128), transaction_hash VARCHAR(128), " +
          "signer_id VARCHAR(128)")
      .jdbc(url, "acct_ch", new java.util.Properties)
    // a ClickHouse-shaped engine dedups at merge time, so the dialect
    // must issue NO delete: a replay through it appends duplicates
    // (collapsed later by the engine / read-side FINAL — our parquet
    // analog is Replacing.dedupView)
    JdbcSink.replacingWrite(acct, url, "acct_ch", "tx_block_height",
      dialect = JdbcSink.ReplacingMergeTreeDialect)
    val back = spark.read.jdbc(url, "acct_ch", new java.util.Properties)
    assert(back.count() === 2 * n) // Derby kept both copies: no DELETE ran
    // the dedup-on-read discipline those engines pair with insert-only
    // writes recovers the exact row set
    assert(back.distinct().count() === n)
    // the ANSI dialect on the same table deletes its range first
    JdbcSink.replacingWrite(acct, url, "acct_ch", "tx_block_height")
    assert(spark.read.jdbc(url, "acct_ch", new java.util.Properties)
      .count() === n)
  }
}
