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
}
