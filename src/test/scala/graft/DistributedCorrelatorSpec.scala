package graft

import org.apache.spark.sql.functions._
import graft.etl.{DistributedCorrelator, TxCorrelator}
import graft.fixtures.BlockFixtures
import graft.schema.Blocks

/** The distributed (iterative-join) correlator must agree with the
  * sequential streaming-semantics correlator on the same input. */
class DistributedCorrelatorSpec extends SparkSpec {

  test("distributed correlation equals sequential correlation") {
    import Blocks.encoder
    val ds = spark.createDataset(BlockFixtures.blocks(10))(encoder)
    val seq = TxCorrelator.correlateBatch(ds).collect()
      .map(c => c.transaction.hash -> c).toMap
    val dist = DistributedCorrelator.correlate(ds.toDF()).collect()
      .map(c => c.transaction.hash -> c).toMap

    assert(dist.keySet === seq.keySet)
    dist.foreach { case (h, d) =>
      val s = seq(h)
      assert(d.tx_block_height === s.tx_block_height, s"$h tx_block_height")
      assert(d.blocks === s.blocks, s"$h blocks")
      assert(d.last_block_height === s.last_block_height, s"$h last")
      assert(d.receipts.map(_.receipt.receipt_id) ===
        s.receipts.map(_.receipt.receipt_id), s"$h receipt order")
      assert(d.receipts.map(_.execution_outcome.block_height) ===
        s.receipts.map(_.execution_outcome.block_height), s"$h improved heights")
      assert(d.data_receipts === s.data_receipts, s"$h data receipts")
      assert(d.transaction === s.transaction, s"$h transaction view")
      assert(d.execution_outcome === s.execution_outcome, s"$h tx outcome")
    }
  }

  test("fan-out over the distributed correlator matches the sequential one") {
    import Blocks.encoder
    val ds = spark.createDataset(BlockFixtures.blocks(8))(encoder)
    val a = graft.etl.TxFanout.accountTxs(TxCorrelator.correlateBatch(ds))
      .orderBy("transaction_hash", "account_id").collect().toSeq
    val b = graft.etl.TxFanout.accountTxs(
      DistributedCorrelator.correlate(ds.toDF()))
      .orderBy("transaction_hash", "account_id").collect().toSeq
    assert(a === b)
  }
}
