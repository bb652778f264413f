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

  test("GlobalContractDistribution receipt in a tx DAG completes on BOTH paths") {
    // a receipt with action AND data null (GlobalContractDistribution)
    // resolves like an action receipt in the streaming correlator; the
    // distributed path used to filter it out and silently never emit
    // the transaction. Hand-built 2-block chain: txg -> rg1 (action,
    // resolves in block 100 producing rg2) -> rg2 (both-null, resolves
    // in block 101).
    import graft.schema._
    import Blocks.encoder
    def hdr(h: Long) = BlockHeaderView(
      height = h, hash = s"g$h", prev_hash = s"g${h - 1}",
      prev_height = Some(h - 1),
      timestamp_nanosec = 1700000000000000000L + h,
      epoch_id = "e", chunks_included = 1L,
      signature = s"sig$h", latest_protocol_version = 73)
    val transfer = ActionView("TRANSFER", None, None, None, None,
      Some("1"), None, None, None, None)
    val rg1 = ReceiptView("alice.near", "app.near", "rg1",
      Some(ActionReceiptView("alice.near", "k", Nil, Seq(transfer),
        "0", is_promise_yield = false)), None)
    val gcd = ReceiptView("system", "bank.near", "rg2", None, None)
    def eo(id: String, bh: String, rids: Seq[String], st: ExecutionStatusView) =
      ExecutionOutcomeWithIdView(id, bh,
        ExecutionOutcomeView(rids, st, 1L, "0", Nil, "x"))
    val toReceipt = (r: String) => ExecutionStatusView(None, Some(r), None)
    val done = ExecutionStatusView(Some("e30="), None, None)

    val tx = SignedTransactionView("txg", "alice.near", "k", 1L,
      "app.near", Seq(transfer), "sig")
    val b100 = BlockWithTxHashes(
      BlockView("v.near", hdr(100)),
      Seq(ShardView(0L,
        Some(ChunkView(0L,
          Seq(IndexerTransactionWithOutcome(
            tx, eo("txg", "g100", Seq("rg1"), toReceipt("rg1")))),
          Seq(rg1))),
        Seq(ReceiptExecutionOutcome(Some("txg"), rg1,
          eo("rg1", "g100", Seq("rg2"), toReceipt("rg2")))))))
    val b101 = BlockWithTxHashes(
      BlockView("v.near", hdr(101)),
      Seq(ShardView(0L, None,
        Seq(ReceiptExecutionOutcome(Some("txg"), gcd,
          eo("rg2", "g101", Nil, done))))))

    val ds = spark.createDataset(Seq(b100, b101))(encoder)
    val seq = TxCorrelator.correlateBatch(ds).collect()
    val dist = DistributedCorrelator.correlate(ds.toDF()).collect()
    assert(seq.length === 1 && seq.head.transaction.hash === "txg")
    assert(dist.length === 1, "distributed path dropped the GCD-completed tx")
    assert(dist.head.last_block_height === seq.head.last_block_height)
    assert(dist.head.receipts.map(_.receipt.receipt_id) ===
      seq.head.receipts.map(_.receipt.receipt_id))
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
