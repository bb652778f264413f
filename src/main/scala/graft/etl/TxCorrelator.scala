package graft.etl

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.schema._

/** "transactions" mode stateful correlator (J1–J10,
  * /root/reference/src/transactions.rs:175-370,569-676): follows each
  * transaction's receipt DAG across blocks — consume-once receipt→tx
  * probes, data-receipt buffering by data_id, transitive closure over
  * newly produced receipt_ids — and emits a transaction exactly when its
  * pending-receipt set drains (J5).
  *
  * Architecture (SURVEY.md §7.4-2 option (a)): the correlation logic is
  * a pure function `processBlock(state, block) → (state', completed)`
  * run under ONE Structured Streaming key via flatMapGroupsWithState —
  * the operator is Spark's, the state store persists/recovers the
  * cache, and ordering is guaranteed by sorting each micro-batch by
  * height. A single key serializes ingest (the reference is equally
  * single-threaded here, src/main.rs:155-175); the heavy downstream
  * work — JSON fan-out to 5 tables — is distributed DataFrame code
  * (TxFanout). Scaling ingest beyond one core means an iterative-join
  * formulation; documented as the known divergence point, not built
  * until profiling demands it.
  */
object TxCorrelator {

  final case class BlockInfo(
      block_height: Long, block_hash: String, block_timestamp: Long)

  /** `ImprovedExecutionOutcome` (/root/reference/src/types.rs:15-38):
    * outcome enriched with the executing block's height/timestamp. The
    * reference also strips `metadata.gas_profile` — our schema never
    * carries gas profiles (dead-column elimination at the schema level,
    * SURVEY §4.1). */
  final case class ImprovedOutcome(
      block_hash: String, block_timestamp: Long, block_height: Long,
      id: String, outcome: ExecutionOutcomeView)

  final case class ImprovedOutcomeWithReceipt(
      execution_outcome: ImprovedOutcome, receipt: ReceiptView)

  final case class PendingTx(
      tx_block_height: Long, tx_block_hash: String, tx_block_timestamp: Long,
      blocks: Seq[BlockInfo],
      transaction: SignedTransactionView,
      execution_outcome: ImprovedOutcome,
      receipts: Seq[ImprovedOutcomeWithReceipt],
      data_receipts: Seq[ReceiptView],
      pending_receipt_ids: Seq[String])

  final case class CompletedTx(
      tx_block_height: Long, tx_block_hash: String, tx_block_timestamp: Long,
      blocks: Seq[BlockInfo],
      transaction: SignedTransactionView,
      execution_outcome: ImprovedOutcome,
      receipts: Seq[ImprovedOutcomeWithReceipt],
      data_receipts: Seq[ReceiptView],
      last_block_height: Long)

  /** `TxCache` (/root/reference/src/transactions.rs:569-575) + the
    * prev-hash chain cursor (J9). */
  final case class CacheState(
      receiptToTx: Map[String, String],
      dataReceipts: Map[String, ReceiptView],
      transactions: Map[String, PendingTx],
      lastBlockHeight: Long,
      prevBlockHash: Option[String])

  val emptyState: CacheState = CacheState(Map(), Map(), Map(), 0L, None)

  final class CorrelationException(msg: String) extends RuntimeException(msg)

  /** One block through the cache — pure, total when `strict=false`
    * (missing state → warn-and-skip, the reference's catch-up behavior
    * J8); `strict=true` reproduces the reference's panics. */
  def processBlock(
      state: CacheState, block: BlockWithTxHashes,
      lastDbBlockHeight: Long = -1L, strict: Boolean = true)
      : (CacheState, Seq[CompletedTx]) = {
    val hdr = block.block.header
    val h = hdr.height
    val info = BlockInfo(h, hdr.hash, hdr.timestamp_nanosec)

    // J9: prev-hash chain assert (transactions.rs:185-191)
    state.prevBlockHash.foreach { p =>
      if (p != hdr.prev_hash)
        throw new CorrelationException(
          s"Invalid prev_block_hash for block height $h: chain has $p, header says ${hdr.prev_hash}")
    }

    val skipMissing = h <= lastDbBlockHeight || !strict

    val receiptToTx = collection.mutable.Map.from(state.receiptToTx)
    val dataReceipts = collection.mutable.Map.from(state.dataReceipts)
    val transactions = collection.mutable.Map.from(state.transactions)
    val completed = collection.mutable.ArrayBuffer.empty[CompletedTx]

    def registerTx(tx: PendingTx, newReceiptIds: Seq[String]): Unit = {
      val txh = tx.transaction.hash
      newReceiptIds.foreach { rid =>
        receiptToTx.get(rid).foreach { old =>
          if (old != txh) throw new CorrelationException(
            s"Duplicate receipt_id $rid with different tx hashes $old vs $txh") // J6
        }
        receiptToTx(rid) = txh
      }
      transactions(txh) = tx
    }

    // pass 1: register chunk transactions (J1) + buffer data receipts (J4)
    for (shard <- block.shards; chunk <- shard.chunk) {
      for (t <- chunk.transactions) {
        val pending = t.outcome.outcome.receipt_ids
        registerTx(
          PendingTx(
            h, hdr.hash, hdr.timestamp_nanosec, Seq(info), t.transaction,
            ImprovedOutcome(t.outcome.block_hash, hdr.timestamp_nanosec, h,
              t.outcome.id, t.outcome.outcome),
            Nil, Nil, pending),
          pending)
      }
      for (r <- chunk.receipts; d <- r.data) {
        // J7: duplicate data_id allowed only when both are
        // promise-resume; the OLD receipt wins (transactions.rs:621-654)
        dataReceipts.get(d.data_id) match {
          case Some(old) if old.receipt_id != r.receipt_id =>
            val oldResume = old.data.exists(_.is_promise_resume)
            if (!(d.is_promise_resume && oldResume))
              throw new CorrelationException(
                s"Duplicate data_id ${d.data_id} with different receipt_ids and not promise_resume")
          // keep old
          case _ => dataReceipts(d.data_id) = r
        }
      }
    }

    // pass 2: resolve receipt execution outcomes (J2, J3, J5, J8)
    for (shard <- block.shards; o <- shard.receipt_execution_outcomes) {
      val rid = o.receipt.receipt_id
      receiptToTx.remove(rid) match {
        case None =>
          if (!skipMissing) throw new CorrelationException(
            s"Missing tx_hash for receipt_id $rid at block $h")
        case Some(txh) =>
          var tx = transactions.remove(txh).getOrElse(
            throw new CorrelationException(
              s"Missing transaction $txh for receipt $rid"))
          tx = tx.copy(
            pending_receipt_ids = tx.pending_receipt_ids.filterNot(_ == rid),
            blocks =
              if (tx.blocks.last.block_height != h) tx.blocks :+ info
              else tx.blocks)

          // J4: attach buffered data receipts for input_data_ids
          val inputIds = o.receipt.action.map(_.input_data_ids).getOrElse(Nil)
          val resolved = inputIds.map(d => d -> dataReceipts.remove(d))
          if (resolved.exists(_._2.isEmpty)) {
            if (!skipMissing) throw new CorrelationException(
              s"Missing data receipt for data_id ${resolved.find(_._2.isEmpty).get._1}")
            // abandon this tx's other receipts (transactions.rs:319-324)
            tx.pending_receipt_ids.foreach(receiptToTx.remove)
          } else {
            tx = tx.copy(data_receipts = tx.data_receipts ++ resolved.flatMap(_._2))
            val newPending = o.execution_outcome.outcome.receipt_ids
            tx = tx.copy(
              receipts = tx.receipts :+ ImprovedOutcomeWithReceipt(
                ImprovedOutcome(o.execution_outcome.block_hash,
                  hdr.timestamp_nanosec, h,
                  o.execution_outcome.id, o.execution_outcome.outcome),
                o.receipt),
              pending_receipt_ids = tx.pending_receipt_ids ++ newPending)
            if (tx.pending_receipt_ids.isEmpty)
              completed += CompletedTx(
                tx.tx_block_height, tx.tx_block_hash, tx.tx_block_timestamp,
                tx.blocks, tx.transaction, tx.execution_outcome,
                tx.receipts, tx.data_receipts,
                tx.blocks.last.block_height)
            else registerTx(tx, newPending)
          }
      }
    }

    (CacheState(receiptToTx.toMap, dataReceipts.toMap, transactions.toMap,
      h, Some(hdr.hash)), completed.toSeq)
  }

  implicit val completedEncoder: Encoder[CompletedTx] = Encoders.product[CompletedTx]
  private implicit val stateEncoder: Encoder[CacheState] = Encoders.product[CacheState]

  private def runOrdered(
      st0: CacheState, blocks: Iterator[BlockWithTxHashes], strict: Boolean)
      : (CacheState, Seq[CompletedTx]) = {
    // height order requires materializing the batch (a sort can't be
    // lazy); in-place sort + one growable output buffer keep it to one
    // copy of the batch. The batch-size bound is the SOURCE's contract:
    // maxFilesPerTrigger in readBlockStream caps blocks per micro-batch.
    val arr = blocks.to(collection.mutable.ArrayBuffer)
    arr.sortInPlaceBy(_.block.header.height)
    var st = st0
    val out = collection.mutable.ArrayBuffer.empty[CompletedTx]
    arr.foreach { b =>
      val (st2, c) = processBlock(st, b, strict = strict)
      st = st2
      out ++= c
    }
    (st, out.toSeq)
  }

  /** Batch correlation: blocks (any partitioning) → completed txs.
    * Funnels through one task — the correlator is inherently sequential
    * (see scaladoc above); everything downstream redistributes. */
  def correlateBatch(
      blocks: Dataset[BlockWithTxHashes], strict: Boolean = true)
      : Dataset[CompletedTx] = {
    import blocks.sparkSession.implicits._
    blocks
      .repartition(1)
      .sortWithinPartitions(col("block.header.height"))
      .mapPartitions { iter =>
        var st = emptyState
        iter.flatMap { b =>
          val (st2, c) = processBlock(st, b, strict = strict)
          st = st2
          c.iterator
        }
      }
  }

  /** Streaming correlation: keyed stateful operator; the cache lives in
    * the state store (checkpoint-recovered — replaces the reference's
    * 1000-block rewind S4). Micro-batches are sorted by height inside
    * the group; cross-batch order is the source's contract (S1).
    *
    * MEMORY CONTRACT: the single stateful task materializes each
    * micro-batch once to sort it (streaming forbids a plan-level sort
    * before a stateful operator). The batch size is therefore bounded at
    * the SOURCE — `readBlockStream(maxFilesPerTrigger = …)` caps blocks
    * per trigger (default 100; one block document per file). A backfill
    * of on-disk history should use [[graft.stream.BlockStream.runBackfill]]
    * (distributed, no single-task funnel) rather than raising the cap. */
  def correlateStream(
      blocks: Dataset[BlockWithTxHashes], strict: Boolean = false)
      : Dataset[CompletedTx] = {
    import blocks.sparkSession.implicits._
    blocks
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, iter: Iterator[BlockWithTxHashes], gs: GroupState[CacheState]) =>
          val (st2, out) = runOrdered(
            gs.getOption.getOrElse(emptyState), iter, strict)
          gs.update(st2)
          out.iterator
      }
  }
}
