package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TxCorrelator
import graft.etl.TxCorrelator._
import graft.schema._

/** Property tests (SURVEY.md §5.2-4): random receipt DAGs through the
  * correlator. Pure-core only — no Spark session needed.
  */
class CorrelatorPropertySpec extends AnyFunSuite {

  import PropertySampling.forAllSeeded

  import CorrelatorDagGen.{genTxPlan, mkBlocks}

  private def runAll(blocks: Seq[BlockWithTxHashes]) =
    blocks.foldLeft((emptyState, Seq.empty[CompletedTx])) {
      case ((st, acc), b) =>
        val (s, c) = TxCorrelator.processBlock(st, b)
        (s, acc ++ c)
    }

  test("every tx completes; receipts and cache drain; emission order respects DAG depth") {
    forAllSeeded(Gen.listOfN(8, genTxPlan)) { mks =>
      val plans = mks.zipWithIndex.map { case (mk, i) => mk(i) }
      // receipt ids are globally unique by construction (seeded)
      val blocks = mkBlocks(plans)
      val (state, completed) = runAll(blocks)
      assert(completed.map(_.transaction.hash).toSet ===
        plans.map(_.txHash).toSet)
      // cache fully drained
      assert(state.transactions.isEmpty)
      assert(state.receiptToTx.isEmpty)
      // per tx: emitted receipts == DAG nodes (receipt_txs invariant)
      completed.foreach { c =>
        val plan = plans.find(_.txHash == c.transaction.hash).get
        assert(c.receipts.map(_.receipt.receipt_id).toSet === plan.dag.keySet)
        // pending set drained exactly at the last contributing block
        assert(c.last_block_height ===
          100L + plan.dag.values.map(v => v._1).max + plan.startBlock)
        // signer always present in the account universe
        assert(c.transaction.signer_id === "signer.near")
      }
    }
  }

  test("prefix replay with catch-up tolerance is idempotent") {
    forAllSeeded(Gen.zip(Gen.listOfN(5, genTxPlan), Gen.choose(1, 3))) { case (mks, cut) =>
      val plans = mks.zipWithIndex.map { case (mk, i) => mk(i) }
      val blocks = mkBlocks(plans)
      val (_, once) = runAll(blocks)
      // process a prefix, then replay EVERYTHING in lenient catch-up
      // mode against a fresh cache (the reference's restart path)
      val cursor = 100L + math.min(cut, blocks.size - 1)
      val replayed = blocks.foldLeft((emptyState, Seq.empty[CompletedTx])) {
        case ((st, acc), b) =>
          val (s, c) = TxCorrelator.processBlock(
            st, b, lastDbBlockHeight = cursor, strict = false)
          (s, acc ++ c)
      }
      assert(replayed._2.map(_.transaction.hash).sorted ===
        once.map(_.transaction.hash).sorted)
    }
  }
}
