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

  /** One synthetic tx: a chain/tree of receipts spread over consecutive
    * blocks starting at `startBlock`; returns per-block receipt
    * executions. */
  private case class TxPlan(
      txHash: String,
      startBlock: Int,
      // receipt id -> (execution block offset, children ids, DAG level)
      dag: Map[String, (Int, Seq[String], Int)],
      root: String)

  private val genTxPlan: Gen[Int => TxPlan] = for {
    depth <- Gen.choose(1, 4)
    fanout <- Gen.choose(1, 2)
    spread <- Gen.choose(0, 2)
  } yield { (seed: Int) =>
    val tx = s"tx$seed"
    def build(
        id: String, level: Int, off: Int): Map[String, (Int, Seq[String], Int)] = {
      val children =
        if (level >= depth) Nil
        else (0 until fanout).map(i => s"$id-c$i")
      val childMaps = children.zipWithIndex.flatMap { case (c, i) =>
        build(c, level + 1, off + (if (spread > 0) 1 else 0) + i % (spread + 1))
      }
      childMaps.toMap + (id -> (off, children, level))
    }
    TxPlan(tx, seed % 3, build(s"r$seed", 0, 0), s"r$seed")
  }

  private def mkBlocks(plans: Seq[TxPlan]): Seq[BlockWithTxHashes] = {
    val maxBlock = plans.flatMap(p =>
      p.dag.values.map(v => v._1 + p.startBlock)).maxOption.getOrElse(0) + 1
    (0 until maxBlock + 1).map { h =>
      val height = 100L + h
      // txs registered at their start block
      val txs = plans.filter(_.startBlock == h).map { p =>
        IndexerTransactionWithOutcome(
          SignedTransactionView(p.txHash, "signer.near", "k", 1L,
            "recv.near", Nil, "sig"),
          ExecutionOutcomeWithIdView(p.txHash, s"blk$h",
            ExecutionOutcomeView(Seq(p.root),
              ExecutionStatusView(None, Some(p.root), None),
              1L, "0", Nil, "recv.near")))
      }
      // receipts executing at this block, parent before child when
      // they share a block (execution order, as on the real chain)
      val outcomes = plans.flatMap { p =>
        p.dag.toSeq
          .filter { case (_, (off, _, _)) => p.startBlock + off == h }
          .sortBy { case (rid, (_, _, level)) => (level, rid) }
          .map { case (rid, (_, children, _)) =>
            ReceiptExecutionOutcome(
              Some(p.txHash),
              ReceiptView("pred.near", "recv.near", rid,
                Some(ActionReceiptView("signer.near", "k", Nil, Nil,
                  "0", is_promise_yield = false)), None),
              ExecutionOutcomeWithIdView(rid, s"blk$h",
                ExecutionOutcomeView(children,
                  ExecutionStatusView(Some("IjQyIg=="), None, None),
                  1L, "0", Nil, "recv.near")))
          }
      }
      BlockWithTxHashes(
        BlockView("author.near",
          BlockHeaderView(height, s"blk$h", s"blk${h - 1}",
            Some(height - 1), height * 1000L, "e", 1L, "s", 73)),
        Seq(ShardView(0L,
          Some(ChunkView(0L, txs, Nil)).filter(_ => txs.nonEmpty),
          outcomes)))
    }
  }

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
