package graft

import org.scalacheck.Gen
import graft.schema._

/** Shared random receipt-DAG generator for the correlator specs
  * (CorrelatorPropertySpec's pure-core properties and
  * TwsCorrelatorSpec's streaming-operator equivalence). */
object CorrelatorDagGen {

  /** One synthetic tx: a chain/tree of receipts spread over consecutive
    * blocks starting at `startBlock`; returns per-block receipt
    * executions. */
  final case class TxPlan(
      txHash: String,
      startBlock: Int,
      // receipt id -> (execution block offset, children ids, DAG level)
      dag: Map[String, (Int, Seq[String], Int)],
      root: String)

  val genTxPlan: Gen[Int => TxPlan] = for {
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

  def mkBlocks(plans: Seq[TxPlan]): Seq[BlockWithTxHashes] = {
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
}
