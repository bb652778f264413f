package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.etl.TxCorrelator.CompletedTx

/** Distributed batch correlator — the 100 TB backfill path (SURVEY.md
  * §7.4-2 option (b)).
  *
  * The streaming correlator (TxCorrelator) mirrors the reference: one
  * sequential state machine, perfect for tailing a chain at ~1 block/s.
  * Backfilling years of history is a different shape: the whole block
  * range is already on disk, so receipt→tx resolution becomes label
  * propagation over the receipt DAG — seed every transaction's root
  * receipts with the tx hash, then BFS one join per DAG level (NEAR
  * receipt DAGs are shallow; the loop runs until a fixpoint). Every
  * step is an equi-join/aggregation Spark distributes freely — no
  * single-core bound, no state store.
  *
  * Completion matches the streaming semantics: a tx is emitted iff
  * every receipt reachable from it has an execution outcome in the
  * input range; frontier txs with unresolved receipts stay pending
  * (hand them to the streaming correlator from the cut point).
  */
object DistributedCorrelator {

  def correlate(blocks: DataFrame): Dataset[CompletedTx] =
    correlateWithCut(blocks)._1

  /** Backfill entry: completed txs plus the REPLAY CUT — the lowest block
    * height still contributing state to any incomplete tx: pending tx
    * registration heights and buffer heights of data receipts not yet
    * consumed by a completed tx. Re-running the streaming correlator
    * (lenient mode) over blocks >= cut rebuilds exactly the pending
    * frontier; completions re-emitted during the replay are collapsed by
    * the idempotent sink / sink cursor. maxHeight+1 when nothing is
    * pending (stream continues from fresh blocks only).
    */
  def correlateWithCut(blocks: DataFrame): (Dataset[CompletedTx], () => Long) = {
    val spark = blocks.sparkSession

    val shards = blocks.select(
      col("block.header.height").as("h"),
      col("block.header.hash").as("bh"),
      col("block.header.timestamp_nanosec").as("bt"),
      posexplode(col("shards")).as(Seq("sp", "shard")))

    // executed receipts, with their resolution-order sort key. The filter
    // excludes only DATA receipts (which never execute); receipts with
    // BOTH action and data null (GlobalContractDistribution) resolve like
    // action receipts — the streaming correlator (and the reference,
    // transactions.rs pass 2) iterates every execution outcome, so
    // filtering on action.isNotNull here would silently never complete a
    // tx whose DAG contains one.
    val outcomes = shards
      .select(
        col("h"), col("bh"), col("bt"), col("sp"),
        posexplode(col("shard.receipt_execution_outcomes")).as(Seq("p", "o")))
      .where(col("o.receipt.data").isNull)
      .select(
        col("h"), col("bh"), col("bt"), col("sp"), col("p"),
        col("o.receipt").as("receipt"),
        col("o.execution_outcome").as("eo"),
        col("o.receipt.receipt_id").as("receipt_id"))
      .persist()

    // transaction registrations (J1)
    val txSeed = shards
      .select(col("h"), col("bh"), col("bt"),
        explode(col("shard.chunk.transactions")).as("t"))
      .select(
        col("t.transaction.hash").as("tx_hash"),
        col("h").as("tx_block_height"),
        col("bh").as("tx_block_hash"),
        col("bt").as("tx_block_timestamp"),
        col("t.transaction").as("transaction"),
        struct(
          col("t.outcome.block_hash").as("block_hash"),
          col("bt").as("block_timestamp"),
          col("h").as("block_height"),
          col("t.outcome.id").as("id"),
          col("t.outcome.outcome").as("outcome")).as("execution_outcome"),
        col("t.outcome.outcome.receipt_ids").as("root_receipts"))
      .persist()

    // buffered data receipts (J4/J7: first occurrence by block order wins)
    val dataReceiptsH = {
      val raw = shards
        .select(col("h"), col("sp"),
          posexplode(col("shard.chunk.receipts")).as(Seq("p", "r")))
        .where(col("r.data").isNotNull)
        .select(col("r.data.data_id").as("data_id"), col("r").as("drv"),
          col("h"), col("sp"), col("p"))
      val w = Window.partitionBy("data_id").orderBy("h", "sp", "p")
      raw.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("data_id"), col("drv"), col("h").as("buffer_height"))
    }
    val dataReceipts = dataReceiptsH.select(col("data_id"), col("drv"))

    // ---- label propagation: receipt_id -> tx_hash ----
    val edges = outcomes.select(
      col("receipt_id").as("parent"),
      explode(col("eo.outcome.receipt_ids")).as("child"))
      .persist()

    // localCheckpoint (not persist) per BFS level: the mapping plan would
    // otherwise grow by one union+join per receipt-DAG level, and for a
    // deep backfill the optimizer re-analysis of that chain — not the
    // data — becomes the loop cost (same lineage rule as
    // Dedup.nearDupClusters).
    var mapping = txSeed.select(
      explode(col("root_receipts")).as("receipt_id"), col("tx_hash"))
      .localCheckpoint(true)
    var frontier = mapping
    var converged = false
    while (!converged) {
      val next = edges
        .join(frontier.withColumnRenamed("receipt_id", "parent"), "parent")
        .select(col("child").as("receipt_id"), col("tx_hash"))
        .join(mapping, Seq("receipt_id"), "left_anti")
        .localCheckpoint(true)
      if (next.isEmpty) converged = true
      else {
        mapping = mapping.unionByName(next).localCheckpoint(true)
        frontier = next
      }
    }

    // ---- completion: every mapped receipt resolved in-range (J5) ----
    val resolved = outcomes.join(mapping, "receipt_id")
    val mappedCount = mapping.groupBy("tx_hash")
      .agg(count(lit(1)).as("n_mapped"))
    val resolvedCount = resolved.groupBy("tx_hash")
      .agg(count(lit(1)).as("n_resolved"))
    val completeTx = mappedCount.join(resolvedCount, "tx_hash")
      .where(col("n_mapped") === col("n_resolved"))
      .select("tx_hash")

    // ---- assembly (A3): receipts in resolution order ----
    val receiptsAgg = resolved
      .join(completeTx, "tx_hash")
      .groupBy("tx_hash")
      .agg(
        sort_array(collect_list(struct(
          col("h"), col("sp"), col("p"),
          struct(
            struct(
              col("eo.block_hash").as("block_hash"),
              col("bt").as("block_timestamp"),
              col("h").as("block_height"),
              col("eo.id").as("id"),
              col("eo.outcome").as("outcome")).as("execution_outcome"),
            col("receipt").as("receipt")).as("v")))).as("rs"),
        sort_array(collect_set(struct(
          col("h").as("block_height"),
          col("bh").as("block_hash"),
          col("bt").as("block_timestamp")))).as("contrib_blocks"),
        max(col("h")).as("last_block_height"))
      .select(
        col("tx_hash"),
        expr("transform(rs, x -> x.v)").as("receipts"),
        col("contrib_blocks"),
        col("last_block_height"))

    // ---- data receipts per tx, in consuming-receipt order (J4) ----
    val consumedIds = resolved
      .join(completeTx, "tx_hash")
      .select(col("tx_hash"), col("h"), col("sp"), col("p"),
        posexplode(col("receipt.action.input_data_ids")).as(Seq("dp", "data_id")))
    val dataAgg = consumedIds
      .join(dataReceipts, "data_id")
      .groupBy("tx_hash")
      .agg(sort_array(collect_list(struct(
        col("h"), col("sp"), col("p"), col("dp"),
        col("drv").as("v")))).as("ds"))
      .select(col("tx_hash"), expr("transform(ds, x -> x.v)").as("data_receipts"))

    import TxCorrelator.completedEncoder
    val assembled = txSeed
      .join(receiptsAgg, "tx_hash")
      .join(dataAgg, Seq("tx_hash"), "left")
      .select(
        col("tx_block_height"), col("tx_block_hash"), col("tx_block_timestamp"),
        // blocks = registration block ∪ contributing blocks, by height
        // (streaming appends in resolution order = height order)
        sort_array(array_union(
          array(struct(
            col("tx_block_height").as("block_height"),
            col("tx_block_hash").as("block_hash"),
            col("tx_block_timestamp").as("block_timestamp"))),
          col("contrib_blocks"))).as("blocks"),
        col("transaction"),
        col("execution_outcome"),
        col("receipts"),
        coalesce(col("data_receipts"),
          array().cast(dataArrayType(blocks))).as("data_receipts"),
        col("last_block_height"))

    val cut = () => {
      // lowest height whose state the stream must rebuild
      val pendingMin = txSeed
        .join(completeTx, Seq("tx_hash"), "left_anti")
        .agg(min(col("tx_block_height"))).head()
      val unconsumedMin = dataReceiptsH
        .join(consumedIds.select("data_id").distinct(),
          Seq("data_id"), "left_anti")
        .agg(min(col("buffer_height"))).head()
      val mins = Seq(pendingMin, unconsumedMin)
        .filterNot(_.isNullAt(0)).map(_.getLong(0))
      if (mins.nonEmpty) mins.min
      else {
        val maxH = blocks.agg(max(col("block.header.height"))).head()
        if (maxH.isNullAt(0)) 0L // empty corpus: stream starts fresh
        else maxH.getLong(0) + 1L
      }
    }

    (assembled.as[CompletedTx](completedEncoder), cut)
  }

  private def dataArrayType(blocks: DataFrame) =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.Encoders.product[graft.schema.ReceiptView].schema)
}
