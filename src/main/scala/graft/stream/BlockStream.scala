package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.etl.{ActionsExtract, TxCorrelator, TxFanout}
import graft.schema.{Blocks, BlockWithTxHashes}
import graft.sink.Replacing

/** Structured Streaming wrapper (SURVEY.md §2.1–2.2, §2.9): the
  * reference's fetcher/channel/commit machinery re-expressed as a
  * file-based block stream + `foreachBatch` idempotent sinks.
  *
  * Mapping:
  *  - S1 ordered fetcher + bounded channel(100) → `readStream.json`
  *    with `maxFilesPerTrigger` backpressure; height order enforced by
  *    sorting inside each micro-batch (+ the correlator's chain check
  *    across batches).
  *  - S3 resume cursor (`SELECT max(block_height)`) → streaming
  *    checkpoint; the sink-derived cursor is kept as the repair path:
  *    [[sinkCursor]] + the skip filter in each batch.
  *  - S4 1000-block rewind → unnecessary (state store recovers from
  *    checkpoint); replays are harmless because writes are idempotent
  *    per height bucket (K1/A5 → Replacing.idempotentWrite).
  *  - K2 commit cadence → trigger choice (AvailableNow drains a
  *    backlog; ProcessingTime for tailing).
  *  - K3 async commit pipeline (≤3 in flight) → concurrent per-table
  *    writes inside one foreachBatch under a bounded pool
  *    (MAX_COMMIT_HANDLERS = 3 parity); the batch boundary itself
  *    commits synchronously so the checkpoint contract is unchanged.
  *  - K5 multi-table fan-out → one cached batch, N writes.
  */
object BlockStream {

  /** Production state-store defaults for the correlator wire — the
    * r11 probe (BASELINE.md round-11 state table) showed the DEFAULT
    * conf pays 1,105 MB of checkpoint at 100× volume for ~25 KB of
    * live state, and attributed every part to a specific default:
    *
    *  - `minBatchesToRetain = 100` keeps 100 full state versions —
    *    retention, not state, dominated the 1.1 GB. 2 is the floor
    *    that still allows one-batch replay after a crash (the offset/
    *    commit log pair the restart reads).
    *  - RocksDB CHANGELOG checkpointing uploads per-batch deltas
    *    instead of full SST snapshots — per-batch commit cost tracks
    *    the batch's writes, not the store size (snapshots still happen,
    *    in the background at `minDeltasForSnapshot` cadence).
    *  - `shuffle.partitions = 8` for the stream's session: the
    *    correlator keys by a single constant (ordered processing), so
    *    31 of 32 stores were PERMANENTLY EMPTY yet each paid per-batch
    *    snapshot/commit overhead. 8 keeps headroom for the foreachBatch
    *    fan-out joins without 3/4 of the stores being dead weight.
    *    (Pinned per NEW checkpoint only — on resume Spark repins the
    *    value recorded in the checkpoint's own offset log.)
    *
    * Applied by [[runTransactionsPipeline]] to a cloned session; the
    * r12 re-probe (BASELINE.md round-12 table) measured checkpoint
    * 20.6 → 2.8 MB at 10× and 1,104 → 82.9 MB at 100× (state-size
    * order, not retention order), median latency 24.1 → 20.9 s at
    * 100×, identical completed-tx counts.
    *
    * The map itself lives on [[graft.etl.TxCorrelator]] (round 13):
    * the pack's bounded vehicle `correlateBatchTws` must run the SAME
    * conf as this wire, and etl must not depend back on stream. */
  val ProductionStateConf: Map[String, String] =
    TxCorrelator.ProductionStateConf

  /** Block stream with corrupt-record capture: malformed JSON lands in
    * `_corrupt_record` (PERMISSIVE would otherwise admit an all-null
    * block row silently and the extract would just drop it — an
    * ingestion bug you'd never see). Pipelines quarantine those rows. */
  def readBlockStream(
      spark: SparkSession, inDir: String,
      maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .schema(Blocks.schema.add("_corrupt_record",
        org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(inDir)

  /** Block stream over the NATIVE height-offset source ([[BlocksSource]])
    * instead of the file stream: offsets ARE block heights (resume /
    * rewind = height arithmetic, the reference's cursor), ranges fetch in
    * parallel, `maxBlocksPerTrigger` is real admission control. Emits the
    * same shape as [[readBlockStream]] (parsed block + `_corrupt_record`),
    * so every pipeline accepts either interchangeably. `fetcher=dir`
    * replays a document directory; `fetcher=http` tails a neardata-style
    * endpoint (pass `url`). */
  def readBlockSource(
      spark: SparkSession, pathOrUrl: String,
      fetcher: String = "dir", startHeight: Long = 0L,
      maxBlocksPerTrigger: Long = 1000L, numPartitions: Int = 8): DataFrame = {
    val parseSchema = Blocks.schema.add("_corrupt_record",
      org.apache.spark.sql.types.StringType)
    spark.readStream.format("graft-blocks")
      .option(if (fetcher == "http") "url" else "path", pathOrUrl)
      .option("fetcher", fetcher)
      .option("startHeight", startHeight)
      .option("maxBlocksPerTrigger", maxBlocksPerTrigger)
      .option("numPartitions", numPartitions)
      .load()
      .select(from_json(
        col("value"), parseSchema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")).as("b"))
      .select(col("b.*"))
  }

  /** Split a micro-batch into (good blocks, quarantine rows) and append
    * the quarantine (raw line + arrival batch) for forensics. With
    * `skipCommit` the quarantine append is suppressed like every other
    * write (the bad rows still get filtered out). */
  def quarantine(
      batch: DataFrame, outDir: String,
      skipCommit: Boolean = false): DataFrame = {
    val bad = batch.where(
      col("_corrupt_record").isNotNull || col("block").isNull)
    if (!skipCommit && !bad.isEmpty)
      bad.select(
        col("_corrupt_record").as("raw"),
        col("block.header.height").as("claimed_height"))
        .write.mode("append").json(s"$outDir/_quarantine")
    batch.where(col("_corrupt_record").isNull && col("block").isNotNull)
      .drop("_corrupt_record")
  }

  /** Dry-run seam — the reference's skip-commit debugging mode
    * (`/root/reference/src/click.rs:63`, `README.md:105`: run the full
    * pipeline, commit nothing). The WHOLE transform still executes —
    * extract, correlate, cursor filters, state-store updates, progress
    * events — because the dry branch forces a count-only
    * materialization; only the sink write is withheld. That makes it
    * the operational smoke test the reference uses it as: identical
    * work, zero mutation. */
  private def commit[T](
      skip: Boolean, table: String, ds: Dataset[T])(
      write: Dataset[T] => Unit): Unit =
    if (skip)
      println(s"[graft] skip-commit: $table NOT written (${ds.count()} rows)")
    else write(ds)

  /** Sink-derived resume cursor (S3): max of `cursorCol` already
    * persisted, or -1 when the sink is empty/nonexistent. Each table
    * keeps its own cursor so a crash between the fan-out writes of one
    * micro-batch heals per table on restart. */
  def sinkCursor(
      spark: SparkSession, path: String,
      cursorCol: String = "block_height"): Long =
    try {
      val v = spark.read.parquet(path).agg(max(col(cursorCol))).head()
      if (v.isNullAt(0)) -1L else v.getLong(0)
    } catch { case _: Throwable => -1L }

  val actionsOrderKey =
    Seq("block_height", "account_id", "receipt_index", "action_index")
  val eventsOrderKey =
    Seq("block_height", "account_id", "receipt_index", "log_index")
  val dataOrderKey = Seq("block_height", "account_id", "receipt_index")

  /** actions-mode pipeline: blocks JSON dir → 3 sorted, bloom-filtered,
    * height-bucketed parquet tables under `outDir`. */
  def runActionsPipeline(
      spark: SparkSession, inDir: String, outDir: String,
      checkpoint: String, trigger: Trigger = Trigger.AvailableNow(),
      bucketStep: Long = 1000L, nativeSource: Boolean = false,
      skipCommit: Boolean = false)
      : StreamingQuery = {
    // per-table cursors (partial fan-out from a crashed batch heals)
    val cActions = sinkCursor(spark, s"$outDir/actions")
    val cEvents = sinkCursor(spark, s"$outDir/events")
    val cData = sinkCursor(spark, s"$outDir/data")
    val cMin = Seq(cActions, cEvents, cData).min
    // native path: the sink cursor IS a height, so it seeds the source
    // offset directly — a fresh checkpoint resumes where the tables end
    // instead of re-fetching from height 0
    val src =
      if (nativeSource) readBlockSource(spark, inDir, startHeight = cMin + 1)
      else readBlockStream(spark, inDir)
    src.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // O2: quarantined, deduped, past-cursor blocks only
        val blocks = quarantine(batch, outDir, skipCommit)
          .where(col("block.header.height") > cMin)
          .dropDuplicates("block")
          .persist()
        try {
          if (!blocks.isEmpty) {
            val idx = ActionsExtract.indexedReceipts(blocks).persist()
            try {
              commit(skipCommit, "actions",
                ActionsExtract.actions(idx)
                  .where(col("block_height") > cActions)) { out =>
                Replacing.retry() {
                  Replacing.appendWrite(
                    out, s"$outDir/actions",
                    "block_height", actionsOrderKey,
                    bloomCols = Seq("account_id", "signer_id", "receipt_id",
                      "transaction_hash", "predecessor_id"),
                    step = bucketStep)
                }
              }
              commit(skipCommit, "events",
                ActionsExtract.events(idx)
                  .where(col("block_height") > cEvents)) { out =>
                Replacing.retry() {
                  Replacing.appendWrite(
                    out, s"$outDir/events",
                    "block_height", eventsOrderKey,
                    bloomCols = Seq("account_id", "data_owner_id"),
                    step = bucketStep)
                }
              }
              commit(skipCommit, "data",
                ActionsExtract.data(idx)
                  .where(col("block_height") > cData)) { out =>
                Replacing.retry() {
                  Replacing.appendWrite(
                    out, s"$outDir/data",
                    "block_height", dataOrderKey,
                    bloomCols = Seq("account_id", "data_id"),
                    step = bucketStep)
                }
              }
            } finally idx.unpersist()
          }
        } finally blocks.unpersist()
        ()
      }
      .start()
  }

  /** Fan-out writes of one completed-tx set to the 4 tx tables — shared
    * by the streaming micro-batch sink and the batch backfill. The
    * transactions table is written LAST so its cursor only advances once
    * the other three hold the batch (crash between writes re-runs;
    * duplicates collapse under dedupView). */
  /** K3: the reference commits inserts asynchronously with ≤3 handlers
    * in flight (click.rs MAX_COMMIT_HANDLERS = 3); the Spark analog
    * runs ONE micro-batch's per-table sink writes concurrently under a
    * bounded pool. The batch boundary still commits synchronously —
    * foreachBatch returns (and the streaming checkpoint advances) only
    * after every table write settles — retaining the reference's crash
    * contract (an unacknowledged batch replays; writes are idempotent
    * per height bucket, A5/K1) while the writes themselves overlap.
    * The caller persists `txs`, so concurrent writers share one
    * materialization instead of re-deriving the batch per table. All
    * writes settle before the first failure propagates (no write left
    * running into a restart); `skipCommit` stays sequential so the
    * dry-run diagnostics print in table order.
    *
    * ORDERING INVARIANT: `transactions` is the RESTART-CURSOR table
    * ([[sinkCursor]] over last_block_height feeds the replay skip
    * filter), so it must commit ONLY after every sibling table holds
    * the batch — otherwise a crash between commits advances the cursor
    * past rows the siblings never got, and the replay filter drops
    * them forever. The pool therefore runs the three sibling writes
    * concurrently (3 in-flight handlers — the reference's
    * MAX_COMMIT_HANDLERS exactly) and writes `transactions` last,
    * sequentially, exactly like the pre-pool code. */
  /** Probe-only door into [[writeTxTables]] (ThroughputProbe measures
    * the sequential-vs-pooled fan-out; the pipeline itself always
    * calls the private method). */
  private[graft] def writeTxTablesForProbe(
      txs: Dataset[TxCorrelator.CompletedTx], outDir: String,
      bucketStep: Long, maxCommitHandlers: Int): Unit =
    writeTxTables(txs, outDir, bucketStep,
      maxCommitHandlers = maxCommitHandlers)

  private def writeTxTables(
      txs: Dataset[TxCorrelator.CompletedTx], outDir: String,
      bucketStep: Long, skipCommit: Boolean = false,
      maxCommitHandlers: Int = 3): Unit = {
    val writes: Seq[(String, () => Unit)] = Seq(
      ("account_txs", () =>
        commit(skipCommit, "account_txs", TxFanout.accountTxs(txs)) { out =>
          Replacing.retry() {
            Replacing.appendWrite(
              out, s"$outDir/account_txs",
              "tx_block_height",
              Seq("account_id", "tx_block_height", "transaction_hash"),
              bloomCols = Seq("account_id"), step = bucketStep)
          }
        }),
      ("receipt_txs", () =>
        commit(skipCommit, "receipt_txs", TxFanout.receiptTxs(txs)) { out =>
          Replacing.retry() {
            Replacing.appendWrite(
              out, s"$outDir/receipt_txs",
              "tx_block_height", Seq("tx_block_height", "receipt_id"),
              bloomCols = Seq("receipt_id"), step = bucketStep)
          }
        }),
      ("block_txs", () =>
        commit(skipCommit, "block_txs", TxFanout.blockTxs(txs)) { out =>
          Replacing.retry() {
            Replacing.appendWrite(
              out, s"$outDir/block_txs",
              "block_height", Seq("block_height", "transaction_hash"),
              bloomCols = Seq("transaction_hash"), step = bucketStep)
          }
        }),
      ("transactions", () =>
        commit(skipCommit, "transactions", TxFanout.transactions(txs)) { out =>
          Replacing.retry() {
            Replacing.appendWrite(
              out, s"$outDir/transactions",
              "tx_block_height", Seq("transaction_hash"),
              bloomCols = Seq("transaction_hash", "signer_id"),
              step = bucketStep)
          }
        }))
    val (cursorTable, siblings) = (writes.last, writes.init)
    if (skipCommit || maxCommitHandlers <= 1) writes.foreach(_._2())
    else {
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(maxCommitHandlers)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.util.{Failure, Try}
        val settled = Await.result(
          Future.sequence(siblings.map { case (name, f) =>
            Future(name -> Try(f()))
          }), Duration.Inf)
        settled.collectFirst { case (name, Failure(e)) =>
          throw new RuntimeException(s"commit of $name failed", e)
        }
      } finally pool.shutdown()
      // cursor table LAST — only after every sibling holds the batch
      cursorTable._2()
    }
  }

  /** transactions-mode pipeline: stateful correlation (state store
    * checkpointed) + fan-out to the 4 tx tables; the stateless `blocks`
    * table is written by [[runBlocksPipeline]] on the same input.
    *
    * `startHeight` is the replay cut from [[runBackfill]]: blocks below
    * it are already fully reflected in the sinks, so the stream begins
    * rebuilding correlator state there (lenient mode skips receipts whose
    * txs completed pre-cut; re-emitted completions are dropped by the
    * sink cursor).
    *
    * `tws` (default ON) runs the correlator on `transformWithState`
    * (SURVEY §2.4 first choice — per-entry state writes, optional
    * per-entry TTL) and forces the RocksDB state store provider it
    * requires; `tws = false` (`--no-tws`) falls back to the
    * flatMapGroupsWithState operator. The two operators' checkpoints
    * are NOT interchangeable — resume a pre-round-8 checkpoint with
    * `tws = false`, or start a fresh checkpoint dir to migrate.
    *
    * `stateConf` (default [[ProductionStateConf]]) is applied to a
    * CLONED SparkSession so the caller's session is untouched; pass
    * `Map.empty` to run on the caller's exact conf (the pre-round-12
    * behavior). Conf-vs-checkpoint safety: Spark persists
    * `shuffle.partitions` in the offset log and REPINS it on resume,
    * so an existing 32-partition checkpoint keeps 32 regardless of
    * this map — the pinned value only shapes NEW checkpoints. */
  def runTransactionsPipeline(
      spark: SparkSession, inDir: String, outDir: String,
      checkpoint: String, trigger: Trigger = Trigger.AvailableNow(),
      bucketStep: Long = 1000L, startHeight: Long = Long.MinValue,
      nativeSource: Boolean = false,
      skipCommit: Boolean = false,
      tws: Boolean = true,
      stateTtl: Option[java.time.Duration] = None,
      stateConf: Map[String, String] = ProductionStateConf): StreamingQuery = {
    val session =
      if (stateConf.isEmpty) spark
      else {
        // newSession: shared SparkContext + catalog cache, OWN SQLConf —
        // the stream's state knobs must not leak into the caller's
        // batch queries (shuffle.partitions above all)
        val s = spark.newSession()
        stateConf.foreach { case (k, v) => s.conf.set(k, v) }
        // StreamingQueryListener events are delivered per-session
        // StreamingQueryManager: a listener the caller attached to the
        // parent session (Main's ProgressListener — the A6 progress
        // parity with the reference's transactions.rs logging) would
        // silently stop seeing THIS query's progress. Mirror the
        // parent's listeners onto the clone so callers stay untouched.
        spark.streams.listListeners.foreach(s.streams.addListener)
        s
      }
    import session.implicits._
    val src =
      if (nativeSource)
        readBlockSource(session, inDir,
          startHeight = math.max(startHeight, 0L))
      else readBlockStream(session, inDir)
    val blocks: Dataset[BlockWithTxHashes] =
      src
        .where(col("_corrupt_record").isNull && col("block").isNotNull &&
          col("block.header.height") >= startHeight)
        .drop("_corrupt_record")
        .as[BlockWithTxHashes](Blocks.encoder)
    // cursor over COMPLETION height (the reference skips by processing-
    // block height, transactions.rs:360)
    val cursor = sinkCursor(
      session, s"$outDir/transactions", cursorCol = "last_block_height")
    val correlated =
      if (tws) {
        TxCorrelator.ensureRocksDb(session)
        TxCorrelator.correlateStreamTws(blocks, stateTtl = stateTtl)
      } else TxCorrelator.correlateStream(blocks)
    correlated.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch {
        (batch: Dataset[TxCorrelator.CompletedTx], _: Long) =>
          val txs = batch.filter(_.last_block_height > cursor).persist()
          try {
            if (!txs.isEmpty) writeTxTables(txs, outDir, bucketStep, skipCommit)
          } finally txs.unpersist()
          ()
      }
      .start()
  }

  /** Batch backfill — the 100 TB path (SURVEY.md §7.4-2 option (b)):
    * read the on-disk block corpus once, correlate with the distributed
    * label-propagation correlator (one equi-join per receipt-DAG level,
    * no single-core funnel), fan out to the same idempotent sinks, and
    * record the replay cut under `outDir/_backfill_cut` so a subsequent
    * [[runTransactionsPipeline]] (`startHeight = cut`) picks up the
    * pending frontier and continues tailing. Returns the cut height. */
  def runBackfill(
      spark: SparkSession, inDir: String, outDir: String,
      bucketStep: Long = 1000L): Long = {
    val raw = spark.read
      .schema(Blocks.schema.add("_corrupt_record",
        org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(inDir)
    val blocks = quarantine(raw, outDir).dropDuplicates("block")
    val (correlated, cut) = graft.etl.DistributedCorrelator
      .correlateWithCut(blocks)
    val cursor = sinkCursor(
      spark, s"$outDir/transactions", cursorCol = "last_block_height")
    val txs = correlated
      .filter(col("last_block_height") > cursor)
      .persist()
    try {
      if (!txs.isEmpty) writeTxTables(txs, outDir, bucketStep)
      // blocks table (reference transactions mode writes it too)
      val b = TxFanout.blocks(blocks)
        .where(col("block_height") > sinkCursor(spark, s"$outDir/blocks"))
      if (!b.isEmpty) Replacing.retry() {
        Replacing.appendWrite(
          b, s"$outDir/blocks", "block_height", Seq("block_height"),
          bloomCols = Seq("block_hash", "epoch_id", "author_id"),
          step = bucketStep)
      }
      val c = cut()
      // the cut lives next to the tables, via the SAME filesystem layer
      // the table writes use — outDir may be hdfs:// or s3a://, where
      // java.nio local-file APIs would misplace it and break auto-resume
      val f = cutPath(outDir)
      val fs = f.getFileSystem(spark.sessionState.newHadoopConf())
      val os = fs.create(f, true)
      try os.write(c.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally os.close()
      c
    } finally txs.unpersist()
  }

  private def cutPath(outDir: String) =
    new org.apache.hadoop.fs.Path(outDir, "_backfill_cut/cut")

  /** The replay cut recorded by the last [[runBackfill]], if any. */
  def backfillCut(spark: SparkSession, outDir: String): Option[Long] = {
    val f = cutPath(outDir)
    val fs = f.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(f)) {
      val in = fs.open(f)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong)
      finally in.close()
    } else None
  }

  /** blocks-table pipeline (stateless header projection). */
  def runBlocksPipeline(
      spark: SparkSession, inDir: String, outDir: String,
      checkpoint: String, trigger: Trigger = Trigger.AvailableNow(),
      bucketStep: Long = 1000L, nativeSource: Boolean = false,
      skipCommit: Boolean = false)
      : StreamingQuery = {
    val cursor = sinkCursor(spark, s"$outDir/blocks")
    val src =
      if (nativeSource) readBlockSource(spark, inDir, startHeight = cursor + 1)
      else readBlockStream(spark, inDir)
    src.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = TxFanout
          .blocks(quarantine(batch, outDir, skipCommit).dropDuplicates("block"))
          .where(col("block_height") > cursor)
        if (!b.isEmpty) commit(skipCommit, "blocks", b) { out =>
          Replacing.retry() {
            Replacing.appendWrite(
              out, s"$outDir/blocks", "block_height", Seq("block_height"),
              bloomCols = Seq("block_hash", "epoch_id", "author_id"),
              step = bucketStep)
          }
        }
        ()
      }
      .start()
  }
}
