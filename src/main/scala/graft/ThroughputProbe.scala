package graft

/** Pipeline-throughput probe (manual main, not driver-run): measures
  * the ETL half in blocks/s on the synthetic fixture corpus so the
  * BASELINE.md pipeline numbers track the CURRENT code, not round-1
  * snapshots. Run: `sbt "runMain graft.ThroughputProbe [nBlocks]"`.
  * The real NEAR chain produces ~1 block/s — these numbers are the
  * single-node headroom figure.
  */
import org.apache.spark.sql.SparkSession
import graft.etl.{ActionsExtract, DistributedCorrelator, TxCorrelator}
import graft.fixtures.BlockFixtures
import graft.schema.Blocks

object ThroughputProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val rows = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name%-28s ${n / dt}%9.0f blocks/s  ($dt%5.2f s, rows=$rows)")
      spark.catalog.clearCache()
    }
    // cold + warm: the second run is the steady-state number
    for (round <- Seq("cold", "warm")) {
      val fixture = BlockFixtures.df(spark, n)
      time(s"$round actions extract") {
        ActionsExtract.actions(ActionsExtract.indexedReceipts(fixture)).count()
      }
      time(s"$round events+data extract") {
        val idx = ActionsExtract.indexedReceipts(fixture)
        ActionsExtract.events(idx).count() + ActionsExtract.data(idx).count()
      }
      time(s"$round sequential correlate") {
        import Blocks.encoder
        TxCorrelator.correlateBatch(
          spark.createDataset(BlockFixtures.blocks(n))(encoder)).count()
      }
      time(s"$round distributed correlate") {
        DistributedCorrelator.correlate(BlockFixtures.df(spark, n)).count()
      }
      // streaming correlator paths: fmgws (whole-state re-serialize per
      // trigger, default HDFS-backed provider) vs the production
      // transformWithState wire (RocksDB, per-entry delta writes).
      // batch = blocks per trigger; production caps at 100 via
      // maxFilesPerTrigger, the 1000 row shows the amortization.
      def streamCorrelate(label: String, tws: Boolean, batch: Int): Unit = {
        val key = "spark.sql.streaming.stateStore.providerClass"
        if (tws) TxCorrelator.ensureRocksDb(spark)
        else if (spark.conf.getOption(key).isDefined) spark.conf.unset(key)
        time(label) {
          import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
          val qn = s"probe${System.nanoTime()}"
          val stream = MemoryStream[graft.schema.BlockWithTxHashes](
            Blocks.encoder, spark)
          val ds =
            if (tws) TxCorrelator.correlateStreamTws(stream.toDS())
            else TxCorrelator.correlateStream(stream.toDS())
          val q = ds.writeStream.outputMode("append").format("memory")
            .queryName(qn).start()
          try BlockFixtures.blocks(n).grouped(batch).foreach { g =>
            stream.addData(g); q.processAllAvailable()
          } finally q.stop()
          val c = spark.table(qn).count()
          spark.catalog.dropTempView(qn)
          c
        }
      }
      streamCorrelate(s"$round stream fmgws b1000", tws = false, batch = 1000)
      streamCorrelate(s"$round stream tws   b1000", tws = true, batch = 1000)
      streamCorrelate(s"$round stream fmgws b100", tws = false, batch = 100)
      streamCorrelate(s"$round stream tws   b100", tws = true, batch = 100)
      // sink-bound fan-out: the four tx-table writes, sequential vs
      // the K3 bounded commit pool — the number that justifies (or
      // not) concurrent commits on this storage
      for (handlers <- Seq(1, 3)) {
        time(s"$round fan-out writes x$handlers") {
          import Blocks.encoder
          val txs = TxCorrelator.correlateBatch(
            spark.createDataset(BlockFixtures.blocks(n))(encoder)).persist()
          val c = txs.count()
          val out = java.nio.file.Files
            .createTempDirectory("graft-tp-sink").toString
          try graft.stream.BlockStream.writeTxTablesForProbe(
            txs, out, 1000L, maxCommitHandlers = handlers)
          finally {
            txs.unpersist()
            graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(out))
          }
          c
        }
      }
    }
    spark.stop()
  }
}
