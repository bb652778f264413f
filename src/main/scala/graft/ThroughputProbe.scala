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
