package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r14 optimization probe: why does a tiny exchange cost ~300 ms of
  * shuffle WRITE time per map task on this host (measured in d34's
  * operator metrics: 6.8 s summed write time for a 120 KB / 5,000-row
  * shuffle)? Runs a minimal repartition+agg with core confs taken
  * from the command line so static (non-SQL) shuffle settings can be
  * A/B'd across JVMs. Usage:
  * `runMain graft.ShufProbe [k=v ...]` */
object ShufProbe {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    args.filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var writeNs = 0L
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null) {
            writeNs += t.taskMetrics.shuffleWriteMetrics.writeTime
            tasks += 1
          }
      })
    val df = spark.range(0, 100000, 1, 32)
      .select(col("id"), (col("id") % 97).as("k"))
    (0 until 4).foreach { rep =>
      writeNs = 0; tasks = 0
      val t0 = System.nanoTime()
      df.repartition(32, col("k")).agg(count(lit(1))).collect()
      org.apache.spark.sql.graft.ListenerBridge.drain(spark.sparkContext)
      println(f"rep=$rep wall=${(System.nanoTime() - t0) / 1e9}%6.3f s " +
        f"tasks=$tasks shufWrite=${writeNs / 1e9}%6.3f s")
    }
    spark.stop()
  }
}
