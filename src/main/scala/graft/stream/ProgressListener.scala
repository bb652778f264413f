package graft.stream

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** A6 progress counters (/root/reference/src/actions.rs:170-179,
  * /root/reference/src/transactions.rs:356-358 log buffered/pending row
  * counts): the Spark-native vehicle is a StreamingQueryListener over
  * micro-batch progress events.
  */
class ProgressListener extends StreamingQueryListener {
  val totalInputRows = new AtomicLong(0L)
  val batches = new AtomicLong(0L)

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    totalInputRows.addAndGet(p.numInputRows)
    batches.incrementAndGet()
    // the reference logs "#height: Complete N. Pending M" per block;
    // per micro-batch is the idiomatic grain here
    println(
      s"[graft-progress] batch=${p.batchId} rows=${p.numInputRows} " +
        s"rows/s=${p.processedRowsPerSecond.toLong} total=${totalInputRows.get}")
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}

object ProgressListener {
  /** Attach a fresh listener to the session; returns it for inspection. */
  def attach(spark: SparkSession): ProgressListener = {
    val l = new ProgressListener
    spark.streams.addListener(l)
    l
  }
}
