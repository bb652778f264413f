package graft

import graft.plans.GlobalWindows

/** Total adjudication of unkeyed (single-partition) windows across the
  * whole query pack — the discipline that a global Window may only run
  * over a BOUNDED reduced frame is otherwise prose plus per-family
  * PlanSpec gates; this spec makes it a closed list, so a new operator
  * that moves data-scale rows through one task cannot land silently.
  */
class GlobalWindowSpec extends SparkSpec {

  test("whitelist names only real queries") {
    val stale = GlobalWindows.whitelist.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"whitelist entries with no query: $stale")
  }

  test("every global window in the pack maps to a whitelisted bounded " +
    "frame, and every whitelist row is still needed") {
    graft.query.Tables.configure(spark)
    val dir = "/root/testdata/sf0.001"
    val census = scala.collection.mutable.LinkedHashMap[String, Int]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val n = GlobalWindows.countLogical(fn(spark, dir))
      if (n > 0) census(name) = n
      graft.ext.Caches.release(); spark.catalog.clearCache()
    }
    val unlisted = census.keySet -- GlobalWindows.whitelist.keySet
    assert(unlisted.isEmpty,
      s"UNWHITELISTED global windows (adjudicate or re-key them): " +
        unlisted.toSeq.sorted.map(n => s"$n=${census(n)}").mkString(", ") +
        s"; full census: ${census.toSeq.sortBy(_._1).mkString(", ")}")
    // exactness: a whitelist row whose query no longer plans a global
    // window is a stale justification — delete it so the list stays
    // the precise map of adjudicated sites
    val unused = GlobalWindows.whitelist.keySet -- census.keySet
    assert(unused.isEmpty, s"stale whitelist rows (no global window " +
      s"in plan anymore): $unused")
  }

  test("internal-action sites: named queries exist, don't overlap the " +
    "logical whitelist, and really do run a global window during " +
    "construction") {
    val ias = GlobalWindows.internalActionSites
    assert((ias.keySet -- SparkEntry.queries.keySet).isEmpty)
    assert(ias.keySet.intersect(GlobalWindows.whitelist.keySet).isEmpty)
    // runtime proof for one site: constructing t43 collects the
    // bounded score histogram through a global cumulative window —
    // visible only to an execution listener, not the final lineage
    graft.query.Tables.configure(spark)
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit =
        seen.addAndGet(GlobalWindows.countExecuted(qe.executedPlan))
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      val df = SparkEntry.queries("t43_curriculum_plan")(
        spark, "/root/testdata/sf0.001")
      org.apache.spark.sql.graft.ListenerBridge.drain(spark.sparkContext)
      assert(seen.get() > 0,
        "t43's construction no longer runs a global window — delete " +
          "its internalActionSites row")
      assert(GlobalWindows.countLogical(df) === 0) // and NOT in lineage
    } finally spark.listenerManager.unregister(l)
    graft.ext.Caches.release(); spark.catalog.clearCache()
  }

  test("the census counters detect a planted global window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = (1 to 10).toDF("x")
      .withColumn("r", row_number().over(Window.orderBy("x")))
    assert(GlobalWindows.countLogical(df) === 1)
    df.count()
    assert(GlobalWindows.countExecuted(
      df.queryExecution.executedPlan) === 1)
    val keyed = (1 to 10).map(i => (i % 2, i)).toDF("k", "x")
      .withColumn("r",
        row_number().over(Window.partitionBy("k").orderBy("x")))
    assert(GlobalWindows.countLogical(keyed) === 0)
  }
}
