package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool (round-14 optimization): per-query cost breakdown — wall
  * time vs. #jobs / #stages / #tasks / summed task time. The guide §1
  * empirical loop needs to know whether a 2 s pack query is task-bound
  * (real compute) or structure-bound (driver planning + scheduling of
  * many tiny jobs); the Spark UI is disabled in the bench, so this
  * listener prints the same facts.
  *
  * Usage: `runMain graft.ProfileQuery <namePrefixes> [runs]`
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQuery <prefixes> [runs]")
    val prefixes = args(0).split(',').toSeq
    val runs = args.drop(1).find(_.forall(_.isDigit)).map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
    // mirror the bench's shuffle-scratch choice so profiles match it
    val spark = (if (java.nio.file.Files.isWritable(
        java.nio.file.Paths.get("/dev/shm")))
      b0.config("spark.local.dir", "/dev/shm/graft-shuffle-scratch")
    else b0).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.query.Tables.configure(spark)

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var taskMs = 0L
    @volatile var gcMs = 0L
    // per-job: id -> (callsite, startNs, taskMs). -perjob in args(0)
    // prints one line per job so the expensive actions are named.
    val perJob = args.contains("-perjob")
    val jobInfo = new java.util.concurrent.ConcurrentHashMap[
      Int, (String, Long, java.util.concurrent.atomic.AtomicLong)]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        val cs = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        jobInfo.put(j.jobId,
          (cs, System.nanoTime(),
            new java.util.concurrent.atomic.AtomicLong()))
        j.stageIds.foreach(s => stageToJob.put(s, j.jobId))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val info = jobInfo.get(j.jobId)
        if (perJob && info != null) {
          val wall = (System.nanoTime() - info._2) / 1e9
          if (wall > 0.05)
            println(f"  JOB ${j.jobId}%3d wall=$wall%7.3f s " +
              f"taskTime=${info._3.get() / 1000.0}%8.3f s  ${info._1}")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          taskMs += t.taskMetrics.executorRunTime
          gcMs += t.taskMetrics.jvmGCTime
          val j = stageToJob.get(t.stageId)
          val info = if (j != null) jobInfo.get(j) else null
          if (info != null) info._3.addAndGet(t.taskMetrics.executorRunTime)
        }
    })

    // ad-hoc conf experiments: any arg of the form k=v is applied as a
    // runtime session conf before the queries run.
    args.drop(1).filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
      System.err.println(s"[profile] conf $k=$v")
    }

    // operator-level metrics for slow executions: -plans prints each
    // >1.5 s execution's physical operators with their time metrics,
    // which names the expensive operator when job callsites are the
    // anonymous async-execution wrapper.
    if (args.contains("-plans"))
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(
              fn: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              ns: Long): Unit = if (ns > 1500000000L) {
            println(f"  EXEC $fn ${ns / 1e9}%.2f s")
            // AdaptiveSparkPlanExec hides its children from foreach —
            // unwrap to the final plan (and nested sub-plans) first
            def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit =
              p.foreach {
                case a: org.apache.spark.sql.execution.adaptive
                    .AdaptiveSparkPlanExec =>
                  walk(a.executedPlan)
                case q: org.apache.spark.sql.execution.adaptive
                    .QueryStageExec =>
                  walk(q.plan)
                case n =>
                  val ms = n.metrics.toSeq
                    .filter { case (_, m) => m.value > 1000 }
                    .map { case (k, m) => s"$k=${m.value}" }
                    .sorted.mkString(" ")
                  if (ms.nonEmpty)
                    println(s"    ${n.nodeName} $ms")
              }
            walk(qe.executedPlan)
          }
          override def onFailure(
              fn: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              e: Exception): Unit = ()
        })

    val picked = SparkEntry.queries.toSeq
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .sortBy(_._1)
    picked.foreach { case (name, fn) =>
      (0 until runs).foreach { r =>
        jobs = 0; stages = 0; tasks = 0; taskMs = 0; gcMs = 0
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // drain listener bus so the counters are complete
        org.apache.spark.sql.graft.ListenerBridge.drain(spark.sparkContext)
        println(f"PROFILE $name run=$r wall=$wall%.3f s jobs=$jobs " +
          f"stages=$stages tasks=$tasks taskTime=${taskMs / 1000.0}%.3f s " +
          f"gc=${gcMs / 1000.0}%.3f s rows=$n")
        graft.ext.Caches.release(); spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
