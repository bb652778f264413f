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
    val runs = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.query.Tables.configure(spark)

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var taskMs = 0L
    @volatile var gcMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          taskMs += t.taskMetrics.executorRunTime
          gcMs += t.taskMetrics.jvmGCTime
        }
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
