package graft

import org.apache.spark.sql.functions._
import graft.sink.ZOrder

/** Measures what the Z-order layout exists to deliver: per-file min/max
  * spans contract on BOTH dimensions, so parquet footer stats can prune
  * scans filtered on either column. A single-key sort layout leaves the
  * second column's per-file span at ~100% of the global range.
  */
class ZOrderSpec extends SparkSpec {

  private def avgSpanFraction(
      files: Seq[String], c: String, globalSpan: Double): Double = {
    val fracs = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(c).cast("double")), max(col(c).cast("double"))).head()
      (r.getDouble(1) - r.getDouble(0)) / globalSpan
    }
    fracs.sum / fracs.size
  }

  test("zValue matches a reference Morton interleave on random ranks") {
    import spark.implicits._
    def morton(a: Long, b: Long): Long =
      (0 until 16).map { i =>
        (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))
      }.reduce(_ | _)
    val rnd = new scala.util.Random(7)
    val cases = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (0L, 65535L), (65535L, 0L))
    val got = cases.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    val want = cases.map { case (a, b) => morton(a, b) }
    assert(got.toSeq === want)
  }

  test("z-order clusters both dimensions; single-key sort only one") {
    val ev = graft.query.Tables
      .load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"),
        expr("(ts div 1000) div 3600000000").as("hour_bucket"))
    val g = ev.agg(
      min(col("user_id").cast("double")), max(col("user_id").cast("double")),
      min(col("hour_bucket").cast("double")),
      max(col("hour_bucket").cast("double"))).head()
    val (userSpan, hourSpan) = (g.getDouble(1) - g.getDouble(0),
      g.getDouble(3) - g.getDouble(2))

    def partFiles(dir: String): Seq[String] =
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath).toSeq

    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    try {
      ZOrder.zOrderWrite(ev, s"$tmp/z", "user_id", "hour_bucket", numFiles = 16)
      val zFiles = partFiles(s"$tmp/z")
      assert(zFiles.size >= 8, s"expected >=8 files, got ${zFiles.size}")
      val zUser = avgSpanFraction(zFiles, "user_id", userSpan)
      val zHour = avgSpanFraction(zFiles, "hour_bucket", hourSpan)
      // Morton layout: each of ~16 files spans ~1/4 of each dimension
      assert(zUser < 0.5, s"z-order user_id avg span fraction $zUser")
      assert(zHour < 0.5, s"z-order hour_bucket avg span fraction $zHour")

      // contrast: sorting by user_id alone leaves hour unclustered
      ev.repartitionByRange(16, col("user_id"))
        .sortWithinPartitions("user_id")
        .write.mode("overwrite").parquet(s"$tmp/flat")
      val fHour = avgSpanFraction(partFiles(s"$tmp/flat"), "hour_bucket", hourSpan)
      assert(fHour > 0.8, s"single-key layout hour span fraction $fHour")
      assert(zHour < fHour / 2, s"z=$zHour flat=$fHour")
    } finally {
      import java.nio.file.{Files, Path, Paths}
      import java.util.Comparator
      val walk = Files.walk(Paths.get(tmp))
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
