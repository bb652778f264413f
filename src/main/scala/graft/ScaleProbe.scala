package graft

/** Scale probe (manual main, not driver-run): replicates the sf0.1
  * corpus 10x (50k docs, each copy a near-dup of its source) and times
  * the heavy dedup/text operators at 1x vs 10x. Run:
  * `sbt "runMain graft.ScaleProbe"`. Measured numbers live in
  * BASELINE.md's scale-probe section.
  */
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.query.Tables.configure(spark)
    val docs1 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    // 10x: replicate with distinct ids and a per-copy suffix token so
    // copies are near-dup but not byte-identical. Materialized to
    // parquet so BOTH scales read from disk under identical conditions
    // — a cached 10x frame would be wiped by the per-op clearCache()
    // and silently re-derived inside whichever timing ran next.
    val tmpDir = java.nio.file.Files.createTempDirectory("graft-scale")
    val tmp = tmpDir.toString
    (0 until 10).map { r =>
      docs1.select((col("doc_id") + lit(r * 1000000L)).as("doc_id"),
        concat(col("text"), lit(s" copytag$r")).as("text"))
    }.reduce(_ unionByName _).repartition(32)
      .write.mode("overwrite").parquet(tmp)
    val docs10 = spark.read.parquet(tmp)
    println(s"docs10 = ${docs10.count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      spark.catalog.clearCache() // drop operator-internal persists
    }
    try {
      for ((label, d) <- Seq(("1x(5k)", docs1), ("10x(50k)", docs10))) {
        time(s"$label dupSpanProfile") { graft.ext.Dedup.dupSpanProfile(d, "doc_id", "text").count() }
        time(s"$label minhashPairs") { graft.ext.Dedup.minhashPairs(d, "doc_id", "text", 0.5).count() }
        time(s"$label tfidfTopTerms") { graft.ext.TextAnalysis.tfidfTopTerms(d, "doc_id", "text").count() }
        time(s"$label dedupSpans") { graft.ext.Dedup.dedupSpans(d, "doc_id", "text").count() }
        time(s"$label dedupCorpus") { graft.ext.Dedup.dedupCorpusByNgram(
          d, "doc_id", "text", length(col("text")).cast("long"),
          threshold = 0.8, maxPostings = 1000).count() }
        time(s"$label lmScore") { graft.ext.TextAnalysis.lmScore(d, "doc_id", "text").count() }
        time(s"$label winnowPairs") { graft.ext.Dedup.winnowPairs(d, "doc_id", "text").count() }
        // token-level heavy hitters (stopword discovery): ~1M/10M tokens,
        // map-only Misra-Gries candidates + exact verify of ~cap items
        time(s"$label heavyHitters") {
          graft.ext.Frequent.heavyHitters(
            d.select(explode(graft.ext.TextAnalysis.tokens(col("text"))).as("tok")),
            "tok", 0.01).count()
        }
      }
    } finally {
      spark.stop()
      // the 10x corpus is ~10x the sf0.1 documents table on disk — clean up
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      val walk = Files.walk(tmpDir)
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
