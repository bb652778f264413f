package graft

import org.apache.spark.sql.functions._
import graft.sink.Replacing

/** The background merge (ReplacingMergeTree's physical collapse): after
  * duplicated appends, `Replacing.merge` must (1) leave reads equal to
  * what dedupView showed before it, (2) actually shrink rows and files,
  * (3) honor bucket scoping so a merge can touch only the hot tail.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def table(n: Int, v: Int) =
    (0 until n).map(i => (100L + i, s"k$i", s"val$v", v.toLong))
      .toDF("block_height", "key", "payload", "version")

  test("merge collapses duplicate keys, preserves the dedupView contract") {
    val out = java.nio.file.Files.createTempDirectory("graft-merge").toString
    val key = Seq("block_height", "key")
    // two appends of the same 40 keys: version 1 then version 2
    Replacing.appendWrite(table(40, 1), s"$out/t", "block_height", key, step = 10L)
    Replacing.appendWrite(table(40, 2), s"$out/t", "block_height", key, step = 10L)

    val before = spark.read.parquet(s"$out/t")
    assert(before.count() === 80)
    val viewBefore = Replacing
      .dedupView(before, key, versionCol = Some("version"))
      .select("block_height", "key", "payload")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap
    assert(viewBefore.size === 40)
    assert(viewBefore.values.forall(_ == "val2")) // latest version wins

    Replacing.merge(spark, s"$out/t", key, versionCol = Some("version"))

    val after = spark.read.parquet(s"$out/t")
    assert(after.count() === 40) // physically collapsed
    val viewAfter = after
      .select("block_height", "key", "payload")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap
    assert(viewAfter === viewBefore) // reads unchanged by the merge
    // no temp residue
    assert(!new java.io.File(s"$out/t__merge_tmp").exists())
  }

  test("bucket-scoped merge touches only the requested buckets") {
    val out = java.nio.file.Files.createTempDirectory("graft-merge2").toString
    val key = Seq("block_height", "key")
    Replacing.appendWrite(table(40, 1), s"$out/t", "block_height", key, step = 10L)
    Replacing.appendWrite(table(40, 2), s"$out/t", "block_height", key, step = 10L)
    // heights 100..139 -> buckets 100,110,120,130; merge only the tail
    Replacing.merge(spark, s"$out/t", key, versionCol = Some("version"),
      buckets = Some(Seq(130L)))
    val t = spark.read.parquet(s"$out/t")
    assert(t.where(col("height_bucket") === 130L).count() === 10)
    assert(t.where(col("height_bucket") =!= 130L).count() === 60) // untouched
  }
}
