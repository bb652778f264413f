package graft

import org.apache.spark.sql.functions._
import graft.util.Fs

/** The [[Fs.rewriteSwap]] crash matrix, simulated state by state —
  * the compactors' (minhash + IVF) durability rests on every
  * interrupted rewrite being COMPLETABLE by [[Fs.recoverSwap]]. */
class FsSpec extends SparkSpec {
  import spark.implicits._

  private def writeTable(p: java.nio.file.Path, ids: Seq[Long]): Unit =
    ids.toDF("id").coalesce(1).write.mode("overwrite").parquet(p.toString)

  private def readIds(p: java.nio.file.Path): Set[Long] =
    spark.read.parquet(p.toString).select(col("id"))
      .collect().map(_.getLong(0)).toSet

  test("rewriteSwap: happy path rewrites in place and leaves no residue") {
    val root = java.nio.file.Files.createTempDirectory("graft-fsspec")
    val src = root.resolve("t")
    writeTable(src, Seq(1L, 2L, 3L))
    Fs.rewriteSwap(spark, src)(_.where(col("id") =!= 2L))
    assert(readIds(src) === Set(1L, 3L))
    assert(!java.nio.file.Files.exists(root.resolve("t._swap")))
    assert(!java.nio.file.Files.exists(root.resolve("t._old")))
    Fs.deleteRecursively(root)
  }

  test("recoverSwap completes every crash state") {
    val root = java.nio.file.Files.createTempDirectory("graft-fsspec2")
    val src = root.resolve("t")
    // state A: crash DURING the swap write (src intact, ._swap partial)
    // -> the partial swap is discarded, src untouched
    writeTable(src, Seq(1L, 2L))
    java.nio.file.Files.createDirectories(root.resolve("t._swap"))
    java.nio.file.Files.write(
      root.resolve("t._swap").resolve("part-garbage.parquet"),
      Array[Byte](1, 2, 3))
    Fs.recoverSwap(src)
    assert(readIds(src) === Set(1L, 2L))
    assert(!java.nio.file.Files.exists(root.resolve("t._swap")))
    // state B: crash BETWEEN retire and promote (src missing, ._swap
    // complete, ._old = the pre-image) -> swap promoted, old cleared
    writeTable(root.resolve("t._swap"), Seq(9L))
    java.nio.file.Files.move(src, root.resolve("t._old"))
    Fs.recoverSwap(src)
    assert(readIds(src) === Set(9L))
    assert(!java.nio.file.Files.exists(root.resolve("t._swap")))
    assert(!java.nio.file.Files.exists(root.resolve("t._old")))
    // state C: crash AFTER promote, before cleanup (._old stale)
    writeTable(root.resolve("t._old"), Seq(7L))
    Fs.recoverSwap(src)
    assert(readIds(src) === Set(9L))
    assert(!java.nio.file.Files.exists(root.resolve("t._old")))
    // and a subsequent rewriteSwap runs clean from any recovered state
    Fs.rewriteSwap(spark, src)(_.withColumn("id", col("id") + 1L))
    assert(readIds(src) === Set(10L))
    Fs.deleteRecursively(root)
  }
}
