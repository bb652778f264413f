package graft

import org.apache.spark.sql.functions._
import graft.ext.{Artifacts, Bpe, Similarity}

/** Provenance seam: external embedding/tokenizer artifacts round-trip
  * exactly, feed their consumers unchanged, and every tamper class —
  * dropped rows, edited cells, version/dim/kind mismatches — is
  * rejected AT LOAD with a named error, never discovered downstream. */
class ArtifactsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p)

  test("embedding artifact: write/read round-trip, manifest stamped, " +
    "payload feeds the s-family unchanged") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val dir = tmp("graft-emb-art")
    try {
      val m = Artifacts.embeddingWrite(
        emb, "vec_id", "embedding", "test-model", "v1", dir.toString)
      assert(m.kind === "embeddings" && m.dim === 64L)
      assert(m.nRows === emb.count())
      val (payload, m2) = Artifacts.embeddingRead(
        spark, dir.toString,
        expectDim = Some(64L), expectVersion = Some("v1"))
      assert(m2 === m)
      // the loaded payload IS the table: same top-k as the direct frame
      val q = emb.where(col("vec_id") === 0)
        .head().getSeq[Float](1)
      def top(df: org.apache.spark.sql.DataFrame, id: String) =
        Similarity.cosineTopK(df, id, "embedding", q, k = 5)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(top(payload, "id") === top(emb, "vec_id"))
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  test("embedding artifact: version pin, dim pin, dropped rows, edited " +
    "cells and kind confusion all reject at load") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").where(col("vec_id") < 50)
    val dir = tmp("graft-emb-bad")
    try {
      Artifacts.embeddingWrite(
        emb, "vec_id", "embedding", "test-model", "v1", dir.toString)
      intercept[Artifacts.ArtifactMismatch] {
        Artifacts.embeddingRead(spark, dir.toString,
          expectVersion = Some("v2"))
      }
      intercept[Artifacts.ArtifactMismatch] {
        Artifacts.embeddingRead(spark, dir.toString,
          expectDim = Some(128L))
      }
      // tamper 1: drop a row behind the manifest's back
      val v = spark.read.parquet(s"$dir/vectors")
        .where(col("id") =!= 7L).cache()
      v.count()
      v.write.mode("overwrite").parquet(s"$dir/vectors")
      val e1 = intercept[Artifacts.ArtifactMismatch] {
        Artifacts.embeddingRead(spark, dir.toString)
      }
      assert(e1.getMessage.contains("rows"))
      // tamper 2: same row COUNT, one edited cell → digest catches it
      val v2 = spark.read.parquet(s"$dir/vectors")
        .select(
          when(col("id") === 3L, lit(9999L)).otherwise(col("id"))
            .as("id"),
          col("embedding")).cache()
      v2.count()
      v2.write.mode("overwrite").parquet(s"$dir/vectors")
      // manifest still claims the original count-1... rewrite manifest
      // count so ONLY the digest line can catch the edit
      val mdf = spark.read.parquet(s"$dir/manifest")
        .withColumn("nRows", lit(v2.count())).cache()
      mdf.count()
      mdf.write.mode("overwrite").parquet(s"$dir/manifest")
      val e2 = intercept[Artifacts.ArtifactMismatch] {
        Artifacts.embeddingRead(spark, dir.toString)
      }
      assert(e2.getMessage.contains("digest"))
      // kind confusion: a tokenizer loaded as embeddings
      val tdir = tmp("graft-tok-kind")
      try {
        Artifacts.tokenizerWrite(
          Seq(("a", "b")), "tok", "v1", tdir.toString, spark)
        val e3 = intercept[Artifacts.ArtifactMismatch] {
          Artifacts.embeddingRead(spark, tdir.toString)
        }
        assert(e3.getMessage.contains("kind"))
      } finally graft.util.Fs.deleteRecursively(tdir)
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  test("embedding artifact: null ids and duplicate ids reject at " +
    "WRITE, never get a manifest") {
    val dir = tmp("graft-emb-ids")
    try {
      // a nullable id column (outer-join output, optional keys) keeps
      // its nulls through the long cast; the old behavior stamped a
      // digest over the corrupted payload. (Non-numeric STRING ids
      // already fail loudly — the ANSI cast throws at write.)
      val nullIds = Seq(
        (Some(1L), Seq(1.0f, 2.0f)), (None, Seq(3.0f, 4.0f)))
        .toDF("vec_id", "embedding")
      val e1 = intercept[Artifacts.ArtifactMismatch] {
        Artifacts.embeddingWrite(
          nullIds, "vec_id", "embedding", "m", "v1", dir.toString)
      }
      assert(e1.getMessage.contains("null ids"))
      assert(!java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(dir.toString, "manifest")))
      val dupIds = Seq(
        (1L, Seq(1.0f, 2.0f)), (1L, Seq(3.0f, 4.0f)), (2L, Seq(5.0f, 6.0f)))
        .toDF("vec_id", "embedding")
      val e2 = intercept[Artifacts.ArtifactMismatch] {
        Artifacts.embeddingWrite(
          dupIds, "vec_id", "embedding", "m", "v1", dir.toString)
      }
      assert(e2.getMessage.contains("distinct ids"))
    } finally graft.util.Fs.deleteRecursively(dir)
  }

  test("tokenizer artifact: trained merges round-trip in rank order and " +
    "drive the same encode; edits reject") {
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "new newer newest new low")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 8, minFreq = 2L)
    assert(merges.nonEmpty)
    val dir = tmp("graft-tok-art")
    try {
      val m = Artifacts.tokenizerWrite(
        merges, "bpe-test", "2026-08", dir.toString, spark)
      assert(m.kind === "tokenizer" && m.nRows === merges.length.toLong)
      val (back, m2) = Artifacts.tokenizerRead(
        spark, dir.toString, expectVersion = Some("2026-08"))
      assert(back === merges && m2 === m)
      val ranks = back.zipWithIndex.toMap
      assert(Bpe.encodeWord("lowest", ranks) ===
        Bpe.encodeWord("lowest", merges.zipWithIndex.toMap))
      // tamper: swap two merge ranks — count unchanged, digest differs
      val edited = spark.read.parquet(s"$dir/merges")
        .withColumn("rank",
          when(col("rank") === 0L, 1L)
            .when(col("rank") === 1L, 0L)
            .otherwise(col("rank"))).cache()
      edited.count()
      edited.write.mode("overwrite").parquet(s"$dir/merges")
      val e = intercept[Artifacts.ArtifactMismatch] {
        Artifacts.tokenizerRead(spark, dir.toString)
      }
      assert(e.getMessage.contains("digest"))
    } finally graft.util.Fs.deleteRecursively(dir)
  }
}
