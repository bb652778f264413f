package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Provenance-checked EXTERNAL artifact seam — the contract for the
  * two artifacts a user wires in from outside the engine: embedding
  * tables (feeding the whole s-family) and trained tokenizers (the BPE
  * encode/fertility consumers). Everything else in the engine derives
  * from the corpus; these two come from a model, so a silent swap —
  * yesterday's vectors under today's index build, a tokenizer from a
  * different training run — corrupts every downstream result while
  * keeping every schema valid. The discipline here is the bloom
  * screen's artifact pattern hardened one step:
  *
  *  - the payload is plain parquet (vectors: `(id BIGINT, embedding
  *    ARRAY<FLOAT>)`; merges: `(rank BIGINT, a STRING, b STRING)`) —
  *    producible by any engine or a pandas script, nothing
  *    engine-specific;
  *  - a `manifest` rides next to it: kind, model, version, dim /
  *    merge count, row count, and a CONTENT DIGEST (order-independent
  *    `bit_xor` of per-row `xxhash64`) computed from the payload at
  *    write time;
  *  - the loader re-derives count/dim/digest from the payload and
  *    REJECTS on any mismatch — truncated copies, re-partitioned
  *    rewrites that dropped rows, or hand-edited files fail loudly at
  *    load, never silently downstream. Callers can additionally pin
  *    `expectVersion`/`expectDim` so a pipeline config states the
  *    provenance it was built against.
  *
  * The digest is one extra scan at load time; at 100 TB load the
  * artifact once per job and keep the returned frame (the loader does
  * nothing else to it — no shuffle, no cache).
  */
object Artifacts {

  final case class Manifest(
      kind: String, model: String, version: String,
      dim: Long, nRows: Long, digest: Long)

  final case class ArtifactMismatch(msg: String)
      extends RuntimeException(msg)

  private def writeManifest(
      spark: SparkSession, m: Manifest, dir: String): Unit = {
    import spark.implicits._
    Seq(m).toDF().coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/manifest")
  }

  private def readManifest(spark: SparkSession, dir: String): Manifest = {
    import spark.implicits._
    spark.read.parquet(s"$dir/manifest").as[Manifest].head()
  }

  private def digestOf(payload: DataFrame, cols: Seq[String]): Long = {
    val row = payload
      .agg(expr(s"bit_xor(xxhash64(${cols.mkString(", ")}))")).head()
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }

  // ——— embeddings ———

  /** Write an embedding artifact: normalizes column names to the
    * contract schema, derives dim (must be uniform — ragged vector
    * lengths are rejected at WRITE time, not discovered by a consumer
    * mid-join), stamps the manifest. Returns the manifest. */
  def embeddingWrite(
      vectors: DataFrame, idCol: String, vecCol: String,
      model: String, version: String, dir: String): Manifest = {
    val spark = vectors.sparkSession
    val payload = vectors.select(
      col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<float>").as("embedding"))
    payload.write.mode("overwrite").parquet(s"$dir/vectors")
    val back = spark.read.parquet(s"$dir/vectors")
    val stats = back.agg(
      count(lit(1)), min(size(col("embedding"))),
      max(size(col("embedding"))), count(col("id")),
      countDistinct(col("id"))).head()
    val (n, dMin, dMax) =
      (stats.getLong(0), stats.getInt(1), stats.getInt(2))
    require(n > 0, "embeddingWrite: empty vector table")
    // a nullable id column (outer-join output, optional keys) keeps
    // its nulls through the long cast — a digest stamped over that
    // payload would CERTIFY a corrupted artifact whose ids break every
    // downstream join, so id integrity is a write-time rejection like
    // raggedness. (Non-numeric STRING ids fail the ANSI cast loudly
    // on their own.)
    if (stats.getLong(3) != n)
      throw ArtifactMismatch(
        s"embeddingWrite: ${n - stats.getLong(3)} null ids after the " +
          s"long cast of '$idCol' — a non-numeric id column cannot be " +
          "an embedding artifact key")
    if (stats.getLong(4) != n)
      throw ArtifactMismatch(
        s"embeddingWrite: ${stats.getLong(4)} distinct ids over $n " +
          "rows — duplicate ids would fan out every downstream join")
    require(dMin == dMax,
      s"embeddingWrite: ragged vector lengths ($dMin..$dMax)")
    val m = Manifest("embeddings", model, version, dMax.toLong, n,
      digestOf(back, Seq("id", "embedding")))
    writeManifest(spark, m, dir)
    m
  }

  /** Load + validate an embedding artifact. Returns the payload frame
    * (contract schema, untouched) and the manifest. Throws
    * [[ArtifactMismatch]] when the payload disagrees with the manifest
    * (count, dim, digest) or with the caller's pins. */
  def embeddingRead(
      spark: SparkSession, dir: String,
      expectDim: Option[Long] = None,
      expectVersion: Option[String] = None): (DataFrame, Manifest) = {
    val m = readManifest(spark, dir)
    if (m.kind != "embeddings")
      throw ArtifactMismatch(s"$dir: kind '${m.kind}' != embeddings")
    expectVersion.filter(_ != m.version).foreach { v =>
      throw ArtifactMismatch(
        s"$dir: version '${m.version}' != expected '$v'")
    }
    expectDim.filter(_ != m.dim).foreach { d =>
      throw ArtifactMismatch(s"$dir: dim ${m.dim} != expected $d")
    }
    val payload = spark.read.parquet(s"$dir/vectors")
    val want = Seq("id" -> "bigint", "embedding" -> "array<float>")
    val got = payload.schema.fields
      .map(f => f.name -> f.dataType.simpleString).toSeq
    if (got != want)
      throw ArtifactMismatch(s"$dir: schema $got != contract $want")
    val stats = payload.agg(
      count(lit(1)), min(size(col("embedding"))),
      max(size(col("embedding")))).head()
    if (stats.getLong(0) != m.nRows)
      throw ArtifactMismatch(
        s"$dir: ${stats.getLong(0)} rows != manifest ${m.nRows}")
    if (stats.getInt(1) != m.dim || stats.getInt(2) != m.dim)
      throw ArtifactMismatch(
        s"$dir: vector dims ${stats.getInt(1)}..${stats.getInt(2)} " +
          s"!= manifest ${m.dim}")
    val dg = digestOf(payload, Seq("id", "embedding"))
    if (dg != m.digest)
      throw ArtifactMismatch(
        s"$dir: content digest $dg != manifest ${m.digest} — " +
          "payload was modified after the manifest was stamped")
    (payload, m)
  }

  // ——— tokenizers (ranked BPE merge lists, [[Bpe.train]]'s output) ———

  def tokenizerWrite(
      merges: Seq[(String, String)], model: String, version: String,
      dir: String, spark: SparkSession): Manifest = {
    import spark.implicits._
    require(merges.nonEmpty, "tokenizerWrite: empty merge list")
    val payload = merges.zipWithIndex
      .map { case ((a, b), r) => (r.toLong, a, b) }
      .toDF("rank", "a", "b")
    payload.coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
    val back = spark.read.parquet(s"$dir/merges")
    val m = Manifest("tokenizer", model, version, 0L,
      back.count(), digestOf(back, Seq("rank", "a", "b")))
    writeManifest(spark, m, dir)
    m
  }

  /** Load + validate a tokenizer artifact; returns the rank-ordered
    * merge list ready for [[Bpe.encodeWord]]/[[Bpe.encodeTokens]]
    * (driver-scale by the BPE contract — a merge list is ≤ vocab-size
    * rows) and the manifest. */
  def tokenizerRead(
      spark: SparkSession, dir: String,
      expectVersion: Option[String] = None)
      : (Seq[(String, String)], Manifest) = {
    val m = readManifest(spark, dir)
    if (m.kind != "tokenizer")
      throw ArtifactMismatch(s"$dir: kind '${m.kind}' != tokenizer")
    expectVersion.filter(_ != m.version).foreach { v =>
      throw ArtifactMismatch(
        s"$dir: version '${m.version}' != expected '$v'")
    }
    val payload = spark.read.parquet(s"$dir/merges")
    val want = Seq("rank" -> "bigint", "a" -> "string", "b" -> "string")
    val got = payload.schema.fields
      .map(f => f.name -> f.dataType.simpleString).toSeq
    if (got != want)
      throw ArtifactMismatch(s"$dir: schema $got != contract $want")
    val rows = payload.orderBy("rank").collect()
    if (rows.length.toLong != m.nRows)
      throw ArtifactMismatch(
        s"$dir: ${rows.length} merges != manifest ${m.nRows}")
    val dg = digestOf(payload, Seq("rank", "a", "b"))
    if (dg != m.digest)
      throw ArtifactMismatch(
        s"$dir: content digest $dg != manifest ${m.digest} — " +
          "payload was modified after the manifest was stamped")
    val ranks = rows.map(r => (r.getString(1), r.getString(2))).toSeq
    (ranks, m)
  }
}
