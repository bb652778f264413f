package graft

import java.nio.file.Files

import graft.fixtures.BlockFixtures

/** CLI smoke (the reference's daemon surface, main.rs:85-131): both
  * pipeline modes run end-to-end through the mode dispatch, and the
  * backfill → transactions resume path picks up the recorded cut. */
class MainSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-main").toString

  test("actions and transactions modes run end-to-end via the CLI dispatch") {
    import graft.schema.Blocks.encoder
    val in = tmp(); val out = tmp()
    spark.createDataset(BlockFixtures.blocks(6))(encoder)
      .toDF().coalesce(1).write.mode("append").json(in)

    Main.run(Array("actions", in, out), spark)
    assert(spark.read.parquet(s"$out/actions").count() > 0)
    assert(spark.read.parquet(s"$out/events").count() > 0)

    Main.run(Array("transactions", in, out), spark)
    assert(spark.read.parquet(s"$out/transactions").count() > 0)
    assert(spark.read.parquet(s"$out/blocks").count() === 6)
  }

  test("backfill mode records a cut that a transactions run resumes from") {
    import graft.schema.Blocks.encoder
    val in = tmp(); val out = tmp()
    spark.createDataset(BlockFixtures.blocks(8))(encoder)
      .toDF().coalesce(1).write.mode("append").json(in)

    Main.run(Array("backfill", in, out), spark)
    val cut = graft.stream.BlockStream.backfillCut(spark, out)
    assert(cut.nonEmpty)

    // transactions mode auto-resumes from the recorded cut and completes
    // the pending frontier as new blocks arrive
    spark.createDataset(BlockFixtures.blocks(12).drop(8))(encoder)
      .toDF().coalesce(1).write.mode("append").json(in)
    Main.run(Array("transactions", in, out), spark)
    val n = spark.read.parquet(s"$out/transactions").count()
    assert(n > 0)
  }

  test("--skip-commit runs the full pipeline but writes nothing") {
    import graft.schema.Blocks.encoder
    val in = tmp(); val out = tmp()
    spark.createDataset(BlockFixtures.blocks(6))(encoder)
      .toDF().coalesce(1).write.mode("append").json(in)
    val listener = graft.stream.ProgressListener.attach(spark)
    try {
      Main.run(Array("actions", in, out, "--skip-commit"), spark)
      Main.run(Array("transactions", in, out, "--skip-commit"), spark)
      // the pipelines really executed: progress events carried real rows
      assert(listener.batches.get() > 0)
      assert(listener.totalInputRows.get() > 0)
      // ...and the output dir is untouched — no tables, no quarantine,
      // no checkpoints (dry runs checkpoint to an ephemeral temp dir so
      // they can never advance a live run's source offsets)
      assert(Option(new java.io.File(out).list()).getOrElse(Array.empty[String]).isEmpty)
      // a subsequent live run over the same input sees virgin state and
      // writes everything
      Main.run(Array("actions", in, out), spark)
      assert(spark.read.parquet(s"$out/actions").count() > 0)
    } finally spark.streams.removeListener(listener)
  }

  test("unknown mode raises a usage error") {
    intercept[IllegalArgumentException] {
      Main.run(Array("nonsense", "/tmp/a", "/tmp/b"), spark)
    }
  }
}
