package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Packing

/** Two-phase prefix-sum packing must equal the serial cumsum, and chunk
  * ranges must tile the token stream without gaps or overlaps. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    // irregular token counts incl. a doc spanning many chunks and id gaps
    val rnd = new scala.util.Random(7)
    (0 until 300).filter(_ % 7 != 3).map { i =>
      (i.toLong, 1 + rnd.nextInt(if (i == 100) 2000 else 90))
    }.toDF("doc_id", "ntok")
  }

  test("packChunks equals the serial global-window cumsum") {
    val two = Packing
      .packChunks(corpus, "doc_id", "ntok", chunkSize = 128L, bucketWidth = 16L)
      .orderBy("doc_id").collect()
    val serial = corpus
      .withColumn("cum", sum(col("ntok")).over(
        Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"), col("ntok").cast("long").as("n_tokens"),
        expr("(cum - ntok) div 128").as("chunk_start"),
        expr("(cum - 1) div 128").as("chunk_end"))
      .orderBy("doc_id").collect()
    assert(two.toSeq == serial.toSeq)
  }

  test("chunk ranges are contiguous and cover every token exactly once") {
    val rows = Packing
      .packChunks(corpus, "doc_id", "ntok", chunkSize = 128L, bucketWidth = 16L)
      .orderBy("doc_id")
      .select("n_tokens", "chunk_start", "chunk_end")
      .as[(Long, Long, Long)].collect()
    var cum = 0L
    rows.foreach { case (n, cs, ce) =>
      assert(cs == cum / 128, s"start $cs vs cum $cum")
      assert(ce == (cum + n - 1) / 128)
      assert(cs <= ce)
      cum += n
    }
    // last chunk index matches total token count
    assert(rows.last._3 == (cum - 1) / 128)
  }

  test("chunkOverlap: strided windows tile with overlap, last clamps") {
    import graft.ext.Packing
    // 10 tokens, chunkSize 4, stride 3 → starts 0,3,6,9
    val docs = Seq((1L, (0 until 10).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Packing.chunkOverlap(docs, "doc_id", "text", 4, 3)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_tokens").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 4L), (1L, 4L), (2L, 4L), (3L, 1L)))
    // consecutive chunks overlap by chunkSize - stride = 1 token; every
    // token appears in at least one chunk (coverage)
    val covered = out.map { case (k, n) => (k * 3, k * 3 + n) }
    assert(covered.head._1 == 0 && covered.last._2 == 10)
    covered.sliding(2).foreach { case Array((_, e), (s2, _)) =>
      assert(s2 < e, "gap between consecutive chunks")
    }
  }

  test("empty-token docs are dropped, not mis-ranged") {
    val df = Seq((1L, 5), (2L, 0), (3L, 7)).toDF("doc_id", "ntok")
    val out = Packing.packChunks(df, "doc_id", "ntok", 4L, 2L)
      .orderBy("doc_id").select("doc_id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 3L))
  }

  test("budgetPrune equals the serial score-ordered cumsum at any band width") {
    val rnd = new scala.util.Random(31)
    val docs = (0 until 300).map { i =>
      (i.toLong, rnd.nextInt(10000).toLong, (rnd.nextInt(80) + 1).toLong)
    }
    val df = docs.toDF("doc_id", "score", "ntok").repartition(5)
    // serial reference: sort by (score desc, id), keep while cum <= B
    val sorted = docs.sortBy(d => (-d._2, d._1))
    val cums = sorted.scanLeft(0L)(_ + _._3).tail
    val want = sorted.zip(cums).takeWhile(_._2 <= 5000)
      .map { case (d, c) => (d._1, d._2, d._3, c) }.toSet
    for (band <- Seq(1L, 100L, 500L, 100000L)) {
      val got = Packing.budgetPrune(df, "doc_id", "score", "ntok",
        budget = 5000L, scoreBand = band)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got === want, s"band=$band")
    }
    // cum is strictly increasing (ntok >= 1), so takeWhile == filter
    assert(want.size == cums.count(_ <= 5000))
  }

  test("packingSweep: hand-computed fragmentation/padding per length, " +
    "and a plain-Scala replay on a random corpus at a forced band split") {
    import spark.implicits._
    // docs (3, 5, 4 tokens), cum = 3, 8, 12
    //   ctx 4: frags = doc2 only; 3 chunks; pad 0
    //   ctx 5: frags = doc2, doc3; 3 chunks; pad 3
    val docs = Seq((1L, 3L), (2L, 5L), (3L, 4L)).toDF("doc_id", "ntok")
    val out = graft.ext.Packing.packingSweep(
      docs, "doc_id", "ntok", ctxLens = Seq(4L, 5L))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(out(4L) === ((3L, 12L, 3L, 1L, 333333L, 0L)))
    assert(out(5L) === ((3L, 12L, 3L, 2L, 666666L, 3L)))

    // replay: 200 random-length docs, bucketWidth=16 forces multi-band
    // prefix sums; every cell must equal the serial definition
    val rnd = new scala.util.Random(7)
    val lens = (1L to 200L).map(i => i -> (1L + rnd.nextInt(600)))
    val big = lens.toDF("doc_id", "ntok")
    val swept = graft.ext.Packing.packingSweep(
      big, "doc_id", "ntok", ctxLens = Seq(512L), bucketWidth = 16L)
      .head()
    val cums = lens.map(_._2).scanLeft(0L)(_ + _).tail
    val total = cums.last
    val frag = lens.map(_._2).zip(cums).count { case (n, c) =>
      (c - n) / 512L != (c - 1) / 512L
    }.toLong
    assert(swept.getLong(1) === 200L)
    assert(swept.getLong(2) === total)
    assert(swept.getLong(3) === (total - 1) / 512L + 1L)
    assert(swept.getLong(4) === frag)
    assert(swept.getLong(6) === (512L - total % 512L) % 512L)
  }
}
