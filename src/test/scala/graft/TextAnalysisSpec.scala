package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextAnalysis}

/** Value-level pins for the text-pipeline operators added on top of the
  * oracle checks (t8/t9/d7): scrubbing, repetition stats, keep-best
  * dedup survivor policy. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("scrubPii redacts emails and phone numbers, counts match") {
    val df = Seq(
      ("a", "write to bob@example.com or call +1 555 123 4567 now"),
      ("b", "no pii here"),
      ("c", "two mails x@y.io and a.b-c@d-e.org")).toDF("id", "t")
    val out = df.select(
      col("id"),
      TextAnalysis.countEmails(col("t")).as("n"),
      TextAnalysis.scrubPii(col("t")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(out("a")._1 === 1)
    assert(out("a")._2 === "write to [EMAIL] or call [PHONE] now")
    assert(out("b") === ((0, "no pii here")))
    assert(out("c")._1 === 2)
    assert(!out("c")._2.contains("@"))
  }

  test("repetitionProfile: totals, distinct and max frequency are exact") {
    val df = Seq((1L, "a a a b c"), (2L, "x y")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionProfile(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((5L, 3L, 3L)))
    assert(out(2L) === ((2L, 2L, 1L)))
  }

  test("nearDupClusters merges transitive chains to the min id") {
    // chain 1-2, 2-3 (one cluster), isolated pair 7-9, singleton 5 absent
    val pairs = Seq((2L, 3L), (1L, 2L), (7L, 9L)).toDF("id_a", "id_b")
    val out = Dedup.nearDupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("nearDupClusters equals driver union-find on random pair graphs") {
    // seeded random graphs (repo convention: raw scalacheck-free loop);
    // the distributed min-label fixpoint must equal classic union-find
    // with min-representative
    for (seed <- 0 until 15) {
      val rnd = new scala.util.Random(seed)
      val n = 2 + rnd.nextInt(30)
      val pairs = Seq.fill(1 + rnd.nextInt(40))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      if (pairs.nonEmpty) {
        // union-find reference
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int =
          if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val ids = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        val expected = ids.map(i => i -> find(i.toInt).toLong).toMap
        val got = Dedup.nearDupClusters(pairs.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // union-find reps are component minima because unions always
        // point larger roots at smaller ones and every id is its own
        // initial root
        assert(got === expected, s"seed=$seed pairs=$pairs")
      }
    }
  }

  test("dedupCorpusByNgram: one survivor per near-dup cluster, singletons kept") {
    // docs 1..3 share almost all trigrams (one cluster); 4 and 5 unique
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (4L, "completely different words in this document here now"),
      (5L, "and another unrelated text goes right here friends")).toDF("doc_id", "text")
    // score: favor doc 2 so the survivor is NOT just the min id
    val score = when(col("doc_id") === 2L, 100L).otherwise(lit(10L))
    val out = Dedup.dedupCorpusByNgram(docs, "doc_id", "text", score,
      threshold = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(out.keySet === Set(2L, 4L, 5L))
    assert(out(2L) === ((1L, 3L))) // cluster rooted at min id 1, 3 members
    assert(out(4L) === ((4L, 1L)))
    assert(out(5L) === ((5L, 1L)))
  }

  test("contamination: benchmark overlap fractions are exact") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"), // = benchmark doc
      (2L, "alpha beta gamma zeta eta theta iota"), // shares 1 of 5 shingles
      (3L, "totally unrelated words right here now")).toDF("doc_id", "text")
    val bench = docs.where(col("doc_id") === 1L)
    val out = Dedup.contamination(docs, "doc_id", "text", bench, "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((3L, 3L, 10000L))) // self: fully contaminated
    // doc 2: shingles of 7 tokens = 5; shares exactly "alpha beta gamma"
    assert(out(2L) === ((5L, 1L, 2000L)))
    assert(out(3L)._2 === 0L)
    assert(out(3L)._3 === 0L)
  }

  test("dedupKeepBest keeps the highest score, then the lowest id") {
    val df = Seq(
      (1L, "same text", 5L), (2L, "same text", 9L), (3L, "same text", 9L),
      (4L, "unique", 1L)).toDF("doc_id", "text", "q")
    val out = Dedup.dedupKeepBest(df, "doc_id", "text", col("q"))
      .select("doc_id", "n_dups")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // score 9 beats 5; among the two 9s the lower id (2) survives
    assert(out === Map(2L -> 3L, 4L -> 1L))
  }
}
