package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.ext.Dedup
import graft.query.Stats
import PropertySampling.forAllSeeded

/** Randomized invariants for the round-8 sketch operators: the Bloom
  * prefilter is correctness-transparent on ARBITRARY corpora (not just
  * the crafted DedupSpec fixture), and Count-Min honors its
  * over-estimate-only / error-bound contract under random key skew.
  * Deterministic sequential seeds (PropertySampling) — no flake band.
  */
class SketchPropertySpec extends SparkSpec {
  import spark.implicits._

  private val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")

  private val genCorpus: Gen[List[String]] = Gen.listOfN(
    40, Gen.chooseNum(5, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(words)).map(_.mkString(" "))))

  test("bloom decontam ≡ exact semi-join on random corpora (property)") {
    forAllSeeded(Gen.zip(genCorpus, Gen.chooseNum(1, 8)), n = 10) {
      case (texts, nEval) =>
        val corpus = texts.zipWithIndex
          .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val eval = corpus.where(col("doc_id") < nEval)
        val evalShingles = eval
          .select(explode(Dedup.shingleHashes(col("text"))).as("g"))
          .distinct()
        val exact = corpus
          .select(col("doc_id"),
            explode(Dedup.shingleHashes(col("text"))).as("g"))
          .join(evalShingles, Seq("g"), "left_semi")
          .groupBy("doc_id").count()
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val got = Dedup
          .bloomDecontam(corpus, "doc_id", "text", eval, "text", fpp = 0.3)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(got === exact)
        spark.catalog.clearCache()
    }
  }

  test("CMS contract on random skewed keys: over-estimate-only, and the " +
    "ε-bound holds corpus-wide (property)") {
    // Zipf-ish skew: key k drawn with weight ~ 1/(k+1)
    val genKeys: Gen[List[Long]] = Gen.listOfN(
      600, Gen.frequency((1 to 40).map(k => (40 / k, Gen.const(k.toLong))): _*))
    forAllSeeded(genKeys, n = 8) { keys =>
      val width = 16 // << 40 distinct keys: collisions guaranteed
      val df = keys.zipWithIndex.map { case (k, i) => (k, i % 3) }
        .toDF("k", "slice")
      val exact = keys.groupBy(identity).map { case (k, v) =>
        (k, v.size.toLong) }
      val est = Stats.cmsEstimates(df, "k", col("slice"), width = width)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(est.keySet === exact.keySet)
      val n = keys.size.toLong
      for ((k, c) <- exact) {
        assert(est(k) >= c, s"under-count at $k")
        // the classic CMS bound est ≤ exact + 2n/width holds w.p.
        // 1−2⁻⁴ PER KEY; across 40 keys a few excursions are allowed —
        // the hard cap here is the trivially-true est ≤ n
        assert(est(k) <= n)
      }
      val bound = 2 * n / width
      val withinBound = exact.count { case (k, c) => est(k) - c <= bound }
      assert(withinBound >= exact.size * 3 / 4,
        s"only $withinBound/${exact.size} keys within ε-bound $bound")
      spark.catalog.clearCache()
    }
  }
}
