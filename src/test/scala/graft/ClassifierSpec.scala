package graft

import org.apache.spark.sql.functions._
import graft.ext.Classifier

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("perceptron separates a separable corpus: every doc correctly " +
    "classified after training; margins side with the label") {
    // positives speak 'signal'; negatives speak 'noise' — linearly
    // separable in any hash space where the two words don't collide
    val docs = (0L until 20L).map { i =>
      if (i % 2 == 0) (i, "signal signal carrier common word")
      else (i, "noise noise carrier common word")
    }.toDF("doc_id", "text")
    val scored = Classifier.perceptronFilter(
      docs, "doc_id", "text", col("text").contains("signal"),
      buckets = 64, iters = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    (0L until 20L).foreach { i =>
      val (m, pred) = scored(i)
      if (i % 2 == 0) { assert(m > 0, s"doc $i"); assert(pred === 1L) }
      else { assert(m <= 0, s"doc $i"); assert(pred === 0L) }
    }
  }

  test("trained weights are dense (exactly `buckets` rows), integer, " +
    "and deterministic across runs and partitionings") {
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "beta gamma delta"),
      (3L, "delta epsilon"), (4L, "zeta eta theta alpha"))
      .toDF("doc_id", "text")
    val w1 = Classifier.trainPerceptron(
      docs, "doc_id", "text", col("doc_id") <= 2, buckets = 32, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w1.size === 32)
    assert(w1.keySet === (0L until 32L).toSet)
    val w2 = Classifier.trainPerceptron(
      docs.repartition(7), "doc_id", "text", col("doc_id") <= 2,
      buckets = 32, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w1 === w2)
  }

  test("zero-token and unseen-vocabulary docs score margin 0 / pred 0; " +
    "scoring zero-fills over all input ids") {
    val train = Seq(
      (1L, "good text here"), (2L, "bad text here"))
      .toDF("doc_id", "text")
    val model = Classifier.trainPerceptron(
      train, "doc_id", "text", col("text").contains("good"),
      buckets = 16, iters = 3)
    val apply = Seq(
      (10L, ""), // empty doc: the '' token may share a bucket — margin
                 // is whatever that bucket holds, but the row EXISTS
      (11L, "completely novel vocabulary"),
      (12L, "good good good"))
      .toDF("doc_id", "text")
    val got = Classifier.scoreDocs(apply, "doc_id", "text", model, 16)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got.keySet === Set(10L, 11L, 12L)) // zero-fill: no dropped ids
    assert(got(12L)._1 > 0 && got(12L)._2 === 1L)
    // pred is the strict margin>0 gate everywhere
    got.values.foreach { case (m, p) =>
      assert(p === (if (m > 0) 1L else 0L))
    }
  }

  test("all-one-class supervision drives every weight non-negative " +
    "(y=+1 everywhere: updates only add counts) and empty frames " +
    "return the zero model") {
    val docs = Seq((1L, "a b c"), (2L, "c d")).toDF("doc_id", "text")
    val w = Classifier.trainPerceptron(
      docs, "doc_id", "text", lit(true), buckets = 8, iters = 2)
      .collect().map(_.getLong(1))
    assert(w.forall(_ >= 0) && w.sum > 0)
    val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val w0 = Classifier.trainPerceptron(
      none, "doc_id", "text", lit(true), buckets = 8, iters = 2)
      .collect().map(_.getLong(1))
    assert(w0.length === 8 && w0.forall(_ === 0L))
    spark.catalog.clearCache()
  }
}
