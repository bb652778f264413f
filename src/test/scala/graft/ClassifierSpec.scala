package graft

import org.apache.spark.sql.DataFrame
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

  test("OvR recovers the class of every doc on a separable 3-class " +
    "corpus; model is dense K*B; prediction deterministic under " +
    "repartition") {
    val docs = (0L until 30L).map { i =>
      val cls = (i % 3) match {
        case 0 => ("news", "politics election senate common filler")
        case 1 => ("code", "function return variable common filler")
        case _ => ("chat", "lol haha emoji common filler")
      }
      (i, cls._2, cls._1)
    }.toDF("doc_id", "text", "source")
    val model = Classifier.trainPerceptronOvR(
      docs, "doc_id", "text", "source", buckets = 64, iters = 5)
    assert(model.count() === 3L * 64)
    assert(model.select("cls").distinct().collect().map(_.getString(0))
      .toSet === Set("news", "code", "chat"))
    val pred = Classifier.predictOvR(docs, "doc_id", "text", model, 64)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 30L).foreach { i =>
      val want = (i % 3) match {
        case 0 => "news"; case 1 => "code"; case _ => "chat"
      }
      assert(pred(i) === want, s"doc $i")
    }
    val pred2 = Classifier.predictOvR(
      docs.repartition(7), "doc_id", "text", model, 64)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred === pred2)
  }

  test("OvR with two classes trains each class's weights identically " +
    "to the binary perceptron with that class as +1") {
    val docs = Seq(
      (1L, "alpha beta gamma", "a"), (2L, "beta gamma delta", "b"),
      (3L, "delta epsilon", "a"), (4L, "zeta eta theta alpha", "b"),
      (5L, "alpha alpha beta", "a"))
      .toDF("doc_id", "text", "source")
    val ovr = Classifier.trainPerceptronOvR(
      docs, "doc_id", "text", "source", buckets = 32, iters = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    Seq("a", "b").foreach { c =>
      val bin = Classifier.trainPerceptron(
        docs, "doc_id", "text", col("source") === c,
        buckets = 32, iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (0L until 32L).foreach { b =>
        assert(ovr((c, b)) === bin(b), s"cls $c bucket $b")
      }
    }
  }

  test("OvR: null-labeled docs are rest-side negatives for every class, " +
    "never a class of their own; all-null class column is rejected") {
    val docs = Seq(
      (1L, "alpha beta gamma", "a"), (2L, "beta gamma delta", "b"),
      (3L, "delta epsilon", "a"), (4L, "zeta eta theta alpha", "b"),
      (5L, "alpha alpha beta", null))
      .toDF("doc_id", "text", "source")
    val model = Classifier.trainPerceptronOvR(
      docs, "doc_id", "text", "source", buckets = 32, iters = 3)
    // null never becomes a class
    assert(model.select("cls").distinct().collect().map(_.getString(0))
      .toSet === Set("a", "b"))
    // the null-labeled doc participated as a NEGATIVE for both classes:
    // training each binary problem directly with doc 5 labeled false
    // reproduces the OvR weights exactly
    val ovr = model.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    Seq("a", "b").foreach { c =>
      val bin = Classifier.trainPerceptron(
        docs, "doc_id", "text",
        coalesce(col("source") === c, lit(false)),
        buckets = 32, iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (0L until 32L).foreach { b =>
        assert(ovr((c, b)) === bin(b), s"cls $c bucket $b")
      }
    }
    val allNull = Seq((1L, "alpha", null: String), (2L, "beta", null: String))
      .toDF("doc_id", "text", "source")
    val err = intercept[IllegalArgumentException] {
      Classifier.trainPerceptronOvR(
        allNull, "doc_id", "text", "source", buckets = 8, iters = 1)
    }
    assert(err.getMessage.contains("no non-null"))
  }

  test("OvR argmax ties break by class name ascending") {
    // two classes with identical corpora => identical weights =>
    // every margin ties => 'x' (asc-first) wins everywhere
    val docs = Seq(
      (1L, "same words here", "x"), (2L, "same words here", "y"))
      .toDF("doc_id", "text", "source")
    val model = Classifier.trainPerceptronOvR(
      docs, "doc_id", "text", "source", buckets = 16, iters = 2)
    val pred = Classifier.predictOvR(docs, "doc_id", "text", model, 16)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred === Map(1L -> "x", 2L -> "x"))
  }

  test("averaged perceptron: on a non-separable fixture where " +
    "final-iterate weights oscillate with period 2, the snapshot-sum " +
    "model's predictions are stable across iters; W_avg equals the " +
    "hand-summed per-round snapshots") {
    // A "x x" (+), B "x y" (-), C "y" (+) is non-separable and cycles:
    // w1 = (x:+1), w2 = 0, w3 = w1, ... — adding one round flips doc
    // A's final-iterate prediction between 1 and 0 forever.
    val docs = Seq(
      (1L, "xray xray", true), (2L, "xray yankee", false),
      (3L, "yankee", true)).toDF("doc_id", "text", "good")
    val B = 256
    def preds(model: DataFrame): Map[Long, Long] =
      Classifier.scoreDocs(docs, "doc_id", "text", model, B)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // final-iterate: doc 1 prediction depends on iters parity
    val finByIters = (3 to 6).map { n =>
      preds(Classifier.trainPerceptron(
        docs, "doc_id", "text", col("good"), B, iters = n))(1L)
    }
    assert(finByIters === Seq(1L, 0L, 1L, 0L)) // the oscillation
    // averaged: stable at every horizon
    val avgByIters = (3 to 6).map { n =>
      preds(Classifier.trainPerceptronAveraged(
        docs, "doc_id", "text", col("good"), B, iters = n))(1L)
    }
    assert(avgByIters === Seq(1L, 1L, 1L, 1L))
    // W_avg is exactly the sum of the per-round final-iterate
    // snapshots (integer-exact, no normalization)
    val snapSum = (1 to 4).map { r =>
      Classifier.trainPerceptron(
        docs, "doc_id", "text", col("good"), B, iters = r)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    }.reduce((a, b) => a.map { case (k, v) => k -> (v + b(k)) })
    val avg4 = Classifier.trainPerceptronAveraged(
      docs, "doc_id", "text", col("good"), B, iters = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(avg4 === snapSum)
    // OvR averaged: scale-invariant argmax — on a separable corpus the
    // averaged model predicts identically to the final-iterate model
    val docs3 = (0L until 30L).map { i =>
      val cls = (i % 3) match {
        case 0 => ("news", "politics election senate common filler")
        case 1 => ("code", "function return variable common filler")
        case _ => ("chat", "lol haha emoji common filler")
      }
      (i, cls._2, cls._1)
    }.toDF("doc_id", "text", "source")
    val avgOvr = Classifier.trainPerceptronOvRAveraged(
      docs3, "doc_id", "text", "source", buckets = 64, iters = 5)
    val p = Classifier.predictOvR(docs3, "doc_id", "text", avgOvr, 64)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 30L).foreach { i =>
      val want = (i % 3) match {
        case 0 => "news"; case 1 => "code"; case _ => "chat"
      }
      assert(p(i) === want, s"doc $i")
    }
  }

  test("prCurve matches a hand computation at granularity 1 and floors " +
    "negative margins correctly at granularity 4") {
    val scores = Seq((1L, 10L), (2L, 5L), (3L, -3L), (4L, 0L))
      .toDF("doc_id", "margin")
    val truth = Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 0L))
      .toDF("doc_id", "y01")
    val g1 = Classifier.prCurve(scores, truth, 1L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(g1(10L) === ((1L, 1L, 10000L, 5000L)))
    assert(g1(5L) === ((2L, 1L, 5000L, 5000L)))
    assert(g1(0L) === ((3L, 1L, 3333L, 5000L)))
    assert(g1(-3L) === ((4L, 2L, 5000L, 10000L)))
    // granularity 4: 10→8, 5→4, 0→0, -3→-4 (floor, not trunc-to-zero)
    val g4 = Classifier.prCurve(scores, truth, 4L)
      .collect().map(_.getLong(0)).toSet
    assert(g4 === Set(8L, 4L, 0L, -4L))
  }

  test("prCurve with zero positives reports rec_e4 = 0 on every row") {
    val scores = Seq((1L, 7L), (2L, -2L)).toDF("doc_id", "margin")
    val truth = Seq((1L, 0L), (2L, 0L)).toDF("doc_id", "y01")
    val rows = Classifier.prCurve(scores, truth, 1L).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(4) === 0L)
      assert(r.getLong(2) === 0L)
    }
  }
}
