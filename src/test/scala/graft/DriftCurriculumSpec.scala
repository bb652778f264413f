package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Similarity, Splits}

/** Semantics pins for the round-10 analysis operators: label-drift MMD
  * (s22), D4 prototypicality (s23) and the curriculum plan (t43). */
class DriftCurriculumSpec extends AnyFunSuite with SparkSpec {

  test("labelDrift: planted mean shift is recovered exactly, " +
    "invariant to partitioning") {
    import spark.implicits._
    // label 0 at (0.5, 0, ...), label 1 at (0.25, 0.1, ...) — exact
    // e6 quantities so the floored means are the planted values
    val dim = 4
    val a = Seq.fill(8)(Array(0.5f, 0f, 0f, 0f))
    val b = Seq.fill(5)(Array(0.25f, 0.1f, 0f, 0f))
    val df = (a.map((_, 0)) ++ b.map((_, 1)))
      .toDF("embedding", "label")
    def run(parts: Int) = Similarity
      .labelDrift(df.repartition(parts), "embedding", "label")
      .select("lbl_a", "lbl_b", "n_a", "n_b", "mmd2_e12",
        "top_dim", "top_absdiff_e6")
      .head()
    val r = run(5)
    assert((r.getLong(0), r.getLong(1)) == (0L, 1L))
    assert((r.getLong(2), r.getLong(3)) == (8L, 5L))
    // means_e6: a = (500000, 0), b = (250000, 100000)
    // Δ = (250000, -100000) → mmd2 = 250000² + 100000²
    val wantMmd2 = 250000L * 250000L + 100000L * 100000L
    assert(r.getLong(4) == wantMmd2)
    assert(r.getLong(5) == 0L) // dim 0 drifts most
    assert(r.getLong(6) == 250000L)
    assert(run(1) == r && run(13) == r) // associative integer sums
    assert(dim == 4) // fixture shape documented
  }

  test("labelDrift: floored mean is floor, not truncation, on " +
    "negative sums") {
    import spark.implicits._
    // three vectors at -0.1 → sum_e6 = -300000, n = 3, mean = -100000;
    // and a 2-vector label where -0.15 and -0.2 → mean floor(-175000.0)
    val df = Seq(
      (Array(-0.1f), 0), (Array(-0.1f), 0), (Array(-0.1f), 0),
      (Array(-0.15f), 1), (Array(-0.2f), 1))
      .toDF("embedding", "label")
    val r = Similarity.labelDrift(df, "embedding", "label").head()
    // means: a = -100000, b = floor((-150000 + -200000)/2) = -175000
    val d = -100000L - (-175000L)
    assert(r.getAs[Long]("mmd2_e12") == d * d)
  }

  test("prototypicality: ranks are a permutation per cluster, " +
    "percentiles bounded, prune fraction ~pruneE4") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val vecs = (1L to 200L).map { i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val out = Similarity.prototypicality(
      vecs, "vec_id", "embedding", k = 4, pruneE4 = 2000L, dim = Some(8))
      .collect()
    assert(out.length == 200)
    val byCluster = out.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (_, rows) =>
      val ranks = rows.map(_.getAs[Long]("rank_in_cluster")).sorted
      assert(ranks.toSeq == (1L to rows.length.toLong)) // dense permutation
      val n = rows.head.getAs[Long]("n_cluster")
      assert(n == rows.length.toLong)
      rows.foreach { r =>
        val pct = r.getAs[Long]("pct_e4")
        assert(pct >= 1L && pct <= 10000L)
        assert((r.getAs[Long]("is_pruned") == 1L) == (pct <= 2000L))
      }
    }
    // global prune fraction ≈ 20% (ragged cluster sizes make it inexact)
    val pruned = out.count(_.getAs[Long]("is_pruned") == 1L)
    assert(pruned > 20 && pruned < 60, s"pruned $pruned of 200")
  }

  test("prototypicality: rank 1 is the vector most aligned with its " +
    "cluster centroid (a planted prototype wins)") {
    import spark.implicits._
    // one tight cluster around +e1 with a dead-center prototype, one
    // around -e1; the prototype must be rank 1 in its cluster
    val proto = (1L, Array(1f, 0f, 0f, 0f))
    val near = (2L to 20L).map { i =>
      (i, Array(0.9f + 0.005f * (i % 3), 0.05f * (i % 2), 0f, 0f))
    }
    val far = (21L to 40L).map(i => (i, Array(-1f, 0.01f * (i % 5), 0f, 0f)))
    val df = (Seq(proto) ++ near ++ far).toDF("vec_id", "embedding")
    val out = Similarity.prototypicality(
      df, "vec_id", "embedding", k = 2, pruneE4 = 1000L, dim = Some(4))
      .collect()
    val protoRow = out.find(_.getAs[Long]("vec_id") == 1L).get
    val sameCluster = out.filter(
      _.getAs[Long]("cluster_id") == protoRow.getAs[Long]("cluster_id"))
    // the planted prototype is (tied-)best aligned: cosine exactly 1
    assert(protoRow.getAs[Long]("score_e6") ==
      sameCluster.map(_.getAs[Long]("score_e6")).max)
  }

  test("curriculumPlan: uniform scores give equal deciles; counts " +
    "sum to n; avg within [min, max]") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, (i % 100) + 1)).toDF("id", "q")
    val out = Splits.curriculumPlan(df.select(col("q")), "q").collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == 1000L)
    assert(out.length == 10)
    assert(out.forall(_.getAs[Long]("n_docs") == 100L))
    out.foreach { r =>
      val (mn, mx, av) = (r.getAs[Long]("min_q_e4"),
        r.getAs[Long]("max_q_e4"), r.getAs[Long]("avg_q_e4"))
      assert(av >= mn && av <= mx)
    }
    // buckets partition the score range in order
    val sorted = out.sortBy(_.getAs[Long]("bucket"))
    sorted.sliding(2).foreach { w =>
      assert(w(0).getAs[Long]("max_q_e4") < w(1).getAs[Long]("min_q_e4"))
    }
  }

  test("psiDrift: a source matching the global distribution scores " +
    "~0; one concentrated in a single decile is flagged") {
    import spark.implicits._
    // global deciles come from everyone; source "uni" is uniform over
    // the full score range (mirrors the global mix), source "spike"
    // sits entirely in one bucket
    val uni = (1L to 1000L).map(i => ("uni", (i % 100) + 1))
    val spike = (1L to 500L).map(_ => ("spike", 7L))
    val df = (uni ++ spike).toDF("source", "q")
    val out = Splits.psiDrift(df, "source", "q")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out("spike").getAs[Long]("flagged") == 1L,
      s"spike: ${out("spike")}")
    assert(out("spike").getAs[Long]("psi_e6") >
      out("uni").getAs[Long]("psi_e6"))
    assert(out("uni").getAs[Long]("n_docs") == 1000L)
    assert(out("spike").getAs[Long]("n_docs") == 500L)
    // a clone corpus where every source IS the global mix: nothing
    // flags (psi within the Laplace-smoothing floor)
    val even = (1L to 400L).flatMap(i =>
      Seq(("a", (i % 40) + 1), ("b", (i % 40) + 1)))
    val ev = Splits.psiDrift(even.toDF("source", "q"), "source", "q")
      .collect()
    ev.foreach(r => assert(r.getAs[Long]("flagged") == 0L, r.toString))
  }

  test("curriculumPlan: a dominant score mass collapses buckets " +
    "deterministically (skipped bucket numbers, not wrong counts)") {
    import spark.implicits._
    // 90% of docs share one score → the first 9 thresholds coincide
    val df = ((1L to 900L).map(i => (i, 50L)) ++
      (901L to 1000L).map(i => (i, 100L))).toDF("id", "q")
    val out = Splits.curriculumPlan(df.select(col("q")), "q").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_docs")))
      .toMap
    assert(out.values.sum == 1000L)
    assert(out(1L) == 900L) // the mass sits in bucket 1
    assert(out.keys.max == 10L) // the tail lands in the last bucket
    assert(out.size == 2) // everything between is skipped
  }
}
