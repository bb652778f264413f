package graft

import org.apache.spark.sql.functions._
import graft.ext.{Pca, PcaOracle}

/** Planted-direction correctness for the integer power-iteration PCA. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  // 200 vectors: strong variance along axis 1 (±10), small deterministic
  // jitter elsewhere — the top principal component is e1 by construction
  private lazy val planted = (0 until 200).map { i =>
    val sign = if (i % 2 == 0) 1.0 else -1.0
    (i.toLong, Array.tabulate(dim) { d =>
      if (d == 0) (sign * 10.0 + (i % 7) * 0.01).toFloat
      else (((i * (d + 3)) % 11) * 0.05 - 0.25).toFloat
    })
  }.toDF("vec_id", "embedding")

  test("top component recovers a planted dominant axis, e6-normalized") {
    val eig = Pca.topComponent(spark, planted, "embedding", dim)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(eig.size === dim)
    // max-magnitude coordinate is the planted axis, at exactly 1e6
    assert(math.abs(eig(1L)) === 1000000L, eig)
    // every other loading is comparatively tiny
    for (d <- 2 to dim) assert(
      math.abs(eig(d.toLong)) < 100000L, s"dim $d: ${eig(d.toLong)}")
  }

  test("fixed-round iteration is deterministic across runs") {
    val a = Pca.topComponent(spark, planted, "embedding", dim).collect().toSeq
    val b = Pca.topComponent(spark, planted, "embedding", dim).collect().toSeq
    assert(a === b)
  }

  test("removeComponent zeroes the projection along the component") {
    val eig = Pca.topComponent(spark, planted, "embedding", dim)
      .orderBy("dim_idx").collect().map(_.getLong(1))
    val cleaned = Pca.removeComponent(planted, "embedding", eig)
    val norm = math.sqrt(eig.map(v => v.toDouble * v).sum)
    val unitCol = array(eig.map(v => lit(v / norm)): _*)
    val residual = cleaned
      .select(abs(aggregate(
        zip_with(col("embedding"), unitCol, (a, b) => a.cast("double") * b),
        lit(0d), (acc, x) => acc + x)).as("r"))
      .agg(max(col("r"))).head.getDouble(0)
    // float re-cast of the cleaned vectors bounds the leftover projection
    assert(residual < 1e-3, s"residual projection $residual")
  }

  test("oracle SQL text mirrors the engine's geometry knobs") {
    val sql = PcaOracle.sql(dim = dim, iters = 60)
    assert(sql.contains(s"range(1, ${dim + 1})"))
    assert(sql.contains("v60") && !sql.contains("v61"))
    assert(sql.contains("AS MATERIALIZED"))
  }
}
