package graft

import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Native VectorDot must match the higher-order-function formulation
  * bit-for-bit (same fold order) and its null semantics. */
class VectorDotSpec extends SparkSpec {
  import spark.implicits._

  private def lambdaDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("matches the lambda fold bit-for-bit on float and double arrays") {
    val df = Seq(
      (Seq(1.5f, -2.25f, 3.125f), Seq(0.5, 2.0, -1.25)),
      (Seq(0.1f, 0.2f, 0.3f), Seq(0.3, 0.2, 0.1)),
      (Seq.empty[Float], Seq.empty[Double])
    ).toDF("a", "b")
    val rows = df.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      lambdaDot(col("a"), col("b")).as("lambda")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null array, null element, and length mismatch all yield null") {
    val df = Seq(
      (Some(Seq[Option[Double]](Some(1.0), None)), Some(Seq[Option[Double]](Some(1.0), Some(2.0)))),
      (None, Some(Seq[Option[Double]](Some(1.0)))),
      (Some(Seq[Option[Double]](Some(1.0))), Some(Seq[Option[Double]](Some(1.0), Some(2.0))))
    ).toDF("a", "b")
    val out = df.select(Similarity.dot(col("a"), col("b")).as("d")).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("SQL-registered vec_dot works") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(got === 11.0)
  }
}
