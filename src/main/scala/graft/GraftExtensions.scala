package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expr.Base58Encode
import org.apache.spark.sql.graft.ColumnBridge

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so the raw-SQL surface can
  * use them like built-ins:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * spark.sql("SELECT base58(unhex(sha2(code, 256))) FROM t")
  * }}}
  *
  * Scalar functions that are pure compositions of built-ins
  * (text_or_base64, parse_u128, …) don't need registration — they're
  * Columns from `graft.functions`; only genuinely new expressions
  * (Base58Encode) go through the extension hook.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.NanosPredicatePushdown)
    e.injectFunction((
      FunctionIdentifier("base58"),
      new ExpressionInfo(classOf[Base58Encode].getName, "base58"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "base58 expects exactly one argument")
        Base58Encode(args.head)
      }))
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[graft.expr.VectorDot].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot expects exactly two arguments")
        graft.expr.VectorDot(args.head, args(1))
      }))
    e.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(
        classOf[graft.expr.NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize expects exactly one argument")
        graft.expr.NfcNormalize(args.head)
      }))
    e.injectFunction((
      FunctionIdentifier("bounded_top_k"),
      new ExpressionInfo(
        classOf[graft.expr.BoundedTopK].getName, "bounded_top_k"),
      GraftExtensions.boundedTopKBuilder))
    e.injectFunction((
      FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(
        classOf[graft.expr.KmvSketch].getName, "kmv_sketch"),
      GraftExtensions.kmvSketchBuilder))
  }
}

object GraftExtensions {
  /** SQL builder for the bounded top-k AGGREGATE (the analyzer wraps
    * a resolved AggregateFunction in AggregateExpression itself):
    * `bounded_top_k(score, id, k)` with k a positive integer literal
    * — the buffer is sized at plan time, so a column-valued k cannot
    * exist. */
  private[graft] val boundedTopKBuilder: Seq[Expression] => Expression =
    (args: Seq[Expression]) => {
      require(args.length == 3,
        "bounded_top_k expects (score bigint, id bigint, k int literal)")
      import org.apache.spark.sql.catalyst.expressions.Literal
      val kLong: Long = args(2) match {
        case Literal(v: Int, _) => v.toLong
        case Literal(v: Long, _) => v
        case _ => throw new IllegalArgumentException(
          "bounded_top_k: k must be an integer literal")
      }
      require(kLong >= 1 && kLong <= Int.MaxValue,
        s"bounded_top_k: k must be in [1, ${Int.MaxValue}], got $kLong")
      graft.expr.BoundedTopK(args.head, args(1), kLong.toInt)
    }

  /** SQL builder for the KMV distinct-sketch AGGREGATE:
    * `kmv_sketch(hash, k)` with k a positive integer literal — the
    * bounded distinct set is sized at plan time. */
  private[graft] val kmvSketchBuilder: Seq[Expression] => Expression =
    (args: Seq[Expression]) => {
      require(args.length == 2,
        "kmv_sketch expects (hash bigint, k int literal)")
      import org.apache.spark.sql.catalyst.expressions.Literal
      val kLong: Long = args(1) match {
        case Literal(v: Int, _) => v.toLong
        case Literal(v: Long, _) => v
        case _ => throw new IllegalArgumentException(
          "kmv_sketch: k must be an integer literal")
      }
      // k >= 2 matches the Column API (Kmv.sketch): the estimator
      // divides by k-1, so a k=1 sketch would estimate 0 for every
      // full group — reject it at plan time on BOTH surfaces
      require(kLong >= 2 && kLong <= Int.MaxValue,
        s"kmv_sketch: k must be in [2, ${Int.MaxValue}], got $kLong")
      graft.expr.KmvSketch(args.head, kLong.toInt)
    }

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "base58",
      (args: Seq[Expression]) => {
        require(args.length == 1, "base58 expects exactly one argument")
        Base58Encode(args.head)
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot",
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot expects exactly two arguments")
        graft.expr.VectorDot(args.head, args(1))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize",
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize expects exactly one argument")
        graft.expr.NfcNormalize(args.head)
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bounded_top_k", boundedTopKBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_sketch", kmvSketchBuilder, "scala_udf")
  }
}
