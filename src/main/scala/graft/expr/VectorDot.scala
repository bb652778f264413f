package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dot product of two numeric array columns as a native Catalyst
  * expression with codegen.
  *
  * Why it exists: Spark's higher-order functions (`zip_with`,
  * `aggregate`) evaluate their lambda per element INTERPRETED — the
  * idiomatic `aggregate(zip_with(a, b, _*_), 0d, _+_)` costs ~µs per
  * element, which dominates every similarity operator (SURVEY.md §2.10
  * escalation rule: built-ins → custom Expression). This emits a tight
  * primitive loop in generated code instead.
  *
  * Semantics match the lambda formulation: null array → null; a null
  * ELEMENT on either side → null result (null propagates through `*`
  * and `+`); lengths may differ (zip_with pads with null → null result
  * when the overhang is non-empty — here: shorter length wins only if
  * both are equal, else null, matching zip_with+aggregate exactly).
  * Elements may be any primitive numeric type (byte through double —
  * int8-quantized vectors dot natively); accumulation is double.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Null can arise from the VALUES (length mismatch, null element), not
  // only from null inputs — without this, non-nullable children would let
  // Catalyst constant-fold IsNull(vec_dot(..)) to false and codegen would
  // assign ev.isNull into a constant-false slot.
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(ByteType | ShortType | IntegerType | LongType |
                     FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects arrays of a primitive numeric type, got " +
        s"${left.dataType} / ${right.dataType}")
  }

  private def reader(e: Expression): (ArrayData, Int) => Double =
    elemType(e) match {
      case ByteType => (a, i) => a.getByte(i).toDouble
      case ShortType => (a, i) => a.getShort(i).toDouble
      case IntegerType => (a, i) => a.getInt(i).toDouble
      case LongType => (a, i) => a.getLong(i).toDouble
      case FloatType => (a, i) => a.getFloat(i).toDouble
      case DoubleType => (a, i) => a.getDouble(i)
    }

  private def getterName(e: Expression): String = elemType(e) match {
    case ByteType => "getByte"
    case ShortType => "getShort"
    case IntegerType => "getInt"
    case LongType => "getLong"
    case FloatType => "getFloat"
    case DoubleType => "getDouble"
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    val ra = reader(left); val rb = reader(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += ra(a, i) * rb(b, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = getterName(left)
    val bGet = getterName(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.$aGet($i)) * ((double) $b.$bGet($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}
