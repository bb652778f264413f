package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Base58 (Bitcoin alphabet) rendering of a binary column — NEAR renders
  * every hash (`CryptoHash::hash_bytes(..).to_string()`,
  * /root/reference/src/actions.rs:514-519) as base58(sha256). Spark has
  * no built-in base58, so this is a custom Catalyst Expression
  * (SURVEY.md §2.10): null-safe, deterministic, foldable under constant
  * inputs. Codegen calls straight into [[Base58.encode]] — one static
  * call, no row-level reflection — so the expression doesn't break a
  * WholeStageCodegen span (it's only on the DEPLOY_CONTRACT branch of
  * the actions projection, but there's no reason to be the fallback
  * island there).
  */
object Base58 {
  private val Alphabet =
    "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz".toCharArray

  def encode(input: Array[Byte]): String = {
    if (input.isEmpty) return ""
    var zeros = 0
    while (zeros < input.length && input(zeros) == 0) zeros += 1
    // big-endian base-256 → base-58 long division
    val digits = new Array[Byte](input.length * 2)
    var digitsLen = 0
    var i = zeros
    while (i < input.length) {
      var carry = input(i) & 0xff
      var j = 0
      while (j < digitsLen || carry != 0) {
        val v = carry + 256 * (if (j < digitsLen) digits(j) else 0)
        digits(j) = (v % 58).toByte
        carry = v / 58
        j += 1
      }
      digitsLen = j
      i += 1
    }
    val sb = new java.lang.StringBuilder(zeros + digitsLen)
    var z = 0
    while (z < zeros) { sb.append('1'); z += 1 }
    var d = digitsLen - 1
    while (d >= 0) { sb.append(Alphabet(digits(d))); d -= 1 }
    sb.toString
  }
}

case class Base58Encode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  // Analysis-time rejection of non-binary args — the function is
  // SQL-registered, so raw SQL like base58('abc') must fail cleanly
  // rather than ClassCastException at runtime. (ExpectsInputTypes is not
  // implementable outside the sql package in Spark 4 — AbstractDataType
  // is private[sql] — so this is the direct checkInputDataTypes form.)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"base58 expects BINARY, got ${child.dataType.simpleString}")
  override def nullSafeEval(bytes: Any): Any =
    UTF8String.fromString(Base58.encode(bytes.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.expr.Base58.encode($c))")
  override protected def withNewChildInternal(c: Expression): Base58Encode =
    copy(child = c)
  override def prettyName: String = "base58"
}
