package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The dedup family's portable 60-bit hash
  * `conv(substring(md5(x), 1, 15), 16, 10)` as ONE native expression.
  *
  * Why it exists (r14 optimization round): `Dedup.pmd5` sits under
  * every inverted index, minhash signature, winnow fingerprint and
  * sampling gate in the pack — the sf0.1 inverted-index build alone
  * evaluates it ~530k times per query (~40 s of task time measured,
  * the single largest shared cost of the d/t families). The composed
  * form pays an MD5 *hex string* render, a `substring`, and `conv`'s
  * radix-parse per call plus the intermediate UTF8String allocations;
  * the first 15 hex digits are just the first 60 BITS of the digest,
  * so the same value is the big-endian long of the first 8 digest
  * bytes shifted right by 4 — no hex render, no parse, no
  * intermediates.
  *
  * Value contract (spec-pinned equal to the composed form, which the
  * DuckDB oracles replay as `('0x'||substr(md5(x),1,15))::BIGINT`):
  * non-negative 60-bit long; null input → null. Input must already be
  * a string ([[graft.ext.Dedup.pmd5]] keeps its `cast("string")`).
  */
case class PortableMd5(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pmd5 expects a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    PortableMd5.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.PortableMd5.hash60($c)")

  override protected def withNewChildInternal(
      newChild: Expression): PortableMd5 = copy(child = newChild)

  override def prettyName: String = "pmd5"
}

object PortableMd5 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of MD5(bytes of `s`) as a non-negative long —
    * bit-equal to `conv(substring(md5(s), 1, 15), 16, 10)`. */
  def hash60(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // big-endian long of bytes 0..7, then drop the low nibble (the
    // 16th hex digit): 15 hex digits = 60 bits
    val top =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }
}
