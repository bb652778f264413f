package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Restores parquet pushdown for time-range predicates on the derived
  * nanos view of `events.ts`.
  *
  * The engine contract is `ts` = Long epoch NANOS (F11); when the
  * fixture ships ts as a native µs timestamp, `Tables.load` derives
  * `unix_micros(ts) * 1000`. A filter `derived ⋈ <nanos literal>`
  * would then sit ABOVE a projection — the parquet source never sees
  * it, and a 100 TB time-range scan reads every row group. This rule
  * is the missing algebra (the same shape as Spark's own
  * `UnwrapCastInBinaryComparison`): a comparison of a µs→ns affine map
  * of a timestamp attribute against a long literal is rewritten to a
  * direct `attribute ⋈ timestamp-literal` comparison with
  * ceiling/floor-corrected bounds, which the V1 parquet source pushes
  * down (PlanSpec "events range scan" pins `PushedFilters`).
  *
  * Guards: the µs count is exact (`unix_micros` of the column, no
  * truncation); the rewrite intentionally assumes non-wrapping
  * timestamps — parquet INT64 µs can technically hold any Long, and
  * for |µs| > Long.MaxValue/1000 the original non-ANSI multiply would
  * wrap while the rewritten predicate evaluates the true range, but no
  * real timestamp (the representable range ends ~year 294247) comes
  * within 2000× of that bound; and NTZ-typed attributes are only
  * unwrapped when the enclosing cast runs under UTC (the session zone
  * `Tables.configure` pins), where NTZ→TZ is value-preserving.
  *
  * Null semantics: every rewrite keeps the attribute inside the
  * comparison, so NULL in → NULL out is preserved. The one case that
  * would otherwise drop the attribute — equality against a literal
  * that is not µs-aligned — rewrites to
  * `If(IsNull(attr), null, false)` rather than bare `false`, so the
  * rule stays a pure expression-level equivalence and is safe under
  * `transformAllExpressions` (e.g. a projected boolean
  * `unix_micros(ts)*1000 = n` stays NULL for NULL ts).
  */
object NanosPredicatePushdown extends Rule[LogicalPlan] {

  /** Matches `unix_micros(ts) * 1000` (either operand order) over a
    * bare timestamp attribute, yielding the attribute and its type. */
  private object NanosOfAttr {
    def unapply(e: Expression): Option[(Attribute, DataType)] = e match {
      case Multiply(UnixMicros(inner), Literal(1000L, LongType), _) =>
        attrOf(inner)
      case Multiply(Literal(1000L, LongType), UnixMicros(inner), _) =>
        attrOf(inner)
      case _ => None
    }
    private def attrOf(inner: Expression): Option[(Attribute, DataType)] =
      inner match {
        case a: AttributeReference if a.dataType == TimestampType =>
          Some((a, TimestampType))
        case Cast(a: AttributeReference, TimestampType, tz, _)
            if a.dataType == TimestampNTZType &&
              tz.exists(z => z == "UTC" || z == "Etc/UTC" || z == "Z") =>
          Some((a, TimestampNTZType))
        case _ => None
      }
  }

  private def tsLit(micros: Long, dt: DataType): Literal = Literal(micros, dt)

  /** Non-µs-aligned equality is unsatisfiable for non-null inputs, but
    * the original expression yields NULL for NULL input — preserve that. */
  private def nullSafeFalse(a: Attribute): Expression =
    If(IsNull(a), Literal(null, BooleanType), Literal.FalseLiteral)

  private def ceilDiv(n: Long): Long =
    Math.floorDiv(n, 1000L) + (if (Math.floorMod(n, 1000L) > 0L) 1L else 0L)
  private def floorDiv(n: Long): Long = Math.floorDiv(n, 1000L)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // nanos ≥ n  ⇔  µs ≥ ⌈n/1000⌉
      case GreaterThanOrEqual(NanosOfAttr(a, dt), Literal(n: Long, LongType)) =>
        GreaterThanOrEqual(a, tsLit(ceilDiv(n), dt))
      // nanos > n  ⇔  µs > ⌊n/1000⌋
      case GreaterThan(NanosOfAttr(a, dt), Literal(n: Long, LongType)) =>
        GreaterThan(a, tsLit(floorDiv(n), dt))
      // nanos < n  ⇔  µs < ⌈n/1000⌉
      case LessThan(NanosOfAttr(a, dt), Literal(n: Long, LongType)) =>
        LessThan(a, tsLit(ceilDiv(n), dt))
      // nanos ≤ n  ⇔  µs ≤ ⌊n/1000⌋
      case LessThanOrEqual(NanosOfAttr(a, dt), Literal(n: Long, LongType)) =>
        LessThanOrEqual(a, tsLit(floorDiv(n), dt))
      case EqualTo(NanosOfAttr(a, dt), Literal(n: Long, LongType)) =>
        if (n % 1000L == 0L) EqualTo(a, tsLit(n / 1000L, dt))
        else nullSafeFalse(a)
      // literal-on-left mirrors
      case GreaterThanOrEqual(Literal(n: Long, LongType), NanosOfAttr(a, dt)) =>
        GreaterThanOrEqual(tsLit(floorDiv(n), dt), a)
      case GreaterThan(Literal(n: Long, LongType), NanosOfAttr(a, dt)) =>
        GreaterThan(tsLit(ceilDiv(n), dt), a)
      case LessThan(Literal(n: Long, LongType), NanosOfAttr(a, dt)) =>
        LessThan(tsLit(floorDiv(n), dt), a)
      case LessThanOrEqual(Literal(n: Long, LongType), NanosOfAttr(a, dt)) =>
        LessThanOrEqual(tsLit(ceilDiv(n), dt), a)
      case EqualTo(Literal(n: Long, LongType), NanosOfAttr(a, dt)) =>
        if (n % 1000L == 0L) EqualTo(tsLit(n / 1000L, dt), a)
        else nullSafeFalse(a)
    }
}
