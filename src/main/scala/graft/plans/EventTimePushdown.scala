package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Pushes event-time predicates down to the raw nanosecond column.
  *
  * The events fixture stores TIMESTAMP(NANOS), which we read as raw
  * int64 and convert with `timestamp_micros(ts DIV 1000)`
  * (graft.Tables.load). Any predicate on the converted column is a
  * function of the raw column, so the parquet source can only push
  * `IsNotNull` — at 100 TB that forfeits row-group/file pruning on the
  * single most selective predicate class an event store has.
  *
  * This rule finds top-level conjuncts of shape
  * `timestamp_micros(raw DIV 1000) <cmp> TIMESTAMP-literal` and ANDs in
  * the implied raw-column bound (e.g. `raw >= us*1000`), which the scan
  * translates into a pushable parquet filter. The original predicate is
  * kept — the extra conjunct is implied, never a replacement, so
  * correctness is unconditional. Bounds are only added for positive
  * epoch literals: `DIV` truncates toward zero, so the floor-division
  * algebra below would be wrong for pre-1970 timestamps.
  */
object EventTimePushdown extends Rule[LogicalPlan] {

  private object MicrosDivShape {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(d: IntegralDivide) => d.right match {
        case Literal(1000L, LongType) => Some(d.left)
        case _ => None
      }
      case _ => None
    }
  }

  /** Implied bound on the raw ns column for `raw DIV 1000 <cmp> us`.
    * Sound only for us > 0 (positive epochs; `DIV` truncates toward 0):
    *  - div >= us  ⟹ raw >= us*1000
    *  - div >  us  ⟹ raw >  us*1000
    *  - div <  us  ⟹ raw <  us*1000
    *  - div <= us  ⟹ raw <= us*1000 + 999
    *  - div == us  ⟹ us*1000 <= raw <= us*1000 + 999
    */
  private def bound(cmp: BinaryComparison, raw: Expression,
      us: Long): Option[Expression] = {
    if (us <= 0 || us > Long.MaxValue / 1000 - 1) return None
    val lo = us * 1000
    cmp match {
      case _: GreaterThanOrEqual => Some(GreaterThanOrEqual(raw, Literal(lo)))
      case _: GreaterThan => Some(GreaterThan(raw, Literal(lo)))
      case _: LessThan => Some(LessThan(raw, Literal(lo)))
      case _: LessThanOrEqual => Some(LessThanOrEqual(raw, Literal(lo + 999)))
      case _: EqualTo => Some(And(GreaterThanOrEqual(raw, Literal(lo)),
        LessThanOrEqual(raw, Literal(lo + 999))))
      case _ => None
    }
  }

  /** literal <cmp> shape ⟺ shape <flipped cmp> literal. */
  private def flipped(cmp: BinaryComparison): BinaryComparison = cmp match {
    case c: GreaterThanOrEqual => LessThanOrEqual(c.right, c.left)
    case c: GreaterThan => LessThan(c.right, c.left)
    case c: LessThan => GreaterThan(c.right, c.left)
    case c: LessThanOrEqual => GreaterThanOrEqual(c.right, c.left)
    case c => c
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f: Filter =>
      val conj = conjuncts(f.condition)
      val extras = conj.flatMap {
        case cmp: BinaryComparison => (cmp.left, cmp.right) match {
          case (MicrosDivShape(raw), Literal(us: Long, TimestampType)) =>
            bound(cmp, raw, us)
          case (Literal(us: Long, TimestampType), MicrosDivShape(raw)) =>
            bound(flipped(cmp), raw, us)
          case _ => None
        }
        case _ => None
      }.filterNot(e => conj.exists(_.semanticEquals(e)))
      if (extras.isEmpty) f
      else Filter((conj ++ extras).reduce(And), f.child)
  }
}
