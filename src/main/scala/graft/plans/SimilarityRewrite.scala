package graft.plans

import graft.functions.{DotProduct, JaccardSim}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

/** Optimizer rule rewriting interpreted higher-order similarity
  * formulations into the native codegen'd graft expressions — users (and
  * our own portable baselines) write the composable form; the engine
  * swaps in the fused loop:
  *
  *  - `size(array_intersect(a,b)) / size(array_union(a,b))`
  *      → `graft_jaccard(a, b)`        (ARRAY<STRING> inputs)
  *  - `aggregate(zip_with(a,b,(x,y)->x*y), 0.0, (acc,x)->acc+x)`
  *      → `graft_dot(a, b)`            (ARRAY<DOUBLE> inputs)
  *  - `aggregate(v, 0.0, (acc,x)->acc+x*x)`
  *      → `graft_dot(v, v)`            (the norm² inner loop)
  *
  * All three rewrites are semantics-preserving: the native loops
  * accumulate left-to-right in double like the lambda interpreter, IEEE
  * multiply and add are commutative in their operands, JaccardSim
  * captures the session's ANSI mode at plan time and reproduces
  * Divide's empty-union behavior exactly (ANSI: throw; non-ANSI: NULL,
  * never NaN — NaN would sort above every real similarity), legacy
  * sizeOfNull Size calls are never matched, the norm² rewrite only
  * fires on deterministic subtrees (it duplicates them), and
  * DotProduct yields NULL on length mismatch or null elements exactly
  * like the null-padding zip_with form. Higher-order lambdas are never
  * admitted to whole-stage codegen, so this is the difference between
  * an interpreted per-element closure and a fused JVM loop on the hot
  * similarity paths.
  *
  * Registered two ways: `GraftExtensions.injectOptimizerRule` (cluster
  * deployment) and `spark.experimental.extraOptimizations` (runtime
  * attach in the register() helpers). Both batches run after constant
  * folding, so the `CAST(0 AS DOUBLE)` zero literal has already folded.
  */
object SimilarityRewrite extends Rule[LogicalPlan] {

  private def unDoubleCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => c.child
    case other => other
  }

  private object SizeOf {
    // reject legacy-mode Size: with spark.sql.legacy.sizeOfNull=true,
    // size(NULL) = -1 makes the HOF form yield 1.0 on two null arrays
    // where JaccardSim yields NULL — not semantics-preserving.
    def unapply(e: Expression): Option[Expression] = unDoubleCast(e) match {
      case s: Size if !s.legacySizeOfNull => Some(s.child)
      case _ => None
    }
  }

  private def isStringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  /** (x, y) -> x * y over exactly the lambda's two distinct variables. */
  private def isPairProduct(fn: Expression): Boolean = fn match {
    case lf: LambdaFunction =>
      val ids = lf.arguments.collect { case v: NamedLambdaVariable => v.exprId }
      lf.function match {
        case m: Multiply => (m.left, m.right) match {
          case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
            ids.length == 2 && a.exprId != b.exprId &&
              Set(a.exprId, b.exprId) == ids.toSet
          case _ => false
        }
        case _ => false
      }
    case _ => false
  }

  /** (acc, x) -> acc + x over the lambda's two variables. */
  private def isPairSum(fn: Expression): Boolean = fn match {
    case lf: LambdaFunction =>
      val ids = lf.arguments.collect { case v: NamedLambdaVariable => v.exprId }
      lf.function match {
        case a: Add => (a.left, a.right) match {
          case (l: NamedLambdaVariable, r: NamedLambdaVariable) =>
            ids.length == 2 && l.exprId != r.exprId &&
              Set(l.exprId, r.exprId) == ids.toSet
          case _ => false
        }
        case _ => false
      }
    case _ => false
  }

  /** (acc, x) -> acc + x * x — the sum-of-squares merge. */
  private def isSumOfSquares(fn: Expression): Boolean = fn match {
    case lf: LambdaFunction =>
      val ids = lf.arguments.collect { case v: NamedLambdaVariable => v.exprId }
      lf.function match {
        case a: Add => (a.left, a.right) match {
          case (acc: NamedLambdaVariable, m: Multiply) => (m.left, m.right) match {
            case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
              ids.length == 2 && x.exprId == y.exprId &&
                acc.exprId != x.exprId &&
                Set(acc.exprId, x.exprId) == ids.toSet
            case _ => false
          }
          case _ => false
        }
        case _ => false
      }
    case _ => false
  }

  /** finish lambda is the identity `acc -> acc`. */
  private def isIdentity(fn: Expression): Boolean = fn match {
    case lf: LambdaFunction => lf.function match {
      case v: NamedLambdaVariable =>
        lf.arguments.collect { case a: NamedLambdaVariable => a.exprId } ==
          Seq(v.exprId)
      case _ => false
    }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // jaccard: |A ∩ B| / |A ∪ B|. Divisor semantics differ by eval
      // mode — ANSI Divide THROWS on a zero divisor (and Spark 4
      // defaults ANSI on), LEGACY and TRY (try_divide) return NULL —
      // and this rule fires on ANY session query via the extension, not
      // just repo-internal plans. So the MATCHED Divide's own mode (not
      // the session conf, which a try_divide deliberately overrides) is
      // captured INTO the expression at plan time: JaccardSim
      // reproduces throw-or-NULL on an empty union exactly.
      case d: Divide => (d.left, d.right) match {
        case (SizeOf(ai: ArrayIntersect), SizeOf(au: ArrayUnion))
          if ((ai.left.semanticEquals(au.left) &&
               ai.right.semanticEquals(au.right)) ||
              (ai.left.semanticEquals(au.right) &&
               ai.right.semanticEquals(au.left))) &&
            isStringArray(ai.left) && isStringArray(ai.right) =>
          JaccardSim(ai.left, ai.right,
            // (failOnError itself is Scala-protected on Divide)
            failOnDivByZero = d.evalContext.evalMode == EvalMode.ANSI)
        case _ => d
      }

      case agg: ArrayAggregate if isZero(agg.zero) && isIdentity(agg.finish) =>
        agg.argument match {
          // dot: aggregate(zip_with(a,b,*), 0.0, +)
          case z: ZipWith if isPairProduct(z.function) &&
              isPairSum(agg.merge) &&
              isDoubleArray(z.left) && isDoubleArray(z.right) =>
            DotProduct(z.left, z.right)
          // norm²: aggregate(v, 0.0, acc+x*x). Duplicates v into both
          // DotProduct children, so only fire when v is deterministic
          // (standard Catalyst practice before copying a subtree — a
          // rand()-built array must not be evaluated twice).
          case v if isSumOfSquares(agg.merge) && isDoubleArray(v) &&
              v.deterministic =>
            DotProduct(v, v)
          case _ => agg
        }
    }
}
