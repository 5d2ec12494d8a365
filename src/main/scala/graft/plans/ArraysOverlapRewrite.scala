package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, ArraysOverlap, Expression, GreaterThan, Literal, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.ArrayType

/** Optimizer rule: `size(array_intersect(a, b)) > 0  →  arrays_overlap(a, b)`.
  *
  * The left form materializes the whole intersection (hash set build +
  * full probe of both arrays) only to test emptiness; `arrays_overlap`
  * answers the same predicate with an early-exit membership probe. The
  * overlap test is the inner loop of set-similarity pre-filters
  * (profile-overlap scoring, candidate screening), so the rewrite is an
  * engine-level win every query gets for free — the point of declaring
  * capabilities through `SparkSessionExtensions` instead of hand-editing
  * each query.
  *
  * Exactness guard: the two forms differ when an array ELEMENT can be
  * null (`arrays_overlap` returns null for a no-match-with-null-element
  * case where `size(intersect) > 0` returns false), so the rule fires
  * only when both element types are non-nullable. Null ARRAYS agree in
  * both forms (null in → null out) ONLY under modern size semantics
  * (size(null) = null); with `spark.sql.legacy.sizeOfNull` in effect
  * size(null) = -1 makes the predicate false where overlap yields null,
  * which differs in projection contexts — so the rule also requires the
  * Size node's legacySizeOfNull = false, unless both inputs are
  * statically non-nullable (no null array can reach the node). Pinned in
  * ExtensionsSpec.
  */
object ArraysOverlapRewrite extends Rule[LogicalPlan] {

  private def nonNullElements(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThan(Size(ArrayIntersect(a, b), legacyNullSize), Literal(0, _))
          if nonNullElements(a) && nonNullElements(b) &&
            (!legacyNullSize || (!a.nullable && !b.nullable)) =>
        ArraysOverlap(a, b)
    }
}
