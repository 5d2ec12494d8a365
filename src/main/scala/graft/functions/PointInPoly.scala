package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType, StructType}

/** Codegen'd even-odd ray-cast point-in-polygon over an integer edge
  * array — the hot loop of the non-rectangular geometry family
  * (operators/PolyOps; reference predicate `ST_Within`,
  * tileconfig.py:170-176).
  *
  * The composable formulation (`aggregate` over the edge array) is a
  * higher-order function, which Catalyst evaluates interpretively with a
  * lambda dispatch per edge — fine for a 16-row dimension probe, the
  * wrong per-row cost for a corpus-wide containment filter at 100 TB.
  * This Expression compiles to a tight primitive loop inside whole-stage
  * codegen: same integer sign tests (cross-multiplied through the
  * strictly-nonzero Δy, half-open scanline rule), bit-identical results
  * (PolyOpsSpec pins equality with the HOF form and the Scala mirror;
  * InterpCheck pins eval == codegen on the registered queries).
  */
case class PointInPoly(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = {
    val edgesOk = third.dataType match {
      case ArrayType(st: StructType, _) =>
        st.fields.length == 4 && st.fields.forall(_.dataType == LongType)
      case _ => false
    }
    if (first.dataType == LongType && second.dataType == LongType && edgesOk)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "point_in_poly expects (bigint, bigint, array<struct<x1,y1,x2,y2:bigint>>), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override def nullSafeEval(px: Any, py: Any, edges: Any): Any =
    PointInPoly.inside(px.asInstanceOf[Long], py.asInstanceOf[Long],
      edges.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (px, py, edges) =>
      s"graft.functions.PointInPoly.inside($px, $py, $edges)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PointInPoly =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PointInPoly {
  /** Shared by eval and the generated code: a branch-light long-only
    * loop, no allocation. Exact for every non-boundary point (see
    * PolyOps.inside scaladoc for the crossing rule).
    *
    * Null ELEMENTS of the edge array are skipped (contribute no
    * crossing) rather than dereferenced: the input type check cannot
    * forbid them — the Product encoder behind `Seq[Edge].toDF` marks
    * array elements nullable even though none ever is — and an NPE
    * through the registered `point_in_poly` SQL function would
    * otherwise be reachable by any caller handing in a sparse array. */
  def inside(px: Long, py: Long, edges: ArrayData): Boolean = {
    val n = edges.numElements()
    var crossings = 0
    var i = 0
    while (i < n) {
      if (edges.isNullAt(i)) { i += 1 }
      else {
      val e = edges.getStruct(i, 4)
      val y1 = e.getLong(1); val y2 = e.getLong(3)
      if ((y1 > py) != (y2 > py)) {
        val x1 = e.getLong(0); val x2 = e.getLong(2)
        val lhs = (px - x1) * (y2 - y1)
        val rhs = (x2 - x1) * (py - y1)
        if (if (y2 > y1) lhs < rhs else lhs > rhs) crossings += 1
      }
      i += 1
      }
    }
    (crossings & 1) == 1
  }
}
