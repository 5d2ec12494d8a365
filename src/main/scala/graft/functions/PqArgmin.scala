package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructType}

/** Codegen'd PQ nearest-codeword argmin: given a query/DB subvector `v`
  * (array<double>) and a codebook `cands` (array<struct<cid: long,
  * cvec: array<double>>>), return the cid minimizing the asymmetric
  * squared distance `dot(v,v) - 2*dot(v,cvec) + dot(cvec,cvec)`, ties
  * broken on the smaller cid — the assignment step of product
  * quantization (nn13/nn14's encode pass, FAISS's IVF*,PQ* family).
  *
  * Why a custom Expression (the VectorDot argument, one level up): the
  * relational spellings of this argmin all materialize the corpus ×
  * |codebook| distance relation, and the round-16 nn QMETRICS record
  * measured both of them failing at gen-sf100 — the min-join form
  * sort-merge-joins that relation against its own aggregate (6.7 GB
  * spill), and the min-over-structs aggregate form lands in a
  * non-codegen object-hash buffer whose sort-based fallback spills the
  * same relation (5.4 GB). The higher-order-function spelling
  * (`array_min(transform(...))`) never widens the corpus but is a
  * whole-stage-codegen fallback: the hot loop runs interpreted with a
  * per-candidate struct allocation (measured ~2x wall on the encode
  * stage). This expression is the loop all three were trying to say:
  * |corpus|×m rows in, one long out per row, no intermediate relation,
  * no allocation, fully inside whole-stage codegen.
  *
  * Each dot product is the same sequential left-to-right fold as
  * [[VectorDot]] (and DuckDB's `list_dot_product`), and the three dots
  * are combined in the same `vv - 2*vc + cc` order, so the distance —
  * and therefore the argmin under the (d2, cid) tie-break — is
  * bit-identical to the relational oracle replay. `dot(v,v)` is
  * loop-invariant and hoisted above the candidate scan. Null semantics
  * (identical in eval and codegen, pinned by InterpSpec): null inputs
  * yield null, a null ELEMENT inside `v` yields null (the row has no
  * well-defined distance to anything), null codebook entries and
  * candidates whose `cvec` contains a null element are skipped, an
  * empty/all-skipped codebook yields null. A candidate whose `cvec`
  * LENGTH differs from `v` raises (the [[graft.operators.PolyOps]]
  * `fixedPointEdges` precedent: malformed reference data is an error,
  * not a silently biased distance — truncating the v·c term while
  * summing all of c·c would corrupt the argmin without a trace).
  */
case class PqArgmin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    val okLeft = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val okRight = right.dataType match {
      case ArrayType(StructType(fields), _) if fields.length == 2 =>
        fields(0).dataType == LongType &&
          (fields(1).dataType match {
            case ArrayType(DoubleType, _) => true
            case _ => false
          })
      case _ => false
    }
    if (okLeft && okRight) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_argmin expects (array<double>, array<struct<cid: bigint, " +
        s"cvec: array<double>>>), got (${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString})")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    val nv = v.numElements()
    var vv = 0.0
    var vNull = false
    var i = 0
    while (i < nv && !vNull) {
      if (v.isNullAt(i)) vNull = true
      else { vv += v.getDouble(i) * v.getDouble(i); i += 1 }
    }
    if (vNull) return null
    var best = Double.PositiveInfinity
    var bestCid = Long.MaxValue
    var found = false
    var k = 0
    val nc = cs.numElements()
    while (k < nc) {
      if (!cs.isNullAt(k)) {
        val c = cs.getStruct(k, 2)
        val cid = c.getLong(0)
        val cv = c.getArray(1)
        val ncv = cv.numElements()
        if (ncv != nv) throw new IllegalArgumentException(
          s"pq_argmin: codeword $cid has ${ncv} dims, vector has ${nv}")
        var cvNull = false
        var vc = 0.0
        var cc = 0.0
        var j = 0
        while (j < ncv && !cvNull) {
          if (cv.isNullAt(j)) cvNull = true
          else { vc += v.getDouble(j) * cv.getDouble(j); j += 1 }
        }
        j = 0
        while (j < ncv && !cvNull) {
          cc += cv.getDouble(j) * cv.getDouble(j); j += 1
        }
        if (!cvNull) {
          val d2 = vv - 2.0 * vc + cc
          if (!found || d2 < best || (d2 == best && cid < bestCid)) {
            best = d2; bestCid = cid; found = true
          }
        }
      }
      k += 1
    }
    if (found) bestCid else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val nv = ctx.freshName("nv")
      val nc = ctx.freshName("nc")
      val ncv = ctx.freshName("ncv")
      val vv = ctx.freshName("vv")
      val vc = ctx.freshName("vc")
      val cc = ctx.freshName("cc")
      val d2 = ctx.freshName("d2")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val found = ctx.freshName("found")
      val c = ctx.freshName("c")
      val cid = ctx.freshName("cid")
      val cv = ctx.freshName("cv")
      val vNull = ctx.freshName("vNull")
      val cvNull = ctx.freshName("cvNull")
      s"""
         |int $nv = $a.numElements();
         |double $vv = 0.0;
         |boolean $vNull = false;
         |for (int $i = 0; $i < $nv && !$vNull; $i++) {
         |  if ($a.isNullAt($i)) { $vNull = true; }
         |  else { $vv += $a.getDouble($i) * $a.getDouble($i); }
         |}
         |if ($vNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $best = Double.POSITIVE_INFINITY;
         |  long $bestCid = Long.MAX_VALUE;
         |  boolean $found = false;
         |  int $nc = $b.numElements();
         |  for (int $k = 0; $k < $nc; $k++) {
         |    if (!$b.isNullAt($k)) {
         |      org.apache.spark.sql.catalyst.InternalRow $c = $b.getStruct($k, 2);
         |      long $cid = $c.getLong(0);
         |      org.apache.spark.sql.catalyst.util.ArrayData $cv = $c.getArray(1);
         |      int $ncv = $cv.numElements();
         |      if ($ncv != $nv) {
         |        throw new IllegalArgumentException(
         |          "pq_argmin: codeword " + $cid + " has " + $ncv +
         |          " dims, vector has " + $nv);
         |      }
         |      boolean $cvNull = false;
         |      double $vc = 0.0;
         |      double $cc = 0.0;
         |      for (int $j = 0; $j < $ncv && !$cvNull; $j++) {
         |        if ($cv.isNullAt($j)) { $cvNull = true; }
         |        else { $vc += $a.getDouble($j) * $cv.getDouble($j); }
         |      }
         |      for (int $j = 0; $j < $ncv && !$cvNull; $j++) {
         |        $cc += $cv.getDouble($j) * $cv.getDouble($j);
         |      }
         |      if (!$cvNull) {
         |        double $d2 = $vv - 2.0 * $vc + $cc;
         |        if (!$found || $d2 < $best || ($d2 == $best && $cid < $bestCid)) {
         |          $best = $d2; $bestCid = $cid; $found = true;
         |        }
         |      }
         |    }
         |  }
         |  if ($found) {
         |    ${ev.value} = $bestCid;
         |  } else {
         |    ${ev.isNull} = true;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqArgmin =
    copy(left = newLeft, right = newRight)
}
