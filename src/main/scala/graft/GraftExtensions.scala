package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.VectorDot

/** Production wiring for the engine's native extensions: a cluster user
  * sets `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) and every session gets
  * the codegen'd `vector_dot` as a first-class SQL function — no
  * per-session registration code. The runtime fallback
  * ([[VectorDot.register]]) stays for sessions built without the config;
  * both paths bind the same Expression, so plans are identical.
  *
  * This is the SparkSessionExtensions slot the reference fills with its
  * plugin registry (tile_processor/controller.py:146-166): engine
  * capabilities declared once at startup, visible to every query.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (exprs: Seq[Expression]) => VectorDot(exprs(0), exprs(1))))
    // optimizer tier: emptiness tests on array intersections become
    // early-exit overlap probes (see the rule's exactness guard)
    ext.injectOptimizerRule(_ => graft.plans.ArraysOverlapRewrite)
  }
}
