package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Column ⇄ Expression converters for function injection.
  *
  * Spark 4 made `Column` representation-agnostic and scoped the classic
  * converters `private[sql]`, so a library that builds its SQL functions
  * from Column-level combinators (GraftExtensions: st_relate_rect and
  * friends expand through graft.functions.RectRelate) needs this
  * package-local accessor — the established pattern for open-source
  * Spark extension libraries. Nothing here adds behavior; it only
  * re-exports the two conversions.
  */
object ColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** EAGER conversion (ColumnNodeToExpressionConverter), not the lazy
    * `ColumnNodeExpression` wrapper of `ExpressionUtils.expression`: an
    * Expression returned from an injected function builder is spliced
    * into a plan the analyzer is already resolving, where the lazy
    * wrapper never gets unwrapped and dies at codegen. The eager
    * converter yields a plain catalyst tree (nested functions come back
    * as catalyst `UnresolvedFunction`s, resolved by the analyzer's
    * fixed-point like any other). */
  def toExpression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}
