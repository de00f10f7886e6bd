package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. `ExpressionUtils` is `private[sql]` in
  * Spark 4, so this one-file shim lives under `org.apache.spark.sql`
  * to re-export the two conversions graft's native expressions need to
  * be usable as plain `Column` functions WITHOUT a session-registry
  * registration (a registry route would make pure Column helpers like
  * `Engine.wordNgrams` depend on every calling session having run a
  * register() first — a silent-analysis-failure trap for library
  * users). No Spark internals beyond the conversion are touched. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
