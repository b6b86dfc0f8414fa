package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that the optimizer must treat as non-deterministic.
  *
  * Catalyst pushes a Filter below a Project by SUBSTITUTING the alias it
  * references — an expensive aliased expression (from_json, a model score)
  * is then evaluated once in the pushed filter and AGAIN in the surviving
  * projection, doubling the per-row cost of the hot path (the guide's
  * §4.4 duplication, in JVM-expression form: q_null_guard's plan carried
  * two JsonToStructs nodes over the same `props`). Marking the alias
  * non-deterministic forbids the substitution (the PythonUDF
  * `asNondeterministic` mechanism, which Scala columns do not expose), so
  * the expression evaluates exactly once per row. Evaluation and codegen
  * delegate to the child untouched — values are identical; only optimizer
  * placement changes.
  *
  * Use ONLY on expressions whose recomputation is the dominant cost:
  * non-determinism also blocks legitimate reorderings (other filters can
  * no longer push past this projection).
  */
case class Opaque(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_opaque"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Opaque {
  /** Wrap a column so the optimizer evaluates it exactly once (see
    * [[Opaque]]).
    */
  def once(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      Opaque(org.apache.spark.sql.graft.ColumnBridge.expression(c)))
}
