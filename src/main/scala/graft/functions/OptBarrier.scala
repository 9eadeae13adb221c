package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that reports non-deterministic — a pure optimizer fence
  * for EXPENSIVE expressions (the guide-§4.4 treatment, applied to Catalyst
  * expressions instead of Python UDFs). Two rules otherwise duplicate the
  * wrapped computation wholesale:
  *   - `PushPredicateThroughNonJoin` substitutes alias definitions into
  *     every predicate reference when pushing a filter through a projection
  *     (measured: an OCSF class-validation filter re-ran `from_json` ~40x
  *     per row; a rehydration range filter re-ran a regex struct extract
  *     10x per row);
  *   - `CollapseProject` inlines definitions into later projections and
  *     into higher-order-function lambdas (where one textual reference can
  *     mean per-element evaluation).
  * The fence pins consumers ABOVE the projection that computes the value
  * once. Value/nullability/codegen pass straight through — results are
  * bit-identical; only optimizer placement changes. Opt-in per site (a
  * fence also stops OTHER predicates from pushing past it, so it belongs
  * only where the duplication is real).
  */
case class OptBarrier(child: Expression) extends UnaryExpression {

  override lazy val deterministic: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override def prettyName: String = "opt_barrier"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OptBarrier {
  def of(c: Column): Column =
    GraftBridge.column(OptBarrier(GraftBridge.expression(c)))
}
