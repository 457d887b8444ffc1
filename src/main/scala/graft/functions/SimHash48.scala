package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `simhash48(text STRING)` → BIGINT.
  *
  * The scalar form of the q49 SimHash signature ([[graft.core.SimHashCore]]
  * for the exact-parity contract). `doGenCode` emits a direct static call
  * so the projection stays inside the surrounding whole-stage-codegen
  * span; compared with the equivalent SQL (explode words → 48 conditional
  * sums → recompose), this removes two shuffles and a 48-column aggregate.
  */
case class SimHash48(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash48 expects STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    graft.core.SimHashCore.simhash48(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.core.SimHashCore.simhash48($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): SimHash48 =
    copy(child = newChild)

  override def prettyName: String = "simhash48"
}
