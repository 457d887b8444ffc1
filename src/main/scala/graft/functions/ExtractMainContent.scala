package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `extract_main_content(html BINARY)` →
  * `STRUCT<text: STRING, spans: ARRAY<STRUCT<label STRING, start INT,
  * end INT>>>`.
  *
  * The column-level form of the extract stage (SURVEY.md §2.11): lets the
  * boilerplate/PDF core run inside a Catalyst projection so Catalyst can
  * prune/push around it, instead of forcing the whole row through an
  * opaque `mapPartitions`. `doGenCode` emits a direct static call into
  * [[ExtractMainContent.evalBytes]], so the surrounding operators stay in
  * whole-stage codegen (the core itself is a JVM black box either way —
  * it dominates CPU, which is exactly why it shouldn't break the
  * surrounding codegen span).
  */
case class ExtractMainContent(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ExtractMainContent.schema
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"extract_main_content expects BINARY or STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input match {
      case b: Array[Byte] => b
      case s: UTF8String => s.getBytes
      case other => other.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }
    ExtractMainContent.evalBytes(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ExtractMainContent.evalBytes(" +
        (if (child.dataType == StringType) s"$c.getBytes()" else c) + ");")

  override protected def withNewChildInternal(newChild: Expression): ExtractMainContent =
    copy(child = newChild)

  override def prettyName: String = "extract_main_content"
}

object ExtractMainContent {
  val spanSchema: StructType = StructType(Seq(
    StructField("label", StringType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false)))

  val schema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("spans", ArrayType(spanSchema, containsNull = false), nullable = false)))

  /** Static entry point shared by interpreted eval and generated code. */
  def evalBytes(bytes: Array[Byte]): InternalRow = {
    val (text, spans) = graft.core.ExtractCore.extractText(bytes, null)
    val spanRows: ArrayData = new GenericArrayData(spans.map { s =>
      InternalRow(UTF8String.fromString(s.label), s.start, s.end)
    }.toArray[Any])
    InternalRow(UTF8String.fromString(text), spanRows)
  }
}
