package graft.plans

import java.nio.charset.Charset

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native decode sibling of [[CharsetEncode]] — target-charset bytes →
  * UTF-8 string, codegen'd (`new String(bytes, cs)` fused into
  * whole-stage codegen, charset resolved once at analysis). Completes
  * the charset Expression pair so the F1 family has no scalar udf on
  * its fixed-charset hot path (`common/strings.go:383-451` converts in
  * both directions).
  */
case class CharsetDecode(child: Expression, charsetName: String)
    extends UnaryExpression {

  @transient private lazy val cs: Charset = Charset.forName(charsetName)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"charset_decode expects BINARY input, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "charset_decode"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(new String(input.asInstanceOf[Array[Byte]], cs))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // Charset resolved once per generated-class instance, same
    // rationale as CharsetEncode (not Serializable, and per-row
    // forName pays the name-cache probe every value)
    val csLit = charsetName.replace("\\", "\\\\").replace("\"", "\\\"")
    val csField = ctx.addMutableState("java.nio.charset.Charset", "graftCs",
      v => s"""$v = java.nio.charset.Charset.forName("$csLit");""")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"new java.lang.String($c, $csField));")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CharsetDecode = copy(child = newChild)
}

object CharsetDecode {
  private val info = new ExpressionInfo(
    classOf[CharsetDecode].getCanonicalName, "charset_decode")

  private[plans] def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2, "charset_decode(bytes, 'CHARSET') takes 2 args")
    require(exprs(1).foldable,
      "charset_decode charset must be a literal (use the udf for dynamic)")
    val name = exprs(1).eval().asInstanceOf[UTF8String].toString
    Charset.forName(name) // analysis-time validation
    CharsetDecode(exprs(0), name)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("charset_decode"), info, builder _)
}
