package graft.plans

import java.nio.charset.Charset

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for fixed-charset encoding — the
  * hot-path variant of [[graft.functions.CharsetConvert]]'s udf
  * (SURVEY §2.9 ladder: built-in > native Expression > udf). A udf
  * pays closure serialization + row boxing per call and blocks
  * codegen fusion; this expression generates a direct
  * `UTF8String.toString().getBytes(cs)` call inside whole-stage
  * codegen, with the charset resolved ONCE at analysis (an invalid
  * name fails the query at plan time, not per-row at run time).
  *
  * The charset is constructor-fixed (migrate export pipelines encode
  * whole columns under one target charset, `common/strings.go:
  * 383-451`); the udf remains for per-row-dynamic charsets.
  */
case class CharsetEncode(child: Expression, charsetName: String)
    extends UnaryExpression {

  // analysis-time validation: unknown charset = plan-time error
  @transient private lazy val cs: Charset = Charset.forName(charsetName)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"charset_encode expects STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "charset_encode"

  override protected def nullSafeEval(input: Any): Any =
    input.asInstanceOf[UTF8String].toString.getBytes(cs)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    // resolve the Charset ONCE per generated-class instance (Charset
    // isn't Serializable, so it can't ride the references array; a
    // per-row Charset.forName would pay name canonicalization + cache
    // probe on every value)
    val csLit = charsetName.replace("\\", "\\\\").replace("\"", "\\\"")
    val csField = ctx.addMutableState("java.nio.charset.Charset", "graftCs",
      v => s"""$v = java.nio.charset.Charset.forName("$csLit");""")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ($c).toString().getBytes($csField);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CharsetEncode = copy(child = newChild)
}

object CharsetEncode {
  private val info = new ExpressionInfo(
    classOf[CharsetEncode].getCanonicalName, "charset_encode")

  private[plans] def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2, "charset_encode(str, 'CHARSET') takes 2 args")
    require(exprs(1).foldable,
      "charset_encode charset must be a literal (use the udf for dynamic)")
    val name = exprs(1).eval().asInstanceOf[UTF8String].toString
    // eager validation so bad charsets fail at analysis
    Charset.forName(name)
    CharsetEncode(exprs(0), name)
  }

  /** Register into an existing session's function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("charset_encode"), info, builder _)
}

/** Session extension wiring (`SparkSessionExtensions`): build
  * production sessions with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * and `charset_encode` is available in plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("charset_encode"),
      new ExpressionInfo(classOf[CharsetEncode].getCanonicalName,
        "charset_encode"),
      // same validated builder as FunctionRegistry registration —
      // arity/foldability/charset errors surface at analysis on both
      // paths
      (exprs: Seq[Expression]) => CharsetEncode.builder(exprs)))
    ext.injectFunction((FunctionIdentifier("charset_decode"),
      new ExpressionInfo(classOf[CharsetDecode].getCanonicalName,
        "charset_decode"),
      (exprs: Seq[Expression]) => CharsetDecode.builder(exprs)))
  }
}
