package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `ARRAY<DOUBLE>` columns — the
  * hot-path replacement for `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * (SURVEY §2.9 ladder: built-in > native Expression > udf). The
  * higher-order-function chain allocates a zipped intermediate array
  * and evaluates two lambda closures per element in interpreted mode;
  * every similarity operator (ann1-ann5, d5, d7) runs it d=64 times
  * per candidate pair, so the interpretation overhead dominates the
  * family's bench time. This expression generates one fused loop
  * inside whole-stage codegen.
  *
  * Accumulation is the IDENTICAL left-to-right IEEE fold the
  * higher-order form used (acc starts 0.0, adds a(i)*b(i) ascending),
  * so results — and the DuckDB oracle hash matches that depend on
  * them — are bit-for-bit unchanged. Inputs are fixed-dimension
  * embedding vectors: equal lengths are the caller's contract
  * (mismatch throws, matching the strict zip_with's null-poisoning
  * visibility rather than silently truncating).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product expects ARRAY<DOUBLE> inputs, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(n == y.numElements(),
      s"dot_product dimension mismatch: $n vs ${y.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_product dimension mismatch: " + $n + " vs " + $b.numElements());
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
}

object DotProduct {
  private val info = new ExpressionInfo(
    classOf[DotProduct].getCanonicalName, "dot_product")

  private[plans] def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.size == 2, "dot_product(a, b) takes 2 args")
    DotProduct(exprs(0), exprs(1))
  }

  /** Register into an existing session's function registry (SQL use);
    * DataFrame callers go through [[graft.functions.Similarity]]'s
    * `dot`, which builds the expression directly.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_product"), info, builder _)
}
