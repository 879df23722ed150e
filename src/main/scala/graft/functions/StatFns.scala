package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the statistical scalar functions the
  * reference implements as Python UDFs. Each generates a direct static
  * call into [[StatMath]], so they stay inside whole-stage codegen —
  * no UDF serialisation boundary, no Python workers.
  */
object StatFns {

  private[graft] def toCol(e: Expression): Column = Bridge.column(e)
  private[graft] def toExpr(c: Column): Expression = Bridge.expression(c)
  private def dbl(c: Column): Expression = Cast(Bridge.expression(c), DoubleType)

  /** Standard normal survival function P(X > x). */
  def normSf(x: Column): Column = toCol(NormalSf(dbl(x)))

  /** Standard normal quantile (probit). */
  def normPpf(p: Column): Column = toCol(NormalPpf(dbl(p)))

  /** Chi-squared survival function. */
  def chi2Sf(x: Column, df: Double): Column =
    toCol(Chi2Sf(dbl(x), dbl(org.apache.spark.sql.functions.lit(df))))
}

abstract class UnaryDoubleMath extends UnaryExpression {
  override def dataType: DataType = DoubleType
  protected def staticCall: String
  protected def kernel(x: Double): Double
  override protected def nullSafeEval(x: Any): Any = kernel(x.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$staticCall($c)")
}

case class NormalSf(child: Expression) extends UnaryDoubleMath {
  override protected def staticCall: String = "graft.functions.StatMath.normSf"
  override protected def kernel(x: Double): Double = StatMath.normSf(x)
  override protected def withNewChildInternal(c: Expression): NormalSf = copy(c)
  override def prettyName: String = "norm_sf"
}

case class NormalPpf(child: Expression) extends UnaryDoubleMath {
  override protected def staticCall: String = "graft.functions.StatMath.normPpf"
  override protected def kernel(x: Double): Double = StatMath.normPpf(x)
  override protected def withNewChildInternal(c: Expression): NormalPpf = copy(c)
  override def prettyName: String = "norm_ppf"
}

case class Chi2Sf(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(x: Any, df: Any): Any =
    StatMath.chi2Sf(x.asInstanceOf[Double], df.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, df) => s"graft.functions.StatMath.chi2Sf($x, $df)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Chi2Sf =
    copy(l, r)
  override def prettyName: String = "chi2_sf"
}
