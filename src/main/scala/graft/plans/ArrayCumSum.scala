package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** O(n) cumulative sum over an array<double>, preserving nulls.
  *
  * The reference computes credible-set cumulative PIPs with an O(n²)
  * `transform(sequence(...), i -> aggregate(slice(pp, 1, i-1), ...))`
  * (reference: src/gentropy/dataset/study_locus.py:916-969). On loci
  * with thousands of tags that quadratic blowup matters; this native
  * expression is linear and stays inside whole-stage codegen via a
  * static kernel call.
  */
case class ArrayCumSum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "array_cumsum"

  override protected def nullSafeEval(arr: Any): Any =
    ArrayCumSum.kernel(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ArrayCumSum.kernel($c)")

  override protected def withNewChildInternal(c: Expression): ArrayCumSum = copy(c)
}

object ArrayCumSum {
  /** Static kernel (callable from generated code): running sum, null
    * elements emit null and don't advance the accumulator. */
  def kernel(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        acc += arr.getDouble(i)
        out(i) = acc
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def array_cumsum(c: Column): Column =
    Bridge.column(ArrayCumSum(Cast(Bridge.expression(c), ArrayType(DoubleType))))
}
