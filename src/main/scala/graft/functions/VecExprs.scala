package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector math over embedding columns (array<float> or
  * array<double>).
  *
  * Semantics match the higher-order-function formulation exactly —
  * elements are widened to double and accumulated left-to-right — so
  * results are bit-identical to the DuckDB oracle's list_reduce fold;
  * only the interpreter overhead (a lambda dispatch per element) is
  * gone. Unlike the sketch expressions, these implement doGenCode
  * (a one-line call into the static loop below), so they keep the
  * surrounding whole-stage-codegen span fused — at cluster scale the
  * cosine filter/projection stays a single generated loop per batch.
  */
object VecOps {
  def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  def isFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == FloatType

  /** Σ a_i·b_i in double, left-to-right. Called from generated code. */
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** sqrt(Σ a_i²) in double, left-to-right. Called from generated code. */
  def norm(a: ArrayData, aFloat: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }
}

/** vec_dot(a, b): Σ a_i·b_i in double, left-to-right. */
final case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecOps.isVec(left.dataType) && VecOps.isVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot needs array<float|double>, got ${left.dataType}, ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(l: Any, r: Any): Any =
    VecOps.dot(
      l.asInstanceOf[ArrayData], VecOps.isFloat(left.dataType),
      r.asInstanceOf[ArrayData], VecOps.isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val af = VecOps.isFloat(left.dataType).toString
    val bf = VecOps.isFloat(right.dataType).toString
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecOps.dot($a, $af, $b, $bf);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** vec_norm(a): sqrt(Σ a_i², double, left-to-right). */
final case class VecNorm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecOps.isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_norm needs array<float|double>, got ${child.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override def nullSafeEval(input: Any): Any =
    VecOps.norm(input.asInstanceOf[ArrayData], VecOps.isFloat(child.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = VecOps.isFloat(child.dataType).toString
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecOps.norm($a, $f);")
  }

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}
