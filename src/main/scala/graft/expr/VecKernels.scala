package graft.expr

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd vector-distance kernels over `ARRAY<FLOAT|DOUBLE>`.
  *
  * Bit-identical to the higher-order-function forms they replace
  * (`aggregate(zip_with(a.cast(double), b.cast(double), ...), 0.0, _+_)`):
  * each element is widened float→double (exact) and accumulated in a fixed
  * left-to-right IEEE-754 double fold, so results still hash-match the
  * DuckDB oracle.
  *
  * Why native: Catalyst's higher-order functions are interpreted
  * (CodegenFallback) — per row they allocate the cast array, a lambda
  * frame per element, and box every double. The distance fold is the hot
  * inner loop of every kNN / IVF / PQ / dedup-cosine scan (at 100 TB it IS
  * the workload), and these kernels keep it inside whole-stage codegen as
  * one static call with a primitive accumulator.
  *
  * Reference semantics: comet `distance.go:114-239` (L2 via sqrt of the
  * squared fold, cosine as dot over norms).
  */
object VecKernelUtil {

  @inline private def elem(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Σ (a_i - b_i)² — NaN on length mismatch (well-formed inputs always
    * have equal dims; the HOF form yielded NULL there). */
  def l2sq(a: ArrayData, aF: Boolean, b: ArrayData, bF: Boolean): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return Double.NaN
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = elem(a, aF, i) - elem(b, bF, i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Σ a_i · b_i — NaN on length mismatch. */
  def dot(a: ArrayData, aF: Boolean, b: ArrayData, bF: Boolean): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return Double.NaN
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += elem(a, aF, i) * elem(b, bF, i)
      i += 1
    }
    acc
  }
}

/** Shared shape: `(ARRAY<FLOAT|DOUBLE>, ARRAY<FLOAT|DOUBLE>) => DOUBLE`,
  * codegen'd as a single static call into [[VecKernelUtil]]. */
abstract class VecBinaryKernel extends BinaryExpression {

  /** Static method name on VecKernelUtil. */
  protected def kernel: String

  override def dataType: DataType = DoubleType

  private def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE> inputs, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    kernel match {
      case "l2sq" => VecKernelUtil.l2sq(aa, isFloatArr(left), bb, isFloatArr(right))
      case "dot" => VecKernelUtil.dot(aa, isFloatArr(left), bb, isFloatArr(right))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val la = isFloatArr(left).toString
    val lb = isFloatArr(right).toString
    defineCodeGen(ctx, ev, (c1, c2) =>
      s"graft.expr.VecKernelUtil.$kernel($c1, $la, $c2, $lb)")
  }
}

/** Squared Euclidean distance kernel (comet SquaredL2Distance,
  * distance.go:158-165). */
case class VecL2Sq(left: Expression, right: Expression) extends VecBinaryKernel {
  override protected def kernel: String = "l2sq"
  override def prettyName: String = "vec_l2sq"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}

/** Dot-product kernel (basis for cosine / norm, distance.go:201-216). */
case class VecDot(left: Expression, right: Expression) extends VecBinaryKernel {
  override protected def kernel: String = "dot"
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecKernels {
  /** Σ (a_i - b_i)² as a codegen'd kernel column. */
  def l2sq(a: Column, b: Column): Column =
    GraftSql.column(VecL2Sq(GraftSql.expression(a), GraftSql.expression(b)))

  /** Σ a_i · b_i as a codegen'd kernel column. */
  def dot(a: Column, b: Column): Column =
    GraftSql.column(VecDot(GraftSql.expression(a), GraftSql.expression(b)))
}
