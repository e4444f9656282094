package graft.expr

import org.apache.spark.sql.{Column, DataFrame, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Scalar quantizers: float16 (storage halving) and symmetric int8.
  *
  * Reference: `/root/reference/quantizer.go` — float16 via IEEE 754
  * half-precision bits (:136-157), int8 symmetric: train absMax over the
  * corpus (:184-195), quantize `round(v/absMax*127)` (:201-233).
  *
  * int8 quantize/dequantize are pure Catalyst expressions (codegen'd, and
  * reproducible in the DuckDB oracle: both engines round halves away from
  * zero, matching Go's math.Round). float16 is pure bit surgery, so it is
  * a native codegen'd expression ([[F16RoundTrip]]) — the former UDF
  * boxed every element and broke whole-stage codegen on the quantize path.
  */
object Quantizers {

  /** Train step: absMax over all vectors (quantizer.go:184-195). Returns a
    * one-row frame so it can stay lazy/broadcast; `.head.getDouble(0)` for
    * the scalar. */
  def int8AbsMax(data: DataFrame, vecCol: String): DataFrame =
    data.agg(max(array_max(transform(
      col(vecCol).cast("array<double>"), x => abs(x)))).as("abs_max"))

  /** `round(v/absMax*127)` clamped to [-127, 127]. */
  def int8Quantize(v: Column, absMax: Column): Column =
    transform(v.cast("array<double>"), x =>
      greatest(least(round(x / absMax * 127.0, 0), lit(127.0)), lit(-127.0))
        .cast("int"))

  /** `code/127*absMax` (quantizer.go:221-233). */
  def int8Dequantize(codes: Column, absMax: Column): Column =
    transform(codes, c => c.cast("double") / 127.0 * absMax)

  /** float32 → IEEE 754 binary16 bits (round-to-nearest-even), as the
    * x448/float16 Go library does (quantizer.go:139-143). */
  def toHalfBits(f: Float): Short = {
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val value = bits & 0x7fffffff
    if (value >= 0x47800000) { // overflow → inf (or NaN)
      if (value > 0x7f800000) (sign | 0x7e00).toShort // NaN
      else (sign | 0x7c00).toShort
    } else if (value < 0x38800000) { // subnormal / zero
      if (value < 0x33000000) sign.toShort
      else {
        // code = round_half_even(mant / 2^(126 - exp)): the f16 subnormal
        // quantum is fixed at 2^-24, so x = mant·2^(exp-150) quantizes to
        // mant >> (126 - exp) with ties-to-even (+ half-1 + lsb trick)
        val exp = value >>> 23
        val mant = (value & 0x7fffff) | 0x800000
        val shift = 126 - exp
        val rounded = (mant + (1 << (shift - 1)) - 1 +
          ((mant >>> shift) & 1)) >>> shift
        (sign | rounded).toShort
      }
    } else {
      // drop 13 mantissa bits with ties-to-even: + 0x0fff + lsb (adding
      // 0x1000 instead rounds ties away and d = half-1 up on odd — off
      // by one ulp from IEEE round-to-nearest-even)
      val half = sign | ((value - 0x38000000 + 0xfff +
        (((value >>> 13) & 1))) >>> 13)
      half.toShort
    }
  }

  /** binary16 bits → float32 (exact). */
  def fromHalfBits(h: Short): Float = {
    val sign = (h & 0x8000) << 16
    val exp = (h >>> 10) & 0x1f
    val mant = h & 0x3ff
    val bits =
      if (exp == 0) {
        if (mant == 0) sign
        else { // subnormal
          var e = -1
          var m = mant
          while ((m & 0x400) == 0) { m <<= 1; e += 1 }
          sign | ((127 - 15 - e) << 23) | ((m & 0x3ff) << 13)
        }
      } else if (exp == 0x1f) sign | 0x7f800000 | (mant << 13)
      else sign | ((exp - 15 + 127) << 23) | (mant << 13)
    java.lang.Float.intBitsToFloat(bits)
  }

  /** Static codegen target: per-element toHalfBits∘fromHalfBits over the
    * array, result packed back as a primitive float array (no boxing). */
  def f16RoundTripArray(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val f = if (isFloat) a.getFloat(i) else a.getDouble(i).toFloat
      out(i) = fromHalfBits(toHalfBits(f))
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Quantize→dequantize through float16 (what a f16-stored index sees) —
    * codegen'd native expression, bit-identical to the per-element
    * [[toHalfBits]]/[[fromHalfBits]] pair. */
  def f16RoundTrip(v: Column): Column =
    GraftSql.column(F16RoundTrip(GraftSql.expression(v)))
}

/** `ARRAY<FLOAT|DOUBLE> => ARRAY<FLOAT>` float16 round trip as one static
  * call inside whole-stage codegen (the quantize path sits in per-row scans;
  * a UDF there boxes every element and fences the stage). */
case class F16RoundTrip(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "f16_round_trip"

  private def isFloatArr: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE> input, got ${other.sql}")
  }

  override protected def nullSafeEval(a: Any): Any =
    Quantizers.f16RoundTripArray(a.asInstanceOf[ArrayData], isFloatArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val isF = isFloatArr.toString
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.Quantizers.f16RoundTripArray($c, $isF)")
  }

  override protected def withNewChildInternal(newChild: Expression): F16RoundTrip =
    copy(child = newChild)
}
