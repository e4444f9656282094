package graft

import graft.expr.Quantizers
import graft.vector.QuantServe
import org.apache.spark.sql.functions._

/** Quantizer edge matrix from the reference (`quantizer_test.go:428-600`):
  * empty and single-element vectors round-trip, int8 is symmetric and
  * clamps at ±127, an all-zeros corpus refuses to train (absMax must be
  * positive), and f16 saturates past the binary16 range. */
class QuantEdgeSpec extends SparkSpec {

  test("f16 round trip: empty vector stays empty, single element survives") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, Array.empty[Float]),
      (2L, Array(3.14f))).toDF("id", "v")
      .select(col("id"), Quantizers.f16RoundTrip(col("v")).as("r"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getSeq[Float](1).isEmpty)
    val single = rows(1).getSeq[Float](1)
    assert(single.length == 1 && math.abs(single.head - 3.14f) < 0.01)
  }

  test("f16 saturates past binary16 range (|x| > 65504) instead of wrapping") {
    assert(Quantizers.fromHalfBits(Quantizers.toHalfBits(1e6f)).isPosInfinity)
    assert(Quantizers.fromHalfBits(Quantizers.toHalfBits(-1e6f)).isNegInfinity)
    // max finite half survives exactly
    assert(Quantizers.fromHalfBits(Quantizers.toHalfBits(65504f)) == 65504f)
  }

  test("int8 quantize is symmetric and clamps at ±127 " +
       "(quantizer_test.go:428-452)") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Array(2.0f, -2.0f, 0.5f, -0.5f, 10f, -10f)))
      .toDF("id", "v")
      .select(Quantizers.int8Quantize(col("v"), lit(2.0)).as("q"))
    val q = df.head.getSeq[Int](0)
    assert(q(0) == -q(1) && q(2) == -q(3))   // symmetry
    assert(q(0) == 127 && q(1) == -127)      // ±absMax maps to ±127
    assert(q(4) == 127 && q(5) == -127)      // out of range clamps
  }

  test("int8 round trip error bounded by absMax/127 per element") {
    val s = spark; import s.implicits._
    val vals = Array(1.9f, -0.3f, 0.0f, 1.0f, -1.99f)
    val df = Seq((1L, vals)).toDF("id", "v")
      .select(Quantizers.int8Dequantize(
        Quantizers.int8Quantize(col("v"), lit(2.0)), lit(2.0)).as("r"))
    val r = df.head.getSeq[Double](0)
    val step = 2.0 / 127.0
    vals.zip(r).foreach { case (orig, back) =>
      assert(math.abs(orig - back) <= step / 2 + 1e-9,
        s"$orig -> $back exceeds half-step $step")
    }
  }

  test("all-zeros corpus refuses int8 training: absMax must be positive " +
       "(quantizer_test.go:583-597 'not trained')") {
    val s = spark; import s.implicits._
    val zeros = Seq((1L, Array(0f, 0f, 0f)), (2L, Array(0f, 0f, 0f)))
      .toDF("id", "vector")
    val e = intercept[IllegalArgumentException] {
      QuantServe.serveInt8(zeros)
    }
    assert(e.getMessage.contains("absMax"))
  }

  test("int8AbsMax trains the corpus-wide max |x| (quantizer_test.go:299-323)") {
    val s = spark; import s.implicits._
    val data = Seq((1L, Array(1f, -3f)), (2L, Array(2.5f, 0f)))
      .toDF("id", "vector")
    val am = Quantizers.int8AbsMax(data, "vector").head.getDouble(0)
    assert(am == 3.0)
  }

  test("f16 quantize/dequantize tolerance table " +
       "(TestHalfPrecisionQuantizer_QuantizeDequantize, " +
       "quantizer_test.go:200-265): every row round-trips within its " +
       "stated tolerance, zeros exactly") {
    val rows: Seq[(String, Array[Float], Float)] = Seq(
      ("simple positive values", Array(1.0f, 2.0f, 3.0f), 0.001f),
      ("mixed signs", Array(-1.5f, 0.0f, 2.5f), 0.001f),
      ("zeros", Array(0.0f, 0.0f, 0.0f), 0.0f),
      ("small values", Array(0.1f, 0.2f, 0.3f), 0.001f))
    rows.foreach { case (name, v, tol) =>
      val back = v.map(x => Quantizers.fromHalfBits(Quantizers.toHalfBits(x)))
      assert(back.length == v.length)
      v.zip(back).foreach { case (orig, b) =>
        assert(math.abs(orig - b) <= tol,
          s"'$name': $orig -> $b exceeds tolerance $tol")
      }
    }
  }

  test("int8 quantize/dequantize tolerance table under a trained absMax " +
       "(TestInt8Quantizer_QuantizeDequantize, quantizer_test.go:346-427): " +
       "absMax trains to 10 on the reference's corpus; every row " +
       "round-trips within its stated tolerance with codes in [-127,127]") {
    val s = spark; import s.implicits._
    // the reference's training corpus: corpus-wide absMax = 10
    val train = Seq(
      (1L, Array(-10.0f, -5.0f, 0.0f, 5.0f, 10.0f)),
      (2L, Array(-8.0f, -4.0f, 0.0f, 4.0f, 8.0f)),
      (3L, Array(-6.0f, -3.0f, 0.0f, 3.0f, 6.0f))).toDF("id", "vector")
    val am = Quantizers.int8AbsMax(train, "vector").head.getDouble(0)
    assert(am == 10.0, s"trained absMax $am != 10")
    val rows: Seq[(String, Array[Float], Float)] = Seq(
      ("values within range", Array(5.0f, -5.0f, 0.0f), 0.1f),
      ("max values", Array(10.0f, -10.0f, 0.0f), 0.1f),
      ("small values", Array(0.5f, -0.5f, 0.0f), 0.2f),
      ("zeros", Array(0.0f, 0.0f, 0.0f), 0.01f))
    rows.foreach { case (name, v, tol) =>
      val df = Seq((1L, v)).toDF("id", "v")
        .select(Quantizers.int8Quantize(col("v"), lit(am)).as("q"))
      val q = df.head.getSeq[Int](0)
      assert(q.forall(c => c >= -127 && c <= 127),
        s"'$name': code out of symmetric range: $q")
      val back = Seq((1L, v)).toDF("id", "v")
        .select(Quantizers.int8Dequantize(
          Quantizers.int8Quantize(col("v"), lit(am)), lit(am)).as("r"))
        .head.getSeq[Double](0)
      v.zip(back).foreach { case (orig, b) =>
        assert(math.abs(orig - b) <= tol,
          s"'$name': $orig -> $b exceeds tolerance $tol")
      }
    }
  }
}
