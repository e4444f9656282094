package graft

import graft.expr.{Distances, Quantizers}
import org.apache.spark.sql.functions._

/** Mirrors distance_test.go's hand-computed expectations. */
class DistancesSpec extends SparkSpec {

  private def eval(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c).head().get(0)

  private val a = array(lit(1.0f), lit(2.0f), lit(3.0f))
  private val b = array(lit(4.0f), lit(6.0f), lit(8.0f))

  test("l2 / l2sq / dot / norm hand-computed") {
    assert(eval(Distances.l2Sq(a, b)) == 9.0 + 16.0 + 25.0)
    assert(eval(Distances.l2(a, b)) == math.sqrt(50.0))
    assert(eval(Distances.dot(a, b)) == 4.0 + 12.0 + 24.0)
    assert(eval(Distances.norm(a)) == math.sqrt(14.0))
  }

  test("cosine: orthogonal=1, identical=0, opposite clamped to 2") {
    val x = array(lit(1.0f), lit(0.0f))
    val y = array(lit(0.0f), lit(1.0f))
    val negx = array(lit(-1.0f), lit(0.0f))
    assert(eval(Distances.cosine(x, y)) == 1.0)
    assert(eval(Distances.cosine(x, x)).asInstanceOf[Double] < 1e-12)
    assert(eval(Distances.cosine(x, negx)) == 2.0)
  }

  test("normalize: unit norm; zero vector passes through (distance.go:376-380)") {
    val n = eval(Distances.norm(Distances.normalized(a))).asInstanceOf[Double]
    assert(math.abs(n - 1.0) < 1e-12)
    val z = array(lit(0.0f), lit(0.0f))
    val zn = eval(Distances.normalized(z)).asInstanceOf[scala.collection.Seq[Double]]
    assert(zn.toList == List(0.0, 0.0))
  }

  test("scale") {
    val s = eval(Distances.scale(a, lit(2.0))).asInstanceOf[scala.collection.Seq[Double]]
    assert(s.toList == List(2.0, 4.0, 6.0))
  }

  test("int8 quantize round-trip error bounded by absMax/127/2") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq(0.5f, -1.0f, 0.25f, 1.0f))).toDF("id", "vector")
    val am = Quantizers.int8AbsMax(df, "vector").head().getDouble(0)
    assert(am == 1.0)
    val deq = Quantizers.int8Dequantize(
      Quantizers.int8Quantize(col("vector"), lit(am)), lit(am))
    val err = df.select(array_max(zip_with(deq,
      col("vector").cast("array<double>"), (d, o) => abs(d - o))))
      .head().getDouble(0)
    assert(err <= am / 127.0 / 2.0 + 1e-12)
  }

  test("float16 round-trip: exact for representable, bounded otherwise") {
    assert(Quantizers.fromHalfBits(Quantizers.toHalfBits(1.0f)) == 1.0f)
    assert(Quantizers.fromHalfBits(Quantizers.toHalfBits(0.5f)) == 0.5f)
    assert(Quantizers.fromHalfBits(Quantizers.toHalfBits(-2.0f)) == -2.0f)
    assert(Quantizers.fromHalfBits(Quantizers.toHalfBits(0.0f)) == 0.0f)
    val x = 0.1f
    val rt = Quantizers.fromHalfBits(Quantizers.toHalfBits(x))
    assert(math.abs(rt - x) < 1e-3)
    // known value: 0.1 in binary16 is 0x2E66
    assert(Quantizers.toHalfBits(0.1f) == 0x2E66.toShort)
    assert(Quantizers.toHalfBits(65504.0f) == 0x7BFF.toShort) // f16 max
    assert(Quantizers.toHalfBits(100000.0f) == 0x7C00.toShort) // -> inf
  }
}
