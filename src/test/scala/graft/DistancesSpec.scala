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

  test("L2 and L2² preserve each other's ordering exactly " +
       "(TestDistanceOrderingPreservation)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map(i =>
      (i.toLong, Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("id", "vector")
    val qv = typedLit(Array.fill(16)(0.1f))
    def order(c: org.apache.spark.sql.Column): Seq[Long] =
      rows.select(col("id"), c.as("d")).orderBy(col("d"), col("id"))
        .collect().map(_.getLong(0)).toSeq
    assert(order(Distances.l2(col("vector"), qv)) ==
      order(Distances.l2Sq(col("vector"), qv)))
  }

  test("column batch == driver-side single computation for every metric " +
       "(TestCalculateBatchConsistency)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array.fill(32)((rnd.nextDouble() * 10 - 5).toFloat)))
    val q = Array.fill(32)((rnd.nextDouble() * 10 - 5).toFloat)
    val got = vecs.toDF("id", "vector")
      .select(col("id"),
        Distances.l2(col("vector"), typedLit(q)).as("l2"),
        Distances.l2Sq(col("vector"), typedLit(q)).as("l2sq"),
        Distances.dot(col("vector"), typedLit(q)).as("dot"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    vecs.foreach { case (id, v) =>
      var sq = 0.0; var dp = 0.0
      var j = 0
      while (j < 32) {
        val d = v(j).toDouble - q(j).toDouble
        sq += d * d; dp += v(j).toDouble * q(j).toDouble; j += 1
      }
      val (gl2, gsq, gdot) = got(id)
      assert(gsq == sq, s"l2sq mismatch id=$id")
      assert(gl2 == math.sqrt(sq), s"l2 mismatch id=$id")
      assert(gdot == dp, s"dot mismatch id=$id")
    }
  }

  test("reference value tables: euclidean / norm (distance_test.go:87-146,533-584)") {
    def arr(xs: Float*) = array(xs.map(lit): _*)
    // euclidean rows
    assert(eval(Distances.l2(arr(1, 2, 3), arr(1, 2, 3))) == 0.0)
    assert(eval(Distances.l2(arr(0, 0), arr(3, 4))) == 5.0)
    assert(eval(Distances.l2(arr(1, 2, 2), arr(1, 2, 3))) == 1.0)
    assert(math.abs(eval(Distances.l2(arr(-1, -2), arr(1, 2)))
      .asInstanceOf[Double] - math.sqrt(20.0)) < 1e-12)
    assert(eval(Distances.l2(arr(0, 0, 0), arr(0, 0, 0))) == 0.0)
    assert(eval(Distances.l2(arr(5), arr(2))) == 3.0)
    // norm rows
    assert(eval(Distances.norm(arr(3, 4))) == 5.0)
    assert(eval(Distances.norm(arr(1, 0, 0))) == 1.0)
    assert(eval(Distances.norm(arr(0, 0, 0))) == 0.0)
    assert(eval(Distances.norm(arr(-3, -4))) == 5.0)
    assert(eval(Distances.norm(arr(7))) == 7.0)
    assert(eval(Distances.norm(arr(1, 1, 1, 1))) == 2.0)
    // cosine preprocess equivalence: cosine(a,b) == 1 - dot(normalize(a),
    // normalize(b)) — the reference's Preprocess contract
    val aa = arr(2, 0, 1); val bb = arr(1, 3, 0)
    val direct = eval(Distances.cosine(aa, bb)).asInstanceOf[Double]
    val pre = 1.0 - eval(Distances.dot(Distances.normalized(aa),
      Distances.normalized(bb))).asInstanceOf[Double]
    assert(math.abs(direct - pre) < 1e-9)
  }

  test("reference value tables: l2sq / cosine / scale " +
       "(distance_test.go:214-267,335-388,585-655)") {
    def arr(xs: Float*) = array(xs.map(lit): _*)
    // L2Squared rows
    assert(eval(Distances.l2Sq(arr(1, 2, 3), arr(1, 2, 3))) == 0.0)
    assert(eval(Distances.l2Sq(arr(0, 0), arr(3, 4))) == 25.0)
    assert(eval(Distances.l2Sq(arr(1, 2, 2), arr(1, 2, 3))) == 1.0)
    assert(eval(Distances.l2Sq(arr(-1, -2), arr(1, 2))) == 20.0)
    assert(eval(Distances.l2Sq(arr(0, 0, 0), arr(0, 0, 0))) == 0.0)
    // cosine rows (cosine DISTANCE, 1 - sim, clamped)
    def cosD(a: Seq[Float], b: Seq[Float]) =
      eval(Distances.cosine(arr(a: _*), arr(b: _*))).asInstanceOf[Double]
    assert(math.abs(cosD(Seq(0.6f, 0.8f), Seq(0.6f, 0.8f))) < 1e-7)
    assert(math.abs(cosD(Seq(1, 0), Seq(0, 1)) - 1.0) < 1e-12)
    assert(math.abs(cosD(Seq(1, 0), Seq(-1, 0)) - 2.0) < 1e-12)
    assert(math.abs(cosD(Seq(0.707107f, 0.707107f), Seq(1, 0)) - 0.292893) < 1e-6)
    assert(math.abs(cosD(Seq(0.5f, 0.5f, 0.5f, 0.5f),
      Seq(0.5f, 0.5f, 0.5f, 0.5f))) < 1e-7)
    // scale rows
    def scl(v: Seq[Float], f: Double) =
      eval(Distances.scale(arr(v: _*), lit(f)))
        .asInstanceOf[scala.collection.Seq[Double]].toSeq
    assert(scl(Seq(1, 2, 3), 2.0) == Seq(2.0, 4.0, 6.0))
    assert(scl(Seq(2, 4, 6), 0.5) == Seq(1.0, 2.0, 3.0))
    assert(scl(Seq(1, 2), 0.0) == Seq(0.0, 0.0))
    assert(scl(Seq(1, -2), -1.0) == Seq(-1.0, 2.0))
  }

  test("high-dimensional (768) and empty vectors: every metric finite on " +
       "768-dim input; empty vectors distance 0 " +
       "(distance_test.go:787-820,927-946)") {
    val a = Array.tabulate(768)(i => (i % 10).toFloat)
    val b = Array.tabulate(768)(i => ((i + 1) % 10).toFloat)
    def arrOf(v: Array[Float]) = array(v.toIndexedSeq.map(lit): _*)
    val l2 = eval(Distances.l2(arrOf(a), arrOf(b))).asInstanceOf[Double]
    val sq = eval(Distances.l2Sq(arrOf(a), arrOf(b))).asInstanceOf[Double]
    val cs = eval(Distances.cosine(arrOf(a), arrOf(b))).asInstanceOf[Double]
    assert(!l2.isNaN && !l2.isInfinite && l2 > 0)
    assert(!sq.isNaN && math.abs(sq - l2 * l2) <= 1e-9 * sq)
    assert(!cs.isNaN && cs >= 0.0 && cs <= 2.0)
    // empty vectors: zero distance, not NaN (empty fold accumulator)
    val e = array().cast("array<float>")
    assert(eval(Distances.l2Sq(e, e)) == 0.0)
    assert(eval(Distances.l2(e, e)) == 0.0)
    assert(eval(Distances.dot(e, e)) == 0.0)
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
