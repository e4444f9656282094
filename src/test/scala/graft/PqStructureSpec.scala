package graft

import graft.vector.{Metric, Pq}
import org.apache.spark.sql.functions._

/** PQ structural semantics mirrored from
  * `/root/reference/pq_index_test.go`: codebook shape, code ranges and
  * determinism, train clamps, dimension validation, zero-vector-cosine
  * behavior, compression accounting, retrain replacement. */
class PqStructureSpec extends SparkSpec {

  private def data(n: Int, d: Int) = {
    val s = spark
    import s.implicits._
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(d)(j => (math.sin(i * 1.1 + j * 0.5) * 7).toFloat))
    }.toDF("id", "vector")
  }

  test("defaultParams value table (TestCalculatePQParams): prefer m=8, " +
       "else smallest divisor in [8,32], else the reference's m=4 " +
       "fallback; nbits always 8") {
    val want = Seq(768 -> 8, 384 -> 8, 128 -> 8, 64 -> 8, 32 -> 8,
      16 -> 8, 100 -> 10, 17 -> 17)
    want.foreach { case (dim, m) =>
      assert(Pq.defaultParams(dim) == ((m, 8)), s"dim=$dim")
      if (dim % m != 0) fail(s"dim=$dim got non-divisor m=$m")
    }
    // the documented pathological fallback: 4 does not divide 6; train
    // would reject it loudly (same outcome as the reference's panic path)
    assert(Pq.defaultParams(6) == ((4, 8)))
    intercept[IllegalArgumentException] { Pq.defaultParams(0) }
  }

  test("codebook structure: m subspaces x ksub' x dsub " +
       "(TestPQIndexCodebookStructure)") {
    val model = Pq.train(data(100, 12), m = 4, ksub = 16, maxIter = 5)
    assert(model.m == 4 && model.dsub == 3)
    assert(model.codebooks.length == 4)
    model.codebooks.foreach { cb =>
      assert(cb.length == 16)
      cb.foreach(c => assert(c.length == 3))
    }
  }

  test("insufficient vectors: ksub clamps to n, training still succeeds " +
       "(TestPQIndexTrainInsufficientVectors)") {
    val model = Pq.train(data(5, 8), m = 2, ksub = 256, maxIter = 5)
    assert(model.codebooks.forall(_.length == 5))
    // encode still produces valid codes over the shrunken codebooks
    val enc = Pq.encode(data(5, 8), model)
      .select("codes").collect().map(_.getSeq[Int](0))
    assert(enc.forall(cs => cs.length == 2 && cs.forall(c => c >= 0 && c < 5)))
  }

  test("train rejects a dimension not divisible by m " +
       "(TestPQIndexTrainDimensionMismatch)") {
    intercept[Exception] { Pq.train(data(30, 10), m = 4, ksub = 8) }
  }

  test("encode: codes in [0, ksub), deterministic, one code per subspace " +
       "(TestPQIndexEncode / compression accounting)") {
    val model = Pq.train(data(80, 8), m = 4, ksub = 16, maxIter = 5)
    val a = Pq.encode(data(80, 8), model)
      .orderBy("id").collect().map(_.getSeq[Int](1))
    val b = Pq.encode(data(80, 8), model)
      .orderBy("id").collect().map(_.getSeq[Int](1))
    assert(a.toSeq == b.toSeq, "encode is not deterministic")
    a.foreach { cs =>
      assert(cs.length == 4, "one code per subspace — m bytes per vector " +
        "(32 floats -> 4 codes = 8x compression + codebook overhead)")
      assert(cs.forall(c => c >= 0 && c < 16))
    }
    // driver-side Model.encode agrees code-for-code with the column kernel
    val v = data(80, 8).filter(col("id") === 13L)
      .head().getSeq[Float](1).toArray
    assert(model.encode(v).toSeq == a(13).toSeq)
  }

  test("zero vector under cosine passes through normalization unchanged " +
       "(documented departure from the reference's per-row error: batch " +
       "jobs must not die row-by-row)") {
    val s = spark
    import s.implicits._
    val withZero = (0 until 20).map { i =>
      (i.toLong,
        if (i == 7) Array.fill(6)(0f)
        else Array.tabulate(6)(j => (math.cos(i + j) * 3).toFloat))
    }.toDF("id", "vector")
    val model = Pq.train(withZero, m = 2, ksub = 8, maxIter = 5,
      metric = Metric.Cosine)
    val enc = Pq.encode(withZero, model)
    assert(enc.count() == 20, "zero vector must encode, not error")
  }

  test("retraining replaces the codebooks (TestPQIndexMultipleTraining)") {
    val d1 = data(60, 8)
    val m1 = Pq.train(d1, m = 2, ksub = 8, maxIter = 5)
    val s = spark
    import s.implicits._
    val shifted = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(j => (math.sin(i * 1.1 + j * 0.5) * 7 + 100).toFloat))
    }.toDF("id", "vector")
    val m2 = Pq.train(shifted, m = 2, ksub = 8, maxIter = 5)
    assert(m1.codebooks.flatten.flatten.toSeq != m2.codebooks.flatten.flatten.toSeq,
      "retrain on shifted data must move the codebooks")
    assert(m1.m == m2.m && m1.ksub == m2.ksub)
  }
}
