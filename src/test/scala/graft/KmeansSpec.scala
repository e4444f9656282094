package graft

import graft.vector.Kmeans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-means semantics mirrored from `/root/reference/clustering_test.go`
  * (29 funcs there): deterministic uniform-spaced init, Lloyd's update,
  * empty-cluster keep-old rule, k clamp, subspace training, and the
  * nearest/ranked centroid lookups IVF probe ordering depends on. */
class KmeansSpec extends SparkSpec {

  private def df(vs: Seq[Array[Float]]): DataFrame = {
    val s = spark
    import s.implicits._
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vector")
  }

  /** Two tight blobs around (0,0) and (10,10). */
  private def blobs: Seq[Array[Float]] =
    (0 until 20).map { i =>
      val base = if (i % 2 == 0) 0f else 10f
      Array(base + (i % 5) * 0.1f, base + (i % 3) * 0.1f)
    }

  test("basic: two separated blobs recover both centers (TestKMeansBasic/" +
       "CentroidAccuracy)") {
    val m = Kmeans.train(df(blobs), k = 2, maxIter = 20)
    assert(m.k == 2)
    val sorted = m.centroids.sortBy(_(0))
    assert(math.abs(sorted(0)(0)) < 1.0 && math.abs(sorted(0)(1)) < 1.0)
    assert(math.abs(sorted(1)(0) - 10) < 1.0 && math.abs(sorted(1)(1) - 10) < 1.0)
  }

  test("empty training set fails fast (TestKMeansEmptyVectors)") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "vector")
    intercept[IllegalArgumentException] { Kmeans.train(empty, k = 2) }
    intercept[IllegalArgumentException] {
      Kmeans.trainSubspaces(empty, m = 2, dsub = 1, ksub = 2)
    }
  }

  test("k > n clamps to n; the rows become the centroids " +
       "(TestKMeansKGreaterThanN, clustering.go:133-135)") {
    val vs = Seq(Array(1f, 1f), Array(5f, 5f), Array(9f, 9f))
    val m = Kmeans.train(df(vs), k = 10, maxIter = 10)
    assert(m.k == 3)
    // each input vector is its own converged centroid
    assert(m.centroids.map(_.toSeq).toSet == vs.map(_.toSeq).toSet)
  }

  test("maxIter = 0: the uniform-spaced init rows ARE the centroids, in id " +
       "order (clustering.go:147-162)") {
    val vs = (0 until 12).map(i => Array(i.toFloat, 0f))
    val m = Kmeans.train(df(vs), k = 4, maxIter = 0)
    // n=12, k=4 -> step 3 -> rows 0, 3, 6, 9
    assert(m.centroids.map(_(0).toInt).toSeq == Seq(0, 3, 6, 9))
  }

  test("single vector, k = 1 (TestKMeansSingleVector)") {
    val m = Kmeans.train(df(Seq(Array(2f, 7f, 1f))), k = 1)
    assert(m.k == 1 && m.centroids(0).toSeq == Seq(2f, 7f, 1f))
  }

  test("convergence is a fixed point: more iterations change nothing " +
       "(TestKMeansConvergence)") {
    val a = Kmeans.train(df(blobs), k = 2, maxIter = 20)
    val b = Kmeans.train(df(blobs), k = 2, maxIter = 200)
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq)
  }

  test("identical vectors: one cluster absorbs all, empty clusters keep " +
       "their init centroid (TestKMeansIdenticalVectors, clustering.go:236-243)") {
    val vs = Seq.fill(6)(Array(3f, 3f))
    val m = Kmeans.train(df(vs), k = 3, maxIter = 10)
    assert(m.k == 3)
    // all inits equal the common vector, so every centroid is exactly it
    assert(m.centroids.forall(_.toSeq == Seq(3f, 3f)))
    assert(m.nearest(Array(3f, 3f)) == 0) // strict < keeps the first
  }

  test("deterministic: same data, same result, regardless of input " +
       "partitioning (TestKMeansAssignmentConsistency)") {
    val base = df(blobs)
    val a = Kmeans.train(base.repartition(7), k = 3, maxIter = 15)
    val b = Kmeans.train(base.repartition(2), k = 3, maxIter = 15)
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq)
  }

  test("trainSubspaces == train on each sliced subspace (TestKMeansSubspace; " +
       "the one-pass-all-subspaces fusion must not change semantics)") {
    val s = spark
    import s.implicits._
    val vs = (0 until 30).map { i =>
      Array.tabulate(6)(j => (math.sin(i * 1.3 + j) * 10).toFloat)
    }
    val full = df(vs)
    val m = 3; val dsub = 2
    val fused = Kmeans.trainSubspaces(full, m = m, dsub = dsub, ksub = 4,
      maxIter = 12)
    (0 until m).foreach { sub =>
      val sliced = vs.zipWithIndex.map { case (v, i) =>
        (i.toLong, java.util.Arrays.copyOfRange(v, sub * dsub, (sub + 1) * dsub))
      }.toDF("id", "vector")
      val solo = Kmeans.train(sliced, k = 4, maxIter = 12)
      assert(fused(sub).map(_.toSeq).toSeq == solo.centroids.map(_.toSeq).toSeq,
        s"subspace $sub diverged from standalone training")
    }
  }

  test("nearest/ranked: ranked is a full ascending-distance permutation and " +
       "ties keep the lower index (TestFindNearestCentroidIndex*)") {
    val m = Kmeans.Model(Array(
      Array(0f, 0f), Array(10f, 0f), Array(0f, 10f), Array(10f, 0f))) // 1 == 3
    val q = Array(9f, 1f)
    val r = m.ranked(q)
    assert(r.toSet == Set(0, 1, 2, 3))
    assert(r(0) == 1 && r(1) == 3, s"tie must keep lower index first: ${r.toSeq}")
    assert(m.nearest(q) == 1)
    // negative coordinates work like any others
    val neg = Kmeans.Model(Array(Array(-5f, -5f), Array(5f, 5f)))
    assert(neg.nearest(Array(-4f, -6f)) == 0)
  }

  test("high-dimensional smoke: 64d, k=8, centroids have the input dim " +
       "(TestKMeansHighDimensional/Dimensions)") {
    val vs = (0 until 40).map(i =>
      Array.tabulate(64)(j => (math.cos(i * 0.7 + j * 1.1) * 5).toFloat))
    val m = Kmeans.train(df(vs), k = 8, maxIter = 5)
    assert(m.k == 8 && m.dim == 64)
    assert(m.centroids.forall(_.length == 64))
  }
}
