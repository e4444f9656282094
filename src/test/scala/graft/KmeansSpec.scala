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

  test("invalid k fails fast: zero and negative k are caller bugs, for " +
       "train AND trainSubspaces (TestKMeansInvalidK — the reference " +
       "returns nil centroids; we throw)") {
    val d = df(Seq(Array(1f, 2f), Array(3f, 4f)))
    intercept[IllegalArgumentException] { Kmeans.train(d, k = 0) }
    intercept[IllegalArgumentException] { Kmeans.train(d, k = -1) }
    intercept[IllegalArgumentException] {
      Kmeans.trainSubspaces(d, m = 2, dsub = 1, ksub = 0)
    }
    intercept[IllegalArgumentException] {
      Kmeans.trainSubspaces(d, m = 0, dsub = 1, ksub = 2)
    }
  }

  test("centroid accuracy: a converged centroid IS the arithmetic mean of " +
       "its assigned members, and every member's argmin centroid is its " +
       "own (TestKMeansCentroidAccuracy/AssignmentConsistency)") {
    val vs = blobs
    val m = Kmeans.train(df(vs), k = 2, maxIter = 50)
    val members = vs.groupBy(v => m.nearest(v))
    members.foreach { case (c, vsOfC) =>
      val mean = Array.tabulate(2)(i =>
        (vsOfC.map(_(i).toDouble).sum / vsOfC.size).toFloat)
      (0 until 2).foreach { i =>
        assert(math.abs(m.centroids(c)(i) - mean(i)) < 1e-5f,
          s"centroid $c dim $i: ${m.centroids(c)(i)} vs member mean ${mean(i)}")
      }
    }
    // assignment consistency: the assignment is a fixed point — no vector
    // is closer to a different centroid than to its own
    vs.foreach { v =>
      val own = m.nearest(v)
      val dOwn = v.zip(m.centroids(own)).map { case (a, b) =>
        (a - b).toDouble * (a - b) }.sum
      m.centroids.indices.foreach { c =>
        val d = v.zip(m.centroids(c)).map { case (a, b) =>
          (a - b).toDouble * (a - b) }.sum
        assert(dOwn <= d + 1e-9, s"vector closer to $c than own $own")
      }
    }
  }

  test("every dimension from 1 to 8 trains and preserves dim " +
       "(TestKMeansDimensions)") {
    (1 to 8).foreach { dim =>
      val vs = (0 until 12).map(i =>
        Array.tabulate(dim)(j => (i * 1.3f + j * 0.7f) % 5f))
      val m = Kmeans.train(df(vs), k = 3, maxIter = 5)
      assert(m.k == 3 && m.dim == dim, s"dim=$dim")
      assert(m.centroids.forall(_.length == dim))
    }
  }

  test("nearest-centroid edges: single centroid, identical centroids and " +
       "exact-boundary ties keep the LOWEST index, 100-centroid argmin " +
       "(TestFindNearestCentroidIndex{SingleCentroid,TwoIdenticalCentroids," +
       "BoundaryCase,ManyCentroids})") {
    // single centroid: always 0
    assert(Kmeans.Model(Array(Array(7f, 7f))).nearest(Array(-100f, 3f)) == 0)
    // identical centroids: the reference accepts either; our scan keeps
    // the strictly-better candidate, so the LOWEST index wins — pinned
    val ident = Kmeans.Model(Array(Array(5f, 5f), Array(5f, 5f), Array(10f, 10f)))
    assert(ident.nearest(Array(5.1f, 5.1f)) == 0)
    // exactly equidistant: lowest index, deterministically
    val bound = Kmeans.Model(Array(Array(0f, 0f), Array(10f, 10f)))
    assert(bound.nearest(Array(5f, 5f)) == 0)
    // 100 centroids on a line: argmin is the closest grid point
    val many = Kmeans.Model(Array.tabulate(100)(i => Array(i.toFloat)))
    assert(many.nearest(Array(63.4f)) == 63)
    assert(many.nearest(Array(63.6f)) == 64)
    assert(many.nearest(Array(-5f)) == 0)
    assert(many.nearest(Array(1000f)) == 99)
  }

  test("maxIter bounds the Lloyd iterations: one iteration from a bad " +
       "init differs from the converged result, which is iteration-count " +
       "independent (TestKMeansMaxIterLimit)") {
    // a line of points where uniform init (rows 0 and 6) is far from the
    // converged two-half split
    val vs = (0 until 12).map(i => Array(i * i.toFloat)) // quadratic spacing
    val one = Kmeans.train(df(vs), k = 2, maxIter = 1)
    val conv = Kmeans.train(df(vs), k = 2, maxIter = 100)
    val convMore = Kmeans.train(df(vs), k = 2, maxIter = 200)
    assert(conv.centroids.map(_.toSeq).toSeq ==
      convMore.centroids.map(_.toSeq).toSeq)
    assert(one.centroids.map(_.toSeq).toSeq !=
      conv.centroids.map(_.toSeq).toSeq,
      "one iteration already converged — fixture too easy to bound maxIter")
  }

  test("subspace codebook size clamps per subspace: ksub=256 on 40 rows " +
       "gives 40 centroids per subspace, each dsub wide " +
       "(TestKMeansSubspaceTypicalCodebookSize)") {
    val vs = (0 until 40).map(i =>
      Array.tabulate(8)(j => (math.sin(i * 1.7 + j) * 3).toFloat))
    val books = Kmeans.trainSubspaces(df(vs), m = 4, dsub = 2, ksub = 256,
      maxIter = 3)
    assert(books.length == 4)
    books.foreach { cb =>
      assert(cb.length == 40, s"ksub must clamp to n=40, got ${cb.length}")
      assert(cb.forall(_.length == 2))
    }
  }

  test("direction clustering via prenormalization: unit-normalized inputs " +
       "group by DIRECTION regardless of magnitude — the engine's cosine " +
       "k-means (TestKMeansWithDifferentDistances; IVF cosine trains on " +
       "prenormalized vectors)") {
    // two directions, wildly different magnitudes within each
    val vs = (0 until 16).map { i =>
      val mag = 1f + (i % 4) * 25f
      if (i % 2 == 0) Array(mag, 0.1f * mag) else Array(0.1f * mag, mag)
    }
    val normed = vs.map { v =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val m = Kmeans.train(df(normed), k = 2, maxIter = 30)
    val groups = normed.map(m.nearest)
    // all even-index (x-direction) vectors in one cluster, odd in the other
    assert(groups.indices.forall(i => groups(i) == groups(i % 2)),
      s"direction groups split: ${groups.toSeq}")
    assert(groups(0) != groups(1))
  }
}
