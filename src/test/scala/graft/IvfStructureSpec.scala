package graft

import graft.vector.{FlatKnn, Ivf, IvfPq, Kmeans, Metric, Pq}
import org.apache.spark.sql.functions._

/** IVF / IVFPQ structural semantics mirrored from
  * `/root/reference/ivf_index_test.go` and `ivfpq_index_test.go`:
  * assignment invariants, add-assigns-not-retrains, multiple clusters,
  * residual encoding, nprobe clamps, insufficient-vector clamps. */
class IvfStructureSpec extends SparkSpec {

  private def data(n: Int, d: Int) = {
    val s = spark
    import s.implicits._
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(d)(j => (math.sin(i * 0.83 + j * 1.21) * 9).toFloat))
    }.toDF("id", "vector")
  }

  test("every assigned row sits in its NEAREST centroid's list " +
       "(TestIVFIndexMultipleClusters invariant)") {
    val idx = Ivf.build(data(120, 6), nlist = 5, maxIter = 8)
    val rows = idx.assigned.select("vector", "cluster").collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0).toArray
      assert(r.getInt(1) == idx.model.nearest(v),
        "row assigned to a non-nearest list")
    }
    // all k lists materialize on spread-out data
    assert(idx.assigned.select("cluster").distinct().count() == 5)
  }

  test("incremental add assigns to EXISTING centroids — the model does not " +
       "move (TestIVFIndexAdd; ivf_index.go:251-280 never retrains)") {
    val s = spark
    import s.implicits._
    val idx = Ivf.build(data(60, 6), nlist = 4, maxIter = 8)
    val before = idx.model.centroids.map(_.toSeq).toSeq
    val extra = (100 until 120).map { i =>
      (i.toLong, Array.tabulate(6)(j => (math.cos(i + j) * 50).toFloat))
    }.toDF("id", "vector")
    val grown = Ivf.add(idx, extra)
    assert(grown.model.centroids.map(_.toSeq).toSeq == before,
      "add retrained the centroids")
    assert(grown.assigned.count() == 80)
    // new rows also obey the nearest-list invariant
    grown.assigned.filter(col("id") >= 100).collect().foreach { r =>
      val v = r.getSeq[Float](r.fieldIndex("vector")).toArray
      assert(r.getInt(r.fieldIndex("cluster")) == grown.model.nearest(v))
    }
  }

  test("nprobe clamps: zero/negative probe at least one list, oversized " +
       "probes all (TestIVFIndexNewSearch option sanitization)") {
    val idx = Ivf.build(data(80, 6), nlist = 4, maxIter = 8)
    val q = data(80, 6).filter(col("id") === 3L)
      .select(col("id").as("qid"), col("vector").as("qvec"))
    assert(Ivf.search(idx, q, 5, nprobe = 0).count() == 5)  // min 1 list
    assert(Ivf.search(idx, q, 5, nprobe = -3).count() == 5)
    val all = Ivf.search(idx, q, 80, nprobe = 999) // > nlist probes all
    val flat = FlatKnn.search(data(80, 6), q, 80, Metric.L2)
    assert(all.select("id").collect().map(_.getLong(0)).toSet ==
      flat.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("ivfpq residual invariant: decoding a row's codes approximates its " +
       "residual, and exact-codebook decode + centroid reproduces the " +
       "vector (TestIVFPQIndexTrain geometry)") {
    // fine codebooks: ksub >= n makes each residual its own codeword, so
    // decode(codes) + coarse centroid == original vector exactly-ish
    val d = data(24, 6)
    val idx = IvfPq.build(d, nlist = 2, m = 3, ksub = 32, maxIter = 10)
    val enc = IvfPq.encode(d, idx)
    val rows = enc.join(d.withColumnRenamed("vector", "orig"), "id")
      .select("orig", "cluster", "codes").collect()
    rows.foreach { r =>
      val orig = r.getSeq[Float](0).toArray
      val cent = idx.coarse.centroids(r.getInt(1))
      val codes = r.getSeq[Int](2)
      val rebuilt = Array.tabulate(6) { j =>
        val sub = j / 2 // dsub = 6/3 = 2
        cent(j) + idx.pq.codebooks(sub)(codes(sub))(j % 2)
      }
      val err = orig.zip(rebuilt).map { case (a, b) => math.abs(a - b) }.max
      assert(err < 1e-3, s"residual decode error $err too large")
    }
  }

  test("insufficient vectors: nlist and ksub clamp, build still succeeds " +
       "(TestIVFIndexTrainInsufficientVectors / IVFPQ twin)") {
    val tiny = data(3, 6)
    val ivf = Ivf.build(tiny, nlist = 16, maxIter = 5)
    assert(ivf.model.k == 3)
    assert(Ivf.search(ivf, tiny.select(col("id").as("qid"),
      col("vector").as("qvec")).limit(1), 10, nprobe = 16).count() == 3)
    val ivfpq = IvfPq.build(tiny, nlist = 16, m = 2, ksub = 256, maxIter = 5)
    assert(ivfpq.coarse.k == 3)
    assert(ivfpq.pq.codebooks.forall(_.length == 3))
  }

  test("cosine IVFPQ accepts zero vectors at encode (batch passthrough, " +
       "documented departure from the reference's per-row error)") {
    val s = spark
    import s.implicits._
    val withZero = (0 until 16).map { i =>
      (i.toLong,
        if (i == 5) Array.fill(4)(0f)
        else Array.tabulate(4)(j => (math.sin(i + j) * 4).toFloat))
    }.toDF("id", "vector")
    val idx = IvfPq.build(withZero, nlist = 2, m = 2, ksub = 8,
      maxIter = 5, metric = Metric.Cosine)
    assert(IvfPq.encode(withZero, idx).count() == 16)
  }
}
