package graft

import graft.vector._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cosine support for PQ / IVFPQ / IVF — the reference handles cosine in
  * these indexes purely by preprocessing (normalize-at-insert
  * pq_index.go:278-281, query Preprocess pq_index_search.go:236-240) while
  * the ADC stays L2 and reports sqrt (pq_index_search.go:295): the cosine
  * score space is sqrt(2·(1−cos)). Pinned three ways: against flat cosine
  * (exact codebooks make ADC exact), against the explicitly-prenormalized
  * L2 build (must be bit-identical), and across serve/persist paths. */
class PqMetricSpec extends SparkSpec {

  /** Magnitude-skewed corpus (cosine and L2 rankings disagree), dim 8. */
  private lazy val skewed: DataFrame = {
    val s = spark
    import s.implicits._
    (0 until 48).map { i =>
      val dir = Array.tabulate(8)(j => (math.sin(i * 0.61 + j * 1.7) + 1.4).toFloat)
      val scale = (0.2 + (i % 5) * 9.0).toFloat
      (i.toLong, dir.map(_ * scale))
    }.toDF("id", "vector")
  }

  private lazy val prenormed: DataFrame =
    skewed.withColumn("vector",
      graft.expr.Distances.normalized(col("vector")).cast("array<float>"))

  private def q(v: Array[Float]): DataFrame = {
    val s = spark
    import s.implicits._
    Seq((0L, v)).toDF("qid", "qvec")
  }

  private val q8 = Array.tabulate(8)(j => (math.cos(j * 1.1) + 1.4).toFloat * 17f)

  private def pairs(df: DataFrame): Seq[(Long, Double)] =
    df.select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  // ksub = corpus size: every subvector is its own codeword → ADC exact
  private def finePq(df: DataFrame, metric: Metric = Metric.L2): Pq.Model =
    Pq.train(df, m = 2, ksub = 48, maxIter = 10, metric = metric)

  test("cosine PQ with exact codebooks ranks like flat cosine; score space is sqrt(2(1-cos))") {
    val model = finePq(skewed, Metric.Cosine)
    val enc = Pq.encode(skewed, model)
    val got = pairs(Pq.search(enc, model, q(q8), 10))
    val flat = pairs(FlatKnn.search(skewed, q(q8), 10, Metric.Cosine))
    assert(got.map(_._1) == flat.map(_._1))
    got.zip(flat).foreach { case ((_, pqd), (_, cosd)) =>
      assert(math.abs(pqd * pqd / 2.0 - cosd) < 1e-5)
    }
    // and the ranking genuinely differs from L2 PQ on this corpus
    val l2m = finePq(skewed)
    val l2 = pairs(Pq.search(Pq.encode(skewed, l2m), l2m, q(q8), 10))
    assert(got.map(_._1) != l2.map(_._1))
  }

  test("cosine PQ == L2 PQ over explicitly prenormalized rows+query, bit-identical") {
    val cosM = finePq(skewed, Metric.Cosine)
    val cos = pairs(Pq.search(Pq.encode(skewed, cosM), cosM, q(q8), 10))
    val l2M = finePq(prenormed)
    val l2 = pairs(Pq.search(Pq.encode(prenormed, l2M), l2M,
      q(Metric.unit(q8)), 10))
    assert(cos == l2)
  }

  test("cosine PQ embedded serving == distributed search") {
    val model = finePq(skewed, Metric.Cosine)
    val enc = Pq.encode(skewed, model)
    val dist = pairs(Pq.search(enc, model, q(q8), 10))
    val local = Pq.serve(enc, model).search(q8, 10)
    assert(local == dist.map { case (id, d) => (id, d) })
  }

  test("PQ persistence round-trips the metric") {
    val model = finePq(skewed, Metric.Cosine)
    val enc = Pq.encode(skewed, model)
    val want = pairs(Pq.search(enc, model, q(q8), 10))
    val path = java.nio.file.Files.createTempDirectory("pqcos").toString + "/pq"
    Pq.write(model, enc, path)
    val (loaded, lenc) = Pq.read(spark, path)
    assert(loaded.metric == Metric.Cosine)
    assert(pairs(Pq.search(lenc, loaded, q(q8), 10)) == want)
  }

  test("cosine IVFPQ: probe-all fine-codebook search ranks like flat cosine") {
    val idx = IvfPq.build(skewed, nlist = 4, m = 2, ksub = 48, maxIter = 10,
      metric = Metric.Cosine)
    val got = pairs(IvfPq.search(idx, q(q8), 10, nprobe = 4))
    val flat = pairs(FlatKnn.search(skewed, q(q8), 10, Metric.Cosine))
    assert(got.map(_._1) == flat.map(_._1))
    got.zip(flat).foreach { case ((_, pqd), (_, cosd)) =>
      assert(math.abs(pqd * pqd / 2.0 - cosd) < 1e-4)
    }
  }

  test("cosine IVFPQ == L2 IVFPQ over prenormalized input, bit-identical; serve matches") {
    val cos = IvfPq.build(skewed, nlist = 4, m = 2, ksub = 48, maxIter = 10,
      metric = Metric.Cosine)
    val l2 = IvfPq.build(prenormed, nlist = 4, m = 2, ksub = 48, maxIter = 10)
    val a = pairs(IvfPq.search(cos, q(q8), 10, nprobe = 4))
    val b = pairs(IvfPq.search(l2, q(Metric.unit(q8)), 10, nprobe = 4))
    assert(a == b)
    val local = IvfPq.serve(cos).search(q8, 10, nprobe = 4)
    assert(local == a.map { case (id, d) => (id, d) })
  }

  test("IVFPQ persistence round-trips the outer metric") {
    val idx = IvfPq.build(skewed, nlist = 4, m = 2, ksub = 48, maxIter = 10,
      metric = Metric.Cosine)
    val want = pairs(IvfPq.search(idx, q(q8), 10, nprobe = 4))
    val path = java.nio.file.Files.createTempDirectory("ivfpqcos").toString + "/i"
    IvfPq.write(idx, path)
    val loaded = IvfPq.read(spark, path)
    assert(loaded.metric == Metric.Cosine)
    assert(loaded.pq.metric == Metric.L2) // residual space stays L2
    assert(pairs(IvfPq.search(loaded, q(q8), 10, nprobe = 4)) == want)
  }

  test("cosine IVF build: normalized storage, probe-all cosine == flat cosine") {
    val idx = Ivf.build(skewed, nlist = 4, maxIter = 10, metric = Metric.Cosine)
    // stored vectors are unit
    val norms = idx.assigned
      .select(graft.expr.Distances.norm(col("vector")).as("n")).collect()
    norms.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-5))
    val got = pairs(Ivf.search(idx, q(q8), 10, nprobe = 4, Metric.Cosine))
    val flat = pairs(FlatKnn.search(skewed, q(q8), 10, Metric.Cosine))
    assert(got.map(_._1) == flat.map(_._1))
    got.zip(flat).foreach { case ((_, a), (_, b)) => assert(math.abs(a - b) < 1e-6) }
  }

  test("cosine IVF partitioned artifact restores self-contained (rows+centroids+metric)") {
    val idx = Ivf.build(skewed, nlist = 4, maxIter = 10, metric = Metric.Cosine)
    val want = pairs(Ivf.search(idx, q(q8), 10, nprobe = 4, Metric.Cosine))
    val path = java.nio.file.Files.createTempDirectory("ivfcos").toString + "/ivf"
    Ivf.writePartitioned(idx, path)
    val loaded = Ivf.readPartitioned(spark, path)
    assert(loaded.metric == Metric.Cosine)
    assert(loaded.model.centroids.length == idx.model.centroids.length)
    assert(pairs(Ivf.search(loaded, q(q8), 10, nprobe = 4, Metric.Cosine)) == want)
    // the data dir itself still reads as plain rows (underscore entries skipped)
    assert(spark.read.parquet(path).count() == 48)
  }

  test("Ivf.add to a cosine index normalizes the batch and keeps the metric") {
    val idx = Ivf.build(skewed.filter(col("id") < 40), nlist = 4,
      maxIter = 10, metric = Metric.Cosine)
    val grown = Ivf.add(idx, skewed.filter(col("id") >= 40))
    assert(grown.metric == Metric.Cosine)
    // added rows arrive unit-normalized like the built ones
    grown.assigned.select(graft.expr.Distances.norm(col("vector")).as("n"))
      .collect().foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-5))
    // probe-all cosine over the grown index == flat cosine over everything
    val got = pairs(Ivf.search(grown, q(q8), 10, nprobe = 4, Metric.Cosine))
    val flat = pairs(FlatKnn.search(skewed, q(q8), 10, Metric.Cosine))
    assert(got.map(_._1) == flat.map(_._1))
    got.zip(flat).foreach { case ((_, a), (_, b)) => assert(math.abs(a - b) < 1e-6) }
  }

  test("cosine Model.encode (driver-side) == DataFrame encode, code for code") {
    val model = finePq(skewed, Metric.Cosine)
    val stored = Pq.encode(skewed, model).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    skewed.collect().foreach { r =>
      val id = r.getLong(0)
      val reEncoded = model.encode(r.getSeq[Float](1).toArray).toSeq
      assert(reEncoded == stored(id), s"code mismatch for id $id")
    }
  }

  test("unsupported PQ metrics fail fast") {
    intercept[IllegalArgumentException] {
      Pq.train(skewed, m = 2, ksub = 8, metric = Metric.DotSim)
    }
    intercept[IllegalArgumentException] {
      IvfPq.build(skewed, nlist = 2, m = 2, ksub = 8, metric = Metric.CosinePreNorm)
    }
  }
}
