package graft.vector

import org.apache.spark.sql.functions._

/** Metric persistence totality: metricOf ∘ metricName must be the identity
  * over ALL five metrics (a catch-all that mapped CosinePreNorm/DotSim to
  * "l2" silently re-scored a reloaded DotSim IVF index in ascending L2 —
  * the round-6 advice finding), and the partitioned IVF artifact must
  * restore the build metric. */
class MetricRoundTripSpec extends graft.SparkSpec {

  test("metricName/metricOf are a total bijection over the metric set") {
    val all = Seq(Metric.L2, Metric.L2Sq, Metric.Cosine,
      Metric.CosinePreNorm, Metric.DotSim)
    all.foreach { m =>
      assert(Pq.metricOf(Pq.metricName(m)) == m, s"round trip broke for $m")
    }
    assert(all.map(Pq.metricName).distinct.size == all.size,
      "two metrics share a persisted name")
    assert(Pq.metricOf("unknown_future_name") == Metric.L2) // documented default
  }

  test("IVF partitioned artifact restores a non-default build metric " +
       "(DotSim ordering must survive reload)") {
    val s = spark
    import s.implicits._
    val data = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(4)(j => (math.sin(i * 0.9 + j) * 5).toFloat))
    }.toDF("id", "vector")
    val idx = Ivf.build(data, nlist = 4, maxIter = 5, metric = Metric.DotSim)
    assert(idx.metric == Metric.DotSim)
    val path = java.nio.file.Files.createTempDirectory("ivf-dot").toString
    Ivf.writePartitioned(idx, path)
    val loaded = Ivf.readPartitioned(spark, path)
    assert(loaded.metric == Metric.DotSim,
      "reloaded index lost its metric — searches would re-score in L2 asc")
    // and a DotSim search over the reloaded index equals the live one
    val q = data.filter(col("id") === 7L)
      .select(col("id").as("qid"), col("vector").as("qvec"))
    val a = Ivf.search(idx, q, 5, nprobe = 4, metric = idx.metric)
      .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = Ivf.search(loaded, q, 5, nprobe = 4, metric = loaded.metric)
      .select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b)
  }
}
