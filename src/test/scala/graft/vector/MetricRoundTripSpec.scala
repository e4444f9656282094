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

  test("flat artifact: metric restored, cosine rows stored prenormalized, " +
       "reload search-equivalent on every metric " +
       "(flat_index_test.go:366-614 WriteTo/ReadFrom/RoundTrip)") {
    val s = spark
    import s.implicits._
    val data = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(5)(j => (math.cos(i * 1.1 + j * 0.7) * 9).toFloat))
    }.toDF("id", "vector")
    val q = data.filter(col("id") === 4L)
      .select(col("id").as("qid"), col("vector").as("qvec"))
    for (m <- Seq(Metric.L2, Metric.L2Sq, Metric.Cosine, Metric.DotSim)) {
      val path = java.nio.file.Files.createTempDirectory(s"flat-$m").toString
      FlatKnn.write(data, m, path)
      val (loaded, met) = FlatKnn.read(spark, path)
      assert(met == m, s"metric $m lost in the artifact")
      val direct = FlatKnn.search(Pq.prepData(data, m), q, 8, m)
        .collect().map(_.getLong(1)).toSeq
      val reloaded = FlatKnn.search(loaded, q, 8, met)
        .collect().map(_.getLong(1)).toSeq
      assert(reloaded == direct, s"round trip diverged under $m")
      if (m == Metric.Cosine) {
        // normalize-at-insert: every stored row is unit length
        val norms = loaded.select(
          graft.expr.Distances.norm(col("vector")).as("n")).collect()
        assert(norms.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-6),
          "cosine artifact rows are not prenormalized")
      }
    }
    // an empty index round-trips to an empty, searchable index
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "vector")
    val p = java.nio.file.Files.createTempDirectory("flat-empty").toString
    FlatKnn.write(empty, Metric.L2, p)
    val (e, mm) = FlatKnn.read(spark, p)
    assert(mm == Metric.L2 && e.count() == 0)
    assert(FlatKnn.search(e, q, 5, mm).collect().isEmpty)
  }

  test("flat artifact with lost/corrupt metric meta FAILS the read — a " +
       "cosine index silently served as L2 returns wrong neighbors with " +
       "no error (the reference's ReadFrom fails on a malformed blob, " +
       "flat_index.go:416-427)") {
    val s = spark
    import s.implicits._
    val data = (0 until 10).map(i =>
      (i.toLong, Array.tabulate(4)(j => (i + j).toFloat))).toDF("id", "vector")
    val path = java.nio.file.Files.createTempDirectory("flat-nometa").toString
    FlatKnn.write(data, Metric.Cosine, path)
    // simulate a lost meta file
    val meta = new java.io.File(path, "_graft_meta.json")
    assert(meta.exists())
    assert(meta.delete())
    val ex = intercept[IllegalStateException](FlatKnn.read(spark, path))
    assert(ex.getMessage.contains("metric"))
    // and a present-but-gibberish meta file fails the same way
    val path2 = java.nio.file.Files.createTempDirectory("flat-badmeta").toString
    FlatKnn.write(data, Metric.Cosine, path2)
    // drop the local-FS checksum sidecar so the out-of-band rewrite below
    // reads back as DATA corruption (bad content), not a crc mismatch
    new java.io.File(path2, "._graft_meta.json.crc").delete()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path2, "_graft_meta.json"),
      """{"oops":"no metric here"}""".getBytes("UTF-8"))
    intercept[IllegalStateException](FlatKnn.read(spark, path2))
  }

  test("legacy-artifact migration: Pq.stampMetric is the ONLY way a " +
       "metric-less artifact becomes readable — an explicit, " +
       "operator-asserted stamp (never an implicit default), idempotent " +
       "for the same metric, and refusing to re-stamp a different one") {
    val s = spark
    import s.implicits._
    val data = (0 until 10).map(i =>
      (i.toLong, Array.tabulate(4)(j => (i + j).toFloat))).toDF("id", "vector")
    val path = java.nio.file.Files.createTempDirectory("flat-migrate").toString
    FlatKnn.write(data, Metric.Cosine, path)
    // simulate a pre-metric-recording artifact: no meta file at all
    assert(new java.io.File(path, "_graft_meta.json").delete())
    new java.io.File(path, "._graft_meta.json.crc").delete()
    intercept[IllegalStateException](FlatKnn.read(spark, path))
    // the operator knows it was cosine-built: one explicit stamp
    Pq.stampMetric(spark, path, Metric.Cosine)
    val (loaded, met) = FlatKnn.read(spark, path)
    assert(met == Metric.Cosine && loaded.count() == 10)
    // idempotent for the same metric
    Pq.stampMetric(spark, path, Metric.Cosine)
    assert(FlatKnn.read(spark, path)._2 == Metric.Cosine)
    // a DIFFERENT metric is a score-space rewrite, not a migration
    val ex = intercept[IllegalStateException](
      Pq.stampMetric(spark, path, Metric.L2))
    assert(ex.getMessage.contains("refusing"))
    // stamping MERGES into existing non-metric meta (HNSW records
    // m/efConstruction alongside): both survive
    val hpath = java.nio.file.Files.createTempDirectory("hnsw-migrate").toString
    val idx = Hnsw.build(data, m = 6)
    Hnsw.write(idx, hpath)
    // strip just the metric key, keep m/efConstruction (a pre-metric HNSW dump)
    val metaPath = java.nio.file.Paths.get(hpath, "_graft_meta.json")
    val stripped = new String(java.nio.file.Files.readAllBytes(metaPath),
      "UTF-8").replaceAll(""","metric":"\w+"""", "")
    new java.io.File(hpath, "._graft_meta.json.crc").delete()
    java.nio.file.Files.write(metaPath, stripped.getBytes("UTF-8"))
    intercept[IllegalStateException](Hnsw.read(spark, hpath))
    Pq.stampMetric(spark, hpath, Metric.L2)
    val hIdx = Hnsw.read(spark, hpath)
    assert(hIdx.metric == Metric.L2 && hIdx.m == 6,
      "stampMetric lost the existing meta entries")
  }
}
