package graft.vector

import graft.SparkSpec
import graft.text.BM25
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-4 embedded-serving surface: every modality the reference serves
  * in-process (flat was pinned in round 3; here PQ, IVFPQ, BM25) must
  * reproduce its own distributed path — plus the round-4 HNSW fixes
  * (persisted build params + deleted set, replace-on-re-add, O(1) id
  * lookup under mass delete).
  */
class ServingSpec extends SparkSpec {

  private lazy val gauss: DataFrame = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    (0 until 600).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat))
    }.toDF("id", "vector").cache()
  }

  private def queryOf(id: Long): DataFrame =
    gauss.filter(col("id") === id)
      .select(col("id").as("qid"), col("vector").as("qvec"))

  private def vecOf(id: Long): Array[Float] =
    gauss.filter(col("id") === id).head().getSeq[Float](1).toArray

  // ------------------------------------------------------- PQ serving

  test("pq embedded serving == distributed ADC search, bit-identical") {
    val data = gauss
    val model = Pq.train(data, m = 4, ksub = 16, maxIter = 10)
    val encoded = Pq.encode(data, model).cache()
    val local = Pq.serve(encoded, model)
    assert(local.size == 600)
    for (qid <- Seq(3L, 77L, 599L)) {
      val dist = Pq.search(encoded, model, queryOf(qid), 10)
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
      val emb = local.search(vecOf(qid), 10)
      assert(emb == dist, s"qid=$qid")
    }
  }

  test("pq embedded: k<=0 returns all, empty index returns empty") {
    val model = Pq.train(gauss, m = 4, ksub = 16, maxIter = 5)
    val encoded = Pq.encode(gauss, model)
    val local = Pq.serve(encoded, model)
    assert(local.search(vecOf(0L), 0).size == 600)
    val empty = Pq.serve(encoded.filter(col("id") < 0), model)
    assert(empty.search(vecOf(0L), 10).isEmpty)
  }

  // ---------------------------------------------------- IVFPQ serving

  test("ivfpq embedded serving == distributed search, bit-identical") {
    val idx = IvfPq.build(gauss, nlist = 8, m = 4, ksub = 16, maxIter = 10)
    val cached = idx.copy(encoded = idx.encoded.cache())
    val local = IvfPq.serve(cached)
    assert(local.size == 600)
    for (qid <- Seq(5L, 123L, 598L); np <- Seq(2, 8)) {
      val dist = IvfPq.search(cached, queryOf(qid), 10, nprobe = np)
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
      val emb = local.search(vecOf(qid), 10, nprobe = np)
      assert(emb == dist, s"qid=$qid nprobe=$np")
    }
  }

  test("ivfpq embedded: probe-all equals pq over same codes' ranking size") {
    val idx = IvfPq.build(gauss, nlist = 4, m = 4, ksub = 16, maxIter = 5)
    val local = IvfPq.serve(idx.copy(encoded = idx.encoded.cache()))
    // nprobe beyond nlist clamps; k beyond size returns all
    val all = local.search(vecOf(9L), 0, nprobe = 99)
    assert(all.size == 600)
    assert(all == all.sortBy { case (id, d) => (d, id) })
  }

  // ----------------------------------------------------- BM25 serving

  private lazy val textDocs: DataFrame = {
    val s = spark
    import s.implicits._
    (0L until 200L).map { i =>
      val words = (0 until 8).map(j => s"w${(i * 13 + j * 7) % 40}")
      (i, words.mkString(" "))
    }.toDF("id", "text").cache()
  }

  test("bm25 embedded serving == DataFrame search (ids exact, scores to ulps)") {
    val corpus = BM25.build(textDocs)
    val local = BM25.serve(corpus)
    assert(local.size == 200)
    for (q <- Seq("w0 w7 w13", "w39", "w1 w1 w2")) {
      val dist = corpus.search(q, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val emb = local.search(q, 10)
      assert(emb.map(_._1) == dist.map(_._1), s"q=$q ids")
      emb.zip(dist).foreach { case ((_, se), (_, sd)) =>
        assert(math.abs(se - sd) < 1e-9, s"q=$q score")
      }
    }
  }

  test("bm25 embedded: unknown terms / empty query => empty; k caps") {
    val corpus = BM25.build(textDocs)
    val local = BM25.serve(corpus)
    assert(local.search("zzz qqq", 10).isEmpty)
    assert(local.search("", 10).isEmpty)
    assert(local.search("w0", 3).size == 3)
    // k <= 0 = all matching docs (limiter.go:12-17), embedded == distributed
    val allLocal = local.search("w0", 0)
    assert(allLocal.size > 3)
    val allDist = corpus.search("w0", 0).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(allLocal == allDist)
    assert(local.search("w0", -5).size == allLocal.size)
  }

  test("bm25 embedded serving survives the persistence round trip") {
    val corpus = BM25.build(textDocs)
    val path = java.nio.file.Files.createTempDirectory("bm25serve").toString
    BM25.write(corpus, path)
    val local = BM25.serve(BM25.read(spark, path))
    val dist = corpus.search("w0 w7", 5)
      .collect().map(_.getLong(0)).toSeq
    assert(local.search("w0 w7", 5).map(_._1) == dist)
  }

  // ------------------------------------------------- HNSW round-4 fixes

  test("hnsw dump/load round-trips the soft-delete set (no resurrection)") {
    val g = new Hnsw.LocalGraph(8, 100)
    (0L until 50L).foreach(i => g.add(i, vecOf(i)))
    g.delete(7L)
    val dumped = g.dumpNodes().toSeq
    assert(dumped.count(_._5) == 1) // the deleted mark rides along
    val g2 = new Hnsw.LocalGraph(8, 100)
    dumped.foreach { case (id, v, lvl, es, del) => g2.loadNode(id, v, lvl, es, del) }
    val res = g2.search(vecOf(7L), 5, 200)
    assert(!res.map(_._1).contains(7L))
    assert(g2.liveSize == 49)
  }

  test("hnsw write/read preserves non-default build params (m, efConstruction)") {
    val idx = Hnsw.build(gauss.repartition(2), m = 5, efConstruction = 77)
    val path = java.nio.file.Files.createTempDirectory("hnswmeta").toString
    Hnsw.write(idx, path)
    val loaded = Hnsw.read(spark, path) // no params passed — meta must win
    assert(loaded.m == 5 && loaded.efConstruction == 77)
    // add() on the loaded index regrows shards with the SAME caps
    val s = spark
    import s.implicits._
    val extra = Seq((9000L, Array.fill(16)(0.5f))).toDF("id", "vector")
    val grown = Hnsw.add(loaded, extra)
    assert(grown.m == 5)
    val q = Seq((9000L, Array.fill(16)(0.5f))).toDF("qid", "qvec")
    val top = Hnsw.searchIndex(grown, q, 1)
      .collect().map(_.getLong(1)).toSeq
    assert(top == Seq(9000L))
  }

  test("hnsw re-adding an id replaces the node (no duplicate top-k slots)") {
    val g = new Hnsw.LocalGraph(8, 100)
    (0L until 30L).foreach(i => g.add(i, vecOf(i)))
    // re-add id 5 with a NEW in-distribution vector away from its old
    // position (a far outlier can lose all backlinks to nearest-only
    // pruning — the reference's nearest-M selection has the same property)
    val newV = Array.fill(16)(0.3f)
    g.add(5L, newV)
    assert(g.liveSize == 30) // old node tombstoned, not double-counted
    // id 5 resolves to the new vector...
    assert(g.vectorOf(5L).get.toSeq == newV.toSeq)
    // ...and search near the NEW position finds it, near the OLD does not
    val near = g.search(newV, 1, 200)
    assert(near.head._1 == 5L && near.head._2 == 0.0)
    val old = g.search(vecOf(5L), 30, 200)
    assert(old.count(_._1 == 5L) == 1) // never two slots for one id
  }

  test("hnsw mass delete via id map: 2k deletes from a 20k-node graph") {
    val rnd = new scala.util.Random(7)
    val g = new Hnsw.LocalGraph(8, 40)
    (0L until 20000L).foreach { i =>
      g.add(i, Array.fill(8)(rnd.nextGaussian().toFloat))
    }
    val t0 = System.nanoTime()
    (0L until 2000L).foreach(i => assert(g.delete(i * 7 % 20000)))
    val sec = (System.nanoTime() - t0) / 1e9
    assert(g.liveSize == 18000)
    assert(sec < 1.0, s"2k soft deletes took $sec s — id lookup is not O(1)")
    val q = Array.fill(8)(0.0f)
    assert(g.search(q, 10, 200).forall { case (id, _) => !g.vectorOf(id).isEmpty })
  }

  // ------------------------------------------- prenorm / cosine serving

  test("prenorm embedded serving == distributed CosinePreNorm, bit-identical " +
       "on non-unit AND zero vectors (no re-normalization, zero rows kept)") {
    val s = spark
    import s.implicits._
    // deliberately NON-unit rows plus a zero row: serveCosine would
    // renormalize / drop these; the prenorm contract must not
    val data = Seq(
      (0L, Array(3f, 0f, 0f)), (1L, Array(0f, 0.5f, 0f)),
      (2L, Array(1f, 1f, 1f)), (3L, Array(0f, 0f, 0f)),
      (4L, Array(-2f, 1f, 0f))
    ).toDF("id", "vector")
    val qv = Array(0.6f, 0.8f, 0f) // unit, but nothing relies on it
    val queries = Seq((0L, qv)).toDF("qid", "qvec")
    val dist = FlatKnn.search(data, queries, 5, Metric.CosinePreNorm)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val emb = FlatKnn.servePreNorm(data).search(qv, 5)
    assert(emb == dist, s"emb=$emb dist=$dist")
    // the zero row survives at clamp(1-0)=1.0 exactly
    assert(emb.toMap.get(3L).contains(1.0))
  }

  test("embedded cosine scores are clamped to [0,2] like Distances.cosine") {
    val s = spark
    import s.implicits._
    // self-query: unclamped 1-dot(v̂,v̂) can round to -1e-16
    val data = Seq(
      (0L, Array(0.37f, 0.91f, 0.17f)), (1L, Array(-0.91f, -0.37f, 0.2f))
    ).toDF("id", "vector")
    val qv = Array(0.37f, 0.91f, 0.17f)
    val emb = FlatKnn.serveCosine(data).search(qv, 2)
    assert(emb.forall { case (_, sc) => sc >= 0.0 && sc <= 2.0 })
    val queries = Seq((0L, qv)).toDF("qid", "qvec")
    val dist = FlatKnn.search(data, queries, 2, Metric.Cosine)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    // same ids; scores to float32-prenorm precision (rows are stored as
    // normalized floats locally, doubles distributed)
    assert(emb.map(_._1) == dist.map(_._1))
    emb.zip(dist).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-6)
    }
  }

  test("flat/ivf threshold with a similarity metric fails fast") {
    intercept[IllegalArgumentException] {
      FlatKnn.search(gauss, queryOf(1L), 5, Metric.DotSim, threshold = Some(1.0))
    }
    val ivf = Ivf.build(gauss, nlist = 4, maxIter = 5)
    intercept[IllegalArgumentException] {
      Ivf.search(ivf, queryOf(1L), 5, nprobe = 2, metric = Metric.DotSim,
        threshold = Some(1.0))
    }
  }

  // ---- round-19: structural per-query work observable (r18 verdict
  // residual — the 10M serve gate's ms/query wall clock swung 2x on a
  // noisy host while every structural gate held; the distance-eval
  // counter is the deterministic replacement) ----

  test("hnsw serving counts query-side distance evaluations: the delta " +
       "per search is positive, FAR below the corpus (graph regime, not " +
       "a scan), and monotonic across searches; build-path work is " +
       "excluded (a fresh-built graph starts near zero)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val n = 4000
    val data = (0 until n).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat))
    }.toDF("id", "vector")
    val idx = Hnsw.build(data, m = 8, efConstruction = 64)
    val serving = Hnsw.serve(idx)
    val afterBuild = serving.distEvals
    val q = Array.fill(16)(rnd.nextGaussian().toFloat)
    assert(serving.search(q, 10, efSearch = 32).nonEmpty)
    val perQuery = serving.distEvals - afterBuild
    assert(perQuery > 0L, "search must evaluate distances")
    assert(perQuery < n / 2L,
      s"one ef=32 beam evaluated $perQuery distances over a $n-doc " +
        "corpus — that is a scan, not a graph traversal")
    // monotonic: a second search only widens the counter
    serving.search(q, 10, efSearch = 32)
    assert(serving.distEvals - afterBuild > perQuery)
  }

  test("the facade's serve() handle surfaces the HNSW leg's distance " +
       "evals (vecDistEvals Some + growing), and a flat-legged handle " +
       "reports None — the SERVE10M structural gate's exact read path") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (0 until 500).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat))
    }.toDF("id", "vector")
    val root = java.nio.file.Files.createTempDirectory("servework").toString
    val hs = new graft.store.HybridStore(spark, root,
      graft.hybrid.Hybrid.Config(k = 5),
      incrementalHnsw = Some(graft.store.HybridStore.HnswSpec(
        m = 8, efConstruction = 32, efSearch = 16, persist = false)))
    hs.append(docs)
    assert(hs.search(queryVec = Some(queryOf(1L)
      .select(col("qid"), expr("slice(qvec, 1, 8)").as("qvec"))))
      .count() > 0)
    val handle = hs.serve()
    val e0 = handle.vecDistEvals
    assert(e0.nonEmpty, "HNSW-legged handle must expose the counter")
    val q = Array.fill(8)(rnd.nextGaussian().toFloat)
    assert(handle.search(Seq.empty, Some(q), None).nonEmpty)
    val e1 = handle.vecDistEvals
    assert(e1.get > e0.get, "a search must advance the counter")
    assert(e1.get - e0.get < 500L, "an ef=16 beam over 500 docs must " +
      "not evaluate the whole corpus")
    hs.close()
    // flat leg: no counter — the gate must notice absence, not gate on 0
    val root2 = java.nio.file.Files.createTempDirectory("serveflat").toString
    val flat = new graft.store.HybridStore(spark, root2,
      graft.hybrid.Hybrid.Config(k = 5))
    flat.append(docs)
    assert(flat.search(queryVec = Some(queryOf(1L)
      .select(col("qid"), expr("slice(qvec, 1, 8)").as("qvec"))))
      .count() > 0)
    assert(flat.serve().vecDistEvals.isEmpty)
    flat.close()
  }
}
