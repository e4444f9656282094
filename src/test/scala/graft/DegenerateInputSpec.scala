package graft

import graft.text.BM25
import graft.vector.{FlatKnn, Hnsw, Ivf, IvfPq, Metric, Pq}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Validation-error and empty/degenerate-input enumeration — the rows of
  * the reference's per-index search test matrices that exercise k
  * sanitization, dimension validation, empty indexes, and deleted-node
  * behavior (`/root/reference/hnsw_index_search_test.go:123-1292`,
  * `pq_index_test.go`, `flat_index_search.go:231-233`,
  * `limiter.go:12-17`). */
class DegenerateInputSpec extends SparkSpec {

  private def vecs(n: Int, d: Int = 4): DataFrame = {
    val s = spark
    import s.implicits._
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(d)(j => (math.sin(i * 13 + j * 7) * 10).toFloat))
    }.toDF("id", "vector")
  }

  private def q(v: Array[Float]): DataFrame = {
    val s = spark
    import s.implicits._
    Seq((0L, v)).toDF("qid", "qvec")
  }

  private val q4 = Array(1f, 2f, 3f, 4f)

  // ---- k sanitization (limiter.go:12-17: k <= 0 means "all") ----

  test("flat: k <= 0 returns ALL rows sorted; k > n returns n rows") {
    val data = vecs(7)
    assert(FlatKnn.search(data, q(q4), 0).count() == 7)
    assert(FlatKnn.search(data, q(q4), -3).count() == 7)
    assert(FlatKnn.search(data, q(q4), 100).count() == 7)
  }

  test("ivf: k > n and nprobe > nlist are clamped, not errors") {
    val idx = Ivf.build(vecs(6), nlist = 2, maxIter = 3)
    assert(Ivf.search(idx, q(q4), 100, nprobe = 99).count() == 6)
  }

  test("hnsw: k > n returns n rows; k <= 0 returns all the beam found (limiter.go:12-17)") {
    val idx = Hnsw.build(vecs(5))
    assert(Hnsw.searchIndex(idx, q(q4), 100).count() == 5)
    // sanitizeK applies to HNSW like every index: k <= 0 = all results
    // the beam surfaced (at exhaustive ef on 5 nodes, that's all 5)
    assert(Hnsw.searchIndex(idx, q(q4), 0).count() == 5)
    assert(Hnsw.searchIndex(idx, q(q4), -3).count() == 5)
    assert(Hnsw.serve(idx).search(q4, 0).size == 5)
  }

  test("pq: k > n returns n rows") {
    val data = vecs(5)
    val model = Pq.train(data, m = 2, ksub = 16, maxIter = 3)
    val enc = Pq.encode(data, model)
    assert(Pq.search(enc, model, q(q4), 100).count() == 5)
  }

  test("bm25: k > corpus size returns only matching docs") {
    val s = spark
    import s.implicits._
    val corpus = BM25.build(Seq((1L, "alpha beta"), (2L, "beta gamma"))
      .toDF("id", "text"))
    assert(corpus.search("beta", 100).count() == 2)
    assert(corpus.search("alpha", 100).count() == 1)
  }

  // ---- dimension validation (flat_index_search.go:231-233) ----

  test("embedded flat: query dim mismatch fails fast") {
    val local = FlatKnn.serve(vecs(5))
    val e = intercept[IllegalArgumentException](
      local.search(Array(1f, 2f), 3))
    assert(e.getMessage.contains("dim"))
  }

  test("zero query with cosine fails fast; other metrics accept it " +
      "(flat_index_search_test.go:321-333, distance.go ErrZeroVector)") {
    val data = vecs(5)
    val zero = Array(0f, 0f, 0f, 0f)
    // cosine-family flat backends reject the directionless query
    for (m <- Seq(Metric.Cosine, Metric.CosinePreNorm)) {
      val e = intercept[IllegalArgumentException](
        graft.vector.VectorSearch.onFlat(data, m)
          .withQuery(zero).withK(1).execute())
      assert(e.getMessage.contains("zero vector"))
    }
    // L2 accepts it (distance to the origin is well-defined)
    assert(graft.vector.VectorSearch.onFlat(data, Metric.L2)
      .withQuery(zero).withK(1).execute().count() == 1)
    // a cosine-built IVF index rejects it through the same fluent path
    val cosIdx = Ivf.build(data, nlist = 2, maxIter = 3,
      metric = Metric.Cosine)
    intercept[IllegalArgumentException](
      graft.vector.VectorSearch.onIvf(cosIdx)
        .withQuery(zero).withK(1).execute())
  }

  test("zero query with cosine fails fast on PQ and IVFPQ too " +
      "(pq_index_search.go:237, ivfpq_index_search.go:252 share " +
      "distance.Preprocess with the flat path)") {
    val data = vecs(12)
    val zero = Array(0f, 0f, 0f, 0f)
    // PQ: cosine model rejects; L2 model accepts (distance to origin is
    // well-defined in the coded space too)
    val cosModel = Pq.train(data, m = 2, ksub = 4, maxIter = 3,
      metric = Metric.Cosine)
    val cosEnc = Pq.encode(data, cosModel)
    val e1 = intercept[IllegalArgumentException](
      graft.vector.VectorSearch.onPq(cosEnc, cosModel)
        .withQuery(zero).withK(1).execute())
    assert(e1.getMessage.contains("zero vector"))
    val l2Model = Pq.train(data, m = 2, ksub = 4, maxIter = 3)
    val l2Enc = Pq.encode(data, l2Model)
    assert(graft.vector.VectorSearch.onPq(l2Enc, l2Model)
      .withQuery(zero).withK(1).execute().count() == 1)
    // IVFPQ: cosine index rejects through the same guard
    val cosIdx = IvfPq.build(data, nlist = 2, m = 2, ksub = 4,
      maxIter = 3, metric = Metric.Cosine)
    val e2 = intercept[IllegalArgumentException](
      graft.vector.VectorSearch.onIvfPq(cosIdx)
        .withQuery(zero).withK(1).execute())
    assert(e2.getMessage.contains("zero vector"))
  }

  test("empty (dim-0) query array is rejected explicitly, not mislabeled " +
      "as a zero vector (forall on empty is vacuously true)") {
    val data = vecs(5)
    // flat/HNSW have no driver-resident dim, so without the explicit
    // guard an empty query on a cosine backend would hit the zero-vector
    // branch with a misleading message
    val e = intercept[IllegalArgumentException](
      graft.vector.VectorSearch.onFlat(data, Metric.Cosine)
        .withQuery(Array.empty[Float]).withK(1).execute())
    assert(e.getMessage.contains("empty query"))
    // and on a non-cosine backend it is still rejected up front
    val e2 = intercept[IllegalArgumentException](
      graft.vector.VectorSearch.onFlat(data, Metric.L2)
        .withQuery(Array.empty[Float]).withK(1).execute())
    assert(e2.getMessage.contains("empty query"))
  }

  test("hnsw local graph: insert dim mismatch fails fast") {
    val g = new Hnsw.LocalGraph()
    g.add(1L, Array(1f, 2f, 3f))
    val e = intercept[IllegalArgumentException](g.add(2L, Array(1f, 2f)))
    assert(e.getMessage.contains("dim"))
  }

  test("pq train: dim not divisible by m fails fast") {
    val e = intercept[IllegalArgumentException](
      Pq.train(vecs(8, d = 5), m = 2, ksub = 4, maxIter = 1))
    assert(e.getMessage.contains("divisible"))
  }

  // ---- threshold + descending metric (round-3 ADVICE fail-fast) ----

  test("flat + ivf: threshold with a similarity metric fails fast") {
    val data = vecs(5)
    intercept[IllegalArgumentException](
      FlatKnn.search(data, q(q4), 3, Metric.DotSim, threshold = Some(1.0)))
    val idx = Ivf.build(data, nlist = 2, maxIter = 3)
    intercept[IllegalArgumentException](
      Ivf.search(idx, q(q4), 3, nprobe = 2, Metric.DotSim,
        threshold = Some(1.0)))
  }

  // ---- empty indexes ----

  test("embedded flat: empty index returns empty") {
    val local = FlatKnn.serve(vecs(0))
    assert(local.search(q4, 5).isEmpty)
  }

  test("hnsw local graph: empty graph returns empty; single node returns it") {
    val g = new Hnsw.LocalGraph()
    assert(g.search(q4, 5, 50).isEmpty)
    g.add(42L, q4)
    assert(g.search(q4, 5, 50).map(_._1) == Seq(42L))
  }

  test("ivfpq: empty probed clusters yield empty, not an error") {
    val idx = IvfPq.build(vecs(6), nlist = 2, m = 2, ksub = 4, maxIter = 3)
    // candidate set that excludes everything
    val s = spark
    import s.implicits._
    val none = Seq.empty[Long].toDF("id")
    assert(IvfPq.search(idx, q(q4), 5, nprobe = 2,
      candidates = Some(none)).count() == 0)
  }

  // ---- deleted-node behavior (hnsw_index.go:348-372) ----

  test("hnsw local graph: deleted node never surfaces, neighbors still found") {
    val g = new Hnsw.LocalGraph()
    (0 until 20).foreach(i => g.add(i.toLong,
      Array.tabulate(4)(j => (i * 4 + j).toFloat)))
    val target = g.search(Array(8f, 9f, 10f, 11f), 1, 50).head._1
    assert(target == 2L)
    assert(g.delete(2L))
    val after = g.search(Array(8f, 9f, 10f, 11f), 5, 50).map(_._1)
    assert(!after.contains(2L) && after.nonEmpty)
    // deleting an absent or already-deleted id reports false
    assert(!g.delete(2L) && !g.delete(999L))
  }

  test("hnsw local graph: delete ALL nodes -> empty result, liveSize 0") {
    val g = new Hnsw.LocalGraph()
    (0 until 5).foreach(i => g.add(i.toLong, Array(i.toFloat, 0f, 0f, 0f)))
    (0 until 5).foreach(i => g.delete(i.toLong))
    assert(g.liveSize == 0)
    assert(g.search(q4, 3, 50).isEmpty)
  }

  test("hnsw local graph: re-added id REPLACES the old node (hnsw_index.go:232-251)") {
    val g = new Hnsw.LocalGraph()
    g.add(1L, Array(0f, 0f, 0f, 0f))
    g.add(2L, Array(100f, 0f, 0f, 0f))
    g.add(1L, Array(50f, 0f, 0f, 0f)) // moves id 1
    val res = g.search(Array(49f, 0f, 0f, 0f), 2, 50)
    assert(res.head._1 == 1L)
    assert(math.abs(res.head._2 - 1.0) < 1e-9) // new position, not old
    // the id occupies ONE result slot even though two nodes exist
    assert(res.map(_._1).count(_ == 1L) == 1)
    assert(g.vectorOf(1L).get.head == 50f)
  }

  // ---- efSearch is a real knob: exhaustive beam = exact ----

  test("hnsw: recall is monotone from starved to exhaustive beam") {
    val data = vecs(300)
    val g = new Hnsw.LocalGraph()
    data.collect().foreach(r =>
      g.add(r.getLong(0), r.getSeq[Float](1).toArray))
    val queries = (0 until 10).map(i =>
      Array.tabulate(4)(j => (math.cos(i * 5 + j) * 10).toFloat))
    val flatLocal = FlatKnn.serve(data)
    val exact = queries.map(qv => flatLocal.search(qv, 10).map(_._1).toSet)
    def recall(ef: Int): Double = queries.zip(exact).map { case (qv, t) =>
      (g.search(qv, 10, ef).map(_._1).toSet & t).size
    }.sum / (10.0 * 10)
    val starved = recall(10)
    val exhaustive = recall(300)
    assert(exhaustive == 1.0, s"exhaustive beam must be exact, got $exhaustive")
    assert(starved <= exhaustive)
  }

  test("hnsw: all-identical vectors (every pairwise distance zero) build " +
       "and search without starving the diversity heuristic") {
    // the Alg-4 diversity rule compares dist(cand, base) < dist(cand, sel)
    // — with ALL distances exactly 0.0 nothing is strictly closer, every
    // candidate is 'diverse', and keepPruned backfill must still cap the
    // degree; search must return k distinct ids at distance 0
    val g = new Hnsw.LocalGraph(m = 4, efConstruction = 20)
    (0L until 50L).foreach(i => g.add(i, Array(1f, 2f, 3f, 4f)))
    val res = g.search(Array(1f, 2f, 3f, 4f), 10, efSearch = 100)
    assert(res.length == 10)
    assert(res.map(_._1).distinct.length == 10)
    res.foreach { case (_, d) => assert(d == 0.0) }
  }

  test("hnsw: two tight clusters with one bridge query — beam escapes the " +
       "entry cluster (diversity heuristic keeps exit edges)") {
    val g = new Hnsw.LocalGraph(m = 4, efConstruction = 30)
    // cluster A at origin, cluster B far away; insert A first so B's
    // arrivals must wire into an A-dominated graph
    (0L until 40L).foreach(i => g.add(i, Array(i * 0.01f, 0f, 0f, 0f)))
    (100L until 140L).foreach(i =>
      g.add(i, Array(1000f + (i - 100) * 0.01f, 0f, 0f, 0f)))
    // query near B with k spanning both clusters: the beam enters via the
    // entry point (likely A-side) and must still surface all of B
    val res = g.search(Array(1000.2f, 0f, 0f, 0f), 45, efSearch = 200)
    val ids = res.map(_._1).toSet
    assert((100L until 140L).forall(ids.contains),
      s"lost ${(100L until 140L).count(!ids.contains(_))} of the far cluster")
  }

  // ---- zero-norm cosine (distance.go:252-254) ----

  test("cosine serving: zero-norm query and zero-norm rows drop out") {
    val s = spark
    import s.implicits._
    val data = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 0f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f, 0f))
    ).toDF("id", "vector")
    val local = FlatKnn.serveCosine(data)
    assert(local.size == 2) // zero-norm row rejected at insert
    assert(local.search(Array(0f, 0f, 0f, 0f), 3).isEmpty) // zero-norm query
    val res = local.search(Array(1f, 0f, 0f, 0f), 3)
    assert(res.map(_._1) == Seq(1L, 3L))
    assert(math.abs(res.head._2) < 1e-9) // identical direction -> distance 0
  }

  // ---- search after ALL nodes deleted (TestHNSWIndexSearchAfterAllDeleted) ----

  test("hnsw: search after all nodes deleted is empty, soft and hard") {
    val data = vecs(12)
    val idx = Hnsw.build(data.repartition(3))
    val allIds = (0L until 12L)
    // hard purge of every node: empty graphs, empty result, no error
    val flushed = Hnsw.deleteFlush(idx, allIds)
    assert(Hnsw.searchIndex(flushed, q(q4), 5).count() == 0)
    // embedded twin agrees
    assert(Hnsw.serve(flushed).search(q4, 5).isEmpty)
    // and the original index is untouched (immutable-index discipline)
    assert(Hnsw.searchIndex(idx, q(q4), 5).count() == 5)
  }

  // ---- single-node corpus (TestHNSWIndexSearchSingleNode) ----

  test("single-node corpus: every index returns exactly that node") {
    val s = spark
    import s.implicits._
    val one = Seq((42L, q4)).toDF("id", "vector")
    val flat = FlatKnn.search(one, q(q4), 5).collect()
    assert(flat.length == 1 && flat.head.getLong(1) == 42L
      && flat.head.getDouble(2) == 0.0)
    val hnsw = Hnsw.searchIndex(Hnsw.build(one), q(q4), 5).collect()
    assert(hnsw.length == 1 && hnsw.head.getLong(1) == 42L)
    val ivf = Ivf.build(one, nlist = 1, maxIter = 2)
    val ir = Ivf.search(ivf, q(q4), 5, nprobe = 1).collect()
    assert(ir.length == 1 && ir.head.getLong(1) == 42L)
  }

  test("pipeline ops on empty and token-less corpora: empty results or " +
       "well-defined zeros, never NaN/null/crash") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, String, String)].toDF("id", "text", "src")
    // empty corpus -> empty outputs everywhere
    assert(graft.pipeline.Dedup.spanProfile(empty, "id", "text").count() == 0)
    assert(graft.pipeline.TextAnalysis.gopherFilter(empty, "id", "text")
      .count() == 0)
    assert(graft.pipeline.Curation.temperatureWeights(empty, "src", "text")
      .count() == 0)
    // token-less docs: spanProfile emits nothing (no spans), gopherFilter
    // emits zeros with keep=false, temperature weights must stay finite
    val blank = Seq((1L, "", "a"), (2L, "   ", "a"), (3L, "!!!", "b"))
      .toDF("id", "text", "src")
    assert(graft.pipeline.Dedup.spanProfile(blank, "id", "text").count() == 0)
    val gf = graft.pipeline.TextAnalysis.gopherFilter(blank, "id", "text")
      .collect()
    assert(gf.length == 3)
    gf.foreach { r =>
      assert(r.getLong(1) == 0L && r.getDouble(2) == 0.0 &&
        !r.getBoolean(12), s"token-less doc must drop cleanly: $r")
    }
    val tw = graft.pipeline.Curation.temperatureWeights(blank, "src", "text")
      .collect()
    assert(tw.length == 2)
    tw.foreach { r =>
      val (w, boost) = (r.getDouble(3), r.getDouble(4))
      assert(!w.isNaN && !boost.isNaN,
        s"zero-token sources must not produce NaN weights: $r")
    }
    // the all-zero corpus mixes uniformly (the alpha -> 0 limit)
    assert(tw.map(_.getDouble(3)).sum == 1.0)
    // tokenStats / qualityScore on token-less docs: zeros, not /0 crashes
    val ts = graft.pipeline.TextAnalysis.tokenStats(blank, "id", "text")
      .collect()
    assert(ts.length == 3 && ts.forall(r =>
      r.getLong(1) == 0L && r.getDouble(3) == 0.0))
    val qs = graft.pipeline.TextAnalysis.qualityScore(blank, "id", "text")
      .collect()
    assert(qs.length == 3 && qs.forall(r =>
      r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0))
  }
}
