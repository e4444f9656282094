package graft

import graft.agg.ScoreAgg
import graft.vector._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fluent VectorSearch builder (index_search.go:141-272) — each
  * configured search must equal the hand-composed pipeline it compiles
  * to, across backends. */
class VectorSearchSpec extends SparkSpec {

  private lazy val data: DataFrame = {
    val s = spark
    import s.implicits._
    (0 until 80).map { i =>
      (i.toLong, Array.tabulate(6)(j => (math.sin(i * 0.83 + j * 1.9) * 10).toFloat))
    }.toDF("id", "vector")
  }

  private val q6 = Array.tabulate(6)(j => (math.cos(j * 0.7) * 9).toFloat)

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).toSeq

  test("flat: fluent == hand-composed; defaults k=10") {
    val got = VectorSearch.onFlat(data).withQuery(q6).execute()
    val want = {
      val s = spark
      import s.implicits._
      FlatKnn.search(data, Seq((0L, q6)).toDF("qid", "qvec"), 10, Metric.L2)
        .select(col("id"), col("score"))
    }
    assert(got.collect().toSeq.map(r => (r.getLong(0), r.getDouble(1))) ==
      want.collect().toSeq.map(r => (r.getLong(0), r.getDouble(1))))
  }

  test("multi-query + node with Sum aggregation == knn_query_node shape") {
    val got = VectorSearch.onFlat(data)
      .withQuery(q6).withNodes(7L).withK(10).execute()
    // hand-composed: both queries, per-query top-10, sum-dedup by id
    val s = spark
    import s.implicits._
    val nodeVec = data.filter(col("id") === 7L).head().getSeq[Float](1).toArray
    val q = Seq((-1L, q6), (7L, nodeVec)).toDF("qid", "qvec")
    val want = FlatKnn.search(data, q, 10, Metric.L2)
      .groupBy("id").agg(sum("score").as("score"))
      .orderBy(col("score").asc, col("id").asc).limit(10)
    assert(got.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      want.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("aggregation kinds differ and obey their formulas (Max vs Sum)") {
    val base = VectorSearch.onFlat(data).withQuery(q6).withNodes(7L).withK(5)
    val sums = base.execute().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val maxs = base.withScoreAggregation(ScoreAgg.Max).execute()
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // any id hit by both queries must have max < sum; singles equal
    assert(maxs.keySet.forall(id => maxs(id) <= sums.getOrElse(id, Double.MaxValue)))
  }

  test("threshold + documentIds compose on every backend") {
    val cand = (0L until 80L by 2).toSeq // even ids only
    def check(vs: VectorSearch): Unit = {
      val rows = vs.withQuery(q6).withK(0)
        .withThreshold(24.0).withDocumentIds(cand: _*).execute().collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getLong(0) % 2 == 0)
        assert(r.getDouble(1) <= 24.0)
      }
    }
    check(VectorSearch.onFlat(data))
    check(VectorSearch.onIvf(Ivf.build(data, nlist = 4, maxIter = 5)))
    check(VectorSearch.onHnsw(Hnsw.build(data)).withEfSearch(200))
  }

  test("ivf fluent honors nprobe; hnsw fluent honors efSearch") {
    val ivf = Ivf.build(data, nlist = 8, maxIter = 5)
    val all = ids(VectorSearch.onIvf(ivf).withQuery(q6).withNProbes(8).execute())
    val flat = ids(VectorSearch.onFlat(data).withQuery(q6).execute())
    assert(all == flat) // probe-all == exact
    val hnsw = Hnsw.build(data)
    val exhaustive = ids(VectorSearch.onHnsw(hnsw).withQuery(q6)
      .withEfSearch(500).execute())
    assert(exhaustive == flat)
  }

  test("pq/ivfpq fluent run; withNodes without a source frame is rejected") {
    val model = Pq.train(data, m = 2, ksub = 80, maxIter = 5)
    val enc = Pq.encode(data, model)
    val viaPq = ids(VectorSearch.onPq(enc, model).withQuery(q6).execute())
    val flat = ids(VectorSearch.onFlat(data).withQuery(q6).execute())
    assert(viaPq == flat) // exact codebooks => exact ranking
    intercept[IllegalArgumentException] {
      VectorSearch.onPq(enc, model).withNodes(3L).execute()
    }
    val ivfpq = IvfPq.build(data, nlist = 2, m = 2, ksub = 80, maxIter = 5)
    assert(ids(VectorSearch.onIvfPq(ivfpq).withQuery(q6).withNProbes(2)
      .execute()) == flat)
    intercept[IllegalArgumentException] {
      VectorSearch.onIvfPq(ivfpq).withNodes(3L).execute()
    }
  }

  test("pq/ivfpq node search via the source frame: full-precision node " +
       "vectors, self nearest, dedup across nodes, absent id errors " +
       "(pq_index_search_test.go:111-173, ivfpq_index_search_test.go:131-288)") {
    val model = Pq.train(data, m = 2, ksub = 80, maxIter = 5)
    val enc = Pq.encode(data, model)
    // node resolves to its STORED full-precision vector -> with exact
    // codebooks the node is its own nearest neighbor
    val byNode = VectorSearch.onPq(enc, model, source = data)
      .withNodes(3L).withK(3).execute().collect()
    assert(byNode.length == 3 && byNode.head.getLong(0) == 3L)
    // equals the hand-composed query form with that node's vector
    val v3 = data.filter(col("id") === 3L).head().getSeq[Float](1).toArray
    assert(byNode.map(_.getLong(0)).toSeq ==
      ids(VectorSearch.onPq(enc, model).withQuery(v3).withK(3).execute()))
    // multi-node: default Sum aggregation dedups overlapping ids
    val multi = VectorSearch.onPq(enc, model, source = data)
      .withNodes(3L, 4L).withK(5).execute().collect().map(_.getLong(0))
    assert(multi.length == multi.distinct.length)
    // absent node id is an error, not a silent skip
    intercept[IllegalArgumentException] {
      VectorSearch.onPq(enc, model, source = data).withNodes(9999L).execute()
    }
    // ivfpq leg, probe-all: same self-nearest contract
    val ivfpq = IvfPq.build(data, nlist = 2, m = 2, ksub = 80, maxIter = 5)
    val ivfpqNode = VectorSearch.onIvfPq(ivfpq, source = data)
      .withNodes(5L).withK(3).withNProbes(2).execute().collect()
    assert(ivfpqNode.nonEmpty && ivfpqNode.head.getLong(0) == 5L)
    // combined query + node fans out both and aggregates
    val combined = VectorSearch.onIvfPq(ivfpq, source = data)
      .withQuery(q6).withNodes(5L).withK(5).withNProbes(2)
      .execute().collect().map(_.getLong(0))
    assert(combined.nonEmpty && combined.length == combined.distinct.length)
  }

  test("withThreshold(0) and negative disable filtering — the Go " +
       "zero-value contract (pq_index_search_test.go:588-609)") {
    val base = VectorSearch.onFlat(data).withQuery(q6).withK(80)
    val all = base.execute().count()
    assert(base.withThreshold(0.0).execute().count() == all)
    assert(base.withThreshold(-1.0).execute().count() == all)
    // a positive threshold still filters
    assert(base.withThreshold(1e-6).execute().count() < all)
    // same contract on the PQ fluent leg
    val model = Pq.train(data, m = 2, ksub = 80, maxIter = 5)
    val enc = Pq.encode(data, model)
    val pq = VectorSearch.onPq(enc, model).withQuery(q6).withK(80)
    assert(pq.withThreshold(0.0).execute().count() ==
      pq.execute().count())
  }

  test("cutoff applies autocut; reranker reorders the final slice") {
    val full = VectorSearch.onFlat(data).withQuery(q6).withK(10)
    val cut = full.withCutoff(1).execute().count()
    assert(cut <= 10)
    val reversed = full.withReranker(rows => rows.reverse).execute()
      .collect().map(_.getLong(0)).toSeq
    assert(reversed == ids(full.execute()).reverse)
  }

  test("no query and no nodes is a validation error; so is a missing node id") {
    intercept[IllegalArgumentException] {
      VectorSearch.onFlat(data).execute()
    }
    // absent node ids ERROR (flat_index_search.go:182-191), never silently skip
    intercept[IllegalArgumentException] {
      VectorSearch.onFlat(data).withNodes(9999L).execute()
    }
    intercept[IllegalArgumentException] {
      VectorSearch.onHnsw(Hnsw.build(data)).withNodes(9999L).execute()
    }
  }

  test("descending metric (DotSim): results rank best-first, not inverted") {
    val got = VectorSearch.onFlat(data, Metric.DotSim)
      .withQuery(q6).withK(5).execute().collect()
    val want = FlatKnn.search(data, {
      val s = spark
      import s.implicits._
      Seq((0L, q6)).toDF("qid", "qvec")
    }, 5, Metric.DotSim).collect()
    assert(got.map(_.getLong(0)).toSeq == want.map(r => r.getLong(1)).toSeq)
    // scores strictly non-increasing (similarity, best first)
    val scores = got.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("node resolution uses STORED vectors: hnsw cosine stores unit vectors") {
    val cos = Hnsw.build(data.filter(col("id") < 40), metric = Metric.Cosine)
    val got = VectorSearch.onHnsw(cos).withNodes(11L).withK(1)
      .withEfSearch(500).execute().head()
    assert(got.getLong(0) == 11L)
    assert(got.getDouble(1) < 1e-6)
  }
}
