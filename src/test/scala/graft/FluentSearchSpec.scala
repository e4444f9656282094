package graft

import graft.agg.ScoreAgg
import graft.filter.Filter
import graft.hybrid.{Hybrid, HybridSearch}
import graft.text.{BM25, TextSearch}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fluent TextSearch (index_search.go:359-424) and HybridSearch
  * (hybrid_search_index.go:320-366) — each configured form must equal the
  * hand-composed pipeline it compiles to. */
class FluentSearchSpec extends SparkSpec {

  private lazy val (meta, vectors, corpus) = {
    val s = spark
    import s.implicits._
    val m = Seq(
      (1L, "electronics", 999.0), (2L, "electronics", 499.0),
      (3L, "books", 29.0), (4L, "books", 59.0), (5L, "books", 9.0)
    ).toDF("id", "category", "price")
    val v = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0f, 1f, 0f)),
      (3L, Array(1f, 0.1f, 0f)), (4L, Array(0f, 0f, 1f)),
      (5L, Array(0.9f, 0f, 0.1f))
    ).toDF("id", "vector")
    val docs = Seq(
      (1L, "wireless noise cancelling headphones"),
      (2L, "usb charging cable fast"),
      (3L, "novel about wireless telegraph history"),
      (4L, "cookbook recipes for fast cooking"),
      (5L, "history of the telegraph")
    ).toDF("id", "text")
    (m, v, BM25.build(docs))
  }

  private def pairs(df: DataFrame): Seq[(Long, Double)] =
    df.select("id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("text: single query fluent == corpus.search") {
    val got = pairs(TextSearch.on(corpus).withQuery("wireless history").execute())
    val want = pairs(corpus.search("wireless history", 10))
    assert(got == want)
  }

  test("text: multi-query Sum aggregation == bm25_batch_agg hand-compose") {
    val got = pairs(TextSearch.on(corpus)
      .withQuery("wireless headphones", "telegraph history").withK(10).execute())
    val r1 = corpus.search("wireless headphones", 10).select(col("id"), col("score"))
    val r2 = corpus.search("telegraph history", 10).select(col("id"), col("score"))
    val want = pairs(r1.union(r2).groupBy("id").agg(sum("score").as("score"))
      .orderBy(col("score").desc, col("id")))
    assert(got == want)
  }

  test("text: node leg is more-like-this; candidates restrict scoring") {
    val viaNode = pairs(TextSearch.on(corpus).withNodes(5L).execute())
    val want = pairs(corpus.searchByDocs(Seq(5L), 10))
    assert(viaNode == want)
    assert(viaNode.head._1 == 5L) // a doc is its own best match
    val restricted = pairs(TextSearch.on(corpus)
      .withQuery("wireless").withDocumentIds(3L, 4L).execute())
    assert(restricted.map(_._1) == Seq(3L))
  }

  test("hybrid: fluent full search == Hybrid.search positional form") {
    val want = pairs(Hybrid.search(meta,
      Seq(graft.filter.FilterGroup(Seq(Filter.Eq("category", "books")))),
      Some(vectors), {
        val s = spark
        import s.implicits._
        Some(Seq((0L, Array(1f, 0f, 0f))).toDF("qid", "qvec"))
      },
      Some(corpus), Some("wireless telegraph"),
      Hybrid.Config(k = 4, fusion = Hybrid.Rrf)))
    val got = pairs(HybridSearch.on(meta)
      .withVectorLeg(Hybrid.FlatLeg(vectors))
      .withCorpus(corpus)
      .withVector(Array(1f, 0f, 0f))
      .withText("wireless telegraph")
      .withMetadata(Filter.Eq("category", "books"))
      .withK(4).withFusionKind(Hybrid.Rrf)
      .execute())
    assert(got == want)
  }

  test("hybrid: multi-text queries aggregate into ONE text modality before fusion") {
    val s = spark
    import s.implicits._
    val got = pairs(HybridSearch.on(meta)
      .withVectorLeg(Hybrid.FlatLeg(vectors)).withCorpus(corpus)
      .withVector(Array(1f, 0f, 0f))
      .withText("wireless headphones", "telegraph history")
      .withK(5).withFusionKind(Hybrid.Rrf)
      .execute())
    // hand-compose: aggregated text leg, then RRF against the vector leg
    val txt = TextSearch.on(corpus)
      .withQuery("wireless headphones", "telegraph history").withK(5).execute()
    val want = pairs(Hybrid.searchWith(meta, Seq.empty,
      Some(Hybrid.FlatLeg(vectors)),
      Some(Seq((0L, Array(1f, 0f, 0f))).toDF("qid", "qvec")),
      Some(corpus), None, Hybrid.Config(k = 5, fusion = Hybrid.Rrf),
      txtOverride = Some(txt.select(col("id"), col("score")))))
    assert(got == want)
  }

  test("hybrid: withVectors multi-query == searchWith with the same " +
       "query frame (per-query top-k, duplicate ids combined per " +
       "withScoreAggregation before fusion — storage.go:505-516)") {
    val s = spark
    import s.implicits._
    val q2 = Seq((0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)))
      .toDF("qid", "qvec")
    val want = pairs(Hybrid.searchWith(meta, Seq.empty,
      Some(Hybrid.FlatLeg(vectors)), Some(q2), Some(corpus),
      Some("wireless"),
      Hybrid.Config(k = 4, fusion = Hybrid.Rrf,
        scoreAgg = graft.agg.ScoreAgg.Max)))
    val got = pairs(HybridSearch.on(meta)
      .withVectorLeg(Hybrid.FlatLeg(vectors))
      .withCorpus(corpus)
      .withVectors(Array(1f, 0f, 0f), Array(0f, 1f, 0f))
      .withText("wireless")
      .withScoreAggregation(graft.agg.ScoreAgg.Max)
      .withK(4).withFusionKind(Hybrid.Rrf)
      .execute())
    assert(got == want && got.nonEmpty)
  }

  test("hybrid: vector threshold prunes the vector modality only") {
    val got = pairs(HybridSearch.on(meta)
      .withVectorLeg(Hybrid.FlatLeg(vectors))
      .withVector(Array(1f, 0f, 0f))
      .withThreshold(0.2).withK(5)
      .execute())
    // L2 <= 0.2 keeps ids 1, 3, 5 (distances 0, 0.1, sqrt(0.02)≈0.141)
    assert(got.map(_._1).toSet == Set(1L, 3L, 5L))
  }

  test("hybrid: cutoff applies PER MODALITY before fusion, not on the fused list") {
    val s = spark
    import s.implicits._
    val base = HybridSearch.on(meta)
      .withVectorLeg(Hybrid.FlatLeg(vectors)).withCorpus(corpus)
      .withVector(Array(1f, 0f, 0f)).withText("wireless")
      .withK(5).withFusionKind(Hybrid.Rrf)
    val cut = pairs(base.withCutoff(1).execute())
    // hand-compose: autocut each modality's k-list, then RRF-fuse
    val qv = Seq((0L, Array(1f, 0f, 0f))).toDF("qid", "qvec")
    val vecLeg = ScoreAgg.autocut(
      graft.vector.FlatKnn.search(vectors, qv, 5, graft.vector.Metric.L2)
        .select(col("id"), col("score")), 1)
    val txtLeg = ScoreAgg.autocut(corpus.search("wireless", 5), 1)
    val want = pairs(graft.fusion.Fusion.rrf(vecLeg, txtLeg)
      .orderBy(col("score").desc, col("id")).limit(5))
    assert(cut == want)
  }

  test("hybrid: withNProbes reaches the IVF leg; withEfSearch is order-independent") {
    val ivf = graft.vector.Ivf.build(vectors, nlist = 4, maxIter = 5)
    // probe-all == flat hybrid; nprobe=1 restricts to one list
    val all = pairs(HybridSearch.on(meta)
      .withVectorLeg(Hybrid.IvfLeg(ivf)).withVector(Array(1f, 0f, 0f))
      .withNProbes(4).withK(5).execute())
    val flat = pairs(HybridSearch.on(meta)
      .withVectorLeg(Hybrid.FlatLeg(vectors)).withVector(Array(1f, 0f, 0f))
      .withK(5).execute())
    assert(all == flat)
    val one = pairs(HybridSearch.on(meta)
      .withVectorLeg(Hybrid.IvfLeg(ivf)).withVector(Array(1f, 0f, 0f))
      .withNProbes(1).withK(5).execute())
    assert(one.size < all.size) // one probed list of four
    // efSearch set BEFORE the leg attaches must still apply
    val hnsw = graft.vector.Hnsw.build(vectors)
    val a = pairs(HybridSearch.on(meta).withEfSearch(500)
      .withVectorLeg(Hybrid.HnswLeg(hnsw, efSearch = 1))
      .withVector(Array(1f, 0f, 0f)).withK(5).execute())
    assert(a == flat) // ef=500 exhaustive, not the leg's ef=1
    // the builder override reaches the REFINED IVFPQ leg too: probe-all
    // via withNProbes over a leg constructed at nprobe=1 must equal the
    // flat hybrid (corpus-covering refine makes probe-all exact)
    val ivfpq = graft.vector.IvfPq.build(vectors, nlist = 4, m = 3,
      ksub = 4, maxIter = 5)
    val refinedAll = pairs(HybridSearch.on(meta)
      .withVectorLeg(Hybrid.IvfPqRefinedLeg(ivfpq, vectors,
        refineFactor = 100, nprobe = 1))
      .withVector(Array(1f, 0f, 0f)).withNProbes(4).withK(5).execute())
    assert(refinedAll == flat,
      "withNProbes must override IvfPqRefinedLeg's own nprobe")
  }

  test("efSearch zero/negative falls back to the DEFAULT, never a " +
       "degenerate beam (TestHNSWIndexSearchWithEfSearchZero/Negative, " +
       "hnsw_index_search_test.go:1210-1291) — on the fluent vector " +
       "builder and the hybrid builder") {
    val hnsw = graft.vector.Hnsw.build(vectors)
    def run(vs: graft.vector.VectorSearch) = vs
      .withQuery(Array(1f, 0f, 0f)).withK(5).execute()
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val default = run(graft.vector.VectorSearch.onHnsw(hnsw))
    Seq(0, -3).foreach { ef =>
      assert(run(graft.vector.VectorSearch.onHnsw(hnsw).withEfSearch(ef))
          == default,
        s"withEfSearch($ef) must behave like the default, not a 0-beam")
    }
    // hybrid builder: ef<=0 leaves the leg's own value in force
    val viaLeg = pairs(HybridSearch.on(meta)
      .withVectorLeg(Hybrid.HnswLeg(hnsw, efSearch = 5000))
      .withVector(Array(1f, 0f, 0f)).withK(5).withEfSearch(0).execute())
    val legDefault = pairs(HybridSearch.on(meta)
      .withVectorLeg(Hybrid.HnswLeg(hnsw, efSearch = 5000))
      .withVector(Array(1f, 0f, 0f)).withK(5).execute())
    assert(viaLeg == legDefault)
  }

  test("text: absent node id errors like lookupNodeTexts") {
    intercept[IllegalArgumentException] {
      TextSearch.on(corpus).withNodes(999L).execute()
    }
  }

  test("hybrid over EMPTY indexes: both modalities configured, zero results, " +
       "no error (TestHybridSearchIndex_EmptyIndexes)") {
    val s = spark
    import s.implicits._
    val emptyMeta = Seq.empty[(Long, String)].toDF("id", "category")
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("id", "vector")
    val emptyCorpus = graft.text.BM25.build(
      Seq.empty[(Long, String)].toDF("id", "text"))
    val res = HybridSearch.on(emptyMeta)
      .withVectorLeg(Hybrid.FlatLeg(emptyVecs)).withCorpus(emptyCorpus)
      .withVector(Array(1f, 0f, 0f)).withText("test").withK(10)
      .execute()
    assert(res.count() == 0)
  }

  test("partial-data docs: each modality finds only its own doc " +
       "(TestHybridSearchIndex_PartialData)") {
    val s = spark
    import s.implicits._
    // doc 1 vector-only, doc 2 text-only, doc 3 metadata-only
    val m = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]),
      (3L, "test")).toDF("id", "tag")
    val v = Seq((1L, Array(1f, 0f, 0f))).toDF("id", "vector")
    val c = graft.text.BM25.build(Seq((2L, "test document")).toDF("id", "text"))
    val vecOnly = HybridSearch.on(m).withVectorLeg(Hybrid.FlatLeg(v))
      .withVector(Array(1f, 0f, 0f)).withK(10).execute().collect()
    assert(vecOnly.map(_.getLong(0)).toSeq == Seq(1L))
    val txtOnly = HybridSearch.on(m).withCorpus(c)
      .withText("test").withK(10).execute().collect()
    assert(txtOnly.map(_.getLong(0)).toSeq == Seq(2L))
    val metaOnly = HybridSearch.on(m)
      .withMetadata(Filter.Eq("tag", "test")).withK(10).execute().collect()
    assert(metaOnly.map(_.getLong(0)).toSeq == Seq(3L))
    assert(metaOnly.head.getDouble(1) == 1.0)
  }

  test("setters REPLACE like the reference, not append") {
    val got = pairs(TextSearch.on(corpus)
      .withQuery("cookbook").withQuery("wireless").execute())
    assert(got == pairs(TextSearch.on(corpus).withQuery("wireless").execute()))
    val vs = graft.vector.VectorSearch.onFlat(vectors)
      .withQuery(Array(0f, 1f, 0f)).withQuery(Array(1f, 0f, 0f))
      .withK(1).execute().head()
    assert(vs.getLong(0) == 1L) // only the second query ran
  }
}
