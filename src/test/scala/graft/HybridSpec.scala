package graft

import graft.filter.{Filter, FilterGroup}
import graft.hybrid.Hybrid
import graft.text.BM25
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid modality-combination matrix (FIXTURES.md §4,
  * hybrid_search_index_test.go:10-1101). */
class HybridSpec extends SparkSpec {

  private lazy val (meta, vectors, corpus) = {
    val s = spark
    import s.implicits._
    val m = Seq(
      (1L, "electronics", 999.0), (2L, "electronics", 499.0),
      (3L, "books", 29.0), (4L, "books", 59.0)
    ).toDF("id", "category", "price")
    val v = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0f, 1f, 0f)),
      (3L, Array(1f, 0.1f, 0f)), (4L, Array(0f, 0f, 1f))
    ).toDF("id", "vector")
    val docs = Seq(
      (1L, "wireless noise cancelling headphones"),
      (2L, "usb charging cable fast"),
      (3L, "novel about wireless telegraph history"),
      (4L, "cookbook recipes")
    ).toDF("id", "text")
    (m, v, BM25.build(docs))
  }

  private def q(v: Array[Float]): DataFrame = {
    val s = spark
    import s.implicits._
    Seq((0L, v)).toDF("qid", "qvec")
  }

  private def run(filters: Seq[FilterGroup] = Seq.empty,
                  vec: Boolean = false, txt: Option[String] = None,
                  cfg: Hybrid.Config = Hybrid.Config(k = 4)): Seq[(Long, Double)] =
    Hybrid.search(meta, filters,
      if (vec) Some(vectors) else None,
      if (vec) Some(q(Array(1f, 0f, 0f))) else None,
      txt.map(_ => corpus), txt, cfg)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("multi-query hybrid: duplicate ids across VECTOR queries combine " +
       "per cfg.scoreAgg before fusion (WithScoreAggregation on every " +
       "sub-search, storage.go:509; aggregation.go:107-255) — Sum equals " +
       "the hand-summed per-query searches; multiple TEXT queries " +
       "likewise; single-query results are value-identical to the " +
       "pre-aggregation shape") {
    val s = spark
    import s.implicits._
    val cfg = Hybrid.Config(k = 4)
    // two vector queries, vector-only (single modality passes the
    // aggregated scores straight through fusion)
    val q2 = Seq((0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)))
      .toDF("qid", "qvec")
    val got = Hybrid.searchWith(meta, Seq.empty,
        Some(Hybrid.FlatLeg(vectors)), Some(q2), None, None, cfg)
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toMap
    // hand-summed: each query's full ranking (k covers the corpus)
    def one(v: Array[Float]) = graft.vector.FlatKnn
      .search(vectors, q(v), 4, graft.vector.Metric.L2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    val a = one(Array(1f, 0f, 0f)); val b = one(Array(0f, 1f, 0f))
    val want = (a.keySet ++ b.keySet).map(id =>
      id -> math.round((a.getOrElse(id, 0.0) + b.getOrElse(id, 0.0)) * 1e9)).toMap
    assert(got == want, s"vector Sum aggregation diverged: $got vs $want")
    // Max aggregation keeps the best (smallest... Max of distances is the
    // reference's literal max — aggregation.go takes max of the VALUES)
    val gotMax = Hybrid.searchWith(meta, Seq.empty,
        Some(Hybrid.FlatLeg(vectors)), Some(q2), None, None,
        cfg.copy(scoreAgg = graft.agg.ScoreAgg.Max))
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toMap
    val wantMax = (a.keySet ++ b.keySet).map(id =>
      id -> math.round(math.max(a.getOrElse(id, 0.0), b.getOrElse(id, 0.0)) * 1e9)).toMap
    assert(gotMax == wantMax)
    // two TEXT queries: per-text BM25 sub-searches, Sum-combined
    val gotT = Hybrid.searchWith(meta, Seq.empty, None, None,
        Some(corpus), Some("wireless"), cfg, queryTexts = Seq("usb cable"))
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toMap
    def oneT(t: String) = corpus.search(t, 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val ta = oneT("wireless"); val tb = oneT("usb cable")
    val wantT = (ta.keySet ++ tb.keySet).map(id =>
      id -> math.round((ta.getOrElse(id, 0.0) + tb.getOrElse(id, 0.0)) * 1e9)).toMap
    assert(gotT == wantT, s"text Sum aggregation diverged: $gotT vs $wantT")
    // single-query: aggregation is an exact identity
    val single = Hybrid.searchWith(meta, Seq.empty,
        Some(Hybrid.FlatLeg(vectors)), Some(q(Array(1f, 0f, 0f))),
        Some(corpus), Some("wireless"), cfg)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val before = run(vec = true, txt = Some("wireless"), cfg = cfg)
    assert(single == before)
  }

  test("metadata-only: candidates score 1.0 (hybrid_search_index.go:588-593)") {
    val res = run(filters = Seq(FilterGroup(Seq(Filter.Eq("category", "books")))))
    assert(res.toMap == Map(3L -> 1.0, 4L -> 1.0))
  }

  test("empty filter result short-circuits to empty (hybrid_search_index.go:503-506)") {
    val res = run(filters = Seq(FilterGroup(Seq(Filter.Eq("category", "toys")))))
    assert(res.isEmpty)
  }

  test("vector-only with weighted sum sorts DESC — the reference's quirk") {
    val res = run(vec = true)
    // distances ascending-better, but hybrid sorts descending: farthest first
    assert(res.map(_._2) == res.map(_._2).sorted.reverse)
    assert(res.last._1 == 1L) // exact match ranks LAST under the quirk
  }

  test("text-only returns BM25 order") {
    val res = run(txt = Some("wireless"))
    assert(res.map(_._1).toSet == Set(1L, 3L))
  }

  test("full hybrid with RRF: doc in both modalities wins") {
    val res = run(vec = true, txt = Some("wireless headphones"),
      cfg = Hybrid.Config(k = 4, fusion = Hybrid.Rrf))
    assert(res.head._1 == 1L) // best vector match AND best text match
    assert(math.abs(res.head._2 - (1.0 / 60 + 1.0 / 60)) < 1e-12)
  }

  test("metadata filter restricts both modalities") {
    val res = run(
      filters = Seq(FilterGroup(Seq(Filter.Eq("category", "books")))),
      vec = true, txt = Some("wireless"),
      cfg = Hybrid.Config(k = 4, fusion = Hybrid.Rrf))
    assert(res.map(_._1).forall(Set(3L, 4L)))
  }

  test("min fusion keeps only docs present in both modalities") {
    val res = run(vec = true, txt = Some("wireless"),
      cfg = Hybrid.Config(k = 4, fusion = Hybrid.MinF))
    assert(res.map(_._1).toSet.subsetOf(Set(1L, 3L)))
  }

  test("IVF-routed hybrid probing all lists == flat-path hybrid exactly") {
    val idx = graft.vector.Ivf.build(vectors, nlist = 2, maxIter = 5)
    val filters = Seq(FilterGroup(Seq(Filter.Eq("category", "electronics"))))
    def run2(ivf: Option[graft.vector.Ivf.Index]) =
      Hybrid.search(meta, filters, Some(vectors), Some(q(Array(1f, 0f, 0f))),
        Some(corpus), Some("wireless headphones"),
        Hybrid.Config(k = 4, fusion = Hybrid.Rrf), ivf = ivf)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(run2(Some(idx)) == run2(None))
  }

  test("single-artifact persist round-trips config + all sub-indexes (hybrid_search_index.go:655-817)") {
    val idx = graft.vector.Ivf.build(vectors, nlist = 2, maxIter = 5)
    val cfg = Hybrid.Config(k = 3, fusion = Hybrid.Rrf, vectorWeight = 0.7,
      textWeight = 0.3, rrfK = 42.0, nprobe = 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft-hybrid-spec").toString
    Hybrid.write(path, meta, idx, corpus, cfg)
    val loaded = Hybrid.read(spark, path)
    // the FULL config survives — no re-wiring of weights/fusion/tokenizer
    assert(loaded.cfg == cfg)
    assert(loaded.corpus.tokenizer == corpus.tokenizer)
    val filters = Seq(FilterGroup(Seq(Filter.Eq("category", "electronics"))))
    val live = Hybrid.search(meta, filters, None, Some(q(Array(1f, 0f, 0f))),
        Some(corpus), Some("wireless headphones"), cfg, ivf = Some(idx))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val reloaded = loaded.search(filters, Some(q(Array(1f, 0f, 0f))),
        Some("wireless headphones"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(reloaded == live)
  }

  test("partial artifacts: each single-leg hybrid round-trips; queries " +
       "against a missing leg fail fast " +
       "(hybrid_search_index_test.go:868-946 nil-sub-index matrix)") {
    val cfg = Hybrid.Config(k = 4)
    // vector only
    val idx = graft.vector.Ivf.build(vectors, nlist = 2, maxIter = 5)
    val pv = java.nio.file.Files.createTempDirectory("hyb-vec").toString
    Hybrid.writePartial(pv, None, Some(idx), None, cfg)
    val lv = Hybrid.read(spark, pv)
    assert(lv.metaOpt.isEmpty && lv.corpusOpt.isEmpty && lv.ivfOpt.nonEmpty)
    // hybrid Execute orders score DESC — raw distances invert, the
    // documented vec-only desc caveat (same as hybrid_vec_only): the
    // exact match ranks LAST
    val vecHits = lv.search(Seq.empty, Some(q(Array(1f, 0f, 0f))), None)
      .collect().map(_.getLong(0))
    assert(vecHits.length == 4 && vecHits.last == 1L)
    intercept[IllegalArgumentException] {
      lv.search(Seq.empty, None, Some("wireless"))
    }
    intercept[IllegalStateException] { lv.corpus }
    // text only
    val pt = java.nio.file.Files.createTempDirectory("hyb-txt").toString
    Hybrid.writePartial(pt, None, None, Some(corpus), cfg)
    val lt = Hybrid.read(spark, pt)
    assert(lt.ivfOpt.isEmpty && lt.corpusOpt.nonEmpty)
    val txtHits = lt.search(Seq.empty, None, Some("wireless headphones"))
      .collect().map(_.getLong(0))
    assert(txtHits.nonEmpty && txtHits.head == 1L)
    intercept[IllegalArgumentException] {
      lt.search(Seq.empty, Some(q(Array(1f, 0f, 0f))), None)
    }
    // metadata only: filters work (score-1.0 path), modal queries fail
    val pm = java.nio.file.Files.createTempDirectory("hyb-meta").toString
    Hybrid.writePartial(pm, Some(meta), None, None, cfg)
    val lm = Hybrid.read(spark, pm)
    val metaHits = lm.search(
      Seq(FilterGroup(Seq(Filter.Eq("category", "books")))), None, None)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(metaHits.toSeq == Seq((3L, 1.0), (4L, 1.0)))
    intercept[IllegalArgumentException] {
      lm.search(Seq.empty, None, Some("wireless"))
    }
    // nothing at all is rejected at write time
    intercept[IllegalArgumentException] {
      Hybrid.writePartial(
        java.nio.file.Files.createTempDirectory("hyb-none").toString,
        None, None, None, cfg)
    }
  }

  test("persisted hybrid centroids and cluster assignment survive bit-exactly") {
    val idx = graft.vector.Ivf.build(vectors, nlist = 2, maxIter = 5)
    val path = java.nio.file.Files
      .createTempDirectory("graft-hybrid-spec2").toString
    Hybrid.write(path, meta, idx, corpus, Hybrid.Config())
    val loaded = Hybrid.read(spark, path)
    assert(loaded.ivf.model.centroids.length == idx.model.centroids.length)
    loaded.ivf.model.centroids.zip(idx.model.centroids).foreach {
      case (a, b) => assert(java.util.Arrays.equals(a, b))
    }
    val orig = idx.assigned.select("id", "cluster")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val rt = loaded.ivf.assigned.select("id", "cluster")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(rt == orig)
  }

  /** Distributed vs embedded hybrid, same cfg/filters/modalities. */
  private def pinServe(cfg: Hybrid.Config, filters: Seq[FilterGroup],
                       vec: Boolean, txt: Option[String]): Unit = {
    val dist = Hybrid.search(meta, filters,
        if (vec) Some(vectors) else None,
        if (vec) Some(q(Array(1f, 0f, 0f))) else None,
        txt.map(_ => corpus), txt, cfg)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val local = Hybrid.serve(meta, vectors, corpus, cfg)
      .search(filters, if (vec) Some(Array(1f, 0f, 0f)) else None, txt)
    assert(local.map(_._1) == dist.map(_._1),
      s"id order diverged: local=$local dist=$dist")
    local.zip(dist).foreach { case ((_, ls), (_, ds)) =>
      assert(math.abs(ls - ds) < 1e-9, s"score diverged: local=$local dist=$dist")
    }
  }

  test("embedded hybrid serving == distributed search across the modality matrix (§3.1 in-process)") {
    val books = Seq(FilterGroup(Seq(Filter.Eq("category", "books"))))
    val none = Seq(FilterGroup(Seq(Filter.Eq("category", "toys"))))
    // metadata-only (score 1.0), empty-filter short-circuit
    pinServe(Hybrid.Config(k = 4), books, vec = false, txt = None)
    pinServe(Hybrid.Config(k = 4), none, vec = false, txt = None)
    // single modalities, incl. the weighted-sum desc quirk
    pinServe(Hybrid.Config(k = 4), Seq.empty, vec = true, txt = None)
    pinServe(Hybrid.Config(k = 4), Seq.empty, vec = false, txt = Some("wireless"))
    // full hybrid under every fusion kind
    Seq(Hybrid.WeightedSum, Hybrid.Rrf, Hybrid.MaxF, Hybrid.MinF).foreach { f =>
      pinServe(Hybrid.Config(k = 4, fusion = f), Seq.empty,
        vec = true, txt = Some("wireless headphones"))
    }
    // filtered both-modality hybrid: candidate set pushed into both legs
    pinServe(Hybrid.Config(k = 4, fusion = Hybrid.Rrf), books,
      vec = true, txt = Some("wireless"))
    // non-default weights
    pinServe(Hybrid.Config(k = 4, fusion = Hybrid.WeightedSum,
      vectorWeight = 0.3, textWeight = 2.0), Seq.empty,
      vec = true, txt = Some("wireless headphones"))
  }

  test("embedded HNSW-legged hybrid at exhaustive ef == embedded flat-legged " +
       "hybrid (any-index serving, hybrid_search_index.go:76 in-process)") {
    val s = spark
    import s.implicits._
    val cfg = Hybrid.Config(k = 4, fusion = Hybrid.Rrf)
    val idx = graft.vector.Hnsw.build(vectors.repartition(1))
    val flatServe = Hybrid.serve(meta, vectors, corpus, cfg)
    val hnswServe = Hybrid.serveHnsw(meta, idx, corpus, cfg, efSearch = 500)
    val filters = Seq(FilterGroup(Seq(Filter.Gt("price", 5))))
    for {
      qv <- Seq(Some(Array(1f, 0f, 0f)), None)
      qt <- Seq(Some("wireless headphones"), None)
      fs <- Seq(filters, Seq.empty)
    } {
      val a = flatServe.search(fs, qv, qt)
      val b = hnswServe.search(fs, qv, qt)
      assert(a.map(_._1) == b.map(_._1), s"ids diverged for ($qv,$qt,$fs): $a vs $b")
      a.zip(b).foreach { case ((_, sa), (_, sb)) =>
        assert(math.abs(sa - sb) < 1e-9, s"scores diverged: $a vs $b")
      }
    }
    // metric mismatch fails fast, like the distributed legs
    intercept[IllegalArgumentException] {
      Hybrid.serveHnsw(meta, idx, corpus,
        cfg.copy(metric = graft.vector.Metric.Cosine))
    }
  }

  test("any-index hybrid: HNSW leg at exhaustive ef == flat leg (hybrid_search_index.go:76)") {
    val filters = Seq(FilterGroup(Seq(Filter.Eq("category", "electronics"))))
    val cfg = Hybrid.Config(k = 4, fusion = Hybrid.Rrf)
    val flat = Hybrid.searchWith(meta, filters,
        Some(Hybrid.FlatLeg(vectors)), Some(q(Array(1f, 0f, 0f))),
        Some(corpus), Some("wireless headphones"), cfg)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // ef >= corpus size: the beam explores every shard exhaustively, so
    // the approximate leg degenerates to exact and the hybrids coincide
    val hnsw = graft.vector.Hnsw.build(vectors)
    val viaHnsw = Hybrid.searchWith(meta, filters,
        Some(Hybrid.HnswLeg(hnsw, efSearch = 64)), Some(q(Array(1f, 0f, 0f))),
        Some(corpus), Some("wireless headphones"), cfg)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaHnsw == flat)
  }

  test("any-index hybrid: PQ leg with fine codebooks == flat leg (ADC exact when each vector is its own centroid)") {
    val filters = Seq(FilterGroup(Seq(Filter.Eq("category", "electronics"))))
    val cfg = Hybrid.Config(k = 4, fusion = Hybrid.Rrf)
    val flat = Hybrid.searchWith(meta, filters,
        Some(Hybrid.FlatLeg(vectors)), Some(q(Array(1f, 0f, 0f))),
        Some(corpus), Some("wireless headphones"), cfg)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // ksub >= n: every vector becomes its own codebook entry, ADC = exact L2
    val model = graft.vector.Pq.train(vectors, m = 1, ksub = 16, maxIter = 5)
    val encoded = graft.vector.Pq.encode(vectors, model)
    val viaPq = Hybrid.searchWith(meta, filters,
        Some(Hybrid.PqLeg(encoded, model)), Some(q(Array(1f, 0f, 0f))),
        Some(corpus), Some("wireless headphones"), cfg)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaPq == flat)
  }

  test("any-index hybrid: OPQ-rotated PQ leg with fine codebooks == flat " +
       "leg (rotation is orthogonal so exact rotated-space ADC == exact " +
       "L2 — the leg composes with hybrid untouched)") {
    val filters = Seq(FilterGroup(Seq(Filter.Eq("category", "electronics"))))
    val cfg = Hybrid.Config(k = 4, fusion = Hybrid.Rrf)
    val flat = Hybrid.searchWith(meta, filters,
        Some(Hybrid.FlatLeg(vectors)), Some(q(Array(1f, 0f, 0f))),
        Some(corpus), Some("wireless headphones"), cfg)
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
    val model = graft.vector.Pq.trainOpq(vectors, m = 1, ksub = 16,
      maxIter = 5, opqIters = 3, sampleSize = 16)
    assert(model.rotation.isDefined)
    val encoded = graft.vector.Pq.encode(vectors, model)
    val viaOpq = Hybrid.searchWith(meta, filters,
        Some(Hybrid.PqLeg(encoded, model)), Some(q(Array(1f, 0f, 0f))),
        Some(corpus), Some("wireless headphones"), cfg)
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
    assert(viaOpq == flat)
  }

  test("any-index hybrid: IVFPQ leg, probe-all + fine codebooks == flat leg ids") {
    val filters = Seq(FilterGroup(Seq(Filter.Eq("category", "electronics"))))
    val cfg = Hybrid.Config(k = 4, fusion = Hybrid.Rrf)
    val flat = Hybrid.searchWith(meta, filters,
        Some(Hybrid.FlatLeg(vectors)), Some(q(Array(1f, 0f, 0f))),
        Some(corpus), Some("wireless headphones"), cfg)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivfpq = graft.vector.IvfPq.build(vectors, nlist = 2, m = 1,
      ksub = 16, maxIter = 5)
    val via = Hybrid.searchWith(meta, filters,
        Some(Hybrid.IvfPqLeg(ivfpq, nprobe = 2)), Some(q(Array(1f, 0f, 0f))),
        Some(corpus), Some("wireless headphones"), cfg)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // float residual rounding can perturb scores in the last ulps; RRF is
    // rank-based, so ids and fused scores must still coincide exactly
    assert(via.map(_._1) == flat.map(_._1))
    via.zip(flat).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-9)
    }
  }

  test("embedded hybrid cosine via prenorm == distributed cosine hybrid (distance.go:70-81)") {
    val cfg = Hybrid.Config(k = 4, fusion = Hybrid.WeightedSum,
      metric = graft.vector.Metric.Cosine)
    val dist = Hybrid.search(meta, Seq.empty, Some(vectors),
        Some(q(Array(1f, 0.2f, 0f))), Some(corpus), Some("wireless"), cfg)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val local = Hybrid.serve(meta, vectors, corpus, cfg)
      .search(Seq.empty, Some(Array(1f, 0.2f, 0f)), Some("wireless"))
    assert(local.map(_._1) == dist.map(_._1),
      s"id order diverged: local=$local dist=$dist")
    // prenormalized rows are stored as float32 — scores agree to ~1e-6,
    // not to the double-precision 1e-9 of the L2 matrix rows
    local.zip(dist).foreach { case ((_, ls), (_, ds)) =>
      assert(math.abs(ls - ds) < 1e-5, s"score diverged: local=$local dist=$dist")
    }
  }

  test("embedded hybrid CosinePreNorm == distributed prenorm hybrid on " +
       "non-unit and zero vectors (no silent upgrade to full cosine)") {
    val s = spark
    import s.implicits._
    val m = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"))
      .toDF("id", "category")
    // rows 1/3 non-unit, row 4 zero — serveCosine would renormalize/drop
    val v = Seq(
      (1L, Array(2f, 0f, 0f)), (2L, Array(0f, 1f, 0f)),
      (3L, Array(0.5f, 0.1f, 0f)), (4L, Array(0f, 0f, 0f))
    ).toDF("id", "vector")
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma"),
      (3L, "alpha gamma"), (4L, "delta")).toDF("id", "text")
    val c = BM25.build(docs)
    val cfg = Hybrid.Config(k = 4, fusion = Hybrid.Rrf,
      metric = graft.vector.Metric.CosinePreNorm)
    val qv = Array(1f, 0.2f, 0f)
    val dist = Hybrid.search(m, Seq.empty, Some(v), Some(q(qv)),
        Some(c), Some("alpha"), cfg)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val local = Hybrid.serve(m, v, c, cfg)
      .search(Seq.empty, Some(qv), Some("alpha"))
    assert(local == dist, s"local=$local dist=$dist")
    // the zero-norm row is ranked (not dropped) under prenorm semantics
    assert(local.map(_._1).contains(4L))
  }

  test("any-index hybrid under COSINE: cosine-built HNSW leg == cosine flat leg; " +
       "mismatched leg metric fails fast") {
    val cfg = Hybrid.Config(k = 4, fusion = Hybrid.Rrf,
      metric = graft.vector.Metric.Cosine)
    val qv = Array(1f, 0.2f, 0f)
    val flat = Hybrid.searchWith(meta, Seq.empty,
        Some(Hybrid.FlatLeg(vectors)), Some(q(qv)),
        Some(corpus), Some("wireless"), cfg)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val cosHnsw = graft.vector.Hnsw.build(vectors,
      metric = graft.vector.Metric.Cosine)
    val via = Hybrid.searchWith(meta, Seq.empty,
        Some(Hybrid.HnswLeg(cosHnsw, efSearch = 64)), Some(q(qv)),
        Some(corpus), Some("wireless"), cfg)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // RRF fuses by rank; the cosine-HNSW leg at exhaustive ef ranks
    // exactly like flat cosine, so the fused frames coincide
    assert(via == flat)
    // an L2-built graph under a cosine config is a score-space mix: error
    val l2Hnsw = graft.vector.Hnsw.build(vectors)
    intercept[IllegalArgumentException] {
      Hybrid.searchWith(meta, Seq.empty, Some(Hybrid.HnswLeg(l2Hnsw)),
        Some(q(qv)), Some(corpus), Some("wireless"), cfg).collect()
    }
    val l2Pq = graft.vector.Pq.train(vectors, m = 1, ksub = 16, maxIter = 5)
    intercept[IllegalArgumentException] {
      Hybrid.searchWith(meta, Seq.empty,
        Some(Hybrid.PqLeg(graft.vector.Pq.encode(vectors, l2Pq), l2Pq)),
        Some(q(qv)), Some(corpus), Some("wireless"), cfg).collect()
    }
  }

  test("no filters and no modalities returns EMPTY, not the corpus head " +
       "(Execute's score-1.0 backfill needs a non-empty candidate set)") {
    val dist = Hybrid.search(meta, Seq.empty, None, None, None, None,
      Hybrid.Config(k = 4))
    assert(dist.count() == 0)
    val local = Hybrid.serve(meta, vectors, corpus, Hybrid.Config(k = 4))
      .search(Seq.empty, None, None)
    assert(local.isEmpty)
    // filter-only still backfills score 1.0 for every candidate
    val filtered = Hybrid.search(meta,
      Seq(FilterGroup(Seq(Filter.Eq("category", "books")))),
      None, None, None, None, Hybrid.Config(k = 4)).collect()
    assert(filtered.map(_.getLong(0)).toSet == Set(3L, 4L))
    assert(filtered.forall(_.getDouble(1) == 1.0))
  }

  test("partial-modality corpus: a doc with ONLY a vector, ONLY text, or " +
       "ONLY metadata is reachable exactly through its own modality " +
       "(TestHybridSearchIndex_PartialData, " +
       "hybrid_search_index_test.go:577-644), and the full hybrid " +
       "surfaces each through full-outer fusion") {
    val s = spark
    import s.implicits._
    // one doc per modality (plus metadata rows for all — every doc has an
    // id row; modality frames cover only the docs that HAVE the modality)
    val m = Seq((1L, Option.empty[String]), (2L, None), (3L, Some("test")))
      .toDF("id", "tag")
    val v = Seq((1L, Array(1f, 0f, 0f))).toDF("id", "vector")
    val c = BM25.build(Seq((2L, "test document")).toDF("id", "text"))
    val cfg = Hybrid.Config(k = 10, fusion = Hybrid.Rrf)
    // vector-only search reaches exactly the vector doc
    val vecIds = Hybrid.searchWith(m, Seq.empty, Some(Hybrid.FlatLeg(v)),
        Some(q(Array(1f, 0f, 0f))), None, None, cfg)
      .collect().map(_.getLong(0)).toSeq
    assert(vecIds == Seq(1L))
    // text-only search reaches exactly the text doc
    val txtIds = Hybrid.searchWith(m, Seq.empty, None, None, Some(c),
        Some("test"), cfg)
      .collect().map(_.getLong(0)).toSeq
    assert(txtIds == Seq(2L))
    // metadata-only search reaches exactly the tagged doc (score 1.0)
    val metaRows = Hybrid.searchWith(m,
        Seq(FilterGroup(Seq(Filter.Eq("tag", "test")))), None, None, None,
        None, cfg)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(metaRows == Seq((3L, 1.0)))
    // the FULL hybrid (both modalities queried) surfaces the vector doc
    // AND the text doc through full-outer fusion — neither modality
    // gap hides a doc the other found
    val fused = Hybrid.searchWith(m, Seq.empty, Some(Hybrid.FlatLeg(v)),
        Some(q(Array(1f, 0f, 0f))), Some(c), Some("test"), cfg)
      .collect().map(_.getLong(0)).toSet
    assert(fused == Set(1L, 2L))
  }

  test("bm25 candidate restriction below the agg == filter above it") {
    val s = spark
    import s.implicits._
    val terms = Seq("wireless").toDF("term")
    val cands = Seq(3L, 4L).toDF("id")
    val below = corpus.score(terms, Some(cands))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val above = corpus.score(terms)
      .join(cands, Seq("id"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(below == above && below.keySet == Set(3L))
  }
}
