package graft

import graft.filter.{Filter, FilterGroup}
import graft.hybrid.Hybrid
import graft.text.{BM25, Tokenize}
import graft.vector.{Ivf, Metric}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The hybrid modality × SERIALIZATION permutation matrix — every
  * persisted-artifact subset of {metadata, vector, text} crossed with
  * every fusion kind, asserted equal to the in-memory pipeline run on the
  * original (never-persisted) objects. This is the ×persistence axis of
  * `hybrid_search_index_test.go:10-1101` (modality matrix) +
  * `:655-946` (WriteTo/ReadFrom + nil-sub-index partial artifacts):
  * the reference asserts each reloaded index searches identically; here
  * each leg round-trips through its parquet artifact and the fused result
  * must match bit-for-bit. */
class HybridPersistMatrixSpec extends SparkSpec {

  private lazy val (meta, vectors, docs) = {
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
    val d = Seq(
      (1L, "wireless noise cancelling headphones"),
      (2L, "usb charging cable fast"),
      (3L, "novel about wireless telegraph history"),
      (4L, "cookbook recipes")
    ).toDF("id", "text")
    (m, v, d)
  }

  private lazy val corpus = BM25.build(docs)
  private lazy val ivfIdx = Ivf.build(vectors, nlist = 2, maxIter = 5)

  private def q(v: Array[Float]): DataFrame = {
    val s = spark
    import s.implicits._
    Seq((0L, v)).toDF("qid", "qvec")
  }

  private val qv = Array(1f, 0f, 0f)
  private val qt = "wireless headphones"
  private val theFilters = Seq(FilterGroup(Seq(Filter.Eq("category", "electronics"))))

  private def pairs(df: DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private val fusions = Seq(
    Hybrid.WeightedSum, Hybrid.Rrf, Hybrid.MaxF, Hybrid.MinF)

  /** zero-row meta frame, the same fallback Persisted.search synthesizes
    * when the metadata leg is absent and no filters are configured */
  private def emptyMeta: DataFrame = {
    val s = spark
    import s.implicits._
    Seq.empty[Long].toDF("id")
  }

  /** Persist exactly `subset`, reload, search with the modalities the
    * subset supports under `fusion`; assert equal to the in-memory hybrid
    * over the ORIGINAL objects. */
  private def roundTrip(withMeta: Boolean, withVec: Boolean,
                        withTxt: Boolean, fusion: Hybrid.FusionKind): Unit = {
    val cfg = Hybrid.Config(k = 4, fusion = fusion)
    val p = tmp(s"hybmx-$withMeta-$withVec-$withTxt-$fusion")
    Hybrid.writePartial(p,
      if (withMeta) Some(meta) else None,
      if (withVec) Some(ivfIdx) else None,
      if (withTxt) Some(corpus) else None, cfg)
    val loaded = Hybrid.read(spark, p)
    val filters = if (withMeta) theFilters else Seq.empty
    val queryV = if (withVec) Some(q(qv)) else None
    val queryT = if (withTxt) Some(qt) else None
    val got = pairs(loaded.search(filters, queryV, queryT))
    val want = pairs(Hybrid.search(
      if (withMeta) meta else emptyMeta, filters, None, queryV,
      if (withTxt) Some(corpus) else None, queryT, cfg,
      ivf = if (withVec) Some(ivfIdx) else None))
    assert(got == want,
      s"subset=(meta=$withMeta,vec=$withVec,txt=$withTxt) fusion=$fusion")
    // the config object itself round-trips
    assert(loaded.cfg == cfg)
  }

  // --- the 7 non-empty subsets, each × all 4 fusion kinds ---

  test("persist matrix: metadata-only artifact × every fusion kind == in-memory") {
    fusions.foreach(f => roundTrip(withMeta = true, withVec = false, withTxt = false, f))
  }

  test("persist matrix: vector-only artifact × every fusion kind == in-memory") {
    fusions.foreach(f => roundTrip(withMeta = false, withVec = true, withTxt = false, f))
  }

  test("persist matrix: text-only artifact × every fusion kind == in-memory") {
    fusions.foreach(f => roundTrip(withMeta = false, withVec = false, withTxt = true, f))
  }

  test("persist matrix: metadata+vector artifact × every fusion kind == in-memory") {
    fusions.foreach(f => roundTrip(withMeta = true, withVec = true, withTxt = false, f))
  }

  test("persist matrix: metadata+text artifact × every fusion kind == in-memory") {
    fusions.foreach(f => roundTrip(withMeta = true, withVec = false, withTxt = true, f))
  }

  test("persist matrix: vector+text artifact × every fusion kind == in-memory " +
       "(both modalities fuse, no metadata restriction)") {
    fusions.foreach(f => roundTrip(withMeta = false, withVec = true, withTxt = true, f))
  }

  test("persist matrix: full three-leg artifact × every fusion kind == in-memory") {
    fusions.foreach(f => roundTrip(withMeta = true, withVec = true, withTxt = true, f))
  }

  // --- orthogonal persistence axes ---

  test("full-blob write() and writePartial() with all three legs load to " +
       "identical search results (hybrid_search_index.go:655-817 single " +
       "artifact vs assembled parts)") {
    val cfg = Hybrid.Config(k = 4, fusion = Hybrid.Rrf)
    val pBlob = tmp("hybmx-blob")
    val pParts = tmp("hybmx-parts")
    Hybrid.write(pBlob, meta, ivfIdx, corpus, cfg)
    Hybrid.writePartial(pParts, Some(meta), Some(ivfIdx), Some(corpus), cfg)
    val a = pairs(Hybrid.read(spark, pBlob)
      .search(theFilters, Some(q(qv)), Some(qt)))
    val b = pairs(Hybrid.read(spark, pParts)
      .search(theFilters, Some(q(qv)), Some(qt)))
    assert(a == b && a.nonEmpty)
  }

  test("non-default config permutations survive the round trip and change " +
       "the persisted search accordingly (weights, rrfK, nprobe, k)") {
    val cfgs = Seq(
      Hybrid.Config(k = 2, fusion = Hybrid.WeightedSum,
        vectorWeight = 0.9, textWeight = 0.1),
      Hybrid.Config(k = 3, fusion = Hybrid.Rrf, rrfK = 7.0),
      Hybrid.Config(k = 4, fusion = Hybrid.MaxF, nprobe = 1),
      Hybrid.Config(k = 1, fusion = Hybrid.MinF))
    for (cfg <- cfgs) {
      val p = tmp("hybmx-cfg")
      Hybrid.writePartial(p, Some(meta), Some(ivfIdx), Some(corpus), cfg)
      val loaded = Hybrid.read(spark, p)
      assert(loaded.cfg == cfg)
      val got = pairs(loaded.search(Seq.empty, Some(q(qv)), Some(qt)))
      val want = pairs(Hybrid.search(meta, Seq.empty, None, Some(q(qv)),
        Some(corpus), Some(qt), cfg, ivf = Some(ivfIdx)))
      assert(got == want, s"cfg=$cfg")
      assert(got.size <= cfg.k)
    }
  }

  test("tokenizer axis: a UAX#29-tokenized corpus round-trips through the " +
       "artifact — the tokenizer is part of the persisted state " +
       "(bm25 tokenizer field, hybrid_search_index.go WriteTo)") {
    val uaxCorpus = BM25.build(docs, tokenizer = Tokenize.Uax29)
    val cfg = Hybrid.Config(k = 4, fusion = Hybrid.Rrf)
    val p = tmp("hybmx-tok")
    Hybrid.writePartial(p, Some(meta), None, Some(uaxCorpus), cfg)
    val loaded = Hybrid.read(spark, p)
    assert(loaded.corpus.tokenizer == Tokenize.Uax29)
    val got = pairs(loaded.search(theFilters, None, Some(qt)))
    val want = pairs(Hybrid.search(meta, theFilters, None, None,
      Some(uaxCorpus), Some(qt), cfg))
    assert(got == want && got.nonEmpty)
  }

  test("metric axis: a cosine-built vector leg round-trips — persisted " +
       "search equals in-memory cosine hybrid (metric in artifact meta)") {
    val cosIdx = Ivf.build(vectors, nlist = 2, maxIter = 5,
      metric = Metric.Cosine)
    val cfg = Hybrid.Config(k = 4, fusion = Hybrid.Rrf,
      metric = Metric.Cosine)
    val p = tmp("hybmx-cos")
    Hybrid.writePartial(p, Some(meta), Some(cosIdx), Some(corpus), cfg)
    val loaded = Hybrid.read(spark, p)
    assert(loaded.ivf.metric == Metric.Cosine)
    val got = pairs(loaded.search(theFilters, Some(q(qv)), Some(qt)))
    val want = pairs(Hybrid.search(meta, theFilters, None, Some(q(qv)),
      Some(corpus), Some(qt), cfg, ivf = Some(cosIdx)))
    assert(got == want && got.nonEmpty)
  }

  test("KIND-GENERAL blob (writeAny): every vector-leg kind — flat, hnsw, " +
       "pq, pq_refined, ivfpq, ivfpq_refined, ivf — round-trips through " +
       "the single-directory artifact and the reloaded hybrid searches " +
       "identically to the in-memory one (the reference's blob persists " +
       "whichever sub-index kind the hybrid holds, " +
       "hybrid_search_index.go:655-743)") {
    import graft.vector.{FlatKnn, Hnsw, IvfPq, Pq}
    val cfg = Hybrid.Config(k = 4, fusion = Hybrid.Rrf)
    val hnsw = Hnsw.build(vectors.repartition(2))
    val pqModel = Pq.train(vectors, m = 3, ksub = 4, maxIter = 5)
    val pqEnc = Pq.encode(vectors, pqModel)
    val ivfpq = IvfPq.build(vectors, nlist = 2, m = 3, ksub = 4, maxIter = 5)
    val legs: Seq[(String, Hybrid.VectorLeg)] = Seq(
      "flat" -> Hybrid.FlatLeg(vectors),
      "hnsw" -> Hybrid.HnswLeg(hnsw, efSearch = 5000),
      "pq" -> Hybrid.PqLeg(pqEnc, pqModel),
      "pqr" -> Hybrid.PqRefinedLeg(pqEnc, pqModel, vectors,
        refineFactor = 100),
      "ivfpq" -> Hybrid.IvfPqLeg(ivfpq, nprobe = 2),
      "ivfpqr" -> Hybrid.IvfPqRefinedLeg(ivfpq, vectors,
        refineFactor = 100, nprobe = 2),
      "ivf" -> Hybrid.IvfLeg(ivfIdx, nprobe = 2))
    legs.foreach { case (name, leg) =>
      val p = tmp(s"hybany-$name")
      Hybrid.writeAny(p, Some(meta), Some(leg), Some(corpus), cfg)
      val loaded = Hybrid.read(spark, p)
      // the reloaded leg is the SAME kind, with its parameters restored
      assert(loaded.vectorLeg.get.getClass == leg.getClass,
        s"$name: reloaded kind ${loaded.vectorLeg.get.getClass}")
      val got = pairs(loaded.search(theFilters, Some(q(qv)), Some(qt)))
      val want = pairs(Hybrid.searchWith(meta, theFilters, Some(leg),
        Some(q(qv)), Some(corpus), Some(qt), cfg))
      assert(got == want && got.nonEmpty,
        s"$name: reloaded blob diverged: $got vs $want")
    }
    // leg-parameter fidelity: the refined kinds restore refineFactor and
    // nprobe, hnsw restores efSearch
    val pr = tmp("hybany-params")
    Hybrid.writeAny(pr, None, Some(Hybrid.IvfPqRefinedLeg(ivfpq, vectors,
      refineFactor = 7, nprobe = 1)), None, cfg)
    Hybrid.read(spark, pr).vectorLeg.get match {
      case Hybrid.IvfPqRefinedLeg(_, _, rf, np) =>
        assert(rf == 7 && np == 1, s"params drifted: rf=$rf np=$np")
      case other => fail(s"wrong kind reloaded: $other")
    }
    // unknown-kind artifacts fail loudly, not with a silently-wrong leg
    val bad = tmp("hybany-bad")
    Hybrid.writeAny(bad, Some(meta), None, Some(corpus), cfg)
    val s2 = spark
    import s2.implicits._
    Seq(("warp", Seq.empty[String], Seq.empty[Double]))
      .toDF("kind", "param_names", "param_values")
      .repartition(1).write.mode("overwrite").parquet(s"$bad/leg")
    val e = intercept[IllegalStateException](Hybrid.read(spark, bad))
    assert(e.getMessage.contains("unknown vector-leg kind"))
  }

  test("kind SWITCH at the same path leaves no stale artifact: a " +
       "writeAny'd refined-IVFPQ blob overwritten by the IVF-shaped " +
       "writePartial loses its leg record (read serves IVF), and a " +
       "further writeAny(hnsw) clears the IVF dirs (read serves the " +
       "graph, no resurrected stale index)") {
    import graft.vector.{Hnsw, IvfPq}
    val cfg = Hybrid.Config(k = 4, fusion = Hybrid.Rrf)
    val p = tmp("hybswitch")
    val ivfpq = IvfPq.build(vectors, nlist = 2, m = 3, ksub = 4, maxIter = 5)
    Hybrid.writeAny(p, Some(meta), Some(Hybrid.IvfPqRefinedLeg(ivfpq,
      vectors, refineFactor = 100, nprobe = 2)), Some(corpus), cfg)
    // overwrite with the classic IVF-shaped blob: the stale leg record
    // must NOT redirect read() to the leftover ivfpq artifact
    Hybrid.writePartial(p, Some(meta), Some(ivfIdx), Some(corpus), cfg)
    val asIvf = Hybrid.read(spark, p)
    assert(asIvf.legOpt.isEmpty && asIvf.ivfOpt.nonEmpty,
      s"stale leg record survived the IVF overwrite: ${asIvf.legOpt}")
    val wantIvf = pairs(Hybrid.search(meta, theFilters, None, Some(q(qv)),
      Some(corpus), Some(qt), cfg, ivf = Some(ivfIdx)))
    assert(pairs(asIvf.search(theFilters, Some(q(qv)), Some(qt))) == wantIvf)
    // switch kinds again: the IVF dirs must not surface through the
    // reloaded blob (a stale vectors/_centroids would come back via ivf)
    val hnsw = Hnsw.build(vectors.repartition(2))
    Hybrid.writeAny(p, Some(meta),
      Some(Hybrid.HnswLeg(hnsw, efSearch = 5000)), Some(corpus), cfg)
    val asHnsw = Hybrid.read(spark, p)
    assert(asHnsw.ivfOpt.isEmpty,
      "stale IVF artifact resurrected after the kind switch")
    assert(asHnsw.vectorLeg.exists(_.isInstanceOf[Hybrid.HnswLeg]))
    val wantH = pairs(Hybrid.searchWith(meta, theFilters,
      Some(Hybrid.HnswLeg(hnsw, efSearch = 5000)), Some(q(qv)),
      Some(corpus), Some(qt), cfg))
    assert(pairs(asHnsw.search(theFilters, Some(q(qv)), Some(qt))) == wantH)
  }

  test("LEG-LESS rewrite at the same path drops the prior vector " +
       "artifact: writeAny(leg = None) over an IVF-shaped blob clears " +
       "vectors/centroids too, so read() serves a blob with NO vector " +
       "leg instead of resurrecting the leftover IVF artifact " +
       "(ADVICE r15 — the leg-None twin of the kind-switch hygiene)") {
    val cfg = Hybrid.Config(k = 4, fusion = Hybrid.Rrf)
    val p = tmp("hyblegless")
    Hybrid.writePartial(p, Some(meta), Some(ivfIdx), Some(corpus), cfg)
    assert(Hybrid.read(spark, p).ivfOpt.nonEmpty) // precondition
    Hybrid.writeAny(p, Some(meta), None, Some(corpus), cfg)
    val reloaded = Hybrid.read(spark, p)
    assert(reloaded.ivfOpt.isEmpty && reloaded.legOpt.isEmpty,
      "stale IVF artifact resurrected as a live vector leg after a " +
        "leg-less rewrite")
    // the surviving legs still serve: text+meta search works, and a
    // vector query against the leg-less blob is the usual loud error
    assert(reloaded.search(theFilters, None, Some(qt)).count() > 0)
  }

  test("EMPTY hybrid blob round-trips: zero-row legs serialize, reload, " +
       "and search to zero results without error " +
       "(TestHybridSearchIndexSerializationEmpty, " +
       "hybrid_search_index_test.go:1015-1048)") {
    val s = spark
    import s.implicits._
    val cfg = Hybrid.Config(k = 4, fusion = Hybrid.Rrf)
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("id", "vector")
    val emptyCorpus = graft.text.BM25.build(
      Seq.empty[(Long, String)].toDF("id", "text"))
    val p = tmp("hybempty")
    Hybrid.writeAny(p, Some(emptyMeta.select(col("id"))),
      Some(Hybrid.FlatLeg(emptyVecs)), Some(emptyCorpus), cfg)
    val loaded = Hybrid.read(spark, p)
    assert(loaded.vectorLeg.exists(_.isInstanceOf[Hybrid.FlatLeg]))
    val res = loaded.search(Seq.empty, Some(q(qv)), Some(qt))
    assert(res.count() == 0, "empty blob must search to zero results")
  }

  test("invalid blob artifacts fail LOUDLY with named errors " +
       "(TestHybridSearchIndexReadFromInvalidData, " +
       "hybrid_search_index_test.go:948-1013 — our parquet-directory " +
       "analogs of bad magic / unsupported version): missing config, " +
       "unknown fusion kind, unknown metric") {
    val s = spark
    import s.implicits._
    // truncated artifact: no config record at all
    val p0 = tmp("hybbad-noconfig")
    intercept[Exception](Hybrid.read(spark, p0))
    // unknown fusion kind in the config record
    def badConfig(p: String, fusion: String, metric: String): Unit =
      Seq((4, fusion, 1.0, 1.0, 60.0, metric, 8))
        .toDF("k", "fusion", "vector_weight", "text_weight", "rrf_k",
          "metric", "nprobe")
        .repartition(1).write.mode("overwrite").parquet(s"$p/config")
    val p1 = tmp("hybbad-fusion")
    badConfig(p1, "warp_fusion", "l2")
    val e1 = intercept[IllegalStateException](Hybrid.read(spark, p1))
    assert(e1.getMessage.contains("unknown fusion kind"))
    // unknown metric in the config record
    val p2 = tmp("hybbad-metric")
    badConfig(p2, "rrf", "manhattan")
    val e2 = intercept[IllegalStateException](Hybrid.read(spark, p2))
    assert(e2.getMessage.contains("unknown metric"))
  }

  test("double round-trip: read → write the loaded legs → read again is a " +
       "fixed point (serialization is lossless, " +
       "TestSerializationRoundTrip shape)") {
    val cfg = Hybrid.Config(k = 4, fusion = Hybrid.Rrf)
    val p1 = tmp("hybmx-rt1")
    Hybrid.writePartial(p1, Some(meta), Some(ivfIdx), Some(corpus), cfg)
    val once = Hybrid.read(spark, p1)
    val p2 = tmp("hybmx-rt2")
    Hybrid.writePartial(p2, once.metaOpt, once.ivfOpt, once.corpusOpt, once.cfg)
    val twice = Hybrid.read(spark, p2)
    assert(twice.cfg == cfg)
    val a = pairs(once.search(theFilters, Some(q(qv)), Some(qt)))
    val b = pairs(twice.search(theFilters, Some(q(qv)), Some(qt)))
    assert(a == b && a.nonEmpty)
  }
}
