package graft

import graft.agg.ScoreAgg
import graft.expr.Quantizers
import graft.filter.{Filter, FilterGroup, Filters}
import graft.fusion.Fusion
import graft.pipeline.Curation
import graft.store.SegmentStore
import graft.text.BM25
import graft.vector.{FlatKnn, Hnsw, Ivf, Metric}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differential enumeration rows beyond [[DegenerateInputSpec]]: operator
  * COMPOSITIONS (threshold+filter), missing/deleted-node lookups, one-leg
  * fusion, filter edge values, quantizer specials, and store/pipeline
  * boundary shapes — the long tail of the reference's per-operator test
  * matrices (`/root/reference/hnsw_index_search_test.go:123-1292`,
  * `bm25_index_search_test.go`, `fusion_test.go`,
  * `metadata_index_test.go:929`, `limiter.go`). */
class EnumerationSpec extends SparkSpec {

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

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).toSeq.sorted

  // ---- composed search options (threshold AND document filter) ----

  test("hnsw threshold + prefilter compose like flat (hnsw_index_search.go:322-329)") {
    val s = spark
    import s.implicits._
    val data = vecs(60)
    val cand = (0 until 60 by 3).map(_.toLong).toDF("id")
    val idx = Hnsw.build(data.repartition(4))
    // exhaustive beam => exact, so flat with the same options is the oracle
    val got = Hnsw.searchIndex(idx, q(q4), 10, efSearch = 200,
      threshold = Some(12.0), candidates = Some(cand))
    val want = FlatKnn.search(data, q(q4), 10, Metric.L2,
      threshold = Some(12.0), candidates = Some(cand))
    assert(ids(got) == ids(want) && got.count() > 0)
  }

  test("flat threshold excluding everything: empty, not error") {
    assert(FlatKnn.search(vecs(20), q(q4), 5, Metric.L2,
      threshold = Some(1e-9)).count() == 0)
  }

  // ---- node-based search against missing / deleted nodes ----

  test("hnsw searchByNodes: unknown and deleted ids resolve to no queries") {
    val idx = Hnsw.build(vecs(30).repartition(3))
    assert(Hnsw.searchByNodes(idx, Seq(999L), 5).count() == 0)
    val afterDelete = Hnsw.deleteFlush(idx, Seq(7L))
    assert(Hnsw.searchByNodes(afterDelete, Seq(7L), 5).count() == 0)
    // a live node still resolves after the unrelated delete
    assert(Hnsw.searchByNodes(afterDelete, Seq(3L), 5).count() == 5)
  }

  test("ivf searchByNodes: unknown id resolves to no queries (ivf_index_search.go)") {
    val idx = Ivf.build(vecs(30), nlist = 4, maxIter = 2)
    assert(Ivf.searchByNodes(idx, Seq(999L), 5, nprobe = 4).count() == 0)
  }

  test("bm25 searchByDocs: missing doc id => empty (bm25_index_search.go:233-261)") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"))
      .toDF("id", "text")
    val corpus = BM25.build(docs)
    assert(corpus.searchByDocs(Seq(42L), 5).count() == 0)
  }

  test("bm25 search: duplicate query terms collapse to one occurrence") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma"), (3L, "alpha alpha"))
      .toDF("id", "text")
    val corpus = BM25.build(docs)
    val once = corpus.search("alpha beta", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val dup = corpus.search("alpha alpha beta beta beta", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(dup == once)
  }

  // ---- fusion with one empty modality (fusion.go full-outer vs inner) ----

  test("fusion with an empty text leg: outer strategies keep the vector leg, Min drops all") {
    val s = spark
    import s.implicits._
    val vec = Seq((1L, 0.5), (2L, 0.7)).toDF("id", "score")
    val txt = Seq.empty[(Long, Double)].toDF("id", "score")
    assert(ids(Fusion.weightedSum(vec, txt)) == Seq(1L, 2L))
    assert(ids(Fusion.maxFusion(vec, txt)) == Seq(1L, 2L))
    assert(ids(Fusion.minFusion(vec, txt)).isEmpty)
    val r = Fusion.rrf(vec, txt).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    // vector-only ranks: 1/(60+0) and 1/(60+1), no text contribution
    assert(math.abs(r(1L) - 1.0 / 60) < 1e-12)
    assert(math.abs(r(2L) - 1.0 / 61) < 1e-12)
  }

  test("weightedSum weights: missing modality contributes 0, weights scale (fusion.go:131-149)") {
    val s = spark
    import s.implicits._
    val vec = Seq((1L, 2.0)).toDF("id", "score")
    val txt = Seq((1L, 3.0), (9L, 1.0)).toDF("id", "score")
    val out = Fusion.weightedSum(vec, txt, vw = 10.0, tw = 0.5).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out(1L) == 10.0 * 2.0 + 0.5 * 3.0)
    assert(out(9L) == 0.5 * 1.0) // vec side missing => 0, not dropped
  }

  // ---- autocut boundary shapes (limiter.go:81-118) ----

  test("autocut: monotone ramp with no interior jump keeps everything") {
    // equally spaced scores => diff curve identically 0 => no local max
    val scores = IndexedSeq(1.0, 2.0, 3.0, 4.0, 5.0)
    assert(ScoreAgg.autocutIndex(scores, 1) == scores.length)
  }

  test("autocut: cutOff beyond the number of jumps keeps everything") {
    val scores = IndexedSeq(1.0, 1.01, 1.02, 9.0, 9.01)
    val idx1 = ScoreAgg.autocutIndex(scores, 1)
    assert(idx1 == 3) // cut at the one obvious jump
    assert(ScoreAgg.autocutIndex(scores, 5) == scores.length)
  }

  // ---- quantizer special values ----

  test("f16 round trip: specials (NaN, ±Inf, zero) and exact halves survive") {
    assert(Quantizers.fromHalfBits(Quantizers.toHalfBits(Float.NaN)).isNaN)
    assert(Quantizers.fromHalfBits(Quantizers.toHalfBits(
      Float.PositiveInfinity)) == Float.PositiveInfinity)
    assert(Quantizers.fromHalfBits(Quantizers.toHalfBits(
      Float.NegativeInfinity)) == Float.NegativeInfinity)
    assert(Quantizers.fromHalfBits(Quantizers.toHalfBits(0.0f)) == 0.0f)
    // exactly representable in half precision => bit-exact round trip
    Seq(0.5f, 1.5f, -2.25f, 1024f).foreach { x =>
      assert(Quantizers.fromHalfBits(Quantizers.toHalfBits(x)) == x)
    }
    // 65520 rounds past f16 max (65504) => overflows to infinity
    assert(Quantizers.fromHalfBits(Quantizers.toHalfBits(65520f))
      == Float.PositiveInfinity)
  }

  test("int8 quantize: error bounded by absMax/127, extremes map to ±127") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Array(-10f, -5f, 0f, 5f, 10f))).toDF("id", "vector")
    val am = Quantizers.int8AbsMax(df, "vector")
    val joined = df.crossJoin(am)
    val codes = joined.select(
      Quantizers.int8Quantize(col("vector"), col("abs_max")).as("codes"))
      .head().getSeq[Int](0)
    assert(codes.head == -127 && codes.last == 127 && codes(2) == 0)
    val deq = joined.select(Quantizers.int8Dequantize(
        Quantizers.int8Quantize(col("vector"), col("abs_max")),
        col("abs_max")).as("deq"))
      .head().getSeq[Double](0)
    val orig = Seq(-10f, -5f, 0f, 5f, 10f)
    orig.zip(deq).foreach { case (o, d) =>
      assert(math.abs(o - d) <= 10.0 / 127 + 1e-6)
    }
  }

  // ---- filter edge values (metadata_index.go set semantics) ----

  test("filters: In(empty) matches nothing, NotIn(empty) matches all incl. nulls") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Some("a")), (2L, Some("b")), (3L, None))
      .toDF("id", "cat")
    assert(df.filter(Filters.compile(Filter.In("cat", Seq.empty))).count() == 0)
    assert(df.filter(Filters.compile(Filter.NotIn("cat", Seq.empty))).count() == 3)
    // NoneIn on a NULL list column qualifies (complement semantics)
    val tagged = Seq((1L, Some(Seq("x"))), (2L, None))
      .toDF("id", "tags")
    assert(tagged.filter(Filters.compile(
      Filter.NoneIn("tags", Seq("x")))).select("id").head().getLong(0) == 2L)
  }

  test("filter groups: empty group and empty group-list both match all") {
    val s = spark
    import s.implicits._
    val df = Seq(1L, 2L, 3L).toDF("id")
    assert(df.filter(Filters.compileGroups(Seq.empty)).count() == 3)
    assert(df.filter(Filters.compileGroups(
      Seq(FilterGroup(Seq.empty)))).count() == 3)
  }

  // ---- pipeline boundary shapes ----

  test("packSequences: an over-budget doc gets its own pack; budget boundary splits") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens > budget 4 => own pack(s)
      (2L, "k l"), (3L, "m n")
    ).toDF("id", "text")
    val packs = Curation.packSequences(docs, "id", "text", budget = 4)
      .orderBy("seq_id").collect()
    // packing is doc-granular: the over-budget doc lands in pack 0 ALONE
    // (docs are never split); later docs start at its cumulative offset
    assert(packs.head.getLong(1) == 1L) // first pack: just the big doc
    val total = packs.map(_.getLong(2)).sum
    assert(total == 14L) // nothing lost, nothing duplicated
  }

  test("decontaminate: an identical train/eval doc pair is flagged; disjoint text is not") {
    val s = spark
    import s.implicits._
    val train = Seq((1L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("id", "text")
    val evalSame = train
    val flagged = Curation.decontaminate(train, evalSame, "id", "text")
      .collect()
    assert(flagged.length == 1 && flagged.head.getLong(2) >= 1)
    val evalOther = Seq((9L, "completely different words in this sentence here now ok"))
      .toDF("id", "text")
    assert(Curation.decontaminate(train, evalOther, "id", "text").count() == 0)
  }

  test("segment store: delete-everything leaves a readable empty live view") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("segempty").toString
    val store = new SegmentStore(s, root)
    store.append(Seq((1L, "a"), (2L, "b")).toDF("id", "payload"))
    store.delete(Seq(1L, 2L))
    assert(store.read().count() == 0)
    val seg = store.compact()
    assert(seg >= 0 && store.read().count() == 0)
  }

  // ---- beam parameter sanitization ----

  test("invalid artifact reads fail loudly, never return garbage " +
       "(*_index_test.go ReadFromInvalidData matrix — parquet/format " +
       "checks play the magic/version role)") {
    val s = spark
    import s.implicits._
    def tmp() = java.nio.file.Files.createTempDirectory("badart").toString
    // empty directory: every reader errors rather than yielding an index
    intercept[Exception] { graft.text.BM25.read(spark, tmp()) }
    intercept[Exception] { graft.vector.Ivf.readPartitioned(spark, tmp()) }
    intercept[Exception] { graft.vector.Pq.read(spark, tmp()) }
    intercept[Exception] { graft.hybrid.Hybrid.read(spark, tmp()) }
    // a directory holding the WRONG artifact: schema mismatch surfaces
    // as an error at read/first-use, not silent misinterpretation
    val wrong = tmp()
    Seq((1L, "some text")).toDF("id", "text")
      .write.mode("overwrite").parquet(s"$wrong/codebooks")
    intercept[Exception] { graft.vector.Pq.read(spark, wrong) }
    // store with zero segments refuses to read
    intercept[Exception] {
      new graft.store.SegmentStore(spark, tmp()).read()
    }
    // SUBTLE corruption — all tables present but the recorded tokenizer
    // name is unknown (the "unsupported version" row of
    // bm25_index_test.go:922-933): read must throw, not fall back to a
    // default tokenizer that would cut queries differently than the
    // stored postings
    val badTok = tmp()
    val corpus = graft.text.BM25.build(
      Seq((1L, "alpha beta")).toDF("id", "text"), "id", "text")
    graft.text.BM25.write(corpus, badTok)
    Seq("tok-v99").toDF("tokenizer").repartition(1)
      .write.mode("overwrite").parquet(s"$badTok/meta")
    val e = intercept[IllegalStateException] {
      graft.text.BM25.read(spark, badTok)
    }
    assert(e.getMessage.contains("unknown tokenizer"))
  }

  test("hnsw: efSearch below k is widened to k (beam cannot starve the result)") {
    val idx = Hnsw.build(vecs(50).repartition(2))
    val got = Hnsw.searchIndex(idx, q(q4), 10, efSearch = 1)
    assert(got.count() == 10)
  }
}
