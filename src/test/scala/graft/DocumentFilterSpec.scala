package graft

import graft.agg.ScoreAgg
import graft.text.{BM25, TextSearch}
import graft.vector._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic port of the reference's per-index document-filter enumeration
  * (`*_document_filter_test.go`): for every index family, the same
  * filter matrix — no filter / subset / single doc / non-existent docs /
  * EMPTY id list (= NO filter, document_filter.go:27-30) — plus the
  * parameter interactions each file pins (filter×k, filter×threshold,
  * filter×nprobe, filter×efSearch, filter×delete, filter×aggregation,
  * filter×node-search). Fixtures mirror the reference's where practical.
  */
class DocumentFilterSpec extends SparkSpec {

  private def df(rows: Seq[(Long, Array[Float])]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("id", "vector")
  }

  private def resultIds(r: DataFrame): Set[Long] =
    r.select("id").collect().map(_.getLong(0)).toSet

  // flat_index_document_filter_test.go:17-27 fixture
  private lazy val six = df(Seq(
    1L -> Array(1f, 0f, 0f), 2L -> Array(0f, 1f, 0f), 3L -> Array(0f, 0f, 1f),
    4L -> Array(1f, 1f, 0f), 5L -> Array(0f, 1f, 1f), 6L -> Array(1f, 0f, 1f)
  )).cache()
  private val q100 = Array(1f, 0f, 0f)

  // ------------------------------------------------------------- flat

  test("flat filter matrix: none/subset/single/non-existent/empty-list " +
       "(flat_index_document_filter_test.go:36-66)") {
    def run(ids: Seq[Long]): Set[Long] = resultIds(
      (if (ids == null) VectorSearch.onFlat(six)
       else VectorSearch.onFlat(six).withDocumentIds(ids: _*))
        .withQuery(q100).withK(10).execute())
    assert(run(null) == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(run(Seq(1L, 3L, 5L)) == Set(1L, 3L, 5L))
    assert(run(Seq(2L)) == Set(2L))
    assert(run(Seq(100L, 200L)) == Set.empty[Long])
    // empty id list behaves like NO filter (NewDocumentFilter -> nil)
    assert(run(Seq.empty) == Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("flat multi-query + filter: only filtered ids, any query " +
       "(flat_index_document_filter_test.go:94-131)") {
    val ten = df((1L to 10L).map { i =>
      val v = new Array[Float](3); v((i % 3).toInt) = i.toFloat; i -> v
    })
    val got = resultIds(VectorSearch.onFlat(ten)
      .withQuery(Array(1f, 0f, 0f), Array(0f, 1f, 0f))
      .withK(10).withDocumentIds(2L, 4L, 6L, 8L).execute())
    assert(got.nonEmpty && got.subsetOf(Set(2L, 4L, 6L, 8L)))
  }

  // -------------------------------------------------------------- ivf

  test("ivf filter matrix at probe-all equals flat filtered; filter holds " +
       "at every nprobe (ivf_index_document_filter_test.go)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    val data = df((0L until 200L).map(i =>
      i -> Array.fill(8)(rnd.nextGaussian().toFloat))).cache()
    val idx = Ivf.build(data, nlist = 8, maxIter = 10)
    val q = data.filter(col("id") === 7)
      .select(col("id").as("qid"), col("vector").as("qvec"))
    val evens = (0L until 200L by 2).toDF("id")
    val flatFiltered = FlatKnn.search(data, q, 10, Metric.L2,
      candidates = Some(evens)).select("id").collect().map(_.getLong(0)).toSeq
    // probe-all: exactly the flat filtered top-k, in order
    val probeAll = Ivf.search(idx, q, 10, nprobe = 8, candidates = Some(evens))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(probeAll == flatFiltered)
    // the filter is respected at EVERY nprobe (fewer probes may lose
    // recall, never leak a non-candidate)
    Seq(1, 2, 4).foreach { np =>
      val got = resultIds(Ivf.search(idx, q, 10, nprobe = np,
        candidates = Some(evens)))
      assert(got.forall(_ % 2 == 0), s"nprobe=$np leaked non-candidates")
    }
    // single / non-existent rows via the fluent surface
    val one = resultIds(VectorSearch.onIvf(idx)
      .withQuery(data.filter(col("id") === 7).head.getSeq[Float](1).toArray)
      .withK(10).withNProbes(8).withDocumentIds(42L).execute())
    assert(one == Set(42L))
    val none = resultIds(VectorSearch.onIvf(idx)
      .withQuery(data.filter(col("id") === 7).head.getSeq[Float](1).toArray)
      .withK(10).withNProbes(8).withDocumentIds(5000L, 6000L).execute())
    assert(none.isEmpty)
  }

  // --------------------------------------------------------------- pq

  test("pq filter: single doc and non-existent docs " +
       "(pq_index_document_filter_test.go:8-114)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(13)
    val data = df((0L until 200L).map(i =>
      i -> Array.fill(8)(rnd.nextGaussian().toFloat))).cache()
    val model = Pq.train(data, m = 4, ksub = 16, maxIter = 5)
    val encoded = Pq.encode(data, model)
    val qv = data.filter(col("id") === 7).head.getSeq[Float](1).toArray
    val one = resultIds(VectorSearch.onPq(encoded, model)
      .withQuery(qv).withK(10).withDocumentIds(42L).execute())
    assert(one == Set(42L))
    val none = resultIds(VectorSearch.onPq(encoded, model)
      .withQuery(qv).withK(10).withDocumentIds(5000L).execute())
    assert(none.isEmpty)
    // empty id list = no filter: k results from the whole corpus
    val all = VectorSearch.onPq(encoded, model)
      .withQuery(qv).withK(10).withDocumentIds().execute()
    assert(all.count() == 10)
  }

  // ------------------------------------------------------------ ivfpq

  test("ivfpq filter holds at every nprobe; filter+threshold compose " +
       "(ivfpq_index_document_filter_test.go)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(17)
    val data = df((0L until 200L).map(i =>
      i -> Array.fill(8)(rnd.nextGaussian().toFloat))).cache()
    val idx = IvfPq.build(data, nlist = 4, m = 4, ksub = 16, maxIter = 5)
    val q = data.filter(col("id") === 7)
      .select(col("id").as("qid"), col("vector").as("qvec"))
    val evens = (0L until 200L by 2).toDF("id")
    Seq(1, 2, 4).foreach { np =>
      val got = resultIds(IvfPq.search(idx, q, 10, nprobe = np,
        candidates = Some(evens)))
      assert(got.nonEmpty || np < 4, s"nprobe=$np empty at probe-all")
      assert(got.forall(_ % 2 == 0), s"nprobe=$np leaked non-candidates")
    }
    // filter + threshold: survivors are exactly the filtered results
    // within the cutoff (threshold filters, never rescores)
    val unfiltered = IvfPq.search(idx, q, 50, nprobe = 4,
      candidates = Some(evens)).select("id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    val t = unfiltered.map(_._2).sorted.apply(unfiltered.length / 2)
    val got = IvfPq.search(idx, q, 50, nprobe = 4, threshold = Some(t),
      candidates = Some(evens)).select("id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.nonEmpty)
    assert(got.forall { case (id, sc) => id % 2 == 0 && sc <= t })
    assert(got.toMap == unfiltered.filter(_._2 <= t).toMap)
  }

  // ------------------------------------------------------------- hnsw

  test("hnsw filter matrix incl. efSearch interaction " +
       "(hnsw_index_document_filter_test.go:10-125)") {
    val twenty = df((1L to 20L).map { i =>
      val v = new Array[Float](3); v((i % 3).toInt) = i.toFloat; i -> v
    })
    val idx = Hnsw.build(twenty.repartition(2))
    def search(ef: Int, ids: Long*): Set[Long] = resultIds(
      VectorSearch.onHnsw(idx).withQuery(Array(1f, 0f, 0f))
        .withK(5).withEfSearch(ef).withDocumentIds(ids: _*).execute())
    // subset at custom efSearch: never leaks a non-candidate
    val allowed = Set(2L, 4L, 6L, 8L, 10L, 12L)
    Seq(20, 50, 400).foreach { ef =>
      val got = search(ef, allowed.toSeq: _*)
      assert(got.nonEmpty && got.subsetOf(allowed), s"ef=$ef leaked: $got")
    }
    // single / non-existent / empty-list rows
    assert(search(50, 7L) == Set(7L))
    assert(search(50, 100L, 200L).isEmpty)
    assert(search(50).size == 5) // empty list = no filter, k filled
  }

  // ------------------------------------------------------------- bm25

  // bm25_index_document_filter_test.go:12-22 fixture
  private lazy val foxCorpus = {
    val s = spark; import s.implicits._
    BM25.build(Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the lazy cat sleeps all day",
      3L -> "quick movements of the fox",
      4L -> "the dog barks at strangers",
      5L -> "a fox in the forest").toDF("id", "text"))
  }

  test("bm25 filter matrix: none/subset/single/non-matching/empty-list " +
       "(bm25_index_document_filter_test.go:36-100)") {
    def run(q: String, ids: Long*): Set[Long] = resultIds(
      TextSearch.on(foxCorpus).withQuery(q).withK(10)
        .withDocumentIds(ids: _*).execute())
    assert(run("fox") == Set(1L, 3L, 5L))
    assert(run("fox", 1L, 3L) == Set(1L, 3L))
    assert(run("fox", 5L) == Set(5L))
    assert(run("fox", 2L, 4L).isEmpty) // candidates don't contain the term
    assert(run("lazy") == Set(1L, 2L))
    assert(run("lazy", Seq.empty[Long]: _*) == Set(1L, 2L)) // empty = none
  }

  test("bm25 filter x k: k caps the filtered set " +
       "(bm25_index_document_filter_test.go:167-200)") {
    val s = spark; import s.implicits._
    val c = BM25.build((1L to 10L).map(i =>
      i -> "document about programming and software development")
      .toDF("id", "text"))
    val got = resultIds(TextSearch.on(c).withQuery("programming")
      .withDocumentIds(1L, 2L, 3L, 4L, 5L).withK(3).execute())
    assert(got.size == 3 && got.subsetOf(Set(1L, 2L, 3L, 4L, 5L)))
  }

  test("bm25 filter x node search (bm25_index_document_filter_test.go:203-248)") {
    val s = spark; import s.implicits._
    val c = BM25.build(Seq(
      1L -> "apple banana cherry", 2L -> "apple orange grape",
      3L -> "banana kiwi mango", 4L -> "cherry strawberry blueberry",
      5L -> "apple banana orange").toDF("id", "text"))
    val got = resultIds(TextSearch.on(c).withNodes(1L)
      .withDocumentIds(2L, 3L, 5L).withK(10).execute())
    assert(got.nonEmpty && got.subsetOf(Set(2L, 3L, 5L)))
    // docs 2 (apple), 3 (banana), 5 (apple banana) all share a term
    assert(got == Set(2L, 3L, 5L))
  }

  test("bm25 filter x empty results (bm25_index_document_filter_test.go:250-282)") {
    val s = spark; import s.implicits._
    val c = BM25.build(Seq(1L -> "red apple", 2L -> "blue sky",
      3L -> "green grass").toDF("id", "text"))
    assert(resultIds(TextSearch.on(c).withQuery("apple")
      .withDocumentIds(2L, 3L).execute()).isEmpty)
  }

  test("bm25 filter x multi-query Sum aggregation: doc with both terms " +
       "tops (bm25_index_document_filter_test.go:284-329)") {
    val s = spark; import s.implicits._
    val c = BM25.build(Seq(
      1L -> "machine learning", 2L -> "deep learning",
      3L -> "machine vision", 4L -> "computer vision",
      5L -> "learning algorithms").toDF("id", "text"))
    val rows = TextSearch.on(c).withQuery("machine", "learning")
      .withDocumentIds(1L, 2L, 3L).withScoreAggregation(ScoreAgg.Sum)
      .withK(10).execute().collect()
    val got = rows.map(_.getLong(0))
    assert(got.toSet.subsetOf(Set(1L, 2L, 3L)))
    assert(got.head == 1L) // matches both query terms
  }

  test("bm25 filter chaining with k + Max aggregation " +
       "(bm25_index_document_filter_test.go:331-365)") {
    val s = spark; import s.implicits._
    val c = BM25.build((1L to 5L).map(i => i -> "test document with content")
      .toDF("id", "text"))
    val got = resultIds(TextSearch.on(c).withQuery("content").withK(3)
      .withDocumentIds(1L, 2L, 3L, 4L)
      .withScoreAggregation(ScoreAgg.Max).execute())
    assert(got.size <= 3 && got.subsetOf(Set(1L, 2L, 3L, 4L)))
  }

  test("bm25 filter with non-existent doc ids " +
       "(bm25_index_document_filter_test.go:367-401)") {
    val s = spark; import s.implicits._
    val c = BM25.build((1L to 3L).map(i => i -> "test document content")
      .toDF("id", "text"))
    val got = resultIds(TextSearch.on(c).withQuery("content")
      .withDocumentIds(1L, 100L, 200L).execute())
    assert(got == Set(1L))
  }
}
