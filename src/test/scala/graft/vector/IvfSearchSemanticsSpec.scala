package graft.vector

import org.apache.spark.sql.DataFrame

/** Row-for-row port of the IVF search-semantics enumeration
  * (`/root/reference/ivf_index_search_test.go`) — the one reference test
  * file whose rows were not yet pinned by IndexSearchMatrixSpec (which
  * covers the threshold/filter/batch matrix but not the combined
  * query+node rows or the validation table).
  *
  * Reference shape: Train() on 4 seed vectors, Add() the corpus, then
  * fluent searches. Our analog keeps the same two-step shape through the
  * public API: `Ivf.build` on the seeds (train + assign), `Ivf.delete`
  * the seeds, `Ivf.add` the corpus — the centroids are the seeds',
  * exactly like the reference's train-then-add.
  */
class IvfSearchSemanticsSpec extends graft.SparkSpec {

  private def df(rows: Seq[(Long, Array[Float])]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "vector")
  }

  /** Train on the reference's 4 seed vectors (2 clusters: the origin
    * region and the (10,10,10) region), then add `corpus` only. */
  private def trainThenAdd(corpus: Seq[(Long, Array[Float])]): Ivf.Index = {
    val seeds = Seq(
      100L -> Array(0f, 0f, 0f), 101L -> Array(10f, 10f, 10f),
      102L -> Array(1f, 0f, 0f), 103L -> Array(11f, 10f, 10f))
    val trained = Ivf.build(df(seeds), nlist = 2, maxIter = 10)
    Ivf.add(Ivf.delete(trained, seeds.map(_._1)), df(corpus))
  }

  private def ids(res: DataFrame): Seq[Long] =
    res.select("id").collect().map(_.getLong(0)).toSeq

  test("combined query + node search dedups by id " +
      "(ivf_index_search_test.go:8-76)") {
    val idx = trainThenAdd(Seq(
      0L -> Array(1f, 0f, 0f), 1L -> Array(0f, 1f, 0f),
      2L -> Array(0f, 0f, 1f), 3L -> Array(2f, 0f, 0f),
      4L -> Array(10f, 10f, 10f), 5L -> Array(11f, 10f, 10f)))
    val res = VectorSearch.onIvf(idx)
      .withQuery(Array(0f, 1f, 0f)).withNodes(0L)
      .withK(2).withNProbes(2).execute()
    val got = ids(res)
    // 2 queries (1 direct + 1 resolved node) × k=2, deduplicated by id
    assert(got.size >= 2, s"expected >=2 deduplicated results, got $got")
    assert(got.distinct == got, s"duplicate ids in aggregated results: $got")
  }

  test("multiple direct queries + multiple nodes in one batch " +
      "(ivf_index_search_test.go:79-146)") {
    val idx = trainThenAdd(Seq(
      0L -> Array(1f, 0f, 0f), 1L -> Array(0f, 1f, 0f),
      2L -> Array(0f, 0f, 1f), 3L -> Array(2f, 0f, 0f),
      4L -> Array(0f, 2f, 0f), 5L -> Array(10f, 10f, 10f)))
    val res = VectorSearch.onIvf(idx)
      .withQuery(Array(1.1f, 0f, 0f), Array(0f, 1.1f, 0f))
      .withNodes(2L, 3L)
      .withK(2).withNProbes(2).execute()
    val got = ids(res)
    // 4 queries (2 direct + 2 nodes) × k=2 with overlap: fewer than 8
    // unique results, all deduplicated
    assert(got.size >= 2, s"expected >=2 deduplicated results, got $got")
    assert(got.distinct == got, s"duplicate ids in aggregated results: $got")
  }

  test("combined query + node with threshold keeps only in-range rows " +
      "(ivf_index_search_test.go:149-205)") {
    val idx = trainThenAdd(Seq(
      0L -> Array(1f, 0f, 0f), 1L -> Array(0f, 1f, 0f),
      2L -> Array(0f, 0f, 1f), 3L -> Array(5f, 0f, 0f),
      4L -> Array(0f, 5f, 0f)))
    val res = VectorSearch.onIvf(idx)
      .withQuery(Array(1f, 0f, 0f)).withNodes(1L)
      .withK(10).withNProbes(2).withThreshold(2.0).execute()
    val got = ids(res).toSet
    // only ids 0/1/2 sit within L2 distance 2.0 of either query
    // ([1,0,0] or node 1's stored [0,1,0]); 3 and 4 are 4.0+ away from
    // both — the threshold applies per query BEFORE aggregation
    assert(got == Set(0L, 1L, 2L),
      s"expected exactly {0,1,2} within threshold 2.0, got $got")
  }

  test("validation table: query/node presence and dimension " +
      "(ivf_index_search_test.go:208-293)") {
    val idx = trainThenAdd(Seq(0L -> Array(1f, 0f, 0f)))
    // "no query or node" → error
    intercept[IllegalArgumentException] {
      VectorSearch.onIvf(idx).withK(1).execute()
    }
    // "valid node search" → no error
    assert(ids(VectorSearch.onIvf(idx).withNodes(0L).withK(1).execute())
      == Seq(0L))
    // "valid query search" → no error
    assert(ids(VectorSearch.onIvf(idx)
      .withQuery(Array(1f, 0f, 0f)).withK(1).execute()) == Seq(0L))
    // "valid combined search" → no error
    assert(ids(VectorSearch.onIvf(idx)
      .withQuery(Array(1f, 0f, 0f)).withNodes(0L).withK(1).execute())
      == Seq(0L))
    // "query dimension mismatch" (4D query on a 3D index) → error, caught
    // driver-side before any job (the trained model knows its dim)
    val e = intercept[IllegalArgumentException] {
      VectorSearch.onIvf(idx)
        .withQuery(Array(1f, 0f, 0f, 0f)).withK(1).execute()
    }
    assert(e.getMessage.contains("dim"))
  }

  test("search before train is impossible by construction " +
      "(ivf_index_search_test.go:296-311)") {
    // the reference's untrained-index search error maps to OUR train-time
    // contract: an IVF index only exists once k-means has trained, and
    // training on an empty frame is the loud failure
    val e = intercept[IllegalArgumentException] {
      Ivf.build(df(Seq.empty), nlist = 2, maxIter = 5)
    }
    assert(e.getMessage.toLowerCase.contains("empty"))
  }
}
