package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's per-index search-semantics enumerations, run as ONE
  * differential matrix over every index kind instead of 4×1.5k LoC of
  * copied rows (`/root/reference/hnsw_index_search_test.go:123-1292`,
  * `pq_index_search_test.go:56-723`, `ivfpq_index_search_test.go:9-1090`,
  * `flat_index_search_test.go`): threshold strictness and zero-threshold,
  * threshold×filter×k composition, batch-query independence, deleted and
  * non-existent nodes, post-delete search, and high-k-with-filter — each
  * row asserted against the flat oracle for the exact engines and
  * against the semantic invariant for the quantized ones. */
class IndexSearchMatrixSpec extends graft.SparkSpec {

  private val dim = 8
  private def vecOf(i: Long): Array[Float] =
    Array.tabulate(dim)(j => (math.sin(i * 1.7 + j * 0.9) * 10).toFloat)

  private def data: DataFrame = {
    val s = spark
    import s.implicits._
    (0L until 40L).map(i => (i, vecOf(i))).toDF("id", "vector")
  }

  private def q(qid: Long, v: Array[Float]): (Long, Array[Float]) = (qid, v)
  private def queries(qs: (Long, Array[Float])*): DataFrame = {
    val s = spark
    import s.implicits._
    qs.toDF("qid", "qvec")
  }

  /** One search adapter per index kind. `exact` engines must equal flat
    * row-for-row under every option combination. */
  private case class Eng(name: String, exact: Boolean,
      search: (DataFrame, Int, Option[Double], Option[DataFrame]) => DataFrame)

  private lazy val engines: Seq[Eng] = {
    val d = data.cache()
    val hnsw = Hnsw.build(d.repartition(4))
    val ivf = Ivf.build(d, nlist = 4, maxIter = 10)
    val pqModel = Pq.train(d, m = 4, ksub = 16, maxIter = 10)
    val pqCodes = Pq.encode(d, pqModel).cache()
    val ivfpq = IvfPq.build(d, nlist = 4, m = 4, ksub = 16, maxIter = 10)
    Seq(
      Eng("flat", exact = true,
        (qs, k, t, c) => FlatKnn.search(d, qs, k, Metric.L2, t, c)),
      Eng("hnsw", exact = true, // exhaustive beam at this scale
        (qs, k, t, c) => Hnsw.searchIndex(hnsw, qs, k, efSearch = 5000, t, c)),
      Eng("ivf", exact = true, // probe-all
        (qs, k, t, c) => Ivf.search(ivf, qs, k, nprobe = 4, Metric.L2, t, c)),
      Eng("pq", exact = false,
        (qs, k, t, c) => Pq.search(pqCodes, pqModel, qs, k, t, c)),
      Eng("ivfpq", exact = false, // probe-all still quantized
        (qs, k, t, c) => IvfPq.search(ivfpq, qs, k, nprobe = 4, t, c)))
  }

  private def rows(df: DataFrame): Seq[(Long, Long)] =
    df.select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  private val q0 = queries(q(0L, vecOf(7L)))

  test("threshold strictness (TestSearch*WithThreshold/" +
       "ThresholdStrictFiltering): every returned score <= t in the " +
       "engine's own score space; a below-minimum t returns empty; exact " +
       "engines equal flat row-for-row") {
    engines.foreach { e =>
      val all = e.search(q0, 0, None, None)
        .select("score").collect().map(_.getDouble(0)).sorted
      val t = all(all.length / 2) // median score as cutoff
      val got = e.search(q0, 0, Some(t), None)
      val scores = got.select("score").collect().map(_.getDouble(0))
      assert(scores.nonEmpty && scores.forall(_ <= t),
        s"${e.name}: score above threshold")
      assert(scores.length == all.count(_ <= t),
        s"${e.name}: threshold dropped/kept the wrong rows")
      // strict: a cutoff below the best score filters EVERYTHING
      assert(e.search(q0, 0, Some(all.head / 2 - 1e-6), None).count() == 0,
        s"${e.name}: below-minimum threshold not empty")
    }
    val flatT = rows(engines.head.search(q0, 5, Some(40.0), None))
    engines.filter(_.exact).foreach { e =>
      assert(rows(e.search(q0, 5, Some(40.0), None)) == flatT,
        s"${e.name}: thresholded top-k diverged from flat")
    }
  }

  test("threshold × document filter × k compose on EVERY index " +
       "(hnsw_index_search.go:322-329 — the reference applies the filter " +
       "and threshold inside one search): exact engines equal flat under " +
       "the full option product; quantized engines honor both constraints") {
    val s = spark
    import s.implicits._
    val cand = (0L until 40L by 3).toDF("id")
    val candSet = (0L until 40L by 3).toSet
    val want = rows(engines.head.search(q0, 6, Some(60.0), Some(cand)))
    assert(want.nonEmpty)
    engines.foreach { e =>
      val got = e.search(q0, 6, Some(60.0), Some(cand))
      got.collect().foreach { r =>
        assert(candSet(r.getAs[Long]("id")),
          s"${e.name}: filtered-out id surfaced")
        assert(r.getAs[Double]("score") <= 60.0,
          s"${e.name}: threshold violated under compose")
      }
      if (e.exact) assert(rows(got) == want,
        s"${e.name}: compose diverged from flat")
    }
  }

  test("batch queries are independent (TestSearch*BatchQueries/" +
       "MultipleQueries): a 3-query batch returns each query's " +
       "single-run rows exactly, k per qid") {
    val batch = queries(q(0L, vecOf(7L)), q(1L, vecOf(23L)), q(2L, vecOf(2L)))
    engines.foreach { e =>
      val got = rows(e.search(batch, 5, None, None))
      assert(got.groupBy(_._1).forall(_._2.size == 5),
        s"${e.name}: a batch query lost rows")
      (0L until 3L).foreach { qi =>
        val single = queries(q(qi, vecOf(Seq(7L, 23L, 2L)(qi.toInt))))
        assert(got.filter(_._1 == qi) == rows(e.search(single, 5, None, None)),
          s"${e.name}: batch result for qid=$qi != single-query run")
      }
    }
  }

  test("deleted rows never surface, on every index that mutates " +
       "(TestSearch*AfterDelete / ByDeletedNode): delete the exact " +
       "nearest neighbor, search k=corpus — it is gone, the rest intact") {
    val s = spark
    import s.implicits._
    val nearest = engines.head.search(q0, 1, None, None)
      .select("id").head().getLong(0)
    val d = data
    // flat: the 'index' IS the frame
    assert(!rows(FlatKnn.search(d.filter(col("id") =!= nearest), q0, 0,
      Metric.L2)).map(_._2).contains(nearest))
    // hnsw: soft delete AND hard flush both hide it
    val h = Hnsw.build(d.repartition(4))
    Seq(Hnsw.softDelete(h, Seq(nearest)),
        Hnsw.deleteFlush(h, Seq(nearest))).foreach { idx =>
      val got = rows(Hnsw.searchIndex(idx, q0, 0, efSearch = 5000))
      assert(!got.map(_._2).contains(nearest) && got.size == 39)
    }
    // ivf: delete-with-flush
    val ivfDel = Ivf.delete(Ivf.build(d, 4, 10), Seq(nearest))
    assert(!rows(Ivf.search(ivfDel, q0, 0, 4)).map(_._2).contains(nearest))
    // pq/ivfpq: codes filtered (the flushed state)
    val m = Pq.train(d, 4, 16, 10)
    val codesDel = Pq.encode(d, m).filter(col("id") =!= nearest)
    assert(!rows(Pq.search(codesDel, m, q0, 0)).map(_._2).contains(nearest))
  }

  test("node-based search: non-existent and deleted node ids resolve to " +
       "NO queries on every node-capable index (TestSearch*ByNonExistent/" +
       "ByDeletedNode), and a live node's search leads with itself") {
    val d = data
    val h = Hnsw.build(d.repartition(4))
    assert(Hnsw.searchByNodes(h, Seq(999L), 5).count() == 0)
    val hDel = Hnsw.softDelete(h, Seq(7L))
    assert(Hnsw.searchByNodes(hDel, Seq(7L), 5).count() == 0)
    val live = Hnsw.searchByNodes(h, Seq(7L), 5, efSearch = 5000)
    assert(live.orderBy(col("score")).select("id").head().getLong(0) == 7L)
    // flat twin
    assert(FlatKnn.searchByNodes(d, Seq(999L), 5).count() == 0)
    assert(FlatKnn.searchByNodes(d, Seq(7L), 5)
      .orderBy(col("score")).select("id").head().getLong(0) == 7L)
  }

  test("combined query + node multi-search (TestSearch*CombinedQueryAndNode" +
       "/MultipleQueriesAndNodes): the union of both result sets, each " +
       "under its own qid, equal to running them separately") {
    val d = data
    val h = Hnsw.build(d.repartition(4))
    val nodeQ = Hnsw.resolveVectors(h, Seq(3L, 11L))
    val exQ = queries(q(100L, vecOf(7L)))
    val both = exQ.unionByName(nodeQ)
    val got = rows(Hnsw.searchIndex(h, both, 4, efSearch = 5000))
    val sep = rows(Hnsw.searchIndex(h, exQ, 4, efSearch = 5000)) ++
      rows(Hnsw.searchIndex(h, nodeQ, 4, efSearch = 5000))
    assert(got.toSet == sep.toSet && got.size == 12,
      "combined run != separate runs")
  }

  test("high k with a narrow filter (TestSearch*WithHighK × document " +
       "filter): k far beyond the candidate count returns exactly the " +
       "candidates, ranked") {
    val s = spark
    import s.implicits._
    val cand = Seq(4L, 9L, 14L).toDF("id")
    engines.foreach { e =>
      val got = rows(e.search(q0, 1000, None, Some(cand)))
      assert(got.map(_._2).toSet == Set(4L, 9L, 14L),
        s"${e.name}: high-k filtered search wrong: $got")
    }
  }

  test("empty candidate set: zero results on every index, not an error") {
    val s = spark
    import s.implicits._
    val none = Seq.empty[Long].toDF("id")
    engines.foreach { e =>
      assert(e.search(q0, 5, None, Some(none)).count() == 0, e.name)
    }
  }

  test("k bounds table (TestPQIndexSearchKBounds :356-390 / WithHighK " +
       ":723): every k in {1,3,5,corpus} returns exactly k rows; " +
       "k beyond the corpus caps at the corpus size, never errors") {
    engines.foreach { e =>
      Seq(1, 3, 5, 40).foreach { k =>
        assert(e.search(q0, k, None, None).count() == k,
          s"${e.name}: k=$k returned the wrong row count")
      }
      assert(e.search(q0, 1000, None, None).count() == 40,
        s"${e.name}: k=1000 must cap at the 40-row corpus")
    }
  }

  test("nprobe is accepted and IGNORED by non-routed indexes " +
       "(TestPQIndexSearchWithNProbes :425-447 + the chaining row :611: " +
       "the fluent option is a no-op for PQ, never an error) while IVFPQ " +
       "genuinely narrows under it") {
    val s = spark
    import s.implicits._
    val d = data
    val pqModel = Pq.train(d, m = 4, ksub = 16, maxIter = 10)
    val pqCodes = Pq.encode(d, pqModel)
    // fluent PQ search with nprobe set: identical rows to one without
    def fluent(np: Option[Int]) = {
      val base = VectorSearch.onPq(pqCodes, pqModel, source = d)
        .withQuery(vecOf(7L)).withK(5)
      np.fold(base)(base.withNProbes).execute()
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    assert(fluent(Some(3)) == fluent(None),
      "nprobe changed a PQ search — it must be a no-op (the PQ scan " +
        "has no coarse lists to probe)")
    // IVFPQ: nprobe=1 restricts to the nearest list — a strict subset
    // relation against probe-all (what makes routing O(corpus/nlist))
    val ivfpq = IvfPq.build(d, nlist = 4, m = 4, ksub = 16, maxIter = 10)
    val all = IvfPq.search(ivfpq, q0, 0, nprobe = 4).count()
    val one = IvfPq.search(ivfpq, q0, 0, nprobe = 1).count()
    assert(one < all,
      s"nprobe=1 scanned as many rows ($one) as probe-all ($all) — " +
        "cluster restriction not engaging")
  }

  test("repeated searches are deterministic on every engine " +
       "(TestPQIndexSearchResultsConsistency :535 / IVFPQ :961 — the " +
       "reference only pins the id SET; our engines are fully " +
       "deterministic, so we pin (id, score) sequences)") {
    engines.foreach { e =>
      def run() = e.search(q0, 5, None, None)
        .orderBy(col("score"), col("id")).collect()
        .map(r => (r.getAs[Long]("id"),
          math.round(r.getAs[Double]("score") * 1e9))).toSeq
      assert(run() == run(), s"${e.name}: repeat search diverged")
    }
  }
}
