package graft

import graft.vector._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-3 differential surface: document pre-filters + distance
  * thresholds on EVERY index type (the reference exercises one
  * `*_document_filter_test.go` per index — ivf_index_search.go:287-290,
  * pq_index_search.go:283-286, ivfpq_index_search.go:305-308,
  * hnsw_index_search.go:322-325), HNSW delete/flush
  * (hnsw_index.go:348-431), and the degenerate shapes the reference
  * enumerates per index (empty index, k>n).
  */
class FilteredIndexSpec extends SparkSpec {

  private lazy val grid: DataFrame = {
    val s = spark
    import s.implicits._
    (0 until 500).map { i =>
      (i.toLong, Array.tabulate(10)(j => ((i * 10 + j) % 100).toFloat))
    }.toDF("id", "vector").cache()
  }

  private def queryOf(id: Long): DataFrame =
    grid.filter(col("id") === id)
      .select(col("id").as("qid"), col("vector").as("qvec"))

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).toSeq

  private lazy val evenIds: DataFrame = {
    val s = spark
    import s.implicits._
    (0L until 500L).filter(_ % 2 == 0).toDF("id")
  }

  private lazy val flatFilteredTop10: Seq[Long] =
    ids(FlatKnn.search(grid, queryOf(7), 10, Metric.L2,
      candidates = Some(evenIds)))

  // ---------------------------------------------------------- IVF

  test("ivf/pq/ivfpq delete: removed ids never surface, absent-id delete " +
       "is harmless, survivors re-rank like a fresh index " +
       "(ivf_index_test.go:227-379, pq_index_test.go:350-454, " +
       "ivfpq_index_test.go:329-441)") {
    val q = queryOf(7)
    // IVF: delete the query's own best hits; survivors == fresh build over
    // the remaining rows under probe-all
    val ivf = Ivf.build(grid, nlist = 4, maxIter = 5)
    val top3 = ids(Ivf.search(ivf, q, 3, nprobe = 4))
    val ivfDel = Ivf.delete(ivf, top3)
    val after = ids(Ivf.search(ivfDel, q, 10, nprobe = 4))
    assert(after.toSet.intersect(top3.toSet).isEmpty)
    // probe-all IVF is exhaustive -> survivors rank exactly like a flat
    // scan over the remaining rows
    assert(after == ids(FlatKnn.search(
      grid.filter(!col("id").isin(top3: _*)), q, 10, Metric.L2)))
    // absent id: harmless, index unchanged
    assert(ids(Ivf.search(Ivf.delete(ivf, Seq(99999L)), q, 10, nprobe = 4))
      == ids(Ivf.search(ivf, q, 10, nprobe = 4)))
    // PQ: deleted ids vanish from the ADC scan
    val model = Pq.train(grid, m = 2, ksub = 16, maxIter = 5)
    val enc = Pq.encode(grid, model)
    val pqTop = ids(Pq.search(enc, model, q, 5))
    val encDel = Pq.delete(enc, pqTop.take(2))
    val pqAfter = ids(Pq.search(encDel, model, q, 10))
    assert(pqAfter.toSet.intersect(pqTop.take(2).toSet).isEmpty)
    assert(ids(Pq.search(Pq.delete(encDel, Seq(99999L)), model, q, 10))
      == pqAfter)
    // IVFPQ: same contract through the index wrapper
    val ivfpq = IvfPq.build(grid, nlist = 4, m = 2, ksub = 16, maxIter = 5)
    val ipTop = ids(IvfPq.search(ivfpq, q, 3, nprobe = 4))
    val ipAfter = ids(IvfPq.search(IvfPq.delete(ivfpq, ipTop), q, 10,
      nprobe = 4))
    assert(ipAfter.nonEmpty &&
      ipAfter.toSet.intersect(ipTop.toSet).isEmpty)
  }

  test("ivf prefilter, probe-all: exactly the flat filtered result") {
    val idx = Ivf.build(grid, nlist = 8, maxIter = 10)
    val got = ids(Ivf.search(idx, queryOf(7), 10, nprobe = 8,
      candidates = Some(evenIds)))
    assert(got == flatFilteredTop10)
    assert(got.forall(_ % 2 == 0))
  }

  test("ivf threshold: every score <= t, equals flat thresholded") {
    val idx = Ivf.build(grid, nlist = 8, maxIter = 10)
    val got = Ivf.search(idx, queryOf(7), 0, nprobe = 8,
      threshold = Some(40.0)).collect()
    assert(got.nonEmpty && got.forall(_.getDouble(2) <= 40.0))
    val flat = FlatKnn.search(grid, queryOf(7), 0, Metric.L2,
      threshold = Some(40.0)).collect()
    assert(got.map(r => (r.getLong(1), r.getDouble(2))).toSeq ==
      flat.map(r => (r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("ivf prefilter + threshold compose") {
    val idx = Ivf.build(grid, nlist = 8, maxIter = 10)
    val got = Ivf.search(idx, queryOf(7), 0, nprobe = 8,
      threshold = Some(40.0), candidates = Some(evenIds)).collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r.getLong(1) % 2 == 0 && r.getDouble(2) <= 40.0))
  }

  // ----------------------------------------------------------- PQ

  test("pq prefilter: results drawn only from candidates (pq_index_search.go:283-286)") {
    val model = Pq.train(grid, m = 5, ksub = 64, maxIter = 5)
    val encoded = Pq.encode(grid, model)
    val got = ids(Pq.search(encoded, model, queryOf(7), 10,
      candidates = Some(evenIds)))
    assert(got.size == 10 && got.forall(_ % 2 == 0))
  }

  test("pq threshold: ADC distances capped") {
    val model = Pq.train(grid, m = 5, ksub = 64, maxIter = 5)
    val encoded = Pq.encode(grid, model)
    val got = Pq.search(encoded, model, queryOf(7), 0,
      threshold = Some(40.0)).collect()
    assert(got.nonEmpty && got.forall(_.getDouble(2) <= 40.0))
  }

  test("flat threshold + prefilter compose (flat_index_search.go WithScore" +
       "ThresholdAndDocumentIDs shape)") {
    // the grid has 50-way exact ties (vector classes repeat mod 10, and
    // class 7 is all-odd ids), so the cutoff must reach past the zero tie
    // block to include even-id classes
    val all = FlatKnn.search(grid, queryOf(7), 500, Metric.L2)
      .select("id", "score").collect().map(r => r.getLong(0) -> r.getDouble(1))
    val t = all.map(_._2).sorted.apply(100)
    val got = FlatKnn.search(grid, queryOf(7), 500, Metric.L2,
      threshold = Some(t), candidates = Some(evenIds))
      .select("id", "score").collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.nonEmpty)
    assert(got.forall { case (id, s) => id % 2 == 0 && s <= t })
    // equals the brute-force intersection of the two constraints
    assert(got.toMap == all.filter { case (id, s) => id % 2 == 0 && s <= t }.toMap)
  }

  test("pq threshold + prefilter compose (pq_index_search.go:283-297)") {
    val model = Pq.train(grid, m = 5, ksub = 32, maxIter = 10)
    val encoded = Pq.encode(grid, model)
    val all = Pq.search(encoded, model, queryOf(7), 500)
      .select("id", "score").collect().map(r => r.getLong(0) -> r.getDouble(1))
    val t = all.map(_._2).sorted.apply(100)
    val got = Pq.search(encoded, model, queryOf(7), 500, threshold = Some(t),
      candidates = Some(evenIds))
      .select("id", "score").collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.nonEmpty)
    assert(got.forall { case (id, s) => id % 2 == 0 && s <= t })
    assert(got.toMap == all.filter { case (id, s) => id % 2 == 0 && s <= t }.toMap)
  }

  test("ivfpq prefilter: results drawn only from candidates (ivfpq_index_search.go:305-308)") {
    val idx = IvfPq.build(grid, nlist = 4, m = 5, ksub = 32, maxIter = 10)
    val got = ids(IvfPq.search(idx, queryOf(7), 10, nprobe = 4,
      candidates = Some(evenIds)))
    assert(got.size == 10 && got.forall(_ % 2 == 0))
  }

  test("ivfpq threshold: every ADC distance capped (ivfpq_index_search.go:312-315)") {
    val idx = IvfPq.build(grid, nlist = 4, m = 5, ksub = 32, maxIter = 10)
    val unthresholded = IvfPq.search(idx, queryOf(7), 50, nprobe = 4)
      .select("id", "score").collect().map(r => r.getLong(0) -> r.getDouble(1))
    val t = unthresholded.map(_._2).sorted.apply(unthresholded.length / 2)
    val got = IvfPq.search(idx, queryOf(7), 50, nprobe = 4,
      threshold = Some(t)).select("id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.nonEmpty && got.forall(_._2 <= t))
    // exactly the unthresholded survivors — the cutoff filters, never rescores
    assert(got.toMap == unthresholded.filter(_._2 <= t).toMap)
  }

  // --------------------------------------------------------- HNSW

  test("hnsw prefilter: results within candidates, high recall vs flat filtered") {
    // gaussian fixture: the grid's ~50 exact-duplicate ties make recall
    // comparison meaningless (shards break ties arbitrarily, flat by id)
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val rand = (0 until 500).map { i =>
      (i.toLong, Array.fill(32)(rnd.nextGaussian().toFloat))
    }.toDF("id", "vector").cache()
    val q = rand.filter(col("id") === 7)
      .select(col("id").as("qid"), col("vector").as("qvec"))
    val flatFiltered = ids(FlatKnn.search(rand, q, 10, Metric.L2,
      candidates = Some(evenIds)))
    val idx = Hnsw.build(rand.repartition(4))
    val got = ids(Hnsw.searchIndex(idx, q, 10, efSearch = 400,
      candidates = Some(evenIds)))
    assert(got.forall(_ % 2 == 0))
    assert((got.toSet & flatFiltered.toSet).size >= 8)
  }

  test("hnsw threshold caps distances (hnsw_index_search.go:327-329)") {
    val idx = Hnsw.build(grid.repartition(4))
    val got = Hnsw.searchIndex(idx, queryOf(7), 10, threshold = Some(40.0))
      .collect()
    assert(got.nonEmpty && got.forall(_.getDouble(2) <= 40.0))
  }

  test("hnsw soft delete: node keeps routing but never surfaces") {
    val g = new Hnsw.LocalGraph(8, 100)
    (0 until 100).foreach(i => g.add(i.toLong, Array(i.toFloat, 0f)))
    val before = g.search(Array(7f, 0f), 5, 100).map(_._1)
    assert(before.head == 7L)
    assert(g.delete(7L))
    assert(!g.delete(7L))   // double delete is a no-op
    assert(!g.delete(999L)) // absent id
    val after = g.search(Array(7f, 0f), 5, 100).map(_._1)
    assert(!after.contains(7L))
    assert(after.size == 5) // k still filled from live nodes
    assert(g.liveSize == 99)
  }

  test("hnsw flushCopy: hard purge drops nodes + edges, original intact") {
    val g = new Hnsw.LocalGraph(8, 100)
    (0 until 100).foreach(i => g.add(i.toLong, Array(i.toFloat, 0f)))
    g.delete(7L)
    val flushed = g.flushCopy(Set(8L, 9L))
    assert(flushed.size == 97 && flushed.liveSize == 97)
    val res = flushed.search(Array(7f, 0f), 5, 100).map(_._1)
    assert(!res.contains(7L) && !res.contains(8L) && !res.contains(9L))
    assert(res.size == 5)
    // the source graph still holds all nodes (soft-deleted 7 aside)
    assert(g.size == 100 && g.liveSize == 99)
  }

  test("hnsw flush repairs connectivity: node survives losing its whole neighborhood") {
    // 1-D line graph: node x=50's graph neighbors are its numeric
    // neighbors; delete every node within distance 5 so all of x's
    // original links die — triangle repair + back-links must keep x
    // reachable from the rest of the graph
    val g = new Hnsw.LocalGraph(4, 50)
    (0 until 100).foreach(i => g.add(i.toLong, Array(i.toFloat, 0f)))
    val victims = (45 to 55).filter(_ != 50).map(_.toLong).toSet
    val flushed = g.flushCopy(victims)
    assert(flushed.size == 90)
    val res = flushed.search(Array(50f, 0f), 3, 100).map(_._1)
    assert(res.head == 50L, s"node 50 must stay reachable, got $res")
    assert(victims.forall(v => !res.contains(v)))
  }

  test("hnsw incremental add: new vectors searchable, original index intact (hnsw_index.go:232-251)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val all = (0 until 400).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat))
    }
    val first = all.take(300).toDF("id", "vector").repartition(4)
    val rest = all.drop(300).toDF("id", "vector")
    val idx = Hnsw.build(first)
    val grown = Hnsw.add(idx, rest)
    val q = all(350) // a newly-added vector
    val qdf = Seq((q._1, q._2)).toDF("qid", "qvec")
    val res = ids(Hnsw.searchIndex(grown, qdf, 5, efSearch = 400))
    assert(res.head == 350L) // the added vector finds itself
    // the ORIGINAL index is untouched (copy-on-write)
    assert(!ids(Hnsw.searchIndex(idx, qdf, 5, efSearch = 400)).contains(350L))
    // grown index covers the union with solid recall vs exact flat
    val union = all.toDF("id", "vector")
    val flat = ids(FlatKnn.search(union, qdf, 5, Metric.L2))
    assert((res.toSet & flat.toSet).size >= 4)
  }

  test("hnsw deleteFlush on the distributed index (hnsw_index.go:348-431)") {
    val idx = Hnsw.build(grid.repartition(4))
    val baseTop = ids(Hnsw.searchIndex(idx, queryOf(7), 10))
    val victims = baseTop.take(3)
    val pruned = Hnsw.deleteFlush(idx, victims)
    val after = ids(Hnsw.searchIndex(pruned, queryOf(7), 10))
    assert(victims.forall(v => !after.contains(v)))
    assert(after.size == 10)
    // immutable-index discipline: the ORIGINAL still returns the victims
    assert(ids(Hnsw.searchIndex(idx, queryOf(7), 10)) == baseTop)
  }

  test("flat embedded serving == distributed search") {
    val serving = FlatKnn.serve(grid)
    assert(serving.size == 500)
    val q7 = grid.filter(col("id") === 7).head().getSeq[Float](1).toArray
    val local = serving.search(q7, 10)
    val dist = FlatKnn.search(grid, queryOf(7), 10, Metric.L2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(local == dist)
  }

  test("hnsw embedded serving == distributed searchIndex") {
    val idx = Hnsw.build(grid.repartition(4))
    val serving = Hnsw.serve(idx)
    assert(serving.size == 500)
    val q7 = grid.filter(col("id") === 7).head().getSeq[Float](1).toArray
    val local = serving.search(q7, 10).map { case (id, d) => (id, d) }
    val dist = Hnsw.searchIndex(idx, queryOf(7), 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(local == dist)
    // filtered serving matches the in-beam candidate semantics
    val even = (0L until 500L by 2).toSet
    val fl = serving.search(q7, 10, 400, even.contains _)
    assert(fl.forall { case (id, _) => id % 2 == 0 })
  }

  test("hnsw searchByNodes: each node is its own nearest neighbor") {
    val idx = Hnsw.build(grid.repartition(4))
    val res = Hnsw.searchByNodes(idx, Seq(7L, 13L), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byQ = res.groupBy(_._1)
    assert(byQ.keySet == Set(7L, 13L))
    byQ.foreach { case (q, rows) =>
      // the grid fixture has exact-duplicate vectors (period 10 in i), so
      // "self is nearest" is a distance-0 TIE broken by id — assert the
      // node itself is among the distance-0 results and tops are exact
      assert(rows.head._3 == 0.0)
      assert(rows.exists(r => r._2 == q && r._3 == 0.0))
    }
  }

  // --------------------------------------- degenerate shapes per index

  test("empty index: flat and hnsw return empty, not error") {
    val empty = grid.filter(col("id") < 0)
    assert(FlatKnn.search(empty, queryOf(7), 10, Metric.L2).count() == 0)
    val idx = Hnsw.build(empty.repartition(2))
    assert(Hnsw.searchIndex(idx, queryOf(7), 10).count() == 0)
  }

  test("k > n returns all n (limiter.go:12-17 shape on every index)") {
    val tiny = grid.filter(col("id") < 5).cache()
    assert(FlatKnn.search(tiny, queryOf(3), 100, Metric.L2).count() == 5)
    val ivf = Ivf.build(tiny, nlist = 2, maxIter = 5)
    assert(Ivf.search(ivf, queryOf(3), 100, nprobe = 2).count() == 5)
    val hnsw = Hnsw.build(tiny.repartition(2))
    assert(Hnsw.searchIndex(hnsw, queryOf(3), 100).count() == 5)
  }

  test("prefilter with empty candidate set: empty result everywhere") {
    val none = evenIds.filter(col("id") < 0)
    assert(FlatKnn.search(grid, queryOf(7), 10, Metric.L2,
      candidates = Some(none)).count() == 0)
    val ivf = Ivf.build(grid, nlist = 4, maxIter = 5)
    assert(Ivf.search(ivf, queryOf(7), 10, nprobe = 4,
      candidates = Some(none)).count() == 0)
    val hnsw = Hnsw.build(grid.repartition(4))
    assert(Hnsw.searchIndex(hnsw, queryOf(7), 10,
      candidates = Some(none)).count() == 0)
  }

  test("validation errors: pq dim divisibility, serving dim mismatch, empty store") {
    // pq train rejects dim not divisible by m (pq_index.go:193-199)
    val e1 = intercept[IllegalArgumentException] {
      Pq.train(grid, m = 3, ksub = 8, maxIter = 2) // dim 10 % 3 != 0
    }
    assert(e1.getMessage.contains("not divisible"))
    // embedded flat serving rejects a mismatched query dim
    val serving = FlatKnn.serve(grid.limit(50))
    val e2 = intercept[IllegalArgumentException] {
      serving.search(Array(1f, 2f), 5) // index dim is 10
    }
    assert(e2.getMessage.contains("dim"))
    // reading an empty segment store fails fast, not with a confusing scan
    val store = new graft.store.SegmentStore(spark,
      java.nio.file.Files.createTempDirectory("empty-store").toString)
    val e3 = intercept[IllegalArgumentException] { store.read() }
    assert(e3.getMessage.contains("no segments"))
  }

  test("hnsw delete x prefilter compose: a deleted id INSIDE the candidate " +
       "set stays excluded (deleted wins, hnsw_index_search.go:355-363)") {
    val s = spark
    import s.implicits._
    val idx = Hnsw.build(grid.repartition(1))
    val shrunk = Hnsw.deleteFlush(idx, Seq(8L, 10L)) // even ids: in candidates
    val got = ids(Hnsw.searchIndex(shrunk, queryOf(7), 10, efSearch = 600,
      candidates = Some(evenIds)))
    assert(got.size == 10 && got.forall(_ % 2 == 0))
    assert(!got.contains(8L) && !got.contains(10L))
  }

  test("bm25 delete then re-add: the doc scores again with its NEW text " +
       "(bm25_index.go remove-then-Add lifecycle)") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "spark join"), (2L, "spark filter"), (3L, "scan"))
      .toDF("id", "text")
    val c0 = graft.text.BM25.build(docs)
    val deleted = graft.text.BM25.delete(c0, Seq(2L).toDF("id"))
    assert(deleted.search("spark", 10).collect().map(_.getLong(0)).toSet == Set(1L))
    val readded = graft.text.BM25.add(deleted,
      Seq((2L, "spark spark table")).toDF("id", "text"))
    val hits = readded.search("spark", 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(hits.keySet == Set(1L, 2L))
    // the re-added doc carries its new tf, and stats reflect 3 live docs:
    // equal to a FRESH build over the final corpus
    val fresh = graft.text.BM25.build(Seq((1L, "spark join"),
      (3L, "scan"), (2L, "spark spark table")).toDF("id", "text"))
    val freshHits = fresh.search("spark", 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(hits == freshHits)
  }

  test("hnsw add-then-delete composition: added node removable, survivors searchable") {
    val tiny = grid.filter(col("id") < 60).repartition(2)
    val idx = Hnsw.build(tiny)
    val s = spark
    import s.implicits._
    val extra = Seq((1000L, Array.tabulate(10)(j => (j + 500).toFloat)))
      .toDF("id", "vector")
    val grown = Hnsw.add(idx, extra)
    val q = Seq((0L, Array.tabulate(10)(j => (j + 500).toFloat)))
      .toDF("qid", "qvec")
    assert(ids(Hnsw.searchIndex(grown, q, 1)) == Seq(1000L))
    val pruned = Hnsw.deleteFlush(grown, Seq(1000L))
    val after = ids(Hnsw.searchIndex(pruned, q, 5))
    assert(!after.contains(1000L) && after.size == 5)
  }

  // ------------------------------------------------- persistence

  test("pq persistence: loaded model reproduces ADC search bit-identically") {
    val model = Pq.train(grid, m = 5, ksub = 64, maxIter = 5)
    val encoded = Pq.encode(grid, model)
    val path = java.nio.file.Files.createTempDirectory("pq-persist").toString
    Pq.write(model, encoded, path)
    val (m2, enc2) = Pq.read(spark, path)
    assert(m2.m == model.m && m2.ksub == model.ksub && m2.dsub == model.dsub)
    assert(m2.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val before = Pq.search(encoded, model, queryOf(7), 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val after = Pq.search(enc2, m2, queryOf(7), 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(after == before)
  }

  test("ivfpq persistence: loaded quadruple reproduces search bit-identically") {
    val idx = IvfPq.build(grid, nlist = 4, m = 5, ksub = 32, maxIter = 10)
    val path = java.nio.file.Files.createTempDirectory("ivfpq-persist").toString
    IvfPq.write(idx, path)
    val loaded = IvfPq.read(spark, path)
    assert(loaded.coarse.centroids.map(_.toSeq).toSeq ==
      idx.coarse.centroids.map(_.toSeq).toSeq)
    val before = IvfPq.search(idx, queryOf(7), 10, nprobe = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val after = IvfPq.search(loaded, queryOf(7), 10, nprobe = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(after == before)
  }

  test("ivf searchByNodes: node is its own nearest under probe-all") {
    val idx = Ivf.build(grid, nlist = 8, maxIter = 10)
    val res = Ivf.searchByNodes(idx, Seq(7L), 5, nprobe = 8).collect()
    assert(res.head.getLong(0) == 7L) // qid = the node
    assert(res.head.getLong(1) == 7L && res.head.getDouble(2) == 0.0)
  }

  test("bm25 persistence: loaded corpus scores identically (bm25_index.go:467-623)") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "spark joins tables fast"), (1L, "ducks swim in the pond"),
      (2L, "spark streams join windows"), (3L, "")).toDF("id", "text")
    val corpus = graft.text.BM25.build(docs)
    val path = java.nio.file.Files.createTempDirectory("bm25-persist").toString
    graft.text.BM25.write(corpus, path)
    val loaded = graft.text.BM25.read(spark, path)
    def run(c: graft.text.BM25Corpus) =
      c.search("spark join", 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(run(loaded) == run(corpus))
    // the empty doc survives the round trip in docLens (delete correctness)
    assert(loaded.docLens.count() == 4)
  }
}
