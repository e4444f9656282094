package graft

import graft.agg.ScoreAgg
import graft.vector._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-4 differential surface: multi-query search + score aggregation
  * over the QUANTIZED indexes (the reference runs its aggregation matrix
  * against every index type, aggregation.go:107-255 — round 3 covered
  * flat/BM25 only), and concurrent add/search semantics (the reference's
  * RWMutex discipline, hnsw_index.go:232-251; our analog is copy-on-write
  * snapshot isolation, which must hold under real thread interleaving).
  */
class BatchIndexSpec extends SparkSpec {

  private lazy val grid: DataFrame = {
    val s = spark
    import s.implicits._
    (0 until 500).map { i =>
      (i.toLong, Array.tabulate(10)(j => ((i * 10 + j) % 100).toFloat))
    }.toDF("id", "vector").cache()
  }

  private def queriesOf(qids: Long*): DataFrame =
    grid.filter(col("id").isin(qids: _*))
      .select(col("id").as("qid"), col("vector").as("qvec"))

  // --------------------------- multi-query batch + aggregation, PQ / IVFPQ

  test("pq multi-query batch: every query gets its own top-k (aggregation.go:107-255)") {
    val model = Pq.train(grid, m = 5, ksub = 64, maxIter = 5)
    val encoded = Pq.encode(grid, model)
    val res = Pq.search(encoded, model, queriesOf(7L, 123L), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byQ = res.groupBy(_._1)
    assert(byQ.keySet == Set(7L, 123L))
    byQ.foreach { case (qid, rows) =>
      assert(rows.length == 10, s"qid $qid")
      // per-query results sorted ascending by ADC distance
      val ds = rows.map(_._3).toSeq
      assert(ds == ds.sorted)
      // batch result == the single-query result for the same qid
      val solo = Pq.search(encoded, model, queriesOf(qid), 10)
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
      assert(rows.map(r => (r._2, r._3)).toSeq == solo)
    }
  }

  test("pq batch + ScoreAgg sum/max/mean dedups across queries like flat") {
    val model = Pq.train(grid, m = 5, ksub = 64, maxIter = 5)
    val encoded = Pq.encode(grid, model)
    val batch = Pq.search(encoded, model, queriesOf(7L, 9L), 10)
      .select(col("id"), col("score"))
    val agg = ScoreAgg.aggregate(batch, ScoreAgg.Sum, ascending = true)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // manual oracle: group the same rows in memory
    val manual = batch.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).map { case (id, rs) => (id, rs.map(_._2).sum) }
    assert(agg.toMap == manual)
    // ascending re-sort, id tie-break
    assert(agg.map(_._2).toSeq == agg.map(_._2).toSeq.sorted)
    // ids hit by BOTH queries aggregate both scores (dedup, not concat)
    assert(agg.length == manual.size)
  }

  test("ivfpq multi-query batch: per-query top-k, probe-all == pq on residual geometry") {
    val idx = IvfPq.build(grid, nlist = 4, m = 5, ksub = 32, maxIter = 10)
    val res = IvfPq.search(idx, queriesOf(7L, 123L), 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byQ = res.groupBy(_._1)
    assert(byQ.keySet == Set(7L, 123L))
    byQ.foreach { case (qid, rows) =>
      assert(rows.length == 10)
      val solo = IvfPq.search(idx, queriesOf(qid), 10, nprobe = 4)
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
      assert(rows.map(r => (r._2, r._3)).toSeq == solo, s"qid $qid")
    }
  }

  test("ivfpq batch + ScoreAgg max keeps the best (smallest) distance per id") {
    val idx = IvfPq.build(grid, nlist = 4, m = 5, ksub = 32, maxIter = 10)
    val batch = IvfPq.search(idx, queriesOf(7L, 9L), 10, nprobe = 4)
      .select(col("id"), col("score"))
    val agg = ScoreAgg.aggregate(batch, ScoreAgg.Max, ascending = true)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val manual = batch.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).map { case (id, rs) => (id, rs.map(_._2).max) }
    assert(agg == manual)
  }

  test("pq embedded serve: multi-query loop bit-identical to the distributed batch") {
    val model = Pq.train(grid, m = 5, ksub = 64, maxIter = 5)
    val encoded = Pq.encode(grid, model)
    val local = Pq.serve(encoded, model)
    val qids = Seq(7L, 123L, 400L)
    val dist = Pq.search(encoded, model, queriesOf(qids: _*), 10)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    qids.foreach { qid =>
      val qv = grid.filter(col("id") === qid).head().getSeq[Float](1).toArray
      assert(local.search(qv, 10) == dist(qid), s"qid $qid")
    }
  }

  // ------------------------------------------------ concurrent add/search

  test("hnsw: concurrent searches during add see consistent snapshots") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val all = (0 until 300).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat))
    }
    val idx = Hnsw.build(all.take(250).toDF("id", "vector").repartition(2))
    val qdf = Seq((0L, all(7)._2)).toDF("qid", "qvec")
    val before = Hnsw.searchIndex(idx, qdf, 10)
      .collect().map(_.getLong(1)).toSeq

    // writer thread grows the index while reader threads search the ORIGINAL
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    @volatile var grown: Hnsw.Index = null
    val writer = new Thread(() =>
      try grown = Hnsw.add(idx, all.drop(250).toDF("id", "vector"))
      catch { case t: Throwable => errors.add(t) })
    val readers = (1 to 3).map(_ => new Thread(() =>
      try results.add(Hnsw.searchIndex(idx, qdf, 10)
        .collect().map(_.getLong(1)).toSeq)
      catch { case t: Throwable => errors.add(t) }))
    (writer +: readers).foreach(_.start())
    (writer +: readers).foreach(_.join(120000))
    assert(errors.isEmpty, s"concurrent failure: ${errors.peek()}")
    // copy-on-write: every concurrent read of the ORIGINAL returns exactly
    // the pre-add result — no torn reads, no partially-added nodes
    results.forEach(r => assert(r == before))
    // and the writer's result covers the added ids
    val addedQ = Seq((0L, all(260)._2)).toDF("qid", "qvec")
    val afterAdd = Hnsw.searchIndex(grown, addedQ, 5, efSearch = 400)
      .collect().map(_.getLong(1)).toSeq
    assert(afterAdd.contains(260L))
  }

  test("ivf: add during search leaves the searched index untouched") {
    val idx = Ivf.build(grid.filter(col("id") < 400), nlist = 4, maxIter = 5)
    val q = queriesOf(7L)
    val before = Ivf.search(idx, q, 10, nprobe = 4)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val extra = grid.filter(col("id") >= 400)
    val grown = Ivf.add(idx, extra)
    // the original index plan still scans only the original rows
    val after = Ivf.search(idx, q, 10, nprobe = 4)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(after == before)
    assert(grown.assigned.count() == 500)
    // the grown index CAN surface the added rows (the grid fixture's
    // vectors repeat with period 10, so distance-0 ties resolve to low
    // ids — restrict candidates to the added range to observe them)
    val qFar = {
      val s = spark
      import s.implicits._
      Seq((0L, Array.tabulate(10)(j => ((400 * 10 + j) % 100).toFloat)))
        .toDF("qid", "qvec")
    }
    val hits = Ivf.search(grown, qFar, 5, nprobe = 4,
        candidates = Some(extra.select("id")))
      .collect().map(_.getLong(1)).toSet
    assert(hits.nonEmpty && hits.forall(_ >= 400L))
  }

  test("bm25 embedded serve: concurrent searches are thread-safe and identical") {
    val s = spark
    import s.implicits._
    val docs = (0 until 200).map(i =>
      (i.toLong, s"word${i % 17} word${i % 5} common text")).toDF("id", "text")
    val corpus = graft.text.BM25.build(docs)
    val local = graft.text.BM25.serve(corpus)
    val expect = local.search("word3 common", 10)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 4).map(_ => new Thread(() =>
      try (1 to 50).foreach { _ =>
        assert(local.search("word3 common", 10) == expect)
      } catch { case t: Throwable => errors.add(t) }))
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    assert(errors.isEmpty, s"concurrent bm25 failure: ${errors.peek()}")
  }
}
