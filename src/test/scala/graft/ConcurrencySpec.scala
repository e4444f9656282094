package graft

import graft.hybrid.Hybrid
import graft.store.HybridStore
import graft.text.BM25
import graft.vector.{FlatKnn, Hnsw, Metric, Pq}
import org.apache.spark.sql.functions._

/** Concurrent-read safety of the embedded serving structures — the Scala
  * analog of the reference's `-race` suite (Makefile:21-24 runs every test
  * under the race detector; e.g. hnsw_index_search_test.go:855-941 searches
  * one index from many goroutines). Serving objects are immutable after
  * collect, so N threads hammering the same instance must produce exactly
  * the single-threaded results — this spec pins that, and would catch any
  * future "cache a scratch buffer on the instance" optimization that
  * silently breaks shared-read safety. */
class ConcurrencySpec extends SparkSpec {

  private val nThreads = 8
  private val reps = 25

  /** Run `f(queryIndex)` from `nThreads` threads × `reps` passes each,
    * collecting one failure message per divergence. */
  private def hammer[R](nQueries: Int, expected: Int => R)(f: Int => R): Unit = {
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val want = IndexedSeq.tabulate(nQueries)(expected)
    val threads = (0 until nThreads).map { t =>
      new Thread(() => {
        var r = 0
        while (r < reps) {
          var qi = 0
          while (qi < nQueries) {
            val got = f(qi)
            if (got != want(qi))
              errors.add(s"thread $t rep $r query $qi: $got != ${want(qi)}")
            qi += 1
          }
          r += 1
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errors.isEmpty, s"${errors.size} divergences; first: ${errors.peek()}")
  }

  private lazy val corpus = {
    val s = spark
    spark.range(4000).select(col("id"), expr(
      "transform(sequence(0, 15), j -> cast(" +
        "sin(pmod(hash(id, j div 4), 16) * 131 + j * 7) * 50 " +
        "+ sin(id * 13 + j * 29) * 2 as float))").as("vector"))
      .repartition(4).cache()
  }
  private lazy val queryVecs: Array[Array[Float]] =
    corpus.filter(col("id") % 500 === 3).select("vector").collect()
      .map(_.getSeq[Float](0).toArray)

  test("flat embedded: 8 threads x 25 reps reproduce single-threaded top-10") {
    val serving = FlatKnn.serve(corpus)
    hammer(queryVecs.length, qi => serving.search(queryVecs(qi), 10))(
      qi => serving.search(queryVecs(qi), 10))
  }

  test("hnsw embedded: concurrent searches match, incl. nested shard parallelism") {
    val serving = Hnsw.serve(Hnsw.build(corpus.repartition(4)))
    hammer(queryVecs.length, qi => serving.search(queryVecs(qi), 10, 200))(
      qi => serving.search(queryVecs(qi), 10, 200))
  }

  test("pq embedded: concurrent ADC scans match") {
    val model = Pq.train(corpus, m = 4, ksub = 32, maxIter = 5)
    val serving = Pq.serve(Pq.encode(corpus, model), model)
    hammer(queryVecs.length, qi => serving.search(queryVecs(qi), 10))(
      qi => serving.search(queryVecs(qi), 10))
  }

  test("bm25 embedded: concurrent text scoring matches") {
    val s = spark
    import s.implicits._
    val docs = (0 until 500).map { i =>
      (i.toLong, s"term${i % 7} term${i % 13} shared word${i % 3} doc")
    }.toDF("id", "text")
    val serving = BM25.serve(BM25.build(docs, "id", "text"))
    val queries = Array("term1 shared", "term2 word0", "doc term12", "missing")
    hammer(queries.length, qi => serving.search(queries(qi), 10))(
      qi => serving.search(queries(qi), 10))
  }

  test("mutation is isolation, not interference: an index handle taken " +
       "BEFORE add/deleteFlush keeps serving its original row set while " +
       "the new handle serves the mutated one " +
       "(TestHNSWIndexSearchConcurrentWithModifications under the " +
       "copy-on-write model, hnsw_index_search_test.go:891-941)") {
    val s = spark
    import s.implicits._
    def vecOf(i: Long): Array[Float] =
      Array.tabulate(4)(j => (math.sin(i * 1.7 + j) * 6).toFloat)
    val data = (0L until 40L).map(i => (i, vecOf(i))).toDF("id", "vector")
    val q = Seq((0L, vecOf(5L))).toDF("qid", "qvec")
    val before = Hnsw.build(data.repartition(2))
    val baseline = Hnsw.searchIndex(before, q, 40, efSearch = 5000)
      .collect().map(_.getLong(1)).toSet
    assert(baseline == (0L until 40L).toSet)
    // mutate into NEW handles; the old one must be untouched
    val added = Hnsw.add(before,
      Seq((100L, vecOf(100L)), (101L, vecOf(101L))).toDF("id", "vector"))
    val deleted = Hnsw.deleteFlush(before, Seq(1L, 2L, 3L))
    val after = Hnsw.searchIndex(before, q, 40, efSearch = 5000)
      .collect().map(_.getLong(1)).toSet
    assert(after == baseline,
      "pre-mutation handle changed — copy-on-write isolation broken")
    assert(Hnsw.searchIndex(added, q, 50, efSearch = 5000)
      .collect().map(_.getLong(1)).toSet == baseline ++ Set(100L, 101L))
    assert(Hnsw.searchIndex(deleted, q, 40, efSearch = 5000)
      .collect().map(_.getLong(1)).toSet == baseline -- Set(1L, 2L, 3L))
    // embedded handles collected from each generation are independent too
    val sBefore = Hnsw.serve(before)
    val sDeleted = Hnsw.serve(deleted)
    assert(sBefore.search(vecOf(5L), 40).map(_._1).toSet == baseline)
    assert(sDeleted.search(vecOf(5L), 40).map(_._1).toSet ==
      baseline -- Set(1L, 2L, 3L))
  }

  test("append-fold race: a segment already covered by first-search " +
       "seeding is NOT double-counted when the writer's fold lands " +
       "(round-12 fix: HybridStore.append writes the segment OUTSIDE the " +
       "lock, so a concurrent first search can seed the derived logs in " +
       "between — the late fold must be a per-segment no-op, df/nDocs " +
       "exact)") {
    val s = spark
    import s.implicits._
    // --- text log: seed-by-reopen covers segs 0 and 1 (as the concurrent
    // search would, reading store.segments() after the segment write),
    // then the writer's fold for seg 1 arrives late
    val dir = java.nio.file.Files.createTempDirectory("foldrace").toString
    val seg0 = Seq((1L, "alpha shared probe"), (2L, "beta shared words"))
      .toDF("id", "text")
    val seg1 = Seq((3L, "gamma probe body"), (2L, "beta revised probe"))
      .toDF("id", "text")
    def segText(n: Long) = if (n == 0L) seg0 else seg1
    val markers = Some(Seq((2L, 0L)).toDF("id", "upto")) // id 2 replaced
    val log = graft.text.BM25Log.reopen(spark, dir, Seq(0L, 1L), segText,
      markers, graft.text.Tokenize.Simple)
    val nDocs = log.docCount
    def dfTable = log.corpus.termDf.collect()
      .map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toSeq
    def ranked = log.corpus.search("probe", 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val (dfBefore, rankedBefore) = (dfTable, ranked)
    log.append(seg1, 1L) // the late fold of the already-seeded segment
    assert(log.docCount == nDocs, "nDocs double-counted by the late fold")
    assert(log.pieceCount == 2, "duplicate postings piece appended")
    assert(dfTable == dfBefore, "df double-counted by the late fold")
    assert(ranked == rankedBefore, "scores drifted after the late fold")

    // --- vector log: same interleave through VecLog
    def vec(i: Long): Array[Float] =
      Array.tabulate(4)(j => (math.sin(i * 2.3 + j) * 4).toFloat)
    val vdir = java.nio.file.Files.createTempDirectory("foldracev").toString
    val vseg0 = Seq((1L, vec(1L)), (2L, vec(2L))).toDF("id", "vector")
    val vseg1 = Seq((3L, vec(3L)), (2L, vec(22L))).toDF("id", "vector")
    def segVec(n: Long) = if (n == 0L) vseg0 else vseg1
    val vlog = graft.vector.VecLog.reopen(spark, vdir, Seq(0L, 1L), segVec,
      Some(Seq((2L, 0L)).toDF("id", "upto")), vseg0, nlist = 2)
    val liveBefore = vlog.liveAssigned.collect()
      .map(r => (r.getLong(0), r.getInt(2))).sortBy(_._1).toSeq
    vlog.append(vseg1, 1L) // late fold
    assert(vlog.pieceCount == 2, "duplicate assigned piece appended")
    val liveAfter = vlog.liveAssigned.collect()
      .map(r => (r.getLong(0), r.getInt(2))).sortBy(_._1).toSeq
    assert(liveAfter == liveBefore,
      s"live assigned rows changed after the late fold: $liveAfter")

    // --- quantized log: same interleave through PqLog, in BOTH the
    // unrouted and coarse-routed shapes (the routed piece carries a
    // cluster column — a duplicate fold would double the probed lists)
    Seq(0, 3).foreach { nlist =>
      val pdir = java.nio.file.Files.createTempDirectory(s"foldracep$nlist")
        .toString
      val plog = graft.vector.PqLog.reopen(spark, pdir, Seq(0L, 1L), segVec,
        Some(Seq((2L, 0L)).toDF("id", "upto")), vseg0,
        m = 2, ksub = 4, maxIter = 3, nlist = nlist)
      val codesBefore = plog.liveCodes.collect()
        .map(r => (r.getLong(0), r.getSeq[Int](r.fieldIndex("codes"))))
        .sortBy(_._1).toSeq
      plog.append(vseg1, 1L) // late fold of the already-seeded segment
      assert(plog.pieceCount == 2,
        s"nlist=$nlist: duplicate coded piece appended")
      val codesAfter = plog.liveCodes.collect()
        .map(r => (r.getLong(0), r.getSeq[Int](r.fieldIndex("codes"))))
        .sortBy(_._1).toSeq
      assert(codesAfter == codesBefore,
        s"nlist=$nlist: live codes changed after the late fold")
      plog.release()
    }

    // --- graph log: HnswLog's `folded` set makes the late fold a no-op
    // (a re-applied COW insert would duplicate graph nodes)
    val hdir = java.nio.file.Files.createTempDirectory("foldraceh").toString
    // live view after the replace of id 2 (marker upto=0 masks seg-0's
    // row 2) — what the facade's seeding passes as `live`
    val hlive = vseg0.filter(col("id") =!= 2L).unionByName(vseg1)
    val hlog = graft.vector.HnswLog.reopen(spark, hdir, Seq(0L, 1L), segVec,
      deadIds = Seq.empty, live = hlive, nShards = 2)
    val q = Seq((0L, vec(7L))).toDF("qid", "qvec")
    def hranked = graft.vector.Hnsw.searchIndex(hlog.index, q, 10,
      efSearch = 5000).collect()
      .map(r => (r.getLong(1), math.round(r.getDouble(2) * 1e9))).toSeq
    val hBefore = hranked
    hlog.append(vseg1, 1L) // late fold
    assert(hranked == hBefore,
      "graph results changed after the late fold — duplicate COW insert")
    hlog.release()
  }

  // ---- round-17 rows: the lifecycle read/write-lock protocol ----

  private def vecOfL(i: Long): Array[Float] = ConcurrencySpec.vec(i)

  private def await(t: Thread, ms: Long = 30000): Unit = {
    t.join(ms)
    assert(!t.isAlive, "worker thread did not finish in time")
  }

  test("a search completes WHILE a slow append is in flight (reads are " +
       "not serialized behind the mutation's Spark job), and close() " +
       "waits for the append before releasing the store") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("concread").toString
    val cfg = Hybrid.Config(k = 1000, fusion = Hybrid.Rrf)
    val hs = new HybridStore(spark, root, cfg)
    hs.append((0L until 8L).map(id => (id, vecOfL(id))).toDF("id", "vector"))
    // build the generation BEFORE the slow append: the concurrent search
    // must serve it without touching the mutation mutex
    assert(hs.search(queryVec = Some(Seq((0L, vecOfL(3L))).toDF("qid", "qvec")))
      .count() > 0)

    ConcurrencySpec.gate = new java.util.concurrent.CountDownLatch(1)
    ConcurrencySpec.entered = new java.util.concurrent.CountDownLatch(1)
    // an append whose plan blocks inside its task until the gate opens
    val slowDocs = spark.range(100L, 104L).repartition(1)
      .select(col("id"), col("id").cast("int").as("k"))
      .as[(Long, Int)]
      .map { case (id, _) =>
        ConcurrencySpec.entered.countDown()
        ConcurrencySpec.gate.await()
        (id, ConcurrencySpec.vec(id))
      }.toDF("id", "vector")
    @volatile var appendDone = false
    @volatile var appendErr: Option[Throwable] = None
    val appender = new Thread(() => {
      try { hs.append(slowDocs); appendDone = true }
      catch { case t: Throwable => appendErr = Some(t) }
    })
    appender.start()
    assert(ConcurrencySpec.entered.await(30,
      java.util.concurrent.TimeUnit.SECONDS),
      s"append task never started (done=$appendDone err=$appendErr)")
    try {
      // the append is now provably mid-Spark-job and holding the
      // mutation mutex; a search must still complete (it reads the
      // already-built generation under the lifecycle READ lock only)
      val got = hs.search(
        queryVec = Some(Seq((0L, vecOfL(3L))).toDF("qid", "qvec")))
        .collect().map(_.getLong(0)).toSet
      assert(got == (0L until 8L).toSet,
        s"concurrent search served the wrong generation: $got")
      assert(!appendDone && appendErr.isEmpty,
        "the gated append finished early — the overlap was not exercised")

      // close() from another thread must WAIT for the in-flight append
      // (write lock) — never interleave with it around the LOCK release
      @volatile var closeDone = false
      val closer = new Thread(() => { hs.close(); closeDone = true })
      closer.start()
      // the closer must be parked on the write lock while the append runs
      Thread.sleep(300)
      assert(!closeDone, "close() completed while an append was in flight")
      ConcurrencySpec.gate.countDown()
      await(appender)
      assert(appendErr.isEmpty, s"append failed: $appendErr")
      assert(appendDone, "append did not complete after the gate opened")
      await(closer)
      assert(closeDone, "close() never completed after the append drained")
    } finally ConcurrencySpec.gate.countDown() // idempotent safety
    // the store is closed; everything throws per the use-after-close rule
    intercept[IllegalStateException](hs.read())
    intercept[IllegalStateException](
      hs.append(Seq((200L, vecOfL(200L))).toDF("id", "vector")))
    // the append that ran BEFORE the close is durable: a reopen serves it
    val hs2 = new HybridStore(spark, root, cfg)
    assert(hs2.read().count() == 12L,
      "the append that close() waited for did not land")
    hs2.close()
  }

  // ---- round-18 row: the compaction generation fence ----

  test("generation fence: a search frame planned BEFORE a compaction " +
       "still collects AFTER it (sources retired behind an atomic " +
       "manifest, not deleted), and the NEXT compaction vacuums them — " +
       "the one-cycle retention window") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("genfence").toString
    val cfg = Hybrid.Config(k = 1000, fusion = Hybrid.Rrf)
    val hs = new HybridStore(spark, root, cfg)
    hs.append((0L until 6L).map(id => (id, vecOfL(id))).toDF("id", "vector"))
    hs.append((6L until 12L).map(id => (id, vecOfL(id))).toDF("id", "vector"))
    hs.delete(Seq(3L))
    val expected = (0L until 12L).toSet - 3L
    // plan the frames but do NOT collect yet — the plans capture the
    // pre-compaction segment files and the tombstone markers. Two
    // separate plans: re-collecting a single frame would reuse its own
    // shuffle outputs and never re-open the vacuumed parquet, hiding
    // the retention expiry the second half of this test pins
    val oldGen = hs.search(
      queryVec = Some(Seq((0L, vecOfL(4L))).toDF("qid", "qvec")))
    val oldGen2 = hs.search(
      queryVec = Some(Seq((0L, vecOfL(4L))).toDF("qid", "qvec")))
    hs.compact()
    // the sources are retired, not deleted: the old-generation frame
    // collects correctly across the compaction (at 100 TB a compaction
    // is always running somewhere — reads must survive one)
    val got = oldGen.collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"old-generation frame served wrong rows across a compaction: $got")
    // the retirement manifest is on disk; retired dirs still present
    val rootFiles = new java.io.File(root).list().toSet
    assert(rootFiles.exists(_.startsWith("retired=")),
      s"no retirement manifest after compact: $rootFiles")
    assert(rootFiles.contains("seg=0"),
      "retired source dir was deleted at compact time")
    // new reads see only the compacted generation
    assert(hs.read().count() == 11L)
    // the NEXT compaction vacuums what the previous one retired: the
    // old frame is now out of retention
    hs.append(Seq((100L, vecOfL(100L))).toDF("id", "vector"))
    hs.compact()
    val afterVacuum = new java.io.File(root).list().toSet
    assert(!afterVacuum.contains("seg=0"),
      "one-cycle retention: the second compaction must vacuum the first's retirees")
    intercept[Throwable](oldGen2.collect())
    // and the store keeps serving the current generation
    assert(hs.read().count() == 12L)
    hs.close()
    // close() vacuums everything: no retired bytes left behind
    val afterClose = new java.io.File(root).list().toSet
    assert(!afterClose.exists(_.startsWith("retired=")),
      s"close() left retirement manifests behind: $afterClose")
  }

  test("close() releases EVERY leg even when an earlier release throws " +
       "(ADVICE r16 #3): runAllSteps runs all steps, rethrows the FIRST " +
       "failure, attaches the rest as suppressed") {
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    val boom = new RuntimeException("text release failed")
    val boom2 = new IllegalStateException("vec release failed")
    val thrown = intercept[RuntimeException] {
      HybridStore.runAllSteps(Seq(
        "a" -> (() => { ran += "a" }),
        "text" -> (() => { ran += "text"; throw boom }),
        "vec" -> (() => { ran += "vec"; throw boom2 }),
        "lock" -> (() => { ran += "lock" })))
    }
    assert(ran == Seq("a", "text", "vec", "lock"),
      s"a throwing step skipped later steps: $ran")
    assert(thrown eq boom, "the FIRST failure must be the one rethrown")
    val sup = thrown.getSuppressed.toSeq
    assert(sup.exists(_.getMessage.contains("close step 'text'")),
      s"the failing step must be NAMED on its own error: $sup")
    assert(sup.contains(boom2),
      "later failures must ride as suppressed, not vanish")
    assert(boom2.getSuppressed.exists(
      _.getMessage.contains("close step 'vec'")),
      "every failure carries its own step marker")
    // the no-failure path is a plain pass-through
    HybridStore.runAllSteps(Seq("ok" -> (() => ())))
  }
}

object ConcurrencySpec {
  // latches the gated-append tasks block on; static so local-mode executor
  // threads (same JVM) see them
  @volatile var gate: java.util.concurrent.CountDownLatch = _
  @volatile var entered: java.util.concurrent.CountDownLatch = _

  def vec(i: Long): Array[Float] =
    Array.tabulate(4)(j => (math.sin(i * 1.7 + j * 0.9) * 3).toFloat)
}
