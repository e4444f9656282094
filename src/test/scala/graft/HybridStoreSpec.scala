package graft

import graft.filter.{Filter, FilterGroup}
import graft.hybrid.Hybrid
import graft.store.HybridStore
import graft.text.BM25
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persistent hybrid store facade: one object owning segments +
  * derived search state (storage.go:120-629, docs/PERSISTENCE.md API). */
class HybridStoreSpec extends SparkSpec {

  private def doc(id: Long, v: Array[Float], t: String, cat: String) =
    (id, v, t, cat)

  private def batch(rows: (Long, Array[Float], String, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("id", "vector", "text", "category")
  }

  private def q(v: Array[Float]): DataFrame = {
    val s = spark
    import s.implicits._
    Seq((0L, v)).toDF("qid", "qvec")
  }

  private def fresh(autoCompactAt: Int = 0, autoCompactBytes: Long = 0L) =
    new HybridStore(spark,
      java.nio.file.Files.createTempDirectory("hybstore").toString,
      Hybrid.Config(k = 4, fusion = Hybrid.Rrf),
      autoCompactAt = autoCompactAt, autoCompactBytes = autoCompactBytes)

  test("search over the live view equals the hand-composed hybrid " +
       "(storage.go:489-629 PersistentHybridIndex Execute)") {
    val hs = fresh()
    hs.append(batch(
      doc(1L, Array(1f, 0f, 0f), "wireless noise cancelling headphones", "electronics"),
      doc(2L, Array(0f, 1f, 0f), "usb charging cable fast", "electronics"),
      doc(3L, Array(1f, 0.1f, 0f), "novel about wireless telegraph history", "books"),
      doc(4L, Array(0f, 0f, 1f), "cookbook recipes", "books")))
    val filters = Seq(FilterGroup(Seq(Filter.Eq("category", "electronics"))))
    val got = hs.search(filters, Some(q(Array(1f, 0f, 0f))), Some("wireless"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val live = hs.read()
    val want = Hybrid.search(
      live.select("id", "category"), filters,
      Some(live.select("id", "vector")), Some(q(Array(1f, 0f, 0f))),
      Some(BM25.build(live, "id", "text")), Some("wireless"),
      Hybrid.Config(k = 4, fusion = Hybrid.Rrf))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want && got.nonEmpty)
    hs.close()
  }

  test("node-based search through the facade (storage.go:489-543 " +
       "delegates WithNode): queryNodes resolve to STORED vectors in the " +
       "live view and equal the hand-composed resolve-then-search; " +
       "absent, deleted, and vector-less ids are errors; newest segment " +
       "wins the resolution") {
    val s = spark
    import s.implicits._
    val hs = fresh()
    hs.append(batch(
      doc(1L, Array(1f, 0f, 0f), "wireless noise cancelling headphones", "electronics"),
      doc(2L, Array(0f, 1f, 0f), "usb charging cable fast", "electronics"),
      doc(3L, Array(1f, 0.1f, 0f), "novel about wireless telegraph history", "books"),
      doc(4L, Array(0f, 0f, 1f), "cookbook recipes", "books")))
    // node-only search == hand-composed: resolve 3's stored vector, then
    // the ordinary facade search with it as the (single) direct query
    val gotNode = hs.search(queryNodes = Seq(3L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val v3 = hs.read().filter(col("id") === 3L)
      .head().getAs[scala.collection.Seq[Float]]("vector").toArray
    val want = hs.search(queryVec = Some(q(v3)))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(gotNode == want && gotNode.nonEmpty,
      s"node search diverged from resolve-then-search: $gotNode vs $want")

    // direct + node combine through the multi-query path — equal to
    // passing both vectors as direct queries (node id 1 vs synthetic
    // direct qid: the remap keeps them distinct even when ids collide)
    val qv = Array(0f, 0.9f, 0.1f)
    val gotBoth = hs.search(queryVec = Some(Seq((1L, qv)).toDF("qid", "qvec")),
        queryNodes = Seq(1L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val v1 = hs.read().filter(col("id") === 1L)
      .head().getAs[scala.collection.Seq[Float]]("vector").toArray
    val wantBoth = hs.search(queryVec =
        Some(Seq((0L, qv), (1L, v1)).toDF("qid", "qvec")))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(gotBoth == wantBoth && gotBoth.nonEmpty,
      s"direct+node diverged from two-direct: $gotBoth vs $wantBoth")

    // newest-wins: re-appending id 3 with a NEW vector re-resolves to it
    hs.append(batch(doc(3L, Array(0f, 0f, 1f), "revised novel", "books")))
    val gotNew = hs.search(queryNodes = Seq(3L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val wantNew = hs.search(queryVec = Some(q(Array(0f, 0f, 1f))))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(gotNew == wantNew,
      s"node resolution ignored the newest segment: $gotNew vs $wantNew")

    // error matrix (flat_index_search.go:182-191: absent node = error)
    intercept[IllegalArgumentException](hs.search(queryNodes = Seq(99L)))
    hs.delete(Seq(2L))
    intercept[IllegalArgumentException](hs.search(queryNodes = Seq(2L)))
    intercept[IllegalArgumentException](hs.search(queryNodes = Seq(-1L)))
    hs.close()
  }

  test("facade threshold + per-modality cutoff pass through to the " +
       "hybrid exactly (the reference's WithThreshold/WithCutoff on the " +
       "persistent search, storage.go:449-465): equal to the " +
       "hand-composed searchWith with the same knobs") {
    val hs = fresh()
    hs.append(batch(
      doc(1L, Array(1f, 0f, 0f), "wireless noise cancelling headphones", "electronics"),
      doc(2L, Array(0f, 1f, 0f), "usb charging cable fast", "electronics"),
      doc(3L, Array(1f, 0.1f, 0f), "novel about wireless telegraph history", "books"),
      doc(4L, Array(0f, 0f, 1f), "cookbook recipes", "books")))
    val live = hs.read()
    def want(t: Option[Double], cut: Int) = Hybrid.searchWith(
        live.select("id", "category"), Seq.empty,
        Some(Hybrid.FlatLeg(live.select("id", "vector"))),
        Some(q(Array(1f, 0f, 0f))),
        Some(BM25.build(live, "id", "text")), Some("wireless"),
        Hybrid.Config(k = 4, fusion = Hybrid.Rrf),
        vecThreshold = t, modalityCutoff = cut)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def got(t: Option[Double], cut: Int) = hs.search(
        queryVec = Some(q(Array(1f, 0f, 0f))), queryText = Some("wireless"),
        vecThreshold = t, modalityCutoff = cut)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // threshold prunes the vector modality only; cutoff autocuts each leg
    assert(got(Some(0.5), -1) == want(Some(0.5), -1))
    assert(got(None, 1) == want(None, 1))
    assert(got(Some(0.5), 1) == want(Some(0.5), 1))
    assert(got(Some(0.5), -1).nonEmpty)
    // a threshold excluding every vector keeps the text modality alive
    val textOnly = got(Some(1e-9), -1)
    assert(textOnly.nonEmpty && textOnly == want(Some(1e-9), -1))
    hs.close()
  }

  test("lifecycle: replace by re-append, delete hides, re-append after " +
       "delete is live, state invalidates across mutations") {
    val hs = fresh()
    hs.append(batch(doc(1L, Array(1f, 0f, 0f), "alpha rocket", "a")))
    assert(hs.search(queryText = Some("alpha")).collect().map(_.getLong(0))
      .toSeq == Seq(1L))
    // replace: same id, new text in a newer segment wins
    hs.append(batch(doc(1L, Array(1f, 0f, 0f), "beta engine", "a")))
    assert(hs.search(queryText = Some("alpha")).collect().isEmpty)
    assert(hs.search(queryText = Some("beta")).collect().map(_.getLong(0))
      .toSeq == Seq(1L))
    // delete hides; re-append resurrects
    hs.delete(Seq(1L))
    assert(hs.read().count() == 0)
    hs.append(batch(doc(1L, Array(0f, 1f, 0f), "gamma ray", "b")))
    assert(hs.search(queryText = Some("gamma")).collect().map(_.getLong(0))
      .toSeq == Seq(1L))
    hs.close()
  }

  test("auto-compaction at the segment-count threshold " +
       "(CompactionThreshold, storage.go:72-84)") {
    val hs = fresh(autoCompactAt = 3)
    hs.append(batch(doc(1L, Array(1f, 0f, 0f), "one", "a")))
    hs.append(batch(doc(2L, Array(0f, 1f, 0f), "two", "a")))
    assert(hs.store.segments().size == 2)
    hs.append(batch(doc(3L, Array(0f, 0f, 1f), "three", "a")))
    // third append reached the threshold -> compacted into ONE segment
    assert(hs.store.segments().size == 1)
    assert(hs.read().count() == 3)
    hs.close()
  }

  test("auto-compaction on the BYTE threshold: totalBytes() crossing " +
       "autoCompactBytes triggers a compact (size trigger, storage.go:72-84)") {
    // calibrate: how many bytes does one flushed batch occupy on disk?
    val probe = fresh()
    probe.append(batch(doc(1L, Array(1f, 0f, 0f), "calibration row", "a")))
    val oneBatch = probe.store.totalBytes()
    probe.close()
    assert(oneBatch > 0L)
    // threshold between 1 and 2 batches: first append stays, second compacts
    val hs = fresh(autoCompactBytes = oneBatch + oneBatch / 2)
    hs.append(batch(doc(1L, Array(1f, 0f, 0f), "calibration row", "a")))
    assert(hs.store.segments() == Seq(0L)) // below threshold — untouched
    hs.append(batch(doc(2L, Array(0f, 1f, 0f), "second row here", "a")))
    // crossing the byte threshold compacted segs 0+1 into seg 2
    assert(hs.store.segments() == Seq(2L))
    assert(hs.read().count() == 2)
    hs.close()
  }

  test("maybeCompact: no-op below every threshold, compacts when due — " +
       "the schedulable form of the background worker (storage.go:821-847)") {
    val hs = fresh(autoCompactAt = 10)
    hs.store.append(batch(doc(1L, Array(1f, 0f, 0f), "one", "a")))
    hs.store.append(batch(doc(2L, Array(0f, 1f, 0f), "two", "a")))
    assert(!hs.compactionDue())
    assert(hs.maybeCompact().isEmpty)
    assert(hs.store.segments() == Seq(0L, 1L)) // untouched
    val due = fresh(autoCompactAt = 2)
    due.store.append(batch(doc(1L, Array(1f, 0f, 0f), "one", "a")))
    due.store.append(batch(doc(2L, Array(0f, 1f, 0f), "two", "a")))
    assert(due.compactionDue())
    assert(due.maybeCompact().contains(2L)) // segs 0+1 merged into seg 2
    assert(due.store.segments() == Seq(2L) && due.read().count() == 2)
    hs.close(); due.close()
  }

  test("vector-index template: an IVF-templated store at probe-all equals " +
       "the flat default (VectorIndexTemplate + Train, PERSISTENCE.md)") {
    val rows = batch(
      doc(1L, Array(1f, 0f, 0f), "alpha", "a"), doc(2L, Array(0f, 1f, 0f), "beta", "a"),
      doc(3L, Array(0.9f, 0.1f, 0f), "gamma", "b"), doc(4L, Array(0f, 0f, 1f), "delta", "b"))
    def mk(indexer: org.apache.spark.sql.DataFrame => Hybrid.VectorLeg) = {
      val h = new HybridStore(spark,
        java.nio.file.Files.createTempDirectory("hybtmpl").toString,
        Hybrid.Config(k = 4), vectorIndexer = indexer)
      h.append(rows); h
    }
    val flat = mk(Hybrid.FlatLeg.apply)
    val ivf = mk(df => Hybrid.IvfLeg(
      graft.vector.Ivf.build(df, nlist = 2, maxIter = 5), nprobe = 2))
    val qv = q(Array(1f, 0f, 0f))
    val a = flat.search(queryVec = Some(qv)).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6))).toSeq
    val b = ivf.search(queryVec = Some(qv)).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6))).toSeq
    assert(a == b && a.nonEmpty) // probe-all IVF is exhaustive
    flat.close(); ivf.close()
  }

  test("streaming sink: micro-batches land as segments and the next " +
       "search serves them (Add-on-live-store, storage.go:367-450)") {
    val s = spark
    import s.implicits._
    val hs = fresh()
    val src = java.nio.file.Files.createTempDirectory("hybsink-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("hybsink-ck").toString
    batch(doc(1L, Array(1f, 0f, 0f), "streamed alpha", "a"),
      doc(2L, Array(0f, 1f, 0f), "streamed beta", "b"))
      .write.parquet(s"$src/d1")
    val stream = spark.readStream
      .schema("id LONG, vector ARRAY<FLOAT>, text STRING, category STRING")
      .parquet(s"$src/*")
    hs.sink(stream, ckpt).awaitTermination()
    assert(hs.read().count() == 2)
    assert(hs.search(queryText = Some("alpha")).collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    // a second delivery invalidates the cached generation
    batch(doc(3L, Array(0f, 0f, 1f), "streamed gamma", "c"))
      .write.parquet(s"$src/d2")
    hs.sink(stream, ckpt).awaitTermination()
    assert(hs.read().count() == 3)
    assert(hs.search(queryText = Some("gamma")).collect()
      .map(_.getLong(0)).toSeq == Seq(3L))
    hs.close()
  }

  test("streaming sink into an incremental-HNSW store: micro-batch folds " +
       "insert into the seeded graph copy-on-write (no re-seed), and the " +
       "post-drain search equals a flat-legged twin over the same " +
       "deliveries") {
    val s = spark
    import s.implicits._
    val cfg = Hybrid.Config(k = 10, fusion = Hybrid.Rrf)
    val hs = new HybridStore(spark,
      java.nio.file.Files.createTempDirectory("hybhnswsink").toString, cfg,
      incrementalHnsw = Some(HybridStore.HnswSpec(efSearch = 5000)))
    val twin = new HybridStore(spark,
      java.nio.file.Files.createTempDirectory("hybhnswsinkf").toString, cfg)
    val src = java.nio.file.Files.createTempDirectory("hybhnsw-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("hybhnsw-ck").toString
    def vec(i: Long) = Array.tabulate(3)(j => (math.sin(i * 1.9 + j) * 5).toFloat)
    // seed batch + first search: the graph log is live BEFORE the stream
    val seedRows = batch(doc(1L, vec(1L), "seed alpha probe", "a"),
      doc(2L, vec(2L), "seed beta probe", "b"))
    hs.append(seedRows); twin.append(seedRows)
    val qv = Seq((0L, vec(7L))).toDF("qid", "qvec")
    hs.search(queryVec = Some(qv), queryText = Some("probe")).count()
    val foldedAtSeed = hs.hnswLogFolded
    // two deliveries, including a replace of a seeded id
    batch(doc(3L, vec(3L), "streamed gamma probe", "c"),
      doc(2L, vec(22L), "beta revised probe", "b"))
      .write.parquet(s"$src/d1")
    batch(doc(4L, vec(4L), "streamed delta probe", "d"))
      .write.parquet(s"$src/d2")
    val schema = "id LONG, vector ARRAY<FLOAT>, text STRING, category STRING"
    hs.sink(spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*"), ckpt)
      .awaitTermination()
    twin.sink(spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*"),
      ckpt + "-twin").awaitTermination()
    assert(hs.hnswLogFolded >= foldedAtSeed + 2,
      "streamed segments did not fold into the live graph log")
    val got = hs.search(queryVec = Some(qv), queryText = Some("probe"))
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
    val want = twin.search(queryVec = Some(qv), queryText = Some("probe"))
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
    assert(got == want, s"streamed HNSW-leg store diverged: $got vs $want")
    hs.close(); twin.close()
  }

  test("streaming sink into a ROUTED quantized store (incrementalPq, " +
       "nlist > 0): micro-batch folds are encode-only projections under " +
       "the train-once coarse + codebooks (no retrain), and the " +
       "post-drain search at probe-all equals a flat-legged twin over " +
       "the same deliveries — including after a reopen") {
    val s = spark
    import s.implicits._
    val cfg = Hybrid.Config(k = 10, fusion = Hybrid.Rrf)
    val root = java.nio.file.Files.createTempDirectory("hybpqsink").toString
    val pqSpec = HybridStore.PqSpec(m = 3, ksub = 4, maxIter = 5,
      refineFactor = 1, nlist = 2, nprobe = 2)
    def open() = new HybridStore(spark, root, cfg,
      incrementalPq = Some(pqSpec))
    var hs = open()
    val twin = new HybridStore(spark,
      java.nio.file.Files.createTempDirectory("hybpqsinkf").toString, cfg)
    val src = java.nio.file.Files.createTempDirectory("hybpq-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("hybpq-ck").toString
    def vec(i: Long) = Array.tabulate(3)(j => (math.sin(i * 1.9 + j) * 5).toFloat)
    // seed batch + first search: codebooks and coarse centroids train
    // BEFORE the stream; every later fold must reuse them
    val seedRows = batch(doc(1L, vec(1L), "seed alpha probe", "a"),
      doc(2L, vec(2L), "seed beta probe", "b"))
    hs.append(seedRows); twin.append(seedRows)
    val qv = Seq((0L, vec(7L))).toDF("qid", "qvec")
    hs.search(queryVec = Some(qv), queryText = Some("probe")).count()
    val modelFp = new java.io.File(s"$root/_pq/_model/_COMMIT").lastModified()
    assert(modelFp > 0, "seed search did not train+commit the model")
    // two deliveries, including a replace of a seeded id
    batch(doc(3L, vec(3L), "streamed gamma probe", "c"),
      doc(2L, vec(22L), "beta revised probe", "b"))
      .write.parquet(s"$src/d1")
    batch(doc(4L, vec(4L), "streamed delta probe", "d"))
      .write.parquet(s"$src/d2")
    val schema = "id LONG, vector ARRAY<FLOAT>, text STRING, category STRING"
    hs.sink(spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*"), ckpt)
      .awaitTermination()
    twin.sink(spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*"),
      ckpt + "-twin").awaitTermination()
    // folds were encode-only: the committed model is byte-identical
    assert(new java.io.File(s"$root/_pq/_model/_COMMIT").lastModified()
        == modelFp,
      "a streamed micro-batch retrained the model — folds must be " +
        "encode-only under the train-once contract")
    def got() = hs.search(queryVec = Some(qv), queryText = Some("probe"))
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
    val want = twin.search(queryVec = Some(qv), queryText = Some("probe"))
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
    assert(got() == want, s"streamed routed-PQ store diverged from twin")
    // durable pieces + model: reopen serves identically without retrain
    hs.close(); hs = open()
    assert(got() == want, "streamed routed-PQ store diverged after reopen")
    hs.close(); twin.close()
  }

  test("streaming sink defers compaction to post-drain: segments " +
       "accumulate past the threshold mid-stream (bounded per-batch " +
       "work), one compact after the drain (background worker, " +
       "storage.go:821-847)") {
    val hs = fresh(autoCompactAt = 2)
    val src = java.nio.file.Files.createTempDirectory("hybdefer-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("hybdefer-ck").toString
    batch(doc(1L, Array(1f, 0f, 0f), "deferred alpha", "a"))
      .write.parquet(s"$src/d1")
    batch(doc(2L, Array(0f, 1f, 0f), "deferred beta", "b"))
      .write.parquet(s"$src/d2")
    batch(doc(3L, Array(0f, 0f, 1f), "deferred gamma", "c"))
      .write.parquet(s"$src/d3")
    val stream = spark.readStream
      .schema("id LONG, vector ARRAY<FLOAT>, text STRING, category STRING")
      .option("maxFilesPerTrigger", 1) // one file per micro-batch
      .parquet(s"$src/*")
    hs.sink(stream, ckpt).awaitTermination()
    // had compaction run INSIDE the batch loop, the threshold (2) would
    // fire at batch 2: segs {0,1}→2, batch 3→seg 3, post-drain →seg 4.
    // Deferred: three ingest segments 0,1,2, ONE compact into seg 3.
    assert(hs.store.segments() == Seq(3L))
    assert(hs.read().count() == 3)
    assert(hs.search(queryText = Some("gamma")).collect()
      .map(_.getLong(0)).toSeq == Seq(3L))
    hs.close()
  }

  test("modality guards: query against a never-appended modality errors") {
    val s = spark
    import s.implicits._
    val hs = new HybridStore(spark,
      java.nio.file.Files.createTempDirectory("hybstore-t").toString)
    hs.append(Seq((1L, "text only doc")).toDF("id", "text"))
    assert(hs.search(queryText = Some("text")).collect().nonEmpty)
    intercept[IllegalArgumentException] {
      hs.search(queryVec = Some(q(Array(1f, 0f, 0f))))
    }
    hs.close()
  }

  test("model-based facade soak: random append/replace/delete/compact " +
       "sequences keep the live view exactly equal to an in-memory model, " +
       "and text search membership tracks it (storage.go mutate-search " +
       "series, two seeds)") {
    val s = spark
    import s.implicits._
    def soak(seed: Long, steps: Int): Unit = {
      val rnd = new scala.util.Random(seed)
      val root = java.nio.file.Files.createTempDirectory("hybsoak").toString
      val cfg = Hybrid.Config(k = 1000, fusion = Hybrid.Rrf) // k >> corpus: all
      var hs = new HybridStore(spark, root, cfg)
      var model = Map.empty[Long, String] // id -> text
      var nextId = 0L
      def freshText(id: Long): String = {
        val marker = if (rnd.nextBoolean()) "zebra" else "yak"
        s"$marker document body doc$id rev r${rnd.nextInt(1000)}"
      }
      def checkStep(step: Int): Unit = {
        if (hs.store.segments().isEmpty) {
          // nothing appended yet (a delete/compact/reopen opener): the
          // model must agree the store is empty, and there is no view
          assert(model.isEmpty, s"seed=$seed step=$step: model expects " +
            "rows but the store has no segments")
          return
        }
        val live = hs.read().select("id", "text").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(live == model, s"seed=$seed step=$step live view diverged: " +
          s"extra=${live.keySet -- model.keySet} missing=${model.keySet -- live.keySet}")
        val wantZebra = model.filter(_._2.contains("zebra")).keySet
        if (wantZebra.nonEmpty) {
          // membership oracle: exactly the live docs containing the term
          val got = hs.search(queryText = Some("zebra"))
            .collect().map(_.getLong(0)).toSet
          assert(got == wantZebra,
            s"seed=$seed step=$step search membership: got=$got want=$wantZebra")
        }
      }
      (0 until steps).foreach { step =>
        rnd.nextInt(6) match {
          case 0 | 1 => // append fresh docs
            val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
              val id = nextId; nextId += 1
              val t = freshText(id); model += id -> t; (id, t)
            }
            hs.append(rows.toDF("id", "text"))
          case 2 => // re-append live ids: newest segment must win
            if (model.nonEmpty) {
              val victims = rnd.shuffle(model.keys.toSeq)
                .take(1 + rnd.nextInt(2))
              val rows = victims.map { id =>
                val t = freshText(id) + " replaced"; model += id -> t; (id, t)
              }
              hs.append(rows.toDF("id", "text"))
            }
          case 3 => // delete live ids (and sometimes an unknown id)
            if (model.nonEmpty) {
              val victims = rnd.shuffle(model.keys.toSeq)
                .take(1 + rnd.nextInt(2)) ++
                (if (rnd.nextBoolean()) Seq(99999L) else Seq.empty)
              hs.delete(victims)
              model --= victims
            }
          case 4 => // compact: live view identical before/after
            if (hs.store.segments().nonEmpty) hs.compact()
          case 5 => // re-open the same root: state derives from disk alone
            hs.close()
            hs = new HybridStore(spark, root, cfg)
        }
        checkStep(step)
      }
      hs.close()
    }
    soak(seed = 17L, steps = 10)
    soak(seed = 71L, steps = 10)
  }

  test("incremental BM25 maintenance: across an append/replace/" +
       "null-text-replace/delete/compact soak the log-maintained corpus " +
       "EQUALS a from-scratch rebuild — postings, per-term df, stats, doc " +
       "lens, and ranked scores (the reference's incremental stats " +
       "contract, bm25_index.go:327-334) — and appends extend pieces " +
       "instead of reseeding") {
    val s = spark
    import s.implicits._
    val hs = fresh()

    def checkEqualsRebuild(label: String): Unit = {
      val inc = hs.textCorpus.get
      val reb = BM25.build(
        hs.read().filter(col("text").isNotNull).select("id", "text"),
        "id", "text")
      def postingsOf(c: graft.text.BM25Corpus) = c.postings
        .select(col("term"), col("id"), col("tf").cast("long"),
          col("dl").cast("double"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(postingsOf(inc) == postingsOf(reb), s"$label: postings diverge")
      def dfOf(c: graft.text.BM25Corpus) = c.termDf
        .select(col("term"), col("df").cast("double"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(dfOf(inc) == dfOf(reb), s"$label: df diverges")
      def lensOf(c: graft.text.BM25Corpus) = c.docLens
        .select(col("id"), col("dl").cast("double"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(lensOf(inc) == lensOf(reb), s"$label: doc lens diverge")
      def statsOf(c: graft.text.BM25Corpus) = {
        val r = c.stats.select(col("n_docs").cast("double"), col("avgdl")).head()
        (r.getDouble(0), r.getDouble(1))
      }
      // EXACT equality: n/df are integers, sum(dl) is an integer-valued
      // double (exact in any order), avgdl one identical division
      assert(statsOf(inc) == statsOf(reb), s"$label: stats diverge " +
        s"(${statsOf(inc)} vs ${statsOf(reb)})")
      def ranked(c: graft.text.BM25Corpus) = c.search("shared probe", 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(ranked(inc) == ranked(reb), s"$label: ranked search diverges")
    }

    // seed: two segments BEFORE the first search — per-segment seeding
    // (persisted pieces) gives one piece per segment
    hs.append(Seq((1L, "alpha shared words here"),
      (2L, "beta shared probe terms")).toDF("id", "text"))
    hs.append(Seq((3L, "gamma probe unrelated")).toDF("id", "text"))
    assert(hs.search(queryText = Some("probe")).collect().nonEmpty)
    assert(hs.textLogPieces == 2, "seed must cover both segments as pieces")
    checkEqualsRebuild("after seed")

    // plain append — must extend the log (pieces grow), not reseed
    hs.append(Seq((4L, "delta shared probe extra body")).toDF("id", "text"))
    assert(hs.search(queryText = Some("probe")).collect().nonEmpty)
    assert(hs.textLogPieces == 3, "append must add a piece incrementally")
    checkEqualsRebuild("after append")

    // replace a live id (newest wins; old postings/df/stats must fold out)
    hs.append(Seq((2L, "beta rewritten without the old terms"))
      .toDF("id", "text"))
    checkEqualsRebuild("after replace")

    // replace a TEXT doc with a null-text row: doc leaves the corpus
    hs.append(Seq((4L, Option.empty[String])).toDF("id", "text"))
    checkEqualsRebuild("after null-text replace")

    // delete one live id and one unknown id
    hs.delete(Seq(1L, 99999L))
    checkEqualsRebuild("after delete")

    // re-append the deleted id: resurrects in a newer segment
    hs.append(Seq((1L, "alpha resurrected shared probe")).toDF("id", "text"))
    checkEqualsRebuild("after resurrect")

    // compact: pieces collapse, corpus unchanged
    val before = hs.search(queryText = Some("probe"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    hs.compact()
    assert(hs.textLogPieces == 1, "compact must collapse pieces")
    checkEqualsRebuild("after compact")
    val after = hs.search(queryText = Some("probe"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(before == after, "compaction changed search results")

    // and the log keeps maintaining incrementally post-compact
    hs.append(Seq((7L, "omega shared probe finale")).toDF("id", "text"))
    assert(hs.textLogPieces == 2)
    checkEqualsRebuild("after post-compact append")
    hs.close()
  }

  test("embedded serving from the open store: hs.serve() answers the " +
       "same (id, score) rows as the distributed search, and a mutation " +
       "plus re-serve reflects the new generation (storage.go:489-543 — " +
       "the open store IS the serving index)") {
    val hs = fresh()
    hs.append(batch(
      doc(1L, Array(1f, 0f, 0f), "wireless noise cancelling headphones", "electronics"),
      doc(2L, Array(0f, 1f, 0f), "usb charging cable fast", "electronics"),
      doc(3L, Array(1f, 0.1f, 0f), "novel about wireless telegraph history", "books")))
    val filters = Seq(FilterGroup(Seq(Filter.Eq("category", "electronics"))))
    def pin(): Unit = {
      val dist = hs.search(filters, Some(q(Array(1f, 0f, 0f))), Some("wireless"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val local = hs.serve()
        .search(filters, Some(Array(1f, 0f, 0f)), Some("wireless"))
      assert(local.map(_._1) == dist.map(_._1),
        s"embedded/distributed diverged: $local vs $dist")
      local.zip(dist).foreach { case ((_, ls), (_, ds)) =>
        assert(math.abs(ls - ds) < 1e-9) }
    }
    pin()
    // mutate, re-serve: the new generation must be what gets served
    hs.append(batch(doc(4L, Array(0.9f, 0f, 0.1f), "wireless earbuds", "electronics")))
    pin()
    hs.delete(Seq(1L))
    pin()
    hs.close()
  }

  test("embedded serving follows the store's CONFIGURED vector leg — " +
       "HNSW-legged, IVF-legged, and PQ-legged stores each serve() the " +
       "same rows as their own distributed search (the reference serves " +
       "through whatever VectorIndexTemplate the store holds, " +
       "storage.go:489-543; the HNSW graph is reused resident, never " +
       "re-collected as raw vectors)") {
    val docs = batch(
      doc(1L, Array(1f, 0f, 0f), "wireless noise cancelling headphones", "electronics"),
      doc(2L, Array(0f, 1f, 0f), "usb charging cable fast", "electronics"),
      doc(3L, Array(1f, 0.1f, 0f), "novel about wireless telegraph history", "books"),
      doc(4L, Array(0.9f, 0f, 0.1f), "wireless earbuds", "electronics"),
      doc(5L, Array(0f, 0.9f, 0.2f), "braided charging cord", "electronics"))
    val filters = Seq(FilterGroup(Seq(Filter.Eq("category", "electronics"))))
    def mk(ivf: Option[(Int, Int)] = None,
           hnsw: Option[HybridStore.HnswSpec] = None,
           pq: Option[HybridStore.PqSpec] = None) = {
      val hs = new HybridStore(spark,
        java.nio.file.Files.createTempDirectory("hyblegserve").toString,
        Hybrid.Config(k = 4, fusion = Hybrid.Rrf),
        incrementalIvf = ivf, incrementalHnsw = hnsw, incrementalPq = pq)
      hs.append(docs)
      hs
    }
    val legged = Seq(
      "hnsw" -> mk(hnsw = Some(HybridStore.HnswSpec(efSearch = 64))),
      "ivf"  -> mk(ivf = Some((2, 2))),
      "pq"   -> mk(pq = Some(HybridStore.PqSpec(m = 3, ksub = 4,
        maxIter = 5, refineFactor = 8))), // corpus-covering refine: exact
      "flat" -> mk())
    def pinLeg(name: String, hs: HybridStore): Unit = {
      val dist = hs.search(filters, Some(q(Array(1f, 0f, 0f))), Some("wireless"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val local = hs.serve()
        .search(filters, Some(Array(1f, 0f, 0f)), Some("wireless"))
      assert(local.map(_._1) == dist.map(_._1),
        s"$name-legged embedded/distributed diverged: $local vs $dist")
      local.zip(dist).foreach { case ((_, ls), (_, ds)) =>
        assert(math.abs(ls - ds) < 1e-9,
          s"$name-legged embedded score drift: $ls vs $ds") }
    }
    legged.foreach { case (name, hs) =>
      pinLeg(name, hs)
      // mutate + re-serve: the embedded handle is generation-bound, the
      // NEXT serve() reflects the mutation on every leg kind (HNSW soft
      // delete in the graph, IVF/PQ piece markers, flat live view)
      hs.delete(Seq(4L))
      pinLeg(s"$name-after-delete", hs)
      hs.close()
    }
    // an IVF leg under CosinePreNorm (unit rows stored raw — a metric
    // the embedded IVF scan does not pack) falls back to EXACT flat
    // serving instead of throwing; rows stay inside the filter
    val pre = new HybridStore(spark,
      java.nio.file.Files.createTempDirectory("hyblegpre").toString,
      Hybrid.Config(k = 4, fusion = Hybrid.Rrf,
        metric = graft.vector.Metric.CosinePreNorm),
      incrementalIvf = Some((2, 2)))
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum).toFloat
      v.map(_ / n)
    }
    val s2 = spark
    import s2.implicits._
    pre.append(Seq(
      (1L, unit(Array(1f, 0f, 0.1f)), "wireless noise headphones", "electronics"),
      (2L, unit(Array(0f, 1f, 0f)), "usb cable", "electronics"),
      (3L, unit(Array(0.9f, 0.1f, 0f)), "wireless telegraph novel", "books"))
      .toDF("id", "vector", "text", "category"))
    val preServed = pre.serve()
      .search(filters, Some(unit(Array(1f, 0f, 0f))), Some("wireless"))
    assert(preServed.nonEmpty && preServed.forall(_._1 != 3L),
      s"CosinePreNorm IVF-legged serve leaked the filter: $preServed")
    pre.close()
  }

  test("embedded serving with OPTIONAL modalities: a vector-only store " +
       "serves without text, a text-only store without vectors, and a " +
       "query for an absent modality contributes nothing — the " +
       "distributed search surface's semantics (the reference's store " +
       "round-trips nil sub-indexes, hybrid_search_index_test.go:868-946)") {
    val s = spark
    import s.implicits._
    // vector-only store, HNSW leg: the resident graph serves embedded
    val vecOnly = new HybridStore(spark,
      java.nio.file.Files.createTempDirectory("hybvonly").toString,
      Hybrid.Config(k = 3, fusion = Hybrid.Rrf),
      incrementalHnsw = Some(HybridStore.HnswSpec(efSearch = 64)))
    vecOnly.append((1L to 8L).map(i =>
      (i, Array(i.toFloat, (9 - i).toFloat, 1f))).toDF("id", "vector"))
    val qv = Array(2f, 7f, 1f)
    val dist = vecOnly.search(queryVec = Some(Seq((0L, qv)).toDF("qid", "qvec")))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val local = vecOnly.serve().search(Seq.empty, Some(qv), None)
    assert(local.map(_._1) == dist.map(_._1),
      s"vector-only embedded diverged: $local vs $dist")
    // a text query against the text-less store contributes nothing —
    // same rows as the pure vector search (distributed parity)
    assert(vecOnly.serve().search(Seq.empty, Some(qv), Some("ghost query"))
      .map(_._1) == dist.map(_._1))
    vecOnly.close()
    // text-only store: BM25 serves embedded with no vector column
    val txtOnly = new HybridStore(spark,
      java.nio.file.Files.createTempDirectory("hybtonly").toString,
      Hybrid.Config(k = 3, fusion = Hybrid.Rrf))
    txtOnly.append(Seq((1L, "alpha shared probe"), (2L, "beta shared"),
      (3L, "gamma other")).toDF("id", "text"))
    val distT = txtOnly.search(queryText = Some("shared"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val localT = txtOnly.serve().search(Seq.empty, None, Some("shared"))
    assert(localT.map(_._1) == distT.map(_._1),
      s"text-only embedded diverged: $localT vs $distT")
    localT.zip(distT).foreach { case ((_, ls), (_, ds)) =>
      assert(math.abs(ls - ds) < 1e-9) }
    txtOnly.close()
    // a METADATA-ONLY store serves too (ADVICE r16 #1): the reference's
    // test range round-trips a legal 'metadata only' index
    // (hybrid_search_index_test.go:868-946), and the distributed path
    // already scores filters-only queries 1.0 — embedded parity:
    val none = new HybridStore(spark,
      java.nio.file.Files.createTempDirectory("hybnone").toString,
      Hybrid.Config(k = 3))
    none.append(Seq((1L, "x"), (2L, "y"), (3L, "x"), (4L, "x"))
      .toDF("id", "category"))
    val handle = none.serve()
    // filters-only: candidates score 1.0, id asc, top-k — the
    // distributed no-modality branch (hybrid_search_index.go:588-593)
    val distM = none.search(filters = Seq(graft.filter.FilterGroup(
        Seq(graft.filter.Filter.Eq("category", "x")))))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val localM = handle.search(Seq(graft.filter.FilterGroup(
      Seq(graft.filter.Filter.Eq("category", "x")))), None, None)
    assert(localM == distM,
      s"metadata-only embedded diverged: $localM vs $distM")
    assert(localM.map(_._1) == Seq(1L, 3L, 4L).take(3) &&
      localM.forall(_._2 == 1.0))
    // no filters and no modality query -> EMPTY, like the reference
    // (:594-600) and the distributed path
    assert(handle.search(Seq.empty, None, None).isEmpty)
    none.close()
  }

  test("PACKED-META embedded serving: an id-only metadata frame collects " +
       "as one primitive long column (no boxed Row per doc), and filters " +
       "over the synthesized id field still evaluate — parity with a " +
       "store that carries a real metadata column") {
    val s = spark
    import s.implicits._
    // vector-only store => id-only meta => the packed path
    val hs = new HybridStore(spark,
      java.nio.file.Files.createTempDirectory("hybpacked").toString,
      Hybrid.Config(k = 4, fusion = Hybrid.Rrf))
    hs.append((1L to 8L).map(i =>
      (i, Array(i.toFloat, (9 - i).toFloat, 1f))).toDF("id", "vector"))
    val qv = Array(2f, 7f, 1f)
    val handle = hs.serve()
    // an id filter through the packed handle (the rare path that boxes
    // on demand) vs the distributed filtered search
    val fil = Seq(graft.filter.FilterGroup(
      Seq(graft.filter.Filter.In("id", Seq(2L, 4L, 6L)))))
    val dist = hs.search(filters = fil,
        queryVec = Some(Seq((0L, qv)).toDF("qid", "qvec")))
      .collect().map(_.getLong(0)).toSeq
    val local = handle.search(fil, Some(qv), None).map(_._1)
    assert(local == dist, s"packed-meta filtered serve diverged: " +
      s"$local vs $dist")
    // unfiltered parity too
    assert(handle.search(Seq.empty, Some(qv), None).map(_._1) ==
      hs.search(queryVec = Some(Seq((0L, qv)).toDF("qid", "qvec")))
        .collect().map(_.getLong(0)).toSeq)
    hs.close()
  }

  test("IVF metric compatibility is ONE shared rule for the distributed " +
       "and embedded dispatch paths (ADVICE r16 #4) — the helper's full " +
       "matrix, plus the distributed path actually throwing through it") {
    import graft.vector.Metric._
    val ok = Seq((L2, L2), (Cosine, Cosine), (Cosine, CosinePreNorm),
      (CosinePreNorm, Cosine), (CosinePreNorm, CosinePreNorm),
      (L2, DotSim), (DotSim, L2))
    ok.foreach { case (im, cm) =>
      Hybrid.requireIvfMetricCompatible(im, cm) // must not throw
    }
    // a cosine-built index under a non-cosine config mixes score spaces
    val e1 = intercept[IllegalArgumentException](
      Hybrid.requireIvfMetricCompatible(Cosine, L2))
    assert(e1.getMessage.contains("config says"))
    // raw-space centroids under a cosine-family config mis-route nprobe
    Seq(Cosine, CosinePreNorm).foreach { cm =>
      val e = intercept[IllegalArgumentException](
        Hybrid.requireIvfMetricCompatible(L2, cm))
      assert(e.getMessage.contains("raw-space centroids"))
    }
    // the distributed path throws THROUGH the shared helper (both
    // dispatch sites call the same object, so embedded serve() — whose
    // mismatch is unreachable through today's store construction — is
    // pinned by the same matrix)
    val s = spark
    import s.implicits._
    val vecs = (1L to 16L).map(i =>
      (i, Array(i.toFloat, (17 - i).toFloat, 1f))).toDF("id", "vector")
    val idx = graft.vector.Ivf.build(vecs, nlist = 2, maxIter = 3)
    val qv = Seq((0L, Array(2f, 7f, 1f))).toDF("qid", "qvec")
    val meta = vecs.select(col("id"), lit("m").as("tag"))
    val eDist = intercept[IllegalArgumentException] {
      Hybrid.searchWith(meta, Seq.empty, Some(Hybrid.IvfLeg(idx, 2)),
        Some(qv), None, None,
        Hybrid.Config(k = 3, metric = graft.vector.Metric.Cosine)).collect()
    }
    assert(eDist.getMessage.contains("raw-space centroids"))
  }

  test("auto-compaction with SEEDED logs: crossing the segment threshold " +
       "collapses the derived pieces too, and the compacted store answers " +
       "exactly like an uncompacted twin over the same corpus") {
    def mk(auto: Int) = new HybridStore(spark,
      java.nio.file.Files.createTempDirectory(s"hybauto$auto").toString,
      Hybrid.Config(k = 4, fusion = Hybrid.Rrf), autoCompactAt = auto,
      incrementalIvf = Some((2, 2)))
    val hs = mk(3)
    val twin = mk(0)
    def both(f: HybridStore => Unit): Unit = { f(hs); f(twin) }
    both(_.append(batch(doc(1L, Array(1f, 0f, 0f), "one alpha", "a"))))
    // seed both logs BEFORE the compaction trigger
    both(h => assert(h.search(queryVec = Some(q(Array(1f, 0f, 0f))),
      queryText = Some("alpha")).collect().nonEmpty))
    both(_.append(batch(doc(2L, Array(0f, 1f, 0f), "two alpha", "a"))))
    // third append crosses hs's threshold -> auto compact -> logs collapse
    both(_.append(batch(doc(3L, Array(0f, 0f, 1f), "three beta", "a"))))
    assert(hs.store.segments().size == 1, "auto-compaction did not fire")
    assert(twin.store.segments().size == 3)
    assert(hs.textLogPieces == 1 && hs.vecLogPieces == 1,
      "auto-compaction must collapse the derived pieces")
    assert(twin.textLogPieces == 3 && twin.vecLogPieces == 3)
    val a = hs.search(queryVec = Some(q(Array(1f, 0f, 0f))),
        queryText = Some("alpha"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = twin.search(queryVec = Some(q(Array(1f, 0f, 0f))),
        queryText = Some("alpha"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b, s"compacted vs uncompacted diverged: $a vs $b")
    hs.close(); twin.close()
  }

  test("incremental IVF leg (VecLog, train-once + assign-only): at " +
       "probe-all the leg is exhaustive-exact, so hybrid search equals " +
       "the flat-legged store across append/replace/delete/compact, the " +
       "model persists (a reopen never retrains), and appends add " +
       "assigned pieces instead of re-training (storage.go:321-347 " +
       "Train-once + per-flush assignment)") {
    val s = spark
    import s.implicits._
    val rootI = java.nio.file.Files.createTempDirectory("hybvec").toString
    val rootF = java.nio.file.Files.createTempDirectory("hybvecf").toString
    val cfg = Hybrid.Config(k = 10, fusion = Hybrid.Rrf)
    var incr = new HybridStore(spark, rootI, cfg,
      incrementalIvf = Some((2, 2)))
    val flat = new HybridStore(spark, rootF, cfg)
    val qv = q(Array(1f, 0f, 0f))
    def step(label: String)(mutate: HybridStore => Unit): Unit = {
      mutate(incr); mutate(flat)
      val a = incr.search(queryVec = Some(qv)).collect()
        .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6))).toSeq
      val b = flat.search(queryVec = Some(qv)).collect()
        .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6))).toSeq
      assert(a == b && a.nonEmpty, s"$label: incremental IVF diverged")
    }
    step("seed")(_.append(batch(
      doc(1L, Array(1f, 0f, 0f), "alpha", "a"),
      doc(2L, Array(0f, 1f, 0f), "beta", "a"),
      doc(3L, Array(0.9f, 0.1f, 0f), "gamma", "b"),
      doc(4L, Array(0f, 0f, 1f), "delta", "b"))))
    assert(incr.vecLogPieces == 1)
    // append new vectors: assign-only piece, no retrain
    step("append")(_.append(batch(doc(5L, Array(0.95f, 0f, 0.05f), "eps", "a"))))
    assert(incr.vecLogPieces == 2, "append must add an assigned piece")
    // replace a live vector (newest wins through markers)
    step("replace")(_.append(batch(doc(3L, Array(0f, 0.9f, 0.1f), "gam2", "b"))))
    // delete
    step("delete")(_.delete(Seq(1L)))
    // compact: pieces collapse, results unchanged
    step("compact")(_.compact())
    assert(incr.vecLogPieces == 1, "compact must collapse vector pieces")
    // reopen: the persisted model must be LOADED, not retrained
    val modelFiles = new java.io.File(s"$rootI/_vec/_model").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    incr.close()
    incr = new HybridStore(spark, rootI, cfg, incrementalIvf = Some((2, 2)))
    step("reopen")(_ => ())
    val modelAfter = new java.io.File(s"$rootI/_vec/_model").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    assert(modelAfter == modelFiles, "reopen retrained the model")
    // and incremental maintenance continues post-reopen
    step("post-reopen append")(_.append(batch(
      doc(9L, Array(0.98f, 0.01f, 0f), "late", "c"))))
    incr.close(); flat.close()
  }

  test("durable text pieces: a reopened store loads per-segment BM25 " +
       "state from disk WITHOUT re-tokenizing (the reference loads each " +
       "segment's serialized text index, storage.go:556-561,680-760); a " +
       "lost or half-written piece falls back to a segment rebuild") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("hybdur").toString
    val cfg = Hybrid.Config(k = 10, fusion = Hybrid.Rrf)
    // session 1: two segments + a replace + a delete, searched (so the
    // log is live and pieces land on disk), then closed
    var hs = new HybridStore(spark, root, cfg)
    hs.append(Seq((1L, "alpha shared probe"), (2L, "beta shared words"))
      .toDF("id", "text"))
    assert(hs.search(queryText = Some("probe")).collect().nonEmpty)
    hs.append(Seq((3L, "gamma probe body"), (2L, "beta rewritten probe"))
      .toDF("id", "text"))
    hs.delete(Seq(1L))
    val want = hs.search(queryText = Some("probe"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    hs.close()
    val piece0 = new java.io.File(s"$root/_text/seg=0/postings")
    val piece1 = new java.io.File(s"$root/_text/seg=1/postings")
    assert(piece0.isDirectory && piece1.isDirectory, "pieces not persisted")
    val mtimes = piece0.listFiles().map(f => f.getName -> f.lastModified).toMap

    // session 2: reopen — pieces load (files untouched), results identical
    hs = new HybridStore(spark, root, cfg)
    val got = hs.search(queryText = Some("probe"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want, s"reopened search diverged: $got vs $want")
    assert(hs.textLogPieces == 2)
    val after = piece0.listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(after == mtimes, "reopen rewrote a persisted piece")
    // incremental maintenance continues across the reopen
    hs.append(Seq((9L, "late probe entry")).toDF("id", "text"))
    assert(hs.search(queryText = Some("probe")).collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L, 9L))
    hs.close()

    // tokenizer guard: reopening with a DIFFERENT tokenizer must discard
    // the persisted pieces (cut under Simple) and re-tokenize under the
    // new one — a silent corpus/query tokenizer mismatch is the
    // wrong-results-with-no-error class
    val metaFile = java.nio.file.Paths.get(s"$root/_text/_tokenizer")
    assert(new String(java.nio.file.Files.readAllBytes(metaFile), "UTF-8")
      .trim == "simple")
    val uaxStore = new HybridStore(spark, root, cfg,
      tokenizer = graft.text.Tokenize.Uax29)
    val uaxGot = uaxStore.search(queryText = Some("probe"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val uaxWant = BM25.build(
        uaxStore.read().filter(col("text").isNotNull).select("id", "text"),
        "id", "text", graft.text.Tokenize.Uax29)
      .search("probe", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(uaxGot == uaxWant, "reopen under a new tokenizer served stale pieces")
    assert(new String(java.nio.file.Files.readAllBytes(metaFile), "UTF-8")
      .trim == "uax29", "tokenizer meta not restamped")
    uaxStore.close()
    // back to Simple for the remaining legs (restamps + re-tokenizes)
    hs = new HybridStore(spark, root, cfg)
    assert(hs.search(queryText = Some("probe")).collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L, 9L))
    hs.close()

    // session 3: destroy one piece's completion marker — reopen must
    // fall back to rebuilding that segment (and only that segment)
    assert(new java.io.File(s"$root/_text/seg=1/lens/_SUCCESS").delete())
    hs = new HybridStore(spark, root, cfg)
    assert(hs.search(queryText = Some("probe")).collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L, 9L))
    // the fallback re-persisted the rebuilt piece
    assert(new java.io.File(s"$root/_text/seg=1/lens/_SUCCESS").exists())
    // compaction collapses pieces on disk too — under the r18 generation
    // fence the JUST-superseded dirs stay one cycle (in-flight frames
    // planned before the compact still read them); a SECOND compact
    // vacuums them, leaving only the newest collapsed piece
    hs.compact()
    assert(hs.search(queryText = Some("probe")).collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L, 9L))
    def pieceDirs = new java.io.File(s"$root/_text").listFiles()
      .filter(_.getName.startsWith("seg=")).map(_.getName).toSeq
    val collapsed = hs.store.segments().max
    assert(pieceDirs.contains(s"seg=$collapsed"),
      s"collapsed piece dir missing: $pieceDirs")
    hs.compact()
    assert(hs.search(queryText = Some("probe")).collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L, 9L))
    val collapsed2 = hs.store.segments().max
    // steady state = the current piece + the one-cycle grace piece;
    // everything older (the 4 pre-compaction per-segment dirs) vacuumed
    assert(pieceDirs.toSet == Set(s"seg=$collapsed", s"seg=$collapsed2"),
      s"piece dirs older than one cycle survive a second compaction: " +
        s"$pieceDirs")
    hs.close()
  }

  test("tokenizer-rewrite crash safety: per-piece _tok commit markers " +
       "mean a reopen killed mid-rewrite can never leave old-tokenizer " +
       "pieces trusted under a new-tokenizer stamp (the round-12 fix for " +
       "the stamp-before-rewrite window), and a marker-less piece always " +
       "rebuilds") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("hybtokcrash").toString
    val cfg = Hybrid.Config(k = 10, fusion = Hybrid.Rrf)
    // session 1 under Simple: two segments of pieces on disk
    var hs = new HybridStore(spark, root, cfg)
    hs.append(Seq((1L, "alpha shared probe"), (2L, "beta shared words"))
      .toDF("id", "text"))
    hs.append(Seq((3L, "gamma probe body")).toDF("id", "text"))
    assert(hs.search(queryText = Some("probe")).collect().nonEmpty)
    hs.close()
    def tokOf(segDir: String): String = new String(java.nio.file.Files
      .readAllBytes(java.nio.file.Paths.get(s"$root/_text/$segDir/_tok")),
      "UTF-8").trim
    assert(tokOf("seg=0") == "simple" && tokOf("seg=1") == "simple")

    // CRASH SIMULATION: the pre-fix design stamped the dir-level
    // tokenizer BEFORE rewriting pieces, so a crash mid-rewrite left
    // simple-cut pieces under a dir stamp claiming uax29 — reproduce
    // exactly that on-disk state
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/_text/_tokenizer"),
      "uax29".getBytes("UTF-8"))
    // reopening under Uax29 must NOT trust the simple-cut pieces (their
    // own _tok markers say "simple"): every segment re-tokenizes, and
    // results equal a fresh Uax29 build over the live view
    hs = new HybridStore(spark, root, cfg,
      tokenizer = graft.text.Tokenize.Uax29)
    val got = hs.search(queryText = Some("probe"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = BM25.build(
        hs.read().filter(col("text").isNotNull).select("id", "text"),
        "id", "text", graft.text.Tokenize.Uax29)
      .search("probe", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want,
      "crash-state reopen served pieces cut under the old tokenizer")
    assert(tokOf("seg=0") == "uax29" && tokOf("seg=1") == "uax29",
      "rewritten pieces not re-committed under the new tokenizer")
    hs.close()

    // a piece whose commit marker is MISSING (crash between the table
    // writes and the marker) rebuilds even when the dir stamp matches —
    // there is deliberately no dir-level grandfathering
    assert(new java.io.File(s"$root/_text/seg=1/_tok").delete())
    val lensBefore = new java.io.File(s"$root/_text/seg=1/lens")
      .listFiles().map(f => f.getName -> f.lastModified).toMap
    hs = new HybridStore(spark, root, cfg,
      tokenizer = graft.text.Tokenize.Uax29)
    val got2 = hs.search(queryText = Some("probe"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got2 == want, "marker-less piece reopen diverged")
    val lensAfter = new java.io.File(s"$root/_text/seg=1/lens")
      .listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(lensAfter != lensBefore,
      "marker-less piece was trusted instead of rebuilt")
    assert(tokOf("seg=1") == "uax29", "rebuilt piece not re-committed")
    hs.close()
  }

  // ---- closed-state machine (storage_test.go:360-478) ----

  test("close without explicit flush persists everything: reopen sees the " +
       "data (TestPersistentHybridIndex_CloseWithoutFlush :393-418)") {
    val root = java.nio.file.Files.createTempDirectory("hybclose").toString
    val hs = new HybridStore(spark, root,
      Hybrid.Config(k = 4, fusion = Hybrid.Rrf))
    hs.append(batch(doc(1L, Array(1f, 0f, 0f), "alpha doc", "a")))
    hs.close() // no flush/compact call in between — close IS durable
    val hs2 = new HybridStore(spark, root,
      Hybrid.Config(k = 4, fusion = Hybrid.Rrf))
    assert(hs2.read().count() == 1L)
    assert(hs2.search(queryText = Some("alpha")).count() == 1L)
    hs2.close()
  }

  test("second close throws; isClosed flips " +
       "(TestPersistentHybridIndex_CloseTwice :420-443)") {
    val hs = fresh()
    hs.append(batch(doc(1L, Array(1f, 0f, 0f), "alpha", "a")))
    assert(!hs.isClosed)
    hs.close()
    assert(hs.isClosed)
    val e = intercept[IllegalStateException] { hs.close() }
    assert(e.getMessage.contains("already closed"))
  }

  test("every operation after close throws — append, delete, deleteFrom, " +
       "compact, search, read, sink " +
       "(TestPersistentHybridIndex_UseAfterClose :445-478)") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("hybuse").toString
    val hs = new HybridStore(spark, root,
      Hybrid.Config(k = 4, fusion = Hybrid.Rrf))
    hs.append(batch(doc(1L, Array(1f, 0f, 0f), "alpha", "a")))
    // frames handed out before close are bound to the OPEN store, like
    // the compaction contract: close() frees the logs' checkpointed
    // blocks, so collect results you need BEFORE closing
    val preClose = hs.search(queryText = Some("alpha")).count()
    hs.close()
    assert(preClose == 1L)
    intercept[IllegalStateException] {
      hs.append(batch(doc(2L, Array(0f, 1f, 0f), "beta", "b")))
    }
    intercept[IllegalStateException] { hs.delete(Seq(1L)) }
    intercept[IllegalStateException] { hs.deleteFrom(Seq(1L).toDF("id")) }
    intercept[IllegalStateException] { hs.compact() }
    intercept[IllegalStateException] { hs.search(queryText = Some("alpha")) }
    intercept[IllegalStateException] { hs.read() }
    intercept[IllegalStateException] {
      hs.sink(spark.readStream.format("rate").load(), "/tmp/nope")
    }
    // and the writer lock is actually free: a new owner opens cleanly
    // (the reason use-after-close must throw — a silent write here would
    // race this opener)
    val hs2 = new HybridStore(spark, root,
      Hybrid.Config(k = 4, fusion = Hybrid.Rrf))
    assert(hs2.read().count() == 1L)
    hs2.close()
  }

  // ---- round-19 row: close-time leg piece-dir vacuum (ADVICE r18 #5) ----

  test("a WRITER close vacuums the legs' collapse-superseded piece dirs " +
       "(the one-cycle deferral's close-time counterpart — without it a " +
       "store closed after one compaction leaks a generation of piece " +
       "dirs until some future process compacts); a READER close never " +
       "deletes shared piece bytes") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("hyblegvac").toString
    val cfg = Hybrid.Config(k = 10, fusion = Hybrid.Rrf)
    def textPieceDirs = Option(new java.io.File(s"$root/_text").listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("seg="))
      .map(_.getName).toSet
    val hs = new HybridStore(spark, root, cfg)
    hs.append(Seq((1L, "alpha shared probe"), (2L, "beta shared"))
      .toDF("id", "text"))
    hs.append(Seq((3L, "gamma probe body")).toDF("id", "text"))
    assert(hs.search(queryText = Some("probe")).collect().nonEmpty)
    assert(textPieceDirs == Set("seg=0", "seg=1"))
    hs.compact() // collapse: superseded dirs deferred ONE cycle
    val collapsed = hs.store.segments().max
    assert(textPieceDirs == Set("seg=0", "seg=1", s"seg=$collapsed"),
      "one-cycle deferral must keep the just-superseded dirs at compact")
    hs.close() // compacted here => writer semantics => vacuum stale dirs
    assert(textPieceDirs == Set(s"seg=$collapsed"),
      s"writer close left superseded piece dirs: $textPieceDirs " +
        "(the SegmentStore close vacuums retired segments; the legs " +
        "must vacuum their piece-dir twin)")
    // the surviving collapsed piece serves a reopen with zero re-tokenize
    val hs2 = new HybridStore(spark, root, cfg)
    assert(hs2.search(queryText = Some("probe")).collect()
      .map(_.getLong(0)).toSet == Set(1L, 3L))
    // a pure READER (no lock, never compacted) must leave even a STALE
    // foreign dir alone at close — deleting shared bytes is the owner's
    // call (the same rule StoreLifecycleSpec pins for retired segments)
    val stale = new java.io.File(s"$root/_text/seg=999")
    assert(stale.mkdirs())
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/_text/seg=999/marker"), "x")
    hs2.close()
    assert(textPieceDirs.contains("seg=999"),
      "a reader close deleted piece bytes it does not own")
  }

  test("writer-close piece-dir vacuum covers the QUANTIZED leg too: an " +
       "incrementalPq store closed after a compaction keeps only the " +
       "collapsed codes piece under _pq (plus the durable model), and a " +
       "reopen serves from it") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("hybpqvac").toString
    val cfg = Hybrid.Config(k = 4, fusion = Hybrid.Rrf)
    val pqSpec = HybridStore.PqSpec(m = 3, ksub = 4, maxIter = 5,
      refineFactor = 2)
    def open() = new HybridStore(spark, root, cfg,
      incrementalPq = Some(pqSpec))
    def vec(i: Long) = Array.tabulate(3)(j => (math.sin(i * 1.9 + j) * 5).toFloat)
    def pqPieceDirs = Option(new java.io.File(s"$root/_pq").listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("seg="))
      .map(_.getName).toSet
    var hs = open()
    hs.append((1L to 6L).map(i => (i, vec(i))).toDF("id", "vector"))
    hs.append((7L to 9L).map(i => (i, vec(i))).toDF("id", "vector"))
    assert(hs.search(queryVec = Some(q(vec(3L)))).collect().nonEmpty)
    assert(pqPieceDirs == Set("seg=0", "seg=1"))
    hs.compact()
    val collapsed = hs.store.segments().max
    assert(pqPieceDirs == Set("seg=0", "seg=1", s"seg=$collapsed"))
    hs.close()
    assert(pqPieceDirs == Set(s"seg=$collapsed"),
      s"writer close left superseded PQ piece dirs: $pqPieceDirs")
    assert(new java.io.File(s"$root/_pq/_model").isDirectory,
      "the trained model must survive the piece vacuum")
    hs = open()
    assert(hs.search(queryVec = Some(q(vec(3L)))).collect().nonEmpty)
    hs.close()
  }
}
