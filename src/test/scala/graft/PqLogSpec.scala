package graft

import graft.hybrid.Hybrid
import graft.store.HybridStore
import org.apache.spark.sql.functions._

/** Lifecycle, crash-window, and guard-matrix rows for the QUANTIZED
  * incremental store leg ([[graft.vector.PqLog]] behind
  * `HybridStore(incrementalPq = ...)`): codebooks train once, segments
  * fold in as encode-only `(id, codes)` pieces, and serving is ADC +
  * exact refine — the reference's train-once /
  * flush-segments-as-serialized-indexes contract over its quantized
  * index kind (storage.go:321-347, storage.go:680-760,
  * pq_index_test.go:350-454 Remove/Flush semantics). */
class PqLogSpec extends SparkSpec {

  private def vecOf(i: Long): Array[Float] =
    Array.tabulate(4)(j => (math.sin(i * 1.7 + j * 0.9) * 3).toFloat)

  // corpus-covering refine at k=1000: the leg is exhaustive-exact, so
  // the flat-legged twin must match to fp rounding
  private val cfg = Hybrid.Config(k = 1000, fusion = Hybrid.Rrf)
  private val spec = HybridStore.PqSpec(m = 2, ksub = 4, maxIter = 5,
    refineFactor = 1)

  test("randomized append/replace/delete/compact/reopen soak: the " +
       "quantized leg (encode-only pieces + markers + corpus-covering " +
       "refine) equals the flat-legged twin at every step (two seeds)") {
    val s = spark
    import s.implicits._
    def soak(seed: Long, steps: Int): Unit = {
      val rnd = new scala.util.Random(seed)
      val root = java.nio.file.Files.createTempDirectory(s"pqsoak$seed").toString
      val rootF = java.nio.file.Files.createTempDirectory(s"pqsoakf$seed").toString
      def open() = new HybridStore(spark, root, cfg, incrementalPq = Some(spec))
      var hs = open()
      var twin = new HybridStore(spark, rootF, cfg)
      var nextId = 0L
      var live = Set.empty[Long]
      def rows(ids: Seq[Long]) = ids.map { id =>
        (id, vecOf(id), s"body doc$id marker${id % 3} shared probe")
      }.toDF("id", "vector", "text")

      def check(step: Int): Unit = {
        if (live.isEmpty) return
        val qv = Seq((0L, vecOf(7L))).toDF("qid", "qvec")
        val gotV = hs.search(queryVec = Some(qv))
          .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
          .toSeq
        val wantV = twin.search(queryVec = Some(qv))
          .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
          .toSeq
        assert(gotV == wantV,
          s"seed=$seed step=$step quantized leg diverged: $gotV vs $wantV")
        // fused hybrid (both modalities) agrees too
        val gotH = hs.search(queryVec = Some(qv),
            queryText = Some("shared probe"))
          .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
          .toSeq
        val wantH = twin.search(queryVec = Some(qv),
            queryText = Some("shared probe"))
          .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
          .toSeq
        assert(gotH == wantH, s"seed=$seed step=$step fused hybrid diverged")
      }

      (0 until steps).foreach { step =>
        rnd.nextInt(7) match {
          case 0 | 1 =>
            val ids = (0 until 1 + rnd.nextInt(3)).map { _ =>
              val id = nextId; nextId += 1; id
            }
            hs.append(rows(ids)); twin.append(rows(ids)); live ++= ids
          case 2 => // replace live ids (codes re-derive from the new row)
            if (live.nonEmpty) {
              val victims = rnd.shuffle(live.toSeq).take(1 + rnd.nextInt(2))
              def batch = victims.map { id =>
                (id, vecOf(id + 1000), s"revised doc$id probe")
              }.toDF("id", "vector", "text")
              hs.append(batch); twin.append(batch)
            }
          case 3 => // delete (sometimes an unknown id too)
            if (live.nonEmpty) {
              val victims = rnd.shuffle(live.toSeq).take(1 + rnd.nextInt(2))
              hs.delete(victims :+ 99999L)
              twin.delete(victims :+ 99999L)
              live --= victims
            }
          case 4 => // compact: pieces collapse, markers reset, codebooks survive
            if (hs.store.segments().nonEmpty) { hs.compact(); twin.compact() }
          case _ => // reopen: durable pieces + persisted codebooks reload
            hs.close(); hs = open()
            twin.close(); twin = new HybridStore(spark, rootF, cfg)
        }
        check(step)
      }
      hs.close(); twin.close()
    }
    soak(seed = 19L, steps = 12)
    soak(seed = 83L, steps = 12)
  }

  test("PqLog crash windows: a piece missing its _SUCCESS re-encodes " +
       "from its segment; a model missing its _COMMIT retrains AND " +
       "re-encodes every piece (codes under a lost codebook are never " +
       "trusted); results equal the pre-crash state in every window") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("pqcrash").toString
    def open() = new HybridStore(spark, root, cfg, incrementalPq = Some(spec))
    def rows(ids: Seq[Long]) = ids.map { id =>
      (id, vecOf(id), s"body doc$id shared probe")
    }.toDF("id", "vector", "text")
    val qv = Seq((0L, vecOf(4L))).toDF("qid", "qvec")

    var hs = open()
    hs.append(rows(0L until 5L))
    hs.append(rows(5L until 9L))
    hs.delete(Seq(3L))
    val want = hs.search(queryVec = Some(qv))
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
    hs.close()

    // window 1: piece parquet committed but _SUCCESS lost — only that
    // piece re-encodes; its neighbor is untouched
    assert(new java.io.File(s"$root/_pq/seg=1/_SUCCESS").delete())
    def pieceFp(seg: Long) = new java.io.File(s"$root/_pq/seg=$seg")
      .listFiles().map(f => f.getName -> f.lastModified()).toMap
    val p0Before = pieceFp(0L)
    hs = open()
    val got1 = hs.search(queryVec = Some(qv))
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
    assert(got1 == want, s"marker-less piece reopen diverged: $got1 vs $want")
    assert(new java.io.File(s"$root/_pq/seg=1/_SUCCESS").exists(),
      "re-encoded piece not re-committed")
    assert(pieceFp(0L) == p0Before,
      "an intact piece was rewritten while re-encoding its neighbor")
    hs.close()

    // window 2: model dirs present but _COMMIT lost — retrain, and every
    // piece re-encodes (codes under the LOST codebooks are never loaded)
    assert(new java.io.File(s"$root/_pq/_model/_COMMIT").delete())
    val fpBefore = Seq(0L, 1L).map(pieceFp)
    hs = open()
    val got2 = hs.search(queryVec = Some(qv))
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
    assert(got2 == want, s"model-less reopen diverged: $got2 vs $want")
    assert(new java.io.File(s"$root/_pq/_model/_COMMIT").exists(),
      "retrained model not re-committed")
    val fpAfter = Seq(0L, 1L).map(pieceFp)
    assert(fpBefore.zip(fpAfter).forall { case (b, a) => b != a },
      "pieces coded under the LOST codebooks were trusted instead of " +
        "re-encoded — the silently-mixed-quantizer window")
    hs.close()
  }

  test("PqLog retrain commit ordering (window 3): _COMMIT is withheld " +
       "until every piece is re-encoded — a crash mid-re-encode leaves " +
       "the model uncommitted, so the next open retrains instead of " +
       "trusting codes from the lost codebooks") {
    val s = spark
    import s.implicits._
    import graft.vector.{Metric, PqLog}
    val root = java.nio.file.Files.createTempDirectory("pqretrain").toString
    def segFrame(seg: Long) =
      (seg * 4 until seg * 4 + 4).map(id => (id, vecOf(id)))
        .toDF("id", "vector")
    val segs = Seq(0L, 1L)
    def trainOn = segs.map(segFrame).reduce(_ unionByName _)
    val log0 = PqLog.reopen(spark, root, segs, segFrame, None, trainOn,
      m = 2, ksub = 4, maxIter = 3)
    val want = log0.liveCodes.select("id").collect().map(_.getLong(0)).toSet
    log0.release()
    assert(new java.io.File(s"$root/_model/_COMMIT").exists())

    assert(new java.io.File(s"$root/_model/_COMMIT").delete())
    intercept[RuntimeException] {
      PqLog.reopen(spark, root, segs,
        n => if (n == 1L) throw new RuntimeException("simulated crash")
             else segFrame(n),
        None, trainOn, m = 2, ksub = 4, maxIter = 3)
    }
    assert(!new java.io.File(s"$root/_model/_COMMIT").exists(),
      "model marker committed before re-encode finished — the " +
        "mixed-quantizer crash window is open")

    val log2 = PqLog.reopen(spark, root, segs, segFrame, None, trainOn,
      m = 2, ksub = 4, maxIter = 3)
    assert(new java.io.File(s"$root/_model/_COMMIT").exists(),
      "recovered open did not re-commit the model")
    val got = log2.liveCodes.select("id").collect().map(_.getLong(0)).toSet
    assert(got == want, s"recovered state diverged: $got vs $want")
    log2.release()
  }

  test("PqLog reopen guard matrix (codebook state): metric mismatch " +
       "throws (PQ codebooks SCORE in their training space, stricter " +
       "than VecLog's train-space guard); OPQ mismatch throws in BOTH " +
       "directions; matching config reopens clean") {
    val s = spark
    import s.implicits._
    import graft.vector.{Metric, PqLog}
    def segFrame(seg: Long) =
      (seg * 8 until seg * 8 + 8).map(id => (id, vecOf(id)))
        .toDF("id", "vector")
    val segs = Seq(0L)
    def trainOn = segFrame(0L)

    // plain L2 artifact
    val root1 = java.nio.file.Files.createTempDirectory("pqguard1").toString
    PqLog.reopen(spark, root1, segs, segFrame, None, trainOn,
      m = 2, ksub = 4, maxIter = 3, metric = Metric.L2).release()
    // L2 vs L2Sq is a DIFFERENT metric even though it is the same train
    // space — ADC reports sqrt vs squared distances
    val e1 = intercept[IllegalStateException](
      PqLog.reopen(spark, root1, segs, segFrame, None, trainOn,
        m = 2, ksub = 4, maxIter = 3, metric = Metric.L2Sq))
    assert(e1.getMessage.contains("trained under"))
    val e2 = intercept[IllegalStateException](
      PqLog.reopen(spark, root1, segs, segFrame, None, trainOn,
        m = 2, ksub = 4, maxIter = 3, metric = Metric.Cosine))
    assert(e2.getMessage.contains("trained under"))
    // configuring OPQ over a rotation-less artifact throws
    val e3 = intercept[IllegalStateException](
      PqLog.reopen(spark, root1, segs, segFrame, None, trainOn,
        m = 2, ksub = 4, maxIter = 3, opq = true))
    assert(e3.getMessage.contains("WITHOUT an OPQ rotation"))
    // matching config reopens clean (and m/ksub are artifact-authoritative:
    // a different configured shape does NOT retrain)
    val clean = PqLog.reopen(spark, root1, segs, segFrame, None, trainOn,
      m = 4, ksub = 2, maxIter = 3, metric = Metric.L2)
    assert(clean.model.m == 2, "persisted codebook shape must win")
    clean.release()

    // OPQ artifact: dropping the opq configuration throws
    val root2 = java.nio.file.Files.createTempDirectory("pqguard2").toString
    val opqLog = PqLog.reopen(spark, root2, segs, segFrame, None, trainOn,
      m = 2, ksub = 4, maxIter = 3, opq = true)
    assert(opqLog.model.rotation.nonEmpty)
    opqLog.release()
    val e4 = intercept[IllegalStateException](
      PqLog.reopen(spark, root2, segs, segFrame, None, trainOn,
        m = 2, ksub = 4, maxIter = 3, opq = false))
    assert(e4.getMessage.contains("carries an OPQ rotation"))
    // matching OPQ config reopens clean with the persisted rotation
    val opqClean = PqLog.reopen(spark, root2, segs, segFrame, None, trainOn,
      m = 2, ksub = 4, maxIter = 3, opq = true)
    assert(opqClean.model.rotation.nonEmpty)
    opqClean.release()
  }

  test("OPQ composed into the quantized leg (PqSpec(opq = true)): the " +
       "rotation trains once, persists under _pq/_model/rotation, " +
       "encode/distTable rotate transparently, and the corpus-covering " +
       "refined leg still equals the flat twin across mutations + reopen") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("pqopq").toString
    val rootF = java.nio.file.Files.createTempDirectory("pqopqf").toString
    val opqSpec = spec.copy(opq = true)
    def open() = new HybridStore(spark, root, cfg,
      incrementalPq = Some(opqSpec))
    def rows(ids: Seq[Long]) = ids.map { id =>
      (id, vecOf(id), s"body doc$id shared probe")
    }.toDF("id", "vector", "text")
    val qv = Seq((0L, vecOf(3L))).toDF("qid", "qvec")
    var hs = open()
    val twin = new HybridStore(spark, rootF, cfg)
    hs.append(rows(0L until 6L)); twin.append(rows(0L until 6L))
    hs.search(queryVec = Some(qv)).count() // seed (trains + rotation)
    assert(new java.io.File(s"$root/_pq/_model/rotation/_SUCCESS").exists(),
      "OPQ rotation not persisted beside the codebooks")
    hs.append(rows(6L until 10L)); twin.append(rows(6L until 10L))
    hs.delete(Seq(2L)); twin.delete(Seq(2L))
    def got() = hs.search(queryVec = Some(qv))
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
    val want = twin.search(queryVec = Some(qv))
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
    assert(got() == want, "OPQ quantized leg diverged from flat twin")
    // reopen: rotation + codebooks reload, pieces load without re-encode
    hs.close(); hs = open()
    assert(got() == want, "OPQ quantized leg diverged after reopen")
    hs.close(); twin.close()
  }

  test("ROUTED quantized leg (PqSpec(nlist > 0) — the IVFPQ composition, " +
       "ivfpq_index.go:467-542): pieces carry a cluster column, codes are " +
       "residuals, and at probe-all with corpus-covering refine the leg " +
       "equals the flat twin across mutations + reopen") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("pqrouted").toString
    val rootF = java.nio.file.Files.createTempDirectory("pqroutedf").toString
    val routedSpec = spec.copy(nlist = 3, nprobe = 3)
    def open() = new HybridStore(spark, root, cfg,
      incrementalPq = Some(routedSpec))
    def rows(ids: Seq[Long]) = ids.map { id =>
      (id, vecOf(id), s"body doc$id shared probe")
    }.toDF("id", "vector", "text")
    val qv = Seq((0L, vecOf(3L))).toDF("qid", "qvec")
    var hs = open()
    val twin = new HybridStore(spark, rootF, cfg)
    hs.append(rows(0L until 6L)); twin.append(rows(0L until 6L))
    hs.search(queryVec = Some(qv)).count() // seed: trains coarse + codebooks
    // the coarse centroids are train-time state persisted beside the
    // codebooks under the same _COMMIT protocol
    assert(new java.io.File(s"$root/_pq/_model/coarse/_SUCCESS").exists(),
      "coarse centroids not persisted beside the codebooks")
    // routed pieces carry the coarse assignment — what makes probed-list
    // (O(corpus/nlist)) serving possible
    val pieceSchema = spark.read.parquet(s"$root/_pq/seg=0").columns.toSet
    assert(pieceSchema == Set("id", "cluster", "codes"),
      s"routed piece schema: $pieceSchema")
    hs.append(rows(6L until 10L)); twin.append(rows(6L until 10L))
    hs.delete(Seq(2L)); twin.delete(Seq(2L))
    def got() = hs.search(queryVec = Some(qv))
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
    val want = twin.search(queryVec = Some(qv))
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
    assert(got() == want, "routed quantized leg diverged from flat twin")
    // reopen: coarse + codebooks reload, pieces load without re-encode
    hs.close(); hs = open()
    assert(got() == want, "routed quantized leg diverged after reopen")
    hs.close(); twin.close()
  }

  test("ROUTED bounded probe: with nprobe < nlist a member query still " +
       "finds itself (its own list is by construction the nearest one) " +
       "and agrees with the flat twin's top-1 — the O(corpus/nlist) " +
       "serving shape, deterministic by the nearest-list argument") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("pqprobe").toString
    val rootF = java.nio.file.Files.createTempDirectory("pqprobef").toString
    val probeSpec = HybridStore.PqSpec(m = 2, ksub = 4, maxIter = 5,
      refineFactor = 4, nlist = 3, nprobe = 1)
    val kcfg = Hybrid.Config(k = 3, fusion = Hybrid.Rrf)
    val hs = new HybridStore(spark, root, kcfg, incrementalPq = Some(probeSpec))
    val twin = new HybridStore(spark, rootF, kcfg)
    val d = (0L until 12L).map { id =>
      (id, vecOf(id), s"body doc$id")
    }.toDF("id", "vector", "text")
    hs.append(d); twin.append(d)
    Seq(1L, 5L, 9L).foreach { id =>
      val qv = Seq((0L, vecOf(id))).toDF("qid", "qvec")
      val got = hs.search(queryVec = Some(qv)).collect()
      val want = twin.search(queryVec = Some(qv)).collect()
      // vector-only hybrid ranks farthest-FIRST (the reference's score-desc
      // sort over lower-better distances, Hybrid.scala step 5), so the
      // distance-0 self-match is the LAST row of the k kept
      assert(got.last.getLong(0) == id,
        s"member query $id not found under nprobe=1: " +
          got.map(_.getLong(0)).mkString(","))
      assert(want.last.getLong(0) == id &&
          math.abs(got.last.getDouble(1) - want.last.getDouble(1)) < 1e-9,
        s"routed self-match score for member query $id diverged from twin")
    }
    hs.close(); twin.close()
  }

  test("ROUTED reopen guard matrix: routed↔unrouted flips throw in BOTH " +
       "directions (residual codes served as plain codes are silently " +
       "wrong, not an error); nlist's VALUE is artifact-authoritative; " +
       "outer-metric mismatch throws; routed OPQ persists the WHOLE-SPACE " +
       "rotation with a rotation-free inner model") {
    val s = spark
    import s.implicits._
    import graft.vector.{Metric, PqLog}
    def segFrame(seg: Long) =
      (seg * 8 until seg * 8 + 8).map(id => (id, vecOf(id)))
        .toDF("id", "vector")
    val segs = Seq(0L)
    def trainOn = segFrame(0L)

    // routed artifact
    val root1 = java.nio.file.Files.createTempDirectory("pqrguard1").toString
    val routed = PqLog.reopen(spark, root1, segs, segFrame, None, trainOn,
      m = 2, ksub = 4, maxIter = 3, nlist = 3)
    assert(routed.coarse.nonEmpty && routed.coarse.get.centroids.length == 3)
    routed.release()
    // reopened unrouted → throws
    val e1 = intercept[IllegalStateException](
      PqLog.reopen(spark, root1, segs, segFrame, None, trainOn,
        m = 2, ksub = 4, maxIter = 3))
    assert(e1.getMessage.contains("coarse-ROUTED"))
    // nlist's VALUE is artifact-authoritative (like m/ksub): a different
    // configured nlist does NOT retrain — the persisted centroids win
    val clean = PqLog.reopen(spark, root1, segs, segFrame, None, trainOn,
      m = 2, ksub = 4, maxIter = 3, nlist = 7)
    assert(clean.coarse.get.centroids.length == 3,
      "persisted coarse shape must win over the configured nlist")
    clean.release()
    // outer-metric mismatch throws (the serving score space)
    val e2 = intercept[IllegalStateException](
      PqLog.reopen(spark, root1, segs, segFrame, None, trainOn,
        m = 2, ksub = 4, maxIter = 3, metric = Metric.Cosine, nlist = 3))
    assert(e2.getMessage.contains("trained under"))

    // unrouted artifact reopened routed → throws
    val root2 = java.nio.file.Files.createTempDirectory("pqrguard2").toString
    PqLog.reopen(spark, root2, segs, segFrame, None, trainOn,
      m = 2, ksub = 4, maxIter = 3).release()
    val e3 = intercept[IllegalStateException](
      PqLog.reopen(spark, root2, segs, segFrame, None, trainOn,
        m = 2, ksub = 4, maxIter = 3, nlist = 3))
    assert(e3.getMessage.contains("UNROUTED"))

    // routed + OPQ: the rotation slot holds the WHOLE-SPACE rotation
    // (applied before the coarse quantizer); the inner residual model is
    // rotation-free (IvfPq.Index's own invariant); dropping opq throws
    val root3 = java.nio.file.Files.createTempDirectory("pqrguard3").toString
    val ropq = PqLog.reopen(spark, root3, segs, segFrame, None, trainOn,
      m = 2, ksub = 4, maxIter = 3, opq = true, nlist = 3)
    assert(ropq.outerRotation.nonEmpty, "whole-space rotation not loaded")
    assert(ropq.model.rotation.isEmpty,
      "inner residual model must stay rotation-free in routed mode")
    ropq.release()
    val e4 = intercept[IllegalStateException](
      PqLog.reopen(spark, root3, segs, segFrame, None, trainOn,
        m = 2, ksub = 4, maxIter = 3, opq = false, nlist = 3))
    assert(e4.getMessage.contains("carries an OPQ rotation"))
    val ropq2 = PqLog.reopen(spark, root3, segs, segFrame, None, trainOn,
      m = 2, ksub = 4, maxIter = 3, opq = true, nlist = 3)
    assert(ropq2.outerRotation.nonEmpty && ropq2.model.rotation.isEmpty)
    ropq2.release()
  }

  test("ROUTED crash window: a routed artifact whose _COMMIT is lost " +
       "retrains under the CONFIGURED routing — an unrouted retrain " +
       "deletes the stale coarse dir (resurrecting it onto fresh plain " +
       "codebooks would serve plain codes as residuals), and the " +
       "artifact's routing flips accordingly for later reopens") {
    val s = spark
    import s.implicits._
    import graft.vector.PqLog
    def segFrame(seg: Long) =
      (seg * 6 until seg * 6 + 6).map(id => (id, vecOf(id)))
        .toDF("id", "vector")
    val segs = Seq(0L)
    def trainOn = segFrame(0L)
    val root = java.nio.file.Files.createTempDirectory("pqrcrash").toString
    PqLog.reopen(spark, root, segs, segFrame, None, trainOn,
      m = 2, ksub = 4, maxIter = 3, nlist = 3).release()
    assert(new java.io.File(s"$root/_model/coarse/_SUCCESS").exists())
    // crash window: _COMMIT lost → next open retrains under its OWN
    // configuration; configured unrouted, the stale coarse dir must go
    assert(new java.io.File(s"$root/_model/_COMMIT").delete())
    val unrouted = PqLog.reopen(spark, root, segs, segFrame, None, trainOn,
      m = 2, ksub = 4, maxIter = 3)
    assert(unrouted.coarse.isEmpty)
    unrouted.release()
    assert(!new java.io.File(s"$root/_model/coarse/_SUCCESS").exists(),
      "stale coarse centroids survived an unrouted retrain — a later " +
        "routed reopen would trust them against plain codes")
    // the artifact is now genuinely unrouted: clean unrouted reopen,
    // routed reopen throws
    PqLog.reopen(spark, root, segs, segFrame, None, trainOn,
      m = 2, ksub = 4, maxIter = 3).release()
    val e = intercept[IllegalStateException](
      PqLog.reopen(spark, root, segs, segFrame, None, trainOn,
        m = 2, ksub = 4, maxIter = 3, nlist = 3))
    assert(e.getMessage.contains("UNROUTED"))
  }

  test("bounded refine is the production shape: ADC keeps k·refineFactor " +
       "candidates, refined scores are EXACT distances, and recall@10 " +
       "over a 300-row corpus beats the raw code scan") {
    val s = spark
    import s.implicits._
    import graft.vector.{FlatKnn, Pq}
    val data = (0L until 300L).map(i =>
      (i, Array.tabulate(8)(j => (math.sin(i * 0.37 + j * 1.3) * 5).toFloat)))
      .toDF("id", "vector")
    val model = Pq.train(data, m = 4, ksub = 16, maxIter = 5)
    val enc = Pq.encode(data, model)
    val q = Seq((0L, Array.tabulate(8)(j => (math.cos(j * 0.9) * 4).toFloat)))
      .toDF("qid", "qvec")
    val exact = FlatKnn.search(data, q, 10).collect()
      .map(_.getLong(1)).toSet
    def recall(ids: Set[Long]) = (ids & exact).size / 10.0
    val adc = Pq.search(enc, model, q, 10).collect().map(_.getLong(1)).toSet
    val refined = Pq.searchRefined(enc, model, data, q, 10, refineFactor = 8)
      .collect()
    val refinedIds = refined.map(_.getLong(1)).toSet
    assert(recall(refinedIds) >= recall(adc),
      s"refine must not lose recall: ${recall(refinedIds)} < ${recall(adc)}")
    assert(recall(refinedIds) >= 0.8,
      s"refine@8 recall too low: ${recall(refinedIds)}")
    // refined scores are the EXACT distances of the returned ids
    val flatAll = FlatKnn.search(data, q, 300).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    refined.foreach { r =>
      assert(math.abs(r.getDouble(2) - flatAll(r.getLong(1))) < 1e-9,
        s"refined score for id ${r.getLong(1)} is not the exact distance")
    }
    // threshold applies to the exact refined distances, pre-top-k
    val t = refined.map(_.getDouble(2)).sorted.apply(4)
    val cut = Pq.searchRefined(enc, model, data, q, 10, refineFactor = 8,
      threshold = Some(t)).collect()
    assert(cut.length == 5, s"threshold cut kept ${cut.length} of 5")
    assert(cut.forall(_.getDouble(2) <= t))
  }

  test("ROUTED leg through the FACADE at bounded nprobe (r15 ask #6): a " +
       "metadata-filtered vector search over a routed store at nprobe=2 " +
       "returns a SUBSET of the probe-all ids with bit-equal scores on " +
       "the intersection — the candidate pre-filter composes with " +
       "probed-list pruning — and the fused text+vector path at bounded " +
       "nprobe serves filter-correct results too") {
    val s = spark
    import s.implicits._
    import graft.filter.{Filter, FilterGroup}
    val root = java.nio.file.Files.createTempDirectory("pqfacadeprobe").toString
    val routed = HybridStore.PqSpec(m = 2, ksub = 4, maxIter = 5,
      refineFactor = 4, nlist = 3, nprobe = 2) // bounded production shape
    // nprobe is a SERVING parameter, not codebook state: reopening the
    // same artifact at a different nprobe is legal (unlike nlist/metric/
    // opq flips, which the guard matrix throws on)
    def open(np: Int) = new HybridStore(spark, root,
      Hybrid.Config(k = 1000, fusion = Hybrid.Rrf),
      incrementalPq = Some(routed.copy(nprobe = np)))
    def rows(ids: Seq[Long]) = ids.map { id =>
      (id, vecOf(id), s"body doc$id shared probe", id % 4)
    }.toDF("id", "vector", "text", "bucket")
    val w = open(2)
    w.append(rows(0L until 24L))
    w.append(rows(Seq(3L))) // replacement — markers in play
    w.delete(Seq(5L))       // tombstone — live-view mask in play
    val qv = Seq((0L, vecOf(7L))).toDF("qid", "qvec")
    val filters = Seq(FilterGroup(Seq(Filter.Eq("bucket", 1L))))
    def scored(hs: HybridStore) =
      hs.search(filters, queryVec = Some(qv))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bounded = scored(w)
    w.close()
    val all = open(3) // probe-all over the same artifact
    val full = scored(all)
    all.close()
    val wantIds = ((0L until 24L).toSet - 5L).filter(_ % 4 == 1)
    assert(full.keySet == wantIds,
      s"probe-all filtered ids wrong: ${full.keySet} vs $wantIds")
    assert(bounded.nonEmpty, "bounded probe returned nothing")
    assert(bounded.keySet.subsetOf(full.keySet),
      s"bounded-probe ids not a subset: ${bounded.keySet} vs ${full.keySet}")
    bounded.foreach { case (id, score) =>
      assert(java.lang.Double.doubleToLongBits(score) ==
          java.lang.Double.doubleToLongBits(full(id)),
        s"score for $id not bit-equal: $score vs ${full(id)} — refine " +
          "must be EXACT regardless of nprobe")
    }
    // every bounded-probe id satisfies the metadata filter (the
    // pre-filter composed with the probed-list pruning, not after it)
    assert(bounded.keySet.forall(_ % 4 == 1),
      s"filter leaked through the bounded probe: ${bounded.keySet}")
    // fused hybrid (text + vector) at bounded nprobe: serves, respects
    // the filter, and never surfaces the deleted id (fusion-correct —
    // RRF ranks shift with the candidate set, so score equality is a
    // vector-leg property, asserted above, not a fused-list one)
    val fused = open(2)
    val hybrid = fused.search(filters, queryVec = Some(qv),
        queryText = Some("shared probe"))
      .collect().map(_.getLong(0)).toSet
    fused.close()
    assert(hybrid.nonEmpty && hybrid.forall(_ % 4 == 1) &&
        !hybrid.contains(5L),
      s"fused bounded-probe search filter/tombstone violation: $hybrid")
  }
}
