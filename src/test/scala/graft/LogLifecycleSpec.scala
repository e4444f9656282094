package graft

import graft.hybrid.Hybrid
import graft.store.HybridStore
import graft.text.BM25
import org.apache.spark.sql.functions._

/** Randomized lifecycle soak for the INCREMENTAL derived-state logs
  * (BM25Log + VecLog) behind the store facade: random mutation sequences
  * (append fresh / replace live / null-modality replace / delete /
  * compact / reopen) must keep
  *
  *   - ranked TEXT search equal to a from-scratch `BM25.build` over the
  *     live view (the bm25_index.go:327-334 incremental contract), and
  *   - vector search through the assign-only IVF leg (probe-all) equal
  *     to an exact flat scan of the live vectors,
  *
  * at EVERY step — the randomized twin of the deterministic equivalence
  * soak in HybridStoreSpec, in the PqLifecycleSpec tradition. */
class LogLifecycleSpec extends SparkSpec {

  private def vecOf(i: Long): Array[Float] =
    Array.tabulate(4)(j => (math.sin(i * 1.7 + j * 0.9) * 3).toFloat)

  test("randomized append/replace/delete/compact/reopen soak: incremental " +
       "text AND vector state equal their rebuilt oracles at every step " +
       "(two seeds)") {
    val s = spark
    import s.implicits._
    def soak(seed: Long, steps: Int): Unit = {
      val rnd = new scala.util.Random(seed)
      val root = java.nio.file.Files.createTempDirectory(s"logsoak$seed").toString
      val rootF = java.nio.file.Files.createTempDirectory(s"logsoakf$seed").toString
      val cfg = Hybrid.Config(k = 1000, fusion = Hybrid.Rrf) // k >> corpus
      def open() = new HybridStore(spark, root, cfg,
        incrementalIvf = Some((2, 2)))
      var hs = open()
      // the TWIN: identical mutations through the default (rebuild-per-
      // generation, flat-legged) store — same search semantics, so full
      // outputs must match exactly
      var twin = new HybridStore(spark, rootF, cfg)
      var nextId = 0L
      var live = Set.empty[Long]
      def rows(ids: Seq[Long], nullText: Boolean = false) = ids.map { id =>
        (id, vecOf(id),
          if (nullText) Option.empty[String]
          else Some(s"body doc$id marker${id % 3} shared probe"))
      }.toDF("id", "vector", "text")

      def check(step: Int): Unit = {
        if (live.isEmpty) return
        // text: ranked scores vs a fresh build over the live view
        val got = hs.search(queryText = Some("shared probe marker1"))
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        val liveView = hs.read()
        val textRows = liveView.filter(col("text").isNotNull)
        if (textRows.head(1).nonEmpty) {
          val c = BM25.build(textRows.select("id", "text"), "id", "text")
          // the hybrid text leg is RRF-fused; compare MEMBERSHIP + order
          // against the raw corpus ranking instead of raw scores
          val want = c.search("shared probe marker1", 1000)
            .collect().map(_.getLong(0)).toSeq
          assert(got.map(_._1) == want,
            s"seed=$seed step=$step text ranking diverged: " +
              s"${got.map(_._1)} vs $want")
        }
        // vector: probe-all incremental IVF leg vs the TWIN's flat leg —
        // same hybrid semantics on both sides, so (id, score) rows must
        // match exactly (to fp rounding)
        val qv = Seq((0L, vecOf(7L))).toDF("qid", "qvec")
        val gotV = hs.search(queryVec = Some(qv))
          .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
          .toSeq
        val wantV = twin.search(queryVec = Some(qv))
          .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
          .toSeq
        assert(gotV == wantV,
          s"seed=$seed step=$step vector leg diverged: $gotV vs $wantV")
        // and the combined hybrid (both modalities fused) agrees too
        val gotH = hs.search(queryVec = Some(qv),
            queryText = Some("shared probe"))
          .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
          .toSeq
        val wantH = twin.search(queryVec = Some(qv),
            queryText = Some("shared probe"))
          .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9)))
          .toSeq
        assert(gotH == wantH,
          s"seed=$seed step=$step fused hybrid diverged")
      }

      (0 until steps).foreach { step =>
        rnd.nextInt(7) match {
          case 0 | 1 => // append fresh
            val ids = (0 until 1 + rnd.nextInt(3)).map { _ =>
              val id = nextId; nextId += 1; id
            }
            hs.append(rows(ids)); twin.append(rows(ids)); live ++= ids
          case 2 => // replace live ids (new text revision, new vector)
            if (live.nonEmpty) {
              val victims = rnd.shuffle(live.toSeq).take(1 + rnd.nextInt(2))
              def batch = victims.map { id =>
                (id, vecOf(id + 1000),
                  Some(s"revised doc$id probe r${(id * 31 + seed) % 100}"))
              }.toDF("id", "vector", "text")
              hs.append(batch); twin.append(batch)
            }
          case 3 => // replace a live id with NULL text (leaves the corpus)
            if (live.nonEmpty) {
              val victim = rnd.shuffle(live.toSeq).head
              hs.append(rows(Seq(victim), nullText = true))
              twin.append(rows(Seq(victim), nullText = true))
            }
          case 4 => // delete (sometimes an unknown id too)
            if (live.nonEmpty) {
              val victims = rnd.shuffle(live.toSeq).take(1 + rnd.nextInt(2))
              hs.delete(victims :+ 99999L)
              twin.delete(victims :+ 99999L)
              live --= victims
            }
          case 5 => // compact
            if (hs.store.segments().nonEmpty) { hs.compact(); twin.compact() }
          case 6 => // reopen: durable pieces + persisted model reload (the
            // twin reopens too — both must rederive from disk alone)
            hs.close(); hs = open()
            twin.close(); twin = new HybridStore(spark, rootF, cfg)
        }
        check(step)
      }
      hs.close(); twin.close()
    }
    soak(seed = 11L, steps = 12)
    soak(seed = 47L, steps = 12)
  }
}
