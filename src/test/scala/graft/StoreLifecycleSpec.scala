package graft

import graft.store.SegmentStore
import graft.vector.{FlatKnn, Metric}
import org.apache.spark.sql.functions._

/** Storage lifecycle matrix — the interleavings the reference tests
  * hardest (`/root/reference/storage_test.go`,
  * `storage_memtable_test.go`, `storage_compaction_test.go`): flush under
  * concurrent adds, compaction × tombstone orderings, removes landing in
  * frozen segments, cache eviction with in-flight readers, reopen/resume.
  * Spark translation: memtable = micro-batch, freeze+flush = immutable
  * parquet segment, remove = segment-scoped delete marker, compaction =
  * live-view rewrite. */
class StoreLifecycleSpec extends SparkSpec {

  private def freshStore(): (SegmentStore, String) = {
    val root = java.nio.file.Files.createTempDirectory("lifecycle").toString
    (new SegmentStore(spark, root), root)
  }

  private def liveMap(store: SegmentStore): Map[Long, String] =
    store.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  // ---- single-writer lock (storage_provider_test.go:10-47) ----

  test("writer lock: second open fails while held, succeeds after close, " +
       "force breaks a stale lock") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("lock").toString
    val w1 = SegmentStore.open(spark, root)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/LOCK")))
    val e = intercept[IllegalStateException] { SegmentStore.open(spark, root) }
    assert(e.getMessage.contains("locked"))
    w1.append(Seq((1L, "a")).toDF("id", "text"))
    w1.close()
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/LOCK")))
    val w2 = SegmentStore.open(spark, root)     // lock released -> reopens
    assert(liveMap(w2) == Map(1L -> "a"))       // data survived the cycle
    // crash simulation: w2 never closes; a forced open breaks the lock
    val w3 = SegmentStore.open(spark, root, force = true)
    w3.append(Seq((2L, "b")).toDF("id", "text"))
    assert(liveMap(w3) == Map(1L -> "a", 2L -> "b"))
    w3.close()
  }

  // ---- segment stats (storage_segment_test.go:113-213) ----

  test("stats: per-segment bytes/files sum to totalBytes and track " +
       "append + compaction") {
    val s = spark
    import s.implicits._
    val (store, _) = freshStore()
    store.append(Seq((1L, "a"), (2L, "b")).toDF("id", "text"))
    store.append(Seq((3L, "c")).toDF("id", "text"))
    val st = store.stats()
    assert(st.map(_.seg) == Seq(0L, 1L))
    assert(st.forall(x => x.files >= 1 && x.bytes > 0))
    assert(store.totalBytes() == st.map(_.bytes).sum)
    store.delete(Seq(2L))
    val compacted = store.compact()
    val st2 = store.stats()
    assert(st2.map(_.seg) == Seq(compacted)) // old segments gone from stats
    assert(store.totalBytes() == st2.head.bytes)
  }

  test("totalBytes running cache: repeated polls between appends equal a " +
       "fresh per-segment listing at every step (the compaction-policy " +
       "loop must never act on a stale or drifted total)") {
    val s = spark
    import s.implicits._
    val (store, _) = freshStore()
    store.append(Seq((1L, "first segment body")).toDF("id", "text"))
    assert(store.totalBytes() == store.stats().map(_.bytes).sum) // seeds
    (2L to 5L).foreach { i =>
      store.append(Seq((i, s"segment $i payload body")).toDF("id", "text"))
      // poll twice per append (as a policy loop would): cached total must
      // track the incremental segment additions exactly
      assert(store.totalBytes() == store.stats().map(_.bytes).sum,
        s"cached total drifted after append $i")
      assert(store.totalBytes() == store.stats().map(_.bytes).sum)
    }
    store.compact()
    assert(store.totalBytes() == store.stats().map(_.bytes).sum,
      "cached total wrong after compaction re-seed")
    store.append(Seq((9L, "post compact")).toDF("id", "text"))
    assert(store.totalBytes() == store.stats().map(_.bytes).sum)
  }

  // ---- removes in frozen segments (storage_memtable_test.go:153-175) ----

  test("remove in a frozen segment: tombstone hides the id without " +
       "rewriting the segment") {
    val s = spark
    import s.implicits._
    val (store, root) = freshStore()
    store.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val segFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(root, "seg=0"))
      .filter(_.toString.endsWith(".parquet")).count()
    store.delete(Seq(1L))
    assert(liveMap(store) == Map(2L -> "b"))
    // the frozen segment was NOT rewritten — delete is data, not mutation
    val segFilesAfter = java.nio.file.Files.walk(java.nio.file.Paths.get(root, "seg=0"))
      .filter(_.toString.endsWith(".parquet")).count()
    assert(segFiles == segFilesAfter)
  }

  test("re-add after remove resurrects the doc (delete markers are " +
       "segment-scoped, not global bans)") {
    val s = spark
    import s.implicits._
    val (store, _) = freshStore()
    store.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    store.delete(Seq(1L))
    assert(liveMap(store) == Map(2L -> "b"))
    store.append(Seq((1L, "a2")).toDF("id", "v")) // newer segment: live again
    assert(liveMap(store) == Map(1L -> "a2", 2L -> "b"))
  }

  test("remove of a never-added id is harmless") {
    val s = spark
    import s.implicits._
    val (store, _) = freshStore()
    store.append(Seq((1L, "a")).toDF("id", "v"))
    store.delete(Seq(99L))
    assert(liveMap(store) == Map(1L -> "a"))
  }

  test("delete before any segment exists is inert for all later appends") {
    val s = spark
    import s.implicits._
    val (store, _) = freshStore()
    store.delete(Seq(1L)) // upto = -1: masks nothing that comes later
    store.append(Seq((1L, "a")).toDF("id", "v"))
    assert(liveMap(store) == Map(1L -> "a"))
  }

  // ---- compaction × tombstone interleavings (storage_compaction_test.go) ----

  test("tombstone -> compact -> tombstone: each step reads correctly and " +
       "compaction clears consumed markers") {
    val s = spark
    import s.implicits._
    val (store, root) = freshStore()
    store.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    store.append(Seq((4L, "d")).toDF("id", "v"))
    store.delete(Seq(2L))
    assert(liveMap(store) == Map(1L -> "a", 3L -> "c", 4L -> "d"))
    store.compact()
    assert(store.segments().length == 1)
    // markers are consumed by compaction but RETIRED, not deleted —
    // in-flight old-generation frames may still reference the files.
    // vacuum() is the point of physical deletion (normally the next
    // compact/close); after it the tombstone dir is gone
    store.vacuum()
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "tombstones")))
    assert(liveMap(store) == Map(1L -> "a", 3L -> "c", 4L -> "d"))
    store.delete(Seq(4L)) // fresh marker over the compacted segment
    assert(liveMap(store) == Map(1L -> "a", 3L -> "c"))
  }

  test("update -> delete -> update across three segments: the newest " +
       "write after the marker wins") {
    val s = spark
    import s.implicits._
    val (store, _) = freshStore()
    store.append(Seq((7L, "v1")).toDF("id", "v"))
    store.append(Seq((7L, "v2")).toDF("id", "v"))
    store.delete(Seq(7L))
    assert(liveMap(store) == Map.empty)
    store.append(Seq((7L, "v3")).toDF("id", "v"))
    assert(liveMap(store) == Map(7L -> "v3"))
    store.compact()
    assert(liveMap(store) == Map(7L -> "v3"))
  }

  test("delete everything then compact: empty live view compacts to an " +
       "empty readable store (TestCompactSegments_Empty)") {
    val s = spark
    import s.implicits._
    val (store, _) = freshStore()
    store.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    store.delete(Seq(1L, 2L))
    assert(liveMap(store) == Map.empty)
    store.compact()
    assert(store.segments().length == 1)
    assert(store.read().count() == 0)
    // the store keeps working after an empty compaction
    store.append(Seq((3L, "c")).toDF("id", "v"))
    assert(liveMap(store) == Map(3L -> "c"))
  }

  test("double compaction is stable (FlushTwice analog)") {
    val s = spark
    import s.implicits._
    val (store, _) = freshStore()
    store.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    store.append(Seq((2L, "b2")).toDF("id", "v"))
    store.compact()
    val afterFirst = liveMap(store)
    store.compact()
    assert(store.segments().length == 1)
    assert(liveMap(store) == afterFirst)
    assert(afterFirst == Map(1L -> "a", 2L -> "b2"))
  }

  // ---- flush under concurrent adds (TestPersistentHybridIndex_ConcurrentWrites) ----

  test("concurrent appenders: every batch lands in a distinct segment, " +
       "nothing is lost or silently overwritten") {
    val s = spark
    import s.implicits._
    val (store, _) = freshStore()
    val writers = 8
    // append() is errorifexists on the segment dir, so two racers can
    // collide on the same next-id — the loser gets an EXCEPTION, never a
    // silent overwrite. Writers serialize the id claim and retry, which
    // is the single-writer-per-segment contract the store documents.
    val lock = new Object
    val threads = (0 until writers).map { w =>
      new Thread(() => {
        val batch = Seq((w.toLong, s"w$w")).toDF("id", "v")
        lock.synchronized { store.append(batch); () }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(store.segments().length == writers)
    assert(store.segments() == (0L until writers.toLong))
    val live = liveMap(store)
    assert(live == (0 until writers).map(w => w.toLong -> s"w$w").toMap)
  }

  test("reader holding a pre-append live view is unaffected by a new " +
       "flush; a fresh read sees it (flush-under-read)") {
    val s = spark
    import s.implicits._
    val (store, _) = freshStore()
    store.append(Seq((1L, "a")).toDF("id", "v"))
    val oldView = store.read() // lazy plan over segment 0 only
    store.append(Seq((2L, "b")).toDF("id", "v"))
    // the in-flight reader still evaluates against its snapshot of segments
    assert(oldView.collect().map(_.getLong(0)).toSet == Set(1L))
    assert(liveMap(store) == Map(1L -> "a", 2L -> "b"))
  }

  // ---- cache eviction with in-flight searches (storage_segment.go:174-178) ----

  test("evictCache mid-search: a live-view frame obtained before eviction " +
       "still evaluates, and re-reads re-cache") {
    val s = spark
    import s.implicits._
    val (store, _) = freshStore()
    store.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    store.append(Seq((3L, "c")).toDF("id", "v"))
    val view = store.read()
    assert(view.count() == 3)
    store.evictCache() // drops cached segment frames; parquet stays
    // the pre-eviction plan re-reads from disk — no dangling cache refs
    assert(view.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    assert(liveMap(store).keySet == Set(1L, 2L, 3L))
  }

  test("search before vs after compaction returns the same documents " +
       "(CompactionWithSearch analog, vector leg included)") {
    val s = spark
    import s.implicits._
    val (store, _) = freshStore()
    val mkVec = (i: Long) => Array.tabulate(4)(j => (i + j).toFloat)
    store.append((1L to 10L).map(i => (i, mkVec(i))).toDF("id", "vector"))
    store.append((11L to 15L).map(i => (i, mkVec(i))).toDF("id", "vector"))
    store.delete(Seq(5L, 12L))
    val q = Seq((0L, mkVec(6L))).toDF("qid", "qvec")
    def top3(): Seq[Long] =
      FlatKnn.search(store.read(), q, 3, Metric.L2)
        .orderBy(col("score"), col("id")).collect().map(_.getLong(1)).toSeq
    val before = top3()
    store.compact()
    assert(top3() == before)
    assert(!before.contains(5L)) // the removed doc never surfaces
  }

  // ---- reopen / resume (TestPersistentHybridIndex_Persistence) ----

  test("reopening the store resumes monotonic segment ids and the " +
       "identical live view") {
    val s = spark
    import s.implicits._
    val (store, root) = freshStore()
    store.append(Seq((1L, "a")).toDF("id", "v"))
    store.append(Seq((2L, "b")).toDF("id", "v"))
    store.delete(Seq(1L))
    val reopened = new SegmentStore(spark, root)
    assert(reopened.segments() == Seq(0L, 1L))
    assert(liveMap(reopened) == Map(2L -> "b"))
    val next = reopened.append(Seq((3L, "c")).toDF("id", "v"))
    assert(next == 2L) // ids continue, never reused
    assert(liveMap(reopened) == Map(2L -> "b", 3L -> "c"))
  }

  test("segment ids stay monotonic across compaction (never reused)") {
    val s = spark
    import s.implicits._
    val (store, _) = freshStore()
    store.append(Seq((1L, "a")).toDF("id", "v"))   // seg 0
    store.append(Seq((2L, "b")).toDF("id", "v"))   // seg 1
    val compacted = store.compact()                // seg 2, drops 0..1
    assert(compacted == 2L)
    val next = store.append(Seq((3L, "c")).toDF("id", "v"))
    assert(next == 3L)
    assert(store.segments() == Seq(2L, 3L))
  }

  test("reserved bookkeeping column names are rejected at append") {
    val s = spark
    import s.implicits._
    val (store, _) = freshStore()
    intercept[IllegalArgumentException] {
      store.append(Seq((1L, "a", 0L)).toDF("id", "v", "_seg"))
    }
    intercept[IllegalArgumentException] {
      store.append(Seq((1L, "a", 0L)).toDF("id", "v", "upto"))
    }
  }

  test("bulk deleteFrom masks a whole id frame with one marker batch") {
    val s = spark
    import s.implicits._
    val (store, _) = freshStore()
    store.append((1L to 100L).map(i => (i, s"d$i")).toDF("id", "v"))
    store.deleteFrom(spark.range(1, 51).select(col("id")))
    assert(store.read().count() == 50)
    store.append(Seq((10L, "back")).toDF("id", "v"))
    val live = liveMap(store)
    assert(live.size == 51 && live(10L) == "back")
  }

  test("model-based soak: 40 random append/delete/compact ops against an " +
       "in-memory reference model (seeded)") {
    val s = spark
    import s.implicits._
    val (store, _) = freshStore()
    val rnd = new scala.util.Random(20260813)
    val model = scala.collection.mutable.Map.empty[Long, String]
    store.append(Seq((0L, "init")).toDF("id", "v")) // read() needs >= 1 segment
    model(0L) = "init"
    var rev = 0
    (0 until 40).foreach { step =>
      rnd.nextInt(5) match {
        case 0 | 1 => // append a batch of upserts
          rev += 1
          val ids = (0 until 1 + rnd.nextInt(4)).map(_ => rnd.nextInt(12).toLong).distinct
          store.append(ids.map(i => (i, s"v$rev-$i")).toDF("id", "v"))
          ids.foreach(i => model(i) = s"v$rev-$i")
        case 2 => // delete a batch (some ids may not exist — harmless)
          val ids = (0 until 1 + rnd.nextInt(3)).map(_ => rnd.nextInt(12).toLong).distinct
          store.delete(ids)
          ids.foreach(model.remove)
        case 3 => store.compact()
        case 4 => store.evictCache()
      }
      if (step % 8 == 7) // periodic full check keeps the soak honest mid-run
        assert(liveMap(store) == model.toMap, s"diverged at step $step")
    }
    assert(liveMap(store) == model.toMap)
    store.compact()
    assert(liveMap(store) == model.toMap, "post-final-compaction divergence")
  }

  test("exhaustive op-pair enumeration: every ordered pair of " +
       "{upsert, update, delete, delete-missing, compact} after a seeded " +
       "append matches the in-memory model") {
    // The reference's storage matrix enumerates op ADJACENCIES (flush right
    // after remove, remove right after flush, double compact, ...,
    // storage_memtable_test.go / storage_compaction_test.go); the random
    // soak above covers long sequences statistically, this covers every
    // length-2 adjacency deterministically. Ids 1-3 are seeded; op effects
    // are mirrored in a Map and the live view must equal it after the pair.
    val s = spark
    import s.implicits._
    type Op = (String, SegmentStore, scala.collection.mutable.Map[Long, String]) => Unit
    var rev = 0
    val ops: Seq[(String, Op)] = Seq(
      "upsertNew" -> ((tag, st, m) => {
        rev += 1
        st.append(Seq((10L + rev, s"n$rev")).toDF("id", "v"))
        m(10L + rev) = s"n$rev"
      }),
      "updateExisting" -> ((tag, st, m) => {
        rev += 1
        st.append(Seq((1L, s"u$rev")).toDF("id", "v"))
        m(1L) = s"u$rev"
      }),
      "deleteExisting" -> ((tag, st, m) => { st.delete(Seq(2L)); m.remove(2L); () }),
      "deleteMissing" -> ((tag, st, m) => st.delete(Seq(999L))),
      "compact" -> ((tag, st, m) => { st.compact(); () }),
    )
    for ((nameA, opA) <- ops; (nameB, opB) <- ops) {
      val (store, _) = freshStore()
      val model = scala.collection.mutable.Map(
        1L -> "a", 2L -> "b", 3L -> "c")
      store.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
      val tag = s"$nameA -> $nameB"
      opA(tag, store, model)
      opB(tag, store, model)
      assert(liveMap(store) == model.toMap, s"diverged after [$tag]")
    }
  }

  test("duplicate ids across many segments resolve newest-wins under " +
       "interleaved markers (mini soak)") {
    val s = spark
    import s.implicits._
    val (store, _) = freshStore()
    // 6 segments over 4 ids with updates and deletes interleaved
    store.append(Seq((1L, "a0"), (2L, "b0")).toDF("id", "v"))
    store.append(Seq((3L, "c0"), (4L, "d0")).toDF("id", "v"))
    store.append(Seq((1L, "a1"), (3L, "c1")).toDF("id", "v"))
    store.delete(Seq(1L, 4L))
    store.append(Seq((4L, "d1")).toDF("id", "v"))
    store.append(Seq((2L, "b1")).toDF("id", "v"))
    store.delete(Seq(3L))
    store.append(Seq((3L, "c2")).toDF("id", "v"))
    val want = Map(2L -> "b1", 3L -> "c2", 4L -> "d1")
    assert(liveMap(store) == want)
    store.compact()
    assert(liveMap(store) == want)
  }

  test("foreign entries in the store root are ignored, never a crash: " +
       "stray files, a LOCK file, and a non-numeric seg= dir " +
       "(storage_provider.go:175-226 listing pattern)") {
    val s = spark
    import s.implicits._
    val (store, root) = freshStore()
    store.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    // plant garbage a real directory accumulates
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/README.txt"), "not a segment")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/LOCK"), "stale@123")
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(s"$root/seg=_tmp_rename"))
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(s"$root/_spark_metadata"))
    assert(store.segments() == Seq(0L), "only the real segment is listed")
    assert(liveMap(store) == Map(1L -> "a", 2L -> "b"))
    assert(store.stats().map(_.seg) == Seq(0L))
    // appends continue with the next monotonic id, unconfused by garbage
    store.append(Seq((3L, "c")).toDF("id", "v"))
    assert(store.segments() == Seq(0L, 1L))
    // compaction ignores the foreign entries and leaves them in place
    store.compact()
    assert(liveMap(store) == Map(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/README.txt")))
  }

  test("compact seeds the merged segment's cached id range from the " +
       "UNION of its sources' cached ranges (a valid superset — r18: " +
       "the first post-compact mutation must not pay a corpus-sized " +
       "range-backfill agg), and skips seeding when any source range " +
       "is uncached") {
    val s = spark
    import s.implicits._
    val (store, _) = freshStore()
    store.append(Seq((10L, "a"), (20L, "b")).toDF("id", "v"))
    store.append(Seq((30L, "c"), (40L, "d")).toDF("id", "v"))
    store.delete(Seq(40L)) // trims the true max; superset range keeps it
    store.idRanges(store.segments()) // populate the source ranges
    val merged = store.compact()
    assert(store.cachedIdRange(merged) == Some(Some((10L, 40L))),
      s"compacted range not seeded: ${store.cachedIdRange(merged)}")
    // correctness of the superset: idRange serves the seeded value
    assert(store.idRange(merged) == Some((10L, 40L)))
    assert(liveMap(store) == Map(10L -> "a", 20L -> "b", 30L -> "c"))
    // uncached-source path: a fresh append whose range was never asked
    store.append(Seq((50L, "e")).toDF("id", "v"))
    val merged2 = store.compact()
    assert(store.cachedIdRange(merged2).isEmpty,
      "seeding must be skipped when a source range was never cached")
    assert(store.idRange(merged2) == Some((10L, 50L))) // lazy backfill
  }

  test("retirement edge cases: vacuum is idempotent against half-deleted " +
       "state (a mid-vacuum crash just re-vacuums), a stray .retired tmp " +
       "file is ignored, and a pure READER's close never vacuums the " +
       "owner's retired bytes") {
    val s = spark
    import s.implicits._
    val (store, root) = freshStore()
    store.append(Seq((1L, "a")).toDF("id", "v"))
    store.append(Seq((2L, "b")).toDF("id", "v"))
    store.delete(Seq(1L))
    val merged = store.compact()
    def names = new java.io.File(root).list().toSet
    assert(names.exists(_.startsWith("retired=")))
    // a reader instance (no lock, never compacted here) closing must NOT
    // delete the retired bytes out from under the owner's frames
    val reader = new SegmentStore(spark, root)
    assert(reader.read().count() == 1L)
    reader.close()
    assert(names.contains("seg=0"),
      "a pure reader's close() vacuumed the owner's retired bytes")
    assert(names.exists(_.startsWith("retired=")))
    // mid-vacuum crash shape: one retired dir already gone, manifest
    // still present — vacuum tolerates the missing path and completes
    assert(new java.io.File(root, "seg=0").listFiles().forall(_.delete()))
    assert(new java.io.File(root, "seg=0").delete())
    store.vacuum()
    assert(!names.exists(_.startsWith("retired=")),
      s"vacuum did not complete over half-deleted state: $names")
    assert(!names.contains("seg=1"), "vacuum left a named retired dir")
    // a stray tmp from a crashed manifest write is invisible to listing
    // and harmless to the next compaction
    val tmp = new java.io.File(root, ".retired-99.tmp")
    assert(tmp.createNewFile())
    assert(store.segments() == Seq(merged))
    store.append(Seq((3L, "c")).toDF("id", "v"))
    store.compact()
    assert(store.read().collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    store.close()
  }

  test("reopen-path range backfill answers from parquet FOOTER stats: a " +
       "fresh store instance computes every segment's id range with ZERO " +
       "Spark jobs (metadata-only — at 100 TB the old union-of-aggs " +
       "backfill was a full id-column scan to answer one mutation's " +
       "prune question), and the values equal the exact agg's") {
    val s = spark
    import s.implicits._
    val (store, root) = freshStore()
    store.append(Seq((10L, "a"), (20L, "b")).toDF("id", "v"))
    store.append(Seq((30L, "c"), (40L, "d")).toDF("id", "v"))
    store.append(Seq((5L, "e")).toDF("id", "v"))
    // a fresh instance = the reopen shape (empty range cache)
    val store2 = new SegmentStore(spark, root)
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val ranges = store2.idRanges(store2.segments())
      Thread.sleep(1500) // listener bus is async; give a job time to show
      assert(ranges == Map(0L -> ((10L, 20L)), 1L -> ((30L, 40L)),
        2L -> ((5L, 5L))), s"footer ranges wrong: $ranges")
      assert(jobs.get == 0L,
        s"footer-based backfill ran ${jobs.get} Spark jobs — it fell " +
          "back to the union-of-aggs scan")
    } finally spark.sparkContext.removeSparkListener(l)
    // single-segment path serves the same footer-derived value
    val store3 = new SegmentStore(spark, root)
    assert(store3.idRange(0L).contains((10L, 20L)))
  }

  test("idRange/idRanges tolerate id-less and all-null-id segments: " +
       "unprunable (None / absent), never an NPE — the range prune must " +
       "degrade to 'candidate' exactly where the old union probe " +
       "tolerated such segments (uncastable STRING ids throw under ANSI " +
       "on both designs, so null ids are the real null-bounds case)") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("rangenull").toString
    val st = new SegmentStore(spark, root)
    val segIdless = st.append(Seq(("x", 1), ("y", 2)).toDF("name", "v"))
    val segBadIds = st.append(Seq[Option[Long]](None, None).toDF("id"))
    val segGood = st.append((10L to 14L).toDF("id"))
    assert(st.idRange(segIdless).isEmpty, "id-less segment must be None")
    assert(st.idRange(segBadIds).isEmpty,
      "all-null ids aggregate to null bounds -> None, not an NPE")
    assert(st.idRange(segGood).contains((10L, 14L)))
    // the batch path computes all three missing ranges in ONE job and
    // must agree with the single-segment path (fresh store = cold cache)
    val st2 = new SegmentStore(spark, root)
    val ranges = st2.idRanges(Seq(segIdless, segBadIds, segGood))
    assert(ranges == Map(segGood -> ((10L, 14L))),
      s"only the numeric-id segment is prunable: $ranges")
  }

  // ---- round-19 rows: ADVICE r18 fixes ----

  test("retired tombstone files are excluded from frames planned AFTER " +
       "the compaction that consumed them: a read planned post-compaction " +
       "survives the NEXT compaction's vacuum (ADVICE r18 #1 — the old " +
       "whole-dir tombstone scan froze the retired file paths into every " +
       "new plan, so deletes-then-two-compactions crashed a ONE-cycle-old " +
       "frame mid-collect)") {
    val s = spark
    import s.implicits._
    val (store, root) = freshStore()
    store.append((1L to 6L).map(i => (i, s"v$i")).toDF("id", "v"))
    store.append((7L to 9L).map(i => (i, s"v$i")).toDF("id", "v"))
    store.delete(Seq(2L, 8L)) // markers PRECEDE the compaction
    store.compact() // consumes + retires the tombstone files (grace: 1 cycle)
    val tombFiles = new java.io.File(root, "tombstones")
    assert(tombFiles.exists && tombFiles.list().exists(_.endsWith(".parquet")),
      "precondition: retired tombstone bytes must still be on disk")
    // the frame at the heart of the ADVICE scenario: planned AFTER the
    // compaction, held across exactly ONE more compaction cycle
    val held = store.read()
    assert(held.queryExecution.executedPlan != null) // plan (and file-list) now
    store.append(Seq((10L, "v10")).toDF("id", "v"))
    store.delete(Seq(1L))
    store.compact() // vacuums generation 1's retired tombstone files
    // within retention -> must collect, and exactly (frames are
    // generation-bound: the post-plan append/delete are invisible)
    assert(held.collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 4L, 5L, 6L, 7L, 9L),
      "held frame planned after compaction 1 failed or drifted across " +
        "compaction 2's vacuum")
    // the CURRENT view applies the post-compaction markers
    assert(store.read().collect().map(_.getLong(0)).toSet ==
      Set(3L, 4L, 5L, 6L, 7L, 9L, 10L))
    store.close()
  }

  test("reader-vs-vacuum race: a manifest that vanishes between the " +
       "root listing and the read answers 'fully vacuumed' instead of " +
       "crashing the reader (ADVICE r18 #2 — generations are monotonic, " +
       "so a missing manifest can only mean the owner finished vacuuming)") {
    val s = spark
    import s.implicits._
    val (store, root) = freshStore()
    store.append(Seq((1L, "a")).toDF("id", "v"))
    store.append(Seq((2L, "b")).toDF("id", "v"))
    val gen = store.compact()
    // a FRESH instance models the racing reader: empty manifest cache,
    // and the owner's vacuum lands between its listing and its open
    val reader = new SegmentStore(spark, root)
    assert(java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(root, s"retired=$gen")))
    val (segs, tombs) = reader.readManifest(gen)
    assert(segs.isEmpty && tombs.isEmpty,
      "a vanished manifest must read as empty, not throw")
    // and the reader's view stays serviceable (post-vacuum semantics)
    assert(reader.segments().nonEmpty)
    reader.close()
    store.close()
  }

  test("footer range scan degrades to the exact agg on an unreadable " +
       "file instead of failing the mutation (ADVICE r18 #3): a " +
       "zero-byte part file — which the Spark scan silently skips — " +
       "throws in ParquetFileReader.open, and idRange must fall back, " +
       "not propagate") {
    val s = spark
    import s.implicits._
    val (store, root) = freshStore()
    val seg = store.append(Seq((10L, "a"), (20L, "b")).toDF("id", "v"))
    // a zero-byte .parquet file: ignored by the Spark scan (empty files
    // are skipped at split planning), fatal to a footer open
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(root, s"seg=$seg", "part-99999-stub.parquet"))
    val fresh = new SegmentStore(spark, root) // cold range cache
    assert(fresh.idRange(seg).contains((10L, 20L)),
      "idRange must answer via the exact-agg fallback on a footer error")
    val fresh2 = new SegmentStore(spark, root)
    assert(fresh2.idRanges(Seq(seg)) == Map(seg -> ((10L, 20L))),
      "idRanges must answer via the exact-agg fallback on a footer error")
    store.close()
  }

  test("balancedUnion: one plan over many frames, O(log n) construction " +
       "depth, odd/even widths and the single-frame identity (ADVICE " +
       "r18 #4 — the left-deep reduce built O(n)-deep trees)") {
    val s = spark
    import s.implicits._
    // 257 frames (odd, > 2^8): count and sum must match exactly
    val frames = (0 until 257).map(i => Seq(i.toLong).toDF("id"))
    val u = graft.core.Frames.balancedUnion(frames)
    assert(u.count() == 257L)
    assert(u.agg(sum(col("id"))).head.getLong(0) == (0L until 257L).sum)
    // single-frame identity
    assert(graft.core.Frames.balancedUnion(Seq(frames.head))
      .collect().map(_.getLong(0)).toSeq == Seq(0L))
    // empty input is a programming error, loudly
    intercept[IllegalArgumentException] {
      graft.core.Frames.balancedUnion(Seq.empty)
    }
    // construction depth: the logical tree over n inputs must be
    // O(log n) — walk maxDepth of the pre-analysis plan
    def depth(p: org.apache.spark.sql.catalyst.trees.TreeNode[_]): Int =
      1 + (if (p.children.isEmpty) 0
           else p.children.map(c =>
             depth(c.asInstanceOf[
               org.apache.spark.sql.catalyst.trees.TreeNode[_]])).max)
    val d = depth(u.queryExecution.logical)
    assert(d < 40, s"balancedUnion built a depth-$d tree over 257 inputs " +
      "— not the O(log n) shape (left-deep would be ~257+)")
  }
}
