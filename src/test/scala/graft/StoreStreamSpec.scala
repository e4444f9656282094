package graft

import graft.store.SegmentStore
import graft.streaming.Ingest
import org.apache.spark.sql.functions._

/** Persistence (FIXTURES.md §6) + streaming ingest. */
class StoreStreamSpec extends SparkSpec {

  test("segment store: append, newest-wins, tombstones, REAL compaction") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("segs").toString
    val store = new SegmentStore(spark, root)

    store.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    store.append(Seq((4L, "d"), (5L, "e")).toDF("id", "v"))
    store.append(Seq((2L, "b2")).toDF("id", "v")) // update: newest wins
    store.delete(Seq(3L))

    def liveMap() = store.read().collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    val before = liveMap()
    assert(before == Map(1L -> "a", 2L -> "b2", 4L -> "d", 5L -> "e"))
    assert(store.segments() == Seq(0L, 1L, 2L))

    // compaction must actually merge (the reference's is a stub that drops
    // documents, storage_compaction.go:68-73)
    store.compact()
    assert(store.segments().length == 1)
    assert(liveMap() == before)
  }

  test("streaming: windowed counts (complete mode) equal the batch result") {
    val events = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val batch = Ingest.windowedCounts(events)
      .select(col("w_start").cast("string"), col("event_type"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    val srcDir = java.nio.file.Files.createTempDirectory("stream-src").toString
    events.coalesce(1).write.mode("overwrite").parquet(srcDir)
    val streamed = Ingest.fileStream(spark, srcDir,
      spark.read.parquet(srcDir).schema)
    val q = Ingest.sinkMemoryComplete(
      Ingest.windowedCounts(streamed, watermark = "90 days"), "wc_test")
    q.awaitTermination(120000)

    val got = spark.table("wc_test")
      .select(col("w_start").cast("string"), col("event_type"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == batch)
  }

  test("streaming: raw ingest to parquet segments is lossless") {
    val events = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val srcDir = java.nio.file.Files.createTempDirectory("ing-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("ing-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ing-ckpt").toString
    events.write.mode("overwrite").parquet(srcDir)
    val streamed = Ingest.fileStream(spark, srcDir,
      spark.read.parquet(srcDir).schema)
    val q = Ingest.sinkParquet(streamed.withColumn("day",
      to_date(col("ts"))), outDir, ckpt, partitionBy = Seq("event_type"))
    q.awaitTermination(120000)
    assert(spark.read.parquet(outDir).count() == events.count())
  }

  test("sessionize: gap splits sessions") {
    val s = spark
    import s.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val ev = Seq(
      (1L, 10L, ts(0)), (2L, 10L, ts(10)), (3L, 10L, ts(100)),
      (4L, 20L, ts(0))
    ).toDF("event_id", "user_id", "ts")
    val sess = Ingest.sessionize(ev).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_id")).toMap
    assert(sess == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("statefulSessions (batch): closed sessions match window sessionize") {
    val events = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "events")
    // closed = every session except each user's LAST (still open in state)
    val win = Ingest.sessionize(events)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n"), min(unix_micros(col("ts"))).as("st"))
    val winClosed = win
      .withColumn("mx", max(col("session_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))))
      .filter(col("session_id") < col("mx"))
      .select(col("user_id"), col("st"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stateful = Ingest.statefulSessions(events)
      .select(col("user_id"), col("start_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stateful == winClosed)
    assert(stateful.nonEmpty)
  }

  test("statefulSessions (streaming): state survives across micro-batches") {
    val s = spark
    import s.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val srcDir = java.nio.file.Files.createTempDirectory("sess-src").toString
    // batch 1: user 10 opens a session; batch 2 (separate file): an event
    // 100 min later closes it — only works if state crossed the batches
    Seq((1L, 10L, ts(0)), (2L, 10L, ts(10)))
      .toDF("event_id", "user_id", "ts")
      .coalesce(1).write.parquet(srcDir + "/f1")
    Seq((3L, 10L, ts(110)))
      .toDF("event_id", "user_id", "ts")
      .coalesce(1).write.parquet(srcDir + "/f2")
    val schema = spark.read.parquet(srcDir + "/f1").schema
    val streamed = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir + "/*")
    val q = Ingest.statefulSessions(streamed).writeStream
      .format("memory").queryName("sess_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val closed = spark.table("sess_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // exactly one closed session: user 10, minutes 0-10, 2 events
    assert(closed.toSeq == Seq((10L,
      base.getTime * 1000L, (base.getTime + 600000L) * 1000L, 2L)))
  }

  test("statefulSessionsStream: event-time timeout closes a silent user's " +
       "session and FREES its state (bounded-state sessionization)") {
    val s = spark
    import s.implicits._
    val base = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val srcDir = java.nio.file.Files.createTempDirectory("sess-to-src").toString
    // batch 1: user 20 has two events then goes SILENT forever.
    // batch 2: only OTHER users' events, far enough ahead that the
    // watermark (10 min delay) passes user 20's last event + gap (30 min)
    // — with NoTimeout the open session would never emit; with
    // EventTimeTimeout it must close at the timeout, not wait for a
    // terminating event that never comes.
    Seq((1L, 20L, ts(0)), (2L, 20L, ts(5)))
      .toDF("event_id", "user_id", "ts")
      .coalesce(1).write.parquet(srcDir + "/f1")
    Seq((3L, 99L, ts(120)), (4L, 99L, ts(125)))
      .toDF("event_id", "user_id", "ts")
      .coalesce(1).write.parquet(srcDir + "/f2")
    val schema = spark.read.parquet(srcDir + "/f1").schema
    val streamed = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir + "/*")
    val q = Ingest.statefulSessionsStream(streamed, gapMinutes = 30,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("sess_timeout")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val closed = spark.table("sess_timeout")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    // user 20's silent session closed by TIMEOUT: minutes 0-5, 2 events
    assert(closed.contains((20L,
      base.getTime * 1000L, (base.getTime + 300000L) * 1000L, 2L)),
      s"timeout did not close the silent session: $closed")
    // user 99's session stays OPEN (nothing passed its gap boundary): it
    // must NOT have emitted
    assert(!closed.exists(_._1 == 99L), s"open session emitted early: $closed")
  }

  test("dedupStream: bounded-state streaming dedup drops in-watermark repeats") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dedupstream")
    val src = dir.resolve("src"); val out = dir.resolve("out")
    java.nio.file.Files.createDirectories(src)
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def t(mins: Int) = new java.sql.Timestamp(base.getTime + mins * 60000L)
    // key "a" repeats within minutes (in-watermark dup), "b" unique
    Seq((1L, "a", t(0)), (2L, "a", t(5)), (3L, "b", t(6)), (4L, "a", t(7)))
      .toDF("id", "key", "ts")
      .coalesce(1).write.parquet(src.toString + "/batch0")
    val schema = spark.read.parquet(src.toString + "/batch0").schema
    val stream = Ingest.fileStream(spark, src.toString + "/*", schema)
    val deduped = Ingest.dedupStream(stream, Seq("key"), watermark = "1 hour")
    val q = deduped.writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.read.parquet(out.toString)
      .select("key").collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("a", "b")) // one representative per key
    // batch form: same key set survives
    val batch = Ingest.dedupStream(
      Seq((1L, "a", t(0)), (2L, "a", t(5)), (3L, "b", t(6)))
        .toDF("id", "key", "ts"), Seq("key"))
    assert(batch.select("key").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("a", "b"))
  }

  test("streaming micro-batches flush as LSM segments (memtable analog)") {
    val s = spark
    import s.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("seg-src").toString
    val root = java.nio.file.Files.createTempDirectory("seg-store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("seg-ckpt").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
      .write.parquet(srcDir + "/f1")
    Seq((2L, "b2"), (3L, "c")).toDF("id", "v").coalesce(1)
      .write.parquet(srcDir + "/f2")
    val schema = spark.read.parquet(srcDir + "/f1").schema
    val streamed = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir + "/*")
    val store = new SegmentStore(spark, root)
    val q = Ingest.sinkSegmentStore(streamed, store, ckpt)
    q.awaitTermination(120000)
    assert(store.segments().length == 2)
    val live = store.read().collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // newest-wins requires the later micro-batch to be the later segment
    assert(live == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
  }

  test("sinkSegmentStore compactAtSegments: auto-compaction keeps the view") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("autocompact")
    val src = dir.resolve("src").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    // 6 deliveries, one per micro-batch; delivery i re-writes key i-1
    // (newest-wins must survive every interleaved compaction)
    (0 until 6).foreach { i =>
      val rows = Seq((i.toLong, s"v$i")) ++
        (if (i > 0) Seq(((i - 1).toLong, s"v$i-over")) else Nil)
      rows.toDF("id", "v").coalesce(1).write.parquet(s"$src/f$i")
    }
    val schema = spark.read.parquet(s"$src/f0").schema
    val streamed = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src + "/*")
    val store = new SegmentStore(spark, dir.resolve("store").toString)
    val q = Ingest.sinkSegmentStore(streamed, store,
      dir.resolve("ckpt").toString, compactAtSegments = Some(3))
    q.awaitTermination(120000)
    // the reference's threshold trigger (storage.go:72-84): the count can
    // never end >= threshold + 1 (one flush past a just-compacted store)
    assert(store.segments().length <= 3,
      s"auto-compaction did not bound segments: ${store.segments()}")
    val live = store.read().collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = (0 until 6).map { i =>
      i.toLong -> (if (i < 5) s"v${i + 1}-over" else s"v$i")
    }.toMap
    assert(live == want)
  }
}
