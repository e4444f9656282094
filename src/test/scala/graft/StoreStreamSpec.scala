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
}
