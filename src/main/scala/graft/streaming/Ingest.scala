package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming ingest (additive vs the reference, which has no
  * event-time semantics — SURVEY.md §2.10; its memtable/flush machinery
  * maps to micro-batches + partitioned parquet appends).
  */
object Ingest {

  /** Event-time tumbling-window aggregate — same expression works for
    * batch frames and streaming frames (this is what q_events_window runs
    * in batch mode). */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark)
              else events
    src.groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), avg(col("value")).as("avg_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("cnt"),
        col("avg_value"))
  }

  /** File-source stream over a directory of parquet events (the scalable
    * ingest shape: each micro-batch appends to partitioned parquet —
    * comet's memtable flush, but exactly-once via checkpointing). */
  def fileStream(spark: SparkSession, srcDir: String,
                 schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(srcDir)

  /** Write a streaming frame to partitioned parquet with checkpointing
    * (append mode — for aggregations only FINALIZED windows flush, i.e.
    * those the watermark has passed; that's the memtable-flush analogue). */
  def sinkParquet(df: DataFrame, outDir: String, checkpoint: String,
                  partitionBy: Seq[String] = Seq.empty): StreamingQuery = {
    val w = df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).start()
  }

  /** Memory sink in complete mode — running aggregate state queryable as a
    * table (for serving / tests). */
  def sinkMemoryComplete(df: DataFrame, name: String): StreamingQuery =
    df.writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()

  /** Streaming EXACT DEDUP on arbitrary key columns with bounded state:
    * the watermark caps how long each key is remembered, so state size
    * tracks the dedup horizon instead of the stream's lifetime — the
    * streaming twin of [[graft.pipeline.Dedup.exact]], and the shape a
    * 100 TB/day ingest needs (an unbounded `dropDuplicates` would
    * accumulate every key ever seen). Keeps ONE representative per key
    * (the first the engine encounters — use a keyed agg like
    * `groupBy(key).min(id)` where a deterministic representative
    * matters). Works on batch frames too (plain dropDuplicates). */
  def dedupStream(rows: DataFrame, keyCols: Seq[String],
                  tsCol: String = "ts",
                  watermark: String = "2 hours"): DataFrame =
    if (rows.isStreaming)
      rows.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
    else rows.dropDuplicates(keyCols.head, keyCols.tail: _*)

  /** Open-session state carried across micro-batches (epoch micros). */
  final case class SessionAcc(start: Long, last: Long, n: Long)
  /** A closed gap-session. */
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
                              n_events: Long)

  /** TRUE custom-state sessionization via `flatMapGroupsWithState`: state
    * per user survives across micro-batches; a session CLOSES (and is
    * emitted) when a later event arrives more than `gapMinutes` after the
    * session's last event. The still-open session per user stays in the
    * state store — exactly comet's active-memtable shape (accepts writes
    * until a boundary passes, storage_memtable.go:61-112), but keyed,
    * fault-tolerant, and distributed by user_id.
    *
    * Works on batch frames too (state spans the whole group), which is how
    * the spec cross-checks it against the window-based [[sessionize]].
    *
    * Late data: events are ordered WITHIN a micro-batch; an event that
    * arrives in a later batch with an earlier timestamp than the open
    * session's last event merges into that session (it cannot reopen the
    * past). Bound this by filtering input with a watermark upstream if
    * out-of-order arrival beyond the gap is possible. */
  def statefulSessions(events: DataFrame,
                       gapMinutes: Int = 30): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val ds = events
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[SessionAcc, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long)], state: GroupState[SessionAcc]) =>
          val sorted = it.map(_._2).toArray.sorted
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var acc = state.getOption.orNull
          sorted.foreach { ts =>
            if (acc == null) acc = SessionAcc(ts, ts, 1)
            else if (ts - acc.last > gapUs) {
              out += SessionOut(uid, acc.start, acc.last, acc.n)
              acc = SessionAcc(ts, ts, 1)
            } else acc = SessionAcc(acc.start, ts, acc.n + 1)
          }
          if (acc != null) state.update(acc)
          out.iterator
      }
  }

  /** Streaming [[statefulSessions]] with BOUNDED state: event-time timeout
    * closes (and emits) a session once the WATERMARK passes its last event
    * plus the gap — so an inactive user's open session leaves the state
    * store instead of living for the stream's lifetime. That is the
    * 100 TB/day requirement [[statefulSessions]]'s NoTimeout form cannot
    * meet: with billions of keys, state must track the ACTIVE horizon.
    * Late events beyond `watermark` are dropped by the engine (standard
    * watermark semantics); in-horizon late events merge as before.
    *
    * Emission differs from the batch form only in WHEN the final session
    * of a silent user appears (at timeout rather than never); sessions
    * closed by a later event are identical. */
  def statefulSessionsStream(events: DataFrame, gapMinutes: Int = 30,
                             watermark: String = "2 hours"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    // the watermark-tagged ts column must SURVIVE the projection — event-
    // time timeout is rejected if the watermarked attribute is projected
    // away before flatMapGroupsWithState
    val ds = events.withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("us"),
        col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[SessionAcc, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap with no new events: close and FREE
            val acc = state.get
            state.remove()
            Iterator.single(SessionOut(uid, acc.start, acc.last, acc.n))
          } else {
            val sorted = it.map(_._2).toArray.sorted
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var acc = state.getOption.orNull
            sorted.foreach { ts =>
              if (acc == null) acc = SessionAcc(ts, ts, 1)
              else if (ts - acc.last > gapUs) {
                out += SessionOut(uid, acc.start, acc.last, acc.n)
                acc = SessionAcc(ts, ts, 1)
              } else acc = SessionAcc(acc.start, ts, acc.n + 1)
            }
            if (acc != null) {
              state.update(acc)
              // fire when event-time (watermark) passes the gap boundary
              state.setTimeoutTimestamp((acc.last + gapUs) / 1000L)
            }
            out.iterator
          }
      }
  }

  /** Micro-batch → LSM segment flush: every non-empty micro-batch becomes
    * one immutable segment (comet's memtable rotate+flush,
    * storage.go:632-643 — here exactly-once via the streaming checkpoint).
    * Reads of the store see newest-wins across flushed segments.
    *
    * `compactAtSegments` is the reference's background-compaction trigger
    * (compact when the segment count reaches the threshold; its default is
    * 5 — storage.go:72-84, storage_compaction.go:19-44) folded into the
    * micro-batch loop: after a flush pushes the count to the threshold,
    * the live view is rewritten into one segment before the next batch.
    * Compaction here is the REAL merge (union minus tombstones,
    * newest-wins — SegmentStore.compact), so a restart mid-stream replays
    * onto an equivalent, just re-segmented, store. None = never compact
    * (the original behavior). */
  def sinkSegmentStore(df: DataFrame, store: graft.store.SegmentStore,
                       checkpoint: String,
                       compactAtSegments: Option[Int] = None): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // cache the micro-batch output: the emptiness probe and the segment
        // write would otherwise EACH re-execute the batch plan (stateful
        // dedup included) — 2× the work per micro-batch
        val b = batch.persist()
        try {
          if (b.count() > 0) {
            store.append(b)
            compactAtSegments.foreach { t =>
              if (store.segments().length >= t) store.compact()
            }
          }
        } finally b.unpersist()
      }
      .start()

  /** Stateful sessionization per user: flatMapGroupsWithState-style custom
    * state via the simpler windowed path — session = gap-based grouping.
    * Batch analogue for verification: lag() + cumulative session ids. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 tieBreak: Seq[String] = Seq("event_id")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = col("ts") +: tieBreak.map(col)
    val w = Window.partitionBy(col("user_id")).orderBy(order: _*)
    // microsecond epoch on both engines (second-cast truncates sub-second
    // gaps differently than DuckDB's fractional epoch())
    val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
    events
      .withColumn("new_session",
        when(gap.isNull || gap > gapMinutes * 60L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("new_session")
  }
}
