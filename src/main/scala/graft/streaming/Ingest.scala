package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

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
