package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over the driver-provided parquet directories.
  *
  * The engine treats each scale-factor directory as a database of parquet
  * tables (TESTDATA.md). All readers go through here so that column pruning
  * and predicate pushdown reach the parquet scans (reference: comet keeps
  * everything in RAM — `/root/reference/storage.go:120-220` — whereas at
  * 100 TB the scan itself is the dominant cost, so we lean on Spark's
  * vectorized parquet reader + pushdown instead of custom structures).
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Timestamp contract: downstream code (windows, watermarks, unix_micros,
    // flatMapGroupsWithState sessions) requires `ts` to be a plain TIMESTAMP
    // (instant, UTC session). The driver-generated events.parquet has shipped
    // with TWO physical types across testdata regenerations, so normalize
    // every shape here rather than in each operator:
    //  - TIMESTAMP(NANOS): Spark reads it as a long only
    //    (spark.sql.legacy.parquet.nanosAsLong) → convert micros-precision.
    //  - TIMESTAMP(MICROS, isAdjustedToUTC=0): Spark 4 infers TIMESTAMP_NTZ
    //    by default → cast to TIMESTAMP (wall time == UTC instant under the
    //    UTC session timezone all graft sessions pin).
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        // integer division: ts exceeds 2^53 ns, a double round-trip here
        // loses microseconds
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** Register every table as a temp view so `spark.sql` mirrors the
    * DuckDB oracle's naming. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    All.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

/** Session factory with scale-appropriate defaults.
  *
  * Tuned for local[N] testing but every knob is the one you would set on a
  * real cluster: AQE on (runtime re-plan + skew-join handling at 100 TB),
  * shuffle partitions sized to cores locally (on a cluster this comes from
  * `spark.sql.adaptive.coalescePartitions` anyway).
  */
object GraftSession {
  def builder(appName: String = "graft", cores: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // TIMESTAMP_MICROS(isAdjustedToUTC=0) reads as plain TIMESTAMP, not
      // NTZ — watermarks/unix_micros reject NTZ (see Tables.load contract)
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def get(appName: String = "graft", cores: Int = 32): SparkSession = {
    val s = builder(appName, cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
