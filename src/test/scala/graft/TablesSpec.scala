package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.core.Tables

/** Pins the TESTDATA.md timestamp contract: whatever physical type the
  * driver-regenerated events.parquet carries, `Tables.load` surfaces
  * `ts` as a plain TIMESTAMP (UTC session instant). Round 7 regression:
  * the testdata shifted TIMESTAMP(NANOS) → TIMESTAMP(MICROS,
  * isAdjustedToUTC=0), Spark 4 inferred TIMESTAMP_NTZ, and watermarks +
  * unix_micros broke. */
class TablesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("events.ts loads as plain TIMESTAMP under the session defaults") {
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType)
    // the two downstream shapes that broke in round 7 must analyze + run
    val n = df.select(unix_micros(col("ts"))).filter(col("unix_micros(ts)").isNotNull).count()
    assert(n > 0)
  }

  test("NTZ inference arm: load converts TIMESTAMP_NTZ to TIMESTAMP with identical instants") {
    val key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      // only meaningful if the current testdata actually triggers NTZ
      // inference (round 7+ shape); if the driver regenerates with an
      // adjusted-to-UTC type this clause self-disables rather than lies
      if (raw.schema("ts").dataType == TimestampNTZType) {
        val df = Tables.load(spark, dir, "events")
        assert(df.schema("ts").dataType == TimestampType)
        // same instants as the flag-off read (UTC session: wall == instant)
        spark.conf.set(key, "false")
        val direct = Tables.load(spark, dir, "events")
        val a = df.agg(sum(unix_micros(col("ts")))).head.getLong(0)
        val b = direct.agg(sum(unix_micros(col("ts")))).head.getLong(0)
        assert(a == b)
      }
    } finally spark.conf.set(key, prev)
  }

  test("every catalog table loads and registerAll exposes matching views") {
    Tables.registerAll(spark, dir)
    Tables.All.foreach { t =>
      assert(spark.table(t).count() > 0, s"table $t empty")
    }
  }
}
