package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the wave-based embedded collect ([[Packed]]): the packed buffers
  * must be IDENTICAL whether partitions arrive in one fully-parallel wave
  * or one-at-a-time (spark.graft.serve.maxInFlightBytes at its floor), and
  * identical to a driver-side reassembly of the frame — order is partition
  * order, row order within a partition, zero-norm rows dropped in place. */
class PackedSpec extends SparkSpec {
  import spark.implicits._

  private def frame(n: Int, dim: Int, parts: Int) =
    spark.range(n).select(col("id"),
        expr(s"transform(sequence(0, ${dim - 1}), " +
          "j -> cast(sin(id * 7919 + j * 17) * 10 as float))").as("vector"))
      .repartition(parts)

  private def reference(df: org.apache.spark.sql.DataFrame)
      : (Seq[Long], Seq[Float]) = {
    // the old collect-rows path, for parity: partition order via the same
    // partitioning, rows packed id-major
    val rows = df.select(col("id").cast("long"), col("vector")).collect()
    (rows.map(_.getLong(0)).toSeq,
      rows.flatMap(_.getSeq[Float](1)).toSeq)
  }

  test("wave width 1 and full-parallel produce identical packed buffers") {
    val df = frame(5000, 8, 7).persist()
    try {
      df.count()
      val (ids1, packed1, dim1) = Packed.vectors(df)
      spark.conf.set("spark.graft.serve.maxInFlightBytes", "1")
      val (ids2, packed2, dim2) =
        try Packed.vectors(df)
        finally spark.conf.unset("spark.graft.serve.maxInFlightBytes")
      assert(dim1 == 8 && dim2 == 8)
      assert(ids1.toSeq == ids2.toSeq)
      assert(packed1.toSeq == packed2.toSeq)
      val (refIds, refPacked) = reference(df)
      assert(ids1.toSeq == refIds)
      assert(packed1.toSeq == refPacked)
    } finally df.unpersist()
  }

  test("empty partitions and empty frames are handled") {
    // 3 rows over 8 partitions — most partitions empty
    val df = frame(3, 4, 8)
    val (ids, packed, dim) = Packed.vectors(df)
    assert(ids.length == 3 && packed.length == 12 && dim == 4)
    assert(ids.sorted.toSeq == Seq(0L, 1L, 2L))

    val (eids, epacked, edim) = Packed.vectors(frame(0, 4, 2))
    assert(eids.isEmpty && epacked.isEmpty && edim == -1)
  }

  test("prep drops rows in place (zero-norm under cosine) and trims") {
    val df = spark.range(100).select(col("id"),
        expr("transform(sequence(0, 3), j -> cast(CASE WHEN id % 10 = 0 " +
          "THEN 0.0 ELSE id * 1.0 + j END as float))").as("vector"))
      .repartition(5)
    val dropZero: Array[Float] => Array[Float] =
      v => if (v.forall(_ == 0f)) null else v
    val (ids, packed, dim) = Packed.vectors(df, dropZero)
    assert(dim == 4)
    assert(ids.length == 90)
    assert(packed.length == 360)
    assert(!ids.exists(_ % 10 == 0))
    // surviving rows keep their values at the right offsets
    ids.zipWithIndex.foreach { case (id, i) =>
      assert(packed(i * 4) == id.toFloat)
      assert(packed(i * 4 + 3) == id.toFloat + 3)
    }
  }

  test("codes collect groups by cluster with counted allocation") {
    val m = 4
    val df = spark.range(1000).select(col("id"),
        expr(s"transform(sequence(0, ${m - 1}), " +
          "j -> cast((id + j) % 256 as int))").as("codes"),
        (col("id") % 7).cast("int").as("cluster"))
      .repartition(6)
    val (ids, codes, clusters) = Packed.codes(df, m, withCluster = true)
    assert(ids.length == 1000 && codes.length == 4000 && clusters.length == 1000)
    ids.zipWithIndex.foreach { case (id, i) =>
      assert(clusters(i) == (id % 7).toInt)
      var j = 0
      while (j < m) {
        assert((codes(i * m + j) & 0xFF) == ((id + j) % 256).toInt)
        j += 1
      }
    }
  }

  test("sharded assembly: concatenation of shards == single buffer") {
    val df = frame(5000, 8, 7).persist()
    try {
      df.count()
      val (ids1, packed1, _) = Packed.vectors(df)
      // tiny shard capacity: 1000 floats -> 125 rows/shard -> 40 shards;
      // chunks straddle shard boundaries constantly
      val shards = Packed.vectorsSharded(df, maxShardFloats = 1000)
      assert(shards.length == 40)
      assert(shards.forall(_._3 == 8))
      assert(shards.flatMap(_._1).toSeq == ids1.toSeq)
      assert(shards.flatMap(_._2).toSeq == packed1.toSeq)
    } finally df.unpersist()
  }

  test("sharded serving searches identical to single-buffer serving") {
    val df = frame(3000, 8, 5).persist()
    try {
      df.count()
      val single = FlatKnn.serve(df)
      val sharded = FlatKnn.serveSharded(df, maxShardFloats = 2048)
      assert(sharded.shardCount > 1)
      assert(sharded.size == single.size && sharded.byteSize == single.byteSize)
      val q = Array.tabulate(8)(j => math.sin(1234.0 * 7919 + j * 17).toFloat * 10)
      assert(sharded.search(q, 50) == single.search(q, 50))
      assert(sharded.search(q, 0) == single.search(q, 0)) // k<=0: all rows
      val filt: Long => Boolean = _ % 3 == 0
      assert(sharded.search(q, 25, filt) == single.search(q, 25, filt))

      // cosine mode: zero-norm drops compose with sharding
      val cosSingle = FlatKnn.serveCosine(df)
      val cosShard = FlatKnn.serveSharded(df, graft.vector.Metric.Cosine, 2048)
      assert(cosShard.search(q, 20) == cosSingle.search(q, 20))
    } finally df.unpersist()
  }

  test("oversize corpus is rejected with the single-box message") {
    // a frame whose row count × dim exceeds one JVM buffer: 10M × 256
    // floats = 2.56B — count() is cheap (column-pruned), the require
    // fires before any vector decode
    val df = spark.range(10000000L).select(col("id"),
      expr("transform(sequence(0, 255), j -> cast(id as float))").as("vector"))
    val e = intercept[IllegalArgumentException] { Packed.vectors(df) }
    assert(e.getMessage.contains("single-box"))
  }

  test("longs(): packs one primitive column per partition; a null id " +
       "fails with a NAMED error, not a decoder NPE") {
    val s = spark
    import s.implicits._
    val got = Packed.longs(Seq(5L, 1L, 9L).toDF("id"))
    assert(got.sorted.toSeq == Seq(1L, 5L, 9L))
    assert(Packed.longs(spark.emptyDataset[Long].toDF("id")).isEmpty)
    val bad = Seq(Some(1L), None, Some(3L)).toDF("id")
    val e = intercept[org.apache.spark.SparkException] {
      Packed.longs(bad)
    }
    // the task failure carries the named IllegalArgumentException
    def rootMsg(t: Throwable): String =
      if (t.getCause == null) String.valueOf(t.getMessage)
      else rootMsg(t.getCause) + " | " + String.valueOf(t.getMessage)
    assert(rootMsg(e).contains("packed id collect"),
      s"expected the named id error, got: ${rootMsg(e)}")
  }
}
