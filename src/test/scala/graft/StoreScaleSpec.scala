package graft

import graft.pipeline.Dedup
import graft.store.SegmentStore
import org.apache.spark.sql.functions._

/** Round-3 scale-default fixes: size-proportional segment files and the
  * banded sign-LSH embedding dedup. */
class StoreScaleSpec extends SparkSpec {

  test("segment writes scale file count with data size, not shuffle partitions") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("segscale").toString
    // ~tiny per-file target forces the multi-file path on test data
    val store = new SegmentStore(s, root, targetFileBytes = 64 * 1024)
    val big = s.range(0, 50000).select(col("id"),
      concat_ws("-", lit("x"), col("id")).as("payload"))
    val seg = store.append(big)
    val files = new java.io.File(s"$root/seg=$seg")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files > 1, s"expected multi-file segment, got $files")
    // a memtable-scale batch still lands as ONE file at the default target
    val store2 = new SegmentStore(s, root + "2")
    val seg2 = store2.append(big.limit(100))
    val files2 = new java.io.File(s"${root}2/seg=$seg2")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files2 == 1)
  }

  test("lit(0) anchor contract (SegmentStore.clusterById): the id-cluster " +
       "exchange + within-partition sort SURVIVE under an upstream " +
       "already-hash-partitioned-by-id window — the exact elision " +
       "scenario the anchor defeats; a Spark upgrade that sees through " +
       "hash(id, 0) fails here, not silently at file counts") {
    val s = spark
    import org.apache.spark.sql.expressions.Window
    // upstream shaped like SegmentStore.read's newest-wins: a window
    // partitioned by id leaves the frame hash-partitioned on id at the
    // session's shuffle-partition count
    val n = s.conf.get("spark.sql.shuffle.partitions").toInt
    val windowed = s.range(0, 20000)
      .select(col("id"), (col("id") * 7 % 1000).as("v"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy(col("v"))))
      .filter(col("rn") === 1).drop("rn")
    // the clusterById shape, at the SAME partition count as the upstream
    // exchange (the match that makes a bare repartition(n, id) elidable)
    val anchored = windowed
      .repartition(n, col("id"), lit(0)).sortWithinPartitions("id")
    // contract 1: the exchange is REAL — the output has exactly n
    // partitions under our control, not the upstream's layout
    assert(anchored.rdd.getNumPartitions == n)
    // contract 2: the within-partition sort survives into the physical
    // plan (row groups only get narrow min/max ranges if rows arrive
    // sorted at the writer)
    val phys = anchored.queryExecution.executedPlan.toString
    assert(phys.contains("Sort [id"),
      s"within-partition sort missing from the physical plan:\n$phys")
    // contract 3: rows inside each partition ARE sorted by id, and the
    // partitioning is the anchored hash (ids co-located per partition)
    val perPart = anchored.rdd.mapPartitions { it =>
      val ids = it.map(_.getLong(0)).toArray
      Iterator.single((ids.length, ids.sameElements(ids.sorted)))
    }.collect()
    assert(perPart.forall(_._2), "a partition arrived unsorted")
    assert(perPart.count(_._1 > 0) > 1, "all rows landed in one partition")
  }

  test("compaction fans out by live bytes and preserves the live view") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("segcompact").toString
    val store = new SegmentStore(s, root, targetFileBytes = 64 * 1024)
    val data = s.range(0, 30000).select(col("id"),
      concat_ws("-", lit("v"), col("id")).as("payload"))
    store.append(data.filter(col("id") % 2 === 0))
    store.append(data.filter(col("id") % 2 === 1))
    store.delete(Seq(0L, 2L, 4L))
    val seg = store.compact()
    val files = new java.io.File(s"$root/seg=$seg")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files > 1, s"expected multi-file compaction output, got $files")
    assert(store.read().count() == 30000 - 3)
  }

  test("banded sign-LSH: near-identical vectors collide; verification filters") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val base = (0 until 200).map(i => (i.toLong, Array.fill(32)(rnd.nextGaussian().toFloat)))
    // 198/199 are near-dups of 0/1 (tiny perturbation -> same sign bits)
    val nearDup = Seq(
      (198L, base(0)._2.map(x => x + 1e-6f)),
      (199L, base(1)._2.map(x => x + 1e-6f)))
    val embs = (base.take(198) ++ nearDup).toDF("id", "vector")
    val pairs = Dedup.cosineLshPairs(embs, "id", "vector",
      bands = 4, bitsPerBand = 16, minSim = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 198L)))
    assert(pairs.contains((1L, 199L)))
    // verification threshold kills chance collisions between random vectors
    assert(pairs.size == 2)
  }

  test("banded sign-LSH beats a single fixed signature on bucket granularity") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val embs = (0 until 300).map(i =>
      (i.toLong, Array.fill(32)(rnd.nextGaussian().toFloat))).toDF("id", "vector")
    // with wide bands (16 bits => 65k buckets/band) random 32-dim gaussians
    // should produce very few candidate collisions
    val n = Dedup.cosineLshPairs(embs, "id", "vector",
      bands = 4, bitsPerBand = 16, minSim = -1.0).count()
    assert(n < 300, s"banded LSH candidate count should stay tiny, got $n")
  }
}
