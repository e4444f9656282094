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
