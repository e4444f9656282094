package graft

import graft.vector.{FlatKnn, Hnsw, Metric}
import org.apache.spark.sql.functions._

/** HNSW lifecycle semantics mirrored from
  * `/root/reference/hnsw_index_test.go` (34 funcs): level distribution,
  * remove idempotence, serialization with deletions, mass-delete flush,
  * entry re-election under heavy pruning. */
class HnswLifecycleSpec extends SparkSpec {

  private def vecs(n: Int, d: Int = 8): org.apache.spark.sql.DataFrame = {
    val s = spark
    import s.implicits._
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(d)(j => (math.sin(i * 0.91 + j * 1.7) * 10).toFloat))
    }.toDF("id", "vector")
  }

  test("deterministic level assignment follows the geometric law capped at " +
       "16 (TestHNSWIndexRandomLevel, hnsw_index.go:474-484)") {
    // levelFor is private — observe the SAME law through a graph's
    // public behavior proxy: build many single-node adds and check via
    // per-id determinism instead. The law itself: level = floor(-ln(u)/ln(m))
    // gives P(level >= 1) = 1/m, P(level >= 2) = 1/m². Sample it through
    // the same seeded generator the graph uses.
    val m = 16
    val ml = 1.0 / math.log(m.toDouble)
    val levels = (0L until 50000L).map { id =>
      val rnd = new java.util.Random(id * 0x9E3779B97F4A7C15L + 1)
      val u = math.max(rnd.nextDouble(), 1e-12)
      math.min((-math.log(u) * ml).toInt, 16)
    }
    val frac1 = levels.count(_ >= 1).toDouble / levels.size
    val frac2 = levels.count(_ >= 2).toDouble / levels.size
    assert(levels.max <= 16)
    assert(math.abs(frac1 - 1.0 / m) < 0.02, s"P(l>=1)=$frac1 want ~${1.0 / m}")
    assert(frac2 < 0.012, s"P(l>=2)=$frac2 want ~${1.0 / (m * m)}")
    // and the assignment is a pure function of the doc id (stable levels
    // across rebuilds are what make shard builds deterministic)
    val again = (0L until 100L).map { id =>
      val rnd = new java.util.Random(id * 0x9E3779B97F4A7C15L + 1)
      math.min((-math.log(math.max(rnd.nextDouble(), 1e-12)) * ml).toInt, 16)
    }
    assert(again == levels.take(100))
  }

  test("delete is idempotent: second delete and unknown ids return false " +
       "(TestHNSWIndexRemoveTwice/RemoveNonExistent)") {
    val g = new Hnsw.LocalGraph()
    (0L until 20L).foreach(i => g.add(i, Array.fill(4)(i.toFloat)))
    assert(g.delete(5L))
    assert(!g.delete(5L), "second delete of the same id must report false")
    assert(!g.delete(999L), "deleting an unknown id must report false")
    assert(g.liveSize == 19)
  }

  test("persistence round trip after hard delete: dropped ids stay gone " +
       "(TestHNSWIndexSerializationWithDeletions, index level)") {
    val s = spark
    import s.implicits._
    val idx = Hnsw.build(vecs(120).repartition(2))
    val deleted = Hnsw.deleteFlush(idx, Seq(3L, 7L, 11L))
    val path = java.nio.file.Files.createTempDirectory("hnsw-del").toString
    Hnsw.write(deleted, path)
    val loaded = Hnsw.read(spark, path)
    val got = Hnsw.searchIndex(loaded, vecs(120).filter(col("id") === 3L)
        .select(col("id").as("qid"), col("vector").as("qvec")),
      120, efSearch = 5000)
      .collect().map(_.getLong(1)).toSet
    assert(!got.contains(3L) && !got.contains(7L) && !got.contains(11L),
      "deleted ids resurfaced after a persistence round trip")
    assert(got.size == 117)
  }

  test("mass delete + flush: 80% of nodes removed, survivors exactly " +
       "searchable (TestHNSWIndexFlushAll shape, entry re-election)") {
    val s = spark
    import s.implicits._
    val all = vecs(150)
    val idx = Hnsw.build(all.repartition(1))
    val dropIds = (0L until 150L).filter(_ % 5 != 0) // keep every 5th
    val flushed = Hnsw.deleteFlush(idx, dropIds)
    val q = all.filter(col("id") === 10L)
      .select(col("id").as("qid"), col("vector").as("qvec"))
    val got = Hnsw.searchIndex(flushed, q, 30, efSearch = 5000)
      .collect().map(_.getLong(1)).toSet
    val want = FlatKnn.search(all.filter(col("id") % 5 === 0), q, 30, Metric.L2)
      .collect().map(_.getLong(1)).toSet
    assert(got == want,
      s"survivor search diverged from flat: missing=${want -- got} extra=${got -- want}")
  }

  test("model-based lifecycle soak: interleaved copy-on-write adds and " +
       "hard-delete flushes always match flat over the live set (seeded, " +
       "TestHNSWIndexConcurrentAddRemoveFlush single-threaded analog)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(99)
    def vecOf(i: Long): Array[Float] =
      Array.tabulate(6)(j => (math.sin(i * 1.37 + j * 0.71) * 10).toFloat)
    var live = (0L until 40L).toSet
    var idx = Hnsw.build(live.toSeq.sorted.map(i => (i, vecOf(i)))
      .toDF("id", "vector").repartition(2))
    var nextId = 40L
    (0 until 5).foreach { step =>
      if (rnd.nextBoolean()) {
        val batch = (0 until 3 + rnd.nextInt(4)).map(_ => { val i = nextId; nextId += 1; i })
        idx = Hnsw.add(idx, batch.map(i => (i, vecOf(i))).toDF("id", "vector"))
        live ++= batch
      } else {
        val victims = rnd.shuffle(live.toSeq).take(2 + rnd.nextInt(4))
        idx = Hnsw.deleteFlush(idx, victims)
        live --= victims
      }
      val q = Seq((0L, vecOf(7L))).toDF("qid", "qvec")
      val got = Hnsw.searchIndex(idx, q, 15, efSearch = 5000)
        .orderBy(col("score"), col("id")).collect().map(_.getLong(1)).toSeq
      val want = FlatKnn.search(
        live.toSeq.sorted.map(i => (i, vecOf(i))).toDF("id", "vector"),
        q, 15, Metric.L2)
        .orderBy(col("score"), col("id")).collect().map(_.getLong(1)).toSeq
      assert(got == want, s"diverged from flat at step $step: got=$got want=$want")
    }
  }

  test("persist-interleaved lifecycle soak: random add/delete-flush/" +
       "delete-missing/persist-reload sequences always match flat over " +
       "the live set (hnsw_index_test.go serialization families × " +
       "lifecycle, two seeds)") {
    val s = spark
    import s.implicits._
    def vecOf(i: Long): Array[Float] =
      Array.tabulate(6)(j => (math.cos(i * 0.83 + j * 1.19) * 10).toFloat)
    def soak(seed: Long, steps: Int): Unit = {
      val rnd = new scala.util.Random(seed)
      var live = (0L until 30L).toSet
      var idx = Hnsw.build(live.toSeq.sorted.map(i => (i, vecOf(i)))
        .toDF("id", "vector").repartition(2))
      var nextId = 30L
      def check(step: Int): Unit = {
        val q = Seq((0L, vecOf(11L))).toDF("qid", "qvec")
        val got = Hnsw.searchIndex(idx, q, 12, efSearch = 5000)
          .orderBy(col("score"), col("id")).collect().map(_.getLong(1)).toSeq
        val want = FlatKnn.search(
          live.toSeq.sorted.map(i => (i, vecOf(i))).toDF("id", "vector"),
          q, 12, Metric.L2)
          .orderBy(col("score"), col("id")).collect().map(_.getLong(1)).toSeq
        assert(got == want, s"seed=$seed step=$step got=$got want=$want")
      }
      (0 until steps).foreach { step =>
        rnd.nextInt(5) match {
          case 0 | 1 => // add a fresh batch
            val batch = (0 until 2 + rnd.nextInt(3)).map(_ => { val i = nextId; nextId += 1; i })
            idx = Hnsw.add(idx, batch.map(i => (i, vecOf(i))).toDF("id", "vector"))
            live ++= batch
          case 2 => // hard delete + flush
            val victims = rnd.shuffle(live.toSeq).take(1 + rnd.nextInt(3))
            idx = Hnsw.deleteFlush(idx, victims)
            live --= victims
          case 3 => // delete of unknown ids is a no-op
            idx = Hnsw.deleteFlush(idx, Seq(9000L + rnd.nextInt(100)))
          case 4 => // persist + reload, CONTINUE from the loaded index
            val p = java.nio.file.Files.createTempDirectory("hnswsoak").toString
            Hnsw.write(idx, p)
            idx = Hnsw.read(spark, p)
        }
        check(step)
      }
    }
    soak(seed = 5L, steps = 8)
    soak(seed = 31L, steps = 8)
  }

  test("op-pair enumeration: every ordered pair of {add, delete-flush, " +
       "delete-missing, persist-reload} preserves the flat oracle " +
       "(the pairwise matrix pq/ivfpq lifecycle specs pin, on HNSW)") {
    val s = spark
    import s.implicits._
    def vecOf(i: Long): Array[Float] =
      Array.tabulate(5)(j => (math.sin(i * 1.91 + j * 0.57) * 8).toFloat)
    val opNames = Seq("add", "delete", "delete-missing", "persist")
    for (a <- opNames; b <- opNames) {
      var live = (0L until 25L).toSet
      var idx = Hnsw.build(live.toSeq.sorted.map(i => (i, vecOf(i)))
        .toDF("id", "vector").repartition(2))
      var nextId = 25L
      def apply(op: String): Unit = op match {
        case "add" =>
          val batch = Seq(nextId, nextId + 1); nextId += 2
          idx = Hnsw.add(idx, batch.map(i => (i, vecOf(i))).toDF("id", "vector"))
          live ++= batch
        case "delete" =>
          val victims = live.toSeq.sorted.take(3)
          idx = Hnsw.deleteFlush(idx, victims)
          live --= victims
        case "delete-missing" =>
          idx = Hnsw.deleteFlush(idx, Seq(777L, 778L))
        case "persist" =>
          val p = java.nio.file.Files.createTempDirectory("hnswpair").toString
          Hnsw.write(idx, p)
          idx = Hnsw.read(spark, p)
      }
      apply(a); apply(b)
      val q = Seq((0L, vecOf(3L))).toDF("qid", "qvec")
      val got = Hnsw.searchIndex(idx, q, 10, efSearch = 5000)
        .orderBy(col("score"), col("id")).collect().map(_.getLong(1)).toSeq
      val want = FlatKnn.search(
        live.toSeq.sorted.map(i => (i, vecOf(i))).toDF("id", "vector"),
        q, 10, Metric.L2)
        .orderBy(col("score"), col("id")).collect().map(_.getLong(1)).toSeq
      assert(got == want, s"pair=($a, $b): got=$got want=$want")
    }
  }

  test("flush of an empty graph and search of an empty graph are safe " +
       "(TestHNSWIndexFlushEmpty/EmptySearch)") {
    val g = new Hnsw.LocalGraph()
    assert(g.search(Array(1f, 2f, 3f, 4f), 5, 50).isEmpty)
    val flushed = g.flushCopy()
    assert(flushed.size == 0)
    assert(flushed.search(Array(1f, 2f, 3f, 4f), 5, 50).isEmpty)
  }

  test("entry-point deletion matrix (TestHNSWIndexFlushEntryPoint, " +
       "hnsw_index_test.go:586-630): whichever node holds the entry " +
       "point, deleting it + flushing re-elects a valid entry — EVERY " +
       "single-node deletion leaves a graph that answers exhaustive " +
       "searches identically to flat over the survivors") {
    val s = spark
    import s.implicits._
    def vecOf(i: Long): Array[Float] =
      Array.tabulate(3)(j => if (j == 0) i.toFloat else 0f)
    (0L until 5L).foreach { victim =>
      val g = new Hnsw.LocalGraph(m = 16, efConstruction = 200)
      (0L until 5L).foreach(i => g.add(i, vecOf(i)))
      assert(g.delete(victim))
      val flushed = g.flushCopy()
      assert(flushed.size == 4, s"victim $victim: flush kept ${flushed.size}")
      // a stale entry point would strand the beam; exhaustive ef must
      // reach every survivor in flat order
      val got = flushed.search(vecOf(victim), 4, 5000).map(_._1).toSet
      assert(got == ((0L until 5L).toSet - victim),
        s"victim $victim: flushed graph lost nodes: $got")
    }
  }

  test("flush-all then re-add (TestHNSWIndexFlushAll, " +
       "hnsw_index_test.go:631-673): deleting every node and flushing " +
       "leaves an empty servable graph, and fresh adds on the flushed " +
       "copy serve again") {
    val g = new Hnsw.LocalGraph(m = 16, efConstruction = 200)
    def vecOf(i: Long): Array[Float] =
      Array.tabulate(4)(j => (math.sin(i * 1.3 + j) * 5).toFloat)
    (0L until 8L).foreach(i => g.add(i, vecOf(i)))
    (0L until 8L).foreach(i => assert(g.delete(i)))
    val flushed = g.flushCopy()
    assert(flushed.size == 0 && flushed.liveSize == 0)
    assert(flushed.search(vecOf(3L), 5, 500).isEmpty)
    // the flushed copy is a working graph, not a husk
    flushed.add(100L, vecOf(100L))
    flushed.add(101L, vecOf(101L))
    val got = flushed.search(vecOf(100L), 2, 500).map(_._1)
    assert(got.headOption.contains(100L),
      s"re-added nodes not served after flush-all: $got")
  }

  test("single-node graph (TestHNSWIndexSingleNode, " +
       "hnsw_index_test.go:959-987): k larger than the corpus returns " +
       "the one node, self-query at distance zero") {
    val g = new Hnsw.LocalGraph()
    g.add(42L, Array(1f, 2f, 3f))
    val res = g.search(Array(1f, 2f, 3f), 10, 50)
    assert(res.map(_._1) == Seq(42L))
    assert(res.head._2 == 0.0, s"self distance ${res.head._2}")
  }

  test("custom sparse giant ids (TestHNSWIndexAddWithCustomID, " +
       "hnsw_index_test.go:376-399): ids far above 2^32 build, search, " +
       "and match flat exactly — node identity is the int64 doc id, " +
       "never a dense position") {
    val s = spark
    import s.implicits._
    def vecOf(i: Long): Array[Float] =
      Array.tabulate(6)(j => (math.sin(i * 0.000000000137 + j * 0.71) * 10).toFloat)
    val ids = Seq(5_000_000_000L, 7_777_777_777_777L, 42L, 9_223_372_036_854L)
    val data = ids.map(i => (i, vecOf(i))).toDF("id", "vector")
    val idx = Hnsw.build(data.repartition(2))
    val q = Seq((0L, vecOf(42L))).toDF("qid", "qvec")
    val got = Hnsw.searchIndex(idx, q, ids.size, efSearch = 5000)
      .orderBy(col("score"), col("id")).collect().map(_.getLong(1)).toSeq
    val want = FlatKnn.search(data, q, ids.size, Metric.L2)
      .orderBy(col("score"), col("id")).collect().map(_.getLong(1)).toSeq
    assert(got == want, s"giant-id graph diverged: $got vs $want")
  }

  test("empty-index serialization (TestHNSWIndexSerializationEmpty, " +
       "hnsw_index_test.go:1480-1519): a zero-node index writes, " +
       "reloads, and searches to zero results without error") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "vector")
    val idx = Hnsw.build(empty)
    val p = java.nio.file.Files.createTempDirectory("hnswempty").toString
    Hnsw.write(idx, p)
    val loaded = Hnsw.read(spark, p)
    val q = Seq((0L, Array(1f, 2f, 3f, 4f))).toDF("qid", "qvec")
    assert(Hnsw.searchIndex(loaded, q, 5).count() == 0L)
  }

  test("graph getters track the lifecycle (TestHNSWIndexGetters, " +
       "hnsw_index_test.go:674-703): m/efConstruction are the " +
       "construction values; size counts inserted nodes, liveSize drops " +
       "soft-deleted ones, flush reconciles them") {
    val g = new Hnsw.LocalGraph(m = 8, efConstruction = 77)
    assert(g.m == 8 && g.efConstruction == 77)
    (0L until 6L).foreach(i => g.add(i, Array(i.toFloat, 0f)))
    assert(g.size == 6 && g.liveSize == 6)
    assert(g.delete(2L) && g.delete(4L))
    assert(g.size == 6, "soft delete must not shrink the node table")
    assert(g.liveSize == 4)
    val flushed = g.flushCopy()
    assert(flushed.size == 4 && flushed.liveSize == 4)
  }
}
