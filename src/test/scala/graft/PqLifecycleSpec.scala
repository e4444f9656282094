package graft

import graft.vector._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Randomized lifecycle interleavings for PQ and IVFPQ — the Spark twin of
  * the reference's two thickest index test files (`pq_index_test.go`
  * 1,614 LoC, `ivfpq_index_test.go` 1,619 LoC: Add / Remove / Flush /
  * multiple Train / WriteTo / ReadFrom in every order).
  *
  * Oracle construction: codebooks are trained with ksub = |universe| on a
  * FIXED vector universe, so every universe subvector is its own codeword
  * (single-point k-means clusters converge to the points bit-exactly) and
  * ADC distance == exact L2 distance. Every op sequence over universe
  * members therefore has a strict driver-side oracle: the in-memory
  * id→vector map, searched by exact Double L2. Each step asserts the
  * distributed index's top-k == the model's top-k — the same
  * model-based-soak pattern as StoreLifecycleSpec. */
class PqLifecycleSpec extends SparkSpec {

  private val Dim = 4
  private val N = 24 // universe size == ksub → exact codebooks

  private def vec(i: Int): Array[Float] = Array(
    (math.sin(i * 0.7) * 3 + (i % 5)).toFloat,
    (math.cos(i * 1.3) * 2).toFloat,
    ((i % 7) * 1.1).toFloat,
    (i * 0.37).toFloat)

  private val universe: Map[Long, Array[Float]] =
    (0 until N).map(i => i.toLong -> vec(i)).toMap

  private def df(ids: Iterable[Long]): DataFrame = {
    val s = spark
    import s.implicits._
    ids.toSeq.sorted.map(i => (i, universe(i))).toDF("id", "vector")
  }

  private lazy val universeDf = df(universe.keys)

  private def q(v: Array[Float]): DataFrame = {
    val s = spark
    import s.implicits._
    Seq((0L, v)).toDF("qid", "qvec")
  }

  private val queries = Seq(
    Array(1.5f, 0.2f, 3.3f, 4.1f),
    Array(-0.5f, 1.9f, 0.0f, 8.2f),
    Array(2.2f, -1.0f, 6.0f, 1.0f))

  private def l2(a: Array[Float], b: Array[Float]): Double =
    math.sqrt((0 until Dim).map(i =>
      (a(i).toDouble - b(i)) * (a(i).toDouble - b(i))).sum)

  /** Exact top-k over the in-memory model (the flat oracle). */
  private def expect(live: Map[Long, Array[Float]], qv: Array[Float],
                     k: Int): Seq[Long] =
    live.toSeq.map { case (id, v) => (l2(qv, v), id) }.sorted.take(k).map(_._2)

  private def gotIds(res: DataFrame): Seq[Long] =
    res.select("id").collect().map(_.getLong(0)).toSeq

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // ---------------- PQ ----------------

  private def trainPq(): Pq.Model =
    Pq.train(universeDf, m = 2, ksub = N, maxIter = 3)

  /** One soak: `ops` random operations, flat-oracle check after each. */
  private def pqSoak(seed: Long, ops: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    var model = trainPq()
    var live = universe
    var enc = Pq.encode(universeDf, model)
    def check(): Unit = {
      val qv = queries(rnd.nextInt(queries.length))
      val got = gotIds(Pq.search(enc, model, q(qv), 8))
      assert(got == expect(live, qv, 8), s"seed=$seed live=${live.keys.toSeq.sorted}")
    }
    for (_ <- 0 until ops) {
      rnd.nextInt(6) match {
        case 0 | 1 => // delete 1-3 live ids (Remove+Flush)
          val victims = rnd.shuffle(live.keys.toSeq).take(1 + rnd.nextInt(3))
          enc = Pq.delete(enc, victims)
          live = live -- victims
        case 2 => // re-add absent universe ids (Add; resurrection after delete)
          val absent = (universe.keySet -- live.keySet).toSeq.sorted
          if (absent.nonEmpty) {
            val back = rnd.shuffle(absent).take(1 + rnd.nextInt(3))
            enc = enc.unionByName(Pq.encode(df(back), model))
            live = live ++ back.map(i => i -> universe(i))
          }
        case 3 => // delete of absent ids is a no-op (TestPQIndexRemoveNonExistent)
          val absent = (universe.keySet -- live.keySet).toSeq
          if (absent.nonEmpty) enc = Pq.delete(enc, absent.take(2))
        case 4 => // retrain replaces codebooks + re-encode (TestPQIndexMultipleTraining)
          model = trainPq()
          enc = Pq.encode(df(live.keys), model)
        case 5 => // persist + reload, continue FROM the loaded state
          val p = tmp("pqsoak")
          Pq.write(model, enc, p)
          val (m2, e2) = Pq.read(spark, p)
          model = m2; enc = e2
      }
      check()
    }
    assert(enc.count() == live.size)
  }

  test("pq lifecycle soak seed 7: 20 random delete/re-add/retrain/persist " +
       "ops, flat-oracle top-k after every op (pq_index_test.go families)") {
    pqSoak(seed = 7L, ops = 20)
  }

  test("pq lifecycle soak seed 23: a different interleaving order") {
    pqSoak(seed = 23L, ops = 20)
  }

  test("pq op-pair enumeration: every ordered pair of {delete, re-add, " +
       "delete-missing, retrain, persist-reload} preserves the flat " +
       "oracle (the *_test.go pairwise lifecycle matrix)") {
    val opNames = Seq("delete", "readd", "delete-missing", "retrain", "persist")
    def run(first: String, second: String): Unit = {
      var model = trainPq()
      var live = universe
      var enc = Pq.encode(universeDf, model)
      def apply(op: String): Unit = op match {
        case "delete" =>
          val victims = live.keys.toSeq.sorted.take(3)
          enc = Pq.delete(enc, victims); live = live -- victims
        case "readd" =>
          val absent = (universe.keySet -- live.keySet).toSeq.sorted
          if (absent.nonEmpty) {
            enc = enc.unionByName(Pq.encode(df(absent.take(2)), model))
            live = live ++ absent.take(2).map(i => i -> universe(i))
          }
        case "delete-missing" =>
          enc = Pq.delete(enc, Seq(900L, 901L))
        case "retrain" =>
          model = trainPq(); enc = Pq.encode(df(live.keys), model)
        case "persist" =>
          val p = tmp("pqpair")
          Pq.write(model, enc, p)
          val (m2, e2) = Pq.read(spark, p); model = m2; enc = e2
      }
      apply(first); apply(second)
      val got = gotIds(Pq.search(enc, model, q(queries.head), 8))
      assert(got == expect(live, queries.head, 8), s"pair=($first, $second)")
    }
    for (a <- opNames; b <- opNames) run(a, b)
  }

  test("pq persist AFTER deletions reloads the flushed state — deleted ids " +
       "never resurface (TestPQIndexSerializationWithDeletions " +
       "pq_index_test.go:1304-1396)") {
    val model = trainPq()
    val gone = Seq(0L, 5L, 10L, 15L)
    val enc = Pq.delete(Pq.encode(universeDf, model), gone)
    val p = tmp("pqdel")
    Pq.write(model, enc, p)
    val (m2, e2) = Pq.read(spark, p)
    assert(e2.count() == N - gone.size)
    val live = universe -- gone
    for (qv <- queries) {
      val got = gotIds(Pq.search(e2, m2, q(qv), 8))
      assert(got == expect(live, qv, 8))
      assert(got.intersect(gone).isEmpty)
    }
  }

  test("pq delete-all empties search; re-adding restores exact results " +
       "(TestPQIndexRemove + TestPQIndexSoftDeleteWithSearch)") {
    val model = trainPq()
    var enc = Pq.delete(Pq.encode(universeDf, model), universe.keys.toSeq)
    assert(Pq.search(enc, model, q(queries.head), 8).collect().isEmpty)
    enc = enc.unionByName(Pq.encode(universeDf, model))
    val got = gotIds(Pq.search(enc, model, q(queries.head), 8))
    assert(got == expect(universe, queries.head, 8))
  }

  test("pq exact codebooks reconstruct every universe vector bit-for-bit; " +
       "embedded byteSize is far under raw floats " +
       "(TestPQIndexEncode :658, TestPQIndexCompressionRatio :759)") {
    val model = trainPq()
    for ((_, v) <- universe) {
      val codes = model.encode(v)
      val rebuilt = Array.ofDim[Float](Dim)
      for (j <- 0 until model.m; d <- 0 until model.dsub)
        rebuilt(j * model.dsub + d) = model.codebooks(j)(codes(j))(d)
      assert(rebuilt.toSeq == v.toSeq, "single-point clusters must be exact")
    }
    // compression: at toy dim the fixed codebook bytes dominate, so pin
    // the MARGINAL cost — each extra row adds (8 id + m code) bytes vs
    // (8 id + dim·4 float) raw, the ratio the reference's test measures
    // at scale
    val full = Pq.serve(Pq.encode(universeDf, model), model)
    val half = Pq.serve(
      Pq.encode(df((0 until N / 2).map(_.toLong)), model), model)
    val perRow = (full.byteSize - half.byteSize) / (N - N / 2)
    assert(perRow == 8L + model.m, s"marginal bytes/row = $perRow")
    assert(perRow < 8L + Dim * 4L) // strictly under the raw-float row
  }

  // ---------------- IVFPQ ----------------

  private def buildIvfPq(): IvfPq.Index =
    IvfPq.build(universeDf, nlist = 3, m = 2, ksub = N, maxIter = 3)

  private def ivfpqSoak(seed: Long, ops: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    var index = buildIvfPq()
    var live = universe
    def check(): Unit = {
      val qv = queries(rnd.nextInt(queries.length))
      val got = gotIds(IvfPq.search(index, q(qv), 8, nprobe = 3))
      assert(got == expect(live, qv, 8), s"seed=$seed live=${live.keys.toSeq.sorted}")
    }
    for (_ <- 0 until ops) {
      rnd.nextInt(6) match {
        case 0 | 1 =>
          val victims = rnd.shuffle(live.keys.toSeq).take(1 + rnd.nextInt(3))
          index = IvfPq.delete(index, victims)
          live = live -- victims
        case 2 =>
          val absent = (universe.keySet -- live.keySet).toSeq.sorted
          if (absent.nonEmpty) {
            val back = rnd.shuffle(absent).take(1 + rnd.nextInt(3))
            index = index.copy(encoded =
              index.encoded.unionByName(IvfPq.encode(df(back), index)))
            live = live ++ back.map(i => i -> universe(i))
          }
        case 3 => // delete-missing no-op (TestIVFPQIndexRemoveNonExistent :410)
          index = IvfPq.delete(index, Seq(900L, 901L))
        case 4 => // full re-train (coarse + fine), restricted to the live set
          val fresh = buildIvfPq()
          index = fresh.copy(encoded = IvfPq.encode(df(live.keys), fresh))
          // (TestIVFPQIndexMultipleTraining ivfpq_index_test.go:860-912)
        case 5 =>
          val p = tmp("ivfpqsoak")
          IvfPq.write(index, p)
          index = IvfPq.read(spark, p)
      }
      check()
    }
    assert(index.encoded.count() == live.size)
  }

  test("ivfpq lifecycle soak seed 11: 20 random delete/re-add/retrain/" +
       "persist ops at probe-all, flat-oracle top-k after every op " +
       "(ivfpq_index_test.go families)") {
    ivfpqSoak(seed = 11L, ops = 20)
  }

  test("ivfpq lifecycle soak seed 41: a different interleaving order") {
    ivfpqSoak(seed = 41L, ops = 20)
  }

  test("ivfpq op-pair enumeration: every ordered pair of {delete, re-add, " +
       "delete-missing, retrain, persist-reload} preserves the flat oracle") {
    val opNames = Seq("delete", "readd", "delete-missing", "retrain", "persist")
    def run(first: String, second: String): Unit = {
      var index = buildIvfPq()
      var live = universe
      def apply(op: String): Unit = op match {
        case "delete" =>
          val victims = live.keys.toSeq.sorted.take(3)
          index = IvfPq.delete(index, victims); live = live -- victims
        case "readd" =>
          val absent = (universe.keySet -- live.keySet).toSeq.sorted
          if (absent.nonEmpty) {
            index = index.copy(encoded = index.encoded
              .unionByName(IvfPq.encode(df(absent.take(2)), index)))
            live = live ++ absent.take(2).map(i => i -> universe(i))
          }
        case "delete-missing" => index = IvfPq.delete(index, Seq(900L))
        case "retrain" =>
          val fresh = buildIvfPq()
          index = fresh.copy(encoded = IvfPq.encode(df(live.keys), fresh))
        case "persist" =>
          val p = tmp("ivfpqpair")
          IvfPq.write(index, p); index = IvfPq.read(spark, p)
      }
      apply(first); apply(second)
      val got = gotIds(IvfPq.search(index, q(queries.head), 8, nprobe = 3))
      assert(got == expect(live, queries.head, 8), s"pair=($first, $second)")
    }
    for (a <- opNames; b <- opNames) run(a, b)
  }

  test("ivfpq persist AFTER deletions reloads the flushed state " +
       "(TestIVFPQIndexSerializationWithDeletions ivfpq_index_test.go:1317)") {
    val gone = Seq(1L, 7L, 13L, 19L)
    val index = IvfPq.delete(buildIvfPq(), gone)
    val p = tmp("ivfpqdel")
    IvfPq.write(index, p)
    val loaded = IvfPq.read(spark, p)
    assert(loaded.encoded.count() == N - gone.size)
    val live = universe -- gone
    for (qv <- queries) {
      val got = gotIds(IvfPq.search(loaded, q(qv), 8, nprobe = 3))
      assert(got == expect(live, qv, 8))
      assert(got.intersect(gone).isEmpty)
    }
  }

  test("ivfpq list sizes: clusters partition the live set — sizes sum to " +
       "n, every cluster id < nlist " +
       "(TestIVFPQIndexGetListSizesDistribution ivfpq_index_test.go:914)") {
    val index = buildIvfPq()
    val sizes = index.encoded.groupBy(col("cluster")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(sizes.map(_._2).sum == N)
    assert(sizes.forall { case (c, _) => c >= 0 && c < 3 })
    // after deletes the partition property still holds
    val del = IvfPq.delete(index, Seq(0L, 1L, 2L))
    assert(del.encoded.groupBy(col("cluster")).count()
      .collect().map(_.getLong(1)).sum == N - 3)
  }

  test("ivfpq residual encoding reconstructs exactly with exact fine " +
       "codebooks: centroid + decoded residual == original vector " +
       "(TestIVFPQIndexResidualEncoding ivfpq_index_test.go:788)") {
    val index = buildIvfPq()
    val rows = index.encoded.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toArray))
    assert(rows.length == N)
    for ((id, cluster, codes) <- rows) {
      val cent = index.coarse.centroids(cluster)
      val rebuilt = Array.ofDim[Float](Dim)
      for (j <- 0 until index.pq.m; d <- 0 until index.pq.dsub) {
        val dim = j * index.pq.dsub + d
        rebuilt(dim) = cent(dim) + index.pq.codebooks(j)(codes(j))(d)
      }
      val orig = universe(id)
      for (i <- 0 until Dim)
        assert(math.abs(rebuilt(i) - orig(i)) < 1e-5,
          s"id=$id dim=$i ${rebuilt(i)} vs ${orig(i)}")
    }
  }

  test("ivfpq delete-all empties search at probe-all; re-add restores " +
       "(TestIVFPQIndexRemove :329 + SoftDeleteWithSearch :964)") {
    var index = IvfPq.delete(buildIvfPq(), universe.keys.toSeq)
    assert(IvfPq.search(index, q(queries.head), 8, nprobe = 3)
      .collect().isEmpty)
    index = index.copy(encoded =
      index.encoded.unionByName(IvfPq.encode(universeDf, index)))
    val got = gotIds(IvfPq.search(index, q(queries.head), 8, nprobe = 3))
    assert(got == expect(universe, queries.head, 8))
  }

  test("ivfpq add AFTER a retrain is searchable against the new models " +
       "(TestIVFPQIndexMultipleTraining tail, ivfpq_index_test.go:904-912)") {
    val partial = (0 until 20).map(_.toLong)
    val fresh = buildIvfPq()
    var index = fresh.copy(encoded = IvfPq.encode(df(partial), fresh))
    index = index.copy(encoded = index.encoded
      .unionByName(IvfPq.encode(df(Seq(20L, 21L, 22L, 23L)), index)))
    val got = gotIds(IvfPq.search(index, q(queries(1)), 8, nprobe = 3))
    assert(got == expect(universe, queries(1), 8))
  }
}
