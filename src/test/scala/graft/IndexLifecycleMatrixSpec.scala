package graft

import graft.vector.{FlatKnn, IvfPq, Metric, Pq, VectorSearch}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-for-row port of the reference's per-index LIFECYCLE enumerations —
  * the construct→train→add→search→remove→flush→re-search matrices of
  * `/root/reference/pq_index_test.go` (1,614 LoC),
  * `ivfpq_index_test.go` (1,619) and `flat_index_test.go` (1,090) —
  * with the reference's own fixture vectors and expected counts pinned.
  *
  * API mapping (the semantic contract, not the storage layout): the
  * reference keeps codes + vectorNodes in slices with a soft-delete
  * bitmap; ours is an immutable encoded FRAME. Soft-delete = the
  * tombstone mask applied at search (`filter(!isin(tomb))` — exactly
  * what the bitmap does to the reference's scan); Flush =
  * [[Pq.delete]]/[[IvfPq.delete]] materializing the masked frame (the
  * doc on Pq.delete names this equivalence, pq_index_test.go:350-454).
  * Two spec-pinned DEPARTURES, both frame-semantics by design:
  * re-removing an already-deleted id is IDEMPOTENT (the reference
  * errors per call; a batch mask has no per-call identity), and
  * training with fewer rows than ksub CLAMPS the codebook (the
  * reference errors; a 100 TB batch pipeline clamps and proceeds —
  * Kmeans.trainSubspaces's documented contract). */
class IndexLifecycleMatrixSpec extends SparkSpec {

  // pq_index_test.go's training corpus: 100 vectors, every coordinate i
  private def constTrain(dim: Int): DataFrame = {
    val s = spark
    import s.implicits._
    (0 until 100).map(i =>
      (1000L + i, Array.fill(dim)(i.toFloat))).toDF("id", "vector")
  }

  private def df(rows: (Long, Array[Float])*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "vector")
  }

  private def q(v: Array[Float]): DataFrame = {
    val s = spark
    import s.implicits._
    Seq((0L, v)).toDF("qid", "qvec")
  }

  // ---- PQ construct/train validation (TestNewPQIndex,
  // pq_index_test.go:46-109; validation runs at train in our
  // train-then-encode shape) ----

  test("pq construct matrix: m must be positive and divide dim; ksub " +
       "positive; L2/L2Sq/Cosine accepted, similarity metrics rejected " +
       "(pq_index_test.go:46-109)") {
    val data = constTrain(8)
    intercept[IllegalArgumentException](Pq.train(data, m = 0, ksub = 4))
    intercept[IllegalArgumentException](Pq.train(data, m = -1, ksub = 4))
    intercept[IllegalArgumentException](Pq.train(data, m = 3, ksub = 4)) // 8 % 3
    intercept[IllegalArgumentException](Pq.train(data, m = 4, ksub = 0))
    intercept[IllegalArgumentException](
      Pq.train(data, m = 4, ksub = 4, metric = Metric.DotSim))
    intercept[IllegalArgumentException](
      Pq.train(data, m = 4, ksub = 4, metric = Metric.CosinePreNorm))
    // valid rows: derived shape dsub = dim/m, ksub codebook entries
    for (met <- Seq(Metric.L2, Metric.L2Sq, Metric.Cosine)) {
      val mod = Pq.train(data, m = 4, ksub = 4, maxIter = 3, metric = met)
      assert(mod.m == 4 && mod.dsub == 2 && mod.ksub == 4)
      assert(mod.codebooks.length == 4 &&
        mod.codebooks.forall(_.length == 4) &&
        mod.codebooks.forall(_.forall(_.length == 2)))
      assert(mod.metric == met)
    }
  }

  test("pq train on fewer rows than ksub CLAMPS the codebook (departure " +
       "from TestPQIndexTrainInsufficientVectors's error, " +
       "pq_index_test.go:159-185): search still works over the clamped " +
       "codebook") {
    val tiny = df((1L, Array(1f, 2f, 3f, 4f)), (2L, Array(5f, 6f, 7f, 8f)))
    val mod = Pq.train(tiny, m = 2, ksub = 64, maxIter = 3)
    assert(mod.ksub == 2, s"expected clamp to 2 rows, got ${mod.ksub}")
    val enc = Pq.encode(tiny, mod)
    assert(Pq.search(enc, mod, q(Array(1f, 2f, 3f, 4f)), 10).count() == 2)
  }

  test("pq add: codes land one row per node, m entries each, every code " +
       "in [0, ksub) (TestPQIndexAdd pq_index_test.go:229-287, " +
       "TestPQIndexCodebookStructure :862-908)") {
    val mod = Pq.train(constTrain(8), m = 4, ksub = 16, maxIter = 3)
    val nodes = df(
      (1L, Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)),
      (2L, Array(2f, 3f, 4f, 5f, 6f, 7f, 8f, 9f)),
      (3L, Array(3f, 4f, 5f, 6f, 7f, 8f, 9f, 10f)))
    val enc = Pq.encode(nodes, mod).collect()
    assert(enc.length == 3)
    enc.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length == 4)
      assert(codes.forall(c => c >= 0 && c < mod.ksub))
    }
  }

  test("pq add/query dim mismatch fails fast instead of silently " +
       "zero-padding the tail subspaces (TestPQIndexAddDimensionMismatch " +
       "pq_index_test.go:288-318)") {
    val mod = Pq.train(constTrain(8), m = 4, ksub = 4, maxIter = 3)
    val e1 = intercept[IllegalArgumentException](mod.encode(Array(1f, 2f)))
    assert(e1.getMessage.contains("dim"))
    val e2 = intercept[IllegalArgumentException](
      mod.encode(Array.fill(16)(1f)))
    assert(e2.getMessage.contains("dim"))
    val e3 = intercept[IllegalArgumentException](
      mod.distTable(Array(1f, 2f, 3f)))
    assert(e3.getMessage.contains("dim"))
  }

  // ---- PQ remove/flush two-phase (TestPQIndexRemove :350-423,
  // TestPQIndexFlush :455-531) ----

  test("pq remove/flush matrix: the tombstone mask hides the id at " +
       "search while codes persist; flush physically removes; remaining " +
       "ids ordered {node1, node3}; flush with no deletions keeps all; " +
       "repeated flushes safe; re-remove idempotent (departure from the " +
       "per-call error) (pq_index_test.go:350-531)") {
    val mod = Pq.train(constTrain(8), m = 4, ksub = 16, maxIter = 3)
    val enc = Pq.encode(df(
      (1L, Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)),
      (2L, Array(2f, 3f, 4f, 5f, 6f, 7f, 8f, 9f)),
      (3L, Array(3f, 4f, 5f, 6f, 7f, 8f, 9f, 10f))), mod)
    // flush with no deletions keeps all three
    assert(Pq.delete(enc, Seq.empty).count() == 3)
    // soft delete node2: codes still present, search masks it
    val tomb = Seq(2L)
    assert(enc.count() == 3) // storage untouched (the soft phase)
    val masked = enc.filter(!col("id").isin(tomb: _*))
    val res = Pq.search(masked, mod,
      q(Array(2f, 3f, 4f, 5f, 6f, 7f, 8f, 9f)), 10)
      .collect().map(_.getLong(1))
    assert(!res.contains(2L) && res.length == 2)
    // flush: physical removal, remaining = {1, 3}
    val flushed = Pq.delete(enc, tomb)
    assert(flushed.select("id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 3L))
    // re-remove of the already-deleted id is idempotent
    assert(Pq.delete(flushed, tomb).count() == 2)
    // removing a never-added id is likewise a no-op on the frame
    assert(Pq.delete(flushed, Seq(999L)).count() == 2)
    // multiple flushes safe
    assert(Pq.delete(Pq.delete(flushed, Seq.empty), Seq.empty).count() == 2)
  }

  test("pq soft-delete with search: 4 nodes -> 4 results; delete " +
       "node2+node3 -> exactly {node1, node4}; node-search on a deleted " +
       "id ERRORS; node-search on a live id returns the live set; flush " +
       "preserves the result (TestPQIndexSoftDeleteWithSearch " +
       "pq_index_test.go:954-1065)") {
    val mod = Pq.train(constTrain(8), m = 4, ksub = 16, maxIter = 3)
    val nodes = df(
      (1L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (2L, Array(2f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (3L, Array(3f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (4L, Array(4f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)))
    val enc = Pq.encode(nodes, mod)
    val query = Array(1.5f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    assert(Pq.search(enc, mod, q(query), 10).count() == 4)
    // soft delete 2 and 3 — mask at search
    val live = nodes.filter(!col("id").isin(2L, 3L))
    val masked = enc.filter(!col("id").isin(2L, 3L))
    val got = Pq.search(masked, mod, q(query), 10)
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(1L, 4L), s"expected {1,4}, got $got")
    // node-search on the deleted id errors (resolution runs against the
    // LIVE source, flat_index_search.go:182-191)
    val e = intercept[IllegalArgumentException](
      VectorSearch.onPq(masked, mod, source = live)
        .withNodes(2L).withK(5).execute())
    assert(e.getMessage.contains("not found"))
    // node-search on a live id returns the live set (k=5 over 2 live)
    assert(VectorSearch.onPq(masked, mod, source = live)
      .withNodes(1L).withK(5).execute().count() == 2)
    // flush: same 2 results, physical count 2
    val flushed = Pq.delete(enc, Seq(2L, 3L))
    assert(flushed.count() == 2)
    assert(Pq.search(flushed, mod, q(query), 10)
      .collect().map(_.getLong(1)).toSet == Set(1L, 4L))
  }

  test("pq multiple training: retraining on a shifted corpus replaces " +
       "the codebooks and the new model serves (TestPQIndexMultipleTraining " +
       "pq_index_test.go:909-953)") {
    val s = spark
    import s.implicits._
    val mod1 = Pq.train(constTrain(8), m = 4, ksub = 16, maxIter = 3)
    val shifted = (0 until 100).map(i =>
      (2000L + i, Array.fill(8)((i + 100).toFloat))).toDF("id", "vector")
    val mod2 = Pq.train(shifted, m = 4, ksub = 16, maxIter = 3)
    // codebooks actually replaced (the shifted corpus lives elsewhere)
    assert(!java.util.Arrays.deepEquals(
      mod1.codebooks.asInstanceOf[Array[AnyRef]],
      mod2.codebooks.asInstanceOf[Array[AnyRef]]))
    val enc2 = Pq.encode(shifted, mod2)
    assert(Pq.search(enc2, mod2, q(Array.fill(8)(150f)), 5).count() == 5)
  }

  test("pq serialization with deletions + write-flushes semantics: " +
       "persisting the flushed frame round-trips codes, metric and " +
       "shape; the reloaded index never resurrects deleted ids; a " +
       "model-less dir fails loudly (pq_index_test.go:1066-1577)") {
    val mod = Pq.train(constTrain(8), m = 4, ksub = 16, maxIter = 3)
    val enc = Pq.encode(df(
      (1L, Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)),
      (2L, Array(2f, 3f, 4f, 5f, 6f, 7f, 8f, 9f)),
      (3L, Array(3f, 4f, 5f, 6f, 7f, 8f, 9f, 10f))), mod)
    val flushed = Pq.delete(enc, Seq(2L))
    val dir = java.nio.file.Files.createTempDirectory("pqser").toString
    // the reference's WriteTo flushes soft-deletes before serializing
    // (TestPQIndexWriteToFlushBehavior :1509-1577); ours persists the
    // flushed frame — the artifact NEVER contains masked rows
    Pq.write(mod, flushed, s"$dir/idx")
    val (mod2, enc2) = Pq.read(spark, s"$dir/idx")
    assert(mod2.m == mod.m && mod2.ksub == mod.ksub &&
      mod2.dsub == mod.dsub && mod2.metric == mod.metric)
    assert(enc2.select("id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 3L))
    // reloaded search equals pre-persist flushed search
    val query = q(Array(2f, 3f, 4f, 5f, 6f, 7f, 8f, 9f))
    val a = Pq.search(flushed, mod, query, 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    val b = Pq.search(enc2, mod2, query, 10)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(a.toSeq == b.toSeq)
    // invalid artifact: a dir with no codebooks fails loudly
    // (TestPQIndexReadFromInvalidData :1398-1466)
    intercept[Exception](Pq.read(spark, s"$dir/nope"))
  }

  // ---- IVFPQ matrix (ivfpq_index_test.go) ----

  test("ivfpq construct matrix: nlist/m/ksub positive, m divides dim, " +
       "similarity metrics rejected (TestNewIVFPQIndex " +
       "ivfpq_index_test.go:21-88)") {
    val data = constTrain(8)
    intercept[IllegalArgumentException](
      IvfPq.build(data, nlist = 0, m = 2, ksub = 4, maxIter = 2))
    intercept[IllegalArgumentException](
      IvfPq.build(data, nlist = 2, m = 0, ksub = 4, maxIter = 2))
    intercept[IllegalArgumentException](
      IvfPq.build(data, nlist = 2, m = 3, ksub = 4, maxIter = 2)) // 8 % 3
    intercept[IllegalArgumentException](
      IvfPq.build(data, nlist = 2, m = 2, ksub = 0, maxIter = 2))
    intercept[IllegalArgumentException](
      IvfPq.build(data, nlist = 2, m = 2, ksub = 4, maxIter = 2,
        metric = Metric.DotSim))
    val idx = IvfPq.build(data, nlist = 2, m = 2, ksub = 4, maxIter = 2)
    assert(idx.pq.m == 2 && idx.pq.dsub == 4)
  }

  test("ivfpq add: every coded row carries a cluster assignment and m " +
       "codes (TestIVFPQIndexAdd ivfpq_index_test.go:206-264)") {
    val idx = IvfPq.build(constTrain(8), nlist = 2, m = 4, ksub = 8,
      maxIter = 3)
    val added = IvfPq.encode(df(
      (1L, Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)),
      (2L, Array(2f, 3f, 4f, 5f, 6f, 7f, 8f, 9f)),
      (3L, Array(3f, 4f, 5f, 6f, 7f, 8f, 9f, 10f))), idx)
    val rows = added.collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val cluster = r.getAs[Int]("cluster")
      assert(cluster >= 0 && cluster < 2)
      assert(r.getSeq[Int](r.fieldIndex("codes")).length == 4)
    }
  }

  test("ivfpq remove/flush matrix + soft-delete with search at " +
       "probe-all: mask hides, flush removes, {node1, node4} survive, " +
       "repeated flushes safe (TestIVFPQIndexRemove/Flush/" +
       "SoftDeleteWithSearch ivfpq_index_test.go:329-507, 964-1069)") {
    val base = IvfPq.build(constTrain(8), nlist = 2, m = 4, ksub = 8,
      maxIter = 3)
    val nodes = df(
      (1L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (2L, Array(2f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (3L, Array(3f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (4L, Array(4f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)))
    val idx = base.copy(encoded = IvfPq.encode(nodes, base))
    val query = q(Array(1.5f, 0f, 0f, 0f, 0f, 0f, 0f, 0f))
    assert(IvfPq.search(idx, query, 10, nprobe = 2).count() == 4)
    // soft phase: storage untouched, search masks via the candidate set
    val s = spark
    import s.implicits._
    val liveIds = Seq(1L, 4L).toDF("id")
    val got = IvfPq.search(idx, query, 10, nprobe = 2,
      candidates = Some(liveIds)).collect().map(_.getLong(1)).toSet
    assert(got == Set(1L, 4L))
    assert(idx.encoded.count() == 4)
    // flush with no deletions keeps all
    assert(IvfPq.delete(idx, Seq.empty).encoded.count() == 4)
    // flush removes; repeated flushes and unknown ids are no-ops
    val flushed = IvfPq.delete(idx, Seq(2L, 3L))
    assert(flushed.encoded.select("id").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 4L))
    assert(IvfPq.delete(flushed, Seq(2L, 999L)).encoded.count() == 2)
    assert(IvfPq.search(flushed, query, 10, nprobe = 2)
      .collect().map(_.getLong(1)).toSet == Set(1L, 4L))
  }

  test("ivfpq multiple training: a rebuild on a shifted corpus replaces " +
       "coarse AND fine quantizers; adds after the rebuild route through " +
       "the new models (TestIVFPQIndexMultipleTraining " +
       "ivfpq_index_test.go:860-913)") {
    val s = spark
    import s.implicits._
    val idx1 = IvfPq.build(constTrain(8), nlist = 2, m = 4, ksub = 8,
      maxIter = 3)
    val shifted = (0 until 100).map(i =>
      (2000L + i, Array.fill(8)((i + 100).toFloat))).toDF("id", "vector")
    val idx2 = IvfPq.build(shifted, nlist = 2, m = 4, ksub = 8, maxIter = 3)
    assert(!java.util.Arrays.deepEquals(
      idx1.coarse.centroids.asInstanceOf[Array[AnyRef]],
      idx2.coarse.centroids.asInstanceOf[Array[AnyRef]]))
    val extra = IvfPq.encode(df((9000L, Array.fill(8)(160f))), idx2)
    val grown = idx2.copy(encoded = idx2.encoded.unionByName(extra))
    // quantization ties by construction: every corpus vector whose
    // coordinates map to the same ksub=8 codewords as all-160 shares its
    // FULL code, so ADC scores tie and rank-1 falls to the smallest id.
    // The routing claim (the add encoded under the NEW coarse+fine
    // models) is that 9000 sits IN the tie group at the best score
    val got = IvfPq.search(grown, q(Array.fill(8)(160f)), 30, nprobe = 2)
      .collect()
    val best = got.map(_.getDouble(2)).min
    val at9000 = got.find(_.getLong(1) == 9000L)
    assert(at9000.isDefined, s"appended id missing from top-30: " +
      got.map(_.getLong(1)).mkString(","))
    assert(math.abs(at9000.get.getDouble(2) - best) < 1e-9,
      s"appended id not at the best ADC score: ${at9000.get.getDouble(2)} " +
        s"vs $best")
  }

  test("ivfpq serialization with deletions: the artifact carries the " +
       "flushed state; reload round-trips coarse + fine models and " +
       "search results (TestIVFPQIndexSerializationWithDeletions " +
       "ivfpq_index_test.go:1317-1395)") {
    val base = IvfPq.build(constTrain(8), nlist = 2, m = 4, ksub = 8,
      maxIter = 3)
    val nodes = df(
      (1L, Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)),
      (2L, Array(2f, 3f, 4f, 5f, 6f, 7f, 8f, 9f)),
      (3L, Array(3f, 4f, 5f, 6f, 7f, 8f, 9f, 10f)))
    val idx = IvfPq.delete(base.copy(encoded = IvfPq.encode(nodes, base)),
      Seq(2L))
    val dir = java.nio.file.Files.createTempDirectory("ivfpqser").toString
    IvfPq.write(idx, s"$dir/idx")
    val idx2 = IvfPq.read(spark, s"$dir/idx")
    assert(idx2.encoded.select("id").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 3L))
    val query = q(Array(2f, 3f, 4f, 5f, 6f, 7f, 8f, 9f))
    val a = IvfPq.search(idx, query, 10, nprobe = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val b = IvfPq.search(idx2, query, 10, nprobe = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(a == b)
  }

  // ---- flat matrix (flat_index_test.go) ----

  test("flat flush matrix + soft-delete with search: mask hides at " +
       "search, flush removes, node3 survives, node-search on deleted " +
       "errors, repeated flushes safe (TestFlatIndexFlush " +
       "flat_index_test.go:256-314, TestFlatIndexSoftDeleteWithSearch " +
       ":343-436)") {
    val data = df(
      (1L, Array(1f, 2f, 3f)),
      (2L, Array(4f, 5f, 6f)),
      (3L, Array(7f, 8f, 9f)))
    // flush with no deletions keeps all
    assert(FlatKnn.delete(data, Seq.empty).count() == 3)
    // soft phase: the mask filters search without touching the frame
    val masked = data.filter(!col("id").isin(1L, 2L))
    assert(FlatKnn.search(masked, q(Array(4f, 5f, 6f)), 10)
      .collect().map(_.getLong(1)).toSeq == Seq(3L))
    // node-search on a deleted id errors
    val e = intercept[IllegalArgumentException](
      VectorSearch.onFlat(masked).withNodes(1L).withK(5).execute())
    assert(e.getMessage.contains("not found"))
    // flush: only node3 remains; repeated flush + unknown id are no-ops
    val flushed = FlatKnn.delete(data, Seq(1L, 2L))
    assert(flushed.collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(FlatKnn.delete(flushed, Seq(1L, 999L)).count() == 1)
  }

  test("flat empty-index serialization: an empty frame round-trips and " +
       "serves empty results without error " +
       "(TestFlatIndexEmptyIndexSerialization flat_index_test.go:1024-1074)") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "vector")
    val dir = java.nio.file.Files.createTempDirectory("flatser").toString
    FlatKnn.write(empty, Metric.L2, s"$dir/idx")
    val (data2, met) = FlatKnn.read(spark, s"$dir/idx")
    assert(met == Metric.L2)
    assert(data2.count() == 0)
    assert(FlatKnn.search(data2, q(Array(1f, 2f, 3f)), 5).count() == 0)
  }

  // ---- automatic parameter derivation (TestCalculatePQParams,
  // pq_index_test.go:11-45: the reference's CalculatePQParams table,
  // pinned value-for-value) ----

  test("pq params derivation table: m=8 for byte-aligned dims, smallest " +
       "divisor in [8,32] otherwise (100 -> 10, 17 -> 17), nbits fixed " +
       "at 8; every returned m divides dim (TestCalculatePQParams " +
       "pq_index_test.go:11-45)") {
    val want = Seq(768 -> 8, 384 -> 8, 128 -> 8, 64 -> 8, 32 -> 8,
      16 -> 8, 100 -> 10, 17 -> 17)
    for ((dim, m) <- want) {
      val (gotM, gotNbits) = Pq.defaultParams(dim)
      assert(gotM == m, s"defaultParams($dim) m=$gotM want $m")
      assert(gotNbits == 8, s"defaultParams($dim) nbits=$gotNbits")
      assert(dim % gotM == 0, s"m=$gotM does not divide dim=$dim")
    }
  }

  // ---- metric matrix (TestPQIndexDifferentDistanceMetrics :709-758,
  // TestIVFPQIndexDifferentDistanceMetrics ivfpq_index_test.go:617-670) ----

  test("pq different distance metrics: train+add+search under each of " +
       "L2/L2Sq/Cosine yields exactly one coded row and the added id at " +
       "rank 1 (pq_index_test.go:709-758)") {
    val s = spark
    import s.implicits._
    // the reference's corpus: value i+1 per coordinate, nonzero for cosine
    val train = (0 until 100).map(i =>
      (1000L + i, Array.fill(8)((i + 1).toFloat))).toDF("id", "vector")
    for (met <- Seq(Metric.L2, Metric.L2Sq, Metric.Cosine)) {
      val mod = Pq.train(train, m = 4, ksub = 16, maxIter = 3, metric = met)
      val enc = Pq.encode(
        df((7L, Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f))), mod)
      val rows = enc.collect()
      assert(rows.length == 1 && rows(0).getLong(0) == 7L)
      assert(rows(0).getSeq[Int](1).length == 4)
      val hit = Pq.search(enc, mod,
        q(Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)), 1).head()
      assert(hit.getLong(1) == 7L, s"metric $met missed the added id")
    }
  }

  test("ivfpq different distance metrics: build+search under each of " +
       "L2/L2Sq/Cosine returns results from the probed lists " +
       "(ivfpq_index_test.go:617-670)") {
    for (met <- Seq(Metric.L2, Metric.L2Sq, Metric.Cosine)) {
      val idx = IvfPq.build(constTrain(8), nlist = 2, m = 4, ksub = 8,
        maxIter = 3, metric = met)
      val got = IvfPq.search(idx, q(Array.fill(8)(50f)), 5, nprobe = 2)
      assert(got.count() == 5, s"metric $met returned too few")
    }
  }

  // ---- compression ratio (TestPQIndexCompressionRatio :759-798) ----

  test("pq compression ratio: dim=768 m=8 packs each vector into m code " +
       "bytes — >= 100x against float32 raw, the reference's 192x " +
       "claim's arithmetic (pq_index_test.go:759-798)") {
    val s = spark
    import s.implicits._
    val dim = 768
    val train = (0 until 300).map(i =>
      (1000L + i,
        Array.tabulate(dim)(j => ((i * dim + j) % 100).toFloat)))
      .toDF("id", "vector")
    val mod = Pq.train(train, m = 8, ksub = 16, maxIter = 2)
    val served = Pq.serve(Pq.encode(train, mod), mod)
    // byteSize = ids*8 + codes (m bytes/vector) + shared codebooks:
    // per-vector marginal cost is m code bytes
    val codebookBytes = 8L * 16 * (dim / 8) * 4
    val codeBytes = served.byteSize - 300L * 8 - codebookBytes
    assert(codeBytes == 300L * 8,
      s"expected m=8 bytes/vector, got $codeBytes for 300 vectors")
    val ratio = (dim * 4).toDouble / 8.0
    assert(ratio >= 100, s"compression ratio $ratio < 100x")
  }

  // ---- IVFPQ residual encoding + list distribution
  // (TestIVFPQIndexResidualEncoding ivfpq_index_test.go:788-859,
  // TestIVFPQIndexGetListSizesDistribution :914-963) ----

  test("ivfpq residual encoding: an added vector lands in exactly one " +
       "inverted list with an m-length code, every element inside " +
       "[0, ksub) (ivfpq_index_test.go:788-859)") {
    val idx = IvfPq.build(constTrain(8), nlist = 2, m = 4, ksub = 8,
      maxIter = 3)
    val extra = IvfPq.encode(
      df((7777L, Array.tabulate(8)(_.toFloat))), idx)
    val rows = extra.collect()
    assert(rows.length == 1, "added vector must land in exactly one list")
    val r = rows(0)
    val cluster = r.getInt(r.fieldIndex("cluster"))
    assert(cluster >= 0 && cluster < 2, s"cluster $cluster out of range")
    val code = r.getSeq[Int](r.fieldIndex("codes"))
    assert(code.length == 4, s"code length ${code.length} != m")
    assert(code.forall(c => c >= 0 && c < 8),
      s"code element out of [0, ksub): $code")
  }

  test("ivfpq list sizes distribution: clustered corpus spreads across " +
       "all nlist lists; per-list counts sum to the corpus size " +
       "(ivfpq_index_test.go:914-963)") {
    val s = spark
    import s.implicits._
    val nlist = 4
    // 200 rows in 4 well-separated clusters (the reference's generator)
    val train = (0 until 200).map { i =>
      val cluster = i % nlist
      (i.toLong, Array.fill(8)((cluster * 100 + i % 4).toFloat))
    }.toDF("id", "vector")
    val idx = IvfPq.build(train, nlist = nlist, m = 4, ksub = 8,
      maxIter = 5)
    val sizes = idx.encoded.groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keys.forall(c => c >= 0 && c < nlist))
    assert(sizes.values.sum == 200L,
      s"list sizes ${sizes.values.sum} != corpus 200")
    assert(sizes.size == nlist,
      s"well-separated clusters used ${sizes.size}/$nlist lists")
  }

  // ---- invalid persisted artifacts fail loudly
  // (TestPQIndexReadFromInvalidData pq_index_test.go:1398-1467,
  // TestIVFPQIndexReadFromInvalidData ivfpq_index_test.go:1396-1465,
  // TestFlatIndexReadFromInvalidData flat_index_test.go:775-886; the
  // byte-level magic/version rows map to parquet's own footer checks —
  // the contract under test is LOUD failure, never a silently-empty
  // index) ----

  test("read from invalid data fails loudly for every family: missing " +
       "dir, empty dir, and garbage files all throw — never a silent " +
       "empty index (pq:1398-1467, ivfpq:1396-1465, flat:775-886)") {
    val missing = "/tmp/graft-no-such-index-xyz"
    intercept[Exception](Pq.read(spark, missing))
    intercept[Exception](IvfPq.read(spark, missing))
    intercept[Exception](FlatKnn.read(spark, missing))
    val emptyDir = java.nio.file.Files
      .createTempDirectory("graft-empty-idx").toString
    intercept[Exception](Pq.read(spark, emptyDir))
    intercept[Exception](IvfPq.read(spark, emptyDir))
    intercept[Exception](FlatKnn.read(spark, emptyDir))
    val garbage = java.nio.file.Files
      .createTempDirectory("graft-garbage-idx")
    java.nio.file.Files.write(garbage.resolve("codes"),
      "XXXX not parquet".getBytes)
    intercept[Exception](Pq.read(spark, garbage.toString))
    intercept[Exception](IvfPq.read(spark, garbage.toString))
    intercept[Exception](FlatKnn.read(spark, garbage.toString))
  }

  // ---- the DISTRIBUTED ingest path rejects wrong-dim rows (the same
  // contract the driver-side Model.encode row pins above, now on the
  // codegen kernels where an unchecked UnsafeArrayData read would be
  // silent garbage, not an exception) ----

  test("distributed encode/assign kernels reject wrong-dim rows loudly: " +
       "pq_encode and nearest_centroid throw on a short row instead of " +
       "reading past the array (pq_index_test.go:288-318, " +
       "ivfpq_index_test.go:265-296 — the Add-dim-mismatch contract on " +
       "the batch path)") {
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    val mod = Pq.train(constTrain(8), m = 4, ksub = 4, maxIter = 3)
    val bad = df((1L, Array(1f, 2f)))
    val e1 = intercept[Exception](Pq.encode(bad, mod).collect())
    assert(chain(e1).exists(_.contains("dim")), chain(e1).mkString(" | "))
    val idx = IvfPq.build(constTrain(8), nlist = 2, m = 4, ksub = 4,
      maxIter = 3)
    val e2 = intercept[Exception](IvfPq.encode(bad, idx).collect())
    assert(chain(e2).exists(_.contains("dim")), chain(e2).mkString(" | "))
  }
}
