package graft.vector

import org.apache.spark.sql.functions._

/** [[Recall]] — the reference's flat-as-ground-truth accuracy harness
  * (docs/INDEX.md:422-463): divide-by-K semantics, zero-match queries,
  * and a real approximate-index pairing. */
class RecallSpec extends graft.SparkSpec {

  private def vecOf(i: Long, d: Int = 8): Array[Float] =
    Array.tabulate(d)(j => (math.sin(i * 1.3 + j * 0.7) * 10).toFloat)

  test("recall@k algebra: identical sets → 1.0, disjoint → 0.0, partial " +
       "overlap → matches/k, and a short exact list divides by K (the " +
       "reference's EvaluateIndexAccuracy denominator)") {
    val s = spark
    import s.implicits._
    val exact = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
      (1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 9L), (2L, 10L),                      // short list: corpus < k
      (3L, 5L), (3L, 6L), (3L, 7L), (3L, 8L)).toDF("qid", "id")
    val approx = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), // all 4
      (1L, 1L), (1L, 2L), (1L, 99L), (1L, 98L),              // half
      (2L, 9L), (2L, 10L), (2L, 11L), (2L, 12L),             // short exact
      (3L, 90L), (3L, 91L), (3L, 92L), (3L, 93L)).toDF("qid", "id") // none
    val r = Recall.atK(approx, exact, 4).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(0L) == 1.0 && r(1L) == 0.5 && r(3L) == 0.0)
    assert(r(2L) == 0.5, "short exact list must divide by K, not |exact|")
    assert(math.abs(Recall.meanAtK(approx, exact, 4) - 0.5) < 1e-12)
  }

  test("vsFlat pairing: an exhaustive HNSW beam scores 1.0; a one-probe " +
       "IVF over clustered geometry scores strictly less (the trade the " +
       "harness exists to measure); both land in [0,1]") {
    val s = spark
    import s.implicits._
    // two well-separated clusters so nprobe=1 must miss cross-cluster hits
    val data = (0L until 60L).map { i =>
      val base = if (i % 2 == 0) 0f else 100f
      (i, vecOf(i).map(_ * 0.1f + base))
    }.toDF("id", "vector")
    // queries BETWEEN the clusters: exact top-k spans both, nprobe=1 sees one
    val queries = (0 until 4).map(qi =>
      (qi.toLong, Array.fill(8)(50f + qi))).toDF("qid", "qvec")
    val hnsw = Hnsw.build(data.repartition(2))
    val rHnsw = Recall.vsFlat(data, queries, 10)(
      (q, k) => Hnsw.searchIndex(hnsw, q, k, efSearch = 5000))
    assert(rHnsw == 1.0, s"exhaustive HNSW recall $rHnsw != 1.0")
    val ivf = Ivf.build(data, nlist = 2, maxIter = 10)
    val rIvf = Recall.vsFlat(data, queries, 10)(
      (q, k) => Ivf.search(ivf, q, k, nprobe = 1))
    assert(rIvf >= 0.0 && rIvf < 1.0,
      s"one-probe IVF over split clusters should lose recall, got $rIvf")
    // probe-all restores exactness
    val rAll = Recall.vsFlat(data, queries, 10)(
      (q, k) => Ivf.search(ivf, q, k, nprobe = 2))
    assert(rAll == 1.0, s"probe-all IVF recall $rAll != 1.0")
  }

  test("meanAtKLocal (the embedded-serving twin ScaleProbe delegates to) " +
       "equals meanAtK on the same result sets — one accounting, two " +
       "execution shapes") {
    val s = spark
    import s.implicits._
    val exactPairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
      (1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 9L), (2L, 10L),
      (3L, 5L), (3L, 6L), (3L, 7L), (3L, 8L))
    val approxPairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
      (1L, 1L), (1L, 2L), (1L, 99L), (1L, 98L),
      (2L, 9L), (2L, 10L), (2L, 11L), (2L, 12L),
      (3L, 90L), (3L, 91L), (3L, 92L), (3L, 93L))
    val viaFrames = Recall.meanAtK(approxPairs.toDF("qid", "id"),
      exactPairs.toDF("qid", "id"), 4)
    val truthSets = exactPairs.groupBy(_._1)
      .map { case (q, ps) => q -> ps.map(_._2).toSet }
    val local = approxPairs.groupBy(_._1).toSeq
      .map { case (q, ps) => q -> (ps.map(_._2): Iterable[Long]) }
    assert(math.abs(Recall.meanAtKLocal(local, truthSets, 4) - viaFrames)
      < 1e-12, "local twin diverged from the DataFrame accounting")
    // duplicate ids must not inflate (set semantics, both shapes)
    val dup = local.map { case (q, ids) => q -> (ids ++ ids) }
    assert(math.abs(Recall.meanAtKLocal(dup, truthSets, 4) - viaFrames)
      < 1e-12, "duplicates inflated the local accounting")
    // ADVICE r13: the local twin must key its average on EXACT's qids,
    // like atK does — the three shapes where the old approx-keyed
    // accounting diverged from the DataFrame one:
    // (a) an approx entry for a qid absent from truth is IGNORED (atK
    //     takes its qid universe from exact) — not averaged in as junk
    val extra = local :+ (42L -> (Seq(1L, 2L): Iterable[Long]))
    assert(math.abs(Recall.meanAtKLocal(extra, truthSets, 4) - viaFrames)
      < 1e-12, "an out-of-truth approx entry changed the mean")
    // (b) a truth qid with NO approx entry scores 0 and stays in the
    //     denominator — dropping it would inflate the mean
    val missing = local.filterNot(_._1 == 0L)
    val viaFramesMissing = Recall.meanAtK(
      approxPairs.filterNot(_._1 == 0L).toDF("qid", "id"),
      exactPairs.toDF("qid", "id"), 4)
    assert(math.abs(Recall.meanAtKLocal(missing, truthSets, 4)
      - viaFramesMissing) < 1e-12,
      "a truth qid with no approx entry was dropped from the denominator")
    // (c) duplicate ENTRIES for one qid merge into one id set instead of
    //     double-counting that query in the average
    val split = local.flatMap { case (q, ids) =>
      val v = ids.toSeq
      Seq(q -> (v.take(2): Iterable[Long]), q -> (v.drop(2): Iterable[Long]))
    }
    assert(math.abs(Recall.meanAtKLocal(split, truthSets, 4) - viaFrames)
      < 1e-12, "duplicate qid entries were double-counted")
  }
}
