package graft

import graft.fusion.Fusion
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the exact RRF/weighted/max/min arithmetic from fusion_test.go,
  * plus strategy properties: missing-modality contribution, inner-vs-outer
  * semantics, and the MaxRankInput guard's no-op-for-legitimate-callers
  * contract. */
class FusionSpec extends SparkSpec {

  private def df(rows: (Long, Double)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "score")
  }

  private def toMap(res: DataFrame): Map[Long, Double] =
    res.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap

  // fusion_test.go:138-201 fixture
  private val vec = df(1L -> 0.1, 2L -> 0.3, 3L -> 0.5)
  private val txt = df(1L -> 20.0, 2L -> 15.0, 4L -> 10.0)

  test("RRF exact arithmetic (fusion_test.go:138-201)") {
    val got = toMap(Fusion.rrf(vec, txt))
    assert(math.abs(got(1L) - (1.0 / 60 + 1.0 / 60)) < 1e-12)
    assert(math.abs(got(2L) - (1.0 / 61 + 1.0 / 61)) < 1e-12)
    assert(math.abs(got(3L) - 1.0 / 62) < 1e-12)
    assert(math.abs(got(4L) - 1.0 / 62) < 1e-12)
  }

  test("weighted sum: missing modality contributes 0 (fusion.go:131-149)") {
    val got = toMap(Fusion.weightedSum(vec, txt, 2.0, 1.0))
    assert(got(1L) == 2.0 * 0.1 + 20.0)
    assert(got(3L) == 2.0 * 0.5)
    assert(got(4L) == 10.0)
  }

  test("max fusion is full-outer (fusion.go:258-276)") {
    val got = toMap(Fusion.maxFusion(vec, txt))
    assert(got(1L) == 20.0 && got(3L) == 0.5 && got(4L) == 10.0)
  }

  test("min fusion is inner: only docs in BOTH modalities (fusion.go:291-306)") {
    val got = toMap(Fusion.minFusion(vec, txt))
    assert(got == Map(1L -> 0.1, 2L -> 0.3))
  }

  test("rrf: 0-based dense ranks, asc for distances, desc for relevance") {
    val v = df(1L -> 0.1, 2L -> 0.2) // distances: 1 ranks 0, 2 ranks 1
    val t = df(2L -> 9.0, 1L -> 1.0) // relevance: 2 ranks 0, 1 ranks 1
    val res = toMap(Fusion.rrf(v, t, 60.0))
    assert(math.abs(res(1L) - (1.0 / 60 + 1.0 / 61)) < 1e-12)
    assert(math.abs(res(2L) - (1.0 / 61 + 1.0 / 60)) < 1e-12)
  }

  test("rrf: one-sided doc gets only its own modality's term") {
    val v = df(1L -> 0.1)
    val t = df(2L -> 5.0)
    val res = toMap(Fusion.rrf(v, t))
    assert(math.abs(res(1L) - 1.0 / 60) < 1e-12)
    assert(math.abs(res(2L) - 1.0 / 60) < 1e-12)
  }

  test("rrf custom k shifts every term (TestReciprocalRankFusion_CustomK)") {
    val got = toMap(Fusion.rrf(vec, txt, k = 10.0))
    assert(math.abs(got(1L) - (1.0 / 10 + 1.0 / 10)) < 1e-12)
    assert(math.abs(got(2L) - (1.0 / 11 + 1.0 / 11)) < 1e-12)
    assert(math.abs(got(3L) - 1.0 / 12) < 1e-12)
  }

  test("weighted sum with zero weights zeroes every score but keeps the " +
       "doc set (TestWeightedSumFusion_ZeroWeights)") {
    val got = toMap(Fusion.weightedSum(vec, txt, 0.0, 0.0))
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got.values.forall(_ == 0.0))
  }

  test("empty inputs: every strategy returns empty on empty x empty " +
       "(TestWeightedSumFusion_Empty / ScoreMapToRanks_Empty)") {
    val e = df()
    assert(toMap(Fusion.weightedSum(e, e, 1.0, 1.0)).isEmpty)
    assert(toMap(Fusion.rrf(e, e)).isEmpty)
    assert(toMap(Fusion.maxFusion(e, e)).isEmpty)
    assert(toMap(Fusion.minFusion(e, e)).isEmpty)
    // one-sided empty: outer strategies keep the live side, min drops all
    assert(toMap(Fusion.rrf(vec, e)).keySet == Set(1L, 2L, 3L))
    assert(toMap(Fusion.minFusion(vec, e)).isEmpty)
  }

  test("rrf tie-break is deterministic: equal scores rank by id ascending " +
       "(sequential ranks, fusion.go sort-then-enumerate)") {
    // docs 1 and 2 tie on vector score: rank order must be id asc (1 -> 0,
    // 2 -> 1) every run — not hash/partition order
    val tied = df(2L -> 0.5, 1L -> 0.5, 3L -> 0.9)
    val got = toMap(Fusion.rrf(tied, df()))
    assert(math.abs(got(1L) - 1.0 / 60) < 1e-12)
    assert(math.abs(got(2L) - 1.0 / 61) < 1e-12)
    assert(math.abs(got(3L) - 1.0 / 62) < 1e-12)
  }

  test("rrf MaxRankInput pre-cut: no-op for top-k inputs, bounded for abusers") {
    val s = spark
    // legitimate top-k-truncated inputs: identical result with/without cut
    val v = df((1L to 50L).map(i => i -> i * 0.1): _*)
    val t = df((30L to 80L).map(i => i -> (100.0 - i)): _*)
    val direct = toMap(Fusion.rrf(v, t))
    assert(direct.size == 80)
    // an "unbounded" input larger than the cap still completes, keeping
    // the best-ranked MaxRankInput rows — the window never sees more
    val big = s.range(0, Fusion.MaxRankInput + 500)
      .select(col("id"), (col("id") * 0.001).as("score"))
    val res = Fusion.rrf(big, df(1L -> 1.0))
    assert(res.count() <= Fusion.MaxRankInput + 1)
  }
}
