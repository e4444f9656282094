package graft

import graft.fusion.Fusion
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fusion strategy properties (fusion.go:131-306): missing-modality
  * contribution, inner-vs-outer semantics, RRF rank math, and the
  * MaxRankInput guard's no-op-for-legitimate-callers contract. */
class FusionSpec extends SparkSpec {

  private def df(rows: (Long, Double)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "score")
  }

  private def toMap(res: DataFrame): Map[Long, Double] =
    res.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap

  test("weightedSum: missing modality contributes 0 (fusion.go:131-149)") {
    val v = df(1L -> 0.5, 2L -> 1.5)
    val t = df(2L -> 3.0, 3L -> 2.0)
    val res = toMap(Fusion.weightedSum(v, t, 2.0, 0.5))
    assert(res == Map(1L -> 1.0, 2L -> 4.5, 3L -> 1.0))
  }

  test("rrf: 0-based dense ranks, asc for distances, desc for relevance (fusion.go:174-200)") {
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

  test("maxFusion full-outer vs minFusion inner (fusion.go:258-306)") {
    val v = df(1L -> 0.5, 2L -> 4.0)
    val t = df(2L -> 3.0, 3L -> 2.0)
    assert(toMap(Fusion.maxFusion(v, t)) ==
      Map(1L -> 0.5, 2L -> 4.0, 3L -> 2.0))
    assert(toMap(Fusion.minFusion(v, t)) == Map(2L -> 3.0))
  }

  test("rrf MaxRankInput pre-cut: no-op for top-k inputs, bounded for abusers") {
    val s = spark
    import s.implicits._
    // legitimate top-k-truncated inputs: identical result with/without cut
    val v = df((1L to 50L).map(i => i -> i * 0.1): _*)
    val t = df((30L to 80L).map(i => i -> (100.0 - i)): _*)
    val direct = toMap(Fusion.rrf(v, t))
    assert(direct.size == 80 - 1 + 1)
    // an "unbounded" input larger than the cap still completes, keeping
    // the best-ranked MaxRankInput rows — the window never sees more
    val big = s.range(0, Fusion.MaxRankInput + 500)
      .select(col("id"), (col("id") * 0.001).as("score"))
    val res = Fusion.rrf(big, df(1L -> 1.0))
    assert(res.count() <= Fusion.MaxRankInput + 1)
  }
}
