package graft

import graft.fusion.Fusion

/** Pins the exact RRF/weighted/max/min arithmetic from fusion_test.go. */
class FusionSpec extends SparkSpec {

  private def df(rows: (Long, Double)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "score")
  }

  private def toMap(d: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    d.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

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
}
