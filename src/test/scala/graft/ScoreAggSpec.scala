package graft

import graft.agg.ScoreAgg

class ScoreAggSpec extends SparkSpec {

  test("autocut: cut before first extremum of diff-vs-ramp (limiter.go:81-118)") {
    // a sharp plateau then a jump: diff curve has a local max at the jump
    val scores = IndexedSeq(0.0, 0.01, 0.02, 0.9, 0.95, 1.0)
    val cut = ScoreAgg.autocutIndex(scores, 1)
    assert(cut > 0 && cut < scores.length)
    // -1 disables
    assert(ScoreAgg.autocutIndex(scores, -1) == scores.length)
    // single element: no cut
    assert(ScoreAgg.autocutIndex(IndexedSeq(1.0), 1) == 1)
  }

  test("autocut matches reference on a hand-traced curve") {
    // linear ramp has no extrema -> no cut
    val linear = IndexedSeq(0.0, 0.25, 0.5, 0.75, 1.0)
    assert(ScoreAgg.autocutIndex(linear, 1) == linear.length)
    // step function [0,0,0,1,1]: diff = [0,-.25,-.5,.25,0] peaks at i=3
    val step = IndexedSeq(0.0, 0.0, 0.0, 1.0, 1.0)
    assert(ScoreAgg.autocutIndex(step, 1) == 3)
  }

  test("aggregate sum/max/mean with re-sort (aggregation.go)") {
    val s = spark
    import s.implicits._
    val multi = Seq((1L, 1.0), (1L, 3.0), (2L, 1.5), (3L, 5.0))
      .toDF("id", "score")
    val sum = ScoreAgg.aggregate(multi, ScoreAgg.Sum, ascending = true)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(sum.head == ((2L, 1.5))) // ascending: smallest combined first
    assert(sum.toMap == Map(1L -> 4.0, 2L -> 1.5, 3L -> 5.0))
    val mean = ScoreAgg.aggregate(multi, ScoreAgg.Mean, ascending = false)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(mean.head == ((3L, 5.0))) // descending: largest first
  }

  test("limit: k<=0 returns all (limiter.go:12-17)") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "score")
    assert(ScoreAgg.limit(d, 0).count() == 2)
    assert(ScoreAgg.limit(d, 1).count() == 1)
    assert(ScoreAgg.limit(d, 99).count() == 2)
  }

  test("reranker hook: user function over final results (index_search.go:50-60)") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("id", "score")
      .orderBy("score")
    val reversed = ScoreAgg.rerank(d, rows => rows.reverse)
    assert(reversed.collect().map(_.getLong(0)).toSeq == Seq(3L, 2L, 1L))
  }
}
