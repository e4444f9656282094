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

  test("autocut enumeration table, row-for-row with expected indices " +
       "(TestAutocut, limiter_test.go:185-255)") {
    val rows: Seq[(String, Seq[Double], Int, Int)] = Seq(
      ("empty slice", Seq.empty, 1, 0),
      ("single element", Seq(1.0), 1, 1),
      ("two elements", Seq(1.0, 2.0), 1, 2),
      ("linear distribution - no clear cutoff",
        Seq(0.1, 0.2, 0.3, 0.4, 0.5), 1, 2),
      ("clear gap after first few results",
        Seq(0.1, 0.15, 0.2, 0.5, 0.6, 0.7, 0.8), 1, 3),
      ("cluster with outliers",
        Seq(0.1, 0.12, 0.13, 0.14, 0.15, 0.8, 0.9, 1.0), 1, 5),
      ("cutoff 2 - find second extremum",
        Seq(0.1, 0.2, 0.4, 0.45, 0.7, 0.75, 0.9, 1.0), 2, 4),
      ("cutoff higher than extrema count",
        Seq(0.1, 0.2, 0.5, 0.6), 5, 4),
      ("all same values", Seq(0.5, 0.5, 0.5, 0.5, 0.5), 1, 5))
    rows.foreach { case (name, scores, cutoff, want) =>
      val got = ScoreAgg.autocutIndex(scores.toIndexedSeq, cutoff)
      assert(got == want, s"'$name': Autocut = $got, want $want")
    }
  }

  test("k sanitization table through limit (TestSanitizeK, " +
       "limiter_test.go:7-74): k <= 0 or k > n returns all n rows, " +
       "in-bounds k returns k, an empty corpus returns 0 regardless") {
    val s = spark
    import s.implicits._
    val ten = (0L until 10L).map(i => (i, i.toDouble)).toDF("id", "score")
      .orderBy("score")
    // (k, want) — maxResults is our row count (10)
    Seq(0 -> 10L, -5 -> 10L, 100 -> 10L, 5 -> 5L, 10 -> 10L, 1 -> 1L)
      .foreach { case (k, want) =>
        assert(ScoreAgg.limit(ten, k).count() == want,
          s"limit(k=$k) on 10 rows")
      }
    // "maxResults is zero" / "both zero": an empty corpus yields 0 rows
    val none = Seq.empty[(Long, Double)].toDF("id", "score")
    Seq(5, 0).foreach(k => assert(ScoreAgg.limit(none, k).count() == 0L))
  }

  test("limit preserves order and never reorders surviving rows " +
       "(TestLimitResults/PreservesOrder, limiter_test.go:75-184)") {
    val s = spark
    import s.implicits._
    val sorted = Seq((3L, 0.1), (1L, 0.2), (4L, 0.3), (2L, 0.4), (5L, 0.5))
      .toDF("id", "score").orderBy("score")
    val got = ScoreAgg.limit(sorted, 3).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 1L, 4L), s"limit changed result order: $got")
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

  test("aggregation matrix: exact values, dedup, and sort direction " +
       "(aggregation_test.go:7-392)") {
    val s = spark
    import s.implicits._
    // vector leg: ascending scores (distances, lower = better)
    val vec = Seq((1L, 0.1), (2L, 0.2), (1L, 0.15), (3L, 0.3), (1L, 0.05))
      .toDF("id", "score")
    val vsum = ScoreAgg.aggregate(vec, ScoreAgg.Sum, ascending = true)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(vsum.length == 3)                       // 3 unique ids
    assert(math.abs(vsum.toMap.apply(1L) - 0.3) < 1e-12) // 0.1+0.15+0.05
    assert(vsum.map(_._2).toSeq == vsum.map(_._2).sorted.toSeq) // ascending
    val vmax = ScoreAgg.aggregate(
      Seq((1L, 0.1), (2L, 0.2), (1L, 0.5), (1L, 0.15)).toDF("id", "score"),
      ScoreAgg.Max, ascending = true).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(vmax(1L) == 0.5 && vmax(2L) == 0.2)
    val vmean = ScoreAgg.aggregate(
      Seq((1L, 0.1), (2L, 0.2), (1L, 0.2), (1L, 0.3)).toDF("id", "score"),
      ScoreAgg.Mean, ascending = true).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(math.abs(vmean(1L) - 0.2) < 1e-12)      // (0.1+0.2+0.3)/3
    // text leg: descending scores (BM25, higher = better)
    val txt = Seq((1L, 1.5), (2L, 2.0), (1L, 1.8), (3L, 3.0), (1L, 1.2))
      .toDF("id", "score")
    val tsum = ScoreAgg.aggregate(txt, ScoreAgg.Sum, ascending = false)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(tsum.length == 3)
    assert(math.abs(tsum.toMap.apply(1L) - 4.5) < 1e-12) // 1.5+1.8+1.2
    assert(tsum.map(_._2).toSeq == tsum.map(_._2).sorted.reverse.toSeq)
    val tmax = ScoreAgg.aggregate(
      Seq((1L, 1.5), (2L, 2.0), (1L, 3.5), (1L, 2.2)).toDF("id", "score"),
      ScoreAgg.Max, ascending = false).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(tmax(1L) == 3.5)
    val tmean = ScoreAgg.aggregate(
      Seq((1L, 1.5), (2L, 2.0), (1L, 2.1), (1L, 2.4)).toDF("id", "score"),
      ScoreAgg.Mean, ascending = false).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(math.abs(tmean(1L) - 2.0) < 1e-12)      // (1.5+2.1+2.4)/3
    // empty and single-result inputs for every kind x direction
    val empty = Seq.empty[(Long, Double)].toDF("id", "score")
    val single = Seq((1L, 0.5)).toDF("id", "score")
    for (kind <- Seq(ScoreAgg.Sum, ScoreAgg.Max, ScoreAgg.Mean);
         asc <- Seq(true, false)) {
      assert(ScoreAgg.aggregate(empty, kind, asc).count() == 0)
      val one = ScoreAgg.aggregate(single, kind, asc).collect()
      assert(one.length == 1 && one.head.getDouble(1) == 0.5)
    }
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

  test("autocut on constant scores: zero range means no extrema, no cut " +
       "(the 0/0 NaN path the reference's float math also takes — every " +
       "comparison with NaN is false, so all ties are kept)") {
    assert(ScoreAgg.autocutIndex(IndexedSeq(0.5, 0.5, 0.5, 0.5), 1) == 4)
    assert(ScoreAgg.autocutIndex(IndexedSeq(0.0, 0.0), 2) == 2)
    // constant prefix then a jump still cuts (range is nonzero)
    val jump = ScoreAgg.autocutIndex(IndexedSeq(0.1, 0.1, 0.1, 0.9), 1)
    assert(jump >= 3 && jump <= 4)
  }

  test("autocut on real-world score shapes, inside the reference's own " +
       "acceptance bands (TestAutocutWithRealWorldScores, " +
       "limiter_test.go:383-438 — bands hold exactly now that the diff " +
       "runs in float32 like the reference)") {
    // tight cluster of 5, then outliers: band [8,10]
    val cluster = IndexedSeq(0.05, 0.06, 0.07, 0.08, 0.09,
      0.5, 0.6, 0.7, 0.8, 0.9)
    val c1 = ScoreAgg.autocutIndex(cluster, 1)
    assert(c1 >= 8 && c1 <= 10, s"tight-cluster cut at $c1")
    // near-gradual increase: 0.1 steps are NOT exact in binary floating
    // point, so the float32 diff curve has rounding-level extrema and
    // the cut lands early — the reference's band is [2,3]. A truly
    // exact ramp (no cut) is pinned in the hand-traced test above.
    val gradual = IndexedSeq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0)
    val cg = ScoreAgg.autocutIndex(gradual, 1)
    assert(cg >= 2 && cg <= 3, s"gradual-increase cut at $cg")
    // three clusters: nth=1 cuts after the first, band [3,4]
    val clusters = IndexedSeq(0.1, 0.12, 0.14, 0.5, 0.52, 0.54, 0.9, 0.92)
    val c3 = ScoreAgg.autocutIndex(clusters, 1)
    assert(c3 >= 3 && c3 <= 4, s"two-cluster cut at $c3")
    // nth=2 reaches past the second boundary (our extension row)
    val c32 = ScoreAgg.autocutIndex(clusters, 2)
    assert(c32 > c3 && c32 <= clusters.length, s"nth=2 cut at $c32")
  }

  test("score-boost and top-k rerankers over a flat search " +
       "(reranker_test.go:141-239)") {
    val s = spark
    import s.implicits._
    val data = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(0.8f, 0.2f, 0.0f)),
      (3L, Array(0.6f, 0.4f, 0.0f)), (4L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("id", "vector")
    val base = graft.vector.VectorSearch.onFlat(data)
      .withQuery(Array(1.0f, 0.0f, 0.0f)).withK(4)
    // boost: shrink id 4's distance by 90% -> it jumps the ranking
    val boosted = base.withReranker { rows =>
      rows.map { r =>
        val id = r.getLong(0); val sc = r.getDouble(1)
        org.apache.spark.sql.Row(id, if (id == 4L) sc * 0.1 else sc)
      }.sortBy(_.getDouble(1))
    }.execute().collect().map(_.getLong(0))
    assert(boosted.head == 1L)          // exact match still first (0.0)
    assert(boosted(1) == 4L)            // boosted past 2 and 3
    // top-k reranker: k=4 requested, reranker truncates to 2
    val topk = base.withReranker(_.take(2)).execute().collect()
    assert(topk.length == 2)
    assert(topk.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }
}
