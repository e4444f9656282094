package graft.vector

import graft.agg.ScoreAgg
import org.apache.spark.sql.{DataFrame, Row}

/** Row-for-row port of the reranker contract tests
  * (`/root/reference/reranker_test.go`) — the user-supplied rerank hook
  * over the final ≤k slice (index_search.go:50-60). The reference ships
  * three example rerankers (reverse, score-boost-and-resort, top-k
  * limiter); each row here rebuilds the same reranker as a
  * [[ScoreAgg.Reranker]] (`Seq[Row] => Seq[Row]`) and pins the same
  * observable outcome through the fluent flat-index search.
  */
class RerankerSemanticsSpec extends graft.SparkSpec {

  private def flat(rows: Seq[(Long, Array[Float])]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "vector")
  }

  private def ids(df: DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).toSeq

  test("reverse reranker returns the same rows in reverse order " +
      "(reranker_test.go:71-138 TestRerankerWithFlatIndex)") {
    val data = flat(Seq(
      1L -> Array(1f, 0f, 0f), 2L -> Array(0f, 1f, 0f),
      3L -> Array(0f, 0f, 1f), 4L -> Array(0.5f, 0.5f, 0f)))
    val base = VectorSearch.onFlat(data)
      .withQuery(Array(1f, 0f, 0f)).withK(4)
    val noReranker = ids(base.execute())
    assert(noReranker.nonEmpty)
    val reversed = ids(base.withReranker(rows => rows.reverse).execute())
    assert(reversed.size == noReranker.size,
      s"reranker must not change the row count: $reversed vs $noReranker")
    assert(reversed == noReranker.reverse)
  }

  test("score-boost reranker rescales boosted ids and re-sorts ascending " +
      "(reranker_test.go:141-193 TestScoreBoostReranker)") {
    // L2 distances from [1,0,0]: id1=0, id2=sqrt(0.08)~0.283,
    // id3=sqrt(0.32)~0.566, id4=sqrt(2)~1.414 — so unboosted order is
    // 1,2,3,4. A 90% boost on id 4 (score * (1-0.9)) lands it at ~0.141,
    // between id1 and id2: boosted order 1,4,2,3.
    val data = flat(Seq(
      1L -> Array(1f, 0f, 0f), 2L -> Array(0.8f, 0.2f, 0f),
      3L -> Array(0.6f, 0.4f, 0f), 4L -> Array(0f, 1f, 0f)))
    val boost = Map(4L -> 0.9)
    val reranker: ScoreAgg.Reranker = rows =>
      rows.map { r =>
        val id = r.getLong(0)
        boost.get(id).fold(r)(b => Row(id, r.getDouble(1) * (1.0 - b)))
      }.sortBy(_.getDouble(1))
    val got = ids(VectorSearch.onFlat(data)
      .withQuery(Array(1f, 0f, 0f)).withK(4)
      .withReranker(reranker).execute())
    assert(got == Seq(1L, 4L, 2L, 3L),
      s"expected boosted id 4 to outrank 2 and 3, got $got")
  }

  test("top-k limiter reranker truncates the slice below the requested k " +
      "(reranker_test.go:196-238 TestTopKReranker)") {
    val data = flat(Seq(
      1L -> Array(1f, 0f, 0f), 2L -> Array(0f, 1f, 0f),
      3L -> Array(0f, 0f, 1f), 4L -> Array(0.5f, 0.5f, 0f),
      5L -> Array(0.3f, 0.3f, 0.3f)))
    val limitTo2: ScoreAgg.Reranker = rows => rows.take(2)
    val got = ids(VectorSearch.onFlat(data)
      .withQuery(Array(1f, 0f, 0f)).withK(5)
      .withReranker(limitTo2).execute())
    assert(got.size == 2, s"expected 2 rows after top-k reranking, got $got")
    // the slice arrives best-first, so take(2) keeps the 2 nearest
    assert(got.head == 1L)
  }

  test("absent reranker searches normally — the hook is optional " +
      "(reranker_test.go:241-269 TestRerankerNil)") {
    val data = flat(Seq(1L -> Array(1f, 0f, 0f)))
    val got = ids(VectorSearch.onFlat(data)
      .withQuery(Array(1f, 0f, 0f)).withK(1).execute())
    assert(got == Seq(1L))
  }

  test("identity reranker is a no-op — byte-identical result frame") {
    val data = flat(Seq(
      1L -> Array(1f, 0f, 0f), 2L -> Array(0f, 1f, 0f),
      3L -> Array(0f, 0f, 1f)))
    val base = VectorSearch.onFlat(data)
      .withQuery(Array(1f, 0f, 0f)).withK(3)
    val plain = base.execute().collect().toSeq
    val identity = base.withReranker(rows => rows).execute().collect().toSeq
    assert(identity == plain)
  }
}
