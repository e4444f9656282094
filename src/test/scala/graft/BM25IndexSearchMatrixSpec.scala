package graft

import graft.agg.ScoreAgg
import graft.text.{BM25, TextSearch}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-for-row port of the reference's BM25 fluent-search enumeration
  * (`bm25_index_search_test.go`) NOT already pinned by BM25SearchEdgeSpec
  * (k sanitization, OOV/empty queries, empty index, ordering, errors) or
  * BM25RealisticSpec (the realistic corpora): the builder combinators —
  * node search, multi-query × score-aggregation, cutoff, node+query —
  * and the text aggregation tables with their exact pinned values.
  * Builder chainability (`:13-29`) is type-level here: every `with*`
  * returns a configured immutable copy, so the Go nil-checks have no
  * runtime counterpart.
  */
class BM25IndexSearchMatrixSpec extends SparkSpec {

  private def build(rows: (Long, String)*): graft.text.BM25Corpus = {
    val s = spark; import s.implicits._
    BM25.build(rows.toDF("id", "text"))
  }

  private def pairs(df: DataFrame): Seq[(Long, Double)] =
    df.select("id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("WithNode: a node's stored tokens are the query (more-like-this) " +
       "— finds at least the document itself, and token-sharing " +
       "neighbours score (bm25_index_search_test.go:32-52)") {
    val c = build(1L -> "the quick brown fox", 2L -> "the lazy dog",
      3L -> "quick brown rabbit")
    val got = pairs(TextSearch.on(c).withNodes(1L).withK(5).execute())
    assert(got.nonEmpty, "WithNode() search returned no results")
    assert(got.head._1 == 1L, "a doc must be its own best match")
    // doc 3 shares 'quick brown'; doc 2 shares only the stopword 'the'
    // (kept by the UAX#29 tokenizer, so it scores — but below doc 3)
    val rank = got.map(_._1)
    assert(rank.indexOf(3L) >= 0 && rank.indexOf(3L) < rank.indexOf(2L),
      s"two-shared-token doc not ranked above the stopword-only doc: $rank")
  }

  test("WithScoreAggregation × multi-query: Sum/Max/Mean over " +
       "('fox','dog') all return results, sorted score-descending, and " +
       "only fox/dog docs appear (bm25_index_search_test.go:95-138)") {
    val c = build(1L -> "fox dog cat", 2L -> "fox dog", 3L -> "cat mouse",
      4L -> "dog")
    for (kind <- Seq(ScoreAgg.Sum, ScoreAgg.Max, ScoreAgg.Mean)) {
      val got = pairs(TextSearch.on(c).withQuery("fox", "dog")
        .withScoreAggregation(kind).withK(5).execute())
      assert(got.nonEmpty, s"$kind: expected some results")
      assert(got.map(_._2).sliding(2).forall {
        case Seq(a, b) => a >= b
        case _         => true
      }, s"$kind: results not sorted descending")
      assert(got.map(_._1).toSet == Set(1L, 2L, 4L),
        s"$kind: expected exactly the fox/dog docs, got ${got.map(_._1)}")
    }
  }

  test("WithCutoff: -1 returns every match; a cutoff never adds results " +
       "and keeps a PREFIX of the no-cutoff ranking " +
       "(bm25_index_search_test.go:141-183)") {
    val c = build(1L -> "fox fox fox fox", 2L -> "fox fox",
      3L -> "the lazy dog sleeps", 4L -> "cat and mouse",
      5L -> "quick brown fox jumps")
    val noCut = pairs(TextSearch.on(c).withQuery("fox").withK(10)
      .withCutoff(-1).execute())
    assert(noCut.map(_._1).toSet == Set(1L, 2L, 5L),
      "expected the three fox docs without cutoff")
    for (cutoff <- Seq(1, 2)) {
      val cut = pairs(TextSearch.on(c).withQuery("fox").withK(10)
        .withCutoff(cutoff).execute())
      assert(cut.length <= noCut.length,
        s"cutoff=$cutoff produced MORE results")
      assert(cut == noCut.take(cut.length),
        s"cutoff=$cutoff is not a prefix of the uncut ranking")
    }
  }

  test("multi-query membership: ('fox','dog') over the and-corpus " +
       "surfaces doc 1 (matches both) and never the rabbit/mouse doc " +
       "(bm25_index_search_test.go:273-303)") {
    val c = build(1L -> "fox and dog", 2L -> "fox and cat",
      3L -> "dog and cat", 4L -> "rabbit and mouse")
    val got = pairs(TextSearch.on(c).withQuery("fox", "dog").withK(5)
      .execute())
    assert(got.nonEmpty, "multi-query search returned no results")
    val ids = got.map(_._1).toSet
    assert(ids.contains(1L), "expected document 1 in results")
    assert(ids == Set(1L, 2L, 3L), s"unexpected result set $ids")
    // doc 1 matches BOTH queries — under Sum it must outrank the
    // single-term docs
    assert(got.head._1 == 1L, "both-term doc not ranked first under Sum")
  }

  test("WithNodes + WithQuery combine: the node leg and the direct query " +
       "leg both contribute before aggregation " +
       "(bm25_index_search_test.go:306-328)") {
    val c = build(1L -> "quick brown fox", 2L -> "lazy brown dog",
      3L -> "quick rabbit", 4L -> "slow turtle")
    val got = pairs(TextSearch.on(c).withNodes(1L).withQuery("lazy dog")
      .withK(5).execute())
    assert(got.nonEmpty, "combined node+query search returned no results")
    val ids = got.map(_._1).toSet
    assert(ids.contains(1L), "node leg (doc 1 self-match) missing")
    assert(ids.contains(2L), "query leg ('lazy dog' -> doc 2) missing")
    assert(!ids.contains(4L), "doc matching neither leg scored")
  }

  test("text aggregation tables, exact values: Sum {1->2.5, 2->3.0, " +
       "3->0.5}, Max {1->1.5, 2->2.0, 3->0.5}, Mean {1->1.5, 2->3.0, " +
       "3->0.5} over the duplicate-id result lists " +
       "(bm25_index_search_test.go:449-563)") {
    val s = spark
    import s.implicits._
    def agg(rows: Seq[(Long, Double)], kind: ScoreAgg.Kind) =
      ScoreAgg.aggregate(rows.toDF("id", "score"), kind, ascending = false)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val sumIn = Seq(1L -> 1.0, 2L -> 2.0, 1L -> 1.5, 3L -> 0.5, 2L -> 1.0)
    val sum = agg(sumIn, ScoreAgg.Sum)
    assert(sum.size == 3, "expected 3 unique documents")
    assert(sum == Map(1L -> 2.5, 2L -> 3.0, 3L -> 0.5), s"sum: $sum")
    val max = agg(sumIn, ScoreAgg.Max)
    assert(max == Map(1L -> 1.5, 2L -> 2.0, 3L -> 0.5), s"max: $max")
    val meanIn = Seq(1L -> 1.0, 2L -> 2.0, 1L -> 2.0, 3L -> 0.5, 2L -> 4.0)
    val mean = agg(meanIn, ScoreAgg.Mean)
    assert(mean == Map(1L -> 1.5, 2L -> 3.0, 3L -> 0.5), s"mean: $mean")
  }
}
