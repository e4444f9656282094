package graft.text

import graft.agg.ScoreAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's fluent text-search surface — `TextSearch`
  * (`/root/reference/index_search.go:359-424`: WithQuery / WithNode /
  * WithK / WithScoreAggregation / WithCutoff / WithDocumentIDs /
  * Execute) over a [[BM25Corpus]]. Each query string (and each node's
  * stored token set, the "more like this" form) scores independently
  * through the postings join with the candidate restriction pushed BELOW
  * the aggregation; multiple queries dedup by id through the aggregation
  * strategy (relevance is descending, so results re-sort score DESC).
  */
final case class TextSearch private (
    corpus: BM25Corpus,
    queries: Seq[String] = Seq.empty,
    nodes: Seq[Long] = Seq.empty,
    k: Int = 10,
    agg: ScoreAgg.Kind = ScoreAgg.Sum,
    cutoff: Int = -1,
    cand: Option[DataFrame] = None,
    reranker: Option[ScoreAgg.Reranker] = None) {

  // reference With* setters REPLACE (index_search.go), they don't append
  def withQuery(qs: String*): TextSearch = copy(queries = qs)
  def withNodes(ids: Long*): TextSearch = copy(nodes = ids)
  def withK(k0: Int): TextSearch = copy(k = k0)
  def withScoreAggregation(kind: ScoreAgg.Kind): TextSearch = copy(agg = kind)
  def withCutoff(c: Int): TextSearch = copy(cutoff = c)
  def withDocumentIds(ids: Long*): TextSearch = {
    // empty id list = NO filter, matching the reference's NewDocumentFilter
    // returning nil for an empty slice (document_filter.go:27-30) — "none
    // pass" is expressible only via withCandidateFrame(emptyFrame)
    if (ids.isEmpty) return copy(cand = None)
    val spark = corpus.postings.sparkSession
    import spark.implicits._
    copy(cand = Some(ids.toDF("id")))
  }
  /** Candidate restriction as a frame — the scale-safe form ([[Hybrid]]
    * pushes its metadata candidates through here; an id VARARGS list
    * would force corpus-scale collects). */
  def withCandidateFrame(c: DataFrame): TextSearch = copy(cand = Some(c))
  def withReranker(r: ScoreAgg.Reranker): TextSearch = copy(reranker = Some(r))

  /** (id, score), BM25 relevance descending, ≤ k rows. */
  def execute(): DataFrame = {
    require(queries.nonEmpty || nodes.nonEmpty,
      "no query strings or node ids configured (index_search.go validation)")
    val spark = corpus.postings.sparkSession
    import spark.implicits._
    if (nodes.nonEmpty) {
      // absent node ids ERROR like the reference's lookupNodeTexts
      // (bm25_index_search.go:228-247); docLens knows token-less docs too
      // docLens is one row per doc — no distinct needed; only the
      // postings fallback (multiple rows per doc) dedups
      val source =
        if (corpus.docLens != null) corpus.docLens.filter(col("id").isin(nodes: _*)).select("id")
        else corpus.postings.filter(col("id").isin(nodes: _*)).select("id").distinct()
      val known = source.collect().map(_.getLong(0)).toSet
      val missing = nodes.filterNot(known)
      require(missing.isEmpty,
        s"node ids not found in corpus: ${missing.mkString(", ")}")
    }
    // per-query top-k legs: each query string scores independently, the
    // node form scores the node's own stored tokens (more-like-this,
    // bm25_index_search.go:233-261)
    val textLegs = queries.map { qtext =>
      // driver-known tokens go down as a literal IN predicate (r20:
      // BM25Corpus.scoreTerms) so the postings/df lineage prunes to the
      // query's terms at the scan instead of via a runtime broadcast join
      ScoreAgg.limit(
        corpus.scoreTerms(corpus.tokenizer.tokens(qtext).distinct, cand)
          .orderBy(col("score").desc, col("id")), k)
    }
    val nodeLegs = nodes.map { nid =>
      val terms = corpus.postings
        .filter(col("id") === nid).select(col("term"))
      ScoreAgg.limit(corpus.score(terms, cand)
        .orderBy(col("score").desc, col("id")), k)
    }
    val legs = (textLegs ++ nodeLegs).map(_.select(col("id"), col("score")))
    val merged =
      if (legs.size > 1)
        ScoreAgg.aggregate(legs.reduce(_ unionByName _), agg, ascending = false)
      else legs.head.orderBy(col("score").desc, col("id").asc)
    val limited = ScoreAgg.limit(merged, k)
    val cut = ScoreAgg.autocut(limited, cutoff)
    reranker.fold(cut)(r => ScoreAgg.rerank(cut, r))
  }
}

object TextSearch {
  /** Entry point (`corpus.NewSearch()`-style). */
  def on(corpus: BM25Corpus): TextSearch = TextSearch(corpus)
}
