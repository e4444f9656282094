package graft.hybrid

import graft.agg.ScoreAgg
import graft.filter.{Filter, FilterGroup, Filters}
import graft.text.{BM25Corpus, TextSearch}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's fluent hybrid surface — `HybridSearch`
  * (`/root/reference/hybrid_search_index.go:320-366`: WithVector /
  * WithText / WithMetadata / WithMetadataGroups / WithK / WithNProbes /
  * WithEfSearch / WithThreshold / WithScoreAggregation / WithCutoff /
  * WithFusionKind + weight config / Execute) compiled onto
  * [[Hybrid.searchWith]]. Multiple text queries score independently and
  * dedup through the aggregation strategy BEFORE fusion — exactly the
  * reference's Execute, which hands all text queries to one TextSearch
  * whose aggregated result is the text modality (:554-567). */
final case class HybridSearch private (
    meta: DataFrame,
    leg: Option[Hybrid.VectorLeg] = None,
    corpus: Option[BM25Corpus] = None,
    qvec: Option[Array[Float]] = None,
    qtexts: Seq[String] = Seq.empty,
    groups: Seq[FilterGroup] = Seq.empty,
    cfg: Hybrid.Config = Hybrid.Config(),
    agg: ScoreAgg.Kind = ScoreAgg.Sum,
    threshold: Option[Double] = None,
    cutoff: Int = -1) {

  def withVectorLeg(l: Hybrid.VectorLeg): HybridSearch = copy(leg = Some(l))
  def withCorpus(c: BM25Corpus): HybridSearch = copy(corpus = Some(c))
  def withVector(v: Array[Float]): HybridSearch = copy(qvec = Some(v))
  def withText(ts: String*): HybridSearch = copy(qtexts = qtexts ++ ts)
  def withMetadata(fs: Filter*): HybridSearch =
    copy(groups = groups :+ FilterGroup(fs))
  def withMetadataGroups(gs: FilterGroup*): HybridSearch =
    copy(groups = groups ++ gs)
  def withK(k: Int): HybridSearch = copy(cfg = cfg.copy(k = k))
  def withNProbes(np: Int): HybridSearch = copy(cfg = cfg.copy(nprobe = np))
  def withEfSearch(ef: Int): HybridSearch = leg match {
    case Some(Hybrid.HnswLeg(idx, _)) =>
      copy(leg = Some(Hybrid.HnswLeg(idx, ef)))
    case _ => this // no-op off HNSW, like the reference's flat WithEfSearch
  }
  def withThreshold(t: Double): HybridSearch = copy(threshold = Some(t))
  def withScoreAggregation(kind: ScoreAgg.Kind): HybridSearch = copy(agg = kind)
  def withCutoff(c: Int): HybridSearch = copy(cutoff = c)
  def withFusionKind(f: Hybrid.FusionKind): HybridSearch =
    copy(cfg = cfg.copy(fusion = f))
  def withWeights(vw: Double, tw: Double): HybridSearch =
    copy(cfg = cfg.copy(vectorWeight = vw, textWeight = tw))
  def withRrfK(k: Double): HybridSearch = copy(cfg = cfg.copy(rrfK = k))
  def withMetric(m: graft.vector.Metric): HybridSearch =
    copy(cfg = cfg.copy(metric = m))

  /** (id, score) sorted descending, ≤ k (before an optional autocut). */
  def execute(): DataFrame = {
    val spark = meta.sparkSession
    import spark.implicits._
    val qv = qvec.map(v => Seq((0L, v)).toDF("qid", "qvec"))
    // >1 text query: pre-aggregate through TextSearch (the reference's
    // text modality is ONE aggregated list, :554-567) with the metadata
    // candidates pushed below its scoring
    val txtOverride =
      if (qtexts.size > 1) corpus.map { c =>
        val cand =
          if (groups.isEmpty) None
          else Some(meta.filter(Filters.compileGroups(groups)).select(col("id")))
        val ts = TextSearch.on(c).withQuery(qtexts: _*)
          .withK(cfg.k).withScoreAggregation(agg)
        cand.fold(ts)(ts.withCandidateFrame).execute()
      }
      else None
    val fused = Hybrid.searchWith(meta, groups, leg, qv, corpus,
      qtexts.headOption, cfg, threshold, txtOverride)
    ScoreAgg.autocut(fused, cutoff)
  }
}

object HybridSearch {
  /** Entry point (`index.NewSearch()`-style): metadata table + optional
    * legs attach fluently. */
  def on(meta: DataFrame): HybridSearch = HybridSearch(meta)
}
