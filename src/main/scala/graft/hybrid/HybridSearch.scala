package graft.hybrid

import graft.agg.ScoreAgg
import graft.filter.{Filter, FilterGroup}
import graft.text.BM25Corpus
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
    qvecs: Seq[Array[Float]] = Seq.empty,
    qtexts: Seq[String] = Seq.empty,
    groups: Seq[FilterGroup] = Seq.empty,
    cfg: Hybrid.Config = Hybrid.Config(),
    agg: ScoreAgg.Kind = ScoreAgg.Sum,
    threshold: Option[Double] = None,
    nprobeOpt: Option[Int] = None,
    efOpt: Option[Int] = None,
    cutoff: Int = -1) {

  def withVectorLeg(l: Hybrid.VectorLeg): HybridSearch = copy(leg = Some(l))
  def withCorpus(c: BM25Corpus): HybridSearch = copy(corpus = Some(c))
  def withVector(v: Array[Float]): HybridSearch = copy(qvecs = Seq(v))
  /** Several vector queries: per-query top-k, duplicate ids combined per
    * [[withScoreAggregation]] BEFORE fusion (the reference's persistent
    * search runs every vectorQuery through one aggregated sub-search,
    * storage.go:505-516). */
  def withVectors(vs: Array[Float]*): HybridSearch = copy(qvecs = vs)
  // reference With* setters REPLACE, not append (hybrid_search_index.go:401-403)
  def withText(ts: String*): HybridSearch = copy(qtexts = ts)
  def withMetadata(fs: Filter*): HybridSearch =
    copy(groups = Seq(FilterGroup(fs)))
  def withMetadataGroups(gs: FilterGroup*): HybridSearch =
    copy(groups = gs)
  def withK(k: Int): HybridSearch = copy(cfg = cfg.copy(k = k))
  // stored in builder state and applied to the leg at execute(), so the
  // call ORDER relative to withVectorLeg is irrelevant — the reference
  // stores both the same way (hybrid_search_index.go:432-434, :522-527)
  def withNProbes(np: Int): HybridSearch = copy(nprobeOpt = Some(np))
  // zero/negative falls back to the leg's own configured value, matching
  // the sanitize-at-search contract (hnsw_index_search_test.go:1210-1291)
  def withEfSearch(ef: Int): HybridSearch =
    copy(efOpt = if (ef <= 0) None else Some(ef))
  // zero/negative disables (Go zero-value contract, pq_index_search.go:297)
  def withThreshold(t: Double): HybridSearch =
    copy(threshold = if (t > 0) Some(t) else None)
  def withScoreAggregation(kind: ScoreAgg.Kind): HybridSearch = copy(agg = kind)
  def withCutoff(c: Int): HybridSearch = copy(cutoff = c)
  def withFusionKind(f: Hybrid.FusionKind): HybridSearch =
    copy(cfg = cfg.copy(fusion = f))
  def withWeights(vw: Double, tw: Double): HybridSearch =
    copy(cfg = cfg.copy(vectorWeight = vw, textWeight = tw))
  def withRrfK(k: Double): HybridSearch = copy(cfg = cfg.copy(rrfK = k))
  def withMetric(m: graft.vector.Metric): HybridSearch =
    copy(cfg = cfg.copy(metric = m))

  /** (id, score) sorted descending, ≤ k. */
  def execute(): DataFrame = {
    val spark = meta.sparkSession
    import spark.implicits._
    val qv =
      if (qvecs.isEmpty) None
      else Some(qvecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("qid", "qvec"))
    // builder-held nprobe/efSearch override the leg's own values at
    // execute time (order-independent, like the reference's Execute)
    val resolvedLeg = leg.map {
      case Hybrid.IvfLeg(idx, np)   => Hybrid.IvfLeg(idx, nprobeOpt.getOrElse(np))
      case Hybrid.IvfPqLeg(idx, np) => Hybrid.IvfPqLeg(idx, nprobeOpt.getOrElse(np))
      case Hybrid.IvfPqRefinedLeg(idx, raw, rf, np) =>
        Hybrid.IvfPqRefinedLeg(idx, raw, rf, nprobeOpt.getOrElse(np))
      case Hybrid.HnswLeg(idx, ef)  => Hybrid.HnswLeg(idx, efOpt.getOrElse(ef))
      case other                    => other
    }
    // multi-text, cutoff, and the aggregation strategy all resolve inside
    // searchWith (ONE implementation of the per-query sub-search →
    // scoreAgg combine → per-modality cutoff ordering — a second copy
    // here would silently diverge on the next tie-break fix)
    Hybrid.searchWith(meta, groups, resolvedLeg, qv, corpus,
      qtexts.headOption, cfg.copy(scoreAgg = agg), threshold,
      modalityCutoff = cutoff, queryTexts = qtexts.drop(1))
  }
}

object HybridSearch {
  /** Entry point (`index.NewSearch()`-style): metadata table + optional
    * legs attach fluently. */
  def on(meta: DataFrame): HybridSearch = HybridSearch(meta)
}
