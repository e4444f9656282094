package graft.hybrid

import graft.filter.{FilterGroup, Filters}
import graft.fusion.Fusion
import graft.text.BM25Corpus
import graft.vector.{FlatKnn, Ivf, Metric}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid search pipeline — the reference's main entry point
  * (`/root/reference/hybrid_search_index.go:477-615`):
  *
  *  1. metadata filter → candidate ids (empty ⇒ empty result, :503-506)
  *  2. vector search restricted to candidates (k-limited)
  *  3. text search restricted to candidates (k-limited)
  *  4. fusion if both modalities present, passthrough otherwise;
  *     metadata-only ⇒ score 1.0 (:588-593)
  *  5. sort score DESCENDING, limit k (:595-612)
  *
  * Caveat reproduced on purpose (SURVEY.md §2.9): with WeightedSum (the
  * reference default) vector distances are lower-better but step 5 sorts
  * descending, so vector-only hybrid results rank farthest-first. RRF is
  * the semantically safe choice; we replicate the reference behavior.
  *
  * In Spark this whole lifecycle is ONE lazily-composed DataFrame: Catalyst
  * pushes the metadata predicate into the parquet scan, the candidate
  * semi-joins broadcast when the filter is selective, and the per-modality
  * top-k are window/TakeOrdered plans. Nothing materializes until the
  * caller acts.
  */
object Hybrid {

  sealed trait FusionKind
  case object WeightedSum extends FusionKind
  case object Rrf extends FusionKind
  case object MaxF extends FusionKind
  case object MinF extends FusionKind

  final case class Config(
      k: Int = 10,
      fusion: FusionKind = WeightedSum, // reference default,
                                        // hybrid_search_index.go:237
      vectorWeight: Double = 1.0,
      textWeight: Double = 1.0,
      rrfK: Double = Fusion.DefaultRrfK,
      metric: Metric = Metric.L2,
      nprobe: Int = 0) // IVF-routed vector search; <=0 = probe all lists

  /** @param meta     (id, …metadata columns…)
    * @param filters  DNF filter groups over `meta` (empty = no filter)
    * @param vectors  (id, vector), or None for no vector modality
    * @param queryVec broadcastable single-row (qid, qvec) frame
    * @param corpus   BM25 corpus, or None for no text modality
    * @param queryText raw text query
    * @param ivf      optional IVF index over the SAME vectors: when set,
    *                 vector search routes through nprobe partition pruning
    *                 INCLUDING the filtered case (comet passes the document
    *                 filter down to every index, ivf_index_search.go:287-290
    *                 — a filtered query keeps IVF speed instead of falling
    *                 back to a flat scan)
    * @return (id, score) sorted descending, limited to k
    */
  def search(meta: DataFrame, filters: Seq[FilterGroup],
             vectors: Option[DataFrame], queryVec: Option[DataFrame],
             corpus: Option[BM25Corpus], queryText: Option[String],
             cfg: Config = Config(),
             ivf: Option[Ivf.Index] = None): DataFrame = {
    val spark = meta.sparkSession
    import spark.implicits._

    val candidates =
      if (filters.isEmpty) None
      else Some(meta.filter(Filters.compileGroups(filters)).select(col("id")))

    val vecScores: Option[DataFrame] = ivf match {
      case Some(idx) if queryVec.isDefined =>
        val np = if (cfg.nprobe <= 0) idx.model.k else cfg.nprobe
        Some(Ivf.search(idx, queryVec.get, cfg.k, np, cfg.metric,
          candidates = candidates).select(col("id"), col("score")))
      case _ => for {
        vs <- vectors; qv <- queryVec
      } yield FlatKnn.search(vs, qv, cfg.k, cfg.metric, candidates = candidates)
        .select(col("id"), col("score"))
    }

    val txtScores: Option[DataFrame] = for {
      c <- corpus; q <- queryText
    } yield {
      // the corpus's own tokenizer — query terms must match its postings;
      // the candidate restriction pushes below the scoring aggregation
      // (bm25_index_search.go:317-319 skips filtered docs during scoring)
      val terms = c.tokenizer.tokens(q).distinct.toDF("term")
      c.score(terms, candidates)
        .orderBy(col("score").desc, col("id")).limit(cfg.k)
    }

    val fused = (vecScores, txtScores) match {
      case (Some(v), Some(t)) => cfg.fusion match {
        case WeightedSum => Fusion.weightedSum(v, t, cfg.vectorWeight, cfg.textWeight)
        case Rrf         => Fusion.rrf(v, t, cfg.rrfK)
        case MaxF        => Fusion.maxFusion(v, t)
        case MinF        => Fusion.minFusion(v, t)
      }
      case (Some(v), None) => v
      case (None, Some(t)) => t
      case (None, None) =>
        // metadata-only: every candidate scores 1.0
        // (hybrid_search_index.go:588-593). All scores tie, so the final
        // (score desc, id asc) order reduces to id asc — pre-limit to the
        // k smallest ids (TakeOrderedAndProject) so the degenerate
        // no-filter-no-modality query never scores the whole table
        candidates.getOrElse(meta.select(col("id")))
          .orderBy(col("id").asc).limit(cfg.k)
          .select(col("id"), lit(1.0).as("score"))
    }

    fused.orderBy(col("score").desc, col("id").asc).limit(cfg.k)
  }
}
