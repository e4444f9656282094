package graft.vector

import graft.agg.ScoreAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's fluent search surface — `VectorSearch`
  * (`/root/reference/index_search.go:141-272`: WithQuery / WithNode /
  * WithK / WithNProbes / WithEfSearch / WithThreshold /
  * WithScoreAggregation / WithCutoff / WithDocumentIDs / WithReranker /
  * Execute) — over any graft index backend. Each `with*` returns a copy;
  * `execute()` compiles the configured search into ONE DataFrame using the
  * backend's own machinery, so the fluent form adds no execution path of
  * its own: multi-query fan-out is the broadcast-batch scan, node
  * resolution is the backend's stored-vector lookup, dedup is
  * [[ScoreAgg.aggregate]] (default Sum, aggregation.go:85-90), and
  * cutoff/reranker run on the final ≤k slice exactly like the reference.
  *
  * WithNode on PQ/IVFPQ: the reference keeps every raw vector alongside
  * the codes (pq_index_search.go:169-197 resolves nodes from
  * `vectorNodes`, full precision). Our equivalent is the SOURCE frame the
  * codes were built from, passed to [[VectorSearch.onPq]]/[[
  * VectorSearch.onIvfPq]] — it stays in parquet and node resolution is a
  * k-id semi-join, so the compression PQ exists for is preserved at rest.
  * Without a source frame, withNodes is rejected with a pointer here.
  */
final case class VectorSearch private (
    backend: VectorSearch.Backend,
    queries: Seq[Array[Float]] = Seq.empty,
    nodes: Seq[Long] = Seq.empty,
    k: Int = 10,
    nprobe: Int = 8,
    efSearch: Int = Hnsw.DefaultEfSearch,
    threshold: Option[Double] = None,
    agg: ScoreAgg.Kind = ScoreAgg.Sum,
    cutoff: Int = -1,
    docIds: Option[Seq[Long]] = None,
    reranker: Option[ScoreAgg.Reranker] = None) {

  import VectorSearch._

  // reference With* setters REPLACE (flat_index_search.go:38-40), they
  // don't append across calls
  def withQuery(qs: Array[Float]*): VectorSearch = copy(queries = qs)
  def withNodes(ids: Long*): VectorSearch = copy(nodes = ids)
  def withK(k0: Int): VectorSearch = copy(k = k0)
  def withNProbes(np: Int): VectorSearch = copy(nprobe = np)
  // zero/negative falls back to the DEFAULT, never an error and never a
  // degenerate beam (the reference sanitizes at search:
  // hnsw_index_search_test.go:1210-1291 WithEfSearchZero/Negative)
  def withEfSearch(ef: Int): VectorSearch =
    copy(efSearch = if (ef <= 0) Hnsw.DefaultEfSearch else ef)
  // zero/negative disables, matching the Go zero-value contract: every
  // reference search applies the filter only when `threshold > 0`
  // (pq_index_search.go:297-298, pq_index_search_test.go:588-609)
  def withThreshold(t: Double): VectorSearch =
    copy(threshold = if (t > 0) Some(t) else None)
  def withScoreAggregation(kind: ScoreAgg.Kind): VectorSearch = copy(agg = kind)
  def withCutoff(c: Int): VectorSearch = copy(cutoff = c)
  // empty id list = NO filter, matching the reference's NewDocumentFilter
  // returning nil for an empty slice (document_filter.go:27-30) — only the
  // frame form can express "none pass" (an empty candidate frame)
  def withDocumentIds(ids: Long*): VectorSearch =
    copy(docIds = if (ids.isEmpty) None else Some(ids))
  def withReranker(r: ScoreAgg.Reranker): VectorSearch = copy(reranker = Some(r))

  /** (id, score) — score space is the backend's metric, sorted best-first,
    * ≤ k rows (before an optional autocut narrows further). */
  def execute(): DataFrame = {
    require(queries.nonEmpty || nodes.nonEmpty,
      "no query vectors or node ids configured (index_search.go validation)")
    require(nodes.forall(_ >= 0),
      "node ids live in the uint32 id space (node.go:7) and are never " +
        "negative; negative synthetic query ids rely on this")
    // direct queries must match the index dimension when the backend knows
    // it driver-side (the reference rejects mismatched dims at search,
    // ivf_index_search_test.go:272-279 / flat_index_search.go:231-233);
    // backends whose dim lives only in distributed state (flat frame, HNSW
    // shard graphs) surface the mismatch from the distance kernel instead
    backend.dim.foreach { d =>
      queries.find(_.length != d).foreach { q =>
        throw new IllegalArgumentException(
          s"query dim ${q.length} != index dim $d")
      }
    }
    // empty (length-0) query arrays are rejected up front for every
    // backend — where the dim check above doesn't fire (flat/HNSW, whose
    // dim lives only in distributed state) the failure would otherwise
    // surface either from a distance kernel or, worse, be mislabeled by
    // the zero-vector guard below (forall on an empty array is vacuously
    // true)
    if (queries.exists(_.isEmpty))
      throw new IllegalArgumentException(
        "empty query vector (dim 0) — queries must be non-empty arrays")
    // a zero vector has no direction, so cosine distance to it is
    // undefined — the reference rejects it at query preparation
    // (ErrZeroVector, distance.go:11-12; flat_index_search_test.go:321-333
    // "zero query with cosine"); other metrics accept it (L2 distance to
    // the origin is well-defined)
    if (backend.cosineFamily && queries.exists(_.forall(_ == 0f)))
      throw new IllegalArgumentException(
        "zero vector query is invalid for a cosine-metric index " +
          "(distance.go ErrZeroVector)")
    val spark = backend.session
    import spark.implicits._
    // node ids resolve to their STORED vectors (search-by-node,
    // index_search.go:162-170); direct queries get synthetic negative
    // qids, which cannot collide with the non-negative node id space
    val nodeQ: DataFrame = if (nodes.isEmpty) emptyQ(spark) else {
      // collect the resolved vectors ONCE (node sets are small by the
      // same contract as the reference's WithNode id list): the existence
      // check and the query frame share one job instead of re-evaluating
      // the resolution — for HNSW that's a pass over every shard graph
      val rows = backend.vectorsOf(nodes)
        .select(col("qid").cast("long"), col("qvec")).collect()
      val found = rows.map(_.getLong(0)).toSet
      val missing = nodes.filterNot(found)
      // absent or soft-deleted nodes are an ERROR, not a silent skip
      // (flat_index_search.go:182-191 "node ID %d not found in index")
      require(missing.isEmpty,
        s"node ids not found in index (or deleted): ${missing.mkString(", ")}")
      rows.map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
        .toDF("qid", "qvec")
    }
    val directQ: DataFrame = queries.zipWithIndex
      .map { case (v, i) => (-(i + 1).toLong, v) }.toDF("qid", "qvec")
    val q = if (nodes.isEmpty) directQ
            else if (queries.isEmpty) nodeQ
            else directQ.unionByName(nodeQ)
    val cand = docIds.map(ids => ids.toDF("id"))
    val perQuery = backend.search(q, k, nprobe, efSearch, threshold, cand)
    val nQueries = queries.size + nodes.size
    val asc = backend.ascending
    // >1 query: dedup overlapping ids through the aggregation strategy
    // (aggregation.go:107-255); a single query passes through untouched.
    // Order follows the backend's score direction (similarities rank DESC)
    val merged =
      if (nQueries > 1)
        ScoreAgg.aggregate(perQuery.select(col("id"), col("score")),
          agg, ascending = asc)
      else {
        val base = perQuery.select(col("id"), col("score"))
        if (asc) base.orderBy(col("score").asc, col("id").asc)
        else base.orderBy(col("score").desc, col("id").asc)
      }
    val limited = ScoreAgg.limit(merged, k)
    val cut = ScoreAgg.autocut(limited, cutoff)
    reranker.fold(cut)(r => ScoreAgg.rerank(cut, r))
  }
}

object VectorSearch {

  /** Strategy adapter per index family: how to resolve stored vectors and
    * how to run the batched per-query search. */
  sealed trait Backend {
    def session: org.apache.spark.sql.SparkSession
    /** Score direction of this backend's metric (distances ascend,
      * similarities descend — index_search.go:13-18). */
    def ascending: Boolean
    /** Index dimension when it is driver-resident (trained models carry
      * their centroids); None when it lives only in distributed state.
      * Used for up-front query-dim validation, never for a job. */
    def dim: Option[Int] = None
    /** True when the backend scores in a cosine space, where a zero query
      * vector is undefined and rejected (distance.go ErrZeroVector). */
    def cosineFamily: Boolean = false
    def vectorsOf(ids: Seq[Long]): DataFrame
    def search(q: DataFrame, k: Int, nprobe: Int, ef: Int,
               threshold: Option[Double], cand: Option[DataFrame]): DataFrame
  }

  private final case class FlatBackend(data: DataFrame, metric: Metric)
      extends Backend {
    def session = data.sparkSession
    def ascending = metric.ascending
    override def cosineFamily = metric == Metric.Cosine ||
      metric == Metric.CosinePreNorm
    def vectorsOf(ids: Seq[Long]): DataFrame = data
      .filter(col("id").isin(ids: _*))
      .select(col("id").as("qid"), col("vector").as("qvec"))
    def search(q: DataFrame, k: Int, nprobe: Int, ef: Int,
               threshold: Option[Double], cand: Option[DataFrame]): DataFrame =
      FlatKnn.search(data, q, k, metric, threshold, cand)
  }

  private final case class IvfBackend(index: Ivf.Index) extends Backend {
    def session = index.assigned.sparkSession
    def ascending = index.metric.ascending
    override def dim = Some(index.model.dim)
    override def cosineFamily = index.metric == Metric.Cosine ||
      index.metric == Metric.CosinePreNorm
    def vectorsOf(ids: Seq[Long]): DataFrame = index.assigned
      .filter(col("id").isin(ids: _*))
      .select(col("id").as("qid"), col("vector").as("qvec"))
    def search(q: DataFrame, k: Int, nprobe: Int, ef: Int,
               threshold: Option[Double], cand: Option[DataFrame]): DataFrame =
      // score in the metric the index was BUILT with (index.go:32-100) —
      // remapping (e.g. an L2Sq build scored with L2) would reinterpret
      // thresholds in a different space
      Ivf.search(index, q, k, nprobe, index.metric, threshold, cand)
  }

  private final case class HnswBackend(index: Hnsw.Index) extends Backend {
    def session = org.apache.spark.sql.SparkSession.active
    def ascending = true // graph metrics are all distances
    override def cosineFamily = index.metric == Metric.Cosine ||
      index.metric == Metric.CosinePreNorm
    def vectorsOf(ids: Seq[Long]): DataFrame =
      Hnsw.resolveVectors(index, ids)
    def search(q: DataFrame, k: Int, nprobe: Int, ef: Int,
               threshold: Option[Double], cand: Option[DataFrame]): DataFrame =
      Hnsw.searchIndex(index, q, k, ef, threshold, cand)
  }

  /** Node-id → full-precision query vector via the source frame (the
    * reference's `vectorNodes` lookup, pq_index_search.go:169-197); a
    * missing source frame rejects withNodes with guidance. */
  private def sourceVectorsOf(source: Option[DataFrame], ids: Seq[Long],
                              family: String): DataFrame =
    source match {
      case Some(src) => src
        .filter(col("id").isin(ids: _*))
        .select(col("id").as("qid"), col("vector").as("qvec"))
      case None => throw new IllegalArgumentException(
        s"withNodes on a $family index needs the source-vector frame: " +
          s"pass it to VectorSearch.on$family(..., source = vectors) — " +
          "the reference resolves nodes from the raw vectors it stores " +
          "beside the codes; ours stay in the source parquet")
    }

  private final case class PqBackend(encoded: DataFrame, model: Pq.Model,
                                     source: Option[DataFrame])
      extends Backend {
    def session = encoded.sparkSession
    def ascending = true // ADC distances
    override def dim = Some(model.m * model.dsub)
    // the reference rejects zero queries on PQ paths too, via the shared
    // distance.Preprocess (pq_index_search.go:237) — PQ's cosine mode
    // unit-normalizes the query (Metric.unit), which maps a zero vector
    // to itself and would silently rank by distance-to-origin
    override def cosineFamily = model.metric == Metric.Cosine
    def vectorsOf(ids: Seq[Long]): DataFrame =
      sourceVectorsOf(source, ids, "Pq")
    def search(q: DataFrame, k: Int, nprobe: Int, ef: Int,
               threshold: Option[Double], cand: Option[DataFrame]): DataFrame =
      Pq.search(encoded, model, q, k, threshold, cand)
  }

  private final case class IvfPqBackend(index: IvfPq.Index,
                                        source: Option[DataFrame])
      extends Backend {
    def session = index.encoded.sparkSession
    def ascending = true // residual ADC distances
    override def dim = Some(index.coarse.dim)
    // same ErrZeroVector contract as PqBackend
    // (ivfpq_index_search.go:252)
    override def cosineFamily = index.metric == Metric.Cosine
    def vectorsOf(ids: Seq[Long]): DataFrame =
      sourceVectorsOf(source, ids, "IvfPq")
    def search(q: DataFrame, k: Int, nprobe: Int, ef: Int,
               threshold: Option[Double], cand: Option[DataFrame]): DataFrame =
      IvfPq.search(index, q, k, nprobe, threshold, cand)
  }

  private def emptyQ(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Array[Float])].toDF("qid", "qvec")
  }

  /** Entry points — one per index family (flat_index.go:64-77-style
    * NewSearch constructors). */
  def onFlat(data: DataFrame, metric: Metric = Metric.L2): VectorSearch =
    VectorSearch(FlatBackend(data, metric))
  def onIvf(index: Ivf.Index): VectorSearch = VectorSearch(IvfBackend(index))
  def onHnsw(index: Hnsw.Index): VectorSearch = VectorSearch(HnswBackend(index))
  def onPq(encoded: DataFrame, model: Pq.Model,
           source: DataFrame = null): VectorSearch =
    VectorSearch(PqBackend(encoded, model, Option(source)))
  def onIvfPq(index: IvfPq.Index, source: DataFrame = null): VectorSearch =
    VectorSearch(IvfPqBackend(index, Option(source)))
}
