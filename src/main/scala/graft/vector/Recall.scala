package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall@k evaluation with the flat index as ground truth — the
  * reference's prescribed accuracy harness (`/root/reference/docs/
  * INDEX.md:422-463` EvaluateIndexAccuracy: per query, the fraction of
  * the exact top-k an approximate index recovered, divided by K and
  * averaged over queries).
  *
  * Shapes are the engine's own result frames (`qid`, `id`, ...), so any
  * search output — [[FlatKnn.search]], [[Hnsw.searchIndex]],
  * [[Ivf.search]], [[Pq.search]], [[IvfPq.search]] — plugs in directly.
  * The computation is one keyed join + one aggregation (per-query
  * work ∝ k, never corpus-sized).
  */
object Recall {

  // SET semantics, like EvaluateIndexAccuracy's map-of-ids: duplicate
  // (qid, id) rows — a multi-query union, a frame with more than k rows
  // per query — must not multiply join matches and inflate recall
  private def keyed(df: DataFrame): DataFrame =
    df.select(col("qid").cast("long").as("qid"),
      col("id").cast("long").as("id")).distinct()

  /** Per-query recall@k: `(qid, recall)` with
    * `recall = |approx ∩ exact| / k` — the reference divides by K, not by
    * `|exact|`, so a query whose exact result set is short (corpus < k)
    * caps below 1.0 exactly as EvaluateIndexAccuracy does. Every qid in
    * `exact` appears (zero matches → 0.0). */
  def atK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val qids = keyed(exact).select("qid").distinct()
    val matches = keyed(exact).join(keyed(approx), Seq("qid", "id"), "inner")
      .groupBy(col("qid")).agg(count(lit(1)).as("m"))
    qids.join(matches, Seq("qid"), "left")
      .select(col("qid"),
        (coalesce(col("m"), lit(0L)) / lit(k.toDouble)).as("recall"))
  }

  /** Average recall@k over all queries (driver scalar — the harness's
    * headline number). */
  def meanAtK(approx: DataFrame, exact: DataFrame, k: Int): Double =
    atK(approx, exact, k)
      .agg(avg(col("recall"))).head().getDouble(0)

  /** Driver-local twin of [[meanAtK]] for EMBEDDED serving results:
    * identical set semantics and divide-by-K, over in-process
    * `(qid, ids)` pairs with no Spark jobs — the embedded probes measure
    * serving latency and their recall accounting must not schedule work.
    * Like [[atK]], the average runs over EXACT's qids: a truth query with
    * no approx entry scores 0, duplicate approx entries for one qid merge
    * into one id set (never double-counted), and approx entries for qids
    * absent from the truth are ignored. */
  def meanAtKLocal(approx: Seq[(Long, Iterable[Long])],
                   exact: Map[Long, Set[Long]], k: Int): Double = {
    require(k > 0, s"k must be positive, got $k")
    if (exact.isEmpty) return 0.0
    val byQ = approx.groupBy(_._1).map { case (q, es) =>
      q -> es.iterator.flatMap(_._2).toSet
    }
    exact.iterator.map { case (qid, t) =>
      byQ.getOrElse(qid, Set.empty[Long]).count(t).toDouble / k
    }.sum / exact.size
  }

  /** Convenience: evaluate an approximate searcher against freshly
    * computed flat ground truth over `data` (the INDEX.md example
    * verbatim — flat IS the oracle). `search` receives (queries, k). */
  def vsFlat(data: DataFrame, queries: DataFrame, k: Int,
             metric: Metric = Metric.L2)
            (search: (DataFrame, Int) => DataFrame): Double = {
    val exact = FlatKnn.search(Pq.prepData(data, metric), queries, k, metric)
    meanAtK(search(queries, k), exact, k)
  }
}
