package graft.vector

import graft.expr.Distances
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distance metric selection (comet `DistanceKind`,
  * `/root/reference/distance.go:17-30`). `ascending` = lower score is
  * better (distances) vs higher-better (similarities). */
sealed abstract class Metric(val ascending: Boolean) {
  def expr(a: Column, b: Column): Column
}
object Metric {
  case object L2 extends Metric(true) {
    def expr(a: Column, b: Column): Column = Distances.l2(a, b)
  }
  case object L2Sq extends Metric(true) {
    def expr(a: Column, b: Column): Column = Distances.l2Sq(a, b)
  }
  /** `1 - dot / (|a||b|)`, clamped [0,2] (distance.go:201-216). */
  case object Cosine extends Metric(true) {
    def expr(a: Column, b: Column): Column = Distances.cosine(a, b)
  }
  /** `1 - dot` assuming unit vectors — comet's actual cosine path after its
    * normalize-at-insert preprocessing (distance.go:70-81). */
  case object CosinePreNorm extends Metric(true) {
    def expr(a: Column, b: Column): Column = Distances.cosinePreNorm(a, b)
  }
  case object DotSim extends Metric(false) {
    def expr(a: Column, b: Column): Column = Distances.dot(a, b)
  }
}

/** Exact brute-force kNN — comet's Flat index
  * (`/root/reference/flat_index_search.go:221-294`) and the correctness
  * oracle for every ANN variant.
  *
  * Plan shape: `data ⨯ broadcast(queries)` → codegen'd distance →
  * per-query top-k. The scan side never shuffles; for a single query the
  * top-k is `TakeOrderedAndProject` (per-partition heaps + driver merge —
  * exactly comet's heap, but distributed). For q queries the window's
  * shuffle moves only q·k·(partitions) pre-truncated rows because we
  * pre-filter each partition to its local top-k first.
  */
object FlatKnn {

  /** kNN of each query against `data`.
    *
    * @param data      (id, vector)
    * @param queries   (qid, qvec) — must be small (broadcast)
    * @param k         per-query k; k <= 0 returns all (limiter.go:12-17)
    * @param threshold keep results with score <= threshold (distance
    *                  metrics only; flat_index_search.go:268-271)
    * @param candidates optional (id) frame restricting the searchable set —
    *                   comet's DocumentFilter (document_filter.go:27-59) as
    *                   a left-semi join
    * @return (qid, id, score) sorted per query, best first
    */
  def search(data: DataFrame, queries: DataFrame, k: Int,
             metric: Metric = Metric.L2,
             threshold: Option[Double] = None,
             candidates: Option[DataFrame] = None): DataFrame = {
    require(threshold.isEmpty || metric.ascending,
      "threshold is a distance cutoff; unsupported with a similarity " +
        "(descending) metric — it would be silently ignored")
    val base = candidates match {
      case Some(c) => data.join(c.select(col("id")), Seq("id"), "left_semi")
      case None    => data
    }
    val scored = base
      .crossJoin(broadcast(queries))
      .select(col("qid"), col("id"),
        metric.expr(col("vector"), col("qvec")).as("score"))
    val thresholded = threshold match {
      case Some(t) if metric.ascending => scored.filter(col("score") <= t)
      case _                           => scored
    }
    topKPerQuery(thresholded, k, metric.ascending)
  }

  /** Deterministic per-query top-k: ties broken by id.
    *
    * Scale shape: each input partition first keeps only its LOCAL top-k
    * per query (bounded heaps, one pass — comet's result heap,
    * bm25_index.go:402-421, distributed), so the ranking window shuffles
    * at most q·k·partitions pre-truncated rows — never the full scored
    * set. Without this, a single-query search would move every scored row
    * to one window partition. */
  def topKPerQuery(scored: DataFrame, k: Int, ascending: Boolean): DataFrame = {
    val order =
      if (ascending) Seq(col("score").asc, col("id").asc)
      else Seq(col("score").desc, col("id").asc)
    if (k <= 0) {
      scored.orderBy((col("qid").asc +: order): _*)
    } else {
      val spark = scored.sparkSession
      import spark.implicits._
      // "better" = earlier in the final (score, id) order
      val ord: Ordering[(Double, Long)] =
        if (ascending) Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
        else Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)
      // undefined distances (e.g. cosine of a zero-norm vector => NULL)
      // are excluded from ranking — comet rejects such vectors at insert
      // (distance.go:252-254); the old window path ranked NULLs first,
      // which was never a meaningful "nearest"
      val pruned = scored
        .select(col("qid").cast("long"), col("id").cast("long"),
          col("score").cast("double"))
        .na.drop()
        .as[(Long, Long, Double)]
        .mapPartitions { it =>
          val heaps = scala.collection.mutable.HashMap
            .empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]
          it.foreach { case (q, id, s) =>
            // max-heap by ord: head is the WORST kept row
            val h = heaps.getOrElseUpdate(q,
              scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord))
            if (h.size < k) h.enqueue((s, id))
            else if (ord.lt((s, id), h.head)) { h.dequeue(); h.enqueue((s, id)) }
          }
          heaps.iterator.flatMap { case (q, h) =>
            h.iterator.map { case (s, id) => (q, id, s) }
          }
        }
        .toDF("qid", "id", "score")
      val w = Window.partitionBy(col("qid")).orderBy(order: _*)
      pruned
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .drop("rn")
        .orderBy((col("qid").asc +: order): _*)
    }
  }

  /** Embedded serving for exact search: the (id, vector) pairs collected
    * into the local JVM once, scanned with a parallel stream per query —
    * the reference's own deployment shape (flat_index_search.go runs
    * in-process on one box). No Spark jobs per query; results identical
    * to [[search]] with L2. For indexes that fit one machine only; the
    * DataFrame path is the scale-out route. */
  final class LocalFlat private[FlatKnn] (ids: Array[Long],
                                          vecs: Array[Array[Float]]) {
    def size: Int = ids.length

    /** Exact L2 top-k, ties by id — one parallel pass with per-chunk
      * bounded heaps, then a merge (comet's result heap). `k <= 0` returns
      * all rows sorted (limiter.go:12-17, same as the distributed path);
      * the query dimension is validated up front (the reference rejects
      * mismatched dims at search, flat_index_search.go:231-233). */
    def search(q: Array[Float], k0: Int): Seq[(Long, Double)] = {
      if (ids.isEmpty) return Seq.empty
      require(q.length == vecs(0).length,
        s"query dim ${q.length} != index dim ${vecs(0).length}")
      val k = if (k0 <= 0) ids.length else k0
      val chunks = java.util.stream.IntStream
        .range(0, 32).parallel()
        .mapToObj[Seq[(Double, Long)]] { c =>
          val lo = (ids.length.toLong * c / 32).toInt
          val hi = (ids.length.toLong * (c + 1) / 32).toInt
          val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
          val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord)
          var i = lo
          while (i < hi) {
            val v = vecs(i)
            var s = 0.0
            var j = 0
            while (j < v.length) {
              val d = v(j).toDouble - q(j).toDouble
              s += d * d
              j += 1
            }
            val cand = (math.sqrt(s), ids(i))
            if (heap.size < k) heap.enqueue(cand)
            else if (ord.lt(cand, heap.head)) { heap.dequeue(); heap.enqueue(cand) }
            i += 1
          }
          heap.toSeq
        }
        .reduce(Seq.empty[(Double, Long)], (a, b) => a ++ b)
      chunks.sorted.take(k).map { case (d, id) => (id, d) }
    }
  }

  /** Collect a vector frame for embedded serving (one-time cost ∝ data
    * bytes; must fit driver memory — the reference's standing constraint). */
  def serve(data: DataFrame): LocalFlat = {
    val rows = data.select(col("id").cast("long"), col("vector")).collect()
    new LocalFlat(rows.map(_.getLong(0)),
      rows.map(_.getSeq[Float](1).toArray))
  }

  /** Search by stored node ids: look up their vectors and use them as
    * queries (flat_index_search.go:171-196). */
  def searchByNodes(data: DataFrame, nodeIds: Seq[Long], k: Int,
                    metric: Metric = Metric.L2): DataFrame = {
    val queries = data
      .filter(col("id").isin(nodeIds: _*))
      .select(col("id").as("qid"), col("vector").as("qvec"))
    search(data, queries, k, metric)
  }
}
