package graft.agg

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Multi-query score aggregation, limiting, autocut and the reranker hook.
  *
  * Reference: `/root/reference/aggregation.go` (sum/max/mean over duplicate
  * doc ids across per-query result sets), `limiter.go` (k sanitization +
  * autocut), `index_search.go:50-60` (Reranker).
  */
object ScoreAgg {

  sealed trait Kind { def column(c: String): org.apache.spark.sql.Column }
  case object Sum extends Kind { def column(c: String) = sum(col(c)) }
  case object Max extends Kind { def column(c: String) = max(col(c)) }
  case object Mean extends Kind { def column(c: String) = avg(col(c)) }

  /** Dedup multi-query results by id, combining scores
    * (aggregation.go:107-255 vector / :316-447 text). `ascending` selects
    * the re-sort direction (distances asc, relevance desc). */
  def aggregate(results: DataFrame, kind: Kind, ascending: Boolean): DataFrame = {
    val agged = results.groupBy(col("id"))
      .agg(kind.column("score").as("score"))
    if (ascending) agged.orderBy(col("score").asc, col("id").asc)
    else agged.orderBy(col("score").desc, col("id").asc)
  }

  /** k <= 0 or k > n returns everything (limiter.go:12-17); otherwise the
    * optimizer turns orderBy+limit into TakeOrderedAndProject. */
  def limit(sorted: DataFrame, k: Int): DataFrame =
    if (k <= 0) sorted else sorted.limit(k)

  /** Autocut (limiter.go:81-118): normalize the sorted score curve to
    * [0,1]², diff against the y=x ramp, cut at the index of the
    * `cutOff`-th local maximum of the diff. `cutOff == -1` disables.
    *
    * Scores must already be in result order (best first). This runs on a
    * post-top-k result (≤ k rows), so it is a driver-side scalar pass by
    * design — same as the reference, which runs it after limiting.
    */
  def autocutIndex(scores: IndexedSeq[Double], cutOff: Int): Int = {
    val n = scores.length
    if (cutOff == -1 || n <= 1) return n
    // FLOAT32 arithmetic on purpose: the reference's Autocut runs on
    // float32 scores, and its enumerated expected indices on near-linear
    // ramps (limiter_test.go:185-255) depend on float32 rounding of the
    // diff curve — a double-precision twin finds different noise-scale
    // extrema there. Real score curves have macroscopic extrema, so the
    // double-precision DuckDB oracles are unaffected; this buys bit
    // parity with the reference's own test vectors.
    val step = 1.0f / (n - 1)
    val y0 = scores(0).toFloat
    val range = scores(n - 1).toFloat - y0
    val diff = Array.tabulate(n) { i =>
      val norm = (scores(i).toFloat - y0) / range
      norm - i * step
    }
    var extrema = 0
    var i = 1
    while (i < n) {
      val isMax =
        if (i == n - 1) diff(i) > diff(i - 1) && (n < 2 || diff(i) > diff(i - 2))
        else diff(i) > diff(i - 1) && diff(i) > diff(i + 1)
      if (isMax) {
        extrema += 1
        if (extrema >= cutOff) return i
      }
      i += 1
    }
    n
  }

  /** Apply autocut to an already-sorted, already-limited result frame.
    * Collects ≤ k rows to the driver — identical cost profile to the
    * reference (it always materializes the slice). */
  def autocut(sorted: DataFrame, cutOff: Int): DataFrame = {
    if (cutOff == -1) return sorted
    val rows = sorted.collect()
    val scoreIdx = sorted.schema.fieldIndex("score")
    val scores = rows.map(_.getDouble(scoreIdx)).toIndexedSeq
    val cut = autocutIndex(scores, cutOff)
    val spark = sorted.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.take(cut).toSeq, 1),
      sorted.schema)
  }

  /** Reranker hook (index_search.go:50-60): a user function over the final
    * (small) result slice. */
  type Reranker = Seq[Row] => Seq[Row]

  def rerank(sorted: DataFrame, reranker: Reranker): DataFrame = {
    val rows = sorted.collect().toSeq
    val spark = sorted.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(reranker(rows), 1), sorted.schema)
  }
}
