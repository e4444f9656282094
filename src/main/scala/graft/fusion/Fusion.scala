package graft.fusion

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Score fusion across retrieval modalities.
  *
  * Reference: `/root/reference/fusion.go` — WeightedSum (:131-149, no
  * normalization, missing modality contributes 0), RRF (:174-200, 0-based
  * dense ranks, k=60 default :66), Max (:258-276, full-outer), Min
  * (:291-306, inner — only docs present in BOTH survive).
  *
  * Spark design: each strategy is a join of the two (id, score) frames plus
  * column arithmetic; RRF ranks come from a window. Both inputs are already
  * top-k-truncated (≤ k rows each), so these joins are broadcast-sized; at
  * scale the whole fusion is a single narrow stage.
  *
  * Determinism note: comet ranks ties in Go map iteration order
  * (fusion.go:205-243); we break ties by id — deterministic, and identical
  * whenever scores are distinct.
  */
object Fusion {
  val DefaultRrfK = 60.0

  /** RRF's global ranking window is only safe on pre-truncated inputs
    * (each modality hands fusion its top-k); this cap ENFORCES that
    * contract instead of trusting it — an unbounded frame gets cut before
    * the single-partition window, so the plan can never sort the world on
    * one task. A no-op for every legitimate caller (limit-after-limit
    * collapses in Catalyst). */
  val MaxRankInput = 10000

  private def v(df: DataFrame) =
    df.select(col("id"), col("score").cast("double").as("vscore"))
  private def t(df: DataFrame) =
    df.select(col("id"), col("score").cast("double").as("tscore"))

  /** finalScore = vw·vecScore + tw·txtScore (fusion.go:131-149). */
  def weightedSum(vec: DataFrame, txt: DataFrame,
                  vw: Double = 1.0, tw: Double = 1.0): DataFrame =
    v(vec).join(t(txt), Seq("id"), "full_outer")
      .select(col("id"),
        (coalesce(col("vscore"), lit(0.0)) * vw +
         coalesce(col("tscore"), lit(0.0)) * tw).as("score"))

  /** RRF: Σ 1/(k + rank) with 0-based per-modality ranks
    * (fusion.go:174-200). Vector ranks ascend by score (distances), text
    * ranks descend (relevance). */
  def rrf(vec: DataFrame, txt: DataFrame, k: Double = DefaultRrfK): DataFrame = {
    // TakeOrdered pre-cut in rank order: distributed heaps feed the
    // single-partition ranking window at most MaxRankInput rows, so the
    // window never sorts the world even on a misused unbounded input
    val vin = v(vec).orderBy(col("vscore").asc, col("id").asc)
      .limit(MaxRankInput)
    val tin = t(txt).orderBy(col("tscore").desc, col("id").asc)
      .limit(MaxRankInput)
    val vr = vin.withColumn("vrank",
      row_number().over(Window.orderBy(col("vscore").asc, col("id").asc)) - 1)
    val tr = tin.withColumn("trank",
      row_number().over(Window.orderBy(col("tscore").desc, col("id").asc)) - 1)
    vr.join(tr, Seq("id"), "full_outer")
      .select(col("id"),
        (when(col("vrank").isNotNull, lit(1.0) / (lit(k) + col("vrank")))
           .otherwise(0.0) +
         when(col("trank").isNotNull, lit(1.0) / (lit(k) + col("trank")))
           .otherwise(0.0)).as("score"))
  }

  /** Max across modalities, full-outer (fusion.go:258-276). */
  def maxFusion(vec: DataFrame, txt: DataFrame): DataFrame =
    v(vec).join(t(txt), Seq("id"), "full_outer")
      .select(col("id"),
        greatest(coalesce(col("vscore"), col("tscore")),
                 coalesce(col("tscore"), col("vscore"))).as("score"))

  /** Min across modalities, INNER — both modalities required
    * (fusion.go:291-306). */
  def minFusion(vec: DataFrame, txt: DataFrame): DataFrame =
    v(vec).join(t(txt), Seq("id"), "inner")
      .select(col("id"), least(col("vscore"), col("tscore")).as("score"))
}
