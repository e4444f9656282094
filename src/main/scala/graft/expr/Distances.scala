package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance/similarity expressions over `ARRAY<FLOAT|DOUBLE>` columns.
  *
  * Reference semantics: `/root/reference/distance.go:114-239` (L2, L2², and
  * cosine-as-`1 - dot` on pre-normalized vectors, clamped to [0,2]).
  *
  * Design: the hot folds (l2/dot/norm/cosine) compile to native codegen'd
  * kernels ([[VecKernels]]) — one static call per row, primitive
  * accumulator, no UDF boxing — and are bit-deterministic: every element is
  * widened float→double (exact) and accumulated in a fixed left-to-right
  * IEEE-754 double sequence (this is what makes the DuckDB oracle
  * hash-match exactly). Cheap non-hot helpers (normalize/scale) stay as
  * `transform` expressions.
  *
  * At 100 TB the distance kernel is the hot inner loop of every kNN scan;
  * keeping it codegen'd (and the query side broadcast) means the scan
  * pipelines: parquet vectorized read -> codegen'd fold -> TakeOrdered, no
  * shuffle until the final top-k merge.
  */
object Distances {

  /** Cast an array column to ARRAY<DOUBLE> so all math happens in doubles. */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Σ (a_i - b_i)^2 — squared Euclidean (comet `SquaredL2Distance`,
    * distance.go:158-165). Codegen'd kernel, same left-to-right double
    * fold as the old `aggregate(zip_with(...))` form. */
  def l2Sq(a: Column, b: Column): Column = VecKernels.l2sq(a, b)

  /** Euclidean distance (comet `L2Distance`, distance.go:114-121). */
  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  /** Dot product. */
  def dot(a: Column, b: Column): Column = VecKernels.dot(a, b)

  /** Vector L2 norm (comet `Norm`, distance.go:312-318). */
  def norm(v: Column): Column = sqrt(VecKernels.dot(v, v))

  /** Cosine distance `1 - dot/(|a||b|)` for arbitrary vectors, clamped to
    * [0, 2] like comet (distance.go:201-216). Zero-norm input yields NULL
    * (comet errors at insert time instead — see [[normalized]]). */
  def cosine(a: Column, b: Column): Column = {
    val sim = dot(a, b) / (norm(a) * norm(b))
    least(greatest(lit(1.0) - sim, lit(0.0)), lit(2.0))
  }

  /** Cosine distance on pre-normalized vectors: `1 - dot` (comet normalizes
    * at insert, distance.go:70-81, then uses the fast path). */
  def cosinePreNorm(a: Column, b: Column): Column =
    least(greatest(lit(1.0) - dot(a, b), lit(0.0)), lit(2.0))

  /** Cosine similarity (higher = closer). */
  def cosineSim(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Normalize to unit length; zero vectors pass through unchanged (comet
    * `Normalize`, distance.go:369-388 — zero-vector special case at
    * :376-380). */
  def normalized(v: Column): Column = {
    val n = norm(v)
    when(n === 0.0, toDouble(v))
      .otherwise(transform(toDouble(v), x => x / n))
  }

  /** Scale by a constant (comet `Scale`, distance.go:338-344). */
  def scale(v: Column, k: Column): Column =
    transform(toDouble(v), x => x * k)
}
