package graft.pipeline

import graft.expr.Distances
import graft.vector.{FlatKnn, Metric}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor similarity search over an embedding column.
  *
  * Baseline: exact brute-force cosine top-k ([[FlatKnn]] — the correctness
  * oracle). Scale path: random-hyperplane LSH — signature computation is a
  * per-row expression, candidate generation is an equi-join on (bucket),
  * and the quadratic verify runs only inside buckets. At 100 TB the bucket
  * join replaces the O(n·q) cross join with O(matching-bucket rows).
  * (IVF partition-pruned search in [[graft.vector.Ivf]] is the other scale
  * path — cluster-pruned instead of hash-bucketed.)
  */
object Similarity {

  /** Exact cosine top-k (brute force baseline). */
  def bruteForceCosine(data: DataFrame, queries: DataFrame, k: Int): DataFrame =
    FlatKnn.search(data, queries, k, Metric.Cosine)

  /** Deterministic pseudo-gaussian hyperplanes from a seed. */
  private def planes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Random-hyperplane LSH: bucket = sign-bit signature of `nPlanes` dot
    * products; queries probe their own bucket plus all Hamming-1 neighbor
    * buckets, then exact cosine re-ranks within the candidate set. */
  def lshCosine(data: DataFrame, queries: DataFrame, k: Int,
                nPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    val spark = data.sparkSession
    val dim = data.select(size(col("vector"))).head().getInt(0)
    val ps = planes(nPlanes, dim, seed)
    val bc = spark.sparkContext.broadcast(ps)
    val sigUdf = udf((v: Seq[Float]) => {
      val av = v.toArray
      var sig = 0
      var p = 0
      while (p < bc.value.length) {
        var d = 0.0
        var i = 0
        while (i < av.length) { d += av(i) * bc.value(p)(i); i += 1 }
        if (d > 0) sig |= (1 << p)
        p += 1
      }
      sig
    })
    val bucketed = data.withColumn("bucket", sigUdf(col("vector")))
    // query probes: own bucket + hamming-1 neighbors (multi-probe LSH)
    val probeUdf = udf((v: Seq[Float]) => {
      val av = v.toArray
      var sig = 0
      var p = 0
      while (p < bc.value.length) {
        var d = 0.0
        var i = 0
        while (i < av.length) { d += av(i) * bc.value(p)(i); i += 1 }
        if (d > 0) sig |= (1 << p)
        p += 1
      }
      (0 until bc.value.length).map(b => sig ^ (1 << b)) :+ sig
    })
    val qProbes = queries
      .select(col("qid"), col("qvec"), explode(probeUdf(col("qvec"))).as("bucket"))
    val scored = bucketed
      .join(broadcast(qProbes), "bucket")
      .select(col("qid"), col("id"),
        Distances.cosine(col("vector"), col("qvec")).as("score"))
    FlatKnn.topKPerQuery(scored, k, ascending = true)
  }
}
