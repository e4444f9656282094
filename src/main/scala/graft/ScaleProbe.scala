package graft

import graft.vector.{FlatKnn, Ivf, Kmeans, Metric}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot scale measurement at the reference's SIFT-1M shape (1M ×
  * 128-dim in-memory vectors, k=100 — BASELINE.md): flat vs IVF, each
  * with and without a 10% document pre-filter. Validates the round-3
  * claim that a filtered search KEEPS index speed (the reference pushes
  * its document filter into every index, ivf_index_search.go:287-290)
  * instead of degrading to a flat scan. Not part of the bench contract —
  * run manually:
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.ScaleProbe"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // driver heap comes from the launching JVM (sbt fork javaOptions) —
      // spark.driver.memory is a no-op in local mode; the 1M×128 float
      // cache needs ~1 GB of it
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val d = 128
    // deterministic pseudo-random vectors, same generator as the round-2
    // flat measurement
    val vecs = spark.range(1000000L).select(col("id"),
        expr(s"transform(sequence(0, ${d - 1}), " +
          "j -> cast(sin(id * 131 + j) * 100 as float))").as("vector"))
      .repartition(cpus.toInt).persist()
    vecs.count()

    val queries = vecs.filter(col("id") % 31250 === 7)
      .select(col("id").as("qid"), col("vector").as("qvec")).persist()
    val nq = queries.count() // 32 queries
    val cands = vecs.filter(col("id") % 10 === 0).select("id").persist()
    cands.count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-28s ${sec}%7.2f s  (${sec * 1000 / nq}%6.1f ms/query, rows=$n)")
    }

    // train on a 20k sample (the reference trains on a sample too), assign
    // the full 1M once — build cost reported separately from search
    val t0 = System.nanoTime()
    val model = Kmeans.train(vecs.filter(col("id") % 50 === 0), 64, 5)
    val assigned = vecs.withColumn("cluster",
      graft.expr.CentroidKernels.nearestCentroid(col("vector"), model.centroids))
      .persist()
    assigned.count()
    val idx = Ivf.Index(assigned, model)
    println(f"[probe] ivf build (64 lists, 20k sample train + 1M assign): ${(System.nanoTime() - t0) / 1e9}%.1f s")

    time("flat k=100, batch-32")(
      FlatKnn.search(vecs, queries, 100, Metric.L2).count())
    time("flat + 10%-filter")(
      FlatKnn.search(vecs, queries, 100, Metric.L2,
        candidates = Some(cands)).count())
    time("ivf nprobe=4, batch-32")(
      Ivf.search(idx, queries, 100, nprobe = 4).count())
    time("ivf nprobe=4 + 10%-filter")(
      Ivf.search(idx, queries, 100, nprobe = 4,
        candidates = Some(cands)).count())
    spark.stop()
  }
}
