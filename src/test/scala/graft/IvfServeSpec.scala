package graft

import graft.expr.Quantizers
import graft.vector.{FlatKnn, Ivf, IvfServe, Metric}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedded IVF serving vs the distributed [[Ivf.search]] path: same
  * centroid routing, same scores, row for row — and the f16/int8 storage
  * quantizers must equal the distributed search over the quantize-
  * dequantize COLUMNS with the SAME cluster assignment (storage
  * compression never re-routes a row). */
class IvfServeSpec extends SparkSpec {

  private lazy val corpus: DataFrame =
    spark.range(2000).select(col("id"), expr(
      "transform(sequence(0, 15), j -> cast(" +
        "sin((id % 40) * 131 + j) * 20 + sin(id * 7919 + j * 104729) * 2 as float))"
    ).as("vector")).repartition(3).cache()

  private lazy val index = Ivf.build(corpus, nlist = 8, maxIter = 5)

  private lazy val queries: Array[(Long, Array[Float])] =
    corpus.filter(col("id") % 450 === 7)
      .select(col("id"), col("vector")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  private def queryDf(qs: Array[(Long, Array[Float])]): DataFrame = {
    val s = spark
    import s.implicits._
    qs.toSeq.map { case (id, v) => (id, v.toSeq) }.toDF("qid", "qvec")
  }

  private def distRows(df: DataFrame, qid: Long): Seq[(Long, Double)] =
    df.filter(col("qid") === qid).select(col("id"), col("score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("f32 embedded == distributed Ivf.search, every nprobe") {
    val served = IvfServe.serve(index)
    assert(served.size == 2000 && served.nlist == 8)
    for (np <- Seq(1, 3, 8)) {
      val dist = Ivf.search(index, queryDf(queries), 10, np).cache()
      queries.foreach { case (qid, qv) =>
        assert(served.search(qv, 10, np) == distRows(dist, qid),
          s"diverged at nprobe=$np qid=$qid")
      }
    }
  }

  test("f16 storage == distributed search over f16-roundtripped columns " +
       "with the same assignment") {
    val served = IvfServe.serve(index, IvfServe.F16)
    val rounded = index.copy(assigned = index.assigned.withColumn("vector",
      Quantizers.f16RoundTrip(col("vector"))))
    val dist = Ivf.search(rounded, queryDf(queries), 10, 3).cache()
    queries.foreach { case (qid, qv) =>
      assert(served.search(qv, 10, 3) == distRows(dist, qid))
    }
  }

  test("int8 storage == distributed search over int8-roundtripped columns") {
    val served = IvfServe.serve(index, IvfServe.I8)
    val absMax = served.absMax
    assert(absMax ==
      Quantizers.int8AbsMax(corpus, "vector").head().getDouble(0))
    val rounded = index.copy(assigned = index.assigned.withColumn("vector",
      Quantizers.int8Dequantize(
        Quantizers.int8Quantize(col("vector"), lit(absMax)), lit(absMax))
        .cast("array<float>")))
    val dist = Ivf.search(rounded, queryDf(queries), 10, 3).cache()
    queries.foreach { case (qid, qv) =>
      assert(served.search(qv, 10, 3) == distRows(dist, qid))
    }
  }

  test("cosine-built index: embedded == distributed under Metric.Cosine") {
    val cosIndex = Ivf.build(corpus, nlist = 8, maxIter = 5, Metric.Cosine)
    val served = IvfServe.serve(cosIndex)
    val dist = Ivf.search(cosIndex, queryDf(queries), 10, 3,
      Metric.Cosine).cache()
    queries.foreach { case (qid, qv) =>
      assert(served.search(qv, 10, 3) == distRows(dist, qid))
    }
    // f16 cosine: quantized stored rows, same clusters
    val served16 = IvfServe.serve(cosIndex, IvfServe.F16)
    val rounded = cosIndex.copy(assigned = cosIndex.assigned
      .withColumn("vector", Quantizers.f16RoundTrip(col("vector"))))
    val dist16 = Ivf.search(rounded, queryDf(queries), 10, 3,
      Metric.Cosine).cache()
    queries.foreach { case (qid, qv) =>
      assert(served16.search(qv, 10, 3) == distRows(dist16, qid))
    }
  }

  test("probe-all over f32 storage == flat embedded serving") {
    val served = IvfServe.serve(index)
    val flat = FlatKnn.serve(corpus)
    queries.foreach { case (_, qv) =>
      assert(served.search(qv, 25, nprobe = 8) == flat.search(qv, 25))
    }
  }

  test("filters, threshold, k<=0, and storage memory contracts") {
    val f32 = IvfServe.serve(index)
    val f16 = IvfServe.serve(index, IvfServe.F16)
    val i8 = IvfServe.serve(index, IvfServe.I8)
    // payload bytes halve / quarter (ids + centroids + offsets identical)
    assert(f32.byteSize - f16.byteSize == 2000L * 16 * 2)
    assert(f32.byteSize - i8.byteSize == 2000L * 16 * 3)
    val (_, qv) = queries.head
    val keep: Long => Boolean = _ % 3 == 0
    val dist = Ivf.search(index, queryDf(queries.take(1)), 10, 3,
      candidates = Some(corpus.filter(col("id") % 3 === 0).select("id")))
    assert(f32.search(qv, 10, 3, keep) == distRows(dist, queries.head._1))
    // threshold mirrors the distributed cutoff
    val t = f32.search(qv, 10, 3).last._2
    val cut = f32.search(qv, 10, 3, null, Some(t))
    assert(cut == f32.search(qv, 10, 3))
    assert(f32.search(qv, 10, 3, null, Some(t - 1e-9)).size < 10 ||
      f32.search(qv, 10, 3).count(_._2 <= t - 1e-9) == 10)
    // k<=0 returns all probed rows
    val all = f32.search(qv, -1, 8)
    assert(all.size == 2000)
    // empty index
    val empty = IvfServe.serve(index.copy(assigned =
      index.assigned.filter(col("id") < 0)))
    assert(empty.search(qv, 5, 3) == Seq.empty)
  }
}
