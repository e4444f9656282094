package graft

import graft.vector.{FlatKnn, IvfPq, Metric, Pq}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-stage refined PQ/IVFPQ search: refine-everything equals EXACT
  * flat search (the candidate set covers the corpus, so the exact
  * re-rank IS the exact scan), and a bounded refine can only help —
  * every true neighbor the code scan surfaces anywhere in its candidate
  * list is promoted into the final top-k. */
class PqRefineSpec extends SparkSpec {

  private lazy val corpus: DataFrame =
    spark.range(500).select(col("id"), expr(
      "transform(sequence(0, 31), j -> cast(" +
        "sin(id * 7919 + j * 104729) * 37 + sin(id * 13 + j * 29) * 3 as float))"
    ).as("vector")).repartition(3).cache()

  private def queryDf(qid: Long) = {
    import spark.implicits._
    val row = corpus.filter(col("id") === qid).head()
    Seq((row.getLong(0), row.getSeq[Float](1).toArray)).toDF("qid", "qvec")
  }

  private def top(df: DataFrame): Seq[(Long, Double)] =
    df.select(col("id").cast("long"), col("score")).collect().toSeq
      .map(r => (r.getLong(0), r.getDouble(1)))

  test("refine budget covering the corpus == exact flat search") {
    val model = Pq.train(corpus, m = 4, ksub = 16, maxIter = 5)
    val encoded = Pq.encode(corpus, model).cache()
    val q = queryDf(11)
    val refined = top(Pq.searchRefined(encoded, model, corpus, q, 10,
      refineFactor = 50)) // 500 candidates = all rows
    val exact = top(FlatKnn.search(corpus, q, 10))
    assert(refined == exact)
  }

  test("bounded refine: recall never below the coarse scan's") {
    val model = Pq.train(corpus, m = 4, ksub = 16, maxIter = 5)
    val encoded = Pq.encode(corpus, model).cache()
    for (qid <- Seq(11L, 211L, 411L)) {
      val q = queryDf(qid)
      val exact = top(FlatKnn.search(corpus, q, 10)).map(_._1).toSet
      val coarse = top(Pq.search(encoded, model, q, 10)).map(_._1).toSet
      val refined = top(Pq.searchRefined(encoded, model, corpus, q, 10,
        refineFactor = 4)).map(_._1).toSet
      assert((refined & exact).size >= (coarse & exact).size,
        s"qid $qid: refined recall ${(refined & exact).size} < " +
          s"coarse ${(coarse & exact).size}")
      // refined scores are EXACT distances: each reported (id, score)
      // matches the flat scan's distance for that id
      val exactAll = top(FlatKnn.search(corpus, q, -1)).toMap
      top(Pq.searchRefined(encoded, model, corpus, q, 10, refineFactor = 4))
        .foreach { case (id, s) =>
          assert(math.abs(s - exactAll(id)) < 1e-9, s"id $id") }
    }
  }

  test("cosine refine scores in unit-space Euclidean (the PQ score space)") {
    val model = Pq.train(corpus, m = 4, ksub = 16, maxIter = 5,
      metric = Metric.Cosine)
    val encoded = Pq.encode(corpus, model).cache()
    val q = queryDf(11)
    val refined = top(Pq.searchRefined(encoded, model, corpus, q, 10,
      refineFactor = 50))
    // oracle: L2 over unit vectors
    val normed = corpus.withColumn("vector",
      graft.expr.Distances.normalized(col("vector")).cast("array<float>"))
    val qn = {
      import spark.implicits._
      val row = normed.filter(col("id") === 11).head()
      Seq((row.getLong(0), row.getSeq[Float](1).toArray)).toDF("qid", "qvec")
    }
    val exact = top(FlatKnn.search(normed, qn, 10))
    assert(refined.map(_._1) == exact.map(_._1))
    refined.zip(exact).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-6) }
  }

  test("IVFPQ refine with all clusters probed and full budget == exact") {
    val idx = IvfPq.build(corpus, nlist = 4, m = 4, ksub = 16, maxIter = 5)
    val q = queryDf(11)
    val refined = top(IvfPq.searchRefined(idx, corpus, q, 10,
      nprobe = 4, refineFactor = 50))
    val exact = top(FlatKnn.search(corpus, q, 10))
    assert(refined == exact)
    // candidate restriction composes: refined results respect the filter
    val cands = corpus.filter(col("id") % 2 === 0).select("id")
    val r2 = top(IvfPq.searchRefined(idx, corpus, q, 5, nprobe = 4,
      refineFactor = 50, candidates = Some(cands)))
    val e2 = top(FlatKnn.search(corpus, q, 5, candidates = Some(cands)))
    assert(r2 == e2)
  }
}
