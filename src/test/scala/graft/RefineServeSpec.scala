package graft

import graft.vector.{BinaryServe, FlatKnn, IvfPq, Metric, Pq, QuantServe, RefineServe}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedded two-stage refine ([[RefineServe]]) over PQ / IVFPQ coarse
  * scans: budget-covering refine is bit-identical to the fine scan, a
  * bounded budget's recall is never below the coarse scan's, and the
  * id→row translation survives arbitrary (non-contiguous) ids. */
class RefineServeSpec extends SparkSpec {

  private lazy val corpus: DataFrame =
    spark.range(2000).select((col("id") * 7 + 13).as("id"), expr(
      "transform(sequence(0, 31), j -> cast(" +
        "sin((id + 3) * (j + 7) * 0.7919) * 37 + sin(id * 13 + j * 29) * 3 as float))"
    ).as("vector")).repartition(3).cache()

  private lazy val queries: Array[Array[Float]] =
    corpus.filter(col("id") % 500 === 13).select("vector").collect()
      .map(_.getSeq[Float](0).toArray)

  test("PQ coarse + f16 refine: full budget == the f16 scan, bit-exact") {
    val model = Pq.train(corpus, m = 4, ksub = 16, maxIter = 5)
    val pqServe = Pq.serve(Pq.encode(corpus, model), model)
    val fine = QuantServe.serveF16(corpus)
    val refined = RefineServe.over(fine)((q, b) => pqServe.search(q, b))
    queries.foreach { q =>
      assert(refined.search(q, 25, refineFactor = 0) == fine.search(q, 25))
      assert(refined.search(q, 25, refineFactor = 1000) == fine.search(q, 25))
      // k<=0 refines everything
      assert(refined.search(q, -1) == fine.search(q, -1))
    }
  }

  test("bounded budget: refined recall >= coarse recall, scores exact") {
    val model = Pq.train(corpus, m = 4, ksub = 16, maxIter = 5)
    val pqServe = Pq.serve(Pq.encode(corpus, model), model)
    val fine = QuantServe.serveF16(corpus)
    val refined = RefineServe.over(fine)((q, b) => pqServe.search(q, b))
    queries.foreach { q =>
      val exact = fine.search(q, 10).map(_._1).toSet
      val coarseHit = (pqServe.search(q, 10).map(_._1).toSet & exact).size
      val got = refined.search(q, 10, refineFactor = 8)
      assert((got.map(_._1).toSet & exact).size >= coarseHit)
      // every refined score is the fine scan's own score for that id
      val fineAll = fine.search(q, -1).toMap
      got.foreach { case (id, s) => assert(s == fineAll(id), s"id $id") }
    }
  }

  test("IVFPQ coarse + int8 refine composes; cosine mode refines in " +
       "the fine structure's 1-cos space") {
    val idx = IvfPq.build(corpus, nlist = 4, m = 4, ksub = 16, maxIter = 5)
    val ivfpqServe = IvfPq.serve(idx)
    val fineI8 = QuantServe.serveInt8(corpus)
    val refined = RefineServe.over(fineI8)(
      (q, b) => ivfpqServe.search(q, b, nprobe = 4))
    queries.foreach { q =>
      assert(refined.search(q, 15, refineFactor = 1000) ==
        fineI8.search(q, 15))
    }
    // cosine: coarse scores unit-Euclidean, refined scores 1-cos (the
    // fine structure's space) — full budget == the cosine fine scan
    val modelC = Pq.train(corpus, m = 4, ksub = 16, maxIter = 5,
      metric = Metric.Cosine)
    val pqC = Pq.serve(Pq.encode(corpus, modelC), modelC)
    val fineC = QuantServe.serveF16(corpus, Metric.Cosine)
    val refinedC = RefineServe.over(fineC)((q, b) => pqC.search(q, b))
    queries.foreach { q =>
      assert(refinedC.search(q, 15, refineFactor = 1000) ==
        fineC.search(q, 15))
    }
    // zero-norm cosine query: empty, like the fine scan
    assert(refinedC.search(new Array[Float](32), 5).isEmpty)
  }

  test("sketch coarse + refine: BinaryServe equals RefineServe over the " +
       "same fine structure when budgets align") {
    // composing the two two-stage paths must agree: the sketch's stage-1
    // indices and RefineServe's id translation pick the same rows
    val fine = QuantServe.serveF16(corpus)
    val two = BinaryServe.serveF16(corpus)
    queries.foreach { q =>
      assert(two.search(q, 10, refineFactor = 0) ==
        fine.search(q, 10))
    }
  }
}
