package graft

import graft.vector.{BinaryServe, FlatKnn, Metric, QuantServe}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 1-bit sign sketch + refine vs its exactness anchor: with the refine
  * budget covering the corpus the two-stage result must be BIT-IDENTICAL
  * to the underlying quantized scan, and with a bounded budget the
  * sketch must actually find near neighbors (deterministic corpus, so
  * the recall assertions are stable). */
class BinaryServeSpec extends SparkSpec {

  // the id·j cross term decorrelates row SIGN patterns — a generator
  // linear in id and j separately (the other specs' corpus) repeats sign
  // patterns across rows (28 of 3000 rows at Hamming 0 from one query),
  // which is adversarial for a sign sketch and makes tiny-budget
  // assertions unstable
  private lazy val corpus: DataFrame =
    spark.range(3000).select(col("id"), expr(
      "transform(sequence(0, 63), j -> cast(" +
        "sin((id + 3) * (j + 7) * 0.7919) * 37 + sin(id * 13 + j * 29) * 3 as float))"
    ).as("vector")).repartition(3).cache()

  private lazy val queries: Array[Array[Float]] =
    corpus.filter(col("id") % 700 === 11).select("vector").collect()
      .map(_.getSeq[Float](0).toArray)

  test("refine-everything is bit-identical to the fine scan, all modes") {
    for (metric <- Seq(Metric.L2, Metric.Cosine, Metric.CosinePreNorm)) {
      val two = BinaryServe.serveF16(corpus, metric)
      val fine = QuantServe.serveF16(corpus, metric)
      queries.foreach { q =>
        assert(two.search(q, 25, refineFactor = 0) == fine.search(q, 25),
          s"f16 $metric")
        // budget >= n behaves the same as <=0
        assert(two.search(q, 25, refineFactor = 1000) == fine.search(q, 25))
      }
    }
    val twoI8 = BinaryServe.serveInt8(corpus)
    val fineI8 = QuantServe.serveInt8(corpus)
    queries.foreach { q =>
      assert(twoI8.search(q, 25, refineFactor = 0) == fineI8.search(q, 25))
    }
  }

  test("bounded budget: sketch finds the planted neighborhood (recall)") {
    // recall vs the fine scan at refineFactor=16 on the 64-dim corpus —
    // deterministic, so this is a fixed number; assert a floor well under
    // the observed value to keep the spec stable across JVMs
    val two = BinaryServe.serveF16(corpus)
    val fine = QuantServe.serveF16(corpus)
    val recalls = queries.map { q =>
      val exact = fine.search(q, 10).map(_._1).toSet
      val got = two.search(q, 10, refineFactor = 16).map(_._1).toSet
      (exact & got).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.5, s"mean recall@10 $mean < 0.5 (${recalls.toSeq})")
    // the query row sketches to Hamming 0, so even a tiny budget finds
    // the fine scan's top-1 (score is the f16 roundtrip self-distance,
    // NOT 0 — the query stays f32)
    queries.foreach { q =>
      assert(two.search(q, 1, refineFactor = 8) == fine.search(q, 1))
    }
  }

  test("filter, k<=0, and degenerate queries behave like the fine scan") {
    val two = BinaryServe.serveF16(corpus)
    val fine = QuantServe.serveF16(corpus)
    val keep: Long => Boolean = _ % 3 == 0
    val q = queries.head
    // filtered + full-budget = filtered fine scan
    assert(two.search(q, 10, 0, keep) == fine.search(q, 10, keep))
    // k<=0 refines everything regardless of factor
    assert(two.search(q, -1, refineFactor = 2) == fine.search(q, -1))
    // zero-norm cosine query: empty, like every cosine scan
    val zero = new Array[Float](64)
    assert(BinaryServe.serveF16(corpus, Metric.Cosine)
      .search(zero, 5).isEmpty)
    // sketch layout: ceil(64/64) = 1 word/row over the fine codes
    assert(two.sketchBytes == 3000L * 8)
    assert(two.byteSize == fine.byteSize + two.sketchBytes)
    assert(two.size == fine.size)
  }
}
