package graft.vector

import graft.expr.Quantizers
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** f16 storage quantization of HNSW graphs (quantizer.go:17-21 composed
  * with the graph index): edges untouched, vectors at 2 B/element, search
  * through the LUT kernels. On f16-REPRESENTABLE vectors the quantization
  * is the identity, so every result must be BIT-identical to f32 serving;
  * on general vectors the exhaustive beam must match a flat scan over the
  * f16-roundtripped rows. */
class HnswQuantSpec extends graft.SparkSpec {

  /** All components are integers in [-60, 60] — exactly representable in
    * f16, so quantized storage stores the identical values. */
  private lazy val exactCorpus: DataFrame =
    spark.range(800).select(col("id"), expr(
      "transform(sequence(0, 11), j -> cast(round(" +
        "sin((id % 37) * 131 + j) * 30 + sin(id * 7919 + j * 17) * 30) as float))"
    ).as("vector")).repartition(3).cache()

  private lazy val generalCorpus: DataFrame =
    spark.range(800).select(col("id"), expr(
      "transform(sequence(0, 11), j -> cast(" +
        "sin((id % 37) * 131 + j) * 30 + sin(id * 7919 + j * 17) * 3 as float))"
    ).as("vector")).repartition(3).cache()

  private def queriesOf(df: DataFrame): Array[Array[Float]] =
    df.filter(col("id") % 190 === 3).select("vector").collect()
      .map(_.getSeq[Float](0).toArray)

  test("f16-representable vectors: serveF16 == serve bit-identically " +
       "(identity quantization), every ef, with filters") {
    val index = Hnsw.build(exactCorpus, m = 8, efConstruction = 60)
    val f32 = Hnsw.serve(index)
    val f16 = Hnsw.serveF16(index)
    assert(f16.size == f32.size)
    val keep: Long => Boolean = _ % 3 == 0
    for (q <- queriesOf(exactCorpus); ef <- Seq(20, 100, 2000)) {
      assert(f16.search(q, 10, ef) == f32.search(q, 10, ef))
      assert(f16.search(q, 10, ef, keep) == f32.search(q, 10, ef, keep))
    }
    index.unpersist()
  }

  test("general vectors: exhaustive-ef f16 serving == flat scan over " +
       "f16-roundtripped rows") {
    val index = Hnsw.build(generalCorpus, m = 8, efConstruction = 60)
    val f16 = Hnsw.serveF16(index)
    val oracle = FlatKnn.serve(generalCorpus.withColumn("vector",
      Quantizers.f16RoundTrip(col("vector"))))
    queriesOf(generalCorpus).foreach { q =>
      val got = f16.search(q, 10, efSearch = 2000)
      val want = oracle.search(q, 10)
      assert(got.map(_._1) == want.map(_._1), "ids diverged")
      // the beam kernel reassociates the fold (4-way unroll) — scores
      // match the sequential oracle to ulps, not bits
      got.zip(want).foreach { case ((_, s), (_, t)) =>
        assert(math.abs(s - t) <= 1e-9 * math.max(1.0, t))
      }
    }
    index.unpersist()
  }

  test("vector bytes halve (f16) / quarter (int8); ids/levels/edges " +
       "unchanged") {
    val index = Hnsw.build(generalCorpus, m = 8, efConstruction = 60)
    val f32 = Hnsw.serve(index)
    val f16 = Hnsw.serveF16(index)
    val i8 = Hnsw.serveInt8(index)
    assert(f32.byteSize - f16.byteSize == 800L * 12 * 2)
    assert(f32.byteSize - i8.byteSize == 800L * 12 * 3)
    index.unpersist()
  }

  test("int8 storage: exhaustive-ef serving == flat scan over " +
       "int8-roundtripped rows at the corpus-trained absMax") {
    val index = Hnsw.build(generalCorpus, m = 8, efConstruction = 60)
    val i8 = Hnsw.serveInt8(index)
    val absMax = Quantizers.int8AbsMax(generalCorpus, "vector")
      .head().getDouble(0)
    val oracle = FlatKnn.serve(generalCorpus.withColumn("vector",
      Quantizers.int8Dequantize(
        Quantizers.int8Quantize(col("vector"), lit(absMax)), lit(absMax))
        .cast("array<float>")))
    queriesOf(generalCorpus).foreach { q =>
      val got = i8.search(q, 10, efSearch = 2000)
      val want = oracle.search(q, 10)
      assert(got.map(_._1) == want.map(_._1), "ids diverged")
      got.zip(want).foreach { case ((_, s), (_, t)) =>
        assert(math.abs(s - t) <= 1e-9 * math.max(1.0, t))
      }
    }
    index.unpersist()
  }

  test("quantized graph is frozen: add throws; copyGraph unfreezes with " +
       "dequantized values; the source index is untouched") {
    val g = new Hnsw.LocalGraph(m = 4, efConstruction = 30)
    (0L until 50L).foreach(i =>
      g.add(i, Array.tabulate(6)(j => (math.sin(i * 0.7 + j) * 10).toFloat)))
    val q = Array.tabulate(6)(j => (math.cos(j * 1.1) * 5).toFloat)
    val before = g.search(q, 10, 1000)
    val frozen = g.copyGraph()
    frozen.quantizeStorageF16()
    intercept[IllegalArgumentException] {
      frozen.add(99L, new Array[Float](6))
    }
    // original untouched by the frozen copy
    assert(g.search(q, 10, 1000) == before)
    // copyGraph of a quantized graph is mutable again and serves the
    // dequantized (= roundtripped) vectors
    val thawed = frozen.copyGraph()
    thawed.add(99L, Array.tabulate(6)(j => q(j)))
    assert(thawed.search(q, 1, 1000).head._1 == 99L)
  }

  test("cosine-built index: f16 serving recall vs f32 serving is total " +
       "on a separable corpus") {
    val index = Hnsw.build(exactCorpus, m = 8, efConstruction = 60,
      metric = Metric.Cosine)
    val f32 = Hnsw.serve(index)
    val f16 = Hnsw.serveF16(index)
    queriesOf(exactCorpus).foreach { q =>
      // normalize-at-insert makes stored values non-integers, so bit
      // equality is not expected — but the top-10 ids must agree here
      assert(f16.search(q, 10, 2000).map(_._1) ==
        f32.search(q, 10, 2000).map(_._1))
    }
    index.unpersist()
  }
}
