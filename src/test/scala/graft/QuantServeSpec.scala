package graft

import graft.expr.Quantizers
import graft.vector.{FlatKnn, Metric, QuantServe}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quantized embedded serving vs the quantize-dequantize COLUMN oracle:
  * `serveF16/serveInt8` must score exactly what an f32 flat scan over the
  * round-tripped vectors scores (quantizer.go semantics — distances
  * between dequantized vectors), and the packed layouts must actually be
  * half / a quarter of the f32 resident bytes. */
class QuantServeSpec extends SparkSpec {

  private lazy val corpus: DataFrame =
    spark.range(3000).select(col("id"), expr(
      "transform(sequence(0, 15), j -> cast(" +
        "sin(id * 7919 + j * 104729) * 37 + sin(id * 13 + j * 29) * 3 as float))"
    ).as("vector")).repartition(3).cache()

  private lazy val queries: Array[Array[Float]] =
    corpus.filter(col("id") % 700 === 11).select("vector").collect()
      .map(_.getSeq[Float](0).toArray)

  test("f16 serving == f32 serving over f16-roundtripped vectors (exact)") {
    val served = QuantServe.serveF16(corpus)
    val oracle = FlatKnn.serve(corpus.withColumn("vector",
      Quantizers.f16RoundTrip(col("vector"))))
    queries.foreach { q =>
      assert(served.search(q, 25) == oracle.search(q, 25))
    }
  }

  test("int8 serving == f32 serving over int8-roundtripped vectors (exact)") {
    val absMax = Quantizers.int8AbsMax(corpus, "vector").head().getDouble(0)
    val served = QuantServe.serveInt8(corpus)
    assert(served.absMax == absMax)
    val oracle = FlatKnn.serve(corpus.withColumn("vector",
      Quantizers.int8Dequantize(
        Quantizers.int8Quantize(col("vector"), lit(absMax)), lit(absMax))
        .cast("array<float>")))
    queries.foreach { q =>
      assert(served.search(q, 25) == oracle.search(q, 25))
    }
  }

  test("f16 cosine serving: normalize-then-quantize insert order, " +
       "1-cos scores vs the prenorm oracle") {
    val served = QuantServe.serveF16(corpus, Metric.Cosine)
    // oracle: normalize rows (the reference's PreprocessInPlace), THEN
    // round-trip through f16, then score raw-dot against the unit query
    val normed = corpus.withColumn("vector",
      graft.expr.Distances.normalized(col("vector")).cast("array<float>"))
    val oracle = FlatKnn.servePreNorm(normed.withColumn("vector",
      Quantizers.f16RoundTrip(col("vector"))))
    queries.foreach { q =>
      assert(served.search(q, 25) == oracle.search(Metric.unit(q), 25))
    }
  }

  test("int8 cosine trains absMax=1 on normalized rows and matches oracle") {
    val served = QuantServe.serveInt8(corpus, Metric.Cosine)
    assert(served.absMax == 1.0)
    val normed = corpus.withColumn("vector",
      graft.expr.Distances.normalized(col("vector")).cast("array<float>"))
    val oracle = FlatKnn.servePreNorm(normed.withColumn("vector",
      Quantizers.int8Dequantize(
        Quantizers.int8Quantize(col("vector"), lit(1.0)), lit(1.0))
        .cast("array<float>")))
    queries.foreach { q =>
      assert(served.search(q, 25) == oracle.search(Metric.unit(q), 25))
    }
  }

  test("quantized layouts halve / quarter the f32 resident bytes") {
    val f32 = FlatKnn.serve(corpus)
    val f16 = QuantServe.serveF16(corpus)
    val i8 = QuantServe.serveInt8(corpus)
    val n = f32.size.toLong
    assert(f16.size == n && i8.size == n)
    // ids are 8 B/row in all three; compare the vector payloads
    val vec32 = f32.byteSize - n * 8
    assert(f16.byteSize - n * 8 == vec32 / 2)
    assert(i8.byteSize - n * 8 == vec32 / 4)
  }

  test("filters and k<=0 behave like the f32 scan") {
    val served = QuantServe.serveF16(corpus)
    val oracle = FlatKnn.serve(corpus.withColumn("vector",
      Quantizers.f16RoundTrip(col("vector"))))
    val keep: Long => Boolean = _ % 3 == 0
    val q = queries.head
    assert(served.search(q, 10, keep) == oracle.search(q, 10, keep))
    assert(served.search(q, -1).length == 3000) // k<=0 = all, like flat
    assert(served.search(q, -1) == oracle.search(q, -1))
  }

  test("prenorm mode: rows stored raw, RAW query dotted — matches " +
       "servePreNorm over roundtripped rows incl. zero-norm query") {
    val normed = corpus.withColumn("vector",
      graft.expr.Distances.normalized(col("vector")).cast("array<float>"))
    val served = QuantServe.serveF16(normed, Metric.CosinePreNorm)
    val oracle = FlatKnn.servePreNorm(normed.withColumn("vector",
      Quantizers.f16RoundTrip(col("vector"))))
    queries.foreach { q =>
      val qu = graft.vector.Metric.unit(q)
      assert(served.search(qu, 25) == oracle.search(qu, 25))
      // prenorm trusts the caller: the RAW (non-unit) query scores the
      // same way on both sides
      assert(served.search(q, 25) == oracle.search(q, 25))
    }
    // zero-norm query: prenorm keeps everything at score 1.0 (dot = 0)
    val zero = new Array[Float](16)
    val got = served.search(zero, 5)
    assert(got == oracle.search(zero, 5))
    assert(got.forall(_._2 == 1.0))
    // int8 prenorm trains absMax from the stored rows (not forced to 1)
    val i8 = QuantServe.serveInt8(normed, Metric.CosinePreNorm)
    val absMax = Quantizers.int8AbsMax(normed, "vector").head().getDouble(0)
    assert(i8.absMax == absMax)
    val i8oracle = FlatKnn.servePreNorm(normed.withColumn("vector",
      Quantizers.int8Dequantize(
        Quantizers.int8Quantize(col("vector"), lit(absMax)), lit(absMax))
        .cast("array<float>")))
    queries.foreach { q =>
      assert(i8.search(q, 25) == i8oracle.search(q, 25))
    }
  }

  test("sharded f16/int8 serving is bit-identical to the single buffer " +
       "across shard cuts, metrics, filters, and k<=0") {
    // 3000 rows x 16 dim; maxShardElems=7168 => 448-row shards (7 of them,
    // with partition chunks straddling boundaries), 1<<20 => single shard
    for (maxElems <- Seq(7168L, 100000L, 1L << 20)) {
      val f16s = QuantServe.serveF16Sharded(corpus, maxShardElems = maxElems)
      val f16 = QuantServe.serveF16(corpus)
      assert(f16s.size == f16.size && f16s.byteSize == f16.byteSize)
      if (maxElems == 7168L) assert(f16s.shardCount == 7)
      val i8s = QuantServe.serveInt8Sharded(corpus, maxShardElems = maxElems)
      val i8 = QuantServe.serveInt8(corpus)
      val keep: Long => Boolean = _ % 3 == 0
      queries.foreach { q =>
        assert(f16s.search(q, 25) == f16.search(q, 25))
        assert(f16s.search(q, 25, keep) == f16.search(q, 25, keep))
        assert(f16s.search(q, -1) == f16.search(q, -1))
        assert(i8s.search(q, 25) == i8.search(q, 25))
      }
    }
    // cosine: normalize-then-quantize order and zero-query handling match
    val cs = QuantServe.serveF16Sharded(corpus, Metric.Cosine, 7168L)
    val c1 = QuantServe.serveF16(corpus, Metric.Cosine)
    queries.foreach { q => assert(cs.search(q, 25) == c1.search(q, 25)) }
    assert(cs.search(new Array[Float](16), 5) == Seq.empty)
    val i8c = QuantServe.serveInt8Sharded(corpus, Metric.Cosine, 7168L)
    val i8c1 = QuantServe.serveInt8(corpus, Metric.Cosine)
    queries.foreach { q => assert(i8c.search(q, 25) == i8c1.search(q, 25)) }
    // empty frame
    val empty = QuantServe.serveF16Sharded(corpus.filter(col("id") < 0))
    assert(empty.shardCount == 0 && empty.search(queries.head, 5) == Seq.empty)
  }

  test("f16-legged embedded hybrid == flat-legged hybrid over roundtripped " +
       "vectors (any-index serving composes with quantized storage)") {
    val s = spark
    import s.implicits._
    val meta = Seq(
      (1L, "electronics", 999.0), (2L, "electronics", 499.0),
      (3L, "books", 29.0), (4L, "books", 59.0)
    ).toDF("id", "category", "price")
    val vectors = Seq(
      (1L, Array(1f, 0.2f, 0f)), (2L, Array(0f, 1f, 0f)),
      (3L, Array(1f, 0.1f, 0f)), (4L, Array(0f, 0f, 1f))
    ).toDF("id", "vector")
    val corpus = graft.text.BM25.build(Seq(
      (1L, "wireless noise cancelling headphones"),
      (2L, "usb charging cable fast"),
      (3L, "novel about wireless telegraph history"),
      (4L, "cookbook recipes")
    ).toDF("id", "text"))
    val cfg = graft.hybrid.Hybrid.Config(k = 4,
      fusion = graft.hybrid.Hybrid.Rrf)
    val f16 = QuantServe.serveF16(vectors)
    val quantLegged = graft.hybrid.Hybrid.serveWith(meta,
      (q, k, pred) => f16.search(q, k, pred), corpus, cfg)
    val oracleLegged = graft.hybrid.Hybrid.serve(meta,
      vectors.withColumn("vector", Quantizers.f16RoundTrip(col("vector"))),
      corpus, cfg)
    import graft.filter.{Filter, FilterGroup}
    for {
      qv <- Seq(Some(Array(1f, 0f, 0f)), None)
      qt <- Seq(Some("wireless headphones"), None)
      fs <- Seq(Seq(FilterGroup(Seq(Filter.Gt("price", 50)))), Seq.empty)
    } assert(quantLegged.search(fs, qv, qt) == oracleLegged.search(fs, qv, qt),
      s"diverged for ($qv, $qt, $fs)")
  }

  test("recall vs exact f32 is high at mild quantization (sanity, " +
       "not a golden number)") {
    val exact = FlatKnn.serve(corpus)
    val f16 = QuantServe.serveF16(corpus)
    val i8 = QuantServe.serveInt8(corpus)
    val q = queries.head
    val truth = exact.search(q, 50).map(_._1).toSet
    val rF16 = (f16.search(q, 50).map(_._1).toSet & truth).size / 50.0
    val rI8 = (i8.search(q, 50).map(_._1).toSet & truth).size / 50.0
    assert(rF16 >= 0.9, s"f16 recall@50 = $rF16")
    assert(rI8 >= 0.7, s"int8 recall@50 = $rI8")
  }
}
