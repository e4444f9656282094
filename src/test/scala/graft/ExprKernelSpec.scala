package graft

import graft.expr.TextShingles
import graft.pipeline.Dedup
import graft.text.Tokenize
import org.apache.spark.sql.functions._

/** Native codegen'd kernel expressions must agree exactly with the
  * built-in-function pipelines they replace (the oracle SQL mirrors the
  * built-in semantics, so any divergence breaks the correctness gate). */
class ExprKernelSpec extends SparkSpec {
  import spark.implicits._

  test("TextShingles == array_distinct(transform(slice)) HOF pipeline") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "The  Quick,   BROWN fox!"),
      (3L, "a b a b a b a b"), // repeated shingles -> distinct, stable order
      (4L, "only two"),        // fewer than n tokens -> empty
      (5L, ""),
      (6L, "Ünïcode 3.14 don't こんにちは mix 42x7")
    ).toDF("id", "text")
    val hof = docs.select($"id",
      Dedup.shingles(Tokenize.simple($"text"), 3).as("sh"))
    val native = docs.select($"id", TextShingles($"text", 3).as("sh"))
    val joined = hof.as("a").join(native.as("b"), "id")
      .select($"id", $"a.sh".as("ha"), $"b.sh".as("nb")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"mismatch for id=${r.getLong(0)}")
    }
  }

  test("TextTokens == filter(split(regexp_replace(lower))) HOF pipeline") {
    val docs = Seq(
      (1L, "The quick  brown Fox!"),
      (2L, ""),
      (3L, "  leading 42x7 trailing  "),
      (4L, "Ünïcode don't 3.14 こんにちは"),
      (5L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val joined = docs.select($"id",
        Tokenize.simpleHof($"text").as("h"),
        graft.expr.TextTokens($"text").as("n")).collect()
    joined.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(2))
      else assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"mismatch for id=${r.getLong(0)}")
    }
  }

  test("VecKernels l2sq/dot bit-match the aggregate(zip_with) fold") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 50).map { i =>
      (i.toLong,
        Array.fill(64)(rnd.nextFloat()),
        Array.fill(64)(rnd.nextFloat().toDouble))
    }
    val df = rows.toDF("id", "vf", "vd")
    def hofFold(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
                f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column) =
      aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"), f),
        lit(0.0), (acc, x) => acc + x)
    // float-float, double-double, and mixed float-double pairs
    val cmp = df.select(
      graft.expr.VecKernels.l2sq($"vf", $"vd").as("k_l2"),
      hofFold($"vf", $"vd", (x, y) => (x - y) * (x - y)).as("h_l2"),
      graft.expr.VecKernels.dot($"vf", $"vf").as("k_dotf"),
      hofFold($"vf", $"vf", (x, y) => x * y).as("h_dotf"),
      graft.expr.VecKernels.dot($"vd", $"vd").as("k_dotd"),
      hofFold($"vd", $"vd", (x, y) => x * y).as("h_dotd")).collect()
    cmp.foreach { r =>
      // exact bit equality, not tolerance — same IEEE fold order required
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(2) == r.getDouble(3))
      assert(r.getDouble(4) == r.getDouble(5))
    }
  }

  test("ingest kernels match the driver-side reference implementations") {
    val rnd = new scala.util.Random(7)
    val cents = Array.fill(5)(Array.fill(8)(rnd.nextFloat()))
    val books = Array.fill(2)(Array.fill(4)(Array.fill(4)(rnd.nextFloat())))
    val vecs = (0 until 40).map(i => (i.toLong, Array.fill(8)(rnd.nextFloat())))
    val df = vecs.toDF("id", "v")
    val got = df.select($"id",
        graft.expr.CentroidKernels.nearestCentroid($"v", cents).as("c"),
        graft.expr.CentroidKernels.pqEncode($"v", books).as("codes"),
        graft.expr.CentroidKernels.residual($"v",
          graft.expr.CentroidKernels.nearestCentroid($"v", cents), cents)
          .as("r"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getSeq[Int](2), r.getSeq[Float](3))).toMap
    val model = graft.vector.Pq.Model(2, 4, 4, books)
    vecs.foreach { case (id, v) =>
      val (c, codes, r) = got(id)
      assert(c == graft.vector.Kmeans.Model(cents).nearest(v))
      assert(codes == model.encode(v).toSeq)
      val cent = cents(c)
      assert(r == v.indices.map(i => v(i) - cent(i)))
    }
  }

  test("F16RoundTrip expression bit-matches the driver-side half-bit pair") {
    import graft.expr.Quantizers
    // exercise every branch of toHalfBits: normals, subnormal region,
    // flush-to-zero, overflow→inf, inf/NaN passthrough, negatives,
    // ties-to-even on both rounding paths
    val vecs = Seq(
      (1L, Array(0.0f, -0.0f, 1.0f, -1.0f, 3.1415927f, 65504f, 65520f,
        1e-8f, 6.1e-5f, 5.96e-8f, -2.44140625e-4f)),
      (2L, Array(Float.MaxValue, Float.MinPositiveValue, -Float.MaxValue,
        Float.PositiveInfinity, Float.NegativeInfinity, Float.NaN)),
      (3L, Array.tabulate(64)(i => (math.sin(i * 1.7) * math.pow(10, i % 12 - 6)).toFloat)),
      (4L, Array.empty[Float]),
      (5L, null.asInstanceOf[Array[Float]])
    ).toDF("id", "vector")
    val rows = vecs.select($"id",
      Quantizers.f16RoundTrip($"vector").as("rt"), $"vector").collect()
    rows.foreach { r =>
      if (r.isNullAt(2)) assert(r.isNullAt(1), "null vector must stay null")
      else {
        val got = r.getSeq[Float](1)
        val want = r.getSeq[Float](2).map(f =>
          Quantizers.fromHalfBits(Quantizers.toHalfBits(f)))
        assert(got.length == want.length)
        got.zip(want).foreach { case (g, w) =>
          assert(java.lang.Float.floatToIntBits(g) ==
            java.lang.Float.floatToIntBits(w),
            s"id=${r.getLong(0)}: $g != $w (bitwise)")
        }
      }
    }
    // and the double-input widening path
    val d = Seq((1L, Array(0.1, 2.5e-5, 1e9))).toDF("id", "v")
      .select(Quantizers.f16RoundTrip($"v").as("rt")).head().getSeq[Float](0)
    assert(d == Seq(0.1, 2.5e-5, 1e9).map(x =>
      Quantizers.fromHalfBits(Quantizers.toHalfBits(x.toFloat))))
  }

  test("GraftExtensions: kernels callable from plain Spark SQL") {
    GraftExtensions.register(spark)
    Seq((1L, "The quick brown fox", Array(1.0f, 2.0f), Array(3.0f, 4.0f)))
      .toDF("id", "text", "a", "b").createOrReplaceTempView("gx")
    val r = spark.sql(
      """SELECT vec_l2sq(a, b) AS l2, vec_dot(a, b) AS d,
        |  text_tokens(text) AS toks, text_shingles(text, 2) AS sh
        |FROM gx""".stripMargin).head()
    assert(r.getDouble(0) == 8.0) // (1-3)^2 + (2-4)^2
    assert(r.getDouble(1) == 11.0) // 1*3 + 2*4
    assert(r.getSeq[String](2) == Seq("the", "quick", "brown", "fox"))
    assert(r.getSeq[String](3) == Seq("the quick", "quick brown", "brown fox"))
  }

  test("TextShingles: null text -> null, n=1 -> distinct tokens") {
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, "b a b")).toDF("id", "text")
    val out = docs.select($"id", TextShingles($"text", 1).as("sh"))
      .orderBy($"id").collect()
    assert(out(0).isNullAt(1))
    assert(out(1).getSeq[String](1) == Seq("b", "a"))
  }

  test("TextSignals == the HOF/agg Gopher-signal formulation, bit-exact") {
    // the r19 kernel replaced: an interpreted per-bigram HOF that
    // re-tokenized the doc per element, and an explode + two keyed aggs +
    // join for top_token_ratio — this pins the kernel to the exact values
    // of the formulation the DuckDB oracles were written against
    val stop = graft.pipeline.TextAnalysis.GopherStopwords
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and the end"),
      (2L, "a a a a a"),              // one dominating token
      (3L, "x"),                      // single token: no bigrams
      (4L, ""),                       // token-less
      (5L, "!!! ... ???"),            // punctuation only: token-less
      (6L, "The Be to OF and that HAVE with"), // every stopword once
      (7L, "42 7x7 3 14 alpha beta 42 7x7"),   // digits, mixed, repeats
      (8L, "b a b a b a b a b a b a b a"),     // heavy bigram repetition
      (9L, "Ünïcode don't こんにちは mix")       // non-alnum splits
    ).toDF("id", "text")
    val toks = Tokenize.simple($"text")
    val n = size(toks)
    val nBi = greatest(size(toks) - 1, lit(0))
    val distinctBi = when(size(toks) < 2, lit(0)).otherwise(
      size(array_distinct(transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", slice(toks, i, lit(2)))))))
    val hofPerRow = docs.select($"id",
      n.cast("long").as("n_words"),
      when(n === 0, lit(0.0)).otherwise(
        aggregate(toks, lit(0.0), (acc, t) => acc + length(t)) /
          n.cast("double")).as("mean_word_len"),
      when(n === 0, lit(0.0)).otherwise(
        size(filter(toks, t => t.rlike("[a-z]"))).cast("double") /
          n.cast("double")).as("alpha_ratio"),
      size(filter(toks, t => t.isin(stop.map(lit): _*)))
        .cast("long").as("n_stop_hits"),
      nBi.cast("long").as("n_bigrams"),
      when(nBi === 0, lit(0.0)).otherwise(
        lit(1.0) - distinctBi.cast("double") / nBi.cast("double"))
        .as("dup_bigram_ratio"))
    val hofTop = docs
      .select($"id", explode(toks).as("tok"))
      .groupBy($"id", $"tok").agg(count(lit(1)).as("c"))
      .groupBy($"id")
      .agg((max($"c").cast("double") / sum($"c").cast("double"))
        .as("top_token_ratio"))
    val hof = hofPerRow.join(hofTop, Seq("id"), "left")
      .withColumn("top_token_ratio",
        coalesce($"top_token_ratio", lit(0.0)))
    val sig = graft.expr.TextSignals($"text", stop)
    val native = docs.select($"id",
      sig.getField("n_words").as("n_words"),
      sig.getField("mean_word_len").as("mean_word_len"),
      sig.getField("alpha_ratio").as("alpha_ratio"),
      sig.getField("n_stop_hits").as("n_stop_hits"),
      sig.getField("n_bigrams").as("n_bigrams"),
      sig.getField("dup_bigram_ratio").as("dup_bigram_ratio"),
      sig.getField("top_token_ratio").as("top_token_ratio"))
    val h = hof.orderBy($"id").collect()
    val k = native.orderBy($"id").collect()
    assert(h.length == k.length && h.nonEmpty)
    h.zip(k).foreach { case (a, b) =>
      (1 to 7).foreach { i =>
        // exact equality incl. doubles: same integer counts, one IEEE
        // division each — any drift would break the oracle hash gate
        assert(a.get(i) == b.get(i),
          s"field $i mismatch for id=${a.getLong(0)}: ${a.get(i)} vs ${b.get(i)}")
      }
    }
  }
}
