package graft

import graft.text.{BM25, Tokenize}

/** Pins the README worked example (README.md:640-700) and the reference's
  * tokenizer/normalizer semantics. */
class BM25Spec extends SparkSpec {

  private lazy val corpus = {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // 9 tokens
      (2L, "the lazy dog sleeps"),                         // 4 tokens
      (3L, "quick brown rabbits run the forest")           // 6 tokens... README uses 4
    ).toDF("id", "text")
    BM25.build(docs)
  }

  test("worked example: idf and tf components (README.md:640-700)") {
    // Use the README's exact corpus shape: doc lengths 9, 4, 4; avg 17/3
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "lazy dog sleeps here"),
      (3L, "quick brown rabbits run")
    ).toDF("id", "text")
    val c = BM25.build(docs)
    val res = c.search("quick brown", 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val avg = 17.0 / 3.0
    val idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1) // 0.470
    def tfs(dl: Double) = 2.2 / (1 + 1.2 * (1 - 0.75 + 0.75 * dl / avg))
    val doc1 = 2 * idf * tfs(9)
    val doc3 = 2 * idf * tfs(4)
    assert(math.abs(res(1L) - doc1) < 1e-9)
    assert(math.abs(res(3L) - doc3) < 1e-9)
    assert(!res.contains(2L))
    assert(res(3L) > res(1L)) // shorter doc ranks higher
  }

  test("empty query returns empty (bm25_index_search.go:279-281)") {
    assert(corpus.search("", 10).collect().isEmpty)
    assert(corpus.search("zzzunseen", 10).collect().isEmpty)
  }

  test("more-like-this by doc id ranks the doc itself first") {
    val res = corpus.searchByDocs(Seq(1L), 10).collect()
    assert(res.nonEmpty)
    assert(res.head.getLong(0) == 1L)
  }

  test("uax29 tokenizer: NFKC + lowercase + word segmentation") {
    assert(Tokenize.uax29Tokens("The Quick-Brown fox!") ==
      Seq("the", "quick", "brown", "fox"))
    // NFKC folds the ligature ﬁ and fullwidth digits
    assert(Tokenize.uax29Tokens("ﬁle ５ｏ") == Seq("file", "5ｏ").map(Tokenize.normalizeString))
    // apostrophes stay inside UAX#29 words
    assert(Tokenize.uax29Tokens("don't stop") == Seq("don't", "stop"))
  }

  test("uax29 differential: CJK segmentation pinned to the reference " +
       "library's strict-UAX#29 output (bm25_index.go:158-166)") {
    // Han and Hiragana have no word-join rule (WB999: one segment per
    // ideograph); Katakana joins (WB13); Hangul syllables are ALetter.
    // Expected arrays are the uax29 reference library's segmentation.
    assert(Tokenize.uax29Tokens("日本語のテスト") ==
      Seq("日", "本", "語", "の", "テスト"))
    assert(Tokenize.uax29Tokens("spark処理エンジン") ==
      Seq("spark", "処", "理", "エンジン"))
    assert(Tokenize.uax29Tokens("한국어 형태소") ==
      Seq("한국어", "형태소"))
    assert(Tokenize.uax29Tokens("１２３四五六 abc１２３") ==
      Seq("123", "四", "五", "六", "abc123"))
  }

  test("uax29 differential: NFKC folds pinned (fullwidth, ligatures, " +
       "compatibility forms — bm25_index.go:154-156)") {
    assert(Tokenize.uax29Tokens("ｈｅｌｌｏ ＷＯＲＬＤ ﬁｎａｌ") ==
      Seq("hello", "world", "final"))
    // ½ → 1⁄2 (fraction slash is not MidNum → split), ㎞ → km, Ⅻ → xii
    assert(Tokenize.uax29Tokens("½ ㎞ Ⅻ ﬀ") == Seq("1", "2", "km", "xii", "ff"))
  }

  test("uax29 differential: mid-word punctuation classes pinned " +
       "(MidNumLet/MidNum keep; trailing stop drops)") {
    assert(Tokenize.uax29Tokens("don't stop 3.14 a.b.c e.g.") ==
      Seq("don't", "stop", "3.14", "a.b.c", "e.g"))
    assert(Tokenize.uax29Tokens("Müller-Lüdenscheidt naïve café") ==
      Seq("müller", "lüdenscheidt", "naïve", "café"))
  }

  test("search edges: empty, punctuation-only, and out-of-vocabulary " +
       "queries return empty; ties break by id asc " +
       "(bm25_index_search_test.go edge enumeration)") {
    val s = spark
    import s.implicits._
    val corpus = BM25.build(Seq(
      (1L, "spark join"), (2L, "spark join"), (3L, "scan filter")
    ).toDF("id", "text"))
    assert(corpus.search("", 10).count() == 0)
    assert(corpus.search("!!! ...", 10).count() == 0)
    assert(corpus.search("zzz unknownterm", 10).count() == 0)
    // docs 1 and 2 are identical -> identical scores -> id asc order
    val tied = corpus.search("spark join", 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(tied.map(_._1).take(2).toSeq == Seq(1L, 2L))
    assert(tied(0)._2 == tied(1)._2)
    // k truncates AFTER scoring: k=1 returns the best of the tie by id
    val top1 = corpus.search("spark join", 1).collect()
    assert(top1.length == 1 && top1.head.getLong(0) == 1L)
    // k <= 0 returns every match (limiter.go:12-17)
    assert(corpus.search("spark join", 0).count() == 2)
    // a query mixing known and unknown terms scores only the known part
    assert(corpus.search("spark zzz", 10).collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L))
  }

  test("model-based incremental soak: random add/delete sequences always " +
       "equal a fresh build over the surviving docs (bm25_index.go:204-334 " +
       "incremental stats)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(771)
    val vocab = Seq("spark", "query", "join", "table", "scan", "filter",
      "merge", "batch", "stream", "index")
    def text(): String =
      (0 until 3 + rnd.nextInt(6)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    val model = scala.collection.mutable.Map.empty[Long, String]
    var corpus = {
      val init = (0L until 6L).map(i => (i, text()))
      init.foreach { case (i, t) => model(i) = t }
      BM25.build(init.toDF("id", "text"))
    }
    (0 until 8).foreach { step =>
      if (rnd.nextBoolean() || model.size < 3) {
        // add a batch of NEW ids (incremental add contract: unseen ids)
        val base = model.keys.max + 1
        val batch = (0 until 1 + rnd.nextInt(3)).map(j => (base + j, text()))
        batch.foreach { case (i, t) => model(i) = t }
        corpus = BM25.add(corpus, batch.toDF("id", "text"))
      } else {
        val victims = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(2))
        victims.foreach(model.remove)
        corpus = BM25.delete(corpus, victims.toDF("id"))
      }
      val fresh = BM25.build(model.toSeq.toDF("id", "text"))
      val q = "spark join stream"
      val got = corpus.search(q, 100).collect()
        .map(r => r.getLong(0) -> BigDecimal(r.getDouble(1)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP)).toMap
      val want = fresh.search(q, 100).collect()
        .map(r => r.getLong(0) -> BigDecimal(r.getDouble(1)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP)).toMap
      assert(got == want, s"diverged from fresh build at step $step")
    }
  }

  test("simple tokenizer equals uax29 on ascii space-separated text") {
    val s = spark
    import s.implicits._
    val txt = "spark query join table scan filter"
    val df = Seq(txt).toDF("t")
    val simple = df.select(Tokenize.simple(org.apache.spark.sql.functions.col("t")))
      .head().getSeq[String](0)
    assert(simple == Tokenize.uax29Tokens(txt))
  }

  test("incremental add/delete equal fresh builds (bm25_index.go:204-400)") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the lazy dog sleeps"),
      (3L, "quick brown rabbits run the forest"),
      (4L, "a fox in the forest sleeps"),
      (5L, "dogs and rabbits jump")
    ).toDF("id", "text")
    def top(c: graft.text.BM25Corpus) = c.search("quick fox forest", 5)
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e4))).toSeq

    val incr = BM25.add(BM25.build(docs.filter($"id" <= 2)),
      docs.filter($"id" > 2))
    assert(top(incr) == top(BM25.build(docs)))

    val del = BM25.delete(BM25.build(docs), Seq(2L, 5L).toDF("id"))
    assert(top(del) == top(BM25.build(docs.filter($"id" =!= 2L && $"id" =!= 5L))))
  }

  test("upsert replaces an existing doc: n_docs flat, old tokens gone, " +
       "new tokens score (bm25_index_test.go:131-156)") {
    val s = spark
    import s.implicits._
    val base = BM25.build(Seq(
      (1L, "original text"),
      (2L, "the lazy dog sleeps")).toDF("id", "text"))
    val up = BM25.upsert(base,
      Seq((1L, "updated text with more content")).toDF("id", "text"))
    // numDocs stays 1-per-id: still 2 docs
    assert(up.stats.head().getDouble(0) == 2.0)
    // the old tokens vanish; the new ones hit
    assert(up.search("original", 10).collect().isEmpty)
    val hits = up.search("updated content", 10).collect()
    assert(hits.map(_.getLong(0)).toSeq == Seq(1L))
    // score-identical to a fresh build over the final corpus
    def top(c: graft.text.BM25Corpus) = c.search("updated text dog", 10)
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e4))).toSeq
    val fresh = BM25.build(Seq(
      (1L, "updated text with more content"),
      (2L, "the lazy dog sleeps")).toDF("id", "text"))
    assert(top(up) == top(fresh))
  }

  test("upsert of a brand-new id degenerates to a plain add") {
    val s = spark
    import s.implicits._
    val base = BM25.build(Seq((1L, "the quick brown fox")).toDF("id", "text"))
    val up = BM25.upsert(base, Seq((9L, "lazy dog")).toDF("id", "text"))
    assert(up.stats.head().getDouble(0) == 2.0)
    assert(up.search("lazy", 10).collect().map(_.getLong(0)).toSeq == Seq(9L))
    // mixed batch: one replace + one insert in a single upsert
    val mixed = BM25.upsert(up, Seq(
      (1L, "silver fox"), (3L, "brown bear")).toDF("id", "text"))
    assert(mixed.stats.head().getDouble(0) == 3.0)
    assert(mixed.search("quick", 10).collect().isEmpty) // old text of 1 gone
    assert(mixed.search("fox", 10).collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(mixed.search("bear", 10).collect().map(_.getLong(0)).toSeq == Seq(3L))
  }
}
