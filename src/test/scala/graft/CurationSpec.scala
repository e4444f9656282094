package graft

import graft.pipeline.Curation
import org.apache.spark.sql.functions._

/** Corpus-curation operators: deterministic sampling, decontamination,
  * cleaning, sequence packing. */
class CurationSpec extends SparkSpec {

  private lazy val docs = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again", "web"),
      (1L, "a completely different set of words lives here today", "web"),
      (2L, "the quick brown fox jumps over the lazy dog again and again", "wiki"),
      (3L, "spark shuffles partition data across executors with hash keys", "wiki"),
      (4L, "of to in is that with for on", "web")
    ).toDF("doc_id", "text", "source")
  }

  test("sampleMix: rate 1.0 keeps everything, 0.0 keeps nothing, deterministic") {
    assert(Curation.sampleMix(docs, "doc_id", "source",
      Map.empty, defaultRate = 1.0).count() == 5)
    assert(Curation.sampleMix(docs, "doc_id", "source",
      Map("web" -> 0.0, "wiki" -> 0.0)).count() == 0)
    val r1 = Curation.sampleMix(docs, "doc_id", "source", Map("web" -> 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val r2 = Curation.sampleMix(docs, "doc_id", "source", Map("web" -> 0.5))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(r1 == r2) // hash-of-id sampling is reproducible
    assert(Curation.sampleMix(docs, "doc_id", "source", Map("web" -> 0.0))
      .select("source").collect().forall(_.getString(0) == "wiki"))
  }

  test("decontaminate: identical doc collides on every 8-gram, disjoint docs never") {
    val train = docs.filter(col("doc_id").isin(0, 1, 3))
    val eval_ = docs.filter(col("doc_id") === 2) // duplicate of train doc 0
    val hits = Curation.decontaminate(train, eval_, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hits.toSeq == Seq((0L, 2L, 5L))) // 12 tokens -> 5 distinct 8-grams
  }

  test("importanceWeights (DSIR): docs matching the target distribution " +
       "outscore off-target docs, zero-token docs score 0, and the " +
       "decimal-accumulated sum is run-to-run identical") {
    val s = spark
    import s.implicits._
    val raw = Seq(
      (1L, "physics quantum relativity tensor gauge"),     // target-like
      (2L, "celebrity gossip fashion scandal party"),      // off-target
      (3L, "physics gossip quantum fashion"),              // mixed
      (4L, "")                                             // token-less
    ).toDF("doc_id", "text")
    val target = Seq(
      (100L, "physics quantum relativity tensor gauge boson lattice"),
      (101L, "quantum tensor gauge physics entanglement"))
      .toDF("doc_id", "text")
    def run() = Curation.importanceWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val w = run()
    assert(w(1L)._2 > w(3L)._2 && w(3L)._2 > w(2L)._2,
      s"importance ordering broken: $w")
    assert(w(1L)._2 > 0 && w(2L)._2 < 0,
      "target-like must score positive, off-target negative")
    assert(w(4L) == ((0L, 0.0)))
    assert(w(1L)._1 == 5L && w(3L)._1 == 4L)
    assert(run() == w, "importance weights not deterministic")
  }

  test("importanceResample (Gumbel top-k): a dominant log-weight always " +
       "wins, selection is deterministic, and the key matches the " +
       "hand-computed hash-Gumbel formula") {
    val s = spark
    import s.implicits._
    // Gumbel noise from 32-bit hash uniforms is bounded in ~(-3.2, 22.4),
    // so a +100 log-weight can never be displaced
    val w = ((1L to 100L).map(i => (i, 0.0)) :+ (999L, 100.0))
      .toDF("id", "log_weight")
    def run() = Curation.importanceResample(w, "id", "log_weight", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val top = run()
    assert(top.length == 10)
    assert(top.head._1 == 999L, s"dominant weight displaced: ${top.toSeq}")
    assert(top.map(_._2).toSeq == top.map(_._2).sortBy(-_).toSeq)
    assert(run().toSeq == top.toSeq, "resample not deterministic")
    // hand-computed key for id 5: md5("5") first 8 hex chars -> uniform
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest("5".getBytes("UTF-8"))
    val h = java.lang.Long.parseLong(
      dig.take(4).map(b => f"$b%02x").mkString, 16)
    val expect = 0.0 - math.log(-math.log((h + 0.5) / 4294967296.0))
    val got = Curation.importanceResample(w, "id", "log_weight", 101)
      .collect().find(_.getLong(0) == 5L).get.getDouble(2)
    assert(math.abs(got - expect) < 1e-12, s"key $got != $expect")
  }

  test("clean: stopwords and short tokens dropped, all-stopword doc empties") {
    val res = Curation.clean(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(res(4L) == 0L) // doc 4 is pure stopwords
    val row1 = Curation.clean(docs.filter(col("doc_id") === 1), "doc_id", "text")
      .head()
    assert(row1.getLong(1) == 9 && row1.getLong(2) == 7) // drops "a" and "of"
  }

  test("vocab: df counts docs once per term, tf counts occurrences, " +
       "top-K ties break on term asc") {
    val v = Curation.vocab(docs, "doc_id", "text", topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // every df=2 term ties at the top; term-asc tie-break pins the slice
    assert(v.map(_._1).toSeq == Seq("again", "and", "brown"))
    assert(v.forall(_._2 == 2L))
    // 'the' appears in docs 0, 2 (twice each) — df=2, tf=4
    val the = Curation.vocab(docs, "doc_id", "text", topK = 100)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .find(_._1 == "the").get
    assert(the == (("the", 2L, 4L)))
    // 'again' df=2 (docs 0, 2), tf=4
    assert(Curation.vocab(docs, "doc_id", "text", 100).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .find(_._1 == "again").get == (("again", 2L, 4L)))
    assert(v.length == 3)
  }

  test("selectByBudget: greedy best-first, the crossing doc is kept, " +
       "zero budget keeps nothing") {
    val s = spark
    import s.implicits._
    // ord ranks 3 > 2 > 1; token counts 4, 3, 2
    val d = Seq(
      (1L, "one two", 1.0), (2L, "one two three", 2.0),
      (3L, "one two three four", 3.0)).toDF("id", "text", "score")
    def kept(b: Long) = Curation.selectByBudget(d, "id", "text", "score", b)
      .collect().map(_.getLong(0)).toSet
    assert(kept(0L) == Set.empty)        // nothing before the walk starts
    assert(kept(1L) == Set(3L))          // first doc crosses, still kept
    assert(kept(4L) == Set(3L))          // budget exactly consumed
    assert(kept(5L) == Set(3L, 2L))      // next doc starts inside budget
    assert(kept(100L) == Set(1L, 2L, 3L))
  }

  test("splitHash: buckets cover every doc, deterministic, remainder " +
       "falls to the last split; weights > 100 rejected") {
    val s = spark
    import s.implicits._
    val many = (0L until 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val split = Curation.splitHash(many, "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 500)
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > counts("val")) // 80% dwarfs 10%
    // deterministic across invocations
    val again = Curation.splitHash(many, "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == counts)
    // short weights: remainder lands in the last named split
    val two = Curation.splitHash(many, "doc_id", Seq("a" -> 50, "b" -> 30))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(two.values.sum == 500 && two.keySet == Set("a", "b"))
    intercept[IllegalArgumentException] {
      Curation.splitHash(many, "doc_id", Seq("a" -> 90, "b" -> 20))
    }
  }

  test("packSequences: duplicate ids still conserve tokens (ROWS frame, not RANGE)") {
    val dup = docs.union(docs.filter(col("doc_id") === 0))
    val packed = Curation.packSequences(dup, "doc_id", "text", 20).collect()
    val totalToks = packed.map(_.getLong(2)).sum
    val expect = dup.select(
      sum(size(graft.text.Tokenize.simple(col("text"))))).head().getLong(0)
    // a RANGE frame would double-count peer rows' tokens into both
    // prefixes and can skip bins entirely
    assert(packed.map(_.getLong(1)).sum == 6)
    assert(totalToks == expect)
  }

  test("selectByBudget sharded: budget applies per shard and equals the " +
       "unsharded walk run on each shard alone") {
    val docsWithLen = docs.withColumn("n_chars", length(col("text")))
    val perShard = Seq("web", "wiki").flatMap { src =>
      Curation.selectByBudget(
        docsWithLen.filter(col("source") === src),
        "doc_id", "text", "n_chars", budget = 30L)
        .collect().map(r => (src, r.getLong(0)))
    }.toSet
    val shardedLen = Curation.selectByBudget(docsWithLen, "doc_id", "text",
        "n_chars", budget = 30L, shardCol = Some("source"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(shardedLen == perShard)
    assert(shardedLen.nonEmpty)
  }

  test("sharded windows hash-partition on the shard key; unsharded form " +
       "is the single-partition exchange (100 TB plan shape)") {
    val docsWithLen = docs.withColumn("n_chars", length(col("text")))
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    val shardedPlan = plan(Curation.selectByBudget(docsWithLen, "doc_id",
      "text", "n_chars", 30L, shardCol = Some("source")))
    assert(shardedPlan.contains("hashpartitioning(shard"))
    assert(!shardedPlan.contains("SinglePartition"))
    val globalPlan = plan(Curation.selectByBudget(docsWithLen, "doc_id",
      "text", "n_chars", 30L))
    assert(globalPlan.contains("SinglePartition"))
    val packPlan = plan(Curation.packSequences(docs, "doc_id", "text", 20,
      shardCol = Some("source")))
    assert(packPlan.contains("hashpartitioning(shard"))
  }

  test("packSequences sharded: each shard packs independently, conserving " +
       "its own docs and tokens; seq ids restart per shard") {
    val packed = Curation.packSequences(docs, "doc_id", "text", 20,
        shardCol = Some("source"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byShard = packed.groupBy(_._1)
    // every shard restarts at seq_id 0
    assert(byShard.values.forall(_.exists(_._2 == 0L)))
    // per-shard doc + token conservation against a direct count
    for (src <- Seq("web", "wiki")) {
      val rows = byShard(src)
      val expectDocs = docs.filter(col("source") === src).count()
      val expectTok = docs.filter(col("source") === src)
        .select(sum(size(graft.text.Tokenize.simple(col("text")))))
        .head().getLong(0)
      assert(rows.map(_._3).sum == expectDocs)
      assert(rows.map(_._4).sum == expectTok)
    }
  }

  test("packSequences: conserves docs and tokens, bins by exclusive cumsum") {
    val packed = Curation.packSequences(docs, "doc_id", "text", 20)
      .orderBy("seq_id").collect()
    val totalDocs = packed.map(_.getLong(1)).sum
    val totalToks = packed.map(_.getLong(2)).sum
    assert(totalDocs == 5)
    val expectTok = docs.select(
      sum(size(graft.text.Tokenize.simple(col("text"))))).head().getLong(0)
    assert(totalToks == expectTok)
    // doc 0 has 12 tokens -> starts seq 0; doc 1 starts at cum 12 -> seq 0
    assert(packed.head.getLong(3) == 0L) // first_doc of seq 0
  }

  test("curriculum: equal-frequency tiers in (score desc, id) order; " +
       "earlier tiers get the remainder rows; sharded form tiers per shard") {
    val s = spark
    import s.implicits._
    val scored = (0L until 10L).map(i => (i, (10 - i) * 0.1, if (i < 6) "a" else "b"))
      .toDF("id", "q", "src")
    val r = Curation.curriculum(scored, "id", "q", buckets = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    // scores descend with id: ids 0-3 tier 1 (remainder), 4-6 tier 2, 7-9 tier 3
    assert(r == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 2L, 5L -> 2L, 6L -> 2L, 7L -> 3L, 8L -> 3L, 9L -> 3L))
    // equal scores: ties ordered by id, so the assignment is deterministic
    val tied = Seq((5L, 1.0), (1L, 1.0), (3L, 1.0), (9L, 1.0)).toDF("id", "q")
    val t = Curation.curriculum(tied, "id", "q", buckets = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(t == Map(1L -> 1L, 3L -> 1L, 5L -> 2L, 9L -> 2L))
    // sharded: each shard tiers independently over its own rows
    val sh = Curation.curriculum(scored, "id", "q", buckets = 2,
        shardCol = Some("src"))
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getLong(3)).toMap
    assert(sh(("a", 0L)) == 1L && sh(("a", 2L)) == 1L && sh(("a", 5L)) == 2L)
    assert(sh(("b", 6L)) == 1L && sh(("b", 9L)) == 2L)
  }

  test("temperatureWeights: alpha=0.5 upsamples the smaller source, " +
       "alpha=1 recovers natural shares (boost exactly 1)") {
    // web = docs 0,1,4 (12+9+8 = 29 tokens); wiki = docs 2,3 (12+9 = 21)
    val w = Curation.temperatureWeights(docs, "source", "text", alpha = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(w("web")._1 == 3L && w("web")._2 == 29L)
    assert(w("wiki")._1 == 2L && w("wiki")._2 == 21L)
    // hand-computed: sqrt(29)/(sqrt(29)+sqrt(21)) = 0.540259…
    assert(math.abs(w("web")._3 - 0.540259) < 1e-6)
    assert(math.abs(w("web")._3 + w("wiki")._3 - 1.0) < 2e-6)
    // smoothing pulls toward uniform: the minority source is boosted > 1,
    // the majority damped < 1
    assert(w("wiki")._4 > 1.0 && w("web")._4 < 1.0)
    // alpha = 1: weight == natural share, boost is exactly 1 after rounding
    val nat = Curation.temperatureWeights(docs, "source", "text", alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(nat.values.forall(_ == 1.0))
    // alpha -> 0 tends to uniform regardless of size
    val uni = Curation.temperatureWeights(docs, "source", "text", alpha = 0.0)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(uni.values.forall(v => math.abs(v - 0.5) < 1e-9))
  }

  test("decontaminate hot-gram salting: an 8-gram present in every train " +
       "doc AND the eval set, salted, gives shared-counts IDENTICAL to " +
       "the unsalted join") {
    val s = spark
    import s.implicits._
    val boiler = "one two three four five six seven eight" // one hot 8-gram
    val train = (0L until 10L).map(i =>
      (i, s"$boiler t${i}a t${i}b t${i}c t${i}d t${i}e t${i}f t${i}g"))
      .toDF("doc_id", "text")
    // eval doc 100 shares only the boilerplate; 101 shares doc 3's tail
    val eval_ = Seq(
      (100L, s"$boiler nothing else in common"),
      (101L, s"$boiler t3a t3b t3c t3d t3e t3f t3g"))
      .toDF("doc_id", "text")
    def run(sha: Long) =
      Curation.decontaminate(train, eval_, "doc_id", "text", 8,
          saltHotAbove = sha, salts = 4, saltSampleFraction = 1.0)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val unsalted = run(0L)
    val salted = run(3L) // boilerplate gram df=10 > 3 -> hot path
    assert(salted == unsalted,
      s"salted diverged: extra=${salted.keySet -- unsalted.keySet} " +
        s"missing=${unsalted.keySet -- salted.keySet} " +
        salted.collect { case (k, v) if unsalted.get(k) != Some(v) =>
          s"$k: $v vs ${unsalted.get(k)}" }.mkString(","))
    // every train doc hits eval 100 on exactly the boilerplate gram
    (0L until 10L).foreach(i => assert(unsalted((i, 100L)) == 1L))
    // doc 3 hits eval 101 on the boilerplate + its whole tail
    assert(unsalted((3L, 101L)) > unsalted((3L, 100L)))
  }

  test("temperatureWeights: a zero-token source gets weight 0 at EVERY " +
       "alpha — including alpha = 0, where pow(0, 0) = 1 would otherwise " +
       "hand the dead source a full uniform share") {
    val s = spark
    import s.implicits._
    val withDead = docs.select(col("doc_id"), col("text"), col("source"))
      .unionByName(Seq((99L, "", "dead")).toDF("doc_id", "text", "source"))
    for (alpha <- Seq(0.0, 0.5, 1.0)) {
      val w = Curation.temperatureWeights(withDead, "source", "text", alpha)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(3), r.getDouble(4))).toMap
      assert(w("dead") == ((0.0, 0.0)),
        s"alpha=$alpha: dead source sampled with ${w("dead")}")
      // live weights still sum to 1 (the dead source is excluded from the
      // normalization, not smeared across it)
      val live = w("web")._1 + w("wiki")._1
      assert(math.abs(live - 1.0) < 2e-6, s"alpha=$alpha: live sum $live")
    }
    // all-zero-token corpus keeps the documented uniform fallback
    val allDead = Seq((1L, "", "a"), (2L, "", "b")).toDF("doc_id", "text", "source")
    val u = Curation.temperatureWeights(allDead, "source", "text", alpha = 0.0)
      .collect().map(_.getDouble(3))
    assert(u.forall(v => math.abs(v - 0.5) < 1e-9))
  }
}
