package graft.pipeline

import graft.text.Tokenize
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines — the steps that
  * sit between raw documents and a training run: source mixing by sampling
  * rate, benchmark decontamination, cleaning, and sequence packing. All
  * deterministic (hash-based sampling, no RNG) so every operator has an
  * exact SQL oracle, and all shuffle-on-a-key shapes that survive 100 TB.
  */
object Curation {

  /** Deterministic per-source sampling: keep a document iff
    * `md5(doc_id) mod 100 < rate(source)·100`. The hash is on the DOC ID,
    * not content, so the decision is independent of text edits and stable
    * across runs — re-sampling a grown corpus keeps previously-kept docs.
    * At scale this is a stateless filter (no shuffle); the rate map
    * broadcasts as a CASE expression. */
  def sampleMix(docs: DataFrame, idCol: String, sourceCol: String,
                rates: Map[String, Double],
                defaultRate: Double = 1.0): DataFrame = {
    val bucket = Dedup.md5Hash32(col(idCol).cast("string")) % 100
    // integer percent threshold: comparing the integer bucket against
    // rate*100 as a DOUBLE keeps an extra bucket whenever the product
    // rounds up (0.07*100 = 7.000000000000001 keeps 8%), diverging from
    // the DECIMAL arithmetic of the SQL oracle
    def pct(r: Double): Long = math.round(r * 100)
    val threshold = rates.foldLeft(lit(pct(defaultRate))) {
      case (acc, (src, r)) => when(col(sourceCol) === src, lit(pct(r))).otherwise(acc)
    }
    docs.filter(bucket < threshold)
  }

  /** Benchmark decontamination: surface every (train doc, eval doc) pair
    * sharing at least one word n-gram — the overlap check a training
    * pipeline runs against held-out benchmarks before training. Postings
    * equi-join on the shingle (never an all-pairs product): explode
    * distinct n-grams of both sides, join on the gram, count matches per
    * pair. The eval side is normally tiny and broadcasts.
    *
    * HOT-GRAM SALTING (`saltHotAbove > 0`): a boilerplate gram present in
    * a large fraction of the TRAIN corpus puts its whole posting list on
    * one join key — if the eval side also carries it, that key's matches
    * execute in one task. With salting, train postings of hot grams
    * (train-df above the threshold) hash their doc id into one of `salts`
    * sub-keys and the (tiny) eval side replicates across all of them, so
    * every (train, eval) match still occurs exactly once and per-task
    * fan-out drops by `salts`. Cold grams take the plain join; results
    * are row-identical. Opt-in (0 disables) — it costs one df
    * aggregation over the train postings. */
  def decontaminate(train: DataFrame, eval_ : DataFrame,
                    idCol: String, textCol: String,
                    n: Int = 8,
                    saltHotAbove: Long = 0L, salts: Int = 16,
                    saltSampleFraction: Double = 0.01): DataFrame = {
    def posting(df: DataFrame, as: String): DataFrame =
      df.select(col(idCol).cast("long").as(as),
          explode(graft.expr.TextShingles(col(textCol), n)).as("s"))
    val tp = posting(train, "train_id")
    val ep = posting(eval_, "eval_id")
    val matched: DataFrame =
      if (saltHotAbove <= 0L) tp.join(ep, "s")
      else {
        // sampled hot-gram detection (see Dedup.jaccardPairs): count on
        // a deterministic fraction of train docs and scale — reliable
        // for genuinely hot grams at a fraction of the full
        // aggregation's cost, and boundary noise only shifts keys
        // between two result-identical plans. Pass 1.0 for exact
        // detection on small inputs.
        val buckets = 10000
        val keep = math.max(1L, math.round(saltSampleFraction * buckets))
        val hot = tp
          .filter(pmod(hash(col("train_id")), lit(buckets)) < keep)
          .groupBy(col("s")).agg(count(lit(1)).as("gdf"))
          .filter(col("gdf") * buckets > saltHotAbove * keep)
          .select(col("s"), lit(true).as("_hot"))
        // ONE conditionally-salted join (cold keys ride salt 0 on both
        // sides) — a cold/hot union would re-explode the shingle
        // projection once per branch per side; see Dedup.jaccardPairs
        val tS = tp.join(broadcast(hot), Seq("s"), "left")
          .withColumn("salt",
            when(col("_hot") === true, pmod(hash(col("train_id")), lit(salts)))
              .otherwise(lit(0))).drop("_hot")
        val eS = ep.join(broadcast(hot), Seq("s"), "left")
          .withColumn("salt",
            explode(when(col("_hot") === true,
              sequence(lit(0), lit(salts - 1))).otherwise(array(lit(0)))))
          .drop("_hot")
        tS.join(eS, Seq("s", "salt")).drop("salt")
      }
    matched
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("shared"))
  }

  /** Data-selection importance weights, DSIR-style (published: Data
    * Selection with Importance Resampling — estimate hashed-n-gram
    * language models over a TARGET corpus and the RAW pool, and score
    * every raw document by its log importance ratio
    * `Σ_tokens ln(p_target(bucket) / p_raw(bucket))`; high scorers look
    * like the target distribution and get sampled into the training
    * mix; Xie et al. 2023). Features are hashed unigram buckets
    * (md5 → `buckets` slots, the portable hash the rest of the engine
    * uses) with add-alpha smoothing, so unseen-in-target buckets score
    * negatively rather than blowing up.
    *
    * Determinism contract: each bucket's log-ratio is rounded to 8 dp
    * and accumulated in DECIMAL(28,8) — associative, partition-order
    * free, engine-exact (the q_events_window lesson: never hash-compare
    * an order-dependent double sum) — then surfaced as a double.
    *
    * Scale shape: two map-side-combinable bucket-count aggregations
    * (feature table bounded by `buckets`, not the corpus), a broadcast
    * join of the tiny ratio table against the exploded raw tokens, and
    * one keyed per-doc aggregation. Zero-token docs score 0. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        idCol: String, textCol: String,
                        buckets: Int = 4096,
                        alpha: Double = 0.5): DataFrame = {
    require(buckets > 0 && alpha > 0.0, "buckets and alpha must be positive")
    val bucketOf = (t: Column) => pmod(Dedup.md5Hash32(t), lit(buckets))
    // tokenize+hash is the CPU-heavy stage; fan byte-small inputs out
    // (no-op at scale — Frames.fanOut doc). Counts are exact integers,
    // so partition assignment cannot move any value.
    def bucketCounts(df: DataFrame): DataFrame =
      graft.core.Frames.fanOut(df, Seq(col(idCol)))
        .select(explode(Tokenize.simple(col(textCol))).as("t"))
        .select(bucketOf(col("t")).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("c"))
    val tC = bucketCounts(target)
    val rC = bucketCounts(raw)
    // corpus token totals as IN-PLAN single-row aggregates (broadcast
    // cross joins), not driver-side head() scalars: the eager form paid
    // two whole-corpus tokenize passes per call BEFORE the query even
    // ran, then re-executed the same bucketCounts subtrees inside the
    // plan (r19 measurement: 0.59 s of eager work per invocation at
    // sf0.1). In one plan, exchange reuse dedupes the shared subtrees.
    // Value-identical: (nt + alpha·buckets) is the same double sum
    // whether nt arrives as a literal or a column (exact while counts
    // stay under 2^53).
    val tTot = tC.agg(coalesce(sum(col("c")), lit(0L)).as("nt"))
    val rTot = rC.agg(coalesce(sum(col("c")), lit(0L)).as("nr"))
    // every bucket a raw token can hit appears in rC (its own count), so
    // the outer join covers the whole support of the scoring sum
    val pT = (coalesce(col("ct"), lit(0L)) + alpha) /
      (col("nt") + alpha * buckets)
    val pR = (coalesce(col("cr"), lit(0L)) + alpha) /
      (col("nr") + alpha * buckets)
    val ratio = tC.select(col("b"), col("c").as("ct"))
      .join(rC.select(col("b"), col("c").as("cr")), Seq("b"), "full_outer")
      .crossJoin(broadcast(tTot))
      .crossJoin(broadcast(rTot))
      .select(col("b"),
        round(log(pT / pR), 8).cast("decimal(28,8)").as("lr"))
    val perDoc = graft.core.Frames.fanOut(raw, Seq(col(idCol)))
      .select(col(idCol).cast("long").as("id"),
        explode(Tokenize.simple(col(textCol))).as("t"))
      .select(col("id"), bucketOf(col("t")).as("b"))
      .join(broadcast(ratio), "b")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lr")).as("lw"))
    raw.select(col(idCol).cast("long").as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("lw").cast("double"), lit(0.0)).as("log_weight"))
  }

  /** DSIR's RESAMPLING step, completing [[importanceWeights]]: select `n`
    * documents with probability proportional to `exp(log_weight)` via the
    * Gumbel top-k trick (adding independent Gumbel noise to each log
    * weight and taking the top n is exactly sampling-without-replacement
    * from the softmax — the standard derivation the DSIR paper's
    * resampling relies on). The "noise" here is DETERMINISTIC:
    * `u = (md5(id) + 0.5) / 2^32`, `g = -ln(-ln(u))` — stable across
    * runs, engines, and corpus growth (the same stable-sampling contract
    * as [[sampleMix]] / [[splitHash]]), so the selection is reproducible
    * and SQL-oracle-able while keeping the correct softmax marginals
    * across id space.
    *
    * Scale shape: one stateless projection + `TakeOrderedAndProject`
    * (per-partition heaps, driver merge of n rows) — no shuffle of the
    * corpus, no RNG state. */
  def importanceResample(weights: DataFrame, idCol: String,
                         weightCol: String, n: Int): DataFrame = {
    val u = (Dedup.md5Hash32(col(idCol).cast("string")) + 0.5) /
      4294967296.0
    weights.select(col(idCol).cast("long").as("id"),
        col(weightCol).cast("double").as("log_weight"))
      .withColumn("gumbel_key",
        col("log_weight") - log(-log(u)))
      .orderBy(col("gumbel_key").desc, col("id"))
      .limit(n)
  }

  /** Training-text cleaning: drop stopwords and single-character tokens,
    * report kept counts + a fingerprint of the cleaned token stream. Pure
    * per-row column expressions — no shuffle. */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            stopwords: Seq[String] = CleanStopwords): DataFrame = {
    val toks = Tokenize.simple(col(textCol))
    val sw = array(stopwords.map(lit): _*)
    val kept = filter(toks, t =>
      length(t) > 1 && !array_contains(sw, t))
    docs.select(col(idCol),
      size(toks).cast("long").as("n_tokens"),
      size(kept).cast("long").as("n_kept"),
      round(size(kept).cast("double") /
        greatest(size(toks), lit(1)).cast("double"), 4).as("kept_ratio"),
      md5(concat_ws(" ", kept).cast("binary")).as("clean_fp"))
  }

  val CleanStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "that", "with",
      "for", "on")

  /** Vocabulary building: term → document frequency + total term
    * frequency, the table a tokenizer-training / feature-hashing pipeline
    * derives from the corpus. One pass: explode tokens → per-(term, doc)
    * tf → per-term (df, tf). Both aggregations are partial-agg
    * (map-side-combinable) shuffles on the term key; the final top-K is
    * TakeOrdered, never a global sort. Ties break on term asc so the
    * result is deterministic. */
  def vocab(docs: DataFrame, idCol: String, textCol: String,
            topK: Int): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
        explode(Tokenize.simple(col(textCol))).as("term"))
      .groupBy(col("term"), col("id"))
      .agg(count(lit(1)).as("tf_doc"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf_doc")).as("tf"))
      .orderBy(col("df").desc, col("term"))
      .limit(topK)

  /** Token-budget corpus selection: walk documents best-first (by
    * `orderCol` desc, id asc) and keep each doc while the budget is not
    * yet exhausted — a doc is kept iff the tokens BEFORE it total less
    * than `budget`, so the doc that crosses the line is kept and
    * selection is greedy, like data-mixture curation under a token
    * target.
    *
    * Scale note: the UNPARTITIONED window (`shardCol = None`) forces every
    * row into ONE partition — Spark's `WindowExec` needs all peer rows
    * together, so the exchange is `SinglePartition` and the walk is a
    * single task. That form exists for the exact-global-greedy oracle and
    * small corpora only. At 100 TB pass `shardCol = Some("source")` (or
    * any mixture key): the window becomes `partitionBy(shard)`, the
    * exchange hash-partitions on the shard key, each shard runs its own
    * budget walk in parallel, and `budget` applies PER SHARD — the
    * per-source token-budget contract a data-mixture pipeline wants. */
  def selectByBudget(docs: DataFrame, idCol: String, textCol: String,
                     orderCol: String, budget: Long,
                     shardCol: Option[String] = None): DataFrame = {
    val base = Window.orderBy(col("ord").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w = shardCol.fold(base)(_ => Window.partitionBy(col("shard"))
      .orderBy(col("ord").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val shardSel = shardCol.map(s => col(s).as("shard")).toSeq
    val outCols = shardCol.map(_ => col("shard")).toSeq ++
      Seq(col("id"), col("ord"), col("n_tok"))
    docs.select(shardSel ++ Seq(col(idCol).cast("long").as("id"),
        col(orderCol).cast("double").as("ord"),
        size(Tokenize.simple(col(textCol))).cast("long").as("n_tok")): _*)
      .withColumn("cum_excl",
        coalesce(sum(col("n_tok")).over(w) - col("n_tok"), lit(0L)))
      .filter(col("cum_excl") < budget)
      .select(outCols: _*)
  }

  /** Temperature-scaled source-mixing weights — the multinomial sampling
    * smoothing multilingual / multi-source training mixes use (sample
    * source i with probability `w_i = p_i^alpha / Σ_j p_j^alpha`, where
    * `p_i` is the source's natural token share; published as exponentiated
    * smoothing in the mBERT / XLM-R / mT5 line of work). `alpha = 1`
    * recovers natural sampling, `alpha → 0` tends to uniform; low-resource
    * sources are upsampled at `alpha < 1`.
    *
    * Output per source: doc count, token count, smoothed weight, and
    * `boost = weight / natural share` (> 1 ⇒ upsampled). One
    * map-side-combinable aggregation on the source key; the normalizing
    * window then runs over #sources rows — the mixture table, tiny by
    * construction, so its single-partition exchange is O(#sources), not
    * O(corpus). `alpha = 0.5` is computed via `sqrt` (correctly rounded
    * IEEE, so bit-identical across engines); other alphas go through
    * `pow`. */
  def temperatureWeights(docs: DataFrame, sourceCol: String,
                         textCol: String, alpha: Double = 0.5): DataFrame = {
    val perSource = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(Tokenize.simple(col(textCol))).cast("long")).as("n_tokens"))
    val all = Window.partitionBy(lit(1))
    val toks = col("n_tokens").cast("double")
    // pow(0, 0) = 1, so at alpha = 0 an unguarded power would hand a
    // zero-token source a full uniform weight; the documented policy is
    // that a dead source is never sampled, so pin its smoothed mass to 0
    // at EVERY alpha (a no-op for alpha > 0, where pow(0, a) = 0).
    val smoothed = when(toks === 0.0, lit(0.0)).otherwise(
      if (alpha == 0.5) sqrt(toks) else pow(toks, lit(alpha)))
    // Degenerate-corpus policy (ANSI mode divides loudly, never silently):
    // an all-zero-token corpus has no defined mixture — fall back to
    // uniform weights (the alpha -> 0 limit); a zero-token source inside a
    // non-degenerate corpus gets weight 0 and boost 0 (never sampled).
    val nSrc = count(lit(1)).over(all).cast("double")
    val totPw = sum(col("pw")).over(all)
    val totToks = sum(toks).over(all)
    perSource
      .withColumn("pw", smoothed)
      .withColumn("share",
        when(totToks === 0.0, lit(1.0) / nSrc).otherwise(toks / totToks))
      .withColumn("w",
        when(totPw === 0.0, lit(1.0) / nSrc).otherwise(col("pw") / totPw))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("w"), 6).as("weight"),
        round(when(col("share") === 0.0, lit(0.0))
          .otherwise(col("w") / col("share")), 6).as("boost"))
  }

  /** Deterministic train/val/test split: md5-bucket of the DOC ID into
    * 100 slots, assigned to named splits by cumulative weight — stable
    * across runs and content edits (same contract as [[sampleMix]]), and
    * a stateless per-row expression (no shuffle, no RNG seed to lose).
    * `weights` are integer percents summing to ≤ 100; any remainder
    * falls to the LAST split. */
  def splitHash(docs: DataFrame, idCol: String,
                weights: Seq[(String, Int)]): DataFrame = {
    require(weights.nonEmpty && weights.map(_._2).sum <= 100,
      "split weights are integer percents summing to <= 100")
    val bucket = Dedup.md5Hash32(col(idCol).cast("string")) % 100
    val cuts = weights.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val expr = weights.zip(cuts).init.foldRight(
      lit(weights.last._1): Column) {
      case (((name, _), cut), acc) => when(bucket < cut, name).otherwise(acc)
    }
    docs.withColumn("split", expr)
  }

  /** Curriculum bucketing: rank documents by a difficulty/quality score
    * and assign each to one of `buckets` equal-frequency tiers
    * (`ntile`) — the data-ordering stage of curriculum training (feed
    * high-quality/easy tiers first, harder tiers later; published as
    * quality/perplexity-bucket curricula). Deterministic: the ranking
    * order is `(score desc, id asc)`, so ties never wobble across runs
    * or engines.
    *
    * Scale note: same window contract as [[selectByBudget]] — the
    * unpartitioned form (`shardCol = None`) is the exact-global-tier
    * oracle shape and moves all rows through one partition; at 100 TB
    * pass `shardCol` (source, language, …) and each shard tiers
    * independently behind a hash-partitioned exchange. */
  def curriculum(docs: DataFrame, idCol: String, scoreCol: String,
                 buckets: Int,
                 shardCol: Option[String] = None): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val order = Seq(col("score").desc, col("id").asc)
    val w = shardCol.fold(Window.orderBy(order: _*))(_ =>
      Window.partitionBy(col("shard")).orderBy(order: _*))
    val shardSel = shardCol.map(s => col(s).as("shard")).toSeq
    val outCols = shardCol.map(_ => col("shard")).toSeq ++
      Seq(col("id"), col("score"), col("bucket"))
    docs.select(shardSel ++ Seq(col(idCol).cast("long").as("id"),
        col(scoreCol).cast("double").as("score")): _*)
      .withColumn("bucket", ntile(buckets).over(w).cast("long"))
      .select(outCols: _*)
  }

  /** GPT-style sequence packing: documents are concatenated in id order
    * and chunked every `budget` tokens; a document belongs to the sequence
    * where it STARTS (`seq_id = floor(exclusive-cumulative-tokens /
    * budget)`). Output is one row per packed sequence with its doc count,
    * token count, and first doc.
    *
    * Scale note: with `shardCol = None` the cumulative sum is a single
    * UNPARTITIONED window — `WindowExec` moves every row into one
    * partition and the whole corpus funnels through a single task; that
    * form mirrors the global-concatenation oracle and is for small
    * corpora. The 100 TB shape is `shardCol = Some(key)` (source, id
    * range, …): the window becomes `partitionBy(shard)`, the exchange
    * hash-partitions on the key, and each shard packs independently —
    * sequence ids are then per-shard. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    budget: Int,
                    shardCol: Option[String] = None): DataFrame = {
    // ROWS frame explicitly: the default RANGE frame sums PEER rows
    // (duplicate ids) into each other's prefix, diverging from the
    // concatenation semantics and the oracle's ROWS UNBOUNDED PRECEDING
    val w = shardCol.fold(Window.orderBy(col("id")))(_ =>
        Window.partitionBy(col("shard")).orderBy(col("id")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val shardSel = shardCol.map(s => col(s).as("shard")).toSeq
    val withTok = docs.select(shardSel ++ Seq(
      col(idCol).cast("long").as("id"),
      size(Tokenize.simple(col(textCol))).cast("long").as("n_tok")): _*)
    val groupCols = shardCol.map(_ => col("shard")).toSeq :+ col("seq_id")
    withTok
      .withColumn("cum_excl",
        coalesce(sum(col("n_tok")).over(w) - col("n_tok"), lit(0L)))
      .withColumn("seq_id", floor(col("cum_excl") / budget))
      .groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        min(col("id")).as("first_doc"))
  }
}
