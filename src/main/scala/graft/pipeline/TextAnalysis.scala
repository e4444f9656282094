package graft.pipeline

import graft.text.Tokenize
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data text analysis operators (beyond the reference's surface;
  * these are the ops a 100 TB LLM-data pipeline runs over a `documents`
  * table). All pure Catalyst expressions — no UDFs, no shuffles except the
  * final aggregations, so they pipeline with the parquet scan.
  */
object TextAnalysis {

  /** Per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Tiny, deterministic, broadcast as literals.
    *
    * Latin-script languages only: [[languageId]] tokenizes with
    * [[Tokenize.simple]] (`[a-z0-9]+` runs), which strips CJK characters,
    * so a Chinese profile could never score a hit. Supporting CJK needs
    * [[Tokenize.Uax29]] plus character-level profiles — add both together,
    * not a dead profile. */
  val StopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with", "for", "on"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "para"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "pour"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "für"))

  def tokens(text: Column): Column = Tokenize.simple(text)

  /** Token counting + type-token ratio. A token-less doc has ttr 0.0 —
    * under ANSI mode an unguarded division would crash the whole pass on
    * the first empty document. */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    docs.select(
      col(idCol),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_terms"),
      when(size(toks) === 0, lit(0.0)).otherwise(
        round(size(array_distinct(toks)).cast("double") / size(toks), 4))
        .as("ttr"))
  }

  /** CJK needs character-level evidence, not `[a-z0-9]` tokens: the top
    * Chinese stopword CHARACTERS, counted directly in the raw text. */
  val ZhStopChars = "的了是我不在有人这他"

  /** [[languageId]] plus a live Chinese profile: latin languages score by
    * stopword-token hits, zh scores by stopword-character occurrences
    * (Unicode-aware without a CJK tokenizer — the fix ADVICE.md asked for
    * instead of the old dead `zh` token profile). Ties resolve to the
    * alphabetically-first language, so zh wins only on strictly more
    * evidence. */
  def languageIdUnicode(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val latin = StopwordProfiles.toSeq.sortBy(_._1).map { case (lang, sw) =>
      struct(
        size(filter(toks, t => t.isin(sw.map(lit): _*))).as("hits"),
        lit(lang).as("lang"))
    }
    val zh = struct(
      regexp_count(col(textCol), lit(s"[$ZhStopChars]")).cast("int").as("hits"),
      lit("zh").as("lang"))
    val best = sort_array(array(latin :+ zh: _*), asc = false)
    val top = element_at(best, 1)
    val winner = element_at(
      filter(best, s => s.getField("hits") === top.getField("hits")), -1)
    docs.select(
      col(idCol),
      when(top.getField("hits") === 0, lit("und"))
        .otherwise(winner.getField("lang")).as("lang_pred"),
      top.getField("hits").cast("long").as("lang_hits"))
  }

  /** Whitespace token count + a BPE-ish subword-unit count: contractions,
    * space-prefixed alnum runs, punctuation runs — the GPT-2-style
    * pre-tokenizer shape, counted (not materialized) so a 100 TB corpus
    * pass is a single projection. */
  val BpePattern = "'(?:s|t|re|ve|m|ll|d)| ?[a-z0-9]+| ?[^a-z0-9'\\s]+"
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      size(filter(split(col(textCol), "\\s+"), t => length(t) > 0))
        .cast("long").as("n_ws"),
      regexp_count(lower(col(textCol)), lit(BpePattern)).cast("long").as("n_bpe"))

  /** Quality scoring: mean word length, stopword ratio, alpha ratio, and a
    * combined [0,1] score (length/punct/stopword heuristics). */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast("double")
    val sw = StopwordProfiles("en")
    val nStop = size(filter(toks, t => t.isin(sw.map(lit): _*))).cast("double")
    // token-less docs score 0 everywhere (ANSI mode: an unguarded /0
    // would crash the pass, pre-ANSI it silently produced NULL rows)
    val meanWordLen = when(nTok === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0.0), (acc, t) => acc + length(t)) / nTok)
    val stopRatio = when(nTok === 0, lit(0.0)).otherwise(nStop / nTok)
    // clamp-to-[0,1] band scores, weighted like common quality classifiers
    val lenScore = least(nTok / 100.0, lit(1.0))
    val swScore = least(stopRatio * 5.0, lit(1.0))
    docs.select(
      col(idCol),
      round(meanWordLen, 4).as("mean_word_len"),
      round(stopRatio, 4).as("stopword_ratio"),
      round(lenScore * 0.5 + swScore * 0.5, 4).as("quality"))
  }

  /** Language ID by stopword-profile overlap: score(lang) = count of tokens
    * in lang's stopword list; argmax with deterministic tie-break on lang
    * code, 'und' when nothing matches. */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val scores = StopwordProfiles.toSeq.sortBy(_._1).map { case (lang, sw) =>
      struct(
        size(filter(toks, t => t.isin(sw.map(lit): _*))).as("hits"),
        lit(lang).as("lang"))
    }
    // argmax by (hits desc, lang asc): sort the struct array and take last;
    // struct compare is (hits, lang) lexicographic, so invert lang by
    // taking max hits then min lang among maxima via array_sort + reverse
    val best = sort_array(array(scores: _*), asc = false)
    val top = element_at(best, 1)
    // among equal hits, sort_array desc gives the LAST lang alphabetically;
    // re-scan for the first lang with the same hit count
    val winner = element_at(
      filter(best, s => s.getField("hits") === top.getField("hits")), -1)
    docs.select(
      col(idCol),
      when(top.getField("hits") === 0, lit("und"))
        .otherwise(winner.getField("lang")).as("lang_pred"),
      top.getField("hits").cast("long").as("lang_hits"))
  }

  /** Document fingerprint: md5 over the sorted distinct token set —
    * deterministic, order-invariant content signature. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      md5(concat_ws(" ", array_sort(array_distinct(tokens(col(textCol)))))
        .cast("binary")).as("fingerprint"))

  /** Repetition signals — the MassiveText/Gopher quality-rule family: a
    * doc whose bigrams mostly repeat, or whose single most frequent token
    * dominates, is boilerplate/spam. Emits per doc:
    * `dup_bigram_ratio` = 1 − distinct/total bigrams, and
    * `top_token_ratio` = max token count / total tokens.
    * The bigram leg is a pure per-row expression; the token leg is one
    * partial-agg shuffle on (id, token) then (id) — both 100 TB shapes. */
  def repetition(docs: DataFrame, idCol: String,
                 textCol: String): DataFrame =
    repetitionRaw(docs, idCol, textCol)
      .select(col("id"), col("n_bigrams"),
        round(col("dup_bigram_ratio"), 4).as("dup_bigram_ratio"),
        round(col("top_token_ratio"), 4).as("top_token_ratio"))

  /** [[repetition]] without the display rounding — both ratios are exact
    * integer quotients (one IEEE division, bit-identical across engines),
    * so any THRESHOLD comparison must run on these, not on a rounded
    * value whose half-way cases Spark (shortest-decimal HALF_UP) and
    * other engines (binary-value rounding) legitimately disagree on.
    *
    * Shape (r19 optimization): ONE per-row projection off the scan via
    * the [[graft.expr.TextSignals]] kernel — the cheapest possible
    * 100 TB form. The previous formulation paid an interpreted
    * per-bigram HOF that re-tokenized the document per element
    * (O(tokens²), 1.6 s alone at sf0.1) plus an explode + two keyed
    * aggregations + a join back for the top-token leg (two shuffles for
    * a per-row value). Values are bit-identical: every signal is an
    * exact integer count or one IEEE division of exact integers. */
  def repetitionRaw(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    // project the kernel STRUCT once, then extract fields in a second
    // projection (r20): per-field `sig.getField(...)` repeats the kernel
    // expression once per emitted column and leaves single evaluation to
    // runtime subexpression elimination; the two-step form pins ONE
    // kernel call per row in the plan itself (CollapseProject refuses to
    // inline a non-cheap expression referenced more than once)
    val sig = graft.expr.TextSignals(col(textCol), GopherStopwords)
    docs.select(col(idCol).cast("long").as("id"), sig.as("_sig"))
      .select(col("id"),
        col("_sig.n_bigrams").as("n_bigrams"),
        col("_sig.dup_bigram_ratio").as("dup_bigram_ratio"),
        col("_sig.top_token_ratio").as("top_token_ratio"))
  }

  /** The Gopher-rule stopword list (Rae et al. 2021, appendix A1.1: "must
    * contain at least two of"). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher/MassiveText document-level quality FILTER — the published
    * keep/drop decision layer over the per-doc signals (Rae et al. 2021,
    * appendix A1.1): word-count band, mean-word-length band, minimum
    * alphabetic-word ratio, minimum stopword evidence, and the repetition
    * caps from [[repetition]]. Emits every signal, a per-rule pass flag,
    * and the conjunction `keep` — pipelines keep the flags so drop
    * reasons are auditable.
    *
    * The WHOLE filter is one per-row projection off the scan (r19
    * optimization: the [[graft.expr.TextSignals]] kernel computes every
    * signal in a single pass, so the former repetition-leg join and its
    * two shuffles are gone — a quality filter at 100 TB now touches each
    * row exactly once). Rule comparisons run on the UNROUNDED values: each ratio is
    * an exact integer quotient (one IEEE division, bit-identical across
    * engines), whereas a rounded value's half-way cases differ between
    * Spark's shortest-decimal HALF_UP and binary-value rounding — a
    * keep/drop decision must never hinge on that. Rounding is applied
    * only to the EMITTED signal columns, for display. */
  def gopherFilter(docs: DataFrame, idCol: String, textCol: String,
                   minWords: Int = 50, maxWords: Int = 100000,
                   minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                   minAlphaWordRatio: Double = 0.8, minStopHits: Int = 2,
                   maxDupBigram: Double = 0.2,
                   maxTopToken: Double = 0.2): DataFrame = {
    val sig = graft.expr.TextSignals(col(textCol), GopherStopwords)
    // no fan-out here: a downstream filter on `keep` gets PUSHED below a
    // repartition (predicate pushdown), dragging the signal computation
    // back to the thin scan anyway, while projection-only consumers
    // would pay the added exchange for nothing (r19 plan audit).
    // The kernel STRUCT is projected once and fields extracted in a
    // second projection (r20): per-field `sig.getField(...)` repeats the
    // kernel expression per column and leaves single evaluation to
    // runtime subexpression elimination; the two-step form pins ONE
    // kernel call per row in the plan (CollapseProject refuses to inline
    // a non-cheap expression referenced more than once)
    docs.select(col(idCol).cast("long").as("id"), sig.as("_sig"))
      .select(col("id"),
        col("_sig.n_words").as("n_words"),
        col("_sig.mean_word_len").as("mean_word_len"),
        col("_sig.alpha_ratio").as("alpha_ratio"),
        col("_sig.n_stop_hits").as("n_stop_hits"),
        col("_sig.dup_bigram_ratio").as("dup_bigram_ratio"),
        col("_sig.top_token_ratio").as("top_token_ratio"))
      .withColumn("pass_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("pass_word_len",
        col("mean_word_len") >= minMeanWordLen &&
          col("mean_word_len") <= maxMeanWordLen)
      .withColumn("pass_alpha", col("alpha_ratio") >= minAlphaWordRatio)
      .withColumn("pass_stop", col("n_stop_hits") >= minStopHits)
      .withColumn("pass_rep",
        col("dup_bigram_ratio") <= maxDupBigram &&
          col("top_token_ratio") <= maxTopToken)
      .withColumn("keep",
        col("pass_words") && col("pass_word_len") && col("pass_alpha") &&
          col("pass_stop") && col("pass_rep"))
      // display rounding LAST, after every decision has been taken
      .withColumn("mean_word_len", round(col("mean_word_len"), 4))
      .withColumn("alpha_ratio", round(col("alpha_ratio"), 4))
      .withColumn("dup_bigram_ratio", round(col("dup_bigram_ratio"), 4))
      .withColumn("top_token_ratio", round(col("top_token_ratio"), 4))
  }

  /** C4-style page cleaning (published: the C4 corpus heuristics, Raffel
    * et al. 2020 §2.2 — keep only lines that end in terminal punctuation
    * AND carry at least five words; drop any page with fewer than three
    * sentences, or containing "lorem ipsum" or a curly brace). Emits the
    * cleaned page (kept lines re-joined), the line/sentence accounting,
    * the page-level flags, and the final `keep` decision — all PURE
    * per-row column expressions, no shuffle anywhere (the cheapest
    * possible 100 TB shape: a projection off the scan).
    *
    * Sentences are counted as terminal-punctuation occurrences in the
    * KEPT text (the filtered page is what three-sentences applies to);
    * the lorem-ipsum / brace checks run on the ORIGINAL page, as
    * published. */
  def c4Filter(docs: DataFrame, idCol: String, textCol: String,
               minWordsPerLine: Int = 5,
               minSentences: Int = 3): DataFrame = {
    val lines = split(col(textCol), "\n")
    val keptLines = filter(lines, l => {
      val t = trim(l)
      t.rlike("[.!?\"]$") &&
        size(split(t, "\\s+")) >= minWordsPerLine
    })
    val cleaned = concat_ws("\n", keptLines)
    val nSentences = size(regexp_extract_all(cleaned, lit("[.!?]"), lit(0)))
    val hasLorem = lower(col(textCol)).contains("lorem ipsum")
    val hasBrace = col(textCol).contains("{")
    docs.select(col(idCol).cast("long").as("id"),
        size(lines).cast("long").as("n_lines"),
        size(keptLines).cast("long").as("n_kept"),
        nSentences.cast("long").as("n_sentences"),
        hasLorem.as("has_lorem"), hasBrace.as("has_brace"),
        cleaned.as("cleaned"))
      .withColumn("keep",
        col("n_sentences") >= minSentences &&
          !col("has_lorem") && !col("has_brace"))
  }

  /** Language-model quality scoring, CCNet-style (published: CCNet ranks
    * web documents by the perplexity of a Wikipedia-trained LM and keeps
    * the low-perplexity head; Wenzek et al. 2020 — there a KenLM 5-gram,
    * here an add-alpha bigram model, the same decision signal at a
    * fraction of the state). Train bigram/unigram counts on `ref`, score
    * every doc in `docs` with its per-token cross-entropy
    * `-(1/n) Σ ln p(w_i | w_{i-1})`,
    * `p(w2|w1) = (c(w1,w2) + alpha) / (c(w1) + alpha·V)` with `V` =
    * reference vocabulary size + 1 (the OOV class). Lower = more like the
    * reference corpus.
    *
    * Determinism contract (same as [[graft.pipeline.Curation
    * .importanceWeights]]): each bigram's log-probability is rounded to
    * 8 dp and accumulated in DECIMAL — partition-order free and
    * engine-exact; the final division by n is one IEEE operation.
    *
    * Scale shape: reference counts are two map-side-combinable
    * aggregations (state bounded by the reference's vocabulary, not the
    * corpus); scoring is two keyed LEFT joins (bigram, then history
    * unigram — unseen keys fall to the smoothed floor) and one per-doc
    * aggregation. Docs with fewer than 2 tokens have no bigrams and
    * score NULL entropy (no evidence, distinct from a perfect 0). */
  def lmCrossEntropy(docs: DataFrame, ref: DataFrame,
                     idCol: String, textCol: String,
                     alpha: Double = 0.1): DataFrame = {
    require(alpha > 0.0, "alpha must be positive")
    def bigrams(df: DataFrame, withId: Boolean): DataFrame = {
      val toks = tokens(col(textCol))
      val bi = when(size(toks) < 2, array().cast("array<struct<w1:string,w2:string>>"))
        .otherwise(transform(sequence(lit(0), size(toks) - 2),
          i => struct(element_at(toks, i + 1).as("w1"),
            element_at(toks, i + 2).as("w2"))))
      val base = if (withId)
        df.select(col(idCol).cast("long").as("id"), explode(bi).as("b"))
      else df.select(explode(bi).as("b"))
      base.select((if (withId) Seq(col("id")) else Seq.empty[Column]) ++
        Seq(col("b.w1").as("w1"), col("b.w2").as("w2")): _*)
    }
    val refBi = bigrams(ref, withId = false)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val refUni = ref
      .select(explode(tokens(col(textCol))).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val vocab = refUni.count() + 1 // + OOV class
    val lnp = log(
      (coalesce(col("cb"), lit(0L)) + alpha) /
        (coalesce(col("cu"), lit(0L)) + alpha * vocab))
    val scored = bigrams(docs, withId = true)
      .join(refBi, Seq("w1", "w2"), "left")
      .join(refUni, Seq("w1"), "left")
      .select(col("id"),
        round(lnp, 8).cast("decimal(28,8)").as("lp"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("slp"))
    docs.select(col(idCol).cast("long").as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (-col("slp").cast("double") / col("n_bigrams")).as("cross_entropy"))
  }

  /** PII redaction: emails, IPv4 addresses, and long digit runs replaced
    * with placeholder tokens — the scrub pass a training pipeline runs
    * before anything ships to a tokenizer. Stateless per-row
    * `regexp_replace` chain (no shuffle); patterns stay in the
    * Java-regex ∩ RE2 common subset so the DuckDB oracle is exact. */
  def redact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    val digits = "\\b[0-9]{8,}\\b"
    val step1 = regexp_replace(col(textCol), email, "<EMAIL>")
    val step2 = regexp_replace(step1, ipv4, "<IP>")
    val step3 = regexp_replace(step2, digits, "<NUM>")
    // counts come from MATCHES at each replacement stage, not from
    // counting placeholder substrings afterwards — input that already
    // contains a literal "<EMAIL>"/"<IP>"/"<NUM>" must not inflate them.
    // Each count runs on the PREVIOUS stage's text so it equals exactly
    // the number of substitutions that stage performed.
    def nMatches(c: Column, pat: String) =
      size(regexp_extract_all(c, lit(pat), lit(0))).cast("long")
    docs.select(col(idCol), step3.as("redacted"),
      nMatches(col(textCol), email).as("n_emails"),
      nMatches(step1, ipv4).as("n_ips"),
      nMatches(step2, digits).as("n_nums"))
  }
}
