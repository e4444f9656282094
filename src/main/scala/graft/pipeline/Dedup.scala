package graft.pipeline

import graft.expr.{CentroidKernels, Distances}
import graft.text.Tokenize
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Exact dedup is a hash-groupBy; near-dup detection uses
  * MinHash+LSH banding (shingle → minhash → band → bucket join), SimHash,
  * n-gram Jaccard verification, and embedding-cosine.
  *
  * Scale design: every candidate-generation step is a shuffle ON A KEY
  * (hash, band bucket, source partition) — never an all-pairs cross join.
  * The only quadratic step is Jaccard/cosine VERIFICATION, which runs only
  * within buckets/blocks. At 100 TB: shingling is a projection, minhash is
  * a per-row expression (no shuffle), banding shuffles once on (band,
  * bucket), and verification joins are bucket-local.
  */
object Dedup {

  /** Deterministic 32-bit-ish hash of a string via md5's first 8 hex chars
    * (portable across engines — same value as DuckDB's
    * `CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT)`). */
  def md5Hash32(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 8), 16, 10).cast("long")

  /** Exact duplicate groups: md5(content) → group, keep min id. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(count(lit(1)).as("cnt"), min(col(idCol)).as("keeper"))

  /** Word n-gram shingles of the token array. Guard: Spark's `sequence`
    * counts DOWN when start > stop, so short docs need an explicit empty. */
  def shingles(toks: Column, n: Int): Column = {
    val sh = array_distinct(transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", slice(toks, i, lit(n)))))
    when(size(toks) < n, array().cast("array<string>")).otherwise(sh)
  }

  /** MinHash signature: for each of `h` permutations, min over shingles of
    * (a_i·x + b_i) mod p, x = md5-derived shingle hash. All per-row
    * expressions — the signature computation is shuffle-free. */
  def minhashSignature(toks: Column, nShingle: Int, h: Int): Column = {
    val p = 2147483647L // 2^31 - 1
    val sh = shingles(toks, nShingle)
    val hashes = transform(sh, s => md5Hash32(s))
    val perms = (0 until h).map { i =>
      val a = 1L + 2L * i // odd multipliers
      val b = 7919L * (i + 1)
      when(size(hashes) === 0, lit(p))
        .otherwise(array_min(transform(hashes, x => (x * a + b) % p)))
    }
    array(perms: _*)
  }

  /** MinHash + LSH candidate pairs: split the signature into `bands` bands
    * of `rows` rows, bucket-join on (band, bucket), emit distinct
    * (id_a < id_b) pairs.
    *
    * Shape chosen for scale: shingles are EXPLODED and hashed once per
    * (doc, shingle) row, then ONE `groupBy(id)` computes all `bands·rows`
    * permutation minima with map-side partial aggregation. The naive
    * alternative — per-row array expressions — re-evaluates the md5 chain
    * once per permutation per band per join side (no common-subexpression
    * elimination through higher-order functions), which measured 60×
    * slower at sf0.1. The banding self-join reuses the aggregate's
    * exchange (ReusedExchange), so the signature is computed exactly once.
    *
    * Docs with no shingles (fewer than `nShingle` tokens) have no content
    * to collide on and are excluded from pairing. */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   nShingle: Int = 3, bands: Int = 4, rows: Int = 4): DataFrame = {
    val p = 2147483647L // 2^31 - 1, same modulus as minhashSignature
    val h = bands * rows
    // shingle+hash is the CPU-heavy stage; fan byte-small inputs out
    // (no-op at scale — Frames.fanOut doc)
    val hashed = graft.core.Frames.fanOut(docs, Seq(col(idCol)))
      .select(col(idCol).cast("long").as("id"),
        explode(graft.expr.TextShingles(col(textCol), nShingle)).as("s"))
      .select(col("id"), md5Hash32(col("s")).as("hx"))
    val minExprs = (0 until h).map { i =>
      val a = 1L + 2L * i // same permutation family as minhashSignature
      val b = 7919L * (i + 1)
      min((col("hx") * a + b) % p).as(s"mh$i")
    }
    val sig = hashed.groupBy(col("id")).agg(minExprs.head, minExprs.tail: _*)
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until rows).map(r => col(s"mh${b * rows + r}")): _*)
          .as("bucket"))
    }
    val banded = sig.select(col("id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Cross-document duplicated-span profile: for each document, how much
    * of it is repeated VERBATIM somewhere else in the corpus — the
    * span-level dedup signal CCNet/RefinedWeb-style pipelines use to
    * decide between dropping whole documents and scrubbing spans.
    *
    * Shape: distinct word `n`-grams per doc (a projection off the scan) →
    * gram document-frequency via ONE map-side-combinable `groupBy` on the
    * gram key → postings re-join on the gram → per-doc share of grams
    * with df ≥ 2. Two keyed shuffles, never an all-pairs product; at
    * 100 TB the gram key spreads uniformly (grams are near-unique by
    * construction) and hot grams cost only their df count. Docs shorter
    * than `n` tokens have no spans and are absent from the output.
    *
    * `autoShape = true` picks window vs `skewSafe` automatically from a
    * sampled max-gram-df estimate ([[estimateMaxGramDf]]): corpora whose
    * hottest gram stays under `hotDfThreshold` take the faster window
    * form; heavier boilerplate switches to the partial-agg shape whose
    * one-long-per-mapper df survives any skew. Both shapes are
    * result-identical, so the choice is purely physical. */
  def spanProfile(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 8, skewSafe: Boolean = false,
                  autoShape: Boolean = false,
                  sampleFraction: Double = 0.01,
                  hotDfThreshold: Long = 2000000L): DataFrame = {
    // AUTO shape selection: probe the max gram df on a deterministic doc
    // sample and switch to the skew-safe form only when a single gram's
    // estimated postings would outgrow a window partition. One 1%-scan
    // job at plan time; both shapes are result-identical, so the choice
    // is purely physical.
    val useSkewSafe =
      if (autoShape)
        estimateMaxGramDf(docs, idCol, textCol, n,
          sampleFraction) > hotDfThreshold
      else skewSafe
    val posting = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(graft.expr.TextShingles(col(textCol), n)).as("s"))
    // Default: gram df via a count window PARTITIONed on the gram key —
    // one scan + one keyed exchange (the aggregate-then-join form scans
    // and explodes twice; measured ~1.6-2.3x slower at sf0.1 / 1M docs,
    // and still 2x faster with a 300k-doc hot boilerplate gram — probe
    // "span-profile 300k-hot-gram skew"). Caveat: a window has NO
    // map-side partial aggregation, so ALL of a hot gram's rows colocate
    // in one window partition; that stays fine until a single gram's
    // postings outgrow an executor partition (boilerplate in a double-
    // digit percentage of a 100 TB corpus). For that regime
    // `skewSafe = true` switches to the groupBy(gram)+join shape: the df
    // aggregation combines map-side (a hot gram costs one long per
    // mapper) and the re-join's skew is AQE-splittable.
    val withDf =
      if (useSkewSafe) {
        val gramDf = posting.groupBy(col("s")).agg(count(lit(1)).as("df"))
        posting.join(gramDf, "s")
      } else {
        posting.withColumn("df", count(lit(1)).over(Window.partitionBy(col("s"))))
      }
    withDf
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_grams"), col("n_shared"),
        round(col("n_shared").cast("double") / col("n_grams"), 4)
          .as("dup_frac"))
  }

  /** Estimate the maximum gram document-frequency from a DETERMINISTIC
    * md5-bucket sample of the documents (the same stable sampling contract
    * as [[graft.pipeline.Curation.sampleMix]]): a gram appearing in
    * fraction f of the corpus appears in ~f of the sample, so
    * `maxSampleDf / sampleFraction` estimates the hottest gram's true df.
    * A hot-enough-to-matter gram (df in the millions) is hit by a 1%
    * sample thousands of times — the estimate is reliable exactly in the
    * regime where the answer changes the plan; rare grams are
    * under-sampled but irrelevant to skew. Runs one sample-sized job. */
  def estimateMaxGramDf(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, sampleFraction: Double = 0.01): Double = {
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"sampleFraction $sampleFraction outside (0, 1]")
    val buckets = 10000
    val keep = math.max(1L, math.round(sampleFraction * buckets))
    val sample = docs
      .filter(pmod(md5Hash32(col(idCol).cast("string")), lit(buckets)) < keep)
    val row = sample
      .select(explode(graft.expr.TextShingles(col(textCol), n)).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
      .agg(max(col("df")).as("m")).head()
    val maxSampleDf = if (row.isNullAt(0)) 0L else row.getLong(0)
    maxSampleDf * (buckets.toDouble / keep)
  }

  /** SimHash (32-bit): md5-derived 32-bit hash per token occurrence; bit j
    * of the signature = sign of Σ_occurrences (2·bit_j(hash) - 1).
    * Summing over occurrences (not distinct terms) gives the standard
    * tf-weighted simhash without materializing a tf map. */
  def simhash32(toks: Column): Column = {
    val hashes = transform(toks, t => md5Hash32(t))
    val bits = (0 until 32).map { j =>
      val contrib = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, j) % 2) * 2 - 1)
      when(contrib > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** SimHash signatures per doc. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      simhash32(Tokenize.simple(col(textCol))).as("simhash"))

  /** Default hot-key df threshold for the SELF-TUNING salted pair joins
    * ([[jaccardPairs]], [[cosineLshPairs]]): a key shared by D rows
    * yields D²/2 pairs in one join task, so df 4096 ≈ 8.4M single-task
    * pair rows — where one straggler starts dominating the stage. Keys
    * this hot are detected reliably by the default 1% sample (~40
    * sampled hits); salting a false positive near the boundary costs
    * only df×salts replicated rows, so the threshold errs low. */
  val AutoSaltDf: Long = 4096L

  /** Cap on the number of detected hot keys the driver collects: only
    * the TOP-K keys by estimated df get salted; anything past the cap
    * stays on the plain (unsalted) path. Correctness is unaffected —
    * the salted and plain paths are row-identical by construction — the
    * cap only loosens the straggler bound for keys beyond it, and it
    * keeps the driver-side footprint CONSTANT for pathological
    * boilerplate-heavy corpora where the count of keys above the
    * threshold is itself corpus-sized (the uncapped bound was
    * corpus_postings/threshold). Overflow is logged with the number of
    * hot keys left unsalted. */
  val MaxAutoSaltKeys: Int = 10000

  /** The conditionally-salted self-pair join shared by [[jaccardPairs]]
    * and [[cosineLshPairs]]: `(id, keyCols...)` posting rows self-join on
    * the keys with `a.id < b.id`, and HOT keys (df above the threshold)
    * are split across `salts` sub-keys — the left side hashes its id
    * into a salt, the right side replicates across all salts — so every
    * pair still meets EXACTLY once (at the left row's salt) and a D-row
    * key's single-task work drops from D² to D·(D/salts). Row-identical
    * to the plain join by construction.
    *
    * Hot-key DETECTION runs on a deterministic id-hash sample
    * (`saltSampleFraction`, default 1%): a key with true df D appears
    * ~D·fraction times in the sample, so keys hot enough to matter are
    * found reliably while the probe costs a fraction of a full postings
    * aggregation; the detected set is COLLECTED — bounded by
    * `maxSaltKeys` ([[MaxAutoSaltKeys]]): top-K by estimated df, with
    * overflow logged — and re-broadcast, so detection is one sampled job
    * and the main scan runs once. NOTE this makes construction EAGER:
    * unless detection is off (`saltHotAbove = 0`), calling a pair-join
    * builder runs the sampled detection job at DataFrame-construction
    * time rather than returning a purely lazy plan — the price of
    * planning the salt column into a single join. Detection noise at the
    * threshold boundary is harmless — both paths are result-identical,
    * so which keys get salted is purely physical. Pass
    * `saltSampleFraction = 1.0` for exact detection on small inputs.
    *
    * `saltHotAbove`: `-1` (the callers' default) = self-tuning against
    * [[AutoSaltDf]] — a corpus with no hot keys detects an empty set and
    * keeps the plain two-sided join (no broadcast, no salt column in the
    * plan); `> 0` = explicit threshold; `0` = detection off. */
  private def saltedSelfJoin(posting: DataFrame, keyCols: Seq[String],
                             saltHotAbove: Long, salts: Int,
                             saltSampleFraction: Double,
                             autoSaltDf: Long,
                             maxSaltKeys: Int): DataFrame = {
    val plain = {
      val a = posting.as("a")
      val b = posting.as("b")
      a.join(b,
        keyCols.map(k => col(s"a.$k") === col(s"b.$k"))
          .reduce(_ && _) && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    }
    if (saltHotAbove == 0L) return plain
    val threshold = if (saltHotAbove > 0L) saltHotAbove else autoSaltDf
    val buckets = 10000
    val keep = math.max(1L, math.round(saltSampleFraction * buckets))
    val hotAgg = posting
      .filter(pmod(hash(col("id")), lit(buckets)) < keep)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("gdf"))
      .filter(col("gdf") * buckets > threshold * keep)
    // top-K by estimated df (plans as TakeOrderedAndProject — per-
    // partition top-K, no sort shuffle): the collect stays constant-
    // bounded no matter how many keys cross the threshold
    val hotRows = hotAgg.orderBy(col("gdf").desc)
      .limit(maxSaltKeys)
      .select(keyCols.map(col): _*)
      .collect()
    if (hotRows.isEmpty) return plain
    if (hotRows.length == maxSaltKeys) {
      // possible overflow: count what the cap dropped (a second job on
      // the SAMPLED agg only — the common, non-overflowing case pays
      // exactly one detection job)
      val total = hotAgg.count()
      if (total > maxSaltKeys)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"hot-key detection found $total keys above df~$threshold but " +
            s"the driver-side cap is $maxSaltKeys — salting the top " +
            s"$maxSaltKeys by estimated df; ${total - maxSaltKeys} hot " +
            "keys stay unsalted (results identical, stragglers possible)")
    }
    val spark = posting.sparkSession
    val keySchema = org.apache.spark.sql.types.StructType(
      keyCols.map(k => posting.schema(k)))
    val hot = spark.createDataFrame(
        spark.sparkContext.parallelize(hotRows.toIndexedSeq, 1), keySchema)
      .withColumn("_hot", lit(true))
    // ONE conditionally-salted join, not a cold/hot union: a union would
    // re-evaluate the posting projection (often an explode off the scan)
    // once per branch per side — no cross-branch CSE; measured 2x slower
    // at 1M docs. Cold keys carry salt 0 on both sides and meet once.
    val tagged = posting.join(broadcast(hot), keyCols, "left")
    val aS = tagged.withColumn("salt",
      when(col("_hot") === true, pmod(hash(col("id")), lit(salts)))
        .otherwise(lit(0))).drop("_hot").as("a")
    val bS = tagged.withColumn("salt",
      explode(when(col("_hot") === true, sequence(lit(0), lit(salts - 1)))
        .otherwise(array(lit(0))))).drop("_hot").as("b")
    aS.join(bS,
      (keyCols :+ "salt").map(k => col(s"a.$k") === col(s"b.$k"))
        .reduce(_ && _) && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
  }

  /** n-gram Jaccard similarity for candidate pairs within a blocking key.
    *
    * Postings-join shape: explode distinct shingles to `(block, shingle,
    * id)` rows, equi-join on (block, shingle), and count the matches —
    * |A∩B| per pair — then `jaccard = common / (|A| + |B| - common)`.
    * Unlike a block-local cross join with `array_intersect` (quadratic in
    * block size, and it re-evaluates the shingle arrays on both sides;
    * measured 10× slower at sf0.1), every step here shuffles on a real
    * key, so it survives large blocks. Pairs with NO shared shingle
    * (jaccard 0) are never materialized — by construction near-dup
    * candidates must overlap.
    *
    * HOT-SHINGLE SALTING (`saltHotAbove`): a boilerplate shingle shared
    * by D docs puts all D postings on one join key, and the pair-join's
    * D² matches land in ONE task. Salting splits each hot key into
    * `salts` sub-keys — the left side hashes its doc id into a salt, the
    * right side replicates across all salts — so every pair still meets
    * EXACTLY once (at the left doc's salt) and per-task work drops to
    * D·(D/salts). Cold shingles take the plain join untouched; the
    * result is row-identical to the unsalted shape.
    *
    * SELF-TUNING by default (`saltHotAbove = -1`): a sampled hot-key
    * probe (the [[spanProfile]] autoShape pattern) detects keys whose
    * estimated df exceeds [[Dedup.AutoSaltDf]] and salts exactly those;
    * a clean corpus detects none and keeps the plain two-sided join —
    * the 100 TB path is skew-safe without the caller knowing to ask.
    * `> 0` forces an explicit threshold, `0` disables detection
    * entirely. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   blockCol: String, nShingle: Int = 3,
                   saltHotAbove: Long = -1L, salts: Int = 16,
                   saltSampleFraction: Double = 0.01,
                   autoSaltDf: Long = AutoSaltDf,
                   maxSaltKeys: Int = MaxAutoSaltKeys): DataFrame = {
    // shingling is the CPU-heavy inner loop: fan a byte-small input out to
    // every core (no-op at scale — Frames.fanOut doc)
    val base = graft.core.Frames.fanOut(docs, Seq(col(idCol))).select(
      col(idCol).cast("long").as("id"), col(blockCol).as("block"),
      graft.expr.TextShingles(col(textCol), nShingle).as("sh"))
    val sizes = base.select(col("id"), size(col("sh")).cast("double").as("n"))
    val posting = base.select(col("id"), col("block"), explode(col("sh")).as("s"))
    val matched = saltedSelfJoin(posting, Seq("block", "s"),
      saltHotAbove, salts, saltSampleFraction, autoSaltDf, maxSaltKeys)
    val common = matched
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).cast("double").as("common"))
    common
      .join(sizes.select(col("id").as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("common") / (col("na") + col("nb") - col("common"))).as("jaccard"))
  }

  /** Duplicate CLUSTERS from candidate pairs: connected components by
    * iterative min-label propagation — each round every node adopts the
    * minimum label among itself and its neighbors, until fixpoint. The
    * cluster representative is the component's minimum id (the "keeper" a
    * dedup pipeline retains; everything else is a near-dup of it).
    *
    * Scale shape: each round is one keyed join + map-side-combined min
    * aggregation over the EDGE list (candidate pairs — tiny relative to
    * the corpus), converging in component-diameter rounds; near-dup
    * components are shallow in practice. The driver holds only the
    * convergence counter. */
  def duplicateClusters(pairs: DataFrame,
                        driverThreshold: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    val canonical = pairs
      .select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
      .distinct().persist()
    // The candidate-pair list is normally TINY relative to the corpus (LSH
    // emits only colliding pairs) — union-find on the driver is exact,
    // deterministic, and O(E α(E)); the distributed propagation below is
    // the fallback when the edge list itself is at data scale.
    val nEdges = canonical.count()
    if (nEdges <= driverThreshold) {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val next = parent(c); parent(c) = r; c = next
        }
        r
      }
      // union keeping the SMALLER id as root => root == component min id
      val edgeRows = canonical.collect()
      edgeRows.foreach { r =>
        val (a, b) = (find(r.getLong(0)), find(r.getLong(1)))
        if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
        else { parent.getOrElseUpdate(a, a); () }
      }
      val ids = edgeRows
        .flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct
      val rows = ids.map(id => (id, find(id))).toSeq
      canonical.unpersist()
      import spark.implicits._
      return rows.toDF("id", "cluster")
    }
    val edges = canonical
      .union(canonical.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    canonical.unpersist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).persist()
    var changed = 1L
    while (changed > 0) {
      val neighborMin = edges
        .join(labels.select(col("id").as("dst"), col("label").as("nlabel")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("nlabel")).as("nmin"))
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .persist()
      changed = updated
        .join(labels.select(col("id"), col("label").as("old")), "id")
        .filter(col("label") =!= col("old")).count()
      labels.unpersist()
      labels = updated
    }
    edges.unpersist()
    labels.select(col("id"), col("label").as("cluster"))
  }

  /** Embedding-cosine near-duplicate pairs within a blocking key. */
  def cosinePairs(embs: DataFrame, idCol: String, vecCol: String,
                  blockCol: String): DataFrame = {
    val base = embs.select(col(idCol).cast("long").as("id"),
      col(blockCol).as("block"), col(vecCol).as("v"))
    val a = base.as("a")
    val b = base.as("b")
    a.join(b, col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        Distances.cosineSim(col("a.v"), col("b.v")).as("cos_sim"))
  }

  /** Paragraph/line-level deduplication, CCNet-style (published: CCNet
    * deduplicates web text at the PARAGRAPH level by hashing normalized
    * paragraphs and dropping repeated ones — boilerplate navigation,
    * cookie banners and licence blocks vanish while unique prose stays;
    * Wenzek et al. 2020). Deterministic keeper rule: a repeated line
    * survives only at its lexicographically smallest `(doc_id, position)`
    * occurrence — corpus-order independent, unlike the published
    * streaming first-seen rule, so the result is stable across runs and
    * engines.
    *
    * Returns per doc: `n_lines`, `n_dropped`, and `cleaned` (surviving
    * lines re-joined by `sep`, original order). Lines are trimmed before
    * hashing; empty lines are dropped from both counts and output.
    *
    * Scale shape: split+posexplode is a projection; the keeper choice is
    * ONE `min` aggregation on the line-hash key joined back to the
    * postings; reassembly is a keyed `groupBy(doc)` over surviving lines
    * — all map-side-combinable keyed shuffles, no window, no all-pairs. */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
                 sep: String = "\n"): DataFrame = {
    val lines = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .select(col("doc_id"), col("pos"), trim(col("col")).as("line"))
      .filter(length(col("line")) > 0)
      .withColumn("h", md5(col("line").cast("binary")))
    val keeper = lines.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("k"))
      .select(col("h"), col("k.doc_id").as("k_doc"), col("k.pos").as("k_pos"))
    lines.join(keeper, "h")
      .withColumn("keep",
        col("doc_id") === col("k_doc") && col("pos") === col("k_pos"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"),
        concat_ws(sep, array_sort(collect_list(
          when(col("keep"), struct(col("pos"), col("line")))))
          .getField("line")).as("cleaned"))
  }

  /** Semantic deduplication, SemDeDup-style (published: cluster the
    * embedding space with k-means, then prune near-identical pairs
    * WITHIN each cluster — cross-cluster pairs, which clustering already
    * separated, are never compared; Abbas et al. 2023). The published
    * recipe's extreme-scale trick is exactly this blocking: the
    * quadratic verification runs only inside a cluster, so `k` is the
    * knob trading recall for cost.
    *
    * `centroids` come from [[graft.vector.Kmeans.train]] — or its
    * init-only form (`maxIter = 0`) when an exact SQL oracle is wanted,
    * the same pattern as the IVF probe oracle. Returns every input doc
    * with its cluster, its duplicate-group representative (`keeper` =
    * min id of the connected near-dup component, via
    * [[duplicateClusters]]; own id when unduplicated), and the decision
    * `keep = (keeper == id)`.
    *
    * Scale shape: assignment is one codegen projection
    * ([[graft.expr.CentroidKernels.nearestCentroid]]); the pair search
    * is cluster-blocked; component resolution runs on the near-dup
    * EDGES only (tiny relative to the corpus). */
  def semanticDedup(embs: DataFrame, idCol: String, vecCol: String,
                    centroids: Array[Array[Float]],
                    threshold: Double): DataFrame = {
    // centroid assignment + intra-cluster cosine are the CPU-heavy legs;
    // fan byte-small inputs out (no-op at scale — Frames.fanOut doc)
    val assigned = graft.core.Frames.fanOut(embs, Seq(col(idCol)))
      .select(col(idCol).cast("long").as("id"),
      col(vecCol).as("v"),
      CentroidKernels.nearestCentroid(col(vecCol), centroids)
        .cast("long").as("cluster"))
    val pairs = cosinePairs(assigned, "id", "v", "cluster")
      .filter(col("cos_sim") >= threshold)
    val comps = duplicateClusters(pairs.select(col("id_a"), col("id_b")))
      .select(col("id"), col("cluster").as("keeper"))
    assigned.select(col("id"), col("cluster"))
      .join(comps, Seq("id"), "left")
      .select(col("id"), col("cluster"),
        coalesce(col("keeper"), col("id")).as("keeper"))
      .withColumn("keep", col("keeper") === col("id"))
  }

  /** Embedding near-dup pairs WITHOUT a user blocking key: the scale path.
    * BANDED sign-LSH, same family as [[minhashPairs]]: `bands` independent
    * sub-signatures of `bitsPerBand` deterministic hyperplane sign bits
    * each. Bit r of band t uses hyperplane `e_i − e_j` with a PER-BAND odd
    * multiplier `mt = 2t+3`: `i = ((2r+1)·mt) mod dim`,
    * `j = ((5r+3)·mt + 2t+1) mod dim` — the multiplier keeps bands
    * distinct even when `bands·bitsPerBand` exceeds the index-pair family's
    * period in a small `dim` (a plain `k = t·B+r` indexing makes band
    * t+dim/(2B) a bit-for-bit copy of band t). For power-of-two dims every
    * odd `mt` is invertible, so bits within a band are distinct whenever
    * `bitsPerBand <= dim/2`; occasional `i == j` degenerate bits are
    * constant across all rows and harmless. A pair is a candidate if it
    * collides in ANY band; only candidates are cosine-verified (vectors
    * joined back AFTER pair dedup, so cosine runs once per pair).
    *
    * Banding is what makes this survive corpus scale: a single fixed-width
    * signature caps the bucket count (the round-2 version's 2^12 buckets ⇒
    * O(n²/4096) verification per bucket), while bands × 2^bitsPerBand
    * buckets shrink per-bucket population as width grows AND keep recall —
    * a near-dup pair only needs ONE fully-agreeing band, not every bit.
    * Deterministic (no RNG) so the exact same family is expressible in the
    * SQL oracle.
    *
    * HOT-BUCKET SALTING: a degenerate embedding cluster — D
    * near-identical vectors (boilerplate pages, filled-in templates) —
    * lands its D signatures in ONE (band, sig) bucket, and the
    * self-join's D² matches land in one task. The same
    * conditionally-salted single join as [[jaccardPairs]] splits each hot
    * bucket into `salts` sub-keys (left row salted by its doc id, right
    * row replicated across salts), so every pair still meets EXACTLY once
    * and per-task work drops to D·(D/salts). Cold buckets take the plain
    * join; the result is row-identical to the unsalted shape.
    *
    * SELF-TUNING by default (`saltHotAbove = -1`, see [[saltedSelfJoin]]):
    * the sampled probe detects buckets whose estimated df exceeds
    * `autoSaltDf` and salts exactly those; a clean corpus keeps the
    * plain join. `> 0` forces an explicit threshold, `0` disables. */
  def cosineLshPairs(embs: DataFrame, idCol: String, vecCol: String,
                     bands: Int = 4, bitsPerBand: Int = 16,
                     minSim: Double = 0.9,
                     saltHotAbove: Long = -1L, salts: Int = 16,
                     saltSampleFraction: Double = 0.01,
                     autoSaltDf: Long = AutoSaltDf,
                     maxSaltKeys: Int = MaxAutoSaltKeys): DataFrame = {
    require(bitsPerBand <= 31, "band signature is an Int bitset")
    val dim = embs.select(size(col(vecCol))).head().getInt(0)
    // one codegen'd signLsh kernel call per band (Centroids.scala SignLshSig:
    // a single generated loop over the band's hyperplanes) instead of
    // bitsPerBand separate element_at expressions per band — bit r of band t
    // is sign(v · (e_i − e_j)) > 0 with the e_i − e_j planes materialized as
    // (sparse) dense float arrays; i == j degenerates to the zero plane,
    // whose bit is 0 for every row and harmless
    val planes: Array[Array[Array[Float]]] = Array.tabulate(bands) { t =>
      Array.tabulate(bitsPerBand) { r =>
        val mt = 2 * t + 3
        val i = ((2 * r + 1) * mt) % dim
        val j = ((5 * r + 3) * mt + 2 * t + 1) % dim
        val p = new Array[Float](dim)
        p(i) += 1f
        p(j) -= 1f
        p
      }
    }
    val bandStructs = (0 until bands).map { t =>
      struct(lit(t).as("band"),
        CentroidKernels.signLsh(col(vecCol), planes(t)).as("sig"))
    }
    val banded = embs.select(col(idCol).cast("long").as("id"),
        explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.sig").as("sig"))
    val matched = saltedSelfJoin(banded, Seq("band", "sig"),
      saltHotAbove, salts, saltSampleFraction, autoSaltDf, maxSaltKeys)
    val pairs = matched.distinct()
    val vecs = embs.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    pairs
      .join(vecs.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        Distances.cosineSim(col("va"), col("vb")).as("cos_sim"))
      .filter(col("cos_sim") >= minSim)
  }
}
