package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Log-structured, incrementally maintained BM25 corpus — the Spark twin
  * of comet's O(1) in-place index bookkeeping (`/root/reference/
  * bm25_index.go:204-334`: Add/Remove mutate postings maps and keep
  * numDocs/totalTokens/df current incrementally; stats are never
  * recomputed from the corpus).
  *
  * A monolithic [[BM25.build]] per mutation costs a full-corpus tokenize +
  * two corpus-wide shuffles — at 100 TB that makes every 1-row append pay
  * for the whole store. This class instead mirrors the segment store's own
  * LSM shape:
  *
  *   - one materialized postings/doc-lens PIECE per appended segment
  *     (tokenized once, at append time, at batch cost);
  *   - a newest-wins MARKER table `(id, upto)`: a piece row is live iff
  *     its segment id is greater than the id's marker — exactly
  *     [[graft.store.SegmentStore.read]]'s delete-marker ordering, so a
  *     re-appended id resurrects in its newer segment;
  *   - per-term df maintained by DELTA: each mutation appends a signed
  *     batch-vocabulary-sized delta frame, folded into the base table
  *     lazily at the next [[corpus]] access (the relational re-expression
  *     of the reference's per-term counter decrements,
  *     bm25_index.go:353-368);
  *   - n_docs / Σdl as driver scalars, updated arithmetically (dl values
  *     are integer-valued doubles, so the running sum is EXACT in any
  *     order and `avgdl = Σdl / n` is bit-identical to any other
  *     evaluation order).
  *
  * Per-mutation cost: tokenize + materialize the BATCH, one overlap probe
  * against the live doc-lens view (a columnar scan with a semi-join, no
  * shuffle — only when the batch's ids might replace live docs does the
  * postings view get probed), and O(batch vocabulary) delta frames.
  * Nothing corpus-sized is rewritten; [[corpus]] serves lazy views over
  * the materialized pieces.
  *
  * Materialization uses `localCheckpoint(eager = true)`: lineage is
  * truncated (a thousand-append log does not accumulate a thousand-deep
  * plan) and blocks live on executors, reclaimed by the context cleaner
  * once a generation is dropped. On a multi-tenant cluster where executor
  * loss must not lose the derived state, swap in reliable checkpointing or
  * rebuild from the (always durable) segment parquet via
  * [[BM25Log.fromLive]] — the store itself is the source of truth, this
  * log is a cache.
  *
  * NOT thread-safe; guard with the owning store's generation lock (as
  * [[graft.store.HybridStore]] does).
  */
final class BM25Log(spark: SparkSession,
                    val tokenizer: Tokenize.Tokenizer = Tokenize.Simple) {

  // (segment id, postings(term,id,tf,dl), docLens(id,dl)) — materialized
  private var pieces: Vector[(Long, DataFrame, DataFrame)] = Vector.empty
  // (id, upto): masks piece rows with seg <= upto — materialized
  private var markers: Option[DataFrame] = None
  // folded per-term df (term, df double) — materialized
  private var dfBase: DataFrame = emptyDf
  // signed, batch-vocab-sized df deltas awaiting the next fold
  private var dfDeltas: Vector[DataFrame] = Vector.empty
  private var nDocs: Long = 0L
  private var sumDl: Double = 0.0

  private def matz(df: DataFrame): DataFrame = df.localCheckpoint(true)

  private def emptyDf: DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Double)].toDF("term", "df")
  }
  private def emptyPostings: DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long, Double, Long)].toDF("term", "id", "dl", "tf")
  }
  private def emptyLens: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Double)].toDF("id", "dl")
  }

  /** Newest-wins live view over tagged piece frames (same marker ordering
    * as SegmentStore.read: a row survives iff seg > its id's marker). */
  private def liveView(select: ((Long, DataFrame, DataFrame)) => DataFrame,
                       empty: => DataFrame): DataFrame = {
    if (pieces.isEmpty) return empty
    val tagged = pieces.map { p =>
      select(p).withColumn("_seg", lit(p._1))
    }.reduce(_ unionByName _)
    markers match {
      case Some(m) =>
        tagged.join(m, Seq("id"), "left")
          .filter(col("upto").isNull || col("_seg") > col("upto"))
          .drop("_seg", "upto")
      case None => tagged.drop("_seg")
    }
  }

  /** Live postings across all pieces (lazy; scans materialized blocks). */
  def livePostings: DataFrame = liveView(_._2, emptyPostings)

  /** Live (id, dl) across all pieces (lazy). */
  def liveDocLens: DataFrame = liveView(_._3, emptyLens)

  /** Mask the live instances of `ids` in segments <= `upto`, folding
    * their df/stats contribution OUT by delta. The overlap probe runs on
    * the doc-lens view first (rows ∝ n_docs, far smaller than postings);
    * the postings view is only probed when something was actually live —
    * so an append-only workload never scans postings at all. */
  private def applyRemoval(ids: DataFrame, upto: Long): Unit = {
    val del = matz(ids.select(col("id").cast("long").as("id")).distinct())
    val hit = liveDocLens.join(del, Seq("id"), "left_semi")
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0.0)).as("s"))
      .head()
    val n = hit.getLong(0)
    if (n > 0) {
      nDocs -= n
      sumDl -= hit.getDouble(1)
      // df by delta, the reference's per-term decrement
      // (bm25_index.go:353-368): aggregate ONLY the removed docs'
      // postings — batch-sized output, never a corpus re-aggregation
      dfDeltas :+= matz(livePostings.join(del, Seq("id"), "left_semi")
        .groupBy(col("term"))
        .agg((count(lit(1)) * lit(-1.0)).as("df")))
      val add = del.withColumn("upto", lit(upto))
      markers = Some(matz(markers.fold(add)(_.unionByName(add))
        .groupBy(col("id")).agg(max(col("upto")).as("upto"))))
    }
  }

  /** Index one appended segment. `batch` carries `id` plus (optionally)
    * `text`; ids REPLACE any live older instance (memtable contract), and
    * a null-text row replacing a text row removes it from the corpus. */
  def append(batch: DataFrame, seg: Long): Unit = {
    applyRemoval(batch.select(col("id")), upto = seg - 1)
    if (batch.columns.contains("text")) {
      val fresh = BM25.build(batch.filter(col("text").isNotNull),
        "id", "text", tokenizer)
      val p = matz(fresh.postings)
      val l = matz(fresh.docLens)
      val st = l.agg(count(lit(1)).as("n"),
        coalesce(sum(col("dl")), lit(0.0)).as("s")).head()
      if (st.getLong(0) > 0) {
        pieces :+= ((seg, p, l))
        dfDeltas :+= matz(fresh.termDf
          .select(col("term"), col("df").cast("double").as("df")))
        nDocs += st.getLong(0)
        sumDl += st.getDouble(1)
      }
    }
  }

  /** Remove by id (the store's tombstone write): `upto` is the newest
    * segment id at delete time, so a later re-append (seg > upto) is live
    * again. */
  def delete(ids: DataFrame, upto: Long): Unit = applyRemoval(ids, upto)

  /** Post-compaction collapse: the live view becomes ONE piece tagged
    * with the compacted segment id, markers reset. df/stats are already
    * live-exact and carry over untouched. O(live corpus) — amortized into
    * the compaction, which already rewrites the same data. */
  def collapse(seg: Long): Unit = {
    foldDf()
    val p = matz(livePostings)
    val l = matz(liveDocLens)
    pieces = Vector((seg, p, l))
    markers = None
  }

  private def foldDf(): Unit = if (dfDeltas.nonEmpty) {
    dfBase = matz((dfBase +: dfDeltas).reduce(_ unionByName _)
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
      .filter(col("df") > 0))
    dfDeltas = Vector.empty
  }

  /** The current corpus as lazy views — score-equivalent to
    * `BM25.build` over the live documents (df and n_docs are exact
    * integers; Σdl is an exact integer-valued sum, so avgdl is
    * bit-identical to any rebuild). Folds pending df deltas (one
    * vocab-sized shuffle per mutation GENERATION, amortized across an
    * append burst). */
  def corpus: BM25Corpus = {
    foldDf()
    import spark.implicits._
    val stats = Seq((nDocs.toDouble,
      if (nDocs == 0L) 0.0 else sumDl / nDocs)).toDF("n_docs", "avgdl")
    BM25Corpus(livePostings, dfBase, stats, tokenizer, liveDocLens)
  }

  /** Documents currently indexed (driver scalar, O(1)). */
  def docCount: Long = nDocs

  /** Number of live pieces (segments contributing postings). */
  def pieceCount: Int = pieces.size
}

object BM25Log {
  /** Seed a log from an already-resolved live view (e.g. on reopening an
    * existing store): tokenizes once, materializes one piece. */
  def fromLive(live: DataFrame, seg: Long,
               tokenizer: Tokenize.Tokenizer = Tokenize.Simple): BM25Log = {
    val log = new BM25Log(live.sparkSession, tokenizer)
    log.append(live.select(col("id"), col("text")), seg)
    log
  }
}
