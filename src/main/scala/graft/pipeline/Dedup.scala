package graft.pipeline

import graft.expr.Distances
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
    * of `rows` rows, bucket-join on (band, band-hash), emit distinct
    * (id_a < id_b) pairs. */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   nShingle: Int = 3, bands: Int = 4, rows: Int = 4): DataFrame = {
    val sig = minhashSignature(Tokenize.simple(col(textCol)), nShingle, bands * rows)
    val sigDf = docs.select(col(idCol).cast("long").as("id"), sig.as("sig"))
    val banded = sigDf.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))).as("bucket")))))
      .select(col("id"), col("col.band").as("band"), col("col.bucket").as("bucket"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
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

  /** n-gram Jaccard similarity for candidate pairs within a blocking key
    * (block-local quadratic verification — the blocks bound the cost). */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   blockCol: String, nShingle: Int = 3): DataFrame = {
    val base = docs.select(
      col(idCol).cast("long").as("id"), col(blockCol).as("block"),
      shingles(Tokenize.simple(col(textCol)), nShingle).as("sh"))
    val a = base.as("a")
    val b = base.as("b")
    a.join(b, col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
         size(array_union(col("a.sh"), col("b.sh")))).as("jaccard"))
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
}
