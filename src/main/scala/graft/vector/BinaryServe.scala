package graft.vector

import org.apache.spark.sql.DataFrame

/** 1-bit sign sketch + exact refine: embedded two-stage serving.
  *
  * The corpus's quantized rows ([[QuantServe.LocalF16]] / LocalI8) are
  * sketched down to ONE BIT per element — bit j set iff element j is
  * strictly negative, i.e. the classic sign-random-projection /
  * binary-hashing family with axis-aligned planes (public: Charikar's
  * SimHash / FAISS binary indexes; the reference itself ships no 1-bit
  * path, this extends its f32/f16/int8 storage-quantizer ladder one rung
  * further down). Search is two-stage:
  *
  *   1. '''Sketch scan''': Hamming distance query-sketch ↔ row-sketch via
  *      `xor` + `popcount` over packed 64-bit words — 1/32 the memory
  *      traffic of an f32 scan (128 dims = 2 words/row), which is what a
  *      full-corpus pass costs when 100 TB of embeddings are boiled down
  *      to the sketch. Keeps the best `k·refineFactor` row indices (ties
  *      by row order).
  *   2. '''Refine''': those candidates are re-scored EXACTLY the way the
  *      underlying quantized scan would score them (same closures, same
  *      clamp/sqrt finish), and the true top-k of the candidate set is
  *      returned.
  *
  * With `refineFactor <= 0` (or covering the corpus) stage 1 keeps
  * everything and the result is BIT-IDENTICAL to the underlying
  * quantized scan's `search` — the spec-pinned exactness anchor
  * (BinaryServeSpec); smaller factors trade recall for the sketch scan's
  * speed. The Hamming scan approximates ANGULAR closeness, so recall is
  * best for Cosine/CosinePreNorm corpora; for L2 corpora with large norm
  * spread prefer the quantized scans directly.
  *
  * Memory: sketch (n·ceil(d/64)·8 B) + the fine codes it refines from —
  * f16 fine at 128 dims = 2.06 B/element total, ~0.52× raw f32 with a
  * scan that touches 1/16 of the f16 bytes per query.
  */
object BinaryServe {

  /** Sign sketch over f16-quantized fine codes (2 B/elem + 1 bit/elem). */
  def serveF16(data: DataFrame, metric: Metric = Metric.L2): LocalBinary =
    new LocalBinary(QuantServe.serveF16(data, metric))

  /** Sign sketch over int8-quantized fine codes (1 B/elem + 1 bit/elem).
    * absMax as in [[QuantServe.serveInt8]] (corpus-trained by default). */
  def serveInt8(data: DataFrame, metric: Metric = Metric.L2,
                absMax0: Double = Double.NaN): LocalBinary =
    new LocalBinary(QuantServe.serveInt8(data, metric, absMax0))

  /** Two-stage embedded structure: packed sign words + the fine scan. */
  final class LocalBinary private[vector] (fine: QuantServe.QuantScan) {
    private val n = fine.size
    private val dim = fine.rowDim
    /** 64 sign bits per word, padded; 0 dims ⇒ 1 empty word per row. */
    private val wpr = math.max((dim + 63) >> 6, 1)
    private val words: Array[Long] = {
      require(n.toLong * wpr <= Int.MaxValue,
        s"sign sketch: $n rows x $wpr words exceed one contiguous buffer")
      val w = new Array[Long](n * wpr)
      java.util.stream.IntStream.range(0, n).parallel().forEach { i =>
        val base = i * wpr
        var j = 0
        while (j < dim) {
          if (fine.negAt(i, j)) w(base + (j >> 6)) |= 1L << (j & 63)
          j += 1
        }
      }
      w
    }

    def size: Int = n
    def byteSize: Long = fine.byteSize + sketchBytes
    def sketchBytes: Long = n.toLong * wpr * 8L

    /** @param refineFactor stage-1 candidate budget = k·refineFactor
      *                     (<= 0 ⇒ refine the whole corpus = exact
      *                     parity with the fine scan)
      * @param filter       id predicate, applied in the sketch scan */
    def search(q: Array[Float], k0: Int, refineFactor: Int = 8,
               filter: Long => Boolean = null): Seq[(Long, Double)] = {
      if (n == 0) return Seq.empty
      val mode = fine.scanMode
      val qd = QuantServe.prepQueryArr(mode, q, dim)
      if (qd == null) return Seq.empty
      val useDot = mode != FlatKnn.ModeL2
      val k = if (k0 <= 0) n else math.min(k0, n)
      val budget =
        if (k0 <= 0 || refineFactor <= 0) n
        else math.min(math.max(k.toLong * refineFactor, k.toLong),
          n.toLong).toInt

      // query sketch (normalization never flips a sign, so sketching the
      // prepped query equals sketching the raw one)
      val qw = new Array[Long](wpr)
      var j = 0
      while (j < dim) {
        if (qd(j) < 0.0) qw(j >> 6) |= 1L << (j & 63)
        j += 1
      }

      // stage 1: parallel Hamming scan, keep `budget` row INDICES
      // (BoundedTopK's id slot carries the index; ties → lower row)
      val w = words
      val ids = fine.rowIds
      val nc = math.max(Runtime.getRuntime.availableProcessors, 1)
      val merged = java.util.stream.IntStream.range(0, nc).parallel()
        .mapToObj[FlatKnn.BoundedTopK] { c =>
          val lo = (n.toLong * c / nc).toInt
          val hi = (n.toLong * (c + 1) / nc).toInt
          val heap = new FlatKnn.BoundedTopK(math.min(budget,
            math.max(hi - lo, 1)))
          var i = lo
          while (i < hi) {
            if (filter == null || filter(ids(i))) {
              val base = i * wpr
              var h = 0
              var t = 0
              while (t < wpr) {
                h += java.lang.Long.bitCount(w(base + t) ^ qw(t))
                t += 1
              }
              heap.offer(h.toDouble, i.toLong)
            }
            i += 1
          }
          heap
        }
        .reduce(null, (a: FlatKnn.BoundedTopK, b: FlatKnn.BoundedTopK) =>
          if (a == null) b else if (b == null) a else {
            val out = new FlatKnn.BoundedTopK(budget)
            out.absorb(a).absorb(b)
          })
      if (merged == null) return Seq.empty
      val cands = merged.sortedEntries.map(_._2.toInt).toArray

      // stage 2: exact rescore of the candidates with the fine scan's own
      // closures — same accumulation, same clamp/sqrt finish, ties by id
      val scorer = fine.rowScorer(useDot)
      val nc2 = math.min(nc, math.max(cands.length / 1024, 1))
      val out = java.util.stream.IntStream.range(0, nc2).parallel()
        .mapToObj[FlatKnn.BoundedTopK] { c =>
          val lo = (cands.length.toLong * c / nc2).toInt
          val hi = (cands.length.toLong * (c + 1) / nc2).toInt
          val heap = new FlatKnn.BoundedTopK(k)
          var ci = lo
          while (ci < hi) {
            val i = cands(ci)
            var s = scorer(qd, i)
            if (useDot) {
              s = 1.0 - s
              if (s < 0.0) s = 0.0 else if (s > 2.0) s = 2.0
            }
            heap.offer(s, ids(i))
            ci += 1
          }
          heap
        }
        .reduce(null, (a: FlatKnn.BoundedTopK, b: FlatKnn.BoundedTopK) =>
          if (a == null) b else if (b == null) a else a.absorb(b))
      if (out == null) Seq.empty
      else if (useDot) out.sortedEntries.map { case (s, id) => (id, s) }
      else out.sortedEntries.map { case (s, id) => (id, math.sqrt(s)) }
    }
  }
}
