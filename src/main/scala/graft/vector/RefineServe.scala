package graft.vector

/** Embedded two-stage refine: ANY coarse embedded scan (PQ/IVFPQ ADC,
  * a quantized flat scan, a sketch) supplies `k·refineFactor` candidate
  * ids; a quantized fine structure re-scores exactly those rows with its
  * own scan closures and returns the true top-k of the candidate set —
  * the embedded twin of [[Pq.searchRefined]] (FAISS `IndexRefineFlat`
  * pattern, public).
  *
  * The refined scores live in the FINE structure's score space (its
  * metric mode), and with a budget covering the corpus the result is
  * BIT-IDENTICAL to the fine scan itself (RefineServeSpec). Memory: the
  * coarse codes + the fine codes — e.g. PQ m=8 (8 B/row) + f16 fine
  * (2 B/elem) at 128 dims = 0.52× raw f32 with ADC doing the corpus
  * pass and the exact rescore touching k·refineFactor rows.
  *
  * The id→row translation is one open-addressing table built at wrap
  * time (12 B/row at 0.5 load — small next to the fine codes).
  */
object RefineServe {

  /** Wrap a fine structure; `coarse(q, budget)` must return candidate
    * (id, score) pairs — only ids are used, best-first order not
    * required. */
  def over(fine: QuantServe.QuantScan)
          (coarse: (Array[Float], Int) => Seq[(Long, Double)]): Refined =
    new Refined(coarse, fine)

  final class Refined private[vector] (
      coarse: (Array[Float], Int) => Seq[(Long, Double)],
      fine: QuantServe.QuantScan) {

    private val n = fine.size
    require(n < (1 << 30),
      s"refined embedded serving caps at 2^30 rows per structure; got $n")
    // open-addressing id → fine row index (power-of-two, linear probe,
    // load <= 0.5)
    private val cap =
      if (n == 0) 1
      else java.lang.Integer.highestOneBit(math.max(n, 2)) * 4
    private val mask = cap - 1
    private val keys = new Array[Long](cap)
    private val slots = {
      val s = new Array[Int](cap)
      java.util.Arrays.fill(s, -1)
      val ids = fine.rowIds
      var i = 0
      while (i < n) {
        var h = mix(ids(i)) & mask
        while (s(h) >= 0) h = (h + 1) & mask
        keys(h) = ids(i); s(h) = i
        i += 1
      }
      s
    }
    @inline private def mix(x0: Long): Int = {
      // splitmix64 finalizer — well-spread slots for sequential ids
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      (x ^ (x >>> 31)).toInt
    }
    private def rowOf(id: Long): Int = {
      var h = mix(id) & mask
      while (slots(h) >= 0 && keys(h) != id) h = (h + 1) & mask
      slots(h)
    }

    def size: Int = n
    /** Translation-table bytes on top of coarse + fine structures. */
    def tableBytes: Long = cap.toLong * 12

    /** @param refineFactor candidate budget = k·refineFactor (<= 0 ⇒
      *                     the whole corpus = exact parity with fine) */
    def search(q: Array[Float], k0: Int,
               refineFactor: Int = 8): Seq[(Long, Double)] = {
      if (n == 0) return Seq.empty
      val mode = fine.scanMode
      val qd = QuantServe.prepQueryArr(mode, q, fine.rowDim)
      if (qd == null) return Seq.empty
      val useDot = mode != FlatKnn.ModeL2
      val k = if (k0 <= 0) n else math.min(k0, n)
      val budget =
        if (k0 <= 0 || refineFactor <= 0) n
        else math.min(math.max(k.toLong * refineFactor, k.toLong),
          n.toLong).toInt
      val cands = coarse(q, budget)
      val scorer = fine.rowScorer(useDot)
      val ids = fine.rowIds
      val heap = new FlatKnn.BoundedTopK(k)
      cands.foreach { case (id, _) =>
        val i = rowOf(id)
        if (i >= 0) {
          var s = scorer(qd, i)
          if (useDot) {
            s = 1.0 - s
            if (s < 0.0) s = 0.0 else if (s > 2.0) s = 2.0
          }
          heap.offer(s, ids(i))
        }
      }
      if (useDot) heap.sortedEntries.map { case (s, id) => (id, s) }
      else heap.sortedEntries.map { case (s, id) => (id, math.sqrt(s)) }
    }
  }
}
