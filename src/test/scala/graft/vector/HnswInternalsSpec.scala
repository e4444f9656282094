package graft.vector

/** Package-private serialization surface of [[Hnsw.LocalGraph]]: the
  * soft-delete mark must ride through dump/load (the claim on
  * [[Hnsw.LocalGraph.dumpNodes]] — a restore cannot resurrect deleted
  * docs), and copyGraph must be an exact structural copy. Mirrors
  * TestHNSWIndexSerializationWithDeletions at the node level. */
class HnswInternalsSpec extends graft.SparkSpec {

  private def graphOf(n: Int): Hnsw.LocalGraph = {
    val g = new Hnsw.LocalGraph(m = 4, efConstruction = 30)
    (0L until n.toLong).foreach(i =>
      g.add(i, Array.tabulate(6)(j => (math.sin(i * 0.7 + j) * 10).toFloat)))
    g
  }

  test("dump -> load preserves the soft-delete set; deleted docs never " +
       "resurface and liveSize agrees") {
    val g = graphOf(60)
    assert(g.delete(5L) && g.delete(17L))
    val restored = new Hnsw.LocalGraph(m = 4, efConstruction = 30)
    g.dumpNodes().foreach { case (id, v, lvl, es, isDel) =>
      restored.loadNode(id, v, lvl, es, isDel)
    }
    assert(restored.size == 60 && restored.liveSize == 58)
    val q = Array.tabulate(6)(j => (math.sin(5 * 0.7 + j) * 10).toFloat)
    val got = restored.search(q, 60, efSearch = 1000).map(_._1).toSet
    assert(!got.contains(5L) && !got.contains(17L))
    assert(got.size == 58)
  }

  test("copyGraph is exact: same results, same delete set, and mutating " +
       "the copy leaves the original untouched") {
    val g = graphOf(40)
    g.delete(3L)
    val c = g.copyGraph()
    val q = Array.tabulate(6)(j => (math.cos(j * 1.1) * 5).toFloat)
    assert(c.search(q, 40, 1000) == g.search(q, 40, 1000))
    assert(c.liveSize == g.liveSize)
    c.delete(8L)
    assert(c.liveSize == g.liveSize - 1, "copy mutation leaked to original")
    assert(g.search(q, 40, 1000).map(_._1).contains(8L))
  }

  test("re-adding an id after soft delete resolves to the NEW vector " +
       "(hnsw_index.go:232-251 replace semantics through dump/load)") {
    val g = graphOf(20)
    g.delete(4L)
    g.add(4L, Array.fill(6)(99f))
    val restored = new Hnsw.LocalGraph(m = 4, efConstruction = 30)
    g.dumpNodes().foreach { case (id, v, lvl, es, isDel) =>
      restored.loadNode(id, v, lvl, es, isDel)
    }
    assert(restored.vectorOf(4L).get.toSeq == Seq.fill(6)(99f))
    val got = restored.search(Array.fill(6)(99f), 1, 1000)
    assert(got.head._1 == 4L && got.head._2 < 1e-6)
  }
}
