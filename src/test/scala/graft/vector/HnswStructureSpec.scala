package graft.vector

import graft.SparkSpec

/** Structural invariants of the HNSW graph — the contracts
  * `hnsw_index.go` maintains by construction (degree caps `mMax`/`mMax0`,
  * hnsw_index.go:137-143; layer containment; entry = max-level node) and
  * the reachability the delete-repair logic exists to preserve
  * (hnsw_index.go:374-431). Checked over randomized builds and after
  * mutation storms via the package-private `dumpNodes`. */
class HnswStructureSpec extends SparkSpec {

  private def vecOf(i: Long, d: Int = 6): Array[Float] =
    Array.tabulate(d)(j => (math.sin(i * 1.13 + j * 0.77) * 12).toFloat)

  private def build(n: Int, m: Int = 8): Hnsw.LocalGraph = {
    val g = new Hnsw.LocalGraph(m = m, efConstruction = 100)
    (0L until n.toLong).foreach(i => g.add(i, vecOf(i)))
    g
  }

  private def nodes(g: Hnsw.LocalGraph) = g.dumpNodes().toVector

  test("degree caps hold on every node and layer: <= 2m at layer 0, <= m " +
       "above (hnsw_index.go mMax/mMax0 contract)") {
    for (m <- Seq(4, 8, 16); n <- Seq(30, 150)) {
      val g = build(n, m)
      nodes(g).foreach { case (id, _, lvl, layers, _) =>
        assert(layers.length == lvl + 1,
          s"node $id: ${layers.length} layer lists for level $lvl")
        layers.zipWithIndex.foreach { case (nbrs, l) =>
          val cap = if (l == 0) 2 * m else m
          assert(nbrs.length <= cap,
            s"m=$m n=$n node $id layer $l degree ${nbrs.length} > cap $cap")
        }
      }
    }
  }

  test("edges are valid: neighbor indexes in range, no self loops, and a " +
       "layer-l edge only targets nodes of level >= l (layer containment)") {
    val g = build(200, m = 8)
    val ns = nodes(g)
    val levelOf = ns.indices.map(i => ns(i)._3)
    ns.zipWithIndex.foreach { case ((id, _, _, layers, _), self) =>
      layers.zipWithIndex.foreach { case (nbrs, l) =>
        nbrs.foreach { nb =>
          assert(nb >= 0 && nb < ns.length, s"node $id: neighbor $nb out of range")
          assert(nb != self, s"node $id: self loop at layer $l")
          assert(levelOf(nb) >= l,
            s"node $id layer $l points at node $nb of level ${levelOf(nb)}")
        }
      }
    }
  }

  test("every node is reachable from the entry point over layer-0 edges — " +
       "fresh build AND after an interleaved add/delete-flush storm (the " +
       "connectivity the repair pass preserves, hnsw_index.go:374-431)") {
    def assertConnected(g: Hnsw.LocalGraph, label: String): Unit = {
      val ns = nodes(g)
      if (ns.nonEmpty) {
        // DIRECTED search-reachability, modeled exactly as search runs:
        // enter at the max-level nodes (the entry candidates), and at each
        // layer l from the top down take the closure over that layer's
        // DIRECTED out-edges before descending. No reverse-edge closure —
        // search only follows out-edges, so an undirected closure would
        // mask nodes no query can ever reach (prune asymmetrizes links;
        // that is precisely what the repair pass must not break).
        val maxLevel = ns.map(_._3).max
        val seen = Array.fill(ns.length)(false)
        ns.indices.foreach(i => if (ns(i)._3 == maxLevel) seen(i) = true)
        var l = maxLevel
        while (l >= 0) {
          var changed = true
          while (changed) {
            changed = false
            ns.indices.foreach { i =>
              if (seen(i) && ns(i)._4.length > l)
                ns(i)._4(l).foreach { nb =>
                  if (!seen(nb)) { seen(nb) = true; changed = true }
                }
            }
          }
          l -= 1
        }
        val unreachable = ns.indices.filterNot(seen).map(ns(_)._1)
        assert(unreachable.isEmpty,
          s"$label: ${unreachable.size} nodes unreachable by directed " +
            s"descent from the entry layer: ${unreachable.take(5)}")
      }
    }
    assertConnected(build(120, m = 8), "fresh build")
    // mutation storm: delete 60% in waves with flush, interleave re-adds
    val s = spark
    import s.implicits._
    val all = (0L until 100L).map(i => (i, vecOf(i))).toDF("id", "vector")
    var idx = Hnsw.build(all.repartition(1), m = 8)
    val rnd = new scala.util.Random(3)
    var live = (0L until 100L).toSet
    (0 until 4).foreach { _ =>
      val victims = rnd.shuffle(live.toSeq).take(15)
      idx = Hnsw.deleteFlush(idx, victims)
      live --= victims
      val back = victims.take(5)
      idx = Hnsw.add(idx, back.map(i => (i, vecOf(i))).toDF("id", "vector"))
      live ++= back
    }
    idx.graphs.collect().foreach(g => assertConnected(g, "post-storm shard"))
  }

  test("level assignment: edge-list depth equals the node's level + 1 and " +
       "only a vanishing fraction of nodes live above level 2 (geometric " +
       "law, hnsw_index.go:474-484)") {
    val g = build(2000, m = 16)
    val ns = nodes(g)
    val high = ns.count(_._3 >= 2)
    assert(high <= ns.length / 50,
      s"$high of ${ns.length} nodes at level >= 2 — geometric law violated")
    assert(ns.exists(_._3 >= 1), "no node above level 0 in 2000 inserts")
  }
}
