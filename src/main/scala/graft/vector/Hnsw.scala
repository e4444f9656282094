package graft.vector

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HNSW approximate nearest neighbor.
  *
  * Reference: `/root/reference/hnsw_index.go` — geometric random levels
  * capped at 16 (:474-484), greedy upper-layer descent + beam search with
  * efConstruction (:565-629), simple nearest-M neighbor selection
  * (:637-656), M links per layer with 2M at layer 0 (:493-552).
  *
  * Spark design (SURVEY.md §7.4): HNSW's pointer-chasing build is
  * inherently sequential, so we build ONE GRAPH PER PARTITION inside
  * `mapPartitions` and merge per-partition top-k — searches compose
  * (each partition's graph covers its shard; union of per-shard top-k ⊇
  * true top-k candidates with per-shard recall), and build parallelism is
  * the partition count. Levels are seeded per doc id, so graphs are
  * deterministic for a fixed partitioning.
  */
object Hnsw {

  /** Single-shard HNSW graph (the per-partition kernel). */
  final class LocalGraph(m: Int = 16, efConstruction: Int = 200)
      extends Serializable {
    private val mMax0 = 2 * m
    private val ml = 1.0 / math.log(m.toDouble)
    private val ids = mutable.ArrayBuffer.empty[Long]
    private val vecs = mutable.ArrayBuffer.empty[Array[Float]]
    private val levels = mutable.ArrayBuffer.empty[Int]
    // edges(node)(layer) = neighbor internal indexes
    private val edges = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
    private var entry = -1
    private var maxLevel = -1
    // soft-deleted internal indexes: traversed during search (graph
    // connectivity is preserved) but never admitted to results — comet's
    // deleted-node handling (hnsw_index.go:348-372 marks, search skips);
    // flushCopy() hard-purges (hnsw_index.go:374-431)
    private val deleted = mutable.HashSet.empty[Int]

    def size: Int = ids.length
    def liveSize: Int = ids.length - deleted.size

    private def dist(a: Array[Float], b: Array[Float]): Double = Kmeans.l2sq(a, b)

    /** Deterministic geometric level from the doc id (hnsw_index.go:474-484
      * caps at 16). */
    private def levelFor(id: Long): Int = {
      val rnd = new java.util.Random(id * 0x9E3779B97F4A7C15L + 1)
      val u = math.max(rnd.nextDouble(), 1e-12)
      math.min((-math.log(u) * ml).toInt, 16)
    }

    /** Beam search on one layer. `pred` (null = admit all) gates RESULT
      * admission only — the beam still traverses filtered/deleted nodes, so
      * graph connectivity survives selective filters (the standard
      * filtered-HNSW shape; comet gates the same way for its document
      * filter + deleted set, hnsw_index_search.go:322-325, :355-363). */
    private def searchLayer(q: Array[Float], entryPts: Seq[Int], ef: Int,
                            layer: Int, pred: Int => Boolean = null)
        : mutable.PriorityQueue[(Double, Int)] = {
      val visited = mutable.HashSet.empty[Int]
      def ok(i: Int): Boolean = pred == null || pred(i)
      // candidates: nearest-first; results: farthest-first (size <= ef)
      val cand = mutable.PriorityQueue.empty[(Double, Int)](
        Ordering.by[(Double, Int), Double](_._1).reverse)
      val res = mutable.PriorityQueue.empty[(Double, Int)](
        Ordering.by[(Double, Int), Double](_._1))
      entryPts.foreach { e =>
        if (visited.add(e)) {
          val d = dist(q, vecs(e))
          cand.enqueue((d, e))
          if (ok(e)) res.enqueue((d, e))
        }
      }
      while (cand.nonEmpty) {
        val (d, c) = cand.dequeue()
        if (res.size >= ef && d > res.head._1) { cand.clear() } // early stop
        else {
          edges(c)(layer).foreach { n =>
            if (visited.add(n)) {
              val dn = dist(q, vecs(n))
              if (res.size < ef || dn < res.head._1) {
                cand.enqueue((dn, n))
                if (ok(n)) {
                  res.enqueue((dn, n))
                  if (res.size > ef) res.dequeue()
                }
              }
            }
          }
        }
      }
      res
    }

    def add(id: Long, v: Array[Float]): Unit = {
      val idx = ids.length
      val lvl = levelFor(id)
      ids += id; vecs += v; levels += lvl
      edges += Array.fill(lvl + 1)(mutable.ArrayBuffer.empty[Int])
      if (entry < 0) { entry = idx; maxLevel = lvl; return }
      var ep = entry
      // greedy descent through layers above lvl
      var layer = maxLevel
      while (layer > lvl) {
        var changed = true
        while (changed) {
          changed = false
          var bestD = dist(v, vecs(ep))
          edges(ep)(layer).foreach { n =>
            val d = dist(v, vecs(n))
            if (d < bestD) { bestD = d; ep = n; changed = true }
          }
        }
        layer -= 1
      }
      // connect on layers min(lvl, maxLevel)..0
      var eps = Seq(ep)
      layer = math.min(lvl, maxLevel)
      while (layer >= 0) {
        val found = searchLayer(v, eps, efConstruction, layer)
        val sorted = found.toSeq.sortBy(_._1)
        // layer 0 connects up to 2M neighbors like the reference
        // (hnsw_index.go insertNode doubles M when lc == 0)
        val cap = if (layer == 0) mMax0 else m
        val neighbors = sorted.take(cap).map(_._2)
        neighbors.foreach { n =>
          edges(idx)(layer) += n
          edges(n)(layer) += idx
          if (edges(n)(layer).length > cap) { // prune overflow: keep nearest
            val pruned = edges(n)(layer)
              .map(x => (dist(vecs(n), vecs(x)), x)).sortBy(_._1)
              .take(cap).map(_._2)
            edges(n)(layer) = mutable.ArrayBuffer(pruned.toSeq: _*)
          }
        }
        eps = sorted.map(_._2)
        layer -= 1
      }
      if (lvl > maxLevel) { maxLevel = lvl; entry = idx }
    }

    /** Serialize nodes in insertion order (graph persistence,
      * hnsw_index.go:734-896 write path). */
    private[vector] def dumpNodes(): Iterator[(Long, Array[Float], Int, Seq[Seq[Int]])] =
      ids.indices.iterator.map { i =>
        (ids(i), vecs(i), levels(i), edges(i).toSeq.map(_.toSeq))
      }

    /** Append a node verbatim — the restore path skips re-insertion
      * entirely (the reference's whole point in serializing the graph:
      * build is ~200 vectors/s, load is IO-bound). Entry/maxLevel follow
      * the same first-strictly-greater rule as [[add]], so a dump→load
      * round trip reproduces the graph exactly. */
    private[vector] def loadNode(id: Long, v: Array[Float], lvl: Int,
                                 es: Seq[Seq[Int]]): Unit = {
      val idx = ids.length
      ids += id; vecs += v; levels += lvl
      edges += es.map(a => mutable.ArrayBuffer(a: _*)).toArray
      if (lvl > maxLevel) { maxLevel = lvl; entry = idx }
    }

    /** @param allowed optional doc-id predicate (comet WithDocumentIDs,
      *                 hnsw_index_search.go:322-325); deleted nodes are
      *                 always excluded. Traversal is unfiltered — widen
      *                 `efSearch` for selective filters. */
    def search(q: Array[Float], k: Int, efSearch: Int,
               allowed: Long => Boolean = null): Seq[(Long, Double)] = {
      if (entry < 0) return Seq.empty
      val pred: Int => Boolean =
        if (allowed == null && deleted.isEmpty) null
        else i => !deleted.contains(i) && (allowed == null || allowed(ids(i)))
      var ep = entry
      var layer = maxLevel
      while (layer > 0) {
        var changed = true
        while (changed) {
          changed = false
          var bestD = dist(q, vecs(ep))
          edges(ep)(layer).foreach { n =>
            val d = dist(q, vecs(n))
            if (d < bestD) { bestD = d; ep = n; changed = true }
          }
        }
        layer -= 1
      }
      searchLayer(q, Seq(ep), math.max(efSearch, k), 0, pred)
        .toSeq.sortBy(_._1).take(k)
        .map { case (d, i) => (ids(i), math.sqrt(d)) } // L2, not L2²
    }

    /** Soft delete by doc id: the node keeps routing traffic but never
      * surfaces in results (comet marks in the deleted set,
      * hnsw_index.go:348-372). Returns whether the id was present+live. */
    def delete(id: Long): Boolean = {
      val idx = ids.indexOf(id)
      idx >= 0 && deleted.add(idx)
    }

    /** Look up a live vector by doc id (node-based search support,
      * hnsw_index_search.go:212-226). */
    def vectorOf(id: Long): Option[Array[Float]] = {
      val idx = ids.indexOf(id)
      if (idx >= 0 && !deleted.contains(idx)) Some(vecs(idx)) else None
    }

    /** Exact structural copy (nodes, edges, soft-delete set) — the base
      * for copy-on-write mutations of RDD-shared graphs. */
    private[vector] def copyGraph(): LocalGraph = {
      val g = new LocalGraph(m, efConstruction)
      ids.indices.foreach { i =>
        g.loadNode(ids(i), vecs(i), levels(i), edges(i).toSeq.map(_.toSeq))
      }
      g.deleted ++= deleted
      g
    }

    /** Hard-purge FLUSH as a copy: drop soft-deleted nodes (plus `extra`
      * ids), RECONNECT survivors through their deleted neighbors'
      * neighborhoods (triangle repair, nearest-first, capped at M/2M —
      * comet's flush rewrites neighbor lists the same way so connectivity
      * survives mass deletes, hnsw_index.go:374-431), and re-elect the
      * entry point by the same first-strictly-greater-level rule as
      * insertion. A copy (not in-place) because built graphs are shared
      * via a persisted RDD; mutating cached objects would corrupt the
      * shared index. */
    def flushCopy(extra: Set[Long] = Set.empty): LocalGraph = {
      val dropIdx = deleted.toSet ++
        ids.indices.filter(i => extra.contains(ids(i)))
      val g = new LocalGraph(m, efConstruction)
      val keep = ids.indices.filter(i => !dropIdx.contains(i))
      val keepSet = keep.toSet
      // pass 1: per kept node, surviving links + triangle-repair candidates
      // (a lost neighbor's own live neighbors), nearest-first to layer cap
      val repaired: Map[Int, Array[Seq[Int]]] = keep.map { i =>
        i -> edges(i).zipWithIndex.map { case (layerEdges, layer) =>
          val (live, dead) = layerEdges.toSeq.partition(keepSet.contains)
          if (dead.isEmpty) live
          else {
            val cap = if (layer == 0) mMax0 else m
            val cands = (live ++ dead.flatMap { d =>
              if (layer < edges(d).length)
                edges(d)(layer).toSeq.filter(n => keepSet.contains(n) && n != i)
              else Seq.empty
            }).distinct
            cands.map(n => (dist(vecs(i), vecs(n)), n)).sortBy(_._1)
              .take(cap).map(_._2)
          }
        }
      }.toMap
      // pass 2: symmetrize repair links (x->n implies n->x, capped) so a
      // node whose whole neighborhood died stays REACHABLE, not just able
      // to route out — comet re-links neighbors of deleted nodes the same
      // bidirectional way (hnsw_index.go:374-431)
      val sym = repaired.map { case (i, ls) =>
        i -> ls.map(s => scala.collection.mutable.LinkedHashSet(s: _*))
      }
      repaired.foreach { case (i, ls) =>
        ls.zipWithIndex.foreach { case (layerEdges, layer) =>
          layerEdges.foreach { n =>
            val back = sym(n)
            if (layer < back.length) back(layer).add(i)
          }
        }
      }
      val remap = keep.zipWithIndex.toMap
      keep.foreach { i =>
        val ls = sym(i).zipWithIndex.map { case (s, layer) =>
          val cap = if (layer == 0) mMax0 else m
          val es =
            if (s.size <= cap) s.toSeq
            else s.toSeq.map(n => (dist(vecs(i), vecs(n)), n))
              .sortBy(_._1).take(cap).map(_._2)
          es.map(remap)
        }
        g.loadNode(ids(i), vecs(i), levels(i), ls.toSeq)
      }
      g
    }
  }

  /** A built index: one [[LocalGraph]] per partition, held RESIDENT on the
    * executors via a persisted RDD — the Spark analog of comet keeping the
    * graph in memory for the index lifetime (hnsw_index.go:98-131). Build
    * once, search many: each search is a cheap job over the cached graphs,
    * no rebuild. At scale the shards live distributed across executors and
    * a search fans out to all of them, merging per-shard top-k. */
  final case class Index(graphs: org.apache.spark.rdd.RDD[LocalGraph]) {
    /** Release the resident shard graphs (pair with [[deleteFlush]], which
      * materializes a fresh copy). */
    def unpersist(): Unit = { graphs.unpersist(); () }
  }

  /** Hard cap on a broadcastable candidate set (~32 MB of ids). The HNSW
    * document filter is an in-memory id set checked inside the beam — the
    * same contract as the reference's WithDocumentIDs, which also takes an
    * explicit in-memory id list. Corpus-scale filters belong on the IVF or
    * flat paths, where the candidate restriction is a distributed
    * semi-join; failing fast here beats a silent driver OOM. */
  val MaxBroadcastCandidates: Int = 4 << 20

  def build(data: DataFrame, m: Int = 16, efConstruction: Int = 200): Index = {
    val rows = data.select(col("id").cast("long"), col("vector"))
    // graph insertion is serial WITHIN a shard — shard count = build
    // parallelism. Small inputs arrive as 1 parquet split; spread them so
    // the build uses the cluster (at real scale the input partitioning
    // already does)
    val spark = data.sparkSession
    val want = spark.sparkContext.defaultParallelism
    val parted =
      if (rows.rdd.getNumPartitions < want) rows.repartition(want) else rows
    val graphs = parted
      .rdd.mapPartitions { it =>
        val g = new LocalGraph(m, efConstruction)
        it.foreach(r => g.add(r.getLong(0), r.getSeq[Float](1).toArray))
        Iterator.single(g)
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    graphs.count() // materialize the graphs now (build phase)
    Index(graphs)
  }

  /** Search a built index: per-shard beam search, global top-k merge.
    *
    * @param threshold  keep results with L2 distance <= threshold
    *                   (hnsw_index_search.go:327-329)
    * @param candidates optional (id) frame restricting results (comet
    *                   WithDocumentIDs, hnsw_index_search.go:322-325) — the
    *                   id set is collected and broadcast, checked inside
    *                   each shard's beam (the reference's filter is the
    *                   same in-memory id set); traversal stays unfiltered,
    *                   so widen `efSearch` for very selective filters
    */
  def searchIndex(index: Index, queries: DataFrame, k: Int,
                  efSearch: Int = 200,
                  threshold: Option[Double] = None,
                  candidates: Option[DataFrame] = None): DataFrame = {
    val spark = queries.sparkSession
    val qs = Ivf.collectQueries(queries)
    val bcQ = spark.sparkContext.broadcast(qs)
    val bcCand = candidates.map { c =>
      val arr = c.select(col("id").cast("long"))
        .limit(MaxBroadcastCandidates + 1).collect()
      require(arr.length <= MaxBroadcastCandidates,
        s"HNSW candidate set exceeds $MaxBroadcastCandidates ids; " +
          "route corpus-scale filters through IVF or flat search " +
          "(distributed semi-join) instead of the in-beam id set")
      spark.sparkContext.broadcast(arr.map(_.getLong(0)).toSet)
    }
    import spark.implicits._
    val hits = index.graphs.flatMap { g =>
      val allowed: Long => Boolean =
        bcCand.map(b => b.value.contains _).orNull
      bcQ.value.iterator.flatMap { case (qid, qv) =>
        g.search(qv, k, efSearch, allowed).map { case (id, d) => (qid, id, d) }
      }
    }.toDF("qid", "id", "score")
    val thresholded = threshold match {
      case Some(t) => hits.filter(col("score") <= t)
      case None    => hits
    }
    FlatKnn.topKPerQuery(thresholded, k, ascending = true)
  }

  /** Embedded serving mode: the shard graphs collected into ONE process,
    * searched without Spark job scheduling — the deployment shape the
    * reference itself is (an embedded in-memory engine on one box,
    * hnsw_index.go:98-131). Sub-millisecond-scale single-query latency for
    * indexes that fit a machine; the RDD path stays the scale-out route.
    * Shards are searched with a parallel stream and merged by (distance,
    * id) — results identical to [[searchIndex]]. */
  final class LocalServing private[Hnsw] (graphs: Array[LocalGraph]) {
    def search(q: Array[Float], k: Int, efSearch: Int = 200,
               allowed: Long => Boolean = null): Seq[(Long, Double)] = {
      val hits = java.util.Arrays.stream(graphs).parallel()
        .map[Seq[(Long, Double)]](g => g.search(q, k, efSearch, allowed))
        .reduce(Seq.empty[(Long, Double)], (a, b) => a ++ b)
      hits.sortBy { case (id, d) => (d, id) }.take(k)
    }
    def size: Int = graphs.map(_.size).sum
  }

  /** Collect a built index's shard graphs to the local JVM for embedded
    * serving (one-time cost ∝ index bytes; requires the index to fit
    * driver memory — the same constraint the reference always has). */
  def serve(index: Index): LocalServing =
    new LocalServing(index.graphs.collect())

  /** Incremental ADD (the reference inserts into the live graph,
    * hnsw_index.go:232-251): route each new vector to a shard by id hash
    * and INSERT it into a copy of that shard's graph — copies because the
    * existing graphs are shared through a persisted RDD (same
    * immutable-index discipline as [[deleteFlush]]); unchanged shards copy
    * node arrays without re-running insertion. Returns a new resident
    * index; search quality matches a fresh build of the union (each shard
    * remains a proper HNSW graph over its nodes). */
  def add(index: Index, data: DataFrame): Index = {
    val nShards = index.graphs.getNumPartitions
    val newRows = data
      .select(col("id").cast("long"), col("vector"))
      .rdd.map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .keyBy { case (id, _) => java.lang.Math.floorMod(id, nShards.toLong).toInt }
      .partitionBy(new org.apache.spark.HashPartitioner(nShards) {
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .values
    val graphs = index.graphs.zipPartitions(newRows) { (git, rit) =>
      val g = if (git.hasNext) git.next().copyGraph() else new LocalGraph()
      rit.foreach { case (id, v) => g.add(id, v) }
      Iterator.single(g)
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    graphs.count()
    Index(graphs)
  }

  /** Hard delete + flush: every shard drops the ids and rewires
    * (hnsw_index.go:348-431). Returns a NEW resident index; the input
    * stays valid (immutable-index discipline — cached RDD objects are
    * shared). */
  def deleteFlush(index: Index, ids: Seq[Long]): Index = {
    val spark = org.apache.spark.sql.SparkSession.active
    val bc = spark.sparkContext.broadcast(ids.toSet)
    val graphs = index.graphs.map(_.flushCopy(bc.value))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    graphs.count()
    Index(graphs)
  }

  /** Node-based "more like this" on the index: resolve the stored vectors
    * of `nodeIds` across shards, then search with them as queries
    * (hnsw_index_search.go:212-226). */
  def searchByNodes(index: Index, nodeIds: Seq[Long], k: Int,
                    efSearch: Int = 200): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    val bc = spark.sparkContext.broadcast(nodeIds.toSet)
    import spark.implicits._
    val queries = index.graphs.flatMap { g =>
      bc.value.iterator.flatMap(id => g.vectorOf(id).map(v => (id, v)))
    }.toDF("qid", "qvec")
    searchIndex(index, queries, k, efSearch)
  }

  /** Persist the built graphs: one parquet row per node, keyed by shard,
    * edges serialized per layer (index serialization, §2.1 —
    * hnsw_index.go:734-896 as columns instead of a binary dump). */
  def write(index: Index, path: String): Unit = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    index.graphs.mapPartitionsWithIndex { (shard, it) =>
      it.flatMap { g =>
        g.dumpNodes().zipWithIndex.map { case ((id, v, lvl, es), ord) =>
          (shard, ord, id, v, lvl, es)
        }
      }
    }.toDF("shard", "ord", "id", "vector", "level", "edges")
      .write.mode("overwrite").parquet(path)
  }

  /** Load persisted graphs WITHOUT re-running insertion — nodes restore
    * verbatim in insertion order, per shard, back into a resident RDD. */
  def read(spark: org.apache.spark.sql.SparkSession, path: String,
           m: Int = 16, efConstruction: Int = 200): Index = {
    val graphs = spark.read.parquet(path)
      .select(col("shard"), col("ord"), col("id"), col("vector"),
        col("level"), col("edges"))
      .rdd.map { r =>
        (r.getInt(0), (r.getInt(1), r.getLong(2),
          r.getSeq[Float](3).toArray, r.getInt(4),
          r.getSeq[scala.collection.Seq[Int]](5).map(_.toSeq)))
      }
      .groupByKey()
      .map { case (_, nodes) =>
        val g = new LocalGraph(m, efConstruction)
        nodes.toSeq.sortBy(_._1).foreach { case (_, id, v, lvl, es) =>
          g.loadNode(id, v, lvl, es)
        }
        g
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    graphs.count()
    Index(graphs)
  }

  /** One-shot build-and-search (each partition emits its local top-k per
    * query; a global top-k merge follows). */
  def search(data: DataFrame, queries: DataFrame, k: Int,
             m: Int = 16, efConstruction: Int = 200,
             efSearch: Int = 200): DataFrame =
    searchIndex(build(data, m, efConstruction), queries, k, efSearch)
}
