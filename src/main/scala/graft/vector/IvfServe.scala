package graft.vector

import org.apache.spark.sql.functions._

/** Embedded IVF serving: centroid table + cluster-sorted packed lists,
  * with a pluggable STORAGE quantizer (float32 / float16 / int8).
  *
  * Reference: `ivf_index_search.go:217-322` (rank centroids, scan nprobe
  * lists exhaustively) composed with `quantizer.go:17-21` — every
  * reference index takes a storage quantizer that compresses vectors at
  * rest and dequantizes for distance. This is the in-process deployment
  * shape of [[Ivf]]: one collect packs the assigned rows into contiguous
  * per-cluster ranges (ids + payload in cluster order, offsets table), and
  * each query ranks the centroid table on the driver, then runs the same
  * tight scan loops as [[QuantServe]] over only the probed ranges —
  * nprobe/nlist of the corpus, the reference's exact speedup.
  *
  * Score parity is the DISTRIBUTED path's: `serve(index).search(q, k, np)`
  * equals `Ivf.search(index, …, np)` row for row (IvfServeSpec) — L2 via
  * the same left-to-right double fold + sqrt, cosine via the same
  * `1 − dot/(‖v‖‖q‖)` clamp arithmetic as [[graft.expr.Distances.cosine]].
  * Quantized storage scores equal the distributed search over the
  * quantize-dequantize COLUMNS with the same cluster assignment
  * (storage compression never re-routes a row).
  */
object IvfServe {

  /** Storage quantizer for the packed lists (quantizer.go:17-21). */
  sealed trait Storage
  case object F32 extends Storage
  case object F16 extends Storage
  case object I8 extends Storage

  /** Pack an [[Ivf.Index]] for embedded serving. Metrics follow the
    * build side: L2, or Cosine over the index's normalize-at-insert rows.
    * int8 absMax is trained corpus-wide over the STORED vectors (1.0 for
    * cosine — stored rows are unit). */
  def serve(index: Ivf.Index, storage: Storage = F32): LocalIvf = {
    val metric = index.metric
    require(metric == Metric.L2 || metric == Metric.Cosine,
      s"embedded IVF serving supports L2, Cosine; got $metric")
    val spark = index.assigned.sparkSession
    import spark.implicits._
    val nlist = index.model.k
    val src = index.assigned
      .select(col("id").cast("long"), col("vector"), col("cluster").cast("int"))
      .as[(Long, Array[Float], Int)]
    val chunks = src.rdd.mapPartitions { it =>
      var dim = -1
      val ids = new scala.collection.mutable.ArrayBuilder.ofLong
      val vecs = new scala.collection.mutable.ArrayBuilder.ofFloat
      val cls = new scala.collection.mutable.ArrayBuilder.ofInt
      while (it.hasNext) {
        val (id, v, c) = it.next()
        if (dim < 0) dim = v.length
        ids += id
        vecs ++= v
        cls += c
      }
      val ia = ids.result()
      if (ia.isEmpty) Iterator.empty
      else Iterator.single((dim, ia, vecs.result(), cls.result()))
    }.collect()

    var n = 0L
    var dim = 0
    chunks.foreach { case (d, ia, _, _) => dim = d; n += ia.length }
    require(n * math.max(dim, 1) <= Int.MaxValue,
      s"embedded IVF serve(): $n x $dim exceeds one contiguous buffer; " +
        "use the distributed Ivf.search at this scale")
    // counted allocation into ONE cluster-ordered layout (the IvfPq.serve
    // convention: within a cluster, rows keep partition arrival order)
    val counts = new Array[Int](nlist)
    chunks.foreach { case (_, _, _, cs) => cs.foreach(counts(_) += 1) }
    val starts = new Array[Int](nlist + 1)
    var c = 0
    while (c < nlist) { starts(c + 1) = starts(c) + counts(c); c += 1 }
    val idsP = new Array[Long](n.toInt)
    val vecP = new Array[Float](n.toInt * dim)
    val fill = new Array[Int](nlist)
    chunks.foreach { case (_, ia, va, cs) =>
      var i = 0
      while (i < ia.length) {
        val cl = cs(i)
        val p = starts(cl) + fill(cl)
        idsP(p) = ia(i)
        System.arraycopy(va, i * dim, vecP, p * dim, dim)
        fill(cl) = p + 1 - starts(cl)
        i += 1
      }
    }
    new LocalIvf(index.model.centroids, starts, idsP,
      packPayload(vecP, storage, metric), dim,
      metric == Metric.Cosine)
  }

  /** Quantize the cluster-ordered f32 layout per the storage mode. */
  private def packPayload(vecP: Array[Float], storage: Storage,
                          metric: Metric): Payload = storage match {
    case F32 => new PayloadF32(vecP)
    case F16 =>
      val shorts = new Array[Short](vecP.length)
      var i = 0
      while (i < vecP.length) {
        shorts(i) = graft.expr.Quantizers.toHalfBits(vecP(i)); i += 1
      }
      new PayloadF16(shorts)
    case I8 =>
      var absMax = 0.0
      if (metric == Metric.Cosine) absMax = 1.0
      else {
        var i = 0
        while (i < vecP.length) {
          val a = math.abs(vecP(i).toDouble)
          if (a > absMax) absMax = a
          i += 1
        }
      }
      require(absMax > 0.0, s"int8 absMax must be positive; got $absMax")
      val bytes = new Array[Byte](vecP.length)
      var i = 0
      while (i < vecP.length) {
        var code = QuantServe.roundHalfAway(vecP(i) / absMax * 127.0)
        if (code > 127.0) code = 127.0 else if (code < -127.0) code = -127.0
        bytes(i) = code.toByte
        i += 1
      }
      new PayloadI8(bytes, absMax)
  }

  /** Packed vector storage: element load + resident bytes. The element
    * accessors are concrete-class-monomorphic inside each scorer loop
    * (the scorer closures below are built per payload type). */
  private[vector] sealed trait Payload {
    def byteSize: Long
    def at(idx: Int): Double
  }
  private final class PayloadF32(a: Array[Float]) extends Payload {
    def byteSize: Long = a.length * 4L
    def at(idx: Int): Double = a(idx).toDouble
  }
  private final class PayloadF16(a: Array[Short]) extends Payload {
    private val lut = QuantServe.f16Lut
    def byteSize: Long = a.length * 2L
    def at(idx: Int): Double = lut(a(idx) & 0xffff).toDouble
  }
  private final class PayloadI8(a: Array[Byte], val absMax: Double)
      extends Payload {
    private val lut: Array[Float] =
      Array.tabulate(255)(i => ((i - 127) / 127.0 * absMax).toFloat)
    def byteSize: Long = a.length.toLong
    def at(idx: Int): Double = lut(a(idx) + 127).toDouble
  }

  /** The packed embedded IVF structure. Search contract mirrors the
    * distributed [[Ivf.search]]: rank ALL centroids by raw-L2² against
    * the query, scan the top-nprobe cluster ranges, score with the
    * call-side metric arithmetic, keep top-k ties-by-id. */
  final class LocalIvf private[vector] (centroids: Array[Array[Float]],
                                        starts: Array[Int],
                                        ids: Array[Long],
                                        payload: Payload,
                                        dim: Int,
                                        cosine: Boolean) {
    def size: Int = ids.length
    def nlist: Int = starts.length - 1
    def byteSize: Long = ids.length * 8L + payload.byteSize +
      centroids.length.toLong * dim * 4L + starts.length * 4L

    /** int8 training scale (NaN for other storages). */
    def absMax: Double = payload match {
      case p: PayloadI8 => p.absMax
      case _            => Double.NaN
    }

    def search(q: Array[Float], k0: Int, nprobe: Int,
               filter: Long => Boolean = null,
               threshold: Option[Double] = None): Seq[(Long, Double)] = {
      if (ids.isEmpty) return Seq.empty
      require(q.length == dim, s"query dim ${q.length} != index dim $dim")
      val np = math.max(1, math.min(nprobe, nlist))
      val order = centroids.indices.sortBy(c => Kmeans.l2sq(q, centroids(c)))
      val qd = new Array[Double](dim)
      var j = 0
      while (j < dim) { qd(j) = q(j).toDouble; j += 1 }
      // ‖q‖ for the cosine denominator — the distributed expr computes
      // sqrt(dot(q,q)) with the same left-to-right fold
      var qq = 0.0
      if (cosine) {
        j = 0
        while (j < dim) { qq += qd(j) * qd(j); j += 1 }
        qq = math.sqrt(qq)
      }
      var probedRows = 0
      var p = 0
      while (p < np) {
        val cl = order(p)
        probedRows += starts(cl + 1) - starts(cl)
        p += 1
      }
      val k = if (k0 <= 0) probedRows else math.min(k0, probedRows)
      if (k == 0) return Seq.empty
      val heap = new FlatKnn.BoundedTopK(k)
      val thr = threshold.getOrElse(Double.NaN)
      val pay = payload
      p = 0
      while (p < np) {
        val cl = order(p)
        var i = starts(cl)
        val hi = starts(cl + 1)
        while (i < hi) {
          if (filter == null || filter(ids(i))) {
            val base = i * dim
            var s = 0.0
            if (cosine) {
              // mirror Distances.cosine: 1 − dot/(‖v‖‖q‖), clamp [0,2]
              var dot = 0.0
              var vv = 0.0
              var jj = 0
              while (jj < dim) {
                val x = pay.at(base + jj)
                dot += x * qd(jj)
                vv += x * x
                jj += 1
              }
              val sim = dot / (math.sqrt(vv) * qq)
              s = 1.0 - sim
              // Spark's least(greatest(x, 0), 2) treats NaN as the
              // GREATEST value: greatest passes it, least caps it at 2
              if (s.isNaN) s = 2.0
              else if (s < 0.0) s = 0.0 else if (s > 2.0) s = 2.0
            } else {
              var jj = 0
              while (jj < dim) {
                val d = pay.at(base + jj) - qd(jj)
                s += d * d
                jj += 1
              }
              s = math.sqrt(s)
            }
            if (thr.isNaN || s <= thr) heap.offer(s, ids(i))
          }
          i += 1
        }
        p += 1
      }
      heap.sortedEntries.map { case (s, id) => (id, s) }
    }
  }
}
