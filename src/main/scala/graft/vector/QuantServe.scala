package graft.vector

import graft.expr.Quantizers
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Quantized embedded serving: the corpus stored as packed float16 bits or
  * symmetric int8 codes instead of float32.
  *
  * Reference: `/root/reference/quantizer.go` — indexes take a storage
  * quantizer (float32 / float16 / int8 symmetric, :17-21) that compresses
  * vectors at insert and dequantizes for distance; scores are distances
  * between DEQUANTIZED vectors. Re-expressed here for the embedded flat
  * scan: rows quantize ON THE EXECUTORS (the collect ships half / a
  * quarter of the f32 bytes — at 100 TB of embeddings the quantizer is
  * what makes single-box serving reachable at all), the driver holds one
  * contiguous short/byte buffer, and the scan dequantizes through a
  * lookup table (f16: 64Ki floats = 256 KB, resident in L2; int8: 255
  * floats) so the hot loop stays a primitive array walk.
  *
  * Score parity is defined against the quantize-dequantize COLUMNS
  * ([[Quantizers]]): `serveF16(df).search(q)` equals
  * `FlatKnn.serve(df.withColumn("vector", f16RoundTrip(...)))` exactly,
  * and int8 likewise against `int8Dequantize ∘ int8Quantize` — pinned in
  * QuantServeSpec. Recall loss vs f32 is the quantizer's, not the scan's.
  *
  * Metrics: L2, or Cosine via the reference's normalize-THEN-quantize
  * insert order (distance.go:70-81 runs before the quantizer sees the
  * vector); the query is normalized at search and scored
  * `clamp(1 − dot(q̂, deq(v)), 0, 2)` — deq(v) is near-unit, the residual
  * is quantization error, same as the reference.
  */
object QuantServe {

  /** f16 dequant table: all 2^16 bit patterns → float32 (exact). */
  private[vector] lazy val f16Lut: Array[Float] =
    Array.tabulate(1 << 16)(i => Quantizers.fromHalfBits(i.toShort))

  /** Go math.Round: half away from zero (quantizer.go:201-233's rounding,
    * matching Spark's round() used by the oracle columns). */
  @inline private[vector] def roundHalfAway(x: Double): Double =
    if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)

  /** (insert-side prep, serving mode) — the [[FlatKnn]] mode triple:
    * L2, Cosine (normalize-at-insert, query normalized at search),
    * CosinePreNorm (rows stored raw, RAW query dotted — the fast path
    * after the caller's own normalization, zero-norm rows kept at 1.0). */
  private def prepFor(metric: Metric): (Array[Float] => Array[Float], Int) =
    metric match {
      case Metric.L2            => (identity, FlatKnn.ModeL2)
      case Metric.CosinePreNorm => (identity, FlatKnn.ModePreNorm)
      case Metric.Cosine => ((v: Array[Float]) => {
        var n2 = 0.0
        var j = 0
        while (j < v.length) { val x = v(j).toDouble; n2 += x * x; j += 1 }
        if (n2 == 0.0) null // drop: comet rejects zero vectors under cosine
        else {
          val inv = 1.0 / math.sqrt(n2)
          val out = new Array[Float](v.length)
          j = 0
          while (j < v.length) { out(j) = (v(j).toDouble * inv).toFloat; j += 1 }
          out
        }
      }, FlatKnn.ModeCosine)
      case other => throw new IllegalArgumentException(
        s"quantized serving supports L2, Cosine, CosinePreNorm; got $other")
    }

  private val chunkEnc = Encoders.tuple(Encoders.BINARY, Encoders.BINARY)

  /** Executor-side pack: per partition, one (ids-as-bytes, payload-bytes)
    * chunk where payload is the quantized vector stream (2 B/elem f16,
    * 1 B/elem int8) — the [[Packed.codes]] collect shape. Order is
    * partition-then-row order, matching the f32 packers. The head bytes
    * carry dim (4 B) then the ids as big-endian longs. */
  private def quantChunks(data: DataFrame,
                          prep: Array[Float] => Array[Float],
                          bytesPerElem: Int,
                          quantRow: (Array[Float], java.nio.ByteBuffer) => Unit)
      : org.apache.spark.sql.Dataset[(Array[Byte], Array[Byte])] = {
    import data.sparkSession.implicits._
    val src = data.select(col("id").cast("long"), col("vector"))
      .as[(Long, Array[Float])]
    src.mapPartitions { it =>
      var dim = -1
      val ids = new scala.collection.mutable.ArrayBuilder.ofLong
      var buf: java.nio.ByteBuffer = null
      val grown = new scala.collection.mutable.ArrayBuffer[Array[Byte]]
      while (it.hasNext) {
        val (id, raw) = it.next()
        val v = prep(raw)
        if (v != null) {
          if (dim < 0) dim = v.length
          if (buf == null || buf.remaining() < dim * bytesPerElem) {
            if (buf != null)
              grown += java.util.Arrays.copyOf(buf.array(), buf.position())
            buf = java.nio.ByteBuffer.allocate(
              math.max(dim * bytesPerElem * 1024, 1 << 16))
          }
          ids += id
          quantRow(v, buf)
        }
      }
      val ia = ids.result()
      if (ia.isEmpty) Iterator.empty
      else {
        if (buf != null)
          grown += java.util.Arrays.copyOf(buf.array(), buf.position())
        val total = grown.iterator.map(_.length).sum
        val payload = new Array[Byte](total)
        var off = 0
        grown.foreach { g =>
          System.arraycopy(g, 0, payload, off, g.length); off += g.length
        }
        val ib = java.nio.ByteBuffer.allocate(ia.length * 8)
        ib.asLongBuffer().put(ia)
        // dim rides in front of the id bytes (4 B)
        val head = java.nio.ByteBuffer.allocate(4 + ib.array().length)
        head.putInt(dim).put(ib.array())
        Iterator.single((head.array(), payload))
      }
    }(chunkEnc)
  }

  private def collectQuant(data: DataFrame,
                           prep: Array[Float] => Array[Float],
                           bytesPerElem: Int,
                           quantRow: (Array[Float], java.nio.ByteBuffer) => Unit)
      : (Array[Long], Seq[Array[Byte]], Int) = {
    val chunks = quantChunks(data, prep, bytesPerElem, quantRow).collect()

    var n = 0L
    var dim = -1
    chunks.foreach { case (h, _) =>
      if (dim < 0) dim = java.nio.ByteBuffer.wrap(h).getInt()
      n += (h.length - 4) / 8
    }
    if (n == 0) return (Array.emptyLongArray, Seq.empty, -1)
    // the ceiling is the ELEMENT count (the typed payload array), not the
    // wire bytes — callers assemble chunk bytes straight into the final
    // short/byte array, so no byte-array intermediate of n*dim*elemBytes
    // ever exists (at 10M x 128 the f16 payload is 1.28e9 shorts — fine —
    // but would be 2.56e9 bytes, past the JVM array limit)
    require(n * dim <= Int.MaxValue,
      s"quantized serve(): $n x $dim elements exceed one contiguous buffer")
    val ids = new Array[Long](n.toInt)
    var io = 0
    chunks.foreach { case (h, _) =>
      val lb = java.nio.ByteBuffer.wrap(h, 4, h.length - 4).asLongBuffer()
      val cnt = lb.remaining()
      lb.get(ids, io, cnt); io += cnt
    }
    (ids, chunks.iterator.map(_._2).toSeq, dim)
  }

  /** Wave-based sharded assembly: the quantized chunks are fetched
    * [[Packed.vectorsSharded]]-style — `wave` partitions at a time via
    * `runJob`, so driver peak memory is the shards themselves plus one
    * wave of in-flight chunks, never the whole wire payload — and cut
    * into (ids, wire-bytes, dim) shards of ≤ `maxShardElems` elements
    * each (also clamped so a shard's WIRE bytes fit one array). A chunk
    * may straddle a shard boundary (split copy). */
  private def quantShards(data: DataFrame,
                          prep: Array[Float] => Array[Float],
                          bytesPerElem: Int,
                          quantRow: (Array[Float], java.nio.ByteBuffer) => Unit,
                          maxShardElems: Long)
      : Seq[(Array[Long], Array[Byte], Int)] = {
    val spark = data.sparkSession
    val total = data.count()
    if (total == 0) return Seq.empty
    val estDim = data.select(org.apache.spark.sql.functions.size(col("vector")))
      .head().getInt(0)
    val chunkRdd = quantChunks(data, prep, bytesPerElem, quantRow).rdd
    val sc = spark.sparkContext
    val nParts = math.max(chunkRdd.partitions.length, 1)
    val maxInFlight = spark.conf.getOption("spark.graft.serve.maxInFlightBytes")
      .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
      .getOrElse(math.max(1L << 30, Runtime.getRuntime.maxMemory / 8))
    // ~2.5× a partition's wire bytes live while it packs + ships
    val partBytes = math.max(
      total.toDouble / nParts * (estDim.toLong * bytesPerElem + 8L), 1.0)
    val wave = math.max(1,
      math.min(nParts, (maxInFlight / (2.5 * partBytes)).toInt))

    val done =
      scala.collection.mutable.ArrayBuffer.empty[(Array[Long], Array[Byte], Int)]
    var dim = -1
    var shardRows = 0
    var remaining = total // rows not yet placed (upper bound under prep drops)
    var ids: Array[Long] = null
    var wire: Array[Byte] = null
    var off = 0 // rows filled in the open shard
    def openShard(): Unit = {
      val rows = math.min(remaining, shardRows.toLong).toInt
      ids = new Array[Long](rows)
      wire = new Array[Byte](rows * dim * bytesPerElem)
      off = 0
    }
    def closeShard(): Unit = {
      if (ids != null && off > 0) {
        val rb = dim * bytesPerElem
        done += ((
          if (off == ids.length) ids else java.util.Arrays.copyOf(ids, off),
          if (off == ids.length) wire
          else java.util.Arrays.copyOf(wire, off * rb),
          dim))
      }
      ids = null; wire = null; off = 0
    }
    (0 until nParts).grouped(wave).foreach { batch =>
      val results = sc.runJob(chunkRdd,
        (it: Iterator[(Array[Byte], Array[Byte])]) => it.toSeq.headOption,
        batch)
      results.foreach(_.foreach { case (h, p) =>
        if (dim < 0) {
          dim = java.nio.ByteBuffer.wrap(h).getInt()
          val rowBytes = dim.toLong * bytesPerElem
          shardRows = math.max(1L, math.min(
            maxShardElems / math.max(dim, 1),
            Int.MaxValue / rowBytes)).toInt
          openShard()
        }
        val ia = new Array[Long]((h.length - 4) / 8)
        java.nio.ByteBuffer.wrap(h, 4, h.length - 4).asLongBuffer().get(ia)
        val rb = dim * bytesPerElem
        var copied = 0
        while (copied < ia.length) {
          if (off == ids.length) { closeShard(); openShard() }
          val take = math.min(ia.length - copied, ids.length - off)
          System.arraycopy(ia, copied, ids, off, take)
          System.arraycopy(p, copied * rb, wire, off * rb, take * rb)
          off += take
          copied += take
          remaining -= take
        }
      })
    }
    closeShard()
    done.toSeq
  }

  /** Collect for float16 embedded serving (2 B/element — half the f32
    * resident bytes and half the collect traffic). */
  def serveF16(data: DataFrame, metric: Metric = Metric.L2): LocalF16 = {
    val (prep, mode) = prepFor(metric)
    val (ids, chunks, dim) = collectQuant(data, prep, 2,
      (v, buf) => {
        var j = 0
        while (j < v.length) { buf.putShort(Quantizers.toHalfBits(v(j))); j += 1 }
      })
    val shorts = new Array[Short](chunks.iterator.map(_.length / 2).sum)
    var off = 0
    chunks.foreach { c =>
      val sb = java.nio.ByteBuffer.wrap(c).asShortBuffer()
      val cnt = sb.remaining()
      sb.get(shorts, off, cnt); off += cnt
    }
    new LocalF16(ids, shorts, math.max(dim, 0), mode)
  }

  /** Collect for symmetric int8 embedded serving (1 B/element — a quarter
    * of the f32 bytes). absMax is trained corpus-wide first
    * (quantizer.go:184-195) unless supplied; for cosine it is trained on
    * the NORMALIZED rows (≤ 1 by construction). */
  def serveInt8(data: DataFrame, metric: Metric = Metric.L2,
                absMax0: Double = Double.NaN): LocalI8 = {
    val (prep, mode) = prepFor(metric)
    val absMax =
      if (!absMax0.isNaN) absMax0
      else if (metric == Metric.Cosine) 1.0
      else Quantizers.int8AbsMax(data, "vector").head().getDouble(0)
    require(absMax > 0.0, s"int8 absMax must be positive; got $absMax")
    val (ids, chunks, dim) = collectQuant(data, prep, 1,
      (v, buf) => {
        var j = 0
        while (j < v.length) {
          var c = roundHalfAway(v(j) / absMax * 127.0)
          if (c > 127.0) c = 127.0 else if (c < -127.0) c = -127.0
          buf.put(c.toByte)
          j += 1
        }
      })
    val bytes = new Array[Byte](chunks.iterator.map(_.length).sum)
    var off = 0
    chunks.foreach { c =>
      System.arraycopy(c, 0, bytes, off, c.length); off += c.length
    }
    new LocalI8(ids, bytes, math.max(dim, 0), absMax, mode)
  }

  /** Sharded f16 embedded serving: shards of ≤ `maxShardElems` elements,
    * merged by (score, id) — bit-identical to [[serveF16]] over the same
    * frame (QuantServeSpec). This is how a quantized corpus grows past
    * the 2^31-element array ceiling (~2.8M rows at the reference's
    * 768-dim shape) to heap size: at f16 the ceiling in ROWS is the same
    * as f32's, but each shard holds twice the vectors per resident byte. */
  def serveF16Sharded(data: DataFrame, metric: Metric = Metric.L2,
                      maxShardElems: Long = 1L << 30): LocalQuantShards = {
    val (prep, mode) = prepFor(metric)
    val shards = quantShards(data, prep, 2,
      (v, buf) => {
        var j = 0
        while (j < v.length) { buf.putShort(Quantizers.toHalfBits(v(j))); j += 1 }
      }, maxShardElems)
      .map { case (ids, wire, dim) =>
        val shorts = new Array[Short](wire.length / 2)
        java.nio.ByteBuffer.wrap(wire).asShortBuffer().get(shorts)
        new LocalF16(ids, shorts, dim, mode): QuantScan
      }
    new LocalQuantShards(shards.toArray)
  }

  /** Sharded int8 embedded serving; absMax is trained ONCE corpus-wide
    * (same codes as [[serveInt8]] — shard cuts never change scores). The
    * shard wire bytes ARE the packed codes: no per-shard copy. */
  def serveInt8Sharded(data: DataFrame, metric: Metric = Metric.L2,
                       maxShardElems: Long = 1L << 30,
                       absMax0: Double = Double.NaN): LocalQuantShards = {
    val (prep, mode) = prepFor(metric)
    val absMax =
      if (!absMax0.isNaN) absMax0
      else if (metric == Metric.Cosine) 1.0
      else Quantizers.int8AbsMax(data, "vector").head().getDouble(0)
    require(absMax > 0.0, s"int8 absMax must be positive; got $absMax")
    val shards = quantShards(data, prep, 1,
      (v, buf) => {
        var j = 0
        while (j < v.length) {
          var c = roundHalfAway(v(j) / absMax * 127.0)
          if (c > 127.0) c = 127.0 else if (c < -127.0) c = -127.0
          buf.put(c.toByte)
          j += 1
        }
      }, maxShardElems)
      .map { case (ids, wire, dim) =>
        new LocalI8(ids, wire, dim, absMax, mode): QuantScan
      }
    new LocalQuantShards(shards.toArray)
  }

  /** One embedded quantized scan surface — a single packed buffer
    * ([[LocalF16]] / [[LocalI8]]) or one shard of a [[LocalQuantShards]]. */
  sealed trait QuantScan {
    def size: Int
    def byteSize: Long
    def search(q: Array[Float], k0: Int,
               filter: Long => Boolean = null): Seq[(Long, Double)]
    // structure internals for composed scans ([[BinaryServe]] builds its
    // sign sketch from the stored codes and rescoring by row index)
    private[vector] def rowIds: Array[Long]
    private[vector] def rowDim: Int
    private[vector] def scanMode: Int
    /** Raw per-row accumulation (dot or squared L2) over the STORED
      * codes — the exact closure [[search]] scans with. */
    private[vector] def rowScorer(useDot: Boolean): (Array[Double], Int) => Double
    /** True iff stored element (row i, dim j) is strictly negative —
      * the sign-sketch bit source. */
    private[vector] def negAt(i: Int, j: Int): Boolean
  }

  /** Embedded quantized serving over SHARDED packed buffers, searched
    * shard-by-shard and merged by (score, id) — the [[FlatKnn
    * .LocalFlatShards]] merge, so results are bit-identical to the
    * single-buffer scans over the same frame. */
  final class LocalQuantShards private[vector] (shards: Array[QuantScan]) {
    def size: Long = shards.map(_.size.toLong).sum
    def byteSize: Long = shards.map(_.byteSize).sum
    def shardCount: Int = shards.length

    def search(q: Array[Float], k0: Int,
               filter: Long => Boolean = null): Seq[(Long, Double)] = {
      val all = shards.toSeq.flatMap(_.search(q, k0, filter))
      val sorted = all.sortBy { case (id, s) => (s, id) }
      if (k0 <= 0) sorted else sorted.take(math.min(k0, all.length))
    }
  }

  /** f16-packed embedded flat scan; search contract = [[FlatKnn.LocalFlat]]
    * over the dequantized rows (QuantServeSpec pins exact equality). */
  final class LocalF16 private[vector] (ids: Array[Long],
                                        packed: Array[Short],
                                        dim: Int, mode: Int)
      extends QuantScan {
    def size: Int = ids.length
    def byteSize: Long = ids.length * 8L + packed.length * 2L
    private[vector] def rowIds: Array[Long] = ids
    private[vector] def rowDim: Int = dim
    private[vector] def scanMode: Int = mode
    private[vector] def negAt(i: Int, j: Int): Boolean =
      f16Lut(packed(i * dim + j) & 0xffff) < 0f

    // tight per-row loops (one scorer call per ROW — the per-element
    // lambda of the first cut cost ~2x the f32 scan at 10M)
    private[vector] def rowScorer(useDot: Boolean): (Array[Double], Int) => Double = {
      val lut = f16Lut
      val p = packed
      val d = dim
      if (useDot) (qd, i) => {
        val base = i * d
        var s = 0.0
        var j = 0
        while (j < d) { s += lut(p(base + j) & 0xffff) * qd(j); j += 1 }
        s
      } else (qd, i) => {
        val base = i * d
        var s = 0.0
        var j = 0
        while (j < d) {
          val x = lut(p(base + j) & 0xffff) - qd(j)
          s += x * x
          j += 1
        }
        s
      }
    }

    def search(q: Array[Float], k0: Int,
               filter: Long => Boolean): Seq[(Long, Double)] =
      scan(ids, dim, mode, q, k0, filter, rowScorer(mode != FlatKnn.ModeL2))
  }

  /** int8-packed embedded flat scan (symmetric, codes −127..127). */
  final class LocalI8 private[vector] (ids: Array[Long],
                                       packed: Array[Byte],
                                       dim: Int, val absMax: Double,
                                       mode: Int)
      extends QuantScan {
    def size: Int = ids.length
    def byteSize: Long = ids.length * 8L + packed.length.toLong
    // code → dequantized float, as the oracle column computes it:
    // cast(code/127*absMax as float)
    private val lut: Array[Float] =
      Array.tabulate(255)(i => ((i - 127) / 127.0 * absMax).toFloat)
    private[vector] def rowIds: Array[Long] = ids
    private[vector] def rowDim: Int = dim
    private[vector] def scanMode: Int = mode
    private[vector] def negAt(i: Int, j: Int): Boolean =
      lut(packed(i * dim + j) + 127) < 0f

    private[vector] def rowScorer(useDot: Boolean): (Array[Double], Int) => Double = {
      val l = lut
      val p = packed
      val d = dim
      if (useDot) (qd, i) => {
        val base = i * d
        var s = 0.0
        var j = 0
        while (j < d) { s += l(p(base + j) + 127) * qd(j); j += 1 }
        s
      } else (qd, i) => {
        val base = i * d
        var s = 0.0
        var j = 0
        while (j < d) {
          val x = l(p(base + j) + 127) - qd(j)
          s += x * x
          j += 1
        }
        s
      }
    }

    def search(q: Array[Float], k0: Int,
               filter: Long => Boolean): Seq[(Long, Double)] =
      scan(ids, dim, mode, q, k0, filter, rowScorer(mode != FlatKnn.ModeL2))
  }

  /** Shared chunked parallel scan — [[FlatKnn.LocalFlat.search]]'s shape
    * with the ROW score abstracted: `scoreRow(qd, i)` returns the raw
    * accumulation (dot for cosine, squared distance for L2) from a tight
    * per-variant loop; this method applies the clamp / sqrt finish. One
    * indirect call per row, not per element. */
  /** Per-mode query prep, double-ized: normalize to FLOAT precision for
    * cosine (bit-identical to Metric.unit — so the contract "equals
    * servePreNorm(quantized rows) with unit(q)" holds exactly,
    * QuantServeSpec), RAW for L2 and prenorm (prenorm trusts the
    * caller's normalization, distance.go:70-81). Null for a zero-norm
    * cosine query (no meaningful nearest). */
  private[vector] def prepQueryArr(mode: Int, q: Array[Float],
                                   dim: Int): Array[Double] = {
    require(q.length == dim, s"query dim ${q.length} != index dim $dim")
    val qd = new Array[Double](dim)
    if (mode == FlatKnn.ModeCosine) {
      var n2 = 0.0
      var j = 0
      while (j < dim) { n2 += q(j).toDouble * q(j); j += 1 }
      if (n2 == 0.0) return null
      val nrm = math.sqrt(n2)
      j = 0
      while (j < dim) { qd(j) = (q(j) / nrm).toFloat.toDouble; j += 1 }
    } else {
      var j = 0
      while (j < dim) { qd(j) = q(j).toDouble; j += 1 }
    }
    qd
  }

  private[vector] def scan(ids: Array[Long], dim: Int, mode: Int,
                   q: Array[Float], k0: Int, filter: Long => Boolean,
                   scoreRow: (Array[Double], Int) => Double): Seq[(Long, Double)] = {
    if (ids.isEmpty) return Seq.empty
    val useDot = mode != FlatKnn.ModeL2
    val qd = prepQueryArr(mode, q, dim)
    if (qd == null) return Seq.empty
    val k = if (k0 <= 0) ids.length else math.min(k0, ids.length)
    val nc = math.max(Runtime.getRuntime.availableProcessors, 1)
    val merged = java.util.stream.IntStream.range(0, nc).parallel()
      .mapToObj[FlatKnn.BoundedTopK] { c =>
        val lo = (ids.length.toLong * c / nc).toInt
        val hi = (ids.length.toLong * (c + 1) / nc).toInt
        val heap = new FlatKnn.BoundedTopK(k)
        var i = lo
        while (i < hi) {
          if (filter == null || filter(ids(i))) {
            var s = scoreRow(qd, i)
            if (useDot) {
              s = 1.0 - s
              if (s < 0.0) s = 0.0 else if (s > 2.0) s = 2.0
            }
            heap.offer(s, ids(i))
          }
          i += 1
        }
        heap
      }
      .reduce(null, (a: FlatKnn.BoundedTopK, b: FlatKnn.BoundedTopK) =>
        if (a == null) b else if (b == null) a else a.absorb(b))
    if (merged == null) Seq.empty
    else if (useDot) merged.sortedEntries.map { case (s, id) => (id, s) }
    else merged.sortedEntries.map { case (s, id) => (id, math.sqrt(s)) }
  }
}
