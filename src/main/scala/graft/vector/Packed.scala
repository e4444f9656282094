package graft.vector

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions.col

/** Executor-side packing for the embedded-serving collect paths.
  *
  * `serve()` is inherently single-box (the reference's standing
  * constraint — the whole index lives in one process), but HOW the data
  * crosses the wire decides the corpus size that fits. Collecting boxed
  * `Row`s costs ~3-4× the raw bytes on the driver (Row header + object
  * array + per-row vector wrapper, all resident at once beside the final
  * packed buffer) — a 10M×128-dim corpus (5.1 GB raw f32) OOMs a 30 GB
  * heap. Here each PARTITION packs its rows into one primitive
  * `(Array[Long], Array[Float])` chunk on the executor, the driver
  * collects ~numPartitions chunks (raw bytes, compact serialization) and
  * concatenates once: peak driver memory ≈ 2× raw, executors do the
  * per-row work in parallel, and the same corpus fits in ~11 GB.
  *
  * Chunk order is partition order and row order within a partition — the
  * exact order the old Row collect produced — so the packed layouts stay
  * bit-identical to the spec-pinned distributed twins.
  */
private[graft] object Packed {

  /** Collect `(id, vector)` rows as one packed id buffer + one contiguous
    * float buffer. `prep` runs per-row ON the executors (normalization for
    * cosine serving); returning null drops the row (zero-norm vectors
    * under cosine — comet rejects them at insert, distance.go:252-254).
    * Returns (ids, packed floats, dim); dim = -1 on an empty frame.
    *
    * Partitions are fetched in bounded WAVES (`sc.runJob` over partition-id
    * batches, in partition order) and copied straight into the
    * preallocated final buffers, so peak memory ≈ final buffers +
    * `spark.graft.serve.maxInFlightBytes` (default 1 GiB) of in-flight
    * chunks — independent of corpus size. A plain `collect()` of all
    * chunks holds every partition's pack + its task-result serialization
    * copy simultaneously (~3× data bytes transient): a 10M×128-dim corpus
    * (5.1 GB raw) OOMs a 16 GB heap that the wave path serves with room to
    * spare. Wave width shrinks only when chunks are big — small frames
    * still fetch in one fully-parallel wave.
    */
  def vectors(data: DataFrame, prep: Array[Float] => Array[Float] = identity)
      : (Array[Long], Array[Float], Int) = {
    sizing(data) match {
      case None => (Array.emptyLongArray, Array.emptyFloatArray, -1)
      case Some((total, estDim)) =>
        require(total * math.max(estDim, 1) <= Int.MaxValue,
          s"serve(): $total x $estDim floats exceed one contiguous JVM buffer " +
            "(the single-box single-buffer ceiling); use the sharded serving " +
            "path (FlatKnn.serveSharded) or quantize")
        val shards = assemble(data, prep, Long.MaxValue, total, estDim)
        shards.headOption
          .getOrElse((Array.emptyLongArray, Array.emptyFloatArray, -1))
    }
  }

  /** Sharded variant of [[vectors]]: the packed corpus is cut into shard
    * buffers of at most `maxShardFloats` floats each (rounded down to a
    * whole row), filled in the same wave stream. The concatenation of the
    * shard buffers is bit-identical to the single-buffer result — this is
    * how an embedded corpus grows past the JVM's 2^31-element array
    * ceiling (~16.7M rows at 128-dim) up to heap size, the reference's
    * 100M-vector single-box shape (docs/INDEX.md:712-721). */
  def vectorsSharded(data: DataFrame,
                     prep: Array[Float] => Array[Float] = identity,
                     maxShardFloats: Long = 1L << 30)
      : Seq[(Array[Long], Array[Float], Int)] =
    sizing(data) match {
      case None => Seq.empty
      case Some((total, estDim)) =>
        assemble(data, prep, maxShardFloats, total, estDim)
    }

  /** Collect ONE long column as a primitive array with no boxed Row per
    * element: each partition packs into a long[] chunk on the executor,
    * the driver concatenates (~2x data bytes transient — 80 MB final at
    * 10M ids). The packed-meta path for id-only embedded serving
    * handles ([[graft.hybrid.Hybrid.serveModal]]). */
  def longs(data: DataFrame): Array[Long] = {
    import data.sparkSession.implicits._
    val colName = data.columns.head
    // boxed-Long decode so a null/uncastable id fails with a NAMED error
    // (the bare Long encoder dies in codegen with an anonymous NPE);
    // boxing here is transient per row — the RETAINED structure is still
    // one primitive chunk per partition
    val chunks = data
      .select(col(colName).cast("long")).as[java.lang.Long]
      .rdd.mapPartitions { it =>
        val b = new scala.collection.mutable.ArrayBuilder.ofLong
        while (it.hasNext) {
          val v = it.next()
          if (v == null) throw new IllegalArgumentException(
            s"null or non-numeric '$colName' in packed id collect " +
              "(every served document needs a numeric id)")
          b += v.longValue()
        }
        val a = b.result()
        if (a.isEmpty) Iterator.empty else Iterator.single(a)
      }.collect()
    val out = new Array[Long](chunks.iterator.map(_.length).sum)
    var off = 0
    chunks.foreach { c => System.arraycopy(c, 0, out, off, c.length); off += c.length }
    out
  }

  /** Sizing pre-pass: row count (column-pruned — no vector decode) + the
    * first row's dim. dim is only an ESTIMATE for wave sizing; the
    * authoritative dim comes from the packed chunks. None on empty. */
  private def sizing(data: DataFrame): Option[(Long, Int)] = {
    val total = data.count()
    if (total == 0) None
    else Some((total,
      data.select(org.apache.spark.sql.functions.size(col("vector")))
        .head().getInt(0)))
  }

  private def assemble(data: DataFrame,
                       prep: Array[Float] => Array[Float],
                       maxShardFloats: Long,
                       total: Long, estDim: Int)
      : Seq[(Array[Long], Array[Float], Int)] = {
    import data.sparkSession.implicits._
    val spark = data.sparkSession
    val src = data.select(col("id").cast("long"), col("vector"))
      .as[(Long, Array[Float])]
    val rdd = src.rdd.mapPartitions { it =>
      var dim = -1
      val ids = new scala.collection.mutable.ArrayBuilder.ofLong
      val vecs = new scala.collection.mutable.ArrayBuilder.ofFloat
      while (it.hasNext) {
        val (id, raw) = it.next()
        val v = prep(raw)
        if (v != null) {
          if (dim < 0) dim = v.length
          ids += id
          vecs ++= v
        }
      }
      val ia = ids.result()
      if (ia.isEmpty) Iterator.empty
      else Iterator.single((dim, ia, vecs.result()))
    }
    val sc = spark.sparkContext
    val nParts = math.max(rdd.partitions.length, 1)
    // default scales with the driver heap: an 8 GB driver budgets 1 GiB of
    // in-flight chunks, a 64 GB one 8 GiB — wave width (and so decode
    // parallelism) grows with the memory that can absorb it
    val maxInFlight = spark.conf.getOption("spark.graft.serve.maxInFlightBytes")
      .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
      .getOrElse(math.max(1L << 30, Runtime.getRuntime.maxMemory / 8))
    // ~2.5× a partition's raw bytes are live while it packs + ships
    // (builder growth + the task-result serialization copy)
    val partBytes = math.max(total.toDouble / nParts * (estDim * 4L + 8L), 1.0)
    val wave = math.max(1, math.min(nParts, (maxInFlight / (2.5 * partBytes)).toInt))

    // shard assembly state: rows stream into the current shard, cutting a
    // new one when full; a chunk may straddle a shard boundary (split copy)
    val done = scala.collection.mutable.ArrayBuffer.empty[(Array[Long], Array[Float], Int)]
    var dim = -1
    var shardRows = 0  // row capacity of a full shard, set from first chunk
    var remaining = total  // rows not yet placed (upper bound under prep drops)
    var ids: Array[Long] = null
    var packed: Array[Float] = null
    var off = 0
    def openShard(): Unit = {
      val rows = math.min(remaining, shardRows.toLong).toInt
      ids = new Array[Long](rows)
      packed = new Array[Float](rows * dim)
      off = 0
    }
    def closeShard(): Unit = {
      if (ids != null && off > 0) {
        done += ((
          if (off == ids.length) ids else java.util.Arrays.copyOf(ids, off),
          if (off == ids.length) packed
          else java.util.Arrays.copyOf(packed, off * dim),
          dim))
      }
      ids = null; packed = null; off = 0
    }
    (0 until nParts).grouped(wave).foreach { batch =>
      val results = sc.runJob(rdd,
        (it: Iterator[(Int, Array[Long], Array[Float])]) => it.toSeq.headOption,
        batch)
      results.foreach(_.foreach { case (d, ia, va) =>
        if (dim < 0) {
          dim = d
          shardRows = math.max(1L, math.min(maxShardFloats / d, Int.MaxValue / math.max(d, 1))).toInt
          openShard()
        }
        var copied = 0
        while (copied < ia.length) {
          if (off == ids.length) { closeShard(); openShard() }
          val take = math.min(ia.length - copied, ids.length - off)
          System.arraycopy(ia, copied, ids, off, take)
          System.arraycopy(va, copied * dim, packed, off * dim, take * dim)
          off += take
          copied += take
          remaining -= take
        }
      })
    }
    closeShard()
    done.toSeq
  }

  private val codeChunkEnc = Encoders.tuple(
    Encoders.BINARY, Encoders.BINARY, Encoders.BINARY)

  /** Collect `(id, codes[, cluster])` PQ rows as packed primitive arrays:
    * ids, byte codes (m per row), and — when `withCluster` — the int
    * cluster assignments. Codes arrive as `array<int>` (the distributed
    * encode column) and are narrowed to bytes on the executor. */
  def codes(encoded: DataFrame, m: Int, withCluster: Boolean = false)
      : (Array[Long], Array[Byte], Array[Int]) = {
    import encoded.sparkSession.implicits._
    val cols =
      if (withCluster)
        encoded.select(col("id").cast("long"), col("codes"),
          col("cluster").cast("int"))
      else
        encoded.select(col("id").cast("long"), col("codes"),
          org.apache.spark.sql.functions.lit(0).as("cluster"))
    val ds = cols.as[(Long, Array[Int], Int)]
    val chunks = ds.mapPartitions { it =>
      val ids = new scala.collection.mutable.ArrayBuilder.ofLong
      val codes = new scala.collection.mutable.ArrayBuilder.ofByte
      val clusters = new scala.collection.mutable.ArrayBuilder.ofInt
      while (it.hasNext) {
        val (id, cs, cl) = it.next()
        ids += id; clusters += cl
        var j = 0
        while (j < m) { codes += cs(j).toByte; j += 1 }
      }
      val ia = ids.result()
      if (ia.isEmpty) Iterator.empty
      else Iterator.single(
        (longsToBytes(ia), codes.result(), intsToBytes(clusters.result())))
    }(codeChunkEnc).collect()

    var n = 0
    chunks.foreach(c => n += c._1.length / 8)
    val ids = new Array[Long](n)
    val codes = new Array[Byte](n * m)
    val clusters = new Array[Int](n)
    var io = 0; var co = 0; var ko = 0
    chunks.foreach { case (ib, cb, kb) =>
      io = bytesToLongs(ib, ids, io)
      System.arraycopy(cb, 0, codes, co, cb.length); co += cb.length
      ko = bytesToInts(kb, clusters, ko)
    }
    (ids, codes, clusters)
  }

  private def longsToBytes(a: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(a.length * 8)
    bb.asLongBuffer().put(a)
    bb.array()
  }
  private def intsToBytes(a: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(a.length * 4)
    bb.asIntBuffer().put(a)
    bb.array()
  }
  private def bytesToLongs(b: Array[Byte], out: Array[Long], off: Int): Int = {
    val lb = java.nio.ByteBuffer.wrap(b).asLongBuffer()
    val n = lb.remaining()
    lb.get(out, off, n)
    off + n
  }
  private def bytesToInts(b: Array[Byte], out: Array[Int], off: Int): Int = {
    val ib = java.nio.ByteBuffer.wrap(b).asIntBuffer()
    val n = ib.remaining()
    ib.get(out, off, n)
    off + n
  }
}
