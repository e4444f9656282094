package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Log-structured, incrementally maintained PQ-CODED vector state — the
  * quantized sibling of [[VecLog]], completing the reference's
  * train-once-then-assign contract for its quantized index kinds:
  * `PersistentHybridIndex.Train` runs ONCE (storage.go:321-347), and
  * every flushed segment builds its vector index from the already-trained
  * template by ENCODING, never by retraining (storage.go:680-760
  * flushMemtable serializes each segment's index; pq_index.go:251-280 Add
  * = preprocess + per-subspace nearest-centroid code assignment).
  *
  * Here:
  *
  *   - the PQ codebooks (and, with `opq`, the learned rotation — riding
  *     [[Pq.Model.rotation]]'s existing encode/distTable composition)
  *     train ONCE on the corpus at seed time and persist under
  *     `dir/_model` so a reopened store never retrains;
  *   - each segment's vectors become one materialized CODED piece
  *     `(id, codes)` — a codegen [[graft.expr.CentroidKernels.pqEncode]]
  *     projection at batch cost, M bytes of code per vector at rest
  *     (the compression PQ exists for), durable as parquet when
  *     `persistDir` is set;
  *   - newest-wins `(id, upto)` markers (same delete-marker ordering as
  *     SegmentStore.read) mask replaced/deleted instances — a delete
  *     costs a marker row, never an anti-join rewrite.
  *
  * Serving is ADC over [[liveCodes]] (a codegen [[graft.expr.AdcDist]]
  * scan), optionally refined against the store's raw live vectors
  * ([[Pq.searchRefined]] — the bounded exact re-rank); with a
  * corpus-covering refine factor the leg is exhaustive-exact, so the
  * incremental state is oracle-equivalent to a flat scan of the live
  * vectors under ANY mutation history. NOT thread-safe; guard with the
  * owning store's lock.
  *
  * At 100 TB: the corpus is touched only through the M-byte code scan;
  * raw vectors are read for q·k·refineFactor rows via a
  * broadcast-semi-join-pruned scan of the segment parquet, never a
  * second full pass. Appends cost one encode projection over the batch.
  */
final class PqLog private (spark: SparkSession, val model: Pq.Model,
                           persistDir: Option[String]) {

  // (segment id, coded(id, codes)) — materialized
  private var pieces: Vector[(Long, DataFrame)] = Vector.empty
  private var markers: Option[DataFrame] = None

  private def matz(df: DataFrame): DataFrame = df.localCheckpoint(true)

  private def fsOf(path: String) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pieceDir(seg: Long): String = s"${persistDir.get}/seg=$seg"

  private def hasPiece(seg: Long): Boolean = persistDir.exists { _ =>
    fsOf(pieceDir(seg)).exists(
      new org.apache.hadoop.fs.Path(s"${pieceDir(seg)}/_SUCCESS"))
  }

  /** Encode one batch under the train-time model: [[Pq.encode]] preps in
    * the model's metric space (normalize-at-insert for cosine), rotates
    * when the model carries an OPQ rotation, and emits `(id, codes)`. */
  private def code(batch: DataFrame): DataFrame =
    Pq.encode(batch.select(col("id").cast("long").as("id"),
      col("vector")), model)

  private def matzPiece(seg: Long, coded: DataFrame): DataFrame =
    persistDir match {
      case Some(_) =>
        coded.write.mode("overwrite").parquet(pieceDir(seg))
        spark.read.parquet(pieceDir(seg)).persist()
      case None => matz(coded)
    }

  private def emptyCoded: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Array[Int])].toDF("id", "codes")
  }

  /** Live coded view: union of pieces, newest-wins via markers. */
  def liveCodes: DataFrame = {
    if (pieces.isEmpty) return emptyCoded
    val tagged = pieces.map { case (seg, df) =>
      df.withColumn("_seg", lit(seg))
    }.reduce(_ unionByName _)
    markers match {
      case Some(m) =>
        tagged.join(m, Seq("id"), "left")
          .filter(col("upto").isNull || col("_seg") > col("upto"))
          .drop("_seg", "upto")
      case None => tagged.drop("_seg")
    }
  }

  private def applyRemoval(ids: DataFrame, upto: Long): Unit = {
    val del = matz(ids.select(col("id").cast("long").as("id")).distinct())
    // marker only when something live is actually masked (append-only
    // workloads keep the marker table empty) — a pruned probe over the
    // cached piece id columns (id-clustered parquet under persistence)
    val hit = liveCodes.select(col("id"))
      .join(del, Seq("id"), "left_semi").limit(1).count()
    if (hit > 0) {
      val add = del.withColumn("upto", lit(upto))
      markers = Some(matz(markers.fold(add)(_.unionByName(add))
        .groupBy(col("id")).agg(max(col("upto")).as("upto"))))
    }
  }

  /** Fold one appended segment in at BATCH cost: encode projection +
    * marker maintenance, no retrain, no corpus rewrite. */
  def append(batch: DataFrame, seg: Long): Unit = {
    // idempotent per segment — same contract as [[VecLog.append]]
    if (pieces.exists(_._1 == seg)) return
    applyRemoval(batch.select(col("id")), upto = seg - 1)
    if (batch.columns.contains("vector")) {
      val rows = batch.filter(col("vector").isNotNull)
      val p = matzPiece(seg, code(rows))
      pieces :+= ((seg, p))
    }
  }

  def delete(ids: DataFrame, upto: Long): Unit = applyRemoval(ids, upto)

  /** Post-compaction collapse to one piece under the compacted segment
    * id; markers reset; codebooks untouched (train-time state, like the
    * reference's Flush purging soft-deleted codes while the codebooks
    * survive, pq_index_test.go:350-454). */
  def collapse(seg: Long): Unit = {
    val old = pieces
    val p = matzPiece(seg, liveCodes)
    pieces = Vector((seg, p))
    markers = None
    if (persistDir.nonEmpty) {
      old.foreach { case (_, df) => df.unpersist(); () }
      dropStalePieceDirs(keep = Set(seg))
    }
  }

  private def dropStalePieceDirs(keep: Set[Long]): Unit =
    persistDir.foreach { dir =>
      val fs = fsOf(dir)
      val root = new org.apache.hadoop.fs.Path(dir)
      if (fs.exists(root))
        fs.listStatus(root).foreach { st =>
          val n = st.getPath.getName.stripPrefix("seg=").toLongOption
          if (st.getPath.getName.startsWith("seg=") &&
              n.exists(!keep.contains(_)))
            fs.delete(st.getPath, true)
        }
    }

  /** Drop cached piece frames (durable parquet stays). */
  def release(): Unit = {
    if (persistDir.nonEmpty) pieces.foreach { case (_, df) => df.unpersist(); () }
    pieces = Vector.empty
  }

  /** Pieces currently live (observability for specs/probes). */
  def pieceCount: Int = pieces.size
}

object PqLog {
  private def modelDir(dir: String) = s"$dir/_model"

  // the model is a MULTI-dataset artifact (codebooks + optional rotation
  // + meta), so its commit marker is an explicit file above them, not a
  // parquet job's own _SUCCESS
  private def commitMarker(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(s"${modelDir(dir)}/_COMMIT")
    (p, p.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }

  private def writeModel(spark: SparkSession, dir: String,
                         model: Pq.Model): Unit = {
    import spark.implicits._
    val base = modelDir(dir)
    val cb = for {
      s <- 0 until model.m
      j <- model.codebooks(s).indices
    } yield (s, j, model.codebooks(s)(j).toSeq)
    cb.toDF("subspace", "centroid", "vec")
      .repartition(1).write.mode("overwrite").parquet(s"$base/codebooks")
    // rotation is train-time state like the codebooks; a rotation-less
    // model DELETES any stale _rotation from a lost epoch (resurrecting
    // it onto fresh codebooks would rotate queries into a space those
    // codebooks were never trained in — the same discipline as
    // [[Pq.write]] and [[VecLog]]'s _rot handling)
    model.rotation match {
      case Some(r) =>
        r.zipWithIndex.map { case (row, i) => (i, row.toSeq) }.toSeq
          .toDF("i", "vec")
          .repartition(1).write.mode("overwrite").parquet(s"$base/rotation")
      case None =>
        val p = new org.apache.hadoop.fs.Path(s"$base/rotation")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true)
    }
    Pq.writeMeta(spark, base,
      s"""{"metric":"${Pq.metricName(model.metric)}"}""")
  }

  private def readModel(spark: SparkSession,
                        dir: String): Option[Pq.Model] = {
    val (marker, fs) = commitMarker(spark, dir)
    if (!fs.exists(marker)) return None
    val base = modelDir(dir)
    val rows = spark.read.parquet(s"$base/codebooks")
      .select(col("subspace"), col("centroid"), col("vec")).collect()
    if (rows.isEmpty) return None
    val m = rows.iterator.map(_.getInt(0)).max + 1
    val ksub = rows.iterator.map(_.getInt(1)).max + 1
    val codebooks = Array.ofDim[Array[Float]](m, ksub)
    rows.foreach { r =>
      codebooks(r.getInt(0))(r.getInt(1)) = r.getSeq[Float](2).toArray
    }
    val met = Pq.requiredMetric(spark, base)
    val rotP = new org.apache.hadoop.fs.Path(s"$base/rotation/_SUCCESS")
    val rot =
      if (rotP.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .exists(rotP))
        Some(spark.read.parquet(s"$base/rotation").orderBy(col("i"))
          .collect().map(_.getSeq[Float](1).toArray))
      else None
    Some(Pq.Model(m, ksub, codebooks(0)(0).length, codebooks, met, rot))
  }

  /** Open a log over a store's live segments: the model loads from the
    * persisted artifact (or trains ONCE on `trainOn` and persists);
    * per-segment coded pieces load where durable, and only segments
    * without one pay the encode projection. Mirrors [[VecLog.reopen]].
    *
    * The PERSISTED model is authoritative: `m`/`ksub` apply only when no
    * artifact exists yet — a reopened store serves the codebooks its
    * pieces were coded against (changing the code shape on an existing
    * store requires an explicit rebuild; anything else would silently
    * mix two quantizers over the same pieces). The reopen GUARD MATRIX
    * however covers every piece of codebook state that changes what the
    * codes MEAN:
    *
    *   - METRIC: PQ codebooks score in the metric space they were
    *     trained in (ADC distances are centroid distances in that
    *     space), so a store reconfigured to a different metric — not
    *     merely a different train space — would silently serve ADC
    *     scores from the wrong geometry; the mismatch throws. (Stricter
    *     than [[VecLog]]'s train-space guard: IVF centroids only ROUTE,
    *     PQ codebooks SCORE.)
    *   - OPQ both directions: codes were assigned in rotated space (or
    *     not); a configuration flip would encode new pieces in one
    *     space and serve old pieces from the other.
    *
    * Retrain commit protocol (the [[VecLog]] crash-window discipline):
    * surviving piece `_SUCCESS` markers are invalidated BEFORE the model
    * write, and the model's `_COMMIT` marker is withheld until every
    * piece has been re-encoded — any crash point lands on
    * retrain-or-re-encode, never a silently-mixed quantizer. */
  def reopen(spark: SparkSession, persistDir: String, segs: Seq[Long],
             segVec: Long => DataFrame, markers: Option[DataFrame],
             trainOn: => DataFrame, m: Int = 0, ksub: Int = 256,
             maxIter: Int = 20, metric: Metric = Metric.L2,
             opq: Boolean = false): PqLog = {
    val (model, retrained) = readModel(spark, persistDir) match {
      case Some(persisted) =>
        if (persisted.metric != metric)
          throw new IllegalStateException(
            s"incremental PQ log at $persistDir was trained under " +
              s"${persisted.metric} but the store is configured for " +
              s"$metric — PQ codebooks are train-time state that SCORE " +
              "in their training space (pq_index.go:193-247); rebuild " +
              "the store (or delete its _pq dir) to retrain under the " +
              "new metric")
        if (opq && persisted.rotation.isEmpty)
          throw new IllegalStateException(
            s"incremental PQ log at $persistDir was trained WITHOUT an " +
              "OPQ rotation but the store is configured with opq — the " +
              "rotation is train-time state; rebuild the store (or " +
              "delete its _pq dir) to retrain with OPQ")
        if (!opq && persisted.rotation.nonEmpty)
          throw new IllegalStateException(
            s"incremental PQ log at $persistDir carries an OPQ rotation " +
              "but the store is configured without opq — rebuild the " +
              "store (or delete its _pq dir) to retrain unrotated, or " +
              "restore the opq configuration")
        (persisted, false)
      case None =>
        val train = trainOn
        val m0 =
          if (m > 0) m
          else Pq.defaultParams(
            train.select(size(col("vector"))).head().getInt(0))._1
        val fresh =
          if (opq) Pq.trainOpq(train, m0, ksub, maxIter, metric = metric)
          else Pq.train(train, m0, ksub, maxIter, metric)
        // invalidate every surviving piece marker BEFORE the model write:
        // pieces still coded under the LOST codebooks must never be
        // trusted once a new model exists (covers the instant between
        // the codebook parquet commit and the _COMMIT withhold below)
        segs.foreach { seg =>
          val pm = new org.apache.hadoop.fs.Path(
            s"$persistDir/seg=$seg/_SUCCESS")
          pm.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(pm, false)
        }
        // write the model UNCOMMITTED — _COMMIT lands only after every
        // piece below has been re-encoded; until then a crash anywhere
        // just retrains on the next open (deterministic k-means, so the
        // wasted work is bounded and the outcome identical)
        writeModel(spark, persistDir, fresh)
        val (marker, fs) = commitMarker(spark, persistDir)
        fs.delete(marker, false)
        (fresh, true)
    }
    val log = new PqLog(spark, model, Some(persistDir))
    // reclaim pieces of segments that no longer exist (foreign compaction)
    log.dropStalePieceDirs(segs.toSet)
    segs.foreach { n =>
      // a RETRAINED model must not trust any surviving piece dir: those
      // codes belong to a LOST quantizer (same reasoning as
      // [[VecLog.reopen]]); re-encode everything, matzPiece overwrites
      if (!retrained && log.hasPiece(n)) {
        log.pieces :+= ((n, spark.read.parquet(log.pieceDir(n)).persist()))
      } else {
        val frame = segVec(n)
        if (frame.columns.contains("vector")) {
          val rows = frame.filter(col("vector").isNotNull)
          log.pieces :+= ((n, log.matzPiece(n, log.code(rows))))
        }
      }
    }
    log.markers = markers.map(log.matz)
    if (retrained) {
      // every piece is now coded under the new model — commit it
      val (marker, fs) = commitMarker(spark, persistDir)
      fs.create(marker, true).close()
    }
    log
  }
}
