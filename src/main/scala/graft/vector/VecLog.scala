package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Log-structured, incrementally maintained IVF vector state — the vector
  * twin of [[graft.text.BM25Log]], mirroring the reference's
  * train-once-then-assign contract: `PersistentHybridIndex.Train` runs
  * ONCE (storage.go:321-347), and every flushed segment builds its vector
  * index from the already-trained template by ASSIGNMENT, never by
  * retraining (storage.go:680-760 flushMemtable; ivf_index.go:251-280
  * Add = preprocess + nearest-centroid).
  *
  * Without this, a store facade re-trains its vector leg once per
  * mutation generation — O(corpus · nlist · iters) after every append.
  * Here:
  *
  *   - the k-means model trains ONCE, on the corpus at seed time, and is
  *     persisted next to the pieces (`dir/_model`) so a reopened store
  *     never retrains (centroid drift under heavy adds is handled by an
  *     explicit rebuild, the reference's own retrain guidance);
  *   - each segment's vectors become one materialized ASSIGNED piece
  *     `(id, vector, cluster)` — a codegen nearest-centroid projection at
  *     batch cost, durable as parquet when `persistDir` is set;
  *   - newest-wins `(id, upto)` markers (same delete-marker ordering as
  *     SegmentStore.read) mask replaced/deleted instances — a delete
  *     costs a marker row, never an anti-join rewrite.
  *
  * [[leg]] exposes the live view as a ready `Ivf.Index`; at probe-all the
  * search is exhaustive-exact, so the incremental state is
  * oracle-equivalent to a flat scan over the live vectors under ANY
  * mutation history. NOT thread-safe; guard with the owning store's lock.
  */
final class VecLog private (spark: SparkSession, val model: Kmeans.Model,
                            val metric: Metric,
                            persistDir: Option[String],
                            val rotation: Option[Array[Array[Float]]] = None) {

  // (segment id, assigned(id, vector, cluster)) — materialized
  private var pieces: Vector[(Long, DataFrame)] = Vector.empty
  private var markers: Option[DataFrame] = None

  private def matz(df: DataFrame): DataFrame = df.localCheckpoint(true)

  /** Free the cached blocks behind a frame this log materialized.
    * Durable pieces are `.persist()`ed parquet reads (cache-manager
    * unpersist); non-durable pieces and EVERY marker/scratch frame are
    * `localCheckpoint`ed, whose blocks only the ContextCleaner would
    * eventually reclaim — a long-lived in-memory store with churn
    * accumulates them (ADVICE r15), so the checkpointed RDD is
    * unpersisted explicitly. */
  private def free(df: DataFrame): Unit = graft.core.Frames.free(df)

  private def fsOf(path: String) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pieceDir(seg: Long): String = s"${persistDir.get}/seg=$seg"

  private def hasPiece(seg: Long): Boolean = persistDir.exists { _ =>
    fsOf(pieceDir(seg)).exists(
      new org.apache.hadoop.fs.Path(s"${pieceDir(seg)}/_SUCCESS"))
  }

  private def assign(batch: DataFrame): DataFrame = {
    val prepped = Pq.prepData(batch.select(col("id").cast("long").as("id"),
      col("vector")), metric)
    // OPQ composition point (mirrors IvfPq.buildOpq): the coarse
    // quantizer was trained in the ROTATED space, so assignment routes
    // the rotated vector through the codegen kernels; the STORED vector
    // stays original (scoring space untouched — see [[index]])
    val routed = rotation match {
      case Some(r) => graft.expr.CentroidKernels.nearestCentroid(
        graft.expr.CentroidKernels.rotateVec(col("vector"), r),
        model.centroids)
      case None => graft.expr.CentroidKernels.nearestCentroid(
        col("vector"), model.centroids)
    }
    prepped.withColumn("cluster", routed)
  }

  private def matzPiece(seg: Long, assigned: DataFrame): DataFrame =
    persistDir match {
      case Some(_) =>
        assigned.write.mode("overwrite").parquet(pieceDir(seg))
        spark.read.parquet(pieceDir(seg)).persist()
      case None => matz(assigned)
    }

  private def emptyAssigned: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Array[Float], Int)].toDF("id", "vector", "cluster")
  }

  /** Live assigned view: union of pieces, newest-wins via markers. */
  def liveAssigned: DataFrame = {
    if (pieces.isEmpty) return emptyAssigned
    val tagged = graft.core.Frames.balancedUnion(
      pieces.map { case (seg, df) => df.withColumn("_seg", lit(seg)) })
    markers match {
      case Some(m) =>
        tagged.join(m, Seq("id"), "left")
          .filter(col("upto").isNull || col("_seg") > col("upto"))
          .drop("_seg", "upto")
      case None => tagged.drop("_seg")
    }
  }

  /** The live state as a servable IVF index (probe-all = exhaustive).
    *
    * Under OPQ the served model carries BACK-ROTATED centroids: for an
    * orthogonal R, `argmin_i ||Rx − c_i|| == argmin_i ||x − Rᵀc_i||`, so
    * queries route consistently with the rotated-space assignment while
    * never being rotated themselves — stored vectors and scores are
    * bit-identical to the rotation-less leg (rotations are L2-preserving,
    * which also means plain-IVF recall is unchanged by OPQ; the value of
    * the composition is the persisted-rotation plumbing and guard parity
    * with [[IvfPq.buildOpq]], which a quantized leg reuses). */
  def index: Ivf.Index = Ivf.Index(liveAssigned, servedModel, metric)

  private lazy val servedModel: Kmeans.Model = rotation match {
    case Some(r) =>
      Kmeans.Model(model.centroids.map(c => Pq.applyRotationT(r, c)))
    case None => model
  }

  private def applyRemoval(ids: DataFrame, upto: Long,
                           liveHit: Option[Boolean]): Unit = {
    // the owning facade's SHARED verdict (one probe per mutation, not
    // one per leg — VERDICT r15): false is EXACT (the probed superset —
    // raw store segment ids — held no instance, so this leg holds none
    // either) and skips with zero jobs; true is a SUPERSET verdict (the
    // instance found may be masked or vector-less here), so the marker
    // written below may mask nothing — harmless: markers only act on
    // matching piece rows from segments <= upto
    if (liveHit.contains(false)) return
    val del = matz(ids.select(col("id").cast("long").as("id")).distinct())
    // unshared path: marker only when something live is actually masked
    // (append-only workloads keep the marker table empty) — probe the
    // cached piece id columns, a pruned scan
    val hit = liveHit.getOrElse(liveAssigned.select(col("id"))
      .join(del, Seq("id"), "left_semi").limit(1).count() > 0)
    if (hit) {
      val add = del.withColumn("upto", lit(upto))
      val old = markers
      markers = Some(matz(markers.fold(add)(_.unionByName(add))
        .groupBy(col("id")).agg(max(col("upto")).as("upto"))))
      // the new frame is eagerly materialized, so the superseded one's
      // checkpoint blocks are dead weight from here on
      old.foreach(free)
    }
    free(del)
  }

  /** Fold one appended segment in at BATCH cost: assignment projection +
    * marker maintenance, no retrain, no corpus rewrite. `liveHit` is the
    * owning facade's shared replacement-probe verdict (see
    * [[applyRemoval]]); standalone callers leave it None. */
  def append(batch: DataFrame, seg: Long,
             liveHit: Option[Boolean] = None): Unit = {
    // Idempotent per segment: a concurrent first search can seed the log
    // (reopen covers every store segment, including one whose writer has
    // flushed but not yet folded) between the store write and this fold —
    // folding it AGAIN would duplicate its assigned rows. A vector-less
    // batch leaves no piece, but its removal probe below is masked-aware
    // and re-applies as a no-op, so the piece check alone is sufficient.
    if (pieces.exists(_._1 == seg)) return
    applyRemoval(batch.select(col("id")), upto = seg - 1, liveHit)
    if (batch.columns.contains("vector")) {
      val rows = batch.filter(col("vector").isNotNull)
      val p = matzPiece(seg, assign(rows))
      pieces :+= ((seg, p))
    }
  }

  def delete(ids: DataFrame, upto: Long,
             liveHit: Option[Boolean] = None): Unit =
    applyRemoval(ids, upto, liveHit)

  /** Post-compaction collapse to one piece under the compacted segment
    * id; markers reset; centroids untouched (train-time state, like the
    * reference's Flush). */
  def collapse(seg: Long): Unit = {
    val old = pieces
    val oldMarkers = markers
    val p = matzPiece(seg, liveAssigned)
    pieces = Vector((seg, p))
    markers = None
    // free superseded frames in BOTH modes — non-durable pieces are
    // checkpoint blocks the ContextCleaner would otherwise sit on
    // (durable pieces only lose their cache here: an in-flight search
    // frame recomputes from the parquet, which survives one cycle below)
    old.foreach { case (_, df) => free(df) }
    oldMarkers.foreach(free)
    // one-cycle deferral, mirroring SegmentStore's retirement manifests:
    // the JUST-superseded piece dirs stay on disk so a search frame
    // planned before this compaction still collects; anything older
    // (the previous collapse's retirees, crash leftovers) is past its
    // grace window and deleted now
    if (persistDir.nonEmpty)
      dropStalePieceDirs(keep = old.map(_._1).toSet + seg)
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

  /** Drop cached piece and marker frames. With `vacuumStale` (the
    * facade's WRITER close path, mirroring SegmentStore.close's vacuum
    * — ADVICE r18 #5), piece dirs superseded by a collapse are also
    * deleted (keep = current pieces only): without it a store closed
    * after one compaction leaves the one-cycle-deferred dirs on disk
    * until some future process compacts again. Pure readers pass
    * `false` — deleting shared bytes is the owner's call. */
  def release(vacuumStale: Boolean = false): Unit = {
    if (vacuumStale && persistDir.nonEmpty)
      dropStalePieceDirs(keep = pieces.map(_._1).toSet)
    pieces.foreach { case (_, df) => free(df) }
    pieces = Vector.empty
    markers.foreach(free)
    markers = None
  }

  /** Pieces currently live (observability for specs/probes). */
  def pieceCount: Int = pieces.size

  /** Marker-table row count (observability: append-only histories must
    * keep this at zero — the facade's shared liveness probe contract). */
  private[graft] def markerRows: Long = markers.map(_.count()).getOrElse(0L)
}

object VecLog {
  private def modelDir(dir: String) = s"$dir/_model"
  private def rotDir(dir: String) = s"$dir/_rot"

  private def modelMarker(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(s"${modelDir(dir)}/_SUCCESS")
    (p, p.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }

  private def writeRot(spark: SparkSession, dir: String,
                       r: Array[Array[Float]]): Unit = {
    import spark.implicits._
    r.zipWithIndex.map { case (row, i) => (i, row.toSeq) }.toSeq
      .toDF("i", "vec")
      .repartition(1).write.mode("overwrite").parquet(rotDir(dir))
  }

  private def readRot(spark: SparkSession,
                      dir: String): Option[Array[Array[Float]]] = {
    val p = new org.apache.hadoop.fs.Path(s"${rotDir(dir)}/_SUCCESS")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    Some(spark.read.parquet(rotDir(dir)).orderBy(col("i"))
      .collect().map(_.getSeq[Float](1).toArray))
  }

  /** The train-time preprocessing space a metric implies. Metrics in the
    * same space share centroids and assigned pieces: the cosine family
    * clusters unit-normalized vectors ([[Pq.prepData]] normalizes at
    * insert for Cosine; CosinePreNorm inputs arrive already unit), while
    * L2/L2Sq/DotSim cluster the raw vectors. Cross-space reuse is the
    * silent-recall-loss failure [[reopen]] guards against. */
  private def trainSpace(m: Metric): String = m match {
    case Metric.Cosine | Metric.CosinePreNorm => "unit"
    case _                                    => "raw"
  }

  private def writeModel(spark: SparkSession, dir: String,
                         model: Kmeans.Model, metric: Metric): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, c, Pq.metricName(metric)) }.toSeq
      .toDF("cid", "vector", "metric")
      .repartition(1).write.mode("overwrite").parquet(modelDir(dir))
  }

  private def readModel(spark: SparkSession,
                        dir: String): Option[(Kmeans.Model, Metric)] = {
    val p = new org.apache.hadoop.fs.Path(s"${modelDir(dir)}/_SUCCESS")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val rows = spark.read.parquet(modelDir(dir))
      .orderBy(col("cid")).collect()
    if (rows.isEmpty) return None
    val cents = rows.map(_.getSeq[Float](1).toArray)
    Some((Kmeans.Model(cents), Pq.metricOf(rows.head.getString(2))))
  }

  /** Open a log over a store's live segments: the model loads from the
    * persisted artifact (or trains ONCE on `trainOn` and persists);
    * per-segment assigned pieces load where durable, and only segments
    * without one pay the assignment projection. Mirrors
    * [[graft.text.BM25Log.reopen]].
    *
    * The PERSISTED model is authoritative: `nlist` applies only when no
    * artifact exists yet — a reopened store serves the lists its pieces
    * were assigned against (changing list count on an existing store
    * requires an explicit rebuild, the reference's own retrain guidance;
    * anything else would silently mix two coarse quantizers over the
    * same pieces). The requested `metric` however is VERIFIED against
    * the persisted one: a store reconfigured into a different training
    * space (cosine over an L2-trained model, or vice versa) would
    * silently route queries through centroids trained on the wrong
    * geometry — degraded recall with no error — so the mismatch throws
    * (the reference fails fast on modality metric mismatch,
    * hybrid_search_index.go). */
  def reopen(spark: SparkSession, persistDir: String, segs: Seq[Long],
             segVec: Long => DataFrame, markers: Option[DataFrame],
             trainOn: => DataFrame, nlist: Int, maxIter: Int = 20,
             metric: Metric = Metric.L2, opq: Boolean = false): VecLog = {
    val (model, met, rot, retrained) = readModel(spark, persistDir) match {
      case Some((m, persisted)) =>
        if (trainSpace(persisted) != trainSpace(metric))
          throw new IllegalStateException(
            s"incremental vector log at $persistDir was trained under " +
              s"$persisted but the store is configured for $metric — the " +
              "coarse quantizer is train-time state (storage.go:321-347); " +
              "rebuild the store (or delete its _vec dir) to retrain " +
              "under the new metric")
        // the rotation is train-time state like the centroids — a store
        // reconfigured across the OPQ boundary (either direction) would
        // silently route queries through centroids trained in a space
        // the configuration does not expect, so the mismatch throws
        // exactly like the metric-space guard above
        val persistedRot = readRot(spark, persistDir)
        if (opq && persistedRot.isEmpty)
          throw new IllegalStateException(
            s"incremental vector log at $persistDir was trained WITHOUT " +
              "an OPQ rotation but the store is configured with ivfOpq — " +
              "the rotation is train-time state; rebuild the store (or " +
              "delete its _vec dir) to retrain with OPQ")
        if (!opq && persistedRot.nonEmpty)
          throw new IllegalStateException(
            s"incremental vector log at $persistDir carries an OPQ " +
              "rotation but the store is configured without ivfOpq — " +
              "rebuild the store (or delete its _vec dir) to retrain " +
              "unrotated, or restore the ivfOpq configuration")
        (m, persisted, persistedRot, false)
      case None =>
        val prepped = Pq.prepData(trainOn, metric)
        val newRot =
          if (opq) {
            val sample = Pq.opqSample(prepped, 16384)
            require(sample.nonEmpty, "OPQ training needs a non-empty corpus")
            val (m0, _) = Pq.defaultParams(sample.head.length)
            Some(Pq.learnOpqRotation(sample, m0, ksub = 256, opqIters = 8))
          } else None
        val trainData = newRot match {
          case Some(r) => prepped.select(col("id"),
            graft.expr.CentroidKernels.rotateVec(col("vector"), r)
              .as("vector"))
          case None => prepped
        }
        val m = Kmeans.train(trainData, nlist, maxIter)
        // Rotation FIRST (train-time state, read only once the model
        // marker commits); a rotation-less retrain must DELETE any stale
        // _rot from a lost epoch — resurrecting it onto fresh centroids
        // would route queries through a space they were never trained in.
        newRot match {
          case Some(r) => writeRot(spark, persistDir, r)
          case None =>
            val p = new org.apache.hadoop.fs.Path(rotDir(persistDir))
            p.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .delete(p, true)
        }
        // Invalidate every surviving piece marker BEFORE the model write:
        // pieces still assigned under the LOST quantizer must never be
        // trusted once a new model exists. This covers the instant where
        // writeModel's parquet commit creates _model/_SUCCESS before the
        // withhold below deletes it — without it, a crash inside that
        // instant would leave a committed model over stale pieces (the
        // silently-mixed-quantizer failure, ADVICE r13).
        segs.foreach { seg =>
          val pm = new org.apache.hadoop.fs.Path(
            s"$persistDir/seg=$seg/_SUCCESS")
          pm.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(pm, false)
        }
        // Write the model UNCOMMITTED — its _SUCCESS is withheld until
        // every piece below has been reassigned (committed at the end of
        // reopen). Committing first would open a crash window where the
        // next reopen reads the new model (retrained = false) and trusts
        // surviving piece dirs still assigned under the LOST quantizer —
        // the silently-mixed-quantizer failure the retrained-flag
        // reassignment exists to close. Until the marker lands, a crash
        // anywhere in the reassignment loop just retrains on the next
        // open (deterministic k-means, so the wasted work is bounded and
        // the outcome identical).
        writeModel(spark, persistDir, m, metric)
        val (marker, fs) = modelMarker(spark, persistDir)
        fs.delete(marker, false)
        (m, metric, newRot, true)
    }
    val log = new VecLog(spark, model, met, Some(persistDir), rot)
    // reclaim pieces of segments that no longer exist (foreign compaction)
    log.dropStalePieceDirs(segs.toSet)
    segs.foreach { n =>
      // a RETRAINED model (no readable artifact — first open, or a crash
      // left _model without its _SUCCESS) must not trust any surviving
      // piece dir: those assignments belong to a LOST quantizer, and the
      // live view may have changed since, so the retrained centroids can
      // differ — loading them would silently mix two coarse quantizers
      // over one store (the exact failure the metric guard above exists
      // for). Reassign everything; matzPiece overwrites the stale dirs.
      if (!retrained && log.hasPiece(n)) {
        log.pieces :+= ((n, spark.read.parquet(log.pieceDir(n)).persist()))
      } else {
        val frame = segVec(n)
        if (frame.columns.contains("vector")) {
          val rows = frame.filter(col("vector").isNotNull)
          log.pieces :+= ((n, log.matzPiece(n, log.assign(rows))))
        }
      }
    }
    log.markers = markers.map(log.matz)
    if (retrained) {
      // every piece is now assigned under the new model — commit it
      val (marker, fs) = modelMarker(spark, persistDir)
      fs.create(marker, true).close()
    }
    log
  }

  /** Ephemeral (non-persisted) log: train once on `trainOn`, seed one
    * piece from it under `seg`. */
  def fromLive(trainOn: DataFrame, seg: Long, nlist: Int,
               maxIter: Int = 20, metric: Metric = Metric.L2): VecLog = {
    val spark = trainOn.sparkSession
    val model = Kmeans.train(Pq.prepData(trainOn, metric), nlist, maxIter)
    val log = new VecLog(spark, model, metric, None)
    log.append(trainOn, seg)
    log
  }
}
