package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata. The decode step is a clearly-marked deterministic
  * STUB (the real image/audio codecs are not in this container); the
  * Spark-side contract — schema, batched per-partition processing,
  * partitioning — is real.
  */
object Multimodal {

  val FrameSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("f0", DoubleType),
    StructField("f1", DoubleType),
    StructField("f2", DoubleType),
    StructField("f3", DoubleType)))

  /** Treat a string column as an opaque binary payload and extract typed
    * metadata. With real media this is where EXIF/container headers would
    * be parsed; octet length and content hash are format-agnostic. */
  def binaryMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val bin = col(payloadCol).cast("binary")
    df.select(
      col(idCol),
      length(bin).cast("long").as("n_bytes"),
      md5(bin).as("content_hash"),
      // STUB decode: dimensions derived deterministically from the payload
      // size, standing in for a real header parse.
      (length(bin) % 640).cast("long").as("fake_width"),
      (length(bin) % 480).cast("long").as("fake_height"))
  }

  val PatchSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("patch_idx", IntegerType),
    StructField("x", IntegerType),
    StructField("y", IntegerType),
    StructField("pw", IntegerType),
    StructField("ph", IntegerType),
    StructField("p_mean", DoubleType)))

  /** STUB patch extraction: a `grid × grid` tiling of the fake 640×480
    * image with one pooled feature per patch — the resize/patch step of a
    * vision-training pipeline. Same contract as [[sampleFrames]]: the
    * pixel read is a deterministic stand-in, the per-partition batching,
    * coordinates, and schema are the real thing. */
  def gridPatches(df: DataFrame, idCol: String, payloadCol: String,
                  grid: Int = 2): DataFrame = {
    val spark = df.sparkSession
    val (pw, ph) = (640 / grid, 480 / grid)
    val rows = df.select(col(idCol).cast("long"), col(payloadCol).cast("string"))
      .rdd.mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getString(1)
          (0 until grid * grid).map { p =>
            var sum = 0.0
            var j = 0
            while (j < 4) {
              val idx = p * 4 + j
              sum += (if (idx < payload.length)
                        (payload.charAt(idx).toInt % 256) / 255.0
                      else 0.0)
              j += 1
            }
            Row(id, p, (p % grid) * pw, (p / grid) * ph, pw, ph,
              math.rint(sum / 4.0 * 1e6) / 1e6)
          }
        }
      }
    spark.createDataFrame(rows, PatchSchema)
  }

  /** STUB frame sampling: batched per-partition "decode" producing
    * fixed-shape feature rows — the real codec call would replace
    * `fakeDecode` only; batching/partitioning/schema stay identical.
    * Features come out as SCALAR columns (f0..f3, rounded to 6 dp) so the
    * result is totally orderable and cross-engine comparable. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   everyNth: Int = 8, nFrames: Int = 3): DataFrame = {
    val spark = df.sparkSession
    val rows = df.select(col(idCol).cast("long"), col(payloadCol).cast("string"))
      .rdd.mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getString(1)
          fakeDecode(payload, everyNth, nFrames).zipWithIndex.map {
            case (feat, i) =>
              Row(id, i, 640, 480, feat(0), feat(1), feat(2), feat(3))
          }
        }
      }
    spark.createDataFrame(rows, FrameSchema)
  }

  val AudioWindowSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("win_idx", IntegerType),
    StructField("start_sample", IntegerType),
    StructField("n_samples", IntegerType),
    StructField("energy", DoubleType),
    StructField("peak", DoubleType)))

  /** STUB audio feature extraction: overlapping windows with a hop (the
    * STFT-frame shape of an audio-training pipeline) over the payload
    * treated as fake PCM samples in [-1, 1]. Per window: mean-square
    * energy and absolute peak. The "sample read" is the deterministic
    * stand-in; the windowing (length/hop/truncated tail), per-partition
    * batching, and fixed-shape schema are the real contract a codec
    * drop-in inherits. */
  def audioWindows(df: DataFrame, idCol: String, payloadCol: String,
                   winLen: Int = 16, hop: Int = 8,
                   nWindows: Int = 4): DataFrame = {
    val spark = df.sparkSession
    val rows = df.select(col(idCol).cast("long"), col(payloadCol).cast("string"))
      .rdd.mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getString(1)
          (0 until nWindows).map { w =>
            val start = w * hop
            var energy = 0.0
            var peak = 0.0
            var n = 0
            var j = 0
            while (j < winLen) {
              val idx = start + j
              if (idx < payload.length) {
                // fake PCM: code unit mapped to [-1, 1]
                val s = (payload.charAt(idx).toInt % 256) / 127.5 - 1.0
                energy += s * s
                if (math.abs(s) > peak) peak = math.abs(s)
                n += 1
              }
              j += 1
            }
            Row(id, w, start, n,
              math.rint((if (n == 0) 0.0 else energy / n) * 1e6) / 1e6,
              math.rint(peak * 1e6) / 1e6)
          }
        }
      }
    spark.createDataFrame(rows, AudioWindowSchema)
  }

  /** Deterministic fake decoder: "frames" are strided code-unit windows
    * mapped to [0,1] (stand-in for pixel bytes). Replace with the real
    * codec at deployment. */
  private def fakeDecode(payload: String, everyNth: Int,
                         nFrames: Int): Seq[Array[Double]] =
    (0 until nFrames).map { f =>
      val start = f * everyNth
      Array.tabulate(4) { j =>
        val idx = start + j
        if (idx < payload.length)
          math.rint((payload.charAt(idx).toInt % 256) / 255.0 * 1e6) / 1e6
        else 0.0
      }
    }
}
