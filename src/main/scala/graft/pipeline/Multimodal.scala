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
    StructField("feature", ArrayType(FloatType))))

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

  /** STUB frame sampling: batched per-partition "decode" producing
    * fixed-shape feature rows — the real codec call would replace
    * `fakeDecode` only; batching/partitioning/schema stay identical. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   everyNth: Int = 8, nFrames: Int = 3): DataFrame = {
    val spark = df.sparkSession
    val rows = df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .rdd.mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          fakeDecode(payload, everyNth, nFrames).zipWithIndex.map {
            case (feat, i) =>
              Row(id, i, 640, 480, feat)
          }
        }
      }
    spark.createDataFrame(rows, FrameSchema)
  }

  /** Deterministic fake decoder: "frames" are strided byte windows mapped
    * to [0,1] floats. Replace with the real codec at deployment. */
  private def fakeDecode(payload: Array[Byte], everyNth: Int,
                         nFrames: Int): Seq[Array[Float]] =
    (0 until nFrames).map { f =>
      val start = f * everyNth
      Array.tabulate(4) { j =>
        val idx = start + j
        if (idx < payload.length) (payload(idx) & 0xff) / 255.0f else 0.0f
      }
    }
}
