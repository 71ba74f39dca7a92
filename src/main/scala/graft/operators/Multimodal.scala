package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus the decode / feature-extract plumbing
  * a training-data pipeline needs.
  *
  * The actual codecs (JPEG/PNG/audio decode) are NOT in this container, so
  * the decode step is a clearly-marked deterministic STUB (`decodeStub`)
  * — what is real and tested is the Spark-side shape of the operator: the
  * binary column schema, typed output rows, per-partition batched
  * execution (`mapPartitions`, the Scala analog of `mapInPandas` batch
  * processing), and partition sizing so one task never holds more than a
  * bounded number of payload bytes.
  */
object Multimodal {

  /** Typed metadata extracted from a binary media payload. */
  case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      format: String,
      width: Int,
      height: Int,
      checksum: String)

  /** Column-level metadata: byte length + magic-prefix format sniff +
    * content hash. Pure expressions — codegen'd, no decode needed. This is
    * the cheap pass that runs on all 100 TB before any decode. */
  def binaryMeta(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      octet_length(col(binCol)).cast("long").as("n_bytes"),
      hex(substring(col(binCol), 1, 4)).as("magic_hex"),
      md5(col(binCol)).as("checksum"),
      when(hex(substring(col(binCol), 1, 2)) === "FFD8", "jpeg")
        .when(hex(substring(col(binCol), 1, 4)) === "89504E47", "png")
        .otherwise("unknown").as("format"))

  /** ===== STUB ===== deterministic fake decode: derives plausible
    * dimensions from the payload bytes instead of decoding them. Replace
    * with a real codec (e.g. javax.imageio / ffmpeg bindings) in a
    * deployment that has the libraries. */
  def fakeDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = if (bytes == null) 0 else bytes.length
    val h = bytes.take(16).foldLeft(17L)((acc, b) => acc * 31 + (b & 0xff))
    MediaMeta(
      doc_id = id,
      n_bytes = n.toLong,
      format = if (n % 2 == 0) "jpeg" else "png",
      width = 64 + (h % 576).toInt.abs,
      height = 64 + ((h / 576) % 416).toInt.abs,
      checksum = f"${h}%016x")
  }

  /** The decode operator: per-partition batched decode of binary payloads
    * into typed metadata. `mapPartitions` keeps decoder init (a real codec
    * would load native libs) per-task not per-row, and the input should be
    * pre-repartitioned so Σbytes per partition is bounded (see
    * `repartitionByBytes`). */
  def decodeMeta(spark: SparkSession, df: DataFrame, idCol: String,
                 binCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => fakeDecode(id, bytes) } }
  }

  /** Typed output of [[extractFeaturesStub]]: fixed-dim embedding per doc. */
  case class MediaFeatures(doc_id: Long, dim: Int, embedding: Seq[Float])

  /** Feature extraction: binary payload → fixed-`dim` float embedding.
    * ===== STUB ===== the featurizer is a deterministic LCG seeded from the
    * payload bytes (a real deployment plugs a vision/audio model here).
    * Real and load-bearing: the `mapPartitions` batch shape (model init
    * per task, not per row), the fixed-dim `array<float>` output schema
    * that downstream similarity operators consume, and byte-bounded input
    * partitions via [[repartitionByBytes]]. */
  def extractFeaturesStub(spark: SparkSession, df: DataFrame, idCol: String,
                          binCol: String, dim: Int): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-task "model load" happens here in a real featurizer
        it.map { case (id, bytes) =>
          var s = if (bytes == null) 1L
            else bytes.foldLeft(17L)((acc, b) => acc * 31 + (b & 0xff)) | 1L
          val emb = Array.fill(dim) {
            s = s * 6364136223846793005L + 1442695040888963407L
            ((s >>> 33).toInt % 1000) / 1000.0f
          }
          MediaFeatures(id, dim, emb.toSeq)
        }
      }
  }

  /** Typed output of [[resizeStub]]: payload re-encoded at target dims. */
  case class ResizedMedia(doc_id: Long, width: Int, height: Int,
                          n_bytes: Long, payload: Array[Byte])

  /** Resize: binary payload → payload re-encoded at (targetW, targetH).
    * ===== STUB ===== decode+scale+encode is faked as a deterministic
    * byte-fold (no codecs in this container). Real: the binary-in /
    * binary-out operator shape, output sized ∝ target area (so downstream
    * [[repartitionByBytes]] stays meaningful), per-partition batching. */
  def resizeStub(spark: SparkSession, df: DataFrame, idCol: String,
                 binCol: String, targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    val outLen = math.max(16, targetW * targetH / 64)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val src = if (bytes == null) Array[Byte](0) else bytes
          val out = Array.tabulate(outLen)(i =>
            (src(i % src.length) ^ (i & 0x7f)).toByte)
          ResizedMedia(id, targetW, targetH, outLen.toLong, out)
        }
      }
  }

  /** Frame sampling for video-like columns (`array<binary>` of frames):
    * keep every `everyN`-th frame, preserving frame index. Pure
    * posexplode + filter — codegen'd, narrow, no shuffle; the standard
    * decimation pass before any per-frame decode at 100 TB. */
  def frameSample(df: DataFrame, idCol: String, framesCol: String,
                  everyN: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(col(framesCol)).as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % everyN === 0)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame"))

  /** Size-aware repartitioning: target ≤ `bytesPerPartition` of payload per
    * task so decode tasks neither OOM nor straggle. At 100 TB this is the
    * difference between a working decode pass and a dead cluster. */
  def repartitionByBytes(df: DataFrame, binCol: String,
                         bytesPerPartition: Long): DataFrame = {
    val total = df.agg(sum(octet_length(col(binCol)).cast("long"))).head().getLong(0)
    val parts = math.max(1, (total / bytesPerPartition).toInt + 1)
    df.repartition(parts)
  }
}
