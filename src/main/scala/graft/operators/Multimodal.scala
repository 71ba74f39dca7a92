package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus the decode / feature-extract / resize
  * plumbing a training-data pipeline needs.
  *
  * JPEG/PNG decode, resize and pixel featurization are REAL, via the
  * JRE's own `javax.imageio` (no external deps): [[decodeMeta]] reads
  * intrinsic dimensions from the image header without decoding pixel
  * data, [[resizeImage]] decodes + rescales + re-encodes, and
  * [[extractImageFeatures]] computes deterministic luminance features
  * from decoded pixels. Payloads imageio cannot read (audio/video/unknown
  * formats — those codecs are NOT in this container) fall back to the
  * clearly-marked deterministic stubs, keeping every operator total.
  * Either way the Spark-side shape is the load-bearing part at 100 TB:
  * binary column schema, typed output rows, per-partition batched
  * execution (`mapPartitions`, the Scala analog of `mapInPandas` batch
  * processing — codec/model init per task, not per row), and partition
  * sizing so one task never holds more than a bounded number of payload
  * bytes ([[repartitionByBytes]]).
  */
object Multimodal {

  /** Full decode for the pixel-touching operators: sniff, then
    * `ImageIO.read` guarded against right-magic-but-corrupt payloads —
    * a truncated JPEG makes `read` throw `IIOException`, and an operator
    * that dies on one bad row cannot claim totality over a mixed corpus.
    * Returns null (the callers' stub-fallback signal) on any failure. */
  private def readImage(bytes: Array[Byte]): BufferedImage =
    if (sniff(bytes) == "unknown") null
    else try ImageIO.read(new ByteArrayInputStream(bytes))
    catch { case _: Exception => null }

  /** Magic-prefix format sniff (same rule as [[binaryMeta]]'s column
    * form). */
  private def sniff(bytes: Array[Byte]): String =
    if (bytes == null || bytes.length < 4) "unknown"
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
    else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
      bytes(3) == 'G') "png"
    else "unknown"

  // per-row ImageIO calls would otherwise allocate a disk-backed
  // FileCacheImageInputStream (a temp file create/write/delete per row —
  // syscalls on the O(header) hot path, and /tmp pressure at scale)
  javax.imageio.ImageIO.setUseCache(false)

  private val md5Pool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def md5Hex(bytes: Array[Byte]): String = {
    val md = md5Pool.get()
    md.reset()
    md.digest(bytes).map(b => f"${b & 0xff}%02x").mkString
  }

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

  /** ===== STUB ===== deterministic fake decode for payloads imageio
    * cannot read (audio/video/unknown): derives plausible dimensions from
    * the payload bytes instead of decoding them. A deployment with
    * ffmpeg/audio bindings plugs the real codec behind the same seam. */
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

  /** REAL single-payload decode: JPEG/PNG intrinsic dimensions read from
    * the image HEADER via an imageio `ImageReader` — `getWidth(0)` never
    * decodes pixel data, so cost is O(header), not O(pixels); exactly what
    * a 100 TB metadata pass wants. Returns None when no reader accepts
    * the payload (corrupt or non-image). */
  def decodeImageMeta(id: Long, bytes: Array[Byte]): Option[MediaMeta] = {
    val fmt = sniff(bytes)
    if (fmt == "unknown") None
    else try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            Some(MediaMeta(id, bytes.length.toLong, fmt,
              r.getWidth(0), r.getHeight(0), md5Hex(bytes)))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch {
      // right-magic-but-corrupt payloads (truncated headers etc.) are a
      // fact of life in a 100 TB corpus: fall back, never kill the task
      case _: Exception => None
    }
  }

  /** The decode operator: per-partition batched decode of binary payloads
    * into typed metadata — real imageio header decode for JPEG/PNG,
    * deterministic stub for everything else. `mapPartitions` keeps decoder
    * init per-task not per-row, and the input should be pre-repartitioned
    * so Σbytes per partition is bounded (see `repartitionByBytes`). */
  def decodeMeta(spark: SparkSession, df: DataFrame, idCol: String,
                 binCol: String): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeImageMeta(id, bytes).getOrElse(fakeDecode(id, bytes))
        }
      }
  }

  /** Deterministic PNG rendering: (id, width, height) → real PNG payload
    * with LCG-seeded pixels. This is the fixture-side generator that lets
    * the decode/resize operators be exercised — and oracle-checked — on
    * real image bytes built from fixture columns (the container ships no
    * image files). Encoder init is per-partition; dims should be small. */
  def renderPng(spark: SparkSession, df: DataFrame, idCol: String,
                wCol: String, hCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(wCol).cast("int"),
        col(hCol).cast("int"))
      .as[(Long, Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, w, h) =>
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var s = id * 6364136223846793005L + 1442695040888963407L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              s = s * 6364136223846793005L + 1442695040888963407L
              img.setRGB(x, y, ((s >>> 40) & 0xffffff).toInt)
              x += 1
            }
            y += 1
          }
          val baos = new ByteArrayOutputStream()
          ImageIO.write(img, "png", baos)
          (id, baos.toByteArray)
        }
      }.toDF(idCol, "payload")
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
        val f = stubFeatures(dim) _
        it.map { case (id, bytes) => MediaFeatures(id, dim, f(bytes)) }
      }
  }

  /** REAL feature extraction for image payloads: decode via imageio, then
    * `dim` deterministic features — mean luminance (0..1) over the pixel
    * stripe where (x + y·w) ≡ d (mod dim). Integer-accumulated then one
    * double divide: bit-stable under any pixel visit order. Non-image
    * payloads fall back to the stub LCG featurizer, so the operator stays
    * total over a mixed corpus. */
  def extractImageFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                           binCol: String, dim: Int): Dataset[MediaFeatures] = {
    import spark.implicits._
    val stub = stubFeatures(dim) _
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // a real vision model would load per task here, not per row
        it.map { case (id, bytes) =>
          val img = readImage(bytes)
          if (img == null) MediaFeatures(id, dim, stub(bytes))
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val sums = new Array[Long](dim)
            val counts = new Array[Long](dim)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val lum = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                val d = (x + y * w) % dim
                sums(d) += lum; counts(d) += 1
                x += 1
              }
              y += 1
            }
            val emb = Array.tabulate(dim)(d =>
              if (counts(d) == 0) 0.0f
              else (sums(d).toDouble / (counts(d) * 765.0)).toFloat)
            MediaFeatures(id, dim, emb.toSeq)
          }
        }
      }
  }

  /** The stub LCG featurizer body, shared by [[extractFeaturesStub]] and
    * the non-image fallback of [[extractImageFeatures]]. */
  private def stubFeatures(dim: Int)(bytes: Array[Byte]): Seq[Float] = {
    var s = if (bytes == null) 1L
      else bytes.foldLeft(17L)((acc, b) => acc * 31 + (b & 0xff)) | 1L
    Array.fill(dim) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33).toInt % 1000) / 1000.0f
    }.toSeq
  }

  /** Typed output of the resize operators: payload re-encoded at target
    * dims. */
  case class ResizedMedia(doc_id: Long, width: Int, height: Int,
                          n_bytes: Long, payload: Array[Byte])

  /** REAL resize for image payloads: imageio decode → Graphics2D bilinear
    * rescale → PNG re-encode. The output is a genuine decodable image at
    * (targetW, targetH) — round-tripped through [[decodeMeta]] in the
    * oracle query. Non-image payloads fall back to [[resizeStub]]'s
    * deterministic byte-fold. */
  def resizeImage(spark: SparkSession, df: DataFrame, idCol: String,
                  binCol: String, targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    val stubLen = math.max(16, targetW * targetH / 64)
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = readImage(bytes)
          if (img == null) {
            val src = if (bytes == null || bytes.isEmpty) Array[Byte](0) else bytes
            val out = Array.tabulate(stubLen)(i =>
              (src(i % src.length) ^ (i & 0x7f)).toByte)
            ResizedMedia(id, targetW, targetH, stubLen.toLong, out)
          } else {
            val dst = new BufferedImage(targetW, targetH,
              BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, targetW, targetH, null)
            g.dispose()
            val baos = new ByteArrayOutputStream()
            ImageIO.write(dst, "png", baos)
            val out = baos.toByteArray
            ResizedMedia(id, targetW, targetH, out.length.toLong, out)
          }
        }
      }
  }

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
          val src = if (bytes == null || bytes.isEmpty) Array[Byte](0) else bytes
          val out = Array.tabulate(outLen)(i =>
            (src(i % src.length) ^ (i & 0x7f)).toByte)
          ResizedMedia(id, targetW, targetH, outLen.toLong, out)
        }
      }
  }

  /** Typed metadata of an audio payload. */
  case class AudioMeta(doc_id: Long, format: String, sample_rate: Int,
                       channels: Int, bits_per_sample: Int, n_samples: Long,
                       duration_ms: Long)

  /** REAL WAV (RIFF) header decode — pure byte parsing, no codec library:
    * fmt chunk → sample rate / channels / bit depth, data chunk → sample
    * count and duration. O(header) like [[decodeImageMeta]]. Returns None
    * for non-WAV or malformed payloads (caller falls back or filters). */
  def decodeWavMeta(id: Long, bytes: Array[Byte]): Option[AudioMeta] = {
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    try {
      if (bytes == null || bytes.length < 44 || tag(0) != "RIFF" ||
        tag(8) != "WAVE") None
      else {
        // walk chunks: fmt_ then data (a real-world WAV may interleave
        // others — LIST, fact — so never assume fixed offsets past 12)
        var off = 12
        var meta: Option[(Int, Int, Int)] = None
        var dataLen = -1L
        var malformed = false
        while (!malformed && off + 8 <= bytes.length &&
          (meta.isEmpty || dataLen < 0)) {
          val id4 = tag(off); val len = u32(off + 4)
          // the fmt fields live in THIS chunk's bytes: a declared len<16
          // must not let the reads spill into the next chunk's payload
          if (id4 == "fmt " && len >= 16 && off + 24 <= bytes.length)
            meta = Some((u32(off + 4 + 8).toInt, u16(off + 4 + 6),
              u16(off + 4 + 18)))
          else if (id4 == "data")
            // clamp to the bytes actually present — a corrupt header's
            // inflated declared length must not inflate n_samples/duration
            dataLen = math.min(len, math.max(0L, bytes.length - off - 8L))
          val advance = 8 + len.toInt + (len.toInt & 1) // word-aligned
          // a corrupt length field can make the advance non-positive —
          // without this check the walk spins forever and wedges the task
          if (advance <= 0) malformed = true else off += advance
        }
        if (malformed) None
        else meta.flatMap { case (rate, ch, bits) =>
          if (dataLen < 0 || rate <= 0 || ch <= 0 || bits <= 0) None
          else {
            val nSamples = dataLen / (ch * bits / 8)
            Some(AudioMeta(id, "wav", rate, ch, bits, nSamples,
              nSamples * 1000L / rate))
          }
        }
      }
    } catch { case _: Exception => None }
  }

  /** Deterministic mono 16-bit PCM WAV rendering: (id, n_samples,
    * sample_rate) → real RIFF/WAVE payload with LCG-seeded samples — the
    * fixture-side generator for exercising [[decodeWavMeta]] on real
    * audio bytes built from fixture columns (no audio files ship in the
    * container). */
  def renderWav(spark: SparkSession, df: DataFrame, idCol: String,
                nSamplesCol: String, rateCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(nSamplesCol).cast("int"),
        col(rateCol).cast("int"))
      .as[(Long, Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, n, rate) =>
          val dataLen = n * 2
          val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
            .put("WAVE".getBytes("US-ASCII"))
          bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1).putShort(1) // PCM, mono
            .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
          bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
          var s = id * 6364136223846793005L + 1442695040888963407L
          var i = 0
          while (i < n) {
            s = s * 6364136223846793005L + 1442695040888963407L
            bb.putShort((s >>> 48).toShort)
            i += 1
          }
          (id, bb.array())
        }
      }.toDF(idCol, "payload")
  }

  /** Audio decode operator: WAV payloads → typed metadata via the real
    * RIFF parser; non-WAV payloads fall back to a deterministic stub row
    * (format "unknown", dims from the byte fold) so the operator stays
    * total over a mixed corpus. */
  def decodeAudioMeta(spark: SparkSession, df: DataFrame, idCol: String,
                      binCol: String): Dataset[AudioMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeWavMeta(id, bytes).getOrElse {
            val n = if (bytes == null) 0L else bytes.length.toLong
            AudioMeta(id, "unknown", 0, 0, 0, n, 0L)
          }
        }
      }
  }

  /** Deterministic mono 16-bit PCM SQUARE-WAVE WAV rendering: sample_i =
    * +amp for even i, −amp for odd — every decoded-feature expectation
    * (peak = amp, rms = amp, Σ = amp·(n mod 2)) is closed-form in the
    * fixture columns, so the PCM DECODE path gets an arithmetic DuckDB
    * twin (the LCG renderer's samples would need 64-bit wrapping
    * multiplication, which DuckDB refuses). */
  def renderWavSquare(spark: SparkSession, df: DataFrame, idCol: String,
                      nSamplesCol: String, rateCol: String,
                      ampCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(nSamplesCol).cast("int"),
        col(rateCol).cast("int"), col(ampCol).cast("int"))
      .as[(Long, Int, Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, n, rate, amp) =>
          val dataLen = n * 2
          val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
            .put("WAVE".getBytes("US-ASCII"))
          bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1).putShort(1) // PCM, mono
            .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
          bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
          var i = 0
          while (i < n) {
            bb.putShort(if ((i & 1) == 0) amp.toShort else (-amp).toShort)
            i += 1
          }
          (id, bb.array())
        }
      }.toDF(idCol, "payload")
  }

  /** Decoded-sample statistics of a 16-bit PCM WAV payload. */
  case class AudioPcmStats(doc_id: Long, n_samples: Long, peak: Int,
                           sum_samples: Long, rms: Double)

  /** REAL PCM sample decode: walk RIFF chunks to fmt/data (the
    * [[decodeWavMeta]] discipline), then read every little-endian int16
    * sample in the data chunk and fold peak / Σx / Σx² in one pass —
    * rms = √(Σx²/n). O(payload) but single-pass and allocation-free;
    * None for non-WAV, non-16-bit, or malformed payloads. */
  def decodeWavPcm(id: Long, bytes: Array[Byte]): Option[AudioPcmStats] = {
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    try {
      if (bytes == null || bytes.length < 44 || tag(0) != "RIFF" ||
        tag(8) != "WAVE") None
      else {
        var off = 12
        var bits = -1
        var dataOff = -1
        var dataLen = -1L
        var malformed = false
        while (!malformed && off + 8 <= bytes.length &&
          (bits < 0 || dataOff < 0)) {
          val id4 = tag(off); val len = u32(off + 4)
          if (id4 == "fmt " && len >= 16 && off + 24 <= bytes.length)
            bits = u16(off + 4 + 18)
          else if (id4 == "data") {
            dataOff = off + 8
            dataLen = math.min(len, math.max(0L, bytes.length - off - 8L))
          }
          val advance = 8 + len.toInt + (len.toInt & 1)
          if (advance <= 0) malformed = true else off += advance
        }
        if (malformed || bits != 16 || dataOff < 0 || dataLen < 2) None
        else {
          val n = (dataLen / 2).toInt
          var peak = 0
          var sum = 0L
          var sumSq = 0L
          var i = 0
          while (i < n) {
            val o = dataOff + i * 2
            val s = ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort.toInt
            val a = math.abs(s)
            if (a > peak) peak = a
            sum += s
            sumSq += s.toLong * s.toLong
            i += 1
          }
          Some(AudioPcmStats(id, n.toLong, peak, sum,
            math.sqrt(sumSq.toDouble / n.toDouble)))
        }
      }
    } catch { case _: Exception => None }
  }

  /** PCM feature-extraction operator over a binary WAV column —
    * mapPartitions like the other decoders; undecodable payloads fall
    * back to an all-zero stats row so the operator stays total. */
  def pcmStats(spark: SparkSession, df: DataFrame, idCol: String,
               binCol: String): Dataset[AudioPcmStats] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeWavPcm(id, bytes)
            .getOrElse(AudioPcmStats(id, 0L, 0, 0L, 0.0))
        }
      }
  }

  /** Typed metadata of a video-container payload. */
  case class VideoMeta(doc_id: Long, format: String, timescale: Int,
                       duration_ms: Long, n_tracks: Int, width: Int,
                       height: Int)

  /** REAL MP4 (ISO-BMFF) container metadata decode — pure byte parsing,
    * no codec library, same O(header) discipline as [[decodeWavMeta]]:
    * walk the top-level box list to `moov`, read `mvhd` (timescale,
    * duration — v0 and v1 layouts), count `trak` children, and read the
    * first track's `tkhd` 16.16 fixed-point width/height. Big-endian
    * reads (ISO-BMFF), loop-guarded against corrupt size fields exactly
    * like the RIFF walk. Returns None for non-MP4 or malformed payloads. */
  def decodeMp4Meta(id: Long, bytes: Array[Byte]): Option[VideoMeta] = {
    def u32(o: Int): Long = ((bytes(o) & 0xffL) << 24) |
      ((bytes(o + 1) & 0xffL) << 16) | ((bytes(o + 2) & 0xffL) << 8) |
      (bytes(o + 3) & 0xffL)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    try {
      if (bytes == null || bytes.length < 16 || tag(4) != "ftyp") None
      else {
        // top-level walk to moov (size==1 would mean a 64-bit largesize —
        // out of scope for metadata headers, treated as malformed; size==0
        // means "to end of file", only legal for the last box)
        var off = 0
        var moov = -1
        var moovEnd = -1
        var malformed = false
        while (!malformed && moov < 0 && off + 8 <= bytes.length) {
          val size = u32(off)
          if (tag(off + 4) == "moov") {
            moov = off
            moovEnd = math.min(bytes.length.toLong, off + size).toInt
          }
          // a u32 size past the buffer (incl. > Int.MaxValue, which would
          // go negative under .toInt and walk the cursor backwards) is
          // malformed by definition, not an exception-handler case
          if (size < 8 || size > bytes.length) malformed = true
          else off += size.toInt
        }
        if (malformed || moov < 0) None
        else {
          var ts = 0L; var durUnits = -1L; var nTraks = 0
          var w = 0; var h = 0
          var o = moov + 8
          while (!malformed && o + 8 <= moovEnd) {
            val size = u32(o); val id4 = tag(o + 4)
            if (id4 == "mvhd" && o + 32 <= moovEnd) {
              val ver = bytes(o + 8) & 0xff
              if (ver == 0) { ts = u32(o + 20); durUnits = u32(o + 24) }
              else if (o + 44 <= moovEnd) { // v1: 64-bit times
                ts = u32(o + 28)
                durUnits = (u32(o + 32) << 32) | u32(o + 36)
              }
            } else if (id4 == "trak") {
              nTraks += 1
              // only the first trak's tkhd supplies dims (the fixture
              // renders identical dims per track; a real corpus would
              // surface per-track rows via a trak-exploding variant)
              if (nTraks == 1) {
                val trakEnd = math.min(moovEnd.toLong, o + size).toInt
                var t = o + 8
                while (!malformed && t + 8 <= trakEnd) {
                  val tsz = u32(t)
                  if (tag(t + 4) == "tkhd") {
                    val ver = bytes(t + 8) & 0xff
                    val wOff = if (ver == 0) t + 84 else t + 96
                    if (wOff + 8 <= trakEnd) {
                      w = (u32(wOff) >> 16).toInt   // 16.16 fixed point
                      h = (u32(wOff + 4) >> 16).toInt
                    }
                  }
                  if (tsz < 8 || tsz > bytes.length) malformed = true
                  else t += tsz.toInt
                }
              }
            }
            if (size < 8 || size > bytes.length) malformed = true
            else o += size.toInt
          }
          // a u32 timescale above Int.MaxValue cannot be represented in
          // the Int metadata field — malformed, not a negative timescale
          if (malformed || ts <= 0 || ts > Int.MaxValue || durUnits < 0) None
          else Some(VideoMeta(id, "mp4", ts.toInt,
            durUnits * 1000L / ts, nTraks, w, h))
        }
      }
    } catch { case _: Exception => None }
  }

  /** Deterministic minimal-MP4 rendering: (id, timescale, duration-units,
    * n_tracks, w, h) → a real `ftyp`+`moov(mvhd, trak(tkhd)…)` container
    * — the fixture-side generator for exercising [[decodeMp4Meta]] on
    * real ISO-BMFF bytes built from fixture columns (no video files ship
    * in the container). Box layouts follow ISO/IEC 14496-12 v0 boxes. */
  def renderMp4(spark: SparkSession, df: DataFrame, idCol: String,
                timescaleCol: String, durUnitsCol: String,
                nTracksCol: String, wCol: String, hCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(timescaleCol).cast("int"),
        col(durUnitsCol).cast("long"), col(nTracksCol).cast("int"),
        col(wCol).cast("int"), col(hCol).cast("int"))
      .as[(Long, Int, Long, Int, Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, ts, dur, nTracks, w, h) =>
          val moovSize = 8 + 108 + nTracks * 100
          val bb = java.nio.ByteBuffer.allocate(20 + moovSize)
            .order(java.nio.ByteOrder.BIG_ENDIAN)
          // ftyp
          bb.putInt(20).put("ftyp".getBytes("US-ASCII"))
            .put("isom".getBytes("US-ASCII")).putInt(0x200)
            .put("isom".getBytes("US-ASCII"))
          // moov > mvhd (v0, 108 bytes)
          bb.putInt(moovSize).put("moov".getBytes("US-ASCII"))
          bb.putInt(108).put("mvhd".getBytes("US-ASCII"))
            .putInt(0)                 // version/flags
            .putInt(0).putInt(0)       // ctime/mtime
            .putInt(ts).putInt(dur.toInt)
            .putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
          bb.putLong(0)                // reserved
          // unity matrix
          bb.putInt(0x00010000).putInt(0).putInt(0)
          bb.putInt(0).putInt(0x00010000).putInt(0)
          bb.putInt(0).putInt(0).putInt(0x40000000)
          (0 until 6).foreach(_ => bb.putInt(0)) // pre_defined
          bb.putInt(nTracks + 1)       // next_track_ID
          // trak > tkhd (v0, 92 bytes) per track
          (1 to nTracks).foreach { tid =>
            bb.putInt(100).put("trak".getBytes("US-ASCII"))
            bb.putInt(92).put("tkhd".getBytes("US-ASCII"))
              .putInt(3)               // version 0, flags enabled|in-movie
              .putInt(0).putInt(0)     // ctime/mtime
              .putInt(tid).putInt(0)   // track_ID, reserved
              .putInt(dur.toInt)
            bb.putLong(0)              // reserved
            bb.putShort(0).putShort(0).putShort(0).putShort(0)
            bb.putInt(0x00010000).putInt(0).putInt(0)
            bb.putInt(0).putInt(0x00010000).putInt(0)
            bb.putInt(0).putInt(0).putInt(0x40000000)
            bb.putInt(w << 16).putInt(h << 16) // 16.16 fixed point
          }
          (id, bb.array())
        }
      }.toDF(idCol, "payload")
  }

  /** Typed metadata of an AVI payload. */
  case class AviMeta(doc_id: Long, format: String, frame_us: Long,
                     n_frames: Long, n_streams: Int, width: Int,
                     height: Int, duration_ms: Long)

  /** REAL AVI (RIFF) container metadata decode — the second RIFF walker
    * next to [[decodeWavMeta]], little-endian, O(header), loop-guarded:
    * `RIFF…AVI ` → `LIST hdrl` → `avih` main header (µs/frame, total
    * frames, stream count, dims). Returns None for non-AVI or malformed
    * payloads. */
  def decodeAviMeta(id: Long, bytes: Array[Byte]): Option[AviMeta] = {
    def u32(o: Int) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
    try {
      if (bytes == null || bytes.length < 24 || tag(0) != "RIFF" ||
        tag(8) != "AVI ") None
      else {
        var off = 12
        var meta: Option[AviMeta] = None
        var malformed = false
        while (!malformed && meta.isEmpty && off + 8 <= bytes.length) {
          val id4 = tag(off); val len = u32(off + 4)
          if (id4 == "LIST" && off + 12 <= bytes.length &&
            tag(off + 8) == "hdrl") {
            // walk the hdrl list for the avih main header
            var o = off + 12
            val listEnd = math.min(bytes.length.toLong, off + 8 + len).toInt
            while (!malformed && meta.isEmpty && o + 8 <= listEnd) {
              val cid = tag(o); val clen = u32(o + 4)
              if (cid == "avih" && clen >= 40 && o + 8 + 40 <= listEnd) {
                val frameUs = u32(o + 8)
                val nFrames = u32(o + 8 + 16)
                val nStreams = u32(o + 8 + 24).toInt
                val w = u32(o + 8 + 32).toInt
                val h = u32(o + 8 + 36).toInt
                if (frameUs > 0)
                  meta = Some(AviMeta(id, "avi", frameUs, nFrames, nStreams,
                    w, h, frameUs * nFrames / 1000L))
              }
              val adv = 8 + clen.toInt + (clen.toInt & 1)
              if (adv <= 0) malformed = true else o += adv
            }
          }
          val advance = 8 + len.toInt + (len.toInt & 1)
          if (advance <= 0) malformed = true else off += advance
        }
        if (malformed) None else meta
      }
    } catch { case _: Exception => None }
  }

  /** Deterministic minimal-AVI rendering: (id, µs/frame, frames,
    * streams, w, h) → a real `RIFF(AVI  LIST(hdrl avih))` container for
    * exercising [[decodeAviMeta]] on genuine bytes. */
  def renderAvi(spark: SparkSession, df: DataFrame, idCol: String,
                frameUsCol: String, nFramesCol: String, nStreamsCol: String,
                wCol: String, hCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(frameUsCol).cast("long"),
        col(nFramesCol).cast("long"), col(nStreamsCol).cast("int"),
        col(wCol).cast("int"), col(hCol).cast("int"))
      .as[(Long, Long, Long, Int, Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, frameUs, nFrames, nStreams, w, h) =>
          val avihLen = 56
          val hdrlLen = 4 + 8 + avihLen       // "hdrl" + avih chunk
          val riffLen = 4 + 8 + hdrlLen       // "AVI " + LIST chunk
          val bb = java.nio.ByteBuffer.allocate(8 + riffLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
            .put("AVI ".getBytes("US-ASCII"))
          bb.put("LIST".getBytes("US-ASCII")).putInt(hdrlLen)
            .put("hdrl".getBytes("US-ASCII"))
          bb.put("avih".getBytes("US-ASCII")).putInt(avihLen)
            .putInt(frameUs.toInt)  // dwMicroSecPerFrame
            .putInt(0).putInt(0).putInt(0)
            .putInt(nFrames.toInt)  // dwTotalFrames
            .putInt(0)
            .putInt(nStreams)       // dwStreams
            .putInt(0)
            .putInt(w).putInt(h)    // dwWidth / dwHeight
            .putInt(0).putInt(0).putInt(0).putInt(0)
          (id, bb.array())
        }
      }.toDF(idCol, "payload")
  }

  /** AVI decode operator with the standard stub-fallback totality
    * contract (see [[decodeVideoMeta]]). */
  def decodeAviMetaOp(spark: SparkSession, df: DataFrame, idCol: String,
                      binCol: String): Dataset[AviMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeAviMeta(id, bytes).getOrElse {
            val n = if (bytes == null) 0 else bytes.length
            AviMeta(id, "unknown", 0L, 0L, 0, n, 0, 0L)
          }
        }
      }
  }

  /** Video-container decode operator: MP4 payloads → typed metadata via
    * the real box-walk parser; non-MP4 payloads fall back to a
    * deterministic stub row so the operator stays total over a mixed
    * corpus (same contract as [[decodeAudioMeta]]). */
  def decodeVideoMeta(spark: SparkSession, df: DataFrame, idCol: String,
                      binCol: String): Dataset[VideoMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeMp4Meta(id, bytes).getOrElse {
            val n = if (bytes == null) 0 else bytes.length
            VideoMeta(id, "unknown", 0, 0L, 0, n, 0)
          }
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
    * difference between a working decode pass and a dead cluster.
    *
    * Sizing: when every leaf of the plan is a file relation, Catalyst's
    * `stats.sizeInBytes` IS the summed file size — FREE, no data pass
    * (payload columns dominate row size, so whole-row bytes are the right
    * proxy; this is the 100 TB path). File stats are COMPRESSED on-disk
    * bytes while the bound is about in-memory payload bytes, so the
    * estimate is inflated by `compressionFactor` (how much larger data is
    * in memory than on disk — already-compressed media ≈ 1, text-heavy
    * payloads considerably more; err high: too many partitions wastes
    * scheduling, too few OOMs). Non-file plans (local/in-memory
    * relations) carry schema-derived guesses instead of real sizes, so
    * they fall back to one exact aggregation over the payload column. */
  def repartitionByBytes(df: DataFrame, binCol: String,
                         bytesPerPartition: Long,
                         compressionFactor: Double = 3.0): DataFrame = {
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    val fileBacked = leaves.nonEmpty && leaves.forall {
      case _: org.apache.spark.sql.execution.datasources.LogicalRelation => true
      case _ => false
    }
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val total =
      if (fileBacked && est > 0 && est < BigInt(Long.MaxValue))
        (est.toLong * compressionFactor).toLong
      else df.agg(sum(octet_length(col(binCol)).cast("long")))
        .head().getLong(0)
    val parts = math.max(1, (total / bytesPerPartition).toInt + 1)
    df.repartition(parts)
  }

  /** Typed output of [[imageAHash]]: the 64-bit perceptual average-hash
    * split into two 32-bit halves (bits 0-31 in `ahash_lo`, 32-63 in
    * `ahash_hi`) so every value stays positive in a BIGINT in BOTH
    * engines — the same reasoning as the 60-bit SimHash
    * ([[Dedup.SimhashBits]]); hamming distance is
    * bit_count(xor(lo)) + bit_count(xor(hi)) on either side. */
  case class AHashRow(doc_id: Long, ahash_lo: Long, ahash_hi: Long)

  /** Deterministic block-pattern PNG renderer for the perceptual-hash
    * fixtures: an 8×8 grid of blocks over a (w, h) canvas, block
    * b = by·8+bx painted bright gray (200) when bit b of the 64-bit
    * pattern word (loCol = bits 0-31, hiCol = bits 32-63) is set, dark
    * gray (50) otherwise. The SAME image content rendered at different
    * (w, h) resolutions produces the same average-hash — which is the
    * perceptual property mm8's fixture exercises. */
  def renderBlockPng(spark: SparkSession, df: DataFrame, idCol: String,
                     loCol: String, hiCol: String,
                     wCol: String, hCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(loCol).cast("long"),
        col(hiCol).cast("long"), col(wCol).cast("int"), col(hCol).cast("int"))
      .as[(Long, Long, Long, Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, lo, hi, w, h) =>
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val b = (y * 8 / h) * 8 + (x * 8 / w)
              val bit =
                if (b < 32) (lo >>> b) & 1L else (hi >>> (b - 32)) & 1L
              val g = if (bit == 1L) 200 else 50
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          val baos = new ByteArrayOutputStream()
          ImageIO.write(img, "png", baos)
          (id, baos.toByteArray)
        }
      }.toDF(idCol, "payload")
  }

  /** REAL perceptual average-hash (aHash) over decoded pixels: imageio
    * decode → integer luminance sums over an 8×8 block grid → bit b set
    * iff block b's MEAN luminance exceeds the global mean. All-integer
    * comparison (cross-multiplied: blockSum·totalPix > totalSum·blockPix)
    * — exact under any pixel visit order and any block-size imbalance
    * when w or h is not a multiple of 8. Resolution-independent by
    * construction: the downsample IS the hash. Undecodable payloads are
    * dropped (a perceptual hash of non-image bytes is meaningless — the
    * caller's corpus filter, not a stub, owns that decision).
    *
    * Scale shape: narrow per-row decode (mapPartitions, codec init per
    * task) → one small (doc, lo, hi) table; pair generation belongs to
    * [[Dedup.hammingNearDup]]'s banded join, never here. */
  def imageAHash(spark: SparkSession, df: DataFrame, idCol: String,
                 binCol: String): Dataset[AHashRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val img = readImage(bytes)
          if (img == null) None
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val sums = new Array[Long](64)
            val counts = new Array[Long](64)
            var total = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val lum =
                  ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                val b = (y * 8 / h) * 8 + (x * 8 / w)
                sums(b) += lum; counts(b) += 1; total += lum
                x += 1
              }
              y += 1
            }
            val totalPix = w.toLong * h
            var lo = 0L; var hi = 0L
            var b = 0
            while (b < 64) {
              if (counts(b) > 0 && sums(b) * totalPix > total * counts(b)) {
                if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
              }
              b += 1
            }
            Some(AHashRow(id, lo, hi))
          }
        }
      }
  }

  /** Typed metadata of a TIFF/EXIF payload. */
  case class TiffMeta(doc_id: Long, format: String, byte_order: String,
                      width: Long, height: Long, bits_per_sample: Int,
                      orientation: Int, iso: Int)

  /** REAL TIFF/EXIF metadata decode — the third byte-walk family next to
    * the RIFF walkers and the ISO-BMFF box walk, and the only one with
    * RUNTIME-SELECTED endianness: the header's `II`/`MM` mark picks
    * little- vs big-endian for every later read (EXIF is the TIFF
    * structure embedded in JPEG APP1, so this walker is the camera-
    * metadata path). IFD0's 12-byte entries supply width (tag 256),
    * height (257), bits-per-sample (258), orientation (274); the Exif
    * sub-IFD pointer (tag 0x8769) is followed — bounds-guarded — for
    * ISO (tag 0x8827). SHORT (type 3) values read 2 bytes of the value
    * field, LONG (type 4) all 4, both in the header's byte order — a
    * wrong-endian read or a miscounted entry offset cannot hash-match
    * the oracle. O(entries), loop-guarded, None for malformed. */
  def decodeTiffMeta(id: Long, bytes: Array[Byte]): Option[TiffMeta] = {
    try {
      if (bytes == null || bytes.length < 8) return None
      val le = (bytes(0) & 0xff, bytes(1) & 0xff) match {
        case (0x49, 0x49) => true
        case (0x4d, 0x4d) => false
        case _ => return None
      }
      def u16(o: Int): Int =
        if (le) (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
        else ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
      def u32(o: Int): Long =
        if (le) (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
          ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
        else ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
          ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
      if (u16(2) != 42) return None
      // value of one IFD entry at `o`: SHORT reads 2 bytes, LONG 4. The
      // count field (o+4) decides inline vs offset: count·typeSize > 4
      // means the value field holds an OFFSET to the array (e.g.
      // BitsPerSample count=3 on RGB TIFFs) — follow it bounds-guarded
      // and read the first element, never misread the offset as data.
      def entryValue(o: Int): Long = {
        val typ = u16(o + 2)
        val size = typ match { case 3 => 2; case 4 => 4; case _ => 0 }
        if (size == 0) return -1L
        val count = u32(o + 4)
        val at =
          if (count * size <= 4) o + 8
          else {
            val off = u32(o + 8)
            if (off < 0 || off + size > bytes.length) return -1L
            off.toInt
          }
        if (size == 2) u16(at).toLong else u32(at)
      }
      var width = -1L; var height = -1L; var bps = -1; var orient = 1
      var exifOff = -1L; var iso = -1
      def walkIfd(ifd: Long, exifLevel: Boolean): Boolean = {
        if (ifd < 0 || ifd + 2 > bytes.length) return false
        val n = u16(ifd.toInt)
        if (ifd + 2 + n * 12 > bytes.length) return false
        var i = 0
        while (i < n) {
          val o = (ifd + 2 + i * 12).toInt
          u16(o) match {
            case 256 if !exifLevel => width = entryValue(o)
            case 257 if !exifLevel => height = entryValue(o)
            case 258 if !exifLevel => bps = entryValue(o).toInt
            case 274 if !exifLevel => orient = entryValue(o).toInt
            case 0x8769 if !exifLevel => exifOff = u32(o + 8)
            case 0x8827 if exifLevel => iso = entryValue(o).toInt
            case _ => ()
          }
          i += 1
        }
        true
      }
      if (!walkIfd(u32(4), exifLevel = false)) return None
      if (exifOff >= 0 && !walkIfd(exifOff, exifLevel = true)) return None
      if (width < 0 || height < 0) None
      else Some(TiffMeta(id, "tiff", if (le) "II" else "MM",
        width, height, bps, orient, iso))
    } catch { case _: Exception => None }
  }

  /** TIFF decode operator — total over a mixed corpus via the stub-row
    * fallback (the [[decodeVideoMeta]] contract). */
  def decodeTiffMetaOp(spark: SparkSession, df: DataFrame, idCol: String,
                       binCol: String): Dataset[TiffMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeTiffMeta(id, bytes).getOrElse {
            val n = if (bytes == null) 0 else bytes.length
            TiffMeta(id, "unknown", "", n, 0L, 0, 0, 0)
          }
        }
      }
  }

  /** Deterministic minimal-TIFF rendering: (id, byte-order flag, width,
    * height, bits-per-sample, orientation, iso) → a real TIFF header +
    * IFD0 (7 entries incl. the Exif sub-IFD pointer) + Exif IFD (ISO) —
    * the fixture generator for [[decodeTiffMeta]], emitting BOTH byte
    * orders so the endian-switched read path is exercised end to end. */
  def renderTiff(spark: SparkSession, df: DataFrame, idCol: String,
                 leCol: String, wCol: String, hCol: String, bpsCol: String,
                 orientCol: String, isoCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(leCol).cast("boolean"),
        col(wCol).cast("long"), col(hCol).cast("long"),
        col(bpsCol).cast("int"), col(orientCol).cast("int"),
        col(isoCol).cast("int"))
      .as[(Long, Boolean, Long, Long, Int, Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, le, w, h, bps, orient, iso) =>
          val order = if (le) java.nio.ByteOrder.LITTLE_ENDIAN
            else java.nio.ByteOrder.BIG_ENDIAN
          val bb = java.nio.ByteBuffer.allocate(116).order(order)
          bb.put((if (le) "II" else "MM").getBytes("US-ASCII"))
          bb.putShort(42).putInt(8)
          def entry(tag: Int, typ: Int, value: Long): Unit = {
            bb.putShort(tag.toShort).putShort(typ.toShort).putInt(1)
            if (typ == 3) { bb.putShort(value.toInt.toShort); bb.putShort(0) }
            else bb.putInt(value.toInt)
          }
          bb.putShort(7)                    // IFD0: 7 entries
          entry(256, 4, w)                  // ImageWidth  (LONG)
          entry(257, 4, h)                  // ImageLength (LONG)
          entry(258, 3, bps)                // BitsPerSample
          entry(259, 3, 1)                  // Compression: none
          entry(262, 3, 1)                  // Photometric: BlackIsZero
          entry(274, 3, orient)             // Orientation
          entry(0x8769, 4, 98)              // Exif IFD pointer
          bb.putInt(0)                      // next IFD: none
          bb.putShort(1)                    // Exif IFD at 98: 1 entry
          entry(0x8827, 3, iso)             // ISOSpeedRatings
          bb.putInt(0)
          (id, bb.array())
        }
      }.toDF(idCol, "payload")
  }
}
