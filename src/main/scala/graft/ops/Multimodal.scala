package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/**
 * Multimodal column handling: media payloads travel as opaque `binary`
 * columns next to typed metadata, exactly like a production training-data
 * lake (parquet handles large binary values natively and column pruning
 * keeps metadata-only queries from touching the bytes).
 *
 * The Spark-side plumbing — schema, encoders, partition-friendly batch
 * iteration via `mapPartitions` — is real and tested. Image payloads
 * (PNG/JPEG/GIF/BMP, sniffed by magic bytes) decode through the JDK's own
 * `javax.imageio` ([[Codec]]), and audio containers the JDK ships parsers
 * for (WAV/AIFF/AU) yield real header metadata via `javax.sound.sampled`
 * ([[decodeAudioMeta]]) and real PCM frame features ([[audioFeatures]]) —
 * zero extra dependencies either way. Payload kinds the JDK cannot decode
 * (video, compressed audio) fall back to a deterministic fake
 * ([[FakeCodec]]) that keeps the full pipeline shape testable; swapping in
 * a real decoder changes only `Codec.decode`.
 */
object Multimodal {

  /** Typed metadata for a media payload. */
  case class MediaMeta(
      docId: Long,
      kind: String,
      byteLen: Long,
      checksum: String,
      width: Int,
      height: Int)

  implicit val mediaMetaEncoder: Encoder[MediaMeta] = Encoders.product[MediaMeta]

  /** Typed metadata for an audio payload (real decode for WAV/AIFF/AU). */
  case class AudioMeta(
      docId: Long,
      byteLen: Long,
      checksum: String,
      sampleRateHz: Double,
      channels: Int,
      frames: Long,
      durationMs: Long)

  implicit val audioMetaEncoder: Encoder[AudioMeta] = Encoders.product[AudioMeta]

  /**
   * Deterministic stand-in for the media formats the JDK cannot decode
   * (audio/video): stable pseudo-dimensions derived from the payload keep
   * the full pipeline shape testable until a real decoder plugs in.
   */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int) = {
      val n = payload.length
      val w = 64 + (math.abs(payload.take(16).foldLeft(17)(31 * _ + _)) % 1024)
      val h = 64 + (n % 1024)
      (w, h)
    }
  }

  /**
   * Media codec: real JDK `javax.imageio` decoding for image payloads,
   * [[FakeCodec]] for everything else. Image-ness is sniffed from magic
   * bytes (PNG/JPEG/GIF/BMP — the formats the JDK ships readers for) so
   * non-image payloads never pay a failed `ImageIO.read` attempt; a
   * corrupt image header also falls back rather than failing the task
   * (dirty payloads are a fact of life in a 100 TB media lake — a decode
   * error must quarantine the row, not kill the job).
   */
  object Codec {
    // ImageIO's default scratch is a temp FILE per decode; in-memory
    // payloads want the heap path. JVM-global, idempotent, safe to set
    // from any executor thread.
    javax.imageio.ImageIO.setUseCache(false)

    private def startsWith(p: Array[Byte], magic: Int*): Boolean =
      p.length >= magic.length && magic.zipWithIndex.forall { case (m, i) => (p(i) & 0xff) == m }

    /** True when the payload carries a JDK-decodable image signature. */
    def isImage(payload: Array[Byte]): Boolean =
      startsWith(payload, 0x89, 0x50, 0x4e, 0x47) || // PNG
        startsWith(payload, 0xff, 0xd8, 0xff) ||     // JPEG
        startsWith(payload, 0x47, 0x49, 0x46, 0x38) || // GIF8
        startsWith(payload, 0x42, 0x4d)              // BMP

    /** (width, height): real decode for images, deterministic fake otherwise. */
    def decode(payload: Array[Byte]): (Int, Int) =
      if (isImage(payload)) {
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          if (img != null) (img.getWidth, img.getHeight) else FakeCodec.decode(payload)
          // NonFatal, not just IOException: JDK image readers throw unchecked
          // exceptions (IllegalArgument, NegativeArraySize, AIOOBE) on payloads
          // that pass the magic sniff but carry malformed headers. Policy is
          // quarantine-the-row, never kill-the-task.
        } catch { case scala.util.control.NonFatal(_) => FakeCodec.decode(payload) }
      } else FakeCodec.decode(payload)
  }

  /** Pure-SQL payload metadata (no decode): byte length + md5 checksum. */
  def payloadMeta(payload: Column): Seq[(String, Column)] = Seq(
    "byte_len" -> octet_length(payload).cast("long"),
    "checksum" -> md5(payload))

  /**
   * Decode payloads to typed metadata, one partition at a time. The decode
   * runs inside executors on iterator batches (never collects), so it
   * parallelizes with the scan; payload bytes are read once and dropped
   * before any shuffle.
   */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String, kind: String): Dataset[MediaMeta] = {
    val projected = df.select(col(idCol).cast("long"), col(payloadCol))
    projected.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { row =>
        val id = row.getLong(0)
        val payload = row.getAs[Array[Byte]](1)
        val (w, h) = Codec.decode(payload)
        digest.reset()
        val checksum = digest.digest(payload).map("%02x".format(_)).mkString
        MediaMeta(id, kind, payload.length.toLong, checksum, w, h)
      }
    }(mediaMetaEncoder)
  }

  /**
   * Real audio metadata via the JDK's `javax.sound.sampled`: sample rate,
   * channel count, frame count, and duration for the container formats the
   * JDK ships parsers for (WAV, AIFF, AU). Header-only — the PCM payload
   * is never decoded, so this costs a few hundred bytes per row however
   * long the clip. Unparseable payloads yield a `-1`-sentinel row rather
   * than failing the task (dirty payloads quarantine, same policy as
   * [[Codec]]). Runs per-partition on executors; bytes drop before any
   * shuffle.
   */
  def decodeAudioMeta(df: DataFrame, idCol: String, payloadCol: String): Dataset[AudioMeta] = {
    val projected = df.select(col(idCol).cast("long"), col(payloadCol))
    projected.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { row =>
        val id = row.getLong(0)
        val payload = row.getAs[Array[Byte]](1)
        digest.reset()
        val checksum = digest.digest(payload).map("%02x".format(_)).mkString
        val parsed =
          try {
            val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
              new java.io.ByteArrayInputStream(payload))
            val af = fmt.getFormat
            val frames = fmt.getFrameLength.toLong
            val rate = af.getSampleRate.toDouble
            val durMs = if (frames >= 0 && rate > 0) (frames * 1000L / rate.toLong) else -1L
            Some((rate, af.getChannels, frames, durMs))
          } catch { case scala.util.control.NonFatal(_) => None }
        val (rate, ch, frames, durMs) = parsed.getOrElse((-1.0, -1, -1L, -1L))
        AudioMeta(id, payload.length.toLong, checksum, rate, ch, frames, durMs)
      }
    }(audioMetaEncoder)
  }

  /**
   * Decode an uncompressed-PCM payload (WAV/AIFF/AU, 8- or 16-bit) to mono
   * samples in [-1, 1) plus the sample rate. The JDK ships these parsers
   * (`javax.sound.sampled`), so no dependency; compressed codecs (which the
   * JDK cannot decode) and malformed payloads return None. Channels
   * average to mono; both endiannesses and signed/unsigned handled.
   */
  private[ops] def pcmSamples(payload: Array[Byte]): Option[(Float, Array[Double])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = ais.getFormat
        val enc = f.getEncoding
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        val bits = f.getSampleSizeInBits
        val bpf = f.getFrameSize
        if (!(signed || unsigned) || (bits != 8 && bits != 16) || bpf <= 0) None
        else {
          val bytes = ais.readAllBytes()
          val ch = f.getChannels
          val n = bytes.length / bpf
          val out = Array.ofDim[Double](n)
          val big = f.isBigEndian
          var i = 0
          while (i < n) {
            var acc = 0.0
            var c = 0
            while (c < ch) {
              val o = i * bpf + c * (bits / 8)
              acc += (if (bits == 8) {
                if (signed) bytes(o).toDouble / 128.0
                else ((bytes(o) & 0xff) - 128).toDouble / 128.0
              } else {
                val (loB, hiB) = if (big) (bytes(o + 1), bytes(o)) else (bytes(o), bytes(o + 1))
                val u = ((hiB & 0xff) << 8) | (loB & 0xff)
                if (signed) u.toShort.toDouble / 32768.0
                else (u - 32768).toDouble / 32768.0
              })
              c += 1
            }
            out(i) = acc / ch
            i += 1
          }
          Some((f.getSampleRate, out))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /**
   * Real audio embeddings from decoded PCM frames — the audio analog of
   * [[imageFeatures]], under the same `(id, embedding)` contract feeding
   * the ANN index ([[Similarity.annTopK]] etc.). The clip is cut into
   * `windows` fixed grid windows (so clips of any length land in the same
   * dimensionality, like [[lumaGrid]] for images) and each window yields
   * three classic frame features:
   *
   *  - relative RMS: window loudness over clip loudness (the envelope),
   *  - zero-crossing rate: sign changes per sample (pitch/noisiness proxy),
   *  - high-frequency ratio: first-difference RMS over window RMS.
   *
   * The whole clip is de-meaned first and every feature is a ratio, so the
   * embedding is invariant to DC offset and amplitude scaling — the same
   * recording at a different gain maps to (numerically) the same vector,
   * which is exactly what near-duplicate audio detection needs.
   *
   * Payloads that aren't uncompressed PCM (or are shorter than `windows`
   * frames) yield a NULL embedding sentinel — filter them before indexing
   * (compressed-codec decode needs a codec library this container lacks;
   * there is deliberately no fake-feature fallback here so mixed media
   * can't silently pollute an audio index). Runs per-partition on
   * executors; payload bytes drop before any shuffle.
   */
  def audioFeatures(df: DataFrame, idCol: String, payloadCol: String, windows: Int = 16): DataFrame = {
    require(windows >= 1, "windows must be at least 1")
    val projected = df.select(col(idCol).cast("long"), col(payloadCol))
    val spark = df.sparkSession
    import spark.implicits._
    projected.mapPartitions { rows =>
      rows.map { row =>
        val id = row.getLong(0)
        val payload = row.getAs[Array[Byte]](1)
        val vec: Array[Float] = pcmSamples(payload) match {
          case Some((_, samples)) if samples.length >= windows =>
            val n = samples.length
            val mean = samples.sum / n
            var i = 0
            while (i < n) { samples(i) -= mean; i += 1 }
            val clipRms = math.sqrt(samples.map(s => s * s).sum / n)
            val out = Array.ofDim[Float](windows * 3)
            var w = 0
            while (w < windows) {
              val s0 = w * n / windows
              val s1 = math.max((w + 1) * n / windows, s0 + 1)
              val len = s1 - s0
              var sumSq = 0.0; var diffSq = 0.0; var crossings = 0
              // zero-carry sign tracking: a sample quantized to exactly 0
              // must not swallow the crossing around it (a strict product<0
              // test would count one crossing fewer than the same clip at a
              // gain/offset where that sample misses exact zero)
              var prevSign = 0
              var j = s0
              while (j < s1) {
                sumSq += samples(j) * samples(j)
                if (j > s0) {
                  val d = samples(j) - samples(j - 1)
                  diffSq += d * d
                }
                val s = if (samples(j) > 0) 1 else if (samples(j) < 0) -1 else 0
                if (s != 0) {
                  if (prevSign != 0 && s != prevSign) crossings += 1
                  prevSign = s
                }
                j += 1
              }
              val rms = math.sqrt(sumSq / len)
              out(w * 3) = (if (clipRms > 0) rms / clipRms else 0.0).toFloat
              out(w * 3 + 1) = (if (len > 1) crossings.toDouble / (len - 1) else 0.0).toFloat
              out(w * 3 + 2) =
                (if (rms > 0 && len > 1) math.sqrt(diffSq / (len - 1)) / rms else 0.0).toFloat
              w += 1
            }
            out
          case _ => null
        }
        (id, vec)
      }
    }.toDF(idCol, "embedding")
  }

  /**
   * Perceptual AUDIO hash — the audio analogue of [[dHash]]: 64-bit
   * fingerprint from the sign of the energy GRADIENT between 65
   * consecutive RMS windows of the mean-removed PCM clip. Comparing
   * adjacent window energies makes the hash exactly invariant to gain
   * scaling and DC offset (the re-encode edits that change every sample
   * byte without changing the sound), while clips with different energy
   * envelopes land far apart in Hamming space. Returns None for non-PCM
   * payloads or clips shorter than 65 samples — like [[audioFeatures]],
   * there is deliberately NO fake fallback into an audio near-dup index.
   */
  def audioHash(payload: Array[Byte]): Option[Long] =
    pcmSamples(payload) match {
      case Some((_, samples)) if samples.length >= 65 =>
        val n = samples.length
        val mean = samples.sum / n
        val rms = Array.ofDim[Double](65)
        var w = 0
        while (w < 65) {
          val s0 = w * n / 65
          val s1 = math.max((w + 1) * n / 65, s0 + 1)
          var sumSq = 0.0
          var j = s0
          while (j < math.min(s1, n)) {
            val v = samples(j) - mean
            sumSq += v * v
            j += 1
          }
          rms(w) = math.sqrt(sumSq / (math.min(s1, n) - s0))
          w += 1
        }
        var acc = 0L
        var b = 0
        while (b < 64) {
          if (rms(b) < rms(b + 1)) acc |= 1L << b
          b += 1
        }
        Some(acc)
      case _ => None
    }

  /**
   * Near-duplicate AUDIO pairs by banded [[audioHash]] Hamming join — the
   * same 4 x 16-bit pigeonhole bucketing as [[imageNearDupPairs]] (exact
   * recall for `maxHamming <= 3`, bucketed equi-joins, never all-pairs).
   * Non-PCM payloads are EXCLUDED (no hash, no fake fallback), so a mixed
   * media table contributes only its decodable audio.
   */
  def audioNearDupPairs(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(0 <= maxHamming && maxHamming <= 3,
      "4 bands guarantee recall only for maxHamming <= 3")
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions(_.flatMap(r =>
        audioHash(r.getAs[Array[Byte]](1)).map(h => (r.getLong(0), h))))
      .toDF(idCol, "__ah")
    bandedHammingPairs(hashed, idCol, maxHamming)
  }

  /** Shared 4 x 16-bit banded Hamming self-join over an `(id, __ah)` frame. */
  private def bandedHammingPairs(
      hashed: DataFrame, idCol: String, maxHamming: Int): DataFrame = {
    val banded = hashed.select(col(idCol), col("__ah"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("__ah"), b * 16).bitwiseAND(lit(65535L)).as("bb"))): _*)).as("e"))
      .select(col(idCol), col("__ah"), col("e.band").as("band"), col("e.bb").as("bb"))
    val a = banded.select(col("band"), col("bb"), col(idCol).as("id_a"), col("__ah").as("__ah_a"))
    val b = banded.select(col("band"), col("bb"), col(idCol).as("id_b"), col("__ah").as("__ah_b"))
    a.join(b, Seq("band", "bb"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming",
        bit_count(col("__ah_a").bitwiseXOR(col("__ah_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .distinct()
  }

  /** Typed metadata for a video payload (MP4/ISO-BMFF header parse). */
  case class VideoMeta(
      docId: Long,
      byteLen: Long,
      checksum: String,
      timescale: Long,
      duration: Long,
      durationMs: Long)

  implicit val videoMetaEncoder: Encoder[VideoMeta] = Encoders.product[VideoMeta]

  /**
   * Minimal ISO-BMFF (MP4/MOV) box walk: find `moov`/`mvhd` and read the
   * movie timescale + duration. Pure byte arithmetic over the PUBLIC box
   * grammar (`[u32 size][4cc type][payload]`, size 1 -> u64 largesize,
   * size 0 -> to end; mvhd v0 = u32 times, v1 = u64 times) — no codec, no
   * dependency, a few hundred bytes read per file. Returns None for
   * anything malformed.
   */
  private[ops] def parseMvhd(payload: Array[Byte]): Option[(Long, Long)] = {
    def u32(o: Int): Long =
      ((payload(o) & 0xffL) << 24) | ((payload(o + 1) & 0xffL) << 16) |
        ((payload(o + 2) & 0xffL) << 8) | (payload(o + 3) & 0xffL)
    def u64(o: Int): Long =
      (u32(o) << 32) | u32(o + 4)
    @scala.annotation.tailrec
    def findBox(start: Int, end: Int, name: String): Option[(Int, Int)] =
      if (start + 8 > end) None
      else {
        val declared = u32(start)
        val typ = new String(payload, start + 4, 4, "ISO-8859-1")
        val (size, hdr) =
          if (declared == 1 && start + 16 <= end) (u64(start + 8), 16)
          else if (declared == 0) ((end - start).toLong, 8)
          else (declared, 8)
        if (size < hdr || start + size > end) None
        else if (typ == name) Some((start + hdr, start + size.toInt))
        else findBox(start + size.toInt, end, name)
      }
    try
      for {
        (ms, me) <- findBox(0, payload.length, "moov")
        (hs, he) <- findBox(ms, me, "mvhd")
        version = payload(hs) & 0xff
        result <- version match {
          case 0 if hs + 20 <= he => Some((u32(hs + 12), u32(hs + 16)))
          case 1 if hs + 32 <= he => Some((u32(hs + 20), u64(hs + 24)))
          case _ => None
        }
      } yield result
    catch { case _: IndexOutOfBoundsException => None }
  }

  /** True when the payload carries an ISO-BMFF `ftyp` signature. */
  def isIsoBmff(payload: Array[Byte]): Boolean =
    payload.length >= 12 && payload(4) == 'f' && payload(5) == 't' &&
      payload(6) == 'y' && payload(7) == 'p'

  /**
   * Real video metadata for MP4/MOV payloads: movie timescale, duration
   * in timescale units, and milliseconds — from the `mvhd` header alone,
   * never touching sample data, so cost is independent of clip size.
   * Non-BMFF or malformed payloads yield `-1`-sentinel rows (quarantine,
   * not task failure). Runs per-partition on executors.
   */
  def decodeVideoMeta(df: DataFrame, idCol: String, payloadCol: String): Dataset[VideoMeta] = {
    val projected = df.select(col(idCol).cast("long"), col(payloadCol))
    projected.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { row =>
        val id = row.getLong(0)
        val payload = row.getAs[Array[Byte]](1)
        digest.reset()
        val checksum = digest.digest(payload).map("%02x".format(_)).mkString
        val parsed = if (isIsoBmff(payload)) parseMvhd(payload) else None
        val (ts, dur) = parsed.getOrElse((-1L, -1L))
        val durMs = if (ts > 0 && dur >= 0) dur * 1000L / ts else -1L
        VideoMeta(id, payload.length.toLong, checksum, ts, dur, durMs)
      }
    }(videoMetaEncoder)
  }

  /**
   * Real image features, JDK-only: decode, resample to a `grid` x `grid`
   * luma (perceived-brightness) patch by box-averaging pixel blocks, and
   * normalize to zero mean — the classic aHash/dHash family's underlying
   * representation, here exposed as a dense embedding so image payloads
   * flow into the [[Similarity]] ANN/dedup operators unchanged. Visually
   * similar images (resizes, small edits, recompressions) land near each
   * other in cosine space; a learned encoder can replace this per-column
   * without touching any downstream operator.
   */
  private[ops] def lumaGrid(img: java.awt.image.BufferedImage, grid: Int): Array[Double] =
    lumaGridRect(img, grid, grid)

  /** Rectangular luma resample — [[lumaGrid]]'s general form (dHash needs
    * the classic 9x8 patch: one extra column so every bit is a horizontal
    * gradient). Row-major `gw` x `gh`. */
  private[ops] def lumaGridRect(
      img: java.awt.image.BufferedImage, gw: Int, gh: Int): Array[Double] = {
    val out = Array.ofDim[Double](gw * gh)
    val (w, h) = (img.getWidth, img.getHeight)
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw) {
        // box bounds: integer arithmetic, never empty (ceil-div guarded)
        val x0 = gx * w / gw; val x1 = math.max((gx + 1) * w / gw, x0 + 1)
        val y0 = gy * h / gh; val y1 = math.max((gy + 1) * h / gh, y0 + 1)
        var sum = 0.0
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = img.getRGB(x, y)
            // ITU-R BT.601 luma from the sRGB bytes
            sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        out(gy * gw + gx) = sum / ((math.min(x1, w) - x0) * (math.min(y1, h) - y0))
        gx += 1
      }
      gy += 1
    }
    out
  }

  /**
   * Per-image embeddings from [[lumaGrid]] (zero-meaned, as `Array[Float]`
   * under the standard `(id, embedding)` contract). Image payloads decode
   * via [[Codec]]; non-image payloads fall back to [[featureStub]]'s
   * deterministic pseudo-embedding so mixed-media tables never fail.
   * Runs per-partition on executors; payload bytes drop before any shuffle.
   */
  def imageFeatures(df: DataFrame, idCol: String, payloadCol: String, grid: Int = 8): DataFrame = {
    require(grid >= 2, "grid must be at least 2")
    val projected = df.select(col(idCol).cast("long"), col(payloadCol))
    val spark = df.sparkSession
    import spark.implicits._
    val dim = grid * grid
    projected.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { row =>
        val id = row.getLong(0)
        val payload = row.getAs[Array[Byte]](1)
        val img =
          if (Codec.isImage(payload)) {
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
            catch { case scala.util.control.NonFatal(_) => None }
          } else None
        val vec = img match {
          case Some(i) =>
            val g = lumaGrid(i, grid)
            val mean = g.sum / g.length
            g.map(v => (v - mean).toFloat)
          case None => // deterministic fallback, same as featureStub
            Array.tabulate(dim) { j =>
              digest.reset(); digest.update(payload); digest.update(j.toByte)
              val h = digest.digest()
              val bits = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
                ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
              (bits.toDouble / Int.MaxValue.toDouble - 1.0).toFloat
            }
        }
        (id, vec)
      }
    }.toDF(idCol, "embedding")
  }

  /**
   * Perceptual average-hash (aHash): 64-bit fingerprint with bit `i` set
   * when the 8x8 luma cell exceeds the image mean. Visually-near images
   * differ in a few bits, so near-duplicate IMAGE detection is a Hamming
   * join over these — exactly the shape [[Dedup.simhashNearDupPairs]] uses
   * for text; [[imageNearDupPairs]] applies the same 4-band pigeonhole
   * bucketing (exact recall for Hamming <= 3, never an all-pairs compare).
   * Non-image payloads hash their md5 bytes (exact-dup detection only).
   */
  def aHash(payload: Array[Byte]): Long =
    decodeImage(payload) match {
      case Some(i) =>
        val g = lumaGrid(i, 8)
        val mean = g.sum / g.length
        g.zipWithIndex.foldLeft(0L) { case (acc, (v, j)) =>
          if (v > mean) acc | (1L << j) else acc
        }
      case None => md5Hash64(payload)
    }

  /**
   * Perceptual difference-hash (dHash): 64-bit fingerprint from a 9x8 luma
   * patch, bit `(row, col)` set when cell `col` is darker than cell
   * `col + 1` — each bit is a horizontal GRADIENT sign, not an
   * absolute-brightness vote, so dHash survives the edits aHash is
   * weakest to (global brightness/gamma shifts move every cell AND the
   * mean together, flipping aHash bits near the mean but leaving local
   * gradients intact). Same fallback and Hamming-join shape as [[aHash]].
   */
  def dHash(payload: Array[Byte]): Long =
    decodeImage(payload) match {
      case Some(i) =>
        val g = lumaGridRect(i, 9, 8)
        var acc = 0L
        var row = 0
        while (row < 8) {
          var c = 0
          while (c < 8) {
            if (g(row * 9 + c) < g(row * 9 + c + 1)) acc |= 1L << (row * 8 + c)
            c += 1
          }
          row += 1
        }
        acc
      case None => md5Hash64(payload)
    }

  /**
   * Perceptual DCT-hash (pHash): 64-bit fingerprint from the 8x8
   * low-frequency block of the 2D DCT-II over a 32x32 luma patch, bit set
   * when the coefficient exceeds the median of the 63 AC coefficients —
   * the DC term (u=0, v=0, the patch's total brightness) is excluded from
   * BOTH the median and the bit vote, as in the classic pHash recipe: its
   * magnitude dwarfs every AC term, so including it would pin one
   * near-constant bit and skew the median upward, costing discrimination.
   * Bit 0 is therefore always 0. The DCT concentrates the image's
   * large-scale structure into the low-frequency block, so pHash is the
   * most robust of the three to recompression, mild crops and local edits
   * — at ~10x the hash cost (still trivial next to the decode). Same
   * fallback and Hamming-join shape as [[aHash]].
   */
  def pHash(payload: Array[Byte]): Long =
    decodeImage(payload) match {
      case Some(i) =>
        val n = 32
        val g = lumaGridRect(i, n, n)
        // top-left 8x8 of the (orthonormal-scaled) 2D DCT-II, computed
        // directly: 64 coefficients x 1024 samples is trivial per image
        val coef = Array.ofDim[Double](64)
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            var sum = 0.0
            var y = 0
            while (y < n) {
              val cy = math.cos((2 * y + 1) * v * math.Pi / (2 * n))
              var x = 0
              while (x < n) {
                sum += g(y * n + x) * math.cos((2 * x + 1) * u * math.Pi / (2 * n)) * cy
                x += 1
              }
              y += 1
            }
            coef(v * 8 + u) = sum
            u += 1
          }
          v += 1
        }
        // DC excluded: median over the 63 AC coefficients (odd count — the
        // middle element), vote over AC bits only
        val sorted = coef.drop(1).sorted
        val median = sorted(31)
        (1 until 64).foldLeft(0L) { (acc, j) =>
          if (coef(j) > median) acc | (1L << j) else acc
        }
      case None => md5Hash64(payload)
    }

  /** Decoded image, or None for non-image or broken payloads. */
  private def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (Codec.isImage(payload)) {
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }
    } else None

  /** Non-image fallback for the perceptual hashes: first 8 md5 bytes —
    * exact-duplicate detection only, never a spurious near-match. */
  private def md5Hash64(payload: Array[Byte]): Long = {
    val h = java.security.MessageDigest.getInstance("MD5").digest(payload)
    (0 until 8).foldLeft(0L)((acc, j) => (acc << 8) | (h(j) & 0xffL))
  }

  /**
   * Near-duplicate image pairs by banded perceptual-hash Hamming join:
   * compute the chosen perceptual hash per payload on executors, split the
   * 64 bits into 4 16-bit bands, self-equi-join on `(band, value)` buckets
   * (pigeonhole: any pair within `maxHamming <= 3` shares at least one
   * intact band), verify with the exact Hamming distance. Output
   * `(id_a, id_b, hamming)` with `id_a < id_b`. Identical scale shape to
   * the text SimHash join — bucketed equi-joins only, never all-pairs.
   *
   * `method` picks the hash family: `"ahash"` (mean-threshold, cheapest),
   * `"dhash"` (gradient signs — robust to brightness/gamma shifts),
   * `"phash"` (DCT low-frequency — most robust to recompression and local
   * edits). All three drop into the same band join unchanged.
   */
  def imageNearDupPairs(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      maxHamming: Int = 3,
      method: String = "ahash"): DataFrame = {
    require(0 <= maxHamming && maxHamming <= 3,
      "4 bands guarantee recall only for maxHamming <= 3")
    val hashFn: Array[Byte] => Long = method match {
      case "ahash" => aHash
      case "dhash" => dHash
      case "phash" => pHash
      case other =>
        throw new IllegalArgumentException(
          s"method must be ahash, dhash or phash, got $other")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions(_.map(r => (r.getLong(0), hashFn(r.getAs[Array[Byte]](1)))))
      .toDF(idCol, "__ah")
    bandedHammingPairs(hashed, idCol, maxHamming)
  }

  /**
   * Feature extraction stub: a deterministic pseudo-embedding from the
   * payload bytes (md5 over seeded windows, mapped to [-1, 1]). Stands in
   * for a real image/audio encoder — swapping in an ONNX/JNI model changes
   * only this function — and lets the full multimodal pipeline
   * (decode -> featurize -> [[Similarity]] ANN index) run and be tested
   * end-to-end. Runs per-partition on executors, one digest instance each.
   */
  def featureStub(df: DataFrame, idCol: String, payloadCol: String, dim: Int = 16): DataFrame = {
    val projected = df.select(col(idCol).cast("long"), col(payloadCol))
    val spark = df.sparkSession
    import spark.implicits._
    projected.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { row =>
        val id = row.getLong(0)
        val payload = row.getAs[Array[Byte]](1)
        val vec = Array.tabulate(dim) { j =>
          digest.reset()
          digest.update(payload)
          digest.update(j.toByte)
          val h = digest.digest()
          val bits = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) | ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
          (bits.toDouble / Int.MaxValue.toDouble - 1.0).toFloat
        }
        (id, vec)
      }
    }.toDF(idCol, "embedding")
  }

  /**
   * Deterministic frame/sample selection: `n` evenly spaced byte offsets of
   * the payload (the pattern a video frame-sampler follows, minus the codec).
   */
  def sampleOffsets(payload: Column, n: Int): Column = {
    val len = octet_length(payload).cast("long")
    // floor-div, not `/`: Column./ is double division and would yield array<double>
    transform(sequence(lit(0), lit(n - 1)), i => floor(i.cast("long") * len / n).cast("long"))
  }
}
