package graft.ops

import org.apache.spark.sql.functions._

import graft.testkit.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def payloads = Seq(
    (1L, "a tiny payload"),
    (2L, "another, rather longer, binary-ish payload éè"),
    (3L, "")
  ).toDF("doc_id", "text").select($"doc_id", encode($"text", "UTF-8").as("payload"))

  test("payloadMeta computes byte length and md5 checksum in SQL") {
    val meta = Multimodal.payloadMeta($"payload").map { case (n, c) => c.as(n) }
    val rows = payloads.select($"doc_id" +: meta: _*).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    rows(1L)._1 shouldBe "a tiny payload".getBytes("UTF-8").length.toLong
    rows(2L)._1 shouldBe "another, rather longer, binary-ish payload éè".getBytes("UTF-8").length.toLong
    rows(1L)._2 should fullyMatch regex "[0-9a-f]{32}"
    rows(3L)._1 shouldBe 0L
  }

  test("decodeMeta runs per-partition, yields typed deterministic metadata") {
    val meta = Multimodal.decodeMeta(payloads, "doc_id", "payload", kind = "image")
    val rows = meta.collect().map(m => m.docId -> m).toMap
    rows should have size 3
    rows(1L).kind shouldBe "image"
    rows(1L).byteLen shouldBe "a tiny payload".getBytes("UTF-8").length.toLong
    // checksum agrees with Spark's own md5 of the same bytes
    val sqlMd5 = payloads.filter($"doc_id" === 1).select(md5($"payload")).as[String].head()
    rows(1L).checksum shouldBe sqlMd5
    // fake decode is deterministic
    val again = Multimodal.decodeMeta(payloads, "doc_id", "payload", "image").collect()
      .map(m => m.docId -> ((m.width, m.height))).toMap
    rows.view.mapValues(m => (m.width, m.height)).toMap shouldBe again
  }

  test("decodeMeta decodes a real PNG via the JDK ImageIO path") {
    // generate a genuine 7x5 PNG in-memory: the decode must return the
    // actual pixel dimensions, not the fake's payload-derived pseudo-dims
    val img = new java.awt.image.BufferedImage(7, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(3, 2, 0xff8800)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val png = buf.toByteArray
    Multimodal.Codec.isImage(png) shouldBe true
    Multimodal.Codec.decode(png) shouldBe ((7, 5))

    val media = Seq((10L, png), (11L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val rows = Multimodal.decodeMeta(media, "doc_id", "payload", kind = "image")
      .collect().map(m => m.docId -> m).toMap
    rows(10L).width shouldBe 7
    rows(10L).height shouldBe 5
    rows(10L).byteLen shouldBe png.length.toLong
    // non-image payloads take the deterministic fallback, never fail the task
    val (fw, fh) = Multimodal.FakeCodec.decode("not an image".getBytes("UTF-8"))
    (rows(11L).width, rows(11L).height) shouldBe ((fw, fh))
    // a corrupt image header (valid magic, garbage body) also falls back
    val corrupt = png.take(12) ++ Array.fill[Byte](8)(0x7f)
    noException should be thrownBy Multimodal.Codec.decode(corrupt)
  }

  test("malformed payloads that pass the magic sniff quarantine, never kill the task") {
    // JDK readers throw UNCHECKED exceptions (IllegalArgument, AIOOBE,
    // NegativeArraySize) on some malformed-header payloads, not just
    // IOException — every decode path must quarantine the row regardless.
    val nasty: Seq[Array[Byte]] = Seq(
      // BMP claiming absurd negative dimensions
      Array[Byte]('B', 'M') ++ Array.fill[Byte](16)(0xff.toByte) ++ Array.fill[Byte](40)(0x80.toByte),
      // truncated PNG: magic only
      Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47),
      // GIF8 header then garbage
      "GIF89a".getBytes("ISO-8859-1") ++ Array.fill[Byte](20)(0xee.toByte),
      // JPEG SOI then zeros
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++ Array.fill[Byte](30)(0),
      // WAV RIFF header with a garbage fmt chunk
      "RIFF????WAVE".getBytes("ISO-8859-1") ++ Array.fill[Byte](24)(0x55))
    nasty.foreach { p =>
      noException should be thrownBy Multimodal.Codec.decode(p)
      noException should be thrownBy Multimodal.aHash(p)
    }
    val media = nasty.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("doc_id", "payload")
    Multimodal.decodeMeta(media, "doc_id", "payload", "image").collect() should have size 5
    Multimodal.decodeAudioMeta(media, "doc_id", "payload").collect()
      .count(_.sampleRateHz < 0) shouldBe 5 // all quarantined as sentinel rows
    Multimodal.imageFeatures(media, "doc_id", "payload", grid = 4).collect() should have size 5
  }

  test("featureStub payloads flow into the ANN index end-to-end") {
    val media = (1L to 40L).map { i =>
      // duplicate payloads in pairs: (1,2), (3,4), ... share bytes
      (i, s"payload content number ${(i + 1) / 2}")
    }.toDF("doc_id", "text").select($"doc_id", encode($"text", "UTF-8").as("payload"))
    val features = Multimodal.featureStub(media, "doc_id", "payload", dim = 16)
    features.count() shouldBe 40
    // identical payloads -> identical embeddings -> cosine 1 neighbors
    val top = Similarity.bruteForceTopK(
      features.filter($"doc_id" === 1), features, "doc_id", "embedding", k = 1)
      .select("neighbor_id", "cosine").as[(Long, Double)].head()
    top shouldBe ((2L, 1.0))
    // deterministic across invocations
    val again = Multimodal.featureStub(media, "doc_id", "payload", dim = 16)
    features.join(again.withColumnRenamed("embedding", "e2"), "doc_id")
      .filter($"embedding" =!= $"e2").count() shouldBe 0
  }

  private def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, f(x, y))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("imageFeatures embeds real pixels: scale-invariant, contrast-sensitive") {
    val halfBright = png(16, 16)((x, _) => if (x < 8) 0x000000 else 0xffffff)
    val halfBrightBig = png(32, 32)((x, _) => if (x < 16) 0x000000 else 0xffffff)
    val inverted = png(16, 16)((x, _) => if (x < 8) 0xffffff else 0x000000)
    val media = Seq((1L, halfBright), (2L, halfBrightBig), (3L, inverted))
      .toDF("doc_id", "payload")
    val vecs = Multimodal.imageFeatures(media, "doc_id", "payload", grid = 8)
      .collect().map(r => r.getLong(0) -> r.getAs[Seq[Float]](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    // same pattern at 2x resolution -> identical luma grid -> cosine 1
    cos(vecs(1L), vecs(2L)) shouldBe 1.0 +- 1e-6
    // inverted pattern -> anti-correlated
    cos(vecs(1L), vecs(3L)) shouldBe -1.0 +- 1e-6
  }

  test("imageNearDupPairs finds perceptually-near images via banded aHash join") {
    val base = png(16, 16)((x, y) => if (x + y < 16) 0x101010 else 0xe0e0e0)
    // one-pixel tweak: perceptually the same image
    val tweaked = png(16, 16)((x, y) =>
      if (x == 3 && y == 3) 0x202020 else if (x + y < 16) 0x101010 else 0xe0e0e0)
    val inverted = png(16, 16)((x, y) => if (x + y < 16) 0xe0e0e0 else 0x101010)
    Multimodal.aHash(base) should not be Multimodal.aHash(inverted)
    val media = Seq((1L, base), (2L, tweaked), (3L, inverted)).toDF("doc_id", "payload")
    val pairs = Multimodal.imageNearDupPairs(media, "doc_id", "payload", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairs should contain((1L, 2L))
    pairs.exists { case (a, b) => a == 3L || b == 3L } shouldBe false
    // non-image payloads fall back to exact md5 bits: identical bytes pair up
    val blobs = Seq((10L, "same bytes".getBytes("UTF-8")),
      (11L, "same bytes".getBytes("UTF-8")),
      (12L, "other bytes".getBytes("UTF-8"))).toDF("doc_id", "payload")
    Multimodal.imageNearDupPairs(blobs, "doc_id", "payload", maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet shouldBe Set((10L, 11L))
  }

  test("dHash survives monotone brightness edits that flip aHash bits") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // 9x8 cells of constant color (4 px each) at deterministic spread-out
    // levels: box averages equal the cell levels exactly, so a per-pixel
    // monotone map stays monotone on the grid
    def level(cx: Int, cy: Int): Int = (37 * (cy * 9 + cx) + 11) % 256
    def cellPng(f: Int => Int): Array[Byte] =
      png(36, 32) { (x, y) =>
        val v = (f(level(x / 4, y / 4)) max 0) min 255
        (v << 16) | (v << 8) | v
      }
    val base = cellPng(identity)
    // strong gamma: strictly increasing, so every horizontal gradient sign
    // is preserved — dHash is exactly invariant
    val gamma = cellPng(v => math.round(255.0 * math.pow(v / 255.0, 0.35)).toInt)
    hamming(Multimodal.dHash(base), Multimodal.dHash(gamma)) shouldBe 0
    // the same edit moves cells across the (shifted) mean: aHash degrades
    hamming(Multimodal.aHash(base), Multimodal.aHash(gamma)) should be > 3
    // a genuinely different layout stays far under dHash
    val other = cellPng(v => 255 - v)
    hamming(Multimodal.dHash(base), Multimodal.dHash(other)) should be > 16
  }

  test("pHash survives local edits and recompression-scale noise") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // 8x8 blocks at spread-out levels: spectrally RICH low-frequency
    // content, so the 64 DCT coefficients sit far from the median and the
    // hash has margin (a smooth two-tone scene concentrates energy in two
    // coefficients and leaves the rest hovering at the median, where any
    // perturbation flips bits — the synthetic analogue of a flat image)
    def scene(noise: (Int, Int) => Int, invert: Boolean = false): Array[Byte] =
      png(64, 64) { (x, y) =>
        val lvl = (37 * ((y / 8) * 8 + x / 8) + 11) % 256
        val v0 = if (invert) 255 - lvl else lvl
        val v = ((v0 + noise(x, y)) max 0) min 255
        (v << 16) | (v << 8) | v
      }
    val base = scene((_, _) => 0)
    // checkerboard +-2: pure pixel-frequency noise, the dithery residue
    // recompression leaves — far outside the DCT's low-frequency block
    val speckled = scene((x, y) => ((x + y) % 2) * 4 - 2)
    val patched = scene((x, y) => if (x < 4 && y < 4) 40 else 0) // small local edit
    val inverted = scene((_, _) => 0, invert = true)
    hamming(Multimodal.pHash(base), Multimodal.pHash(speckled)) should be <= 3
    hamming(Multimodal.pHash(base), Multimodal.pHash(patched)) should be <= 3
    hamming(Multimodal.pHash(base), Multimodal.pHash(inverted)) should be > 16
  }

  test("dhash/phash methods drop into the banded Hamming join unchanged") {
    def cell(v: Int) = (v << 16) | (v << 8) | v
    val base = png(36, 32)((x, y) => cell((37 * ((y / 4) * 9 + x / 4) + 11) % 256))
    val gamma = png(36, 32) { (x, y) =>
      val v = (37 * ((y / 4) * 9 + x / 4) + 11) % 256
      cell(math.round(255.0 * math.pow(v / 255.0, 0.35)).toInt min 255)
    }
    val other = png(36, 32)((x, y) => cell(255 - (37 * ((y / 4) * 9 + x / 4) + 11) % 256))
    val media = Seq((1L, base), (2L, gamma), (3L, other)).toDF("doc_id", "payload")
    val dPairs = Multimodal.imageNearDupPairs(media, "doc_id", "payload",
      maxHamming = 3, method = "dhash")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    dPairs should contain((1L, 2L))
    dPairs.exists { case (a, b) => a == 3L || b == 3L } shouldBe false
    // the aHash default misses the gamma recrawl the gradient hash catches
    Multimodal.imageNearDupPairs(media, "doc_id", "payload", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet should not contain ((1L, 2L))
    an[IllegalArgumentException] should be thrownBy
      Multimodal.imageNearDupPairs(media, "doc_id", "payload", method = "bogus")
  }

  test("decodeAudioMeta parses real WAV headers; non-audio quarantines") {
    // a genuine 1-second 8 kHz mono PCM WAV, built in memory
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val frames = 8000
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](frames * 2)), fmt, frames.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    val wav = buf.toByteArray

    val media = Seq((1L, wav), (2L, "definitely not audio".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val rows = Multimodal.decodeAudioMeta(media, "doc_id", "payload")
      .collect().map(m => m.docId -> m).toMap
    rows(1L).sampleRateHz shouldBe 8000.0
    rows(1L).channels shouldBe 1
    rows(1L).frames shouldBe 8000L
    rows(1L).durationMs shouldBe 1000L
    rows(1L).byteLen shouldBe wav.length.toLong
    // unparseable payload: sentinel row, task never fails
    rows(2L).sampleRateHz shouldBe -1.0
    rows(2L).frames shouldBe -1L
  }

  /** Build a genuine 16-bit mono PCM WAV from a sample generator. */
  private def wavOf(rate: Float, n: Int)(sample: Int => Double): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val pcm = java.nio.ByteBuffer.allocate(n * 2).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach { i =>
      val v = math.max(-1.0, math.min(1.0, sample(i)))
      pcm.putShort(math.round(v * 32767).toShort)
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm.array()), fmt, n.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  test("audioFeatures embeds real PCM: gain/offset-invariant, content-sensitive") {
    val rate = 8000f
    val n = 8000
    // a clip with structure: loud low tone, then quiet high tone
    def tone(i: Int): Double =
      if (i < n / 2) 0.6 * math.sin(2 * math.Pi * 220 * i / rate)
      else 0.15 * math.sin(2 * math.Pi * 1800 * i / rate)
    val original = wavOf(rate, n)(tone)
    val regained = wavOf(rate, n)(i => 0.4 * tone(i) + 0.05) // gain + DC offset
    val noise = wavOf(rate, n) { i =>
      val h = i * 2654435761L
      ((h >>> 33) & 0xffff).toDouble / 32768.0 - 1.0
    }
    val media = Seq((1L, original), (2L, regained), (3L, noise),
      (4L, "not audio at all".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val rows = Multimodal.audioFeatures(media, "doc_id", "payload", windows = 8)
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[scala.collection.Seq[Float]](1)).map(_.toArray)).toMap

    val a = rows(1L).get; val b = rows(2L).get; val c = rows(3L).get
    a should have length 24 // 8 windows x (relRMS, ZCR, HF ratio)
    // same recording at different gain + DC offset: numerically same vector
    // (16-bit requantization is the only noise)
    a.zip(b).foreach { case (x, y) => math.abs(x - y) should be < 0.02f }
    // the envelope is real: loud first half, quiet second half
    a(0) should be > 1.2f
    a(7 * 3) should be < 0.5f
    // and the high tone has a much higher ZCR than the low tone
    a(7 * 3 + 1) should be > (a(1) * 3)
    // different content diverges
    a.zip(c).map { case (x, y) => math.abs(x - y) }.max should be > 0.3f
    // non-PCM payload: NULL sentinel, task never fails
    rows(4L) shouldBe None
  }

  test("audioHash is gain/offset-invariant; audioNearDupPairs pairs re-encodes only") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val rate = 8000f
    val n = 8000
    // an amplitude envelope with real structure across the 65 RMS windows
    def clip(i: Int): Double =
      (0.2 + 0.6 * math.abs(math.sin(2 * math.Pi * 3.1 * i / n))) *
        math.sin(2 * math.Pi * 440 * i / rate)
    val original = wavOf(rate, n)(clip)
    val regained = wavOf(rate, n)(i => 0.35 * clip(i) + 0.04) // gain + DC shift
    val reversed = wavOf(rate, n)(i => clip(n - 1 - i))       // mirrored envelope
    val noise = wavOf(rate, n) { i =>
      val h = i * 2654435761L
      ((h >>> 33) & 0xffff).toDouble / 32768.0 - 1.0
    }
    val h0 = Multimodal.audioHash(original).get
    // window-RMS gradient signs survive gain + DC re-encoding exactly
    // (up to 16-bit requantization at near-tied windows)
    hamming(h0, Multimodal.audioHash(regained).get) should be <= 2
    hamming(h0, Multimodal.audioHash(reversed).get) should be > 16
    hamming(h0, Multimodal.audioHash(noise).get) should be > 10
    Multimodal.audioHash("not audio".getBytes("UTF-8")) shouldBe None

    val media = Seq((1L, original), (2L, regained), (3L, reversed),
      (4L, "not audio".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val pairs = Multimodal.audioNearDupPairs(media, "doc_id", "payload", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairs should contain((1L, 2L))
    pairs.exists { case (a, b) => a >= 3L || b >= 3L } shouldBe false
  }

  test("audioFeatures embeddings flow into the ANN index end-to-end") {
    val rate = 8000f
    val n = 4000
    def clip(freq: Double, amp: Double)(i: Int): Double =
      amp * math.sin(2 * math.Pi * freq * i / rate) *
        (0.5 + 0.5 * math.sin(2 * math.Pi * 2 * i / rate)) // 2 Hz envelope
    // pairs (1,2), (3,4): same content at different gain; 5 is unrelated
    val media = Seq(
      (1L, wavOf(rate, n)(clip(300, 0.8))), (2L, wavOf(rate, n)(clip(300, 0.3))),
      (3L, wavOf(rate, n)(clip(1200, 0.5))), (4L, wavOf(rate, n)(clip(1200, 0.9))),
      (5L, wavOf(rate, n)(i => if ((i / 400) % 2 == 0) 0.5 else -0.1)),
      (6L, "not audio".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val emb = Multimodal.audioFeatures(media, "doc_id", "payload", windows = 8)
      .filter($"embedding".isNotNull) // drop the sentinel before indexing
    emb.count() shouldBe 5
    val top1 = Similarity.bruteForceTopK(emb, emb, "doc_id", "embedding", k = 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    top1(1L) shouldBe 2L
    top1(2L) shouldBe 1L
    top1(3L) shouldBe 4L
    top1(4L) shouldBe 3L
  }

  test("decodeVideoMeta reads mvhd timescale/duration from a hand-built MP4") {
    // minimal ISO-BMFF: ftyp box + moov box wrapping an mvhd v0 with
    // timescale 600 and duration 1800 (= 3000 ms)
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes("ISO-8859-1")).put(payload)
      bb.array()
    }
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100) // v0 mvhd body is 100 bytes
      bb.putInt(0) // version 0 + flags
      bb.putInt(0).putInt(0) // creation, modification
      bb.putInt(600) // timescale
      bb.putInt(1800) // duration
      bb.array()
    }
    val mp4 = box("ftyp", "isom0000".getBytes("ISO-8859-1")) ++
      box("moov", box("mvhd", mvhd))
    Multimodal.isIsoBmff(mp4) shouldBe true
    Multimodal.parseMvhd(mp4) shouldBe Some((600L, 1800L))

    val media = Seq((1L, mp4), (2L, "not a video".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val rows = Multimodal.decodeVideoMeta(media, "doc_id", "payload")
      .collect().map(m => m.docId -> m).toMap
    rows(1L).timescale shouldBe 600L
    rows(1L).duration shouldBe 1800L
    rows(1L).durationMs shouldBe 3000L
    rows(2L).timescale shouldBe -1L // quarantined, not failed
    // a truncated/corrupt BMFF payload also quarantines
    val corrupt = mp4.take(20)
    Multimodal.parseMvhd(corrupt) shouldBe None
  }

  test("sampleOffsets picks n evenly spaced byte offsets") {
    val df = Seq(("x" * 100)).toDF("text").select(encode($"text", "UTF-8").as("payload"))
    df.select(Multimodal.sampleOffsets($"payload", 4)).as[Seq[Long]].head() shouldBe
      Seq(0L, 25L, 50L, 75L)
  }
}
