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

  test("sampleOffsets picks n evenly spaced byte offsets") {
    val df = Seq(("x" * 100)).toDF("text").select(encode($"text", "UTF-8").as("payload"))
    df.select(Multimodal.sampleOffsets($"payload", 4)).as[Seq[Long]].head() shouldBe
      Seq(0L, 25L, 50L, 75L)
  }
}
