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
