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
 * iteration via `mapPartitions` — is real and tested. The actual media
 * decoding is STUBBED with a deterministic fake ([[FakeCodec]]): this
 * container has no image/audio libraries, so the stub stands in where a JNI
 * or library decoder would plug in. Swapping in a real decoder changes only
 * `FakeCodec.decode`.
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

  /**
   * Deterministic stand-in for a media codec. A real implementation would
   * parse the container format; the fake derives stable pseudo-dimensions
   * from the payload so tests exercise the full pipeline shape.
   */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int) = {
      // ??? <- real decoder goes here; the fake below keeps plumbing testable
      val n = payload.length
      val w = 64 + (math.abs(payload.take(16).foldLeft(17)(31 * _ + _)) % 1024)
      val h = 64 + (n % 1024)
      (w, h)
    }
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
        val (w, h) = FakeCodec.decode(payload)
        digest.reset()
        val checksum = digest.digest(payload).map("%02x".format(_)).mkString
        MediaMeta(id, kind, payload.length.toLong, checksum, w, h)
      }
    }(mediaMetaEncoder)
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
