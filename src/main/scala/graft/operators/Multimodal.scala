package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride along as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs per-partition over batches (the Scala
  * analogue of `mapInPandas` — partition-sized batches, columnar in,
  * columnar out).
  *
  * The actual media decode is STUBBED (no codec libraries in this
  * environment): `decodeStub` derives deterministic fake features from
  * the payload bytes. Everything around it — schema, batching,
  * partitioning, frame sampling — is real and tested (MultimodalSpec).
  */
object Multimodal {

  /** Typed record: the schema contract for multimodal rows. */
  final case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte],
                               width: Int, height: Int, duration_ms: Long)
  final case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Int,
                                 checksum: String, feature: Array[Double])

  /** Attach a synthetic binary payload + metadata to a text table —
    * stands in for reading real media blobs; keeps the pipeline
    * runnable end-to-end on the test data.
    */
  def attachFakePayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      when(col(idCol) % 3 === 0, "image").when(col(idCol) % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col(textCol).cast("binary").as("payload"),
      (col(idCol) % 640 + 64).cast("int").as("width"),
      (col(idCol) % 480 + 48).cast("int").as("height"),
      (col(idCol) * 40 % 90000).cast("long").as("duration_ms"))

  /** Per-partition batch "decode": the real implementation would hand
    * each partition's payloads to a codec; here the features are a
    * deterministic function of the bytes. Runs as Dataset
    * mapPartitions so the batch shape (iterator-of-records per
    * partition, no driver collect) matches a production decode.
    */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val sum = java.security.MessageDigest.getInstance("MD5").digest(r.payload)
        val hex = sum.map("%02x".format(_)).mkString
        // ??? real decode goes here (image resize / audio features / frame grab)
        val fake = (0 until 4).map(i =>
          java.lang.Long.parseLong(hex.substring(i * 4, i * 4 + 4), 16) / 65535.0).toArray
        MediaFeatures(r.doc_id, r.kind, r.payload.length, hex, fake)
      }
    }
  }

  /** Frame sampling plumbing: slice `n` evenly spaced byte windows from
    * each payload (stand-in for video frame extraction) — pure
    * columnar expressions, one row per (doc, frame).
    */
  def frameSample(media: DataFrame, n: Int, frameBytes: Int): DataFrame =
    media.select(col("doc_id"), col("kind"),
        explode(expr(
          s"transform(sequence(0, ${n - 1}), i -> struct(i AS frame_no, " +
            s"substring(payload, CAST(i * greatest(length(payload) div $n, 1) AS INT) + 1, $frameBytes) AS frame))")).as("f"))
      .select(col("doc_id"), col("kind"), col("f.frame_no").as("frame_no"),
        col("f.frame").as("frame"))
}
