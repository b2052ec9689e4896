package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride along as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs per-partition over batches (the Scala
  * analogue of `mapInPandas` — partition-sized batches, columnar in,
  * columnar out).
  *
  * COMPRESSED codecs (jpeg/mp3/h264) are STUBBED — no codec libraries
  * in this environment; `decodeStub` derives deterministic fake
  * features from the payload bytes. The UNCOMPRESSED image path is
  * REAL: [[attachBmpPayload]] builds valid 24-bit BMP files byte by
  * byte and [[decodeBmp]] parses headers and pixel rows (bottom-up,
  * 4-byte padded) into channel means + a grayscale thumbnail — the
  * full decode contract (schema, batching, per-partition execution,
  * feature shape) exercised with real bytes, so swapping in a codec
  * library changes one function body, not the pipeline.
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

  final case class ImageFeatures(doc_id: Long, width: Int, height: Int, bpp: Int,
                                 mean_r: Double, mean_g: Double, mean_b: Double,
                                 thumb: Array[Double])

  /** Deterministic pixel value — shared by the generator and the
    * spec's independent expectation.
    */
  def pixel(docId: Long, x: Int, y: Int, channel: Int): Int =
    (((docId * 31 + x * 7 + y * 13 + channel * 101) % 256) + 256).toInt % 256

  /** Build REAL 24-bit BMP payloads (BITMAPINFOHEADER, bottom-up rows,
    * 4-byte row padding) with deterministic pixels — a valid image
    * file any viewer opens, constructed without any codec library.
    */
  def attachBmpPayload(docs: DataFrame, idCol: String,
                       width: Int = 8, height: Int = 6): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id")).as[Long].map { id =>
      MediaRecord(id, "image", bmpBytes(id, width, height), width, height, 0L)
    }
  }

  private[graft] def bmpBytes(docId: Long, w: Int, h: Int): Array[Byte] = {
    val rowSize = ((3 * w + 3) / 4) * 4
    val fileSize = 54 + rowSize * h
    val buf = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54) // pixel data offset
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (y <- h - 1 to 0 by -1) { // bottom-up row order
      for (x <- 0 until w) {
        buf.put(pixel(docId, x, y, 2).toByte) // B
        buf.put(pixel(docId, x, y, 1).toByte) // G
        buf.put(pixel(docId, x, y, 0).toByte) // R
      }
      for (_ <- 3 * w until rowSize) buf.put(0.toByte)
    }
    buf.array()
  }

  /** REAL per-partition image decode: parse each BMP's header
    * (dimensions, bit depth, pixel offset) and pixel rows, emit
    * channel means and a `thumbW x thumbH` grayscale thumbnail by box
    * averaging. Same mapPartitions batch shape as [[decodeStub]].
    */
  def decodeBmp(spark: SparkSession, media: Dataset[MediaRecord],
                thumbW: Int = 2, thumbH: Int = 2): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val b = java.nio.ByteBuffer.wrap(r.payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        require(b.get(0) == 'B' && b.get(1) == 'M', s"doc ${r.doc_id}: not a BMP")
        val offset = b.getInt(10)
        val w = b.getInt(18)
        val rawH = b.getInt(22) // negative height = top-down row order
        val bpp = b.getShort(28).toInt
        require(bpp == 24, s"doc ${r.doc_id}: only uncompressed 24-bit supported, got $bpp")
        require(w > 0 && rawH != 0, s"doc ${r.doc_id}: degenerate dimensions ${w}x$rawH")
        val topDown = rawH < 0
        val h = math.abs(rawH)
        val rowSize = ((3 * w + 3) / 4) * 4
        def chan(x: Int, y: Int, c: Int): Int = { // c: 0=R 1=G 2=B
          val row = if (topDown) y else h - 1 - y
          val pos = offset + row * rowSize + 3 * x + (2 - c)
          r.payload(pos) & 0xff
        }
        var sr = 0L; var sg = 0L; var sb = 0L
        val thumb = new Array[Double](thumbW * thumbH)
        val cnt = new Array[Int](thumbW * thumbH)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val (pr, pg, pb) = (chan(x, y, 0), chan(x, y, 1), chan(x, y, 2))
            sr += pr; sg += pg; sb += pb
            val cell = math.min(y * thumbH / h, thumbH - 1) * thumbW +
              math.min(x * thumbW / w, thumbW - 1)
            thumb(cell) += (pr + pg + pb) / 3.0
            cnt(cell) += 1
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        ImageFeatures(r.doc_id, w, h, bpp,
          sr.toDouble / n, sg.toDouble / n, sb.toDouble / n,
          thumb.indices.map(i => if (cnt(i) == 0) 0.0 else thumb(i) / cnt(i)).toArray)
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
