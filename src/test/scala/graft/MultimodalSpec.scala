package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {

  private lazy val media =
    Multimodal.attachFakePayload(Tables.load(spark, sf(), "documents"), "doc_id", "text")

  test("payload schema contract: binary payload + typed metadata") {
    val sch = media.schema
    assert(sch("payload").dataType.typeName === "binary")
    assert(Seq("kind", "width", "height", "duration_ms").forall(sch.fieldNames.contains))
  }

  test("stub decode is deterministic and partition-batched") {
    val f1 = Multimodal.decodeStub(spark, media).collect()
      .map(f => f.doc_id -> f.checksum).toMap
    val f2 = Multimodal.decodeStub(spark, media.repartition(7)).collect()
      .map(f => f.doc_id -> f.checksum).toMap
    assert(f1 === f2, "features must not depend on partitioning")
    val feats = Multimodal.decodeStub(spark, media).head()
    assert(feats.feature.length === 4)
    assert(feats.feature.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("real BMP round-trip: generated files decode to the exact expected pixels") {
    val docs = Tables.load(spark, sf(), "documents").limit(20)
    val (w, h) = (8, 6)
    val imgs = Multimodal.attachBmpPayload(docs, "doc_id", w, h)
    val feats = Multimodal.decodeBmp(spark, imgs).collect()
    assert(feats.length === 20)
    feats.foreach { f =>
      assert(f.width === w && f.height === h && f.bpp === 24)
      // independent expectation from the shared deterministic pixel fn
      def mean(c: Int) = (for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.pixel(f.doc_id, x, y, c)).sum.toDouble / (w * h)
      assert(math.abs(f.mean_r - mean(0)) < 1e-9)
      assert(math.abs(f.mean_g - mean(1)) < 1e-9)
      assert(math.abs(f.mean_b - mean(2)) < 1e-9)
      assert(f.thumb.length === 4)
      assert(f.thumb.forall(v => v >= 0.0 && v <= 255.0))
    }
    // the payload really is a BMP file: signature + declared size match
    val payload = imgs.head().payload
    assert(payload(0) === 'B'.toByte && payload(1) === 'M'.toByte)
    val declared = java.nio.ByteBuffer.wrap(payload, 2, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(declared === payload.length)
  }

  test("top-down BMPs (negative height) decode identically to bottom-up") {
    import spark.implicits._
    val (w, h) = (8, 6)
    val bottomUp = Multimodal.bmpBytes(7L, w, h)
    // same image, top-down: negate height, reverse the pixel-row order
    val rowSize = ((3 * w + 3) / 4) * 4
    val topDown = bottomUp.clone()
    java.nio.ByteBuffer.wrap(topDown).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(22, -h)
    for (y <- 0 until h)
      System.arraycopy(bottomUp, 54 + (h - 1 - y) * rowSize,
        topDown, 54 + y * rowSize, rowSize)
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", bottomUp, w, h, 0L),
      Multimodal.MediaRecord(2L, "image", topDown, w, h, 0L)).toDS()
    val fs = Multimodal.decodeBmp(spark, media).collect().sortBy(_.doc_id)
    assert(fs(0).mean_r === fs(1).mean_r && fs(0).mean_g === fs(1).mean_g)
    assert(fs(0).thumb.toSeq === fs(1).thumb.toSeq,
      "row order on disk must not change the decoded image")
  }

  test("frame sampling emits n frames of bounded size per doc") {
    val frames = Multimodal.frameSample(media.limit(10), n = 4, frameBytes = 16)
    assert(frames.count() === 40)
    val sizes = frames.select(length(col("frame"))).collect().map(_.getInt(0))
    assert(sizes.forall(_ <= 16))
  }
}
