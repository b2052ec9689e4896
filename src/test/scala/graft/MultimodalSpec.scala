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

  test("frame sampling emits n frames of bounded size per doc") {
    val frames = Multimodal.frameSample(media.limit(10), n = 4, frameBytes = 16)
    assert(frames.count() === 40)
    val sizes = frames.select(length(col("frame"))).collect().map(_.getInt(0))
    assert(sizes.forall(_ <= 16))
  }
}
