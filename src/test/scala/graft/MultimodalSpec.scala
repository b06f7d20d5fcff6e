package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal column plumbing: binary payloads + typed metadata, decode /
  * feature / frame-sample stages (codecs are deterministic stubs; the
  * schema, partition-parallel shape, and joins are the real thing).
  */
class MultimodalSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  private def media = Multimodal.attachPayload(
    Seq((1L, "hello world"), (2L, "payload two"), (3L, "third döc ✓"))
      .toDF("doc_id", "text"),
    "doc_id", "text")

  test("attachPayload yields binary payloads with a media_type per row") {
    val m = media.cache()
    assert(m.schema("payload").dataType.typeName == "binary")
    assert(m.select("media_type").distinct().count() == 3)
    val bytes = m.filter(col("doc_id") === 1).head().getAs[Array[Byte]]("payload")
    assert(new String(bytes, "UTF-8") == "hello world")
    m.unpersist()
  }

  test("decodeStub is deterministic, schema-stable, and partition-parallel") {
    val d1 = Multimodal.decodeStub(media).collect().sortBy(_.getLong(0))
    val d2 = Multimodal.decodeStub(media.repartition(3)).collect().sortBy(_.getLong(0))
    assert(d1.toSeq == d2.toSeq, "decode must not depend on partitioning")
    assert(Multimodal.decodeStub(media).schema == Multimodal.decodedSchema)
    assert(d1.forall(r => r.getLong(2) > 0 && r.getInt(3) >= 256))
  }

  test("featureStub emits unit-dim fixed-width feature vectors") {
    val f = Multimodal.featureStub(media, dim = 8)
    assert(f.select(size(col("features"))).distinct().head().getInt(0) == 8)
  }

  test("resizeStub fits the long edge and preserves aspect ordering") {
    val resized = Multimodal.resizeStub(Multimodal.decodeStub(media), maxEdge = 224)
      .select("width", "height", "out_w", "out_h").collect()
    resized.foreach { r =>
      val (w, h, ow, oh) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(math.max(ow, oh) == 224, s"long edge must hit maxEdge: $r")
      assert((w >= h) == (ow >= oh), s"orientation preserved: $r")
      assert(ow <= 224 && oh <= 224)
    }
  }

  test("sampleFrames strides over decoded video frames only") {
    val decoded = Multimodal.decodeStub(media)
    val frames = Multimodal.sampleFrames(decoded, stride = 10).cache()
    val videos = decoded.filter(col("media_type") === "video/mp4")
      .select("doc_id").as[Long].collect().toSet
    assert(frames.select("doc_id").as[Long].collect().toSet == videos)
    assert(frames.filter(col("frame_no") % 10 =!= 0).isEmpty)
    frames.unpersist()
  }
}
