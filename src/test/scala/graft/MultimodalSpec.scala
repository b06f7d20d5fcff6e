package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal column plumbing: binary payloads + typed metadata, decode /
  * feature / frame-sample stages. The stub kernels keep the plumbing
  * (schema, partition-parallel shape, joins) testable without external
  * codecs; the REAL pure-JVM codecs (PNG, animated GIF, WAV PCM) are
  * certified here down to per-pixel / per-frame / per-sample round
  * trips against the painted contracts.
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

  // --- real javax.imageio codec -------------------------------------------

  private def ids = Seq(0L, 1L, 31L, 32L, 1023L, 4096L).toDF("doc_id")

  /** The synthetic corpus's pixel contract, computed independently. */
  private def expected(id: Long): (Int, Int, Long) = {
    val w = 16 + (id % 32).toInt
    val h = 16 + ((id / 32) % 32).toInt
    var s = 0L
    for (x <- 0 until w; y <- 0 until h)
      s += (id + x) % 256 + (id + y) % 256 + (id + x + y) % 256
    (w, h, s)
  }

  test("decodeImage reads back exactly the pixels synthImages painted") {
    val got = Multimodal.decodeImage(Multimodal.synthImages(ids, "doc_id"))
      .select("doc_id", "width", "height", "px_sum")
      .as[(Long, Int, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == Set(0L, 1L, 31L, 32L, 1023L, 4096L))
    got.foreach { case (id, (w, h, s)) =>
      assert((w, h, s) == expected(id), s"doc $id: got ($w,$h,$s)")
    }
    // PNG magic really present — these are genuine encoded images
    val payload = Multimodal.synthImages(ids, "doc_id")
      .filter(col("doc_id") === 1023L).head().getAs[Array[Byte]]("payload")
    assert(payload.take(4).toSeq == Seq[Byte](0x89.toByte, 'P', 'N', 'G'))
  }

  test("decodeImage quarantines undecodable payloads instead of failing") {
    val mixed = Multimodal.synthImages(ids, "doc_id").unionByName(
      Seq((900L, "image/png", Array[Byte](1, 2, 3)), // wrong magic
        (901L, "image/png", Array.empty[Byte]))
        .toDF("doc_id", "media_type", "payload"))
    val got = Multimodal.decodeImage(mixed).select("doc_id").as[Long].collect().toSet
    assert(got == Set(0L, 1L, 31L, 32L, 1023L, 4096L), s"quarantine failed: $got")
  }

  test("decodeFrames reads back exactly the GIF frame sequence synthGifs wrote") {
    def pal(k: Int) = ((37 * k) % 256, (73 * k) % 256, (109 * k) % 256)
    val got = Multimodal.decodeFrames(Multimodal.synthGifs(ids, "doc_id"))
      .select("doc_id", "width", "height", "n_frames", "px_sum")
      .as[(Long, Int, Int, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got.keySet == Set(0L, 1L, 31L, 32L, 1023L, 4096L))
    got.foreach { case (id, (w, h, nf, s)) =>
      val (ew, eh, enf) = (8 + (id % 8).toInt, 8 + ((id / 8) % 8).toInt, 1 + (id % 8).toInt)
      val es = (0 until enf).map { f =>
        val (r, g, b) = pal(((id + f) % 8).toInt)
        ew.toLong * eh * (r + g + b)
      }.sum
      assert((w, h, nf, s) == ((ew, eh, enf, es)), s"doc $id: got ($w,$h,$nf,$s)")
    }
    // GIF magic really present — genuine containers
    val payload = Multimodal.synthGifs(ids, "doc_id")
      .filter(col("doc_id") === 1023L).head().getAs[Array[Byte]]("payload")
    assert(new String(payload.take(6), "US-ASCII").startsWith("GIF8"))
    // corrupt payloads quarantine instead of failing the stage
    val mixed = Multimodal.synthGifs(ids, "doc_id").unionByName(
      Seq((900L, "image/gif", Array[Byte](9, 9, 9)))
        .toDF("doc_id", "media_type", "payload"))
    assert(Multimodal.decodeFrames(mixed).count() == 6)
  }

  test("decodeVideo reads back exactly the AVI frames synthAvis wrote") {
    val got = Multimodal.decodeVideo(Multimodal.synthAvis(ids, "doc_id"))
      .select("doc_id", "width", "height", "n_frames", "px_sum")
      .as[(Long, Int, Int, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got.keySet == Set(0L, 1L, 31L, 32L, 1023L, 4096L))
    got.foreach { case (id, (w, h, nf, s)) =>
      val (ew, eh, enf) = (8 + (id % 8).toInt, 8 + ((id / 8) % 8).toInt, 1 + (id % 6).toInt)
      var es = 0L
      for (f <- 0 until enf; x <- 0 until ew; y <- 0 until eh)
        es += (id + x) % 256 + (id + y) % 256 + (id + x + y + f) % 256
      assert((w, h, nf, s) == ((ew, eh, enf, es)), s"doc $id: got ($w,$h,$nf,$s)")
    }
    // RIFF/AVI magic really present — genuine containers
    val payload = Multimodal.synthAvis(ids, "doc_id")
      .filter(col("doc_id") === 1023L).head().getAs[Array[Byte]]("payload")
    assert(new String(payload.take(4), "US-ASCII") == "RIFF")
    assert(new String(payload.slice(8, 12), "US-ASCII") == "AVI ")
    // corrupt containers quarantine instead of failing the stage:
    // short garbage, a truncated real container, and a frame-size lie
    // cut mid-chunk (the trailing idx1 loses 3 body bytes): a chunk that
    // claims more bytes than the container holds must quarantine
    val truncated = payload.dropRight(3)
    val frameLie = payload.clone()
    // break the strf width field: frames no longer match the geometry
    val strfAt = {
      var i = 12
      while (new String(frameLie.slice(i, i + 4), "US-ASCII") != "strf") i += 1
      i
    }
    frameLie(strfAt + 12) = 99.toByte
    val mixed = Multimodal.synthAvis(ids, "doc_id").unionByName(
      Seq((900L, "video/avi", Array[Byte](9, 9, 9)),
        (901L, "video/avi", truncated),
        (902L, "video/avi", frameLie))
        .toDF("doc_id", "media_type", "payload"))
    assert(Multimodal.decodeVideo(mixed).count() == 6)
  }

  test("decodeMjpegFrames round-trips solid colors through a real JPEG decode within tolerance") {
    val frames = Multimodal.decodeMjpegFrames(Multimodal.synthMjpegAvis(ids, "doc_id"))
      .select("doc_id", "frame_idx", "width", "height",
        "r_min", "r_max", "g_min", "g_max", "b_min", "b_max")
      .as[(Long, Int, Int, Int, Int, Int, Int, Int, Int, Int)].collect()
    assert(frames.map(_._1).toSet == Set(0L, 1L, 31L, 32L, 1023L, 4096L))
    var worst = 0
    frames.foreach { case (id, f, w, h, rMin, rMax, gMin, gMax, bMin, bMax) =>
      val (ew, eh, enf) =
        (16 + (id % 4).toInt * 8, 16 + ((id / 4) % 4).toInt * 8, 1 + (id % 3).toInt)
      assert(w == ew && h == eh && f < enf, s"doc $id frame $f: ${(w, h)}")
      val er = ((5 * id + 31 * f) % 256).toInt
      val eg = ((7 * id + 37 * f) % 256).toInt
      val eb = ((11 * id + 41 * f) % 256).toInt
      val dev = Seq(rMin - er, rMax - er, gMin - eg, gMax - eg, bMin - eb, bMax - eb)
        .map(math.abs).max
      worst = math.max(worst, dev)
      assert(dev <= 3,
        s"doc $id frame $f: expected ($er,$eg,$eb), got r[$rMin,$rMax] g[$gMin,$gMax] b[$bMin,$bMax]")
    }
    info(s"worst solid-color JPEG round-trip deviation: $worst")
    // frame count per doc
    val counts = frames.groupBy(_._1).view.mapValues(_.length).toMap
    counts.foreach { case (id, n) => assert(n == 1 + (id % 3).toInt, s"doc $id") }
    // real JPEG bytes inside a real RIFF: SOI marker after the 00dc header
    val payload = Multimodal.synthMjpegAvis(ids, "doc_id")
      .filter(col("doc_id") === 1023L).head().getAs[Array[Byte]]("payload")
    assert(new String(payload.take(4), "US-ASCII") == "RIFF")
    val dcAt = {
      var i = 12
      while (new String(payload.slice(i, i + 4), "US-ASCII") != "00dc") i += 1
      i
    }
    assert((payload(dcAt + 8) & 0xFF) == 0xFF && (payload(dcAt + 9) & 0xFF) == 0xD8,
      "frame chunk must start with the JPEG SOI marker")
    // corrupt containers and frames quarantine instead of failing the stage
    val truncated = payload.dropRight(3)
    val brokenJpeg = payload.clone()
    brokenJpeg(dcAt + 9) = 0 // SOI gone: the JPEG reader must reject it
    val mixed = Multimodal.synthMjpegAvis(ids, "doc_id").unionByName(
      Seq((900L, "video/x-mjpeg-avi", Array[Byte](9, 9, 9)),
        (901L, "video/x-mjpeg-avi", truncated),
        (902L, "video/x-mjpeg-avi", brokenJpeg))
        .toDF("doc_id", "media_type", "payload"))
    assert(Multimodal.decodeMjpegFrames(mixed).select("doc_id").distinct().count() == 6)
  }

  test("imageAHash collides pixel-identical images and separates distinct ones") {
    val s = spark
    import s.implicits._
    // ids 1024 apart paint IDENTICAL pixels (256 | 1024, and the 32-cycle
    // geometry divides 1024): their aHashes must collide; neighbors with
    // different geometry/pattern must not all collapse together
    val pairIds = Seq(0L, 1024L, 7L, 1031L, 5L, 40L).toDF("doc_id")
    val got = Multimodal.imageAHash(Multimodal.synthImages(pairIds, "doc_id"))
      .select("doc_id", "ahash_hi", "ahash_lo")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == Set(0L, 1024L, 7L, 1031L, 5L, 40L))
    assert(got(0L) == got(1024L), "pixel-identical images must share an aHash")
    assert(got(7L) == got(1031L))
    val distinctHashes = got.values.toSet
    assert(distinctHashes.size >= 3,
      s"distinct images collapsed to too few hashes: $got")
    // halves stay non-negative (32 bits each) so any SQL engine's
    // BIGINT holds them without sign-overflow differences
    got.values.foreach { case (hi, lo) =>
      assert(hi >= 0 && hi < (1L << 32) && lo >= 0 && lo < (1L << 32))
    }
    // undecodable payloads quarantine
    val mixed = Multimodal.synthImages(pairIds, "doc_id").unionByName(
      Seq((900L, "image/png", Array[Byte](1, 2, 3)))
        .toDF("doc_id", "media_type", "payload"))
    assert(Multimodal.imageAHash(mixed).count() == 6)
  }

  test("decodeAudio reads back exactly the PCM samples synthWavs wrote") {
    val got = Multimodal.decodeAudio(Multimodal.synthWavs(ids, "doc_id"))
      .select("doc_id", "sample_rate", "n_samples", "amp_sum")
      .as[(Long, Int, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == Set(0L, 1L, 31L, 32L, 1023L, 4096L))
    got.foreach { case (id, (rate, n, s)) =>
      val en = 400 + (id % 800).toInt
      val es = (0 until en).map(t => (id * 31 + t * 17) % 65536 - 32768).sum
      assert((rate, n, s) == ((8000, en.toLong, es)), s"doc $id: got ($rate,$n,$s)")
    }
    // RIFF magic really present — these are genuine WAV containers
    val payload = Multimodal.synthWavs(ids, "doc_id")
      .filter(col("doc_id") === 1023L).head().getAs[Array[Byte]]("payload")
    assert(new String(payload.take(4), "US-ASCII") == "RIFF")
    // corrupt payloads quarantine instead of failing the stage
    val mixed = Multimodal.synthWavs(ids, "doc_id").unionByName(
      Seq((900L, "audio/wav", Array[Byte](1, 2, 3)))
        .toDF("doc_id", "media_type", "payload"))
    assert(Multimodal.decodeAudio(mixed).count() == 6)
  }

  test("resizeImage emits real re-encoded images at the floor-arithmetic dims") {
    val resized = Multimodal.decodeImage(
      Multimodal.resizeImage(Multimodal.synthImages(ids, "doc_id"), maxEdge = 24))
      .select("doc_id", "width", "height")
      .as[(Long, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(resized.keySet.size == 6)
    resized.foreach { case (id, (ow, oh)) =>
      val (w, h, _) = expected(id)
      val long = math.max(w, h)
      assert((ow, oh) == (math.max(1, w * 24 / long), math.max(1, h * 24 / long)),
        s"doc $id: $w x $h -> $ow x $oh")
      assert(math.max(ow, oh) <= 24 && (w >= h) == (ow >= oh))
    }
  }
}
