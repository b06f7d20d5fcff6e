package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads ride through the
  * relational engine as opaque `binary` columns with typed metadata, and
  * decode/feature steps run partition-parallel over the bytes.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode kernels below are clearly-marked DETERMINISTIC STUBS — they
  * derive fake dimensions/features from the payload bytes. Everything
  * around them (schema, batch shape, partition-parallel execution,
  * downstream joins) is real and tested; swapping a stub for a JNI/FFmpeg
  * call changes one function body only.
  */
object Multimodal {

  /** Output schema of [[decodeStub]] — what a real image decoder yields. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Wrap a text corpus as a fake media corpus: payload = utf-8 bytes,
    * media_type round-robined — the shape a real ingest would produce.
    */
  def attachPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast(LongType).as("doc_id"),
      element_at(
        array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (pmod(col(idCol), lit(3)) + 1).cast(IntegerType)).as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** STUB decode: partition-parallel over the binary payload; "width",
    * "height" and "n_frames" are deterministic functions of the bytes in
    * place of a real codec. Runs via mapPartitions so a real decoder's
    * per-partition init (codec contexts, GPU handles) has a home.
    */
  def decodeStub(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(decodedSchema)
    media
      .select(col("doc_id"), col("media_type"), col("payload"))
      // a NULL payload is an undecodable record: dropped here, exactly
      // where a real decoder would quarantine it (a null byte array
      // would otherwise NPE inside the codec kernel)
      .filter(col("payload").isNotNull && col("media_type").isNotNull)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val mt = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
          // STUB: a real implementation parses the container header here.
          // The fake dimensions are arithmetic in the byte count, so the
          // decode output stays predictable by an external oracle.
          val n = bytes.length.toLong
          Row(id, mt, n,
            (256 + n % 512).toInt, (256 + (n / 512) % 512).toInt,
            if (mt == "video/mp4") (1 + n % 240).toInt else 1)
        }
      }(enc)
  }

  /** STUB feature extraction: a unit-normalized 8-dim "embedding" from
    * byte statistics — stands in for a vision/audio encoder. Pure column
    * expressions, so it stays inside whole-stage codegen.
    */
  def featureStub(media: DataFrame, dim: Int = 8): DataFrame = {
    val feats = (0 until dim).map { i =>
      (pmod(xxhash64(col("payload"), lit(i)), lit(1000)).cast(DoubleType) / 500.0) - 1.0
    }
    media.select(
      col("doc_id"),
      array(feats: _*).as("features"))
  }

  /** Resize stage: target dimensions fitting `maxEdge` with the aspect
    * ratio preserved (integer floor arithmetic, portable to any ANSI
    * engine). This is the metadata half of an image resize — the pixel
    * resample itself belongs in the decode kernel ([[decodeStub]]) where
    * the codec lives; every downstream consumer only sees the typed
    * (out_w, out_h) the way it would from a real resizer.
    */
  def resizeStub(decoded: DataFrame, maxEdge: Int): DataFrame = {
    decoded.withColumns(Map(
      "out_w" -> expr(s"(width * $maxEdge) div greatest(width, height)")
        .cast(IntegerType),
      "out_h" -> expr(s"(height * $maxEdge) div greatest(width, height)")
        .cast(IntegerType)))
  }

  /** Frame sampling for video payloads: every `stride`-th frame index up
    * to the decoded frame count — the (doc_id, frame_no) explosion a
    * frame-level pipeline consumes.
    */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded
      .filter(col("media_type") === "video/mp4")
      .select(
        col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_no"))
}
