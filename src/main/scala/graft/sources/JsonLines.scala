package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-Lines corpus interchange — the de-facto LLM-corpus exchange
  * format (one JSON object per line; The Pile, RedPajama, Dolma and
  * friends all ship this way). The reference's interchange format is
  * CSV-with-header ([[CsvStaging]], consumer.sql:17–49); JSONL is its
  * modern counterpart for document corpora, so the engine speaks both.
  *
  * Scale notes baked into the API:
  *  - READS take an EXPLICIT schema: schema inference on a 100 TB corpus
  *    is a full extra pass before the first real job, and a drifted
  *    upstream field silently widens types mid-pipeline. Bad lines land
  *    in a corrupt-record column (PERMISSIVE mode) so one mangled row
  *    quarantines instead of failing the load — the JSONL analog of the
  *    CSV staging layer's dirt conventions.
  *  - Uncompressed or per-file-compressed JSONL is line-splittable, so
  *    Spark parallelizes within files; gzip is NOT splittable — a
  *    gzipped corpus must arrive as many files (one task per file),
  *    which is exactly how public corpora are shipped (thousands of
  *    .jsonl.gz shards). [[write]] therefore compresses per FILE and
  *    callers control shard count with the frame's partitioning.
  */
object JsonLines {

  /** Export a frame as JSONL, one output file per partition of `df`
    * (shard count = partition count — repartition first to choose it).
    */
  def write(df: DataFrame, path: String, compression: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    compression.foreach(c => w.option("compression", c))
    w.json(path)
  }

  /** Read a JSONL corpus under an explicit schema. Lines that fail to
    * parse (or whose fields violate the schema) surface as rows with
    * every data column null and the raw line in `corruptCol` — filter on
    * `col(corruptCol).isNotNull` to quarantine them, as
    * [[quarantined]] does.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** Split a [[read]] result into (clean, quarantined): clean rows drop
    * the corrupt column; quarantined rows carry the raw offending line.
    *
    * The parsed frame is cache()d first — Spark refuses plans that read
    * ONLY the corrupt-record column straight off raw JSON
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the
    * cache also means one parse pass feeds both splits instead of two.
    * Callers done with both frames may `unpersist()` either (they share
    * the cached parse).
    */
  def quarantined(df: DataFrame, corruptCol: String = "_corrupt_record")
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val parsed = df.cache()
    (parsed.filter(col(corruptCol).isNull).drop(corruptCol),
      parsed.filter(col(corruptCol).isNotNull)
        .select(col(corruptCol).as("raw_line")))
  }
}
