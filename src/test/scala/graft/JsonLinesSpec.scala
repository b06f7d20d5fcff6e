package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.JsonLines

/** JSONL corpus interchange: lossless round-trip of awkward text,
  * per-file compression sharding, corrupt-line quarantine.
  */
class JsonLinesSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  private def docs = Seq(
    (1L, "plain tokens here", "en", 17L),
    (2L, "quote \" backslash \\ slash / done", "en", 31L),
    (3L, "newline\nand\ttab and unicode é中😀", "xx", 30L),
    (4L, "", "en", 0L))
    .toDF("doc_id", "text", "lang", "n_chars")

  test("gzip-sharded round-trip is lossless; shard count follows partitioning") {
    val dir = Files.createTempDirectory("graft_jsonl_rt").toString
    JsonLines.write(docs.repartition(3), dir, compression = Some("gzip"))
    val shards = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".json.gz"))
    assert(shards.length == 3, s"one shard per partition, got ${shards.toSeq}")
    val (clean, quarantine) = JsonLines.quarantined(
      JsonLines.read(s, dir, docs.schema))
    assert(quarantine.isEmpty)
    assert(clean.as[(Long, String, String, Long)].collect().toSet ==
      docs.as[(Long, String, String, Long)].collect().toSet)
  }

  test("a mangled line quarantines with its raw text; clean rows are unaffected") {
    val dir = Files.createTempDirectory("graft_jsonl_bad").toString
    JsonLines.write(docs, dir)
    val broken = """{"doc_id": 99, "text": "never closed"""
    val extra = Paths.get(dir, "zz_bad.json")
    Files.writeString(extra, broken + "\n")
    val (clean, quarantine) = JsonLines.quarantined(
      JsonLines.read(s, dir, docs.schema))
    assert(clean.count() == 4)
    assert(quarantine.as[String].collect().toSeq == Seq(broken))
  }
}
