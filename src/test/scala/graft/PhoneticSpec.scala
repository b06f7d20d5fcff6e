package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** [[TextAnalysis.phoneticKey]]: classic American-Soundex values on the
  * standard reference names (including the H/W-transparency and
  * same-code-first-letter rules), NULL poles, and the 6-pass collapse
  * bound at the 64-letter cap.
  */
class PhoneticSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  private def keyOf(words: String*): Map[String, String] =
    words.toDF("w")
      .select(col("w"), TextAnalysis.phoneticKey(col("w")).as("k"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("classic Soundex reference names") {
    val got = keyOf("Robert", "Rupert", "Ashcraft", "Tymczak", "Pfister",
      "Honeyman", "widget", "small", "ring")
    assert(got("Robert") == "R163" && got("Rupert") == "R163")
    // H is transparent: S and C collapse across it
    assert(got("Ashcraft") == "A261")
    assert(got("Tymczak") == "T522")
    // F shares P's code and collapses into the first letter
    assert(got("Pfister") == "P236")
    assert(got("Honeyman") == "H555")
    assert(got("widget") == "W323")
    assert(got("small") == "S540" && got("ring") == "R520")
  }

  test("case/punctuation invariance, NULL poles, and the collapse pass bound") {
    val got = keyOf("o'brien", "OBrien")
    assert(got("o'brien") == got("OBrien"))
    val nulls = Seq("", "42 --", "   ").toDF("w")
      .select(TextAnalysis.phoneticKey(col("w"))).collect()
    assert(nulls.forall(_.isNullAt(0)))
    // 64-letter single-code runs must fully collapse in the 6 passes
    val runs = keyOf("A" * 64, "B" * 64, "ab" * 32)
    assert(runs("A" * 64) == "A000")
    assert(runs("B" * 64) == "B000")
    // alternating a/b never collapses: codes 0101..., vowels drop
    assert(runs("ab" * 32) == "A111")
  }
}
