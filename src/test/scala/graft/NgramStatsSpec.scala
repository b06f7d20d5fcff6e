package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Native NgramStats vs the shingles + array_distinct reference
  * formulation: identical (total, distinct) counts on every edge the
  * byte-scan could get wrong — empty string, consecutive / leading /
  * trailing spaces (empty tokens), multi-byte UTF-8, docs shorter than
  * n, and heavy repetition — plus SQL-name resolution and codegen.
  */
class NgramStatsSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  private val corpus = Seq(
    "a b a b a b",                 // heavy bigram repetition
    "a b c d e",                   // all distinct
    "one",                         // shorter than n=2
    "",                            // empty text -> [""] single token
    "a  b",                        // consecutive spaces -> empty token
    " a b ",                       // leading + trailing spaces
    "héllo wörld héllo wörld",     // multi-byte UTF-8
    "x x x x x x x x x x",
    "tab\tand newline\nstay intact inside tokens tab\tand")

  private def refStats(n: Int) = {
    val g = TextAnalysis.shingles(col("text"), n)
    struct(size(g).cast("long").as("n_grams"),
      size(array_distinct(g)).cast("long").as("n_distinct"))
  }

  test("native == shingles+array_distinct on every edge case, n=2 and n=3") {
    for (n <- Seq(1, 2, 3)) {
      val rows = corpus.toDF("text")
        .select(col("text"),
          refStats(n).as("ref"),
          TextAnalysis.ngramStats(col("text"), n).as("nat"))
        .collect()
      rows.foreach { r =>
        // shingles() returns empty-array (0 grams) below n tokens; the
        // native struct returns (0, 0) — same filter semantics
        assert(r.getStruct(1) == r.getStruct(2),
          s"n=$n text='${r.getString(0)}': ref=${r.getStruct(1)} native=${r.getStruct(2)}")
      }
    }
  }

  test("resolves by SQL name through GraftExtensions") {
    corpus.toDF("text").createOrReplaceTempView("ngram_docs")
    val r = s.sql(
      "SELECT ngram_stats(text, 2).n_grams AS t, ngram_stats(text, 2).n_distinct AS d " +
        "FROM ngram_docs WHERE text = 'a b a b a b'").head()
    assert(r.getLong(0) == 5L && r.getLong(1) == 2L)
  }

  test("stays inside generated code (no interpreter fallback)") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.StringType
    import graft.plans.NgramStats
    val expr = NgramStats(BoundReference(0, StringType, nullable = true), 2)
    GenerateUnsafeProjection.generate(Seq(expr)) // throws on codegen failure
  }

  test("repetitionRatio == reference 1 - distinct/total arithmetic") {
    val rows = corpus.toDF("text")
      .select(col("text"),
        refStats(2).as("ref"),
        TextAnalysis.repetitionRatio(col("text")).as("rep"))
      .collect()
    rows.foreach { r =>
      val ref = r.getStruct(1)
      if (ref.getLong(0) == 0L)
        assert(r.isNullAt(2), s"text='${r.getString(0)}': want null below n")
      else {
        val want = 1.0 - ref.getLong(1).toDouble / ref.getLong(0).toDouble
        assert(r.getDouble(2) == want, s"text='${r.getString(0)}'")
      }
    }
  }

  test("null text yields null struct") {
    val r = Seq((1, Option.empty[String])).toDF("id", "text")
      .select(TextAnalysis.ngramStats(col("text"), 2).as("st")).head()
    assert(r.isNullAt(0))
  }
}
