package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** [[graft.operators.Bpe]] against a brute-force reference: greedy
  * left-to-right pair merging over a (word, count) vocabulary, exactly
  * the loop a single-machine BPE trainer runs.
  */
class BpeSpec extends SparkSpec {

  /** Reference implementation: token lists, explicit greedy merge. */
  private def bruteMerges(vocab: Seq[(String, Long)],
      rounds: Int): Seq[(Int, String, String, Long)] = {
    var v = vocab.map { case (w, n) => (w.toList.map(_.toString), n) }
    val out = mutable.Buffer[(Int, String, String, Long)]()
    for (r <- 1 to rounds) {
      val counts = mutable.Map[(String, String), Long]().withDefaultValue(0L)
      for ((toks, n) <- v; i <- 0 until toks.length - 1)
        counts((toks(i), toks(i + 1))) += n
      val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, x, y) }
      out += ((r, a, b, cnt))
      v = v.map { case (toks, n) =>
        val merged = mutable.Buffer[String]()
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            merged += (a + b); i += 2
          } else { merged += toks(i); i += 1 }
        }
        (merged.toList, n)
      }
    }
    out.toSeq
  }

  private def learn(vocab: Seq[(String, Long)],
      rounds: Int): Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    Bpe.learnMerges(vocab.toDF("word", "n"), "word", "n", rounds)
      .orderBy("round")
      .collect()
      .map(r => (r.getLong(0).toInt, r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
  }

  test("merges match brute force on overlap-heavy words") {
    // consecutive repeats, merged-token boundaries, multi-merge chains
    val vocab = Seq(
      ("aaa", 5L), ("ababab", 4L), ("banana", 7L), ("erer", 3L),
      ("aab", 2L), ("ba", 9L), ("a", 6L), ("abba", 1L))
    assert(learn(vocab, 6) == bruteMerges(vocab, 6))
  }

  test("merges match brute force on corpus words") {
    import spark.implicits._
    val words = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toSeq
    assert(learn(words, 4) == bruteMerges(words, 4))
  }

  test("rounds past the learnable merges leave the vocabulary intact") {
    import spark.implicits._
    // only one learnable merge exists ((a,b)); asking for 5 rounds must
    // not wipe the vocabulary through an empty-top cross join
    val vocab = Seq(("ab", 3L)).toDF("word", "n")
    val merges = Bpe.learnMerges(vocab, "word", "n", rounds = 5).collect()
    assert(merges.length == 1, "only the learnable round emits a merge row")
    assert(merges.head.getString(1) == "a" && merges.head.getString(2) == "b")
    val toks = Bpe.mergedVocab(vocab, "word", "n", rounds = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(toks == Seq(("ab", 3L)), "vocabulary must pass through unchanged")
  }

  test("merged token boundaries never false-match inside multi-char tokens") {
    // after merging (a,b), a word containing "...ab c..." must not let a
    // later (b,c) merge eat the b out of "ab"
    val vocab = Seq(("abc", 1L), ("bc", 10L), ("ab", 5L))
    // round 1 merges (b,c) [count 11]; "abc" = [a,b,c] -> [a,bc]
    val got = learn(vocab, 2)
    val want = bruteMerges(vocab, 2)
    assert(got == want)
  }
}
