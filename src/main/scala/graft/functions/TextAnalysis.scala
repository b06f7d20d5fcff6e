package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Text-analysis expressions for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristics, fingerprinting.
  *
  * All pure Catalyst built-ins (codegen'd, pushdown-safe) — no UDFs. Each
  * is usable as a column inside any scan-shaped plan, so at 100 TB they run
  * embedded in the parquet scan stage with zero extra shuffles.
  */
object TextAnalysis {

  /** Whitespace tokenization of trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Token count WITHOUT materializing the token array: one token more
    * than the number of whitespace runs in the trimmed text. Identical to
    * `size(tokens(c))` on every input — split("") is [""] (size 1) and
    * regexp_count("") is 0+1 — but allocation-free, which dominates when
    * only the count is aggregated over a corpus.
    */
  def tokenCount(c: Column): Column =
    (regexp_count(trim(c), lit("\\s+")) + 1).cast(LongType)

  def distinctTokenCount(c: Column): Column =
    size(array_distinct(tokens(c))).cast(LongType)

  /** Lexical diversity: distinct tokens / tokens. */
  def distinctRatio(c: Column): Column =
    distinctTokenCount(c).cast(DoubleType) / tokenCount(c).cast(DoubleType)

  /** Quality gate: plausible length and diversity (the reference-free
    * heuristics used to filter LLM training text).
    */
  def qualityFlag(c: Column, minTokens: Int = 20, maxTokens: Int = 2000,
      minDistinctRatio: Double = 0.15): Column =
    when(
      tokenCount(c) >= minTokens && tokenCount(c) <= maxTokens &&
        distinctRatio(c) > minDistinctRatio, 1L).otherwise(0L)

  /** English stopwords for ratio scoring (kept tiny on purpose — the
    * ratio is a quality SIGNAL, not an NLP feature).
    */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "of", "and", "to", "in", "is")

  /** Soundex-style phonetic blocking key — the entity-resolution
    * blocker: misspelled/variant name tokens land in the same 4-char
    * bucket, so fuzzy matching only compares WITHIN buckets instead of
    * across the corpus. Classic American-Soundex recipe (first letter +
    * three consonant-class digits; vowels break runs, H/W are
    * transparent inside them), with two deviations pinned for
    * cross-engine determinism: input truncates to 64 letters, and a
    * leading H/W defers to the first coded consonant. Runs collapse by
    * 6 halving passes of literal `dd → d` replaces (NOT a `(\d)\1+`
    * regex — DuckDB's RE2 has no backreferences, and 2⁶ ≥ the 64-letter
    * cap makes the passes provably complete), so the SQL oracle can
    * replay the key byte for byte. Empty/non-alphabetic input keys to
    * NULL.
    */
  def phoneticKey(c: Column): Column = {
    // A..Z consonant classes; 9 marks the transparent H/W
    val letters = substring(upper(regexp_replace(c, "[^A-Za-z]", "")), 1, 64)
    val coded = translate(letters,
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230129022455012623019202")
    val no9 = replace(coded, lit("9"), lit(""))
    val collapsed = (1 to 6).foldLeft(no9) { (acc, _) =>
      "0123456".foldLeft(acc)((a, d) =>
        replace(a, lit(s"$d$d"), lit(s"$d")))
    }
    when(length(letters) > 0,
      concat(substring(letters, 1, 1),
        rpad(substring(replace(substring(collapsed, 2, 63), lit("0"),
          lit("")), 1, 3), 3, "0")))
  }

  /** The DuckDB replay of [[phoneticKey]] over a column expression —
    * ONE generator for both engines so the recipe cannot drift.
    */
  def phoneticKeySql(expr: String): String = {
    val letters =
      s"substr(upper(regexp_replace($expr, '[^A-Za-z]', '', 'g')), 1, 64)"
    val coded =
      s"translate($letters, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '01230129022455012623019202')"
    val no9 = s"replace($coded, '9', '')"
    val collapsed = (1 to 6).foldLeft(no9) { (acc, _) =>
      "0123456".foldLeft(acc)((a, d) => s"replace($a, '$d$d', '$d')")
    }
    s"""CASE WHEN length($letters) > 0
       |THEN substr($letters, 1, 1)
       |  || rpad(substr(replace(substr($collapsed, 2, 63), '0', ''), 1, 3), 3, '0')
       |END""".stripMargin.replaceAll("\n\\s*", " ")
  }

  /** Number of whitespace tokens that are stopwords. */
  def stopwordCount(c: Column, stops: Seq[String] = Stopwords): Column =
    size(filter(tokens(c), t => t.isInCollection(stops))).cast(LongType)

  /** Stopword fraction of the token stream — low values flag keyword spam
    * and non-prose; identical integer division on both engines.
    */
  def stopwordRatio(c: Column, stops: Seq[String] = Stopwords): Column =
    stopwordCount(c, stops).cast(DoubleType) / tokenCount(c).cast(DoubleType)

  /** Non-whitespace character count — the numerator of mean word length,
    * allocation-free (no token array: strip whitespace runs, measure).
    */
  def wordCharCount(c: Column): Column =
    length(regexp_replace(trim(c), "\\s+", "")).cast(LongType)

  /** Mean word length (Gopher rule: keep 3–10) as the IEEE quotient of
    * two exact integer counts, so engines agree bit for bit.
    */
  def meanWordLength(c: Column): Column =
    wordCharCount(c).cast(DoubleType) / tokenCount(c).cast(DoubleType)

  /** Tokens containing at least one ASCII letter (Gopher rule: > 80% of
    * words must — pure numbers/symbols flag tables and machine output).
    */
  def alphaWordCount(c: Column): Column =
    size(filter(tokens(c), t => t.rlike("[a-zA-Z]"))).cast(LongType)

  /** Distinct stopwords present (Gopher rule: >= 2 — their absence flags
    * keyword lists and non-English text).
    */
  def stopwordHits(c: Column, stops: Seq[String] = Stopwords): Column =
    size(array_intersect(array_distinct(tokens(c)),
      array(stops.map(lit): _*))).cast(LongType)

  /** Number of sentence-punctuation characters. */
  def punctCount(c: Column): Column =
    regexp_count(c, lit("[.,!?;:]")).cast(LongType)

  /** Punctuation characters per character — near zero flags unpunctuated
    * machine text, high values flag markup/tables.
    */
  def punctRatio(c: Column): Column =
    punctCount(c).cast(DoubleType) / length(c).cast(DoubleType)

  /** True iff `word` occurs as a whitespace-delimited token. */
  def hasMarkerWord(c: Column, word: String): Column =
    concat(lit(" "), c, lit(" ")).like(s"% $word %")

  /** Marker-word language-ID heuristic: first language whose marker hits.
    * Markers are (language → distinctive stopword).
    */
  def langIdHeuristic(c: Column, markers: Seq[(String, String)]): Column =
    markers.foldRight(lit("und"): Column) { case ((lang, w), acc) =>
      when(hasMarkerWord(c, w), lang).otherwise(acc)
    }

  /** Word n-gram (count, distinct count) in one native pass
    * ([[graft.plans.NgramStats]] — zero per-gram materialization;
    * sessions must load `graft.plans.GraftExtensions`). Identical
    * counts to `shingles` + `array_distinct` + `size`, including
    * empty-token behavior. Returns struct<n_grams, n_distinct>.
    */
  def ngramStats(c: Column, n: Int): Column =
    call_function("ngram_stats", c, lit(n))

  /** Most frequent word n-gram + its count in one native pass
    * ([[graft.plans.NgramTop]]; byte-order tie-break) — the histogram
    * argmax behind the Gopher top-n-gram character-fraction rule.
    * Returns struct<n_grams, top_count, top_gram>; null below n tokens.
    */
  def ngramTop(c: Column, n: Int): Column =
    call_function("ngram_top", c, lit(n))

  /** Word n-gram shingles (default 3) for MinHash; empty array when the
    * text is shorter than `n` tokens. `element_at` is 1-indexed.
    */
  def shingles(c: Column, n: Int = 3): Column = {
    val toks = split(c, " ")
    when(
      size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*)))
      .otherwise(array())
  }

  /** Fixed-size overlapping token chunks — context-window splitting for
    * training: chunk i covers tokens [i·stride+1, i·stride+chunkSize]
    * (1-based, clipped at the end), indices run while i·stride < n so
    * every token lands in at least one chunk; trailing chunks shorten.
    * Pure per-row array expressions (map-side, codegen'd, no shuffle).
    * Returns array<struct<chunk_idx:bigint, toks:array<string>>>.
    */
  def tokenChunks(c: Column, chunkSize: Int, stride: Int): Column = {
    require(chunkSize >= stride && stride > 0,
      s"need chunkSize >= stride > 0 for full coverage, got ($chunkSize, $stride)")
    val toks = split(c, " ")
    transform(
      sequence(lit(0L),
        floor((size(toks) - 1).cast(DoubleType) / stride).cast(LongType)),
      i => struct(
        i.as("chunk_idx"),
        slice(toks, (i * stride + 1).cast("int"), lit(chunkSize)).as("toks")))
  }

  /** GPT-2-style pre-tokenizer regex (simplified, ASCII, engine-portable):
    * contraction suffixes, letter runs, digit runs, punctuation runs.
    */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"

  /** BPE-ish token count: number of pre-tokenizer matches — a far better
    * LLM-token estimate than whitespace splitting ("don't." is 4 tokens,
    * not 1).
    */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpePattern), lit(0))).cast(LongType)

  /** Portable PII patterns: no \b or lookarounds, so Java regex (Spark)
    * and RE2 (common in other engines) agree on every match.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Redact emails and phone numbers — the standard pre-training scrub
    * step. Pure regexp_replace: codegen'd, map-side, no UDF.
    */
  def scrubPii(c: Column): Column =
    regexp_replace(regexp_replace(c, emailRe, "<EMAIL>"), phoneRe, "<PHONE>")

  /** Fraction of repeated word-bigrams within a document (1 − distinct /
    * total) — the repetition quality signal; highly repetitive docs are
    * low-value training data.
    */
  def repetitionRatio(c: Column): Column = {
    val st = ngramStats(c, 2)
    // null (not 0/0 — an ANSI-mode error) below two tokens: a document
    // with no bigrams has no repetition signal
    when(st.getField("n_grams") >= 1L,
      lit(1.0) - st.getField("n_distinct").cast("double") /
        st.getField("n_grams").cast("double"))
  }

  /** Deterministic document fingerprint: md5 of the leading 64 chars. */
  def fingerprint(c: Column): Column = md5(substring(c, 1, 64))

  /** Rolling-hash fingerprint (winnowing-style): the minimum hash over
    * every `window`-char substring — stable under edits outside the
    * minimizing window, unlike a whole-document hash. One pass of
    * length-n per document, pure Catalyst (`transform` over a position
    * sequence), no UDF.
    */
  def rollingFingerprint(c: Column, window: Int = 8): Column =
    array_min(
      transform(
        sequence(lit(1), greatest(length(c) - (window - 1), lit(1))),
        i => md5(substr(c, i, lit(window)))))
}
