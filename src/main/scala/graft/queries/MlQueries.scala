package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.{Bpe, LangModel, Similarity, Sketches, Stats}
import graft.queries.Q.C
import graft.sources.Tables

/** ML-preparation operators a training pipeline runs between the raw
  * warehouse and the trainer: data-drift gates, fabrication audits,
  * vocabulary induction, LM-based quality scoring, hashing-trick
  * featurization, sparse retrieval. Every entry is oracle-checked with
  * the engine-exact arithmetic recipes (integer-scaled division, decimal
  * sums, pinned final doubles) the rest of the catalog uses.
  */
object MlQueries {

  /** Benford first-digit audit over order totals
    * ([[Stats.benfordAudit]]): the data-fabrication screen. Digits come
    * from exact integer cents via string heads (no libm); expected
    * shares are literals. The synthetic feed's flat-ish digit profile is
    * exactly what the audit is built to flag.
    */
  private val benford = Q(
    "qa_benford",
    """WITH c AS (SELECT CAST(round(CAST(o_totalprice AS DECIMAL(18,4)) * 100, 0) AS BIGINT) AS cents
      |          FROM orders WHERE o_totalprice > 0),
      |g AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
      |             CAST(count(*) AS BIGINT) AS n
      |      FROM c GROUP BY 1),
      |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM g),
      |e AS (SELECT digit, n,
      |             CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
      |             ([0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
      |               0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
      |               0.05799194697768673, 0.05115252244738129, 0.04575749056067514])[digit] AS expected
      |      FROM g CROSS JOIN t)
      |SELECT digit, n, share, expected, abs(share - expected) AS abs_dev
      |FROM e""".stripMargin) { (s, d) =>
    Stats.benfordAudit(Tables.orders(s, d), col("o_totalprice"))
  }

  /** Distribution drift of purchase values between the first and second
    * half of the event span ([[Stats.driftChi2]]): 8 equi-width bins,
    * exact integer cell counts, per-bin chi-square terms as pinned
    * doubles — the pre-retrain feed gate.
    */
  private val drift = Q(
    "qa_drift",
    """WITH p AS (SELECT CAST(ts AS TIMESTAMP) AS ts, CAST(value AS DOUBLE) AS v
      |          FROM events WHERE event_type = 'purchase'),
      |m AS (SELECT CAST(min(v) AS DOUBLE) AS lo, CAST(max(v) AS DOUBLE) AS hi,
      |             CAST(epoch_us(min(ts)) AS BIGINT) AS t0,
      |             CAST(epoch_us(max(ts)) AS BIGINT) AS t1
      |      FROM p),
      |b AS (SELECT CASE WHEN m.hi > m.lo
      |             THEN least(7, CAST(floor((p.v - m.lo) / ((m.hi - m.lo) / 8)) AS INT))
      |             ELSE 0 END AS bin,
      |             CASE WHEN epoch_us(p.ts) * 2 < m.t0 + m.t1 THEN 1 ELSE 0 END AS early
      |      FROM p CROSS JOIN m),
      |g AS (SELECT CAST(bin AS BIGINT) AS bin,
      |             CAST(SUM(early) AS BIGINT) AS n_early,
      |             CAST(SUM(1 - early) AS BIGINT) AS n_late
      |      FROM b GROUP BY 1),
      |t AS (SELECT CAST(SUM(n_early) AS BIGINT) AS tot_early,
      |             CAST(SUM(n_late) AS BIGINT) AS tot_late FROM g)
      |SELECT bin, n_early, n_late,
      |       CASE WHEN tot_early > 0 AND tot_late > 0 THEN
      |       (CAST(n_early AS DOUBLE) - CAST(n_early + n_late AS DOUBLE) * CAST(tot_early AS DOUBLE) / CAST(tot_early + tot_late AS DOUBLE))
      |       * (CAST(n_early AS DOUBLE) - CAST(n_early + n_late AS DOUBLE) * CAST(tot_early AS DOUBLE) / CAST(tot_early + tot_late AS DOUBLE))
      |       / (CAST(n_early + n_late AS DOUBLE) * CAST(tot_early AS DOUBLE) / CAST(tot_early + tot_late AS DOUBLE))
      |       + (CAST(n_late AS DOUBLE) - CAST(n_early + n_late AS DOUBLE) * CAST(tot_late AS DOUBLE) / CAST(tot_early + tot_late AS DOUBLE))
      |       * (CAST(n_late AS DOUBLE) - CAST(n_early + n_late AS DOUBLE) * CAST(tot_late AS DOUBLE) / CAST(tot_early + tot_late AS DOUBLE))
      |       / (CAST(n_early + n_late AS DOUBLE) * CAST(tot_late AS DOUBLE) / CAST(tot_early + tot_late AS DOUBLE))
      |       END AS chi2_term
      |FROM g CROSS JOIN t""".stripMargin) { (s, d) =>
    Stats.driftChi2(
      Tables.events(s, d).filter(col("event_type") === "purchase"),
      col("value"), col("ts"), nBins = 8)
  }

  /** Hashing-trick featurization of customers
    * ([[Sketches.featureBucket]]): segment and nation features land in a
    * 64-bucket space with NO vocabulary pass; the readout is the
    * collision audit (rows, distinct features, sample per bucket) that
    * decides whether the dimension is wide enough.
    */
  private val featureHash = Q(
    "ml_feature_hash",
    s"""WITH f AS (SELECT c_custkey,
       |                 unnest(['seg=' || c_mktsegment,
       |                         'nat=' || CAST(c_nationkey AS VARCHAR)]) AS feat
       |          FROM customer),
       |h AS (SELECT feat,
       |             CAST(('0x' || substr(md5(feat), 1, 13)) AS BIGINT) % 64 AS bucket
       |      FROM f)
       |SELECT CAST(bucket AS BIGINT) AS bucket, $C AS n_rows,
       |       CAST(count(DISTINCT feat) AS BIGINT) AS n_feats,
       |       min(feat) AS sample_feat
       |FROM h GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .select(explode(array(
        concat(lit("seg="), col("c_mktsegment")),
        concat(lit("nat="), col("c_nationkey").cast("string")))).as("feat"))
      .groupBy(Sketches.featureBucket(col("feat"), 64).as("bucket"))
      .agg(
        count(lit(1)).cast(LongType).as("n_rows"),
        countDistinct(col("feat")).cast(LongType).as("n_feats"),
        min(col("feat")).as("sample_feat"))
  }

  /** Corpus-trained bigram-LM quality score per document
    * ([[LangModel.bigramScore]]): mean conditional probability of each
    * token transition, computed as integer-scaled truncating divisions
    * (engine-exact) with one pinned double readout — the KenLM-style
    * low-tail filter.
    */
  private val bigramLm = Q(
    "text_bigram_lm",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |tr AS (SELECT doc_id, l[i] AS prev, l[i+1] AS cur
      |       FROM toks CROSS JOIN LATERAL (SELECT unnest(range(1, len(l))) AS i) t),
      |cp AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS n_pair FROM tr GROUP BY 1, 2),
      |cu AS (SELECT prev, CAST(SUM(n_pair) AS BIGINT) AS n_prev FROM cp GROUP BY 1),
      |sc AS (SELECT tr.doc_id,
      |              CAST((CAST(cp.n_pair AS HUGEINT) * 1000000000000) // cu.n_prev AS BIGINT) AS p_scaled
      |       FROM tr JOIN cp ON tr.prev = cp.prev AND tr.cur = cp.cur
      |              JOIN cu ON tr.prev = cu.prev)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trans,
      |       CAST(SUM(p_scaled) AS DOUBLE) / CAST(count(*) AS DOUBLE)
      |         / CAST(1000000000000 AS DOUBLE) AS avg_prob
      |FROM sc GROUP BY 1""".stripMargin) { (s, d) =>
    // spread: the corpus arrives as one parquet file — without a
    // repartition the transition explode (the query's dominant stage)
    // runs on the scan's 1-2 input partitions
    LangModel.bigramScore(Tables.spread(Tables.documents(s, d)), "doc_id", "text")
  }

  /** Held-out bigram-LM quality scores ([[LangModel.bigramScoreHeldout]]):
    * the model (counts + vocabulary) trains on even doc_ids only and
    * scores the odd ones with add-one smoothing — the leak-free form of
    * `text_bigram_lm`'s filter (an LM trained on the text it scores
    * inflates every score), with the per-document OOV-transition count
    * the gibberish screen reads first.
    */
  private val lmHeldout = Q(
    "text_lm_heldout",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |trtr AS (SELECT l[i] AS prev, l[i+1] AS cur
      |         FROM toks CROSS JOIN LATERAL (SELECT unnest(range(1, len(l))) AS i) t
      |         WHERE doc_id % 2 = 0),
      |cp AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS n_pair FROM trtr GROUP BY 1, 2),
      |cu AS (SELECT prev, CAST(SUM(n_pair) AS BIGINT) AS n_prev FROM cp GROUP BY 1),
      |v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vsz
      |      FROM (SELECT unnest(l) AS tok FROM toks WHERE doc_id % 2 = 0)),
      |tetr AS (SELECT doc_id, l[i] AS prev, l[i+1] AS cur
      |         FROM toks CROSS JOIN LATERAL (SELECT unnest(range(1, len(l))) AS i) t
      |         WHERE doc_id % 2 = 1),
      |sc AS (SELECT tetr.doc_id,
      |              CASE WHEN cu.prev IS NULL THEN 1 ELSE 0 END AS oov,
      |              CAST(((COALESCE(cp.n_pair, 0) + 1) * CAST(1000000000000 AS HUGEINT))
      |                   // GREATEST(COALESCE(cu.n_prev, 0) + v.vsz, 1) AS BIGINT) AS p_scaled
      |       FROM tetr LEFT JOIN cp ON tetr.prev = cp.prev AND tetr.cur = cp.cur
      |                 LEFT JOIN cu ON tetr.prev = cu.prev
      |                 CROSS JOIN v)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trans,
      |       CAST(SUM(oov) AS BIGINT) AS n_oov,
      |       CAST(SUM(p_scaled) AS DOUBLE) / CAST(count(*) AS DOUBLE)
      |         / 1000000000000.0 AS avg_prob
      |FROM sc GROUP BY 1""".stripMargin) { (s, d) =>
    val docs = Tables.spread(Tables.documents(s, d))
    LangModel.bigramScoreHeldout(
      docs.filter(pmod(col("doc_id"), lit(2)) === 0),
      docs.filter(pmod(col("doc_id"), lit(2)) === 1),
      "doc_id", "text")
  }

  /** Sparse tf-idf cosine top-3 for a bounded query-doc set
    * ([[Similarity.tfidfTopK]]): the inverted-index join — corpus
    * scanned once, only term-sharing docs scored, integer-exact
    * accumulations, rational idf (N/df, no libm), bounded-heap ranking.
    */
  private val tfidfKnn = Q(
    "text_tfidf_knn",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |tf AS (SELECT doc_id AS doc, l[i] AS term, CAST(count(*) AS BIGINT) AS tf
      |       FROM toks CROSS JOIN LATERAL (SELECT unnest(range(1, len(l) + 1)) AS i) t
      |       GROUP BY 1, 2),
      |dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |w AS (SELECT tf.doc, tf.term, tf.tf, dfc.df FROM tf JOIN dfc ON tf.term = dfc.term),
      |wq AS (SELECT term, doc AS qid, tf AS tfq FROM w WHERE doc < 8),
      |dots AS (SELECT wq.qid, w.doc,
      |                CAST(SUM((CAST(wq.tfq AS HUGEINT) * w.tf * 1000000000000) // (w.df * w.df)) AS BIGINT) AS dp
      |         FROM w JOIN wq ON w.term = wq.term AND w.doc <> wq.qid
      |         GROUP BY 1, 2),
      |nrm AS (SELECT doc, CAST(SUM((CAST(tf AS HUGEINT) * tf * 1000000000000) // (df * df)) AS BIGINT) AS nrm
      |        FROM w GROUP BY 1),
      |cosv AS (SELECT dots.qid, dots.doc AS nid,
      |                CAST(dots.dp AS DOUBLE) / sqrt(CAST(nq.nrm AS DOUBLE) * CAST(nd.nrm AS DOUBLE)) AS cosine
      |         FROM dots JOIN nrm nq ON nq.doc = dots.qid JOIN nrm nd ON nd.doc = dots.doc),
      |rk AS (SELECT qid, nid, cosine,
      |              row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rank
      |       FROM cosv)
      |SELECT qid, nid, cosine, CAST(rank AS BIGINT) AS rank
      |FROM rk WHERE rank <= 3""".stripMargin) { (s, d) =>
    Similarity.tfidfTopK(Tables.documents(s, d), "doc_id", "text",
      queryIds = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L), k = 3)
  }

  /** BPE vocabulary induction ([[Bpe.learnMerges]]): four corpus-wide
    * merge rounds over the word vocabulary, each round one pair-count
    * aggregate plus a greedy left-to-right rewrite — the tokenizer-build
    * step, learned distributed instead of on one machine's sample. The
    * oracle unrolls the rounds as CTEs and bit-matches pair and winner.
    */
  private val bpeMerges = Q(
    "text_bpe_merges", {
      def round(i: Int): String =
        s"""p$i AS (SELECT t.l[j] AS a, t.l[j+1] AS b, CAST(SUM(n) AS BIGINT) AS cnt
           |      FROM (SELECT string_split(sp, '  ') AS l, n FROM v${i - 1}) t
           |      CROSS JOIN LATERAL (SELECT unnest(range(1, len(l))) AS j) u GROUP BY 1, 2),
           |m$i AS (SELECT a, b, cnt FROM p$i ORDER BY cnt DESC, a, b LIMIT 1),
           |v$i AS (SELECT trim(replace(' ' || sp || ' ', ' ' || m$i.a || '  ' || m$i.b || ' ',
           |                           ' ' || m$i.a || m$i.b || ' ')) AS sp, n
           |      FROM v${i - 1} CROSS JOIN m$i)""".stripMargin
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         |w AS (SELECT l[i] AS word, CAST(count(*) AS BIGINT) AS n
         |      FROM toks CROSS JOIN LATERAL (SELECT unnest(range(1, len(l) + 1)) AS i) t
         |      GROUP BY 1),
         |v0 AS (SELECT trim(regexp_replace(word, '(.)', '\\1  ', 'g')) AS sp, n FROM w),
         |${(1 to 4).map(round).mkString(",\n")},
         |res AS (SELECT 1 AS r, a, b, cnt FROM m1 UNION ALL SELECT 2, a, b, cnt FROM m2
         |        UNION ALL SELECT 3, a, b, cnt FROM m3 UNION ALL SELECT 4, a, b, cnt FROM m4)
         |SELECT CAST(r AS BIGINT) AS round, a AS left, b AS right,
         |       cnt AS pair_count, a || b AS merged
         |FROM res""".stripMargin
    }) { (s, d) =>
    val words = Tables.documents(s, d)
      .select(explode(graft.functions.TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).cast(LongType).as("n"))
    Bpe.learnMerges(words, "word", "n", rounds = 4)
  }

  /** Leave-one-out target encoding of customer segment against account
    * balance ([[Stats.targetEncodeLoo]]): exact decimal category sums,
    * one pinned double division per row — the leak-free categorical
    * featurizer.
    */
  private val targetEncode = Q(
    "ml_target_encode",
    """WITH g AS (SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n,
      |                 SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS s
      |          FROM customer GROUP BY 1)
      |SELECT c_custkey, g.seg,
      |       CASE WHEN g.n > 1
      |            THEN CAST(g.s - CAST(c_acctbal AS DECIMAL(18,4)) AS DOUBLE)
      |                   / CAST(g.n - 1 AS DOUBLE)
      |            ELSE NULL END AS loo_enc
      |FROM customer JOIN g ON g.seg = c_mktsegment""".stripMargin) { (s, d) =>
    Stats.targetEncodeLoo(
      Tables.customer(s, d), "c_mktsegment", col("c_acctbal"), "loo_enc")
      .select(col("c_custkey"), col("c_mktsegment").as("seg"), col("loo_enc"))
  }

  /** One-way ANOVA of whole-dollar account balance across market
    * segments ([[Stats.anovaF]]): integer-exact sufficient statistics,
    * fixed-point between-group term, pinned-double F — the
    * feature-usefulness screen.
    */
  private val anova = Q(
    "qa_anova",
    """WITH x AS (SELECT c_mktsegment AS seg,
      |                 CAST(round(CAST(c_acctbal AS DECIMAL(18,4)), 0) AS BIGINT) AS v
      |          FROM customer),
      |g AS (SELECT seg, CAST(count(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS s
      |      FROM x GROUP BY 1),
      |gg AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS n_tot,
      |              CAST(SUM(s) AS BIGINT) AS s_tot,
      |              CAST(SUM((s * s) // n) AS BIGINT) AS ssb_part
      |       FROM g),
      |q AS (SELECT CAST(SUM(v * v) AS BIGINT) AS q_tot FROM x)
      |SELECT k, n_tot,
      |  CASE WHEN k > 1 AND CAST(q_tot AS DOUBLE) - CAST(ssb_part AS DOUBLE) > 0 THEN
      |    (CAST(ssb_part AS DOUBLE) - CAST(s_tot AS DOUBLE) * CAST(s_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
      |      / CAST(k - 1 AS DOUBLE)
      |      / ((CAST(q_tot AS DOUBLE) - CAST(ssb_part AS DOUBLE)) / CAST(n_tot - k AS DOUBLE))
      |  ELSE NULL END AS f_stat
      |FROM gg CROSS JOIN q""".stripMargin) { (s, d) =>
    Stats.anovaF(Tables.customer(s, d), "c_mktsegment",
      round(col("c_acctbal").cast("decimal(18,4)"), 0))
  }

  /** Gini concentration of order totals ([[Stats.gini]]): distributed
    * range-shuffle ranks, exact decimal Σ rank·x, one pinned readout —
    * the revenue-inequality profile.
    */
  private val giniQ = Q(
    "qa_gini",
    """WITH r AS (SELECT CAST(o_totalprice AS DECIMAL(18,4)) AS x,
      |                 row_number() OVER (ORDER BY o_totalprice) AS rk
      |          FROM orders)
      |SELECT CAST(count(*) AS BIGINT) AS n,
      |       CAST(SUM(x) AS DOUBLE) AS total,
      |       CAST(2 AS DOUBLE) * CAST(SUM(CAST(rk AS DECIMAL(18,0)) * x) AS DOUBLE)
      |         / (CAST(count(*) AS DOUBLE) * CAST(SUM(x) AS DOUBLE))
      |         - (CAST(count(*) AS DOUBLE) + CAST(1 AS DOUBLE)) / CAST(count(*) AS DOUBLE) AS gini
      |FROM r""".stripMargin) { (s, d) =>
    Stats.gini(Tables.orders(s, d), col("o_totalprice"))
  }

  /** The token vocabulary AFTER the four learned BPE merges
    * ([[Bpe.mergedVocab]]): top-20 tokens by corpus-weighted count —
    * what the trained tokenizer's stream looks like. Deterministic
    * total order (count desc, token asc) makes the cut stable.
    */
  private val bpeVocab = Q(
    "text_bpe_vocab", {
      def round(i: Int): String =
        s"""p$i AS (SELECT t.l[j] AS a, t.l[j+1] AS b, CAST(SUM(n) AS BIGINT) AS cnt
           |      FROM (SELECT string_split(sp, '  ') AS l, n FROM v${i - 1}) t
           |      CROSS JOIN LATERAL (SELECT unnest(range(1, len(l))) AS j) u GROUP BY 1, 2),
           |m$i AS (SELECT a, b FROM p$i ORDER BY cnt DESC, a, b LIMIT 1),
           |v$i AS (SELECT trim(replace(' ' || sp || ' ', ' ' || m$i.a || '  ' || m$i.b || ' ',
           |                           ' ' || m$i.a || m$i.b || ' ')) AS sp, n
           |      FROM v${i - 1} CROSS JOIN m$i)""".stripMargin
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         |w AS (SELECT l[i] AS word, CAST(count(*) AS BIGINT) AS n
         |      FROM toks CROSS JOIN LATERAL (SELECT unnest(range(1, len(l) + 1)) AS i) t
         |      GROUP BY 1),
         |v0 AS (SELECT trim(regexp_replace(word, '(.)', '\\1  ', 'g')) AS sp, n FROM w),
         |${(1 to 4).map(round).mkString(",\n")},
         |tok AS (SELECT unnest(string_split(sp, '  ')) AS token, n FROM v4),
         |agg AS (SELECT token, CAST(SUM(n) AS BIGINT) AS n FROM tok GROUP BY 1)
         |SELECT token, n FROM agg ORDER BY n DESC, token LIMIT 20""".stripMargin
    }) { (s, d) =>
    val words = Tables.documents(s, d)
      .select(explode(graft.functions.TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).cast(LongType).as("n"))
    Bpe.mergedVocab(words, "word", "n", rounds = 4)
      .orderBy(col("n").desc, col("token"))
      .limit(20)
  }

  /** Robust outlier profile of purchase values ([[Stats.madOutliers]]):
    * exact distributed medians, decimal deviations, decimal 3·MAD
    * threshold — the heavy-tail-safe feed screen.
    */
  private val mad = Q(
    "qa_mad",
    """WITH vals AS (SELECT CAST(value AS DECIMAL(18,4)) AS v FROM events),
      |r1 AS (SELECT v, row_number() OVER (ORDER BY v) AS rn, count(*) OVER () AS n FROM vals),
      |med AS (SELECT v AS m FROM r1 WHERE rn = GREATEST(1, CAST(ceil(0.5 * n) AS BIGINT))),
      |d AS (SELECT abs(v - m) AS dev, m FROM vals CROSS JOIN med),
      |r2 AS (SELECT dev, row_number() OVER (ORDER BY dev) AS rn, count(*) OVER () AS n FROM d),
      |madv AS (SELECT dev AS mv FROM r2 WHERE rn = GREATEST(1, CAST(ceil(0.5 * n) AS BIGINT)))
      |SELECT CAST(max(m) AS DOUBLE) AS median,
      |       CAST(max(mv) AS DOUBLE) AS mad,
      |       CAST(SUM(CASE WHEN dev > mv * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM d CROSS JOIN madv""".stripMargin) { (s, d) =>
    Stats.madOutliers(Tables.events(s, d), col("value"))
  }

  /** Chi-square independence of market segment × order priority
    * ([[Stats.chi2Independence]]): is the categorical feature informative
    * about the label? Exact contingency counts, pinned per-cell terms.
    */
  private val chi2Select = Q(
    "ml_chi2_select",
    """WITH j AS (SELECT c_mktsegment AS seg, o_orderpriority AS pri
      |          FROM orders JOIN customer ON o_custkey = c_custkey),
      |c AS (SELECT seg, pri, CAST(count(*) AS BIGINT) AS n FROM j GROUP BY 1, 2),
      |rt AS (SELECT seg, CAST(SUM(n) AS BIGINT) AS n_a FROM c GROUP BY 1),
      |ct AS (SELECT pri, CAST(SUM(n) AS BIGINT) AS n_b FROM c GROUP BY 1),
      |t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_tot FROM c)
      |SELECT c.seg, c.pri, c.n,
      |  (CAST(c.n AS DOUBLE) - CAST(rt.n_a AS DOUBLE) * CAST(ct.n_b AS DOUBLE) / CAST(t.n_tot AS DOUBLE))
      |  * (CAST(c.n AS DOUBLE) - CAST(rt.n_a AS DOUBLE) * CAST(ct.n_b AS DOUBLE) / CAST(t.n_tot AS DOUBLE))
      |  / (CAST(rt.n_a AS DOUBLE) * CAST(ct.n_b AS DOUBLE) / CAST(t.n_tot AS DOUBLE)) AS chi2_term
      |FROM c JOIN rt ON rt.seg = c.seg JOIN ct ON ct.pri = c.pri CROSS JOIN t""".stripMargin) {
    (s, d) =>
      val j = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"))
      Stats.chi2Independence(j, "seg", "pri")
  }

  /** Pairwise Pearson matrix over lineitem measures
    * ([[Stats.pearsonPairs]]): one aggregate pass for all sufficient
    * statistics in exact fixed-point cents, pinned r per pair (rounded
    * to 12 decimals — the >2⁵³ decimal→double convention).
    */
  private val corrMatrix = Q(
    "qa_corr_matrix",
    """WITH x AS (SELECT
      |  CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS qty,
      |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS price,
      |  CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS disc
      |FROM lineitem),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |  SUM(qty) AS s_qty, SUM(qty * qty) AS ss_qty,
      |  SUM(price) AS s_price, SUM(price * price) AS ss_price,
      |  SUM(disc) AS s_disc, SUM(disc * disc) AS ss_disc,
      |  SUM(qty * price) AS sp_qty_price,
      |  SUM(qty * disc) AS sp_qty_disc,
      |  SUM(price * disc) AS sp_price_disc
      |FROM x)
      |SELECT 'qty' AS x_col, 'price' AS y_col, n,
      |  round((CAST(n AS DOUBLE) * CAST(sp_qty_price AS DOUBLE) - CAST(s_qty AS DOUBLE) * CAST(s_price AS DOUBLE))
      |  / (sqrt(CAST(n AS DOUBLE) * CAST(ss_qty AS DOUBLE) - CAST(s_qty AS DOUBLE) * CAST(s_qty AS DOUBLE))
      |     * sqrt(CAST(n AS DOUBLE) * CAST(ss_price AS DOUBLE) - CAST(s_price AS DOUBLE) * CAST(s_price AS DOUBLE))), 12) AS r
      |FROM st
      |UNION ALL
      |SELECT 'qty', 'disc', n,
      |  round((CAST(n AS DOUBLE) * CAST(sp_qty_disc AS DOUBLE) - CAST(s_qty AS DOUBLE) * CAST(s_disc AS DOUBLE))
      |  / (sqrt(CAST(n AS DOUBLE) * CAST(ss_qty AS DOUBLE) - CAST(s_qty AS DOUBLE) * CAST(s_qty AS DOUBLE))
      |     * sqrt(CAST(n AS DOUBLE) * CAST(ss_disc AS DOUBLE) - CAST(s_disc AS DOUBLE) * CAST(s_disc AS DOUBLE))), 12) AS r
      |FROM st
      |UNION ALL
      |SELECT 'price', 'disc', n,
      |  round((CAST(n AS DOUBLE) * CAST(sp_price_disc AS DOUBLE) - CAST(s_price AS DOUBLE) * CAST(s_disc AS DOUBLE))
      |  / (sqrt(CAST(n AS DOUBLE) * CAST(ss_price AS DOUBLE) - CAST(s_price AS DOUBLE) * CAST(s_price AS DOUBLE))
      |     * sqrt(CAST(n AS DOUBLE) * CAST(ss_disc AS DOUBLE) - CAST(s_disc AS DOUBLE) * CAST(s_disc AS DOUBLE))), 12) AS r
      |FROM st""".stripMargin) { (s, d) =>
    def cents(c: String) =
      (col(c).cast("decimal(18,2)") * 100).cast("decimal(18,0)")
    Stats.pearsonPairs(Tables.lineitem(s, d),
      Seq("qty" -> cents("l_quantity"), "price" -> cents("l_extendedprice"),
        "disc" -> cents("l_discount")))
      .select(col("x_col"), col("y_col"), col("n"), round(col("r"), 12).as("r"))
  }

  /** Decile featurization of order totals crossed with the priority
    * label: boundaries are the exact distributed 1/10…9/10 quantiles
    * broadcast back; assignment is map-side (`1 + #boundaries below v`).
    * The discretizer a GBDT/calibration pipeline applies before
    * binned statistics.
    */
  private val quantileBin = Q(
    "ml_quantile_bin",
    s"""WITH r AS (SELECT o_totalprice AS v,
       |                 CAST(row_number() OVER (ORDER BY o_totalprice) AS BIGINT) AS rn,
       |                 CAST(count(*) OVER () AS BIGINT) AS n
       |          FROM orders),
       |q AS (SELECT unnest([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qd),
       |bnds AS (SELECT r.v FROM q JOIN r ON rn = GREATEST(1, CAST(ceil(qd * n) AS BIGINT))),
       |dv AS (SELECT o_totalprice AS v, o_orderpriority AS pri, $C AS c
       |       FROM orders GROUP BY 1, 2),
       |bk AS (SELECT dv.v, dv.pri, dv.c, CAST(1 + count(b.v) AS BIGINT) AS decile
       |       FROM dv LEFT JOIN bnds b ON b.v < dv.v GROUP BY dv.v, dv.pri, dv.c)
       |SELECT decile, pri, CAST(SUM(c) AS BIGINT) AS n, min(v) AS lo, max(v) AS hi
       |FROM bk GROUP BY 1, 2""".stripMargin) { (s, d) =>
    val bnds = Stats.exactQuantiles(
      Tables.orders(s, d).select(col("o_totalprice").as("value")), "value",
      (1 to 9).map(i => BigDecimal(i) / 10))
      .agg(sort_array(collect_list(col("value"))).as("bnds"))
    Tables.orders(s, d)
      .crossJoin(broadcast(bnds))
      .withColumn("decile",
        (size(filter(col("bnds"), b => b < col("o_totalprice"))) + 1)
          .cast(LongType))
      .groupBy(col("decile"), col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).cast(LongType).as("n"),
        min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
  }

  /** Linear-model inference at corpus scale ([[graft.operators
    * .LinearModel.hashedBowScore]]): the fasttext-shaped quality
    * classifier applied to every document — hashed bag-of-words (same
    * md5 family as `ml_feature_hash`), a 256-row integer bucket-weight
    * MODEL broadcast to the scan, one grouped aggregate per doc, one
    * pinned double division. The stand-in "trained" weights derive from
    * the bucket's own md5 byte (a real model is just different rows);
    * the oracle replays tokenization, hashing, weights, and ranking
    * bit-for-bit. Top-10 docs by score, ties broken by id.
    */
  private val linearScore = Q(
    "ml_linear_score",
    s"""WITH toks AS (
       |  SELECT doc_id, lang, t AS token
       |  FROM (SELECT doc_id, lang,
       |               unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
       |        FROM documents)
       |  WHERE t <> ''),
       |f AS (SELECT doc_id, lang,
       |             CAST(('0x' || substr(md5(token), 1, 13)) AS BIGINT) % 256 AS bucket
       |      FROM toks),
       |w AS (SELECT bucket, ${Q.md5Byte("bucket")} - 128 AS w
       |      FROM (SELECT unnest(range(256)) AS bucket)),
       |sc AS (SELECT doc_id, lang, $C AS n_tokens,
       |              CAST(SUM(w.w) AS BIGINT) AS sum_w
       |       FROM f JOIN w USING (bucket) GROUP BY 1, 2)
       |SELECT doc_id, lang, n_tokens,
       |       CAST(sum_w AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS score
       |FROM sc ORDER BY score DESC, doc_id LIMIT 10""".stripMargin) { (s, d) =>
    val weights = s.range(256)
      .select(col("id").as("bucket"),
        (graft.operators.Sampling.md5Byte(col("id")) - 128).as("w"))
    graft.operators.LinearModel.hashedBowScore(
      Tables.documents(s, d), "doc_id", "text", weights, 256,
      carryCols = Seq("lang"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  /** Exact two-sample Kolmogorov–Smirnov drift gate
    * ([[Stats.ksTwoSample]]): do urgent/high-priority orders draw their
    * totals from the same distribution as the rest? Unbinned — the
    * supremum runs over every observed value, not [[Stats.driftChi2]]'s
    * 8 bins — and exact: the statistic is an integer-lattice max
    * (DECIMAL(38,0) cross products of cumulative counts) with one
    * pinned double division, so the oracle's single-window cumulative
    * replay hash-matches the engine's two-pass distributed prefix sum
    * bit for bit, certifying the sweep machinery itself.
    */
  private val ksTest = Q(
    "qa_ks_test",
    """WITH v AS (SELECT CAST(o_totalprice AS DECIMAL(18,4)) AS x,
      |                  (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS a
      |           FROM orders
      |           WHERE o_totalprice IS NOT NULL
      |             AND o_orderpriority IS NOT NULL),
      |per AS (SELECT x,
      |               CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |               CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cb
      |        FROM v GROUP BY 1),
      |cum AS (SELECT x, SUM(ca) OVER (ORDER BY x) AS cuma,
      |               SUM(cb) OVER (ORDER BY x) AS cumb
      |        FROM per),
      |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
      |               CAST(SUM(cb) AS BIGINT) AS n_b
      |        FROM per)
      |SELECT n_a, n_b,
      |       CASE WHEN n_a > 0 AND n_b > 0
      |            THEN CAST((d_scaled * 1000000000000)
      |                      // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
      |       END AS d_e12,
      |       CASE WHEN n_a > 0 AND n_b > 0
      |            THEN round(CAST(d_scaled AS DOUBLE)
      |                       / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 12)
      |       END AS d
      |FROM (SELECT n_a, n_b,
      |             CAST(max(abs(CAST(cuma AS HUGEINT) * n_b
      |                          - CAST(cumb AS HUGEINT) * n_a))
      |                  AS HUGEINT) AS d_scaled
      |      FROM cum CROSS JOIN tot GROUP BY 1, 2)""".stripMargin) { (s, d) =>
    Stats.ksTwoSample(Tables.orders(s, d), col("o_totalprice"),
      col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
  }

  /** Cramér's V between order priority and order status
    * ([[Stats.cramersV]]): the categorical-association audit. The χ²
    * lattice (exact integer per-cell terms, order-independent sum) and
    * the two pinned edge ops make the whole statistic hash-certifiable;
    * the oracle replays the contingency table, margins, HUGEINT lattice
    * and the same sqrt bit for bit.
    */
  private val cramers = Q(
    "qa_cramers_v",
    """WITH cells AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
      |                      CAST(count(*) AS BIGINT) AS n
      |               FROM orders
      |               WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
      |               GROUP BY 1, 2),
      |r AS (SELECT a, CAST(SUM(n) AS BIGINT) AS ra FROM cells GROUP BY 1),
      |c AS (SELECT b, CAST(SUM(n) AS BIGINT) AS cb FROM cells GROUP BY 1),
      |t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
      |             CAST(count(DISTINCT a) AS BIGINT) AS nr,
      |             CAST(count(DISTINCT b) AS BIGINT) AS nc
      |      FROM cells),
      |s AS (SELECT CAST(SUM((CAST(cells.n AS HUGEINT) * nn - CAST(ra AS HUGEINT) * cb)
      |                      * (CAST(cells.n AS HUGEINT) * nn - CAST(ra AS HUGEINT) * cb)
      |                      * 1000000000
      |                      // (CAST(nn AS HUGEINT) * ra * cb)) AS DECIMAL(38,0)) AS obs,
      |             CAST(SUM(CAST(ra AS HUGEINT) * cb) AS DECIMAL(38,0)) AS src,
      |             max(nn) AS n, max(least(nr, nc) - 1) AS df_min
      |      FROM cells
      |      JOIN r ON r.a = cells.a
      |      JOIN c ON c.b = cells.b
      |      CROSS JOIN t),
      |s2 AS (SELECT n, df_min,
      |              obs + (CAST((CAST(n AS HUGEINT) * n - CAST(src AS HUGEINT)) AS HUGEINT)
      |                     * 1000000000) // CAST(n AS HUGEINT) AS chi2s
      |       FROM s)
      |SELECT n, df_min,
      |       CAST(chi2s AS DOUBLE) / 1000000000.0 AS chi2,
      |       CASE WHEN df_min > 0
      |            THEN sqrt((CAST(chi2s AS DOUBLE) / 1000000000.0)
      |                      / (CAST(n AS DOUBLE) * CAST(df_min AS DOUBLE))) END AS v
      |FROM s2""".stripMargin) { (s, d) =>
    Stats.cramersV(Tables.orders(s, d),
      col("o_orderpriority"), col("o_orderstatus"))
  }

  /** Exact ranking AUC ([[Stats.aucExact]]): does document length
    * predict English? — the classifier-quality gate as a Mann–Whitney
    * integer lattice with tie midranks, so the 0.5 = random and
    * 1.0 = perfect boundaries are certifiable, not float-adjacent. The
    * oracle replays per-score counts, the cumulative sweep, the HUGEINT
    * lattice and the single pinned division.
    */
  /** Shared with `c29_stream_auc`: the maintained score-count store's
    * AUC readout must hash-match this same one-shot lattice — one
    * oracle string certifying both faces (the bm25OracleSql pattern).
    */
  private[queries] val aucOracleSql: String =
    """WITH v AS (SELECT CAST(n_chars AS DECIMAL(18,4)) AS x,
      |                  (lang = 'en') AS a
      |           FROM documents
      |           WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
      |per AS (SELECT x,
      |               CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |               CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cb
      |        FROM v GROUP BY 1),
      |cum AS (SELECT x, ca, cb,
      |               SUM(cb) OVER (ORDER BY x) AS cumb
      |        FROM per),
      |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_pos,
      |               CAST(SUM(cb) AS BIGINT) AS n_neg
      |        FROM per),
      |s AS (SELECT CAST(SUM(CAST(ca AS HUGEINT)
      |                       * (2 * (cumb - cb) + cb)) AS HUGEINT) AS auc2pn
      |      FROM cum)
      |SELECT n_pos, n_neg,
      |       CASE WHEN n_pos > 0 AND n_neg > 0
      |            THEN CAST((auc2pn * 1000000000000)
      |                      // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT)
      |       END AS auc_e12,
      |       CASE WHEN n_pos > 0 AND n_neg > 0
      |            THEN round(CAST(auc2pn AS DOUBLE)
      |                       / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 12)
      |       END AS auc
      |FROM s CROSS JOIN tot""".stripMargin

  private val auc = Q("ml_auc", aucOracleSql) { (s, d) =>
    Stats.aucExact(Tables.documents(s, d), col("n_chars"), col("lang") === "en")
  }

  /** Exact Spearman rank correlation of quantity vs line price
    * ([[Stats.spearman]]): the monotone-association screen —
    * `qa_corr_matrix`'s Pearson sees only linear relations; a curved
    * but ordered dependence scores here. Doubled tie midranks from two
    * distributed range sweeps (integral under ties), DECIMAL(38,0)
    * sufficient statistics, one pinned ρ rounded to 12 — the oracle
    * replays both rank sweeps as single-window cumulative sums and the
    * identical double sequence, certifying the distributed prefix
    * machinery against the textbook formulation.
    */
  private val spearman = Q(
    "qa_spearman",
    """WITH v AS (SELECT CAST(l_quantity AS DECIMAL(18,4)) AS vx,
      |                  CAST(l_extendedprice AS DECIMAL(18,4)) AS vy
      |           FROM lineitem
      |           WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      |px AS (SELECT vx, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1),
      |cx AS (SELECT vx, 2 * SUM(c) OVER (ORDER BY vx) - c + 1 AS rx FROM px),
      |py AS (SELECT vy, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1),
      |cy AS (SELECT vy, 2 * SUM(c) OVER (ORDER BY vy) - c + 1 AS ry FROM py),
      |rr AS (SELECT cx.rx AS rx, cy.ry AS ry
      |       FROM v JOIN cx ON v.vx = cx.vx JOIN cy ON v.vy = cy.vy),
      |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |              CAST(SUM(CAST(rx AS HUGEINT)) AS DECIMAL(38,0)) AS sx,
      |              CAST(SUM(CAST(ry AS HUGEINT)) AS DECIMAL(38,0)) AS sy,
      |              CAST(SUM(CAST(rx AS HUGEINT) * ry) AS DECIMAL(38,0)) AS sxy,
      |              CAST(SUM(CAST(rx AS HUGEINT) * rx) AS DECIMAL(38,0)) AS sxx,
      |              CAST(SUM(CAST(ry AS HUGEINT) * ry) AS DECIMAL(38,0)) AS syy
      |       FROM rr)
      |SELECT n,
      |       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      |             AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
      |            THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |                 / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 12)
      |       END AS rho
      |FROM st""".stripMargin) { (s, d) =>
    Stats.spearman(Tables.lineitem(s, d),
      col("l_quantity"), col("l_extendedprice"))
  }

  /** Exact precision/recall curve of the length→English classifier
    * ([[Stats.prCurvePoints]] over the same score-count statistic as
    * `ml_auc`): one row per distinct threshold with exact confusion
    * integers and pinned precision/recall/F1 — the operating-point
    * picker. Output cardinality is the score domain (length values),
    * scale-independent.
    */
  private val prPoints = Q(
    "ml_pr_points",
    """WITH v AS (SELECT CAST(n_chars AS DECIMAL(18,4)) AS x,
      |                  (lang = 'en') AS a
      |           FROM documents
      |           WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
      |per AS (SELECT x,
      |               CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |               CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cb
      |        FROM v GROUP BY 1),
      |cum AS (SELECT x, ca, cb,
      |               SUM(ca) OVER (ORDER BY x) AS cuma,
      |               SUM(cb) OVER (ORDER BY x) AS cumb
      |        FROM per),
      |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_pos,
      |               CAST(SUM(cb) AS BIGINT) AS n_neg
      |        FROM per),
      |k AS (SELECT CAST(x AS DOUBLE) AS thr,
      |             CAST(n_pos - cuma + ca AS BIGINT) AS tp,
      |             CAST(n_neg - cumb + cb AS BIGINT) AS fp,
      |             n_pos
      |      FROM cum CROSS JOIN tot)
      |SELECT thr, tp, fp,
      |       CASE WHEN tp + fp > 0
      |            THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
      |       CASE WHEN n_pos > 0
      |            THEN CAST(tp AS DOUBLE) / CAST(n_pos AS DOUBLE) END AS recall,
      |       CASE WHEN tp + fp + n_pos > 0
      |            THEN 2.0 * CAST(tp AS DOUBLE) / CAST(tp + fp + n_pos AS DOUBLE) END AS f1
      |FROM k""".stripMargin) { (s, d) =>
    Stats.prCurvePoints(Stats.scoreClassCounts(
      Tables.documents(s, d), col("n_chars"), col("lang") === "en"))
  }

  /** Reliability (calibration) bins of a length-based classifier
    * probability p = n/(n+500) against the English label: per decile
    * bucket, exact counts, the mean predicted probability from an
    * integer-scaled truncating lattice (10¹²·n div (n+500) — no
    * per-row float accumulates), and the observed positive rate — the
    * is-the-model-honest diagnostic next to `ml_auc`'s
    * is-it-discriminative. Bucket = (10n) div (n+500), integer
    * division, reproducible everywhere; ≤ 10 output rows at any scale
    * ([[Stats.calibrationBins]] + [[Stats.calibrationReadout]]).
    *
    * Shared with `c32_stream_calibration`: the maintained bin store's
    * readout must hash-match this same one-shot lattice — one oracle
    * string certifying both faces (the aucOracleSql pattern).
    */
  private[queries] val calibOracleSql: String =
    """WITH v AS (SELECT n_chars AS n, (lang = 'en') AS pos
      |           FROM documents
      |           WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
      |b AS (SELECT CAST((10 * n) // (n + 500) AS BIGINT) AS bucket,
      |             (1000000000000 * CAST(n AS HUGEINT)) // (n + 500) AS s12,
      |             CASE WHEN pos THEN 1 ELSE 0 END AS p
      |      FROM v),
      |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
      |             CAST(SUM(p) AS BIGINT) AS n_pos,
      |             CAST(SUM(CAST(s12 AS HUGEINT)) AS DECIMAL(38,0)) AS ssum
      |      FROM b GROUP BY 1)
      |SELECT bucket, n, n_pos,
      |       CAST(ssum AS DOUBLE) / CAST(n AS DOUBLE) / 1000000000000.0 AS mean_score,
      |       CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS frac_pos
      |FROM g""".stripMargin

  private val calibration = Q("ml_calibration", calibOracleSql) { (s, d) =>
    Stats.calibrationReadout(Stats.calibrationBins(
      Tables.documents(s, d), col("n_chars"), col("lang") === "en"))
  }

  /** Isotonic (PAV) calibration of the length→English classifier
    * ([[Stats.isotonicCalibration]] over the same bins as
    * `ml_calibration`): the monotone-nondecreasing fit of the per-decile
    * positive rate — what a serving pipeline applies when the raw
    * reliability diagram wiggles — via the closed minimax form on the
    * 10¹² lattice, so the fitted curve is reproducible bit for bit. All
    * pooling enumeration is bucket-domain work (≤ 11 rows), constant at
    * any corpus size.
    */
  private val isotonic = Q(
    "ml_isotonic",
    """WITH v AS (SELECT n_chars AS nc, (lang = 'en') AS pos
      |           FROM documents
      |           WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
      |b AS (SELECT CAST((10 * nc) // (nc + 500) AS BIGINT) AS bucket,
      |             CASE WHEN pos THEN 1 ELSE 0 END AS p
      |      FROM v),
      |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
      |             CAST(SUM(p) AS BIGINT) AS n_pos
      |      FROM b GROUP BY 1),
      |seg AS (SELECT i.bucket AS bi, j.bucket AS bj,
      |               CAST(SUM(k.n) AS BIGINT) AS sn,
      |               CAST(SUM(k.n_pos) AS BIGINT) AS sp
      |        FROM g i JOIN g j ON i.bucket <= j.bucket
      |               JOIN g k ON k.bucket >= i.bucket AND k.bucket <= j.bucket
      |        GROUP BY 1, 2),
      |fl AS (SELECT bi, bj,
      |              (CAST(sp AS HUGEINT) * 1000000000000) // sn AS fl
      |       FROM seg),
      |im AS (SELECT t.bucket AS bt, f.bi, MIN(f.fl) AS mn
      |       FROM g t JOIN fl f ON f.bi <= t.bucket AND f.bj >= t.bucket
      |       GROUP BY 1, 2),
      |iso AS (SELECT bt, CAST(MAX(mn) AS BIGINT) AS iso_e12
      |        FROM im GROUP BY 1)
      |SELECT g.bucket, g.n, g.n_pos,
      |       round(CAST(g.n_pos AS DOUBLE) / CAST(g.n AS DOUBLE), 12) AS frac_pos,
      |       iso_e12,
      |       round(CAST(iso_e12 AS DOUBLE) / 1000000000000.0, 12) AS iso_prob
      |FROM g JOIN iso ON iso.bt = g.bucket""".stripMargin) { (s, d) =>
    Stats.isotonicCalibration(Stats.calibrationBins(
      Tables.documents(s, d), col("n_chars"), col("lang") === "en"))
  }

  /** Shared with `c31_stream_stump`: the maintained score-count store's
    * stump readout must hash-match this same one-shot lattice — one
    * oracle string certifying both faces (the aucOracleSql pattern).
    */
  private[queries] val stumpOracleSql: String =
    """WITH v AS (SELECT CAST(n_chars AS DECIMAL(18,4)) AS x,
      |                  (lang = 'en') AS a
      |           FROM documents
      |           WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
      |per AS (SELECT x,
      |               CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |               CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cb
      |        FROM v GROUP BY 1),
      |cum AS (SELECT x, ca, cb,
      |               SUM(ca) OVER (ORDER BY x) AS cuma,
      |               SUM(cb) OVER (ORDER BY x) AS cumb
      |        FROM per),
      |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_pos,
      |               CAST(SUM(cb) AS BIGINT) AS n_neg
      |        FROM per),
      |cand AS (SELECT x,
      |                CAST(cuma + cumb AS BIGINT) AS nl,
      |                CAST(cuma AS BIGINT) AS pl,
      |                CAST(cumb AS BIGINT) AS ql,
      |                CAST(n_pos + n_neg - cuma - cumb AS BIGINT) AS nr,
      |                CAST(n_pos - cuma AS BIGINT) AS pr,
      |                CAST(n_neg - cumb AS BIGINT) AS qr,
      |                CAST(n_pos + n_neg AS BIGINT) AS n
      |         FROM cum CROSS JOIN tot
      |         WHERE cuma + cumb < n_pos + n_neg),
      |g AS (SELECT x, nl, pl, nr, pr, n,
      |             CAST(((CAST(nl AS HUGEINT) * nl - CAST(pl AS HUGEINT) * pl
      |                    - CAST(ql AS HUGEINT) * ql) * 1000000000000)
      |                    // CAST(nl AS HUGEINT)
      |                  + ((CAST(nr AS HUGEINT) * nr - CAST(pr AS HUGEINT) * pr
      |                      - CAST(qr AS HUGEINT) * qr) * 1000000000000)
      |                    // CAST(nr AS HUGEINT)
      |                  AS HUGEINT) AS gini_scaled
      |      FROM cand)
      |SELECT CAST(x AS DOUBLE) AS thr, nl AS n_left, pl AS pos_left,
      |       nr AS n_right, pr AS pos_right,
      |       CAST(gini_scaled // CAST(n AS HUGEINT) AS BIGINT) AS gini_e12,
      |       round(CAST(gini_scaled AS DOUBLE) / 1000000000000.0
      |             / CAST(n AS DOUBLE), 12) AS gini
      |FROM g ORDER BY gini_scaled, x LIMIT 1""".stripMargin

  /** Pettitt rank changepoint of hourly purchase values
    * ([[Stats.pettittChangepoint]]): WHEN did the purchase-value
    * DISTRIBUTION shift — the nonparametric twin of
    * `events_changepoint`'s volume CUSUM (ranks shrug off the fat tail
    * that drags a mean statistic). Doubled tie midranks from the
    * Spearman sweep, the exact U_t = Σr2 − t(n+1) lattice over a second
    * time sweep, argmax ties to the earliest hour; the oracle replays
    * both sweeps as cumulative windows.
    */
  private val pettitt = Q(
    "qa_pettitt",
    """WITH p AS (SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS h,
      |                  CAST(value AS DECIMAL(18,4)) AS v
      |           FROM events
      |           WHERE event_type = 'purchase' AND value IS NOT NULL
      |             AND ts IS NOT NULL),
      |pv AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM p GROUP BY 1),
      |mr AS (SELECT v, 2 * SUM(c) OVER (ORDER BY v) - c + 1 AS r2 FROM pv),
      |pt AS (SELECT p.h, mr.r2 FROM p JOIN mr ON p.v = mr.v),
      |per AS (SELECT h, CAST(SUM(r2) AS BIGINT) AS sr,
      |               CAST(count(*) AS BIGINT) AS c
      |        FROM pt GROUP BY 1),
      |cum AS (SELECT h, SUM(sr) OVER (ORDER BY h) AS cuma,
      |               SUM(c) OVER (ORDER BY h) AS cumb
      |        FROM per),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM per),
      |u AS (SELECT h, CAST(cumb AS BIGINT) AS t_rows, n,
      |             CAST(abs(CAST(cuma AS HUGEINT)
      |                      - CAST(cumb AS HUGEINT) * (n + 1)) AS BIGINT) AS u_abs
      |      FROM cum CROSS JOIN tot WHERE cumb < n)
      |SELECT h AS cp_time, t_rows, n, u_abs,
      |       round(CAST(u_abs AS DOUBLE) * 4.0
      |             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 12) AS u_norm
      |FROM u ORDER BY u_abs DESC, h LIMIT 1""".stripMargin) { (s, d) =>
    Stats.pettittChangepoint(
      Tables.events(s, d).filter(col("event_type") === "purchase"),
      date_trunc("hour", col("ts")).cast("timestamp_ntz"), col("value"))
  }

  /** Best Gini-impurity decision stump of the length→English classifier
    * ([[Stats.giniStump]] over the same mergeable score-count statistic
    * as `ml_auc` / `ml_pr_points`): the tree-root split picker — one
    * exact-lattice argmin row (threshold, split confusion counts, pinned
    * impurity). The oracle replays the cumulative sweep and the
    * decomposed truncating divisions bit for bit.
    */
  private val stump = Q("ml_stump_gini", stumpOracleSql) { (s, d) =>
    Stats.giniStump(Stats.scoreClassCounts(
      Tables.documents(s, d), col("n_chars"), col("lang") === "en"))
  }

  /** Functional-dependency audit over the order feed
    * ([[graft.operators.QualityChecks.fdAudit]]): does customer
    * determine priority (no — violations counted), does date determine
    * status (no), does the key determine status (trivially yes — the
    * unique-determinant pole), does the date determine its own year
    * (yes — the derived-column pole, a held FD with a NON-unique
    * determinant)? One grouped count + one 1-row rollup per candidate,
    * exact integers — the schema-constraint discovery sweep.
    */
  private val fdAudit = {
    def cand(name: String, det: String, dep: String) =
      s"""(SELECT '$name' AS fd,
         |        CAST(count(*) AS BIGINT) AS n_groups,
         |        CAST(COALESCE(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_viol_groups,
         |        CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_rows,
         |        CAST(COALESCE(SUM(CASE WHEN nd > 1 THEN n ELSE 0 END), 0) AS BIGINT) AS n_viol_rows
         | FROM (SELECT $det AS det, CAST(count(*) AS BIGINT) AS n,
         |              CAST(count(DISTINCT $dep) AS BIGINT) AS nd
         |       FROM orders WHERE $det IS NOT NULL GROUP BY 1))""".stripMargin
    Q(
      "qa_fd_audit",
      s"""SELECT fd, n_groups, n_viol_groups, n_rows, n_viol_rows,
         |       (n_viol_groups = 0) AS holds
         |FROM (${cand("o_custkey->o_orderpriority", "o_custkey", "o_orderpriority")}
         |      UNION ALL ${cand("o_orderdate->o_orderstatus", "o_orderdate", "o_orderstatus")}
         |      UNION ALL ${cand("o_orderkey->o_orderstatus", "o_orderkey", "o_orderstatus")}
         |      UNION ALL ${cand("o_orderdate->year", "o_orderdate", "year(o_orderdate)")})""".stripMargin) {
      (s, d) =>
        graft.operators.QualityChecks.fdAudit(Tables.orders(s, d), Seq(
          ("o_custkey->o_orderpriority", col("o_custkey"), col("o_orderpriority")),
          ("o_orderdate->o_orderstatus", col("o_orderdate"), col("o_orderstatus")),
          ("o_orderkey->o_orderstatus", col("o_orderkey"), col("o_orderstatus")),
          ("o_orderdate->year", col("o_orderdate"), year(col("o_orderdate")))))
    }
  }

  val queries: Seq[Q] = Seq(
    benford, drift, featureHash, bigramLm, tfidfKnn, bpeMerges,
    targetEncode, anova, giniQ, bpeVocab,
    mad, chi2Select, corrMatrix, quantileBin, linearScore, ksTest, cramers,
    auc, spearman, prPoints, calibration, isotonic, fdAudit, stump, lmHeldout,
    pettitt)
}
