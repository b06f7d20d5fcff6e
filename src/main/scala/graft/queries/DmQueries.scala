package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Cleaning.lcount
import graft.operators.{Scd1, Surrogates}
import graft.sources.Tables
import graft.streaming.StreamItemCf
import graft.queries.Q.C

/** Data-mart propagation queries (reference M9–M13, bl_cl.sql:1410-2148):
  * re-key upstream dimension rows to mart surrogates via snowflake-
  * traversal joins, insert-if-absent against the already-loaded mart, and
  * re-key the fact to the mart's surrogate space including the date-dim
  * surrogate. Mart dims are broadcast; only the insert-detection anti-join
  * shuffles, and only on the incoming (small) side.
  */
object DmQueries {

  /** M9/J8 — dm dimension insert-if-absent with FK re-key: nations with
    * key < 12 are pre-loaded in the mart; the remainder arrive and get
    * surrogates continuing after the existing max, with the region FK
    * re-keyed to the mart's own region surrogates.
    */
  private val m9 = Q(
    "m9_dm_rekey_insert",
    """WITH dmr AS (SELECT r_regionkey,
      |                    CAST(row_number() OVER (ORDER BY r_name) AS BIGINT) AS region_sk
      |             FROM region),
      |pre AS (SELECT n_nationkey, n_name, n_regionkey,
      |               CAST(row_number() OVER (ORDER BY n_name) AS BIGINT) AS dm_sk
      |        FROM nation WHERE n_nationkey < 12),
      |ins AS (SELECT n_nationkey, n_name, n_regionkey,
      |               (SELECT max(dm_sk) FROM pre)
      |                 + CAST(row_number() OVER (ORDER BY n_name) AS BIGINT) AS dm_sk
      |        FROM nation WHERE n_nationkey >= 12)
      |SELECT p.dm_sk, CAST(p.n_nationkey AS BIGINT) AS nation_nk,
      |       p.n_name AS name, dmr.region_sk
      |FROM (SELECT * FROM pre UNION ALL SELECT * FROM ins) p
      |JOIN dmr ON p.n_regionkey = dmr.r_regionkey""".stripMargin) { (s, d) =>
    val dmRegion = Surrogates.assign(
      Tables.region(s, d), "region_sk", Seq(col("r_name")))
    val nations = Tables.nation(s, d).select(
      col("n_nationkey").cast(LongType).as("nation_nk"),
      col("n_name").as("name"), col("n_regionkey"))
    val pre = Surrogates.assign(
      nations.filter(col("nation_nk") < 12), "dm_sk", Seq(col("name")))
    val arrivals = nations.filter(col("nation_nk") >= 12)
    val inserts = Surrogates.assignAfter(pre,
      Scd1.newRows(pre, arrivals, Seq("nation_nk")), "dm_sk", Seq(col("name")))
    pre.unionByName(inserts)
      .join(broadcast(dmRegion.select(col("r_regionkey"), col("region_sk"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("dm_sk"), col("nation_nk"), col("name"), col("region_sk"))
  }

  /** M13/G2 — dm-fact insert-if-absent with full surrogate re-key: orders
    * before 1995 are already in the mart fact; the rest insert, every row
    * re-keyed to the mart customer surrogate and the date-dim day ordinal.
    */
  private val m13 = Q(
    "m13_dm_fact_rekey",
    """WITH dmc AS (SELECT c_custkey,
      |                    CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT) AS cust_sk
      |             FROM customer),
      |f AS (SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od, o_totalprice
      |      FROM orders)
      |SELECT f.o_orderkey AS orderkey, dmc.cust_sk,
      |       CAST(datediff('day', DATE '1992-01-01', f.od) + 1 AS BIGINT) AS date_sk,
      |       f.o_totalprice AS totalprice,
      |       CASE WHEN f.od < DATE '1995-01-01' THEN 'existing' ELSE 'inserted' END AS src
      |FROM f JOIN dmc ON f.o_custkey = dmc.c_custkey""".stripMargin) { (s, d) =>
    // customer scales with the fact side -> distributed rank, no one-task window
    val dmCustomer = Surrogates.assignScalable(
      Tables.customer(s, d).select(col("c_custkey")), "cust_sk", Seq(col("c_custkey")))
    val rekeyed = Tables.orders(s, d)
      .select(
        col("o_orderkey").as("orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").as("od"),
        col("o_totalprice").as("totalprice"))
      .join(broadcast(dmCustomer), col("o_custkey") === col("c_custkey"))
      .withColumn("date_sk",
        (datediff(col("od"), lit("1992-01-01").cast("date")) + 1).cast(LongType))
    val existing = rekeyed
      .filter(col("od") < lit("1995-01-01").cast("date"))
      .withColumn("src", lit("existing"))
    val inserts = Scd1
      .newRows(existing,
        rekeyed.withColumn("src", lit("inserted")),
        Seq("orderkey", "cust_sk", "date_sk"))
    existing.unionByName(inserts)
      .select(col("orderkey"), col("cust_sk"), col("date_sk"),
        col("totalprice"), col("src"))
  }

  /** M10–M12 — SCD2 propagation from an upstream layer to the mart:
    * upstream versions closed in 3NF close the matching mart rows; active
    * upstream versions insert if their (key, start) version is absent.
    * Simulated deterministically: custkey % 3 == 0 customers carry a
    * closed old version plus an active successor.
    */
  private val m10 = Q(
    "m10_dm_scd2_propagate",
    """WITH v AS (
      |  SELECT c_custkey AS k, c_mktsegment AS attr,
      |         DATE '1900-01-01' AS start_dt,
      |         CASE WHEN c_custkey % 3 = 0 THEN DATE '2024-01-01'
      |              ELSE DATE '9999-12-31' END AS end_dt,
      |         c_custkey % 3 <> 0 AS is_active
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey, lower(c_mktsegment), DATE '2024-01-01',
      |         DATE '9999-12-31', true
      |  FROM customer WHERE c_custkey % 3 = 0)
      |SELECT k, attr, start_dt, end_dt, is_active FROM v""".stripMargin) { (s, d) =>
    val base = Tables.customer(s, d).select(
      col("c_custkey").as("k"), col("c_mktsegment").as("attr"))
    // upstream (3NF) state after its own SCD2 run:
    val upstream = base
      .withColumn("start_dt", lit(java.sql.Date.valueOf("1900-01-01")))
      .withColumn("end_dt",
        when(col("k") % 3 === 0, lit(java.sql.Date.valueOf("2024-01-01")))
          .otherwise(lit(java.sql.Date.valueOf("9999-12-31"))))
      .withColumn("is_active", col("k") % 3 =!= 0)
      .unionByName(
        base.filter(col("k") % 3 === 0)
          .withColumn("attr", lower(col("attr")))
          .withColumn("start_dt", lit(java.sql.Date.valueOf("2024-01-01")))
          .withColumn("end_dt", lit(java.sql.Date.valueOf("9999-12-31")))
          .withColumn("is_active", lit(true)))
    // mart before propagation: only the original versions, all open
    val mart = base
      .withColumn("start_dt", lit(java.sql.Date.valueOf("1900-01-01")))
      .withColumn("end_dt", lit(java.sql.Date.valueOf("9999-12-31")))
      .withColumn("is_active", lit(true))
    // close mart rows whose (k, start_dt) version is closed upstream
    val closedUpstream = upstream.filter(!col("is_active"))
      .select(col("k").as("ck"), col("start_dt").as("cstart"),
        col("end_dt").as("cend"))
    val closed = mart
      .join(broadcast(closedUpstream),
        col("k") === col("ck") && col("start_dt") === col("cstart"))
      .select(col("k"), col("attr"), col("start_dt"),
        col("cend").as("end_dt"), lit(false).as("is_active"))
    val untouched = mart.join(broadcast(closedUpstream),
      col("k") === col("ck") && col("start_dt") === col("cstart"), "left_anti")
    // insert active upstream versions absent from the mart (by k, start)
    val inserts = Scd1.newRows(
      mart.select(col("k"), col("start_dt")),
      upstream.filter(col("is_active")), Seq("k", "start_dt"))
    untouched.unionByName(closed).unionByName(inserts)
  }

  /** Part-affinity (market-basket) pairs: the top co-ordered part pairs
    * across all orders. Plan shape is the generic co-occurrence miner —
    * ONE shuffle on the basket key, then every basket emits its unordered
    * member pairs map-side from the sorted member list
    * ([[graft.operators.Dedup.pairsFromSortedArray]]), then a hash
    * aggregate on the pair. A self-join formulation would scan and
    * shuffle the fact twice; this touches it once. Per-basket work is
    * C(n,2) in the basket size — bounded by order width, not corpus
    * size (a pathological mega-basket is a data bug, same contract as
    * the LSH buckets). Top-20 is a TakeOrdered with a total tie-break,
    * so the selected set is deterministic.
    */
  private val affinity = Q(
    "dm_part_affinity",
    """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |p AS (SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
      |             CAST(count(*) AS BIGINT) AS support
      |      FROM b x JOIN b y
      |        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      |      GROUP BY 1, 2)
      |SELECT part_a, part_b, support
      |FROM p ORDER BY support DESC, part_a, part_b LIMIT 20""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      .filter(size(col("parts")) > 1)
      .select(explode(graft.operators.Dedup.pairsFromSortedArray(col("parts"))).as("p"))
      .groupBy(col("p.doc_a").as("part_a"), col("p.doc_b").as("part_b"))
      .agg(lcount().as("support"))
      .orderBy(col("support").desc, col("part_a"), col("part_b"))
      .limit(20)
  }

  /** Association rules off the basket pair counts — `dm_part_affinity`
    * upgraded from co-occurrence to DIRECTED rules with the three
    * classic measures: support n_ab/N, confidence n_ab/n_ante, lift
    * n_ab·N/(n_ante·n_cons) (> 1 = genuinely associated, not just both
    * popular — the measure a recommender thresholds on). Each unordered
    * pair emits both directions (confidence is asymmetric); all
    * measures are pinned double divisions from exact basket integers,
    * so the top-20-by-lift cut (ties to the lexicographic pair) is
    * engine-reproducible. Min support n_ab ≥ 2 drops singleton noise.
    *
    * Scale shape: the affinity query's one-shuffle map-side pair
    * generation, a vocabulary-sized item-count join per side, a 1-row
    * broadcast basket total, TakeOrderedAndProject.
    */
  private val assocRules = Q(
    "dm_assoc_rules",
    """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |t AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS nb FROM b),
      |ic AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item FROM b GROUP BY 1),
      |p AS (SELECT x.l_partkey AS pa, y.l_partkey AS pb,
      |             CAST(count(*) AS BIGINT) AS n_ab
      |      FROM b x JOIN b y
      |        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      |      GROUP BY 1, 2),
      |r AS (SELECT pa AS ante, pb AS cons, n_ab FROM p
      |      UNION ALL SELECT pb, pa, n_ab FROM p),
      |j AS (SELECT r.ante, r.cons, r.n_ab,
      |             ia.n_item AS n_ante, ib.n_item AS n_cons, t.nb
      |      FROM r JOIN ic ia ON ia.l_partkey = r.ante
      |             JOIN ic ib ON ib.l_partkey = r.cons
      |             CROSS JOIN t
      |      WHERE r.n_ab >= 2)
      |SELECT ante, cons, n_ab, n_ante, n_cons,
      |       CAST(n_ab AS DOUBLE) / CAST(nb AS DOUBLE) AS support,
      |       CAST(n_ab AS DOUBLE) / CAST(n_ante AS DOUBLE) AS confidence,
      |       CAST(n_ab AS DOUBLE) * CAST(nb AS DOUBLE)
      |         / (CAST(n_ante AS DOUBLE) * CAST(n_cons AS DOUBLE)) AS lift
      |FROM j
      |ORDER BY lift DESC, ante, cons LIMIT 20""".stripMargin) { (s, d) =>
    val b = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val t = b.agg(countDistinct(col("l_orderkey")).cast(LongType).as("nb"))
    val ic = b.groupBy(col("l_partkey")).agg(lcount().as("n_item"))
    val p = b.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      .filter(size(col("parts")) > 1)
      .select(explode(graft.operators.Dedup.pairsFromSortedArray(col("parts"))).as("pp"))
      .groupBy(col("pp.doc_a").as("pa"), col("pp.doc_b").as("pb"))
      .agg(lcount().as("n_ab"))
    val r = p.select(col("pa").as("ante"), col("pb").as("cons"), col("n_ab"))
      .unionAll(p.select(col("pb").as("ante"), col("pa").as("cons"), col("n_ab")))
      .filter(col("n_ab") >= 2)
    r.join(ic.select(col("l_partkey").as("ante"), col("n_item").as("n_ante")),
        Seq("ante"))
      .join(ic.select(col("l_partkey").as("cons"), col("n_item").as("n_cons")),
        Seq("cons"))
      .crossJoin(broadcast(t))
      .select(col("ante"), col("cons"), col("n_ab"), col("n_ante"), col("n_cons"),
        (col("n_ab").cast("double") / col("nb").cast("double")).as("support"),
        (col("n_ab").cast("double") / col("n_ante").cast("double")).as("confidence"),
        (col("n_ab").cast("double") * col("nb").cast("double") /
          (col("n_ante").cast("double") * col("n_cons").cast("double"))).as("lift"))
      .orderBy(col("lift").desc, col("ante").asc, col("cons").asc)
      .limit(20)
  }

  /** Phonetic blocking audit over the part-name vocabulary
    * ([[graft.functions.TextAnalysis.phoneticKey]] — Soundex-style
    * 4-char keys): which DISTINCT words collide phonetically, with
    * occurrence mass and the block's word range — the entity-resolution
    * blocker's candidate map (fuzzy matching then compares only within
    * a block, never across the corpus). Output is bounded by the key
    * domain; the oracle regenerates every key byte for byte from the
    * shared recipe generator.
    */
  private val phoneticBlocks = Q(
    "dedup_phonetic_blocks", {
      val key = graft.functions.TextAnalysis.phoneticKeySql("word")
      s"""WITH w AS (SELECT unnest(string_split(p_name, ' ')) AS word FROM part),
         |k AS (SELECT word, $key AS key FROM w),
         |g AS (SELECT key, CAST(count(*) AS BIGINT) AS n_occ,
         |             CAST(count(DISTINCT word) AS BIGINT) AS n_words,
         |             min(word) AS w_min, max(word) AS w_max
         |      FROM k WHERE key IS NOT NULL GROUP BY 1)
         |SELECT key, n_occ, n_words, w_min, w_max
         |FROM g WHERE n_words >= 2""".stripMargin
    }) { (s, d) =>
    Tables.part(s, d)
      .select(explode(split(col("p_name"), " ")).as("word"))
      .select(col("word"),
        graft.functions.TextAnalysis.phoneticKey(col("word")).as("key"))
      .filter(col("key").isNotNull)
      .groupBy(col("key"))
      .agg(lcount().as("n_occ"),
        countDistinct(col("word")).cast(LongType).as("n_words"),
        min(col("word")).as("w_min"), max(col("word")).as("w_max"))
      .filter(col("n_words") >= 2)
  }

  /** Phonetically-blocked fuzzy word pairs — the entity-resolution
    * BLOCK → VERIFY composition over the part-name vocabulary: candidate
    * pairs come only from within a shared [[graft.functions.TextAnalysis
    * .phoneticKey]] block (the quadratic is block-bounded, never
    * vocabulary²), and the verify stage is the exact edit distance
    * (≤ 2). The pipeline shape every record-linkage pass runs; both the
    * key and the distance are engine-exact.
    */
  private val phoneticPairs = Q(
    "dedup_phonetic_pairs", {
      val key = graft.functions.TextAnalysis.phoneticKeySql("word")
      s"""WITH w AS (SELECT DISTINCT unnest(string_split(p_name, ' ')) AS word
         |           FROM part),
         |k AS (SELECT word, key
         |      FROM (SELECT word, $key AS key FROM w)
         |      WHERE key IS NOT NULL),
         |p AS (SELECT a.word AS w_a, b.word AS w_b, a.key AS key,
         |             levenshtein(a.word, b.word) AS dist
         |      FROM k a JOIN k b ON a.key = b.key AND a.word < b.word)
         |SELECT w_a, w_b, key, CAST(dist AS BIGINT) AS dist
         |FROM p WHERE dist <= 2""".stripMargin
    }) { (s, d) =>
    val k = Tables.part(s, d)
      .select(explode(split(col("p_name"), " ")).as("word")).distinct()
      .select(col("word"),
        graft.functions.TextAnalysis.phoneticKey(col("word")).as("key"))
      .filter(col("key").isNotNull)
    k.select(col("word").as("w_a"), col("key"))
      .join(k.select(col("word").as("w_b"), col("key")), Seq("key"))
      .filter(col("w_a") < col("w_b"))
      .select(col("w_a"), col("w_b"), col("key"),
        levenshtein(col("w_a"), col("w_b")).cast(LongType).as("dist"))
      .filter(col("dist") <= 2)
  }

  /** Item-item collaborative-filtering top-3 ("customers who bought
    * this also bought") over the binary basket incidence: cosine
    * cos(a,b) = n_ab / √(n_a·n_b) — the co-count normalized so ubiquity
    * doesn't win the way it does in raw co-occurrence. Ranking uses the
    * EXACT cos² lattice (n_ab²·10¹²) div (n_a·n_b) (cosines are
    * nonnegative, so cos² preserves the order; ties to the lowest
    * neighbor id), making every rank reproducible bit for bit; the
    * cosine itself is one pinned double at the edge. Pairs come from
    * the one-shuffle per-basket sorted array ([[graft.operators.Dedup
    * .pairsFromSortedArray]] — Σ basket², never items²), the rank
    * window partitions by ITEM (key-partitioned, no global window), and
    * the n_ab ≥ 2 support floor prunes one-off noise before the rank.
    *
    * Shared with `c35_stream_itemcf`: the maintained pair/item-count
    * stores read out through [[itemCfTopK]] and certify against this
    * SAME oracle string — maintained recommender index ≡ one-shot.
    */
  private[queries] val itemCfOracleSql: String =
    """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |ic AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item FROM b GROUP BY 1),
      |p AS (SELECT x.l_partkey AS pa, y.l_partkey AS pb,
      |             CAST(count(*) AS BIGINT) AS n_ab
      |      FROM b x JOIN b y
      |        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      |      GROUP BY 1, 2),
      |r AS (SELECT pa AS item, pb AS rec, n_ab FROM p
      |      UNION ALL SELECT pb, pa, n_ab FROM p),
      |j AS (SELECT r.item, r.rec, r.n_ab, ia.n_item, ib.n_item AS n_rec
      |      FROM r JOIN ic ia ON ia.l_partkey = r.item
      |             JOIN ic ib ON ib.l_partkey = r.rec
      |      WHERE r.n_ab >= 2),
      |s AS (SELECT item, rec, n_ab, n_item, n_rec,
      |             CAST((CAST(n_ab AS HUGEINT) * n_ab * 1000000000000)
      |                  // (CAST(n_item AS HUGEINT) * n_rec) AS BIGINT) AS cos2_scaled
      |      FROM j),
      |k AS (SELECT *, row_number() OVER (PARTITION BY item
      |                                   ORDER BY cos2_scaled DESC, rec) AS rnk
      |      FROM s)
      |SELECT item, rec, n_ab, n_item, n_rec, cos2_scaled,
      |       CAST(n_ab AS DOUBLE)
      |         / sqrt(CAST(n_item AS DOUBLE) * CAST(n_rec AS DOUBLE)) AS cosine,
      |       CAST(rnk AS BIGINT) AS rnk
      |FROM k WHERE rnk <= 3""".stripMargin

  /** The recommender tail over (pa, pb, n_ab) pair counts and
    * (item, n_item) basket counts — shared by the one-shot query and
    * the streaming maintainer readout.
    */
  private[queries] def itemCfTopK(p: org.apache.spark.sql.DataFrame,
      ic: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val r = p.select(col("pa").as("item"), col("pb").as("rec"), col("n_ab"))
      .unionAll(p.select(col("pb").as("item"), col("pa").as("rec"), col("n_ab")))
      .filter(col("n_ab") >= 2)
    val rnkWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item"))
      .orderBy(col("cos2_scaled").desc, col("rec"))
    r.join(ic, Seq("item"))
      .join(ic.select(col("item").as("rec"), col("n_item").as("n_rec")),
        Seq("rec"))
      .withColumn("cos2_scaled",
        expr("""(cast(n_ab as decimal(38,0)) * n_ab * 1000000000000)
               | div (cast(n_item as decimal(38,0)) * n_rec)"""
          .stripMargin.replaceAll("\n\\s*", " ")))
      .withColumn("rnk", row_number().over(rnkWin).cast(LongType))
      .filter(col("rnk") <= 3)
      .select(col("item"), col("rec"), col("n_ab"), col("n_item"),
        col("n_rec"), col("cos2_scaled"),
        (col("n_ab").cast("double") /
          sqrt(col("n_item").cast("double") * col("n_rec").cast("double")))
          .as("cosine"),
        col("rnk"))
  }

  private val itemCf = Q("dm_item_cf_topk", itemCfOracleSql) { (s, d) =>
    val inc = StreamItemCf.basketIncidence(
      Tables.lineitem(s, d), "l_orderkey", "l_partkey")
    itemCfTopK(StreamItemCf.basketPairCounts(inc),
      StreamItemCf.itemBasketCounts(inc))
  }

  /** Multi-objective best-customer readout: the Pareto front of
    * (order count, exact decimal spend) per customer — the customers no
    * other customer beats on both axes ([[graft.operators.Skyline]]:
    * per-x max reduction + distributed strict sweep, no quadratic
    * self-join). The oracle IS the textbook brute-force NOT EXISTS
    * dominance test, so the hash match proves the sweep plan computes
    * the definition exactly, ties included (equal points dominate
    * neither, and every customer ON a front point is returned). Spend
    * comparisons stay in DECIMAL end to end; the readout casts to
    * DOUBLE only at the edge.
    */
  private val pareto = Q(
    "dm_pareto_front",
    s"""WITH pts AS (SELECT o_custkey AS custkey, $C AS n_orders,
       |                    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS spend
       |             FROM orders GROUP BY 1)
       |SELECT custkey, n_orders, CAST(spend AS DOUBLE) AS spend
       |FROM pts p
       |WHERE NOT EXISTS (SELECT 1 FROM pts q
       |                  WHERE q.n_orders >= p.n_orders AND q.spend >= p.spend
       |                    AND (q.n_orders > p.n_orders OR q.spend > p.spend))"""
      .stripMargin) { (s, d) =>
    val pts = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(lcount().as("n_orders"),
        sum(col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("spend"))
    val front = graft.operators.Skyline.paretoFront2d(
      pts.select(col("n_orders"), col("spend")), "n_orders", "spend")
    // the front is at most distinct-n_orders rows — broadcast the join
    // back that recovers every customer sitting on a front point
    pts.join(broadcast(front), Seq("n_orders", "spend"))
      .select(col("custkey"), col("n_orders"),
        col("spend").cast("double").as("spend"))
  }

  val queries: Seq[Q] = Seq(m9, m10, m13, affinity, assocRules, itemCf,
    phoneticBlocks, phoneticPairs, pareto)
}
