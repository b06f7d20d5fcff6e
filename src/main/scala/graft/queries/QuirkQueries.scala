package graft.queries

import java.sql.Date

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import graft.model.Constants
import graft.operators.{QualityChecks, Scd1, Scd2}
import graft.sources.Tables
import graft.queries.Q.C

/** SURVEY §8 bug-compat twins: each query EXHIBITS one reference quirk
  * (Q2–Q4, Q6–Q10) on the harness tables, with an oracle that replays the
  * quirky semantics — a hash match certifies we reproduce the reference's
  * behavior verbatim, not an accidentally-cleaner variant. Q1 is
  * `v1_region_bugcompat` (PipelineQueries), Q5 is baked into
  * [[graft.operators.Scd2.scd2Apply]] (ScdSpec + `scd2_close_insert`).
  *
  * All twins are dimension-sized: single-stage plans over nation/region/
  * customer/orders, broadcast-joined where joined at all — nothing here
  * changes the 100-TB story, which is the point: the quirks are
  * label/default/conflict-target trivia whose scale shape is inherited
  * from the operators they decorate.
  */
object QuirkQueries {

  /** Q2 (bl_cl.sql:603) — the consumer-branch country load "joins"
    * regions on the constant `'NA'`: the consumer feed carries no region,
    * so every consumer-sourced country lands with FK_Region = NA while
    * the corporate branch resolves the real region. Both branches union
    * into one dim, one row per (country, source).
    */
  private val q2 = Q(
    "q2_consumer_na_region",
    """SELECT n_name AS country, 'SRC_Corporate' AS source_entity,
      |       r_name AS fk_region
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |UNION ALL
      |SELECT n_name, 'SRC_CONSUMER', 'NA' FROM nation""".stripMargin) { (s, d) =>
    val nat = Tables.nation(s, d)
    val corporate = nat
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name").as("country"),
        lit("SRC_Corporate").as("source_entity"),
        col("r_name").as("fk_region"))
    val consumer = nat.select(col("n_name").as("country"),
      lit("SRC_CONSUMER").as("source_entity"),
      lit(Constants.NA).as("fk_region"))
    corporate.unionByName(consumer)
  }

  /** Q3 (bl_cl.sql:349, 784, 999 vs 641) — `Source_entity` mislabeling,
    * verbatim: several corporate-DERIVED loads stamp their lineage column
    * `'SRC_CONSUMER'`, while the d_orders load uses the proper
    * `'SRC_Corporate'`. The twin runs both load shapes from the SAME
    * corporate source (orders) and reports each load's row count under
    * the label the reference would have written.
    */
  private val q3 = Q(
    "q3_source_entity_mislabel",
    s"""SELECT 'd_addresses' AS tbl, 'SRC_CONSUMER' AS source_entity,
       |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n
       |FROM orders
       |UNION ALL
       |SELECT 'd_orders', 'SRC_Corporate', $C FROM orders""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    // corporate-derived address-analog load, MISLABELED (the quirk)
    val addresses = o.agg(countDistinct(col("o_custkey")).as("n"))
      .select(lit("d_addresses").as("tbl"),
        lit("SRC_CONSUMER").as("source_entity"), col("n"))
    // d_orders load, properly labeled (bl_cl.sql:641)
    val dOrders = o.agg(count(lit(1)).as("n"))
      .select(lit("d_orders").as("tbl"),
        lit("SRC_Corporate").as("source_entity"), col("n"))
    addresses.unionByName(dOrders)
  }

  /** Q4 (bl_cl.sql:427–439) — `d_markets` loads through a LEFT join from
    * the mapping table (unmapped members keep the NA market), stamps
    * `Source_entity = 'map_Market'` for every row, and hard-codes
    * `INSERT_DT = DATE '2024-01-01'` instead of the run date. The map is
    * deliberately partial (segments longer than 8 chars) so the left
    * join's NA fallback is exercised.
    */
  private val q4 = Q(
    "q4_market_mapping",
    """WITH segs AS (SELECT DISTINCT c_mktsegment AS segment FROM customer),
      |map AS (SELECT segment, 'MKT_' || segment AS market
      |        FROM segs WHERE length(segment) > 8)
      |SELECT s.segment, coalesce(m.market, 'NA') AS market,
      |       'map_Market' AS source_entity,
      |       DATE '2024-01-01' AS insert_dt
      |FROM segs s LEFT JOIN map m ON s.segment = m.segment""".stripMargin) { (s, d) =>
    val segs = Tables.customer(s, d)
      .select(col("c_mktsegment").as("segment")).distinct()
    val map = segs.filter(length(col("segment")) > 8)
      .select(col("segment"), concat(lit("MKT_"), col("segment")).as("market"))
    segs.join(broadcast(map), Seq("segment"), "left")
      .select(col("segment"),
        coalesce(col("market"), lit(Constants.NA)).as("market"),
        lit("map_Market").as("source_entity"),
        lit(Date.valueOf("2024-01-01")).as("insert_dt"))
  }

  /** Q6 (bl_3nf.sql:113–122, 236–238) — `Dim_Orders` has no
    * INSERT_DT/UPDATE_DT audit columns, and its default-row insert passes
    * no Ship_Mode at all, so the NA member's ship_mode is SQL NULL — not
    * the `'NA'` string every other dimension's default member carries.
    * The twin builds the dim exactly that way and groups by ship_mode:
    * the NULL group with n = 1 is the quirk's fingerprint, and the result
    * schema (no audit columns anywhere) is hash-checked too.
    */
  private val q6 = Q(
    "q6_dim_orders_defaults",
    s"""SELECT ship_mode, $C AS n FROM (
       |  SELECT CAST(NULL AS VARCHAR) AS ship_mode
       |  UNION ALL
       |  SELECT o_orderpriority FROM orders)
       |GROUP BY 1""".stripMargin) { (s, d) =>
    val dflt = s.range(1)
      .select(lit(null).cast(StringType).as("ship_mode"))
    val rows = Tables.orders(s, d)
      .select(col("o_orderpriority").as("ship_mode"))
    dflt.unionByName(rows)
      .groupBy(col("ship_mode"))
      .agg(count(lit(1)).cast(LongType).as("n"))
  }

  /** Q7 (bl_3nf.sql:250, 258 vs bl_cl.sql:395, 483) — conflict-target
    * mismatch: the init script seeds the NA row deduping on the PK, the
    * load dedups on the NATURAL key. Consequence (reproduced verbatim): a
    * source row whose natural key is literally `'NA'` does NOT collide
    * with the seeded default member — the dim ends up with TWO `NA` rows.
    * The twin injects such a row and counts rows per sector: `NA` → 2,
    * everything else → 1.
    */
  private val q7 = Q(
    "q7_conflict_targets",
    s"""SELECT sector, $C AS n FROM (
       |  SELECT 'NA' AS sector
       |  UNION ALL
       |  SELECT sector FROM (
       |    SELECT DISTINCT c_mktsegment AS sector FROM customer
       |    UNION SELECT 'NA'))
       |GROUP BY 1""".stripMargin) { (s, d) =>
    val seeded = s.range(1).select(lit(Constants.NA).as("sector"))
    // the load's own dedup is by natural key — which never sees the seed
    val load = Tables.customer(s, d)
      .select(col("c_mktsegment").as("sector"))
      .unionByName(s.range(1).select(lit(Constants.NA).as("sector")))
      .distinct()
    seeded.unionByName(load)
      .groupBy(col("sector"))
      .agg(count(lit(1)).cast(LongType).as("n"))
  }

  /** Q8 (bl_cl.sql:2119–2125) — the dm_fact duplicate-match condition
    * compares all 7 FK columns; a NULL FK (failed dimension lookup) never
    * equals anything, so those rows re-insert on every re-run — the
    * reference's documented idempotence limit, reproduced with the same
    * anti-join semantics ([[Scd1.insertIfAbsent]] keyed on the nullable
    * FK): running the same batch twice doubles exactly the NULL-FK rows.
    */
  private val q8 = Q(
    "q8_fact_null_fk_reinsert",
    s"""SELECT (o_custkey % 13 = 0) AS null_fk,
       |       CAST(sum(CASE WHEN o_custkey % 13 = 0 THEN 2 ELSE 1 END) AS BIGINT) AS n
       |FROM orders GROUP BY 1""".stripMargin) { (s, d) =>
    val fact = Tables.orders(s, d).select(
      col("o_orderkey").as("nk"),
      when(col("o_custkey") % 13 === 0, lit(null).cast(LongType))
        .otherwise(col("o_custkey")).as("fk_cust"))
    val rerun = Scd1.insertIfAbsent(fact, fact, Seq("nk", "fk_cust"))
    rerun.groupBy(col("fk_cust").isNull.as("null_fk"))
      .agg(count(lit(1)).cast(LongType).as("n"))
  }

  /** Q9 (bl_cl.sql:2220–2224) — `check_for_duplicates` groups by
    * `source_id` ONLY, so an SCD2 dimension's legitimate version history
    * flags as "duplicates". The twin runs the check as-is over a
    * two-version history (every `custkey % 3 = 0` has a closed + an open
    * version) and next to it the version-aware variant (grouped by
    * source_id + start_dt): the as-is count is the false-positive
    * population, the version-aware count is 0.
    */
  private val q9 = Q(
    "q9_dup_check_source_id",
    s"""SELECT 'as_is' AS variant,
       |       (SELECT $C FROM customer WHERE c_custkey % 3 = 0) AS n_flagged
       |UNION ALL
       |SELECT 'version_aware', CAST(0 AS BIGINT)""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d)
    val flip = Date.valueOf("1995-06-01")
    val v1 = cust.select(col("c_custkey").as("source_id"),
      col("c_mktsegment").as("seg"),
      lit(Constants.LowDt).as(Scd2.StartDt),
      when(col("c_custkey") % 3 === 0, lit(flip))
        .otherwise(lit(Constants.HighDt)).as(Scd2.EndDt))
    val v2 = cust.filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").as("source_id"), lower(col("c_mktsegment")).as("seg"),
        lit(flip).as(Scd2.StartDt), lit(Constants.HighDt).as(Scd2.EndDt))
    val dim = v1.unionByName(v2)
    def flagged(keys: Seq[String]) = QualityChecks.duplicates(dim, keys)
      .agg(count(lit(1)).cast(LongType).as("n_flagged"))
    flagged(Seq("source_id"))
      .select(lit("as_is").as("variant"), col("n_flagged"))
      .unionByName(flagged(Seq("source_id", Scd2.StartDt))
        .select(lit("version_aware").as("variant"), col("n_flagged")))
  }

  /** Q10 (consumer.sql:70 vs bl_3nf.sql:125–136) — the staged consumer
    * `State` column is dropped on the way to 3NF (the address dim keys on
    * City/Postal only), so staged addresses that differ only by state
    * COLLAPSE into one dim row. The twin synthesizes a deterministic
    * (city, state, postal) staging from customer and reports both grains
    * side by side — the gap is the rows the dropped column loses.
    */
  private val q10 = Q(
    "q10_state_dropped",
    """SELECT CAST(count(DISTINCT (c_nationkey, c_custkey % 7, c_custkey % 100)) AS BIGINT)
      |         AS staged_addresses,
      |       CAST(count(DISTINCT (c_nationkey, c_custkey % 100)) AS BIGINT)
      |         AS dim_addresses
      |FROM customer""".stripMargin) { (s, d) =>
    val staged = Tables.customer(s, d).select(
      col("c_nationkey").as("city"),
      (col("c_custkey") % 7).as("state"),
      (col("c_custkey") % 100).as("postal"))
    staged.agg(
      countDistinct(col("city"), col("state"), col("postal"))
        .as("staged_addresses"),
      countDistinct(col("city"), col("postal")).as("dim_addresses"))
  }

  val queries: Seq[Q] = Seq(q2, q3, q4, q6, q7, q8, q9, q10)
}
