package graft.queries

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.functions.Cleaning.{dsum, lcount}
import graft.model.Constants
import graft.operators.{Cdc, DateDim, Purge, Scd2, Surrogates, TableDiff}
import graft.sources.Tables
import graft.queries.Q.{C, DS}

/** Warehouse-machinery queries: SCD2 merge, surrogate keys, date dim —
  * exercising the graft.operators library against the harness tables with
  * closed-form oracles.
  */
object WarehouseQueries {

  /** M1–M8/P5/F7/F8 — two-batch SCD2 close+insert over `customer`.
    *
    * Batch 1 bootstraps the dimension (history starts at LOW_DT). Batch 2
    * lowers the segment of every custkey % 3 == 0 (a change → close, M3)
    * and introduces new keys custkey + 100000 for custkey % 7 == 0 (an
    * insert, M5). Quirk Q5 (SURVEY.md §8) applies: closed keys are not
    * re-inserted in the same run.
    */
  private val scd2 = Q(
    "scd2_close_insert",
    """SELECT c_custkey AS custkey, c_mktsegment AS segment, c_name AS name,
      |       DATE '1900-01-01' AS start_dt,
      |       CASE WHEN c_custkey % 3 = 0 THEN DATE '2024-06-01'
      |            ELSE DATE '9999-12-31' END AS end_dt,
      |       c_custkey % 3 <> 0 AS is_active
      |FROM customer
      |UNION ALL
      |SELECT c_custkey + 100000 AS custkey, c_mktsegment AS segment,
      |       c_name AS name, DATE '2024-06-01' AS start_dt,
      |       DATE '9999-12-31' AS end_dt, true AS is_active
      |FROM customer WHERE c_custkey % 7 = 0""".stripMargin) { (s, d) =>
    val base = Tables.customer(s, d).select(
      col("c_custkey").as("custkey"),
      col("c_mktsegment").as("segment"),
      col("c_name").as("name"))
    val target = Scd2.initial(base, Seq("custkey"), Constants.LowDt)
    val changed = base
      .filter(col("custkey") % 3 === 0)
      .withColumn("segment", lower(col("segment")))
    val arrivals = base
      .filter(col("custkey") % 7 === 0)
      .withColumn("custkey", col("custkey") + 100000L)
    val batch2 = changed.unionByName(arrivals)
    Scd2.scd2Apply(
      target, batch2, Seq("custkey"), Seq("segment", "name"),
      Date.valueOf("2024-06-01"))
  }

  /** G1 — deterministic dense surrogate keys + the reserved NA member
    * (bl_3nf.sql:44, 221-277).
    */
  private val g1 = Q(
    "g1_surrogate_keys",
    """SELECT CAST(-1 AS BIGINT) AS sk, 'NA' AS segment
      |UNION ALL
      |SELECT CAST(row_number() OVER (ORDER BY segment) AS BIGINT) AS sk, segment
      |FROM (SELECT DISTINCT c_mktsegment AS segment FROM customer)""".stripMargin) {
    (s, d) =>
      val segs = Tables.customer(s, d)
        .select(col("c_mktsegment").as("segment")).distinct()
      val keyed = Surrogates.assignScalable(segs, "sk", Seq(col("segment")))
        .select(col("sk"), col("segment"))
      val naRow = s.range(1).select(
        lit(Constants.NaKey).as("sk"), lit(Constants.NA).as("segment"))
      naRow.unionByName(keyed)
  }

  /** G1 scale path — [[Surrogates.assignScalable]] over a FACT-sized
    * input (every `orders` row), where the single-task `row_number()`
    * window of [[Surrogates.assign]] would bottleneck: the distributed
    * range-partitioned sort + per-partition zipWithIndex assigns the same
    * dense global ranks with no one-task stage. The oracle is the
    * equivalent global window.
    */
  private val g4 = Q(
    "g4_scalable_surrogates",
    """SELECT CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS sk,
      |       o_orderkey
      |FROM orders""".stripMargin) { (s, d) =>
    Surrogates.assignScalable(
        Tables.orders(s, d).select(col("o_orderkey")),
        "sk", Seq(col("o_orderkey")))
      .select(col("sk"), col("o_orderkey"))
  }

  /** G2/F12/F16 — the generated 1,096-row date dimension
    * (bl_cl.sql:1487-1507).
    */
  private val g2 = Q(
    "g2_date_dim",
    """SELECT CAST(d AS DATE) AS full_date,
      |       CAST(datediff('day', DATE '2022-01-01', CAST(d AS DATE)) + 1 AS BIGINT) AS date_id,
      |       CAST(dayofmonth(CAST(d AS DATE)) AS BIGINT) AS day,
      |       CAST(month(CAST(d AS DATE)) AS BIGINT) AS month,
      |       CAST(year(CAST(d AS DATE)) AS BIGINT) AS year,
      |       CAST(quarter(CAST(d AS DATE)) AS BIGINT) AS quarter
      |FROM generate_series(DATE '2022-01-01', DATE '2024-12-31', INTERVAL 1 DAY) t(d)""".stripMargin) {
    (s, _) => DateDim.referenceRange(s)
  }

  /** M3–M6/J5/J6 — the two-source SCD2 shape: each source feeds the same
    * dimension with its own change-column set (consumer: name+segment;
    * corporate: name only) and a case-insensitively looked-up constant
    * segment for the corporate side (bl_cl.sql:890-1030, 908, 938).
    * One batch per source, applied in reference order (consumer first).
    */
  private val scd2TwoSource = Q(
    "scd2_two_source",
    """SELECT c_custkey AS custkey, c_name AS name, c_mktsegment AS segment,
      |       DATE '1900-01-01' AS start_dt,
      |       CASE WHEN c_custkey % 2 = 0 AND upper(c_mktsegment) <> 'MACHINERY'
      |              THEN DATE '2024-06-01'
      |            WHEN c_custkey % 2 = 1 AND c_custkey % 5 = 0
      |              THEN DATE '2024-06-02'
      |            ELSE DATE '9999-12-31' END AS end_dt,
      |       NOT ((c_custkey % 2 = 0 AND upper(c_mktsegment) <> 'MACHINERY')
      |            OR (c_custkey % 2 = 1 AND c_custkey % 5 = 0)) AS is_active
      |FROM customer""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d)
    val base = cust.select(
      col("c_custkey").as("custkey"),
      col("c_name").as("name"),
      col("c_mktsegment").as("segment"))
    val target = Scd2.initial(base, Seq("custkey"), Constants.LowDt)

    // corporate batch (even keys): J5 constant segment via a J6
    // case-insensitive lookup against the segment dimension
    val segDim = cust.select(col("c_mktsegment").as("seg")).distinct()
      .filter(upper(col("seg")) === "MACHINERY") // one row
    val corporate = base.filter(col("custkey") % 2 === 0)
      .drop("segment")
      .crossJoin(broadcast(segDim))
      .withColumnRenamed("seg", "segment")
    // consumer batch (odd keys): every 5th key changes its name
    val consumer = base.filter(col("custkey") % 2 === 1)
      .withColumn("name",
        when(col("custkey") % 5 === 0, concat(col("name"), lit(" II")))
          .otherwise(col("name")))

    // reference order: consumer close/insert runs first, then corporate;
    // per-source change-column sets (M3 vs M4)
    val afterConsumer = Scd2.scd2Apply(
      target, consumer, Seq("custkey"), Seq("name", "segment"),
      java.sql.Date.valueOf("2024-06-02"))
    Scd2.scd2Apply(
      afterConsumer, corporate, Seq("custkey"), Seq("segment"),
      java.sql.Date.valueOf("2024-06-01"))
  }

  /** SCD2 POINT-IN-TIME fact resolution — the temporal join the
    * reference's active-version filter (P4) only approximates: each order
    * resolves the customer version valid AT ITS ORDER DATE
    * (`start_dt <= od < end_dt`), so facts that straddle a version change
    * split between the old and new attribute values. The version history
    * is built deterministically (custkey % 3 == 0 changes segment at
    * 1995-06-01, mid-way through the order date range).
    *
    * Scale shape: a plain hash equi-join on the customer key with the
    * interval as a residual filter — versions per key are few by
    * construction (SCD2 history depth), so the join output is bounded by
    * the fact size, never an interval blowup; no range-join machinery is
    * needed when a key column exists. One shuffle pair for the join, one
    * for the final aggregate.
    */
  private val pit = Q(
    "scd2_point_in_time",
    s"""WITH v AS (
       |  SELECT c_custkey AS k, c_mktsegment AS seg,
       |         DATE '1900-01-01' AS start_dt,
       |         CASE WHEN c_custkey % 3 = 0 THEN DATE '1995-06-01'
       |              ELSE DATE '9999-12-31' END AS end_dt
       |  FROM customer
       |  UNION ALL
       |  SELECT c_custkey, lower(c_mktsegment), DATE '1995-06-01',
       |         DATE '9999-12-31'
       |  FROM customer WHERE c_custkey % 3 = 0),
       |j AS (SELECT v.seg, o_totalprice
       |      FROM orders JOIN v ON o_custkey = v.k
       |       AND CAST(o_orderdate AS DATE) >= v.start_dt
       |       AND CAST(o_orderdate AS DATE) < v.end_dt)
       |SELECT seg AS segment, ${Q.C} AS n_orders,
       |       ${Q.DS2("o_totalprice")} AS total_price
       |FROM j GROUP BY 1""".stripMargin) { (s, d) =>
    import graft.functions.Cleaning.{dsumRound2, lcount}
    val cust = Tables.customer(s, d)
    val flip = Date.valueOf("1995-06-01")
    val v1 = cust.select(
      col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
      lit(Date.valueOf("1900-01-01")).as(Scd2.StartDt),
      when(col("c_custkey") % 3 === 0, lit(flip))
        .otherwise(lit(Constants.HighDt)).as(Scd2.EndDt))
    val v2 = cust.filter(col("c_custkey") % 3 === 0).select(
      col("c_custkey").as("k"), lower(col("c_mktsegment")).as("seg"),
      lit(flip).as(Scd2.StartDt), lit(Constants.HighDt).as(Scd2.EndDt))
    val fact = Tables.orders(s, d)
      .select(col("o_custkey").as("k"),
        col("o_orderdate").cast("date").as("od"), col("o_totalprice"))
    Scd2.pointInTime(fact, v1.unionByName(v2), Seq("k"), "od")
      .groupBy(col("seg").as("segment"))
      .agg(lcount().as("n_orders"),
        dsumRound2(col("o_totalprice")).as("total_price"))
  }

  /** Snapshot diff audit ([[graft.operators.TableDiff.snapshotDiff]]):
    * two deterministic snapshots of `orders` — "old" drops every 16th
    * key, "new" drops a different 16th and bumps the price of a third
    * residue class — reconciled in ONE full-outer shuffle, classified
    * row-wise, and certified by per-class counts plus the exact price
    * delta (sign-sensitive: a swapped added/removed pair or a missed
    * change moves the decimal sum).
    */
  private val diff = Q(
    "s11_snapshot_diff",
    s"""WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice
       |           FROM orders WHERE o_orderkey % 16 <> 0),
       |n AS (SELECT o_orderkey, o_orderstatus,
       |             CASE WHEN o_orderkey % 16 = 2 THEN o_totalprice + 1.0
       |                  ELSE o_totalprice END AS o_totalprice
       |      FROM orders WHERE o_orderkey % 16 <> 1),
       |d AS (SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
       |                  WHEN n.o_orderkey IS NULL THEN 'removed'
       |                  WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
       |                    OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
       |                    THEN 'changed'
       |                  ELSE 'unchanged' END AS diff_class,
       |             coalesce(n.o_totalprice, 0) - coalesce(o.o_totalprice, 0) AS delta
       |      FROM o FULL JOIN n ON o.o_orderkey = n.o_orderkey)
       |SELECT diff_class, $C AS n, ${DS("delta")} AS price_delta
       |FROM d GROUP BY 1""".stripMargin) { (s, d) =>
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val oldSnap = base.filter(pmod(col("o_orderkey"), lit(16)) =!= 0)
    val newSnap = base.filter(pmod(col("o_orderkey"), lit(16)) =!= 1)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(16)) === 2, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
    TableDiff.snapshotDiff(oldSnap, newSnap,
        Seq("o_orderkey"), Seq("o_orderstatus", "o_totalprice"))
      .groupBy(col("diff_class"))
      .agg(
        lcount().as("n"),
        dsum(coalesce(col("o_totalprice_new"), lit(0)) -
          coalesce(col("o_totalprice_old"), lit(0))).as("price_delta"))
  }

  /** Right-to-erasure cascade audit ([[graft.operators.Purge]]): purge
    * a deterministic customer batch (custkey % 97 == 3), cascade through
    * orders (FK custkey) to lineitem (FK derived order keys — computed
    * with a distributed semi-join, never collected), and report
    * rows_before/rows_removed per table. The lineitem row certifies the
    * two-level FK derivation end to end.
    */
  private val purgeAudit = Q(
    "s12_purge_audit",
    s"""WITH pk AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 97 = 3),
       |ok AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT k FROM pk))
       |SELECT 'customer' AS table_name,
       |       (SELECT $C FROM customer) AS rows_before,
       |       (SELECT $C FROM pk) AS rows_removed
       |UNION ALL
       |SELECT 'orders',
       |       (SELECT $C FROM orders),
       |       (SELECT $C FROM ok)
       |UNION ALL
       |SELECT 'lineitem',
       |       (SELECT $C FROM lineitem),
       |       (SELECT $C FROM lineitem
       |        WHERE l_orderkey IN (SELECT o_orderkey FROM ok))""".stripMargin) {
    (s, d) =>
      val purgeKeys = Tables.customer(s, d)
        .filter(pmod(col("c_custkey"), lit(97)) === 3)
        .select(col("c_custkey"))
      val orders = Tables.orders(s, d)
      val purgedOrderKeys = Purge.derivedKeys(
        orders.select(col("o_custkey"), col("o_orderkey")),
        "o_custkey", purgeKeys, "o_orderkey")
      Purge.audit("customer", Tables.customer(s, d), "c_custkey", purgeKeys)
        .union(Purge.audit("orders",
          orders.select(col("o_custkey")), "o_custkey", purgeKeys))
        .union(Purge.audit("lineitem",
          Tables.lineitem(s, d).select(col("l_orderkey")),
          "l_orderkey", purgedOrderKeys))
  }

  /** CDC ordered apply ([[Cdc.applyChanges]]): a Debezium-shaped feed
    * synthesized from `orders` — insert everything (seq 1), re-price
    * every 5th key (seq 2 update), delete every 7th (seq 3), resurrect
    * every 21st with a fresh row (seq 4 insert-after-delete). The feed is
    * UNIONED OUT OF ORDER (deletes first) — the fold is defined by the
    * sequence column, not arrival order. The oracle states the surviving
    * end-state in closed form, so a hash match certifies the whole op
    * semantics: last-writer-wins, delete removal, resurrection.
    */
  private val cdcApply = Q(
    "cdc_apply",
    """SELECT o_orderkey AS orderkey,
      |       CASE WHEN o_orderkey % 21 = 0 THEN 'N'
      |            WHEN o_orderkey % 5 = 0 THEN 'R'
      |            ELSE o_orderstatus END AS status,
      |       CASE WHEN o_orderkey % 21 = 0 THEN CAST(0.0 AS DOUBLE)
      |            WHEN o_orderkey % 5 = 0
      |              THEN CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 2 AS DOUBLE)
      |            ELSE o_totalprice END AS total
      |FROM orders
      |WHERE o_orderkey % 7 <> 0 OR o_orderkey % 21 = 0""".stripMargin) { (s, d) =>
    val base = Tables.orders(s, d).select(
      col("o_orderkey").as("orderkey"),
      col("o_orderstatus").as("status"),
      col("o_totalprice").as("total"))
    val ins = base.select(col("orderkey"), lit(1L).as("seq"),
      lit("I").as("op"), col("status"), col("total"))
    val upd = base.filter(col("orderkey") % 5 === 0)
      .select(col("orderkey"), lit(2L).as("seq"), lit("U").as("op"),
        lit("R").as("status"),
        (col("total").cast("decimal(18,4)") * 2).cast("double").as("total"))
    val del = base.filter(col("orderkey") % 7 === 0)
      .select(col("orderkey"), lit(3L).as("seq"), lit("D").as("op"),
        lit(null).cast("string").as("status"),
        lit(null).cast("double").as("total"))
    val reins = base.filter(col("orderkey") % 21 === 0)
      .select(col("orderkey"), lit(4L).as("seq"), lit("I").as("op"),
        lit("N").as("status"), lit(0.0).as("total"))
    Cdc.applyChanges(del.unionByName(reins).unionByName(upd).unionByName(ins),
      Seq("orderkey"), "seq", "op")
  }

  /** Soft-delete three-way merge ([[Cdc.mergeSoftDelete]]): a changeset
    * against the customer table updates every 4th key (balance +100,
    * segment lowercased), flags every 8th for deletion, inserts new keys
    * for every 9th — and the every-18th insert arrives pre-deleted (a
    * no-op, the delete-of-absent-key case). Output is the post-merge
    * table with its audit action column.
    */
  private val cdcMerge = Q(
    "cdc_merge_soft_delete",
    """SELECT c_custkey AS custkey,
      |       CASE WHEN c_custkey % 4 = 0 THEN lower(c_mktsegment)
      |            ELSE c_mktsegment END AS segment,
      |       CASE WHEN c_custkey % 4 = 0
      |              THEN CAST(CAST(c_acctbal AS DECIMAL(18,4)) + 100 AS DOUBLE)
      |            ELSE c_acctbal END AS acct,
      |       CASE WHEN c_custkey % 4 = 0 THEN 'updated' ELSE 'kept' END AS action
      |FROM customer WHERE c_custkey % 8 <> 0
      |UNION ALL
      |SELECT c_custkey + 900000 AS custkey, 'NEW' AS segment,
      |       CAST(0.0 AS DOUBLE) AS acct, 'inserted' AS action
      |FROM customer WHERE c_custkey % 9 = 0 AND c_custkey % 18 <> 0""".stripMargin) {
    (s, d) =>
      val target = Tables.customer(s, d).select(
        col("c_custkey").as("custkey"),
        col("c_mktsegment").as("segment"),
        col("c_acctbal").as("acct"))
      val updates = target.filter(col("custkey") % 4 === 0)
        .select(col("custkey"), lower(col("segment")).as("segment"),
          (col("acct").cast("decimal(18,4)") + 100).cast("double").as("acct"),
          (col("custkey") % 8 === 0).as("deleted"))
      val inserts = target.filter(col("custkey") % 9 === 0)
        .select((col("custkey") + 900000L).as("custkey"),
          lit("NEW").as("segment"), lit(0.0).as("acct"),
          (col("custkey") % 18 === 0).as("deleted"))
      Cdc.mergeSoftDelete(target, updates.unionByName(inserts),
        Seq("custkey"), "deleted")
  }

  /** G-family scale layout: the Morton/Z-order clustering key
    * ([[graft.operators.ZOrder.zkey]] — branch-free mask-spread bit ops,
    * inlined by whole-stage codegen; ZOrderSpec measures the actual
    * file-pruning win of the clustered layout). Every order gets
    * z = interleave(customer-key low byte, order-day low byte), and rows
    * group by z's top byte — the 256 "files" a z-ordered write produces.
    * The readout reports each bucket's row count and BOTH dimensions'
    * min/max: Z-order's defining property is that a top-byte bucket pins
    * the top 4 bits of EACH dimension (every bucket spans ≤ 16
    * consecutive values of x AND of y), the 2-D locality that lets
    * parquet min/max file statistics prune scans on either column — a
    * single-column sort clusters only its leading key. The oracle
    * recomputes the interleave closed-form bit by bit, so the hash match
    * certifies the operator's bit layout and the locality claim together.
    */
  private val g5 = Q(
    "g5_zorder_stats",
    s"""WITH o AS (SELECT o_custkey % 256 AS x,
       |              ((date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) % 256)
       |               + 256) % 256 AS y
       |       FROM orders),
       |d AS (SELECT DISTINCT x, y FROM o),
       |z AS (SELECT x, y,
       |             CAST(SUM(((x >> i) & 1) * (CAST(1 AS BIGINT) << (2 * i))
       |                    + ((y >> i) & 1) * (CAST(1 AS BIGINT) << (2 * i + 1))) AS BIGINT) AS z
       |      FROM d CROSS JOIN range(0, 8) t(i) GROUP BY 1, 2),
       |j AS (SELECT o.x, o.y, z.z FROM o JOIN z USING (x, y))
       |SELECT z // 256 AS bucket, $C AS n,
       |       CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
       |       CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
       |FROM j GROUP BY 1""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(
        pmod(col("o_custkey"), lit(256)).as("x"),
        pmod(datediff(col("o_orderdate").cast("date"),
          lit("1995-01-01").cast("date")), lit(256)).as("y"))
      .select(col("x"), col("y"),
        graft.operators.ZOrder.zkey(col("x"), col("y")).as("z"))
      .groupBy(shiftright(col("z"), 8).as("bucket"))
      .agg(lcount().as("n"),
        min(col("x")).cast("long").as("min_x"),
        max(col("x")).cast("long").as("max_x"),
        min(col("y")).cast("long").as("min_y"),
        max(col("y")).cast("long").as("max_y"))
  }

  val queries: Seq[Q] =
    Seq(scd2, scd2TwoSource, g1, g2, g4, g5, pit, diff, purgeAudit, cdcApply,
      cdcMerge)
}
