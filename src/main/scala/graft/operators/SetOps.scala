package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}
import graft.Canon.{orderAll, sumDec, sumDecSql}

/** Sort / limit / set-operation surface (SURVEY.md §2 Q50–Q53).
  *
  * Generalizes the reference's remote `sort=start,time,0` + `c=100` catalog
  * scan (`utils/eumdacapi.py:33-41`). Global sorts are range-partitioned
  * exchanges in Spark; `orderBy.limit` plans as TakeOrderedAndProject (no
  * full sort at scale).
  */
object SetOps {

  val all: Seq[Q] = Seq(

    // Q50 — multi-key sort with explicit null ordering per direction.
    Q("q50_multi_sort",
      """SELECT o_orderstatus, o_orderpriority, o_totalprice, o_orderkey
        |FROM orders
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_totalprice DESC NULLS LAST,
        |  o_orderkey ASC NULLS FIRST
        |LIMIT 1000""".stripMargin) { (s, dir) =>
      Tables.t(s, dir, "orders")
        .select("o_orderstatus", "o_orderpriority", "o_totalprice", "o_orderkey")
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_totalprice").desc_nulls_last,
          col("o_orderkey").asc_nulls_first)
        .limit(1000)
    },

    // Q51 — global top-k (TakeOrderedAndProject, not a full sort).
    Q("q51_topk",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST
        |LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc_nulls_last,
          col("o_orderkey").asc_nulls_first)
        .limit(10)
    },

    // Q52 — UNION ALL then aggregate (count multiplicity per key).
    Q("q52_union",
      """SELECT k, count(*) AS n FROM (
        |  SELECT c_custkey AS k FROM customer
        |  UNION ALL
        |  SELECT o_custkey AS k FROM orders
        |) GROUP BY k
        |ORDER BY k NULLS FIRST, n NULLS FIRST""".stripMargin) { (s, dir) =>
      val c = Tables.t(s, dir, "customer").select(col("c_custkey").as("k"))
      val o = Tables.t(s, dir, "orders").select(col("o_custkey").as("k"))
      orderAll(c.unionAll(o).groupBy("k").agg(count(lit(1)).as("n")))
    },

    // Q53 — INTERSECT / EXCEPT, tagged into one result. UNION DISTINCT is
    // exercised by the inner distinct() of each branch's semantics.
    Q("q53_setops",
      """SELECT 'both' AS tag, k FROM (
        |  SELECT c_custkey AS k FROM customer
        |  INTERSECT
        |  SELECT o_custkey AS k FROM orders)
        |UNION ALL
        |SELECT 'cust_only' AS tag, k FROM (
        |  SELECT c_custkey AS k FROM customer
        |  EXCEPT
        |  SELECT o_custkey AS k FROM orders)
        |ORDER BY tag NULLS FIRST, k NULLS FIRST""".stripMargin) { (s, dir) =>
      val c = Tables.t(s, dir, "customer").select(col("c_custkey").as("k"))
      val o = Tables.t(s, dir, "orders").select(col("o_custkey").as("k"))
      val both = c.intersect(o).select(lit("both").as("tag"), col("k"))
      val custOnly = c.except(o).select(lit("cust_only").as("tag"), col("k"))
      orderAll(both.unionAll(custOnly))
    },

    // Q54 (beyond-survey) — pivot with an explicit value list (dynamic
    // pivot would need a driver-side distinct scan — never at scale).
    // The oracle spells the equivalent conditional aggregation.
    Q("q54_pivot",
      s"""SELECT l_linestatus,
         |  ${graft.Canon.sumDecSql("CASE WHEN l_returnflag = 'A' THEN l_quantity END")} AS A,
         |  ${graft.Canon.sumDecSql("CASE WHEN l_returnflag = 'N' THEN l_quantity END")} AS N,
         |  ${graft.Canon.sumDecSql("CASE WHEN l_returnflag = 'R' THEN l_quantity END")} AS R
         |FROM lineitem GROUP BY l_linestatus
         |ORDER BY l_linestatus NULLS FIRST, A NULLS FIRST, N NULLS FIRST,
         |  R NULLS FIRST""".stripMargin) { (s, dir) =>
      orderAll(Tables.t(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(graft.Canon.sumDec(col("l_quantity"))))
    },

    // Q55 (beyond-survey) — unpivot/melt back to long form: the inverse
    // reshape, stacking measure columns into (measure, value) rows.
    Q("q55_unpivot",
      """SELECT o_orderkey, measure, value FROM (
        |  SELECT o_orderkey, 'total' AS measure, o_totalprice AS value
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'key2' AS measure,
        |    CAST(o_custkey AS DOUBLE) AS value FROM orders)
        |ORDER BY o_orderkey NULLS FIRST, measure NULLS FIRST,
        |  value NULLS FIRST
        |LIMIT 5000""".stripMargin) { (s, dir) =>
      orderAll(Tables.t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice").as("total"),
          col("o_custkey").cast("double").as("key2"))
        .unpivot(Array(col("o_orderkey")), Array(col("total"), col("key2")),
          "measure", "value")).limit(5000)
    },

    // Q56 (beyond-survey) — SQL-authored correlated scalar subquery over
    // temp views: Catalyst decorrelates it into an aggregate + left join
    // (no per-row subquery execution — asserted by the absence of any
    // re-scan loop; the plan is a plain join).
    Q("q56_correlated_subquery",
      s"""SELECT o_orderkey, o_totalprice,
         |  (SELECT count(*) FROM lineitem l
         |   WHERE l.l_orderkey = o.o_orderkey) AS n_items
         |FROM orders o
         |ORDER BY o_orderkey NULLS FIRST, o_totalprice NULLS FIRST,
         |  n_items NULLS FIRST
         |LIMIT 5000""".stripMargin) { (s, dir) =>
      Tables.t(s, dir, "orders").createOrReplaceTempView("orders_v")
      Tables.t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT o_orderkey, o_totalprice,
          |  (SELECT count(*) FROM lineitem_v l
          |   WHERE l.l_orderkey = o.o_orderkey) AS n_items
          |FROM orders_v o
          |ORDER BY o_orderkey ASC NULLS FIRST, o_totalprice ASC NULLS FIRST,
          |  n_items ASC NULLS FIRST
          |LIMIT 5000""".stripMargin)
    },

    // Q57 (beyond-survey) — NOT IN with a nullable probe column: SQL's
    // three-valued logic (a NULL probe can never pass NOT IN against a
    // non-empty set) makes this a NULL-AWARE anti join, not a plain one.
    // The nullable side is synthesized with nullif (the test tables carry
    // no NULL keys). Scale shape: Spark's optimizeNullAwareAntiJoin
    // (default on, single-column NOT IN + broadcastable subquery) plans a
    // BroadcastHashJoin LeftAnti — the naive fallback is a
    // BroadcastNestedLoopJoin, which PlanSpec asserts is absent.
    Q("q57_not_in_null",
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE nullif(o_custkey, 7) NOT IN
        |  (SELECT c_custkey FROM customer WHERE c_acctbal < -900)
        |ORDER BY o_orderkey NULLS FIRST, o_custkey NULLS FIRST
        |LIMIT 5000""".stripMargin) { (s, dir) =>
      Tables.t(s, dir, "orders").createOrReplaceTempView("orders_v")
      Tables.t(s, dir, "customer").createOrReplaceTempView("customer_v")
      s.sql(
        """SELECT o_orderkey, o_custkey FROM orders_v
          |WHERE nullif(o_custkey, 7) NOT IN
          |  (SELECT c_custkey FROM customer_v WHERE c_acctbal < -900)
          |ORDER BY o_orderkey ASC NULLS FIRST, o_custkey ASC NULLS FIRST
          |LIMIT 5000""".stripMargin)
    },

    // Q58 (beyond-survey) — MERGE/upsert semantics without a table
    // format: new snapshot = base ⟗ changes, changed keys take the new
    // row, new keys insert, unmatched base rows carry forward — the
    // WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT split expressed as
    // one full-outer join + coalesce (what MERGE INTO compiles to). The
    // change set here is derived deterministically from the base (every
    // 7th key re-priced +10%, plus synthetic new keys above the max).
    // Scale shape: ONE shuffle of base + changes on the key; in a real
    // deployment the snapshot is key-bucketed so the join is
    // co-partitioned and only affected buckets rewrite (the
    // SlotPipeline dynamic-partition-overwrite pattern).
    Q("q58_merge_upsert",
      s"""WITH chg AS (
         |  SELECT o_orderkey, o_totalprice * 1.1 AS price
         |  FROM orders WHERE o_orderkey % 7 = 0
         |  UNION ALL
         |  SELECT (SELECT max(o_orderkey) FROM orders) + s AS o_orderkey,
         |    CAST(100 + s AS DOUBLE) AS price
         |  FROM (SELECT unnest(generate_series(1, 5)) AS s)),
         |merged AS (
         |  SELECT coalesce(b.o_orderkey, c.o_orderkey) AS o_orderkey,
         |    coalesce(c.price, b.o_totalprice) AS price,
         |    CASE WHEN b.o_orderkey IS NULL THEN 'insert'
         |      WHEN c.o_orderkey IS NULL THEN 'carry'
         |      ELSE 'update' END AS action
         |  FROM orders b FULL OUTER JOIN chg c
         |    ON b.o_orderkey = c.o_orderkey)
         |SELECT action, CAST(count(*) AS INT) AS n,
         |  ${sumDecSql("price")} AS sum_price
         |FROM merged GROUP BY action
         |ORDER BY action NULLS FIRST, n NULLS FIRST, sum_price NULLS FIRST""".stripMargin) {
      (s, dir) =>
        val base = Tables.t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        val maxKey = base.agg(max(col("o_orderkey"))).head().getLong(0)
        // NOTE: no round(·, 2) on the re-price — Spark rounds the exact
        // binary expansion while DuckDB rounds via a multiply/divide, and
        // they disagree by 1 ulp at .xx5 boundaries; the decimal-routed
        // sum canonicalizes the unrounded doubles deterministically.
        val updates = base.filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey").as("k"),
            (col("o_totalprice") * 1.1).as("price"))
        val inserts = s.range(1, 6)
          .select((col("id") + maxKey).as("k"),
            (col("id") + 100).cast("double").as("price"))
        val chg = updates.unionAll(inserts)
        val merged = base.join(chg, base("o_orderkey") === chg("k"),
            "full_outer")
          .select(coalesce(base("o_orderkey"), col("k")).as("o_orderkey"),
            coalesce(col("price"), col("o_totalprice")).as("price"),
            when(base("o_orderkey").isNull, "insert")
              .when(col("k").isNull, "carry")
              .otherwise("update").as("action"))
        orderAll(merged.groupBy(col("action"))
          .agg(count(lit(1)).cast("int").as("n"),
            sumDec(col("price")).as("sum_price")))
    },

    // Q58b (beyond-survey) — SNAPSHOT DIFF: the change feed between two
    // corpus versions (yesterday's crawl vs today's), the upstream half
    // of q58's MERGE — a pipeline that can't compute WHAT changed can't
    // apply it incrementally. Both versions are derived deterministically
    // from the fixture (old drops doc_id%11=3, new drops %11=7 and
    // re-tags lang for %5=0), then each side projects to (key, digest)
    // BEFORE the full-outer join: at 100 TB the exchange carries 40-byte
    // digest rows, never document bodies — content equality by md5, the
    // same narrow-shuffle discipline as the q90 hash dedup. Unchanged
    // rows (the overwhelming majority at scale) are dropped, so the
    // output is the bounded delta feed. One co-partitionable shuffle on
    // the key; with both snapshots key-bucketed at rest the diff is
    // zero-exchange.
    Q("q58b_snapshot_diff",
      s"""WITH ${graft.SnapshotFixture.sqlCtes},
         |d AS (
         |  SELECT coalesce(so.doc_id, snh.doc_id) AS doc_id,
         |    CASE WHEN so.h IS NULL THEN 'added'
         |      WHEN snh.h IS NULL THEN 'removed'
         |      WHEN so.h <> snh.h THEN 'modified' END AS change
         |  FROM so FULL OUTER JOIN snh ON so.doc_id = snh.doc_id)
         |SELECT doc_id, change FROM d WHERE change IS NOT NULL
         |ORDER BY doc_id NULLS FIRST, change NULLS FIRST""".stripMargin) {
      (s, dir) =>
        val docs = Tables.t(s, dir, "documents")
        val old = graft.SnapshotFixture.oldSnapshot(docs)
          .select(col("doc_id"), graft.SnapshotFixture.digest.as("__ho"))
        val neu = graft.SnapshotFixture.newSnapshot(docs)
          .select(col("doc_id"), graft.SnapshotFixture.digest.as("__hn"))
        orderAll(old.join(neu, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            when(col("__ho").isNull, "added")
              .when(col("__hn").isNull, "removed")
              .when(col("__ho") =!= col("__hn"), "modified").as("change"))
          .filter(col("change").isNotNull))
    },

    // Q58c (beyond-survey) — CHANGELOG COMPACTION (CDC apply,
    // [[graft.Engine.applyChangelog]]): q58's MERGE applies one delta
    // batch against a base table; this replays a full insert/update/
    // delete change STREAM into its final state — what a lakehouse
    // format's read path does with its log. The events fixture maps to
    // a changelog (signup→I, error→D, else U; (ts, event_id) is the
    // per-key sequence). Deliberately a single max(struct)-aggregate,
    // NOT a row_number window: partial aggregation combines map-side,
    // so 100 TB of history shuffles one packed row per key per map
    // task instead of every change row into a per-key sort. The
    // oracle's window form is the same function by a different plan.
    Q("q58c_cdc_apply",
      """WITH cl AS (SELECT user_id, ts, event_id,
        |    CASE event_type WHEN 'signup' THEN 'I'
        |      WHEN 'error' THEN 'D' ELSE 'U' END AS op,
        |    value FROM events),
        |r AS (SELECT user_id, op, value, ts,
        |    count(*) OVER (PARTITION BY user_id) AS n_ops,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM cl)
        |SELECT user_id, CAST(n_ops AS BIGINT) AS n_ops, ts AS last_ts,
        |  round(value, 6) AS last_value
        |FROM r WHERE rn = 1 AND op <> 'D'
        |ORDER BY user_id NULLS FIRST, n_ops NULLS FIRST,
        |  last_ts NULLS FIRST, last_value NULLS FIRST""".stripMargin) {
      (s, dir) =>
        val log = Tables.t(s, dir, "events").select(col("user_id"),
          col("ts"), col("event_id"),
          when(col("event_type") === "signup", "I")
            .when(col("event_type") === "error", "D")
            .otherwise("U").as("op"),
          col("value"))
        orderAll(graft.Engine.applyChangelog(log,
            keyCols = Seq("user_id"), seqCols = Seq("ts", "event_id"),
            opCol = "op")
          .select(col("user_id"), col("n_ops"),
            col("last_ts"), round(col("last_value"), 6).as("last_value")))
    },

    // Q59 (beyond-survey) — SCD TYPE-2 history build: collapse an event
    // log into attribute-validity intervals. Per customer, each PRIORITY
    // CHANGE (detected with lag) opens an interval; lead() closes it at
    // the next change's start (NULL = still current). The reference's
    // cursor is exactly this shape's 1-row degenerate case (one entity,
    // monotone validity). One shuffle on the entity key: change
    // detection, interval close, and versioning share the partitioning.
    // First-event-per-key rows (lag IS NULL) always open an interval, so
    // every key appears; version numbers are change-ordinals.
    Q("q59_scd2", scd2OracleSql) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val chg = Tables.t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"), col("o_orderkey"))
        .withColumn("is_chg",
          when(lag(col("o_orderpriority"), 1).over(w).isNull ||
            lag(col("o_orderpriority"), 1).over(w) =!= col("o_orderpriority"),
            1).otherwise(0))
      // version counts changes so far (carry rows contribute 0, so
      // before/after the filter is equivalent); eff_to is computed AFTER
      // the change filter so an interval closes at the next CHANGE, not
      // the next order — matching SQL's WHERE-before-window evaluation
      // order in the oracle's iv CTE.
      val iv = chg
        .withColumn("version", sum(col("is_chg")).over(wRun).cast("int"))
        .filter(col("is_chg") === 1)
        .withColumn("eff_to", lead(col("o_orderdate"), 1).over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)))
      orderAll(iv.select(col("o_custkey"), col("o_orderpriority"),
        col("o_orderdate").as("eff_from"), col("eff_to"),
        col("eff_to").isNull.as("is_current"), col("version")))
        .limit(5000)
    },

    // Q59b (beyond-survey) — POINT-IN-TIME join against the SCD2
    // dimension: each lineitem is attributed to the customer-priority
    // interval that was CURRENT when it shipped (eff_from ≤ ship <
    // eff_to, open intervals unbounded) — the temporal-correctness join
    // every feature-store / training-data pipeline needs to avoid
    // leakage. Scale shape: the fact pays one equi-join on the order key
    // to pick up its customer, then the interval join is EQUI on
    // o_custkey with the range predicate as a residual — never a
    // nested-loop over intervals; the dimension is versions-per-entity
    // small relative to the fact and shuffles once on the same key.
    Q("q59b_pit_join",
      s"""WITH chg AS (SELECT o_custkey, o_orderdate, o_orderpriority,
         |    o_orderkey, CASE WHEN lag(o_orderpriority) OVER w IS NULL
         |      OR lag(o_orderpriority) OVER w <> o_orderpriority
         |      THEN 1 ELSE 0 END AS is_chg
         |  FROM orders WINDOW w AS (PARTITION BY o_custkey
         |    ORDER BY o_orderdate, o_orderkey)),
         |iv AS (SELECT o_custkey AS d_custkey, o_orderpriority AS prio,
         |    o_orderdate AS eff_from,
         |    lead(o_orderdate) OVER (PARTITION BY o_custkey
         |      ORDER BY o_orderdate, o_orderkey) AS eff_to
         |  FROM chg WHERE is_chg = 1),
         |fact AS (SELECT l_orderkey, l_shipdate, l_extendedprice, o_custkey
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
         |SELECT prio AS ship_time_priority, CAST(count(*) AS INT) AS n,
         |  ${sumDecSql("l_extendedprice")} AS revenue
         |FROM fact JOIN iv ON o_custkey = d_custkey
         |  AND l_shipdate >= eff_from
         |  AND (eff_to IS NULL OR l_shipdate < eff_to)
         |GROUP BY prio
         |ORDER BY ship_time_priority NULLS FIRST, n NULLS FIRST,
         |  revenue NULLS FIRST""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val iv = Tables.t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"), col("o_orderkey"))
        .withColumn("is_chg",
          when(lag(col("o_orderpriority"), 1).over(w).isNull ||
            lag(col("o_orderpriority"), 1).over(w) =!= col("o_orderpriority"),
            1).otherwise(0))
        .filter(col("is_chg") === 1)
        .withColumn("eff_to", lead(col("o_orderdate"), 1).over(w))
        .select(col("o_custkey").as("d_custkey"),
          col("o_orderpriority").as("prio"),
          col("o_orderdate").as("eff_from"), col("eff_to"))
      val o = Tables.t(s, dir, "orders")
      val fact = Tables.t(s, dir, "lineitem")
        .join(o, col("l_orderkey") === o("o_orderkey"))
        .select(col("l_shipdate"), col("l_extendedprice"), col("o_custkey"))
      orderAll(fact.join(iv,
          col("o_custkey") === col("d_custkey") &&
          col("l_shipdate") >= col("eff_from") &&
          (col("eff_to").isNull || col("l_shipdate") < col("eff_to")))
        .groupBy(col("prio").as("ship_time_priority"))
        .agg(count(lit(1)).cast("int").as("n"),
          sumDec(col("l_extendedprice")).as("revenue")))
    },

    // Q59c (beyond-survey) — INCREMENTAL SCD2 merge
    // ([[graft.Engine.scd2Merge]]): q59 rebuilds the whole dimension
    // from scratch; the nightly shape applies an append-only delta
    // (orders ≥ the cutoff) to yesterday's history and must produce a
    // ROW-IDENTICAL table while recomputing only the touched keys —
    // untouched keys pass through an anti-join unread, closed
    // intervals are immutable, and only each touched key's CURRENT
    // row is replayed against its delta sliver (versions continue).
    // The oracle IS q59's full-rebuild SQL: the equivalence q99h
    // establishes for index appends, applied to dimension history.
    Q("q59c_scd2_merge", scd2OracleSql) { (s, dir) =>
      val o = Tables.t(s, dir, "orders").select(col("o_custkey"),
        col("o_orderdate"), col("o_orderpriority"), col("o_orderkey"))
      val cutoff = lit("1999-01-01").cast("timestamp")
      val hist = graft.Engine.scd2Build(
        o.filter(col("o_orderdate") < cutoff),
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
      orderAll(graft.Engine.scd2Merge(hist,
          o.filter(col("o_orderdate") >= cutoff),
          "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
        .select(col("o_custkey"), col("o_orderpriority"),
          col("eff_from"), col("eff_to"), col("is_current"),
          col("version")))
        .limit(5000)
    })

  /** The full-rebuild SCD2 oracle — shared by q59 (which builds it in
    * one pass) and q59c (whose incremental merge must equal it). */
  private def scd2OracleSql: String =
    """WITH o AS (SELECT o_custkey, o_orderdate, o_orderpriority,
      |    o_orderkey FROM orders),
      |chg AS (SELECT *, CASE WHEN lag(o_orderpriority) OVER w IS NULL
      |      OR lag(o_orderpriority) OVER w <> o_orderpriority
      |      THEN 1 ELSE 0 END AS is_chg
      |  FROM o WINDOW w AS (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey)),
      |iv AS (SELECT o_custkey, o_orderpriority, o_orderdate AS eff_from,
      |    lead(o_orderdate) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS eff_to,
      |    CAST(sum(is_chg) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey
      |      ROWS UNBOUNDED PRECEDING) AS INT) AS version
      |  FROM chg WHERE is_chg = 1)
      |SELECT o_custkey, o_orderpriority, eff_from, eff_to,
      |  (eff_to IS NULL) AS is_current, version
      |FROM iv
      |ORDER BY o_custkey NULLS FIRST, o_orderpriority NULLS FIRST,
      |  eff_from NULLS FIRST, eff_to NULLS FIRST,
      |  is_current NULLS FIRST, version NULLS FIRST
      |LIMIT 5000""".stripMargin
}
