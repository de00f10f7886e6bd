package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}
import graft.Canon.{orderAll, sumDec, sumDecSql}

/** Join surface (SURVEY.md §2 Q20–Q27).
  *
  * The headline custom piece is the as-of join (Q26/Q26b) — the reference's
  * exact-slot-match selection (`sources/meteosat.py:105-122`): search window
  * bounds the scan, selection is equality on the truncated timestamp,
  * earliest candidate wins, and a miss leaves the slot unmatched (cursor
  * stall). Both are composed from built-ins (equi/range join + window
  * row_number), which Catalyst plans as shuffled joins + partial windows —
  * no custom Strategy needed (SURVEY §7).
  */
object Joins {

  /** Runs `body` with Catalyst's RUNTIME BLOOM-FILTER injection forced to
    * fire at test scale, restoring every conf afterwards. The production
    * defaults only inject when the probe-side scan exceeds 10 GB — the
    * exact regime a 100 TB fact table lives in permanently — so at sf0.01
    * the thresholds are lowered to demonstrate (and plan-assert) the
    * shape; autoBroadcast is disabled because the rule targets shuffle
    * joins (a broadcast join already filters at the scan via its build
    * side). */
  def withBloomFilterConfs[T](s: org.apache.spark.sql.SparkSession)(
      body: => T): T = {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally old.foreach { case (k, v) =>
      v.fold(s.conf.unset(k))(s.conf.set(k, _)) }
  }

  /** The q20c join body (shared with PlanSpec's bloom assertion): fact
    * lineitem ⋈ a 1/5-selective orders dim. Under runtime filtering,
    * Catalyst builds a bloom filter over the filtered dim's join keys
    * and pushes a might_contain probe into the fact scan — rows that
    * cannot join die at the scan instead of riding the shuffle, which
    * is the difference between shuffling 100 TB and shuffling the ~20%
    * that survives. */
  def bloomJoin(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val li = Tables.t(s, dir, "lineitem")
    val o = Tables.t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sumDec(col("l_extendedprice")).as("revenue"))
  }

  /** Creates (once per sf dir) two BUCKETED external parquet tables —
    * lineitem and orders, both bucketed 8 ways on the order key with
    * in-bucket sort — and returns them. Bucketing is the write-time
    * co-location contract: both sides hash-partition identically on
    * disk, so an equi-join on the bucket key needs NO exchange at read
    * time. At 100 TB this is THE difference between re-shuffling the
    * fact table on every join and shuffling it once at ingest; the
    * bucket count scales with cluster parallelism there (8 matches this
    * harness). Shared with PlanSpec, which asserts the bare join plans
    * with zero shuffle exchanges. */
  def bucketedTables(s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    // memo key = the FULL sanitized dir path, not its hashCode: two dirs
    // colliding on hashCode must never serve each other's bucketed copy
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val (liT, oT) = (s"g_li_bucketed_$tag", s"g_o_bucketed_$tag")
    if (!s.catalog.tableExists(liT)) {
      val out = graft.sources.IO.scratch(s"q20d_bucketed", dir)
      Tables.t(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .repartition(col("l_orderkey")) // one writer task per bucket set
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$out/lineitem").saveAsTable(liT)
      Tables.t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .repartition(col("o_orderkey"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$out/orders").saveAsTable(oT)
    }
    (s.table(liT), s.table(oT))
  }

  val all: Seq[Q] = Seq(

    // Q20d (beyond-survey) — BUCKETED co-located join: both sides are
    // written bucketed 8 ways on the order key, so the equi-join reads
    // bucket i against bucket i with no exchange on either side
    // (PlanSpec asserts the bare join has zero shuffles; the only
    // exchange in this query feeds the final aggregate). Broadcast is
    // disabled during execution so the plan demonstrates the co-located
    // sort-merge shape a 100 TB fact-fact join must take; eager
    // materialization keeps the conf scoped, q20c-style.
    Q("q20d_bucketed_join",
      s"""SELECT o_orderpriority, count(*) AS n,
         |  ${sumDecSql("l_extendedprice")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority NULLS FIRST, n NULLS FIRST,
         |  revenue NULLS FIRST""".stripMargin) { (s, dir) =>
      val (li, o) = bucketedTables(s, dir)
      val key = "spark.sql.autoBroadcastJoinThreshold"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "-1")
      try orderAll(
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sumDec(col("l_extendedprice")).as("revenue"))
          .localCheckpoint())
      finally prev.fold(s.conf.unset(key))(s.conf.set(key, _))
    },

    // Q20e (beyond-survey) — JOIN-SIZE AUDIT
    // ([[graft.Engine.joinSizeAudit]]): the exact row count the
    // lineitem×lineitem self-join on l_partkey WOULD produce
    // (Σ c_k² = 1.86M from 60k rows at sf0.01 — the accidental
    // many-to-many priced before it runs), plus the worst key's
    // contribution and its share, the AQE-skew/salting decision
    // input. Two per-key count aggregates joined on the key — data
    // orders of magnitude smaller than the join it predicts; exact
    // integer arithmetic; worst-key ties report the smallest key.
    Q("q20e_join_audit",
      """WITH ca AS (SELECT l_partkey AS k, count(*) AS c FROM lineitem
        |    WHERE l_partkey IS NOT NULL GROUP BY 1),
        |prod AS (SELECT a.k, a.c * b.c AS p FROM ca a JOIN ca b
        |  USING (k)),
        |t AS (SELECT coalesce(sum(p), 0) AS est, count(*) AS nk,
        |    max(p) AS mx FROM prod),
        |w AS (SELECT min(k) AS wk FROM prod, t WHERE p = mx)
        |SELECT CAST(est AS BIGINT) AS est_join_rows,
        |  CAST(nk AS BIGINT) AS n_matching_keys,
        |  CAST(mx AS BIGINT) AS max_key_rows, wk AS worst_key,
        |  CASE WHEN est > 0 THEN
        |    round(CAST(mx AS DOUBLE) / CAST(est AS DOUBLE), 6)
        |  END AS skew_share
        |FROM t, w
        |ORDER BY est_join_rows NULLS FIRST, n_matching_keys NULLS FIRST,
        |  max_key_rows NULLS FIRST, worst_key NULLS FIRST,
        |  skew_share NULLS FIRST""".stripMargin) { (s, dir) =>
      val li = Tables.t(s, dir, "lineitem")
      orderAll(graft.Engine.joinSizeAudit(
        li, col("l_partkey"), li, col("l_partkey")))
    },

    // Q20c (beyond-survey) — runtime BLOOM-FILTER join: the semi-join
    // reduction Catalyst injects at runtime for selective-dim ⋈ huge-fact
    // plans. The builder materializes eagerly (localCheckpoint) so the
    // execution provably runs under the forced-injection confs, which are
    // restored before returning — the shared session never leaks them.
    // PlanSpec asserts the bloom probe is present in this exact plan.
    Q("q20c_bloom_join",
      s"""SELECT o_orderpriority, count(*) AS n,
         |  ${sumDecSql("l_extendedprice")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderpriority = '1-URGENT'
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority NULLS FIRST, n NULLS FIRST,
         |  revenue NULLS FIRST""".stripMargin) { (s, dir) =>
      withBloomFilterConfs(s) {
        orderAll(bloomJoin(s, dir).localCheckpoint())
      }
    },

    // Q20 — inner equi-join (shuffle or broadcast, Catalyst's pick; the
    // broadcast-forced variant is Q25).
    Q("q20_inner_join",
      """SELECT o_orderkey, c_custkey, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey NULLS FIRST, c_custkey NULLS FIRST,
        |  c_mktsegment NULLS FIRST, o_totalprice NULLS FIRST
        |LIMIT 5000""".stripMargin) { (s, dir) =>
      val o = Tables.t(s, dir, "orders")
      val c = Tables.t(s, dir, "customer")
      orderAll(o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .select("o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice"))
        .limit(5000)
    },

    // Q20b (beyond-survey) — SALTED join as a first-class queryable
    // operator: the plan-level skew mitigation for when AQE's runtime
    // skew split can't apply (skewed aggregation keys, stats arriving
    // too late). Each hot left key scatters over `buckets` synthetic
    // sub-keys; the small right side replicates once per bucket; the
    // salt never reaches the output, so the oracle is the PLAIN join —
    // result equivalence is the operator's correctness contract
    // (SkewSpec proves it on generated data too).
    Q("q20b_salted_join",
      s"""SELECT c_mktsegment, count(*) AS n,
         |  ${sumDecSql("o_totalprice")} AS total
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment NULLS FIRST, n NULLS FIRST,
         |  total NULLS FIRST""".stripMargin) { (s, dir) =>
      val o = Tables.t(s, dir, "orders")
      val c = Tables.t(s, dir, "customer")
      orderAll(Skew.saltedJoin(o, c, col("o_custkey"), col("c_custkey"),
          buckets = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sumDec(col("o_totalprice")).as("total")))
    },

    // Q21 — full outer join with unmatched rows on BOTH sides (each input is
    // filtered to a proper subset first).
    Q("q21_full_outer",
      """SELECT c.c_custkey, o.o_orderkey,
        |  coalesce(c.c_mktsegment, 'NO_CUST') AS seg
        |FROM (SELECT * FROM customer WHERE c_acctbal < 0) c
        |FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 200000) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST, seg NULLS FIRST
        |LIMIT 5000""".stripMargin) { (s, dir) =>
      val c = Tables.t(s, dir, "customer").filter(col("c_acctbal") < 0)
      val o = Tables.t(s, dir, "orders").filter(col("o_totalprice") > 200000)
      orderAll(c.join(o, c("c_custkey") === o("o_custkey"), "full")
        .select(c("c_custkey"), o("o_orderkey"),
          coalesce(c("c_mktsegment"), lit("NO_CUST")).as("seg"))).limit(5000)
    },

    // Q22 — left semi (EXISTS) + left anti (NOT EXISTS), tagged.
    Q("q22_semi_anti",
      """SELECT 'has_orders' AS tag, c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'no_orders' AS tag, c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY tag NULLS FIRST, c_custkey NULLS FIRST""".stripMargin) {
      (s, dir) =>
        val c = Tables.t(s, dir, "customer")
        val o = Tables.t(s, dir, "orders")
        val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(lit("has_orders").as("tag"), col("c_custkey"))
        val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(lit("no_orders").as("tag"), col("c_custkey"))
        orderAll(semi.unionAll(anti))
    },

    // Q23 — cross join (tiny dims only; 5 x 25 rows).
    Q("q23_cross_join",
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) {
      (s, dir) =>
        orderAll(Tables.t(s, dir, "region").crossJoin(Tables.t(s, dir, "nation"))
          .select("r_name", "n_name"))
    },

    // Q24 — theta (non-equi) join semantics: for each supplier, how many
    // suppliers hold a strictly larger balance. The oracle keeps the naive
    // O(n²) BNLJ SQL (fine for DuckDB at sf0.1); the Spark plan is the
    // scale-safe two-level prefix count (Engine.withCountGreater): one row
    // per distinct balance, an equi-width-bucketed PARTITIONED window for
    // the in-bucket prefix, and a driver-literal lookup for the ≤256
    // cross-bucket suffix totals — no global window, no NLJ (both asserted
    // in PlanSpec; equivalence to the naive form proven in AlgebraProps).
    Q("q24_theta_join",
      """SELECT s1.s_suppkey, count(s2.s_suppkey) AS n_richer
        |FROM supplier s1 LEFT JOIN supplier s2
        |  ON s2.s_acctbal > s1.s_acctbal
        |GROUP BY s1.s_suppkey
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin) {
      (s, dir) =>
        val sup = Tables.t(s, dir, "supplier")
        orderAll(graft.Engine.withCountGreater(
          sup.select("s_suppkey", "s_acctbal"), col("s_acctbal"), "n_richer")
          .select("s_suppkey", "n_richer"))
    },

    // Q25 — broadcast-hint equi-join chain: fact(lineitem) with two
    // broadcast dims. Plan shape (BroadcastHashJoin x2) asserted in PlanSpec.
    Q("q25_broadcast_join",
      s"""SELECT p_brand, s_nationkey,
         |  count(*) AS n,
         |  ${sumDecSql("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY p_brand, s_nationkey
         |ORDER BY p_brand NULLS FIRST, s_nationkey NULLS FIRST""".stripMargin) {
      (s, dir) =>
        val li = Tables.t(s, dir, "lineitem")
        val p = Tables.t(s, dir, "part")
        val su = Tables.t(s, dir, "supplier")
        orderAll(li
          .join(broadcast(p), li("l_partkey") === p("p_partkey"))
          .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
          .groupBy(col("p_brand"), col("s_nationkey"))
          .agg(count(lit(1)).as("n"),
            sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")))
              .as("revenue")))
    },

    // Q26 — as-of join (backward): each purchase event matched to the most
    // recent click by the same user at or before it. The oracle spells the
    // naive join+row_number form; the Spark plan is the scale-safe
    // single-pass form: union both event sets, one window per user ordered
    // by (ts, kind, event_id), and carry the last click seen via
    // last(..., ignoreNulls) over a running row frame. Work is O(events)
    // per user — no candidate explosion when one user has many clicks ×
    // purchases — and the whole query is a single shuffle on user_id.
    // Clicks sort before purchases at equal ts (kind asc) so a same-ts
    // click is visible, matching the oracle's c.ts <= p.ts; among visible
    // clicks the running last is the (max ts, max event_id) one, matching
    // the oracle's ORDER BY c.ts DESC, c.event_id DESC tie-break.
    // Purchases with no prior click keep a NULL match — the reference's
    // miss/stall semantics.
    Q("q26_asof_join",
      """SELECT p_id, p_ts, c_id, c_ts FROM (
        |  SELECT p.event_id AS p_id, p.ts AS p_ts,
        |         c.event_id AS c_id, c.ts AS c_ts,
        |         row_number() OVER (PARTITION BY p.event_id
        |           ORDER BY c.ts DESC NULLS LAST, c.event_id DESC NULLS LAST) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id AND c.ts <= p.ts
        |) WHERE rn = 1
        |ORDER BY p_id NULLS FIRST, p_ts NULLS FIRST, c_id NULLS FIRST,
        |  c_ts NULLS FIRST""".stripMargin) { (s, dir) =>
      orderAll(graft.Engine.asOfMatch(
        Tables.t(s, dir, "events")
          .filter(col("event_type").isin("click", "purchase")),
        key = "user_id", ts = "ts", id = "event_id",
        isTarget = col("event_type") === "purchase"))
    },

    // Q26c (beyond-survey) — NEAREST-in-time match: each purchase
    // matches its temporally closest click, before OR after — the
    // two-sided as-of (sensor-fusion alignment), via the library
    // operator [[graft.Engine.nearestMatch]]: ONE window exchange +
    // sort serving both frame directions, never a per-target candidate
    // join. The oracle is the naive both-sides join + row_number
    // brute force, so the window rewrite's equivalence is hash-gated.
    Q("q26c_nearest_match",
      """WITH ev AS (SELECT user_id, ts, event_id, event_type FROM events
        |  WHERE ts IS NOT NULL AND event_type IN ('click', 'purchase')),
        |t AS (SELECT * FROM ev WHERE event_type = 'purchase'),
        |s AS (SELECT * FROM ev WHERE event_type = 'click'),
        |pb AS (SELECT t.event_id AS p_id, s.event_id AS c_id, s.ts AS c_ts,
        |    row_number() OVER (PARTITION BY t.event_id
        |      ORDER BY s.ts DESC, s.event_id DESC) AS rn
        |  FROM t JOIN s ON s.user_id = t.user_id AND s.ts <= t.ts),
        |pf AS (SELECT t.event_id AS p_id, s.event_id AS c_id, s.ts AS c_ts,
        |    row_number() OVER (PARTITION BY t.event_id
        |      ORDER BY s.ts ASC, s.event_id ASC) AS rn
        |  FROM t JOIN s ON s.user_id = t.user_id AND s.ts > t.ts),
        |m AS (SELECT t.event_id AS p_id, t.ts AS p_ts,
        |    CASE WHEN b.c_id IS NOT NULL AND (f.c_id IS NULL OR
        |        epoch_us(t.ts) - epoch_us(b.c_ts)
        |          <= epoch_us(f.c_ts) - epoch_us(t.ts))
        |      THEN b.c_id ELSE f.c_id END AS c_id,
        |    CASE WHEN b.c_id IS NOT NULL AND (f.c_id IS NULL OR
        |        epoch_us(t.ts) - epoch_us(b.c_ts)
        |          <= epoch_us(f.c_ts) - epoch_us(t.ts))
        |      THEN b.c_ts ELSE f.c_ts END AS c_ts
        |  FROM t
        |  LEFT JOIN (SELECT * FROM pb WHERE rn = 1) b ON b.p_id = t.event_id
        |  LEFT JOIN (SELECT * FROM pf WHERE rn = 1) f ON f.p_id = t.event_id)
        |SELECT p_id, p_ts, c_id, c_ts,
        |  abs(epoch_us(p_ts) - epoch_us(c_ts)) AS delta_us
        |FROM m
        |ORDER BY p_id NULLS FIRST, p_ts NULLS FIRST, c_id NULLS FIRST,
        |  c_ts NULLS FIRST, delta_us NULLS FIRST""".stripMargin) { (s, dir) =>
      orderAll(graft.Engine.nearestMatch(
        Tables.t(s, dir, "events")
          .filter(col("event_type").isin("click", "purchase")),
        key = "user_id", ts = "ts", id = "event_id",
        isTarget = col("event_type") === "purchase"))
    },

    // Q26b — the reference's exact slot-match (meteosat.py:105-122): a
    // generated 15-min slot spine, candidates matched on equality of the
    // minute-truncated timestamp, earliest (ts, event_id) candidate wins,
    // unmatched slots survive as NULL (the cursor-stall case). The spine
    // comes from Engine.slotSpine — chunked two-level explode, no
    // collect, no single-task whole-range array.
    Q("q26b_slot_match",
      """WITH bounds AS (
        |  SELECT make_timestamp(CAST(floor(epoch(min(ts)) / 900) * 900 AS BIGINT) * 1000000) AS lo,
        |         make_timestamp(CAST(floor(epoch(max(ts)) / 900) * 900 AS BIGINT) * 1000000) AS hi
        |  FROM events),
        |slots AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL '15 minutes')) AS slot
        |  FROM bounds),
        |cands AS (
        |  SELECT date_trunc('minute', ts) AS slot_key, event_id, ts,
        |         row_number() OVER (PARTITION BY date_trunc('minute', ts)
        |           ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST) AS rn
        |  FROM events)
        |SELECT s.slot, c.event_id AS matched_event
        |FROM slots s LEFT JOIN cands c ON c.slot_key = s.slot AND c.rn = 1
        |ORDER BY slot NULLS FIRST, matched_event NULLS FIRST""".stripMargin) {
      (s, dir) =>
        val ev = Tables.t(s, dir, "events")
        val slotOf = (c: org.apache.spark.sql.Column) =>
          timestamp_seconds(floor(unix_timestamp(c) / 900) * 900)
        val bounds = ev.agg(slotOf(min(col("ts"))).as("lo"),
          slotOf(max(col("ts"))).as("hi"))
        val slots = graft.Engine.slotSpine(bounds, 900)
          .select(col("wstart").as("slot"))
        val w = Window.partitionBy(col("slot_key"))
          .orderBy(col("ts").asc_nulls_last, col("event_id").asc_nulls_last)
        val cands = ev
          .select(date_trunc("minute", col("ts")).as("slot_key"),
            col("event_id"), col("ts"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
        orderAll(slots.join(cands, slots("slot") === cands("slot_key"), "left")
          .select(col("slot"), col("event_id").as("matched_event")))
    },

    // Q28 (beyond-survey) — multi-join analytic flagship, TPC-H Q3 shape:
    // segment-filtered customers ⨝ date-filtered orders ⨝ lineitem,
    // revenue per order, global top-10. The scale story: both filters are
    // pushed to the parquet scans BEFORE the joins (so the fact-side
    // shuffle carries only surviving rows), the final top-10 is
    // TakeOrderedAndProject (no global sort), and no broadcast is forced:
    // customer post-filter is 1/5 of a 100 TB-scale table, far past
    // Spark's 8 GB broadcast-build ceiling, so AQE decides at runtime —
    // it broadcasts when the filtered side's measured size collapses and
    // shuffle-joins otherwise (r3 advice, Joins.scala q28/q29).
    Q("q28_star_join",
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  ${sumDecSql("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-03-15'
         |  AND l_shipdate > TIMESTAMP '1998-03-15'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC NULLS LAST, l_orderkey ASC NULLS FIRST
         |LIMIT 10""".stripMargin) { (s, dir) =>
      val c = Tables.t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      val li = Tables.t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc_nulls_last,
          col("l_orderkey").asc_nulls_first)
        .limit(10)
    },

    // Q29 (beyond-survey) — snowflake flagship, TPC-H Q5 shape: a 6-way
    // join (region → nation → customer & supplier → orders → lineitem)
    // with the local-supplier condition (customer and supplier share a
    // nation), revenue per nation. Only the region→nation chain carries
    // an explicit broadcast hint — it is BOUNDED by the data model (25
    // nations, 5 regions, at every SF), which is the one case a hint is
    // honest. Customer and supplier GROW with SF (8 GB broadcast-build
    // ceiling at 100 TB — r3 advice), so they get no hint: AQE broadcasts
    // them at runtime iff their measured post-join size permits, else the
    // fact pipeline shuffle-joins on the key — the canonical star-schema
    // plan either way.
    Q("q29_snowflake_join",
      s"""SELECT n_name, count(*) AS n,
         |  ${sumDecSql("l_extendedprice * (1 - l_discount)")} AS revenue
         |FROM region
         |JOIN nation ON n_regionkey = r_regionkey
         |JOIN customer ON c_nationkey = n_nationkey
         |JOIN orders ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |  AND s_nationkey = n_nationkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name
         |ORDER BY n_name NULLS FIRST, n NULLS FIRST, revenue NULLS FIRST""".stripMargin) {
      (s, dir) =>
        val r = Tables.t(s, dir, "region").filter(col("r_name") === "ASIA")
        val n = Tables.t(s, dir, "nation")
        val c = Tables.t(s, dir, "customer")
        val o = Tables.t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val li = Tables.t(s, dir, "lineitem")
        val su = Tables.t(s, dir, "supplier")
        val dims = c
          .join(broadcast(n.join(broadcast(r),
            n("n_regionkey") === r("r_regionkey"))),
            c("c_nationkey") === n("n_nationkey"))
        orderAll(li
          .join(o, li("l_orderkey") === o("o_orderkey"))
          .join(dims, o("o_custkey") === c("c_custkey"))
          .join(su, li("l_suppkey") === su("s_suppkey") &&
            su("s_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n"),
            sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")))
              .as("revenue")))
    },

    // Q27 — interval/range join: equi key + time-range predicate (lineitem
    // shipped within 60 days of its order date).
    Q("q27_range_join",
      s"""SELECT o_orderpriority, count(*) AS n,
         |  ${sumDecSql("l_extendedprice")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  AND l_shipdate >= o_orderdate
         |  AND l_shipdate < o_orderdate + INTERVAL '60 days'
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
      val li = Tables.t(s, dir, "lineitem")
      val o = Tables.t(s, dir, "orders")
      orderAll(li.join(o,
          li("l_orderkey") === o("o_orderkey") &&
          li("l_shipdate") >= o("o_orderdate") &&
          li("l_shipdate") < o("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sumDec(col("l_extendedprice")).as("revenue")))
    },

    // Q27b (beyond-survey) — UNKEYED interval OVERLAP join
    // (Engine.intervalOverlapJoin): every (shipment window, order
    // window) pair that overlaps in time, with NO shared key to hash on
    // — the primitive q27's key-anchored range join cannot express and
    // the naive plan for which is a cartesian product. Bin bucketing
    // turns it into a plain equi-join on the bin id, and the
    // max(start)-bin allocation emits each pair exactly once with ZERO
    // dedup shuffle (both intervals provably cover that bin). The
    // oracle is the direct theta join — affordable at sf0.01, exactly
    // the plan the engine must never produce (PlanSpec asserts no
    // CartesianProduct and an equi SortMergeJoin/BHJ on the bin).
    // Slices keep the output pair count bounded; inclusive endpoints,
    // overlap_days ≥ 1 by construction.
    Q("q27b_interval_overlap",
      """WITH a AS (SELECT l_orderkey * 10 + l_linenumber AS a_id,
        |    date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
        |      AS a_start,
        |    date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
        |      + l_linenumber * 5 AS a_end
        |  FROM lineitem WHERE l_orderkey % 199 = 0),
        |b AS (SELECT o_orderkey AS b_id,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      AS b_start,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |      + 14 AS b_end
        |  FROM orders WHERE o_orderkey % 211 = 0)
        |SELECT a_id, b_id,
        |  CAST(least(a_end, b_end) - greatest(a_start, b_start) + 1
        |    AS BIGINT) AS overlap_days
        |FROM a JOIN b ON a_start <= b_end AND b_start <= a_end
        |ORDER BY a_id NULLS FIRST, b_id NULLS FIRST,
        |  overlap_days NULLS FIRST""".stripMargin) { (s, dir) =>
      val epoch = lit(java.sql.Date.valueOf("1970-01-01"))
      // the fixture carries no receipt date; the shipment window is
      // synthesized deterministically from the line number (5-35 days)
      val a = Tables.t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 199 === 0)
        .select((col("l_orderkey") * 10 + col("l_linenumber")).as("a_id"),
          datediff(col("l_shipdate").cast("date"), epoch).cast("long")
            .as("a_start"),
          (datediff(col("l_shipdate").cast("date"), epoch) +
            col("l_linenumber") * 5).cast("long").as("a_end"))
      val b = Tables.t(s, dir, "orders")
        .filter(col("o_orderkey") % 211 === 0)
        .select(col("o_orderkey").as("b_id"),
          datediff(col("o_orderdate").cast("date"), epoch).cast("long")
            .as("b_start"),
          (datediff(col("o_orderdate").cast("date"), epoch) + 14)
            .cast("long").as("b_end"))
      // auto bin width (the default): the approx-percentile pre-pass
      // picks ~the median interval length (here ~15-20 days), exercising
      // the auto path the 100 TB sizing rule now defaults to
      val pairs = graft.Engine.intervalOverlapJoin(a, b,
        "a_start", "a_end", "b_start", "b_end")
      orderAll(pairs.select(col("a_id"), col("b_id"),
        (least(col("a_end"), col("b_end")) -
          greatest(col("a_start"), col("b_start")) + 1).as("overlap_days")))
    })
}
