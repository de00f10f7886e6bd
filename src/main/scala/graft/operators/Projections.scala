package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Canon.orderAll

/** Projection / filter surface (SURVEY.md §2 Q10–Q15).
  *
  * Generalizes the reference's band selection (`sources/meteosat.py:177-185`)
  * and bbox clip (`utils/conversion.py:22-37` — a conjunctive range
  * predicate). All predicates/projections here are plain Catalyst
  * expressions, so they whole-stage-codegen and push down to the Parquet
  * scan (asserted in PlanSpec).
  */
object Projections {

  val all: Seq[Q] = Seq(

    // Q10 — projection + rename + row-local arithmetic (deterministic in
    // double: same IEEE ops in both engines, no reassociation).
    Q("q10_project",
      """SELECT l_orderkey, l_linenumber, l_quantity AS qty,
        |  l_extendedprice * (1 - l_discount) AS revenue,
        |  l_extendedprice * l_tax AS tax_amount
        |FROM lineitem
        |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST,
        |  qty NULLS FIRST, revenue NULLS FIRST, tax_amount NULLS FIRST
        |LIMIT 5000""".stripMargin) { (s, dir) =>
      orderAll(Tables.t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").as("qty"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        (col("l_extendedprice") * col("l_tax")).as("tax_amount"))).limit(5000)
    },

    // Q10b (beyond-survey) — contiguous GLOBAL row ids in doc_id order
    // ([[graft.Engine.globalIds]]): the dense example-index every packed
    // or exported training corpus needs. The oracle is the textbook
    // row_number() OVER (ORDER BY ...) — which is exactly what the
    // engine must NOT plan (an empty-frame global window executes as a
    // single partition holding the whole corpus). Instead: one range
    // shuffle + in-partition sort for the total order, then the
    // partition-offset attach (zipWithIndex — a P-scalar driver prefix
    // sum whose count job reuses the same shuffle files as the attach
    // job). PlanSpec asserts no SinglePartition exchange survives.
    Q("q10b_global_ids",
      """SELECT doc_id, source,
        |  CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT)
        |    AS global_id
        |FROM documents
        |ORDER BY doc_id NULLS FIRST, source NULLS FIRST,
        |  global_id NULLS FIRST""".stripMargin) { (s, dir) =>
      orderAll(graft.Engine.globalIds(
        Tables.t(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id"))
    },

    // Q11 — comparison + boolean predicate algebra.
    Q("q11_filter",
      """SELECT l_orderkey, l_linenumber
        |FROM lineitem
        |WHERE (l_quantity > 45 AND l_discount <= 0.02)
        |   OR (NOT (l_returnflag <> 'R') AND l_tax >= 0.07)
        |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST
        |LIMIT 5000""".stripMargin) { (s, dir) =>
      val li = Tables.t(s, dir, "lineitem")
      orderAll(li.filter(
          (col("l_quantity") > 45 && col("l_discount") <= 0.02) ||
          (!(col("l_returnflag") =!= "R") && col("l_tax") >= 0.07))
        .select("l_orderkey", "l_linenumber")).limit(5000)
    },

    // Q11b (beyond-survey) — single-scan DATA-QUALITY audit
    // ([[graft.Engine.constraintAudit]], the Deequ discipline): four
    // row-local constraints fused into ONE partial aggregate (auditing
    // N checks costs one corpus pass, not N) plus the exact
    // composite-key uniqueness count — the only check that cannot be
    // row-local; it pays the honest distinct shuffle (Expand +
    // two-phase agg; swap approx_count_distinct for a ±1% audit at
    // 100 TB). The fixture makes three checks non-trivial: ~24k
    // quantities over 30, ~27k discounts over 0.05, and ~14k duplicate
    // (l_orderkey, l_linenumber) pairs.
    // Q11d (beyond-survey) — COLUMN PROFILER
    // ([[graft.Engine.profileColumns]]): per-column rows / nulls /
    // exact distincts / min / max in long format — the data-quality
    // first look before a corpus enters the pipeline. One single-pass
    // aggregate PER COLUMN, unioned: under parquet column pruning each
    // job reads exactly its one column (same total IO as a one-pass
    // plan) while avoiding the Expand that N count-distincts in one
    // aggregate would plan (×N row multiplication before the shuffle).
    // min/max are computed typed and cast to string AFTER — casting
    // first would corrupt numeric order ("9" > "10").
    Q("q11d_column_profile",
      """SELECT 'o_custkey' AS "column", count(*) AS n_rows,
        |  count(*) - count(o_custkey) AS n_nulls,
        |  count(DISTINCT o_custkey) AS n_distinct,
        |  CAST(min(o_custkey) AS VARCHAR) AS min_value,
        |  CAST(max(o_custkey) AS VARCHAR) AS max_value
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderkey', count(*), count(*) - count(o_orderkey),
        |  count(DISTINCT o_orderkey), CAST(min(o_orderkey) AS VARCHAR),
        |  CAST(max(o_orderkey) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*),
        |  count(*) - count(o_orderpriority),
        |  count(DISTINCT o_orderpriority),
        |  CAST(min(o_orderpriority) AS VARCHAR),
        |  CAST(max(o_orderpriority) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
        |  count(DISTINCT o_orderstatus), CAST(min(o_orderstatus) AS VARCHAR),
        |  CAST(max(o_orderstatus) AS VARCHAR)
        |FROM orders
        |ORDER BY "column" NULLS FIRST, n_rows NULLS FIRST,
        |  n_nulls NULLS FIRST, n_distinct NULLS FIRST,
        |  min_value NULLS FIRST, max_value NULLS FIRST""".stripMargin) {
      (s, dir) =>
        orderAll(graft.Engine.profileColumns(Tables.t(s, dir, "orders"),
          Seq("o_custkey", "o_orderkey", "o_orderpriority",
            "o_orderstatus")))
    },

    // Q11e (beyond-survey) — BENFORD first-digit audit
    // ([[graft.Engine.benfordAudit]]): the cheap pipeline-corruption
    // tripwire — organic magnitudes follow P(d) = log10(1 + 1/d);
    // duplicated batches, fill-in defaults, or unit mix-ups bend the
    // digit histogram long before a mean drifts. The first SIGNIFICANT
    // digit is the first [1-9] character of the DECIMAL(38,9) rendering
    // (digit order agrees across engines for any magnitude ≥ 5e-10,
    // where an integer-cents rendering mis-digits sub-unit values); the
    // χ² folds over the FULL 1..9 domain, so an absent digit contributes
    // its whole expected count. The synthetic uniform prices rightly
    // FAIL Benford — the χ² of 5876 is the audit working, not the
    // fixture passing. One scan aggregates to ≤9 rows; the domain join
    // and totals windows run on that 9-row frame.
    Q("q11e_benford",
      """WITH d AS (SELECT CAST(NULLIF(regexp_extract(CAST(
        |      CAST(o_totalprice AS DECIMAL(38,9)) AS VARCHAR),
        |      '[1-9]'), '') AS INT) AS digit
        |  FROM orders WHERE o_totalprice > 0),
        |g0 AS (SELECT digit, count(*) AS n_obs FROM d
        |  WHERE digit IS NOT NULL GROUP BY 1),
        |g AS (SELECT dd.digit, coalesce(g0.n_obs, 0) AS n_obs
        |  FROM (SELECT unnest(generate_series(1, 9)) AS digit) dd
        |  LEFT JOIN g0 ON g0.digit = dd.digit),
        |w AS (SELECT *, CAST(sum(n_obs) OVER () AS BIGINT) AS n FROM g),
        |b AS (SELECT digit, n_obs, n,
        |    round(log10(CAST(digit + 1 AS DOUBLE)
        |      / CAST(digit AS DOUBLE)), 9) AS benford_share FROM w),
        |c AS (SELECT *, CAST(n AS DOUBLE) * benford_share AS ex FROM b),
        |t AS (SELECT *, CAST(round((CAST(n_obs AS DOUBLE) - ex)
        |      * (CAST(n_obs AS DOUBLE) - ex) / ex, 6)
        |    AS DECIMAL(38,6)) AS term FROM c)
        |SELECT digit, CAST(n_obs AS BIGINT) AS n_obs,
        |  round(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE), 6) AS share,
        |  benford_share, CAST(sum(term) OVER () AS DOUBLE) AS chi2
        |FROM t
        |ORDER BY digit NULLS FIRST, n_obs NULLS FIRST, share NULLS FIRST,
        |  benford_share NULLS FIRST, chi2 NULLS FIRST""".stripMargin) {
      (s, dir) =>
        orderAll(graft.Engine.benfordAudit(Tables.t(s, dir, "orders"),
          col("o_totalprice")))
    },

    Q("q11b_constraint_audit",
      """WITH a AS (SELECT count(*) AS n,
        |    sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS v1,
        |    sum(CASE WHEN l_quantity > 30 THEN 1 ELSE 0 END) AS v2,
        |    sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS v3,
        |    sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
        |        THEN 1 ELSE 0 END) AS v4,
        |    count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS v5
        |  FROM lineitem)
        |SELECT v.check_name,
        |  CAST(CASE v.k WHEN 1 THEN a.v1 WHEN 2 THEN a.v2 WHEN 3 THEN a.v3
        |    WHEN 4 THEN a.v4 ELSE a.v5 END AS BIGINT) AS n_violations,
        |  CAST(a.n AS BIGINT) AS n_rows
        |FROM a CROSS JOIN (VALUES
        |  ('key_not_null', 1), ('qty_le_30', 2), ('disc_le_005', 3),
        |  ('flag_in_domain', 4), ('unique_key', 5))
        |  AS v(check_name, k)
        |ORDER BY check_name NULLS FIRST, n_violations NULLS FIRST,
        |  n_rows NULLS FIRST""".stripMargin) { (s, dir) =>
      orderAll(graft.Engine.constraintAudit(
        Tables.t(s, dir, "lineitem"),
        Seq(
          "key_not_null" -> col("l_orderkey").isNull,
          "qty_le_30" -> (col("l_quantity") > 30),
          "disc_le_005" -> (col("l_discount") > 0.05),
          "flag_in_domain" -> !col("l_returnflag").isin("A", "N", "R")),
        uniqueKey = Seq("l_orderkey", "l_linenumber")))
    },

    // Q11c (beyond-survey) — KEY-SKEW AUDIT ([[graft.Engine.skewAudit]]):
    // the one-row per-key cardinality diagnostic a 100 TB shuffle-key
    // review starts from — heaviest key + share, skew factor (max/avg;
    // 1.0 = uniform), normalized Shannon entropy, and salt_hint =
    // ceil(skew factor), the fan-out that levels the heaviest key's
    // partition to the average (q20b saltedJoin's knob, measured
    // instead of guessed). One hash aggregate builds the per-key
    // counts — the very exchange the audited shuffle would do — then
    // two bounded folds; entropy terms round onto the 9-dp decimal
    // grid, max-count ties report the smallest key.
    Q("q11c_skew_audit",
      """WITH c AS (SELECT l_partkey AS k, count(*) AS cnt FROM lineitem
        |    WHERE l_partkey IS NOT NULL GROUP BY 1),
        |t AS (SELECT sum(cnt) AS n_rows, count(*) AS n_keys,
        |    max(cnt) AS max_cnt FROM c),
        |top AS (SELECT min(k) AS top_key FROM c, t WHERE cnt = max_cnt),
        |e AS (SELECT CAST(sum(CAST(round(
        |      -(CAST(cnt AS DOUBLE) / CAST(n_rows AS DOUBLE))
        |        * ln(CAST(cnt AS DOUBLE) / CAST(n_rows AS DOUBLE)), 9)
        |    AS DECIMAL(38,9))) AS DOUBLE) AS ent,
        |    max(n_keys) AS nk FROM c, t)
        |SELECT CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_keys AS BIGINT) AS n_keys,
        |  CAST(max_cnt AS BIGINT) AS max_cnt, top_key,
        |  round(CAST(max_cnt AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
        |    AS max_share,
        |  round(CAST(max_cnt AS DOUBLE) * CAST(n_keys AS DOUBLE)
        |    / CAST(n_rows AS DOUBLE), 6) AS skew_factor,
        |  CASE WHEN n_keys = 1 THEN 1.0
        |    ELSE round(ent / ln(CAST(n_keys AS DOUBLE)), 6) END
        |    AS entropy_norm,
        |  CAST(ceil(CAST(max_cnt AS DOUBLE) * CAST(n_keys AS DOUBLE)
        |    / CAST(n_rows AS DOUBLE)) AS INT) AS salt_hint
        |FROM t, top, e
        |ORDER BY n_rows NULLS FIRST, n_keys NULLS FIRST,
        |  max_cnt NULLS FIRST, top_key NULLS FIRST,
        |  max_share NULLS FIRST, skew_factor NULLS FIRST,
        |  entropy_norm NULLS FIRST, salt_hint NULLS FIRST""".stripMargin) {
      (s, dir) =>
        orderAll(graft.Engine.skewAudit(
          Tables.t(s, dir, "lineitem"), col("l_partkey")))
    },

    // Q11f (beyond-survey) — FUNCTIONAL-DEPENDENCY audit
    // ([[graft.Engine.fdAudit]]): for each candidate FD lhs → rhs, does
    // every lhs value determine ONE rhs value, and when not, how badly
    // (violating keys, worst fan-out)? The data-contract check run
    // before a column is trusted as a join key, a dimension attribute,
    // or a dedup identity — q11b audits row predicates, this audits
    // RELATIONSHIPS between columns. Plan per candidate: distinct
    // (lhs, rhs) pairs (partial-aggregable; the exchange carries the
    // pair DOMAIN, not the rows), per-lhs fan-out, scalar rollup;
    // candidates union under one action. The fixture's three verdicts
    // are real: event_id→user_id holds (event ids are unique),
    // user_id→event_type and its reverse are broken with measured
    // fan-outs.
    Q("q11f_fd_audit", {
      def one(name: String, l: String, r: String) =
        s"""SELECT '$name' AS fd, CAST(count(*) AS BIGINT) AS lhs_keys,
           |  CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS violating_keys,
           |  round(CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END)
           |      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
           |    AS violation_share,
           |  CAST(max(d) AS BIGINT) AS max_rhs,
           |  (sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) = 0) AS holds
           |FROM (SELECT __l, count(*) AS d FROM (
           |    SELECT DISTINCT $l AS __l, $r AS __r FROM events
           |    WHERE $l IS NOT NULL) GROUP BY 1)""".stripMargin
      s"""SELECT * FROM (
         |${one("event_id->user_id", "event_id", "user_id")}
         |UNION ALL
         |${one("user_id->event_type", "user_id", "event_type")}
         |UNION ALL
         |${one("event_type->user_id", "event_type", "user_id")})
         |ORDER BY fd NULLS FIRST, lhs_keys NULLS FIRST,
         |  violating_keys NULLS FIRST, violation_share NULLS FIRST,
         |  max_rhs NULLS FIRST, holds NULLS FIRST""".stripMargin
    }) { (s, dir) =>
      orderAll(graft.Engine.fdAudit(Tables.t(s, dir, "events"), Seq(
        ("event_id->user_id", col("event_id"), col("user_id")),
        ("user_id->event_type", col("user_id"), col("event_type")),
        ("event_type->user_id", col("event_type"), col("user_id")))))
    },

    // Q12 — BETWEEN range predicate (the bbox-clip analog, meteosat.py:36).
    Q("q12_between",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                     AND TIMESTAMP '1996-12-31 23:59:59'
        |  AND l_quantity BETWEEN 10 AND 20
        |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST,
        |  l_quantity NULLS FIRST, l_shipdate NULLS FIRST
        |LIMIT 5000""".stripMargin) { (s, dir) =>
      orderAll(Tables.t(s, dir, "lineitem")
        .filter(col("l_shipdate").between(
          lit("1996-01-01 00:00:00").cast("timestamp"),
          lit("1996-12-31 23:59:59").cast("timestamp")))
        .filter(col("l_quantity").between(10, 20))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"))
        .limit(5000)
    },

    // Q13 — IN list + IS [NOT] NULL.
    Q("q13_in_null",
      """SELECT o_orderkey, o_orderpriority,
        |  (o_custkey IS NULL) AS cust_missing
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND o_totalprice IS NOT NULL
        |ORDER BY o_orderkey NULLS FIRST, o_orderpriority NULLS FIRST,
        |  cust_missing NULLS FIRST
        |LIMIT 5000""".stripMargin) { (s, dir) =>
      orderAll(Tables.t(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_totalprice").isNotNull)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_custkey").isNull.as("cust_missing"))).limit(5000)
    },

    // Q11g (beyond-survey) — per-column STATISTICS-DRIFT audit between
    // two table versions ([[graft.Engine.columnStatsDrift]]): q58b's
    // row diff says WHICH rows changed; this says whether any COLUMN's
    // shape moved (rows, null rate, distinct cardinality) — the
    // data-contract check that catches a silent upstream re-tag, a
    // null-flood, or an enum collapse before a model trains on it.
    // Versions are the q58b SnapshotFixture pair, and the audit FIRES
    // for real: the new snapshot's %5=0 lang re-tag adds an enum value
    // (distinct 5 -> 6, ratio 1.2, outside the [0.87, 1.15] band sized
    // for low-cardinality enums) while row-level churn leaves every
    // other column inside it (id/text ~1.002, n_chars ~0.993). Each version is ONE pass with a
    // constant |columns| fan-out; the distinct pre-aggregate keys on
    // md5(value) so the exchange carries 16-byte digests, never the
    // text domain (the q90f digest discipline). Ratios divide exact
    // longs — identical IEEE bits, emitted unrounded.
    Q("q11g_stats_drift",
      """WITH od AS (SELECT * FROM documents WHERE doc_id % 11 <> 3),
        |nd AS (SELECT doc_id, text, source, n_chars,
        |    CASE WHEN doc_id % 5 = 0 THEN 'xx' ELSE lang END AS lang
        |  FROM documents WHERE doc_id % 11 <> 7),
        |op AS (SELECT 'doc_id' AS c, CAST(doc_id AS VARCHAR) AS v
        |    FROM od
        |  UNION ALL SELECT 'text', text FROM od
        |  UNION ALL SELECT 'lang', lang FROM od
        |  UNION ALL SELECT 'source', source FROM od
        |  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM od),
        |np AS (SELECT 'doc_id' AS c, CAST(doc_id AS VARCHAR) AS v
        |    FROM nd
        |  UNION ALL SELECT 'text', text FROM nd
        |  UNION ALL SELECT 'lang', lang FROM nd
        |  UNION ALL SELECT 'source', source FROM nd
        |  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM nd),
        |os AS (SELECT c, count(*) AS n_old, count(v) AS nn_old,
        |    count(DISTINCT md5(v)) AS distinct_old FROM op GROUP BY 1),
        |ns AS (SELECT c, count(*) AS n_new, count(v) AS nn_new,
        |    count(DISTINCT md5(v)) AS distinct_new FROM np GROUP BY 1),
        |j AS (SELECT os.c AS column_name, n_old, n_new,
        |    CAST(n_old - nn_old AS DOUBLE) / n_old AS null_rate_old,
        |    CAST(n_new - nn_new AS DOUBLE) / n_new AS null_rate_new,
        |    distinct_old, distinct_new,
        |    CAST(distinct_new AS DOUBLE) / distinct_old
        |      AS distinct_ratio
        |  FROM os JOIN ns ON os.c = ns.c)
        |SELECT column_name, n_old, n_new, null_rate_old, null_rate_new,
        |  distinct_old, distinct_new, distinct_ratio,
        |  (distinct_ratio < 0.87 OR distinct_ratio > 1.15
        |    OR abs(null_rate_new - null_rate_old) > 0.01) AS drift
        |FROM j
        |ORDER BY column_name NULLS FIRST, n_old NULLS FIRST,
        |  n_new NULLS FIRST, null_rate_old NULLS FIRST,
        |  null_rate_new NULLS FIRST, distinct_old NULLS FIRST,
        |  distinct_new NULLS FIRST, distinct_ratio NULLS FIRST,
        |  drift NULLS FIRST""".stripMargin) { (s, dir) =>
      val docs = Tables.t(s, dir, "documents")
      orderAll(graft.Engine.columnStatsDrift(
        graft.SnapshotFixture.oldSnapshot(docs),
        graft.SnapshotFixture.newSnapshot(docs),
        Seq("doc_id", "text", "lang", "source", "n_chars"),
        ratioLo = 0.87, ratioHi = 1.15))
    },

    // Q14 — LIKE and regex predicates (rlike == unanchored search, same as
    // DuckDB regexp_matches).
    Q("q14_like",
      """SELECT p_partkey, p_name, p_type
        |FROM part
        |WHERE p_type LIKE '%ECO%' OR regexp_matches(p_name, '^(red|blue) ')
        |ORDER BY p_partkey NULLS FIRST, p_name NULLS FIRST, p_type NULLS FIRST
        |LIMIT 5000""".stripMargin) { (s, dir) =>
      orderAll(Tables.t(s, dir, "part")
        .filter(col("p_type").like("%ECO%") ||
          col("p_name").rlike("^(red|blue) "))
        .select("p_partkey", "p_name", "p_type")).limit(5000)
    },

    // Q15 — conditional projection (CASE WHEN) feeding an aggregate.
    Q("q15_case_when",
      """SELECT CASE WHEN l_quantity >= 40 THEN 'high'
        |            WHEN l_quantity >= 20 THEN 'mid'
        |            ELSE 'low' END AS qty_class,
        |  CASE WHEN l_returnflag = 'R' THEN 'returned' ELSE 'kept' END AS flag_class,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY 1, 2
        |ORDER BY qty_class NULLS FIRST, flag_class NULLS FIRST, n NULLS FIRST""".stripMargin) {
      (s, dir) =>
        orderAll(Tables.t(s, dir, "lineitem")
          .select(
            when(col("l_quantity") >= 40, "high")
              .when(col("l_quantity") >= 20, "mid")
              .otherwise("low").as("qty_class"),
            when(col("l_returnflag") === "R", "returned")
              .otherwise("kept").as("flag_class"))
          .groupBy("qty_class", "flag_class")
          .agg(count(lit(1)).as("n")))
    })
}
