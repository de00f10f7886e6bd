package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.{Q, Tables}
import graft.Canon.orderAll

/** Window-function surface (SURVEY.md §2 Q40–Q44).
  *
  * Slot-gap detection (Q41) is the reference's cursor-advance check
  * (`sources/meteosat.py:88-93`) expressed as lag over the event stream.
  * Running/range frames use DECIMAL accumulation — window prefix sums over
  * doubles are evaluation-order-dependent across engines (segment-tree vs
  * incremental), decimals are exact either way.
  */
object Windows {

  val all: Seq[Q] = Seq(

    // Q40 — ranking family. rank/dense_rank/percent_rank run over a
    // coarse bucket (real ties, deterministic outputs); row_number/ntile
    // need a total order so they run over (price desc, key).
    Q("q40_ranking",
      """SELECT o_orderkey, o_orderpriority, bucket,
        |  rank() OVER wt AS rk, dense_rank() OVER wt AS drk,
        |  percent_rank() OVER wt AS prk,
        |  row_number() OVER wu AS rn, ntile(4) OVER wu AS nt
        |FROM (SELECT *, CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket
        |      FROM orders)
        |WINDOW
        |  wt AS (PARTITION BY o_orderpriority ORDER BY bucket ASC NULLS LAST),
        |  wu AS (PARTITION BY o_orderpriority
        |         ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS LAST)
        |ORDER BY o_orderkey NULLS FIRST, o_orderpriority NULLS FIRST,
        |  bucket NULLS FIRST, rk NULLS FIRST, drk NULLS FIRST, prk NULLS FIRST,
        |  rn NULLS FIRST, nt NULLS FIRST
        |LIMIT 5000""".stripMargin) { (s, dir) =>
      val o = Tables.t(s, dir, "orders")
        .withColumn("bucket", floor(col("o_totalprice") / 50000).cast("long"))
      val wt = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("bucket").asc_nulls_last)
      val wu = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc_nulls_last,
          col("o_orderkey").asc_nulls_last)
      orderAll(o.select(
        col("o_orderkey"), col("o_orderpriority"), col("bucket"),
        rank().over(wt).as("rk"), dense_rank().over(wt).as("drk"),
        percent_rank().over(wt).as("prk"),
        row_number().over(wu).as("rn"), ntile(4).over(wu).as("nt")))
        .limit(5000)
    },

    // Q41 — lag/lead: inter-event gap per user (slot-gap detection analog).
    Q("q41_lag_lead",
      """SELECT event_id, user_id, ts,
        |  lag(ts) OVER w AS prev_ts, lead(ts) OVER w AS next_ts,
        |  CAST(floor(epoch(ts)) AS BIGINT)
        |    - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) AS gap_s,
        |  lag(event_id, 1, -1) OVER w AS prev_id
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |             ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST)
        |ORDER BY event_id NULLS FIRST, user_id NULLS FIRST, ts NULLS FIRST,
        |  prev_ts NULLS FIRST, next_ts NULLS FIRST, gap_s NULLS FIRST,
        |  prev_id NULLS FIRST
        |LIMIT 5000""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc_nulls_last, col("event_id").asc_nulls_last)
      orderAll(Tables.t(s, dir, "events").select(
        col("event_id"), col("user_id"), col("ts"),
        lag(col("ts"), 1).over(w).as("prev_ts"),
        lead(col("ts"), 1).over(w).as("next_ts"),
        (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
          .as("gap_s"),
        lag(col("event_id"), 1, -1).over(w).as("prev_id"))).limit(5000)
    },

    // Q42 — running aggregate, row frame (exact decimal accumulation).
    Q("q42_running_agg",
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS run_sum,
        |  count(*) OVER w AS run_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |             ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id NULLS FIRST, user_id NULLS FIRST,
        |  run_sum NULLS FIRST, run_n NULLS FIRST
        |LIMIT 5000""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc_nulls_last, col("event_id").asc_nulls_last)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orderAll(Tables.t(s, dir, "events").select(
        col("event_id"), col("user_id"),
        sum(col("value").cast(DecimalType(38, 6))).over(w).cast("double")
          .as("run_sum"),
        count(lit(1)).over(w).as("run_n"))).limit(5000)
    },

    // Q43 — range frame: trailing 1-hour window per user, keyed on epoch
    // seconds (floored identically on both sides).
    Q("q43_range_frame",
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_1h,
        |  CAST(sum(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |             ORDER BY CAST(floor(epoch(ts)) AS BIGINT) ASC
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id NULLS FIRST, user_id NULLS FIRST, n_1h NULLS FIRST,
        |  sum_1h NULLS FIRST
        |LIMIT 5000""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_timestamp(col("ts")))
        .rangeBetween(-3600L, Window.currentRow)
      orderAll(Tables.t(s, dir, "events").select(
        col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("value").cast(DecimalType(38, 6))).over(w).cast("double")
          .as("sum_1h"))).limit(5000)
    },

    // Q44 — top-k per group via row_number (the scalable top-k shape: the
    // window runs partition-local after one shuffle on the group key).
    Q("q44_topk_per_group",
      """SELECT event_type, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value DESC NULLS LAST, event_id ASC NULLS LAST) AS rn
        |  FROM events)
        |WHERE rn <= 5
        |ORDER BY event_type NULLS FIRST, event_id NULLS FIRST, value NULLS FIRST""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("value").desc_nulls_last, col("event_id").asc_nulls_last)
        orderAll(Tables.t(s, dir, "events")
          .select(col("event_type"), col("event_id"), col("value"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 5)
          .drop("rn"))
    },

    // Q45 (beyond-survey) — value-navigation window functions over a full
    // frame: first/last/nth need ROWS BETWEEN UNBOUNDED PRECEDING AND
    // UNBOUNDED FOLLOWING plus a UNIQUE ordering, or the "last" value is
    // whatever row the engine saw most recently. cume_dist is k/n over
    // the unique order — the same exact division in both engines.
    Q("q45_window_values",
      """SELECT o_orderkey, o_orderpriority,
        |  first_value(o_orderkey) OVER wf AS first_k,
        |  last_value(o_orderkey) OVER wf AS last_k,
        |  nth_value(o_orderkey, 2) OVER wf AS second_k,
        |  cume_dist() OVER wo AS cd
        |FROM orders
        |WINDOW
        |  wf AS (PARTITION BY o_orderpriority
        |         ORDER BY o_totalprice ASC NULLS LAST, o_orderkey ASC NULLS LAST
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
        |  wo AS (PARTITION BY o_orderpriority
        |         ORDER BY o_totalprice ASC NULLS LAST, o_orderkey ASC NULLS LAST)
        |ORDER BY o_orderkey NULLS FIRST, o_orderpriority NULLS FIRST,
        |  first_k NULLS FIRST, last_k NULLS FIRST, second_k NULLS FIRST,
        |  cd NULLS FIRST
        |LIMIT 5000""".stripMargin) { (s, dir) =>
      val ord = Seq(col("o_totalprice").asc_nulls_last,
        col("o_orderkey").asc_nulls_last)
      val wf = Window.partitionBy(col("o_orderpriority")).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wo = Window.partitionBy(col("o_orderpriority")).orderBy(ord: _*)
      orderAll(Tables.t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          first(col("o_orderkey")).over(wf).as("first_k"),
          last(col("o_orderkey")).over(wf).as("last_k"),
          nth_value(col("o_orderkey"), 2).over(wf).as("second_k"),
          cume_dist().over(wo).as("cd"))).limit(5000)
    },

    // Q47 (beyond-survey) — batch SESSIONIZATION: per-user sessions cut
    // at >30-min inactivity gaps, the classic lag+cumsum assignment (and
    // the batch mirror of q72's streaming session_window, so the two
    // formulations cross-check each other). Everything is one shuffle on
    // user_id: lag, the running session index, and the per-session
    // aggregate all share that partitioning — Catalyst plans a single
    // Exchange, which is the 100 TB shape (sessionization must never
    // shuffle more than once).
    Q("q47_sessionize",
      """WITH g AS (SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM g)
        |SELECT user_id, CAST(session_idx AS INT) AS session_idx,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(count(*) AS INT) AS n_events
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id NULLS FIRST, session_idx NULLS FIRST,
        |  session_start NULLS FIRST, session_end NULLS FIRST,
        |  n_events NULLS FIRST""".stripMargin) { (s, dir) =>
      orderAll(graft.Engine.sessionize(Tables.t(s, dir, "events"),
          col("user_id"), col("ts"), col("event_id"), gapSeconds = 30 * 60)
        .withColumnRenamed("key", "user_id"))
    },

    // Q47h (beyond-survey) — RFM FEATURE EXTRACTION with global
    // quintile scores and NO single-partition window
    // ([[graft.Engine.rfmFeatures]]): per user, recency (days since
    // last event at 2024-02-01) / frequency / exact-decimal purchase
    // spend, each scored 1..5 against the corpus-wide 20/40/60/80
    // exact percentiles (recency inverted: recent = 5). The feature-
    // store batch job behind ranking/churn training data. The textbook
    // `ntile(5) OVER (ORDER BY …)` collapses the user table to ONE
    // partition (the q10b trap); this is the at-scale replacement:
    // one keyed aggregate, a 1-row percentile reduce
    // (percentile ≡ quantile_cont — the q38 parity), one broadcast
    // score map. Cuts round to the 6-dp grid before comparison.
    Q("q47h_rfm_features",
      """WITH pu AS (SELECT user_id,
        |    CAST(date_diff('day', CAST(max(ts) AS DATE),
        |      DATE '2024-02-01') AS BIGINT) AS recency_days,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(coalesce(sum(CAST(CASE WHEN event_type = 'purchase'
        |        THEN value END AS DECIMAL(38,6))), 0) AS DOUBLE)
        |      AS monetary
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1),
        |cuts AS (SELECT
        |    list_transform(quantile_cont(recency_days,
        |      [0.2, 0.4, 0.6, 0.8]), x -> round(x, 6)) AS cr,
        |    list_transform(quantile_cont(frequency,
        |      [0.2, 0.4, 0.6, 0.8]), x -> round(x, 6)) AS cf,
        |    list_transform(quantile_cont(monetary,
        |      [0.2, 0.4, 0.6, 0.8]), x -> round(x, 6)) AS cm
        |  FROM pu)
        |SELECT user_id, recency_days, frequency,
        |  round(monetary, 6) AS monetary,
        |  CAST(6 - (1 + len(list_filter(cr, c -> recency_days > c)))
        |    AS BIGINT) AS r_score,
        |  CAST(1 + len(list_filter(cf, c -> frequency > c))
        |    AS BIGINT) AS f_score,
        |  CAST(1 + len(list_filter(cm, c -> monetary > c))
        |    AS BIGINT) AS m_score
        |FROM pu, cuts
        |ORDER BY user_id NULLS FIRST, recency_days NULLS FIRST,
        |  frequency NULLS FIRST, monetary NULLS FIRST,
        |  r_score NULLS FIRST, f_score NULLS FIRST,
        |  m_score NULLS FIRST""".stripMargin) { (s, dir) =>
      orderAll(graft.Engine.rfmFeatures(Tables.t(s, dir, "events"),
        col("user_id"), col("ts"), col("value"),
        col("event_type") === "purchase",
        lit("2024-02-01").cast("date")))
    },

    // Q47i (beyond-survey) — inter-event GAP-REGULARITY audit
    // ([[graft.Engine.gapRegularity]]): per-user gap count, mean gap,
    // and coefficient of variation over inter-arrival times, with the
    // `automated` flag (cv < 0.2 over ≥ 20 gaps) — the standard bot /
    // scripted-client screen over an activity stream (timers fire at
    // cv ≈ 0; organic traffic is near-Poisson, cv ≈ 1). One exchange:
    // the lag window partitions on user_id and the per-user aggregate
    // reuses that partitioning — never the consecutive-event self-join.
    // Gaps are exact integer microseconds; Σ and Σ² ride DECIMAL(38,0)
    // (a month-long gap squares past a signed long; decimal addition
    // is order-free), and mean/var/cv divide in double with one pinned
    // op order, so both engines land identical IEEE bits.
    Q("q47i_gap_regularity",
      """WITH g AS (SELECT user_id,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY epoch_us(ts) ASC, event_id ASC)),
        |pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |    sum(CAST(gap AS DECIMAL(38,0))) AS s,
        |    sum(CAST(CAST(gap AS DECIMAL(38,0)) * CAST(gap AS
        |      DECIMAL(38,0)) AS DECIMAL(38,0))) AS s2
        |  FROM g WHERE gap IS NOT NULL GROUP BY 1),
        |m AS (SELECT user_id, n_gaps,
        |    CAST(s AS DOUBLE) / n_gaps AS mean_us,
        |    CAST((2 * CAST(s AS HUGEINT) + n_gaps)
        |      // (2 * CAST(n_gaps AS HUGEINT)) AS BIGINT) AS mean_us_i,
        |    sqrt(greatest(CAST(s2 AS DOUBLE) / n_gaps
        |      - (CAST(s AS DOUBLE) / n_gaps) * (CAST(s AS DOUBLE)
        |        / n_gaps), 0.0)) AS sd_us
        |  FROM pu)
        |SELECT user_id, n_gaps,
        |  CAST(mean_us_i AS DOUBLE) / 1000000.0 AS mean_gap_s,
        |  round(CASE WHEN mean_us > 0 THEN sd_us / mean_us END, 6) AS cv,
        |  (coalesce(CASE WHEN mean_us > 0 THEN sd_us / mean_us END < 0.2,
        |    false) AND n_gaps >= 20) AS automated
        |FROM m
        |ORDER BY user_id NULLS FIRST, n_gaps NULLS FIRST,
        |  mean_gap_s NULLS FIRST, cv NULLS FIRST,
        |  automated NULLS FIRST""".stripMargin) { (s, dir) =>
      orderAll(graft.Engine.gapRegularity(Tables.t(s, dir, "events"),
        col("user_id"), col("ts"), col("event_id")))
    },

    // Q47j (beyond-survey) — top-k SEQUENTIAL event patterns
    // ([[graft.Engine.eventTrigrams]]): the most frequent length-3
    // event-type sequences over per-user ordered streams, with corpus
    // support — funnel DISCOVERY (q47b measures a funnel you name;
    // this surfaces the paths users actually take) and the
    // sequence-shaped complement to q47i's timing-based bot signal
    // (a scripted loop is one dominant trigram). Order-2 context on
    // top of q47d's order-1 Markov matrix. ONE exchange: two lags
    // inside the user window build trigrams row-locally; the count
    // groupBy partial-aggregates into the |types|³-bounded domain;
    // top-k is a TakeOrdered; support divides exact longs against the
    // 1-row total broadcast (identical IEEE bits, unrounded).
    Q("q47j_event_trigrams",
      """WITH o AS (SELECT user_id, ts, event_id, event_type AS e3,
        |    lag(event_type, 2) OVER w AS e1,
        |    lag(event_type, 1) OVER w AS e2
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts ASC, event_id ASC)),
        |t AS (SELECT e1, e2, e3, count(*) AS n FROM o
        |  WHERE e1 IS NOT NULL GROUP BY 1, 2, 3),
        |tot AS (SELECT sum(n) AS tot FROM t)
        |SELECT e1, e2, e3, CAST(n AS BIGINT) AS n,
        |  CAST(n AS DOUBLE) / tot AS support
        |FROM t CROSS JOIN tot
        |ORDER BY n DESC NULLS LAST, e1 ASC NULLS FIRST,
        |  e2 ASC NULLS FIRST, e3 ASC NULLS FIRST
        |LIMIT 20""".stripMargin) { (s, dir) =>
      // NULLS FIRST spelled on e1/e2/e3 (r14, ADVICE): DuckDB defaults
      // nulls-last while the Spark side ranks asc (nulls-first) — a
      // null event_type reaching the top-k would split the engines on
      // the tie order (latent: the fixture has no null event_type, but
      // eventTrigrams never filters it). n (a count, never null) spells
      // DESC NULLS LAST since r15 — both engines' desc default, made
      // explicit so OracleLintSpec can hold the rule uniformly.
      graft.Engine.eventTrigrams(Tables.t(s, dir, "events"),
        col("user_id"), col("ts"), col("event_id"), col("event_type"))
    },

    // Q47b (beyond-survey) — ordered event FUNNEL: the furthest
    // signup → click → purchase stage each user reached, with every
    // step STRICTLY after the previous one (not mere type presence —
    // a purchase before any click does not count). Formulation: three
    // chained running-mins over ONE (user_id, ts, event_id) window —
    // earliest signup so far, then earliest *qualifying* click so far,
    // then a qualifying purchase — so the whole funnel is a single
    // exchange + one sort, and the final per-user groupBy reuses that
    // partitioning (no second shuffle; the cascade never joins the
    // events table against itself, which is the naive O(stages) self-
    // join formulation that dies at 100 TB). The stage fold is
    // coalesce(3,2,1,0) — each stage implies the previous, and
    // coalesce (unlike greatest) has identical NULL semantics in both
    // engines.
    Q("q47b_funnel",
      """WITH b AS (SELECT user_id, event_id, ts, event_type,
        |    min(CASE WHEN event_type = 'signup' THEN ts END) OVER w AS s1
        |  FROM events WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)),
        |c AS (SELECT *, CASE WHEN event_type = 'click' AND s1 < ts
        |    THEN ts END AS c_ok FROM b),
        |d AS (SELECT *, min(c_ok) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS s2 FROM c),
        |e AS (SELECT *, CASE WHEN event_type = 'purchase' AND s2 < ts
        |    THEN ts END AS p_ok FROM d)
        |SELECT user_id, CAST(coalesce(
        |    max(CASE WHEN p_ok IS NOT NULL THEN 3 END),
        |    max(CASE WHEN c_ok IS NOT NULL THEN 2 END),
        |    max(CASE WHEN s1 IS NOT NULL THEN 1 END), 0) AS INT) AS stage
        |FROM e GROUP BY user_id
        |ORDER BY user_id NULLS FIRST, stage NULLS FIRST""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val staged = Tables.t(s, dir, "events")
          .withColumn("s1",
            min(when(col("event_type") === "signup", col("ts"))).over(w))
          .withColumn("c_ok",
            when(col("event_type") === "click" && col("s1") < col("ts"),
              col("ts")))
          .withColumn("s2", min(col("c_ok")).over(w))
          .withColumn("p_ok",
            when(col("event_type") === "purchase" && col("s2") < col("ts"),
              col("ts")))
        orderAll(staged.groupBy(col("user_id"))
          .agg(coalesce(
            max(when(col("p_ok").isNotNull, 3)),
            max(when(col("c_ok").isNotNull, 2)),
            max(when(col("s1").isNotNull, 1)),
            lit(0)).cast("int").as("stage")))
    },

    // Q47d (beyond-survey) — event-type MARKOV TRANSITIONS: the
    // (prev → next) transition counts and conditional probabilities
    // over each user's time-ordered event stream — the behavioral
    // bigram model (and the events-table mirror of q93g's token
    // pairs). One lead() window per user (single hash exchange), a
    // partial-aggregated pair count, and the row-conditional
    // probability from a |types|²-row window — the probability
    // division is exact-integer-to-IEEE, so both engines agree
    // bit-for-bit without rounding.
    Q("q47d_markov",
      """WITH p AS (SELECT user_id, event_type, lead(event_type) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |c AS (SELECT event_type AS prev_type, next_type,
        |    count(*) AS cnt
        |  FROM p WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, CAST(cnt AS INT) AS cnt,
        |  CAST(cnt AS DOUBLE) /
        |    CAST(sum(cnt) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
        |FROM c
        |ORDER BY prev_type NULLS FIRST, next_type NULLS FIRST,
        |  cnt NULLS FIRST, p NULLS FIRST""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val counts = Tables.t(s, dir, "events")
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("prev_type"), col("next_type"))
        .agg(count(lit(1)).as("cnt"))
      val tot = Window.partitionBy(col("prev_type"))
      orderAll(counts.select(col("prev_type"), col("next_type"),
        col("cnt").cast("int").as("cnt"),
        (col("cnt").cast("double") / sum(col("cnt")).over(tot)
          .cast("double")).as("p")))
    },

    // Q47c (beyond-survey) — weekly COHORT RETENTION: users grouped by
    // the week of their first event (the cohort), counted as retained in
    // each later week they reappear — the canonical product-analytics
    // triangle. Plan: the cohort stamp is an unordered min-over-user
    // window (one hash exchange on user_id, no sort frame), the
    // (cohort, offset, user) distinct is the second — and last —
    // exchange, and the final count partial-aggregates on top of it.
    // Week arithmetic stays in integers (date_trunc to Monday on both
    // stamps, day-diff div 7), so there is no FP anywhere and both
    // engines agree exactly. Never a self-join of events against its
    // own first-seen table — the window form co-locates both passes.
    Q("q47c_retention",
      """WITH c AS (SELECT user_id, ts,
        |    date_trunc('week', min(ts) OVER (PARTITION BY user_id))
        |      AS cohort
        |  FROM events),
        |o AS (SELECT DISTINCT CAST(cohort AS DATE) AS cohort_week,
        |    CAST(date_diff('day', cohort, date_trunc('week', ts)) // 7
        |      AS INT) AS week_offset, user_id
        |  FROM c)
        |SELECT cohort_week, week_offset, CAST(count(*) AS INT) AS n_users
        |FROM o GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week NULLS FIRST, week_offset NULLS FIRST,
        |  n_users NULLS FIRST""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
      orderAll(Tables.t(s, dir, "events")
        .withColumn("cohort", date_trunc("week", min(col("ts")).over(w)))
        .select(col("cohort").cast("date").as("cohort_week"),
          expr("CAST(datediff(date_trunc('week', ts), cohort) div 7 AS INT)")
            .as("week_offset"),
          col("user_id"))
        .distinct()
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(count(lit(1)).cast("int").as("n_users")))
    },

    // Q49 (beyond-survey) — RUNNING DISTINCT COUNT over a window: per
    // customer, how many distinct order priorities have been seen up to
    // each order. Spark (like most engines) rejects count(DISTINCT) in
    // a window frame; the standard loss-free rewrite is first-occurrence
    // flags (row_number over (key, value) = 1) summed by a running
    // frame over the key. Both engines run the SAME rewrite, so parity
    // checks the formulation end to end. Cost is two hash exchanges —
    // (key, value) then (key) — each a plain partitioned window; there
    // is no single-exchange form of this operator without carrying a
    // per-row distinct set in the frame (which is exactly what engines
    // refuse to do).
    Q("q49_window_distinct",
      """WITH f AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |    CASE WHEN row_number() OVER (
        |      PARTITION BY o_custkey, o_orderpriority
        |      ORDER BY o_orderdate, o_orderkey) = 1
        |    THEN 1 ELSE 0 END AS first_seen
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(sum(first_seen) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
        |    AS n_priorities
        |FROM f
        |ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST,
        |  o_orderdate NULLS FIRST, n_priorities NULLS FIRST""".stripMargin) {
      (s, dir) =>
        val wFirst = Window
          .partitionBy(col("o_custkey"), col("o_orderpriority"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val wRun = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        orderAll(Tables.t(s, dir, "orders")
          .withColumn("first_seen",
            when(row_number().over(wFirst) === 1, 1).otherwise(0))
          .withColumn("n_priorities",
            sum(col("first_seen")).over(wRun).cast("int"))
          .select("o_custkey", "o_orderkey", "o_orderdate", "n_priorities"))
    },

    // Q48 (beyond-survey) — slot GAP-FILL with linear interpolation: the
    // reference's fixed 15-min cadence (meteosat.py:88-93) produces gaps
    // when a slot has no product (its stall path); downstream consumers
    // want a dense series. Spine = generated slot sequence × event types
    // (the q26b spine, bounded: (range/15min)×|types| rows); per-slot
    // means come from ONE decimal-exact aggregate; interpolation brackets
    // each empty slot via last/first(ignoreNulls) windows over the spine
    // — work is O(spine), never O(spine × events), and the interpolation
    // arithmetic is an identical IEEE operation tree in both engines so
    // the doubles hash-match exactly.
    Q("q48_gap_fill",
      s"""WITH b AS (SELECT
         |    make_timestamp(CAST(floor(epoch(min(ts)) / 900) * 900 AS BIGINT) * 1000000) AS lo,
         |    make_timestamp(CAST(floor(epoch(max(ts)) / 900) * 900 AS BIGINT) * 1000000) AS hi
         |  -- bounds over the SAME filtered series the operator fills:
         |  -- gapFill's contract takes its range from its input, and an
         |  -- unfiltered-bounds oracle silently agrees at dense SFs while
         |  -- diverging on sparse data (caught at sf0.001)
         |  FROM events WHERE event_type IN ('click', 'view')),
         |spine AS (SELECT t.wstart, et.event_type FROM
         |    (SELECT unnest(generate_series(lo, hi, INTERVAL '15 minutes'))
         |       AS wstart FROM b) t
         |    CROSS JOIN (SELECT DISTINCT event_type FROM events
         |                WHERE event_type IN ('click', 'view')) et),
         |agg AS (SELECT ${"make_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) * 1000000)"} AS wstart,
         |    event_type, ${graft.Canon.avgDecSql("value")} AS v
         |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2),
         |j AS (SELECT s.wstart, s.event_type, a.v FROM spine s
         |  LEFT JOIN agg a ON s.wstart = a.wstart AND s.event_type = a.event_type),
         |br AS (SELECT wstart, event_type, v,
         |    last_value(v IGNORE NULLS) OVER wp AS pv,
         |    last_value(CASE WHEN v IS NOT NULL THEN wstart END IGNORE NULLS)
         |      OVER wp AS pt,
         |    first_value(v IGNORE NULLS) OVER wn AS nv,
         |    first_value(CASE WHEN v IS NOT NULL THEN wstart END IGNORE NULLS)
         |      OVER wn AS nt
         |  FROM j WINDOW
         |    wp AS (PARTITION BY event_type ORDER BY wstart
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    wn AS (PARTITION BY event_type ORDER BY wstart
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT wstart, event_type, (v IS NULL) AS filled,
         |  round(CASE
         |    WHEN v IS NOT NULL THEN v
         |    WHEN pv IS NULL THEN nv
         |    WHEN nv IS NULL THEN pv
         |    ELSE pv + (nv - pv) * (CAST(epoch(wstart) - epoch(pt) AS DOUBLE)
         |      / CAST(epoch(nt) - epoch(pt) AS DOUBLE))
         |  END, 6) AS value_filled
         |FROM br
         |ORDER BY wstart NULLS FIRST, event_type NULLS FIRST,
         |  filled NULLS FIRST, value_filled NULLS FIRST""".stripMargin) {
      (s, dir) =>
        val ev = Tables.t(s, dir, "events")
          .filter(col("event_type").isin("click", "view"))
        orderAll(graft.Engine.gapFill(ev, col("event_type"), col("ts"),
            col("value"), slotSeconds = 900)
          .withColumnRenamed("key", "event_type"))
    },

    // Q48c (beyond-survey) — PER-KEY time-series RESAMPLE with LINEAR
    // INTERPOLATION ([[graft.Engine.resampleInterpolate]]): each
    // user's irregular click series projected onto a daily grid
    // strictly inside its observed span — the feature-pipeline
    // regularizer (training windows want aligned timestamps; events
    // arrive when they arrive). Complements q48's dense-spine LOCF
    // fill: this interpolates BETWEEN bracketing observations, per
    // key, and every emitted grid point has both brackets by
    // construction (no edge NULLs). Plan: one hash aggregate for
    // bounds, a bounded sequence() explode for the grid, then the
    // obs∪grid spine shuffles ONCE on the key with running
    // last/first-ignoreNulls windows inside the partition — the q26
    // as-of discipline, never a range self-join. The interpolation is
    // one pinned IEEE expression over exact microsecond deltas.
    Q("q48c_interpolate",
      """WITH obs AS (SELECT user_id, ts, event_id, value FROM events
        |    WHERE event_type = 'click' AND value IS NOT NULL
        |      AND user_id IS NOT NULL AND ts IS NOT NULL),
        |b AS (SELECT user_id, min(ts) AS mn, max(ts) AS mx FROM obs
        |  GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(
        |      date_trunc('day', mn) + INTERVAL 1 DAY,
        |      date_trunc('day', mx), INTERVAL 1 DAY)) AS ts
        |  FROM b WHERE date_trunc('day', mx) >=
        |    date_trunc('day', mn) + INTERVAL 1 DAY),
        |u AS (SELECT user_id, ts, 0 AS is_grid, event_id, value FROM obs
        |  UNION ALL SELECT user_id, ts, 1, NULL, NULL FROM grid),
        |w AS (SELECT *,
        |  last_value(value IGNORE NULLS) OVER pw AS vp,
        |  last_value(CASE WHEN value IS NOT NULL THEN ts END
        |    IGNORE NULLS) OVER pw AS tp,
        |  first_value(value IGNORE NULLS) OVER nw AS vn,
        |  first_value(CASE WHEN value IS NOT NULL THEN ts END
        |    IGNORE NULLS) OVER nw AS tn
        |  FROM u
        |  WINDOW pw AS (PARTITION BY user_id
        |      ORDER BY ts, is_grid, event_id NULLS FIRST
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    nw AS (PARTITION BY user_id
        |      ORDER BY ts, is_grid, event_id NULLS FIRST
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id AS key, ts, round(CASE WHEN ts = tp THEN vp
        |    ELSE vp + (vn - vp) *
        |      (CAST(epoch_us(ts) - epoch_us(tp) AS DOUBLE)
        |        / CAST(epoch_us(tn) - epoch_us(tp) AS DOUBLE)) END, 6)
        |    AS value_interp
        |FROM w WHERE is_grid = 1
        |ORDER BY key NULLS FIRST, ts NULLS FIRST,
        |  value_interp NULLS FIRST
        |LIMIT 5000""".stripMargin) { (s, dir) =>
      orderAll(graft.Engine.resampleInterpolate(
          Tables.t(s, dir, "events").filter(col("event_type") === "click"),
          col("user_id"), col("ts"), col("event_id"), col("value"))
        ).limit(5000)
    },

    // Q49b (beyond-survey) — z-normalized SUBSEQUENCE similarity search
    // (the distributed time-series motif query of the EDBT'19/REPOSE
    // line, PAPERS.md): every length-4 per-user window of the value
    // series, z-normalized, ranked by squared distance to a query
    // window (user 0's earliest), global top-5. Windows materialize via
    // collect_list over a ROWS frame — frame order IS the window order,
    // so no post-sort — inside the per-user partition (never a global
    // window); the z-normalization and distance are identical IEEE
    // operation trees in both engines (aggregate seeds 0.0+x₁ ≡
    // DuckDB's seedless list_reduce); the 1-row query broadcast + a
    // TakeOrdered top-k is the whole cross-series stage. Flat windows
    // (sd = 0) are excluded — z-normalization is undefined there.
    Q("q49b_subseq_search",
      """WITH w AS (SELECT user_id, event_id, ts, list(value) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS win
        |  FROM events),
        |f AS (SELECT * FROM w WHERE len(win) = 4),
        |zm AS (SELECT user_id, event_id, ts, win,
        |    list_reduce(win, (a, b) -> a + b) / 4.0 AS m FROM f),
        |zs AS (SELECT *, sqrt(list_reduce(
        |    list_transform(win, x -> (x - m) * (x - m)),
        |    (a, b) -> a + b) / 4.0) AS sd FROM zm),
        |zn AS (SELECT user_id, event_id, ts,
        |    list_transform(win, x -> (x - m) / sd) AS zn
        |  FROM zs WHERE sd > 0),
        |q AS (SELECT zn AS qz FROM zn WHERE user_id = 0
        |  ORDER BY ts, event_id LIMIT 1),
        |d AS (SELECT user_id, event_id, round(list_reduce(
        |    list_transform(generate_series(1, 4),
        |      i -> (zn[i] - qz[i]) * (zn[i] - qz[i])),
        |    (a, b) -> a + b), 6) AS dist
        |  FROM zn CROSS JOIN q)
        |SELECT user_id, event_id, dist FROM d
        |ORDER BY dist ASC NULLS FIRST, user_id ASC NULLS FIRST,
        |  event_id ASC NULLS FIRST
        |LIMIT 5""".stripMargin) { (s, dir) =>
      val frame = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.currentRow, 3)
      val wins = Tables.t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("win", collect_list(col("value")).over(frame))
        .filter(size(col("win")) === 4)
      val zn = wins
        .withColumn("__m",
          aggregate(col("win"), lit(0.0), (a, x) => a + x) / lit(4.0))
        .withColumn("__sd", sqrt(
          aggregate(transform(col("win"),
              x => (x - col("__m")) * (x - col("__m"))),
            lit(0.0), (a, x) => a + x) / lit(4.0)))
        .filter(col("__sd") > 0)
        .withColumn("zn",
          transform(col("win"), x => (x - col("__m")) / col("__sd")))
        .select(col("user_id"), col("event_id"), col("ts"), col("zn"))
      val q = zn.filter(col("user_id") === 0)
        .orderBy(col("ts").asc, col("event_id").asc).limit(1)
        .select(col("zn").as("qz"))
      zn.crossJoin(broadcast(q))
        .select(col("user_id"), col("event_id"),
          round(aggregate(
            zip_with(col("zn"), col("qz"), (a, b) => (a - b) * (a - b)),
            lit(0.0), (acc, x) => acc + x), 6).as("dist"))
        .orderBy(col("dist").asc_nulls_first,
          col("user_id").asc_nulls_first, col("event_id").asc_nulls_first)
        .limit(5)
    },

    // Q49c (beyond-survey) — per-key EWMA (α = 0.5), the recursive
    // smoothing feature a training pipeline backfills per user/entity.
    // Recursion defeats SQL window frames (each term depends on the
    // previous OUTPUT, not a previous input), so both engines fold the
    // per-key time-ordered value list LEFT-TO-RIGHT: Spark
    // array_sort(collect_list(struct)) + aggregate SEEDED WITH THE
    // FIRST ELEMENT over the tail, DuckDB list(ORDER BY) + list_reduce
    // — the identical operation sequence 0.5·x + 0.5·acc from the same
    // first element, so every intermediate is IEEE-bit-equal (α = 0.5
    // multiplies are exact). The first-element seed (not a null-seeded
    // when(acc IS NULL, …) fold) also makes a NULL value mid-series
    // propagate to a NULL EWMA in BOTH engines — a sentinel-null fold
    // would silently RESTART the smoothing after the NULL instead.
    // One shuffle on the key; per-key state is the user's event list —
    // bounded by per-entity history, the q93e-kernel contract (the
    // unbounded-history variant is the streaming q75b shape instead).
    // TIE/NULL CONTRACT (r10 advice): the Spark side sorts by the FULL
    // struct(ts, event_id, value) with Spark's nulls-first field order,
    // so the oracle's list(… ORDER BY) pins the same three keys and
    // NULLS FIRST explicitly — duplicate (ts, event_id) rows with
    // different values, or a NULL ts, now order (and fold) identically
    // in both engines instead of riding each engine's default.
    Q("q49c_ewma",
      """WITH l AS (SELECT user_id,
        |    list(value ORDER BY ts NULLS FIRST, event_id NULLS FIRST,
        |      value NULLS FIRST) AS vs,
        |    count(*) AS n
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(n AS INT) AS n_events,
        |  round(list_reduce(vs, (acc, x) -> 0.5 * x + 0.5 * acc), 6)
        |    AS ewma
        |FROM l
        |ORDER BY user_id NULLS FIRST, n_events NULLS FIRST,
        |  ewma NULLS FIRST""".stripMargin) { (s, dir) =>
      val byUser = Tables.t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).cast("int").as("n_events"),
          transform(
            array_sort(collect_list(
              struct(col("ts"), col("event_id"), col("value")))),
            x => x.getField("value")).as("__vs"))
      val vs = col("__vs")
      orderAll(byUser.select(col("user_id"), col("n_events"),
        round(aggregate(
            slice(vs, lit(2), greatest(size(vs) - 1, lit(0))),
            element_at(vs, 1),
            (acc, x) => lit(0.5) * x + lit(0.5) * acc), 6)
          .as("ewma")))
    },

    // Q47e (beyond-survey) — first/last-touch conversion ATTRIBUTION
    // ([[graft.Engine.touchAttribution]]), the q47b funnel's question
    // inverted: the funnel asks "how far do journeys get", attribution
    // asks "which step deserves the credit for the ones that converted".
    // Per user, a running first()/last() ignoreNulls window over the
    // (ts, event_id) order carries the opening and the most recent
    // preceding non-purchase touch onto every purchase row (one
    // partitioned window — scales with keys); the per-channel rollup is
    // then two bounded aggregates full-outer-joined on the channel.
    // Purchases with NO prior touch keep a NULL channel row — dropped
    // conversions would silently inflate every real channel's share.
    Q("q47e_attribution",
      """WITH ch AS (SELECT user_id, ts, event_id, event_type, value,
        |    CASE WHEN event_type <> 'purchase' THEN event_type END
        |      AS channel
        |  FROM events),
        |w AS (SELECT user_id, event_type, value,
        |    first_value(channel IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS first_touch,
        |    last_value(channel IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS last_touch
        |  FROM ch),
        |p AS (SELECT * FROM w WHERE event_type = 'purchase'),
        |f AS (SELECT first_touch AS channel, count(*) AS n_first,
        |    CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS rf
        |  FROM p GROUP BY 1),
        |l AS (SELECT last_touch AS channel, count(*) AS n_last,
        |    CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS rl
        |  FROM p GROUP BY 1)
        |SELECT coalesce(f.channel, l.channel) AS channel,
        |  CAST(coalesce(n_first, 0) AS BIGINT) AS n_first,
        |  round(coalesce(rf, 0), 6) AS rev_first,
        |  CAST(coalesce(n_last, 0) AS BIGINT) AS n_last,
        |  round(coalesce(rl, 0), 6) AS rev_last
        |FROM f FULL OUTER JOIN l
        |  ON f.channel IS NOT DISTINCT FROM l.channel
        |ORDER BY channel NULLS FIRST, n_first NULLS FIRST,
        |  rev_first NULLS FIRST, n_last NULLS FIRST,
        |  rev_last NULLS FIRST""".stripMargin) { (s, dir) =>
      orderAll(graft.Engine.touchAttribution(
        Tables.t(s, dir, "events"), col("user_id"),
        Seq(col("ts"), col("event_id")), col("event_type"),
        "purchase", col("value")))
    },

    // Q47f (beyond-survey) — KAPLAN-MEIER SURVIVAL per signup-week
    // cohort ([[graft.Engine.kaplanMeier]]) over purchase activity:
    // the time-to-churn view q47c's fixed retention grid can't
    // express, because it handles CENSORING — a user still purchasing
    // at the observation end hasn't churned and must stay in the
    // at-risk denominator without ever counting as a death. Churn =
    // last purchase > 7 days before the corpus end. The survival
    // product Π(1 − d/n) runs as exp(Σ ln(1 − d/n)) with ln terms on
    // the 9-dp decimal grid (the q11c entropy discipline); a
    // whole-risk-set death step is pinned to exactly 0.0 by a
    // window-max flag instead of folding ln(0). Two keyed aggregates
    // + two partitioned windows over the already-tiny risk table.
    Q("q47f_survival",
      """WITH lives AS (SELECT user_id AS u, min(ts) AS birth,
        |    max(ts) AS lastt
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type = 'purchase'
        |  GROUP BY 1),
        |e AS (SELECT max(lastt) AS endt FROM lives),
        |risk AS (SELECT
        |    CAST(date_trunc('week', birth) AS TIMESTAMP) AS cohort,
        |    CAST(date_diff('day', CAST(birth AS DATE),
        |      CAST(lastt AS DATE)) AS INT) AS t_day,
        |    CASE WHEN lastt < endt - INTERVAL 7 DAY THEN 1 ELSE 0 END
        |      AS churn
        |  FROM lives, e),
        |rt AS (SELECT cohort, t_day, count(*) AS at_t,
        |    CAST(sum(churn) AS BIGINT) AS n_churn,
        |    CAST(sum(1 - churn) AS BIGINT) AS n_censored
        |  FROM risk GROUP BY 1, 2),
        |w AS (SELECT *, CAST(sum(at_t) OVER (PARTITION BY cohort
        |      ORDER BY t_day
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |    AS BIGINT) AS n_risk FROM rt),
        |t AS (SELECT *,
        |    CAST(CASE WHEN n_churn > 0 AND n_churn < n_risk THEN
        |      round(ln(1.0e0 - CAST(n_churn AS DOUBLE)
        |        / CAST(n_risk AS DOUBLE)), 9)
        |      ELSE 0.0e0 END AS DECIMAL(38,9)) AS term,
        |    max(CASE WHEN n_churn = n_risk THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY cohort ORDER BY t_day
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS dead
        |  FROM w)
        |SELECT cohort, t_day, n_risk, n_churn, n_censored,
        |  CASE WHEN dead = 1 THEN 0.0e0 ELSE
        |    round(exp(CAST(sum(term) OVER (PARTITION BY cohort
        |      ORDER BY t_day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE)), 6) END AS survival
        |FROM t
        |ORDER BY cohort NULLS FIRST, t_day NULLS FIRST,
        |  n_risk NULLS FIRST, n_churn NULLS FIRST,
        |  n_censored NULLS FIRST, survival NULLS FIRST""".stripMargin) {
      (s, dir) =>
        orderAll(graft.Engine.kaplanMeier(
          Tables.t(s, dir, "events")
            .filter(col("event_type") === "purchase"),
          col("user_id"), col("ts"), churnGapDays = 7))
    },

    // Q47g (beyond-survey) — WILSON SCORE INTERVALS
    // ([[graft.Engine.wilsonInterval]]): per-event-type share of
    // high-value events (value > 50) with the 95% Wilson bounds — the
    // proportion estimate that stays honest at small n and extreme p̂,
    // where the normal-approximation interval goes negative or past 1
    // (exactly where a data gate's pass-rates live). One keyed
    // aggregate; the bound is divisions and one IEEE sqrt of identical
    // inputs — deterministic with no decimal staging; the oracle
    // spells z² as 1.96·1.96 so both engines compute the identical
    // IEEE product rather than parsing a decimal literal.
    Q("q47g_wilson",
      """WITH a AS (SELECT event_type AS key, count(*) AS n,
        |    CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_success
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1),
        |p AS (SELECT key, n, n_success,
        |    CAST(n_success AS DOUBLE) / CAST(n AS DOUBLE) AS ph,
        |    1.96e0 * 1.96e0 AS z2, CAST(n AS DOUBLE) AS nd
        |  FROM a)
        |SELECT key, n, n_success, round(ph, 6) AS p_hat,
        |  round((ph + z2 / (2.0e0 * nd) - 1.96e0
        |    * sqrt(ph * (1.0e0 - ph) / nd + z2 / (4.0e0 * nd * nd)))
        |    / (1.0e0 + z2 / nd), 6) AS wilson_low,
        |  round((ph + z2 / (2.0e0 * nd) + 1.96e0
        |    * sqrt(ph * (1.0e0 - ph) / nd + z2 / (4.0e0 * nd * nd)))
        |    / (1.0e0 + z2 / nd), 6) AS wilson_high
        |FROM p
        |ORDER BY key NULLS FIRST, n NULLS FIRST, n_success NULLS FIRST,
        |  p_hat NULLS FIRST, wilson_low NULLS FIRST,
        |  wilson_high NULLS FIRST""".stripMargin) { (s, dir) =>
      orderAll(graft.Engine.wilsonInterval(Tables.t(s, dir, "events"),
        col("event_type"), col("value") > 50))
    })
}
