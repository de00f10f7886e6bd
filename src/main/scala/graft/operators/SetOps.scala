package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.Canon.orderAll

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
    })
}
