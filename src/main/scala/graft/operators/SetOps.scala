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
    })
}
