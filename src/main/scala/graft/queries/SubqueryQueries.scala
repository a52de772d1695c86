package graft.queries

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Subquery decorrelation + nested-collection dataflow
  * (SURVEY.md §2.10, §4.1): scalar / IN / correlated-EXISTS / correlated
  * scalar subqueries (`fe/.../analysis/StmtRewriter.java:47` rewrites them
  * to joins; Catalyst's RewritePredicateSubquery and
  * RewriteCorrelatedScalarSubquery do the same), WITH CTEs
  * (`WithClause.java`), lateral per-row evaluation (SubplanNode,
  * `be/src/exec/subplan-node.h:42-60`), and array flattening (UnnestNode,
  * `be/src/exec/unnest-node.h:79` → explode/posexplode).
  *
  * These run as SQL text so the full parse→decorrelate path is exercised.
  */
object SubqueryQueries extends QueryGroup {

  private def sql(s: SparkSession, dir: String, text: String): DataFrame = {
    GraftSession.registerAll(s, dir)
    s.sql(text)
  }

  def defs: Seq[Q.Def] = Seq(

    // ---- uncorrelated scalar subquery (CardinalityCheckNode guards >1 row
    // in the reference; exact arithmetic on max keeps the oracle bit-equal).
    Q.Def("q_subquery_scalar", (s, dir) => sql(s, dir, """
      SELECT o_orderstatus, COUNT(*) AS n
      FROM orders
      WHERE o_totalprice > (SELECT MAX(o_totalprice) * 0.5 FROM orders)
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""),
      Some("""
      SELECT o_orderstatus, COUNT(*) AS n
      FROM orders
      WHERE o_totalprice > (SELECT MAX(o_totalprice) * 0.5 FROM orders)
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""")),

    // ---- IN subquery (rewritten to LEFT SEMI).
    Q.Def("q_subquery_in", (s, dir) => sql(s, dir, """
      SELECT c_mktsegment, COUNT(*) AS n
      FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders
                          WHERE o_totalprice > 450000.0)
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""),
      Some("""
      SELECT c_mktsegment, COUNT(*) AS n
      FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders
                          WHERE o_totalprice > 450000.0)
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""")),

    // ---- correlated EXISTS with an extra correlated predicate.
    Q.Def("q_subquery_exists", (s, dir) => sql(s, dir, """
      SELECT s_suppkey, s_name
      FROM supplier s
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
                      AND l.l_discount >= 0.09)
      ORDER BY s_suppkey"""),
      Some("""
      SELECT s_suppkey, s_name
      FROM supplier s
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
                      AND l.l_discount >= 0.09)
      ORDER BY s_suppkey""")),

    // ---- correlated scalar subquery (TPC-H Q17 shape). l_quantity is
    // integer-valued so AVG is exact in both engines.
    Q.Def("q_subquery_corr_scalar", (s, dir) => sql(s, dir, """
      SELECT COUNT(*) AS n_small,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS price_sum
      FROM lineitem l
      WHERE l.l_quantity < (SELECT 0.3 * AVG(l2.l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = l.l_partkey)"""),
      Some("""
      SELECT COUNT(*) AS n_small,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS price_sum
      FROM lineitem l
      WHERE l.l_quantity < (SELECT 0.3 * AVG(l2.l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = l.l_partkey)""")),

    // ---- WITH CTE referenced twice (WithClause.java).
    Q.Def("q_cte", (s, dir) => sql(s, dir, """
      WITH cust_orders AS (
        SELECT o_custkey, COUNT(*) AS n, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total
        FROM orders GROUP BY o_custkey
      )
      SELECT a.o_custkey, a.n, CAST(a.total AS DOUBLE) AS total
      FROM cust_orders a
      WHERE a.n > (SELECT AVG(n) FROM cust_orders) * 1.5
      ORDER BY a.o_custkey"""),
      Some("""
      WITH cust_orders AS (
        SELECT o_custkey, COUNT(*) AS n, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total
        FROM orders GROUP BY o_custkey
      )
      SELECT a.o_custkey, a.n, CAST(a.total AS DOUBLE) AS total
      FROM cust_orders a
      WHERE a.n > (SELECT AVG(n) FROM cust_orders) * 1.5
      ORDER BY a.o_custkey""")),

    // ---- LATERAL correlated subquery in FROM (SubplanNode semantics:
    // per outer row, re-evaluate the inner plan).
    Q.Def("q_lateral", (s, dir) => sql(s, dir, """
      SELECT n.n_name, top.c_custkey, top.c_acctbal
      FROM nation n,
        LATERAL (SELECT c_custkey, c_acctbal FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) top
      ORDER BY n.n_name, top.c_custkey"""),
      Some("""
      SELECT n.n_name, top.c_custkey, top.c_acctbal
      FROM nation n,
        LATERAL (SELECT c_custkey, c_acctbal FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) top
      ORDER BY n.n_name, top.c_custkey""")),

    // ---- array unnest with ordinality (UnnestNode → posexplode).
    Q.Def("q_explode_pos", (s, dir) => sql(s, dir, """
      SELECT vec_id, CAST(p.pos AS BIGINT) AS pos, p.val
      FROM embeddings
      LATERAL VIEW POSEXPLODE(embedding) p AS pos, val
      WHERE vec_id < 20
      ORDER BY vec_id, pos"""),
      Some("""
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
             unnest(embedding) AS val
      FROM embeddings
      WHERE vec_id < 20
      ORDER BY vec_id, pos""")),

    // ---- unnest + re-aggregate (SubplanNode + agg over collection):
    // per-vector L2 norm via explode-then-groupBy.
    Q.Def("q_explode_agg", (s, dir) => sql(s, dir, """
      SELECT vec_id,
             ROUND(SQRT(SUM(CAST(v.val AS DOUBLE) * CAST(v.val AS DOUBLE))), 4) AS l2_norm,
             COUNT(*) AS dim
      FROM embeddings
      LATERAL VIEW EXPLODE(embedding) v AS val
      WHERE vec_id < 100
      GROUP BY vec_id
      ORDER BY vec_id"""),
      Some("""
      SELECT vec_id,
             ROUND(SQRT(SUM(CAST(val AS DOUBLE) * CAST(val AS DOUBLE))), 4) AS l2_norm,
             COUNT(*) AS dim
      FROM (SELECT vec_id, unnest(embedding) AS val FROM embeddings
            WHERE vec_id < 100) x
      GROUP BY vec_id
      ORDER BY vec_id""")),
  )
}
