"""The remaining distinctive TPC-H plan shapes (round-10 verdict
task 5): Q13/Q15/Q17/Q20/Q22 adapted to the driver tables' columns.
The repo long had the Q1/Q5/Q21 classes (q01, r36, r37); these five
each exercise a Catalyst decorrelation or outer-join path no other
entry pinned:

- r82 (Q13): LEFT join with a filter predicate ON THE RIGHT side
  inside the join condition + two stacked aggregations — the outer-
  join-preserving filter placement Catalyst must NOT push below the
  join's null-extension.
- r83 (Q15): aggregate view consumed twice, once through a scalar
  max subquery — the "view + scalar-subquery against itself" shape.
- r84 (Q17): correlated scalar aggregate subquery in WHERE
  (per-part average), Catalyst's DecorrelateInnerQuery → aggregate +
  join rewrite.
- r85 (Q20): IN-subquery whose inner block carries ANOTHER
  correlated scalar aggregate — nested decorrelation.
- r86 (Q22): NOT EXISTS anti-join + substring bucketing + an
  uncorrelated scalar average gate.

All five run through ``spark.sql`` on temp views so the actual
Catalyst subquery machinery plans them (not a hand-decorrelated
DataFrame translation); the DuckDB oracles are the same SQL modulo
dialect. Plan budgets are pinned in tests/test_tpch_shapes.py.

Adaptations from pristine TPC-H (driver tables lack some columns):
Q13's comment filter → o_orderpriority; Q17's container filter and
0.2 factor → per-part 0.5·avg quantity, grouped by brand so the
answer has stable rows at every SF; Q20's partsupp availability →
shipped-quantity threshold (4×avg) over size-filtered parts; Q22's
phone prefix → last digit of c_name, "no account activity" → no
urgent order (every customer has SOME order in this data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from eeg_data_lake_spark.workload.registry import register, t


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        t(spark, sf_dir, n).createOrReplaceTempView(f"tpch_{n}")


@register(
    "r82_order_count_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("sql", "tpch", "join", "outer", "agg"),
)
def r82_order_count_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed exactly k
    (non-urgent) orders, INCLUDING the zero-order customers — which
    is why the priority filter must live in the LEFT join's ON
    clause, not a WHERE (a WHERE would drop the null-extended rows
    and silently turn the join inner; Catalyst must keep the
    predicate join-side). Two stacked aggregations: per-customer
    count, then the count distribution. One customer-orders shuffle
    + two small agg exchanges; at 100 TB the second agg runs on
    |customers| rows and the third on |distinct counts|."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM tpch_customer c LEFT JOIN tpch_orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
        """
    )


@register(
    "r83_top_supplier_revenue",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate <  DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    tags=("sql", "tpch", "view", "scalar-subquery"),
)
def r83_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: a quarterly revenue view consumed twice —
    joined to supplier AND reduced to a scalar max the WHERE compares
    against. Catalyst plans the scalar side as a 1-row subquery
    stage; the revenue relation itself is |suppliers| rows after one
    lineitem shuffle, so the double consumption is cheap. Revenues
    are rounded to cents INSIDE the view so the equality compares
    engine-stable numbers."""
    _views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS total_revenue
          FROM tpch_lineitem
          WHERE l_shipdate >= DATE '1996-01-01'
            AND l_shipdate <  DATE '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM tpch_supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
        """
    )


@register(
    "r84_small_quantity_revenue",
    oracle="""
    SELECT p.p_brand,
           CAST(count(*) AS BIGINT) AS n_small,
           round(sum(l.l_extendedprice), 2) AS small_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity < (
      SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey)
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
    tags=("sql", "tpch", "correlated-subquery", "decorrelation"),
)
def r84_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from line items whose quantity is
    under HALF THEIR PART'S average — a correlated scalar aggregate
    subquery in WHERE, which Catalyst decorrelates into a per-part
    average aggregate joined back to the fact (DecorrelateInnerQuery;
    the plan pin asserts no nested-loop survived). Grouped by brand
    so the answer has stable multi-row shape at every SF. Two
    lineitem passes by construction (fact + per-part averages), both
    column-pruned; the join back is |parts|-sized."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT p.p_brand,
               count(*) AS n_small,
               round(sum(l.l_extendedprice), 2) AS small_revenue
        FROM tpch_lineitem l JOIN tpch_part p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity < (
          SELECT 0.5 * avg(l2.l_quantity) FROM tpch_lineitem l2
          WHERE l2.l_partkey = l.l_partkey)
        GROUP BY p.p_brand
        ORDER BY p.p_brand
        """
    )


@register(
    "r85_heavy_shippers_of_small_parts",
    oracle="""
    WITH shipped AS (
      SELECT l.l_suppkey, l.l_partkey, sum(l.l_quantity) AS qty
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_size <= 10 AND l.l_shipdate >= DATE '1996-01-01'
      GROUP BY l.l_suppkey, l.l_partkey
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT sh.l_suppkey FROM shipped sh
      WHERE sh.qty > (SELECT 4.0 * avg(l2.l_quantity) FROM lineitem l2
                      WHERE l2.l_partkey = sh.l_partkey))
    ORDER BY s.s_suppkey
    """,
    tags=("sql", "tpch", "semi-join", "correlated-subquery"),
)
def r85_heavy_shippers_of_small_parts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped an outsized quantity
    (4x the part's average line quantity) of some small part since
    1996 — an IN-subquery whose inner block itself carries a
    correlated scalar aggregate, i.e. NESTED decorrelation: Catalyst
    must rewrite the scalar into a per-part aggregate join inside the
    IN relation, then the IN into a left-semi join. The semi join's
    probe side is |suppliers|; all heavy work happens once in the
    shipped/avg aggregates."""
    _views(spark, sf_dir, "supplier", "lineitem", "part")
    return spark.sql(
        """
        WITH shipped AS (
          SELECT l.l_suppkey, l.l_partkey, sum(l.l_quantity) AS qty
          FROM tpch_lineitem l JOIN tpch_part p
            ON p.p_partkey = l.l_partkey
          WHERE p.p_size <= 10 AND l.l_shipdate >= DATE '1996-01-01'
          GROUP BY l.l_suppkey, l.l_partkey
        )
        SELECT s.s_suppkey, s.s_name
        FROM tpch_supplier s
        WHERE s.s_suppkey IN (
          SELECT sh.l_suppkey FROM shipped sh
          WHERE sh.qty > (SELECT 4.0 * avg(l2.l_quantity)
                          FROM tpch_lineitem l2
                          WHERE l2.l_partkey = sh.l_partkey))
        ORDER BY s.s_suppkey
        """
    )


@register(
    "r86_idle_rich_customers",
    oracle="""
    SELECT cgroup,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM (
      SELECT substring(c_name, length(c_name), 1) AS cgroup,
             c_acctbal, c_custkey
      FROM customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                         WHERE c_acctbal > 0)
    ) c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY cgroup
    ORDER BY cgroup
    """,
    tags=("sql", "tpch", "anti-join", "scalar-subquery"),
)
def r86_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with NO
    urgent order, bucketed by a substring key — an uncorrelated
    scalar average gate (1-row subquery stage) feeding a NOT EXISTS
    that Catalyst plans as a left-anti join, then a small group-by.
    The anti join ships only the filtered rich-customer rows; the
    scalar gate costs one column-pruned customer pass."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT cgroup,
               count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM (
          SELECT substring(c_name, length(c_name), 1) AS cgroup,
                 c_acctbal, c_custkey
          FROM tpch_customer
          WHERE c_acctbal > (SELECT avg(c_acctbal) FROM tpch_customer
                             WHERE c_acctbal > 0)
        ) c
        WHERE NOT EXISTS (SELECT 1 FROM tpch_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        GROUP BY cgroup
        ORDER BY cgroup
        """
    )
