"""Spark SQL textual surface: plans expressed as spark.sql() over the
registered catalog views — CTEs, correlated subqueries, scalar
subqueries, explicit GROUPING SETS, complex types. The SQL string is
(modulo dialect touch-ups) the oracle itself, which exercises the
parser/analyzer path the DataFrame plans don't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.aggs import dec_sum_sql
from ..sources.catalog import load_table, register_views
from .registry import register


def _sql(spark: SparkSession, sf_dir: str, query: str, tables: tuple[str, ...]) -> DataFrame:
    register_views(spark, sf_dir, tables)
    return spark.sql(query)


_CTE_WINDOW = """
WITH spend AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total
  FROM orders GROUP BY o_custkey
)
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       ROUND(MAX(total), 2) AS max_spend
FROM customer JOIN spend ON c_custkey = o_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@register("sql_cte_agg", oracle=_CTE_WINDOW, tags=("sql", "cte"))
def sql_cte_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + join + agg through the SQL parser (identical text runs on
    DuckDB as the oracle)."""
    return _sql(spark, sf_dir, _CTE_WINDOW, ("orders", "customer"))


_CORRELATED = """
SELECT c_custkey, c_name
FROM customer c
WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = c.c_nationkey)
ORDER BY c_custkey
"""


@register("sql_correlated_subquery", oracle=_CORRELATED, tags=("sql", "subquery"))
def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst de-correlates it into a
    left outer aggregate join (no per-row re-execution)."""
    return _sql(spark, sf_dir, _CORRELATED, ("customer",))


_SCALAR_SUB = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
FROM orders
WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
ORDER BY o_orderkey
"""


@register("sql_scalar_subquery", oracle=_SCALAR_SUB, tags=("sql", "subquery"))
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (computed once, broadcast into the
    filter)."""
    return _sql(spark, sf_dir, _SCALAR_SUB, ("orders",))


_GROUPING_SETS = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       cnt
FROM (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
  FROM orders
  GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
)
ORDER BY status, priority
"""


@register("sql_grouping_sets", oracle=_GROUPING_SETS, tags=("sql", "grouping-sets"))
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube)."""
    return _sql(spark, sf_dir, _GROUPING_SETS, ("orders",))


@register(
    "fn_complex_types",
    oracle="""
    SELECT c_nationkey,
           COALESCE(array_to_string(list_sort(
               list(c_mktsegment) FILTER (WHERE c_mktsegment IS NOT NULL)), ','), '')
             AS segments,
           COUNT(*) AS n
    FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("functions", "complex"),
)
def fn_complex_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation (collect_list → sorted array), canonicalized to
    a ','-joined string on both sides (pattern: fn_map_types) — the
    driver's pandas hash gate cannot hash raw array cells
    (CORRECTNESS_r02's fn_higher_order_suite error)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_nationkey", "c_mktsegment")
        .distinct()
        .groupBy("c_nationkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("c_mktsegment"))).alias(
                "segments"
            ),
            F.count("*").alias("n"),
        )
        .orderBy("c_nationkey")
    )


_Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
       {dec_sum_sql('l_extendedprice * (1 - l_discount)', 6)} AS revenue
FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", oracle=_Q7, tags=("joins", "sql"))
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: two roles of the same dimension (nation n1/n2)
    with a disjunctive cross-nation predicate — via the SQL parser."""
    return _sql(
        spark, sf_dir, _Q7, ("lineitem", "supplier", "orders", "customer", "nation")
    )


_Q10 = f"""
SELECT c_custkey, c_name,
       {dec_sum_sql('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
       n_name
FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=_Q10, tags=("joins", "sql"))
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: returned-item revenue per customer, top 20."""
    return _sql(spark, sf_dir, _Q10, ("customer", "orders", "lineitem", "nation"))


_Q2_STYLE = """
SELECT n_name, c_name, ROUND(c_acctbal, 2) AS acctbal
FROM customer c JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal = (SELECT MAX(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = c.c_nationkey)
ORDER BY n_name, c_name
"""


@register("q2_max_per_group_subquery", oracle=_Q2_STYLE, tags=("sql", "subquery", "joins"))
def q2_max_per_group_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shape: row matching a correlated per-group MAX (the
    min-cost-supplier pattern on this schema's columns)."""
    return _sql(spark, sf_dir, _Q2_STYLE, ("customer", "nation"))


_Q18 = """
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 120
)
SELECT c_name, o_orderkey, ROUND(o_totalprice, 2) AS price, sum_qty
FROM big JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
ORDER BY sum_qty DESC, o_orderkey
LIMIT 50
"""


@register("q18_large_volume_orders", oracle=_Q18, tags=("sql", "having", "joins"))
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shape: HAVING over an exact decimal sum feeding a
    two-way join, top 50."""
    return _sql(spark, sf_dir, _Q18, ("lineitem", "orders", "customer"))


@register(
    "fn_map_types",
    oracle="""
    SELECT c_nationkey,
           list_aggregate(list_transform(list_sort(list({'key': c_mktsegment, 'value': cnt})),
                          e -> e.key || ':' || CAST(e.value AS VARCHAR)),
                          'string_agg', ',') AS seg_counts
    FROM (SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt
          FROM customer WHERE c_mktsegment IS NOT NULL
          GROUP BY c_nationkey, c_mktsegment)
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    tags=("functions", "map"),
)
def fn_map_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column construction: per-nation segment→count built as
    a real MapType column (map_from_entries), then canonicalized to a
    sorted 'k:v,…' string for the oracle compare — MAP wire formats
    differ between engines (DuckDB's client yields a dict-of-lists),
    so the map itself is not hash-comparable."""
    c = load_table(spark, sf_dir, "customer")
    # NULL map keys are contractually dropped (Spark raises NULL_MAP_KEY,
    # DuckDB would sort them opaquely) — filtered identically in the oracle
    per = (
        c.where(F.col("c_mktsegment").isNotNull())
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("cnt"))
    )
    entries = F.sort_array(
        F.collect_list(
            F.struct(F.col("c_mktsegment").alias("key"), F.col("cnt").alias("value"))
        )
    )
    as_map = F.map_from_entries(entries)
    canonical = F.expr(
        "concat_ws(',', transform(map_entries(seg_map), "
        "e -> concat(e.key, ':', CAST(e.value AS STRING))))"
    )
    return (
        per.groupBy("c_nationkey")
        .agg(as_map.alias("seg_map"))
        .select("c_nationkey", canonical.alias("seg_counts"))
        .orderBy("c_nationkey")
    )


_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, ROUND(total_revenue, 2) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@register("q15_top_supplier", oracle=_Q15, tags=("sql", "cte", "subquery"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style: CTE referenced twice (join + scalar MAX) — the
    'view' pattern; Catalyst evaluates the scalar subquery once."""
    return _sql(spark, sf_dir, _Q15, ("lineitem", "supplier"))


_Q16 = """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


@register("q16_supplier_part_counts", oracle=_Q16, tags=("sql", "not-in"))
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style: NOT IN subquery (null-aware anti join) +
    COUNT(DISTINCT) over a filtered join."""
    return _sql(spark, sf_dir, _Q16, ("part", "lineitem", "supplier"))


_Q21 = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
  JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
  JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 25
"""


@register("q21_waiting_suppliers", oracle=_Q21, tags=("sql", "exists", "not-exists"))
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style: EXISTS + NOT EXISTS over the same fact table —
    the supplier whose shipment was the last on a multi-supplier order.
    Catalyst plans both as semi/anti joins keyed on orderkey."""
    return _sql(spark, sf_dir, _Q21, ("supplier", "lineitem", "orders"))


_Q20 = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'PROMO'
  GROUP BY l_suppkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) >
         (SELECT 0.0015 * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          FROM lineitem)
)
ORDER BY s_suppkey
"""


@register("q20_promo_volume_suppliers", oracle=_Q20, tags=("sql", "in", "nested"))
def q20_promo_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shape: IN over a grouped HAVING whose threshold is
    itself a scalar subquery — two nesting levels through the parser."""
    return _sql(spark, sf_dir, _Q20, ("supplier", "lineitem", "part"))


_Q8 = """
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                  AS DOUBLE) / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)) AS volume,
         n_name AS nation
  FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
)
GROUP BY o_year
ORDER BY o_year
"""


@register("q8_market_share", oracle=_Q8, tags=("sql", "ratio"))
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style: one nation's revenue share per year — a
    conditional-sum ratio over a star join (decimal volumes, one
    double division at the end)."""
    return _sql(spark, sf_dir, _Q8, ("lineitem", "orders", "supplier", "nation"))


_Q9 = """
SELECT nation, o_year,
       CAST(SUM(CAST(amount AS DECIMAL(28,6))) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) - 0.9 * p_retailprice * l_quantity AS amount
  FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%a%'
)
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@register("q9_product_profit", oracle=_Q9, tags=("sql", "joins"))
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style: profit (revenue minus modeled supply cost) per
    nation per year over a four-way star join with a LIKE filter."""
    return _sql(spark, sf_dir, _Q9, ("lineitem", "part", "supplier", "orders", "nation"))


_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q13_customer_distribution", oracle=_Q13, tags=("sql", "double-agg"))
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: double aggregation — orders per customer
    (zeros preserved by the filtered LEFT JOIN), then the histogram of
    those counts."""
    return _sql(spark, sf_dir, _Q13, ("customer", "orders"))


_Q17 = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / 7.0, 6)
         AS avg_yearly
FROM lineitem l
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = l.l_partkey)
"""


@register("q17_small_quantity_revenue", oracle=_Q17, tags=("sql", "correlated"))
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style: rows below 20% of their part's average quantity
    — a correlated aggregate the optimizer rewrites into one grouped
    join, not a per-row subquery."""
    return _sql(spark, sf_dir, _Q17, ("lineitem", "part"))


_Q11 = """
WITH natvalue AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
           AS value
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey,
       -- FLOOR-in-both, not ROUND: at sf0.01 one part's value lands
       -- exactly on the cent tie (x.xx5), where ROUND-on-double is
       -- DuckDB-build-sensitive; FLOOR(x*100+0.5)/100 is pure IEEE
       -- arithmetic identical in both engines
       FLOOR(value * 1e2 + 0.5) / 1e2 AS value
FROM natvalue
WHERE value > 0.002 * (SELECT CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                       FROM natvalue)
ORDER BY value DESC, l_partkey
"""


@register("q11_important_stock", oracle=_Q11, tags=("sql", "share-threshold", "subquery"))
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style group-share-threshold (no partsupp fixture, so
    per-part revenue within one nation stands in for stock value):
    groups kept only when their aggregate exceeds a fraction of the
    global total — CTE read twice (grouped rows + scalar-subquery
    total), both sums decimal-accumulated so the double threshold
    compare is bit-identical across engines and partitionings. At
    sf0.01 this keeps 52 of 1204 parts (vacuity-audited)."""
    return _sql(spark, sf_dir, _Q11, ("lineitem", "supplier", "nation"))


_RECURSIVE = """
WITH RECURSIVE edges AS (
  SELECT CONCAT('R', CAST(r_regionkey AS STRING)) AS parent,
         CONCAT('N', CAST(n_nationkey AS STRING)) AS child
  FROM nation JOIN region ON n_regionkey = r_regionkey
  UNION ALL
  SELECT CONCAT('N', CAST(c_nationkey AS STRING)) AS parent,
         CONCAT('C', CAST(c_custkey AS STRING)) AS child
  FROM customer),
roots AS (
  SELECT CONCAT('R', CAST(r_regionkey AS STRING)) AS node, r_name AS root
  FROM region),
walk AS (
  SELECT node, root, 0 AS depth FROM roots
  UNION ALL
  SELECT e.child AS node, w.root, w.depth + 1 AS depth
  FROM walk w JOIN edges e ON e.parent = w.node)
SELECT root, depth, CAST(COUNT(*) AS BIGINT) AS n
FROM walk GROUP BY root, depth ORDER BY root, depth
"""


@register("sql_recursive_cte", oracle=_RECURSIVE, tags=("sql", "recursive", "cte"))
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE hierarchy walk (new in Spark 4.x) — transitive
    descent of the region→nation→customer tree over a string-typed
    node namespace, aggregated per root and depth. The identical text
    runs on DuckDB; recursion terminates because the edge relation is
    a DAG (depth caps at 2), so both engines' fixpoint iterations see
    the same frontier sizes. Each iteration is one parent-keyed hash
    join of the frontier against the edge table — the same
    Pregel-as-relational shape as dp_pagerank_authority, but driven by
    the engine's recursion operator instead of a Python loop."""
    return _sql(spark, sf_dir, _RECURSIVE, ("region", "nation", "customer"))


_PIPE_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(MAX(o_totalprice), 2) AS max_price
FROM orders WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

_PIPE_SPARK = """
FROM orders
|> WHERE o_orderstatus = 'F'
|> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_orders,
             ROUND(MAX(o_totalprice), 2) AS max_price
   GROUP BY o_orderpriority
|> ORDER BY o_orderpriority
"""


@register("sql_pipe_syntax", oracle=_PIPE_ORACLE, tags=("sql", "pipe"))
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (|>, new in Spark 4.0) — the same logical plan
    as the classic GROUP BY oracle, entered through the pipeline
    parser. One dialect where the oracle CANNOT share the text
    (DuckDB has no pipe operator), so the compare is plan-level
    equivalence rather than parser parity."""
    return _sql(spark, sf_dir, _PIPE_SPARK, ("orders",))


_LATERAL = """
SELECT n_name, c.c_name, c.c_acctbal
FROM nation, LATERAL (
  SELECT c_name, c_acctbal FROM customer
  WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_name LIMIT 2
) AS c
ORDER BY n_name, c_acctbal DESC, c_name
"""


@register("sql_lateral_join", oracle=_LATERAL, tags=("sql", "lateral"))
def sql_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery in FROM (SQL:1999 feature T491;
    Spark 3.2+ via DecorrelateInnerQuery): per-nation top-2 customers
    by balance, expressed as a dependent subquery instead of a window.
    Catalyst decorrelates the ORDER BY … LIMIT into a partitioned
    window-group-limit over one customer shuffle — same physical shape
    as w_topn_per_group, reached from the other SQL dialect direction.
    The oracle text is shared verbatim: DuckDB executes the identical
    LATERAL query."""
    return _sql(spark, sf_dir, _LATERAL, ("nation", "customer"))


_EXISTS = """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'P')
ORDER BY c_custkey
"""


@register("sql_exists_subqueries", oracle=_EXISTS, tags=("sql", "exists"))
def sql_exists_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS + NOT EXISTS correlated subqueries in one predicate —
    the SQL-dialect route to the semi ∧ anti join composition the
    DataFrame surface registers as join_semi_urgent_customers /
    join_anti_orderless_customers.  Catalyst rewrites the pair into a
    LeftSemi followed by a LeftAnti on the same key, so the customer
    side shuffles once per probe with no row multiplication (the
    subqueries never project columns out — existence only).  The
    oracle shares the identical SQL text."""
    return _sql(spark, sf_dir, _EXISTS, ("customer", "orders"))


_SCRIPTING_ORACLE = """
WITH t AS (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*)
    AS threshold
  FROM orders)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_above,
       ROUND(MAX(o_totalprice), 2) AS max_price
FROM orders, t
WHERE o_totalprice > t.threshold
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("sql_scripting", oracle=_SCRIPTING_ORACLE, tags=("sql", "scripting"))
def sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (BEGIN…END with DECLARE/SET, new in Spark 4.0):
    a session variable holds the decimal-exact mean order price, and
    the final statement aggregates orders above it — procedural
    control flow INSIDE the SQL surface, no Python glue between the
    two statements. The threshold accumulates in DECIMAL before one
    double division, so both engines compare against the identical
    threshold (a float-summed average could flip a boundary row).
    The oracle is the equivalent scalar-subquery form; the script's
    variable is evaluated once, exactly like the oracle's CTE."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        BEGIN
          DECLARE threshold DOUBLE DEFAULT 0.0;
          SET threshold = (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
                   / COUNT(*)
            FROM orders);
          SELECT o_orderpriority,
                 CAST(COUNT(*) AS BIGINT) AS n_above,
                 ROUND(MAX(o_totalprice), 2) AS max_price
          FROM orders
          WHERE o_totalprice > threshold
          GROUP BY o_orderpriority
          ORDER BY o_orderpriority;
        END
        """
    )


_COLLATION_ORACLE = """
WITH parts AS (
  SELECT p_type, p_brand FROM part
  UNION ALL
  SELECT * FROM (VALUES ('economy', 'brand#2'), ('Economy', 'BRAND#2'),
                        ('sMaLl', 'Brand#4')) v(p_type, p_brand)),
ci AS (
  SELECT COUNT(DISTINCT lower(p_type)) AS n_types_ci,
         COUNT(DISTINCT p_type) AS n_types_cs,
         COUNT(DISTINCT lower(p_brand)) AS n_brands_ci
  FROM parts),
grp AS (
  SELECT lower(p_type) AS t, CAST(COUNT(*) AS BIGINT) AS n
  FROM parts GROUP BY 1 ORDER BY t NULLS LAST LIMIT 5)
SELECT ci.n_types_ci, ci.n_types_cs, ci.n_brands_ci,
       g.t AS type_lc, g.n
FROM ci CROSS JOIN grp g
ORDER BY type_lc
"""


@register("sql_collation_suite", oracle=_COLLATION_ORACLE, tags=("sql", "collation"))
def sql_collation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collated string semantics (COLLATE UTF8_LCASE, new in Spark
    4.0): distinct counts and grouping run on a case-insensitive
    collation INSTEAD of wrapping every expression in lower() — the
    collation travels with the type, so comparisons, GROUP BY, and
    DISTINCT all honor it without rewriting predicates (and at scale
    the optimizer can still hash-partition on the collation key).
    The oracle expresses the same semantics via explicit lower():
    equivalent here because the strings are ASCII, where UTF8_LCASE
    and lowercase-folding agree (locale-specific case folding — the
    divergence area — is deliberately untested against DuckDB's
    different collation engine). The fixture's strings are uniformly
    cased (collation would be vacuous), so three mixed-case rows are
    planted in BOTH engines: the case-insensitive distinct counts
    genuinely diverge from the case-sensitive ones. The
    grouped output labels are rendered through lower() on both sides
    so the HASHED bytes agree; the collated column itself only drives
    the grouping."""
    register_views(spark, sf_dir, ("part",))
    return spark.sql(
        """
        WITH src AS (
          SELECT p_type, p_brand FROM part
          UNION ALL
          SELECT * FROM VALUES ('economy', 'brand#2'), ('Economy', 'BRAND#2'),
                               ('sMaLl', 'Brand#4') AS v(p_type, p_brand)),
        parts AS (
          SELECT CAST(p_type AS STRING COLLATE UTF8_LCASE) AS t_ci,
                 p_type,
                 CAST(p_brand AS STRING COLLATE UTF8_LCASE) AS c_ci
          FROM src),
        ci AS (
          SELECT COUNT(DISTINCT t_ci) AS n_types_ci,
                 COUNT(DISTINCT p_type) AS n_types_cs,
                 COUNT(DISTINCT c_ci) AS n_brands_ci
          FROM parts),
        grp AS (
          SELECT lower(t_ci) AS t, CAST(COUNT(*) AS BIGINT) AS n
          FROM parts GROUP BY t_ci ORDER BY t NULLS LAST LIMIT 5)
        SELECT ci.n_types_ci, ci.n_types_cs, ci.n_brands_ci,
               g.t AS type_lc, g.n
        FROM ci CROSS JOIN grp g
        ORDER BY type_lc
        """
    )


_GROUP_BY_ALL = """
SELECT o_orderstatus,
       o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders
WHERE o_totalprice > 1000
GROUP BY ALL
ORDER BY ALL
"""


@register("sql_group_by_all", oracle=_GROUP_BY_ALL, tags=("sql", "modern"))
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL + ORDER BY ALL — the modern analyst-SQL sugar
    (DuckDB pioneered it; Spark supports both since 3.4/4.0): every
    non-aggregate select item becomes a grouping key, and the result
    orders by the full select list left-to-right. One identical SQL
    text runs through both parsers, pinning that the two engines
    RESOLVE the sugar identically (keys o_orderstatus +
    o_orderpriority; ordering status, priority, n, revenue) — a
    resolution-rule check, not just an execution check.

    ORDER BY ALL includes the aggregates in the sort key, which is
    what makes the row order well-defined here (the two key columns
    alone are already unique per group, so the extra keys are inert
    but must PARSE the same way)."""
    return _sql(spark, sf_dir, _GROUP_BY_ALL, ("orders",))


_VARIANT_SHRED = """
WITH payload AS (
  SELECT event_type,
         CASE event_type
           WHEN 'purchase' THEN '{"amt_cents": '
                || CAST(CAST(ROUND(value * 100, 0) AS BIGINT) AS STRING)
                || ', "cur": "usd"}'
           WHEN 'click' THEN '[' || get_json_object(props, '$.k') || ', "pos"]'
           WHEN 'error' THEN 'null'
           ELSE props
         END AS j
  FROM events
),
shred AS (
  -- try_parse_json: raw props can be malformed/empty in real event
  -- streams; parse_json would fail the whole query
  SELECT event_type, try_parse_json(j) AS v FROM payload
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CASE WHEN MIN(schema_of_variant(v)) LIKE 'ARRAY%' THEN 'ARRAY'
            WHEN MIN(schema_of_variant(v)) LIKE 'OBJECT%' THEN 'OBJECT'
            ELSE 'SCALAR' END AS kind,
       CAST(SUM(CASE WHEN is_variant_null(v) THEN 1 ELSE 0 END) AS BIGINT)
           AS n_json_null,
       CAST(SUM(try_variant_get(v, '$.amt_cents', 'bigint')) AS BIGINT)
           AS sum_amt_cents,
       CAST(SUM(try_variant_get(v, '$[0]', 'bigint')) AS BIGINT) AS sum_arr_head,
       CAST(SUM(try_variant_get(v, '$.k', 'bigint')) AS BIGINT) AS sum_k
FROM shred
GROUP BY event_type
ORDER BY event_type
"""


@register(
    "sql_variant_shred",
    oracle="""
    WITH payload AS (
      SELECT event_type,
             CASE event_type
               WHEN 'purchase' THEN '{"amt_cents": '
                    || CAST(CAST(ROUND(value * 100, 0) AS BIGINT) AS VARCHAR)
                    || ', "cur": "usd"}'
               WHEN 'click' THEN '[' || json_extract_string(props, '$.k') || ', "pos"]'
               WHEN 'error' THEN 'null'
               ELSE props
             END AS j
      FROM events
    ),
    shred AS (SELECT event_type,
                     CASE WHEN json_valid(j) THEN j::JSON END AS v
              FROM payload)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CASE WHEN MIN(json_type(v)) = 'ARRAY' THEN 'ARRAY'
                WHEN MIN(json_type(v)) = 'OBJECT' THEN 'OBJECT'
                ELSE 'SCALAR' END AS kind,
           CAST(SUM(CASE WHEN json_type(v) = 'NULL' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_json_null,
           CAST(SUM(CAST(json_extract(v, '$.amt_cents') AS BIGINT)) AS BIGINT)
               AS sum_amt_cents,
           CAST(SUM(CAST(json_extract(v, '$[0]') AS BIGINT)) AS BIGINT)
               AS sum_arr_head,
           CAST(SUM(CAST(json_extract(v, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM shred GROUP BY event_type ORDER BY event_type
    """,
    tags=("sql", "variant", "semi-structured", "modern"),
)
def sql_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT end-to-end: a heterogeneous semi-structured
    payload (object per signup/view, a DIFFERENT object shape per
    purchase, a JSON array per click, a JSON null per error — the
    open-schema mess VARIANT exists for) is parsed once with
    parse_json and shredded with typed-path access: try_variant_get
    for object fields and array positions (missing path -> NULL, no
    error), is_variant_null for JSON-null vs SQL-NULL, and
    schema_of_variant for per-row type introspection. The DuckDB
    oracle recomputes every aggregate through its JSON type, pinning
    that VARIANT's typed extraction semantics agree with the JSON
    reference semantics.

    Scale: VARIANT is the 100 TB answer to schema-on-read — the
    binary encoding is columnar-friendly and the typed gets push into
    the scan (no per-row string re-parse after ingest); everything
    here is row-local shredding into one 5-group aggregate.
    ev_json_extract covers the flat get_json_object path; this covers
    the typed, heterogeneous one."""
    return _sql(spark, sf_dir, _VARIANT_SHRED, ("events",))


_SQL_UDF_DEFS = (
    """CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
       RETURNS DOUBLE RETURN p * (1.0 - d)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION qty_bucket(q DOUBLE)
       RETURNS STRING RETURN CASE WHEN q < 10 THEN 'low'
                                  WHEN q < 30 THEN 'mid' ELSE 'high' END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION tiers(n INT)
       RETURNS TABLE(i INT) RETURN SELECT explode(sequence(1, n))""",
)

_SQL_UDF_QUERY = """
SELECT qty_bucket(l_quantity) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(disc_price(l_extendedprice, l_discount)
                     AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
       (SELECT MAX(i) FROM tiers(5)) AS tier_max
FROM lineitem
GROUP BY qty_bucket(l_quantity)
ORDER BY bucket
"""


@register(
    "sql_udf_suite",
    oracle="""
    SELECT CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                         AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           CAST(5 AS INT) AS tier_max
    FROM lineitem
    GROUP BY 1
    ORDER BY bucket
    """,
    tags=("sql", "udf", "modern"),
)
def sql_udf_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL-defined user functions — the catalog surface that
    replaces JVM-class UDF registration for pure-SQL logic: a scalar
    UDF in an aggregate argument (disc_price), a scalar UDF as a
    GROUPING expression (qty_bucket), and a TABLE-valued SQL UDF
    consumed by a scalar subquery (tiers(5)) all resolve through the
    analyzer and INLINE into the plan (they are Catalyst expression
    substitutions, not black-box calls — predicate pushdown and
    codegen still apply, which is why they beat Python UDFs at 100 TB
    by construction). The oracle recomputes every result with the
    expressions inlined by hand, pinning that the UDF indirection is
    semantically free; revenue accumulates in DECIMAL for exactness
    (dec_sum discipline)."""
    for ddl in _SQL_UDF_DEFS:
        spark.sql(ddl)
    return _sql(spark, sf_dir, _SQL_UDF_QUERY, ("lineitem",))


# named-parameter form runs in Spark via spark.sql(..., args=...);
# the oracle is the same query with the three literals inlined.
_PARAM_SPARK = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN o_totalprice > :price_floor THEN 1 ELSE 0 END)
            AS BIGINT) AS n_big
FROM orders
WHERE o_orderdate >= :date_lo AND o_orderstatus = :status
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""
_PARAM_ARGS = {
    "price_floor": 200000.0,
    "date_lo": "1996-01-01",
    "status": "O",
}
_PARAM_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_big
FROM orders
WHERE o_orderdate >= '1996-01-01' AND o_orderstatus = 'O'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("sql_parameterized", oracle=_PARAM_ORACLE, tags=("sql", "parameterized"))
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (spark.sql(query, args=...), Spark 3.4+) —
    the injection-safe API surface a query service exposes: parameter
    markers (:price_floor, :date_lo, :status) bind as foldable
    literals, so Catalyst constant-folds them and the pushed-filter
    shape is IDENTICAL to the literal query (the oracle runs the
    inlined form — a hash match attests the binding path changes
    nothing). Dates bind as strings and coerce through the normal
    TIMESTAMP comparison rules, same as the literal."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_PARAM_SPARK, args=_PARAM_ARGS)
