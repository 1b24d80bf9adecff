"""Join / set-operation / multi-dimensional aggregation plans.

The reference has no joins (SURVEY.md §2.3) — this module supplies the
full relational surface a user of a crime-analytics engine needs and
the driver's TPC-H-ish oracle exercises: broadcast + sort-merge joins,
semi/anti joins, set ops, rollup, distinct aggregates.

Scale notes baked into every plan:
- Dimension sides (region/nation/supplier — and customer vs lineitem)
  are broadcast explicitly; the big fact-fact join (lineitem⋈orders)
  is a shuffle sort-merge join on the join key, which AQE converts or
  skew-splits at runtime.
- Filters are applied before joins so Catalyst pushes them into the
  parquet scans (verified via .explain PushedFilters).
- Money sums use decimal accumulation (functions/aggs.py) — exact,
  partition-order-independent, bit-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.aggs import dec_sum, dec_sum_sql
from ..operators.rank import global_row_number, ntile_sql
from ..sources.catalog import load_table
from .registry import register

_REVENUE = "l_extendedprice * (1 - l_discount)"


# --------------------------------------------------------------- TPC-H Q1
@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dec_sum_sql('l_quantity', 2)} AS sum_qty,
           {dec_sum_sql('l_extendedprice', 2)} AS sum_base_price,
           {dec_sum_sql(_REVENUE, 6)} AS sum_disc_price,
           {dec_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("joins", "agg"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan → pushed filter →
    partial+final hash aggregate. The workhorse full-scan aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", 2).alias("sum_qty"),
            dec_sum("l_extendedprice", 2).alias("sum_base_price"),
            dec_sum(revenue, 6).alias("sum_disc_price"),
            dec_sum(revenue * (1 + F.col("l_tax")), 6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------- TPC-H Q3
@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {dec_sum_sql(_REVENUE, 6)} AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("joins",),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: filtered customer (small after filter →
    broadcast) ⋈ orders ⋈ lineitem, top-10 revenue orders. The
    lineitem⋈orders equi-join shuffles on orderkey; top-k is
    TakeOrderedAndProject (no global sort)."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1997-01-01")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1997-01-01")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_sum(revenue, 6).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------- TPC-H Q5
@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {dec_sum_sql(_REVENUE, 6)} AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey  = s_suppkey
      JOIN customer ON o_custkey  = c_custkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("joins",),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: five-way star join. All dims (supplier, nation,
    region — and customer, small relative to the facts) broadcast; the
    only shuffle join is lineitem⋈orders on orderkey."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dec_sum(revenue, 6).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# --------------------------------------------------------------- TPC-H Q6
@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {dec_sum_sql('l_extendedprice * l_discount', 6)} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24.0
    """,
    tags=("joins", "filter"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure predicate-pushdown aggregate — every filter
    reaches the parquet scan (PushedFilters), zero joins, one shuffle-
    free partial+final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------- semi/anti
@register(
    "join_semi_urgent_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
    tags=("joins", "semi"),
)
def join_semi_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with ≥1 urgent order. Semi joins ship
    only the key column of the probe side — no payload shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti_orderless_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    tags=("joins", "anti"),
)
def join_anti_orderless_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers that never ordered."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------- set ops
@register(
    "setop_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    ORDER BY o_custkey
    """,
    tags=("setops",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers with finished but no open orders."""
    o = load_table(spark, sf_dir, "orders")
    f_cust = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    o_cust = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_cust.subtract(o_cust).orderBy("o_custkey")


@register(
    "setop_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    ORDER BY o_custkey
    """,
    tags=("setops",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers with both F and P orders."""
    o = load_table(spark, sf_dir, "orders")
    f_cust = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    p_cust = o.where(F.col("o_orderstatus") == "P").select("o_custkey")
    return f_cust.intersect(p_cust).orderBy("o_custkey")


@register(
    "setop_union_all",
    oracle="""
    SELECT c_name AS name, ROUND(c_acctbal, 2) AS acctbal, 'customer' AS side
    FROM customer WHERE c_acctbal > 9000.0
    UNION ALL
    SELECT s_name AS name, ROUND(s_acctbal, 2) AS acctbal, 'supplier' AS side
    FROM supplier WHERE s_acctbal > 9000.0
    ORDER BY name
    """,
    tags=("setops",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL by position (unionByName in the engine) of two
    heterogeneous sources projected to a shared schema."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000.0)
    s = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 9000.0)
    left = c.select(
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("customer").alias("side"),
    )
    right = s.select(
        F.col("s_name").alias("name"),
        F.round("s_acctbal", 2).alias("acctbal"),
        F.lit("supplier").alias("side"),
    )
    return left.unionByName(right).orderBy("name")


# --------------------------------------------------------------- rollup / cube
@register(
    "rollup_priority_status",
    oracle=f"""
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           COUNT(*) AS cnt,
           {dec_sum_sql('o_totalprice', 2)} AS total_sales
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    ORDER BY priority, status
    """,
    tags=("agg", "rollup"),
)
def rollup_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: (priority, status) → (priority) → () in one
    pass — Spark expands grouping sets in a single shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("cnt"), dec_sum("o_totalprice", 2).alias("total_sales"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "cnt",
            "total_sales",
        )
        .orderBy("priority", "status")
    )


@register(
    "cube_segment_nation",
    oracle="""
    SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
           COALESCE(CAST(c_nationkey AS VARCHAR), 'ALL') AS nation,
           COUNT(*) AS cnt
    FROM customer
    GROUP BY CUBE (c_mktsegment, c_nationkey)
    ORDER BY segment, nation
    """,
    tags=("agg", "cube"),
)
def cube_segment_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping sets of (segment, nationkey) in one shuffle."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.cube("c_mktsegment", "c_nationkey")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            F.coalesce(F.col("c_nationkey").cast("string"), F.lit("ALL")).alias("nation"),
            "cnt",
        )
        .orderBy("segment", "nation")
    )


# --------------------------------------------------------------- distinct aggs
@register(
    "distinct_aggs",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("agg", "distinct"),
)
def distinct_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) alongside plain aggregates (Spark expands the
    two-phase distinct aggregate automatically)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "approx_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           TRUE AS approx_within_3rsd
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("agg", "approx", "invariant"),
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB-scale variant
    of distinct counting — mergeable sketch, no exact-distinct shuffle.
    The sketch VALUE differs from DuckDB's HLL, so the oracle anchors
    the EXACT per-group distinct count (computed by both engines) and
    hash-checks the HLL guarantee as a boolean: |approx − exact| ≤
    3·rsd·exact (rsd 0.02; register-max merges make the Spark estimate
    deterministic, so the boolean is stable). Tight ≤2%-error behavior
    stays pinned in tests."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("exact_customers"),
            F.approx_count_distinct("o_custkey", 0.02).alias("approx"),
        )
        .select(
            "o_orderstatus",
            "exact_customers",
            (
                F.abs(F.col("approx") - F.col("exact_customers"))
                <= 0.06 * F.col("exact_customers")
            ).alias("approx_within_3rsd"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "join_left_outer_order_counts",
    oracle="""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY c_custkey
    """,
    tags=("joins", "outer"),
)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (COUNT of a
    right-side key counts 0 for them)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@register(
    "join_full_outer_keys",
    oracle="""
    SELECT COALESCE(a.k, b.k) AS k, a.n_f, b.n_p
    FROM (SELECT o_custkey AS k, COUNT(*) AS n_f FROM orders
          WHERE o_orderstatus = 'F' GROUP BY o_custkey) a
    FULL OUTER JOIN
         (SELECT o_custkey AS k, COUNT(*) AS n_p FROM orders
          WHERE o_orderstatus = 'P' GROUP BY o_custkey) b
      ON a.k = b.k
    ORDER BY k
    """,
    tags=("joins", "outer"),
)
def join_full_outer_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates (null-padded on either side)."""
    o = load_table(spark, sf_dir, "orders")
    a = (
        o.where(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_f"))
    )
    b = (
        o.where(F.col("o_orderstatus") == "P")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_p"))
    )
    return (
        a.join(b, a.k == b.k, "full_outer")
        .select(F.coalesce(a.k, b.k).alias("k"), "n_f", "n_p")
        .orderBy("k")
    )


@register(
    "q4_order_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("joins", "exists"),
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: EXISTS with a non-equi correlated predicate
    (shipped after order date) → left-semi join with a post-join
    condition."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q12_shipmode_buckets",
    oracle="""
    SELECT l_linestatus,
           COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT','2-HIGH'))
             AS high_line_count,
           COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH'))
             AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("joins", "conditional-agg"),
)
def q12_shipmode_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style: conditional counts (CASE inside the aggregate)
    over a fact-fact join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q14_promo_share",
    oracle=f"""
    SELECT ROUND(100.0 * {dec_sum_sql("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 6)}
                 / {dec_sum_sql('l_extendedprice * (1 - l_discount)', 6)}, 6) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    tags=("joins", "ratio"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style: ratio of conditional revenue to total revenue
    (broadcast part dim; exact decimal sums on both numerator and
    denominator before the one double division)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = load_table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), revenue).otherwise(F.lit(0.0))
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return joined.agg(
        F.round(100.0 * dec_sum(promo, 6) / dec_sum(revenue, 6), 6).alias("promo_share")
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT {dec_sum_sql('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_type = 'PROMO' AND l_discount >= 0.05)
    """,
    tags=("joins", "disjunctive"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: disjunction of conjunctive multi-table
    predicates — Catalyst extracts the common join key so the OR does
    not force a cartesian product (pinned by the no-cartesian test)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | ((F.col("p_type") == "PROMO") & (F.col("l_discount") >= 0.05))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(dec_sum(revenue, 6).alias("revenue"), F.count("*").alias("n_items"))
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT seg_prefix, COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM (
      SELECT substring(c_mktsegment, 1, 2) AS seg_prefix, c_acctbal, c_custkey
      FROM customer
      WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    )
    GROUP BY seg_prefix
    ORDER BY seg_prefix
    """,
    tags=("joins", "exists", "subquery"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: rich customers with no URGENT orders — substring
    grouping + scalar subquery threshold + anti join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("t"))
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT")
    rich = (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("t"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
    )
    return (
        rich.groupBy(F.substring("c_mktsegment", 1, 2).alias("seg_prefix"))
        .agg(
            F.count("*").alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_bal"),
        )
        .orderBy("seg_prefix")
    )


# ------------------------------------------------------- skew mitigation
@register(
    "j_salted_skew_agg",
    oracle="""
    SELECT r_name, COUNT(*) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders JOIN region ON o_custkey % 3 = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
    tags=("joins", "skew"),
)
def j_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join under planted skew, oracle-checked against the plain
    join it must equal. ``o_custkey % 3`` funnels every order onto 3
    hot keys (the degenerate case where a plain shuffle join sends
    ~N/3 rows to one reducer); ``salted_join`` spreads each hot key
    over 8 salt buckets, and the aggregate after de-salt must be
    bit-identical to the unsalted DuckDB join. AQE's skew splitting
    covers the mild cases at runtime — this is the explicit tool for
    keys too hot for one task even after AQE (operators/skew.py)."""
    from ..operators.skew import salted_join

    o = load_table(spark, sf_dir, "orders").withColumn(
        "hot_key", (F.col("o_custkey") % 3).cast("int")
    )
    r = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("hot_key"), "r_name"
    )
    return (
        salted_join(o, r, "hot_key", n_salt=8)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("r_name")
    )


# ------------------------------------------------- runtime bloom filter
@register(
    "j_runtime_bloom_join",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           {dec_sum_sql(_REVENUE, 6)} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1995-02-01'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("joins", "runtime_filter"),
)
def j_runtime_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective-dimension fact join — the shape Spark's runtime
    bloom-filter injection (SPARK-32268) exists for: the month filter
    on orders makes the build side tiny relative to the lineitem scan,
    so with ``spark.sql.optimizer.runtime.bloomFilter.enabled`` a
    bloom_filter_agg over the filtered o_orderkey set is planted under
    the lineitem scan and discards ~99% of fact rows before the join
    shuffle.  On a 100 TB fact that is the difference between
    shuffling the whole table and shuffling one month of it.

    The plan is declared conf-independently (results identical either
    way; the oracle is the plain join) — tests/test_plan_linter.py
    pins that the bloom filter IS injected once broadcast is off and
    the thresholds admit the build side, and that the filtered result
    still matches the unfiltered plan exactly despite the bloom's
    false-positive rate (FPs only pass rows to the exact join, never
    into the result)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1995-02-01")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            ),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------- join strategy hints
@register(
    "j_strategy_hints",
    oracle="""
    WITH agg AS (
      SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT s.strategy, a.n_name, a.n_cust, a.bal
    FROM agg a CROSS JOIN (VALUES ('broadcast'), ('merge'), ('shuffle_hash')) AS s(strategy)
    ORDER BY s.strategy, a.n_name
    """,
    tags=("joins", "hints"),
)
def j_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same customer⋈nation aggregate executed under all three
    join-strategy hints — BROADCAST, MERGE (sort-merge), SHUFFLE_HASH
    — unioned with a strategy label.  Semantics are hint-invariant
    (the oracle is one plain join replicated per label); what the
    hints change is the physical node, pinned in
    tests/test_plans.py::test_strategy_hints_bind: the broadcast arm
    plans BroadcastHashJoin, the merge arm SortMergeJoin, the
    shuffle_hash arm ShuffledHashJoin.

    Why this is registry-worthy: at 100 TB the hint surface is the
    manual override when AQE's estimates are wrong (a dimension just
    over the broadcast threshold, a sort-merge where the build side
    fits in memory) — declaring it here keeps the override path
    tested, not folklore."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")

    def arm(hint: str, label: str) -> DataFrame:
        return (
            c.join(n.hint(hint), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(
                F.count("*").alias("n_cust"),
                F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                .cast("double")
                .alias("bal"),
            )
            .select(F.lit(label).alias("strategy"), "n_name", "n_cust", "bal")
        )

    return (
        arm("broadcast", "broadcast")
        .unionAll(arm("merge", "merge"))
        .unionAll(arm("shuffle_hash", "shuffle_hash"))
        .orderBy("strategy", "n_name")
    )


@register(
    "setop_multiset_all",
    oracle="""
    WITH i AS (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    ), e AS (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS multiplicity, 'intersect_all' AS op
    FROM i GROUP BY o_custkey
    UNION ALL
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS multiplicity, 'except_all' AS op
    FROM e GROUP BY o_custkey
    ORDER BY op, o_custkey
    """,
    tags=("setops", "multiset"),
)
def setop_multiset_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations — INTERSECT ALL / EXCEPT ALL keep
    per-key multiplicities (min(m,n) and max(m−n,0)) where the
    distinct forms collapse to membership; the SQL:1999 semantics both
    engines implement natively (Spark ``intersectAll``/``exceptAll``).
    Multiplicities are re-aggregated per key so the hash compare is
    order-insensitive over what is otherwise a duplicate-bearing bag.
    One shuffle per operand pair on the key, same as the distinct
    forms — multiplicity tracking rides the existing aggregate."""
    o = load_table(spark, sf_dir, "orders")
    f_cust = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    o_cust = o.where(F.col("o_orderstatus") == "O").select("o_custkey")

    def counted(df: DataFrame, op: str) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count("*").alias("multiplicity"), F.lit(op).alias("op")
        )

    return (
        counted(f_cust.intersectAll(o_cust), "intersect_all")
        .unionAll(counted(f_cust.exceptAll(o_cust), "except_all"))
        .orderBy("op", "o_custkey")
    )


@register(
    "j_rfm_segmentation",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS monetary
      FROM orders GROUP BY o_custkey),
    scored AS (
      SELECT o_custkey,
             ntile(5) OVER (ORDER BY last_order, o_custkey) AS r_q,
             ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_q,
             ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_q
      FROM rfm)
    SELECT r_q, f_q, m_q, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM scored GROUP BY r_q, f_q, m_q
    ORDER BY r_q, f_q, m_q
    """,
    tags=("analytics", "segmentation", "window"),
)
def j_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency (last order date),
    frequency (order count), monetary (decimal-exact spend) quintiled
    by ntile(5), reported as the segment-occupancy cube. Tie-breaks by
    custkey make every quintile boundary deterministic; monetary sums
    accumulate in DECIMAL so the ranking never depends on float
    summation order (the q1_pricing_summary discipline).

    The oracle keeps the three ntile windows (DuckDB sorts
    single-node by definition), but the Spark plan computes the
    IDENTICAL tile ids without any single-partition sort: three passes
    of the shared range-partitioned prefix-sum rank
    (operators/rank.py) give each customer its exact global rank per
    dimension, and ntile's closed form over (rank, n, 5) — the first
    n%5 tiles hold ceil(n/5) rows, the rest floor(n/5) — reproduces
    the window function bit-for-bit in integer arithmetic (the
    dp_equidepth_hist2d technique)."""
    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        dec_sum("o_totalprice", 4).alias("monetary"),
    )
    g1, n = global_row_number(rfm, ["last_order", "o_custkey"], out_col="gr")
    g2, _ = global_row_number(g1, ["frequency", "o_custkey"], out_col="gf")
    g3, _ = global_row_number(g2, ["monetary", "o_custkey"], out_col="gm")
    scored = g3.select(
        "o_custkey",
        F.expr(ntile_sql("gr", n, 5)).alias("r_q"),
        F.expr(ntile_sql("gf", n, 5)).alias("f_q"),
        F.expr(ntile_sql("gm", n, 5)).alias("m_q"),
    )
    return (
        scored.groupBy("r_q", "f_q", "m_q")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
        .orderBy("r_q", "f_q", "m_q")
    )


@register(
    "j_hierarchy_share",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY r.r_name, n.n_name)
    SELECT region, nation, ROUND(revenue, 2) AS revenue,
           ROUND(revenue / SUM(revenue) OVER (PARTITION BY region), 6)
             AS share_of_region,
           ROUND(revenue / SUM(revenue) OVER (), 6) AS share_of_total
    FROM rev ORDER BY region, nation
    """,
    tags=("analytics", "hierarchy", "window"),
)
def j_hierarchy_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent over the geographic hierarchy: nation revenue
    as a share of its region and of the whole — the ratio-to-report
    OLAP shape, two window levels over the ALREADY-AGGREGATED
    (region, nation) rollup. The base joins broadcast the three
    dimension tables (kilobytes at any scale factor); the windows run
    on ≤|nations| rows, so the empty-frame global window is
    model-sized, not a data sort. Revenue accumulates in DECIMAL
    before the single double division per ratio — both engines
    divide identical numbers."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(dec_sum("o_totalprice", 2).alias("revenue"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.col("revenue") / F.sum("revenue").over(w_region), 6).alias(
            "share_of_region"
        ),
        F.round(F.col("revenue") / F.sum("revenue").over(w_all), 6).alias(
            "share_of_total"
        ),
    ).orderBy("region", "nation")


_HAVERSINE = (
    "ROUND(6371.0 * 2 * ASIN(SQRT("
    "POWER(SIN(RADIANS(blat - alat) / 2), 2)"
    " + COS(RADIANS(alat)) * COS(RADIANS(blat))"
    " * POWER(SIN(RADIANS(blon - alon) / 2), 2))), 6)"
)

@register(
    "j_spatial_grid_join",
    oracle=f"""
    WITH pts0 AS (
        SELECT c_custkey AS key,
               CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)
                    AS BIGINT) % 1200000 / 10000.0 - 60.0 AS lat,
               CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 9, 8)
                    AS BIGINT) % 3600000 / 10000.0 - 180.0 AS lon
        FROM customer
    ),
    pts AS (
        SELECT key, lat, lon FROM pts0
        UNION ALL
        SELECT key + 20000000, lat + 0.001, lon + 0.001
        FROM pts0 WHERE key < 3
    ),
    cells AS (
        SELECT key, lat, lon,
               CAST(floor(lat / 0.1) AS BIGINT) AS cx,
               CAST(floor(lon / 0.1) AS BIGINT) AS cy
        FROM pts
    ),
    probes AS (
        SELECT key, lat, lon, cx + dx.d AS px, cy + dy.d AS py
        FROM cells,
             (VALUES (-1), (0), (1)) dx(d),
             (VALUES (-1), (0), (1)) dy(d)
    ),
    pairs AS (
        SELECT a.key AS key_a, b.key AS key_b,
               a.lat AS alat, a.lon AS alon,
               b.lat AS blat, b.lon AS blon
        FROM probes a JOIN cells b
          ON a.px = b.cx AND a.py = b.cy AND a.key < b.key
        WHERE (a.lat - b.lat) * (a.lat - b.lat)
              + (a.lon - b.lon) * (a.lon - b.lon) <= 0.01
    )
    SELECT key_a, key_b, {_HAVERSINE} AS dist_km
    FROM pairs ORDER BY key_a, key_b
    """,
    tags=("join", "spatial", "grid"),
)
def j_spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial neighbor self-join via grid blocking — the scale-correct
    shape for 'find all point pairs within radius R' on a cluster: each
    point lands in a floor(coord/cell) grid cell, the LEFT side
    replicates to its 3x3 neighborhood (explode — the banded-join trick
    LSH uses), and an EQUI-join on the cell key does the candidate
    generation, so candidates are cell-local and the all-pairs
    quadratic never materializes. The radius decision uses pure
    squared-degree arithmetic (exact same doubles in both engines — no
    transcendental on the row-selection path); haversine km distance
    is computed only as a REPORTED column. Each qualifying pair
    surfaces exactly once: the probe side owns the pair via key_a <
    key_b and the 9 probe cells are distinct.

    Points are synthesized deterministically from the shared md5
    hex-int primitive (two non-overlapping digest slices for lat/lon),
    identical in both engines; three planted twins (+0.001 deg, ~150 m)
    guarantee matches at every fixture scale (the natural pair count
    at sf0.001's 150 points is ~0), while sf0.1's 15k points also
    surface genuinely-near natural pairs. Longitude seam (+-180) pairs
    are out of scope by construction — stated semantics.

    Reference analog: none (the reference has no joins at all); this
    extends the engine's join surface the way dedup's LSH extends
    exact dedup."""
    cust = load_table(spark, sf_dir, "customer")
    h1 = (
        "CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 1, 8), 16, 10)"
        " AS BIGINT)"
    )
    h2 = (
        "CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 9, 8), 16, 10)"
        " AS BIGINT)"
    )
    pts0 = cust.select(
        F.col("c_custkey").alias("key"),
        F.expr(f"{h1} % 1200000 / 10000.0 - 60.0").alias("lat"),
        F.expr(f"{h2} % 3600000 / 10000.0 - 180.0").alias("lon"),
    )
    planted = pts0.where(F.col("key") < 3).select(
        (F.col("key") + 20000000).alias("key"),
        (F.col("lat") + 0.001).alias("lat"),
        (F.col("lon") + 0.001).alias("lon"),
    )
    cells = pts0.unionByName(planted).select(
        "key",
        "lat",
        "lon",
        F.expr("CAST(floor(lat / 0.1) AS BIGINT)").alias("cx"),
        F.expr("CAST(floor(lon / 0.1) AS BIGINT)").alias("cy"),
    )
    probes = (
        cells.select(
            "key", "lat", "lon", "cx", "cy",
            F.explode(F.expr("array(-1, 0, 1)")).alias("dx"),
        )
        .select(
            "key", "lat", "lon", "cx", "cy", "dx",
            F.explode(F.expr("array(-1, 0, 1)")).alias("dy"),
        )
        .select(
            F.col("key").alias("a_key"),
            F.col("lat").alias("alat"),
            F.col("lon").alias("alon"),
            (F.col("cx") + F.col("dx")).alias("px"),
            (F.col("cy") + F.col("dy")).alias("py"),
        )
    )
    b = cells.select(
        F.col("key").alias("b_key"),
        F.col("lat").alias("blat"),
        F.col("lon").alias("blon"),
        "cx",
        "cy",
    )
    pairs = probes.join(
        b,
        (F.col("px") == F.col("cx"))
        & (F.col("py") == F.col("cy"))
        & (F.col("a_key") < F.col("b_key")),
    ).where(
        F.expr(
            "(alat - blat) * (alat - blat)"
            " + (alon - blon) * (alon - blon) <= 0.01"
        )
    )
    return pairs.select(
        F.col("a_key").alias("key_a"),
        F.col("b_key").alias("key_b"),
        F.expr(_HAVERSINE).alias("dist_km"),
    ).orderBy("key_a", "key_b")


def _audit_cte(name: str, left_sql: str, right_sql: str) -> str:
    """One join-cardinality audit as SQL text: per-key counts on each
    side, full-outer merged; all statistics are exact integers."""
    return f"""
    SELECT '{name}' AS join_name,
           CAST(SUM(COALESCE(cl, 0)) AS BIGINT) AS left_rows,
           CAST(SUM(COALESCE(cr, 0)) AS BIGINT) AS right_rows,
           CAST(COUNT(cl) AS BIGINT) AS l_distinct_keys,
           CAST(COUNT(cr) AS BIGINT) AS r_distinct_keys,
           CAST(MAX(COALESCE(cl, 0)) AS BIGINT) AS l_max_fanout,
           CAST(MAX(COALESCE(cr, 0)) AS BIGINT) AS r_max_fanout,
           CAST(SUM(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL
                    THEN cl * cr ELSE 0 END) AS BIGINT) AS joined_rows,
           CAST(SUM(CASE WHEN cr IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS left_only_keys,
           CAST(SUM(CASE WHEN cl IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS right_only_keys,
           CASE WHEN MAX(COALESCE(cl, 0)) <= 1
                     AND MAX(COALESCE(cr, 0)) <= 1 THEN '1:1'
                WHEN MAX(COALESCE(cl, 0)) <= 1 THEN '1:N'
                WHEN MAX(COALESCE(cr, 0)) <= 1 THEN 'N:1'
                ELSE 'M:N' END AS relationship,
           ROUND(CAST(SUM(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL
                          THEN cl * cr ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(COALESCE(cl, 0)) AS DOUBLE), 6) AS blowup
    FROM (
        SELECT l.k AS lk, l.cl, r.cr
        FROM ({left_sql}) l FULL OUTER JOIN ({right_sql}) r ON l.k = r.k
    )"""

_AUDITS = [
    ("orders_lineitem_orderkey",
     "SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS cl FROM orders GROUP BY 1",
     "SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS cr FROM lineitem GROUP BY 1"),
    ("customer_orders_custkey",
     "SELECT c_custkey AS k, CAST(COUNT(*) AS BIGINT) AS cl FROM customer GROUP BY 1",
     "SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS cr FROM orders GROUP BY 1"),
    ("lineitem_part_partkey",
     "SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS cl FROM lineitem GROUP BY 1",
     "SELECT p_partkey AS k, CAST(COUNT(*) AS BIGINT) AS cr FROM part GROUP BY 1"),
    ("events_orders_userkey_TRAP",
     "SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS cl FROM events GROUP BY 1",
     "SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS cr FROM orders GROUP BY 1"),
]

@register(
    "j_join_cardinality_audit",
    oracle="\n    UNION ALL\n".join(
        _audit_cte(n, l, r) for n, l, r in _AUDITS
    ) + "\n    ORDER BY join_name",
    tags=("join", "audit", "cardinality"),
)
def j_join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality audit — the report to run BEFORE committing a
    production join: per side, row and distinct-key counts and max
    per-key fanout; the would-be joined row count (computed as
    SUM(cl*cr) over the key-level count merge, NEVER by materializing
    the join); orphan keys on each side; the inferred relationship
    (1:1 / 1:N / N:1 / M:N); and the blowup factor. Four audits ship
    in one result, three healthy (orders-lineitem 1:N,
    customer-orders 1:N, lineitem-part N:1) and one deliberate TRAP —
    events.user_id joined to orders.o_custkey, the classic
    plausible-looking key mismatch. The audit catches it on TWO
    signals (measured at sf0.01): it is the only M:N in the set
    (healthy joins classify 1:N / 1:N / N:1 with max fanout 1 on
    their one-side), and 1350 of the 1500 custkeys are right-only
    orphans — the key DOMAINS barely overlap, the signature of
    joining semantically different identifiers. That contrast is the
    vacuity assertion.

    Scale shape: each side collapses to per-key counts in a
    partial-aggregated groupBy; the merge is a key-level full-outer
    hash join; every statistic is an exact integer (the only float is
    the final blowup ratio). The 100 TB join itself is never
    executed."""
    parts = []
    for name, lsql, rsql in _AUDITS:
        ltab = lsql.split("FROM ")[1].split(" GROUP")[0]
        rtab = rsql.split("FROM ")[1].split(" GROUP")[0]
        lkey = lsql.split("SELECT ")[1].split(" AS")[0]
        rkey = rsql.split("SELECT ")[1].split(" AS")[0]
        lf = (
            load_table(spark, sf_dir, ltab)
            .groupBy(F.col(lkey).alias("k"))
            .agg(F.count("*").cast("bigint").alias("cl"))
        )
        rf = (
            load_table(spark, sf_dir, rtab)
            .groupBy(F.col(rkey).alias("k"))
            .agg(F.count("*").cast("bigint").alias("cr"))
        )
        merged = lf.join(rf, "k", "full_outer")
        parts.append(
            merged.agg(
                F.lit(name).alias("join_name"),
                F.sum(F.coalesce("cl", F.lit(0))).cast("bigint").alias("left_rows"),
                F.sum(F.coalesce("cr", F.lit(0))).cast("bigint").alias("right_rows"),
                F.count("cl").cast("bigint").alias("l_distinct_keys"),
                F.count("cr").cast("bigint").alias("r_distinct_keys"),
                F.max(F.coalesce("cl", F.lit(0))).cast("bigint").alias("l_max_fanout"),
                F.max(F.coalesce("cr", F.lit(0))).cast("bigint").alias("r_max_fanout"),
                F.sum(
                    F.expr(
                        "CASE WHEN cl IS NOT NULL AND cr IS NOT NULL"
                        " THEN cl * cr ELSE 0 END"
                    )
                ).cast("bigint").alias("joined_rows"),
                F.sum(F.expr("CASE WHEN cr IS NULL THEN 1 ELSE 0 END"))
                .cast("bigint").alias("left_only_keys"),
                F.sum(F.expr("CASE WHEN cl IS NULL THEN 1 ELSE 0 END"))
                .cast("bigint").alias("right_only_keys"),
                F.expr(
                    "CASE WHEN MAX(COALESCE(cl, 0)) <= 1"
                    " AND MAX(COALESCE(cr, 0)) <= 1 THEN '1:1'"
                    " WHEN MAX(COALESCE(cl, 0)) <= 1 THEN '1:N'"
                    " WHEN MAX(COALESCE(cr, 0)) <= 1 THEN 'N:1'"
                    " ELSE 'M:N' END"
                ).alias("relationship"),
                F.expr(
                    "ROUND(CAST(SUM(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL"
                    " THEN cl * cr ELSE 0 END) AS DOUBLE)"
                    " / CAST(SUM(COALESCE(cl, 0)) AS DOUBLE), 6)"
                ).alias("blowup"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("join_name")


@register(
    "j_spatial_hotspots",
    oracle="""
    WITH pts0 AS (
        SELECT c_custkey AS key,
               CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)
                    AS BIGINT) % 1200000 / 10000.0 - 60.0 AS lat,
               CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 9, 8)
                    AS BIGINT) % 3600000 / 10000.0 - 180.0 AS lon
        FROM customer
    ),
    pts AS (
        SELECT key, lat, lon FROM pts0
        UNION ALL
        SELECT 30000000 + r, 10.1234 + r * 0.0001, 20.5678 + r * 0.0001
        FROM range(80) t(r)
    ),
    cells AS (
        SELECT CAST(floor(lat / 10.0) AS BIGINT) AS cx,
               CAST(floor(lon / 10.0) AS BIGINT) AS cy,
               CAST(COUNT(*) AS BIGINT) AS n_points
        FROM pts GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(n_points) AS n FROM cells)
    SELECT c.cx, c.cy, c.n_points,
           ROUND(CAST(t.n AS DOUBLE) / 432.0, 6) AS expected,
           ROUND((CAST(c.n_points AS DOUBLE) - CAST(t.n AS DOUBLE) / 432.0)
                 / SQRT(CAST(t.n AS DOUBLE) / 432.0), 6) AS z
    FROM cells c, tot t
    WHERE CAST(c.n_points AS DOUBLE)
          > CAST(t.n AS DOUBLE) / 432.0
            + 5.0 * SQRT(CAST(t.n AS DOUBLE) / 432.0) + 1.0
    ORDER BY c.cx, c.cy
    """,
    tags=("spatial", "hotspot", "anomaly"),
)
def j_spatial_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial hotspot detection — flag grid cells whose point count
    exceeds the uniform-Poisson expectation by 5 sigma (+1 discrete
    floor): the density-anomaly scan behind fraud rings, outage
    clusters, and geo bot farms, and the aggregate-level counterpart
    to j_spatial_grid_join's pairwise search. Points reuse that
    query's deterministic md5 synthesis over 10-degree cells (the
    12x36 = 432-cell domain keeps the per-cell expectation
    detectable at every fixture scale); an 80-point cluster is planted
    inside one cell in both engines.

    Vacuity: the planted cell is the ONLY flag at all three scales
    (measured) — at sf0.1 it must clear the threshold on top of its own
    ~35-point uniform base rate (a 40-point plant did NOT — measured), and the 5-sigma+1 threshold leaves the 431 background cells
    silent, so the detector separates signal from Poisson noise
    rather than flagging everything or nothing.

    Scale shape: one partial-aggregated groupBy collapses the corpus
    to <=432 cells; the expectation is a one-row broadcast scalar."""
    cust = load_table(spark, sf_dir, "customer")
    h1 = (
        "CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 1, 8), 16, 10)"
        " AS BIGINT)"
    )
    h2 = (
        "CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 9, 8), 16, 10)"
        " AS BIGINT)"
    )
    pts = cust.select(
        F.expr(f"{h1} % 1200000 / 10000.0 - 60.0").alias("lat"),
        F.expr(f"{h2} % 3600000 / 10000.0 - 180.0").alias("lon"),
    ).unionByName(
        spark.range(80).select(
            (F.lit(10.1234) + F.col("id") * 0.0001).alias("lat"),
            (F.lit(20.5678) + F.col("id") * 0.0001).alias("lon"),
        )
    )
    cells = pts.select(
        F.expr("CAST(floor(lat / 10.0) AS BIGINT)").alias("cx"),
        F.expr("CAST(floor(lon / 10.0) AS BIGINT)").alias("cy"),
    ).groupBy("cx", "cy").agg(F.count("*").cast("bigint").alias("n_points"))
    tot = cells.agg(F.sum("n_points").alias("n"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .where(
            F.expr(
                "CAST(n_points AS DOUBLE) > CAST(n AS DOUBLE) / 432.0"
                " + 5.0 * SQRT(CAST(n AS DOUBLE) / 432.0) + 1.0"
            )
        )
        .select(
            "cx",
            "cy",
            "n_points",
            F.expr("ROUND(CAST(n AS DOUBLE) / 432.0, 6)").alias("expected"),
            F.expr(
                "ROUND((CAST(n_points AS DOUBLE) - CAST(n AS DOUBLE) / 432.0)"
                " / SQRT(CAST(n AS DOUBLE) / 432.0), 6)"
            ).alias("z"),
        )
        .orderBy("cx", "cy")
    )


def _geohash_v(div: str) -> str:
    """25-bit geohash integer: lon/lat quantized to 13/12 bits and
    bit-interleaved (lon first — the geohash spec) with pure div/mod
    arithmetic, no engine-specific bit operators. ``div`` is the only
    dialect difference ('//' DuckDB, 'DIV' Spark)."""
    terms = []
    for i in range(25):
        if i % 2 == 0:
            k, src = 12 - i // 2, "li"
        else:
            k, src = 11 - (i - 1) // 2, "la"
        terms.append(f"(({src} {div} {2 ** k}) % 2) * {2 ** (24 - i)}")
    return " + ".join(terms)


def _geohash_chars(div: str) -> str:
    """Base32 (geohash alphabet) rendering of the 25-bit integer v as
    5 characters; substr/||/CAST parse identically in both engines."""
    return " || ".join(
        "substr('0123456789bcdefghjkmnpqrstuvwxyz',"
        f" CAST((v {div} {2 ** (5 * (4 - j))}) % 32 AS INT) + 1, 1)"
        for j in range(5)
    )


@register(
    "j_geohash_rollup",
    oracle=f"""
    WITH pts0 AS (
        SELECT c_custkey AS key,
               CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8)
                    AS BIGINT) % 1200000 / 10000.0 - 60.0 AS lat,
               CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 9, 8)
                    AS BIGINT) % 3600000 / 10000.0 - 180.0 AS lon
        FROM customer
        UNION ALL
        SELECT -1, 57.64911, 10.40744
    ),
    quant AS (
        SELECT key,
               CAST(floor((lon + 180.0) / 360.0 * 8192) AS BIGINT) AS li,
               CAST(floor((lat + 90.0) / 180.0 * 4096) AS BIGINT) AS la
        FROM pts0
    ),
    coded AS (
        SELECT key, {_geohash_v("//")} AS v FROM quant
    ),
    hashed AS (
        SELECT key, {_geohash_chars("//")} AS gh5 FROM coded
    ),
    fanned AS (
        SELECT p.p AS precision, substr(h.gh5, 1, p.p) AS prefix
        FROM hashed h, (VALUES (1), (2), (3)) p(p)
        WHERE h.key <> -1
    ),
    counted AS (
        SELECT precision, prefix, CAST(COUNT(*) AS BIGINT) AS n_points
        FROM fanned GROUP BY precision, prefix
    ),
    ranked AS (
        SELECT precision, prefix, n_points,
               CAST(ROW_NUMBER() OVER (PARTITION BY precision
                                       ORDER BY n_points DESC, prefix)
                    AS INT) AS rk
        FROM counted
    )
    SELECT precision, prefix, n_points, rk FROM ranked WHERE rk <= 10
    UNION ALL
    SELECT 0, gh5, CAST(1 AS BIGINT), 1 FROM hashed WHERE key = -1
    ORDER BY precision, rk
    """,
    tags=("join", "spatial", "geohash", "layout"),
)
def j_geohash_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encoding + prefix density rollup — the cell key a 100 TB
    geospatial table PARTITIONS and range-prunes by (geohash prefix
    ranges are lat/lon boxes, so `WHERE prefix LIKE 'u4%'` becomes
    file-level pruning): lon/lat quantize to 13/12 bits, bit-interleave
    lon-first, base32-render 5 chars — all in pure div/mod arithmetic
    (no engine bit operators), so both engines compute the identical
    code. The planted (57.64911, 10.40744) literal must encode to
    'u4pru' (the geohash reference test vector) and surfaces as the
    precision-0 row — the encode correctness is pinned inside the
    hashed result, not just in pytest.

    Points reuse j_spatial_grid_join's md5-slice synthesis (same
    primitive, same coordinates); the rollup reports top-10 densest
    prefixes at precisions 1-3 (deterministic ties by prefix).

    Scale shape: one scan -> explode to 3 precision rows per point ->
    one partial-aggregated groupBy(precision, prefix) (cardinality
    <= 32^3 + 32^2 + 32 by construction) -> per-precision window over
    the bounded count relation. Nothing data-sized crosses a second
    shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    h1 = (
        "CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 1, 8), 16, 10)"
        " AS BIGINT)"
    )
    h2 = (
        "CAST(conv(substring(md5(CAST(c_custkey AS STRING)), 9, 8), 16, 10)"
        " AS BIGINT)"
    )
    pts = cust.select(
        F.col("c_custkey").alias("key"),
        F.expr(f"{h1} % 1200000 / 10000.0 - 60.0").alias("lat"),
        F.expr(f"{h2} % 3600000 / 10000.0 - 180.0").alias("lon"),
    ).unionByName(
        spark.range(1).select(
            F.lit(-1).cast("long").alias("key"),
            F.lit(57.64911).alias("lat"),
            F.lit(10.40744).alias("lon"),
        )
    )
    hashed = (
        pts.select(
            "key",
            F.expr(
                "CAST(floor((lon + 180.0) / 360.0 * 8192) AS BIGINT)"
            ).alias("li"),
            F.expr(
                "CAST(floor((lat + 90.0) / 180.0 * 4096) AS BIGINT)"
            ).alias("la"),
        )
        .select("key", F.expr(_geohash_v("DIV")).alias("v"))
        .select("key", F.expr(_geohash_chars("DIV")).alias("gh5"))
    )
    fanned = hashed.where(F.col("key") != -1).select(
        F.explode(F.expr("array(1, 2, 3)")).alias("precision"), "gh5"
    ).select("precision", F.expr("substr(gh5, 1, precision)").alias("prefix"))
    counted = fanned.groupBy("precision", "prefix").agg(
        F.count("*").cast("bigint").alias("n_points")
    )
    w = Window.partitionBy("precision").orderBy(
        F.col("n_points").desc(), "prefix"
    )
    ranked = counted.select(
        "precision", "prefix", "n_points",
        F.row_number().over(w).cast("int").alias("rk"),
    ).where(F.col("rk") <= 10)
    vector_row = hashed.where(F.col("key") == -1).select(
        F.lit(0).alias("precision"),
        F.col("gh5").alias("prefix"),
        F.lit(1).cast("bigint").alias("n_points"),
        F.lit(1).cast("int").alias("rk"),
    )
    return ranked.unionByName(vector_row).orderBy("precision", "rk")


def write_month_partitioned_lineitem(spark: SparkSession, sf_dir: str, store: str) -> None:
    """Persist lineitem partitioned by ship month — the layout a
    100 TB fact table actually uses (directory-per-month), which is
    what makes dynamic partition pruning possible at all."""
    li = load_table(spark, sf_dir, "lineitem")
    (
        li.withColumn(
            "ship_month", F.date_format("l_shipdate", "yyyy-MM")
        )
        .write.mode("overwrite")
        .partitionBy("ship_month")
        .parquet(store)
    )


def build_dpp_join(spark: SparkSession, sf_dir: str, store: str) -> DataFrame:
    """The DPP-shaped join: partitioned fact x selective tiny dim on
    the PARTITION column. Catalyst inserts a dynamicpruning#
    subquery into the fact scan's PartitionFilters (pinned in
    tests/test_new_analytics.py), so only the dim's ~6 months of
    files are read at runtime — the difference between scanning 6
    and 82 months of a 100 TB table."""
    fact = spark.read.parquet(store)
    dim = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") < "1995-07-01")
        )
        .select(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .distinct()
    )
    return (
        fact.join(dim, fact["ship_month"] == dim["month"])
        .groupBy("ship_month")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.round(
                F.sum(
                    F.expr(
                        "CAST(l_extendedprice * (1 - l_discount)"
                        " AS DECIMAL(28,6))"
                    )
                ).cast("double"),
                2,
            ).alias("revenue"),
        )
        .orderBy("ship_month")
    )


@register(
    "j_dynamic_partition_pruning",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS month
      FROM orders
      WHERE o_orderpriority = '1-URGENT'
        AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'),
    fact AS (
      SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
             l_extendedprice, l_discount
      FROM lineitem)
    SELECT ship_month,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(28,6))) AS DOUBLE), 2) AS revenue
    FROM fact JOIN dim ON fact.ship_month = dim.month
    GROUP BY ship_month ORDER BY ship_month
    """,
    tags=("join", "dpp", "partition-pruning", "layout"),
)
def j_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning end to end — the runtime half of the
    pruning story the engine already pins statically (IVFPQ's
    driver-side IN-list gives STATIC PartitionFilters; DPP is the
    case where the pruning values are only known after running the
    dim-side filter, so Catalyst wires the broadcast result INTO the
    fact scan as a dynamicpruning# subquery filter). The query
    writes lineitem month-partitioned (the honest 100 TB layout),
    then joins it to the selective urgent-H1-1995 month dim on the
    partition column: only ~6 of ~82 month directories are read.

    Result semantics are layout-independent (revenue per qualifying
    ship month, exact decimal sums), which is exactly what the
    DuckDB oracle checks; the dynamicpruning# plan pin lives in the
    vacuity guard, which rebuilds the join against the same
    partitioned store and inspects the executed plan.

    The dp_ann_ivfpq store-lifecycle discipline applies: write,
    probe, collect, delete."""
    import shutil
    import tempfile

    store = tempfile.mkdtemp(prefix="dpp_lineitem_")
    try:
        write_month_partitioned_lineitem(spark, sf_dir, store)
        rows = build_dpp_join(spark, sf_dir, store).collect()
    finally:
        shutil.rmtree(store, ignore_errors=True)
    return spark.createDataFrame(
        rows, "ship_month string, n_items bigint, revenue double"
    ).orderBy("ship_month")
