"""Extended TPC-H query shapes over the test tables.

The reference never joins in-engine (SURVEY.md §2.3 — its joins are
imperative Python, e.g. /root/reference/src/pipeline.py:203-213 and
/root/reference/src/api/routes/documents.py:64-65); these queries exercise
the remaining classic join/aggregate shapes a complete relational engine
must handle, beyond the Q1/Q3/Q4/Q5/Q6/Q17 shapes in plans/relational.py:

- Q7  : two aliases of one dimension (nation) on different join paths
- Q10 : 4-way join + group-by + top-k on an aggregate
- Q13 : LEFT join preserving empty groups + distribution-of-counts
- Q14 : conditional aggregation (promo share) over a join
- Q15 : aggregate → join → global-max filter (scalar subquery shape)
- Q18 : HAVING on a fact-table aggregate, then enrichment joins
- Q19 : disjunctive multi-column predicate (OR-of-ANDs) pushdown

The driver's tables omit partsupp / l_shipmode / l_commitdate /
p_container / c_phone, so Q2/Q8/Q9/Q11/Q12/Q16/Q19-to-spec/Q20/Q21/Q22
cannot be posed verbatim; Q19 here keeps the OR-of-ANDs shape on the
columns that exist. Money math follows the exact-cents convention
(functions/money.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import cents as _cents
from ..registry import query
from ..sources.catalog import load_table


@query(
    "q7_volume_shipping",
    oracle="""
    WITH rev AS (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
               CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)) AS v
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name IN ('NATION_10','NATION_11','NATION_12')
                AND n2.n_name IN ('NATION_19','NATION_20','NATION_21'))
            OR (n1.n_name IN ('NATION_19','NATION_20','NATION_21')
                AND n2.n_name IN ('NATION_10','NATION_11','NATION_12')))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT supp_nation, cust_nation, l_year,
           round(CAST(sum(v) AS DOUBLE) / 10000, 2) AS revenue,
           count(*) AS n_items
    FROM rev
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same tiny dimension (nation) joined twice under
    different aliases — once via the supplier path, once via the customer
    path — with a disjunctive pair filter. supplier and both nation sides
    broadcast (100 / 25 rows; at sf100k they are still MBs); the only
    shuffles are lineitem⋈orders on orderkey and orders⋈customer on
    custkey, both on the natural key a cluster would bucket by."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                F.col("supp_nation").isin("NATION_10", "NATION_11", "NATION_12")
                & F.col("cust_nation").isin("NATION_19", "NATION_20", "NATION_21")
            )
            | (
                F.col("supp_nation").isin("NATION_19", "NATION_20", "NATION_21")
                & F.col("cust_nation").isin("NATION_10", "NATION_11", "NATION_12")
            )
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            (_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias("v"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(F.sum("v").cast("double") / 10000, 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000, 2)
               AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last quarter. The
    returnflag filter reaches the lineitem scan (dictionary pruning), the
    orderdate range prunes orders row groups; nation broadcasts; the final
    ORDER BY revenue LIMIT 20 folds to TakeOrderedAndProject — no global
    sort of the aggregate output."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(_cents("l_extendedprice") * (100 - _cents("l_discount"))).cast("double")
                / 10000,
                2,
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer INCLUDING
    customers with zero qualifying orders — the left join preserves them
    and count(o_orderkey) (not count(*)) makes them bucket 0. Two
    aggregations: per-customer (shuffle on custkey, which the join already
    partitioned by) then the tiny distribution agg."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN v ELSE 0 END) AS DOUBLE)
                 / CAST(sum(v) AS DOUBLE), 4) AS promo_pct,
           round(CAST(sum(v) AS DOUBLE) / 10000, 2) AS total_revenue
    FROM (
        SELECT l_partkey,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS v
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    ) l
    JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo share of one month's revenue — conditional
    aggregation over a fact⋈dim join. part broadcasts below the default
    threshold at test SF; at 100 TB part is ~20 GB so the same plan becomes
    a shuffle join on partkey, which AQE decides without a code change.
    The month filter cuts lineitem before the join (predicate pushdown),
    so only ~1/80 of the fact table ever reaches the join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    v = (_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias("v")
    return (
        li.select("l_partkey", v)
        .join(part, F.col("l_partkey") == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", F.col("v")).otherwise(F.lit(0))).cast(
                    "double"
                )
                / F.sum("v").cast("double"),
                4,
            ).alias("promo_pct"),
            F.round(F.sum("v").cast("double") / 10000, 2).alias("total_revenue"),
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS total_c
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           round(CAST(r.total_c AS DOUBLE) / 10000, 2) AS total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_c = (SELECT max(total_c) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the scalar-subquery max over a derived aggregate.
    The quarter's per-supplier revenue is computed once and reused for
    both the max and the final filter (Spark reuses the exchange; the agg
    output is |suppliers| rows, so the 1-row max side broadcasts). Exact
    cents comparison — comparing rounded doubles for the max would be
    ambiguous under ties."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias("total_c"))
    )
    mx = rev.agg(F.max("total_c").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_c == F.col("mx"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_c").cast("double") / 10000, 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
        SELECT l_orderkey,
               sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS qty_c
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) > 25000
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice,
           round(CAST(b.qty_c AS DOUBLE) / 100, 2) AS sum_qty
    FROM big b
    JOIN orders o   ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over the full fact table (orders whose
    line quantities sum past 250), then enrichment joins. The aggregate
    runs partial+final on orderkey; the HAVING survivor set is tiny
    (~1% of orders at any SF), so both enrichment joins broadcast the
    survivors against orders/customer rather than shuffling the big
    sides. Top-100 by totalprice folds to TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_cents("l_quantity")).alias("qty_c"))
        .filter(F.col("qty_c") > 25000)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        F.broadcast(big)
        .join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_totalprice",
            F.round(F.col("qty_c").cast("double") / 100, 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT round(CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) AS DOUBLE) / 10000, 2)
               AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 20
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 40
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (adapted: the test tables lack p_container /
    l_shipmode, so the OR-of-ANDs ranges over brand/size/quantity). The
    predicate straddles both join sides, so it cannot fully push below
    the join — but Catalyst derives the single-side implications
    (brand IN (..) on part, quantity BETWEEN 1 AND 40 on lineitem) and
    pushes those into each scan, shrinking the join inputs; the residual
    disjunction evaluates post-join in codegen."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(part, li.l_partkey == part.p_partkey)
    arm = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10)
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(5, 20)
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(10, 40)
           & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 40))
    )
    return j.filter(arm).agg(
        F.round(
            F.sum(_cents("l_extendedprice") * (100 - _cents("l_discount"))).cast("double")
            / 10000,
            2,
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )
