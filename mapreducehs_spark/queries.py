"""Declared query inventory + DuckDB oracle SQL.

Every operator family from SURVEY.md §2 (reference operator rows O1-O19
and the absent-category checklist §2.2) is witnessed by at least one
query here.  Each entry is a callable ``(spark, sf_dir) -> DataFrame``
registered in ``QUERIES``; SQL-expressible ones also register the
equivalent DuckDB SQL in ``ORACLE`` (identical column names — the
driver's hash compare sorts columns by name).

Determinism discipline (FIXTURES.md "Oracle discipline"):
- no raw ``events.ts`` in outputs (parquet is ns; Spark truncates to µs)
  — bucketed/epoch-second values only; ``orders``/``lineitem``
  timestamps are ms and safe, but are still emitted as formatted
  strings to avoid tz-representation drift.
- every float output rounded; every ranking totally ordered (explicit
  tiebreak columns); sums of integers cast to BIGINT on the DuckDB side
  (DuckDB widens to HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd  # noqa: F401 — needed to resolve postponed pd.Series hints in pandas UDFs

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducehs_spark.operators import dedup, multimodal, similarity, text, windows
from mapreducehs_spark.operators.joins import asof_join
from mapreducehs_spark.pipeline import word_count_pipeline
from mapreducehs_spark.sources.catalog import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# =========================================================================
# Relational core (SURVEY §2.2: scans, projection, filter, aggregation)
# =========================================================================

@query(
    "q01_pricing_summary",
    oracle="""
    WITH s AS (
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sbp,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DECIMAL(38,0)) AS sdp,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT))
                      * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS DECIMAL(38,0)) AS sch,
             CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sdh,
             count(*) AS n
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus,
           CAST(sq AS DOUBLE)                  AS sum_qty,
           round(sbp / 100.0, 4)               AS sum_base_price,
           round(sdp / 10000.0, 4)             AS sum_disc_price,
           round(sch / 1000000.0, 4)           AS sum_charge,
           ((sq * 1000000) // n) / 1000000.0   AS avg_qty,
           ((sbp * 10000) // n) / 1000000.0    AS avg_price,
           ((sdh * 10000) // n) / 1000000.0    AS avg_disc,
           n                                   AS count_order
    FROM s
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the flagship scan→filter→hash-agg.  Catalyst pushes
    the shipdate filter into the parquet scan and prunes to 7 columns;
    the aggregation is partial+final (map-side combine) — the plan the
    reference could never produce (it materializes every stage,
    SURVEY §4.2).

    Arithmetic is the repo's exact fixed-point discipline (money in
    cents, discounts/taxes in hundredths, averages as truncating
    micro-unit division): a double SUM's value depends on partial-agg
    order, and at ~6 M rows (the sf1 measurement, SCALE.md) the
    engines' orderings drift past the 4-decimal rounding boundary —
    integer sums are order-free, so the query value-checks at EVERY
    scale factor.  Magnitudes: cents·1e4 per row < 1e11, so a BIGINT
    sum of sdp/sch would cross 2^63 around sf≈50 (where Spark's
    non-ANSI sum wraps silently) — those two accumulate as
    decimal(38,0) on BOTH engines (DuckDB already sums exactly via
    HUGEINT), giving headroom past sf 1e9; sq/sbp/sdh stay bigint
    (per-row ≤ 1e7, safe to sf ~1e5)."""
    li = _t(spark, sf_dir, "lineitem")
    qty_i = F.round(F.col("l_quantity")).cast("bigint")
    pc = F.round(F.col("l_extendedprice") * 100).cast("bigint")  # cents
    dh = F.round(F.col("l_discount") * 100).cast("bigint")  # hundredths
    th = F.round(F.col("l_tax") * 100).cast("bigint")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_i).alias("sq"),
            F.sum(pc).alias("sbp"),
            F.sum((pc * (100 - dh)).cast("decimal(38,0)")).alias("sdp"),
            F.sum((pc * (100 - dh) * (100 + th)).cast("decimal(38,0)")).alias("sch"),
            F.sum(dh).alias("sdh"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("sq").cast("double").alias("sum_qty"),
            F.round(F.col("sbp") / 100.0, 4).alias("sum_base_price"),
            F.round(F.col("sdp") / 10000.0, 4).alias("sum_disc_price"),
            F.round(F.col("sch") / 1000000.0, 4).alias("sum_charge"),
            (F.expr("(sq * 1000000L) div n") / 1000000.0).alias("avg_qty"),
            (F.expr("(sbp * 10000L) div n") / 1000000.0).alias("avg_price"),
            (F.expr("(sdh * 10000L) div n") / 1000000.0).alias("avg_disc"),
            F.col("n").alias("count_order"),
        )
    )


@query(
    "q02_revenue_forecast",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q02_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+global agg — the predicate-pushdown
    witness (all four predicates reach the parquet scan)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q03_scan_project_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_day
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity >= 45
    """,
)
def q03_scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level projection+filter (Mapper O1 semantics, reference
    MapReduceC.hs:24): no shuffle at all — narrow plan, column-pruned scan."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 45)).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
    )


# =========================================================================
# Joins (SURVEY §2.2 "Joins": inner/outer/semi/anti, broadcast, as-of)
# =========================================================================

@query(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
    )
    GROUP BY o_orderpriority
    """,
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join, then count by priority."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    sel = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return sel.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "q05_revenue_by_nation",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation    ON s_nationkey = n_nationkey
    JOIN region    ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q05_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the multi-join witness.  Dimension tables
    (supplier/nation/region/customer) are broadcast — only the
    lineitem⋈orders join shuffles, on the fact tables' shared key."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@query(
    "q06_semi_anti_customers",
    oracle="""
    SELECT c_mktsegment, 'active' AS cohort, count(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    UNION ALL
    SELECT c_mktsegment, 'inactive' AS cohort, count(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q06_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi (EXISTS) + left_anti (NOT EXISTS) in one result."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    semi = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .withColumn("cohort", F.lit("active"))
    )
    anti = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .withColumn("cohort", F.lit("inactive"))
    )
    return semi.unionByName(anti).select("c_mktsegment", "cohort", "n_customers")


@query(
    "q07_asof_enrich",
    oracle="""
    SELECT e.event_id, e.user_id,
           CAST(floor(epoch(e.ts)) AS BIGINT) AS event_epoch,
           o.o_orderkey AS last_orderkey,
           round(o.o_totalprice, 4) AS last_totalprice
    FROM events e
    LEFT JOIN LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
        ORDER BY o_orderdate DESC, o_orderkey DESC
        LIMIT 1
    ) o ON true
    """,
)
def q07_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (custom operator — Spark has no built-in): each event
    picks the customer's most recent order at event time.  Union-merge
    implementation: one shuffle, no row blowup (operators/joins.py)."""
    events = _t(spark, sf_dir, "events")
    orders = _t(spark, sf_dir, "orders")
    # deterministic tie-break: at equal o_orderdate prefer max o_orderkey,
    # achieved by sorting right rows by (time, orderkey) before the merge.
    orders_ranked = orders.select(
        F.col("o_custkey"), F.col("o_orderdate"), F.col("o_orderkey"), F.col("o_totalprice")
    )
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.col("o_orderkey").desc())
    orders_best = (
        orders_ranked.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    joined = asof_join(
        events.select("event_id", F.col("user_id").alias("o_custkey"), "ts"),
        orders_best,
        on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
    )
    return joined.select(
        F.col("event_id"),
        F.col("o_custkey").alias("user_id"),
        F.floor(F.col("ts").cast("double")).cast("bigint").alias("event_epoch"),
        F.col("o_orderkey").alias("last_orderkey"),
        F.round(F.col("o_totalprice"), 4).alias("last_totalprice"),
    )


# =========================================================================
# Aggregation extensions: distinct, rollup/cube/grouping sets, pivot
# =========================================================================

@query(
    "q08_distinct_counts",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_suppliers,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q08_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi count-distinct (expand-based plan in Spark)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "q09_rollup_sales",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid,
           round(sum(l_quantity), 4) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q09_rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping id (derivable in the reference only by a
    Mapper emitting one row per grouping set — SURVEY §2.2)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
        .cast("int")
        .alias("gid"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q10_cube_sales",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid,
           round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0, 4)
             AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q10_cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact integer-cents sum: the (all, all) cube cell folds the whole
    # table, where a double SUM's partial-agg order drifts past the
    # rounding boundary at 10x data (q01's sf1 lesson)
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    return li.cube("l_returnflag", "l_linestatus").agg(
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
        .cast("int")
        .alias("gid"),
        F.round(F.sum(cents) / 100.0, 4).alias("sum_price"),
    )


@query(
    "q11_pivot_status",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 4) AS qty_open,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 4) AS qty_filled
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q11_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: groupBy().pivot(values).agg() — lowered by Spark to the
    same conditional aggregation the oracle spells out."""
    li = _t(spark, sf_dir, "lineitem")
    p = (
        _coalesce0(
            li.groupBy("l_returnflag")
            .pivot("l_linestatus", ["O", "F"])
            .agg(F.round(F.sum("l_quantity"), 4))
        )
    )
    return p.select(
        "l_returnflag",
        F.col("O").alias("qty_open"),
        F.col("F").alias("qty_filled"),
    )


def _coalesce0(df: DataFrame) -> DataFrame:
    # pivot emits NULL for empty cells; the CASE oracle emits 0
    out = df
    for c in df.columns[1:]:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0.0)))
    return out


# =========================================================================
# Window functions, sort/limit/top-k (SURVEY §2.2)
# =========================================================================

@query(
    "q12_topk_per_group",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber,
           round(l_extendedprice, 4) AS price,
           CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
             ) AS rn
      FROM lineitem
    ) WHERE rn <= 3
    """,
)
def q12_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: the window+row_number idiom (total order via
    explicit tiebreaks).  At scale Spark pushes a per-partition top-k
    (WindowGroupLimit) before the shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    return (
        li.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 4).alias("price"),
            "rn",
        )
    )


@query(
    "q13_running_totals",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS UNBOUNDED PRECEDING), 4) AS running_spend,
           round(lag(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC), 4) AS prev_price,
           round(lead(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC), 4) AS next_price
    FROM orders
    """,
)
def q13_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate + lag/lead over one window partitioning (single
    shuffle, three frame passes)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4
        ).alias("running_spend"),
        F.round(F.lag("o_totalprice").over(w), 4).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 4).alias("next_price"),
    )


@query(
    "q14_global_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def q14_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit → Spark plans TakeOrderedAndProject (no full
    sort materialization, per-partition heaps)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 4).alias("total"))
    )


@query(
    "q15_ntile_ranks",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           CAST(ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT) AS quartile,
           CAST(rank() OVER (PARTITION BY c_mktsegment ORDER BY round(c_acctbal, 2) DESC) AS BIGINT) AS bal_rank,
           CAST(dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY round(c_acctbal, 2) DESC) AS BIGINT) AS bal_dense_rank
    FROM customer
    """,
)
def q15_ntile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/ntile coverage (rank over rounded key so ties are
    well-defined identically in both engines)."""
    cust = _t(spark, sf_dir, "customer")
    w_tile = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    w_rank = Window.partitionBy("c_mktsegment").orderBy(F.round("c_acctbal", 2).desc())
    return cust.select(
        "c_mktsegment",
        "c_custkey",
        F.ntile(4).over(w_tile).cast("bigint").alias("quartile"),
        F.rank().over(w_rank).cast("bigint").alias("bal_rank"),
        F.dense_rank().over(w_rank).cast("bigint").alias("bal_dense_rank"),
    )


# =========================================================================
# Set operations (SURVEY §2.2)
# =========================================================================

@query(
    "q16_set_ops",
    oracle="""
    SELECT 'rich_active' AS cohort, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      INTERSECT
      SELECT o_custkey AS c_custkey FROM orders
    )
    UNION ALL
    SELECT 'rich_inactive' AS cohort, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      EXCEPT
      SELECT o_custkey AS c_custkey FROM orders
    )
    """,
)
def q16_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect + except + unionByName in one query."""
    cust = _t(spark, sf_dir, "customer")
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    active = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    a = rich.intersect(active).withColumn("cohort", F.lit("rich_active"))
    b = rich.exceptAll(active.distinct()).withColumn("cohort", F.lit("rich_inactive"))
    return a.unionByName(b).select("cohort", "c_custkey")


# =========================================================================
# Scalar function surface: string / date / math / json (SURVEY §2.2)
# =========================================================================

@query(
    "q17_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_type)                                   AS type_upper,
           lower(p_brand)                                  AS brand_lower,
           CAST(length(p_name) AS INT)                     AS name_len,
           substr(p_name, 1, 4)                            AS name_prefix,
           replace(p_brand, '#', '_')                      AS brand_norm,
           concat(p_type, ':', p_brand)                    AS type_brand,
           CAST(length(p_name) - length(replace(p_name, ' ', '')) + 1 AS INT) AS n_words,
           regexp_extract(p_brand, '([0-9]+)', 1)          AS brand_num
    FROM part
    WHERE p_name LIKE '%re%'
    """,
)
def q17_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.filter(F.col("p_name").like("%re%")).select(
        "p_partkey",
        F.upper("p_type").alias("type_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").cast("int").alias("name_len"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.regexp_replace("p_brand", "#", "_").alias("brand_norm"),
        F.concat_ws(":", "p_type", "p_brand").alias("type_brand"),
        (
            F.length("p_name") - F.length(F.regexp_replace("p_name", " ", "")) + 1
        ).cast("int").alias("n_words"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
    )


@query(
    "q18_date_funcs",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT)    AS order_year,
           CAST(month(o_orderdate) AS INT)   AS order_month,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since_epoch_start,
           count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS month_revenue
    FROM orders
    GROUP BY 1, 2, 3, 4
    """,
)
def q18_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month_start"
            ),
            F.datediff(
                F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
            ).cast("int").alias("days_since_epoch_start"),
            "o_totalprice",
        )
        .groupBy("order_year", "order_month", "month_start", "days_since_epoch_start")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("month_revenue"),
        )
    )


@query(
    "q19_json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q19_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column
    (get_json_object — Catalyst evaluates it JVM-side)."""
    events = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").cast("int").alias("max_k"),
        )
    )


@query(
    "q20_math_case",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 6)            AS disc_dev,
           round(pow(l_quantity, 2), 4)                AS qty_sq,
           round(ln(l_extendedprice + 1), 6)           AS log_price,
           CAST(ceil(l_quantity / 10.0) AS BIGINT)     AS qty_decile,
           CASE WHEN l_tax > 0.05 THEN 'high'
                WHEN l_tax > 0.02 THEN 'mid'
                ELSE 'low' END                          AS tax_band,
           CAST(l_quantity AS INT) % 7                 AS qty_mod
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def q20_math_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 100 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("log_price"),
        F.ceil(F.col("l_quantity") / 10.0).cast("bigint").alias("qty_decile"),
        F.when(F.col("l_tax") > 0.05, "high")
        .when(F.col("l_tax") > 0.02, "mid")
        .otherwise("low")
        .alias("tax_band"),
        (F.col("l_quantity").cast("int") % 7).alias("qty_mod"),
    )


# =========================================================================
# Time windows & sessionization over events (SURVEY §2.2 "Streaming",
# batch-mode; streaming variants in mapreducehs_spark/streaming)
# =========================================================================

@query(
    "q21_tumbling_window",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS window_start_epoch,
           event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q21_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling window aggregate (epoch-aligned, as Spark's
    window() is).  Output keyed by epoch seconds — ns-precision-safe."""
    events = _t(spark, sf_dir, "events")
    agg = windows.tumbling_window(
        events,
        "ts",
        "10 minutes",
        ["event_type"],
        [F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value")],
    )
    return agg.select(
        F.col("window_start").cast("long").alias("window_start_epoch"),
        "event_type",
        "n_events",
        "sum_value",
    )


@query(
    "q22_sliding_window",
    oracle="""
    WITH slides AS (
      SELECT e.event_id, e.value,
             CAST(s AS BIGINT) AS window_start_epoch
      FROM events e,
           LATERAL (
             SELECT unnest(range(
               CAST(floor(epoch(e.ts) / 300) * 300 AS BIGINT) - 600,
               CAST(floor(epoch(e.ts) / 300) * 300 AS BIGINT) + 300,
               300)) AS s
           )
      WHERE epoch(e.ts) >= s AND epoch(e.ts) < s + 900
    )
    SELECT window_start_epoch, count(*) AS n_events, round(sum(value), 4) AS sum_value
    FROM slides
    GROUP BY 1
    """,
)
def q22_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute window sliding every 5 minutes — each event lands in 3
    windows (Spark explodes internally, the oracle explodes manually)."""
    events = _t(spark, sf_dir, "events")
    agg = windows.sliding_window(
        events,
        "ts",
        "15 minutes",
        "5 minutes",
        [],
        [F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value")],
    )
    return agg.select(
        F.col("window_start").cast("long").alias("window_start_epoch"),
        "n_events",
        "sum_value",
    )


@query(
    "q23_sessionization",
    oracle="""
    WITH lagged AS (
      SELECT user_id, event_id, epoch(ts) AS tsec,
             lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN prev IS NULL OR tsec - prev > 1800 THEN 1 ELSE 0 END AS news
      FROM lagged
    ), sess AS (
      SELECT user_id, event_id, tsec,
             CAST(sum(news) OVER (PARTITION BY user_id ORDER BY tsec ASC, event_id ASC
                                  ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           CAST(floor(min(tsec)) AS BIGINT) AS start_epoch,
           CAST(floor(max(tsec)) AS BIGINT) AS end_epoch,
           CAST(floor(max(tsec)) - floor(min(tsec)) AS BIGINT) AS duration_sec
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def q23_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag+cumsum —
    operators/windows.py; the batch equivalent of session_window()."""
    events = _t(spark, sf_dir, "events")
    return windows.session_aggregate(
        events, ts="ts", key="user_id", gap_seconds=1800, order_tiebreak="event_id"
    ).select("user_id", "session_id", "n_events", "start_epoch", "end_epoch", "duration_sec")


# =========================================================================
# LLM pipeline: dedup (SURVEY §2.2, BASELINE.json mandate)
# =========================================================================

@query(
    "d01_dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           count(*) AS n_dups,
           min(doc_id) AS keep_id
    FROM documents
    GROUP BY 1
    """,
)
def d01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups by content hash (operators/dedup.py).  The
    shuffle key is the 32-byte md5, not the document text."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.duplicate_groups(docs).select("content_hash", "n_dups", "keep_id")


@query(
    "d02_ngram_jaccard_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
      FROM documents
    ), pos AS (
      SELECT doc_id, t, unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS i
      FROM toks
    ), sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
      FROM pos
    ), sized AS (
      SELECT doc_id, count(*) AS set_size FROM sh GROUP BY 1
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(inter / CAST(sa.set_size + sb.set_size - inter AS DOUBLE), 6) AS jaccard
    FROM inter
    JOIN sized sa ON sa.doc_id = id_a
    JOIN sized sb ON sb.doc_id = id_b
    WHERE inter / CAST(sa.set_size + sb.set_size - inter AS DOUBLE) >= 0.12
    """,
)
def d02_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (the LSH verifier), via
    shingle explode + equi-join — never all-pairs."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.12, max_shingle_df=None)


@query("d03_minhash_lsh_pairs")  # oracle attached below (_d11_oracle(0.375))
def d03_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH near-dup pairs — the scalable near-dup path, now
    running the engine-portable checked kernel by DEFAULT (round 6):
    md5-fold shingle ids + literal-seed permutations replay bit-for-bit
    in the DuckDB oracle (d11's renderer at a stricter 0.375 estimate
    threshold, i.e. ≥ 12/32 agreeing permutations).  The xxhash64
    vectorized formulation (dedup.minhash_lsh_pairs) remains the
    throughput alternate, benched as alt_d03 in bench.py and pinned
    against exact Jaccard in tests."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs_checked(docs, est_threshold=0.375)


@query("d04_simhash_pairs")  # oracle attached below (_d12_oracle(3))
def d04_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, engine-portable checked kernel by
    DEFAULT (round 6): md5-fold token hashes + frequency-weighted bit
    votes + 4×8-bit banding replay in DuckDB (d12's renderer at the
    looser hamming ≤ 3).  The 63-bit xxhash vectorized formulation
    (dedup.simhash_near_pairs) remains the throughput alternate
    (alt_d04 in bench.py), pinned in tests."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_checked(docs, max_hamming=3)


@query(
    "d05_embedding_near_dup",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
    """,
)
def d05_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, EXACT, via blocked matrix
    products (operators/similarity.all_pairs_cosine_blocked — one numpy
    matmul per block pair, each vector shuffled O(#blocks) times).

    Threshold 0.4 because this corpus has no high-cosine planted dups
    (max pairwise cosine ≈ 0.5-0.6 per SF) — a 0.9 threshold would make
    the query a vacuous empty-vs-empty oracle match.  The approximate
    scale path (SRP-LSH, similarity.cosine_pairs_lsh) is exercised by
    unit tests with planted duplicates instead, where its recall
    contract is meaningful."""
    from mapreducehs_spark.operators.similarity import all_pairs_cosine_blocked

    emb = _t(spark, sf_dir, "embeddings")
    return all_pairs_cosine_blocked(emb, threshold=0.4)


# =========================================================================
# LLM pipeline: similarity search (BASELINE.json mandate)
# =========================================================================

@query(
    "s01_cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT q.query_id, c.vec_id AS match_id,
             round(list_cosine_similarity(q.qv::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cosine
      FROM embeddings c CROSS JOIN q
      WHERE q.query_id != c.vec_id
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, match_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, match_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def s01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for 8 probe vectors: broadcast the
    probes, JVM-side zip_with/aggregate dot products, window top-k."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, emb.filter(F.col("vec_id") < 8), k=5)


def _seeded_centroids(emb: DataFrame):
    """The 16 lowest-vec_id vectors, L2-normalized, as IVF centroids —
    the data-seeded codebook that makes cell assignment (argmax cosine,
    ties to the lowest cell) replayable in the DuckDB oracle.  Shared
    by s02 (default path since round 6), s06 and s13."""
    import numpy as np

    rows = (
        emb.filter(F.col("vec_id") < 16)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    cents = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    return cents / np.linalg.norm(cents, axis=1, keepdims=True)


def _seeded_planes(emb: DataFrame):
    """The 16 lowest-vec_id vectors as SRP hyperplanes — data-seeded so
    the sign bits replay as literal dot products in the oracle.  Shared
    by s04 (default path since round 6) and s07."""
    import numpy as np

    rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(16).collect()
    return np.asarray([r["embedding"] for r in rows], dtype=np.float64)


@query("s02_ann_ivf_topk")  # oracle attached below (_ivf_checked_oracle(2))
def s02_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via IVF cell probing — the 100 TB path (scan shrinks
    by n_probe/n_cells) — running the DATA-SEEDED checked formulation
    by DEFAULT (round 6): the 16 lowest-vec_id vectors as centroids so
    assignment, probing and rank replay in the DuckDB oracle (s06's
    renderer at the tighter n_probe=2, i.e. an 8× scan cut).  The
    trained-random-codebook variant stays the recall path, pinned in
    tests (test_ivf_topk_recall) and benched as alt_s02."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb.filter(F.col("vec_id") >= 8),
        emb.filter(F.col("vec_id") < 8),
        k=5,
        n_cells=16,
        n_probe=2,
        centroids=_seeded_centroids(emb),
    )


@query("s04_ann_srp_topk")  # oracle attached below (_srp_checked_oracle())
def s04_ann_srp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via banded SRP-LSH — one broadcast join on band keys,
    exact cosine only on bucket-mates — running the DATA-SEEDED checked
    formulation by DEFAULT (round 6): 16 hyperplanes taken from the
    corpus itself so the sign bits, 4×4-bit banding and candidate rank
    replay in the DuckDB oracle (s07's renderer).  The
    Gaussian-hyperplane variant stays the recall path, pinned in tests
    (test_srp_topk_recall) and benched as alt_s04."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.srp_topk(
        emb.filter(F.col("vec_id") >= 8),
        emb.filter(F.col("vec_id") < 8),
        k=5,
        n_planes=16,
        bands=4,
        planes=_seeded_planes(emb),
    )


@query(
    "s03_label_centroids",
    oracle="""
    SELECT label, CAST(i - 1 AS INT) AS pos,
           round(avg(embedding[i]::DOUBLE), 6) AS centroid_val
    FROM (SELECT label, embedding, unnest(range(1, len(embedding) + 1)) AS i
          FROM embeddings)
    GROUP BY label, i
    """,
)
def s03_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids via posexplode + (label, pos) hash agg —
    fully partial-aggregatable (no whole-vector grouping)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.label_centroids(emb).select(
        "label", F.col("pos").cast("int").alias("pos"), "centroid_val"
    )


# =========================================================================
# LLM pipeline: text analysis (BASELINE.json mandate)
# =========================================================================

@query(
    "t01_token_stats",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, length(text) AS n_chars_obs,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(n_chars_obs AS BIGINT) AS n_chars_obs,
           CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct_tokens,
           round(list_sum(list_transform(t, x -> length(x))) /
                 CAST(greatest(len(t), 1) AS DOUBLE), 6) AS avg_token_len
    FROM toks
    """,
)
def t01_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token statistics — split/size/array_distinct, zero UDFs."""
    docs = _t(spark, sf_dir, "documents")
    stats = text.with_token_stats(docs)
    return stats.select(
        "doc_id",
        "lang",
        "n_tokens",
        "n_chars_obs",
        "n_distinct_tokens",
        F.round("avg_token_len", 6).alias("avg_token_len"),
    )


@query(
    "t02_quality_scores",
    oracle="""
    WITH toks AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
      FROM documents
    ), feats AS (
      SELECT doc_id,
             len(list_filter(t, x -> list_contains(
                 ['the','a','of','and','to','in','is','it'], lower(x)))) /
               CAST(greatest(len(t), 1) AS DOUBLE)                       AS stopword_ratio,
             length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) /
               CAST(greatest(length(text), 1) AS DOUBLE)                 AS punct_ratio,
             length(text) BETWEEN 20 AND 100000                          AS len_band_ok
      FROM toks
    )
    SELECT doc_id,
           round(stopword_ratio, 6) AS stopword_ratio,
           round(punct_ratio, 6) AS punct_ratio,
           len_band_ok,
           round(least(greatest(
             0.5 + least(stopword_ratio * 2.0, 0.25)
                 - least(punct_ratio * 2.0, 0.25)
                 + CASE WHEN len_band_ok THEN 0.25 ELSE -0.25 END, 0.0), 1.0), 6)
             AS quality_score
    FROM feats
    """,
)
def t02_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality features + composite score (operators/text.py)."""
    docs = _t(spark, sf_dir, "documents")
    q = text.with_quality_score(docs)
    return q.select(
        "doc_id",
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        "len_band_ok",
        "quality_score",
    )


@query(
    "t03_corpus_facets",
    oracle="""
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(n_chars), 6) AS avg_chars,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM documents
    GROUP BY lang, source
    """,
)
def t03_corpus_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
    )


@query(
    "t04_top_terms_tfidf",
    oracle="""
    WITH exploded AS (
      SELECT lang, unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                      x -> x != '')) AS term
      FROM documents
    ), tf AS (
      SELECT lang, term, count(*) AS tf FROM exploded GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, count(*) AS facet_df FROM tf GROUP BY 1
    ), nl AS (
      SELECT count(DISTINCT lang) AS n FROM documents
    ), weighted AS (
      SELECT tf.lang, tf.term, CAST(tf.tf AS BIGINT) AS tf, CAST(dfreq.facet_df AS BIGINT) AS facet_df,
             round(tf.tf * ln((nl.n + 1) / CAST(dfreq.facet_df + 1 AS DOUBLE)), 6) AS tfidf
      FROM tf, dfreq, nl WHERE tf.term = dfreq.term
    )
    SELECT lang, term, tf, facet_df, tfidf, rk FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY lang ORDER BY tfidf DESC, tf DESC, term ASC) AS BIGINT) AS rk
      FROM weighted
    ) WHERE rk <= 5
    """,
)
def t04_top_terms_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per language: explode → two hash aggs →
    window top-k (operators/text.py term_stats_by_facet)."""
    docs = _t(spark, sf_dir, "documents")
    return text.term_stats_by_facet(docs, facet="lang", top_k=5).withColumn(
        "tf", F.col("tf").cast("bigint")
    ).withColumn("facet_df", F.col("facet_df").cast("bigint"))


@query(
    "t05_fingerprints",
    oracle="""
    SELECT doc_id, md5(text) AS content_md5
    FROM documents
    """,
)
def t05_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5). The POSITIONAL rolling variant is
    t21's value-checked winnowing; a faster xxhash64 rolling variant is
    covered by tests only (xxhash64 has no DuckDB replay)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", F.md5("text").alias("content_md5"))


@query("t06_lang_guess")  # heuristic classifier exercised rows-only
def t06_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script-range language-ID heuristic + facet counts.

    (This synthetic corpus is all-ASCII, so every doc lands in 'latin' —
    the oracle still checks the full classification expression.)"""
    docs = _t(spark, sf_dir, "documents")
    return (
        text.with_lang_guess(docs)
        .groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


ORACLE["t06_lang_guess"] = """
    WITH g AS (
      SELECT lang,
        CASE
          WHEN length(regexp_replace(text, '[^一-鿿]', '', 'g')) * 3 > greatest(length(text), 1) THEN 'zh'
          WHEN length(regexp_replace(text, '[^Ѐ-ӿ]', '', 'g')) * 3 > greatest(length(text), 1) THEN 'ru'
          WHEN length(regexp_replace(text, '[^؀-ۿ]', '', 'g')) * 3 > greatest(length(text), 1) THEN 'ar'
          ELSE 'latin'
        END AS lang_guess
      FROM documents
    )
    SELECT lang, lang_guess, count(*) AS n_docs FROM g GROUP BY 1, 2
"""


# =========================================================================
# Multimodal plumbing (BASELINE.json mandate)
# =========================================================================

@query(
    "m01_payload_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS checksum,
           'text' AS modality
    FROM documents
    """,
)
def m01_payload_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata struct convention
    (operators/multimodal.py attach_payload)."""
    docs = _t(spark, sf_dir, "documents")
    with_payload = multimodal.attach_payload(docs)
    return with_payload.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
        F.col("meta.modality").alias("modality"),
    )


@query(
    "m02_payload_features",
    oracle="""
    SELECT doc_id,
           round((('0x' || substr(sha256(text), 1, 8))::BIGINT) / 4294967296.0, 6) AS f0,
           round((('0x' || substr(sha256(text), 57, 8))::BIGINT) / 4294967296.0, 6) AS f7,
           8 AS dim
    FROM documents
    """,
)
def m02_payload_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas (deterministic stand-in extractor; real decode stubs).
    The stand-in folds the payload's sha256 into unit floats, which the
    oracle replays in SQL (hex-slice → int / 2^32) — so even the UDF
    boundary is hash-checked, not just row-counted."""
    docs = _t(spark, sf_dir, "documents")
    feats = multimodal.extract_features(multimodal.attach_payload(docs), dim=8)
    return feats.select(
        "doc_id",
        F.round(F.element_at("features", 1), 6).alias("f0"),
        F.round(F.element_at("features", 8), 6).alias("f7"),
        F.size("features").alias("dim"),
    )


# =========================================================================
# Reference-parity pipeline kernel (SURVEY §2.1 O1-O5; Impl.hs sample)
# =========================================================================

@query(
    "p01_wordcount_pipeline",
    oracle="""
    WITH pos AS (
      SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
      FROM documents
    ), ch AS (
      SELECT doc_id, i, text[i] AS c FROM pos
    ), flagged AS (
      SELECT doc_id, c,
             CASE WHEN lag(c) OVER (PARTITION BY doc_id ORDER BY i)
                       IS DISTINCT FROM c THEN 1 ELSE 0 END AS new_run
      FROM ch
    )
    -- each run of length L contributes L+1 (the add1 stage applies to
    -- the run's count): per char, sum = occurrences + number of runs
    SELECT c AS key, CAST(count(*) + sum(new_run) AS INTEGER) AS value
    FROM flagged
    GROUP BY c
    """,
)
def p01_wordcount_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's own sample pipeline (src/Impl.hs:30-44) — char
    run-length-encode → +1 → sum per key — run through the M1 Pipeline
    kernel (mapInPandas/applyInPandas lowering) over documents.text.
    The oracle re-derives the run-length algebra relationally: a run of
    length L contributes L+1, so each char's total is its occurrence
    count plus its run count.

    Runs the declared-associative lowering (``assoc=True``): the char
    alphabet is tiny, so the per-group reduce would funnel the whole
    corpus through ~25 tasks — ``reduce_agg`` gets map-side partials
    instead.  The input is spread to the session's parallelism first
    because the sf0.1 parquet arrives as one split and the Python map
    stage would otherwise run single-threaded (at real scale the scan
    is already wide and the repartition collapses to a cheap rebalance
    of small files)."""
    docs = _t(spark, sf_dir, "documents")
    kv = docs.select(
        F.col("doc_id").cast("string").alias("key"), F.col("text").alias("value")
    ).repartition(spark.sparkContext.defaultParallelism)
    return word_count_pipeline(assoc=True).run(kv)


@query(
    "p02_mapreduce_wordcount",
    oracle="""
    SELECT term AS key, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                x -> x != '')) AS term
      FROM documents
    )
    GROUP BY 1
    """,
)
def p02_mapreduce_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical MapReduce word count — the reference's paradigm query —
    as explode + hash agg (Mapper O1 ≙ explode, Reducer O2 ≙ agg)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        # explode_outer + not-null: plain explode makes the optimizer
        # infer size(tokens)>0 and push it down with the split() inlined
        # (tokenization would run twice; see operators/dedup.py).
        docs.select(F.explode_outer(text.tokens("text")).alias("key"))
        .filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
    )

# =========================================================================
# Structured Streaming (SURVEY §2.2 streaming row; M3) — each query runs
# a real readStream over a time-ordered replay of `events` (one chunk
# per trigger, flush sentinel to advance the final watermark; see
# streaming/ops.py for why this makes append-mode output deterministic
# and therefore oracle-checkable).
# =========================================================================

def _replayed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreducehs_spark import streaming as st

    replay = st.prepare_stream_dir(spark, sf_dir, n_chunks=4)
    return st.events_stream(spark, replay)


@query(
    "st01_stream_tumbling",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def st01_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming watermarked tumbling-window agg == the batch aggregate
    (no late data by replay construction — differential vs DuckDB)."""
    from mapreducehs_spark import streaming as st

    agg = st.tumbling_aggregate(
        _replayed_events(spark, sf_dir), window="1 hour", watermark="30 minutes"
    )
    out = st.run_to_batch(agg, "st01_sink", output_mode="append")
    # sentinel dropped from the BATCH result (an in-stream filter on a
    # group key would be pushed below the watermark; see streaming/ops.py)
    return out.filter(F.col("event_type") != "__flush__")


@query(
    "st02_stream_sessions",
    oracle="""
    WITH lagged AS (
      SELECT user_id, event_id, value, epoch(ts) AS tsec,
             lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev
      FROM events
    ), flagged AS (
      -- >= : Spark session windows are [start, last+gap) — an event at
      -- exactly last+gap starts a NEW session
      SELECT *, CASE WHEN prev IS NULL OR tsec - prev >= 1800 THEN 1 ELSE 0 END AS news
      FROM lagged
    ), sess AS (
      SELECT user_id, value, tsec,
             sum(news) OVER (PARTITION BY user_id ORDER BY tsec ASC, event_id ASC
                             ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           CAST(floor(min(tsec)) AS BIGINT) AS session_start,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def st02_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session_window (30-min gap) per user, append mode —
    differential vs islands-and-gaps sessionization in DuckDB."""
    from mapreducehs_spark import streaming as st

    agg = st.session_aggregate(
        _replayed_events(spark, sf_dir), gap="30 minutes", watermark="30 minutes"
    )
    out = st.run_to_batch(agg, "st02_sink", output_mode="append")
    return out.filter(F.col("user_id") >= 0)  # drop the sentinel's session


@query(
    "st03_stream_stateful_totals",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           round(sum(coalesce(value, 0)), 4) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def st03_stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running totals; final snapshot == batch groupBy."""
    from mapreducehs_spark import streaming as st

    updates = st.stateful_user_totals(_replayed_events(spark, sf_dir))
    log = st.run_to_batch(updates, "st03_sink", output_mode="append")
    from mapreducehs_spark.streaming.ops import latest_per_user

    return latest_per_user(log)

# =========================================================================
# Relational coverage widening: grouping sets, holistic/statistical
# aggregates, interval join, general-Reducer witness (SURVEY §2.2)
# =========================================================================

@query(
    "q24_grouping_sets",
    oracle="""
    SELECT coalesce(o_orderpriority, '(all)') AS priority,
           coalesce(o_orderstatus, '(all)')  AS status,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0, 4)
             AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), ())
    """,
)
def q24_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the DataFrame API (Spark 4 groupingSets) —
    one shuffle computes all three granularities (the Expand operator
    replicates rows per set; no per-set rescan at 100 TB)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # integer-cents sum: the () grouping set folds all orders —
            # order-free exact arithmetic survives any scale (q01 lesson)
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")) / 100.0, 4
            ).alias("total"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            "n_orders",
            "total",
        )
    )


@query(
    "q25_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 4) AS q25,
           round(quantile_cont(l_quantity, 0.50), 4) AS median,
           round(quantile_cont(l_quantity, 0.75), 4) AS q75,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS price_p95
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q25_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (holistic aggregate — the class the reference's
    Reducer materializes whole groups for; Spark's percentile() keeps a
    per-group digest instead).  At 100 TB prefer approx_percentile;
    exact is declared here because the oracle must match bit-for-bit."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("q25"),
        F.round(F.expr("percentile(l_quantity, 0.50)"), 4).alias("median"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 4).alias("q75"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("price_p95"),
    )


@query(
    "q26_stat_aggregates",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           round(stddev_samp(l_extendedprice), 4) AS price_stddev,
           round(var_pop(l_discount), 6) AS disc_var
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q26_stat_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (corr/covar/stddev/var) — single-pass
    distributive moments, partial-aggregated map-side."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.var_pop("l_discount"), 6).alias("disc_var"),
    )


@query(
    "q27_interval_join",
    oracle="""
    SELECT p.event_id,
           count(c.event_id) AS n_clicks,
           round(coalesce(sum(c.value), 0), 4) AS click_value
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND c.ts >  p.ts - INTERVAL 1 HOUR
     AND c.ts <  p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
)
def q27_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) self-join: clicks within the hour before each
    purchase, same user — via operators/joins.py interval_join (bucketed
    equi-join + range filter, never a raw theta join)."""
    from mapreducehs_spark.operators.joins import interval_join_count

    events = _t(spark, sf_dir, "events")
    return interval_join_count(
        events,
        user_col="user_id",
        ts_col="ts",
        anchor_type="purchase",
        within_type="click",
        lookback_seconds=3600,
    )


@query(
    "q28_trimmed_mean",
    oracle="""
    SELECT l_suppkey AS key,
           round((sum(l_quantity) - min(l_quantity) - max(l_quantity))
                 / (count(*) - 2), 4) AS value
    FROM lineitem
    GROUP BY l_suppkey
    HAVING count(*) > 2
    """,
)
def q28_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General Reducer witness WITH an oracle: per-supplier trimmed mean
    (drop one min and one max) computed in a grouped-map pandas fn via
    the M1 Pipeline kernel — the lowering path for arbitrary
    ``k -> [v] -> [v']`` reducers (reference MapReduceC.hs:26,35-40)."""
    from mapreducehs_spark.pipeline import Pipeline

    # l_quantity is integer-valued: sums are exact in double, so the
    # reducer's fold order vs the oracle's cannot shift the rounded
    # result (l_extendedprice drifted at a 4-decimal boundary at sf0.1)
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").cast("bigint").alias("key"),
        F.col("l_quantity").alias("value"),
    )

    def trimmed(k, vs):
        if len(vs) <= 2:
            return []
        import math

        x = (sum(vs) - min(vs) - max(vs)) / (len(vs) - 2)
        # round HALF AWAY FROM ZERO: python round() is banker's, but the
        # oracle (DuckDB) and F.round both round .5 away — an exact
        # .xxxx5 quotient at sf0.1 exposed the difference
        return [math.copysign(math.floor(abs(x) * 10000 + 0.5), x) / 10000]

    return Pipeline().reduce_stage(trimmed, "key bigint, value double").run(li)

# =========================================================================
# Coverage widening 2: unpivot, SQL lateral join, scalar pandas UDF,
# multimodal frame sampling (SURVEY §2.2 rows: set ops/reshape, SQL
# surface, UDF surface, multimodal)
# =========================================================================

@query(
    "q29_unpivot",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
             CAST(round(l_discount * 100) AS BIGINT) AS dh,
             CAST(round(l_tax * 100) AS BIGINT) AS th
      FROM lineitem
    ), w AS (
      SELECT l_returnflag,
             round(CAST(sum(pc) AS BIGINT) / 100.0, 4)               AS base,
             round(CAST(sum(pc * (100 - dh)) AS BIGINT) / 10000.0, 4) AS discounted,
             round(CAST(sum(pc * th) AS BIGINT) / 10000.0, 4)        AS tax
      FROM c GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'base' AS measure, base AS amount FROM w
    UNION ALL
    SELECT l_returnflag, 'discounted', discounted FROM w
    UNION ALL
    SELECT l_returnflag, 'tax', tax FROM w
    """,
)
def q29_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape via the DataFrame unpivot (melt) operator —
    the inverse of q11's pivot.  Runs as an Expand over the aggregate,
    no extra shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    # exact fixed-point sums (cents / 1e-4 units) — order-free at any
    # scale factor (q01's sf1 lesson)
    pc = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    dh = F.round(F.col("l_discount") * 100).cast("bigint")
    th = F.round(F.col("l_tax") * 100).cast("bigint")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum(pc) / 100.0, 4).alias("base"),
        F.round(F.sum(pc * (100 - dh)) / 10000.0, 4).alias("discounted"),
        F.round(F.sum(pc * th) / 10000.0, 4).alias("tax"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["base", "discounted", "tax"],
        variableColumnName="measure",
        valueColumnName="amount",
    )


@query(
    "q30_lateral_topn",
    oracle="""
    SELECT n.n_name, c.c_name, c.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_name, round(c_acctbal, 4) AS c_acctbal
      FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name ASC
      LIMIT 2
    ) c
    """,
)
def q30_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery through the SQL surface (spark.sql):
    top-2 customers by balance per nation.  Catalyst decorrelates this
    into a window-rank plan — same shape as q12, declared relationally."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n.n_name, c.c_name, c.c_acctbal
        FROM nation n, LATERAL (
          SELECT c_name, round(c_acctbal, 4) AS c_acctbal
          FROM customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name ASC
          LIMIT 2
        ) c
        """
    )


@query(
    "q31_pandas_udf_score",
    oracle="""
    SELECT o_orderkey,
           round(ln(1 + o_totalprice) * CASE o_orderpriority
                 WHEN '1-URGENT' THEN 2.0 WHEN '2-HIGH' THEN 1.5 ELSE 1.0 END, 4)
             AS urgency_score
    FROM orders
    WHERE o_orderstatus = 'O'
    """,
)
def q31_pandas_udf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF witness (SURVEY §2.2 "UDF surface"): an
    Arrow-batched numpy scoring kernel next to JVM-side filter/pushdown.
    The filter still reaches the parquet scan — only the score column
    crosses into Python, in batches."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def urgency(price: pd.Series, prio: pd.Series) -> pd.Series:
        import numpy as np

        mult = prio.map({"1-URGENT": 2.0, "2-HIGH": 1.5}).fillna(1.0).astype(float)
        return pd.Series(np.round(np.log1p(price.astype(float)) * mult, 4))

    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", urgency("o_totalprice", "o_orderpriority").alias("urgency_score"))
    )


@query(
    "m03_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(f AS BIGINT) AS frame_index
    FROM documents,
         LATERAL (
           SELECT unnest(range(0,
             greatest(CAST(octet_length(encode(text)) / 1000 AS BIGINT) - 1, 0) + 1,
             10)) AS f
         )
    """,
)
def m03_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling plan shape (every-10th-frame explode
    over payload metadata; decode itself is the documented stub —
    operators/multimodal.frame_sample_plan)."""
    from mapreducehs_spark.operators.multimodal import attach_payload, frame_sample_plan

    docs = _t(spark, sf_dir, "documents")
    with_payload = attach_payload(docs)
    sampled = frame_sample_plan(with_payload, every_n=10)
    return sampled.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("frame_index").cast("bigint").alias("frame_index"),
    )


# =========================================================================
# Array / map functions, subqueries, sketches, skew (SURVEY §2.2 rows:
# scalar array/map functions; aggregations incl. approx_count_distinct;
# the salting helper from the 100 TB posture)
# =========================================================================

@query(
    "q32_array_map_funcs",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT)                AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
           string_split(text, ' ')[1]                                  AS first_token,
           array_to_string(
             list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 3),
             ' ')                                                      AS top3_sorted,
           list_contains(string_split(text, ' '), 'engine')            AS has_engine,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_map_keys
    FROM documents
    """,
)
def q32_array_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + map scalar-function surface (SURVEY §2.2 "array_*, map_*"):
    split/size/distinct/sort/slice/join/contains, plus a real map built
    with map_from_arrays and measured with map_keys.  The reference
    expresses these only as inline Haskell in a Mapper (Impl.hs:30-34)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    uniq = F.array_distinct(toks)
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(uniq).cast("bigint").alias("n_distinct"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_join(F.slice(F.array_sort(uniq), 1, 3), " ").alias("top3_sorted"),
        F.array_contains(toks, "engine").alias("has_engine"),
        F.size(
            F.map_keys(
                F.map_from_arrays(uniq, F.transform(uniq, lambda t: F.length(t)))
            )
        )
        .cast("bigint")
        .alias("n_map_keys"),
    )


@query(
    "q33_subqueries",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           (SELECT CAST(count(*) AS BIGINT) FROM orders o
             WHERE o.o_custkey = c.c_custkey)                      AS n_orders,
           (SELECT round(max(o_totalprice), 4) FROM orders o
             WHERE o.o_custkey = c.c_custkey)                      AS max_price
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      AND c.c_nationkey IN (SELECT n_nationkey FROM nation
                            WHERE n_regionkey <= 2)
    """,
)
def q33_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries + EXISTS + uncorrelated IN through
    the SQL surface.  Catalyst decorrelates all three into joins
    (RewriteCorrelatedScalarSubquery / RewritePredicateSubquery) — the
    plan is aggregate+join, no per-row re-execution, which is what makes
    this shape survive 100 TB."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
               (SELECT CAST(count(*) AS BIGINT) FROM orders o
                 WHERE o.o_custkey = c.c_custkey)                  AS n_orders,
               (SELECT round(max(o_totalprice), 4) FROM orders o
                 WHERE o.o_custkey = c.c_custkey)                  AS max_price
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
          AND c.c_nationkey IN (SELECT n_nationkey FROM nation
                                WHERE n_regionkey <= 2)
        """
    )


@query(
    "q34_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
           abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
             <= 0.1 * count(DISTINCT l_partkey)      AS sketch_within_10pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q34_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approx_count_distinct with its accuracy contract as
    the oracle-checked value: Spark's HLL++ (rsd 1%) and DuckDB's HLL
    give different raw estimates, so the declared result is the exact
    count plus a boolean "sketch landed within 10% of exact" — checking
    the property that makes the sketch usable at 100 TB (single pass,
    fixed memory, mergeable across partitions).

    Plan note (measured 2.4×): mixing countDistinct with the HLL in ONE
    aggregate triggers the Expand-based multi-distinct rewrite and
    demotes the whole pass to sort/object aggregation over expanded
    rows (t20's law).  HLL register updates are idempotent, so the
    estimate over the DEDUPED (flag, partkey) pairs is bit-identical to
    the estimate over the raw multiset — dedup first in a codegen hash
    aggregate, then count + sketch the small distinct frame."""
    li = _t(spark, sf_dir, "lineitem")
    dd = li.select("l_returnflag", "l_partkey").distinct()
    return dd.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
        (
            F.abs(F.approx_count_distinct("l_partkey", rsd=0.01) - F.count(F.lit(1)))
            <= 0.1 * F.count(F.lit(1))
        ).alias("sketch_within_10pct"),
    )


@query(
    "q35_salted_agg",
    oracle="""
    SELECT l_suppkey,
           round(sum(l_quantity), 4)  AS sum_qty,
           CAST(count(*) AS BIGINT)   AS n_rows
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def q35_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation (operators/skew.two_phase_agg)
    hash-matched against the plain GROUP BY: proof the hot-key path is
    result-identical.  At 100 TB this spreads a skewed key over 16
    sub-keys before the final merge; the reference's fixed
    hash-mod-workers partitioner (src/Core/Partition.hs:53-57) has no
    such escape hatch."""
    from mapreducehs_spark.operators.skew import two_phase_agg

    li = _t(spark, sf_dir, "lineitem")
    out = two_phase_agg(
        li,
        "l_suppkey",
        partial_aggs=[
            F.sum("l_quantity").alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        ],
        final_aggs=[
            F.round(F.sum("_s"), 4).alias("sum_qty"),
            F.sum("_n").alias("n_rows"),
        ],
    )
    return out.select("l_suppkey", "sum_qty", F.col("n_rows").cast("bigint").alias("n_rows"))


@query(
    "st04_stream_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type
    FROM events
    """,
)
def st04_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (state-backed dropDuplicates) — the
    idempotent-ingest shape of the LLM-pipeline dedup tier; the batch
    oracle is SELECT DISTINCT.  See streaming/ops.stream_distinct for
    the bounded-state (dropDuplicatesWithinWatermark) variant used on
    unbounded ingests."""
    from mapreducehs_spark import streaming as st

    deduped = st.stream_distinct(
        _replayed_events(spark, sf_dir), keys=["user_id", "event_type"]
    )
    return st.run_to_batch(deduped, "st04_sink", output_mode="append")


@query(
    "st05_stream_stream_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch,
           CAST(floor(epoch(p.ts)) AS BIGINT) AS purchase_epoch,
           round(p.value, 4) AS purchase_value
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def st05_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with event-time range condition +
    watermarks on both sides (bounded join state — the only shape that
    survives an unbounded stream).  Differential vs the batch interval
    join in DuckDB; equality holds because inner joins emit on match and
    the ordered replay never lets the watermark evict a click before its
    30-minute match horizon has streamed past."""
    from mapreducehs_spark import streaming as st

    joined = st.clicks_then_purchases(
        _replayed_events(spark, sf_dir), within="30 minutes", watermark="1 hour"
    )
    return st.run_to_batch(joined, "st05_sink", output_mode="append")


# =========================================================================
# Window frames / deterministic sampling / packing / cluster resolution
# =========================================================================

@query(
    "q36_window_frames",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(epoch(o_orderdate) AS BIGINT) AS ep
      FROM orders
    )
    SELECT o_orderkey,
           round(sum(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY ep
                 RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 4) AS trailing_30d_spend,
           round(percent_rank() OVER (
                 PARTITION BY o_custkey ORDER BY o_totalprice), 6)    AS price_pct_rank,
           round(cume_dist() OVER (
                 PARTITION BY o_custkey ORDER BY o_totalprice), 6)    AS price_cume_dist,
           round((ep - lag(ep) OVER (
                 PARTITION BY o_custkey ORDER BY ep, o_orderkey)) / 86400.0, 4)
                                                                      AS days_since_prev
    FROM o
    """,
)
def q36_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame trailing window + distribution functions: per
    customer, the trailing-30-day spend (rangeBetween over epoch
    seconds — a *value* frame, not a row frame), percent_rank /
    cume_dist over price, and the day gap to the previous order (lag
    with a deterministic tiebreak).  All four window specs share the
    customer partitioning, so Catalyst plans ONE shuffle on o_custkey;
    per-key state is a bounded sliding frame — scales as a plain
    repartition+sort at 100 TB.  The reference's kernel has no ordering
    concept at all (SURVEY §2.2 "Window functions")."""
    o = _t(spark, sf_dir, "orders")
    # NTZ → timestamp → long: epoch seconds under the UTC session tz,
    # matching DuckDB's epoch() on the same naive timestamp.
    ep = F.col("o_orderdate").cast("timestamp").cast("long")
    staged = o.select("o_orderkey", "o_custkey", "o_totalprice", ep.alias("ep"))
    w_range = (
        Window.partitionBy("o_custkey").orderBy("ep").rangeBetween(-2592000, 0)
    )
    w_price = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    w_seq = Window.partitionBy("o_custkey").orderBy("ep", "o_orderkey")
    return staged.select(
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w_range), 4).alias("trailing_30d_spend"),
        F.round(F.percent_rank().over(w_price), 6).alias("price_pct_rank"),
        F.round(F.cume_dist().over(w_price), 6).alias("price_cume_dist"),
        F.round((F.col("ep") - F.lag("ep").over(w_seq)) / 86400.0, 4).alias(
            "days_since_prev"
        ),
    )


from mapreducehs_spark.operators import sampling as _sampling  # noqa: E402

_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}
_STRATA_RATES = {"en": 0.25, "de": 1.0, "fr": 0.5, "es": 0.5, "zh": 0.5}


@query(
    "q37_hash_split",
    oracle=f"""
    SELECT {_sampling.hash_split_case_sql(_SPLITS)} AS split,
           CAST(count(*) AS BIGINT)       AS n_docs,
           round(avg(n_chars), 4)         AS avg_chars,
           CAST(min(doc_id) AS BIGINT)    AS min_doc
    FROM documents
    GROUP BY 1
    """,
)
def q37_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by content hash (md5 prefix
    as a 32-bit uniform draw).  No RNG: the same document lands in the
    same split on any cluster, any re-run, any engine — which is why
    the DuckDB oracle can reproduce it bit-for-bit.  Pure per-row
    predicate on the scan; zero shuffle before the tiny final agg."""
    docs = _t(spark, sf_dir, "documents")
    return (
        _sampling.hash_split(docs, _SPLITS)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.min("doc_id").alias("min_doc"),
        )
    )


@query(
    "q38_stratified_sample",
    oracle=f"""
    SELECT lang,
           CAST(count(*) AS BIGINT)    AS n_kept,
           round(avg(n_chars), 4)      AS avg_chars
    FROM documents
    WHERE substr(md5(text), 1, 8) < {_sampling.stratified_threshold_case_sql(_STRATA_RATES)}
    GROUP BY lang
    """,
)
def q38_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling: per-language keep rates
    (downsample dominant 'en' to 25%, keep all 'de', half the rest) via
    the content-hash draw — the corpus-rebalancing step of a training
    pipeline, reproducible across engines and re-shardings.  Scan-shaped
    filter; survives 100 TB trivially."""
    docs = _t(spark, sf_dir, "documents")
    return (
        _sampling.stratified_sample(docs, _STRATA_RATES, strata_col="lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


@query(
    "q39_sequence_packing",
    oracle="""
    WITH t AS (
      SELECT source, doc_id,
             len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS n_tok
      FROM documents
    ), r AS (
      SELECT source, doc_id, n_tok,
             sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
      FROM t
    )
    SELECT source,
           CAST(floor((running - n_tok) / 512.0) AS BIGINT) AS chunk_id,
           CAST(count(*) AS BIGINT)  AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS tok_total,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM r
    GROUP BY 1, 2
    """,
)
def q39_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: lay documents end-to-end per
    source shard and cut fixed 512-token chunks (offset packing via one
    running-sum window).  Parallelism = #shards — no global sort, which
    is the scalable form (chunks never span input shards at 100 TB
    either).  Emits per-chunk packing stats."""
    docs = _t(spark, sf_dir, "documents")
    return text.pack_sequences(docs, budget_tokens=512)


@query(
    "t07_normalize_stats",
    oracle="""
    WITH n AS (
      SELECT lang, length(text) AS before_len,
             length(trim(regexp_replace(regexp_replace(lower(text),
                    '\\b(the|a|of|and|to|in|is|it)\\b', ' ', 'g'),
                    '\\s+', ' ', 'g'))) AS after_len
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT)      AS n_docs,
           round(avg(before_len), 4)     AS avg_chars_before,
           round(avg(after_len), 4)      AS avg_chars_after,
           round(1.0 - sum(after_len) / CAST(sum(before_len) AS DOUBLE), 6)
                                         AS char_reduction
    FROM n
    GROUP BY lang
    """,
)
def t07_normalize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-normalization pass (lowercase, stopword scrub, whitespace
    collapse) with per-language before/after size accounting — the
    cleaning step of a data pipeline, kept entirely in regexp built-ins
    (whole-stage codegen; RE2 and Java regex agree on this pattern
    subset, so the oracle runs the identical expressions)."""
    docs = _t(spark, sf_dir, "documents")
    n = docs.select(
        "lang",
        F.length("text").alias("before_len"),
        F.length(text.normalize_text("text")).alias("after_len"),
    )
    return n.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("before_len"), 4).alias("avg_chars_before"),
        F.round(F.avg("after_len"), 4).alias("avg_chars_after"),
        F.round(
            1.0 - F.sum("after_len") / F.sum("before_len").cast("double"), 6
        ).alias("char_reduction"),
    )


@query(
    "d06_dup_clusters",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
      FROM documents
    ), pos AS (
      SELECT doc_id, t, unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS i
      FROM toks
    ), sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
      FROM pos
    ), sized AS (
      SELECT doc_id, count(*) AS set_size FROM sh GROUP BY 1
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), p AS (
      SELECT id_a, id_b
      FROM inter
      JOIN sized sa ON sa.doc_id = id_a
      JOIN sized sb ON sb.doc_id = id_b
      WHERE inter / CAST(sa.set_size + sb.set_size - inter AS DOUBLE) >= 0.12
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM p
      UNION
      SELECT id_b, id_a FROM p
    ), reach(src, dst) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.dst FROM edges e JOIN reach r ON e.dst = r.src
    )
    SELECT src AS doc_id, CAST(min(dst) AS BIGINT) AS rep_id
    FROM reach
    GROUP BY src
    """,
)
def d06_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: exact-Jaccard pairs (d02 semantics)
    resolved into connected components by iterative min-label
    propagation (dedup.resolve_duplicate_clusters) — each doc mapped to
    its cluster representative (min doc id).  The iterative Spark loop
    is oracle-checked against a DuckDB RECURSIVE transitive closure:
    genuinely-iterative dataflow, hash-matched anyway."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.12, max_shingle_df=None)
    return dedup.resolve_duplicate_clusters(pairs)


@query(
    "q40_full_outer_reconcile",
    oracle="""
    WITH h1 AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_h1,
             round(sum(o_totalprice), 4) AS spend_h1
      FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY o_custkey
    ), h2 AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_h2,
             round(sum(o_totalprice), 4) AS spend_h2
      FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      GROUP BY o_custkey
    )
    SELECT coalesce(h1.o_custkey, h2.o_custkey) AS custkey,
           coalesce(n_h1, 0)       AS n_h1,
           coalesce(n_h2, 0)       AS n_h2,
           coalesce(spend_h1, 0.0) AS spend_h1,
           coalesce(spend_h2, 0.0) AS spend_h2,
           CASE WHEN h1.o_custkey IS NULL THEN 'h2_only'
                WHEN h2.o_custkey IS NULL THEN 'h1_only'
                ELSE 'both' END    AS presence
    FROM h1 FULL OUTER JOIN h2 ON h1.o_custkey = h2.o_custkey
    """,
)
def q40_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two period aggregates (customers active in
    either half), with coalesced keys and a presence tag — the
    reconciliation shape.  Both sides pre-aggregate BEFORE the join, so
    the outer join shuffles #customers rows, not #orders rows; at
    100 TB that ordering (agg below join) is the difference between a
    small and a huge shuffle."""
    o = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("timestamp")
    h1 = (
        o.filter(F.col("o_orderdate") < cutoff)
        .groupBy(F.col("o_custkey").alias("k1"))
        .agg(F.count(F.lit(1)).alias("n_h1"), F.round(F.sum("o_totalprice"), 4).alias("spend_h1"))
    )
    h2 = (
        o.filter(F.col("o_orderdate") >= cutoff)
        .groupBy(F.col("o_custkey").alias("k2"))
        .agg(F.count(F.lit(1)).alias("n_h2"), F.round(F.sum("o_totalprice"), 4).alias("spend_h2"))
    )
    j = h1.join(h2, h1.k1 == h2.k2, "full_outer")
    return j.select(
        F.coalesce("k1", "k2").alias("custkey"),
        F.coalesce("n_h1", F.lit(0)).alias("n_h1"),
        F.coalesce("n_h2", F.lit(0)).alias("n_h2"),
        F.coalesce("spend_h1", F.lit(0.0)).alias("spend_h1"),
        F.coalesce("spend_h2", F.lit(0.0)).alias("spend_h2"),
        F.when(F.col("k1").isNull(), "h2_only")
        .when(F.col("k2").isNull(), "h1_only")
        .otherwise("both")
        .alias("presence"),
    )


@query(
    "t08_repetition_scores",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
      FROM documents
    ), pos AS (
      SELECT doc_id, lang, t, unnest(range(1, greatest(len(t) - 1, 0) + 1)) AS i
      FROM toks
    ), grams AS (
      SELECT doc_id, lang, array_to_string(t[i:i+1], ' ') AS g
      FROM pos
    ), per AS (
      SELECT doc_id, lang, g, count(*) AS c FROM grams GROUP BY 1, 2, 3
    ), doc AS (
      SELECT doc_id, lang, max(c) AS top_c, sum(c) AS total_c
      FROM per GROUP BY 1, 2
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN top_c / CAST(total_c AS DOUBLE) > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
                                    AS n_repetitive,
           round(avg(top_c / CAST(total_c AS DOUBLE)), 6) AS avg_top_bigram_share
    FROM doc
    GROUP BY lang
    """,
)
def t08_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality filter (Gopher-style): per document, the share
    of its most frequent 2-gram; docs above 20% are flagged repetitive,
    reported per language.  Shape: one Arrow-batched n-gram kernel
    (scan-shaped, linear in corpus tokens — see text.ngram_hash_rows
    for why not the explode/HOF form) + three hash aggregations: the
    scalable "per-doc holistic stat then corpus rollup" form."""
    docs = _t(spark, sf_dir, "documents")
    grams = text.ngram_hash_rows(docs, n=2).withColumnRenamed("carry", "lang")
    per = grams.groupBy("id", "lang", "gram").agg(F.count(F.lit(1)).alias("c"))
    doc = per.groupBy("id", "lang").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("total_c")
    )
    share = F.col("top_c") / F.col("total_c").cast("double")
    return doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(share > 0.2, 1).otherwise(0)).cast("bigint").alias("n_repetitive"),
        F.round(F.avg(share), 6).alias("avg_top_bigram_share"),
    )


@query(
    "q41_approx_percentile_contract",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS exact_median,
           TRUE                                           AS approx_within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q41_approx_percentile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (mergeable t-digest-style sketch — the 100 TB
    path for quantiles: single pass, bounded memory, partial+final)
    checked against the exact holistic percentile: the declared result
    is the exact median plus the contract bit "sketch landed within 5%"
    (same pattern as q34's HLL contract — the property that makes the
    sketch usable at scale is what gets hash-checked)."""
    li = _t(spark, sf_dir, "lineitem")
    exact = F.expr("percentile(l_extendedprice, 0.5)")
    approx = F.expr("approx_percentile(l_extendedprice, 0.5, 10000)")
    return li.groupBy("l_returnflag").agg(
        F.round(exact, 4).alias("exact_median"),
        (F.abs(approx - exact) <= 0.05 * exact).alias("approx_within_5pct"),
    )


@query(
    "st06_stream_sliding",
    oracle="""
    WITH slides AS (
      SELECT e.event_type, e.value,
             CAST(s AS BIGINT) AS window_start_epoch
      FROM events e,
           LATERAL (
             SELECT unnest(range(
               CAST(floor(epoch(e.ts) / 300) * 300 AS BIGINT) - 600,
               CAST(floor(epoch(e.ts) / 300) * 300 AS BIGINT) + 300,
               300)) AS s
           )
      WHERE epoch(e.ts) >= s AND epoch(e.ts) < s + 900
    )
    SELECT window_start_epoch, event_type,
           count(*) AS n_events, round(sum(value), 4) AS sum_value
    FROM slides
    GROUP BY 1, 2
    """,
)
def st06_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming watermarked SLIDING-window agg (15 min window / 5 min
    slide, per event type) == the batch sliding aggregate: the
    overlapping-window counterpart of st01, bounded state via watermark
    expiry (see streaming/ops.sliding_aggregate)."""
    from mapreducehs_spark import streaming as st

    agg = st.sliding_aggregate(
        _replayed_events(spark, sf_dir),
        window="15 minutes",
        slide="5 minutes",
        watermark="30 minutes",
    )
    out = st.run_to_batch(agg, "st06_sink", output_mode="append")
    return out.filter(F.col("event_type") != "__flush__")


@query(
    "q42_null_semantics",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT)                        AS n_rows,
           CAST(count(nullif(l_discount, 0.0)) AS BIGINT)  AS n_discounted,
           round(avg(nullif(l_discount, 0.0)), 6)          AS avg_nonzero_disc,
           CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NOT DISTINCT FROM NULL
                         THEN 1 ELSE 0 END) AS BIGINT)     AS n_zero,
           round(sum(coalesce(nullif(l_discount, 0.0), 0.0)), 4) AS sum_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q42_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics surface: nullif introduces nulls, count(expr) vs
    count(*) (nulls skipped vs not), avg over a nullable expression,
    null-safe equality (eqNullSafe ≙ IS NOT DISTINCT FROM), coalesce
    back-fill — the SQL three-valued-logic contract the reference's
    typed Haskell rows never face (no nulls exist there, SURVEY §1.1)."""
    li = _t(spark, sf_dir, "lineitem")
    nz = F.expr("nullif(l_discount, 0.0d)")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(nz).alias("n_discounted"),
        F.round(F.avg(nz), 6).alias("avg_nonzero_disc"),
        F.sum(nz.eqNullSafe(F.lit(None)).cast("int")).cast("bigint").alias("n_zero"),
        F.round(F.sum(F.coalesce(nz, F.lit(0.0))), 4).alias("sum_disc"),
    )


@query(
    "q43_outer_join_directions",
    oracle="""
    SELECT c.c_custkey,
           CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
           round(coalesce(o.spend, 0.0), 4)        AS spend,
           o.n_orders IS NOT NULL                  AS has_orders
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS spend
      FROM orders GROUP BY o_custkey
    ) o ON o.o_custkey = c.c_custkey
    """,
)
def q43_outer_join_directions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer-join direction surface: expressed as a RIGHT OUTER join
    (aggregated orders right-joined to customer — every customer
    survives, orderless ones null-filled) and oracle-checked against
    the equivalent LEFT JOIN formulation — witnessing both directions
    mean the same thing with sides swapped.  Orders aggregate BEFORE
    the join (shuffle carries #customers rows, q40's rule); customer is
    the broadcast candidate at real scale only if the dimension is
    small — here both sides shuffle on the key."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("o_totalprice").alias("spend"))
    )
    j = o.join(c, o.o_custkey == c.c_custkey, "right_outer")
    return j.select(
        "c_custkey",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.round(F.coalesce("spend", F.lit(0.0)), 4).alias("spend"),
        F.col("n_orders").isNotNull().alias("has_orders"),
    )


@query(
    "p03_pipeline_agg_fastpath",
    oracle="""
    SELECT term AS key, CAST(count(*) AS BIGINT) AS value
    FROM (
      SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                x -> x != '')) AS term
      FROM documents
    )
    GROUP BY 1
    """,
)
def p03_pipeline_agg_fastpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pipeline kernel's declared-associativity fast path:
    ``reduce_agg`` lowers to ``groupBy().agg`` (map-side partial
    aggregation) instead of the whole-group ``applyInPandas`` that the
    general Reducer contract forces (SURVEY §4.3.2) — the API that lets
    a reference-style pipeline keep MapReduce semantics AND scale.
    Hash-matched against the same word count as p02."""
    from mapreducehs_spark.pipeline import Pipeline

    docs = _t(spark, sf_dir, "documents")
    kv = (
        docs.select(F.explode_outer(text.tokens("text")).alias("key"))
        .filter(F.col("key").isNotNull())
        .withColumn("value", F.lit(1).cast("bigint"))
    )
    return Pipeline().reduce_agg(F.sum("value").cast("bigint").alias("value")).run(kv)


@query(
    "q44_cross_join_matrix",
    oracle="""
    WITH r AS (
      SELECT n_regionkey, round(sum(o_totalprice), 4) AS spend
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_regionkey
    )
    SELECT a.n_regionkey AS region_a, b.n_regionkey AS region_b,
           round(a.spend / b.spend, 6) AS spend_ratio
    FROM r a CROSS JOIN r b
    """,
)
def q44_cross_join_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join — the all-pairs comparison matrix over a
    SMALL aggregated frame (5 regions → 25 rows).  The scale rule a
    cross join must obey: aggregate down to a bounded frame FIRST, then
    cartesian only the reduced sides (Spark plans a broadcast
    nested-loop over the tiny inputs); a cross join over raw fact
    tables is the one shape nothing can save."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("spend"))
    )
    a = r.select(F.col("n_regionkey").alias("region_a"), F.col("spend").alias("sa"))
    b = r.select(F.col("n_regionkey").alias("region_b"), F.col("spend").alias("sb"))
    return a.crossJoin(b).select(
        "region_a", "region_b", F.round(F.col("sa") / F.col("sb"), 6).alias("spend_ratio")
    )


@query(
    "q45_from_json_struct",
    oracle="""
    SELECT event_type,
           CAST(count(*) FILTER (WHERE json_valid(props)
                AND json_extract_string(props, '$.k') IS NOT NULL) AS BIGINT)
                                                                  AS n_parsed,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT) // 10) AS BIGINT)
                                                                  AS sum_k_decile
    FROM events
    GROUP BY event_type
    """,
)
def q45_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-declared JSON parsing: ``from_json(props, 'k INT')``
    yields a typed struct column (vs q19's path-extraction
    get_json_object) — the declared-schema form is what survives at
    100 TB because the parse happens once per row into Tungsten format,
    and malformed rows turn into nulls instead of job failures
    (PERMISSIVE mode), which the n_parsed counter witnesses."""
    events = _t(spark, sf_dir, "events")
    parsed = events.select(
        "event_type", F.from_json("props", "k INT").alias("p")
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.col("p.k")).alias("n_parsed"),
        F.sum(F.floor(F.col("p.k") / 10)).cast("bigint").alias("sum_k_decile"),
    )


@query(
    "q46_brand_supplier_stats",
    oracle="""
    SELECT p_brand, p_type,
           CAST(count(DISTINCT l_suppkey) AS BIGINT)  AS n_suppliers,
           CAST(count(*) AS BIGINT)                   AS n_lines,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_size BETWEEN 5 AND 25
      AND p_type NOT LIKE '%ECONOMY%'
      AND p_brand <> 'Brand#1'
    GROUP BY p_brand, p_type
    """,
)
def q46_brand_supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: supplier/revenue stats per part brand+type with
    BETWEEN / NOT LIKE / <> dimension filters.  The part filters are
    applied BEFORE the join and the filtered dimension broadcasts, so
    the fact table never shuffles for the join — only the final
    group-by exchanges; count(DISTINCT) runs as Spark's two-phase
    distinct-aggregate expansion."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_size").between(5, 25)
        & ~F.col("p_type").like("%ECONOMY%")
        & (F.col("p_brand") != "Brand#1")
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return j.groupBy("p_brand", "p_type").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        ),
    )


@query("d07_near_dedup_drop_list")  # oracle attached below (_d15_oracle(0.25, 0.6))
def d07_near_dedup_drop_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dedup pipeline (the composed 100 TB shape):
    MinHash-LSH candidates → exact Jaccard verification on candidate
    docs only → duplicate-cluster resolution → the drop list
    (doc_id, rep_id) of every document whose cluster representative
    survives.  Runs the value-checked composition by DEFAULT (round 6):
    d11's replayable candidates + exact Jaccard at the stricter 0.6 +
    recursive-closure-equivalent cluster resolution, all replayed by
    the DuckDB oracle (d15's renderer).  The vectorized-hash candidate
    variant (dedup.near_dedup_drop_list) remains the throughput
    alternate (alt_d07 in bench.py), recall-pinned in tests."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.near_dedup_drop_list_checked(
        docs, est_threshold=0.25, jaccard_threshold=0.6
    )


@query(
    "q47_python_udtf",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
      FROM documents
    ), pos AS (
      SELECT lang, CAST(i - 1 AS INT) AS pos, t[i] AS term
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i)
      WHERE i <= 8
    )
    SELECT lang, pos,
           CAST(count(*) AS BIGINT)              AS n_terms,
           CAST(count(DISTINCT term) AS BIGINT)  AS n_distinct
    FROM pos
    GROUP BY lang, pos
    """,
)
def q47_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (one row in → many rows out through a
    user-defined TABLE function, the general form of the reference's
    Mapper O1): a tokenizer UDTF applied per document via SQL LATERAL,
    emitting (pos, term) rows.  UDTFs are the slow general path — the
    equivalent explode() is preferred when expressible (p02) — but the
    API must exist for true table-generating logic; the oracle is the
    LATERAL-unnest equivalent."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, term string")
    class TokenizeHead:
        def eval(self, text: str):
            for i, t in enumerate(text.split()[:8]):
                yield i, t

    spark.udtf.register("tokenize_head", TokenizeHead)
    docs = _t(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        """
        SELECT lang, pos,
               count(*)            AS n_terms,
               count(DISTINCT term) AS n_distinct
        FROM __docs_udtf, LATERAL tokenize_head(text)
        GROUP BY lang, pos
        """
    ).select(
        "lang", "pos",
        F.col("n_terms").cast("bigint").alias("n_terms"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
    )


@query(
    "t09_vocab_growth",
    oracle="""
    WITH tok AS (
      SELECT source,
             unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS term
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT)             AS n_tokens,
           CAST(count(DISTINCT term) AS BIGINT) AS vocab,
           round(count(DISTINCT term) / CAST(count(*) AS DOUBLE), 6) AS type_token_ratio
    FROM tok
    GROUP BY source
    """,
)
def t09_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics per source shard: token count,
    vocabulary size (distinct terms), type-token ratio — the Heaps-law
    reporting a training-data pipeline emits per ingest source.  One
    explode + a distinct-aggregate (two-phase expand at scale); at
    100 TB swap count(DISTINCT) for approx_count_distinct per the q34
    contract."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode_outer(text.tokens("text")).alias("term")
    ).filter(F.col("term").isNotNull())
    return tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("term").alias("vocab"),
        F.round(F.countDistinct("term") / F.count(F.lit(1)).cast("double"), 6).alias(
            "type_token_ratio"
        ),
    )


@query(
    "q48_large_volume_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           round(o_totalprice, 4) AS total_price,
           round(sum(l_quantity), 4) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q48_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold,
    joined back to customer detail.  The IN-subquery is a left-semi join
    against a pre-aggregated key set: the HAVING agg shuffles lineitem
    on l_orderkey ONCE, the surviving keys (≪ orders) semi-join the
    fact, and the final per-order agg reuses the same key — Catalyst
    plans the semi-join build side from the filtered agg, so the big
    table is never scanned twice unfiltered."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 300)
        .select("l_orderkey")
    )
    j = (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    return (
        j.groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round("o_totalprice", 4).alias("total_price"),
            "sum_qty",
        )
    )


@query(
    "q49_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q49_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier by quarterly revenue, ties kept):
    the "view + scalar-max subquery" is lowered to one agg over the
    date-pruned fact plus a single-row max re-agg broadcast back over
    the supplier revenues — no global sort, no single-partition window.
    Revenue is rounded BEFORE the max-compare on both sides so the
    tie-equality is exact despite float summation order."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "total_revenue"
            )
        )
    )
    best = rev.agg(F.max("total_revenue").alias("__best"))
    return (
        rev.join(F.broadcast(best), rev.total_revenue == best.__best)
        .join(F.broadcast(sup), rev.supplier_no == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "t10_bpe_token_counts",
    oracle=r"""
    WITH tok AS (
      SELECT lang,
             unnest(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS term
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT)             AS n_tokens,
           CAST(count(DISTINCT term) AS BIGINT) AS vocab,
           round(avg(length(term)), 6)          AS avg_token_len,
           CAST(sum(CASE WHEN regexp_matches(term, '^[0-9]+$') THEN 1 ELSE 0 END) AS BIGINT) AS n_number_tokens,
           CAST(sum(CASE WHEN NOT regexp_matches(term, '^[a-zA-Z0-9]') THEN 1 ELSE 0 END) AS BIGINT) AS n_punct_tokens
    FROM tok
    GROUP BY lang
    """,
)
def t10_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-tokenizer (BPE-ish) token accounting per language: alpha
    runs, digit runs, and single punctuation marks — the token-budget
    estimate a training pipeline reports before actual BPE merges.
    One codegen'd regexp pass + explode + hash agg; no UDFs."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode_outer(text.bpe_ish_tokens("text")).alias("term")
    ).filter(F.col("term").isNotNull())
    return tok.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("term").alias("vocab"),
        F.round(F.avg(F.length("term")), 6).alias("avg_token_len"),
        F.sum(F.when(F.col("term").rlike(r"^[0-9]+$"), 1).otherwise(0)).alias(
            "n_number_tokens"
        ),
        F.sum(F.when(~F.col("term").rlike(r"^[a-zA-Z0-9]"), 1).otherwise(0)).alias(
            "n_punct_tokens"
        ),
    )


@query(
    "q50_customer_order_distribution",
    oracle="""
    SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY n_orders
    """,
)
def q50_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the order-count histogram over ALL customers —
    the left outer join keeps zero-order customers (count(o_orderkey)
    counts non-null only, so they land in bucket 0).  Two aggregations,
    each reduced before it shuffles: orders pre-aggregates per customer
    and the histogram input is #customers, not #orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "st07_stream_static_join",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type,
           CAST(floor(epoch(e.ts)) AS BIGINT) AS event_epoch,
           round(e.value, 4) AS value,
           n.n_name AS n_name
    FROM events e
    LEFT JOIN customer c ON c.c_custkey = e.user_id
    LEFT JOIN nation n   ON n.n_nationkey = c.c_nationkey
    """,
)
def st07_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment (streaming.enrich_with_dim):
    every micro-batch left-joins the event stream against the static
    customer→nation dimension.  Stateless append — no watermark, no
    state store, exactly one output row per event; the batch oracle is
    the identical left join.  The canonical shape for attaching
    slowly-changing reference data to an unbounded ingest."""
    from mapreducehs_spark import streaming as st

    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    dim = cust.join(nation, cust.c_nationkey == nation.n_nationkey, "left_outer").select(
        "c_custkey", "n_name"
    )
    enriched = st.enrich_with_dim(_replayed_events(spark, sf_dir), dim)
    out = st.run_to_batch(enriched, "st07_sink", output_mode="append")
    return out.filter(F.col("event_type") != "__flush__")


@query(
    "q51_dormant_rich_customers",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT)   AS n_customers,
           round(sum(c_acctbal), 4)   AS total_balance
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    """,
)
def q51_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no orders
    since 2000 (dormant).  The scalar avg subquery is a one-row
    broadcast cross join (never a per-row recompute); NOT EXISTS lowers
    to a left-anti join whose build side is date-filtered BEFORE the
    join — the date predicate reaches the orders parquet scan."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(orders.select("o_custkey"), cust.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 4).alias("total_balance"),
        )
    )


@query(
    "q52_latest_event_per_user",
    oracle="""
    SELECT user_id,
           event_id AS last_event_id,
           event_type AS last_type,
           CAST(floor(epoch(ts)) AS BIGINT) AS last_epoch,
           round(value, 4) AS last_value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q52_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key compaction (the changelog→snapshot batch
    shape, batch twin of the st03/latest_per_user streaming state):
    one window shuffle on the key, deterministic tiebreak on event_id.
    At 100 TB this is the daily CDC compaction job — the window spec
    keeps partial ordering per key only, never a global sort."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
            F.unix_timestamp("ts").alias("last_epoch"),
            F.round("value", 4).alias("last_value"),
        )
    )


@query(
    "q53_kll_quantile_contract",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS exact_p50,
           round(quantile_cont(value, 0.9), 4) AS exact_p90,
           TRUE AS p50_within_rank_5pct,
           TRUE AS p90_within_rank_5pct
    FROM events
    GROUP BY event_type
    """,
)
def q53_kll_quantile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketch (DataSketches, Spark 4) with its accuracy
    contract as the oracle-checked value: the mergeable single-pass
    sketch is THE 100 TB percentile path (bounded memory per group,
    partial+final merge), so the declared result is the exact quantile
    plus booleans pinning the sketch's p50/p90 between the exact 45-55
    / 85-95 rank bounds.  Complements q41 (approx_percentile digest) —
    KLL sketches can additionally be stored and merged across runs."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.expr("percentile(value, array(0.45, 0.50, 0.55, 0.85, 0.90, 0.95))").alias("ex"),
        F.kll_sketch_agg_double("value").alias("sk"),
    )
    p50 = F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.5))
    p90 = F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(0.9))
    return agg.select(
        "event_type",
        F.round(F.col("ex")[1], 4).alias("exact_p50"),
        F.round(F.col("ex")[4], 4).alias("exact_p90"),
        ((p50 >= F.col("ex")[0]) & (p50 <= F.col("ex")[2])).alias("p50_within_rank_5pct"),
        ((p90 >= F.col("ex")[3]) & (p90 <= F.col("ex")[5])).alias("p90_within_rank_5pct"),
    )


@query(
    "q54_theta_sketch_set_ops",
    oracle="""
    WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT CAST((SELECT count(*) FROM c) AS BIGINT) AS exact_clickers,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS exact_purchasers,
           CAST((SELECT count(*) FROM (SELECT * FROM c UNION SELECT * FROM p)) AS BIGINT)
               AS exact_either,
           CAST((SELECT count(*) FROM (SELECT * FROM c INTERSECT SELECT * FROM p)) AS BIGINT)
               AS exact_both,
           TRUE AS union_within_5pct,
           TRUE AS intersect_within_5pct
    """,
)
def q54_theta_sketch_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketches (DataSketches, Spark 4): mergeable distinct-count
    sketches that support UNION and INTERSECTION — the audience-overlap
    computation (clickers ∩ purchasers) that exact distinct cannot do
    incrementally at 100 TB (you cannot intersect two HLLs).  Declared
    result: exact set sizes + booleans pinning both sketch estimates
    within 5% of exact."""
    ev = _t(spark, sf_dir, "events")
    sk = ev.agg(
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("sk_c"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("sk_p"),
        F.countDistinct(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("exact_clickers"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("exact_purchasers"),
    )
    est_u = F.theta_sketch_estimate(F.theta_union(F.col("sk_c"), F.col("sk_p")))
    est_i = F.theta_sketch_estimate(F.theta_intersection(F.col("sk_c"), F.col("sk_p")))
    exact = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(F.collect_set("event_type").alias("ts"))
        .agg(
            F.count(F.lit(1)).alias("exact_either"),
            F.sum(F.when(F.size("ts") == 2, 1).otherwise(0))
            .cast("bigint")
            .alias("exact_both"),
        )
    )
    return sk.crossJoin(F.broadcast(exact)).select(
        F.col("exact_clickers").cast("bigint").alias("exact_clickers"),
        F.col("exact_purchasers").cast("bigint").alias("exact_purchasers"),
        "exact_either",
        "exact_both",
        (F.abs(est_u - F.col("exact_either")) <= 0.05 * F.col("exact_either")).alias(
            "union_within_5pct"
        ),
        (F.abs(est_i - F.col("exact_both")) <= 0.05 * F.col("exact_both")).alias(
            "intersect_within_5pct"
        ),
    )


@query(
    "q55_variant_json",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS distinct_k
    FROM events
    GROUP BY event_type
    """,
)
def q55_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariantType (Spark 4's native semi-structured path): props is
    parsed ONCE into a binary variant and fields are extracted with
    variant_get — at 100 TB the parse cost is paid once per row, not
    once per extracted path as with repeated get_json_object, and
    variant columns stored in parquet keep shredded-column pushdown.
    Oracle is the plain JSON-string extraction."""
    events = _t(spark, sf_dir, "events")
    v = events.select(
        "event_type", F.parse_json("props").alias("pv")
    )
    k = F.variant_get(F.col("pv"), "$.k", "bigint")
    return v.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.sum("k").alias("sum_k"),
        F.countDistinct("k").alias("distinct_k"),
    )


@query(
    "q56_python_datasource",
    oracle="""
    SELECT 'b' || CAST(i % 10 AS VARCHAR) AS bucket,
           CAST(count(*) AS BIGINT)  AS n_rows,
           CAST(sum(i * i) AS BIGINT) AS sum_sq
    FROM range(0, 2000) t(i)
    GROUP BY 1
    """,
)
def q56_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4 DataSource API — the
    user-visible analog of the reference's pluggable MonadStore
    backends, src/Core/Store.hs:41-119): a registered ``seqgen`` format
    with declared schema and partition planning (8 InputPartitions →
    parallel scan), aggregated like any other table.  The oracle
    recomputes the deterministic generator in SQL."""
    from mapreducehs_spark.sources import pydatasource

    pydatasource.register(spark)
    df = spark.read.format("seqgen").option("n", 2000).option("parts", 8).load()
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("id_sq").cast("bigint").alias("sum_sq"),
    )


@query(
    "m04_arrow_payload_stats",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1)) ELSE -1 END AS INT)
             AS head_byte,
           CAST(list_sum(list_transform(string_split(text, ''), x -> ascii(x))) AS BIGINT)
             AS byte_sum
    FROM documents
    """,
)
def m04_arrow_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy payload processing via ``mapInArrow`` (the third UDF
    batch interface after pandas_udf and mapInPandas): binary payloads
    stay in the Arrow buffer, numpy reduces per-segment via the offsets
    array — no per-cell Python objects.  Oracle recomputes byte stats
    from the source text (payload = UTF-8 bytes; the corpus is ASCII so
    per-char ascii() equals per-byte value)."""
    from mapreducehs_spark.operators.multimodal import attach_payload, payload_byte_stats

    docs = _t(spark, sf_dir, "documents")
    return payload_byte_stats(attach_payload(docs))


@query(
    "q57_merge_upsert",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey,
           CASE WHEN c_custkey % 10 = 0 THEN round(c_acctbal + 1000, 4)
                ELSE round(c_acctbal, 4) END AS c_acctbal,
           c_mktsegment
    FROM customer
    WHERE c_custkey % 97 != 0
    UNION ALL
    SELECT c_custkey + 1000000 AS c_custkey,
           'new_' || CAST(c_custkey AS VARCHAR) AS c_name,
           c_nationkey,
           100.0 AS c_acctbal,
           'NEW' AS c_mktsegment
    FROM customer
    WHERE c_custkey % 13 = 0
    """,
)
def q57_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on plain parquet (operators/merge.py): a
    deterministic CDC batch — balance updates for custkey%10, tombstone
    deletes for custkey%97, inserts under new keys for custkey%13 —
    applied in ONE key-shuffled window pass; the oracle states the
    expected final table directly.  The reference-parity reading: this
    is a Reducer picking the highest-priority row per key over the
    tagged union (src/Core/MapReduceC.hs:26)."""
    from mapreducehs_spark.operators.merge import merge_upsert

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", F.round("c_acctbal", 4).alias("c_acctbal"),
        "c_mktsegment",
    )
    upd = cust.filter((F.col("c_custkey") % 10 == 0) & (F.col("c_custkey") % 97 != 0)).select(
        "c_custkey", "c_name", "c_nationkey",
        F.round(F.col("c_acctbal") + 1000, 4).alias("c_acctbal"),
        "c_mktsegment", F.lit(False).alias("is_delete"),
    )
    dels = cust.filter(F.col("c_custkey") % 97 == 0).withColumn(
        "is_delete", F.lit(True)
    )
    ins = cust.filter(F.col("c_custkey") % 13 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("new_"), F.col("c_custkey").cast("string")).alias("c_name"),
        "c_nationkey",
        F.lit(100.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
        F.lit(False).alias("is_delete"),
    )
    updates = upd.unionByName(dels).unionByName(ins)
    return merge_upsert(cust, updates, keys=["c_custkey"], delete_col="is_delete")


@query(
    "q58_multi_resolution_rollup",
    oracle="""
    WITH b AS (
      SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)   AS hour_b,
             CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS day_b,
             event_type, value
      FROM events
    )
    SELECT CASE WHEN hour_b IS NOT NULL THEN 'hour' ELSE 'day' END AS resolution,
           coalesce(hour_b, day_b) AS bucket_epoch,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4)     AS sum_value
    FROM b
    GROUP BY GROUPING SETS ((hour_b, event_type), (day_b, event_type))
    """,
)
def q58_multi_resolution_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hourly AND daily rollups
    of the event stream computed in ONE pass — grouping sets over
    pre-truncated time buckets (Spark's Expand emits each row once per
    resolution map-side, then partial-aggregates, so the fact is
    scanned once, not once per resolution).  At 100 TB this is the
    downsampling job that materializes every dashboard granularity in a
    single shuffle."""
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        (F.floor(F.unix_timestamp("ts") / 3600) * 3600).alias("hour_b"),
        (F.floor(F.unix_timestamp("ts") / 86400) * 86400).alias("day_b"),
        "event_type",
        "value",
    )
    agg = b.groupingSets(
        [["hour_b", "event_type"], ["day_b", "event_type"]],
        "hour_b", "day_b", "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    return agg.select(
        F.when(F.col("hour_b").isNotNull(), F.lit("hour"))
        .otherwise(F.lit("day"))
        .alias("resolution"),
        F.coalesce("hour_b", "day_b").alias("bucket_epoch"),
        "event_type",
        "n_events",
        "sum_value",
    )


@query(
    "q59_nation_pair_volume",
    oracle="""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation nc ON nc.n_nationkey = c_nationkey
    JOIN nation ns ON ns.n_nationkey = s_nationkey
    WHERE ns.n_name <> nc.n_name
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q59_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border shipping volume per (supplier
    nation, customer nation, year).  Six-table join: the true dims
    (customer, supplier, both nation aliases) get broadcast hints; the
    lineitem⋈orders edge is fact-to-fact, so it carries NO hint — the
    planner picks broadcast at test SF and a key shuffle at 100 TB
    (hard-hinting it would OOM a real cluster).  The self-aliased
    nation table witnesses alias handling in join graphs."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    nc = nation.select(F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation"))
    ns = nation.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation"))
    j = (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("ship_year")
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue")
    )


@query(
    "q60_market_share",
    oracle="""
    SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
           round(sum(CASE WHEN ns.n_name = 'NATION_3'
                          THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ns ON ns.n_nationkey = s_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def q60_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's revenue share per year — the
    conditional-aggregate-over-join idiom (numerator and denominator in
    ONE aggregation pass, no second scan and no self-join)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = li.join(F.broadcast(supp.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey")).join(
        F.broadcast(nation.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return j.groupBy(F.year("l_shipdate").cast("int").alias("ship_year")).agg(
        F.round(
            F.sum(F.when(F.col("n_name") == "NATION_3", rev).otherwise(0.0)) / F.sum(rev),
            6,
        ).alias("mkt_share")
    )


@query(
    "q61_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#2'
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
)
def q61_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-one-fifth-of-average-quantity
    orders.  The correlated per-part average is decorrelated into ONE
    groupBy(l_partkey) aggregate joined back to the (brand-filtered)
    fact — the agg input is restricted by a semi join on the filtered
    part keys first, so the per-part averages are only computed for
    parts that can match (at 100 TB that's the difference between
    aggregating 2% and 100% of the fact)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2").select("p_partkey")
    li_b = li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
    avgs = li_b.groupBy(F.col("l_partkey").alias("avg_key")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    return (
        li_b.join(avgs, li_b.l_partkey == F.col("avg_key"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@query(
    "q62_unshipped_orders",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch,
           o_orderpriority
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-01'
      AND l_shipdate  > TIMESTAMP '1997-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q62_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 highest-revenue orders not yet shipped at a
    cutoff date.  Both fact filters reach their parquet scans; customer
    (segment-filtered) broadcasts into orders, whose surviving keys then
    hash-join lineitem.  The final top-10 is a TakeOrderedAndProject —
    per-partition heaps, only 10 rows per task to the driver — not a
    global sort (revenue is rounded before ordering so the Spark and
    oracle heaps agree at rank boundaries; l_orderkey breaks ties)."""
    cutoff = F.lit("1997-06-01").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).join(
        li, F.col("o_orderkey") == li.l_orderkey
    )
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.unix_timestamp("o_orderdate").alias("order_epoch"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q63_late_shipment_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS low_line_count
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
    """,
)
def q63_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode column absent; lateness is derived):
    lines shipped >60 days after order date, split into high/low priority
    counts per return flag.  The lateness predicate references both join
    sides so it cannot be pushed below the join — it evaluates as the
    join's post-condition; the two CASE sums are one aggregation pass."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate", "l_returnflag")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q64_disjunctive_brand_revenue",
    oracle="""
    SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
                 / 10000.0, 4) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 60)
    """,
)
def q64_disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of per-brand conjunctive
    predicates spanning both join sides.  Catalyst's CNF-based
    PushExtraPredicateThroughJoin derives the single-side residues — a
    brand/size disjunction onto the part scan and a quantity disjunction
    onto the lineitem scan — so both scans shrink before the broadcast
    join even though the full predicate must re-evaluate above it."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 40))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 60))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        # single global fold over ~1/3 of lineitem: exact 1e-4-unit
        # integer sum, order-free at any scale (q01's sf1 lesson)
        .agg(
            F.round(
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("bigint")
                    * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
                )
                / 10000.0,
                4,
            ).alias("revenue")
        )
    )


@query(
    "q65_lone_late_supplier",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders   ON o_orderkey = l1.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q65_lone_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (lateness derived from ship-vs-order date):
    suppliers who alone shipped late on a finished multi-supplier order.
    The textbook form is two correlated EXISTS self-joins on the fact;
    here both collapse into ONE per-order aggregate that also carries
    the answer: distinct-supplier count, distinct-LATE-supplier count,
    the late supplier's identity (max over a one-element set), and that
    supplier's late-line count.  Orders with >1 supplier and exactly
    one late supplier contribute their late-line count to that
    supplier.  ONE fact scan, ONE order-key aggregation, no
    re-join of the fact and no O(lines²) correlated probe — the
    textbook form needs three fact scans."""
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    annotated = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("is_late"),
    )
    per_order = annotated.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late_supp"),
        F.max(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("late_supp"),
        F.sum(F.when(F.col("is_late"), 1).otherwise(0)).alias("n_late_lines"),
    )
    lone = per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        lone.groupBy("late_supp")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .join(F.broadcast(supp), F.col("late_supp") == F.col("s_suppkey"))
        .select("s_name", F.col("numwait").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "q66_returned_item_customers",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           round(c_acctbal, 4) AS c_acctbal,
           n_name
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q66_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in a
    quarter.  Wide grouping key (4 customer/nation columns) — the
    grouping happens on c_custkey alone as far as cardinality is
    concerned, the other columns are functionally dependent and ride
    along; nation broadcasts under customer, customer under the
    date-pruned orders→lineitem join.  Top-20 via TakeOrderedAndProject
    on rounded revenue with custkey tiebreak."""
    cutlo, cuthi = F.lit("1997-01-01").cast("timestamp"), F.lit("1997-04-01").cast("timestamp")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= cutlo) & (F.col("o_orderdate") < cuthi)
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", F.round("c_acctbal", 4).alias("c_acctbal"), "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "d08_decontaminate",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
      FROM documents
    ), pos AS (
      SELECT doc_id, t, unnest(range(1, greatest(len(t) - 7, 0) + 1)) AS i
      FROM toks
    ), sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS gram
      FROM pos
    ), bench AS (
      SELECT DISTINCT gram FROM sh WHERE doc_id % 50 = 0
    ), train AS (
      SELECT doc_id, gram FROM sh WHERE doc_id % 50 <> 0
    ), sized AS (
      SELECT doc_id, count(*) AS total_grams FROM train GROUP BY 1
    )
    SELECT t.doc_id AS id, any_value(s.total_grams) AS total_grams,
           CAST(count(*) AS BIGINT) AS hit_grams,
           round(count(*) / CAST(any_value(s.total_grams) AS DOUBLE), 6) AS hit_ratio
    FROM train t
    JOIN bench USING (gram)
    JOIN sized s ON s.doc_id = t.doc_id
    GROUP BY t.doc_id
    """,
)
def d08_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination (the pre-training hygiene pass): docs
    sharing any 8-word-gram with a held-out benchmark slice (doc_id %
    50 == 0 plays the eval set).  The benchmark's distinct gram hashes
    broadcast — the 100 TB training scan is shuffle-free up to the
    per-doc hit count over contaminated rows only (operators/dedup.py
    `decontaminate`)."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return dedup.decontaminate(train, bench, n=8)


@query(
    "t11_source_overlap",
    oracle="""
    WITH vocab AS (
      SELECT DISTINCT source,
             unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS term
      FROM documents
    ), sized AS (
      SELECT source, count(*) AS vocab_size FROM vocab GROUP BY 1
    ), inter AS (
      SELECT a.source AS source_a, b.source AS source_b, count(*) AS shared
      FROM vocab a JOIN vocab b ON a.term = b.term AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b,
           round(shared / CAST(sa.vocab_size + sb.vocab_size - shared AS DOUBLE), 6)
             AS vocab_jaccard
    FROM inter
    JOIN sized sa ON sa.source = source_a
    JOIN sized sb ON sb.source = source_b
    """,
)
def t11_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary overlap matrix (data-mixing diagnostic):
    Jaccard of distinct-term vocabularies for every source pair.  The
    per-source vocabulary collapses FIRST (distinct (source, term) — a
    partial-aggregatable dedup at fact scale), so the self-join runs on
    |vocab| rows per source, not |tokens|; 20 sources → 190 pairs out.
    The pairs frame is sources² rows, so it is materialized eagerly
    (localCheckpoint) and the shared vocabulary frame unpersisted in
    the same call — no cached blocks outlive it (d13 discipline)."""
    docs = _t(spark, sf_dir, "documents")
    vocab = (
        docs.select("source", text.tokens("text").alias("__toks"))
        .select("source", F.explode("__toks").alias("term"))
        .distinct()
        .persist()
    )
    try:
        sized = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("vocab_size"))
        a = vocab.select(F.col("source").alias("source_a"), "term")
        b = vocab.select(F.col("source").alias("source_b"), "term")
        inter = (
            a.join(b, "term")
            .filter(F.col("source_a") < F.col("source_b"))
            .groupBy("source_a", "source_b")
            .agg(F.count(F.lit(1)).alias("shared"))
        )
        sa = sized.select(F.col("source").alias("source_a"), F.col("vocab_size").alias("size_a"))
        sb = sized.select(F.col("source").alias("source_b"), F.col("vocab_size").alias("size_b"))
        return (
            inter.join(F.broadcast(sa), "source_a")
            .join(F.broadcast(sb), "source_b")
            .select(
                "source_a",
                "source_b",
                F.round(
                    F.col("shared")
                    / (F.col("size_a") + F.col("size_b") - F.col("shared")).cast("double"),
                    6,
                ).alias("vocab_jaccard"),
            )
            .localCheckpoint()
        )
    finally:
        vocab.unpersist(blocking=False)


@query(
    "q67_mixture_resample",
    oracle="""
    WITH w AS (
      SELECT source, count(*) AS cnt,
             CASE WHEN source IN ('src0','src1','src2','src3','src4')
                  THEN 2.0 ELSE 1.0 END AS wt
      FROM documents GROUP BY 1
    ), tot AS (
      SELECT sum(cnt) AS total, sum(wt) AS sum_w FROM w
    ), thr AS (
      SELECT source, cnt,
             printf('%08x',
                    CAST(least(floor(least(1.0,
                           (0.5 * total * wt / sum_w) / cnt) * 4294967296.0),
                         4294967295.0) AS BIGINT)) AS thr
      FROM w, tot
    )
    SELECT d.source,
           CAST(any_value(t.cnt) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT)         AS n_kept
    FROM documents d
    JOIN thr t USING (source)
    WHERE substr(md5(d.text), 1, 8) < t.thr
    GROUP BY d.source
    """,
)
def q67_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing resample: keep ~50% of the corpus with sources
    src0-src4 weighted 2x the rest (operators/sampling.mixture_resample).
    Per-source rates are computed FROM the data (counts agg, key-only
    shuffle), turned into 32-bit hex thresholds, and broadcast back onto
    the scan — the sampling itself is a pure per-row md5 predicate, so
    the 100 TB corpus is never shuffled and the draw is reproducible
    across engines (the oracle recomputes the identical thresholds in
    SQL)."""
    docs = _t(spark, sf_dir, "documents")
    kept = _sampling.mixture_resample(
        docs,
        weights={f"src{i}": 2.0 for i in range(5)},
        target_fraction=0.5,
    )
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .join(F.broadcast(counts), "source")
        .select("source", "n_docs", "n_kept")
    )


@query(
    "d09_incremental_dedup",
    oracle="""
    WITH batch AS (
      SELECT doc_id + 1000000 AS doc_id, source,
             CASE WHEN doc_id % 3 = 1 THEN text || ' updated' ELSE text END AS text
      FROM documents WHERE doc_id % 3 IN (0, 1)
    ), hist AS (
      SELECT DISTINCT md5(text) AS h FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS batch_n,
           CAST(sum(CASE WHEN h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           CAST(sum(CASE WHEN h IS NULL THEN 1 ELSE 0 END) AS BIGINT)     AS n_new
    FROM batch LEFT JOIN hist ON md5(batch.text) = hist.h
    GROUP BY source
    """,
)
def d09_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup (the nightly pipeline op): a derived
    re-ingest batch — re-crawls (doc_id%3==0, unchanged text) and edits
    (doc_id%3==1, new content) — is deduped against the HISTORICAL
    CONTENT-HASH INDEX, never the raw corpus.  At 100 TB the index is
    the narrow (hash, keep_id) table maintained by d01; the increment
    (MBs-GBs) joins against it hash-to-hash, so nightly dedup cost is
    O(|increment| + index probe), not a corpus rescan.  Per-source
    accounting of dropped-as-duplicate vs genuinely-new."""
    docs = _t(spark, sf_dir, "documents")
    batch = docs.filter((F.col("doc_id") % 3).isin(0, 1)).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        "source",
        F.when(F.col("doc_id") % 3 == 1, F.concat(F.col("text"), F.lit(" updated")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    hist_idx = docs.select(F.md5("text").alias("h")).distinct()
    flagged = batch.join(
        hist_idx, F.md5(batch.text) == hist_idx.h, "left"
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("batch_n"),
        F.sum(F.when(F.col("h").isNotNull(), 1).otherwise(0)).alias("n_dup"),
        F.sum(F.when(F.col("h").isNull(), 1).otherwise(0)).alias("n_new"),
    )


@query(
    "t12_filter_funnel",
    oracle="""
    WITH scored AS (
      SELECT lang,
             n_chars < 200 AS r_short,
             len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) < 40
               AS r_few,
             len(list_distinct(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')))
               < 0.5 * len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))
               AS r_lowdiv
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN r_short THEN 1 ELSE 0 END) AS BIGINT) AS drop_short,
           CAST(sum(CASE WHEN NOT r_short AND r_few THEN 1 ELSE 0 END) AS BIGINT) AS drop_few_tokens,
           CAST(sum(CASE WHEN NOT r_short AND NOT r_few AND r_lowdiv THEN 1 ELSE 0 END) AS BIGINT)
             AS drop_low_diversity,
           CAST(sum(CASE WHEN NOT r_short AND NOT r_few AND NOT r_lowdiv THEN 1 ELSE 0 END) AS BIGINT)
             AS survivors
    FROM scored
    GROUP BY lang
    """,
)
def t12_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter funnel with first-failing-rule attribution — the
    per-rule rejection report every corpus-cleaning pipeline emits.  All
    rules evaluate in ONE codegen'd pass (tokens staged once as a
    projection, shared by two rules); the funnel semantics (a doc counts
    against only the FIRST rule it fails, in pipeline order) is plain
    conditional aggregation — no per-rule scans, no per-rule shuffles,
    one key-only exchange for the lang rollup."""
    docs = _t(spark, sf_dir, "documents")
    staged = docs.select(
        "lang",
        "n_chars",
        text.tokens("text").alias("__toks"),
    ).select(
        "lang",
        (F.col("n_chars") < 200).alias("r_short"),
        (F.size("__toks") < 40).alias("r_few"),
        (F.size(F.array_distinct("__toks")) < 0.5 * F.size("__toks")).alias("r_lowdiv"),
    )
    return staged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("r_short"), 1).otherwise(0)).alias("drop_short"),
        F.sum(F.when(~F.col("r_short") & F.col("r_few"), 1).otherwise(0)).alias("drop_few_tokens"),
        F.sum(
            F.when(~F.col("r_short") & ~F.col("r_few") & F.col("r_lowdiv"), 1).otherwise(0)
        ).alias("drop_low_diversity"),
        F.sum(
            F.when(~F.col("r_short") & ~F.col("r_few") & ~F.col("r_lowdiv"), 1).otherwise(0)
        ).alias("survivors"),
    )


@query(
    "q68_grouped_agg_udf",
    oracle="""
    SELECT o_orderpriority,
           round(exp(avg(ln(o_totalprice))), 4) AS geo_mean_price,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q68_grouped_agg_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF via a GROUPED_AGG pandas UDF: per-priority geometric
    mean of order value.  Unlike built-in aggregates a grouped-agg UDF
    gets the whole group's values as one Arrow series — no partial
    aggregation, the shuffle carries raw rows.  That is the documented
    trade-off (SCALE.md "grouped-map materializes whole groups"); the
    declarative identity exp(avg(ln(x))) is what you ship at 100 TB,
    and the oracle checks the UDF against exactly that identity."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v.to_numpy()).mean()))

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return int(len(v))

    orders = _t(spark, sf_dir, "orders")
    # a grouped-agg pandas UDF cannot mix with JVM aggregates in one
    # agg() (INVALID_PANDAS_UDF_PLACEMENT) — so the count is a UDF too
    return orders.groupBy("o_orderpriority").agg(
        F.round(geo_mean("o_totalprice"), 4).alias("geo_mean_price"),
        n_rows("o_totalprice").alias("n_orders"),
    )


@query(
    "q69_event_funnel",
    oracle="""
    WITH tv AS (
      SELECT user_id, min(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY 1
    ), tc AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN tv USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > tv.t_view
        AND e.ts <= tv.t_view + INTERVAL 4 HOUR
      GROUP BY 1
    ), tp AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN tc USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > tc.t_click
        AND e.ts <= tc.t_click + INTERVAL 4 HOUR
      GROUP BY 1
    )
    SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events) AS users_total,
           (SELECT CAST(count(*) AS BIGINT) FROM tv) AS reached_view,
           (SELECT CAST(count(*) AS BIGINT) FROM tc) AS reached_click,
           (SELECT CAST(count(*) AS BIGINT) FROM tp) AS reached_purchase
    """,
)
def q69_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel (view → click-after-view →
    purchase-after-click, each step converting within 4 hours), the
    product-analytics / MATCH_RECOGNIZE-lite idiom.  The oracle's three dependent aggregation-joins collapse into
    THREE window stages over ONE user_id partitioning — a single
    shuffle: each stage's conditional min can reference the previous
    stage's column because they share the exchange (the q36 pattern),
    and the trailing per-user rollup reuses the same partitioning.
    Emits stage counts only (no raw event timestamps cross the
    engine boundary)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")
    s = (
        ev.withColumn(
            "t_view", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t_view"))
                    & (F.col("ts") <= F.col("t_view") + F.expr("INTERVAL 4 HOURS")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click"))
                    & (F.col("ts") <= F.col("t_click") + F.expr("INTERVAL 4 HOURS")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = s.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("users_total"),
        F.count("t_view").alias("reached_view"),
        F.count("t_click").alias("reached_click"),
        F.count("t_purchase").alias("reached_purchase"),
    )


# =========================================================================
# Round 3: range/band joins, windowed dedup, mergeable sketches,
# chunk-level dedup, boilerplate mining, iterative k-means
# =========================================================================

@query(
    "q70_range_band_join",
    oracle="""
    WITH bands AS (
      SELECT CAST(i AS BIGINT) AS band_id, i * 25000.0 AS lo, (i + 1) * 25000.0 AS hi
      FROM range(0, 20) t(i)
    )
    SELECT band_id, lo,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0, 4)
             AS sum_price
    FROM orders o JOIN bands b
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY band_id, lo
    """,
)
def q70_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval (band) join via operators/joins.range_join: the
    interval side explodes to the buckets it overlaps, the join is a
    HASH join on bucket id + residual BETWEEN filter — never the
    quadratic broadcast-nested-loop a raw theta join plans to.  At
    100 TB the band dim is broadcast-sized, so the fact side is
    scan-shaped with zero extra shuffle before the final rollup."""
    from mapreducehs_spark.operators.joins import range_join

    orders = _t(spark, sf_dir, "orders")
    bands = (
        spark.range(0, 20)
        .select(
            F.col("id").alias("band_id"),
            (F.col("id") * 25000.0).alias("lo"),
            ((F.col("id") + 1) * 25000.0).alias("hi"),
        )
    )
    joined = range_join(
        orders.select("o_totalprice"),
        bands,
        left_point="o_totalprice",
        right_lo="lo",
        right_hi="hi",
        bucket_width=25000.0,
    ).filter(F.col("o_totalprice") < F.col("hi"))  # half-open [lo, hi)
    return joined.groupBy("band_id", "lo").agg(
        F.count(F.lit(1)).alias("n_orders"),
        # exact integer-cents sum (order-free at any scale — q01 lesson)
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")) / 100.0, 4
        ).alias("sum_price"),
    )


@query(
    "q71_mg_heavy_hitters",
    oracle="""
    WITH toks AS (
      SELECT lang,
             unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS term
      FROM documents
    ), cnt AS (
      SELECT lang, term, CAST(count(*) AS BIGINT) AS est
      FROM toks GROUP BY 1, 2
    ), rk AS (
      SELECT *, row_number() OVER (PARTITION BY lang ORDER BY est DESC, term ASC) AS rank
      FROM cnt
    )
    SELECT lang, term, est, CAST(rank AS BIGINT) AS rank
    FROM rk WHERE rank <= 5
    """,
)
def q71_mg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters per language via partition-local Misra-Gries
    sketches merged per group (operators/sketches.py) — the
    bounded-shuffle alternative to explode→groupBy→count: shuffle rows
    are O(partitions × capacity), not O(corpus tokens).  With capacity
    ≥ the corpus vocabulary the sketch is provably exact, which is what
    the oracle checks — capacity is SIZED FROM the measured vocabulary
    (one narrow distinct-count pass, a scalar to the driver) so the
    exact-regime contract holds at every scale factor instead of
    silently breaking when the vocabulary outgrows a constant (it did
    at the 10x sf1 sweep: token-salted replicas multiply vocab by 10).
    NOTE: the sizing count runs at BUILD time — merely constructing
    this frame scans the corpus once (tools/plan_audit.py lists q71 in
    its build-time-execution caveat), and capacity=vocab deliberately
    degenerates MG to exact counting with vocabulary-sized per-
    partition state: that IS the oracle-checkable regime.  Production
    fixed-capacity operation lives in the N/(c+1) error bound, pinned
    for adversarial vocabularies in unit tests."""
    from mapreducehs_spark.operators.sketches import mg_topk_per_group

    docs = _t(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    terms = (
        docs.select("lang", text.tokens("text").alias("__toks"))
        .repartition(par)
        .select("lang", F.explode_outer("__toks").alias("term"))
        .filter(F.col("term").isNotNull())
    )
    vocab = terms.select("term").distinct().count()  # scalar to the driver
    return mg_topk_per_group(
        terms, group_col="lang", term_col="term", capacity=max(64, vocab), k=5
    )


@query(
    "q72_window_dedup",
    oracle="""
    WITH keyed AS (
      SELECT event_type, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 600 AS win,
             row_number() OVER (
               PARTITION BY user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) // 600
               ORDER BY ts ASC, event_id ASC
             ) AS rn
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_raw,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM keyed
    GROUP BY event_type
    """,
)
def q72_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed deduplication — keep the first event per (user, type)
    within each 10-minute tumbling window; the batch twin of Structured
    Streaming's dropDuplicatesWithinWatermark (st04 is the stream side).
    ONE shuffle on the dedup key (user, type, window) shared by the
    row_number and nothing else; the per-type rollup is a second
    key-only exchange of survivors.  At 100 TB the window term bounds
    dedup state: identical keys more than a window apart never meet."""
    ev = _t(spark, sf_dir, "events")
    win = (F.col("ts").cast("long") / F.lit(600)).cast("long") - (
        ((F.col("ts").cast("long") % 600) < 0).cast("long")
    )  # floor-div toward -inf matches DuckDB's // on the positive epochs here
    w = Window.partitionBy("user_id", "event_type", "win").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    keyed = ev.select("event_type", "user_id", "ts", "event_id", win.alias("win")).withColumn(
        "rn", F.row_number().over(w)
    )
    return keyed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
    )


@query(
    "d10_chunk_dedup",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
      FROM documents
    ), idx AS (
      SELECT doc_id, source, t,
             unnest(range(0, greatest(CAST(ceil(len(t) / 16.0) AS BIGINT), 1))) AS i
      FROM toks
    ), ch AS (
      SELECT doc_id, source, md5(array_to_string(t[i*16+1 : i*16+16], ' ')) AS h
      FROM idx
      WHERE array_to_string(t[i*16+1 : i*16+16], ' ') != ''
    ), dpc AS (
      SELECT h, count(DISTINCT doc_id) AS n_docs_with FROM ch GROUP BY 1
    ), per_doc AS (
      SELECT ch.doc_id, ch.source,
             count(*) AS n_chunks,
             sum(CASE WHEN dpc.n_docs_with > 1 THEN 1 ELSE 0 END) AS n_dup
      FROM ch JOIN dpc USING (h)
      GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chunks) AS BIGINT) AS chunk_instances,
           CAST(sum(n_dup) AS BIGINT) AS dup_instances,
           round(avg(n_dup / CAST(n_chunks AS DOUBLE)), 6) AS avg_dup_frac
    FROM per_doc
    GROUP BY source
    """,
)
def d10_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document chunk-level duplication profile per source
    (operators/dedup.chunk_dup_stats): 16-token chunks, md5 chunk keys,
    corpus-wide chunk frequency by hash aggregation — the boilerplate
    profile computed before paragraph-level dedup, with zero pairwise
    work (same scalability class as d01 exact dedup)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.chunk_dup_stats(docs, chunk_tokens=16)


@query(
    "t13_boilerplate_ngrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
      FROM documents
    ), pos AS (
      SELECT doc_id, t, unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS i
      FROM toks
    ), g AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS gram
      FROM pos
    ), dfq AS (
      SELECT gram, CAST(count(*) AS BIGINT) AS doc_freq FROM g GROUP BY 1
    )
    SELECT gram, doc_freq,
           round(doc_freq / (SELECT CAST(count(*) AS DOUBLE) FROM documents), 6) AS doc_frac
    FROM dfq
    WHERE doc_freq >= 0.01 * (SELECT count(*) FROM documents)
    ORDER BY doc_freq DESC, gram ASC
    LIMIT 20
    """,
)
def t13_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate mining: 3-grams ranked by document frequency
    (operators/text.boilerplate_ngrams) — the template/header removal
    list.  One explode of per-doc DISTINCT grams + one hash agg + a
    total-ordered global top-k."""
    docs = _t(spark, sf_dir, "documents")
    return text.boilerplate_ngrams(docs, n=3, min_doc_frac=0.01, top_k=20)


@query(
    "s05_kmeans_profile",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), c0 AS (
      SELECT vec_id AS cid, v AS c FROM e ORDER BY vec_id LIMIT 8
    ), d1 AS (
      SELECT e.vec_id, e.v, c0.cid, power(list_distance(e.v, c0.c), 2) AS dd
      FROM e CROSS JOIN c0
    ), a1 AS (
      SELECT vec_id, v, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dd ASC, cid ASC) AS rn
        FROM d1
      ) WHERE rn = 1
    ), m1 AS (
      SELECT cid, pos, avg(x) AS mx FROM (
        SELECT cid, unnest(v) AS x, unnest(range(1, len(v) + 1)) AS pos FROM a1
      ) GROUP BY 1, 2
    ), c1 AS (
      SELECT cid, list(mx ORDER BY pos) AS c FROM m1 GROUP BY cid
    ), d2 AS (
      SELECT e.vec_id, c1.cid, power(list_distance(e.v, c1.c), 2) AS dd
      FROM e CROSS JOIN c1
    ), a2 AS (
      SELECT vec_id, cid, dd FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dd ASC, cid ASC) AS rn
        FROM d2
      ) WHERE rn = 1
    )
    SELECT cid AS cluster,
           CAST(count(*) AS BIGINT) AS n_members,
           round(avg(dd), 4) AS avg_sqdist
    FROM a2 GROUP BY cid
    """,
)
def s05_kmeans_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 2-iteration Lloyd k-means (k=8, seeded by the 8
    lowest vec_ids) over the embedding corpus
    (operators/similarity.kmeans_profile) — the iterative-algorithm
    witness.  Per iteration: Arrow/numpy matmul assignment (no shuffle)
    + ONE partial-aggregatable (cluster, dim) shuffle for the centroid
    update; only k×dim floats reach the driver.  The no-RNG trajectory
    lets even DuckDB replay both iterations as CTEs."""
    from mapreducehs_spark.operators.similarity import kmeans_profile

    emb = _t(spark, sf_dir, "embeddings")
    out = kmeans_profile(emb, k=8, iters=2)
    return out.withColumn("avg_sqdist", F.round(F.col("avg_sqdist"), 4))


@query(
    "st08_stream_late_data",
    oracle="""
    WITH b AS (
      SELECT max(ts) AS tmax,
             (SELECT max(ts) FROM events WHERE ts < (SELECT max(ts) FROM events)) AS m0
      FROM events
    ),
    keep AS (
      SELECT e.* FROM events e, b
      WHERE NOT (e.ts >= b.tmax - INTERVAL 5400 SECOND
                 AND e.ts < b.tmax - INTERVAL 1800 SECOND)
         OR (floor(epoch(e.ts) / 3600) * 3600 + 3600
             > epoch(b.m0) - 2233)
    )
    SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM keep
    GROUP BY 1, 2
    """,
)
def st08_stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark LATE-DATA semantics, exercised for real: the replay
    holds back the [t_max-90min, t_max-30min) slice of events and plays
    it AFTER everything else (streaming/ops.prepare_late_stream_dir).
    By then the LATE-EVENT-FILTER watermark (the previous batch's —
    Spark's two-watermark model, SPARK-24634) sits at m0 - 2233s where
    m0 = max(ts < t_max), so Spark must drop exactly the late rows
    whose hour window closed against it (window.end <= m0 - 2233) and
    merge the rest into still-open windows.  The oracle recomputes that
    drop set arithmetically — deterministic because both watermarks
    depend only on event time.
    The 2233s delay is deliberately not minute-aligned so window ends
    can never tie the watermark exactly.  At 100 TB this bounded-state
    discipline (watermark evicts closed windows) is what keeps an
    always-on aggregation's state finite."""
    from mapreducehs_spark import streaming as st

    replay = st.prepare_late_stream_dir(spark, sf_dir)
    events = st.events_stream(spark, replay)
    agg = st.tumbling_aggregate(events, window="1 hour", watermark="2233 seconds")
    out = st.run_to_batch(agg, "st08_sink", output_mode="append")
    return out.filter(F.col("event_type") != "__flush__")


@query(
    "q73_time_range_frames",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           round(sum(CAST(round(value * 100) AS BIGINT)) OVER w / 100.0, 4) AS sum_1h
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts
      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
    )
    """,
)
def q73_time_range_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frames: per event, the rolling 1-hour count and
    value-sum for the same user — the time-decayed rolling metric
    (rate limiting, anomaly scoring) that ROWS frames cannot express
    when arrival cadence varies.  ONE shuffle on user_id; the frame is
    bounded sliding state per key (evict-left as the lower bound
    advances), identical at any scale.  RANGE frames treat equal
    timestamps as peers (all enter the frame together), which is why
    the oracle needs no tiebreak column."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    # frame sums run over integer CENTS: Spark rebuilds sliding frames
    # sequentially while DuckDB uses pairwise segment trees, and at
    # sf0.1 the differing float addition order crossed a rounding
    # boundary — integer sums are order-exact
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum(cents).over(w) / 100.0, 4).alias("sum_1h"),
    )


@query(
    "q74_promo_revenue_share",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q74_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share in a one-month window.  The
    numerator/denominator ratio computes as TWO conditional sums in ONE
    scan+join pass (never two scans); the date filter pushes to the
    fact scan and the part dim broadcasts, so the only exchange is the
    single-row final aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .join(F.broadcast(part.select("p_partkey", "p_type")), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q75_profit_by_nation_year",
    oracle="""
    SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS profit,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand LIKE 'Brand#1%'
    GROUP BY n_name, year(l_shipdate)
    """,
)
def q75_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per-(nation, year) profit for a brand family.
    All three dimensions broadcast; the brand LIKE filter semi-join-
    prunes the fact side through the broadcast join; ONE exchange for
    the rollup.  year() stays an expression on the pushed-down scan —
    no pre-materialized date dim needed."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(sup.select("s_suppkey", "s_nationkey")), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat.select("n_nationkey", "n_name")), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(part.select("p_partkey").filter(F.col("p_brand").like("Brand#1%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("n_name", F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def _minhash_checked_ctes() -> tuple[str, str, int]:
    """Shared CTE prefix (shingles → md5-fold ids → literal-seed
    signatures → banding → candidate pairs) rendered from the SAME seed
    constants the Spark operator uses
    (operators/dedup.minhash_check_seeds) — parity by construction.
    Returns (cte_body, agree_expr, num_perm); d11 and d15 append
    different tails."""
    from mapreducehs_spark.operators.dedup import (
        MINHASH_CHECK_BANDS,
        MINHASH_CHECK_NUM_PERM,
        minhash_check_seeds,
    )

    a, b = minhash_check_seeds()
    np_, nb = MINHASH_CHECK_NUM_PERM, MINHASH_CHECK_BANDS
    rows = np_ // nb
    mins = ",\n             ".join(
        f"min(({a[i]}*x + {b[i]}) % 2147483647) AS m{i}" for i in range(np_)
    )
    bkeys = ", ".join(
        "concat_ws('_', "
        + ", ".join(f"m{bi * rows + r}" for r in range(rows))
        + f") AS bk{bi}"
        for bi in range(nb)
    )
    unions = " UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band, bk{bi} AS bk FROM bandcols" for bi in range(nb)
    )
    agree = " + ".join(f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END" for i in range(np_))
    ctes = f"""toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
      FROM documents
    ), pos AS (
      SELECT doc_id, t, unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS i FROM toks
    ), sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s FROM pos
    ), ids AS (
      SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS x FROM sh
    ), sigs AS (
      SELECT doc_id, {mins}
      FROM ids GROUP BY doc_id
    ), bandcols AS (
      SELECT doc_id, {bkeys} FROM sigs
    ), banded AS ({unions}),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
    )"""
    return ctes, agree, np_


def _d11_oracle(threshold: float = 0.25) -> str:
    """Checked-MinHash pair oracle; ``threshold`` must be a dyadic
    rational (k/32 boundary-exact in double) so both engines compare
    identically — 0.25 for d11, 0.375 for d03."""
    ctes, agree, np_ = _minhash_checked_ctes()
    return f"""
    WITH {ctes}
    SELECT c.id_a, c.id_b, round(({agree}) / {float(np_)}, 6) AS est_jaccard
    FROM cand c JOIN sigs sa ON sa.doc_id = c.id_a JOIN sigs sb ON sb.doc_id = c.id_b
    WHERE ({agree}) / {float(np_)} >= {threshold}
    """


@query("d11_minhash_checked", oracle=_d11_oracle())
def d11_minhash_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH with every stage value-checked: md5-fold shingle ids,
    literal-seed universal-hash permutations, concatenated band keys —
    the DuckDB oracle replays signatures, banding, candidate generation
    and the agreement estimate bit-for-bit
    (operators/dedup.minhash_lsh_pairs_checked).  d03 remains the
    vectorized throughput path; this pins the LSH algorithm itself."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs_checked(docs, est_threshold=0.25)


def _d12_oracle(max_hamming: int = 2) -> str:
    """Render the d12 oracle from the same bit/band constants as
    operators/dedup.simhash_checked — hamming 2 for d12, 3 for d04."""
    from mapreducehs_spark.operators.dedup import SIMHASH_CHECK_BANDS, SIMHASH_CHECK_BITS

    bits, bands = SIMHASH_CHECK_BITS, SIMHASH_CHECK_BANDS
    bw = bits // bands
    bitsums = ",\n             ".join(
        f"sum(2*((x >> {k}) & 1) - 1) AS s{k}" for k in range(bits)
    )
    sigexpr = " + ".join(
        f"(CASE WHEN s{k} > 0 THEN 1::BIGINT ELSE 0 END << {k})" for k in range(bits)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(text, '\\s+'), t -> t != '')) AS tok
      FROM documents
    ), ids AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS x FROM toks
    ), bitsums AS (
      SELECT doc_id, {bitsums}
      FROM ids GROUP BY doc_id
    ), sigs AS (
      SELECT doc_id, {sigexpr} AS sig FROM bitsums
    ), banded AS (
      SELECT doc_id, b AS band, (sig >> ({bw}*b)) & {(1 << bw) - 1} AS bk
      FROM sigs, unnest(range(0, {bands})) AS u(b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b, CAST(bit_count(xor(sa.sig, sb.sig)) AS BIGINT) AS hamming
    FROM cand c JOIN sigs sa ON sa.doc_id = c.id_a JOIN sigs sb ON sb.doc_id = c.id_b
    WHERE bit_count(xor(sa.sig, sb.sig)) <= {max_hamming}
    """


@query("d12_simhash_checked", oracle=_d12_oracle())
def d12_simhash_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with the whole pipeline value-checked
    (operators/dedup.simhash_checked): md5-fold token hashes,
    frequency-weighted per-bit majority votes, 4x8-bit banding, xor
    popcount verification — DuckDB replays all of it.  d04 remains the
    vectorized 63-bit throughput path."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_checked(docs, max_hamming=2)


def _ivf_checked_oracle(n_probe: int = 4) -> str:
    """Data-seeded IVF oracle (s06's construction): the 16 lowest
    vec_ids are the codebook; ``n_probe`` is 4 for s06, 2 for s02."""
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), c AS (
      SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16
    ), corpus AS (
      SELECT * FROM e WHERE vec_id >= 8
    ), q AS (
      SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8
    ), assign AS (
      SELECT vec_id, v, cid FROM (
        SELECT corpus.vec_id, corpus.v, c.cid,
               row_number() OVER (
                 PARTITION BY corpus.vec_id
                 ORDER BY list_cosine_similarity(corpus.v, c.cv) DESC, c.cid ASC
               ) AS rn
        FROM corpus CROSS JOIN c
      ) WHERE rn = 1
    ), probes AS (
      SELECT query_id, qv, cid FROM (
        SELECT q.query_id, q.qv, c.cid,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid ASC
               ) AS rn
        FROM q CROSS JOIN c
      ) WHERE rn <= {n_probe}
    ), scored AS (
      SELECT p.query_id, a.vec_id AS match_id,
             round(list_cosine_similarity(p.qv, a.v), 6) AS cosine
      FROM probes p JOIN assign a ON a.cid = p.cid
      WHERE p.query_id != a.vec_id
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, match_id ASC
      ) AS rank FROM scored
    )
    SELECT query_id, match_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    """


@query("s06_ann_ivf_checked", oracle=_ivf_checked_oracle(4))
def s06_ann_ivf_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k with a DATA-SEEDED codebook (the 16 lowest-vec_id
    vectors as cell centroids) so the whole pipeline — cell assignment
    (argmax cosine, ties to the lowest cell), 4-cell probing, candidate
    scoring, rank — replays in the DuckDB oracle.  Same plan as s02
    (Arrow argmax kernel for assignment, broadcast probe join on the
    cell id, rank only candidates); since round 6 s02 runs the same
    seeded codebook at n_probe=2, this row keeps the canonical
    n_probe=4 pin of the IVF algorithm itself."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb.filter(F.col("vec_id") >= 8),
        emb.filter(F.col("vec_id") < 8),
        k=5,
        n_cells=16,
        n_probe=4,
        centroids=_seeded_centroids(emb),
    )


def _srp_checked_oracle() -> str:
    """Data-seeded SRP-LSH oracle (s07's construction; shared verbatim
    by s04's default path since round 6): 16 sign bits from the 16
    lowest-vec_id hyperplanes, 4×4-bit banding, exact-cosine rank."""
    return """
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), h AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS hid, v AS hv
      FROM e ORDER BY vec_id LIMIT 16
    ), corpus AS (
      SELECT vec_id, v FROM e WHERE vec_id >= 8
    ), q AS (
      SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8
    ), csig AS (
      SELECT c.vec_id,
             CAST(sum(CASE WHEN list_dot_product(c.v, h.hv) > 0
                           THEN 1::BIGINT << h.hid ELSE 0 END) AS BIGINT) AS sig
      FROM corpus c CROSS JOIN h GROUP BY c.vec_id
    ), qsig AS (
      SELECT q.query_id,
             CAST(sum(CASE WHEN list_dot_product(q.qv, h.hv) > 0
                           THEN 1::BIGINT << h.hid ELSE 0 END) AS BIGINT) AS sig
      FROM q CROSS JOIN h GROUP BY q.query_id
    ), cband AS (
      SELECT vec_id, b AS band, (sig >> (4*b)) & 15 AS bk
      FROM csig, unnest(range(0, 4)) AS u(b)
    ), qband AS (
      SELECT query_id, b AS band, (sig >> (4*b)) & 15 AS bk
      FROM qsig, unnest(range(0, 4)) AS u(b)
    ), cand AS (
      SELECT DISTINCT qb.query_id, cb.vec_id AS match_id
      FROM qband qb JOIN cband cb ON cb.band = qb.band AND cb.bk = qb.bk
      WHERE qb.query_id != cb.vec_id
    ), scored AS (
      SELECT cand.query_id, cand.match_id,
             round(list_cosine_similarity(q.qv, c.v), 6) AS cosine
      FROM cand JOIN q ON q.query_id = cand.query_id
                JOIN corpus c ON c.vec_id = cand.match_id
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, match_id ASC
      ) AS rank FROM scored
    )
    SELECT query_id, match_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    """


@query("s07_ann_srp_checked", oracle=_srp_checked_oracle())
def s07_ann_srp_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH ANN top-k with DATA-SEEDED hyperplanes (the 16 lowest-
    vec_id vectors), so the whole pipeline — 16 sign bits from literal
    dot products, 4x4-bit banding, band-bucket candidate join, exact
    cosine rank — replays in the DuckDB oracle.  Same plan as s04
    (Arrow band-key kernel, broadcast probe join on the band key, score
    before pair-dedup); s04 keeps the Gaussian-hyperplane recall path,
    this pins the SRP banding algorithm itself — the last rows-only ANN
    path without a value-checked twin.  Sign ties (dot exactly 0) are
    impossible at double precision on this data; both engines use
    strict > 0."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.srp_topk(
        emb.filter(F.col("vec_id") >= 8),
        emb.filter(F.col("vec_id") < 8),
        k=5,
        n_planes=16,
        bands=4,
        planes=_seeded_planes(emb),
    )


def _d15_oracle(est_threshold: float = 0.25, jaccard_threshold: float = 0.5) -> str:
    """d15/d07: the full composed drop list — checked-minhash candidates
    (shared CTEs) → exact string-shingle Jaccard ≥ ``jaccard_threshold``
    → recursive-CTE connected components → drop everything but the
    min-id representative.  d15 renders (0.25, 0.5); d07 the stricter
    (0.25, 0.6)."""
    ctes, agree, np_ = _minhash_checked_ctes()
    return f"""
    WITH RECURSIVE {ctes},
    est AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN sigs sa ON sa.doc_id = c.id_a JOIN sigs sb ON sb.doc_id = c.id_b
      WHERE ({agree}) / {float(np_)} >= {est_threshold}
    ), sized AS (
      SELECT doc_id, count(*) AS set_size FROM sh GROUP BY 1
    ), inter AS (
      SELECT e.id_a, e.id_b, count(*) AS inter
      FROM est e
      JOIN sh a ON a.doc_id = e.id_a
      JOIN sh b ON b.doc_id = e.id_b AND b.s = a.s
      GROUP BY 1, 2
    ), p AS (
      SELECT id_a, id_b
      FROM inter
      JOIN sized za ON za.doc_id = id_a
      JOIN sized zb ON zb.doc_id = id_b
      WHERE inter / CAST(za.set_size + zb.set_size - inter AS DOUBLE) >= {jaccard_threshold}
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM p
      UNION
      SELECT id_b, id_a FROM p
    ), reach(src, dst) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.dst FROM edges e JOIN reach r ON e.dst = r.src
    )
    SELECT src AS doc_id, CAST(min(dst) AS BIGINT) AS rep_id
    FROM reach
    GROUP BY src
    HAVING src != min(dst)
    """


@query("d15_near_dedup_checked", oracle=_d15_oracle())
def d15_near_dedup_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FLAGSHIP composed dedup pipeline, value-checked end to end:
    oracle-replayable MinHash-LSH candidates (d11's literal seeds) →
    exact per-pair Jaccard verification → connected-component
    resolution → the (doc_id, rep_id) drop list
    (operators/dedup.near_dedup_drop_list_checked).  d07 keeps the
    vectorized-hash throughput path with identical topology; this run
    proves the COMPOSITION — candidates, verify decisions, cluster
    reps, drop set — bit-for-bit against DuckDB's recursive-CTE
    replay."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.near_dedup_drop_list_checked(
        docs, est_threshold=0.25, jaccard_threshold=0.5
    )


# Round 6: the five formerly rows-only queries (VERDICT r05 §missing #1)
# now run the checked kernels by default, so they get full value-check
# oracles.  Attached here (not at the @query site) because the renderers
# live next to their twins, below the original query definitions.
ORACLE["d03_minhash_lsh_pairs"] = _d11_oracle(threshold=0.375)
ORACLE["d04_simhash_pairs"] = _d12_oracle(max_hamming=3)
ORACLE["s02_ann_ivf_topk"] = _ivf_checked_oracle(n_probe=2)
ORACLE["s04_ann_srp_topk"] = _srp_checked_oracle()
ORACLE["d07_near_dedup_drop_list"] = _d15_oracle(
    est_threshold=0.25, jaccard_threshold=0.6
)


@query(
    "m06_image_decode_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id, (doc_id * 31 + i * 7) % 256 AS p
      FROM documents, unnest(range(0, 512)) AS u(i)
    )
    SELECT doc_id,
           32::BIGINT AS width,
           16::BIGINT AS height,
           CAST(sum(p) AS BIGINT) AS px_sum,
           CAST(min(p) AS BIGINT) AS px_min,
           CAST(max(p) AS BIGINT) AS px_max
    FROM px GROUP BY doc_id
    """,
)
def m06_image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode inside the checked inventory: every doc gets a
    synthetic 32x16 PGM payload (pixel law (id*31 + 7i) mod 256,
    operators/multimodal.render_pgm_payloads), and a second Arrow stage
    decodes the actual bytes — magic check, header parse, raster
    reshape (multimodal.decode_image, pure numpy) — then reduces to
    per-image stats.  The arithmetic pixel law lets DuckDB replay the
    stats without decoding, so the encode→decode round trip itself is
    what is value-checked.  Formats needing codec libs stay env-gated;
    the pipeline shape (binary column → decode kernel → stats) is the
    production one."""
    from mapreducehs_spark.operators.multimodal import (
        decoded_image_stats,
        render_pgm_payloads,
    )

    docs = _t(spark, sf_dir, "documents")
    payloads = render_pgm_payloads(docs, "doc_id", width=32, height=16)
    return decoded_image_stats(payloads).withColumnRenamed("id", "doc_id")


@query(
    "q86_lateral_topn",
    oracle="""
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_name, round(c_acctbal, 4) AS c_acctbal
      FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c.c_acctbal DESC, c_name ASC
      LIMIT 3
    ) t
    """,
)
def q86_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery through the Spark 4 DataFrame API
    (``DataFrame.lateralJoin`` + ``Column.outer()`` correlation): the
    top-3 customers by balance per nation, expressed as a per-outer-row
    ordered limit rather than a window-rank over the whole fact.
    Catalyst rewrites the correlated limit into the same
    rank-then-filter physical shape (no per-nation re-scan), so this
    pins the API surface AND its plan equivalence with q12's window
    formulation; DuckDB runs the identical LATERAL semantics."""
    nat = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    return nat.lateralJoin(
        cust.where(F.col("c_nationkey") == F.col("n_nationkey").outer())
        .orderBy(F.col("c_acctbal").desc(), F.col("c_name").asc())
        .limit(3)
        .select("c_name", F.round("c_acctbal", 4).alias("c_acctbal"))
    ).select("n_name", "c_name", "c_acctbal")


@query(
    "d16_embedding_dedup_drop_list",
    oracle="""
    WITH RECURSIVE p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM p
      UNION
      SELECT id_b, id_a FROM p
    ), reach(src, dst) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.dst FROM edges e JOIN reach r ON e.dst = r.src
    )
    SELECT src AS vec_id, CAST(min(dst) AS BIGINT) AS rep_id
    FROM reach
    GROUP BY src
    HAVING src != min(dst)
    """,
)
def d16_embedding_dedup_drop_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC (embedding-space) dedup composed end to end: exact
    blocked-matmul cosine pairs (d05's operator) → connected-component
    resolution → the (vec_id, rep_id) drop list — the companion of
    d15's lexical pipeline for paraphrase-level duplicates that share
    no shingles.  Value-checked throughout: the pair stage is exact,
    and DuckDB replays the component closure recursively.  At 100 TB
    the pair stage swaps to SRP-LSH candidates (cosine_pairs_lsh) with
    the identical downstream; the drop-list contract is unchanged."""
    from mapreducehs_spark.operators.similarity import all_pairs_cosine_blocked

    emb = _t(spark, sf_dir, "embeddings")
    pairs = all_pairs_cosine_blocked(emb, threshold=0.4).select("id_a", "id_b")
    clusters = dedup.resolve_duplicate_clusters(pairs)
    return (
        clusters.filter(F.col("doc_id") != F.col("rep_id"))
        .select(F.col("doc_id").alias("vec_id"), "rep_id")
    )


@query(
    "q87_variant_json",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(min(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS min_k,
           CAST(max(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    WHERE props IS NOT NULL
    GROUP BY event_type
    """,
)
def q87_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured data through the Spark 4 VARIANT type:
    ``parse_json`` once into a variant column, then typed path access
    (``try_variant_get``) — the open-schema ingestion shape that
    replaces per-query string re-parsing (q19's get_json_object) with a
    parse-once binary encoding; at 100 TB the variant column is stored
    shredded and paths prune like real columns.  DuckDB replays the
    same paths with its JSON operators."""
    ev = _t(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "q88_listagg_ordered",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
           round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 4) AS revenue
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q88_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (Spark 4 ``listagg ... WITHIN GROUP``)
    — the report-friendly holistic aggregate that needs its group
    sorted before concatenation, exercised through the SQL surface.
    The WITHIN GROUP ordering makes the output deterministic (plain
    collect_list+concat is partition-order-dependent and would never
    hash-match an oracle).  DuckDB's string_agg(... ORDER BY) is the
    same semantics.  (Engine note: Spark 4.1 throws ClassCastException
    when listagg(DISTINCT) shares a grouping with a second distinct
    aggregate — the revenue column here is deliberately non-distinct.)"""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               listagg(DISTINCT o_orderstatus, ',') WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 4) AS revenue
        FROM orders_v
        GROUP BY o_orderpriority
        """
    )


@query(
    "q89_deterministic_shuffle",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, md5('epoch7_' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      FROM documents
    ), ordered AS (
      SELECT doc_id, shuffle_key,
             row_number() OVER (ORDER BY shuffle_key, doc_id) AS pos
      FROM keyed
    )
    SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           CAST((pos - 1) // 64 AS BIGINT) AS shard
    FROM ordered
    """,
)
def q89_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: a seeded content-hash key
    gives every document a reproducible global position and shard — the
    export step before training (new epoch = new seed string), with the
    guarantees random() can't give: stable under re-runs, re-sharding,
    and engine changes.  Positions come from
    operators/sampling.global_positions_cached — range-partitioned sort
    + per-partition offsets, never the single-task gather a bare
    ``row_number() OVER (ORDER BY ...)`` collapses to — and shard
    assignment is arithmetic on the position; at 100 TB the per-shard
    writer is ``partitionBy(shard)`` on this frame (which materializes
    it, exactly like the localCheckpoint here).  Both engines share the
    md5 definition, so the permutation is value-checked."""
    from mapreducehs_spark.operators.sampling import global_positions_cached

    docs = _t(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit("epoch7_"), F.col("doc_id").cast("string"))).alias("shuffle_key"),
    )
    pos, cache = global_positions_cached(keyed, ["shuffle_key", "doc_id"])
    try:
        return (
            pos.withColumn("shard", F.floor((F.col("pos") - 1) / 64).cast("bigint"))
            .select("doc_id", "pos", "shard")
            .localCheckpoint()  # materialize, then free the sorted cache
        )
    finally:
        cache.unpersist(blocking=False)


@query(
    "q90_schema_evolution_union",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, o_totalprice
      FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01'
    ), v2 AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    ), unioned AS (
      SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority FROM v1
      UNION ALL
      SELECT o_orderkey, o_totalprice, o_orderpriority FROM v2
    )
    SELECT coalesce(o_orderpriority, '(pre-schema)') AS priority,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 4) AS total
    FROM unioned
    GROUP BY 1
    """,
)
def q90_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: an old export lacking a column merges
    with the current one via ``unionByName(allowMissingColumns=True)``
    — position-blind name matching with null back-fill, the only safe
    way to union evolving pipeline generations (positional UNION
    silently misaligns reordered columns).  At 100 TB this is the
    nightly merge of years of heterogeneous exports; the union is
    narrow (no shuffle) and the aggregate is the only exchange."""
    o = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1995-01-01").cast("timestamp")
    v1 = o.filter(F.col("o_orderdate") < cutoff).select("o_orderkey", "o_totalprice")
    v2 = o.filter(F.col("o_orderdate") >= cutoff).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    return (
        v1.unionByName(v2, allowMissingColumns=True)
        .groupBy(F.coalesce("o_orderpriority", F.lit("(pre-schema)")).alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(cents) / 100.0, 4).alias("total"),
        )
    )


def _q76_oracle() -> str:
    """Morton-key oracle rendered from the same bit arithmetic as
    operators/layout.zorder_value (bits=8 on the bucketed keys)."""
    terms = " + ".join(
        f"(((xk >> {k}) & 1) << {2 * k}) + (((yk >> {k}) & 1) << {2 * k + 1})"
        for k in range(8)
    )
    return f"""
    WITH keyed AS (
      SELECT l_partkey % 256 AS xk, l_suppkey % 256 AS yk
      FROM lineitem
    ), z AS (
      SELECT ({terms}) AS zval FROM keyed
    )
    SELECT zval // 4096 AS z_block,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(zval) AS BIGINT) AS z_min,
           CAST(max(zval) AS BIGINT) AS z_max
    FROM z
    GROUP BY 1
    """


@query("q76_zorder_key", oracle=_q76_oracle())
def q76_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (z-order) clustering key over (l_partkey, l_suppkey) —
    the multi-column data-skipping layout (operators/layout.py): files
    sorted by this key cover small rectangles of the key space, so
    min-max pruning works for predicates on EITHER column.  The key is
    pure shift/mask JVM expressions (codegen); the query profiles the
    key-space occupancy per 4096-key block, and the oracle re-derives
    the interleave arithmetic.  The write path (zorder_write:
    repartitionByRange on the key + within-partition sort) is pinned by
    tests/test_operators.py::test_zorder_write_tightens_file_ranges."""
    from mapreducehs_spark.operators.layout import zorder_value

    li = _t(spark, sf_dir, "lineitem")
    z = zorder_value(F.col("l_partkey") % 256, F.col("l_suppkey") % 256, bits=8)
    return (
        li.select(z.alias("zval"))
        .groupBy(F.floor(F.col("zval") / 4096).cast("long").alias("z_block"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("zval").alias("z_min"),
            F.max("zval").alias("z_max"),
        )
    )


@query(
    "st09_stream_python_source",
    oracle="""
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(id_sq) AS BIGINT) AS sum_sq
    FROM (
      SELECT i AS id, i * i AS id_sq, 'b' || CAST(i % 10 AS VARCHAR) AS bucket
      FROM range(0, 2000) t(i)
    )
    GROUP BY bucket
    """,
)
def st09_stream_python_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming over a CUSTOM PYTHON streaming source
    (sources/pydatasource.SequenceStreamDataSource): offset-managed
    micro-batches + exact replay, the API a queue/CDC connector
    implements.  The bounded stream drains through a complete-mode
    aggregation into the memory sink; the oracle recomputes the
    sequence arithmetic.  (sf-independent by design — the source IS the
    data; deterministic across chunking because counts/sums are
    order-insensitive.)"""
    from mapreducehs_spark.sources.pydatasource import register

    register(spark)
    stream = (
        spark.readStream.format("seqstream")
        .option("n", 2000)
        .option("chunk", 500)
        .load()
    )
    agg = stream.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"), F.sum("id_sq").alias("sum_sq")
    )
    # availableNow drains only the prefetched first chunk of a Python
    # simple stream reader; for a bounded source the drain loop is
    # processAllAvailable (returns once offsets stop advancing)
    q = (
        agg.writeStream.format("memory")
        .queryName("st09_sink")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table("st09_sink")


@query(
    "t14_source_entropy",
    oracle="""
    WITH toks AS (
      SELECT source,
             unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS term
      FROM documents
    ), sc AS (
      SELECT source, term, count(*) AS c FROM toks GROUP BY 1, 2
    ), stot AS (
      SELECT source, sum(c) AS tot FROM sc GROUP BY 1
    ), corpus AS (
      SELECT term, sum(c) AS cc FROM sc GROUP BY 1
    ), ctot AS (
      SELECT sum(cc) AS ct FROM corpus
    )
    SELECT sc.source,
           CAST(stot.tot AS BIGINT) AS n_tokens,
           round(-sum((sc.c / stot.tot) * ln(sc.c / stot.tot)), 6) AS entropy,
           round(sum((sc.c / stot.tot) *
                     ln((sc.c / stot.tot) / (corpus.cc / ctot.ct))), 6) AS kl_vs_corpus
    FROM sc
    JOIN stot USING (source)
    JOIN corpus USING (term)
    CROSS JOIN ctot
    GROUP BY sc.source, stot.tot
    """,
)
def t14_source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing diagnostics: per-source token-distribution Shannon
    entropy and KL divergence vs the corpus distribution — the drift /
    domain-balance report a mixture pipeline emits per shard.  Shape:
    one explode, one (source, term) hash agg, then only VOCABULARY-sized
    frames (per-source counts, corpus counts) flow through two
    broadcast-scale joins and a rollup — token rows never shuffle twice.
    KL here is finite by construction (every source term is a corpus
    term)."""
    docs = _t(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    toks = (
        docs.select("source", text.tokens("text").alias("__t"))
        .repartition(par)
        .select("source", F.explode_outer("__t").alias("term"))
        .filter(F.col("term").isNotNull())
    )
    sc = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("c"))
    stot = sc.groupBy("source").agg(F.sum("c").alias("tot"))
    corpus = sc.groupBy("term").agg(F.sum("c").alias("cc"))
    ct = corpus.agg(F.sum("cc").alias("ct"))
    p = F.col("c") / F.col("tot")
    q = F.col("cc") / F.col("ct")
    return (
        sc.join(F.broadcast(stot), "source")
        .join(F.broadcast(corpus), "term")
        .crossJoin(F.broadcast(ct))
        .groupBy("source", "tot")
        .agg(
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
            F.round(F.sum(p * F.log(p / q)), 6).alias("kl_vs_corpus"),
        )
        .select(
            "source",
            F.col("tot").cast("long").alias("n_tokens"),
            "entropy",
            "kl_vs_corpus",
        )
    )


@query(
    "q77_locf_gap_fill",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    ), filled AS (
      SELECT user_id, event_id,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS v_filled,
             v IS NULL AS was_gap
      FROM marked
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN was_gap THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
           round(sum(CAST(round(coalesce(v_filled, 0) * 100) AS BIGINT)) / 100.0, 4)
             AS sum_filled
    FROM filled
    GROUP BY user_id
    """,
)
def q77_locf_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling by last-observation-carried-forward (LOCF): error
    events null out their reading and inherit the user's previous
    value — the sensor/telemetry repair idiom.  ``last(..., ignorenulls
    =True)`` over an unbounded-preceding ROWS frame is the whole
    operator: ONE shuffle on user_id, bounded running state per key
    (the last non-null), then a per-user rollup on the same
    partitioning.  Leading gaps (no prior observation) stay null and
    are coalesced to 0 in the rollup on both engines."""
    ev = _t(spark, sf_dir, "events")
    v = F.when(F.col("event_type") != "error", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = ev.select(
        "user_id",
        v.alias("v"),
        F.last(v, ignorenulls=True).over(w).alias("v_filled"),
    )
    return filled.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("n_gaps"),
        # integer-cents sum: unordered group aggregation order differs
        # between engines, and exact integer sums can't straddle a
        # rounding boundary (see q73)
        F.round(
            F.sum(F.round(F.coalesce(F.col("v_filled"), F.lit(0.0)) * 100, 0).cast("bigint"))
            / 100.0,
            4,
        ).alias("sum_filled"),
    )


@query(
    "d13_containment_dedup",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
      FROM documents
    ), pos AS (
      SELECT doc_id, t, unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS i
      FROM toks
    ), sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
      FROM pos
    ), sized AS (
      SELECT doc_id, count(*) AS set_size FROM sh GROUP BY 1
    ), inter AS (
      SELECT a.doc_id AS id_small, b.doc_id AS id_big, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id != b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_small, id_big,
           round(inter / CAST(ss.set_size AS DOUBLE), 6) AS containment
    FROM inter
    JOIN sized ss ON ss.doc_id = id_small
    JOIN sized sb ON sb.doc_id = id_big
    WHERE inter / CAST(ss.set_size AS DOUBLE) >= 0.5
      AND ss.set_size < sb.set_size
    """,
)
def d13_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup: shingle containment |A∩B| / |A| ≥ 0.5 with
    |A| < |B| — catches short documents subsumed by longer ones
    (quote/excerpt dedup), which symmetric Jaccard misses because the
    size imbalance caps Jaccard at |A|/|B|.  Same candidates-then-
    measure shape as d02 (shared-shingle equi-join, never all-pairs);
    the direction filter keeps only small-inside-big rows.

    The join key is the 64-bit siphash of the shingle, not the string
    (half the shuffle width — the 100 TB choice); the intersection
    count therefore equals the string-set intersection only absent a
    within-pair 64-bit collision, a ~|A||B|/2^64 event that never
    fires at any tested scale.  The pair result is tiny, so it is
    materialized eagerly (localCheckpoint) and the shingle frame
    unpersisted immediately — no cached blocks outlive the call."""
    from mapreducehs_spark.operators.dedup import hashed_shingle_rows

    docs = _t(spark, sf_dir, "documents")
    ex = hashed_shingle_rows(docs, "text", "doc_id", 3).persist()
    try:
        a = ex.select(
            F.col("id").alias("id_small"), F.col("set_size").alias("size_small"), "shingle"
        )
        b = ex.select(F.col("id").alias("id_big"), F.col("set_size").alias("size_big"), "shingle")
        inter = (
            a.join(b, "shingle")
            .filter(F.col("id_small") != F.col("id_big"))
            .groupBy("id_small", "id_big", "size_small", "size_big")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
        return (
            inter.withColumn(
                "containment",
                F.round(F.col("inter") / F.col("size_small").cast("double"), 6),
            )
            .filter((F.col("containment") >= 0.5) & (F.col("size_small") < F.col("size_big")))
            .select("id_small", "id_big", "containment")
            .localCheckpoint()
        )
    finally:
        ex.unpersist(blocking=False)


@query(
    "t15_zipf_slope",
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS term
      FROM documents
    ), freq AS (
      SELECT term, count(*) AS f FROM toks GROUP BY 1
    ), ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, term ASC) AS r FROM freq
    )
    SELECT CAST(count(*) AS BIGINT) AS vocab,
           round(regr_slope(ln(f), ln(r)), 6) AS zipf_slope,
           round(regr_r2(ln(f), ln(r)), 6) AS r2
    FROM ranked
    """,
)
def t15_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf diagnostics: regression slope of ln(frequency) on ln(rank)
    over the corpus rank-frequency curve (natural text ≈ -1; synthetic
    or templated corpora deviate — a cheap corpus-health check).  The
    regression runs on the VOCABULARY-sized frame, so the only
    token-scale work is the frequency count; ``regr_slope``/``regr_r2``
    are built-in partial-aggregatable aggregates on both engines.
    Vocabulary rank comes from ``global_positions`` (distributed range
    sort + partition offsets): a bare row_number() window would rank
    the whole vocabulary in ONE task — fine at test scale, a straggler
    on a billion-term n-gram vocabulary."""
    from mapreducehs_spark.operators.sampling import global_positions_cached

    docs = _t(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    freq = (
        docs.select(text.tokens("text").alias("__t"))
        .repartition(par)
        .select(F.explode_outer("__t").alias("term"))
        .filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    ranked, cache = global_positions_cached(
        freq.withColumn("neg_f", -F.col("f")), ["neg_f", "term"], "r"
    )
    try:
        return ranked.agg(
            F.count(F.lit(1)).alias("vocab"),
            F.round(F.expr("regr_slope(ln(f), ln(r))"), 6).alias("zipf_slope"),
            F.round(F.expr("regr_r2(ln(f), ln(r))"), 6).alias("r2"),
        ).localCheckpoint()  # materialize the 1-row result, then free the cache
    finally:
        cache.unpersist(blocking=False)


@query(
    "q78_multiformat_join",
    oracle="""
    SELECT n.n_name, r.r_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(c.c_acctbal), 4) AS sum_acctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY n.n_name, r.r_name
    """,
)
def q78_multiformat_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous-source join: the nation dim round-trips through
    CSV and region through JSON (explicit schemas — no inference scan),
    then both join the parquet customer table.  Witnesses the
    csv/json readers inside the ORACLE-CHECKED inventory, not just unit
    tests; at 100 TB this is the common shape of sidecar dims living in
    exported flat files.  The dims are rewritten per run into /tmp —
    trivial (25 + 5 rows); the fact side stays parquet with full
    pushdown."""
    import os
    import tempfile

    from mapreducehs_spark.sources.catalog import read_any, write_any

    tag = os.path.basename(os.path.normpath(sf_dir))
    base = os.path.join(tempfile.gettempdir(), f"mapreducehs_fmt_{tag}")
    nation_csv = os.path.join(base, "nation_csv")
    region_json = os.path.join(base, "region_json")
    nat, reg = _t(spark, sf_dir, "nation"), _t(spark, sf_dir, "region")
    write_any(nat, nation_csv, fmt="csv", header="true")
    write_any(reg, region_json, fmt="json")

    nat2 = read_any(
        spark, nation_csv, fmt="csv",
        schema="n_nationkey int, n_name string, n_regionkey int", header="true",
    )
    reg2 = read_any(spark, region_json, fmt="json", schema="r_regionkey int, r_name string")
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.join(F.broadcast(nat2), nat2["n_nationkey"] == cust["c_nationkey"])
        .join(F.broadcast(reg2), reg2["r_regionkey"] == nat2["n_regionkey"])
        .groupBy("n_name", "r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 4).alias("sum_acctbal"),
        )
    )


@query(
    "q79_date_spine",
    oracle="""
    WITH bounds AS (
      SELECT CAST(min(o_orderdate) AS DATE) AS lo, CAST(max(o_orderdate) AS DATE) AS hi
      FROM orders
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM bounds
    ), daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n, sum(o_totalprice) AS s
      FROM orders GROUP BY 1
    )
    SELECT strftime(spine.d, '%Y-%m-%d') AS day,
           CAST(coalesce(daily.n, 0) AS BIGINT) AS n_orders,
           round(coalesce(daily.s, 0), 4) AS revenue
    FROM spine LEFT JOIN daily ON daily.d = spine.d
    """,
)
def q79_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap fill: a dense daily calendar between the first
    and last order date, zero-filled where no orders exist — the
    reporting idiom that makes time series chartable/joinable (missing
    days are rows, not gaps).  The spine is sequence()+explode of DATE
    (generated, never scanned) and broadcast to the daily aggregate —
    the fact table is scanned once.  Day emitted as a formatted string
    (oracle discipline: no raw timestamp columns)."""
    orders = _t(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s")
    )
    return (
        spine.join(daily, "d", "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n_orders"),
            F.round(F.coalesce("s", F.lit(0.0)), 4).alias("revenue"),
        )
    )


_Q80_SQL = """
    WITH RECURSIVE months(m) AS (
      SELECT CAST('1992-01-01' AS DATE)
      UNION ALL
      SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
      WHERE m < CAST('1998-12-01' AS DATE)
    ), monthly AS (
      SELECT CAST(CAST(o_orderdate AS DATE) - (EXTRACT(DAY FROM o_orderdate) - 1) * INTERVAL 1 DAY AS DATE) AS m,
             count(*) AS n, sum(o_totalprice) AS s
      FROM orders
      GROUP BY 1
    )
    SELECT CAST(EXTRACT(YEAR FROM months.m) AS BIGINT) AS y,
           CAST(EXTRACT(MONTH FROM months.m) AS BIGINT) AS mo,
           CAST(coalesce(monthly.n, 0) AS BIGINT) AS n_orders,
           round(coalesce(monthly.s, 0), 4) AS revenue
    FROM months LEFT JOIN monthly ON monthly.m = months.m
"""


@query("q80_recursive_cte", oracle=_Q80_SQL)
def q80_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE through the SQL surface (Spark 4 recursive CTE):
    a monthly spine generated by recursion, left-joined to monthly
    revenue.  Spark and DuckDB execute the IDENTICAL SQL text — the
    strongest single parity witness in the inventory (same semantics,
    two engines, no dialect translation).  Recursion here is
    driver-bounded (84 iterations of a one-row step), which is exactly
    the shape recursive CTEs scale at — the per-iteration work, not the
    iteration count, is what grows with data, and the monthly aggregate
    is computed once outside the recursion."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q80_SQL)


@query(
    "st10_stream_upsert_serving",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 4) AS sum_value
    FROM events
    GROUP BY user_id
    """,
)
def st10_stream_upsert_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming-upsert SERVING-TABLE pattern: an update-mode
    per-user aggregation drains through ``foreachBatch``, and each
    micro-batch MERGES its changed rows into a keyed parquet serving
    table (operators/merge.merge_upsert) — the Delta/Iceberg
    ``MERGE INTO`` topology on plain parquet.  Only rows whose
    aggregate changed flow per batch (update mode); the final table
    must equal the batch aggregate regardless of chunking.  At 100 TB
    the serving table is written bucketed on the merge key so the
    nightly/continuous merge reuses the layout (SCALE.md CDC row).
    Integer-cents sums keep the fold order-exact across engines."""
    import os
    import shutil
    import tempfile

    from mapreducehs_spark import streaming as st
    from mapreducehs_spark.operators.merge import merge_upsert

    replay = st.prepare_stream_dir(spark, sf_dir, n_chunks=4)
    events = st.events_stream(spark, replay)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    agg = (
        events.filter(F.col("event_type") != st.FLUSH_TYPE)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(cents).alias("cents"))
    )

    serving = os.path.join(
        tempfile.gettempdir(),
        f"mapreducehs_serving_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(serving, ignore_errors=True)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        if os.path.exists(serving):
            base = sp.read.parquet(serving)
            merged = merge_upsert(base, batch_df, keys=["user_id"])
        else:
            merged = batch_df
        # rewrite via a temp dir: the merge READS the current serving
        # table, and overwriting a path being read is undefined
        tmp = serving + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(serving):
            shutil.rmtree(serving)
        os.rename(tmp, serving)

    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout=600):
        q.stop()
        raise TimeoutError("st10 stream did not finish")
    return spark.read.parquet(serving).select(
        "user_id",
        "n_events",
        F.round(F.col("cents") / 100.0, 4).alias("sum_value"),
    )


@query(
    "m05_pointer_manifest",
    oracle="""
    SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.bin' AS file_name,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    """,
)
def m05_pointer_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINTER-style multimodal layout, end to end: payloads live as
    individual files on storage and the engine handles a manifest of
    (path, size, checksum) — the 100 TB posture where petabytes of
    media bytes never enter the relational plan (SCALE.md multimodal
    row).  The query builds the manifest with Spark's ``binaryFile``
    source over the payload directory (content read once, hashed,
    dropped); the oracle recomputes size/checksum from the source text
    the fixture files were written from.  The fixture write is a
    one-time driver loop (it IS the external media store); everything
    after is distributed."""
    import os
    import tempfile

    from mapreducehs_spark.operators.multimodal import read_binary_dir
    from mapreducehs_spark.sources.catalog import build_fixture_once, source_fingerprint

    tag = os.path.basename(os.path.normpath(sf_dir))
    fp = source_fingerprint(sf_dir, "documents")

    def _write_media(tmp: str) -> None:
        from mapreducehs_spark.sources.catalog import guard_driver_fixture

        os.makedirs(tmp, exist_ok=True)
        docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
        guard_driver_fixture(docs, f"m05 media fixture ({sf_dir})")
        for r in docs.collect():
            with open(os.path.join(tmp, f"doc_{r['doc_id']}.bin"), "wb") as f:
                f.write(r["text"].encode("utf-8"))

    base = build_fixture_once(
        os.path.join(tempfile.gettempdir(), f"mapreducehs_media_{tag}_{fp}"),
        _write_media,
    )
    bins = read_binary_dir(spark, os.path.join(base, "*.bin"))
    return bins.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("checksum"),
    )


@query(
    "q82_partitioned_pruned_scan",
    oracle="""
    WITH lo AS (SELECT CAST(min(ts) AS DATE) AS d0 FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 4) AS sum_value
    FROM events, lo
    WHERE CAST(ts AS DATE) = d0 + 5
    GROUP BY event_type
    """,
)
def q82_partitioned_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned layout + static partition pruning, inside the
    checked inventory: events are written ONCE per sf partitioned by
    event date (the 100 TB fact layout — a daily ingest appends one
    directory), and the one-day query touches exactly one partition
    directory (PartitionFilters, zero data read elsewhere).  The
    fixture write is idempotent (_DONE marker); the day is
    data-relative (min date + 5) so the query is deterministic across
    scale factors."""
    import os
    import tempfile

    from mapreducehs_spark.sources.catalog import build_fixture_once, source_fingerprint

    tag = os.path.basename(os.path.normpath(sf_dir))
    fp = source_fingerprint(sf_dir, "events")
    ev = _t(spark, sf_dir, "events")
    base = build_fixture_once(
        os.path.join(tempfile.gettempdir(), f"mapreducehs_events_bydate_{tag}_{fp}"),
        lambda tmp: ev.withColumn("event_date", F.col("ts").cast("date"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(tmp),
    )

    d0 = ev.agg(F.min(F.col("ts").cast("date"))).collect()[0][0]
    target = d0 + __import__("datetime").timedelta(days=5)
    part = spark.read.parquet(base).filter(F.col("event_date") == F.lit(target))
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    return part.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(cents) / 100.0, 4).alias("sum_value"),
    )


@query(
    "q83_large_large_smj",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
                 / 10000.0, 4) AS revenue
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def q83_large_large_smj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The large×large join done deliberately: lineitem ⋈ orders with a
    MERGE hint — at 100 TB neither side broadcasts, so the correct plan
    is a sort-merge join with BOTH sides shuffled once on the join key
    (or zero shuffles when both tables are bucketed on it — the
    write_bucketed layout; plan pinned in
    test_bucketed_join_has_no_exchange).  The rollup reuses nothing:
    it keys on o_orderpriority, an unavoidable second exchange.  Plan
    shape pinned in test_q83_smj_not_broadcast."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return (
        li.hint("merge")
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            # revenue rides as exact basis-point integers: 120k-row
            # groups drifted past the 4-decimal rounding boundary under
            # differing fold orders at sf0.1 (price and discount have 2
            # decimals each, so x10000 is exact)
            F.round(
                F.sum(
                    F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0).cast(
                        "bigint"
                    )
                )
                / 10000.0,
                4,
            ).alias("revenue"),
        )
    )


@query(
    "d14_fuzzy_name_match",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name AS name FROM part)
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_dist
    FROM names a JOIN names b
      ON a.name < b.name
     AND abs(length(a.name) - length(b.name)) <= 2
    WHERE levenshtein(a.name, b.name) <= 2
    """,
)
def d14_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution / fuzzy matching: distinct part-name pairs
    within Levenshtein distance 2, via complete length-band blocking
    (operators/dedup.fuzzy_name_pairs) — the record-linkage primitive
    (vendor/product name reconciliation) missing from pure
    equality-based dedup.  Both engines share the levenshtein
    definition, so the whole operator is value-checked."""
    part = _t(spark, sf_dir, "part")
    return dedup.fuzzy_name_pairs(part, "p_name", max_edit=2)


@query(
    "q84_decimal_exact_money",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))) AS VARCHAR) AS total_exact,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q84_decimal_exact_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-decimal money aggregation: the financial-correctness
    discipline — cast to DECIMAL(18,2) before summing, so the result is
    exact regardless of aggregation order (double sums drift in the
    last bits with partial-aggregation order; see the q73 fix).  The
    exact sum is emitted as its canonical string so the check is
    bit-for-bit, not rounded.  Spark decimals partial-aggregate fine
    (sum of DECIMAL(18,2) widens to DECIMAL(28,2)); at 100 TB this is
    the ledger-grade rollup path."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("string").alias("total_exact"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "q85_salted_join",
    oracle="""
    SELECT o_orderpriority,
           CAST(floor(epoch(l_shipdate)) AS BIGINT) // 86400 AS ship_day,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_quantity >= 45
    GROUP BY 1, 2
    """,
)
def q85_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof SALTED join inside the checked inventory: the fact
    side spreads each join key over 16 salt sub-keys and the dim side
    replicates x16 (operators/skew.salted_join) — the manual remedy for
    hot keys in the joins AQE's skew splitting can't reach
    (grouped-map consumers, shuffle-hash joins).  The oracle is the
    PLAIN join: salting must be result-invisible, which is exactly
    what's worth hash-checking about it."""
    from mapreducehs_spark.operators.skew import salted_join

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 45)
        .select("l_orderkey", "l_shipdate")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(li, orders, "l_orderkey", "o_orderkey", n_salts=16)
    return joined.groupBy(
        "o_orderpriority",
        (F.col("l_shipdate").cast("long") / 86400).cast("long").alias("ship_day"),
    ).agg(F.count(F.lit(1)).alias("n_lines"))


# =========================================================================
# Round 4: text-pipeline additions (PII, LM scoring, BPE learning, chunking)
# =========================================================================

@query(
    "t16_pii_redact",
    oracle=r"""
    WITH injected AS (
      SELECT source,
             text
             || CASE WHEN doc_id % 3 != 0
                     THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@example.org'
                     ELSE '' END
             || CASE WHEN doc_id % 2 = 0
                     THEN ' hotline +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                     THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
                          || CAST((doc_id * 7) % 256 AS VARCHAR)
                     ELSE '' END AS t
      FROM documents
    ), red AS (
      SELECT source, t,
             len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
             len(regexp_extract_all(t, '\+?\d{1,3}-\d{3}-\d{4}')) AS n_phone,
             len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
             regexp_replace(regexp_replace(regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\+?\d{1,3}-\d{3}-\d{4}', '<PHONE>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS clean
      FROM injected
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_email) AS BIGINT) AS n_emails,
           CAST(sum(n_phone) AS BIGINT) AS n_phones,
           CAST(sum(n_ip) AS BIGINT) AS n_ips,
           CAST(sum(len(t) - len(clean)) AS BIGINT) AS chars_removed,
           CAST(sum(('0x' || substr(md5(clean), 1, 12))::BIGINT) AS BIGINT) AS clean_fold
    FROM red
    GROUP BY source
    """,
)
def t16_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction scrub (compliance pass every training corpus runs):
    cascaded regexp_replace for emails → phones → IPv4 (operators/
    text.redact_pii), all codegen'd — 3 narrow passes over the scan, no
    shuffle until the per-source rollup.  The synthetic corpus carries
    no PII, so deterministic contact strings derived from doc_id are
    INJECTED first (CASE-gated so counts vary per source) and both
    engines replay injection + redaction identically; the md5-fold sum
    pins the redacted OUTPUT byte-for-byte, not just the match counts.
    Patterns stay in the Java∩RE2 regex subset (FIXTURES.md oracle
    discipline)."""
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    injected = docs.select(
        "source",
        F.concat(
            F.col("text"),
            F.when(
                did % 3 != 0,
                F.concat(F.lit(" reach user"), did.cast("string"), F.lit("@example.org")),
            ).otherwise(""),
            F.when(
                did % 2 == 0,
                F.concat(
                    F.lit(" hotline +1-555-"),
                    F.lpad((did % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(""),
            F.when(
                did % 5 == 0,
                F.concat(
                    F.lit(" host 10.0."),
                    (did % 256).cast("string"),
                    F.lit("."),
                    ((did * 7) % 256).cast("string"),
                ),
            ).otherwise(""),
        ).alias("t"),
    )
    counts = text.pii_counts("t")
    clean = text.redact_pii("t")
    fold = F.conv(F.substring(F.md5(clean), 1, 12), 16, 10).cast("bigint")
    return (
        injected.select(
            "source",
            counts["email"].alias("n_email"),
            counts["phone"].alias("n_phone"),
            counts["ipv4"].alias("n_ip"),
            (F.length("t") - F.length(clean)).alias("delta"),
            fold.alias("fold"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_email").cast("bigint").alias("n_emails"),
            F.sum("n_phone").cast("bigint").alias("n_phones"),
            F.sum("n_ip").cast("bigint").alias("n_ips"),
            F.sum("delta").cast("bigint").alias("chars_removed"),
            F.sum("fold").alias("clean_fold"),
        )
    )


@query(
    "t17_unigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS term
      FROM documents
    ), doc_term AS (
      SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2
    ), freq AS (
      SELECT term, count(*) AS f FROM toks GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(f) AS DOUBLE) AS n FROM freq
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           (CAST(sum(c * CAST(floor(1e6 * ln(CAST(f AS DOUBLE) / n)) AS BIGINT))
                 AS BIGINT) * 10000
            // (CAST(sum(c) AS BIGINT) * 1000000)) / 10000.0 AS avg_logprob
    FROM doc_term JOIN freq USING (term), tot
    GROUP BY doc_id
    """,
)
def t17_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring — the cheap perplexity proxy used
    to rank documents for training-mix curation: avg over tokens of
    ln(corpus unigram probability).  Token-scale work is two hash aggs
    (doc-term counts, corpus term counts); the scoring join touches
    only the VOCABULARY-sized frequency frame (broadcast), never
    re-shuffling the corpus.  Per-token log-probs are quantized to
    exact integer micro-nats (floor(1e6·ln p)) before summation, so
    the aggregation is order-independent and value-checkable — the
    same exactness trade as q83's basis-point revenue."""
    docs = _t(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    toks = (
        docs.select("doc_id", text.tokens("text").alias("__t"))
        .repartition(par)
        .select("doc_id", F.explode_outer("__t").alias("term"))
        .filter(F.col("term").isNotNull())
    )
    doc_term = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("f"))
    total = freq.agg(F.sum("f").cast("double").alias("n"))
    # micro-nats on the VOCABULARY frame via the C-library log
    # (text.micro_ln_udf: the JVM log intrinsic diverges from the
    # oracle's libm by an ulp — observed flipping a floor at sf1);
    # also cheaper: one log per term instead of one per (doc, term)
    scored = (
        freq.crossJoin(F.broadcast(total))
        .withColumn(
            "micro", text.micro_ln_udf()(F.col("f").cast("double") / F.col("n"))
        )
        .select("term", "micro")
    )
    # truncating integer fixed-point average (the q94 recipe): a
    # rounded double quotient eventually lands on a .xxxx5 tie and the
    # engines' round() split (observed at sf1: -5.70215); `div` and
    # DuckDB `//` both truncate toward zero, so the 4-decimal value is
    # engine-exact at any scale
    return (
        doc_term.join(F.broadcast(scored), "term")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(F.col("c") * F.col("micro")).cast("bigint").alias("__s"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (
                F.expr("(__s * 10000L) div (n_tokens * 1000000L)") / F.lit(10000.0)
            ).alias("avg_logprob"),
        )
    )


def _t18_oracle() -> str:
    """Unrolled 3-iteration replay of the BPE merge loop: per iteration
    count adjacent pairs (index-join, overlap included), argmax with
    (count desc, pair asc) tiebreak, then the SAME left-to-right
    non-overlapping delimiter replace both engines implement."""
    head = """
    WITH t0 AS (
      SELECT ' ' || array_to_string(
               list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''), ' ')
             || ' ' AS s
      FROM documents
    )"""
    parts = []
    for i in range(1, 4):
        prev = f"t{i - 1}"
        parts.append(f"""
    , l{i} AS (
      SELECT list_filter(str_split(trim(s), ' '), x -> x != '') AS l FROM {prev}
    ), p{i} AS (
      SELECT l[i] AS a, l[i + 1] AS b, count(*) AS cnt
      FROM l{i}, LATERAL unnest(range(1, len(l))) AS u(i)
      GROUP BY 1, 2
    ), m{i} AS (
      SELECT a, b, cnt FROM p{i} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
    ), t{i} AS (
      SELECT replace(s, ' ' || m.a || ' ' || m.b || ' ',
                        ' ' || m.a || '_' || m.b || ' ') AS s
      FROM {prev}, m{i} m
    ), v{i} AS (
      SELECT count(DISTINCT u) AS v
      FROM (SELECT unnest(list_filter(str_split(trim(s), ' '), x -> x != '')) AS u FROM t{i})
    )""")
    selects = " UNION ALL ".join(
        f"""SELECT {i} AS iter, a AS pair_a, b AS pair_b,
               CAST(cnt AS BIGINT) AS pair_count,
               (SELECT CAST(v AS BIGINT) FROM v{i}) AS vocab_after
        FROM m{i}"""
        for i in range(1, 4)
    )
    return head + "".join(parts) + "\n    " + selects


@query("t18_bpe_merge_learn", oracle=_t18_oracle())
def t18_bpe_merge_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge learning (tokenizer-vocabulary induction, Sennrich et
    al. 2016) as a distributed iterative loop: 3 rounds of corpus-wide
    adjacent-pair counting → driver-side argmax (ONE row per round —
    the driver holds the model, s05 discipline) → corpus-wide merge as
    a codegen'd literal replace.  The per-round shuffle is keyed on the
    PAIR (narrow, partial-aggregatable counts), never the documents;
    at 100 TB each round is one map-side-combined count shuffle.  The
    whole loop is value-checked: the oracle unrolls the same three
    iterations (see _t18_oracle for the shared merge semantics)."""
    docs = _t(spark, sf_dir, "documents")
    steps = text.bpe_merge_steps(docs, iters=3)
    return spark.createDataFrame(
        steps, "iter int, pair_a string, pair_b string, pair_count bigint, vocab_after bigint"
    )


@query(
    "t19_doc_chunks",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS l
      FROM documents
    ), sized AS (
      SELECT doc_id, l, len(l) AS n FROM toks WHERE len(l) > 0
    ), chunks AS (
      SELECT doc_id, i AS chunk_id,
             l[(i * 48 + 1):least(i * 48 + 64, n)] AS c
      FROM sized,
           LATERAL unnest(range(0, 1 + CAST(ceil(greatest(n - 64, 0) / 48.0) AS INT))) AS t(i)
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(len(c) AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(c, ' ')) AS chunk_md5
    FROM chunks
    """,
)
def t19_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (64-token windows, stride 48 —
    16-token overlap): the RAG / long-context preparation step, via
    operators/text.chunk_documents.  Pure array-side fission — one
    split, one windowed slice transform, one explode; NO shuffle, so
    it scales embarrassingly (every chunk row is independent
    downstream).  chunk_md5 pins each chunk's exact text."""
    docs = _t(spark, sf_dir, "documents")
    ch = text.chunk_documents(docs, chunk_tokens=64, stride=48)
    return ch.select(
        F.col("id").alias("doc_id"),
        "chunk_id",
        "n_chunk_tokens",
        F.md5("chunk_text").alias("chunk_md5"),
    )


# =========================================================================
# Round 4: quantized similarity + relational additions
# =========================================================================

@query(
    "s08_quantized_cosine_topk",
    oracle="""
    WITH qz AS (
      SELECT vec_id,
             list_transform(embedding, x ->
               CASE WHEN s = 0 THEN 0
                    ELSE CAST(floor(CAST(x AS DOUBLE) / s * 127 + 0.5) AS BIGINT) END) AS q
      FROM (
        SELECT vec_id, embedding,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS s
        FROM embeddings
      )
    ), pairs AS (
      SELECT p.vec_id AS query_id, c.vec_id AS match_id,
             round(list_dot_product(p.q, c.q)
                   / sqrt(list_dot_product(p.q, p.q) * list_dot_product(c.q, c.q)),
                   6) AS qcosine
      FROM qz p JOIN qz c ON p.vec_id < 8 AND c.vec_id != p.vec_id
    ), ranked AS (
      SELECT query_id, match_id, qcosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY qcosine DESC, match_id ASC) AS rank
      FROM pairs
    )
    SELECT query_id, match_id, qcosine, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def s08_quantized_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine over int8-style scalar-QUANTIZED embeddings
    (similarity.quantized_cosine_topk): the memory-bandwidth scale path
    — a quantized corpus column is 4× narrower than float32, integer
    SIMD dots, |Δcos| bounded by ~2/levels.  Every arithmetic step
    (floor-quantization, integer dots, final sqrt ratio) is an exactly-
    specified IEEE op, so unlike float-kernel ANN the APPROXIMATION
    ITSELF is value-checked: the oracle replays quantization and
    scoring bit-for-bit — this is the checked twin discipline (d11/s06)
    applied to vector quantization."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.quantized_cosine_topk(emb, emb.filter(F.col("vec_id") < 8), k=5)


@query(
    "q91_scd2_dimension",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_type
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN prev_type IS NULL OR prev_type != event_type THEN 1 ELSE 0 END AS chg
      FROM ordered
    ), islands AS (
      SELECT user_id, event_type, ts,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    ), grouped AS (
      SELECT user_id, event_type, island,
             min(ts) AS valid_from, count(*) AS n_events
      FROM islands GROUP BY 1, 2, 3
    ), versioned AS (
      SELECT user_id, event_type, n_events, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from ASC) AS valid_to
      FROM grouped
    )
    SELECT user_id, event_type,
           CAST(floor(epoch(valid_from)) AS BIGINT) AS valid_from_s,
           CAST(floor(epoch(valid_to)) AS BIGINT) AS valid_to_s,
           CAST(n_events AS BIGINT) AS n_events,
           (valid_to IS NULL) AS is_current
    FROM versioned
    """,
)
def q91_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 build from a change stream: each
    user's event_type history collapses into consecutive-constant
    versions with [valid_from, valid_to) ranges and an is_current flag
    — the warehouse dimension-maintenance primitive (gaps-and-islands +
    lead).  All three passes share ONE partitioning (user_id): Catalyst
    plans a single shuffle and runs lag → running-sum → lead inside the
    same sort, which is the property that keeps it one-pass at 100 TB.
    Ties broken by event_id; epoch-second outputs (FIXTURES.md ts
    discipline)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    flagged = ev.withColumn(
        "chg",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "island", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    grouped = islands.groupBy("user_id", "event_type", "island").agg(
        F.min("ts").alias("valid_from"), F.count(F.lit(1)).alias("n_events")
    )
    wv = Window.partitionBy("user_id").orderBy(F.col("valid_from").asc())
    versioned = grouped.withColumn("valid_to", F.lead("valid_from").over(wv))
    return versioned.select(
        "user_id",
        "event_type",
        F.floor(F.unix_timestamp("valid_from")).cast("bigint").alias("valid_from_s"),
        F.floor(F.unix_timestamp("valid_to")).cast("bigint").alias("valid_to_s"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("valid_to").isNull().alias("is_current"),
    )


@query(
    "q92_bloom_prune_join",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
    GROUP BY l_returnflag
    """,
)
def q92_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime BLOOM-FILTER pruned join: a selective dim-side predicate
    (urgent + high-value orders) feeds Spark's InjectRuntimeFilter rule,
    which builds a bloom_filter_agg over the surviving join keys and
    semi-filters the fact scan BEFORE the shuffle — the 100 TB remedy
    when the filtered dim is too big to broadcast but the fact shuffle
    would be dominated by never-matching rows.  The filter is planned
    here with the injection thresholds temporarily lowered (local data
    is under the production-sized defaults) and the physical plan
    forced while they hold; results are plan-independent and the oracle
    checks the plain join.  Plan pinned in test_q92_bloom_filter."""
    conf = spark.conf
    saved = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        ),
        "spark.sql.autoBroadcastJoinThreshold": conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
    }
    orders = (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000))
        .select("o_orderkey")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag", "l_extendedprice")
    out = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")).alias("cents"),
        )
    )
    try:
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # force logical optimization + physical planning NOW (both are
        # lazily cached on this Dataset), so the bloom filter is baked
        # into the plan the caller's action will execute even after the
        # session confs are restored below
        out._jdf.queryExecution().executedPlan()
    finally:
        for k, v in saved.items():
            conf.set(k, v)
    return out


@query(
    "q94_incremental_mv",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 4) AS total_price,
           -- exact integer micro-division: a rounded double quotient sat
           -- ON a .xxxx5 boundary at sf0.01 and the engines' round()
           -- implementations split (the verify-skill bug class #2)
           CAST((sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) * 10000)
                // count(*) AS BIGINT) AS avg_price_micents,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY 1
    """,
)
def q94_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a monthly order
    rollup maintained as MERGEABLE PARTIALS — the base partition
    (orders before 1997-07) and the delta partition (after) are
    aggregated independently, then combined by the partial-merge
    algebra (sum∘sum, min∘min, max∘max; avg derived from merged sum
    and count at the end).  The oracle is the full recompute: merged
    partials must be indistinguishable from it, which is exactly the
    combiner-correctness property the reference's associative reducer
    contract demands (reference src/Core/MapReduceC.hs reducers must
    tolerate re-grouping).  At 100 TB this is the nightly-refresh path:
    only the delta partition is scanned per refresh."""
    orders = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1997-07-01").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
        return df.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("cents"),
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
        )

    base = partial(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        base.unionByName(delta)
        .groupBy("month")
        .agg(
            F.sum("n").alias("n"),
            F.sum("cents").alias("cents"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )
    return merged.select(
        "month",
        F.col("n").cast("bigint").alias("n_orders"),
        F.round(F.col("cents") / 100.0, 4).alias("total_price"),
        # integer `div`, not a rounded double quotient: one month's avg
        # landed exactly on a .xxxx5 rounding boundary at sf0.01 and the
        # two engines' round() split — micro-cent fixed point is exact
        # under any aggregation order (the q83/q96 discipline)
        F.expr("(cents * 10000L) div n").alias("avg_price_micents"),
        F.round("mn", 2).alias("min_price"),
        F.round("mx", 2).alias("max_price"),
    )


@query(
    "q95_price_histogram",
    oracle="""
    WITH bounds AS (
      SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem
    ), bucketed AS (
      SELECT CASE WHEN l_extendedprice >= hi THEN 20
                  ELSE CAST(floor((l_extendedprice - lo) / (hi - lo) * 20) AS INT) + 1
             END AS bucket,
             l_extendedprice, lo, hi
      FROM lineitem, bounds
    )
    SELECT CAST(bucket AS INT) AS bucket,
           round(min(lo) + (bucket - 1) * (min(hi) - min(lo)) / 20, 4) AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0, 4) AS sum_price
    FROM bucketed
    GROUP BY bucket
    """,
)
def q95_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bucket histogram over data-dependent bounds — the
    profiling primitive behind range-partition planning and skew
    detection.  Two passes: a min/max scan (2 scalars to the driver via
    a broadcast 1-row crossJoin — the scalar-subquery house pattern),
    then one bucketing pass + narrow count shuffle.  The bucket index
    uses the explicit floor((x-lo)/(hi-lo)*n) formula (SQL-standard
    width_bucket semantics, hi-edge folded into the top bucket) rather
    than each engine's builtin, so both engines compute bit-identical
    IEEE doubles — the same determinism trade as s08's quantizer."""
    li = _t(spark, sf_dir, "lineitem").select("l_extendedprice")
    bounds = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    x = F.col("l_extendedprice")
    bucket = (
        F.when(x >= F.col("hi"), F.lit(20))
        .otherwise(
            F.floor((x - F.col("lo")) / (F.col("hi") - F.col("lo")) * 20).cast("int") + 1
        )
        .cast("int")
    )
    return (
        li.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), "l_extendedprice", "lo", "hi")
        .groupBy("bucket")
        .agg(
            F.round(F.min("lo") + (F.col("bucket") - 1) * (F.min("hi") - F.min("lo")) / 20, 4).alias(
                "bucket_lo"
            ),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")) / 100.0, 4
            ).alias("sum_price"),
        )
    )


@query(
    "q93_xml_source_join",
    oracle="""
    SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
           round(sum(s.s_acctbal), 4) AS sum_acctbal
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
    """,
)
def q93_xml_source_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML-source dimension join: the supplier dim round-trips through
    Spark 4's built-in XML reader (explicit schema, no inference scan)
    and joins the parquet nation dim — the sidecar-export shape q78
    covers for csv/json, extended to the remaining built-in text
    format.  Rewritten per run into /tmp (dim-sized, trivial); the
    oracle reads the original parquet, so the XML writer+reader
    round-trip itself is what's value-checked."""
    import os
    import tempfile

    from mapreducehs_spark.sources.catalog import read_any

    tag = os.path.basename(os.path.normpath(sf_dir))
    base = os.path.join(tempfile.gettempdir(), f"mapreducehs_xml_{tag}")
    sup = _t(spark, sf_dir, "supplier")
    sup.write.format("xml").option("rootTag", "suppliers").option("rowTag", "supplier").mode(
        "overwrite"
    ).save(base)
    sup2 = read_any(
        spark,
        base,
        fmt="xml",
        schema="s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
        rowTag="supplier",
    )
    nat = _t(spark, sf_dir, "nation")
    return (
        sup2.join(F.broadcast(nat), nat["n_nationkey"] == sup2["s_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 4).alias("sum_acctbal"),
        )
    )


@query(
    "st11_stream_chained_windows",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS h,
             count(*) AS n,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      FROM events
      GROUP BY 1, 2
    )
    SELECT CAST(floor(h / 21600) * 21600 AS BIGINT) AS bucket_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(max(n) AS BIGINT) AS max_hourly_events,
           round(sum(cents) / 100.0, 4) AS sum_value
    FROM hourly
    GROUP BY 1, 2
    """,
)
def st11_stream_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED streaming stateful operators (Spark 3.4+): hourly
    tumbling aggregate re-windowed into 6-hour buckets inside ONE
    streaming query (streaming/ops.chained_window_aggregate) — the
    hierarchical-rollup topology (minute→hour→day) without an
    intermediate sink.  The watermark propagates through the first
    aggregate, so outer windows close exactly when their last inner
    window is final; batch replay over the same events is the oracle."""
    from mapreducehs_spark import streaming as st

    agg = st.chained_window_aggregate(
        _replayed_events(spark, sf_dir), inner="1 hour", outer="6 hours",
        watermark="30 minutes",
    )
    out = st.run_to_batch(agg, "st11_sink", output_mode="append")
    return out.filter(F.col("event_type") != "__flush__")


@query(
    "m07_audio_decode_stats",
    oracle="""
    WITH samples AS (
      SELECT doc_id, ((doc_id * 13 + i * 17) % 4096) - 2048 AS s
      FROM documents, LATERAL unnest(range(0, 256)) AS t(i)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(sum(s) AS BIGINT) AS amp_sum,
           CAST(sum(s * s) AS BIGINT) AS sq_sum,
           CAST(min(s) AS BIGINT) AS amp_min,
           CAST(max(s) AS BIGINT) AS amp_max
    FROM samples
    GROUP BY doc_id
    """,
)
def m07_audio_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode inside the checked inventory (the WAV twin of
    m06's PGM): every doc gets a synthetic 256-sample 16-bit PCM WAV
    (sample law ((id*13 + 17i) mod 4096) - 2048,
    operators/multimodal.render_wav_payloads), and a second Arrow stage
    parses the actual RIFF bytes — magic check, chunk walk, int16
    frame decode (multimodal.decode_wav, pure numpy+struct) — reducing
    to exact integer stats.  The arithmetic sample law lets DuckDB
    replay the stats without decoding, so the encode→decode round trip
    itself is value-checked; stats stay integer (amp/square sums) so
    the check is bit-exact.  Codec-dependent formats (mp3/flac) remain
    env-gated stubs; this pins the real binary-parsing path."""
    from mapreducehs_spark.operators.multimodal import (
        decoded_audio_stats,
        render_wav_payloads,
    )

    docs = _t(spark, sf_dir, "documents")
    payloads = render_wav_payloads(docs, "doc_id", n_samples=256, sample_rate=8000)
    return decoded_audio_stats(payloads).withColumnRenamed("id", "doc_id")


def _q96_oracle(iters: int = 3, damp_num: int = 85, damp_den: int = 100) -> str:
    """Unrolled integer PageRank replay: micro-unit bigint ranks, each
    edge contribution (r*85) // (100*outdeg) — integer ops only, so
    partial-sum order can't drift and the whole iteration is
    engine-exact."""
    head = """
    WITH edges0 AS (
      SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), edges AS (
      SELECT src, dst FROM edges0
      UNION ALL
      SELECT dst AS src, src AS dst FROM edges0
    ), deg AS (
      SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY 1
    ), n AS (
      SELECT count(*) AS n_nodes FROM deg
    ), r0 AS (
      SELECT node, outdeg, CAST(1000000000000 // n_nodes AS BIGINT) AS r
      FROM deg, n
    )"""
    body = []
    for i in range(1, iters + 1):
        prev = f"r{i - 1}"
        body.append(f"""
    , r{i} AS (
      SELECT d.node, d.outdeg,
             CAST((SELECT 150000000000 // n_nodes FROM n)
                  + coalesce(sum((p.r * {damp_num}) // ({damp_den} * p.outdeg)), 0)
                  AS BIGINT) AS r
      FROM deg d
      LEFT JOIN edges e ON e.dst = d.node
      LEFT JOIN {prev} p ON p.node = e.src
      GROUP BY d.node, d.outdeg
    )""")
    tail = f"""
    SELECT node, CAST(node % 2 AS BIGINT) AS is_supplier, r AS rank_micro
    FROM r{iters}
    ORDER BY r DESC, node ASC
    LIMIT 25
    """
    return head + "".join(body) + tail


def _symmetrized_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared adjacency build for the trade-graph family (q96 PageRank,
    q108 BFS): distinct customer↔supplier pairs, symmetrized, persisted
    hash-partitioned on ``src`` so iterative joins reuse the layout.

    ONE exchange total: the raw (non-distinct) joined pairs symmetrize
    first (the orders side broadcasts — no shuffle), repartition on
    ``src``, and dedup IN PARTITION — ``HashPartitioning(src)``
    satisfies ``ClusteredDistribution(src, dst)`` (equal (src, dst)
    rows are co-located), so the dropDuplicates aggregate plans WITHOUT
    its own exchange and the output keeps the src partitioning the
    iterations need.  The previous form (distinct → symmetrize →
    repartition) paid an extra full exchange for the distinct
    (measured same-session at sf0.1: q96 median 3.02 s → 2.41 s).
    Caller owns the persist handle (unpersist in finally).
    """
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    traded = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    return (
        traded.unionByName(traded.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition("src")
        .dropDuplicates(["src", "dst"])
        .persist()
    )


@query("q96_pagerank", oracle=_q96_oracle())
def q96_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank — the canonical iterative MapReduce workload (the
    algorithm family the reference's multi-stage pipeline chaining
    exists for; reference src/Core/MapReduceC.hs `(:>)`) — over the
    customer↔supplier transaction graph (distinct trade pairs,
    symmetrized so every node has outdegree ≥ 1 and no dangling mass).
    Three iterations of: contribution = damped rank split over
    out-edges, shuffled BY DESTINATION (the narrow (dst, contrib)
    pairs shuffle, never the adjacency), then base + sum.

    Arithmetic is INTEGER fixed-point: micro-unit bigint ranks, each
    contribution (r*85)//(100*outdeg) — associative/commutative exact
    sums, so the iterative loop value-checks bit-for-bit against the
    unrolled oracle regardless of partial-agg order (the q83 trick
    applied to an iterative algorithm).  At 100 TB the per-iteration
    cost is one shuffle of edge-count rows keyed on dst; ranks and
    degrees stay co-partitioned on node across iterations."""
    # adjacency persisted HASH-PARTITIONED on the join key: every
    # iteration's rank⋈edges join then reuses the layout and only the
    # node-sized rank frame shuffles — without this the 2|E| frame
    # re-exchanged once per iteration (measured ~30% of the query).
    # Build shared with q108 (single-exchange dedup-in-partition form).
    edges = _symmetrized_trade_edges(spark, sf_dir)
    try:
        deg = (
            edges.groupBy("src")
            .agg(F.count(F.lit(1)).alias("outdeg"))
            .withColumnRenamed("src", "node")
            .persist()  # node-sized; read by every iteration + the seed
        )
        n_nodes = deg.count()  # one scalar to the driver (model-sized state)
        base = 150_000_000_000 // n_nodes
        ranks = deg.select("node", "outdeg", F.lit(1_000_000_000_000 // n_nodes).alias("r"))
        for _ in range(3):
            contrib = (
                ranks.join(edges, ranks["node"] == edges["src"])
                .select(
                    F.col("dst").alias("node"),
                    # `div`, not `/`: Spark's / on bigints is DOUBLE
                    # division — rounding before the cast would break
                    # the exact fixed-point contract the oracle replays
                    F.expr("(r * 85L) div (100L * outdeg)").alias("c"),
                )
            )
            summed = contrib.groupBy("node").agg(F.sum("c").alias("in_mass"))
            ranks = (
                deg.join(summed, "node", "left")
                .select(
                    "node",
                    "outdeg",
                    (F.lit(base) + F.coalesce(F.col("in_mass"), F.lit(0))).alias("r"),
                )
            )
        return (
            ranks.orderBy(F.col("r").desc(), F.col("node").asc())
            .limit(25)
            .select(
                "node",
                (F.col("node") % 2).cast("bigint").alias("is_supplier"),
                F.col("r").alias("rank_micro"),
            )
            .localCheckpoint()
        )
    finally:
        edges.unpersist(blocking=False)
        deg.unpersist(blocking=False)


@query(
    "d17_sorted_neighborhood",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_sort(list_distinct(
               list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))) AS dt
      FROM documents
    ), keyed AS (
      SELECT doc_id, array_to_string(dt[1:3], '|') AS snm_key, dt FROM toks
    ), pos AS (
      SELECT doc_id, dt,
             row_number() OVER (ORDER BY snm_key ASC, doc_id ASC) AS pos
      FROM keyed
    ), cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.dt, b.dt)) AS inter,
             len(a.dt) AS na, len(b.dt) AS nb
      FROM pos a JOIN pos b ON b.pos - a.pos BETWEEN 1 AND 3
    )
    SELECT id_a, id_b,
           round(inter / CAST(na + nb - inter AS DOUBLE), 6) AS jaccard
    FROM cand
    WHERE na + nb <= 3 * inter
    """,
)
def d17_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood near-dedup (Hernández-Stolfo SNM) — the
    third blocking paradigm after hash-banding (d03/d11) and
    length-banding (d14): sort the corpus on a cluster-prone key (the
    3 lexicographically-smallest distinct tokens) and compare each doc
    only to its W=3 successors.  Candidate generation is a distributed
    RANGE SORT plus W narrow self-equi-joins on position — O(W·n)
    pairs total, never all-pairs, and no hash randomness, so unlike
    LSH the WHOLE operator (key, ordering, window, verification) is
    value-checked.  Positions come from sampling.global_positions_cached
    (range-repartition + offsets — q89's machinery), not a single-task
    global window; the narrow (doc_id, pos) frame is checkpointed once
    so BOTH sides of the W-offset self-join read the same materialized
    positions and the full-width sorted cache is freed immediately; the
    duplicate-jaccard filter is the integer-exact form
    (na+nb ≤ 3·inter ⟺ J ≥ 0.5), so no float boundary exists."""
    from mapreducehs_spark.operators.sampling import global_positions_cached

    docs = _t(spark, sf_dir, "documents")
    # Tokenized once: the distinct-token frame feeds the key projection
    # AND both verify sides, and without a barrier the regex tokenize +
    # array_sort(array_distinct(...)) chain re-runs per reference
    # (measured: 2 extra corpus scans for ta/tb).
    toks = docs.select(
        "doc_id",
        F.array_sort(F.array_distinct(text.tokens("text"))).alias("dt"),
    ).localCheckpoint()
    keyed = toks.select(
        "doc_id",
        F.concat_ws("|", F.slice("dt", 1, 3)).alias("snm_key"),
        F.size("dt").alias("n_dt"),
    )
    ranked, cache = global_positions_cached(keyed, ["snm_key", "doc_id"])
    try:
        pos = ranked.select("doc_id", "pos").localCheckpoint()
    finally:
        cache.unpersist(blocking=False)
    a = pos.select(F.col("doc_id").alias("id_a"), F.col("pos").alias("pos_a"))
    b = pos.select(F.col("doc_id").alias("id_b"), F.col("pos").alias("pos_b"))
    offsets = spark.range(1, 4).select(F.col("id").alias("off"))
    cand = (
        a.crossJoin(F.broadcast(offsets))
        .withColumn("pos_b", F.col("pos_a") + F.col("off"))
        .join(b, "pos_b")
        .select("id_a", "id_b")
    )
    ta = toks.select(F.col("doc_id").alias("id_a"), F.col("dt").alias("da"))
    tb = toks.select(F.col("doc_id").alias("id_b"), F.col("dt").alias("db"))
    verified = (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("da", "db")).alias("inter"),
            F.size("da").alias("na"),
            F.size("db").alias("nb"),
        )
        .filter(F.col("na") + F.col("nb") <= 3 * F.col("inter"))
    )
    return verified.select(
        "id_a",
        "id_b",
        F.round(
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"), 6
        ).alias("jaccard"),
    )


@query(
    "q97_excess_volume_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey, sum(l_quantity) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'ECONOMY'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey
    ), threshold AS (
      SELECT sum(qty) * 1.2 / (SELECT count(*) FROM supplier) AS thr FROM shipped
    )
    SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM shipped, threshold WHERE qty > thr)
    """,
)
def q97_excess_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN with an aggregate HAVING against a
    global scalar subquery — suppliers who shipped more than 1.2× the
    per-supplier average of ECONOMY-part volume in 1996.  Catalyst
    decorrelates to: one filtered fact aggregation (filters + part dim
    broadcast pushed to the scan), a 1-row threshold broadcast back
    over it, and a LEFT-SEMI join into the supplier dim — no correlated
    re-probe anywhere.  Quantities are integral doubles, so the sums are exact and the 1.2×/N threshold, while inexact in binary,
    is the identical IEEE expression in both engines."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    sup = _t(spark, sf_dir, "supplier")
    shipped = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    n_sup = sup.agg(F.count(F.lit(1)).alias("n_sup"))
    thr = shipped.agg(F.sum("qty").alias("tot")).crossJoin(F.broadcast(n_sup)).select(
        (F.col("tot") * 1.2 / F.col("n_sup")).alias("thr")
    )
    excess = shipped.crossJoin(F.broadcast(thr)).filter(F.col("qty") > F.col("thr"))
    return sup.join(
        excess.select(F.col("l_suppkey").alias("s_suppkey")), "s_suppkey", "left_semi"
    ).select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))


@query(
    "d18_prefix_filter_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
      FROM documents
    ), pos AS (
      SELECT doc_id, t, unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS i
      FROM toks
    ), sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
      FROM pos
    ), sized AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
    ), dfw AS (
      SELECT doc_id, shingle,
             count(*) OVER (PARTITION BY shingle) AS df
      FROM sh
    ), pref AS (
      SELECT doc_id, shingle FROM (
        SELECT d.doc_id, d.shingle, z.n,
               row_number() OVER (PARTITION BY d.doc_id
                                  ORDER BY d.df ASC, d.shingle ASC) AS rr
        FROM dfw d JOIN sized z USING (doc_id)
      ) WHERE rr <= n - (n + 1) // 2 + 1
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM pref a JOIN pref b USING (shingle)
      WHERE a.doc_id < b.doc_id
    ), inter AS (
      SELECT c.id_a, c.id_b, count(*) AS inter
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_a
      JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(inter / CAST(sa.n + sb.n - inter AS DOUBLE), 6) AS jaccard
    FROM inter
    JOIN sized sa ON sa.doc_id = id_a
    JOIN sized sb ON sb.doc_id = id_b
    WHERE sa.n + sb.n <= 3 * inter
    """,
)
def d18_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtering set-similarity join (Chaudhuri SSJoin /
    Bayardo AllPairs) — the FOURTH candidate-generation paradigm in the
    dedup suite after hash-banding (d03/d11), length-banding (d14) and
    sorted-neighborhood (d17), on d02's 3-gram shingle sets at Jaccard
    >= 0.5, and like d17 fully deterministic (no hash randomness), so
    the ENTIRE operator is value-checked.  Principle: rank the shingle
    vocabulary by ascending document frequency (rarest first) and index
    only each document's first ``|S| - ceil(0.5*|S|) + 1`` shingles in
    that order; two sets with J >= 0.5 MUST share an indexed prefix
    shingle, so candidates come from an equi-join on RARE shingles only
    — the stop-shingles that make the naive token-join quadratic (and
    skewed) never enter the index.  At scale: the vocabulary rank is a
    scalable distributed sort (sampling.global_positions — shingle
    vocabulary is corpus-sized, NOT broadcast), the prefix index halves
    the posting list, and the candidate join is skew-free by
    construction (rare shingles have short postings).  Verification is
    an exact intersection count on candidates only (na+nb <= 3*inter
    <=> J >= 0.5); never all-pairs."""
    docs = _t(spark, sf_dir, "documents")
    # three plan subtrees (prefix index, both verify sides) read the
    # shingle ARRAYS — persist the doc-count-sized array frame so
    # tokenize+shingle runs once, unpersisted after the checkpointed
    # result materializes (d13 discipline)
    shf = dedup.shingle_frame(docs, "text", "doc_id", 3).persist()
    rows = shf.select(
        F.col("id").alias("doc_id"),
        F.size("sh").alias("n"),
        F.explode_outer("sh").alias("shingle"),
    ).filter(F.col("shingle").isNotNull())
    # document frequency as a window over the shingle partitioning, and
    # the prefix rank as a window over the doc partitioning ordered by
    # (df, shingle) — same selection as a global df-rank join, minus the
    # vocabulary sort and its join (two shuffles total, both corpus-wide
    # but narrow)
    wf = Window.partitionBy("shingle")
    wd = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("shingle").asc())
    pref = (
        rows.withColumn("df", F.count(F.lit(1)).over(wf))
        .withColumn("rr", F.row_number().over(wd))
        .filter(F.col("rr") <= F.expr("n - (n + 1) div 2 + 1"))
        .select("doc_id", "shingle")
    )
    a = pref.select(F.col("doc_id").alias("id_a"), "shingle")
    b = pref.select(F.col("doc_id").alias("id_b"), "shingle")
    cand = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # verify on the candidate pairs only, intersecting the shingle
    # ARRAYS in-place (array_intersect is a codegen'd set intersection
    # over the two ~100-element arrays) — two narrow id-keyed joins
    # replace the explode-join + groupBy count of the postings
    # formulation: no shingle-row shuffle, no pair-count aggregation
    sa = shf.select(
        F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), F.size("sh").alias("na")
    )
    sb = shf.select(
        F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), F.size("sh").alias("nb")
    )
    try:
        return (
            cand.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
            .filter(F.col("na") + F.col("nb") <= 3 * F.col("inter"))
            .select(
                "id_a",
                "id_b",
                F.round(
                    F.col("inter")
                    / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
                    6,
                ).alias("jaccard"),
            )
            .localCheckpoint()
        )
    finally:
        shf.unpersist(blocking=False)


@query(
    "q98_kmv_distinct",
    oracle="""
    WITH du AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), h AS (
      SELECT event_type, user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 14))::BIGINT AS hv
      FROM du
    ), topk AS (
      SELECT * FROM (
        SELECT event_type, user_id, hv,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY hv ASC, user_id ASC) AS rr
        FROM h
      ) WHERE rr <= 8
    ), kmv AS (
      SELECT event_type, CAST(504403158265495552 // max(hv) AS BIGINT) AS kmv_est
      FROM topk GROUP BY event_type HAVING count(*) = 8
    ), exact AS (
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY event_type
    ), per_type AS (
      SELECT e.event_type, n_exact, kmv_est FROM exact e JOIN kmv USING (event_type)
    ), m8 AS (
      SELECT hv FROM (SELECT DISTINCT user_id, hv FROM topk)
      ORDER BY hv ASC LIMIT 8
    ), g AS (
      SELECT '__all__' AS event_type,
             (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events) AS n_exact,
             CAST(504403158265495552 // max(hv) AS BIGINT) AS kmv_est
      FROM m8 HAVING count(*) = 8
    )
    SELECT * FROM per_type UNION ALL SELECT * FROM g
    """,
)
def q98_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch, VALUE-CHECKED —
    the mergeable-sketch family's (q34 HLL, q41 t-digest, q53 KLL, q71
    Misra-Gries) only member whose estimate both engines reproduce
    bit-for-bit, because the "randomness" is the md5-fold draw (d11
    discipline) and the estimator (k-1)*2^56 div h_k is integer
    arithmetic.  Per event_type: the 8 smallest distinct user-hashes
    (row_number <= k lowers to a per-partition WindowGroupLimit top-k
    BEFORE the shuffle — bounded state, the 100 TB path) with estimate
    (k-1)/h_k normalized.  The '__all__' row then demonstrates the
    property that makes KMV a sketch at all: MERGING the five per-group
    sketches (k smallest of their union) estimates the global distinct
    count without touching the raw data again — exactly how a
    1000-executor rollup combines per-shard sketches.  Exact distinct
    counts ride along as n_exact for accuracy reading."""
    K = 8
    est = F.expr(f"{(K - 1) * (1 << 56)}L div h_k").alias("kmv_est")
    ev = _t(spark, sf_dir, "events")
    du = ev.select("event_type", "user_id").distinct()
    h = du.select(
        "event_type",
        "user_id",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 14), 16, 10)
        .cast("bigint")
        .alias("hv"),
    )
    w = Window.partitionBy("event_type").orderBy(F.col("hv").asc(), F.col("user_id").asc())
    topk = h.withColumn("rr", F.row_number().over(w)).filter(F.col("rr") <= K)
    kmv = (
        topk.groupBy("event_type")
        .agg(F.max("hv").alias("h_k"), F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") == K)
        .select("event_type", est)
    )
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_exact"))
    per_type = exact.join(kmv, "event_type").select("event_type", "n_exact", "kmv_est")
    merged = (
        topk.select("user_id", "hv").distinct().orderBy(F.col("hv").asc()).limit(K)
    )
    g_est = (
        merged.agg(F.max("hv").alias("h_k"), F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") == K)
        .select(F.lit("__all__").alias("event_type"), est)
    )
    g_exact = ev.agg(F.countDistinct("user_id").alias("n_exact")).select(
        F.lit("__all__").alias("event_type"), "n_exact"
    )
    g = g_exact.join(g_est, "event_type").select("event_type", "n_exact", "kmv_est")
    return per_type.unionByName(g)


@query(
    "q99_linear_interp",
    oracle="""
    WITH base AS (
      SELECT user_id, event_id, epoch_us(ts) // 1000000 AS t,
             CASE WHEN event_type != 'error'
                  THEN CAST(round(value * 1000000, 0) AS BIGINT) END AS vm
      FROM events
    ), g AS (
      SELECT user_id, vm, t,
        last_value(vm IGNORE NULLS) OVER w_prev AS pv,
        last_value(CASE WHEN vm IS NOT NULL THEN t END IGNORE NULLS) OVER w_prev AS pt,
        first_value(vm IGNORE NULLS) OVER w_next AS nv,
        first_value(CASE WHEN vm IS NOT NULL THEN t END IGNORE NULLS) OVER w_next AS nt
      FROM base
      WINDOW
        w_prev AS (PARTITION BY user_id ORDER BY t ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        w_next AS (PARTITION BY user_id ORDER BY t ASC, event_id ASC
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_err,
           CAST(sum(CASE WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_interp,
           CAST(sum(CASE WHEN pv IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_lead,
           CAST(sum(CASE WHEN nv IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_trail,
           CAST(sum(CASE WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                 CASE WHEN nt = pt THEN pv
                      ELSE (pv * (nt - t) + nv * (t - pt)) // (nt - pt) END
               END) AS BIGINT) AS sum_interp_micro
    FROM g
    WHERE vm IS NULL
    GROUP BY user_id
    """,
)
def q99_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill — the time-weighted twin of q77's
    LOCF: each error event's missing reading is reconstructed from the
    user's previous and next good readings, weighted by time distance.
    Two unbounded ROWS frames over ONE partitioning (user_id) carry the
    four running values (prev/next reading + its timestamp) — a single
    shuffle, bounded per-key state, same cost profile as LOCF.  The
    interpolation itself is exact integer fixed point (micro-units x
    epoch-seconds, truncating div; both products < 2^55, and Spark
    `div` and DuckDB `//` both truncate toward zero), so no float
    quotient ever reaches the output — the q94 determinism recipe.
    Boundary gaps (no prior / no following observation) are counted,
    not invented."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        F.expr("unix_micros(ts) div 1000000").alias("t"),
        F.when(
            F.col("event_type") != "error",
            F.round(F.col("value") * 1e6, 0).cast("bigint"),
        ).alias("vm"),
    )
    order = [F.col("t").asc(), F.col("event_id").asc()]
    wp = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    t_obs = F.when(F.col("vm").isNotNull(), F.col("t"))
    g = base.select(
        "user_id",
        "vm",
        "t",
        F.last("vm", ignorenulls=True).over(wp).alias("pv"),
        F.last(t_obs, ignorenulls=True).over(wp).alias("pt"),
        F.first("vm", ignorenulls=True).over(wn).alias("nv"),
        F.first(t_obs, ignorenulls=True).over(wn).alias("nt"),
    )
    both = F.col("pv").isNotNull() & F.col("nv").isNotNull()
    interp = F.when(F.col("nt") == F.col("pt"), F.col("pv")).otherwise(
        F.expr("(pv * (nt - t) + nv * (t - pt)) div (nt - pt)")
    )
    return (
        g.filter(F.col("vm").isNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_err"),
            F.sum(F.when(both, 1).otherwise(0)).alias("n_interp"),
            F.sum(F.when(F.col("pv").isNull(), 1).otherwise(0)).alias("n_lead"),
            F.sum(F.when(F.col("nv").isNull(), 1).otherwise(0)).alias("n_trail"),
            F.sum(F.when(both, interp)).alias("sum_interp_micro"),
        )
    )


@query(
    "q100_triangle_count",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(
               list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))) AS tok
      FROM documents
    ), dfreq AS (
      SELECT tok, count(*) AS df FROM toks GROUP BY tok
    ), top AS (
      SELECT tok FROM dfreq ORDER BY df DESC, tok ASC LIMIT 64
    ), sel AS (
      SELECT doc_id, tok FROM toks WHERE tok IN (SELECT tok FROM top)
    ), co AS (
      SELECT x.tok AS u, y.tok AS v, count(*) AS c
      FROM sel x JOIN sel y ON x.doc_id = y.doc_id AND x.tok < y.tok
      GROUP BY x.tok, y.tok
    ), nd AS (
      SELECT count(*) AS n_docs FROM documents
    ), edges AS (
      SELECT u, v FROM co, nd WHERE c * 4 >= n_docs
    ), deg AS (
      SELECT node, count(*) AS d FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
      ) GROUP BY node
    ), oriented AS (
      SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS a,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS b
      FROM edges e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
    ), tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM oriented e1
      JOIN oriented e2 ON e2.a = e1.b
      WHERE EXISTS (SELECT 1 FROM oriented e3 WHERE e3.a = e1.a AND e3.b = e2.b)
    ), per_node AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
        SELECT x AS node FROM tri UNION ALL
        SELECT y AS node FROM tri UNION ALL
        SELECT z AS node FROM tri
      ) GROUP BY node
    )
    SELECT node, n_tri FROM per_node ORDER BY n_tri DESC, node ASC LIMIT 10
    """,
)
def q100_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-oriented triangle counting — the third graph-analytics
    member after connected components (d06) and PageRank (q96), on the
    token co-occurrence graph (top-64 tokens by document frequency;
    edge iff the pair co-occurs in >= 25%% of documents — a scale-free
    integer threshold).  The algorithm is the distributed-standard
    degree orientation (Suri-Vassilvitskii "Counting Triangles and the
    Curse of the Last Reducer"): orient every edge from its lower-
    (degree, id) endpoint to the higher, so each triangle is counted
    exactly once and — the scale point — the join fan-out per node is
    bounded by its OUT-degree, which orientation caps at O(sqrt(|E|))
    even for power-law hubs; the wedge self-join then left-semi-probes
    the oriented edge list.  All co-occurrence counting is equi-join +
    hash-agg on doc_id; the quadratic explosion per document is bounded
    by the 64-token vocabulary filter (broadcast)."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode_outer(F.array_distinct(text.tokens("text"))).alias("tok")
    ).filter(F.col("tok").isNotNull())
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    top = dfreq.orderBy(F.col("df").desc(), F.col("tok").asc()).limit(64).select("tok")
    sel = toks.join(F.broadcast(top), "tok")
    x = sel.select("doc_id", F.col("tok").alias("u"))
    y = sel.select("doc_id", F.col("tok").alias("v"))
    co = (
        x.join(y, "doc_id")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    edges = co.crossJoin(F.broadcast(nd)).filter(F.col("c") * 4 >= F.col("n_docs"))
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
    )
    e1 = oriented.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = oriented.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y")
    tri = wedges.join(
        oriented.select(F.col("a").alias("x"), F.col("b").alias("z")),
        ["x", "z"],
        "left_semi",
    )
    per_node = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return per_node.orderBy(F.col("n_tri").desc(), F.col("node").asc()).limit(10)


@query(
    "t20_data_profile",
    oracle="""
    WITH a AS (
      SELECT count(*) AS n,
             count(o_orderkey) AS c1, count(DISTINCT o_orderkey) AS d1,
             min(o_orderkey) AS mn1, max(o_orderkey) AS mx1,
             count(o_custkey) AS c2, count(DISTINCT o_custkey) AS d2,
             min(o_custkey) AS mn2, max(o_custkey) AS mx2,
             count(o_totalprice) AS c3, count(DISTINCT o_totalprice) AS d3,
             min(o_totalprice) AS mn3, max(o_totalprice) AS mx3,
             count(o_orderstatus) AS c4, count(DISTINCT o_orderstatus) AS d4,
             min(o_orderstatus) AS mn4, max(o_orderstatus) AS mx4,
             count(o_orderpriority) AS c5, count(DISTINCT o_orderpriority) AS d5,
             min(o_orderpriority) AS mn5, max(o_orderpriority) AS mx5,
             count(o_orderdate) AS c6, count(DISTINCT o_orderdate) AS d6,
             strftime(min(o_orderdate), '%Y-%m-%d') AS mn6,
             strftime(max(o_orderdate), '%Y-%m-%d') AS mx6
      FROM orders
    )
    SELECT 'o_orderkey' AS col_name, CAST(n - c1 AS BIGINT) AS n_null,
           CAST(d1 AS BIGINT) AS n_distinct, CAST(mn1 AS DOUBLE) AS min_num,
           CAST(mx1 AS DOUBLE) AS max_num, CAST(NULL AS VARCHAR) AS min_str,
           CAST(NULL AS VARCHAR) AS max_str FROM a
    UNION ALL
    SELECT 'o_custkey', CAST(n - c2 AS BIGINT), CAST(d2 AS BIGINT),
           CAST(mn2 AS DOUBLE), CAST(mx2 AS DOUBLE), NULL, NULL FROM a
    UNION ALL
    SELECT 'o_totalprice', CAST(n - c3 AS BIGINT), CAST(d3 AS BIGINT),
           mn3, mx3, NULL, NULL FROM a
    UNION ALL
    SELECT 'o_orderstatus', CAST(n - c4 AS BIGINT), CAST(d4 AS BIGINT),
           NULL, NULL, mn4, mx4 FROM a
    UNION ALL
    SELECT 'o_orderpriority', CAST(n - c5 AS BIGINT), CAST(d5 AS BIGINT),
           NULL, NULL, mn5, mx5 FROM a
    UNION ALL
    SELECT 'o_orderdate', CAST(n - c6 AS BIGINT), CAST(d6 AS BIGINT),
           NULL, NULL, mn6, mx6 FROM a
    """,
)
def t20_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-quality profile (the ingestion-gate op every
    training pipeline runs before accepting a drop): per-column null
    count, exact distinct count, and min/max — computed in two
    column-pruned passes over the table (never per-column rescans — at
    100 TB a 6-column profile costing 6 scans is the difference between
    minutes and hours): a hash-shaped multi-count-distinct (one Expand,
    q08's plan) and a shuffle-free min/max pass, split so immutable
    string min/max buffers cannot demote the Expand to a SortAggregate
    (measured 4x).  The 1-row results crossJoin and reshape long with
    stack().  Numerics profile into min_num/max_num, strings and
    dates into min_str/max_str (dates formatted, never raw timestamps
    — oracle discipline)."""
    o = _t(spark, sf_dir, "orders")
    # Two single-row aggregates, crossJoined: string-typed min/max
    # buffers are immutable, so fusing them with the multi-distinct
    # Expand forces the WHOLE pass into a SortAggregate over 7x-expanded
    # rows (measured 4x slower at sf0.1).  Split, the distinct pass
    # stays a hash aggregate (strings appear only as grouping keys) and
    # the min/max pass has no Expand and no grouping — both linear,
    # both shuffle-free until their 1-row partials merge.
    dist = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderkey").alias("c1"),
        F.countDistinct("o_orderkey").alias("d1"),
        F.count("o_custkey").alias("c2"),
        F.countDistinct("o_custkey").alias("d2"),
        F.count("o_totalprice").alias("c3"),
        F.countDistinct("o_totalprice").alias("d3"),
        F.count("o_orderstatus").alias("c4"),
        F.countDistinct("o_orderstatus").alias("d4"),
        F.count("o_orderpriority").alias("c5"),
        F.countDistinct("o_orderpriority").alias("d5"),
        F.count("o_orderdate").alias("c6"),
        F.countDistinct("o_orderdate").alias("d6"),
    )
    mm = o.agg(
        F.min("o_orderkey").alias("mn1"),
        F.max("o_orderkey").alias("mx1"),
        F.min("o_custkey").alias("mn2"),
        F.max("o_custkey").alias("mx2"),
        F.min("o_totalprice").alias("mn3"),
        F.max("o_totalprice").alias("mx3"),
        F.min("o_orderstatus").alias("mn4"),
        F.max("o_orderstatus").alias("mx4"),
        F.min("o_orderpriority").alias("mn5"),
        F.max("o_orderpriority").alias("mx5"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("mn6"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("mx6"),
    )
    a = dist.crossJoin(F.broadcast(mm))
    return a.select(
        F.expr(
            """
            stack(6,
              'o_orderkey',     n - c1, d1, CAST(mn1 AS DOUBLE), CAST(mx1 AS DOUBLE),
                                CAST(NULL AS STRING), CAST(NULL AS STRING),
              'o_custkey',      n - c2, d2, CAST(mn2 AS DOUBLE), CAST(mx2 AS DOUBLE),
                                CAST(NULL AS STRING), CAST(NULL AS STRING),
              'o_totalprice',   n - c3, d3, mn3, mx3,
                                CAST(NULL AS STRING), CAST(NULL AS STRING),
              'o_orderstatus',  n - c4, d4, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                                mn4, mx4,
              'o_orderpriority', n - c5, d5, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                                mn5, mx5,
              'o_orderdate',    n - c6, d6, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                                mn6, mx6
            ) AS (col_name, n_null, n_distinct, min_num, max_num, min_str, max_str)
            """
        )
    )


@query(
    "q101_association_rules",
    oracle="""
    WITH b AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n AS (
      SELECT count(DISTINCT l_orderkey) AS n_orders FROM b
    ), item AS (
      SELECT l_partkey, count(*) AS sup FROM b GROUP BY 1
    ), pair AS (
      SELECT a.l_partkey AS id_a, c.l_partkey AS id_b, count(*) AS sup_ab
      FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey
                       AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= 2
    )
    SELECT id_a, id_b, CAST(sup_ab AS BIGINT) AS sup_ab,
           CAST(sup_ab * 1000000 // ia.sup AS BIGINT) AS conf_micro,
           CAST(sup_ab * n_orders * 1000000 // (ia.sup * ib.sup) AS BIGINT) AS lift_micro
    FROM pair
    JOIN item ia ON ia.l_partkey = id_a
    JOIN item ib ON ib.l_partkey = id_b
    CROSS JOIN n
    ORDER BY sup_ab DESC, id_a ASC, id_b ASC
    LIMIT 20
    """,
)
def q101_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (frequent-itemset mining, the
    classic MapReduce-era workload): part pairs co-ordered in >= 2
    baskets, with confidence(a->b) and lift in exact integer micro
    fixed point (the q94/q96 determinism recipe — `div`, never a float
    quotient).  Scale shape: baskets self-join on l_orderkey only —
    fan-out per order is (items/order choose 2), a per-BASKET constant,
    never corpus-quadratic; pair support is one hash-agg shuffle keyed
    by the pair; item supports and the basket count broadcast back
    over the pair frame.  Top-20 by (support, pair) is a
    TakeOrderedAndProject — per-partition heaps, no global sort.  At
    petabyte row counts the lift numerator sup_ab*N*1e6 needs
    DECIMAL(38,0) widening; bigint holds to N ~ 1e9 baskets."""
    li = _t(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct()
    n = b.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    item = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("sup"))
    a = b.select("l_orderkey", F.col("l_partkey").alias("id_a"))
    c = b.select("l_orderkey", F.col("l_partkey").alias("id_b"))
    pair = (
        a.join(c, "l_orderkey")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("sup_ab"))
        .filter(F.col("sup_ab") >= 2)
    )
    ia = item.select(F.col("l_partkey").alias("id_a"), F.col("sup").alias("sup_a"))
    ib = item.select(F.col("l_partkey").alias("id_b"), F.col("sup").alias("sup_b"))
    rules = (
        pair.join(ia, "id_a")
        .join(ib, "id_b")
        .crossJoin(F.broadcast(n))
        .select(
            "id_a",
            "id_b",
            "sup_ab",
            F.expr("sup_ab * 1000000L div sup_a").alias("conf_micro"),
            F.expr("sup_ab * n_orders * 1000000L div (sup_a * sup_b)").alias("lift_micro"),
        )
    )
    return rules.orderBy(
        F.col("sup_ab").desc(), F.col("id_a").asc(), F.col("id_b").asc()
    ).limit(20)


@query(
    "q102_mad_outliers",
    oracle="""
    WITH o AS (
      SELECT o_orderpriority AS grp, o_orderkey,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders
    ), r AS (
      SELECT grp, o_orderkey, cents,
             row_number() OVER (PARTITION BY grp ORDER BY cents ASC, o_orderkey ASC) AS rn,
             count(*) OVER (PARTITION BY grp) AS n
      FROM o
    ), med AS (
      SELECT grp, cents AS med_cents FROM r WHERE rn = (n + 1) // 2
    ), dev AS (
      SELECT o.grp, o.o_orderkey, abs(o.cents - m.med_cents) AS d, m.med_cents
      FROM o JOIN med m ON m.grp = o.grp
    ), rd AS (
      SELECT grp, d, med_cents,
             row_number() OVER (PARTITION BY grp ORDER BY d ASC, o_orderkey ASC) AS rn,
             count(*) OVER (PARTITION BY grp) AS n
      FROM dev
    ), mad AS (
      SELECT grp, med_cents, d AS mad_cents FROM rd WHERE rn = (n + 1) // 2
    )
    SELECT v.grp, CAST(m.med_cents AS BIGINT) AS med_cents,
           CAST(m.mad_cents AS BIGINT) AS mad_cents,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN v.d > 3 * m.mad_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev v JOIN mad m ON m.grp = v.grp
    GROUP BY v.grp, m.med_cents, m.mad_cents
    """,
)
def q102_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by median/MAD — the data-quality
    anomaly gate that, unlike z-scores (q26's moments), a few extreme
    rows cannot poison.  Everything is exact integer cents: the
    "median" is the LOWER median selected by row_number = (n+1) div 2
    (a rank selection, not quantile interpolation — no float boundary
    can ever disagree between engines), the MAD is the lower median of
    absolute deviations, and the outlier test d > 3*MAD is integer
    compare.  Cost shape: two window passes over the SAME partitioning
    key (grp) plus group-local joins of one-row-per-group frames — two
    shuffles of the fact, both on the group key; the per-group medians
    broadcast back.  The holistic-aggregate caveat of q25 applies: at
    100 TB prefer the q41/q53 sketch contract; this is the exact tier."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    w1 = Window.partitionBy("grp").orderBy(F.col("cents").asc(), F.col("o_orderkey").asc())
    wg = Window.partitionBy("grp")
    r = o.select(
        "grp",
        "cents",
        F.row_number().over(w1).alias("rn"),
        F.count(F.lit(1)).over(wg).alias("n"),
    )
    med = r.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "grp", F.col("cents").alias("med_cents")
    )
    dev = o.join(F.broadcast(med), "grp").select(
        "grp", "o_orderkey", F.abs(F.col("cents") - F.col("med_cents")).alias("d")
    )
    w2 = Window.partitionBy("grp").orderBy(F.col("d").asc(), F.col("o_orderkey").asc())
    rd = dev.select(
        "grp",
        "d",
        F.row_number().over(w2).alias("rn"),
        F.count(F.lit(1)).over(wg).alias("n"),
    )
    mad = rd.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "grp", F.col("d").alias("mad_cents")
    )
    return (
        dev.join(F.broadcast(med), "grp")
        .join(F.broadcast(mad), "grp")
        .groupBy("grp", "med_cents", "mad_cents")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("d") > 3 * F.col("mad_cents"), 1).otherwise(0)).alias(
                "n_outliers"
            ),
        )
        .select("grp", "med_cents", "mad_cents", "n_orders", "n_outliers")
    )


@query(
    "t21_winnowing_fingerprints",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
      FROM documents
    ), pos AS (
      SELECT doc_id, t, unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS i
      FROM toks
    ), kg AS (
      SELECT doc_id, i,
             ('0x' || substr(md5(array_to_string(t[i:i+2], ' ')), 1, 12))::BIGINT AS h
      FROM pos
    ), wmin AS (
      SELECT doc_id,
             min(h) OVER (PARTITION BY doc_id ORDER BY i ASC
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      FROM kg
    ), fp AS (
      SELECT doc_id, count(DISTINCT fp) AS n_fp FROM wmin GROUP BY doc_id
    ), nk AS (
      SELECT doc_id, count(*) AS n_kgrams FROM kg GROUP BY doc_id
    )
    SELECT nk.doc_id, CAST(n_kgrams AS BIGINT) AS n_kgrams,
           CAST(n_fp AS BIGINT) AS n_fp,
           CAST(n_fp * 1000000 // n_kgrams AS BIGINT) AS density_micro
    FROM nk JOIN fp ON fp.doc_id = nk.doc_id
    """,
)
def t21_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer-Wilkerson-Aiken, the
    MOSS algorithm) — POSITIONAL rolling fingerprints, upgrading t05's
    whole-document md5: hash every token 3-gram (md5-fold, the d11
    engine-portable discipline), slide a w=4 window over the hash
    sequence and keep each window's minimum — guaranteeing any shared
    run of >= w+k-1 tokens between two documents shares a fingerprint,
    with only ~2/(w+1) of the k-gram hashes retained.  Everything is
    deterministic integer arithmetic, so unlike classic random-seed
    winnowing the selected fingerprints value-check bit-for-bit.
    Shape: ONE shuffle on doc_id feeds both the sliding-window min
    (ROWS frame) and the two per-doc aggregates; fingerprint density is
    the integer-micro quotient (q94 recipe).  The k-gram hash sequence
    is built once as a projection (array staged per the shingles_of
    HOF discipline), never re-evaluated in a filter."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", text.tokens("text").alias("t"))
    # Spark's sequence(1, 0) DESCENDS instead of returning empty, so
    # short documents are filtered up front (the oracle's range() is
    # empty for them — both engines drop docs with < 3 tokens)
    pos = (
        toks.filter(F.size("t") >= 3)
        .select(
            "doc_id",
            "t",
            F.explode_outer(F.sequence(F.lit(1), F.size("t") - 2)).alias("i"),
        )
        .filter(F.col("i").isNotNull())
    )
    kg = pos.select(
        "doc_id",
        "i",
        F.conv(
            F.substring(F.md5(F.concat_ws(" ", F.slice("t", F.col("i"), 3))), 1, 12),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy(F.col("i").asc())
        .rowsBetween(Window.currentRow, 3)
    )
    wmin = kg.select("doc_id", F.min("h").over(w).alias("fp"))
    fp = wmin.groupBy("doc_id").agg(F.countDistinct("fp").alias("n_fp"))
    nk = kg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_kgrams"))
    return (
        nk.join(fp, "doc_id")
        .select(
            "doc_id",
            "n_kgrams",
            "n_fp",
            F.expr("n_fp * 1000000L div n_kgrams").alias("density_micro"),
        )
    )


@query(
    "s09_gram_matrix",
    oracle="""
    WITH q AS (
      SELECT [CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS qv
      FROM embeddings
    )
    SELECT i.i AS i, j.j AS j,
           CAST(sum(qv[i.i] * qv[j.j]) AS BIGINT) AS g
    FROM q,
         LATERAL unnest(range(1, len(qv) + 1)) AS i(i),
         LATERAL unnest(range(1, len(qv) + 1)) AS j(j)
    WHERE j.j >= i.i
    GROUP BY 1, 2
    """,
)
def s09_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed integer Gram matrix Qᵀ·Q over the embedding corpus —
    the covariance/PCA/whitening primitive (similarity.gram_matrix).
    Each Arrow batch reduces to one dim×dim int64 matmul and ships only
    the 2 080-row upper triangle; the final hash-agg merges partials
    associatively (a tree-aggregate at 100 TB — shuffle volume is
    O(#batches·dim²), independent of corpus size).  Integer
    floor-quantization makes the sums order-free, so DuckDB replays the
    exact values by exploding index pairs — the oracle pays the O(n·dim²)
    pair explosion the Spark side's matmul avoids."""
    return similarity.gram_matrix(
        _t(spark, sf_dir, "embeddings"), vec_col="embedding", scale=1000
    )


@query(
    "q103_cohort_retention",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week
      FROM events
    ), first AS (
      SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id
    )
    SELECT f.cohort_week,
           ev.week - f.cohort_week AS weeks_since,
           count(DISTINCT ev.user_id) AS n_active
    FROM ev JOIN first f USING (user_id)
    GROUP BY 1, 2
    """,
)
def q103_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the product-analytics report behind
    every "week-N retention" chart: users are cohorted by their first
    active week, then each (cohort, weeks-since-cohort) cell counts the
    distinct users still active.  Shape: one user-keyed min-aggregate
    (far smaller than the fact), joined back on user_id so both sides
    shuffle-partition on the SAME key, then a two-phase
    count-distinct whose partial dedup happens map-side.  Weeks are
    integer epoch-week indexes (floor-of-floor composition is exact),
    so no timestamp representation ever reaches the output."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 604800).cast("bigint").alias("week"),
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("weeks_since"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
        .select("cohort_week", "weeks_since", "n_active")
    )


@query(
    "q104_table_diff",
    oracle="""
    WITH base AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders
    ), v1 AS (
      SELECT * FROM base WHERE o_orderkey % 101 != 0
    ), v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 97 = 0 THEN cents + 1 ELSE cents END AS cents
      FROM base WHERE o_orderkey % 103 != 0
    ), diff AS (
      SELECT CASE
               WHEN v1.o_orderkey IS NULL THEN 'added'
               WHEN v2.o_orderkey IS NULL THEN 'removed'
               WHEN v1.cents != v2.cents THEN 'changed'
               ELSE 'unchanged'
             END AS status,
             coalesce(v1.o_orderkey, v2.o_orderkey) AS key,
             coalesce(v2.cents, 0) - coalesce(v1.cents, 0) AS delta
      FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    )
    SELECT status,
           count(*) AS n_rows,
           CAST(sum(key) AS BIGINT) AS key_checksum,
           CAST(sum(delta) AS BIGINT) AS cents_delta
    FROM diff GROUP BY status
    """,
)
def q104_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-version reconciliation (the anti-entropy / snapshot-diff
    op behind data-quality gates and CDC backfills): two synthetic
    versions of ``orders`` — v2 deletes every 101st key, re-adds every
    103rd missing from v1, and bumps every 97th price by a cent — are
    FULL-OUTER joined on the key and every row classified
    added/removed/changed/unchanged in one pass.  Both sides are
    projections of the same scan, shuffle on the join key once, and
    only the 4-row summary (counts + integer checksums) leaves the
    executors — at 100 TB this is one co-partitioned SMJ, no second
    scan, no driver materialization."""
    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    v1 = base.filter(F.col("o_orderkey") % 101 != 0)
    v2 = base.filter(F.col("o_orderkey") % 103 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0, F.col("cents") + 1)
        .otherwise(F.col("cents"))
        .alias("cents"),
    )
    j = v1.alias("a").join(
        v2.alias("b"), F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer"
    )
    diff = j.select(
        F.when(F.col("a.o_orderkey").isNull(), "added")
        .when(F.col("b.o_orderkey").isNull(), "removed")
        .when(F.col("a.cents") != F.col("b.cents"), "changed")
        .otherwise("unchanged")
        .alias("status"),
        F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("key"),
        (
            F.coalesce(F.col("b.cents"), F.lit(0))
            - F.coalesce(F.col("a.cents"), F.lit(0))
        ).alias("delta"),
    )
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("key").alias("key_checksum"),
        F.sum("delta").alias("cents_delta"),
    )


@query(
    "q105_compaction_plan",
    oracle="""
    WITH files AS (
      SELECT o_orderkey // 40 AS file_id,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS bytes
      FROM orders GROUP BY 1
    ), planned AS (
      SELECT file_id, n_rows, bytes,
             CAST((sum(bytes) OVER (ORDER BY file_id ASC
                                    ROWS UNBOUNDED PRECEDING) - bytes)
                  // 2000000000 AS BIGINT) AS bin
      FROM files
    )
    SELECT bin,
           count(*) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS bin_bytes,
           min(file_id) AS first_file,
           max(file_id) AS last_file
    FROM planned GROUP BY bin
    """,
)
def q105_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file COMPACTION planning — the maintenance op every
    long-lived 100 TB table needs: a synthetic file manifest (40-key
    ranges of orders standing in for data files, byte sizes derived
    from the rows) is packed into ~20 MB rewrite bins by
    start-offset-of-running-total division, the streaming bin-packing
    that preserves key order so compaction never destroys clustering
    (operators/layout.py is the read side of the same contract).  The
    global running total orders by file_id in a single window pass —
    legitimate here and at scale because the input is the file
    MANIFEST (metadata, ~1 row per file), not the data; the plan
    output is what a rewrite job would fan back out over.  All sizes
    are integer sums, so both engines agree bit-for-bit."""
    files = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.expr("o_orderkey div 40").alias("file_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("bytes"),
        )
    )
    w = Window.orderBy(F.col("file_id").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    planned = files.select(
        "file_id",
        "n_rows",
        "bytes",
        F.expr("(sum(bytes) over (order by file_id asc rows unbounded preceding) - bytes) div 2000000000").alias("bin"),
    )
    return planned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("bin_bytes"),
        F.min("file_id").alias("first_file"),
        F.max("file_id").alias("last_file"),
    )


@query(
    "st12_stream_dedup_watermarked",
    oracle="""
    SELECT DISTINCT user_id, event_type
    FROM events
    """,
)
def st12_stream_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOUNDED-STATE streaming dedup via Spark 3.5+'s
    ``dropDuplicatesWithinWatermark`` (streaming/ops.
    stream_distinct_within_watermark) — the API st04's docstring points
    unbounded ingests at: state for a key is evicted once the watermark
    passes its event time + delay, so the state store holds the
    at-least-once redelivery horizon instead of every key ever seen.
    The replay span fits inside the delay, so the emitted set equals
    SELECT DISTINCT and the bounded-state operator is value-checked,
    not just smoke-tested."""
    from mapreducehs_spark import streaming as st

    deduped = st.stream_distinct_within_watermark(
        _replayed_events(spark, sf_dir), keys=["user_id", "event_type"]
    )
    return st.run_to_batch(deduped, "st12_sink", output_mode="append")


@query(
    "m08_image_resize_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id, (doc_id * 31 + i * 7) % 256 AS p
      FROM documents, unnest(range(0, 512)) AS u(i)
      WHERE (i // 32) % 2 = 0 AND (i % 32) % 2 = 0
    )
    SELECT doc_id,
           16::BIGINT AS width,
           8::BIGINT AS height,
           CAST(sum(p) AS BIGINT) AS px_sum,
           CAST(min(p) AS BIGINT) AS px_min,
           CAST(max(p) AS BIGINT) AS px_max
    FROM px GROUP BY doc_id
    """,
)
def m08_image_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image RESIZE on the decode path (the m-series template's
    third verb after decode and feature-extract): each synthetic 32x16
    PGM payload is decoded from bytes and nearest-neighbor downsampled
    2x2 by stride slicing (multimodal.resize_image — a zero-copy numpy
    view, no interpolation arithmetic), fused with decode in ONE Arrow
    stage so full-resolution rasters never leave the batch.  Stride
    sampling is bit-deterministic, so DuckDB value-checks the resized
    stats by replaying the pixel law on the sampled (even-row,
    even-col) grid — the resize kernel itself is what is checked."""
    from mapreducehs_spark.operators.multimodal import (
        render_pgm_payloads,
        resized_image_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    payloads = render_pgm_payloads(docs, "doc_id", width=32, height=16)
    return resized_image_stats(payloads).withColumnRenamed("id", "doc_id")


@query(
    "d19_duplicate_spans",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
      FROM documents
    ), pos AS (
      SELECT doc_id, t, unnest(range(1, greatest(len(t) - 4, 0) + 1)) AS i
      FROM toks
    ), kg AS (
      SELECT doc_id, i,
             ('0x' || substr(md5(array_to_string(t[i:i+4], ' ')), 1, 12))::BIGINT AS h
      FROM pos
    ), cnt AS (
      SELECT h, count(*) AS nh FROM kg GROUP BY h
    ), dup AS (
      SELECT doc_id, i FROM kg JOIN cnt USING (h) WHERE nh >= 2
    ), brk AS (
      SELECT doc_id, i,
             CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) <= 5
                  THEN 0 ELSE 1 END AS b
      FROM dup
    ), grp AS (
      SELECT doc_id, i,
             sum(b) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS UNBOUNDED PRECEDING) AS g
      FROM brk
    ), spans AS (
      SELECT doc_id, g, min(i) AS s, max(i) AS e FROM grp GROUP BY doc_id, g
    )
    SELECT doc_id,
           count(*) AS n_dup_spans,
           CAST(sum(e - s + 5) AS BIGINT) AS dup_tokens
    FROM spans GROUP BY doc_id
    """,
)
def d19_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT duplicated-passage detection — the ExactSubstr flavor of
    training-data dedup (Lee et al. 2022 "Deduplicating Training Data
    Makes Language Models Better") at k-gram granularity: every 5-token
    window whose hash occurs >= 2 times ANYWHERE in the corpus
    (cross-document or internal repetition alike) marks its positions
    duplicated, and per document the marked positions merge into
    maximal spans (gap <= k keeps the token-coverage union exact), the
    report a dedup pass uses to cut repeated passages rather than whole
    documents.  Replaces the suffix array of the paper with the
    MR-friendly equivalent: a token-scale k-gram count shuffle +
    co-partitioned join back (never pairwise, never a global sort),
    then ONE doc_id shuffle for the gaps-and-islands span merge —
    d10/t21's scalability class.  md5-fold hashes keep it
    engine-portable, so the whole operator value-checks."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", text.tokens("text").alias("t"))
    pos = (
        toks.filter(F.size("t") >= 5)
        .select(
            "doc_id",
            "t",
            F.explode_outer(F.sequence(F.lit(1), F.size("t") - 4)).alias("i"),
        )
        .filter(F.col("i").isNotNull())
    )
    kg = pos.select(
        "doc_id",
        "i",
        F.conv(
            F.substring(F.md5(F.concat_ws(" ", F.slice("t", F.col("i"), 5))), 1, 12),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )
    cnt = kg.groupBy("h").agg(F.count(F.lit(1)).alias("nh"))
    dup = kg.join(cnt, "h").filter(F.col("nh") >= 2).select("doc_id", "i")
    wl = Window.partitionBy("doc_id").orderBy(F.col("i").asc())
    brk = dup.select(
        "doc_id",
        "i",
        F.when(F.col("i") - F.lag("i").over(wl) <= 5, 0).otherwise(1).alias("b"),
    )
    grp = brk.select(
        "doc_id",
        "i",
        F.sum("b").over(wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("g"),
    )
    spans = grp.groupBy("doc_id", "g").agg(F.min("i").alias("s"), F.max("i").alias("e"))
    return spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + 5).alias("dup_tokens"),
    )


def _t22_oracle() -> str:
    """t18's unrolled 3-merge replay, carrying ``lang`` through the
    corpus state, ending in the per-language ENCODE report instead of
    the merge table."""
    head = """
    WITH t0 AS (
      SELECT lang, ' ' || array_to_string(
               list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''), ' ')
             || ' ' AS s
      FROM documents
    )"""
    parts = []
    for i in range(1, 4):
        prev = f"t{i - 1}"
        parts.append(f"""
    , l{i} AS (
      SELECT list_filter(str_split(trim(s), ' '), x -> x != '') AS l FROM {prev}
    ), p{i} AS (
      SELECT l[i] AS a, l[i + 1] AS b, count(*) AS cnt
      FROM l{i}, LATERAL unnest(range(1, len(l))) AS u(i)
      GROUP BY 1, 2
    ), m{i} AS (
      SELECT a, b, cnt FROM p{i} ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
    ), t{i} AS (
      SELECT lang, replace(s, ' ' || m.a || ' ' || m.b || ' ',
                              ' ' || m.a || '_' || m.b || ' ') AS s
      FROM {prev}, m{i} m
    )""")
    tail = """
    , enc AS (
      SELECT lang,
             list_filter(str_split(trim(s), ' '), x -> x != '') AS syms
      FROM t3
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(len(syms)) AS BIGINT) AS n_symbols,
           CAST(sum(len(list_filter(syms, x -> contains(x, '_')))) AS BIGINT) AS n_merged
    FROM enc GROUP BY lang"""
    return head + "".join(parts) + tail


@query("t22_bpe_apply", oracle=_t22_oracle())
def t22_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY — the encode half t18's learner exists for: the
    3 learned merges (the model — a driver-held list, s05 discipline)
    are applied corpus-wide as a chain of codegen'd literal replaces,
    and the encoded corpus reduces to the per-language token-budget
    report (symbol count after merges, merged-symbol occurrences) a
    training pipeline emits before materializing token ids.  At 100 TB
    the encode pass is pure scan-shaped projection work — the merge
    table broadcasts as literals, documents never shuffle until the
    language rollup (a 5-row aggregate).  Value-checked end to end:
    the oracle replays learning AND encoding (t18's unrolled loop
    carried through to the final report)."""
    docs = _t(spark, sf_dir, "documents")
    merges = [(a, b) for _, a, b, _, _ in text.bpe_merge_steps(docs, iters=3)]
    s = F.concat(F.lit(" "), F.concat_ws(" ", text.tokens("text")), F.lit(" "))
    for a, b in merges:
        s = F.replace(s, F.lit(f" {a} {b} "), F.lit(f" {a}_{b} "))
    syms = F.filter(F.split(F.trim(s), " "), lambda t: t != "")
    enc = docs.select("lang", syms.alias("syms"))
    return enc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("syms")).alias("n_symbols"),
        F.sum(F.size(F.filter(F.col("syms"), lambda t: t.contains("_")))).alias(
            "n_merged"
        ),
    )


@query(
    "s10_negative_samples",
    oracle="""
    WITH n AS (
      SELECT count(*) AS n_vecs FROM embeddings
    ), draws AS (
      SELECT e.vec_id, s.slot,
             ('0x' || substr(md5(CAST(e.vec_id AS VARCHAR) || ':' || CAST(s.slot AS VARCHAR)), 1, 12))::BIGINT
             % n.n_vecs AS neg_id
      FROM embeddings e, n, LATERAL unnest(range(1, 5)) AS s(slot)
    ), kept AS (
      SELECT vec_id, slot, neg_id FROM draws WHERE neg_id != vec_id
    )
    SELECT k.vec_id, CAST(k.slot AS BIGINT) AS slot, k.neg_id,
           CAST(e.label AS BIGINT) AS neg_label
    FROM kept k JOIN embeddings e ON k.neg_id = e.vec_id
    """,
)
def s10_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic NEGATIVE SAMPLING for contrastive/metric training
    (the word2vec / InfoNCE data-prep step): each anchor draws 4
    negatives by content-hash modulo corpus size — a pure per-row
    arithmetic draw (md5-fold, d11 discipline), zero shuffle, and
    reproducible under re-sharding exactly like q37's splits (the
    training-data property that matters: re-running the export yields
    the same pairs).  Self-draws are dropped rather than re-drawn —
    deterministic in both engines, and at 4 draws/anchor the loss is
    ~4/n.  The only shuffle is the label-attachment join keyed on
    neg_id (at 100 TB: the anchor stream probes the corpus id→label
    index, co-partitioned).  Corpus size enters as a broadcast 1-row
    aggregate, never a driver constant."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "label")
    n = emb.agg(F.count(F.lit(1)).alias("n_vecs"))
    draws = (
        emb.select("vec_id")
        .crossJoin(F.broadcast(n))
        .select(
            "vec_id",
            F.explode(F.sequence(F.lit(1), F.lit(4))).alias("slot"),
            "n_vecs",
        )
        .select(
            "vec_id",
            F.col("slot").cast("bigint").alias("slot"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.col("vec_id"), F.col("slot"))), 1, 12
                    ),
                    16,
                    10,
                ).cast("bigint")
                % F.col("n_vecs")
            ).alias("neg_id"),
        )
        .filter(F.col("neg_id") != F.col("vec_id"))
    )
    labels = emb.select(
        F.col("vec_id").alias("neg_id"), F.col("label").cast("bigint").alias("neg_label")
    )
    return draws.join(labels, "neg_id").select("vec_id", "slot", "neg_id", "neg_label")


@query(
    "q106_dynamic_partition_pruning",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 4) AS sum_value
    FROM events
    WHERE date_part('day', CAST(ts AS DATE)) % 3 = 0
    GROUP BY event_type
    """,
)
def q106_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning — q82's static twin made runtime: the
    fact side is the same date-partitioned events layout, but the
    pruning dates come from a DIMENSION frame (the distinct dates whose
    day-of-month is divisible by 3) that only exists after evaluation,
    so Catalyst injects a DynamicPruningExpression subquery into the
    fact scan's PartitionFilters — at 100 TB the scan skips ~2/3 of the
    partition directories at RUNTIME, the mechanism star-schema date
    filters rely on (plan-pinned in tests/test_plans.py).  The dim
    broadcasts; the fact never shuffles before the aggregate."""
    import os
    import tempfile

    from mapreducehs_spark.sources.catalog import build_fixture_once, source_fingerprint

    tag = os.path.basename(os.path.normpath(sf_dir))
    fp = source_fingerprint(sf_dir, "events")
    ev = _t(spark, sf_dir, "events")
    base = build_fixture_once(
        os.path.join(tempfile.gettempdir(), f"mapreducehs_events_bydate_{tag}_{fp}"),
        lambda tmp: ev.withColumn("event_date", F.col("ts").cast("date"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(tmp),
    )

    fact = spark.read.parquet(base)
    dim = (
        ev.select(F.col("ts").cast("date").alias("event_date"))
        .distinct()
        .filter(F.dayofmonth("event_date") % 3 == 0)
    )
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    return (
        fact.join(F.broadcast(dim), "event_date")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(cents) / 100.0, 4).alias("sum_value"),
        )
    )


# =========================================================================
# Round-4 second half: sketches, graph traversal, attribution, bigram LMs
# =========================================================================

@query(
    "q107_countmin_sketch",
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS term
      FROM documents
    ), freq AS (
      SELECT term, count(*) AS c FROM toks GROUP BY 1
    ), cells AS (
      SELECT r,
             ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || term), 1, 12))::BIGINT % 256 AS col,
             sum(c) AS v
      FROM freq, LATERAL unnest(range(0, 4)) AS t(r)
      GROUP BY 1, 2
    ), probe AS (
      SELECT term, c FROM freq ORDER BY c DESC, term ASC LIMIT 10
    ), pr AS (
      SELECT term, c, r,
             ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || term), 1, 12))::BIGINT % 256 AS col
      FROM probe, LATERAL unnest(range(0, 4)) AS t(r)
    )
    SELECT term,
           CAST(max(c) AS BIGINT) AS true_count,
           CAST(min(v) AS BIGINT) AS cms_est
    FROM pr JOIN cells USING (r, col)
    GROUP BY term
    """,
)
def q107_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) — the mergeable
    point-query frequency sketch completing the sketch family (q34 HLL,
    q41 approx-percentile, q53 KLL, q54 theta, q71 Misra-Gries, q98
    KMV).  Depth d=4 × width w=256, row hashes md5-salted by row index
    (the [[hex-fold determinism recipe]]: 12 hex digits → BIGINT, so
    DuckDB replays every cell).  The token-scale work is ONE hash agg
    (term frequencies); the 4×-row expansion happens on the
    VOCABULARY-sized frame, and cell counters are partial-aggregatable
    sums — at 100 TB the sketch build is a map-side-combined shuffle of
    at most d·w = 1024 cells per partition, the textbook mergeable-
    sketch contract (reference fold/merge discipline,
    src/Core/MapReduceC.hs reducer laws).  Probing the 10 true heavy
    hitters pins the CMS overestimate guarantee (est >= true) by value.
    """
    plan, freq = _q107_cms_build(spark, sf_dir)
    try:
        # materialize the 10-row result while freq is cached
        return plan.localCheckpoint()
    finally:
        freq.unpersist(blocking=False)


def _q107_cell_col():
    """The CMS cell law (row-salted md5 hex-fold mod width) — the ONE
    definition both the production sketch and the overestimate property
    test hash with, so the test cannot drift from the query."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("r"), F.col("term"))), 1, 12),
            16,
            10,
        ).cast("bigint")
        % 256
    )


def _q107_cells(freq: DataFrame, rows: DataFrame) -> DataFrame:
    """CMS cell counters from a (term, c) frequency frame."""
    return (
        freq.crossJoin(F.broadcast(rows))
        .select("r", _q107_cell_col().alias("col"), "c")
        .groupBy("r", "col")
        .agg(F.sum("c").alias("v"))
    )


def _q107_cms_build(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """q107's pre-checkpoint plan + the persisted vocab frame (returned
    so callers — the query and the plan-pin test — control unpersist)."""
    docs = _t(spark, sf_dir, "documents")
    toks = (
        docs.select(text.tokens("text").alias("__t"))
        .select(F.explode_outer("__t").alias("term"))
        .filter(F.col("term").isNotNull())
    )
    # vocab-sized; read twice (cell build + probe selection) — persist so
    # the token-scale tokenize+count pass runs ONCE
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c")).persist()
    rows = spark.range(4).select(F.col("id").cast("int").alias("r"))
    cells = _q107_cells(freq, rows)
    probe = freq.orderBy(F.col("c").desc(), F.col("term").asc()).limit(10)
    pr = probe.crossJoin(F.broadcast(rows)).select(
        "term", "c", "r", _q107_cell_col().alias("col")
    )
    plan = (
        cells.join(F.broadcast(pr), ["r", "col"])
        .groupBy("term")
        .agg(
            F.max("c").cast("bigint").alias("true_count"),
            F.min("v").cast("bigint").alias("cms_est"),
        )
    )
    return plan, freq


def _q108_oracle(hops: int = 3) -> str:
    """Unrolled BFS frontier replay: per level, the reachable set is the
    previous set plus one edge expansion, with min-hop per node — all
    integer, so the level histogram is engine-exact."""
    head = """
    WITH edges0 AS (
      SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), edges AS (
      SELECT src, dst FROM edges0
      UNION ALL
      SELECT dst AS src, src AS dst FROM edges0
    ), d0 AS (
      SELECT (SELECT min(src) FROM edges) AS node, 0 AS d
    )"""
    parts = []
    for i in range(1, hops + 1):
        prev = f"d{i - 1}"
        parts.append(f"""
    , d{i} AS (
      SELECT node, min(d) AS d FROM (
        SELECT node, d FROM {prev}
        UNION ALL
        SELECT e.dst AS node, {i} AS d
        FROM {prev} p JOIN edges e ON e.src = p.node WHERE p.d = {i - 1}
      ) GROUP BY node
    )""")
    tail = f"""
    SELECT d AS hops, CAST(count(*) AS BIGINT) AS n_nodes
    FROM d{hops}
    GROUP BY d
    """
    return head + "".join(parts) + tail


@query("q108_bfs_hops", oracle=_q108_oracle())
def q108_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first shortest hops — frontier-expansion graph traversal
    (the second iterative-graph workload next to q96 PageRank; the
    reference's multi-stage chain ``(:>)`` is exactly this shape) over
    the same symmetrized customer↔supplier trade graph.  Each level
    expands ONLY the new frontier (p.d = level-1) against the
    hash-partitioned adjacency and folds with an associative min — the
    frontier rows shuffle, never the edge list.  At 100 TB: per level
    one narrow (node, hop) shuffle; the adjacency stays put, persisted
    partitioned on src (q96 discipline).  Distances are integers, so
    the level histogram value-checks bit-for-bit against the unrolled
    oracle."""
    edges = _symmetrized_trade_edges(spark, sf_dir)  # q96's shared build
    levels = []  # per-level checkpoint free() handles, called in finally
    try:
        from mapreducehs_spark.operators.iteration import local_checkpoint_freeable

        start = edges.agg(F.min("src")).collect()[0][0]  # one scalar to the driver
        dist = spark.createDataFrame([(start, 0)], "node long, d int")
        for level in range(1, 4):
            frontier = dist.filter(F.col("d") == level - 1)
            expanded = (
                frontier.join(edges, frontier["node"] == edges["src"])
                .select(F.col("dst").alias("node"), F.lit(level).alias("d"))
            )
            # checkpoint the per-level result: keeps the lineage flat
            # (O(1) plan depth per level, not O(level)); freeable so the
            # reached-set-sized blocks don't outlive the query
            dist, free = local_checkpoint_freeable(
                dist.unionByName(expanded).groupBy("node").agg(F.min("d").alias("d")),
                eager=False,
            )
            levels.append(free)
        return (
            dist.groupBy(F.col("d").alias("hops"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
            .localCheckpoint()  # materialize while the adjacency is cached
        )
    finally:
        edges.unpersist(blocking=False)
        # the result above is materialized — the per-level checkpoint
        # blocks can now be genuinely released (DataFrame.unpersist()
        # would be a no-op here; see operators/iteration.py)
        for free_level in levels:
            free_level()


@query(
    "q109_event_attribution",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, event_type, value, ts,
             last_value(CASE WHEN event_type IN ('click', 'view') THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch,
             first_value(CASE WHEN event_type IN ('click', 'view') THEN event_type END
                         IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch
      FROM events
    )
    SELECT coalesce(last_touch, 'none') AS last_touch,
           coalesce(first_touch, 'none') AS first_touch,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(sum(CAST(floor(value * 100) AS BIGINT)) / 100.0, 4) AS attributed_value
    FROM seq
    WHERE event_type = 'purchase'
    GROUP BY 1, 2
    """,
)
def q109_event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-touch attribution — the sessionized analytics pattern
    (first-touch / last-touch) every event pipeline ships: for each
    purchase, the most recent and the earliest preceding engagement
    touch (click/view) of the same user, via IGNORE NULLS
    first/last_value over a (user, time) window.  ONE shuffle
    partitioned by user_id serves both window passes (same window
    spec), then a vocabulary-sized group-by — at 100 TB this is the
    q13/q52 per-entity ordered-scan shape, embarrassingly parallel
    across users.  Revenue is attributed in exact integer cents
    (floor(value·100)) so sums are order-independent; the (ts,
    event_id) tiebreak makes the window total-ordered."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type").isin("click", "view"), F.col("event_type"))
    seq = ev.select(
        "event_type",
        "value",
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
        F.first(touch, ignorenulls=True).over(w).alias("first_touch"),
    )
    cents = F.floor(F.col("value") * 100).cast("bigint")
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(F.col("last_touch"), F.lit("none")).alias("last_touch"),
            F.coalesce(F.col("first_touch"), F.lit("none")).alias("first_touch"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.round(F.sum(cents) / 100.0, 4).alias("attributed_value"),
        )
    )


def _bigram_pairs(toked: DataFrame, include_doc: bool = True) -> DataFrame:
    """Adjacent-token pairs from a (doc_id, __t tokens-array) frame —
    the ONE Spark twin of the shared _T23_PAIRS_CTE oracle fragment
    (used by t23 and t24, so the size>=2 guard and the sequence
    off-by-one recipe cannot fork).  size >= 2 guard BEFORE sequence():
    Spark's sequence(1, 0) DESCENDS instead of returning empty
    (verify-skill recipe, t21)."""
    cols = ["doc_id"] if include_doc else []
    return (
        toked.filter(F.size("__t") >= 2)
        .select(
            *cols,
            F.explode_outer(
                F.expr(
                    "transform(sequence(1, size(__t) - 1),"
                    " i -> struct(__t[i - 1] AS a, __t[i] AS b))"
                )
            ).alias("__p"),
        )
        .filter(F.col("__p").isNotNull())
        .select(*cols, F.col("__p.a").alias("a"), F.col("__p.b").alias("b"))
    )


_T23_PAIRS_CTE = """
    WITH lists AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS l
      FROM documents
    ), pairs AS (
      SELECT doc_id, l[i] AS a, l[i + 1] AS b
      FROM lists, LATERAL unnest(range(1, len(l))) AS u(i)
    ), dp AS (
      SELECT doc_id, a, b, count(*) AS m FROM pairs GROUP BY 1, 2, 3
    ), big AS (
      SELECT a, b, CAST(sum(m) AS BIGINT) AS cab FROM dp GROUP BY 1, 2
    ), uni AS (
      SELECT a, CAST(sum(cab) AS BIGINT) AS ca FROM big GROUP BY 1
    )"""


@query(
    "t23_bigram_logprob",
    oracle=_T23_PAIRS_CTE
    + """
    , vocab AS (
      SELECT count(DISTINCT u) AS vv
      FROM (SELECT unnest(l) AS u FROM lists)
    )
    SELECT doc_id,
           CAST(sum(m) AS BIGINT) AS n_pairs,
           (CAST(sum(m * CAST(floor(1e6 * ln((cab + 1.0) / CAST(ca + vv AS DOUBLE)))
                              AS BIGINT)) AS BIGINT) * 10000
            // (CAST(sum(m) AS BIGINT) * 1000000)) / 10000.0 AS avg_logprob
    FROM dp JOIN big USING (a, b) JOIN uni USING (a), vocab
    GROUP BY doc_id
    """,
)
def t23_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring with add-one smoothing — t17's
    unigram perplexity proxy upgraded one order: per doc, the mean over
    adjacent token pairs of ln((c(a,b)+1)/(c(a)+V)).  The corpus is
    tokenized ONCE (toked persisted — measured 1.8x vs re-tokenizing
    for the vocab pass at sf0.1) and feeds both the per-doc pair count
    (dp, also persisted) and the vocabulary size; the corpus bigram
    table (big) and its start-marginal (uni) derive from dp by further
    partial-aggregatable sums, so the model build re-shuffles the
    vocabulary²-sized frame, never the corpus.  Per-pair log-probs
    quantize to integer micro-nats (floor(1e6·ln p), the t17/s08
    recipe) so the doc aggregation is order-independent and the whole
    model value-checks."""
    docs = _t(spark, sf_dir, "documents")
    toked = docs.select("doc_id", text.tokens("text").alias("__t")).persist()
    dp = (
        _bigram_pairs(toked)
        .groupBy("doc_id", "a", "b")
        .agg(F.count(F.lit(1)).alias("m"))
        .persist()
    )
    try:
        big = dp.groupBy("a", "b").agg(F.sum("m").cast("bigint").alias("cab"))
        uni = big.groupBy("a").agg(F.sum("cab").cast("bigint").alias("ca"))
        vocab = (
            toked.select(F.explode_outer("__t").alias("u"))
            .filter(F.col("u").isNotNull())
            .agg(F.countDistinct("u").alias("vv"))
        )
        # micro-nats on the bigram-TABLE frame via the C-library log
        # (text.micro_ln_udf — the JVM log intrinsic can flip a floor
        # vs the oracle's libm; observed at sf1 on t17's twin law)
        scored = (
            big.join(F.broadcast(uni), "a")
            .crossJoin(F.broadcast(vocab))
            .withColumn(
                "micro",
                text.micro_ln_udf()(
                    (F.col("cab") + F.lit(1)).cast("double")
                    / (F.col("ca") + F.col("vv")).cast("double")
                ),
            )
            .select("a", "b", "micro")
        )
        return (
            dp.join(scored, ["a", "b"])
            .groupBy("doc_id")
            .agg(
                F.sum("m").cast("bigint").alias("n_pairs"),
                F.sum(F.col("m") * F.col("micro")).cast("bigint").alias("__s"),
            )
            # truncating fixed-point average (t17's sf1 lesson): round()
            # of a double quotient ties at .xxxx5 and splits the engines
            .select(
                "doc_id",
                "n_pairs",
                (
                    F.expr("(__s * 10000L) div (n_pairs * 1000000L)") / F.lit(10000.0)
                ).alias("avg_logprob"),
            )
            .localCheckpoint()  # materialize the doc-level scores while caches live
        )
    finally:
        toked.unpersist(blocking=False)
        dp.unpersist(blocking=False)


@query(
    "t24_pmi_collocations",
    oracle=_T23_PAIRS_CTE
    + """
    , unib AS (
      SELECT b, CAST(sum(cab) AS BIGINT) AS cb FROM big GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(cab) AS BIGINT) AS n FROM big
    )
    SELECT a, b, cab,
           CAST(floor(1e6 * ln((CAST(n AS DOUBLE) * CAST(cab AS DOUBLE))
                               / (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE))))
                AS BIGINT) AS pmi_micro
    FROM big JOIN uni USING (a) JOIN unib USING (b), tot
    WHERE cab >= 5
    ORDER BY pmi_micro DESC, a ASC, b ASC
    LIMIT 25
    """,
)
def t24_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information — the corpus-
    statistics twin of t04's tf-idf: PMI(a,b) = ln(N·c(a,b) /
    (c(a)·c(b))) over adjacent-pair counts, min support 5, top-25 with
    a total (pmi, a, b) order.  Shares t23's single token-scale pass
    shape: pair counts shuffle once keyed on the pair; the start/end
    marginals and the grand total are derived, broadcast-sized frames.
    PMI is emitted as integer micro-nats (floor quantization — exact in
    both engines, never a round() tie) so the ranking and the values
    are bit-stable.  At 100 TB: one map-side-combined pair-count
    shuffle + a TakeOrdered(25), no corpus re-shuffle."""
    docs = _t(spark, sf_dir, "documents")
    toked = docs.select("doc_id", text.tokens("text").alias("__t"))
    pairs = _bigram_pairs(toked, include_doc=False)
    big = (
        pairs.groupBy("a", "b").agg(F.count(F.lit(1)).cast("bigint").alias("cab"))
        .persist()
    )
    try:
        uni = big.groupBy("a").agg(F.sum("cab").cast("bigint").alias("ca"))
        unib = big.groupBy("b").agg(F.sum("cab").cast("bigint").alias("cb"))
        tot = big.agg(F.sum("cab").cast("bigint").alias("n"))
        # C-library log for the floor-quantized PMI (text.micro_ln_udf;
        # the JVM intrinsic can flip a floor vs the oracle's libm)
        pmi = text.micro_ln_udf()(
            (F.col("n").cast("double") * F.col("cab").cast("double"))
            / (F.col("ca").cast("double") * F.col("cb").cast("double"))
        )
        return (
            big.filter(F.col("cab") >= 5)
            .join(F.broadcast(uni), "a")
            .join(F.broadcast(unib), "b")
            .crossJoin(F.broadcast(tot))
            .select("a", "b", "cab", pmi.alias("pmi_micro"))
            .orderBy(F.col("pmi_micro").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(25)
            .localCheckpoint()  # materialize the 25-row result while big is cached
        )
    finally:
        big.unpersist(blocking=False)


def _s11_ctes(iters: int = 3) -> str:
    """Unrolled integer power-iteration CTE chain on the symmetrized
    Gram matrix: int64 matvec + truncating integer renormalization —
    both engines truncate BIGINT division identically (Spark `div`,
    DuckDB `//`: -7/3 → -2 in both), so every iterate is engine-exact.
    Shared by _s11_oracle (emits the iterate) and _s17_oracle (projects
    the corpus onto it)."""
    head = """
    WITH q AS (
      SELECT [CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS qv
      FROM embeddings
    ), gU AS (
      SELECT i.i AS i, j.j AS j, CAST(sum(qv[i.i] * qv[j.j]) AS BIGINT) AS g
      FROM q,
           LATERAL unnest(range(1, len(qv) + 1)) AS i(i),
           LATERAL unnest(range(1, len(qv) + 1)) AS j(j)
      WHERE j.j >= i.i
      GROUP BY 1, 2
    ), g AS (
      SELECT i, j, g FROM gU
      UNION ALL
      SELECT j AS i, i AS j, g FROM gU WHERE j > i
    ), v0 AS (
      SELECT DISTINCT i AS j, CAST(1024 AS BIGINT) AS v FROM g
    )"""
    parts = []
    for k in range(1, iters + 1):
        prev = f"v{k - 1}"
        parts.append(f"""
    , w{k} AS (
      SELECT g.i AS i, CAST(sum(g.g * p.v) AS BIGINT) AS w
      FROM g JOIN {prev} p ON p.j = g.j
      GROUP BY 1
    ), m{k} AS (
      SELECT max(abs(w)) AS m FROM w{k}
    ), v{k} AS (
      SELECT i AS j, CAST((w * 1024) // m AS BIGINT) AS v FROM w{k}, m{k}
    )""")
    return head + "".join(parts)


def _s11_oracle(iters: int = 3) -> str:
    return _s11_ctes(iters) + f"""
    SELECT j AS i, v FROM v{iters}
    """


@query("s11_power_iteration", oracle=_s11_oracle())
def s11_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-eigenvector extraction by power iteration — the spectral
    building block behind PCA whitening, spectral clustering seeds, and
    embedding-drift diagnostics.  The CORPUS-side work is the s09
    distributed integer Gram matrix (one Arrow-matmul pass, tree-
    aggregated upper triangle — shuffle O(#batches·dim²), independent
    of corpus size); the iteration itself runs on driver-held dim×dim
    int64 state (model-sized, the s05/t18 discipline: the driver never
    sees a vector row, only the 2 080-entry matrix).

    Determinism: int64 matvec is exact; renormalization divides by
    max|w| with TRUNCATING integer division, which Spark `div`, DuckDB
    `//` and the numpy sign/abs-floor identity below all implement
    identically — so all three iterates value-check bit-for-bit
    against the unrolled oracle (q96's fixed-point discipline applied
    to linear algebra)."""
    emb = _t(spark, sf_dir, "embeddings")
    dim, v = _dominant_eigvec(emb)
    return spark.createDataFrame(
        [(int(i + 1), int(v[i])) for i in range(dim)], "i long, v long"
    )


def _dominant_eigvec(emb: DataFrame, iters: int = 3):
    """(dim, v): 3 integer power iterations on the s09 distributed Gram
    matrix.  Driver state is the dim×dim int64 matrix + the dim-vector
    iterate (model-sized, the s05/t18 discipline — the driver never
    sees a corpus row).  Shared by s11 (emits the iterate) and s17
    (projects the corpus onto it)."""
    import numpy as np

    rows = similarity.gram_matrix(emb, vec_col="embedding", scale=1000).collect()
    dim = max(r["j"] for r in rows)
    G = np.zeros((dim, dim), dtype=np.int64)
    for r in rows:
        G[r["i"] - 1, r["j"] - 1] = r["g"]
        G[r["j"] - 1, r["i"] - 1] = r["g"]
    v = np.full(dim, 1024, dtype=np.int64)
    for _ in range(iters):
        w = G @ v
        scaled = w * 1024
        m = np.abs(w).max()
        # TRUNCATING div (numpy // floors): sign * (abs // m)
        v = np.sign(scaled) * (np.abs(scaled) // m)
    return dim, v


#: d20/t27's shared quality-dominance rule: the SINGLE definition of
#: "which member of a near-dup pair is dropped" (shorter n_chars; ties →
#: higher doc_id) — threshold, tiebreak, and rule live here once.
_QUALITY_DROP_THRESHOLD = 0.25


def _quality_losers_ctes() -> str:
    """Oracle CTE chain: d11 checked candidates → dominance losers.
    Emits CTEs `pairs`, `meta`, `losers` (plus d11's own); used by both
    _d20_oracle and _t27_oracle so the drop rule cannot fork."""
    ctes, agree, np_ = _minhash_checked_ctes()
    return f"""{ctes}
    , pairs AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN sigs sa ON sa.doc_id = c.id_a JOIN sigs sb ON sb.doc_id = c.id_b
      WHERE ({agree}) / {float(np_)} >= {_QUALITY_DROP_THRESHOLD}
    ), meta AS (
      SELECT doc_id, source, n_chars FROM documents
    ), losers AS (
      SELECT DISTINCT CASE
               WHEN ma.n_chars < mb.n_chars THEN p.id_a
               WHEN ma.n_chars > mb.n_chars THEN p.id_b
               ELSE greatest(p.id_a, p.id_b)
             END AS doc_id
      FROM pairs p
      JOIN meta ma ON ma.doc_id = p.id_a
      JOIN meta mb ON mb.doc_id = p.id_b
    )"""


def _quality_losers(docs: DataFrame) -> DataFrame:
    """Spark twin of _quality_losers_ctes: (doc_id, __dropped=1) rows
    for every pair-dominated document.  Candidates come from d11's
    banded LSH (never all-pairs); the quality lookup joins the
    candidate frame (≪ corpus) against the narrow (doc_id, n_chars)
    projection."""
    pairs = dedup.minhash_lsh_pairs_checked(
        docs, est_threshold=_QUALITY_DROP_THRESHOLD
    ).select("id_a", "id_b")
    ma = docs.select(F.col("doc_id").alias("id_a"), F.col("n_chars").alias("ca"))
    mb = docs.select(F.col("doc_id").alias("id_b"), F.col("n_chars").alias("cb"))
    return (
        pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            F.when(F.col("ca") < F.col("cb"), F.col("id_a"))
            .when(F.col("ca") > F.col("cb"), F.col("id_b"))
            .otherwise(F.greatest(F.col("id_a"), F.col("id_b")))
            .alias("doc_id")
        )
        .distinct()
        .withColumn("__dropped", F.lit(1))
    )


def _d20_oracle() -> str:
    return f"""
    WITH {_quality_losers_ctes()}
    SELECT m.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(l.doc_id) AS BIGINT) AS n_dropped,
           CAST(count(*) - count(l.doc_id) AS BIGINT) AS n_kept
    FROM meta m LEFT JOIN losers l ON l.doc_id = m.doc_id
    GROUP BY m.source
    """


@query("d20_quality_canonical", oracle=_d20_oracle())
def d20_quality_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection — near-dedup that keeps the
    BEST version instead of an arbitrary one: d11's fully value-checked
    MinHash-LSH candidates, each pair dropping its lower-quality member
    (shorter n_chars; ties → higher doc_id), the "keep the longest
    variant" heuristic real training pipelines apply to near-dup
    clusters.  Candidates come from banded LSH (never all-pairs, d11's
    scale shape); the quality lookup joins the candidate-pair frame
    (≪ corpus) against the narrow (doc_id, n_chars) projection; the
    final rollup is a per-source LEFT anti-style count.  Unlike d07's
    cluster resolution (transitive closure, min-id survivor), this is
    the greedy pairwise-dominance drop — both are offered because both
    exist in production dedup stacks; composition with d06 resolution
    is a one-line change."""
    docs = _t(spark, sf_dir, "documents")
    meta = docs.select("doc_id", "source", "n_chars")
    losers = _quality_losers(docs)
    return (
        meta.join(losers, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count("__dropped").cast("bigint").alias("n_dropped"),
            (F.count(F.lit(1)) - F.count("__dropped")).cast("bigint").alias("n_kept"),
        )
    )


@query(
    "st13_stream_heavy_hitters",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS est_total
    FROM events
    GROUP BY event_type
    """,
)
def st13_stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy hitters via a SHARDED stateful Misra-Gries
    sketch (streaming/ops.stateful_mg_sketch) — the always-on
    "trending items" topology: micro-batch rows pre-aggregate
    vectorized, fold into bounded per-shard sketch state with the
    PODS'12 merge rule, and the serving read merges the latest
    per-shard sketches by summation.  Capacity (8) ≥ distinct event
    types (5), so the sketch runs in its exact regime and the whole
    streaming pipeline value-checks against the batch GROUP BY — the
    q71 accuracy-contract discipline applied to streaming state.
    At 100 TB/day the state is shards × capacity entries, independent
    of stream length."""
    from mapreducehs_spark import streaming as st

    updates = st.stateful_mg_sketch(
        _replayed_events(spark, sf_dir), shards=16, capacity=8
    )
    log = st.run_to_batch(updates, "st13_sink", output_mode="append")
    return st.merge_mg_sketch_log(log)


@query(
    "q110_nested_struct_pruning",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE user_id % 7 = 0
    GROUP BY event_type
    """,
)
def q110_nested_struct_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NESTED-column pruning — the 100 TB concern behind struct-typed
    event payloads: the fixture re-writes events as
    ``payload: struct<kind, metrics: struct<who, amount>>`` parquet, and
    the query touches only ``payload.kind`` + ``payload.metrics.who``.
    Catalyst's schema pruning must narrow the parquet ReadSchema to
    exactly those two LEAVES (plan-pinned) — reading the full struct for
    a two-leaf projection multiplies scan IO by the payload width at
    scale.  The filter on the nested leaf also reaches the scan.
    The oracle replays from the FLAT events table (same rows by
    construction), so the nested round trip itself is value-checked."""
    import os
    import tempfile

    from mapreducehs_spark.sources.catalog import build_fixture_once, source_fingerprint

    tag = os.path.basename(os.path.normpath(sf_dir))
    fp = source_fingerprint(sf_dir, "events")
    ev = _t(spark, sf_dir, "events")
    base = build_fixture_once(
        os.path.join(tempfile.gettempdir(), f"mapreducehs_events_nested_{tag}_{fp}"),
        lambda tmp: ev.select(
            "event_id",
            F.struct(
                F.col("event_type").alias("kind"),
                F.struct(
                    F.col("user_id").alias("who"),
                    F.col("value").alias("amount"),
                ).alias("metrics"),
                F.col("props").alias("raw"),
            ).alias("payload"),
        )
        .write.mode("overwrite")
        .parquet(tmp),
    )
    nested = spark.read.parquet(base)
    return (
        nested.filter(F.col("payload.metrics.who") % 7 == 0)
        .groupBy(F.col("payload.kind").alias("event_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.countDistinct("payload.metrics.who").cast("bigint").alias("n_users"),
        )
    )


@query(
    "q111_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS to_type
      FROM events
    ), pairs AS (
      SELECT from_type, to_type, count(*) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY 1, 2
    ), marg AS (
      SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM pairs GROUP BY 1
    )
    SELECT p.from_type, p.to_type,
           CAST(p.n AS BIGINT) AS n,
           CAST((p.n * 1000000) // m.n_from AS BIGINT) AS p_micro
    FROM pairs p JOIN marg m USING (from_type)
    """,
)
def q111_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (first-order Markov) — the
    user-journey analytics behind funnel discovery: per-user
    time-ordered ``lead`` (one window pass, one user-keyed shuffle —
    q13's embarrassingly-parallel per-entity scan), then transition
    counts and row-normalized probabilities.  Probabilities are exact
    integer micro-units ((n·1e6) div n_from — truncating div, identical
    in both engines), so the whole matrix value-checks; the marginal is
    a DERIVED (#types²-sized) frame, broadcast back.  (ts, event_id)
    makes the ordering total."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    # pairs is #types²-sized but referenced twice (marginal + join) —
    # persist so the event-scale window pass runs ONCE, not per branch
    pairs = (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    try:
        marg = pairs.groupBy("from_type").agg(
            F.sum("n").cast("bigint").alias("n_from")
        )
        return (
            pairs.join(F.broadcast(marg), "from_type")
            .select(
                "from_type",
                "to_type",
                F.col("n").cast("bigint").alias("n"),
                F.expr("(n * 1000000L) div n_from").cast("bigint").alias("p_micro"),
            )
            .localCheckpoint()  # materialize the matrix while pairs is cached
        )
    finally:
        pairs.unpersist(blocking=False)


@query(
    "t25_novelty_scores",
    oracle="""
    WITH lists AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS l
      FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS g
      FROM lists, LATERAL unnest(range(1, greatest(len(l) - 2, 0) + 1)) AS u(i)
    ), df AS (
      SELECT g, count(*) AS docs FROM grams GROUP BY 1
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN docs = 1 THEN 1 ELSE 0 END) AS BIGINT) AS novel_grams,
           CAST((sum(CASE WHEN docs = 1 THEN 1 ELSE 0 END) * 1000000) // count(*)
                AS BIGINT) AS novelty_micro
    FROM grams JOIN df USING (g)
    GROUP BY doc_id
    """,
)
def t25_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty — the memorization/contamination-risk metric
    dual to t13's boilerplate mining: the fraction of a document's
    DISTINCT 3-gram shingles that appear in NO other document (document
    frequency 1).  One token-scale pass emits per-doc distinct shingles;
    the df table derives from it by a further partial-aggregatable
    count; the scoring join then re-keys the deduplicated shingle frame
    on the shingle (a second token-scale shuffle — the 3-gram
    vocabulary is too wide to broadcast, unlike t17's unigram table).
    The ratio is exact integer micro-units
    ((novel·1e6) div n — no float boundary; a round()ed ratio of small
    integers WILL eventually hit a .xxxx5 tie, the q94 lesson)."""
    docs = _t(spark, sf_dir, "documents")
    toked = docs.select("doc_id", text.tokens("text").alias("__t"))
    grams = (
        toked.filter(F.size("__t") >= 3)
        .select(
            "doc_id",
            F.explode_outer(
                F.expr(
                    "transform(sequence(1, size(__t) - 2),"
                    " i -> concat_ws(' ', __t[i - 1], __t[i], __t[i + 1]))"
                )
            ).alias("g"),
        )
        .filter(F.col("g").isNotNull())
        .distinct()
    )
    df_counts = grams.groupBy("g").agg(F.count(F.lit(1)).alias("docs"))
    return (
        grams.join(df_counts, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("docs") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("novel_grams"),
            F.expr(
                "cast((sum(CASE WHEN docs = 1 THEN 1 ELSE 0 END) * 1000000L)"
                " div count(1) as bigint)"
            ).alias("novelty_micro"),
        )
    )


#: t26's oracle — shared verbatim by st17's streaming replay of the
#: same inference law (stream == batch, the st13/st15 discipline).
_T26_ORACLE = """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS term
      FROM documents
    ), feats AS (
      SELECT doc_id,
             ('0x' || substr(md5(term), 1, 12))::BIGINT % 4096 AS bucket
      FROM toks
    ), weights AS (
      SELECT b.b AS bucket, (b.b * 2654435761) % 1000 - 500 AS w
      FROM (SELECT unnest(range(0, 4096)) AS b) b
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_feats,
           CAST(sum(w) AS BIGINT) AS score,
           sum(w) > 0 AS keep
    FROM feats JOIN weights USING (bucket)
    GROUP BY doc_id
    """


@query("t26_hashed_linear_score", oracle=_T26_ORACLE)
def t26_hashed_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering — the fasttext-style linear
    classifier pass every pretraining mix runs, with the FEATURE
    HASHING trick (Weinberger et al. 2009): tokens hash into 4 096
    buckets (md5-fold — the [[hex-fold determinism recipe]]), the
    model is a 4 096-row weight vector BROADCAST-joined onto the
    feature stream, and each doc folds to one integer margin score +
    keep flag.  This is exactly how real model inference scales: the
    MODEL broadcasts (parameters ≪ data), the corpus stays scan-shaped,
    and the per-doc reduction is a partial-aggregatable sum — no Python
    in the loop at all, the entire inference is codegen'd expressions.
    (Here the weights are a deterministic law so the oracle can replay
    them; a trained model would broadcast a real coefficient table —
    same plan.)  Integer weights/scores make the check bit-exact."""
    docs = _t(spark, sf_dir, "documents")
    feats = (
        docs.select("doc_id", F.explode_outer(text.tokens("text")).alias("term"))
        .filter(F.col("term").isNotNull())
        .select(
            "doc_id",
            (
                F.conv(F.substring(F.md5("term"), 1, 12), 16, 10).cast("bigint") % 4096
            ).alias("bucket"),
        )
    )
    weights = spark.range(4096).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * F.lit(2654435761)) % 1000 - 500).alias("w"),
    )
    return (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_feats"),
            F.sum("w").cast("bigint").alias("score"),
            (F.sum("w") > 0).alias("keep"),
        )
    )


def _s12_oracle(k: int = 5) -> str:
    """Unrolled greedy MMR replay: per round, margin = relevance −
    max-sim-to-selected (all integer quantized dots), argmax with a
    (margin, vec_id) total order — engine-exact at every step."""
    head = """
    WITH e AS (
      SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS qv
      FROM embeddings
    ), q AS (
      SELECT qv FROM e WHERE vec_id = 0
    ), c AS (
      SELECT e.vec_id, e.qv,
             CAST(list_sum([e.qv[i] * q.qv[i] FOR i IN range(1, len(e.qv) + 1)])
                  AS BIGINT) AS sq
      FROM e, q WHERE e.vec_id <> 0
    ), s1 AS (
      SELECT vec_id, sq, CAST(0 AS BIGINT) AS mx
      FROM c ORDER BY sq DESC, vec_id LIMIT 1
    )"""
    parts = []
    for j in range(2, k + 1):
        selset = " UNION ALL ".join(f"SELECT vec_id FROM s{i}" for i in range(1, j))
        parts.append(f"""
    , sel{j} AS (
      SELECT e.vec_id, e.qv FROM e JOIN ({selset}) u USING (vec_id)
    ), m{j} AS (
      SELECT c.vec_id, c.sq,
             max(CAST(list_sum([c.qv[i] * se.qv[i]
                                FOR i IN range(1, len(c.qv) + 1)]) AS BIGINT)) AS mx
      FROM c, sel{j} se
      WHERE c.vec_id NOT IN ({selset})
      GROUP BY c.vec_id, c.sq
    ), s{j} AS (
      SELECT vec_id, sq, mx FROM m{j} ORDER BY sq - mx DESC, vec_id LIMIT 1
    )""")
    selects = " UNION ALL ".join(
        f"""SELECT CAST({j} AS BIGINT) AS rank, vec_id,
               sq AS relevance, mx AS max_prev, sq - mx AS margin FROM s{j}"""
        for j in range(1, k + 1)
    )
    return head + "".join(parts) + "\n    " + selects


@query("s12_mmr_diverse_topk", oracle=_s12_oracle())
def s12_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998) — the
    diversity-aware retrieval selector used to de-redundify RAG contexts
    and training-data picks: greedily select k=5 vectors maximizing
    relevance-to-query MINUS max-similarity-to-already-selected (equal
    weighting).  Per round: ONE scan-shaped Arrow pass updates the
    running max-sim against the single newly selected vector (broadcast
    — model-sized driver state, the s05/s11 discipline) and a
    TakeOrdered(1) picks the next; the corpus never pairwise-joins
    itself — k·O(corpus) work, not O(corpus²).  All scores are
    quantized integer dots (floor(1000·x), the s08/s09 recipe), so the
    greedy trajectory value-checks bit-for-bit against the unrolled
    oracle."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    emb = _t(spark, sf_dir, "embeddings")
    qz = F.expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000) as bigint))")
    base = emb.select("vec_id", qz.alias("qv"))
    qvec = np.array(
        base.filter(F.col("vec_id") == 0).select("qv").collect()[0][0], dtype=np.int64
    )

    def dot_udf(vec: np.ndarray):
        @pandas_udf("long")
        def _dot(qv: pd.Series) -> pd.Series:
            mat = np.array(qv.to_list(), dtype=np.int64)
            return pd.Series(mat @ vec)

        return _dot

    from mapreducehs_spark.operators.iteration import local_checkpoint_freeable

    cur = (
        base.filter(F.col("vec_id") != 0)
        .withColumn("sq", dot_udf(qvec)(F.col("qv")))
        .withColumn("mx", F.lit(0).cast("bigint"))
        .persist()
    )
    free_cur = cur.unpersist  # CacheManager-persisted: plain unpersist works
    try:
        picks = []
        for rank in range(1, 6):
            top = (
                cur.orderBy((F.col("sq") - F.col("mx")).desc(), F.col("vec_id").asc())
                .limit(1)
                .collect()[0]
            )
            picks.append(
                (rank, top["vec_id"], int(top["sq"]), int(top["mx"]),
                 int(top["sq"]) - int(top["mx"]))
            )
            if rank == 5:
                break
            svec = np.array(top["qv"], dtype=np.int64)
            # first update REPLACES the 0 placeholder (the true max over
            # the selected set can be negative — clamping at 0 diverges)
            upd = (
                dot_udf(svec)(F.col("qv"))
                if rank == 1
                else F.greatest(F.col("mx"), dot_udf(svec)(F.col("qv")))
            )
            # flatten per-round lineage; eager, so the superseded round's
            # blocks can be released immediately below (plain unpersist()
            # would be a no-op on these — see operators/iteration.py)
            nxt, free_nxt = local_checkpoint_freeable(
                cur.filter(F.col("vec_id") != top["vec_id"]).withColumn("mx", upd)
            )
            free_cur()
            cur, free_cur = nxt, free_nxt
        return spark.createDataFrame(
            picks, "rank long, vec_id long, relevance long, max_prev long, margin long"
        )
    finally:
        free_cur()


@query(
    "m09_video_frame_stats",
    oracle="""
    WITH px AS (
      SELECT doc_id, ((doc_id * 31 + f.f * 101 + i.i * 7) % 256) AS v
      FROM documents,
           LATERAL unnest([0, 3, 6]) AS f(f),
           LATERAL unnest(range(0, 128)) AS i(i)
    )
    SELECT doc_id,
           CAST(8 AS BIGINT) AS n_frames,
           CAST(3 AS BIGINT) AS n_sampled,
           CAST(sum(v) AS BIGINT) AS px_sum,
           CAST(min(v) AS BIGINT) AS px_min,
           CAST(max(v) AS BIGINT) AS px_max
    FROM px
    GROUP BY doc_id
    """,
)
def m09_video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-template decode: every doc gets an 8-frame MRV clip
    (a minimal length-prefixed-PGM container,
    operators/multimodal.encode_mrv), and a second Arrow stage demuxes
    the actual bytes, SAMPLES every 3rd frame (frames 0, 3, 6 — skipped
    frames are never decoded; the demux walk reads only length
    prefixes), decodes the sampled PGMs, and reduces to integer pixel
    stats fused in one stage.  This makes m03's frame-sampling plumbing
    a real decoding path — the m06/m07 checked-codec discipline applied
    to the video container template.  The arithmetic pixel law
    (id·31 + frame·101 + 7i mod 256) lets DuckDB replay the stats
    without demuxing, so encode→demux→sample→decode is value-checked
    end to end.  Codec formats (h264/vp9) remain env-gated; the
    Spark-side shape is the production one."""
    from mapreducehs_spark.operators.multimodal import (
        render_mrv_payloads,
        sampled_frame_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    payloads = render_mrv_payloads(docs, "doc_id", n_frames=8, width=16, height=8)
    return sampled_frame_stats(payloads, every_n=3).withColumnRenamed("id", "doc_id")


def _t27_oracle() -> str:
    return f"""
    WITH {_quality_losers_ctes()}
    , tok AS (
      SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))
                  AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT m.source,
           CAST(sum(t.n_tokens) AS BIGINT) AS tokens_raw,
           CAST(sum(CASE WHEN l.doc_id IS NULL THEN t.n_tokens ELSE 0 END)
                AS BIGINT) AS tokens_kept,
           CAST((sum(CASE WHEN l.doc_id IS NULL THEN t.n_tokens ELSE 0 END) * 1000000)
                // sum(t.n_tokens) AS BIGINT) AS kept_micro
    FROM meta m
    JOIN tok t USING (doc_id)
    LEFT JOIN losers l ON l.doc_id = m.doc_id
    GROUP BY m.source
    """


@query("t27_token_budget_report", oracle=_t27_oracle())
def t27_token_budget_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-dedup training-token budget — the report every pretraining
    run starts from: per source, raw tokens vs tokens SURVIVING d20's
    quality-aware drop list, with the retention ratio in integer
    micro-units.  A pure COMPOSITION witness: d20's value-checked LSH
    candidate → dominance-drop pipeline feeds a token-count pass (ONE
    codegen size() per row — no token explosion needed for counting),
    joined on doc_id.  At 100 TB: the drop list is candidates-sized
    (≪ corpus) and left-joins the narrow per-doc token counts; nothing
    about composing operators changes their individual scale shapes."""
    docs = _t(spark, sf_dir, "documents")
    losers = _quality_losers(docs)  # the ONE drop rule, shared with d20
    tok = docs.select(
        "doc_id", "source", F.size(text.tokens("text")).cast("bigint").alias("n_tokens")
    )
    kept_tokens = F.sum(
        F.when(F.col("__dropped").isNull(), F.col("n_tokens")).otherwise(0)
    )
    return (
        tok.join(losers, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.sum("n_tokens").cast("bigint").alias("tokens_raw"),
            kept_tokens.cast("bigint").alias("tokens_kept"),
            F.expr(
                "cast((sum(CASE WHEN __dropped IS NULL THEN n_tokens ELSE 0 END)"
                " * 1000000L) div sum(n_tokens) as bigint)"
            ).alias("kept_micro"),
        )
    )


@query(
    "m10_tolerant_decode",
    oracle="""
    WITH px AS (
      SELECT doc_id, ((doc_id * 31 + i.i * 7) % 256) AS v
      FROM documents, LATERAL unnest(range(0, 512)) AS i(i)
      WHERE doc_id % 13 <> 0
    ), good AS (
      SELECT doc_id, CAST(sum(v) AS BIGINT) AS px_sum FROM px GROUP BY doc_id
    )
    SELECT CASE WHEN d.doc_id % 13 = 0 THEN 'corrupt_truncated' ELSE 'ok' END
             AS decode_status,
           CAST(count(*) AS BIGINT) AS n_payloads,
           CAST(coalesce(sum(g.px_sum), 0) AS BIGINT) AS px_sum_total
    FROM documents d LEFT JOIN good g USING (doc_id)
    GROUP BY 1
    """,
)
def m10_tolerant_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ERROR-TOLERANT media decode — the production requirement m06/m09
    skip: at 100 TB some payloads ARE corrupt, and a decode kernel that
    throws kills the whole task (and with retries, the job).  Here every
    13th payload is truncated mid-raster (deterministic corruption law),
    and the Arrow decode stage classifies per row — 'ok' rows reduce to
    pixel stats, corrupt rows land in a quarantine status with ZERO
    exceptions escaping the kernel — the badRecords/DLQ pattern as a
    column, so the pipeline's error budget is itself a queryable,
    value-checked result."""
    from mapreducehs_spark.operators.multimodal import (
        render_corrupt_pgm_batches,
        tolerant_decode_batches,
    )

    docs = _t(spark, sf_dir, "documents")

    # the render/decode kernels live in operators/multimodal.py since
    # round 7, shared verbatim with the streaming DLQ twin (st24)
    decoded = (
        docs.select("doc_id")
        .mapInPandas(render_corrupt_pgm_batches, schema="doc_id long, payload binary")
        .mapInPandas(
            tolerant_decode_batches,
            schema="doc_id long, decode_status string, px_sum long",
        )
    )
    return decoded.groupBy("decode_status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_payloads"),
        F.sum("px_sum").cast("bigint").alias("px_sum_total"),
    )


@query(
    "q112_ab_experiment",
    oracle="""
    WITH assigned AS (
      SELECT user_id,
             ('0x' || substr(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 12))::BIGINT % 2
               AS variant
      FROM (SELECT DISTINCT user_id FROM events)
    ), metrics AS (
      SELECT e.user_id,
             max(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
             CAST(sum(CASE WHEN e.event_type = 'purchase'
                           THEN CAST(floor(e.value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS rev_cents
      FROM events e
      GROUP BY e.user_id
    )
    SELECT a.variant,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(m.converted) AS BIGINT) AS n_converters,
           CAST((sum(m.converted) * 1000000) // count(*) AS BIGINT) AS conv_micro,
           CAST(sum(m.rev_cents) AS BIGINT) AS rev_cents
    FROM assigned a JOIN metrics m USING (user_id)
    GROUP BY a.variant
    """,
)
def q112_ab_experiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with DETERMINISTIC hash assignment — the
    experimentation-platform pattern: variant = md5-fold(salt:user) % 2
    (stable across reruns and re-sharding, q37's split discipline —
    never a random() that unrepeatably reassigns), then per-variant
    users / converters / conversion rate / revenue.  One user-keyed
    aggregate computes per-user metrics; the assignment is a per-row
    expression on the user-sized frame; conversion rate in integer
    micro-units and revenue in exact cents, so the readout
    value-checks.  At 100 TB the only event-scale work is the per-user
    metric fold (map-side combinable); everything after is user-scale."""
    ev = _t(spark, sf_dir, "events")
    metrics = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        ),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100).cast("bigint"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("rev_cents"),
    )
    variant = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))), 1, 12
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    return (
        metrics.withColumn("variant", variant)
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("converted").cast("bigint").alias("n_converters"),
            F.expr("cast((sum(converted) * 1000000L) div count(1) as bigint)").alias(
                "conv_micro"
            ),
            F.sum("rev_cents").cast("bigint").alias("rev_cents"),
        )
    )


@query(
    "s13_ann_recall_report",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), c AS (
      SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16
    ), corpus AS (
      SELECT * FROM e WHERE vec_id >= 8
    ), q AS (
      SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8
    ), assign AS (
      SELECT vec_id, v, cid FROM (
        SELECT corpus.vec_id, corpus.v, c.cid,
               row_number() OVER (
                 PARTITION BY corpus.vec_id
                 ORDER BY list_cosine_similarity(corpus.v, c.cv) DESC, c.cid ASC
               ) AS rn
        FROM corpus CROSS JOIN c
      ) WHERE rn = 1
    ), probes AS (
      SELECT query_id, qv, cid FROM (
        SELECT q.query_id, q.qv, c.cid,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid ASC
               ) AS rn
        FROM q CROSS JOIN c
      ) WHERE rn <= 4
    ), a_scored AS (
      SELECT p.query_id, a.vec_id AS match_id,
             round(list_cosine_similarity(p.qv, a.v), 6) AS cosine
      FROM probes p JOIN assign a ON a.cid = p.cid
      WHERE p.query_id != a.vec_id
    ), approx AS (
      SELECT query_id, match_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, match_id ASC
        ) AS rank FROM a_scored
      ) WHERE rank <= 5
    ), x_scored AS (
      SELECT q.query_id, c2.vec_id AS match_id,
             round(list_cosine_similarity(q.qv, c2.v), 6) AS cosine
      FROM q CROSS JOIN corpus c2 WHERE q.query_id != c2.vec_id
    ), exact AS (
      SELECT query_id, match_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, match_id ASC
        ) AS rank FROM x_scored
      ) WHERE rank <= 5
    )
    SELECT x.query_id,
           CAST(5 AS BIGINT) AS k,
           CAST(count(a.match_id) AS BIGINT) AS n_hit,
           CAST((count(a.match_id) * 1000000) // 5 AS BIGINT) AS recall_micro
    FROM exact x LEFT JOIN approx a USING (query_id, match_id)
    GROUP BY x.query_id
    """,
)
def s13_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality EVALUATION as a first-class query: recall@5 of the
    value-checked IVF path (s06's data-seeded codebook) against the
    exact broadcast-probe ground truth (s01's kernel), per query — the
    report an embedding-platform team runs after every index rebuild.
    Because BOTH paths are deterministic (seeded centroids, total
    tie-break orders), recall itself is a value-checkable quantity —
    integer micro-units, never a rounded float — which is exactly why
    the checked-twin discipline matters: it turns "recall pinned in a
    unit test" into a queryable, oracle-verified metric.  At 100 TB the
    exact arm runs on a SAMPLE of queries (here all 8) — evaluation
    cost is queries×corpus, controlled by the query-set size, while the
    IVF arm stays candidates-only."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = _seeded_centroids(emb)
    corpus = emb.filter(F.col("vec_id") >= 8)
    queries_df = emb.filter(F.col("vec_id") < 8)
    approx = similarity.ivf_topk(
        corpus, queries_df, k=5, n_cells=16, n_probe=4, centroids=cents
    ).select("query_id", "match_id", F.lit(1).alias("__hit"))
    exact = similarity.cosine_topk(corpus, queries_df, k=5).select(
        "query_id", "match_id"
    )
    return (
        exact.join(F.broadcast(approx), ["query_id", "match_id"], "left")
        .groupBy("query_id")
        .agg(
            F.lit(5).cast("bigint").alias("k"),
            F.count("__hit").cast("bigint").alias("n_hit"),
            F.expr("cast((count(__hit) * 1000000L) div 5 as bigint)").alias(
                "recall_micro"
            ),
        )
    )


@query(
    "q113_rfm_segments",
    oracle="""
    WITH ref AS (
      -- floor() BEFORE the subtraction: epoch() is fractional and
      -- CAST(double AS BIGINT) ROUNDS in DuckDB while Spark's
      -- unix_timestamp truncates (the verify-skill recipe)
      SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) AS t_ref FROM events
    ), per_user AS (
      SELECT user_id,
             CAST((SELECT t_ref FROM ref)
                  - max(CAST(floor(epoch(ts)) AS BIGINT)) AS BIGINT) AS recency_s,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS monetary_cents
      FROM events
      GROUP BY user_id
    ), scored AS (
      SELECT user_id,
             ntile(5) OVER (ORDER BY recency_s ASC, user_id ASC)  AS r_score,
             ntile(5) OVER (ORDER BY frequency DESC, user_id ASC) AS f_score,
             ntile(5) OVER (ORDER BY monetary_cents DESC, user_id ASC) AS m_score,
             monetary_cents
      FROM per_user
    )
    SELECT r_score, f_score, m_score,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(monetary_cents) AS BIGINT) AS segment_cents
    FROM scored
    GROUP BY 1, 2, 3
    """,
)
def q113_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-value grid (recency /
    frequency / monetary quintiles): one event-scale map-side-combinable
    per-user fold, then three quintile assignments over the USER-sized
    frame, then the segment rollup.  A bare ``ntile() OVER (ORDER BY
    ...)`` would collapse the frame into ONE task (Spark warns and
    obeys) — so each quintile is computed scalably from
    ``sampling.global_positions`` (distributed range sort + partition
    offsets, the d18/q89 idiom) and the ntile bucket arithmetic
    replayed as an expression: first N%5 tiles get ceil(N/5) rows —
    bit-identical to SQL ntile(5), which is what the oracle runs.
    Every metric is integer (seconds, counts, cents) and every order
    carries a user_id tiebreak, so quintile boundaries are
    total-ordered and the whole grid value-checks at any parallelism."""
    from mapreducehs_spark.operators.sampling import global_positions_cached

    ev = _t(spark, sf_dir, "events")
    ref = ev.agg(F.max(F.unix_timestamp("ts")).alias("t_ref"))
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.unix_timestamp("ts")).alias("last_s"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100).cast("bigint"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "user_id",
            (F.col("t_ref") - F.col("last_s")).cast("bigint").alias("recency_s"),
            F.col("frequency"),
            # negated copies so every global_positions order is ASC
            (-F.col("frequency")).alias("neg_frequency"),
            "monetary_cents",
            (-F.col("monetary_cents")).alias("neg_monetary"),
        )
        .persist()  # read by the three position passes + the rollup
    )
    try:
        n_total = per_user.count()  # one scalar to the driver
        base, rem = n_total // 5, n_total % 5
        cut = rem * (base + 1)

        def tile(pos):
            # SQL ntile(5): first `rem` tiles hold base+1 rows.  ceil
            # via (a + b - 1) div b — the truncating integer `div` the
            # repo standardizes on, no float path; greatest() guards
            # the (unselected) base=0 branch under ANSI division
            big = F.lit(base + 1)
            small = F.greatest(F.lit(base), F.lit(1))
            return F.when(
                pos <= F.lit(cut), F.call_function("div", pos + big - 1, big)
            ).otherwise(
                F.lit(rem) + F.call_function("div", pos - F.lit(cut) + small - 1, small)
            )

        caches = []

        def score(order_cols, name):
            ranked, cache = global_positions_cached(
                per_user.select("user_id", *order_cols), order_cols + ["user_id"], "pos"
            )
            caches.append(cache)
            return ranked.select(
                "user_id", tile(F.col("pos")).cast("int").alias(name)
            )

        r = score(["recency_s"], "r_score")
        f = score(["neg_frequency"], "f_score")
        m = score(["neg_monetary"], "m_score")
        return (
            per_user.select("user_id", "monetary_cents")
            .join(r, "user_id")
            .join(f, "user_id")
            .join(m, "user_id")
            .groupBy("r_score", "f_score", "m_score")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_users"),
                F.sum("monetary_cents").cast("bigint").alias("segment_cents"),
            )
            .localCheckpoint()  # materialize the grid while per_user is cached
        )
    finally:
        per_user.unpersist(blocking=False)
        for c in caches:  # the three range-sorted position caches
            c.unpersist(blocking=False)


@query(
    "st14_stream_outer_join",
    oracle="""
    WITH clicks AS (
      SELECT event_id AS click_id, user_id, ts AS c_ts
      FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ), matched AS (
      SELECT c.user_id, c.click_id, p.purchase_id,
             CAST(floor(epoch(c.c_ts)) AS BIGINT) AS click_epoch,
             (p.purchase_id IS NOT NULL) AS matched
      FROM clicks c
      LEFT JOIN purchases p
        ON p.user_id = c.user_id
       AND p.p_ts >= c.c_ts
       AND p.p_ts <= c.c_ts + INTERVAL 30 MINUTE
    )
    SELECT user_id, click_id, purchase_id, click_epoch, matched FROM matched
    """,
)
def st14_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join (streaming/ops.
    clicks_left_outer_purchases) — the join shape st05's inner join
    can't express: every click emits, with purchase columns NULLed only
    once the watermark PROVES no match can arrive (state held exactly
    until click.ts + 30 min passes the watermark, then surrendered).
    The flush sentinel advances the watermark past every click, so the
    replayed stream equals the batch LEFT join — the NULL-emission
    path itself is what the oracle checks (unmatched clicks MUST
    appear exactly once).  At 100 TB state stays bounded by the join
    window exactly as in the inner case."""
    from mapreducehs_spark import streaming as st

    replay = st.prepare_stream_dir(spark, sf_dir, n_chunks=4, n_flush=2)
    joined = st.clicks_left_outer_purchases(
        st.events_stream(spark, replay), within="30 minutes", watermark="1 hour"
    )
    out = st.run_to_batch(joined, "st14_sink", output_mode="append")
    return out.filter(F.col("user_id") >= 0)


@query(
    "q114_cumulative_uniques",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(min(floor(epoch(ts) / 86400)) AS BIGINT) AS first_day
      FROM events
      GROUP BY user_id
    ), per_day AS (
      SELECT first_day AS day, CAST(count(*) AS BIGINT) AS new_users
      FROM firsts GROUP BY first_day
    )
    SELECT day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumulative_uniques
    FROM per_day
    """,
)
def q114_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new vs cumulative unique users — the growth-dashboard
    query that is O(n²) done naively (COUNT(DISTINCT) per day over an
    expanding window rescans everything): instead ONE user-keyed
    min-aggregate finds each user's first-seen day (map-side
    combinable), a day-keyed count gives new-users-per-day, and the
    cumulative sum runs over the DAY-sized frame — a few hundred rows
    at any corpus size, so the one global running-sum window is
    metadata-scale (the q105 manifest argument), not entity- or
    event-scale.  All integers; value-checks exactly."""
    ev = _t(spark, sf_dir, "events")
    firsts = (
        ev.select("user_id", F.floor(F.unix_timestamp("ts") / 86400).alias("day"))
        .groupBy("user_id")
        .agg(F.min("day").cast("bigint").alias("first_day"))
    )
    per_day = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_day.select(
        "day", "new_users", F.sum("new_users").over(w).cast("bigint").alias("cumulative_uniques")
    )


def _replayed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreducehs_spark import streaming as st

    replay = st.prepare_docs_stream_dir(spark, sf_dir, n_chunks=4)
    return st.docs_stream(spark, replay)


@query("st15_stream_minhash_dedup", oracle=_d11_oracle())
def st15_stream_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming INCREMENTAL near-dup dedup — d11's fully value-checked
    MinHash-LSH banding as bounded applyInPandasWithState state
    (streaming/ops.stateful_minhash_dedup): each arriving doc signs in
    one Arrow pass, lands in its 4 LSH band buckets, and emits
    candidate pairs against the bucket's current members with the
    signature-agreement count attached; buckets evict ``ttl_sec`` of
    event time after their newest member.  The replay span (doc_id
    seconds) sits far inside the TTL here, so no bucket evicts and the
    emitted pair set must equal batch d11 EXACTLY — the d11 oracle
    checks the streaming topology bit-for-bit (the st13 discipline:
    run the stream in its exact regime, value-check against batch).
    Bounded-state behavior itself is pinned separately with a short TTL
    in tests/test_streaming.py."""
    from mapreducehs_spark import streaming as st

    pairs = st.stateful_minhash_dedup(_replayed_docs(spark, sf_dir), ttl_sec=10**9)
    log = st.run_to_batch(pairs, "st15_sink", output_mode="append")
    return st.minhash_pairs_from_log(log, est_threshold=0.25)


#: Shared oracle tail for the multimodal canonical dedup (m11/m12):
#: takes a CTE ``h`` of (doc_id, lo, hi) 64-bit hashes and replays
#: hash64_canonical_dedup — exact-dup contraction to distinct hashes,
#: pigeonhole banding + popcount verify between hash reps, recursive-CTE
#: component closure, then (member, rep, class_size) broadcast back to
#: members.  The closure runs over DISTINCT HASHES, not members, so the
#: recursion stays tiny even when duplicate classes are huge.
_HASH64_CANONICAL_TAIL = """grp AS (
      SELECT lo, hi, min(doc_id) AS hrep, CAST(count(*) AS BIGINT) AS cnt
      FROM h GROUP BY lo, hi
    ), gbanded AS (
      SELECT hrep, b,
             CASE b WHEN 0 THEN lo & 65535 WHEN 1 THEN lo >> 16
                    WHEN 2 THEN hi & 65535 ELSE hi >> 16 END AS bk
      FROM grp, unnest(range(4)) tb(b)
    ), gcand AS (
      SELECT DISTINCT a.hrep AS ra, b.hrep AS rb
      FROM gbanded a JOIN gbanded b ON a.b = b.b AND a.bk = b.bk AND a.hrep < b.hrep
    ), pe AS (
      SELECT c.ra, c.rb
      FROM gcand c JOIN grp ga ON ga.hrep = c.ra JOIN grp gb ON gb.hrep = c.rb
      WHERE bit_count(xor(ga.lo, gb.lo)) + bit_count(xor(ga.hi, gb.hi)) <= 3
    ), edges AS (
      SELECT ra AS src, rb AS dst FROM pe UNION SELECT rb, ra FROM pe
    ), reach(src, dst) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.dst FROM edges e JOIN reach r ON e.dst = r.src
    ), comp AS (
      SELECT src AS hrep, min(dst) AS comp FROM reach GROUP BY src
    ), crep AS (
      SELECT g.lo, g.hi, g.cnt, coalesce(c.comp, g.hrep) AS comp
      FROM grp g LEFT JOIN comp c ON c.hrep = g.hrep
    ), sizes AS (
      SELECT comp, CAST(sum(cnt) AS BIGINT) AS class_size FROM crep GROUP BY comp
    )
    SELECT h.doc_id AS member, CAST(cr.comp AS BIGINT) AS rep, s.class_size
    FROM h JOIN crep cr ON cr.lo = h.lo AND cr.hi = h.hi
    JOIN sizes s ON s.comp = cr.comp
    WHERE h.doc_id != cr.comp
    """


#: m11's full oracle as a constant so m14's cross-modal composition can
#: embed the identical image-class replay as a subquery.
#: The ahash-from-doc_id law (cells → tot → bits → h(lo,hi)) shared by
#: m11's dedup oracle and m15's alignment-verification oracle.
_AHASH_CTES = """cells AS (
      SELECT doc_id, r, c,
             CAST(sum((doc_id * 31 + ((2 * r + br) * 32 + (4 * c + bc)) * 7) % 256)
                  AS BIGINT) AS cs
      FROM documents,
           unnest(range(8)) tr(r), unnest(range(8)) tc(c),
           unnest(range(2)) tbr(br), unnest(range(4)) tbc(bc)
      GROUP BY doc_id, r, c
    ), tot AS (
      SELECT doc_id, CAST(sum(cs) AS BIGINT) AS total FROM cells GROUP BY doc_id
    ), bits AS (
      SELECT cells.doc_id, (r * 8 + c) AS k,
             CASE WHEN cs * 64 > total THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      FROM cells JOIN tot USING (doc_id)
    ), h AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN k < 32 THEN bit << k ELSE 0 END) AS BIGINT) AS lo,
             CAST(sum(CASE WHEN k >= 32 THEN bit << (k - 32) ELSE 0 END) AS BIGINT) AS hi
      FROM bits GROUP BY doc_id
    )"""

_M11_ORACLE = "\n    WITH RECURSIVE " + _AHASH_CTES + ", " + _HASH64_CANONICAL_TAIL



@query("m11_phash_dedup", oracle=_M11_ORACLE)
def m11_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCEPTUAL-HASH image dedup — the multimodal member of the dedup
    suite (fifth blocking paradigm): real decode (PGM parse) + 8x8
    block-sum average hash fused in one Arrow stage
    (operators/multimodal.ahash_64), resolved to the CANONICAL output
    contract (member, rep, class_size) by
    dedup.hash64_canonical_dedup — the round-6 reshape of VERDICT r05's
    `weak` mark: the previous pairwise output grew 305 k → 30.8 M rows
    across sf0.1 → sf1 (quadratic in duplicate-class size); this
    composition contracts exact hash-dups FIRST (planted classes share
    one hash), runs pigeonhole banding + popcount verify + star-CC over
    DISTINCT hashes only, and emits one row per non-representative
    member — linear, the d15/d20/d21 discipline.  hamming <= 3 keeps
    the banding recall EXACT (< 4 differing bits cannot touch all four
    16-bit quarters).  At 100 TB: hashing is scan-shaped over the media
    store manifest (m05's pointer layout), the shuffle carries 64-bit
    hashes — never pixels — and no stage is quadratic in members."""
    from mapreducehs_spark.operators.multimodal import ahash_64, render_pgm_payloads

    docs = _t(spark, sf_dir, "documents")
    payloads = render_pgm_payloads(docs, "doc_id", width=32, height=16)
    return dedup.hash64_canonical_dedup(ahash_64(payloads), max_hamming=3)


#: s14's full oracle, a module constant so s15's multi-arm recall
#: report can embed the same PQ replay as a subquery.
_S14_ORACLE = """
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 1000) AS BIGINT)) AS v
      FROM embeddings
    ), cb AS (
      SELECT vec_id AS cid, v FROM e WHERE vec_id < 16
    ), corpus AS (
      SELECT vec_id, v FROM e WHERE vec_id >= 8
    ), q AS (
      SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8
    ), grid AS (
      SELECT m, d FROM range(4) tm(m), range(16) td(d)
    ), cdist AS (
      SELECT c.vec_id, g.m, cb.cid,
             CAST(sum((c.v[g.m * 16 + g.d + 1] - cb.v[g.m * 16 + g.d + 1])
                      * (c.v[g.m * 16 + g.d + 1] - cb.v[g.m * 16 + g.d + 1])) AS BIGINT) AS sq
      FROM corpus c, cb, grid g
      GROUP BY 1, 2, 3
    ), enc AS (
      SELECT vec_id, m, cid AS code FROM (
        SELECT vec_id, m, cid,
               row_number() OVER (PARTITION BY vec_id, m ORDER BY sq ASC, cid ASC) AS rn
        FROM cdist
      ) WHERE rn = 1
    ), qtab AS (
      SELECT q.query_id, g.m, cb.cid,
             CAST(sum((q.qv[g.m * 16 + g.d + 1] - cb.v[g.m * 16 + g.d + 1])
                      * (q.qv[g.m * 16 + g.d + 1] - cb.v[g.m * 16 + g.d + 1])) AS BIGINT) AS sq
      FROM q, cb, grid g
      GROUP BY 1, 2, 3
    ), adc AS (
      SELECT qt.query_id, en.vec_id AS match_id, CAST(sum(qt.sq) AS BIGINT) AS adc
      FROM enc en JOIN qtab qt ON qt.m = en.m AND qt.cid = en.code
      GROUP BY 1, 2
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adc ASC, match_id ASC
      ) AS rank FROM adc
    )
    SELECT query_id, match_id, adc, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    """


@query("s14_pq_adc_topk", oracle=_S14_ORACLE)
def s14_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT-QUANTIZATION ANN (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search") — the third ANN paradigm
    after IVF cells (s06) and SRP-LSH (s07), and the one that changes
    the MEMORY story: the corpus is stored as 4-byte PQ codes (one
    subspace-codebook index per 16-dim quarter), ~128x smaller than the
    raw vectors, and each query scans codes with an Asymmetric Distance
    Computation table — 4 lookups + 3 adds per corpus vector, no
    floating-point per-pair math.  At 100 TB that is the difference
    between an index that fits executor memory and one that doesn't;
    encode is one Arrow pass, the ADC scan is one Arrow pass with the
    8 query tables broadcast (model-sized driver state, the s05/s06
    discipline), and the per-query top-k lowers to WindowGroupLimit.

    Determinism: vectors quantize to integer milli-units (s08 recipe),
    codebooks are the FIRST 16 vectors per subspace (fixed sample, no
    trained randomness — s06's convention), all distances are integer
    sums with lowest-index tie-breaks, so encode → tables → ADC → rank
    replays bit-for-bit in the DuckDB oracle."""
    import numpy as np
    import pandas as pd

    emb = _t(spark, sf_dir, "embeddings")
    qz = F.expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000) as bigint))")
    base = emb.select("vec_id", qz.alias("v"))
    M, DS, K = 4, 16, 16  # subspaces x dims-each, codebook size

    cb_rows = base.filter(F.col("vec_id") < K).orderBy("vec_id").collect()
    C = np.array([r["v"] for r in cb_rows], dtype=np.int64)  # (K, 64)
    Csub = C.reshape(K, M, DS).transpose(1, 0, 2)  # (M, K, DS)

    def encode_batches(it):
        for pdf in it:
            X = np.array(pdf["v"].to_list(), dtype=np.int64).reshape(len(pdf), M, DS)
            codes = np.empty((len(pdf), M), dtype=np.int64)
            for m in range(M):
                # (b, K) integer squared distances; argmin takes the
                # FIRST minimum — the lowest-cid tie-break the oracle uses
                d = ((X[:, m, None, :] - Csub[m][None, :, :]) ** 2).sum(axis=2)
                codes[:, m] = d.argmin(axis=1)
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "codes": list(codes)})

    corpus = base.filter(F.col("vec_id") >= 8)
    coded = corpus.mapInPandas(encode_batches, schema="vec_id long, codes array<bigint>")

    q_rows = base.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    qids = [int(r["vec_id"]) for r in q_rows]
    Q = np.array([r["v"] for r in q_rows], dtype=np.int64).reshape(len(qids), M, DS)
    # ADC tables: (n_q, M, K) integer squared distances query-subspace
    # -> centroid; a few KB — broadcast by closure capture
    qtab = ((Q[:, :, None, :] - Csub[None, :, :, :]) ** 2).sum(axis=3)

    def adc_batches(it):
        for pdf in it:
            codes = np.array(pdf["codes"].to_list(), dtype=np.int64)  # (b, M)
            outs = []
            for qi, qid in enumerate(qids):
                adc = qtab[qi][np.arange(M)[None, :], codes].sum(axis=1)
                outs.append(
                    pd.DataFrame(
                        {"query_id": qid, "match_id": pdf["vec_id"], "adc": adc}
                    )
                )
            yield pd.concat(outs, ignore_index=True)

    scored = coded.mapInPandas(
        adc_batches, schema="query_id long, match_id long, adc long"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc").asc(), F.col("match_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "match_id", "adc", F.col("rank").cast("bigint").alias("rank"))
    )


_Q115_FUNNEL_ORACLE = """
    WITH s1 AS (
      SELECT user_id, min(epoch(ts)) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(epoch(e.ts)) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND epoch(e.ts) > s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(epoch(e.ts)) AS t3
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch(e.ts) > s2.t2
      GROUP BY e.user_id
    ), funnel AS (
      SELECT s1.user_id, s1.t1, s2.t2, s3.t3
      FROM s1 LEFT JOIN s2 ON s2.user_id = s1.user_id
              LEFT JOIN s3 ON s3.user_id = s1.user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_viewed,
           CAST(count(t2) AS BIGINT) AS n_clicked,
           CAST(count(t3) AS BIGINT) AS n_purchased,
           CAST(count(CASE WHEN t3 - t1 <= 86400 THEN 1 END) AS BIGINT)
             AS n_completed_1d,
           CAST(count(t3) * 1000000 // count(*) AS BIGINT) AS conv_micro
    FROM funnel
    """


@query("q115_funnel_steps", oracle=_Q115_FUNNEL_ORACLE)
def q115_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRICT-ORDER funnel analysis (view → click → purchase) — the
    product-analytics staple q109's attribution does not cover: each
    step must occur strictly AFTER the user's previous step's first
    completion, plus a completion-window variant (first purchase within
    one day of the first view).  The sequential dependency (step k's
    earliest time depends on step k-1's) is expressed as a cascade of
    per-user conditional min-aggregates joined user-keyed — three
    narrow user-sized shuffles of pre-filtered events, never a per-user
    sort or whole-history materialization; at 100 TB each stage is a
    partial-aggregatable min over one event type, and the funnel frame
    is user-count-sized.  Epoch-second integers and a truncating
    integer conversion rate keep both engines bit-identical."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("t")
    )
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("t") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("t") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t3"))
    )
    funnel = s1.join(s2, "user_id", "left").join(s3, "user_id", "left")
    return funnel.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_viewed"),
        F.count("t2").cast("bigint").alias("n_clicked"),
        F.count("t3").cast("bigint").alias("n_purchased"),
        F.count(F.when(F.col("t3") - F.col("t1") <= 86400, 1))
        .cast("bigint")
        .alias("n_completed_1d"),
        F.expr("(count(t3) * 1000000L) div count(*)").cast("bigint").alias("conv_micro"),
    )


def _d21_oracle() -> str:
    """d21: component-min closure over the d11 checked candidate graph
    (shared CTEs), replayed with a recursive CTE — the same closure
    d15's oracle uses, minus the exact-verify refinement stage."""
    ctes, agree, np_ = _minhash_checked_ctes()
    return f"""
    WITH RECURSIVE {ctes},
    est AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN sigs sa ON sa.doc_id = c.id_a JOIN sigs sb ON sb.doc_id = c.id_b
      WHERE ({agree}) / {float(np_)} >= 0.25
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM est
      UNION
      SELECT id_b, id_a FROM est
    ), reach(src, dst) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.dst FROM edges e JOIN reach r ON e.dst = r.src
    )
    SELECT src AS node, CAST(min(dst) AS BIGINT) AS rep
    FROM reach
    GROUP BY src
    HAVING src != min(dst)
    """


@query("d21_star_components", oracle=_d21_oracle())
def d21_star_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components via LARGE-STAR/SMALL-STAR alternation
    (operators/dedup.connected_components_star) over d11's checked
    MinHash candidate graph — the O(log² n)-round web-scale CC
    algorithm next to d06's hash-to-min label propagation, which needs
    O(diameter) rounds and straggles on chain-shaped duplicate
    clusters.  Both reach the same unique fixpoint (node → component
    minimum), so the star schedule value-checks against the
    recursive-CTE closure bit-for-bit; equivalence with the union-find
    resolver is additionally pinned in tests."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs_checked(docs, est_threshold=0.25).select(
        "id_a", "id_b"
    )
    return dedup.connected_components_star(pairs)


@query("st16_stream_funnel", oracle=_Q115_FUNNEL_ORACLE)
def st16_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming strict-order funnel — q115's cascade of conditional
    mins as a per-user state machine over the time-ordered replay
    (streaming/ops.stateful_funnel).  Event-time ordering makes each
    step's first-completion epoch final when set, so the sequential
    fold equals the batch law and q115's own oracle value-checks the
    streaming topology bit-for-bit (st13/st15's discipline: run the
    stream in its exact regime, check against batch).  Serving read =
    latest snapshot per user (st10's upsert shape) + the batch
    aggregate."""
    from mapreducehs_spark import streaming as st

    snapshots = st.stateful_funnel(_replayed_events(spark, sf_dir))
    log = st.run_to_batch(snapshots, "st16_sink", output_mode="append")
    return st.funnel_report_from_log(log)


@query(
    "m12_audio_fingerprint_dedup",
    oracle="""
    WITH RECURSIVE samples AS (
      SELECT doc_id, i,
             ('0x' || substr(md5((doc_id % 128)::VARCHAR || '_' || i::VARCHAR), 1, 4))::INT
               % 4096 - 2048 AS s
      FROM documents, unnest(range(256)) t(i)
    ), en AS (
      SELECT doc_id, i // 4 AS k, CAST(sum(s * s) AS BIGINT) AS e
      FROM samples GROUP BY 1, 2
    ), tot AS (
      SELECT doc_id, CAST(sum(e) AS BIGINT) AS te FROM en GROUP BY 1
    ), bits AS (
      SELECT en.doc_id, k,
             CASE WHEN e * 64 > te THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      FROM en JOIN tot USING (doc_id)
    ), h AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN k < 32 THEN bit << k ELSE 0 END) AS BIGINT) AS lo,
             CAST(sum(CASE WHEN k >= 32 THEN bit << (k - 32) ELSE 0 END) AS BIGINT) AS hi
      FROM bits GROUP BY doc_id
    ), """
    + _HASH64_CANONICAL_TAIL,
)
def m12_audio_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO near-dup dedup — completes the multimodal×dedup matrix
    (text: d-series, image: m11, audio: here): real WAV decode (RIFF
    chunk walk) fused with a 64-frame integer ENERGY fingerprint in one
    Arrow stage (operators/multimodal.audio_fingerprint_64), resolved
    to the canonical (member, rep, class_size) contract by
    dedup.hash64_canonical_dedup — m11's round-6 reshape: exact-dup
    contraction to distinct fingerprints, pigeonhole banding + popcount
    verify at hamming <= 3, star-CC resolution, linear output (the
    pairwise matrix the r05 audit flagged as quadratic never exists).
    The seeded media store (render_wav_payloads_seeded) plants
    duplicate classes via id mod 128 with md5-white samples, so the
    classes are the planted ones plus a negligible random tail.  Every
    stage is exact integer arithmetic, so decode → energies → threshold
    bits → banding → popcount → components replays bit-for-bit in
    DuckDB.  At 100 TB: fingerprints shuffle, audio bytes never do
    (m05's pointer story)."""
    from mapreducehs_spark.operators.multimodal import (
        audio_fingerprint_64,
        render_wav_payloads_seeded,
    )

    docs = _t(spark, sf_dir, "documents")
    payloads = render_wav_payloads_seeded(docs, "doc_id", seed_mod=128)
    return dedup.hash64_canonical_dedup(audio_fingerprint_64(payloads), max_hamming=3)


@query(
    "t28_logreg_train",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS term
      FROM documents
    ), feats AS (
      SELECT doc_id,
             ('0x' || substr(md5(term), 1, 12))::BIGINT % 64 AS bucket,
             CAST(count(*) AS BIGINT) AS x
      FROM toks GROUP BY 1, 2
    ), lab AS (
      SELECT doc_id,
             CASE WHEN n_chars >= 300 THEN 1::BIGINT ELSE 0::BIGINT END AS y
      FROM documents
    ), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    grid AS (SELECT CAST(unnest(range(0, 64)) AS BIGINT) AS bucket),
    -- step 1: w0 = 0, bias0 = 0 -> z = 0 -> p = 500000 micro
    r1 AS (
      SELECT doc_id, CAST(500000 - y * 1000000 AS BIGINT) AS r FROM lab
    ), g1 AS (
      SELECT f.bucket, CAST(sum(r1.r * f.x) AS BIGINT) AS g
      FROM r1 JOIN feats f USING (doc_id) GROUP BY 1
    ), gb1 AS (SELECT CAST(sum(r) AS BIGINT) AS g FROM r1),
    w1 AS (
      SELECT grid.bucket,
             CAST(0 - (coalesce(g1.g, 0) // nn.n) // 50 AS BIGINT) AS w
      FROM grid LEFT JOIN g1 USING (bucket), nn
    ), b1 AS (SELECT CAST(0 - (g // n) // 50 AS BIGINT) AS b FROM gb1, nn),
    -- step 2: margin with w1/b1, hard sigmoid, residual, gradient
    zf2 AS (
      SELECT f.doc_id, CAST(sum(w1.w * f.x) AS BIGINT) AS zf
      FROM feats f JOIN w1 USING (bucket) GROUP BY 1
    ), r2 AS (
      SELECT lab.doc_id,
             CAST(greatest(0, least(1000000,
                    ((coalesce(zf2.zf, 0) + b1.b) // 4) + 500000))
                  - lab.y * 1000000 AS BIGINT) AS r
      FROM lab LEFT JOIN zf2 USING (doc_id), b1
    ), g2 AS (
      SELECT f.bucket, CAST(sum(r2.r * f.x) AS BIGINT) AS g
      FROM r2 JOIN feats f USING (doc_id) GROUP BY 1
    ), gb2 AS (SELECT CAST(sum(r) AS BIGINT) AS g FROM r2),
    w2 AS (
      SELECT w1.bucket,
             CAST(w1.w - (coalesce(g2.g, 0) // nn.n) // 50 AS BIGINT) AS w
      FROM w1 LEFT JOIN g2 USING (bucket), nn
    ), b2 AS (
      SELECT CAST(b1.b - (gb2.g // nn.n) // 50 AS BIGINT) AS b FROM b1, gb2, nn
    )
    SELECT w1.bucket, w1.w AS w_step1, w2.w AS w_final
    FROM w1 JOIN w2 USING (bucket)
    UNION ALL
    SELECT CAST(-1 AS BIGINT) AS bucket, b1.b AS w_step1, b2.b AS w_final
    FROM b1, b2
    """,
)
def t28_logreg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTED CLASSIFIER TRAINING (round 6, VERDICT r05 item 4) —
    the training half of the quality-classifier story whose inference
    half is t26: two full-batch gradient steps of hashed-feature
    logistic regression (hard-sigmoid surrogate, integer micro-unit
    fixed point) via operators/ml.logreg_train_hashed.  Per step: ONE
    scan-shaped pass over the persisted doc_id-partitioned feature
    stream with the 64-weight model BROADCAST, a co-partitioned
    residual join, and a 64-key gradient aggregation; driver state is
    dim+1 integers (the s05/s11 driver-loop discipline).  Every
    arithmetic step is truncating-integer (Spark div == DuckDB //), so
    the oracle replays both steps bit-for-bit unrolled.  Label: length
    proxy y = (n_chars >= 300); the plan is label-agnostic.  At 100 TB
    each step is exactly one corpus scan — the gradient shuffle carries
    64 keys per partition, never documents."""
    from mapreducehs_spark.operators.ml import logreg_train_hashed

    docs = _t(spark, sf_dir, "documents")
    return logreg_train_hashed(docs, n_buckets=64, n_steps=2, label_chars=300)


_S16_ORACLE = """
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[], x -> CAST(floor(x * 1000) AS BIGINT)) AS v
      FROM embeddings
    ), coarse AS (
      SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16
    ), corpus AS (
      SELECT vec_id, v FROM e WHERE vec_id >= 8
    ), q AS (
      SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8
    ), dims AS (
      SELECT CAST(unnest(range(64)) AS BIGINT) AS d
    ), adist AS (
      SELECT c.vec_id, co.cid,
             CAST(sum((c.v[dims.d + 1] - co.cv[dims.d + 1])
                      * (c.v[dims.d + 1] - co.cv[dims.d + 1])) AS BIGINT) AS sq
      FROM corpus c, coarse co, dims
      GROUP BY 1, 2
    ), assign AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY sq ASC, cid ASC) AS rn
        FROM adist
      ) WHERE rn = 1
    ), resid AS (
      SELECT c.vec_id, a.cell, dims.d,
             c.v[dims.d + 1] - co.cv[dims.d + 1] AS r
      FROM corpus c JOIN assign a USING (vec_id)
           JOIN coarse co ON co.cid = a.cell, dims
    ), cb AS (
      SELECT pqid, d, r FROM (
        SELECT dense_rank() OVER (ORDER BY vec_id ASC) - 1 AS pqid, d, r
        FROM resid WHERE vec_id >= 16
      ) WHERE pqid < 16
    ), edist AS (
      SELECT rs.vec_id, rs.d // 16 AS m, cb.pqid,
             CAST(sum((rs.r - cb.r) * (rs.r - cb.r)) AS BIGINT) AS sq
      FROM resid rs JOIN cb ON cb.d = rs.d
      GROUP BY 1, 2, 3
    ), enc AS (
      SELECT vec_id, m, pqid AS code FROM (
        SELECT vec_id, m, pqid,
               row_number() OVER (PARTITION BY vec_id, m ORDER BY sq ASC, pqid ASC) AS rn
        FROM edist
      ) WHERE rn = 1
    ), qdist AS (
      SELECT qq.query_id, co.cid,
             CAST(sum((qq.qv[dims.d + 1] - co.cv[dims.d + 1])
                      * (qq.qv[dims.d + 1] - co.cv[dims.d + 1])) AS BIGINT) AS sq
      FROM q qq, coarse co, dims
      GROUP BY 1, 2
    ), probes AS (
      SELECT query_id, cid AS cell FROM (
        SELECT query_id, cid,
               row_number() OVER (PARTITION BY query_id ORDER BY sq ASC, cid ASC) AS rn
        FROM qdist
      ) WHERE rn <= 4
    ), qresid AS (
      SELECT p.query_id, p.cell, dims.d,
             qq.qv[dims.d + 1] - co.cv[dims.d + 1] AS r
      FROM probes p JOIN q qq USING (query_id)
           JOIN coarse co ON co.cid = p.cell, dims
    ), qtab AS (
      SELECT qr.query_id, qr.cell, qr.d // 16 AS m, cb.pqid,
             CAST(sum((qr.r - cb.r) * (qr.r - cb.r)) AS BIGINT) AS sq
      FROM qresid qr JOIN cb ON cb.d = qr.d
      GROUP BY 1, 2, 3, 4
    ), adc AS (
      SELECT qt.query_id, en.vec_id AS match_id, a.cell,
             CAST(sum(qt.sq) AS BIGINT) AS adc
      FROM assign a
           JOIN enc en ON en.vec_id = a.vec_id
           JOIN qtab qt ON qt.cell = a.cell AND qt.m = en.m AND qt.pqid = en.code
      GROUP BY 1, 2, 3
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY adc ASC, match_id ASC
      ) AS rank FROM adc
    )
    SELECT query_id, match_id, CAST(cell AS BIGINT) AS cell, adc,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    """


def _s15_oracle() -> str:
    """Four-arm recall@5 oracle: the exact ground truth (s01's law on
    the vec_id >= 8 corpus) LEFT-joined against each ANN arm's own full
    oracle embedded as a subquery — IVF (s06's renderer at n_probe=4),
    SRP (s07's renderer), PQ (s14's replay), IVF-PQ (s16's replay).
    One oracle, four algorithm replays: any drift in any arm breaks
    this row too."""
    exact = """
    SELECT query_id, match_id FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS match_id,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                               c.embedding::DOUBLE[]) DESC,
                        c.vec_id ASC
             ) AS rank
      FROM embeddings q JOIN embeddings c ON c.vec_id >= 8 AND q.vec_id < 8
      WHERE q.vec_id != c.vec_id
    ) WHERE rank <= 5
    """
    arms = {
        "ivf": _ivf_checked_oracle(n_probe=4),
        "srp": _srp_checked_oracle(),
        "pq": _S14_ORACLE,
        "ivfpq": _S16_ORACLE,
    }
    arm_ctes = ",\n".join(
        f"a_{name} AS (SELECT query_id, match_id FROM ({sql}))"
        for name, sql in arms.items()
    )
    unions = "\n    UNION ALL\n".join(
        f"""SELECT '{name}' AS arm, x.query_id,
           CAST(count(a.match_id) AS BIGINT) AS n_hit
    FROM exact x LEFT JOIN a_{name} a USING (query_id, match_id)
    GROUP BY x.query_id"""
        for name in arms
    )
    return f"""
    WITH exact AS ({exact}),
    {arm_ctes},
    hits AS (
    {unions}
    )
    SELECT arm, query_id, CAST(5 AS BIGINT) AS k, n_hit,
           CAST((n_hit * 1000000) // 5 AS BIGINT) AS recall_micro
    FROM hits
    """


@query("s15_ann_recall_report", oracle=_s15_oracle())
def s15_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FOUR-ARM ANN QUALITY REPORT (round 6, VERDICT r05 item 5) —
    recall@5 of every ANN paradigm in the suite against the exact
    ground truth in one oracle-verified table: IVF cell probing (s06's
    seeded codebook), SRP-LSH banding (s07's seeded hyperplanes), PQ/ADC
    integer codes (s14), and their production composition IVF-PQ (s16)
    — the report answers the actual index-tuning question, what the
    residual-PQ composition costs in recall over its parts at the same
    probe budget.  Each arm is the REGISTERED query's own frame,
    so this report exercises the exact production plans (broadcast
    probes, Arrow kernels, WindowGroupLimit ranks); recall is integer
    micro-units — a value-checkable quantity, not a float summary.  At
    100 TB the exact arm runs on a query SAMPLE (here all 8), each ANN
    arm stays candidates-only; the report is the index-rebuild gate an
    embedding platform runs per build."""
    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 8)
    probes = emb.filter(F.col("vec_id") < 8)
    exact = similarity.cosine_topk(corpus, probes, k=5).select(
        "query_id", "match_id"
    )
    arms = {
        "ivf": QUERIES["s06_ann_ivf_checked"],
        "srp": QUERIES["s07_ann_srp_checked"],
        "pq": QUERIES["s14_pq_adc_topk"],
        "ivfpq": QUERIES["s16_ivfpq_adc_topk"],
    }
    reports = []
    for arm, fn in arms.items():
        approx = (
            fn(spark, sf_dir)
            .select("query_id", "match_id")
            .withColumn("__hit", F.lit(1))
        )
        reports.append(
            exact.join(F.broadcast(approx), ["query_id", "match_id"], "left")
            .groupBy("query_id")
            .agg(
                F.lit(5).cast("bigint").alias("k"),
                F.count("__hit").cast("bigint").alias("n_hit"),
                F.expr("cast((count(__hit) * 1000000L) div 5 as bigint)").alias(
                    "recall_micro"
                ),
            )
            .select(F.lit(arm).alias("arm"), "query_id", "k", "n_hit", "recall_micro")
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


@query("s16_ivfpq_adc_topk", oracle=_S16_ORACLE)
def s16_ivfpq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (round 6) — the FOURTH ANN entry composes the third
    and first the way billion-scale indexes actually do (Jegou et al.
    2011's IVFADC, the FAISS default): coarse cells bound COMPUTE
    (each query scans n_probe/n_cells of the corpus — s06's win), PQ
    codes over the cell RESIDUALS bound MEMORY (n_sub bytes per vector
    — s14's win, and quantizing residuals instead of raw vectors puts
    the codebook's resolution exactly where the probed candidates
    live).  Codebooks are data-seeded (coarse: the 16 lowest vec_ids,
    s06's convention; PQ: residuals of the 16 lowest non-centroid
    corpus ids), all distances integer with lowest-index tie-breaks, so
    assign -> residual -> encode -> probe -> ADC -> rank replays
    bit-for-bit in DuckDB.  Plan: one Arrow encode pass, a broadcast
    probe join on the cell id (IVF pruning happens in the JVM hash
    join), one Arrow ADC lookup pass, WindowGroupLimit top-k — see
    operators/similarity.ivfpq_adc_topk for the 100 TB layout story."""
    import numpy as np

    emb = _t(spark, sf_dir, "embeddings")
    qz = F.expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000) as bigint))")
    base = emb.select("vec_id", qz.alias("v"))
    cb_rows = base.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()
    coarse = np.array([r["v"] for r in cb_rows], dtype=np.int64)
    return similarity.ivfpq_adc_topk(
        base.filter(F.col("vec_id") >= 8),
        base.filter(F.col("vec_id") < 8),
        coarse,
        k=5,
        n_probe=4,
        n_pq=16,
        n_sub=4,
    )


@query("st17_stream_inference", oracle=_T26_ORACLE)
def st17_stream_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING model inference (round 6) — t26's hashed-linear quality
    classifier over the document stream as a STATELESS map
    (streaming/ops.hashed_linear_score_stream): tokenize + md5-fold +
    weight-law fold per row, no state store, no watermark, no shuffle —
    the streaming counterpart of the broadcast-model inference pass,
    showing that classifier scoring adds ZERO streaming machinery (the
    scan IS the throughput bound).  Batch t26's oracle value-checks the
    stream bit-for-bit (the st13/st15 stream==batch discipline)."""
    from mapreducehs_spark import streaming as st

    scored = st.hashed_linear_score_stream(_replayed_docs(spark, sf_dir))
    log = st.run_to_batch(scored, "st17_sink", output_mode="append")
    return log.select("doc_id", "n_feats", "score", "keep")


@query(
    "d22_semantic_dedup",
    oracle="""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[], x -> floor(x * 1000)) AS v
      FROM embeddings
    ), seeds AS (
      SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 32
    ), assign AS (
      SELECT vec_id, cluster FROM (
        SELECT e.vec_id, s.cid AS cluster,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_distance(e.v, s.cv) ASC, s.cid ASC
               ) AS rn
        FROM e, seeds s
      ) WHERE rn = 1
    ), nrm AS (
      SELECT vec_id, CAST(list_dot_product(v, v) AS BIGINT) AS n2 FROM e
    ), pairs AS (
      SELECT b.vec_id AS ib, a.vec_id AS ia,
             CAST(list_dot_product(ea.v, eb.v) AS BIGINT) AS dot,
             na.n2 AS n2a, nb.n2 AS n2b
      FROM assign a JOIN assign b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id
      JOIN nrm na ON na.vec_id = a.vec_id
      JOIN nrm nb ON nb.vec_id = b.vec_id
    ), dom AS (
      SELECT ib AS vec_id, min(ia) AS rep_id
      FROM pairs
      WHERE dot > 0 AND 25 * dot * dot >= 4 * n2a * n2b
      GROUP BY ib
    )
    SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
           coalesce(d.rep_id, a.vec_id) AS rep_id,
           (d.rep_id IS NULL) AS kept
    FROM assign a LEFT JOIN dom d USING (vec_id)
    """,
)
def d22_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC dedup (round 7, VERDICT r06 item 5) — the embedding-
    space paradigm that completes the dedup matrix along the
    token/fuzzy/SEMANTIC axis (SemDeDup, Abbas et al. 2023): cluster
    the corpus (integer squared-L2 assignment to the 32 lowest-vec_id
    seed vectors — the s06 data-seeded-codebook convention), then
    within each cluster drop every member near-identical (quantized
    cosine >= 0.4, s08's integer law as the exact cross-multiplication
    25*dot^2 >= 4*|a|^2*|b|^2) to a lower-id cluster-mate.  Threshold
    0.4 for the same reason as d05: this corpus plants no high-cosine
    dups (max pairwise cosine ~ 0.5-0.6), so 0.9 would be a vacuous
    empty-vs-empty match.  Output is the d20-style LINEAR contract
    (vec_id, cluster, rep_id, kept) — one row per vector, rep_id = the
    lowest dominating cluster-mate, pair matrix internal only.  Plan
    (pinned): one Arrow assignment pass against the broadcast seed
    matrix, ONE shuffle on cluster into a blocked-Gram Arrow dominance
    kernel — pairs never cross clusters, so cost is sum(|cluster|^2)
    with k scaling ~ n at 100 TB (operators/dedup.semantic_dedup)."""
    emb = _t(spark, sf_dir, "embeddings")
    return dedup.semantic_dedup(emb, n_clusters=32, tau_num=2, tau_den=5)


@query(
    "t29_logreg_minibatch",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS term
      FROM documents
    ), feats AS (
      SELECT doc_id,
             ('0x' || substr(md5(term), 1, 12))::BIGINT % 64 AS bucket,
             CAST(count(*) AS BIGINT) AS x
      FROM toks GROUP BY 1, 2
    ), lab AS (
      SELECT doc_id,
             CASE WHEN n_chars >= 300 THEN 1::BIGINT ELSE 0::BIGINT END AS y
      FROM documents
    ),
    s1 AS (
      SELECT doc_id FROM documents
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':1'), 1, 12))::BIGINT % 4 = 0
    ), n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s1),
    s2 AS (
      SELECT doc_id FROM documents
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':2'), 1, 12))::BIGINT % 4 = 0
    ), n2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s2),
    grid AS (SELECT CAST(unnest(range(0, 64)) AS BIGINT) AS bucket),
    -- step 1 on sample s1: w0 = 0, bias0 = 0 -> z = 0 -> p = 500000 micro
    r1 AS (
      SELECT lab.doc_id, CAST(500000 - y * 1000000 AS BIGINT) AS r
      FROM lab JOIN s1 USING (doc_id)
    ), g1 AS (
      SELECT f.bucket, CAST(sum(r1.r * f.x) AS BIGINT) AS g
      FROM r1 JOIN feats f USING (doc_id) GROUP BY 1
    ), gb1 AS (SELECT CAST(sum(r) AS BIGINT) AS g FROM r1),
    w1 AS (
      SELECT grid.bucket,
             CAST(0 - (coalesce(g1.g, 0) // n1.n) // 50 AS BIGINT) AS w
      FROM grid LEFT JOIN g1 USING (bucket), n1
    ), b1 AS (SELECT CAST(0 - (g // n) // 50 AS BIGINT) AS b FROM gb1, n1),
    -- step 2 on sample s2: margin with w1/b1, hard sigmoid, residual
    zf2 AS (
      SELECT f.doc_id, CAST(sum(w1.w * f.x) AS BIGINT) AS zf
      FROM feats f JOIN s2 USING (doc_id) JOIN w1 USING (bucket) GROUP BY 1
    ), r2 AS (
      SELECT lab.doc_id,
             CAST(greatest(0, least(1000000,
                    ((coalesce(zf2.zf, 0) + b1.b) // 4) + 500000))
                  - lab.y * 1000000 AS BIGINT) AS r
      FROM lab JOIN s2 USING (doc_id) LEFT JOIN zf2 USING (doc_id), b1
    ), g2 AS (
      SELECT f.bucket, CAST(sum(r2.r * f.x) AS BIGINT) AS g
      FROM r2 JOIN feats f USING (doc_id) GROUP BY 1
    ), gb2 AS (SELECT CAST(sum(r) AS BIGINT) AS g FROM r2),
    w2 AS (
      SELECT w1.bucket,
             CAST(w1.w - (coalesce(g2.g, 0) // n2.n) // 50 AS BIGINT) AS w
      FROM w1 LEFT JOIN g2 USING (bucket), n2
    ), b2 AS (
      SELECT CAST(b1.b - (gb2.g // n2.n) // 50 AS BIGINT) AS b FROM b1, gb2, n2
    )
    SELECT w1.bucket, w1.w AS w_step1, w2.w AS w_final
    FROM w1 JOIN w2 USING (bucket)
    UNION ALL
    SELECT CAST(-1 AS BIGINT) AS bucket, b1.b AS w_step1, b2.b AS w_final
    FROM b1, b2
    """,
)
def t29_logreg_minibatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MINI-BATCH classifier training (round 7, VERDICT r06 item 6) —
    t28's distributed logistic regression with a deterministic md5-fold
    SAMPLE per gradient step (operators/ml.logreg_train_minibatch,
    sample law: md5-fold(doc_id:step) % 4 == 0, s10's draw
    discipline), so per-step cost is corpus/4 instead of one full
    scan: the sublinear-per-step posture that turns "as many epochs as
    scans you can afford" (t28) into actual SGD economics at 100 TB.
    The sample predicate is a pushable FILTER on the persisted,
    doc_id-partitioned feature frame — the per-step plan prunes before
    the broadcast-model join (pinned in tests/test_plans.py).  Update
    law identical to t28 but normalized by the SAMPLE count; both
    steps replay bit-for-bit in the unrolled oracle, sampling
    included."""
    from mapreducehs_spark.operators.ml import logreg_train_minibatch

    docs = _t(spark, sf_dir, "documents")
    return logreg_train_minibatch(
        docs, n_buckets=64, n_steps=2, label_chars=300, sample_mod=4
    )


def _st18_oracle(n_chunks: int = 4, n_buckets: int = 64) -> str:
    """Unrolled online-SGD oracle: one integer gradient step per replay
    chunk, chunk membership replayed from the fixture's positional law
    (doc_id rank r -> chunk (r*n_chunks) div n; exact because every
    fixture SF's doc count divides by n_chunks).  Same truncating
    update law as t28/t29."""
    steps = []
    for s in range(n_chunks):
        steps.append(f"""
    zf{s} AS (
      SELECT f.doc_id, CAST(sum(w{s}.w * f.x) AS BIGINT) AS zf
      FROM feats f JOIN chunk c USING (doc_id) JOIN w{s} USING (bucket)
      WHERE c.step = {s} GROUP BY 1
    ), r{s} AS (
      SELECT lab.doc_id,
             CAST(greatest(0, least(1000000,
                    ((coalesce(z.zf, 0) + b{s}.b) // 4) + 500000))
                  - lab.y * 1000000 AS BIGINT) AS r
      FROM lab JOIN chunk c USING (doc_id) LEFT JOIN zf{s} z USING (doc_id), b{s}
      WHERE c.step = {s}
    ), g{s} AS (
      SELECT f.bucket, CAST(sum(r.r * f.x) AS BIGINT) AS g
      FROM r{s} r JOIN feats f USING (doc_id) GROUP BY 1
    ), gb{s} AS (SELECT CAST(sum(r) AS BIGINT) AS g FROM r{s}),
    n{s} AS (SELECT n FROM cnt WHERE step = {s}),
    w{s + 1} AS (
      SELECT w{s}.bucket,
             CAST(w{s}.w - (coalesce(g{s}.g, 0) // n{s}.n) // 50 AS BIGINT) AS w
      FROM w{s} LEFT JOIN g{s} USING (bucket), n{s}
    ), b{s + 1} AS (
      SELECT CAST(b{s}.b - (gb{s}.g // n{s}.n) // 50 AS BIGINT) AS b
      FROM b{s}, gb{s}, n{s}
    )""")
    unions = "\n    UNION ALL\n".join(
        f"""SELECT CAST({s + 1} AS BIGINT) AS step, bucket, w FROM w{s + 1}
    UNION ALL
    SELECT CAST({s + 1} AS BIGINT) AS step, CAST(-1 AS BIGINT) AS bucket, b AS w FROM b{s + 1}"""
        for s in range(n_chunks)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS term
      FROM documents
    ), feats AS (
      SELECT doc_id,
             ('0x' || substr(md5(term), 1, 12))::BIGINT % {n_buckets} AS bucket,
             CAST(count(*) AS BIGINT) AS x
      FROM toks GROUP BY 1, 2
    ), lab AS (
      SELECT doc_id,
             CASE WHEN length(text) >= 300 THEN 1::BIGINT ELSE 0::BIGINT END AS y
      FROM documents
    ), ranked AS (
      SELECT doc_id, row_number() OVER (ORDER BY doc_id ASC) - 1 AS rk FROM documents
    ), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    chunk AS (
      SELECT doc_id, CAST((rk * {n_chunks}) // nn.n AS BIGINT) AS step
      FROM ranked, nn
    ), cnt AS (
      SELECT step, CAST(count(*) AS BIGINT) AS n FROM chunk GROUP BY 1
    ), grid AS (SELECT CAST(unnest(range(0, {n_buckets})) AS BIGINT) AS bucket),
    w0 AS (SELECT bucket, CAST(0 AS BIGINT) AS w FROM grid),
    b0 AS (SELECT CAST(0 AS BIGINT) AS b),
    {",".join(steps)}
    {unions}
    """


@query("st18_stream_train", oracle=_st18_oracle())
def st18_stream_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING (online) model training (round 7) — completes the
    train/infer × batch/stream matrix: t28 batch-train, t29 mini-batch
    train, t26 batch-infer, st17 stream-infer, and HERE online SGD
    where each replayed micro-batch (st15/st17's deterministic 4-chunk
    doc_id-ordered fixture) is one integer-law gradient step
    (streaming/ops.streaming_logreg_train via foreachBatch — the
    Spark-native online-learning topology).  Per batch: ONE scan of
    the new data with the current 64-weight model broadcast, one
    64-key gradient shuffle, a dim+1-int driver update; the output is
    the full per-step weight audit trail (step, bucket, w).  The
    oracle unrolls all four steps with chunk membership replayed from
    the fixture's positional law — the whole ONLINE trajectory,
    batch boundaries included, value-checks bit-for-bit."""
    from mapreducehs_spark import streaming as st

    return st.streaming_logreg_train(_replayed_docs(spark, sf_dir))


#: hash128_canonical_dedup's oracle tail: takes a CTE ``h`` of
#: (doc_id, w0..w3) 32-bit words and replays the 4x32-bit-band
#: composition — same closure-over-distinct-hashes shape as
#: _HASH64_CANONICAL_TAIL, wider bands.
_HASH128_CANONICAL_TAIL = """grp AS (
      SELECT w0, w1, w2, w3, min(doc_id) AS hrep, CAST(count(*) AS BIGINT) AS cnt
      FROM h GROUP BY w0, w1, w2, w3
    ), gbanded AS (
      SELECT hrep, b,
             CASE b WHEN 0 THEN w0 WHEN 1 THEN w1 WHEN 2 THEN w2 ELSE w3 END AS bk
      FROM grp, unnest(range(4)) tb(b)
    ), gcand AS (
      SELECT DISTINCT a.hrep AS ra, b.hrep AS rb
      FROM gbanded a JOIN gbanded b ON a.b = b.b AND a.bk = b.bk AND a.hrep < b.hrep
    ), pe AS (
      SELECT c.ra, c.rb
      FROM gcand c JOIN grp ga ON ga.hrep = c.ra JOIN grp gb ON gb.hrep = c.rb
      WHERE bit_count(xor(ga.w0, gb.w0)) + bit_count(xor(ga.w1, gb.w1))
            + bit_count(xor(ga.w2, gb.w2)) + bit_count(xor(ga.w3, gb.w3)) <= 3
    ), edges AS (
      SELECT ra AS src, rb AS dst FROM pe UNION SELECT rb, ra FROM pe
    ), reach(src, dst) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.dst FROM edges e JOIN reach r ON e.dst = r.src
    ), comp AS (
      SELECT src AS hrep, min(dst) AS comp FROM reach GROUP BY src
    ), crep AS (
      SELECT g.w0, g.w1, g.w2, g.w3, g.cnt, coalesce(c.comp, g.hrep) AS comp
      FROM grp g LEFT JOIN comp c ON c.hrep = g.hrep
    ), sizes AS (
      SELECT comp, CAST(sum(cnt) AS BIGINT) AS class_size FROM crep GROUP BY comp
    )
    SELECT h.doc_id AS member, CAST(cr.comp AS BIGINT) AS rep, s.class_size
    FROM h JOIN crep cr ON cr.w0 = h.w0 AND cr.w1 = h.w1 AND cr.w2 = h.w2 AND cr.w3 = h.w3
    JOIN sizes s ON s.comp = cr.comp
    WHERE h.doc_id != cr.comp
    """


@query(
    "m13_phash128_dedup",
    oracle="""
    WITH RECURSIVE cells AS (
      SELECT doc_id, r, c,
             CAST(sum((doc_id * 31 + ((4 * r + br) * 64 + (4 * c + bc)) * 7) % 256)
                  AS BIGINT) AS cs
      FROM documents,
           unnest(range(8)) tr(r), unnest(range(16)) tc(c),
           unnest(range(4)) tbr(br), unnest(range(4)) tbc(bc)
      GROUP BY doc_id, r, c
    ), tot AS (
      SELECT doc_id, CAST(sum(cs) AS BIGINT) AS total FROM cells GROUP BY doc_id
    ), bits AS (
      SELECT cells.doc_id, (r * 16 + c) AS k,
             CASE WHEN cs * 128 > total THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      FROM cells JOIN tot USING (doc_id)
    ), h AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN k // 32 = 0 THEN bit << (k % 32) ELSE 0 END) AS BIGINT) AS w0,
             CAST(sum(CASE WHEN k // 32 = 1 THEN bit << (k % 32) ELSE 0 END) AS BIGINT) AS w1,
             CAST(sum(CASE WHEN k // 32 = 2 THEN bit << (k % 32) ELSE 0 END) AS BIGINT) AS w2,
             CAST(sum(CASE WHEN k // 32 = 3 THEN bit << (k % 32) ELSE 0 END) AS BIGINT) AS w3
      FROM bits GROUP BY doc_id
    ), """
    + _HASH128_CANONICAL_TAIL,
)
def m13_phash128_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """128-BIT perceptual-hash dedup (round 7) — m11's composition at
    the fingerprint width SCALE.md's round-7 band-occupancy probe
    recorded as the billion-scale mitigation: the four pigeonhole
    bands are 32-bit words (multimodal.ahash_128 over a 64x32 render,
    8x16 block grid), so per-band bucket keys cap at 2^32 instead of
    2^16 and the candidate stage over N DISTINCT hashes is ~N^2/2^33
    pairs (~10^8 at N = 10^9, where the 16-bit-band law is ~10^13 —
    infeasible).  Same exact-recall guarantee (hamming <= 3 cannot
    touch all four words), same linear contract
    (dedup.hash128_canonical_dedup: contraction -> banding over
    distinct hashes -> popcount verify -> star-CC -> (member, rep,
    class_size)), and the whole pipeline — pixel law, 128 block sums,
    threshold bits, word packing, banding, closure — replays
    bit-for-bit in DuckDB."""
    from mapreducehs_spark.operators.multimodal import ahash_128, render_pgm_payloads

    docs = _t(spark, sf_dir, "documents")
    payloads = render_pgm_payloads(docs, "doc_id", width=64, height=32)
    return dedup.hash128_canonical_dedup(ahash_128(payloads), max_hamming=3)


#: t30/st19's shared mixture law, ONE definition (the d20/_quality_losers
#: discipline): per-source token totals → uniform-capped targets → ppm
#: acceptance rates → salted md5-fold per-doc draws.
_MIX_CTES = """
    tok AS (
      SELECT doc_id, source,
             CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))
                  AS BIGINT) AS n_tokens
      FROM documents
    ), src AS (
      SELECT source, CAST(sum(n_tokens) AS BIGINT) AS tokens_total
      FROM tok GROUP BY source
    ), tot AS (
      SELECT CAST(sum(tokens_total) AS BIGINT) AS total_tokens,
             CAST(count(*) AS BIGINT) AS n_sources
      FROM src
    ), rates AS (
      SELECT s.source, s.tokens_total,
             CAST(least(s.tokens_total, t.total_tokens // t.n_sources) AS BIGINT)
               AS target_tokens,
             CAST((least(s.tokens_total, t.total_tokens // t.n_sources) * 1000000)
                  // s.tokens_total AS BIGINT) AS accept_ppm
      FROM src s, tot t
    ), draws AS (
      SELECT doc_id, source, n_tokens,
             ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
               % 1000000 AS draw
      FROM tok
    )"""


def _mixture_tok(docs: DataFrame) -> DataFrame:
    """(doc_id, source, n_tokens) — the narrow mixture projection."""
    return docs.select(
        "doc_id", "source", F.size(text.tokens("text")).cast("bigint").alias("n_tokens")
    )


def _mixture_rates(tok: DataFrame) -> DataFrame:
    """(source, tokens_total, target_tokens, accept_ppm) — the
    data-dependent uniform-capped mixture rates.  Totals via an
    unpartitioned window over the ALREADY-AGGREGATED n_sources-row
    frame (bounded: domains, not docs — the single partition holds
    n_sources rows, never corpus rows), so building rates costs ONE
    corpus scan + one tiny shuffle."""
    src = tok.groupBy("source").agg(
        F.sum("n_tokens").cast("bigint").alias("tokens_total")
    )
    everything = Window.partitionBy()
    return (
        src.select(
            "source",
            "tokens_total",
            F.sum("tokens_total").over(everything).cast("bigint").alias("total_tokens"),
            F.count(F.lit(1)).over(everything).cast("bigint").alias("n_sources"),
        )
        .select(
            "source",
            "tokens_total",
            F.least(
                F.col("tokens_total"), F.expr("total_tokens div n_sources")
            ).cast("bigint").alias("target_tokens"),
        )
        .select(
            "source",
            "tokens_total",
            "target_tokens",
            F.expr("cast((target_tokens * 1000000L) div tokens_total as bigint)").alias(
                "accept_ppm"
            ),
        )
    )


def _mix_draw():
    """The per-doc acceptance draw: md5-fold of 'mix:<doc_id>' mod 1e6
    ('mix:' salt so the draw is independent of every other sampling law
    in the repo)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit("mix"), F.col("doc_id"))), 1, 12),
            16,
            10,
        ).cast("bigint")
        % 1_000_000
    )


@query(
    "t30_domain_mixture_sample",
    oracle=f"""
    WITH {_MIX_CTES}
    SELECT r.source, r.tokens_total, r.target_tokens, r.accept_ppm,
           CAST(coalesce(sum(CASE WHEN d.draw < r.accept_ppm THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS docs_kept,
           CAST(coalesce(sum(CASE WHEN d.draw < r.accept_ppm THEN d.n_tokens ELSE 0 END), 0)
                AS BIGINT) AS tokens_kept,
           CAST(coalesce(sum(CASE WHEN d.draw < r.accept_ppm THEN d.doc_id ELSE 0 END), 0)
                AS BIGINT) AS kept_id_sum
    FROM rates r JOIN draws d USING (source)
    GROUP BY 1, 2, 3, 4
    """,
)
def t30_domain_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA-DEPENDENT corpus mixture rebalancing — the domain-reweighting
    step of a pretraining pipeline (the DoReMi / temperature-resampling
    family), completing the sampling axis: q38 has FIXED per-stratum
    rates, q67 mixes with USER-GIVEN weights and target fraction —
    here both the targets and the rates are COMPUTED from the corpus,
    and the budget currency is TOKENS (what pretraining actually
    meters), not document counts: each source's acceptance rate is derived
    from its token share so no domain exceeds an equal share of the
    total token budget (over-represented domains are downsampled to
    total/n_sources tokens; under-represented ones keep everything).
    Two-pass shape that survives 100 TB: pass 1 aggregates per-source
    token totals (n_sources rows — a tiny shuffle), the rates come back
    as a BROADCAST (never a driver constant — the t28/s10 discipline),
    and pass 2 re-scans the narrow (doc_id, source, n_tokens) projection
    applying the md5-fold acceptance draw (d11 discipline, 'mix:' salt
    so the draw is independent of every other sampling law in the repo)
    as a pure per-row predicate.  Everything is integer fixed-point
    (ppm rates, truncating div — Spark `div` == DuckDB `//` here, both
    operands non-negative), so the whole mixture — rates, membership,
    and the kept-set witness sums — replays bit-for-bit in the oracle.
    Output is n_sources rows (sublinear), with docs_kept / tokens_kept /
    kept_id_sum witnessing the per-doc draws in aggregate.  (Law shared
    with st19's streaming application via _mixture_rates/_mix_draw —
    the rates and the draw live ONCE.)"""
    docs = _t(spark, sf_dir, "documents")
    tok = _mixture_tok(docs)
    rates = _mixture_rates(tok)
    kept = F.col("__draw") < F.col("accept_ppm")
    return (
        tok.join(F.broadcast(rates), "source")
        .withColumn("__draw", _mix_draw())
        .groupBy("source", "tokens_total", "target_tokens", "accept_ppm")
        .agg(
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("docs_kept"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("tokens_kept"),
            F.sum(F.when(kept, F.col("doc_id")).otherwise(0))
            .cast("bigint")
            .alias("kept_id_sum"),
        )
    )


def _s17_oracle(iters: int = 3) -> str:
    """s11's unrolled power-iteration chain + a projection tail: every
    corpus vector's quantized dot product with the final iterate."""
    return _s11_ctes(iters) + f"""
    , qe AS (
      SELECT vec_id,
             [CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS qv
      FROM embeddings
    )
    SELECT e.vec_id,
           CAST(sum(e.qv[p.j] * p.v) AS BIGINT) AS pc1_score
    FROM qe e, v{iters} p
    GROUP BY e.vec_id
    """


@query("s17_pca_projection", oracle=_s17_oracle())
def s17_pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA PROJECTION — s11's dominant eigenvector actually APPLIED to
    the corpus (the use-the-model step, as t26 is to t28): every
    embedding's first-principal-component score, the primitive behind
    PCA-based embedding compression, whitening, and drift monitoring.
    The eigenvector comes from _dominant_eigvec (s09 distributed Gram
    pass + 3 integer power iterations on model-sized driver state);
    the projection is ONE codegen scan — the dim int64 component
    coefficients are inlined as a literal array (model-sized broadcast,
    t26 discipline) and each row computes an exact int64
    zip_with/aggregate dot product against its quantized vector.  No
    shuffle at all after the Gram pass; output is linear (vec_id,
    pc1_score).  At 100 TB: Gram is O(batches·dim²) independent of
    corpus size, and the projection is scan-throughput-bound.
    Determinism: floor(x*1000) quantization + int64 arithmetic — the
    same law as the s11 oracle, so the projection value-checks
    bit-for-bit."""
    emb = _t(spark, sf_dir, "embeddings")
    dim, v = _dominant_eigvec(emb)
    varr = F.array(*[F.lit(int(x)).cast("long") for x in v])
    q = F.transform(
        F.col("embedding"), lambda x: F.floor(x.cast("double") * 1000).cast("long")
    )
    score = F.aggregate(
        F.zip_with(q, varr, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return emb.select("vec_id", score.alias("pc1_score"))


@query(
    "st19_stream_mixture",
    oracle=f"""
    WITH {_MIX_CTES}
    SELECT d.doc_id, d.source, d.n_tokens
    FROM draws d JOIN rates r USING (source)
    WHERE d.draw < r.accept_ppm
    """,
)
def st19_stream_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING corpus-mixture filtering — t30's domain-reweighting
    rates applied to the document STREAM (the batch/stream pairing
    st17 gave t26): rates come from the static corpus via
    _mixture_rates (the ONE mixture law), broadcast into a stateless
    stream-static join, and each arriving doc passes or drops on its
    salted md5-fold draw.  No state store, no watermark, no wide
    shuffle — corpus curation at stream ingest is a scan-bound map,
    which is the 100 TB posture for continuous data intake (rates
    re-derived in batch at whatever cadence, intake filtered against
    the current broadcast).  The replay fixture streams the SAME
    documents table the rates were built from, so t30's oracle CTEs
    value-check the stream's kept set bit-for-bit (the st13/st15/st17
    stream==batch discipline); output is linear in KEPT docs."""
    from mapreducehs_spark import streaming as st

    docs = _t(spark, sf_dir, "documents")
    rates = _mixture_rates(_mixture_tok(docs))
    kept = st.mixture_filter_stream(_replayed_docs(spark, sf_dir), rates)
    log = st.run_to_batch(kept, "st19_sink", output_mode="append")
    return log.select("doc_id", "source", "n_tokens")


# =========================================================================
# Round 7 (3): BM25 retrieval, weighted sampling without replacement,
# the end-to-end curation funnel, streaming mergeable moments
# =========================================================================

#: s18's fixed query-term set — chosen for IDF spread in the synthetic
#: vocabulary ('dup' is rare, df ~5% of docs; 'vector'/'scan' are common,
#: df ~76-80%), so the ranking is dominated by the rare term exactly as
#: BM25 intends.
_BM25_TERMS = ("dup", "vector", "scan")
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_sql_pieces() -> tuple[str, str, str]:
    """The three SQL fragments of the BM25 law, shared by s18's oracle
    and s19's retrieve-then-rerank oracle so both replay the ONE
    scoring expression (the _T26_ORACLE sharing discipline)."""
    tf_cols = ",\n             ".join(
        f"CAST(len(list_filter(tk, x -> x = '{t}')) AS BIGINT) AS tf_{t}"
        for t in _BM25_TERMS
    )
    df_cols = ",\n             ".join(
        f"CAST(sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in _BM25_TERMS
    )
    k1, b = _BM25_K1, _BM25_B
    term_scores = " + ".join(
        f"(ln(1 + (s.n_docs - s.df_{t} + 0.5) / (s.df_{t} + 0.5))"
        f" * (p.tf_{t} * {k1 + 1.0}))"
        f" / (p.tf_{t} + {k1} * ({1.0 - b} + {b} * ((p.dl * s.n_docs) / CAST(s.sum_dl AS DOUBLE))))"
        for t in _BM25_TERMS
    )
    return tf_cols, df_cols, term_scores


def _bm25_oracle() -> str:
    tf_cols, df_cols, term_scores = _bm25_sql_pieces()
    tf_out = ", ".join(f"p.tf_{t}" for t in _BM25_TERMS)
    return f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS tk
      FROM documents
    ), p AS (
      SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl,
             {tf_cols}
      FROM t
    ), s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS sum_dl,
             {df_cols}
      FROM p
    )
    SELECT p.doc_id, p.dl, {tf_out},
           round({term_scores}, 6) AS bm25
    FROM p, s
    WHERE {" + ".join(f"p.tf_{t}" for t in _BM25_TERMS)} > 0
    ORDER BY {term_scores} DESC, p.doc_id ASC
    LIMIT 20
    """


@query("s18_bm25_topk", oracle=_bm25_oracle())
def s18_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval (Robertson-Sparck Jones Okapi weighting,
    k1=1.2 b=0.75) — the lexical-ranking baseline every RAG stack pairs
    with the dense arms (s01 exact / s02-s16 ANN): score =
    sum_t idf(t) * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)), idf the
    non-negative ln(1+(N-df+0.5)/(df+0.5)) form.  The plan is built for
    a FIXED small query-term set, which is what retrieval serves: per-
    term tf comes from size(filter(tokens, =term)) — a codegen
    expression per term, NO explode and NO per-term scan, so the
    tokenize+project pass reads the corpus exactly once into a narrow
    (doc_id, dl, tf...) frame (checkpointed: 4 ints/doc, ~per-mille of
    corpus width).  Corpus statistics (N, sum_dl, per-term df) are ONE
    single-row aggregate of that frame, crossJoin-BROADCAST back (the
    t28/s10 no-driver-constants discipline), and the final ranking is
    TakeOrderedAndProject on candidates only (docs containing >=1 query
    term — the tf>0 disjunction filter), never a global sort.  At
    100 TB: scan-bound pass 1, statistics O(1), top-k via per-partition
    heaps; avgdl enters as (dl*N)/sum_dl in BOTH engines so float
    evaluation order is identical and the score replays bit-for-bit."""
    docs = _t(spark, sf_dir, "documents")
    scored, score, any_tf = _bm25_scored(docs)
    return (
        scored.filter(any_tf > 0)
        .withColumn("__score", score)
        .orderBy(F.col("__score").desc(), F.col("doc_id").asc())
        .limit(20)
        .select(
            "doc_id",
            "dl",
            *[f"tf_{t}" for t in _BM25_TERMS],
            F.round("__score", 6).alias("bm25"),
        )
    )


def _bm25_scored(docs: DataFrame):
    """s18's BM25 machinery, shared with s19's retrieve-then-rerank:
    returns (the checkpointed narrow per-doc frame cross-broadcast with
    the corpus statistics, the score column, the any-term filter) —
    exactly the expression tree s18 built inline before round 7, so the
    plan fingerprint is unchanged."""
    k1, b = _BM25_K1, _BM25_B
    toks = docs.select("doc_id", text.tokens("text").alias("tk"))
    proj = toks.select(
        "doc_id",
        F.size("tk").cast("bigint").alias("dl"),
        # NB: the lambda must be unary — F.filter reads a 2-arg lambda as
        # (element, index), so a `t=t` default-capture would compare
        # tokens against the array INDEX.  Hence the closure factory.
        *[
            F.size(F.filter("tk", (lambda term: lambda x: x == term)(t)))
            .cast("bigint")
            .alias(f"tf_{t}")
            for t in _BM25_TERMS
        ],
    ).localCheckpoint()
    stats = proj.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    score = None
    for t in _BM25_TERMS:
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{t}") + F.lit(0.5))
            / (F.col(f"df_{t}") + F.lit(0.5))
        )
        norm = F.col(f"tf_{t}") + F.lit(k1) * (
            F.lit(1.0 - b)
            + F.lit(b) * ((F.col("dl") * F.col("n_docs")) / F.col("sum_dl").cast("double"))
        )
        term = (idf * (F.col(f"tf_{t}") * F.lit(k1 + 1.0))) / norm
        score = term if score is None else score + term
    any_tf = sum(F.col(f"tf_{t}") for t in _BM25_TERMS)
    return proj.crossJoin(F.broadcast(stats)), score, any_tf


@query(
    "t31_weighted_sample",
    oracle="""
    WITH d AS (
      SELECT source, doc_id, CAST(n_chars AS BIGINT) AS w,
             ('0x' || substr(md5(text), 1, 8))::BIGINT AS h
      FROM documents
    ), keyed AS (
      SELECT source, doc_id, w,
             -ln((h + 1) / 4294967296.0) / w AS key
      FROM d
    )
    SELECT source, doc_id, w, round(key * 1000000, 4) AS cost_micro
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY source ORDER BY key ASC, doc_id ASC) AS rk
      FROM keyed
    )
    WHERE rk <= 25
    """,
)
def t31_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED sampling without replacement (Efraimidis-Spirakis A-ES
    via exponential races): per source, the 25 docs with the smallest
    key = -ln(u)/w, where u is the 32-bit content-hash draw (q37/q38's
    md5-prefix law, +1 so u is in (0,1]) and the weight w is n_chars —
    equivalent to drawing 25 docs sequentially with probability
    proportional to length, the length/quality-weighted variant of q38's
    uniform-rate stratified sample that curation pipelines use when
    "keep 25 per domain, preferring substantial documents".  No RNG and
    no transcendental ambiguity: u's mantissa is exact (power-of-two
    divisor), both engines evaluate the same -ln(u)/w with the platform
    libm (t17's discipline), and exact-duplicate texts (identical keys
    by construction) break ties on doc_id.  The plan is scan → per-row
    key → per-group top-k: Spark 4 plans the rank<=25 predicate as
    WindowGroupLimit (per-partition per-group heaps BEFORE the
    single exchange on source), so at 100 TB the shuffle carries
    ~25 rows per (input partition x source), never the corpus."""
    docs = _t(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast("bigint")
    key = -F.log((h + F.lit(1)) / F.lit(4294967296.0)) / F.col("w")
    keyed = docs.select(
        "source", "doc_id", F.col("n_chars").cast("bigint").alias("w"), F.col("text")
    ).withColumn("__key", key).drop("text")
    w_src = Window.partitionBy("source").orderBy(F.col("__key").asc(), F.col("doc_id").asc())
    return (
        keyed.withColumn("__rk", F.row_number().over(w_src))
        .filter(F.col("__rk") <= 25)
        .select(
            "source",
            "doc_id",
            "w",
            F.round(F.col("__key") * 1_000_000, 4).alias("cost_micro"),
        )
    )


#: t32's per-language mixture keep-rates (the q38 hash-threshold law,
#: applied AFTER quality + dedup instead of to the raw corpus).
_T32_RATES = {"en": 0.5, "de": 1.0, "fr": 0.75, "es": 0.75, "zh": 0.25}


def _t32_ctes() -> str:
    """The funnel stage-flag CTE block, shared by the t32 rollup oracle
    and the t41 provenance-audit oracle (one definition of the rules on
    BOTH engines)."""
    thr = _sampling.stratified_threshold_case_sql(_T32_RATES)
    return f"""
    WITH flagged AS (
      SELECT source, lang, doc_id, md5(text) AS h,
             CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))
                  AS BIGINT) AS n_tok,
             CAST(len(list_distinct(list_filter(regexp_split_to_array(text, '\\s+'),
                                                x -> x != ''))) AS BIGINT) AS n_uniq,
             CAST(n_chars AS BIGINT) AS n_chars
      FROM documents
    ), q AS (
      SELECT *, (n_chars >= 200 AND n_tok >= 40 AND 2 * n_uniq >= n_tok) AS q_ok
      FROM flagged
    ), canon AS (
      SELECT *,
             coalesce(q_ok AND doc_id = min(CASE WHEN q_ok THEN doc_id END)
                                       OVER (PARTITION BY h), FALSE) AS is_canon
      FROM q
    ), sampled AS (
      SELECT *, is_canon AND substr(h, 1, 8) < {thr} AS is_sampled
      FROM canon
    )"""


def _t32_oracle() -> str:
    return (
        _t32_ctes()
        + """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_raw,
           CAST(sum(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(sum(CASE WHEN is_canon THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical,
           CAST(sum(CASE WHEN is_sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           CAST(sum(CASE WHEN is_sampled THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_final
    FROM sampled
    GROUP BY source
    """
    )


@query("t32_curation_funnel", oracle=_t32_oracle())
def t32_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE END-TO-END CURATION PIPELINE in one plan — quality filter →
    exact dedup → mixture downsample → token budget, the four-stage
    composition a user of the reference runs as their whole corpus
    build, each stage reusing a law already value-checked in isolation:
    t12's integer-exact quality rules (length >= 200 chars, >= 40
    tokens, 2*distinct >= tokens), d01's canonical-per-content-hash
    (min doc_id, applied among quality SURVIVORS — stage order
    matters and is part of the checked semantics), q38's per-language
    hash-threshold mixture rates, and t27's surviving-token metering.
    The whole funnel is ONE pass over the corpus: tokens staged once
    per row (shared by two rules + the budget), stage flags computed as
    columns, canonical selection as a conditional-min window on the
    content hash, then a per-source conditional rollup — exactly TWO
    exchanges total (hash-partition by content hash, then the tiny
    source rollup), no joins, no recomputation of any stage.  At
    100 TB the window's partition key IS the dedup key (bounded groups
    — identical texts), so nothing skews beyond the duplicate-class
    size that exact dedup is built to collapse; every stage is
    integer-exact, so the funnel replays bit-for-bit in the oracle."""
    sampled = _t32_flags(_t(spark, sf_dir, "documents"))
    return sampled.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_raw"),
        F.sum(F.when(F.col("q_ok"), 1).otherwise(0)).cast("bigint").alias("n_quality"),
        F.sum(F.when(F.col("is_canon"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_canonical"),
        F.sum(F.when(F.col("is_sampled"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_sampled"),
        F.sum(F.when(F.col("is_sampled"), F.col("n_tok")).otherwise(0))
        .cast("bigint")
        .alias("tokens_final"),
    )


def _t32_flags(docs: DataFrame) -> DataFrame:
    """t32's per-doc stage flags, ONE definition (the _quality_losers
    discipline) — shared by the t32 rollup and the t41 provenance
    audit so the stage rules can never silently fork: columns
    (source, lang, doc_id, n_chars, h, n_tok, n_uniq,
    q_ok, is_canon, is_sampled)."""
    staged = docs.select(
        "source",
        "lang",
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.md5("text").alias("h"),
        text.tokens("text").alias("__tk"),
    ).select(
        "source",
        "lang",
        "doc_id",
        "n_chars",
        "h",
        F.size("__tk").cast("bigint").alias("n_tok"),
        F.size(F.array_distinct("__tk")).cast("bigint").alias("n_uniq"),
    )
    q_ok = (
        (F.col("n_chars") >= 200)
        & (F.col("n_tok") >= 40)
        & (2 * F.col("n_uniq") >= F.col("n_tok"))
    )
    flagged = staged.withColumn("q_ok", q_ok)
    w_h = Window.partitionBy("h")
    canon = flagged.withColumn(
        "is_canon",
        F.coalesce(
            F.col("q_ok")
            & (F.col("doc_id") == F.min(F.when(F.col("q_ok"), F.col("doc_id"))).over(w_h)),
            F.lit(False),
        ),
    )
    thr_expr = F.lit(_sampling.fraction_to_hex(0.0))
    for lang, rate in _T32_RATES.items():
        thr_expr = F.when(
            F.col("lang") == lang, F.lit(_sampling.fraction_to_hex(rate))
        ).otherwise(thr_expr)
    return canon.withColumn(
        "is_sampled", F.col("is_canon") & (F.substring("h", 1, 8) < thr_expr)
    )


@query(
    "st20_stream_moments",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(avg(coalesce(value, 0)), 4) AS mean_value,
           round(var_pop(coalesce(value, 0)), 4) AS var_value
    FROM events
    GROUP BY event_type
    """,
)
def st20_stream_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGEABLE MOMENTS (applyInPandasWithState): per-event-
    type running count/mean/M2 folded with the Chan-Golub-LeVeque
    pairwise merge — st03 proves the SUM law survives arbitrary trigger
    slicing; this proves the numerically-delicate VARIANCE law does
    (the naive E[x^2]-E[x]^2 form cancels catastrophically at large
    means; the Welford/Chan merge never subtracts large near-equal
    numbers, so the final state equals the batch two-pass var_pop to
    ~1 ulp no matter how the replay chunks the stream).  This is the
    drift-monitoring primitive of a continuous ingest pipeline —
    per-slice feature moments kept as THREE numbers per key, mergeable
    across executors, checkpoint-restartable like every state-backed op
    here.  Final snapshot (argmax update_seq per key) == the batch
    aggregate, value-checked against DuckDB's var_pop."""
    from mapreducehs_spark import streaming as st

    updates = st.stateful_moments(_replayed_events(spark, sf_dir))
    log = st.run_to_batch(updates, "st20_sink", output_mode="append")
    from mapreducehs_spark.streaming.ops import latest_moments

    return latest_moments(log)


@query(
    "q116_calibration_report",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS term
      FROM documents
    ), feats AS (
      SELECT doc_id, ('0x' || substr(md5(term), 1, 12))::BIGINT % 4096 AS bucket
      FROM toks
    ), weights AS (
      SELECT b.b AS bucket, (b.b * 2654435761) % 1000 - 500 AS w
      FROM (SELECT unnest(range(0, 4096)) AS b) b
    ), sc AS (
      SELECT doc_id, CAST(sum(w) AS BIGINT) AS score
      FROM feats JOIN weights USING (bucket) GROUP BY doc_id
    ), lab AS (
      SELECT s.doc_id, s.score,
             CASE WHEN d.n_chars >= 300 THEN 1 ELSE 0 END AS y,
             greatest(-2, least(5, s.score // 2000)) AS bin
      FROM sc s JOIN documents d USING (doc_id)
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(y) AS BIGINT) AS n_pos,
           CAST((sum(y) * 1000000) // count(*) AS BIGINT) AS pos_rate_micro,
           CAST(sum(score) // count(*) AS BIGINT) AS avg_score
    FROM lab
    GROUP BY bin
    """,
)
def q116_calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODEL CALIBRATION / LIFT report — the evaluation step that closes
    the classifier loop alongside accuracy-style readouts (q112's A/B,
    s13/s15's recall): bin the corpus by t26's integer margin score
    (fixed-width 2000-unit bins, clamped to [-2, 5] so the report
    width is data-independent) and compare each bin's OBSERVED positive
    rate (t28's label law, n_chars >= 300, in integer micro-units
    against the truncating-div discipline) with its average score — a
    monotone observed-rate column is what "the score ranks quality"
    actually means, and per-bin lift is what curation thresholds are
    chosen from.  Plan shape: t26's scan-side feature hashing +
    broadcast weights + per-doc partial-agg sum, one narrow self-join
    back to (doc_id, n_chars), then an 8-row rollup — the report costs
    one token-scale pass exactly like the inference it evaluates.
    Everything integer (scores, labels, micro-rates, truncating div ==
    DuckDB // toward zero on BOTH signs), so it replays bit-for-bit."""
    docs = _t(spark, sf_dir, "documents")
    feats = (
        docs.select("doc_id", F.explode_outer(text.tokens("text")).alias("term"))
        .filter(F.col("term").isNotNull())
        .select(
            "doc_id",
            (
                F.conv(F.substring(F.md5("term"), 1, 12), 16, 10).cast("bigint") % 4096
            ).alias("bucket"),
        )
    )
    weights = spark.range(4096).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * F.lit(2654435761)) % 1000 - 500).alias("w"),
    )
    sc = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("w").cast("bigint").alias("score"))
    )
    lab = sc.join(
        docs.select(
            "doc_id",
            F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("y"),
        ),
        "doc_id",
    ).withColumn(
        "bin", F.greatest(F.lit(-2), F.least(F.lit(5), F.expr("score div 2000")))
    )
    return lab.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.expr("cast((sum(y) * 1000000L) div count(*) as bigint)").alias(
            "pos_rate_micro"
        ),
        F.expr("cast(sum(score) div count(*) as bigint)").alias("avg_score"),
    )


# =========================================================================
# Round 7 (4): two-stage retrieval, leakage-safe corpus splitting,
# streaming bounded-ring anomaly detection
# =========================================================================


def _s19_oracle(n_cand: int = 100, k: int = 20) -> str:
    """Retrieve-then-rerank replay: s18's BM25 pieces rank the candidate
    pool (LIMIT ``n_cand`` under the identical float total order), then
    t26's hashed-linear law rescores EXACTLY those docs and the final
    top-``k`` comes from the integer rerank score — both stage laws are
    the committed s18/t26 oracles, composed."""
    tf_cols, df_cols, term_scores = _bm25_sql_pieces()
    any_tf = " + ".join(f"p.tf_{t}" for t in _BM25_TERMS)
    return f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS tk
      FROM documents
    ), p AS (
      SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl,
             {tf_cols}
      FROM t
    ), s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS sum_dl,
             {df_cols}
      FROM p
    ), cand AS (
      SELECT p.doc_id, {term_scores} AS bm25f
      FROM p, s
      WHERE {any_tf} > 0
      ORDER BY bm25f DESC, p.doc_id ASC
      LIMIT {n_cand}
    ), ranked AS (
      SELECT doc_id, bm25f,
             CAST(row_number() OVER (ORDER BY bm25f DESC, doc_id ASC) AS BIGINT)
               AS bm25_rank
      FROM cand
    ), toks AS (
      SELECT d.doc_id,
             unnest(list_filter(regexp_split_to_array(d.text, '\\s+'), x -> x != ''))
               AS term
      FROM documents d JOIN ranked r ON r.doc_id = d.doc_id
    ), feats AS (
      SELECT doc_id,
             ('0x' || substr(md5(term), 1, 12))::BIGINT % 4096 AS bucket
      FROM toks
    ), weights AS (
      SELECT b.b AS bucket, (b.b * 2654435761) % 1000 - 500 AS w
      FROM (SELECT unnest(range(0, 4096)) AS b) b
    ), rr AS (
      SELECT doc_id, CAST(sum(w) AS BIGINT) AS rerank_score
      FROM feats JOIN weights USING (bucket)
      GROUP BY doc_id
    )
    SELECT r.doc_id, r.bm25_rank, round(r.bm25f, 6) AS bm25,
           rr.rerank_score,
           CAST(row_number() OVER (ORDER BY rr.rerank_score DESC, r.doc_id ASC)
                AS BIGINT) AS final_rank
    FROM ranked r JOIN rr USING (doc_id)
    ORDER BY rr.rerank_score DESC, r.doc_id ASC
    LIMIT {k}
    """


@query("s19_retrieve_rerank", oracle=_s19_oracle())
def s19_retrieve_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-STAGE retrieval — the retrieve-then-rerank pipeline every
    production RAG/search stack runs (cheap recall stage, expensive
    precision stage on candidates only): s18's BM25 law pulls the
    top-100 lexical candidates, then t26's hashed-linear model rescores
    ONLY those 100 and the final top-20 ranks by the model margin.
    The output carries both ranks, so the rerank's reordering (the
    whole point of the stage) is visible and value-checked.  The scale
    contract is the composition itself: stage 1 is s18's scan-bound
    pass + TakeOrdered (never a global sort), and stage 2's model pass
    touches candidate docs ONLY — the 100-row candidate set broadcasts
    into a semi-join against the corpus scan, so the expensive scorer
    costs O(candidates), not O(corpus), exactly how a cross-encoder
    rerank is deployed at 100 TB (the model here is t26's deterministic
    weight law so DuckDB can replay both stages bit-for-bit; a real
    cross-encoder swaps into the same candidate-bounded plan).  The
    rank windows run on the 100-row candidate frame — single-partition
    by construction and bounded by n_cand, never corpus-sized."""
    docs = _t(spark, sf_dir, "documents")
    scored, score, any_tf = _bm25_scored(docs)
    cand = (
        scored.filter(any_tf > 0)
        .withColumn("__score", score)
        .orderBy(F.col("__score").desc(), F.col("doc_id").asc())
        .limit(100)
        .select("doc_id", "__score")
    )
    cand = cand.withColumn(
        "bm25_rank",
        F.row_number()
        .over(Window.orderBy(F.col("__score").desc(), F.col("doc_id").asc()))
        .cast("bigint"),
    ).localCheckpoint()  # 100 rows: pin the candidate set, broadcast below
    feats = (
        docs.join(F.broadcast(cand.select("doc_id")), "doc_id")
        .select("doc_id", F.explode_outer(text.tokens("text")).alias("term"))
        .filter(F.col("term").isNotNull())
        .select(
            "doc_id",
            (
                F.conv(F.substring(F.md5("term"), 1, 12), 16, 10).cast("bigint") % 4096
            ).alias("bucket"),
        )
    )
    weights = spark.range(4096).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * F.lit(2654435761)) % 1000 - 500).alias("w"),
    )
    rr = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("w").cast("bigint").alias("rerank_score"))
    )
    return (
        cand.join(rr, "doc_id")
        .withColumn(
            "final_rank",
            F.row_number()
            .over(Window.orderBy(F.col("rerank_score").desc(), F.col("doc_id").asc()))
            .cast("bigint"),
        )
        .orderBy(F.col("rerank_score").desc(), F.col("doc_id").asc())
        .limit(20)
        .select(
            "doc_id",
            "bm25_rank",
            F.round("__score", 6).alias("bm25"),
            "rerank_score",
            "final_rank",
        )
    )


def _d23_oracle() -> str:
    """d23: d07's committed drop-list law (the full checked-minhash →
    exact-Jaccard → recursive-closure composition) wrapped as a CTE,
    every document's class representative = coalesce(rep, self), and
    the split is the md5-fold of the REP (never the member) mod 10 —
    so the whole near-dup class lands in one split by construction."""
    inner = _d15_oracle(est_threshold=0.25, jaccard_threshold=0.6)
    fold = (
        "('0x' || substr(md5(CAST(coalesce(dl.rep_id, d.doc_id) AS VARCHAR)"
        " || ':split'), 1, 12))::BIGINT % 10"
    )
    return f"""
    WITH dl AS (
      SELECT * FROM ({inner}) AS q
    )
    SELECT d.doc_id,
           coalesce(dl.rep_id, d.doc_id) AS rep_id,
           CASE
             WHEN {fold} < 8 THEN 'train'
             WHEN {fold} = 8 THEN 'val'
             ELSE 'test'
           END AS split
    FROM documents d LEFT JOIN dl USING (doc_id)
    """


@query("d23_leakage_safe_split", oracle=_d23_oracle())
def d23_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split — the assignment every honest
    eval pipeline needs: splitting by per-document hash leaks whenever
    two near-duplicates straddle the boundary (the train/test
    contamination d08 measures after the fact), so the split key here
    is the NEAR-DUP CLASS REPRESENTATIVE, not the document.  d07's
    value-checked pipeline (checked MinHash-LSH candidates → exact
    Jaccard ≥ 0.6 → connected components) resolves each doc to its
    class rep; the md5-fold of the rep mod 10 buckets 80/10/10 into
    train/val/test; every member inherits its rep's bucket, so no
    near-dup pair can ever cross splits — the guarantee is structural,
    not statistical.  Output is one row per document (doc_id, rep_id,
    split): linear, the d20/d22 contract.  At 100 TB this adds ONE
    broadcast-sized left join onto the dedup pipeline the corpus
    already runs — the split is free once dedup exists, which is the
    operational argument for doing it this way (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    observed test-set leakage motivation)."""
    docs = _t(spark, sf_dir, "documents")
    drop = dedup.near_dedup_drop_list_checked(
        docs, est_threshold=0.25, jaccard_threshold=0.6
    )
    rep = F.coalesce(F.col("rep_id"), F.col("doc_id"))
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(rep.cast("string"), F.lit(":split"))), 1, 12),
            16,
            10,
        ).cast("bigint")
        % 10
    )
    return (
        docs.select("doc_id")
        .join(drop, "doc_id", "left")
        .select(
            "doc_id",
            rep.alias("rep_id"),
            F.when(bucket < 8, "train")
            .when(bucket == 8, "val")
            .otherwise("test")
            .alias("split"),
        )
    )


@query(
    "st21_stream_anomaly",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id,
             CAST(floor(value * 100) AS BIGINT) AS cents,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER
               (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING) AS BIGINT) AS trail_sum,
             count(*) OVER
               (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING) AS n_prev
      FROM events
    )
    SELECT user_id, event_id, cents, trail_sum
    FROM w
    WHERE n_prev = 8 AND cents * 8 > 3 * trail_sum
    """,
)
def st21_stream_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING anomaly detection with a BOUNDED RING BUFFER — the
    always-on spike monitor: per user, flag any event whose integer-
    cents amount exceeds 3× its trailing-8-event mean, tested as the
    exact cross-multiplication cents*8 > 3*sum(ring) (no division, no
    float state).  The state store holds exactly 8 longs per user —
    the st12/st13 bounded-state discipline — and emitted rows are
    linear in ANOMALIES.  Because the replay is event-time ordered and
    (user_id, ts) is unique, the sequential fold sees the batch
    window-frame order exactly, so the streaming topology value-checks
    against the batch ROWS-frame window aggregate (the st16
    order-sensitive stream==batch discipline).  This is the streaming
    twin of q36's trailing ROWS frames — the same law, held as live
    per-key state instead of a sort (streaming/ops.
    stateful_trailing_anomaly)."""
    from mapreducehs_spark import streaming as st

    flagged = st.stateful_trailing_anomaly(
        _replayed_events(spark, sf_dir), window=8, num=3
    )
    log = st.run_to_batch(flagged, "st21_sink", output_mode="append")
    return log.select("user_id", "event_id", "cents", "trail_sum")

@query(
    "d24_cdc_chunk_dedup",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
      FROM documents
    ), nt AS (
      SELECT * FROM toks WHERE len(t) >= 1
    ), pos AS (
      SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS j FROM nt
    ), cut AS (
      SELECT doc_id, j,
             CASE WHEN j >= 3 AND
                  ('0x' || substr(md5(array_to_string(t[j-2:j], ' ')), 1, 12))::BIGINT
                    % 16 = 0
             THEN 1 ELSE 0 END AS c
      FROM pos
    ), cid AS (
      SELECT doc_id, j,
             coalesce(sum(c) OVER (PARTITION BY doc_id ORDER BY j
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
      FROM cut
    ), spans AS (
      SELECT doc_id, chunk_id, min(j) AS j0, count(*) AS n_tokens
      FROM cid GROUP BY 1, 2
    ), chunks AS (
      SELECT s.doc_id, nt.source, s.n_tokens,
             substr(md5(array_to_string(t[s.j0 : s.j0 + s.n_tokens - 1], ' ')), 1, 16)
               AS chunk_hash
      FROM spans s JOIN nt USING (doc_id)
    ), docs_per AS (
      SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs_with
      FROM chunks GROUP BY 1
    )
    SELECT c.source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN n_docs_with >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_chunks,
           CAST(sum(CASE WHEN n_docs_with >= 2 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS dup_ratio_micro,
           CAST(sum(n_tokens) * 1000000 // count(*) AS BIGINT)
             AS avg_chunk_tokens_micro
    FROM chunks c JOIN docs_per USING (chunk_hash)
    GROUP BY 1
    """,
)
def d24_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking duplication profile per source — the
    storage-dedup boundary rule (Rabin fingerprinting; Xia et al. 2016
    FastCDC) applied to training text: a chunk ends wherever the
    3-gram ending at that token md5-folds to 0 mod 16 (expected chunk
    ~16 tokens), so chunk identities are INSERTION-STABLE — editing a
    document's opening paragraph reframes none of its later chunks,
    which is exactly the failure mode of d10's fixed-width chunks.
    Duplicated instance = chunk hash present in ≥ 2 distinct docs; the
    per-source report mirrors d10 so the two chunking disciplines are
    directly comparable on the same corpus.  All integer/md5-fold
    arithmetic (d11 discipline) → bit-for-bit oracle replay.
    Shape: scan-side gram hashing, ONE per-doc window for the
    cut→chunk-id prefix sum, hash-keyed chunk-frequency aggregation —
    zero pairwise work (operators/dedup.content_defined_chunks)."""
    docs = _t(spark, sf_dir, "documents")
    chunks = dedup.content_defined_chunks(docs, divisor=16)
    docs_per = chunks.groupBy("chunk_hash").agg(
        F.countDistinct("id").alias("n_docs_with")
    )
    return (
        chunks.join(docs_per, "chunk_hash")
        .groupBy(F.col("facet").alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("n_docs_with") >= 2, 1).otherwise(0)).alias(
                "dup_chunks"
            ),
            F.sum("n_tokens").alias("__sum_tokens"),
        )
        .select(
            "source",
            "n_chunks",
            "dup_chunks",
            F.expr("dup_chunks * 1000000L div n_chunks").alias("dup_ratio_micro"),
            F.expr("__sum_tokens * 1000000L div n_chunks").alias(
                "avg_chunk_tokens_micro"
            ),
        )
    )

def _m14_oracle() -> str:
    """m14: union of m11's image-phash class edges (the full m11 oracle
    embedded as a subquery) and d07's checked near-dup caption class
    edges (d15's renderer, the d23 embedding), closed with a
    recursive-CTE component min over documents — the cross-modal merge
    replayed relationally.  Outer CTE names are xm14_-prefixed because
    BOTH embedded oracles define ``edges``/``reach`` internally and
    DuckDB resolves an outer recursive CTE against the shadowing inner
    name (measured: 404 vs the correct 476 rows at sf0.01)."""
    txt = _d15_oracle(est_threshold=0.25, jaccard_threshold=0.6)
    return f"""
    WITH RECURSIVE xm14_img AS (
      SELECT member AS a, rep AS b FROM ({_M11_ORACLE}) tim
    ), xm14_txt AS (
      SELECT doc_id AS a, rep_id AS b FROM ({txt}) ttx
    ), xm14_e0 AS (
      SELECT a, b FROM xm14_img UNION SELECT a, b FROM xm14_txt
    ), xm14_edges AS (
      SELECT a AS src, b AS dst FROM xm14_e0 UNION SELECT b, a FROM xm14_e0
    ), xm14_reach(src, dst) AS (
      SELECT DISTINCT src, src FROM xm14_edges
      UNION
      SELECT e.src, r.dst FROM xm14_edges e JOIN xm14_reach r ON e.dst = r.src
    ), xm14_comp AS (
      SELECT src AS member, min(dst) AS comp FROM xm14_reach GROUP BY src
    ), xm14_sizes AS (
      SELECT comp, CAST(count(*) AS BIGINT) AS class_size
      FROM xm14_comp GROUP BY comp
    )
    SELECT c.member, CAST(c.comp AS BIGINT) AS rep, s.class_size
    FROM xm14_comp c JOIN xm14_sizes s USING (comp)
    WHERE c.member != c.comp
    """


@query("m14_crossmodal_dedup", oracle=_m14_oracle())
def m14_crossmodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-MODAL pair dedup — the image-text-pair curation rule
    (LAION-style corpora): two records are duplicates when EITHER the
    caption text is a near-duplicate OR the image is a perceptual
    near-duplicate, so each modality's class structure must be MERGED,
    not intersected.  Composition: m11's canonical image classes
    (real PGM decode → 64-bit ahash → hash64_canonical_dedup) and
    d07's checked caption near-dup drop list (MinHash-LSH candidates →
    exact Jaccard ≥ 0.6 → cluster resolution) are both already
    star-shaped edge sets; their union is closed by
    connected_components_star (d21's O(log² n)-round web-scale CC) and
    emitted in the linear canonical contract (member, rep,
    class_size).  A chain like "A shares a caption with B, B shares an
    image with C" correctly lands A, C in one class — exactly what
    per-modality dedup run separately misses.  Costs the sum of its
    two arms plus the closure, by construction.  At 100 TB: both edge
    sets carry ids/hashes only (never pixels or text), the union is
    edge-count-sized, and the closure is the d21 algorithm whose
    per-round cost is two aggregate+join passes."""
    from mapreducehs_spark.operators.multimodal import ahash_64, render_pgm_payloads

    docs = _t(spark, sf_dir, "documents")
    payloads = render_pgm_payloads(docs, "doc_id", width=32, height=16)
    img = dedup.hash64_canonical_dedup(ahash_64(payloads), max_hamming=3).select(
        F.col("member").alias("id_a"), F.col("rep").alias("id_b")
    )
    txt = dedup.near_dedup_drop_list_checked(
        docs, est_threshold=0.25, jaccard_threshold=0.6
    ).select(F.col("doc_id").alias("id_a"), F.col("rep_id").alias("id_b"))
    comp = dedup.connected_components_star(img.unionByName(txt))
    sizes = comp.groupBy("rep").agg(
        (F.count(F.lit(1)) + 1).cast("bigint").alias("class_size")
    )
    return (
        comp.join(sizes, "rep")
        .select(
            F.col("node").cast("bigint").alias("member"),
            F.col("rep").cast("bigint").alias("rep"),
            "class_size",
        )
    )

#: d09's derived re-ingest batch (re-crawls + edits), shared by d25.
_D25_BATCH_CTE = """
    batch AS (
      SELECT doc_id + 1000000 AS doc_id, source,
             CASE WHEN doc_id % 3 = 1 THEN text || ' updated' ELSE text END AS text
      FROM documents WHERE doc_id % 3 IN (0, 1)
    )"""


@query(
    "d25_bloom_dedup",
    oracle="""
    WITH """ + _D25_BATCH_CTE + """,
    hist AS (
      SELECT DISTINCT md5(text) AS h FROM documents
    ), hpos AS (
      SELECT ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || text), 1, 12))::BIGINT
               % 1048576 AS p
      FROM documents, unnest(range(4)) tj(j)
    ), bloom AS (
      SELECT p // 32 AS word, bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS w
      FROM hpos GROUP BY 1
    ), probe AS (
      SELECT b.doc_id, b.source,
             ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || b.text), 1, 12))::BIGINT
               % 1048576 AS p
      FROM batch b, unnest(range(4)) tj(j)
    ), hits AS (
      SELECT doc_id, source,
             min(CASE WHEN (bl.w >> CAST(p % 32 AS INT)) & 1 = 1
                      THEN 1 ELSE 0 END) AS all_set
      FROM probe LEFT JOIN bloom bl ON bl.word = p // 32
      GROUP BY 1, 2
    ), flags AS (
      SELECT h2.doc_id, h2.source, h2.all_set,
             CASE WHEN hist.h IS NOT NULL THEN 1 ELSE 0 END AS is_dup
      FROM hits h2
      JOIN batch USING (doc_id)
      LEFT JOIN hist ON md5(batch.text) = hist.h
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS batch_n,
           CAST(sum(all_set) AS BIGINT) AS n_bloom_pos,
           CAST(sum(is_dup) AS BIGINT) AS n_true_dup,
           CAST(sum(CASE WHEN all_set = 1 AND is_dup = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos,
           CAST(sum(CASE WHEN all_set = 1 AND is_dup = 0 THEN 1 ELSE 0 END)
                * 1000000
                // greatest(count(*) - sum(is_dup), 1) AS BIGINT) AS fpr_micro
    FROM flags
    GROUP BY 1
    """,
)
def d25_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup against a BLOOM-FILTER content index — the
    space-bounded sibling of d09: where d09 probes the exact per-doc
    hash index by shuffle join, d25 builds a k=4 / m=2^20-bit Bloom
    filter over history (dedup.bloom_text_index: seeded md5-folds,
    32-bit words, ONE partial-aggregatable bit_or shuffle) and
    BROADCASTS it to the increment scan — the index is O(m) bits no
    matter how big history grows, which is the play when history is
    100 TB and the nightly increment is GBs (Bloom 1970; the q92
    runtime-filter trick promoted to a persistent index).  Bloom
    positives that the exact md5 join refutes are FALSE POSITIVES; the
    report measures the realized FPR per source in integer micro-units
    (no false negatives is structural — every true dup's bits were
    set).  All integer/md5-fold arithmetic replays bit-for-bit in the
    oracle, including the filter words themselves."""
    docs = _t(spark, sf_dir, "documents")
    batch = docs.filter((F.col("doc_id") % 3).isin(0, 1)).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        "source",
        F.when(F.col("doc_id") % 3 == 1, F.concat(F.col("text"), F.lit(" updated")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    bloom = dedup.bloom_text_index(docs)
    probe = batch.select(
        "doc_id",
        "source",
        F.explode(F.array(*dedup._bloom_positions(F.col("text")))).alias("p"),
    ).withColumn("word", F.expr("p div 32"))
    hits = (
        probe.join(F.broadcast(bloom), "word", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.min(
                F.when(
                    F.expr("shiftright(w, CAST(p % 32 AS INT)) & 1") == 1, 1
                ).otherwise(0)
            ).alias("all_set")
        )
    )
    hist = docs.select(F.md5("text").alias("h")).distinct()
    flags = (
        hits.join(batch, ["doc_id", "source"])
        .join(hist, F.md5(F.col("text")) == F.col("h"), "left")
        .select(
            "source",
            "all_set",
            F.when(F.col("h").isNotNull(), 1).otherwise(0).alias("is_dup"),
        )
    )
    fp = F.sum(F.when((F.col("all_set") == 1) & (F.col("is_dup") == 0), 1).otherwise(0))
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).alias("batch_n"),
        F.sum("all_set").cast("bigint").alias("n_bloom_pos"),
        F.sum("is_dup").cast("bigint").alias("n_true_dup"),
        fp.cast("bigint").alias("n_false_pos"),
        F.expr(
            "CAST(sum(CASE WHEN all_set = 1 AND is_dup = 0 THEN 1 ELSE 0 END)"
            " * 1000000L div greatest(count(*) - sum(is_dup), 1) AS BIGINT)"
        ).alias("fpr_micro"),
    )


def _d26_oracle(threshold: float = 0.25) -> str:
    """Bipartite checked-MinHash decontamination oracle: the d11 CTE
    law (shingles → md5-fold ids → literal-seed signatures → banding)
    over ALL documents, split train/eval at candidate time, with d26's
    per-train-doc best-match tail.  ``threshold`` must be dyadic
    (k/16) so both engines compare identically."""
    from mapreducehs_spark.operators.dedup import (
        MINHASH_CHECK_BANDS,
        MINHASH_CHECK_NUM_PERM,
        minhash_check_seeds,
    )

    a, b = minhash_check_seeds()
    np_, nb = MINHASH_CHECK_NUM_PERM, MINHASH_CHECK_BANDS
    rows = np_ // nb
    mins = ",\n             ".join(
        f"min(({a[i]}*x + {b[i]}) % 2147483647) AS m{i}" for i in range(np_)
    )
    bkeys = ", ".join(
        "concat_ws('_', "
        + ", ".join(f"m{bi * rows + r}" for r in range(rows))
        + f") AS bk{bi}"
        for bi in range(nb)
    )
    unions = " UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band, bk{bi} AS bk FROM bandcols" for bi in range(nb)
    )
    agree = " + ".join(f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END" for i in range(np_))
    return f"""
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
      FROM documents
    ), pos AS (
      SELECT doc_id, t, unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS i FROM toks
    ), sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s FROM pos
    ), ids AS (
      SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS x FROM sh
    ), sigs AS (
      SELECT doc_id, {mins}
      FROM ids GROUP BY doc_id
    ), bandcols AS (
      SELECT doc_id, {bkeys} FROM sigs
    ), banded AS ({unions}),
    cand AS (
      SELECT DISTINCT t.doc_id AS id, e.doc_id AS eval_id
      FROM banded t JOIN banded e ON t.band = e.band AND t.bk = e.bk
      WHERE t.doc_id % 50 <> 0 AND e.doc_id % 50 = 0
    ), scored AS (
      SELECT c.id, c.eval_id, round(({agree}) / {float(np_)}, 6) AS est
      FROM cand c
      JOIN sigs sa ON sa.doc_id = c.id
      JOIN sigs sb ON sb.doc_id = c.eval_id
      WHERE ({agree}) / {float(np_)} >= {threshold}
    ), best AS (
      SELECT id, CAST(count(*) AS BIGINT) AS n_eval_matches, max(est) AS est_jaccard
      FROM scored GROUP BY id
    )
    SELECT b.id, b.n_eval_matches, min(s.eval_id) AS top_eval_id, b.est_jaccard
    FROM best b JOIN scored s ON s.id = b.id AND s.est = b.est_jaccard
    GROUP BY b.id, b.n_eval_matches, b.est_jaccard
    """


@query("d26_decontaminate_fuzzy", oracle=_d26_oracle())
def d26_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY eval-set decontamination — the MinHash complement of d08's
    exact 8-gram pass: catches PARAPHRASED benchmark leakage (reordered
    or lightly edited eval questions) that verbatim n-gram matching
    structurally misses.  The scale shape is the decontamination ideal:
    both sides build checked-law MinHash signatures with ZERO wide
    dependency (one row-local F.aggregate fold per doc —
    dedup.minhash_sigs_scan_shaped, plan is Scan→Filter→Project), the
    MB-scale eval side broadcasts twice (banded keys + signatures), and
    the TB-scale training scan meets it in map-side broadcast joins —
    the only shuffle anywhere is the final per-doc aggregate over
    contaminated candidates.  Per flagged training doc: match count,
    best-matching eval doc (lowest id at max estimate — deterministic),
    and the max estimated Jaccard.  Oracle replays signatures, banding,
    the bipartite candidate join and the best-match tail bit-for-bit
    (reference witness: the O1+O2 composition discipline,
    src/Core/MapReduceC.hs:22-104)."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return dedup.decontaminate_fuzzy(train, bench, est_threshold=0.25)


@query(
    "t33_balanced_shards",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))
               AS n_tokens
      FROM documents
    ), ranked AS (
      SELECT doc_id, n_tokens,
             row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS p
      FROM toks
    ), assigned AS (
      SELECT n_tokens,
             CASE WHEN (p // 8) % 2 = 0 THEN p % 8 ELSE 7 - (p % 8) END AS shard
      FROM ranked
    ), per AS (
      SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      FROM assigned GROUP BY shard
    ), tot AS (
      SELECT CAST(sum(total_tokens) AS BIGINT) AS grand FROM per
    )
    SELECT shard, n_docs, total_tokens,
           CAST(total_tokens * 8 * 1000000 // grand AS BIGINT) AS share_micro
    FROM per, tot
    """,
)
def t33_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced shard packing — the token-budget-equalized export step
    before distributed training: every data-parallel rank should get
    the same token count, not the same FILE count (a size-skewed shard
    straggles the whole step).  Docs sort by token count DESC (doc_id
    tiebreak) and snake (boustrophedon) over K=8 shards — the classic
    LPT-flavored balanced assignment that is pure ARITHMETIC on the
    global position, hence deterministic and engine-replayable, unlike
    greedy least-loaded-bin which is inherently sequential.  Positions
    come from sampling.global_positions_cached (range-partitioned
    distributed sort + per-partition offsets — never the single-task
    gather a bare row_number() collapses to); per-shard rollup is a
    K-row aggregate and the grand total meets it as a broadcast 1-row
    crossJoin (t20 discipline).  Reported per shard: doc count, token
    total, and its share in integer micro-units of the perfectly
    balanced 1e6 (truncating div — engine-exact)."""
    df, cache = _t33_build(spark, sf_dir)
    try:
        return df.localCheckpoint()  # materialize, then free the sorted cache
    finally:
        cache.unpersist(blocking=False)


def _t33_build(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """t33 pre-checkpoint builder (q107 discipline: the query returns a
    checkpointed 8-row result, so plan pins inspect THIS)."""
    from mapreducehs_spark.operators.sampling import global_positions_cached

    docs = _t(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id", F.size(text.tokens("text")).alias("n_tokens")
    ).withColumn("neg_tokens", -F.col("n_tokens"))
    pos, cache = global_positions_cached(keyed, ["neg_tokens", "doc_id"])
    p = F.col("pos") - 1
    shard = F.when(
        (p.cast("bigint") % 16) < 8, p.cast("bigint") % 8
    ).otherwise(7 - (p.cast("bigint") % 8))
    per = (
        pos.select("n_tokens", shard.alias("shard"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )
    tot = per.agg(F.sum("total_tokens").cast("bigint").alias("grand"))
    df = per.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_docs",
        "total_tokens",
        F.expr("CAST(total_tokens * 8 * 1000000L div grand AS BIGINT)").alias(
            "share_micro"
        ),
    )
    return df, cache


@query(
    "q117_cdc_merge",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             0 AS seq, 'U' AS op
      FROM orders WHERE o_orderkey % 10 < 8
    ), chg AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             CAST(round(o_totalprice * 100) AS BIGINT) + e * 100 AS cents,
             e AS seq,
             CASE WHEN (o_orderkey * e) % 5 = 0 THEN 'D' ELSE 'U' END AS op
      FROM orders, unnest([1, 2, 3]) te(e)
      WHERE (o_orderkey + e) % 4 = 0
    ), log_ AS (
      SELECT * FROM base UNION ALL SELECT * FROM chg
    ), latest AS (
      SELECT k, status, cents, seq, op,
             row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
      FROM log_
    )
    SELECT k AS o_orderkey, status, cents AS total_cents,
           CAST(seq AS BIGINT) AS last_seq
    FROM latest WHERE rn = 1 AND op = 'U'
    """,
)
def q117_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog merge — MERGE INTO / log-compaction semantics (the
    Delta/Hudi/Iceberg upsert primitive, Kafka compacted-topic law):
    base snapshot + ordered change stream of upserts and deletes fold
    to last-writer-wins per key.  The base rows enter the log as seq-0
    upserts, so the WHOLE merge is ONE keyed window — no join at all:
    row_number() per key over seq DESC, keep rn=1, drop tombstones.
    At 100 TB this is the compaction shape every LSM store runs: one
    key shuffle, and the rn<=1 filter lowers to WindowGroupLimit so
    each map task keeps only its local latest row per key BEFORE the
    exchange (plan-pinned) — the shuffle carries ~|live keys|, not
    |log|.  Change ops are synthesized deterministically from orders
    (3 epochs; (k+e)%4 selects, (k*e)%5 picks delete vs update) so the
    oracle replays the exact merge."""
    orders = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    base = orders.filter(F.col("o_orderkey") % 10 < 8).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        cents.alias("cents"),
        F.lit(0).alias("seq"),
        F.lit("U").alias("op"),
    )
    chg = (
        orders.select(
            "o_orderkey", "o_orderstatus", cents.alias("__cents"),
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("e"),
        )
        .filter((F.col("o_orderkey") + F.col("e")) % 4 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            (F.col("__cents") + F.col("e") * 100).alias("cents"),
            F.col("e").alias("seq"),
            F.when((F.col("o_orderkey") * F.col("e")) % 5 == 0, "D")
            .otherwise("U")
            .alias("op"),
        )
    )
    w = Window.partitionBy("k").orderBy(F.col("seq").desc())
    return (
        base.unionByName(chg)
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") == "U"))
        .select(
            F.col("k").alias("o_orderkey"),
            "status",
            F.col("cents").alias("total_cents"),
            F.col("seq").cast("bigint").alias("last_seq"),
        )
    )


def _m15_oracle(max_hamming: int = 3) -> str:
    """m15: the shared ahash-from-doc_id law (m11's _AHASH_CTES) joined
    against the deterministic swapped-pairing rule; flagged pairs are
    those whose decoded-image hash disagrees with the caption-derived
    expectation by more than ``max_hamming`` bits."""
    return f"""
    WITH {_AHASH_CTES}, pairs AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 3 THEN doc_id - 1 ELSE doc_id END AS img_of
      FROM documents
    )
    SELECT p.doc_id, p.img_of,
           CAST(bit_count(xor(ih.lo, ch.lo)) + bit_count(xor(ih.hi, ch.hi))
                AS BIGINT) AS hamming
    FROM pairs p
    JOIN h ih ON ih.doc_id = p.img_of
    JOIN h ch ON ch.doc_id = p.doc_id
    WHERE bit_count(xor(ih.lo, ch.lo)) + bit_count(xor(ih.hi, ch.hi)) > {max_hamming}
    """


@query("m15_alignment_verify", oracle=_m15_oracle())
def m15_alignment_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-MODAL ALIGNMENT VERIFICATION — the integrity filter an
    image-text-pair corpus runs before training (LAION-style curation:
    a crawl joins captions to images by URL, and join bugs / CDN
    rot / page edits silently SWAP pairs): re-derive each image's
    perceptual hash by actually DECODING the stored bytes (m11's fused
    PGM-parse + 8x8 block-sum aHash Arrow stage), derive the EXPECTED
    hash from the caption through the render law, and flag pairs
    disagreeing by more than 3 bits — the m11 threshold, so legitimate
    re-encodes survive and true swaps flag.  A deterministic corruption
    (every doc_id % 7 == 3 pair carries its predecessor's image) plays
    the broken crawl; swapped pairs whose two docs happen to be
    near-dup images correctly DON'T flag (their content agrees — the
    pairing is semantically fine), which the oracle reproduces because
    it replays the full hash law, not the corruption rule.  At 100 TB:
    one decode scan over the media store (hashes leave the Arrow
    batch, never rasters), two hash-keyed equi-joins carrying
    (id, 2x32-bit halves) only, output linear in FLAGGED pairs.  The
    hash frame is localCheckpointed once — two joins consume it
    without re-decoding the corpus (simhash_checked discipline)."""
    from mapreducehs_spark.operators.multimodal import ahash_64, render_pgm_payloads

    docs = _t(spark, sf_dir, "documents")
    payloads = render_pgm_payloads(docs, "doc_id", width=32, height=16)
    ih = ahash_64(payloads).localCheckpoint()
    pairs = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 3, F.col("doc_id") - 1)
        .otherwise(F.col("doc_id"))
        .alias("img_of"),
    )
    img = ih.select(
        F.col("id").alias("img_of"), F.col("lo").alias("ilo"), F.col("hi").alias("ihi")
    )
    cap = ih.select(
        F.col("id").alias("doc_id"), F.col("lo").alias("clo"), F.col("hi").alias("chi")
    )
    hamming = (
        F.bit_count(F.col("ilo").bitwiseXOR(F.col("clo")))
        + F.bit_count(F.col("ihi").bitwiseXOR(F.col("chi")))
    ).cast("bigint")
    return (
        pairs.join(img, "img_of")
        .join(cap, "doc_id")
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") > 3)
        .select("doc_id", "img_of", "hamming")
    )


@query(
    "t34_perplexity_buckets",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS term
      FROM documents
    ), doc_term AS (
      SELECT doc_id, source, term, count(*) AS c FROM toks GROUP BY 1, 2, 3
    ), freq AS (
      SELECT term, count(*) AS f FROM toks GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(f) AS DOUBLE) AS n FROM freq
    ), per_doc AS (
      SELECT d.doc_id, d.source,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(sum(c * CAST(floor(1e6 * ln(CAST(f AS DOUBLE) / n)) AS BIGINT))
                  AS BIGINT) AS s
      FROM doc_term d JOIN freq USING (term), tot
      GROUP BY d.doc_id, d.source
    ), keyed AS (
      SELECT doc_id, source, n_tokens, (s * 1000000) // n_tokens AS qk
      FROM per_doc
    ), ranked AS (
      SELECT source, n_tokens, qk,
             row_number() OVER (PARTITION BY source ORDER BY qk DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY source) AS ns
      FROM keyed
    )
    SELECT source, CAST((rn - 1) * 3 // ns AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(qk) AS BIGINT) AS min_qk,
           CAST(max(qk) AS BIGINT) AS max_qk,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM ranked
    GROUP BY 1, 2
    """,
)
def t34_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing — the head/middle/tail
    curation split (Wenzek et al. 2020): per source, docs rank by
    their unigram LM score (t17's exact law: libm micro-nats summed as
    integers, truncating fixed-point per-token quotient so the sort
    key is an engine-portable BIGINT) and split into fluency terciles
    by RANK, not by a percentile estimate.  The scale trap here is the
    obvious implementation — ntile(3) OVER (PARTITION BY source) puts
    each source (possibly 30 TB of a 100 TB corpus) in ONE task; this
    query instead ranks through sampling.global_positions_cached
    ordered by (source, -score, doc_id) — positions within a source
    are CONTIGUOUS in the global order, so local rank = pos − the
    source's min position, recovered by a sources-sized broadcast
    join.  Bucket = (rank−1)·3 div n_source: pure arithmetic,
    deterministic, window-free (plan-pinned).  Reported per (source,
    tercile): doc count, realized score boundaries (the min/max
    micro-nat keys — these ARE the CCNet cutoffs downstream filters
    reuse), token mass."""
    df, cache = _t34_build(spark, sf_dir)
    try:
        return df.localCheckpoint()  # materialize, then free the sorted cache
    finally:
        cache.unpersist(blocking=False)


def _t34_build(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """t34 pre-checkpoint builder (q107 discipline)."""
    from mapreducehs_spark.operators.sampling import global_positions_cached

    docs = _t(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    toks = (
        docs.select("doc_id", "source", text.tokens("text").alias("__t"))
        .repartition(par)
        .select("doc_id", "source", F.explode_outer("__t").alias("term"))
        .filter(F.col("term").isNotNull())
    )
    doc_term = toks.groupBy("doc_id", "source", "term").agg(
        F.count(F.lit(1)).alias("c")
    )
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("f"))
    total = freq.agg(F.sum("f").cast("double").alias("n"))
    scored = (
        freq.crossJoin(F.broadcast(total))
        .withColumn(
            "micro", text.micro_ln_udf()(F.col("f").cast("double") / F.col("n"))
        )
        .select("term", "micro")
    )
    keyed = (
        doc_term.join(F.broadcast(scored), "term")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(F.col("c") * F.col("micro")).cast("bigint").alias("__s"),
        )
        .withColumn("qk", F.expr("(__s * 1000000L) div n_tokens"))
        .withColumn("neg_qk", -F.col("qk"))
        .select("doc_id", "source", "n_tokens", "qk", "neg_qk")
    )
    pos, cache = global_positions_cached(keyed, ["source", "neg_qk", "doc_id"])
    srcagg = pos.groupBy("source").agg(
        F.min("pos").alias("p0"), F.count(F.lit(1)).alias("ns")
    )
    bucket = F.expr("(pos - p0) * 3 div ns")
    df = (
        pos.join(F.broadcast(srcagg), "source")
        .groupBy("source", bucket.cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("qk").alias("min_qk"),
            F.max("qk").alias("max_qk"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )
    return df, cache


@query(
    "t35_dsir_selection",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS term
      FROM documents
    ), b AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(term), 1, 12))::BIGINT % 1024 AS bk
      FROM toks
    ), tcnt AS (
      SELECT bk, CAST(count(*) AS BIGINT) AS c FROM b WHERE source = 'src0' GROUP BY 1
    ), rcnt AS (
      SELECT bk, CAST(count(*) AS BIGINT) AS c FROM b WHERE source <> 'src0' GROUP BY 1
    ), tn AS (
      SELECT CAST(coalesce(sum(c), 0) AS DOUBLE) AS n FROM tcnt
    ), rn_ AS (
      SELECT CAST(coalesce(sum(c), 0) AS DOUBLE) AS n FROM rcnt
    ), grid AS (
      SELECT unnest(range(1024)) AS bk
    ), w AS (
      SELECT g.bk,
             CAST(floor(1e6 * ln(CAST(coalesce(t.c, 0) + 1 AS DOUBLE) / (tn.n + 1024)))
                  AS BIGINT)
             - CAST(floor(1e6 * ln(CAST(coalesce(r.c, 0) + 1 AS DOUBLE) / (rn_.n + 1024)))
                  AS BIGINT) AS wm
      FROM grid g
      LEFT JOIN tcnt t ON t.bk = g.bk
      LEFT JOIN rcnt r ON r.bk = g.bk, tn, rn_
    ), scored AS (
      SELECT b.doc_id, b.source, CAST(sum(w.wm) AS BIGINT) AS importance_micro
      FROM b JOIN w ON w.bk = b.bk
      WHERE b.source <> 'src0'
      GROUP BY b.doc_id, b.source
    ), sel AS (
      SELECT * FROM scored ORDER BY importance_micro DESC, doc_id LIMIT 500
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_selected,
           CAST(sum(importance_micro) AS BIGINT) AS sum_importance_micro,
           CAST(min(importance_micro) AS BIGINT) AS cutoff_micro
    FROM sel
    GROUP BY source
    """,
)
def t35_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023): rank raw-pool docs
    by IMPORTANCE — the log-likelihood ratio between a target-domain
    hashed-feature unigram LM (src0 plays the curated target) and the
    raw-pool LM — and keep the top slice.  Features are md5-fold token
    hashes into 1024 buckets, both LMs are add-one-smoothed bucket
    distributions, and per-bucket log-ratios are exact integer
    micro-nats (floor(1e6·ln p), evaluated via the libm-pinned Arrow
    UDF on the 1024-row grid — t17's discipline), so every per-doc
    importance is an exact BIGINT sum.  Scale shape: both LMs are
    1024-row partial-aggregatable counts, the weight table BROADCASTS
    to the token scan, per-doc importance is one hash shuffle, the
    top-500 lowers to TakeOrderedAndProject (never a global sort), and
    the per-source report is a 20-row rollup.  At 100 TB this is the
    published recipe's exact shape: the target model is tiny, the raw
    scan is one pass, selection state is k docs."""
    docs = _t(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    toks = (
        docs.select("doc_id", "source", text.tokens("text").alias("__t"))
        .repartition(par)
        .select("doc_id", "source", F.explode_outer("__t").alias("term"))
        .filter(F.col("term").isNotNull())
    )
    bk = F.conv(F.substring(F.md5("term"), 1, 12), 16, 10).cast("bigint") % 1024
    b = toks.select("doc_id", "source", bk.alias("bk"))
    tcnt = b.filter(F.col("source") == "src0").groupBy("bk").agg(
        F.count(F.lit(1)).alias("tc")
    )
    rcnt = b.filter(F.col("source") != "src0").groupBy("bk").agg(
        F.count(F.lit(1)).alias("rc")
    )
    tn = tcnt.agg(F.coalesce(F.sum("tc"), F.lit(0)).cast("double").alias("tn"))
    rn = rcnt.agg(F.coalesce(F.sum("rc"), F.lit(0)).cast("double").alias("rn"))
    grid = spark.range(1024).select(F.col("id").alias("bk"))
    ml = text.micro_ln_udf()
    w = (
        grid.join(F.broadcast(tcnt), "bk", "left")
        .join(F.broadcast(rcnt), "bk", "left")
        .crossJoin(F.broadcast(tn))
        .crossJoin(F.broadcast(rn))
        .select(
            "bk",
            (
                ml(
                    (F.coalesce(F.col("tc"), F.lit(0)) + 1).cast("double")
                    / (F.col("tn") + 1024)
                )
                - ml(
                    (F.coalesce(F.col("rc"), F.lit(0)) + 1).cast("double")
                    / (F.col("rn") + 1024)
                )
            ).alias("wm"),
        )
    )
    scored = (
        b.filter(F.col("source") != "src0")
        .join(F.broadcast(w), "bk")
        .groupBy("doc_id", "source")
        .agg(F.sum("wm").cast("bigint").alias("importance_micro"))
    )
    sel = scored.orderBy(F.col("importance_micro").desc(), "doc_id").limit(500)
    return sel.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_selected"),
        F.sum("importance_micro").cast("bigint").alias("sum_importance_micro"),
        F.min("importance_micro").alias("cutoff_micro"),
    )


@query(
    "t36_repetition_filter",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
      FROM documents
    ), term_inst AS (
      SELECT doc_id, source, unnest(t) AS term FROM toks
    ), tc AS (
      SELECT doc_id, source, term, count(*) AS c FROM term_inst GROUP BY 1, 2, 3
    ), tok_doc AS (
      SELECT doc_id, source,
             CAST(max(c) * 1000000 // sum(c) AS BIGINT) AS toptok_micro,
             CAST(sum(c) AS BIGINT) AS n_tokens
      FROM tc GROUP BY 1, 2
    ), pos AS (
      SELECT doc_id, t, unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS i FROM toks
    ), g AS (
      SELECT doc_id, array_to_string(t[i:i+2], ' ') AS gram FROM pos
    ), gc AS (
      SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2
    ), gram_doc AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 1000000 // sum(c)
                  AS BIGINT) AS dup3_micro
      FROM gc GROUP BY 1
    ), per AS (
      SELECT td.doc_id, td.source, td.n_tokens, td.toptok_micro,
             coalesce(gd.dup3_micro, 0) AS dup3_micro
      FROM tok_doc td LEFT JOIN gram_doc gd ON gd.doc_id = td.doc_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN dup3_micro > 100000 OR toptok_micro > 200000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           CAST(sum(CASE WHEN dup3_micro > 100000 OR toptok_micro > 200000
                         THEN n_tokens ELSE 0 END) AS BIGINT) AS flagged_tokens,
           CAST(max(dup3_micro) AS BIGINT) AS max_dup3_micro,
           CAST(max(toptok_micro) AS BIGINT) AS max_toptok_micro
    FROM per
    GROUP BY source
    """,
)
def t36_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style INTRA-document repetition filter (Rae et al. 2021
    Table A1): the quality rules that catch boilerplate loops and
    keyword-stuffed spam that cross-document dedup structurally
    cannot — a doc flags when >10% of its 3-gram instances belong to
    repeated grams OR its most frequent token occupies >20% of the
    doc.  Both metrics are exact integer micro-units (truncating div),
    so the flag boundary is engine-exact.  Scale shape: two
    partial-aggregatable hash counts (per-doc term counts, per-doc
    gram counts) over ONE tokenize pass each, an id-keyed narrow left
    join to combine (docs too short for 3-grams repeat-score 0), and a
    sources-sized rollup — no pairwise work anywhere, the intra-doc
    complement of the d-series.  Reported per source: docs, flagged
    docs, flagged token mass (what the filter would remove), and the
    realized metric maxima."""
    docs = _t(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    staged = docs.select(
        "doc_id", "source", text.tokens("text").alias("__t")
    ).repartition(par)
    term_inst = staged.select(
        "doc_id", "source", F.explode_outer("__t").alias("term")
    ).filter(F.col("term").isNotNull())
    tc = term_inst.groupBy("doc_id", "source", "term").agg(
        F.count(F.lit(1)).alias("c")
    )
    tok_doc = tc.groupBy("doc_id", "source").agg(
        F.expr("CAST(max(c) * 1000000L div sum(c) AS BIGINT)").alias("toptok_micro"),
        F.sum("c").cast("bigint").alias("n_tokens"),
    )
    # gram INSTANCE counts need multiplicity, so shingles_of (which
    # dedups) doesn't apply — positional transform instead, guarded by
    # size >= 3 (sequence(1, 0) DESCENDS in Spark, the t21 trap)
    gc = (
        staged.filter(F.size("__t") >= 3)
        .select(
            "doc_id",
            F.explode_outer(
                F.transform(
                    F.sequence(F.lit(1), F.size("__t") - 2),
                    lambda i: F.concat_ws(" ", F.slice("__t", i, 3)),
                )
            ).alias("gram"),
        )
        .filter(F.col("gram").isNotNull())
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    gram_doc = gc.groupBy("doc_id").agg(
        F.expr(
            "CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 1000000L div sum(c)"
            " AS BIGINT)"
        ).alias("dup3_micro")
    )
    per = tok_doc.join(gram_doc, "doc_id", "left").select(
        "source",
        "n_tokens",
        "toptok_micro",
        F.coalesce(F.col("dup3_micro"), F.lit(0)).alias("dup3_micro"),
    )
    flagged = (F.col("dup3_micro") > 100000) | (F.col("toptok_micro") > 200000)
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(flagged, 1).otherwise(0)).cast("bigint").alias("n_flagged"),
        F.sum(F.when(flagged, F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("flagged_tokens"),
        F.max("dup3_micro").alias("max_dup3_micro"),
        F.max("toptok_micro").alias("max_toptok_micro"),
    )


@query(
    "st22_stream_bloom_dedup",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, ts, event_id,
             user_id || ':' || event_type AS kstr
      FROM events
    ), seqd AS (
      SELECT *,
             row_number() OVER (ORDER BY ts, event_id) AS seq,
             ('0x' || substr(md5('shard:' || kstr), 1, 12))::BIGINT % 8 AS shard
      FROM ev
    ), first_occ AS (
      SELECT kstr, user_id, event_type, shard, min(seq) AS s
      FROM seqd GROUP BY 1, 2, 3, 4
    ), pos AS (
      SELECT kstr, shard, s,
             ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || kstr), 1, 12))::BIGINT
               % 1048576 AS p
      FROM first_occ, unnest(range(4)) tj(j)
    ), first_set AS (
      SELECT shard, p, min(s) AS fs FROM pos GROUP BY 1, 2
    ), probe AS (
      SELECT f.kstr, f.user_id, f.event_type,
             min(CASE WHEN fs2.fs < f.s THEN 1 ELSE 0 END) AS all_prior
      FROM first_occ f
      JOIN pos p2 ON p2.kstr = f.kstr
      JOIN first_set fs2 ON fs2.shard = p2.shard AND fs2.p = p2.p
      GROUP BY 1, 2, 3
    )
    SELECT user_id, event_type FROM probe WHERE all_prior = 0
    """,
)
def st22_stream_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Bloom-filter dedup (streaming/ops.stateful_bloom_dedup)
    — the UNBOUNDED-key-space answer st12's watermark eviction can't
    give: per-shard state is 2^20 bits forever (d25's space-bounded
    index promoted to stream state), the trade being a measured
    false-positive rate.  Probe-then-insert per event in (ts,
    event_id) order makes the emitted set a deterministic function of
    the replay, so the DuckDB oracle replays the FILTER ITSELF
    relationally: a bit's set-time is the min first-occurrence seq
    over keys sharing its (shard, position), and a key emits iff some
    of its 4 bits was unset strictly before its own first occurrence.
    Value-checks the bounded-state operator INCLUDING its false
    positives — not just the happy path."""
    from mapreducehs_spark import streaming as st

    out = st.stateful_bloom_dedup(_replayed_events(spark, sf_dir), shards=8)
    return st.run_to_batch(out, "st22_sink", output_mode="append")


@query(
    "q118_k_anonymity",
    oracle="""
    WITH l0 AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS band,
             count(*) AS sz
      FROM customer GROUP BY 1, 2, 3
    ), l1 AS (
      SELECT c_nationkey, CAST(floor(c_acctbal / 5000) AS BIGINT) AS band,
             count(*) AS sz
      FROM customer GROUP BY 1, 2
    ), r0 AS (
      SELECT 0 AS level, CAST(count(*) AS BIGINT) AS n_classes,
             CAST(sum(sz) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_risk_classes,
             CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS n_risk_rows,
             CAST(max(sz) AS BIGINT) AS max_class_size
      FROM l0
    ), r1 AS (
      SELECT 1 AS level, CAST(count(*) AS BIGINT) AS n_classes,
             CAST(sum(sz) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_risk_classes,
             CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS n_risk_rows,
             CAST(max(sz) AS BIGINT) AS max_class_size
      FROM l1
    )
    SELECT CAST(level AS BIGINT) AS level, n_classes, n_rows, n_risk_classes,
           n_risk_rows, max_class_size
    FROM (SELECT * FROM r0 UNION ALL SELECT * FROM r1)
    """,
)
def q118_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ANONYMITY risk report (Sweeney 2002) — the re-identification
    audit a compliance pipeline runs beside t16's PII scrubbing: rows
    whose quasi-identifier combination (nation, market segment,
    account-balance band) lands in an equivalence class smaller than
    k=5 are re-identifiable by linkage.  Reported at two
    GENERALIZATION levels (the k-anonymity mitigation): level 0 =
    (nation, segment, $1000 bands), level 1 coarsens to (nation, $5000
    bands) — the level-1 risk mass shrinking against level 0 is the
    generalization working.  Scale shape: each level is ONE
    partial-aggregatable groupBy at table scale producing a
    classes-sized frame, the risk rollup is tiny, and no row-level
    data leaves the aggregate — at 100 TB this is two scans (or one
    with grouping sets if the QI lattice grows).  Band edges use
    floor() (IEEE-exact on both engines), never round()."""
    cust = _t(spark, sf_dir, "customer")

    def level(cols, div, lvl):
        classes = (
            cust.select(
                *cols, F.floor(F.col("c_acctbal") / div).cast("bigint").alias("band")
            )
            .groupBy(*cols, "band")
            .agg(F.count(F.lit(1)).alias("sz"))
        )
        return classes.agg(
            F.lit(lvl).cast("bigint").alias("level"),
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum("sz").cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("sz") < 5, 1).otherwise(0))
            .cast("bigint")
            .alias("n_risk_classes"),
            F.sum(F.when(F.col("sz") < 5, F.col("sz")).otherwise(0))
            .cast("bigint")
            .alias("n_risk_rows"),
            F.max("sz").cast("bigint").alias("max_class_size"),
        )
    return level(["c_nationkey", "c_mktsegment"], 1000, 0).unionByName(
        level(["c_nationkey"], 5000, 1)
    )


@query(
    "q119_csv_ingest_dlq",
    oracle="""
    WITH good AS (
      SELECT c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer WHERE c_custkey % 11 <> 3
    ), per AS (
      SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(cents) AS BIGINT) AS sum_cents
      FROM good GROUP BY 1
    ), dlq AS (
      SELECT CAST(-1 AS BIGINT) AS nationkey,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(0 AS BIGINT) AS sum_cents
      FROM customer WHERE c_custkey % 11 = 3
    )
    SELECT * FROM per UNION ALL SELECT * FROM dlq
    """,
)
def q119_csv_ingest_dlq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ERROR-TOLERANT text ingest with a dead-letter queue — m10's
    decode-DLQ discipline applied to the TEXT side of the house: a CSV
    export where every c_custkey % 11 == 3 row carries a malformed
    integer field (the upstream-system corruption every real ingest
    meets) is read back under PERMISSIVE mode with a declared
    ``_corrupt`` column — malformed rows surface there instead of
    failing the job (the FAILFAST alternative) or silently vanishing
    (DROPMALFORMED), and route to the DLQ row while clean rows proceed
    to the aggregate.  Exact-integer cents round-trip the text format
    (doubles through CSV are a formatting lottery; integer columns are
    not).  At 100 TB the CSV scan parallelizes per-split like any text
    source, the corrupt predicate is a scan-side filter, and the DLQ
    is linear in BAD rows.  The oracle replays the corruption rule
    from the parquet table — so the whole CSV round trip, the
    PERMISSIVE split, and the aggregate are value-checked."""
    import os
    import tempfile

    from mapreducehs_spark.sources.catalog import build_fixture_once, source_fingerprint

    tag = os.path.basename(os.path.normpath(sf_dir))
    fp = source_fingerprint(sf_dir, "customer")
    cust = _t(spark, sf_dir, "customer")

    def build(tmp: str) -> None:
        cents = F.round(F.col("c_acctbal") * 100).cast("bigint").cast("string")
        bad = F.col("c_custkey") % 11 == 3
        line = F.concat_ws(
            ",",
            F.col("c_custkey").cast("string"),
            F.col("c_name"),
            F.col("c_nationkey").cast("string"),
            F.when(bad, F.lit("@@")).otherwise(cents),
            F.col("c_mktsegment"),
        )
        cust.select(line.alias("value")).write.mode("overwrite").text(tmp)

    base = build_fixture_once(
        os.path.join(tempfile.gettempdir(), f"mapreducehs_csv_dlq_{tag}_{fp}"),
        build,
    )
    parsed = (
        spark.read.schema(
            "custkey bigint, name string, nationkey bigint, cents bigint,"
            " mktsegment string, _corrupt string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(base)
    )
    # ONE scan, one aggregate: good rows route by nationkey, corrupt
    # rows route to the -1 DLQ bucket via a derived key — also dodges
    # Spark's corrupt-column-only-query restriction without caching
    route = (
        F.when(F.col("_corrupt").isNull(), F.col("nationkey"))
        .otherwise(F.lit(-1))
        .cast("bigint")
    )
    return parsed.groupBy(route.alias("nationkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("_corrupt").isNull(), F.col("cents")).otherwise(0)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("sum_cents"),
    )


#: m16's frame-term ahash CTEs: m09's pixel law (id·31 + f·101 + 7i mod
#: 256) through the 8x8 block-sum bit rule per SAMPLED frame, majority-
#: pooled across frames {0,3,6} into one 64-bit (lo, hi) pair that
#: feeds the shared canonical-dedup tail.
_VIDEO_AHASH_CTES = """cells AS (
      SELECT doc_id, f, r, c,
             CAST(sum((doc_id * 31 + f * 101 + (r * 16 + 2 * c + bc) * 7) % 256)
                  AS BIGINT) AS cs
      FROM documents,
           unnest([0, 3, 6]) tf(f),
           unnest(range(8)) tr(r), unnest(range(8)) tc(c),
           unnest(range(2)) tbc(bc)
      GROUP BY 1, 2, 3, 4
    ), tot AS (
      SELECT doc_id, f, CAST(sum(cs) AS BIGINT) AS total
      FROM cells GROUP BY 1, 2
    ), fbits AS (
      SELECT cells.doc_id, cells.f, (r * 8 + c) AS k,
             CASE WHEN cs * 64 > total THEN 1 ELSE 0 END AS bit
      FROM cells JOIN tot ON tot.doc_id = cells.doc_id AND tot.f = cells.f
    ), vbits AS (
      SELECT doc_id, k,
             CASE WHEN sum(bit) >= 2 THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      FROM fbits GROUP BY 1, 2
    ), h AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN k < 32 THEN bit << k ELSE 0 END) AS BIGINT) AS lo,
             CAST(sum(CASE WHEN k >= 32 THEN bit << (k - 32) ELSE 0 END) AS BIGINT) AS hi
      FROM vbits GROUP BY 1
    )"""

_M16_ORACLE = "\n    WITH RECURSIVE " + _VIDEO_AHASH_CTES + ", " + _HASH64_CANONICAL_TAIL


@query("m16_video_dedup", oracle=_M16_ORACLE)
def m16_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO near-dup dedup — the last cell of the per-modality dedup
    matrix (text d-series, image m11, audio m12): every doc's 8-frame
    MRV clip (m09's real container) is demuxed, frame-sampled
    (0, 3, 6 — skipped frames never decoded), per-frame aHashed, and
    MAJORITY-POOLED into one 64-bit clip fingerprint inside a single
    Arrow stage (multimodal.video_majority_ahash) — temporal pooling
    is what makes it a VIDEO signature: per-frame noise can't flip a
    bit that most frames agree on.  The canonical tail is m11's
    unchanged (hash64_canonical_dedup: exact-hash contraction first,
    pigeonhole 4x16-bit banding with exact recall at hamming ≤ 3,
    star-CC resolution, linear (member, rep, class_size) output).  At
    100 TB: demux+hash is one scan over the media manifest, shuffles
    carry 64-bit fingerprints — never frames — and no stage is
    quadratic in members.  The oracle replays pixel law → block sums →
    per-frame bits → majority pool → banding → components
    relationally, end to end."""
    from mapreducehs_spark.operators.multimodal import (
        render_mrv_payloads,
        video_majority_ahash,
    )

    docs = _t(spark, sf_dir, "documents")
    payloads = render_mrv_payloads(docs, "doc_id", n_frames=8, width=16, height=8)
    return dedup.hash64_canonical_dedup(
        video_majority_ahash(payloads, every_n=3), max_hamming=3
    )


# =========================================================================
# Round 7 (6): late-interaction retrieval (MaxSim)
# =========================================================================

#: s20's embedding law: dim-4 integer token embeddings via the house
#: md5-fold (component j of token x = fold8(x || ':' || j) % 21 - 10,
#: range [-10, 10]) — the "hashing trick" stand-in for a learned token
#: table, chosen integer so MaxSim replays bit-for-bit in both engines.
_MAXSIM_DIM = 4
_MAXSIM_TERMS = _BM25_TERMS  # same fixed queries as s18: lexical vs late-interaction on one ranking task


def _maxsim_emb_sql(expr: str, j: int) -> str:
    return f"(('0x' || substr(md5({expr} || ':{j}'), 1, 8))::BIGINT % 21 - 10)"


def _maxsim_oracle() -> str:
    et = ", ".join(_maxsim_emb_sql("x", j) for j in range(_MAXSIM_DIM))
    mx_cols = ",\n             ".join(
        "CAST(list_max(list_transform(et, v -> "
        + " + ".join(
            _maxsim_emb_sql(f"'{t}'", j) + f" * v[{j + 1}]"
            for j in range(_MAXSIM_DIM)
        )
        + f")) AS BIGINT) AS mx_{t}"
        for t in _MAXSIM_TERMS
    )
    total = " + ".join(f"mx_{t}" for t in _MAXSIM_TERMS)
    return f"""
    WITH t AS (
      SELECT doc_id,
             list_distinct(list_filter(regexp_split_to_array(text, '\\s+'),
                                       x -> x != '')) AS tk
      FROM documents
    ), e AS (
      SELECT doc_id, list_transform(tk, x -> [{et}]) AS et
      FROM t WHERE len(tk) > 0
    ), m AS (
      SELECT doc_id,
             {mx_cols}
      FROM e
    )
    SELECT doc_id, mx_{_MAXSIM_TERMS[0]}, mx_{_MAXSIM_TERMS[1]}, mx_{_MAXSIM_TERMS[2]},
           CAST({total} AS BIGINT) AS maxsim
    FROM m
    ORDER BY maxsim DESC, doc_id ASC
    LIMIT 20
    """


@query("s20_maxsim_topk", oracle=_maxsim_oracle())
def s20_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATE-INTERACTION retrieval (MaxSim, the ColBERT scoring rule:
    Khattab & Zaharia 2020): score(q, d) = sum over query tokens of
    max over doc tokens of <e_q, e_t> — token-level interaction, the
    third retrieval paradigm next to lexical s18 (BM25) and
    single-vector dense s01/s02-s16, run on the SAME fixed query terms
    as s18 so the three paradigms rank one task.  Token embeddings are
    the dim-4 integer hashing-trick law (per-component md5 fold), so
    every score is an exact integer and the oracle replays bit-for-bit.
    The plan is ONE codegen scan: tokenize -> array_distinct (MaxSim
    over distinct tokens equals MaxSim over all tokens -- max is
    duplicate-blind) -> per-token embedding array via transform ->
    per-query-term array_max of the integer dot -> TakeOrderedAndProject
    top-20.  NO explode, NO shuffle except the top-k heap merge, and the
    per-token embedding array is built once and reused by all query
    terms.  At 100 TB: scan-bound with per-partition heaps, exactly
    s18's posture; swapping the hash law for a LEARNED token table is a
    broadcast join on token id against this same plan shape (the
    embedding column replaces the transform), which is why the
    late-interaction arm stays linear while storing per-TOKEN vectors
    is what ColBERT trades for its quality win."""
    docs = _t(spark, sf_dir, "documents")

    def comp(x, j):
        fold = F.conv(
            F.substring(F.md5(F.concat(x, F.lit(f":{j}"))), 1, 8), 16, 10
        ).cast("bigint")
        return fold % 21 - 10

    tk = F.array_distinct(text.tokens("text"))
    # empty-doc guard on the CHEAP precursor (rlike '\S' <=> the \s+
    # tokenizer yields >=1 token — same Java character class): a
    # size(et) > 0 filter would be pushed below the projection with the
    # embedding transform INLINED, running the 4-md5-per-token HOF
    # twice per row (the verify-skill trap #1)
    e = docs.filter(F.col("text").rlike(r"\S")).select(
        "doc_id",
        F.transform(
            tk, lambda x: F.array(*[comp(x, j) for j in range(_MAXSIM_DIM)])
        ).alias("et"),
    )

    def mx(term: str):
        eq = [comp(F.lit(term), j) for j in range(_MAXSIM_DIM)]
        dot = lambda v: sum(  # noqa: E731 — inline per-term dot
            eq[j] * F.element_at(v, j + 1) for j in range(_MAXSIM_DIM)
        )
        return F.array_max(F.transform("et", dot)).cast("bigint").alias(f"mx_{term}")

    scored = e.select("doc_id", *[mx(t) for t in _MAXSIM_TERMS])
    total = sum(F.col(f"mx_{t}") for t in _MAXSIM_TERMS)
    return (
        scored.withColumn("maxsim", total.cast("bigint"))
        .orderBy(F.col("maxsim").desc(), F.col("doc_id").asc())
        .limit(20)
    )


# =========================================================================
# Round 7 (7): approximate query processing (sampled estimate + SE)
# =========================================================================

#: q120's Bernoulli rate: p = 50/1000 = 1/20, chosen so the
#: Horvitz-Thompson scale-up (x20) and the variance constant
#: (1-p)/p^2 = (19/20)*400 = 380 are EXACT integers — the whole
#: estimator replays bit-for-bit with no float boundary.
_AQP_PERMILLE = 50


@query(
    "q120_aqp_estimates",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag, CAST(round(l_quantity) AS BIGINT) AS qty
      FROM lineitem
      WHERE ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                                CAST(l_linenumber AS VARCHAR) || ':aqp'), 1, 12))::BIGINT
            % 1000 < {_AQP_PERMILLE}
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_sample,
           CAST(count(*) * 20 AS BIGINT) AS n_est,
           CAST(sum(qty) * 20 AS BIGINT) AS sum_qty_est,
           CAST(floor(sqrt(CAST(380 * sum(qty * qty) AS DOUBLE))) AS BIGINT)
             AS se_floor
    FROM s GROUP BY l_returnflag
    """,
)
def q120_aqp_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPROXIMATE QUERY PROCESSING (BlinkDB-style sampled aggregation,
    Agarwal et al. 2013) — the estimate-with-error-bars paradigm the
    sketch tier (q34/q41/q53/q107) does not cover: those bound DISTINCT
    or QUANTILE error; this estimates plain SUM/COUNT from a Bernoulli
    sample with a per-group standard error.  The sample membership is
    the house md5-fold draw on (l_orderkey, l_linenumber) at p = 1/20,
    so the Horvitz-Thompson scale-up (*20) and the variance constant
    (1-p)/p^2 = 380 are exact integers; the SE is floor(sqrt(380 *
    sum(qty^2))) where the radicand stays integer-valued below 2^53, so
    the IEEE-correctly-rounded sqrt and the floor are engine-exact (the
    t17 transcendental discipline).  At 100 TB: the sample predicate is
    a scan-side codegen filter — and the production posture PERSISTS the
    sample (a bucket column or partition, exactly how BlinkDB stores
    stratified samples) so the scan READS ~p of the data; either way the
    shuffle carries only the sampled rows and the output is
    groups-sized.  A 95% CI is est +- 2*se_floor*20/1e0 on the analyst's
    side; the query emits the exact-integer ingredients."""
    li = _t(spark, sf_dir, "lineitem")
    fold = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                    F.lit("aqp"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    qty = F.round("l_quantity").cast("bigint")
    return (
        li.filter(fold % 1000 < _AQP_PERMILLE)
        .select("l_returnflag", qty.alias("qty"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sample"),
            (F.count(F.lit(1)) * 20).cast("bigint").alias("n_est"),
            (F.sum("qty") * 20).cast("bigint").alias("sum_qty_est"),
            F.floor(
                F.sqrt((F.lit(380) * F.sum(F.col("qty") * F.col("qty"))).cast("double"))
            )
            .cast("bigint")
            .alias("se_floor"),
        )
    )


# =========================================================================
# Round 7 (8): k-fold cross-validation of the classifier
# =========================================================================

_CV_K = 3


def _cv_fold_sql(f: int) -> str:
    """One fold's unrolled chain: the EXACT t28 two-step training CTEs
    restricted to fold != f, plus the t26-law eval tail on fold == f.
    Shared-fragment discipline: this mirrors t28's oracle text — if the
    update law ever changes there, it changes here."""
    p = f"f{f}"
    return f"""{p}lab AS (SELECT doc_id, y FROM lab WHERE fold != {f}),
    {p}nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM {p}lab),
    {p}r1 AS (SELECT doc_id, CAST(500000 - y * 1000000 AS BIGINT) AS r FROM {p}lab),
    {p}g1 AS (SELECT f.bucket, CAST(sum(r.r * f.x) AS BIGINT) AS g
              FROM {p}r1 r JOIN feats f USING (doc_id) GROUP BY 1),
    {p}gb1 AS (SELECT CAST(sum(r) AS BIGINT) AS g FROM {p}r1),
    {p}w1 AS (SELECT grid.bucket,
                     CAST(0 - (coalesce(g.g, 0) // nn.n) // 50 AS BIGINT) AS w
              FROM grid LEFT JOIN {p}g1 g USING (bucket), {p}nn nn),
    {p}b1 AS (SELECT CAST(0 - (g // n) // 50 AS BIGINT) AS b FROM {p}gb1, {p}nn),
    {p}zf2 AS (SELECT f.doc_id, CAST(sum(w.w * f.x) AS BIGINT) AS zf
               FROM feats f JOIN {p}w1 w USING (bucket) GROUP BY 1),
    {p}r2 AS (SELECT l.doc_id,
                     CAST(greatest(0, least(1000000,
                            ((coalesce(z.zf, 0) + b.b) // 4) + 500000))
                          - l.y * 1000000 AS BIGINT) AS r
              FROM {p}lab l LEFT JOIN {p}zf2 z USING (doc_id), {p}b1 b),
    {p}g2 AS (SELECT f.bucket, CAST(sum(r.r * f.x) AS BIGINT) AS g
              FROM {p}r2 r JOIN feats f USING (doc_id) GROUP BY 1),
    {p}gb2 AS (SELECT CAST(sum(r) AS BIGINT) AS g FROM {p}r2),
    {p}w2 AS (SELECT w1.bucket,
                     CAST(w1.w - (coalesce(g.g, 0) // nn.n) // 50 AS BIGINT) AS w
              FROM {p}w1 w1 LEFT JOIN {p}g2 g USING (bucket), {p}nn nn),
    {p}b2 AS (SELECT CAST(b1.b - (g.g // nn.n) // 50 AS BIGINT) AS b
              FROM {p}b1 b1, {p}gb2 g, {p}nn nn),
    {p}zfe AS (SELECT f.doc_id, CAST(sum(w.w * f.x) AS BIGINT) AS zf
               FROM feats f JOIN {p}w2 w USING (bucket) GROUP BY 1),
    {p}ev AS (SELECT l.doc_id, l.y,
                     CASE WHEN greatest(0, least(1000000,
                            ((coalesce(z.zf, 0) + b.b) // 4) + 500000)) >= 500000
                          THEN 1::BIGINT ELSE 0::BIGINT END AS pred
              FROM lab l LEFT JOIN {p}zfe z USING (doc_id), {p}b2 b
              WHERE l.fold = {f}),
    {p}res AS (SELECT CAST({f} AS BIGINT) AS fold,
                      CAST(count(*) AS BIGINT) AS n_eval,
                      CAST(sum(CASE WHEN pred = y THEN 1 ELSE 0 END) AS BIGINT)
                        AS n_correct
               FROM {p}ev)"""


def _cv_oracle(k: int = _CV_K) -> str:
    folds = ",\n    ".join(_cv_fold_sql(f) for f in range(k))
    union = " UNION ALL ".join(f"SELECT * FROM f{f}res" for f in range(k))
    return f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS term
      FROM documents
    ), feats AS (
      SELECT doc_id,
             ('0x' || substr(md5(term), 1, 12))::BIGINT % 64 AS bucket,
             CAST(count(*) AS BIGINT) AS x
      FROM toks GROUP BY 1, 2
    ), lab AS (
      SELECT doc_id,
             CASE WHEN n_chars >= 300 THEN 1::BIGINT ELSE 0::BIGINT END AS y,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':cv'), 1, 12))::BIGINT
               % {k} AS fold
      FROM documents
    ), grid AS (SELECT CAST(unnest(range(0, 64)) AS BIGINT) AS bucket),
    {folds}
    SELECT fold, n_eval, n_correct,
           CAST((n_correct * 1000000) // n_eval AS BIGINT) AS acc_micro
    FROM ({union})
    """


@query("t37_logreg_crossval", oracle=_cv_oracle())
def t37_logreg_crossval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-FOLD CROSS-VALIDATION — the model-selection readout that
    completes the classifier tier: t28 trains, t26/st17 infer, q116
    calibrates on TRAINING data; this is the honest number — each fold's
    model scores only docs it never saw.  Fold membership is the
    deterministic md5-fold split (q37's law), training is the exact t28
    two-step integer update on the other k-1 folds, eval is the exact
    t26 hard-sigmoid >= 1/2 decision, accuracy in integer micro-units
    ((n_correct * 1e6) div n_eval, the t25 no-round() discipline).  At
    100 TB: features and labels are computed ONCE and persisted
    hash-partitioned on doc_id with the fold attached — each fold's
    train/eval filters preserve that partitioning so NO per-fold
    re-shuffle; total cost is k * n_steps scan-shaped gradient passes +
    k broadcast-scored evals, and driver state is dim+1 ints per fold.
    The oracle unrolls all k training chains and eval tails
    bit-for-bit (3 folds x 2 steps, one WITH clause)."""
    from mapreducehs_spark.operators.ml import logreg_crossval

    docs = _t(spark, sf_dir, "documents")
    return logreg_crossval(
        docs, n_buckets=64, n_steps=2, label_chars=300, k=_CV_K
    )


# =========================================================================
# Round 7 (9): weighted shortest paths (min-plus Bellman-Ford)
# =========================================================================


def _q121_oracle(rounds: int = 3) -> str:
    """Unrolled Bellman-Ford: per round, FULL relaxation over the
    reached set (provably equal per-round to the changed-frontier
    variant the Spark side runs — an unchanged node's relaxations were
    already emitted the round after it last changed)."""
    head = """
    WITH raw AS (
      SELECT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst,
             CAST(round(l.l_quantity) AS BIGINT) AS w
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), edges AS (
      SELECT src, dst, CAST(min(w) AS BIGINT) AS w
      FROM (SELECT src, dst, w FROM raw
            UNION ALL SELECT dst, src, w FROM raw)
      GROUP BY 1, 2
    ), d0 AS (
      SELECT (SELECT min(src) FROM edges) AS node, CAST(0 AS BIGINT) AS d
    )"""
    parts = []
    for i in range(1, rounds + 1):
        prev = f"d{i - 1}"
        parts.append(f"""
    , d{i} AS (
      SELECT node, min(d) AS d FROM (
        SELECT node, d FROM {prev}
        UNION ALL
        SELECT e.dst AS node, p.d + e.w AS d
        FROM {prev} p JOIN edges e ON e.src = p.node
      ) GROUP BY node
    )""")
    tail = f"""
    SELECT node, d AS dist
    FROM d{rounds}
    ORDER BY d ASC, node ASC
    LIMIT 20
    """
    return head + "".join(parts) + tail


@query("q121_weighted_sssp", oracle=_q121_oracle())
def q121_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED single-source shortest paths — the min-plus semiring
    sibling of q108's BFS (hop counts become integer edge costs; the
    Bellman-Ford relaxation d'(v) = min(d(v), min_u d(u) + w(u,v))),
    over the q96/q108 trade graph with w = min trade quantity per pair.
    The Spark side runs the CHANGED-FRONTIER optimization: each round
    relaxes only nodes whose distance improved last round (tracked by a
    round tag carried through a struct-min — ties keep the OLD tag, so
    non-improvements never re-enter the frontier), which is the
    distributed form that makes bounded-round SSSP feasible at scale:
    per round one narrow (node, dist) frontier shuffle against the
    src-partitioned persisted adjacency, never an all-nodes relaxation.
    The oracle replays the mathematically-equal full relaxation
    unrolled; all distances are integers, so the top-20 nearest nodes
    match bit-for-bit.  The edge build pays ONE exchange total: raw
    pairs symmetrize first, repartition on src, and the (src, dst) min
    aggregates IN PARTITION (HashPartitioning(src) satisfies the
    clustered distribution — the q96 dedup-in-partition discipline).
    Per-round localCheckpoint keeps plan depth O(1) (q108's lineage
    lesson)."""
    from mapreducehs_spark.operators.iteration import local_checkpoint_freeable

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    raw = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
        F.round("l_quantity").cast("bigint").alias("w"),
    )
    edges = (
        raw.unionByName(
            raw.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        .repartition("src")
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .persist()
    )
    frees = []
    try:
        start = edges.agg(F.min("src")).collect()[0][0]  # one scalar
        dist = spark.createDataFrame(
            [(int(start), 0, 0)], "node long, d long, r int"
        )
        for rnd in range(1, 4):
            frontier = dist.filter(F.col("r") == rnd - 1)
            cand = frontier.join(edges, frontier["node"] == edges["src"]).select(
                F.col("dst").alias("node"),
                (F.col("d") + F.col("w")).alias("d"),
                F.lit(rnd).alias("r"),
            )
            merged = (
                dist.unionByName(cand)
                .groupBy("node")
                # struct-min: smallest d wins; on a TIE the smaller
                # (older) round tag wins, so non-improving candidates
                # never mark a node as changed
                .agg(F.min(F.struct("d", "r")).alias("s"))
                .select("node", F.col("s.d").alias("d"), F.col("s.r").alias("r"))
            )
            dist, free = local_checkpoint_freeable(merged, eager=False)
            frees.append(free)
        return (
            dist.select("node", F.col("d").alias("dist"))
            .orderBy(F.col("dist").asc(), F.col("node").asc())
            .limit(20)
            .localCheckpoint()  # materialize while the rounds are cached
        )
    finally:
        edges.unpersist(blocking=False)
        # the 20-row result above is materialized — the per-round
        # checkpoint blocks can now be genuinely released (q108's
        # checkpoint-before-unpersist ordering)
        for free in frees:
            free()


# =========================================================================
# Round 7 (10): streaming temporal (as-of) dimension enrichment
# =========================================================================

#: q91's full SCD2 chain as shared CTE text, so st23's oracle replays
#: the identical dimension the stream joins (the _T26_ORACLE sharing
#: discipline applied to the warehouse dimension).
_SCD2_CTES = """ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_type
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN prev_type IS NULL OR prev_type != event_type THEN 1 ELSE 0 END AS chg
      FROM ordered
    ), islands AS (
      SELECT user_id, event_type, ts,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    ), grouped AS (
      SELECT user_id, event_type, island,
             min(ts) AS valid_from, count(*) AS n_events
      FROM islands GROUP BY 1, 2, 3
    ), versioned AS (
      SELECT user_id, event_type, n_events, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from ASC) AS valid_to
      FROM grouped
    ), scd AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(valid_from)) AS BIGINT) AS valid_from_s,
             CAST(floor(epoch(valid_to)) AS BIGINT) AS valid_to_s
      FROM versioned
    )"""


@query(
    "st23_stream_scd2_enrich",
    oracle="""
    WITH """ + _SCD2_CTES + """
    SELECT e.event_id, e.user_id,
           CAST(floor(epoch(e.ts)) AS BIGINT) AS ts_s,
           v.event_type AS version_type, v.valid_from_s
    FROM events e JOIN scd v
      ON v.user_id = e.user_id
     AND CAST(floor(epoch(e.ts)) AS BIGINT) >= v.valid_from_s
     AND (v.valid_to_s IS NULL OR CAST(floor(epoch(e.ts)) AS BIGINT) < v.valid_to_s)
    """,
)
def st23_stream_scd2_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING TEMPORAL (as-of) dimension enrichment — the lakehouse
    pattern st07's equi-join enrichment can't express: each arriving
    event attaches the SCD2 dimension VERSION (q91's build, reused
    verbatim) valid at the event's own time, via a stream-static
    broadcast join on user_id with the half-open
    [valid_from_s, valid_to_s) range as a post-join filter.  Stateless
    append — no watermark, no state store, the stream never shuffles;
    the dimension is batch-built (at whatever refresh cadence) and
    broadcast, exactly how versioned reference data deploys against a
    100 TB/day ingest.  The replay fixture streams the SAME events the
    dimension was built from, so every enriched row is value-checked
    against the batch as-of join (the st13/st15/st17 stream==batch
    discipline); boundary law is deterministic in both engines (floored
    seconds, half-open intervals — an event in a zero-width interval
    drops in both)."""
    from mapreducehs_spark import streaming as st

    dim = (
        q91_scd2_dimension(spark, sf_dir)
        .select(
            F.col("user_id").alias("d_user"),
            F.col("event_type").alias("version_type"),
            "valid_from_s",
            "valid_to_s",
        )
        .persist()
    )
    try:
        dim.count()  # materialize once; every micro-batch reuses the cache
        enriched = st.enrich_asof_versions(_replayed_events(spark, sf_dir), dim)
        out = st.run_to_batch(enriched, "st23_sink", output_mode="append")
        return out.localCheckpoint()  # materialize while the dim is cached
    finally:
        dim.unpersist(blocking=False)


# =========================================================================
# Round 7 (11): filtered vector search (pre- vs post-filter)
# =========================================================================

#: s21's metadata law: category = vec_id % 5, filter keeps category 2
#: (~20% selectivity) — deterministic, so the filter composes into the
#: seeded-IVF replay.
_S21_CAT_MOD, _S21_CAT = 5, 2


def _s21_oracle(n_probe: int = 4) -> str:
    """s06's seeded-IVF replay with BOTH filter placements: the
    pre-filtered ranking (filter candidates, then rank — always k
    results from the filtered corpus) and the post-filter survivor
    count (rank unfiltered, then count matches in the top-k — the
    naive composition that silently loses recall)."""
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), c AS (
      SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16
    ), corpus AS (
      SELECT * FROM e WHERE vec_id >= 8
    ), q AS (
      SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8
    ), assign AS (
      SELECT vec_id, v, cid FROM (
        SELECT corpus.vec_id, corpus.v, c.cid,
               row_number() OVER (
                 PARTITION BY corpus.vec_id
                 ORDER BY list_cosine_similarity(corpus.v, c.cv) DESC, c.cid ASC
               ) AS rn
        FROM corpus CROSS JOIN c
      ) WHERE rn = 1
    ), probes AS (
      SELECT query_id, qv, cid FROM (
        SELECT q.query_id, q.qv, c.cid,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid ASC
               ) AS rn
        FROM q CROSS JOIN c
      ) WHERE rn <= {n_probe}
    ), scored AS (
      SELECT p.query_id, a.vec_id AS match_id,
             round(list_cosine_similarity(p.qv, a.v), 6) AS cosine
      FROM probes p JOIN assign a ON a.cid = p.cid
      WHERE p.query_id != a.vec_id
    ), pre_ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, match_id ASC
      ) AS rank FROM scored WHERE match_id % {_S21_CAT_MOD} = {_S21_CAT}
    ), post_hits AS (
      SELECT query_id,
             CAST(sum(CASE WHEN match_id % {_S21_CAT_MOD} = {_S21_CAT}
                           THEN 1 ELSE 0 END) AS BIGINT) AS post_hits
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, match_id ASC
        ) AS rank FROM scored
      ) WHERE rank <= 5 GROUP BY query_id
    )
    SELECT p.query_id, p.match_id, p.cosine, CAST(p.rank AS BIGINT) AS rank,
           h.post_hits
    FROM pre_ranked p JOIN post_hits h USING (query_id)
    WHERE p.rank <= 5
    """


@query("s21_filtered_ann_topk", oracle=_s21_oracle())
def s21_filtered_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search — ANN under a metadata predicate (the
    production retrieval shape: "nearest neighbors WHERE lang = ...")
    with the two filter placements the literature distinguishes,
    side by side: PRE-FILTERING (the predicate reaches the probed-cell
    candidate scan, ranking sees only eligible vectors — always k
    results from the filtered corpus) and the naive POST-FILTER
    composition (take the unfiltered top-k, then filter), whose
    per-query survivor count ``post_hits`` the report carries —
    typically < k, the recall silently lost when filters are bolted on
    after the index.  One candidate frame (s06's seeded-IVF probe via
    the new similarity.ivf_candidates seam) feeds BOTH arms, so the
    comparison costs one probe pass plus two window ranks.  At 100 TB:
    the predicate composes into the cell-member scan exactly like any
    pushed filter (cells are just partitions of the corpus) — this is
    why IVF-style indexes filter well while graph indexes struggle;
    post_hits quantifies the alternative.  Whole replay (assignment,
    probing, both rankings) value-checked in the oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    scored = similarity.ivf_candidates(
        emb.filter(F.col("vec_id") >= 8),
        emb.filter(F.col("vec_id") < 8),
        n_cells=16,
        n_probe=4,
        centroids=_seeded_centroids(emb),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("match_id").asc()
    )
    pre = (
        scored.filter(F.col("match_id") % _S21_CAT_MOD == _S21_CAT)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 5)
    )
    post_hits = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.col("match_id") % _S21_CAT_MOD == _S21_CAT).cast("int")
            )
            .cast("bigint")
            .alias("post_hits")
        )
    )
    return pre.join(post_hits, "query_id").select(
        "query_id", "match_id", "cosine", "rank", "post_hits"
    )


# =========================================================================
# Round 7 (12): streaming media ingest with decode DLQ
# =========================================================================


@query(
    "st24_stream_decode_dlq",
    oracle="""
    WITH px AS (
      SELECT doc_id, ((doc_id * 31 + i.i * 7) % 256) AS v
      FROM documents, LATERAL unnest(range(0, 512)) AS i(i)
      WHERE doc_id % 13 <> 0
    ), good AS (
      SELECT doc_id, CAST(sum(v) AS BIGINT) AS px_sum FROM px GROUP BY doc_id
    )
    SELECT d.doc_id,
           CASE WHEN d.doc_id % 13 = 0 THEN 'corrupt_truncated' ELSE 'ok' END
             AS decode_status,
           CAST(coalesce(g.px_sum, 0) AS BIGINT) AS px_sum
    FROM documents d LEFT JOIN good g USING (doc_id)
    """,
)
def st24_stream_decode_dlq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING media ingest with a decode dead-letter queue — m10's
    error-tolerance requirement at the point it actually bites: the
    CONTINUOUS intake, where one corrupt payload must neither kill the
    stream nor silently vanish.  Each arriving doc renders its payload
    and runs the SAME tolerant-decode kernel m10 uses (the two
    mapInPandas stages are shared module functions, not copies) — 'ok'
    rows carry the pixel sum, corrupt rows route to the quarantine
    status, zero exceptions escape the Arrow stage.  Stateless append:
    no watermark, no state store, per-row emission is the DLQ routing
    itself (aggregate error budgets are a downstream batch query, m10's
    shape).  At 100 TB/day the decode cost is the scan, and a poisoned
    payload costs one row, not a task retry storm.  The docs replay
    fixture streams the corpus the oracle reads, so every per-doc
    status and pixel sum value-checks (stream==batch, the st17
    discipline)."""
    from mapreducehs_spark import streaming as st
    from mapreducehs_spark.operators.multimodal import (
        render_corrupt_pgm_batches,
        tolerant_decode_batches,
    )

    decoded = (
        _replayed_docs(spark, sf_dir)
        .select("doc_id")
        .mapInPandas(render_corrupt_pgm_batches, schema="doc_id long, payload binary")
        .mapInPandas(
            tolerant_decode_batches,
            schema="doc_id long, decode_status string, px_sum long",
        )
    )
    return st.run_to_batch(decoded, "st24_sink", output_mode="append")


# =========================================================================
# Round 7 (13): span-corruption masking (training-example construction)
# =========================================================================


@query(
    "t38_span_corruption",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))
               AS n
      FROM documents
    ), pos AS (
      SELECT doc_id, source, n, i.p AS p,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                                            CAST(i.p AS VARCHAR) || ':sc'), 1, 12))::BIGINT
                       % 10 = 0
                  THEN 1 ELSE 0 END AS cand
      FROM toks, LATERAL unnest(range(0, n)) AS i(p)
      WHERE n > 0
    ), marked AS (
      SELECT doc_id, source, n, p,
             max(cand) OVER (PARTITION BY doc_id ORDER BY p
                             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS m
      FROM pos
    ), runs AS (
      SELECT doc_id, source, n, p, m,
             CASE WHEN m = 1 AND coalesce(lag(m) OVER (PARTITION BY doc_id
                                                        ORDER BY p), 0) = 0
                  THEN 1 ELSE 0 END AS span_start
      FROM marked
    )
    SELECT source,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN p = 0 THEN n ELSE 0 END) AS BIGINT) AS n_tokens,
           CAST(sum(m) AS BIGINT) AS n_masked,
           CAST(sum(span_start) AS BIGINT) AS n_spans,
           CAST((sum(m) * 1000000) // sum(CASE WHEN p = 0 THEN n ELSE 0 END)
                AS BIGINT) AS mask_micro
    FROM runs
    GROUP BY source
    """,
)
def t38_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-CORRUPTION masking — the training-example construction step
    (T5 denoising objectives, Raffel et al. 2020): deterministic span
    starts (md5-fold draw per (doc, position) at rate 1/10), each span
    masking 3 tokens, OVERLAPPING spans merged (a position is masked if
    any of the 3 trailing starts fired; merged-run accounting via the
    gaps-and-islands lag rule q91 uses) — the per-source report every
    masking-rate decision reads: docs, tokens, masked tokens, merged
    span count, mask ratio in integer micro-units.  The plan is one
    tokenize scan, one position explode (guarded n > 0 — Spark's
    sequence(0, -1) DESCENDS, the t21 lesson), and ONE window pass per
    rule over the (doc_id, p) partitioning Catalyst shares across both
    window functions, then a tiny source rollup.  At 100 TB the explode
    is token-count-sized — the same cardinality tokenization itself
    costs — and everything after it is windows + one narrow shuffle.
    All-integer laws, bit-for-bit oracle replay."""
    docs = _t(spark, sf_dir, "documents")
    tok_n = docs.select(
        "doc_id", "source", F.size(text.tokens("text")).alias("n")
    ).filter(F.col("n") > 0)
    pos = tok_n.select(
        "doc_id",
        "source",
        "n",
        F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("p"),
    )
    cand = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("doc_id").cast("string"),
                        F.col("p").cast("string"),
                        F.lit("sc"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        % 10
        == 0
    ).cast("int")
    wtrail = (
        Window.partitionBy("doc_id").orderBy("p").rowsBetween(-2, 0)
    )
    wlag = Window.partitionBy("doc_id").orderBy("p")
    marked = pos.withColumn("m", F.max(cand).over(wtrail))
    runs = marked.withColumn(
        "span_start",
        (
            (F.col("m") == 1)
            & (F.coalesce(F.lag("m").over(wlag), F.lit(0)) == 0)
        ).cast("int"),
    )
    return runs.groupBy("source").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("p") == 0, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_tokens"),
        F.sum("m").cast("bigint").alias("n_masked"),
        F.sum("span_start").cast("bigint").alias("n_spans"),
        F.expr(
            "cast((sum(m) * 1000000L) div"
            " sum(CASE WHEN p = 0 THEN n ELSE 0 END) as bigint)"
        ).alias("mask_micro"),
    )


# =========================================================================
# Round 7 (14): dedup-quality evaluation (LSH recall/precision)
# =========================================================================


@query(
    "d27_lsh_quality_report",
    oracle="""
    WITH truth AS (
      SELECT id_a, id_b FROM (""" + ORACLE["d02_ngram_jaccard_pairs"] + """
      ) WHERE jaccard >= 0.5
    ), lsh AS (
      SELECT id_a, id_b FROM (""" + _d11_oracle(threshold=0.25) + """
      )
    ), hit AS (
      SELECT count(*) AS n FROM truth JOIN lsh USING (id_a, id_b)
    )
    SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
           CAST((SELECT count(*) FROM lsh) AS BIGINT) AS n_lsh,
           CAST(hit.n AS BIGINT) AS n_hit,
           CAST((hit.n * 1000000) // (SELECT count(*) FROM truth) AS BIGINT)
             AS recall_micro,
           CAST((hit.n * 1000000) // (SELECT count(*) FROM lsh) AS BIGINT)
             AS precision_micro
    FROM hit
    """,
)
def d27_lsh_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEDUP-QUALITY evaluation — the s13/s15 recall-report discipline
    applied to the DEDUP family: how good is the scalable LSH arm
    against exact ground truth?  Truth = d02's exact 3-gram Jaccard
    pairs at J >= 0.5 (the dedup decision threshold); candidate arm =
    d11's checked MinHash pipeline at estimate >= 0.25 (8 of 32
    permutations — deliberately loose, LSH's recall-first posture).
    The report is ONE row: pair counts, hits, recall and precision in
    integer micro-units — the measurement a 100 TB dedup config change
    (bands, permutations, thresholds) is judged by before it ships.
    Both arms are the ALREADY-value-checked laws composed (the t27/d23
    composition discipline), so the whole evaluation replays
    bit-for-bit; cost is the two arms plus a pair-keyed join, and the
    truth arm's shingle equi-join is the same never-all-pairs plan d02
    pins."""
    truth = d02_ngram_jaccard_pairs(spark, sf_dir).filter(
        F.col("jaccard") >= 0.5
    ).select("id_a", "id_b")
    lsh = dedup.minhash_lsh_pairs_checked(
        _t(spark, sf_dir, "documents"), est_threshold=0.25
    ).select("id_a", "id_b")
    n_truth = truth.count()
    n_lsh = lsh.count()
    n_hit = truth.join(lsh, ["id_a", "id_b"]).count()
    return spark.createDataFrame(
        [
            (
                n_truth,
                n_lsh,
                n_hit,
                (n_hit * 1_000_000) // n_truth,
                (n_hit * 1_000_000) // n_lsh,
            )
        ],
        "n_truth bigint, n_lsh bigint, n_hit bigint,"
        " recall_micro bigint, precision_micro bigint",
    )


# =========================================================================
# Round 7 (15): quality-signal agreement (exact Spearman)
# =========================================================================


@query(
    "t39_signal_agreement",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS term
      FROM documents
    ), doc_term AS (
      SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2
    ), freq AS (
      SELECT term, count(*) AS f FROM toks GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(f) AS DOUBLE) AS n FROM freq
    ), lp AS (
      SELECT doc_id,
             CAST(sum(c * CAST(floor(1e6 * ln(CAST(f AS DOUBLE) / n)) AS BIGINT))
                  AS BIGINT) * 10000
               // (CAST(sum(c) AS BIGINT) * 1000000) AS x
      FROM doc_term JOIN freq USING (term), tot
      GROUP BY doc_id
    ), qtoks AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS t
      FROM documents
    ), qual AS (
      SELECT doc_id,
             round(least(greatest(
               0.5 + least(len(list_filter(t, x -> list_contains(
                       ['the','a','of','and','to','in','is','it'], lower(x)))) /
                     CAST(greatest(len(t), 1) AS DOUBLE) * 2.0, 0.25)
                   - least(length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) /
                     CAST(greatest(length(text), 1) AS DOUBLE) * 2.0, 0.25)
                   + CASE WHEN length(text) BETWEEN 20 AND 100000
                          THEN 0.25 ELSE -0.25 END, 0.0), 1.0), 6) AS y
      FROM qtoks
    ), joined AS (
      SELECT lp.doc_id, lp.x, qual.y FROM lp JOIN qual USING (doc_id)
    ), ranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY x ASC, doc_id ASC) AS rx,
             row_number() OVER (ORDER BY y ASC, doc_id ASC) AS ry
      FROM joined
    ), agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2
      FROM ranked
    )
    SELECT n_docs, sum_d2,
           CAST(1000 - (6000 * sum_d2) // (n_docs * (n_docs * n_docs - 1))
                AS BIGINT) AS rho_milli
    FROM agg
    """,
)
def t39_signal_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-SIGNAL AGREEMENT — exact Spearman rank correlation
    between two committed curation signals: the unigram-LM fluency
    score (t17's integer avg-logprob key) and the heuristic composite
    quality score (t02's law).  This is the report that decides whether
    a cheap signal can stand in for an expensive one before a 100 TB
    filter run — the evaluation-tier pattern (s13 ANN recall, d27 LSH
    quality, q116 calibration) closing over signal selection itself.
    rho = 1 - 6*sum(d^2)/(n(n^2-1)) with ordinal ranks tie-broken by
    doc_id, so the statistic is exactly determined; emitted in integer
    MILLI-units.  Integer headroom: the denominator n*(n^2-1) and
    6000*sum_d2 (sum_d2 approaches n^3/3) both grow as n^3, so BIGINT
    overflows at n ≈ 2.1e6 docs — past ~2M docs switch the rho
    computation to the q01 decimal(38,0) recipe.  Global ranks come
    from the two-phase positions idiom (range-repartition + offsets,
    global_positions_cached) — never a single-task row_number window;
    both rank passes and the final 1-row reduce are the whole cost on
    top of the two signal laws."""
    from mapreducehs_spark.operators.sampling import global_positions_cached
    from mapreducehs_spark.operators.text import with_quality_score

    docs = _t(spark, sf_dir, "documents")
    # signal x: t17's integer avg-logprob key (micro-nats via the libm
    # UDF on the vocabulary frame — the JVM-log-ulp lesson)
    toks = (
        docs.select("doc_id", text.tokens("text").alias("__t"))
        .select("doc_id", F.explode_outer("__t").alias("term"))
        .filter(F.col("term").isNotNull())
    )
    doc_term = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("f"))
    total = freq.agg(F.sum("f").cast("double").alias("n"))
    scored = (
        freq.crossJoin(F.broadcast(total))
        .withColumn(
            "micro", text.micro_ln_udf()(F.col("f").cast("double") / F.col("n"))
        )
        .select("term", "micro")
    )
    x = (
        doc_term.join(F.broadcast(scored), "term")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("__nt"),
            F.sum(F.col("c") * F.col("micro")).cast("bigint").alias("__s"),
        )
        .select("doc_id", F.expr("(__s * 10000L) div (__nt * 1000000L)").alias("x"))
    )
    # signal y: t02's composite quality law (same rounding as its oracle)
    y = with_quality_score(docs).select(
        "doc_id", F.round("quality_score", 6).alias("y")
    )
    joined = x.join(y, "doc_id").persist()
    caches = []
    try:
        joined.count()
        rx, c1 = global_positions_cached(
            joined.select("doc_id", "x"), ["x", "doc_id"], "rx"
        )
        caches.append(c1)
        ry, c2 = global_positions_cached(
            joined.select("doc_id", "y"), ["y", "doc_id"], "ry"
        )
        caches.append(c2)
        return (
            rx.select("doc_id", "rx")
            .join(ry.select("doc_id", "ry"), "doc_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum(
                    (F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry"))
                )
                .cast("bigint")
                .alias("sum_d2"),
            )
            .select(
                "n_docs",
                "sum_d2",
                F.expr(
                    "cast(1000 - (6000L * sum_d2) div"
                    " (n_docs * (n_docs * n_docs - 1)) as bigint)"
                ).alias("rho_milli"),
            )
            .localCheckpoint()  # materialize while the rank caches live
        )
    finally:
        joined.unpersist(blocking=False)
        for c in caches:
            c.unpersist(blocking=False)


# =========================================================================
# Round 7 (16): streaming quantiles (histogram state)
# =========================================================================


@query(
    "st25_stream_histogram_quantiles",
    oracle="""
    WITH b AS (
      SELECT event_type, CAST(floor(value) AS BIGINT) AS bkt FROM events
    ), h AS (
      SELECT event_type, bkt, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2
    ), tot AS (
      SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1
    ), cum AS (
      SELECT event_type, bkt, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY bkt ASC
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM h
    )
    SELECT t.event_type, t.n AS n_values,
           CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN bkt END) AS BIGINT)
             AS p50_floor,
           CAST(min(CASE WHEN cum >= (9 * n + 9) // 10 THEN bkt END) AS BIGINT)
             AS p90_floor
    FROM cum JOIN tot t USING (event_type)
    GROUP BY 1, 2
    """,
)
def st25_stream_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING QUANTILES via integer-bucket histogram state — the
    percentile member of the streaming-sketch family (st13 heavy
    hitters, st20 moments): per event_type, counts over floor(value)
    buckets fold in applyInPandasWithState.  The design choice IS the
    point: bucket counts are ASSOCIATIVE, so unlike compaction-based
    digests (KLL/t-digest, whose internals depend on arrival order) the
    state is trigger-slicing-independent and the final p50/p90
    value-check EXACTLY against the batch law — fixed-bucket histograms
    are how production latency percentiles actually ship.  State per
    key is bounded by the value RANGE, not the stream length; the
    serving read (latest update per key, st13's pattern) applies the
    integer rank law: p50 at rank (n+1) div 2, p90 at ceil(9n/10),
    each the smallest bucket whose cumulative count reaches the rank.
    Stream==batch at all four SFs (the st13/st15/st17 discipline)."""
    from mapreducehs_spark import streaming as st

    updates = st.stateful_histogram(_replayed_events(spark, sf_dir))
    log = st.run_to_batch(updates, "st25_sink", output_mode="append")
    return st.histogram_quantiles_log(log)


# =========================================================================
# Round 7 (17): incremental near-dup components
# =========================================================================


def _d28_oracle() -> str:
    """d21's full chain (signatures -> banding -> candidates -> verify
    -> component-min closure) rebased onto the UNION corpus (base +
    d25's re-ingest batch law) — the ground truth the incremental
    composition must equal."""
    ctes, agree, np_ = _minhash_checked_ctes()
    assert ctes.count("FROM documents") == 1
    ctes = ctes.replace("FROM documents", "FROM alldocs", 1)
    return f"""
    WITH RECURSIVE alldocs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id,
             CASE WHEN doc_id % 3 = 1 THEN text || ' updated' ELSE text END AS text
      FROM documents WHERE doc_id % 3 IN (0, 1)
    ), {ctes},
    est AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN sigs sa ON sa.doc_id = c.id_a JOIN sigs sb ON sb.doc_id = c.id_b
      WHERE ({agree}) / {float(np_)} >= 0.25
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM est
      UNION
      SELECT id_b, id_a FROM est
    ), reach(src, dst) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.src, r.dst FROM edges e JOIN reach r ON e.dst = r.src
    )
    SELECT src AS node, CAST(min(dst) AS BIGINT) AS rep
    FROM reach
    GROUP BY src
    HAVING src != min(dst)
    """


@query("d28_incremental_components", oracle=_d28_oracle())
def d28_incremental_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL near-dup components — the graph-level member of the
    incremental-dedup tier (d09 exact index probe, d25 Bloom index):
    a re-ingest batch (d25's law: re-crawls + edits) joins an EXISTING
    dedup graph without re-pairing history.  The delta path is the
    point: the batch's band keys probe the stored band index
    (minhash_checked_signatures seam), so candidate generation touches
    batch x index — base-base pairs NEVER regenerate; verified new
    edges then merge with the STORED labels (each (node, rep) label is
    a connectivity-preserving edge), and connected_components_star
    closes the union.  Correctness law: CC(labels U new_edges) =
    CC(base_edges U new_edges) because labels contract exactly the
    base connectivity — the oracle replays the FULL-recompute chain
    over the union corpus and must match bit-for-bit.  At 100 TB the
    daily increment costs O(batch x bands + affected components), not
    O(history^2); the d21 output contract (node, rep) stays linear."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    batch = docs.filter((F.col("doc_id") % 3).isin(0, 1)).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.when(F.col("doc_id") % 3 == 1, F.concat(F.col("text"), F.lit(" updated")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    sigs_base, banded_base = dedup.minhash_checked_signatures(docs)
    sigs_new, banded_new = dedup.minhash_checked_signatures(batch)

    # stored state: the base graph's labels (built once, then persisted
    # in production — the d09 base-index framing)
    cand_base = (
        banded_base.select(F.col("id").alias("id_a"), "band", "bk")
        .join(
            banded_base.select(F.col("id").alias("id_b"), "band", "bk"),
            ["band", "bk"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    base_edges = dedup.minhash_checked_verify(cand_base, sigs_base, 0.25).select(
        "id_a", "id_b"
    )
    labels = dedup.connected_components_star(base_edges)

    # delta path: batch bands probe the FULL index (base + batch);
    # normalize to undirected (min, max) pairs — base-base never appears
    index = banded_base.unionByName(banded_new)
    cand_new = (
        banded_new.select(F.col("id").alias("id_a"), "band", "bk")
        .join(index.select(F.col("id").alias("id_b"), "band", "bk"), ["band", "bk"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sigs_all = sigs_base.unionByName(sigs_new)
    new_edges = dedup.minhash_checked_verify(cand_new, sigs_all, 0.25).select(
        "id_a", "id_b"
    )

    merged = labels.select(
        F.col("node").alias("id_a"), F.col("rep").alias("id_b")
    ).unionByName(new_edges)
    return dedup.connected_components_star(merged)


# =========================================================================
# Round 7 (18): dedup-aware weighted sampling
# =========================================================================


def _d29_oracle() -> str:
    """d07's composed drop-list replay (shared renderer) feeding t31's
    exponential-race law, weights = near-dup class sizes."""
    drop = _d15_oracle(est_threshold=0.25, jaccard_threshold=0.6)
    return f"""
    WITH droplist AS (
      SELECT doc_id, rep_id FROM ({drop}) t
    ), sizes AS (
      SELECT rep_id, CAST(count(*) AS BIGINT) AS members FROM droplist GROUP BY 1
    ), kept AS (
      SELECT d.doc_id, 1 + coalesce(s.members, 0) AS w
      FROM documents d
      LEFT JOIN droplist dl ON dl.doc_id = d.doc_id
      LEFT JOIN sizes s ON s.rep_id = d.doc_id
      WHERE dl.doc_id IS NULL
    ), keyed AS (
      SELECT doc_id, w,
             -ln(((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':d29'), 1, 8))::BIGINT
                   + 1) / 4294967296.0)) / w AS k
      FROM kept
    )
    SELECT doc_id, CAST(w AS BIGINT) AS w, round(k * 1000000, 4) AS cost_micro
    FROM keyed
    ORDER BY k ASC, doc_id ASC
    LIMIT 25
    """


@query("d29_dedup_weighted_sample", oracle=_d29_oracle())
def d29_dedup_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEDUP-AWARE weighted sampling — the composition every
    dedup-then-sample pipeline needs: naive sampling AFTER dedup
    under-represents content that was heavily duplicated (one kept
    canonical doc stands for its whole class), so the canonical
    survivors draw with probability proportional to their NEAR-DUP
    CLASS SIZE.  Classes come from d07's checked drop list (kept doc =
    not dropped; weight = 1 + members mapped to it), the draw is t31's
    Efraimidis-Spirakis exponential race (key = -ln(u)/w, u the md5
    '+1 over 2^32' exact-mantissa draw, doc_id tie-break), and the
    top-25 lowers to TakeOrderedAndProject.  At 100 TB: the drop list
    is candidates-sized, the weight lookup is one aggregation over it,
    the race is a per-row expression on the kept scan, and the shuffle
    carries per-partition heaps — the d20/t27 composition discipline
    with both laws already value-checked."""
    docs = _t(spark, sf_dir, "documents")
    drop = dedup.near_dedup_drop_list_checked(
        docs, est_threshold=0.25, jaccard_threshold=0.6
    ).select("doc_id", "rep_id")
    sizes = drop.groupBy("rep_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("members")
    )
    kept = (
        docs.select("doc_id")
        .join(drop.select("doc_id"), "doc_id", "left_anti")
        .join(sizes, F.col("doc_id") == F.col("rep_id"), "left")
        .select(
            "doc_id",
            (F.lit(1) + F.coalesce(F.col("members"), F.lit(0)))
            .cast("bigint")
            .alias("w"),
        )
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":d29"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        + F.lit(1)
    ) / F.lit(4294967296.0)
    key = -F.log(u) / F.col("w")
    return (
        kept.withColumn("__k", key)
        .orderBy(F.col("__k").asc(), F.col("doc_id").asc())
        .limit(25)
        .select(
            "doc_id", "w", F.round(F.col("__k") * 1_000_000, 4).alias("cost_micro")
        )
    )


# =========================================================================
# Round 8: training-data export tier — sequence packing + funnel provenance
# =========================================================================

#: t40 context window (tokens per packed training sequence, incl. EOS
#: separators).  Shared with the oracle renderer.
_T40_CTX = 2048


@query(
    "t40_sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != ''))
                  AS BIGINT) AS n_tokens
      FROM documents
    ), w AS (
      SELECT doc_id, n_tokens + 1 AS w FROM toks
    ), starts AS (
      SELECT doc_id, w,
             CAST(sum(w) OVER (ORDER BY doc_id) - w AS BIGINT) AS start
      FROM w
    ), x AS (
      SELECT doc_id, w, start, s.seq_id
      FROM starts,
           LATERAL unnest(range(start // {_T40_CTX},
                                (start + w - 1) // {_T40_CTX} + 1)) s(seq_id)
    )
    SELECT CAST(seq_id AS BIGINT) AS seq_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc,
           CAST(sum(CASE WHEN (start + w - 1) // {_T40_CTX} = seq_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_eos,
           CAST(sum(least(start + w, (seq_id + 1) * {_T40_CTX})
                    - greatest(start, seq_id * {_T40_CTX})) AS BIGINT) AS n_fill,
           CAST(sum(least(start + w, (seq_id + 1) * {_T40_CTX})
                    - greatest(start, seq_id * {_T40_CTX}))
                * 1000000 // {_T40_CTX} AS BIGINT) AS fill_micro
    FROM x
    GROUP BY seq_id
    """,
)
def t40_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENCE PACKING for pretraining export — the step every corpus
    build runs last: concatenate documents (doc_id order) with one EOS
    separator each, split the token stream into fixed
    ``_T40_CTX``-token context windows, and emit the per-sequence doc
    map (how many docs, which span, how many EOS boundaries) plus the
    fill rate in integer micro-units.  t19 chunks SINGLE docs and t33
    balances whole-doc shards; this is the missing multi-doc window
    packer (VERDICT r07 item 4).

    Everything after tokenization is PURE ARITHMETIC on global token
    offsets — sequence id = cumulative-token div context_len, doc/seq
    overlap = interval intersection — so the packing is deterministic
    and oracle-replayable.  Offsets come from
    ``sampling.global_prefix_sums_cached`` (t33's two-phase idiom,
    weighted: range-repartition + per-partition weight subtotals +
    Arrow running sum) — NEVER a ``sum() OVER (ORDER BY ...)`` window,
    which collapses a 30 TB corpus onto one task.  Plan: one corpus
    scan, the range exchange, the seq_id hash exchange — window-free,
    join-free; the doc/seq explode adds one row per boundary crossing
    (≈ n_docs + n_sequences rows, linear).  The final partial sequence
    surfaces as the max-seq_id row with fill_micro < 1e6 — its n_fill
    IS the truncation loss if the export drops ragged tails.
    Reference witness: O1 fission + O2 ordered fold
    (src/Core/MapReduceC.hs:24-26)."""
    df, cache = _t40_build(spark, sf_dir)
    try:
        return df.localCheckpoint()
    finally:
        cache.unpersist(blocking=False)


def _t40_build(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """t40 pre-checkpoint builder (q107 discipline: plan pins inspect
    THIS; the query returns a checkpointed result so the positions
    cache can be freed)."""
    from mapreducehs_spark.operators.sampling import global_prefix_sums_cached

    C = _T40_CTX
    docs = _t(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        (F.size(text.tokens("text")).cast("bigint") + F.lit(1)).alias("w"),
    )
    starts, cache = global_prefix_sums_cached(keyed, ["doc_id"], "w", out_col="start")
    x = starts.select(
        "doc_id",
        "w",
        "start",
        F.explode_outer(
            F.expr(f"sequence(start div {C}, (start + w - 1) div {C})")
        ).alias("seq_id"),
    ).filter(F.col("seq_id").isNotNull())
    fill = F.least(
        F.col("start") + F.col("w"), (F.col("seq_id") + 1) * C
    ) - F.greatest(F.col("start"), F.col("seq_id") * C)
    per_seq = (
        x.select(
            "doc_id",
            "seq_id",
            fill.alias("__fill"),
            (F.expr(f"(start + w - 1) div {C}") == F.col("seq_id"))
            .cast("bigint")
            .alias("__eos"),
        )
        .groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
            F.max("doc_id").cast("bigint").alias("last_doc"),
            F.sum("__eos").cast("bigint").alias("n_eos"),
            F.sum("__fill").cast("bigint").alias("n_fill"),
        )
        .select(
            "seq_id",
            "n_docs",
            "first_doc",
            "last_doc",
            "n_eos",
            "n_fill",
            F.expr(f"cast((n_fill * 1000000L) div {C} as bigint)").alias(
                "fill_micro"
            ),
        )
    )
    return per_seq, cache


def _t41_oracle() -> str:
    return (
        _t32_ctes()
        + """
    SELECT source,
           CASE WHEN NOT q_ok THEN 'quality'
                WHEN NOT is_canon THEN 'dedup'
                WHEN NOT is_sampled THEN 'mixture'
                ELSE 'kept' END AS stage,
           CASE WHEN n_chars < 200 THEN 'len_chars'
                WHEN n_tok < 40 THEN 'len_tokens'
                WHEN 2 * n_uniq < n_tok THEN 'repetition'
                WHEN NOT is_canon THEN 'duplicate'
                WHEN NOT is_sampled THEN 'downsampled'
                ELSE 'kept' END AS reason,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS tokens
    FROM sampled
    GROUP BY source, stage, reason
    """
    )


def _t41_provenance(flags: DataFrame) -> DataFrame:
    """Per-doc drop provenance over t32's stage flags: (source, doc_id,
    n_tok, stage, reason) — the audit table a data-governance review
    reads.  ``stage`` is where the doc left the funnel ('kept' for
    survivors); ``reason`` is the FIRST failing rule in the fixed
    quality-rule order (a q_ok doc cannot match a quality reason, so
    the single CASE is stage-consistent by construction).  At 100 TB
    this frame is written to a sink partitioned by (stage, reason);
    here t41 rolls it up so the oracle replays it exactly."""
    stage = (
        F.when(~F.col("q_ok"), F.lit("quality"))
        .when(~F.col("is_canon"), F.lit("dedup"))
        .when(~F.col("is_sampled"), F.lit("mixture"))
        .otherwise(F.lit("kept"))
    )
    reason = (
        F.when(F.col("n_chars") < 200, F.lit("len_chars"))
        .when(F.col("n_tok") < 40, F.lit("len_tokens"))
        .when(2 * F.col("n_uniq") < F.col("n_tok"), F.lit("repetition"))
        .when(~F.col("is_canon"), F.lit("duplicate"))
        .when(~F.col("is_sampled"), F.lit("downsampled"))
        .otherwise(F.lit("kept"))
    )
    return flags.select(
        "source", "doc_id", "n_tok", stage.alias("stage"), reason.alias("reason")
    )


@query("t41_funnel_provenance", oracle=_t41_oracle())
def t41_funnel_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CURATION-FUNNEL PROVENANCE AUDIT (VERDICT r07 item 5) — t32
    reports per-source survivor COUNTS; a production corpus build also
    needs the per-doc drop REASON (which stage, which rule): the table
    a data-governance review reads before signing off a training set.
    One pass over t32's OWN stage flags (``_t32_flags`` — shared seam,
    the rules cannot fork) classifies every doc into
    (stage, reason) ∈ {quality × first-failed-rule, dedup × duplicate,
    mixture × downsampled, kept} and rolls up doc + token counts per
    (source, stage, reason).

    Cross-query consistency law (s13-vs-s01 discipline, pinned in
    pytest): per source, Σ n_docs over all stages == t32.n_raw,
    kept == t32.n_sampled, quality-dropped == n_raw - n_quality,
    dedup-dropped == n_quality - n_canonical, mixture-dropped ==
    n_canonical - n_sampled — the audit MUST reconcile exactly with
    the funnel it audits.  Same plan shape as t32 (one scan, the
    content-hash window exchange, the tiny rollup exchange); the
    per-doc provenance frame (``_t41_provenance``) never costs more
    than the funnel itself.  Reference witness: O19's per-key counts
    (src/Sample.hs) — the reference's only 'report' is also a rollup
    of per-record classifications."""
    per = _t41_provenance(_t32_flags(_t(spark, sf_dir, "documents")))
    return per.groupBy("source", "stage", "reason").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("tokens"),
    )
