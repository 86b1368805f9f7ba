"""Deep relational surface: the harder TPC-H query shapes.

The reference has no joins or subqueries at all (SURVEY.md §2.5) — this
module, like relational.py, supplies the general query capability the
engine needs as a platform, exercising the Catalyst features a 100 TB
deployment leans on:

- semi joins with non-equi residuals (q4)
- multi-way snowflake joins with two independent dimension paths (q7, q8, q9)
- outer joins preserving unmatched keys + re-aggregation (q13)
- conditional aggregation / ratio-of-sums (q8, q14)
- aggregate-then-self-join ("max over an aggregate", q15; "per-group avg
  threshold", q17)
- having-filtered IN subqueries (q18)
- OR-of-ANDs disjunctive predicates spanning both join sides (q19)
- scalar subquery + anti join (q22)
- CUBE grouping sets (priority_status_cube)

The driver's tables are a reduced TPC-H (no partsupp, no
l_commitdate/l_receiptdate/l_shipmode, no p_container/p_mfgr), so queries
needing those columns are adapted to equivalent *plan shapes* over the
available columns; each docstring notes the adaptation.

Scale notes: every dimension path (region→nation→customer/supplier, part)
broadcasts; the only big-big shuffles are lineitem⋈orders on l_orderkey —
at 100 TB both sides would be bucketed on orderkey so this becomes a
shuffle-free sort-merge. Aggregates partial-aggregate map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import table
from ._util import PRICE, RATE, dec, money_sum, money_sum0, ms, one_minus, ts_lit

_DISC_SQL = (
    "TRY_CAST(CASE WHEN isfinite(l_extendedprice) THEN l_extendedprice END AS DECIMAL(10,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - TRY_CAST(CASE WHEN isfinite(l_discount) THEN l_discount END AS DECIMAL(3,2)))"
)


def _disc_price():
    return dec("l_extendedprice") * one_minus("l_discount")


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left_semi join with a non-equi residual
    (l_shipdate > o_orderdate stands in for the missing
    l_commitdate < l_receiptdate). The semi join never widens rows and
    ships only (l_orderkey, l_shipdate) from the probe side; the quarter
    filter prunes orders before the shuffle."""
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts_lit("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts_lit("1996-04-01 00:00:00"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT
      sn.n_name AS supp_nation,
      cn.n_name AS cust_nation,
      year(l_shipdate) AS l_year,
      CAST(round(sum({_DISC_SQL}), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year. Two
    independent dimension paths hang off lineitem — supplier→nation and
    orders→customer→nation — both broadcast; lineitem⋈orders is the one
    real shuffle. The nation-pair disjunction is evaluated after both
    broadcasts so Catalyst can still push the shipdate range to the scan."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts_lit("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts_lit("1998-01-01 00:00:00"))
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(money_sum(_disc_price(), "revenue"))
    )


@register(
    "tpch_q8_market_share",
    oracle=f"""
    WITH all_nations AS (
      SELECT
        year(o_orderdate) AS o_year,
        {_DISC_SQL} AS volume,
        sn.n_name AS supp_nation
      FROM lineitem
      JOIN part      ON l_partkey = p_partkey
      JOIN orders    ON l_orderkey = o_orderkey
      JOIN customer  ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region    ON cn.n_regionkey = r_regionkey
      JOIN supplier  ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'EUROPE'
        AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT
      o_year,
      CAST((CAST(sum(CASE WHEN supp_nation = 'NATION_5'
                     THEN volume ELSE CAST(0 AS DECIMAL(10,2)) END)
              * 10000 AS HUGEINT) * 1000000)
        // CAST(sum(volume) * 10000 AS BIGINT) AS BIGINT) AS mkt_share_e6
    FROM all_nations
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_5's share of ECONOMY-part volume sold into EUROPE,
    by order year. Seven-table snowflake; every non-lineitem side broadcasts
    (region→nation prunes customers *before* the fact join). The share is a
    conditional-sum / total-sum ratio in one aggregation pass — no second
    shuffle, no self-join."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts_lit("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < ts_lit("1998-01-01 00:00:00"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    cn_keys = (
        n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    c = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(cn_keys), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _disc_price()
    zero = F.lit(0).cast(PRICE)
    nation_vol = F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(zero)
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(nation_vol) * 10000).cast("long").alias("_num4"),
            (F.sum(vol) * 10000).cast("long").alias("_den4"),
        )
        # exact e4-scaled decimal sums → integer share on the e6 grid
        # (the rounded-double ratio is the midpoint-tie class: a cents
        # ratio reducing to x/2^k·5^m lands exactly on a half boundary);
        # the product widens to DECIMAL(38)/HUGEINT — overflow-free at
        # any corpus scale
        .select(
            "o_year",
            F.expr(
                "(CAST(_num4 AS DECIMAL(38,0)) * 1000000) div _den4"
            ).alias("mkt_share_e6"),
        )
    )


@register(
    "tpch_q9_profit_by_nation",
    oracle=f"""
    SELECT
      sn.n_name AS nation,
      year(o_orderdate) AS o_year,
      CAST(round(sum({_DISC_SQL}
                     - TRY_CAST(CASE WHEN isfinite(p_retailprice) THEN p_retailprice END AS DECIMAL(10,2))
                       * TRY_CAST(CASE WHEN isfinite(l_quantity) THEN l_quantity END AS DECIMAL(10,2))
                       * CAST(0.10 AS DECIMAL(3,2))), 2) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part      ON l_partkey = p_partkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN orders    ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def tpch_q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on widget parts by supplier nation and year.
    No partsupp table exists, so supply cost is modeled as 10% of
    p_retailprice — the *plan* (part-name LIKE prefilter, 5-way join,
    two-column group) is the Q9 plan. The LIKE filter reduces part to ~1/6
    before its broadcast."""
    li = table(spark, sf_dir, "lineitem")
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = _disc_price() - dec("p_retailprice") * dec("l_quantity") * F.lit(
        "0.10"
    ).cast(RATE)
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(money_sum(profit, "sum_profit"))
    )


@register(
    "tpch_q13_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts, customers with
    zero orders included — which is exactly what the left outer join
    preserves (count(o_orderkey) ignores the null-extended rows). The join
    filter lives in the join condition, not a WHERE, or zero-order
    customers would vanish. Two shuffles: join on custkey, then the tiny
    re-aggregation on c_count."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_custkey", "o_orderkey")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT
      CAST((CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_DISC_SQL}
                     ELSE CAST(0 AS DECIMAL(10,2)) END) * 10000 AS HUGEINT)
         * 100000000)
        // CAST(sum({_DISC_SQL}) * 10000 AS BIGINT) AS BIGINT) AS promo_pct_e6
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: PROMO parts' share of one month's revenue. Single
    broadcast join + global conditional-ratio aggregate; the month filter
    prunes lineitem at the scan (parquet min/max on l_shipdate), so at
    100 TB this reads ~1/80 of the fact table."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts_lit("1997-03-01 00:00:00"))
        & (F.col("l_shipdate") < ts_lit("1997-04-01 00:00:00"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = _disc_price()
    zero = F.lit(0).cast(PRICE)
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.sum(promo) * 10000).cast("long").alias("_num4"),
            (F.sum(vol) * 10000).cast("long").alias("_den4"),
        )
        # percent on the e6 grid from exact e4 decimal sums (×1e8 = the
        # 100.0 factor and the e6 scale combined), widened to DECIMAL(38)
        .select(
            F.expr(
                "(CAST(_num4 AS DECIMAL(38,0)) * 100000000) div _den4"
            ).alias("promo_pct_e6")
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(round(sum({_DISC_SQL}), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue. The revenue CTE
    aggregates once; the max is a scalar aggregate of that small result
    broadcast back as a cross-join filter (Catalyst plans the scalar
    subquery exactly so). Revenue is an exact rounded decimal, so the
    equality against max is deterministic — the TPC-H spec's own tie rule."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts_lit("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts_lit("1997-04-01 00:00:00"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        money_sum(_disc_price(), "total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    -- coalesce: revenue lost over an EMPTY qualifying set is 0, and the
    -- stable BIGINT-backed 0 keeps the pandas dtype engine-identical on
    -- degenerate corpora (fuzz 13, class 47/48)
    SELECT CAST(round(coalesce(sum(TRY_CAST(CASE WHEN isfinite(l_extendedprice) THEN l_extendedprice END AS DECIMAL(10,2))), 0) / 7.0, 2) AS DOUBLE)
           AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.5 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost if below-half-average-quantity orders of
    Brand#1 parts stopped. The correlated avg subquery decorrelates into a
    per-part aggregate joined back on partkey — the aggregate is keyed on
    the *filtered* brand's parts only (semi-filtered before the avg), so
    the second pass over lineitem touches just those keys. avg uses
    count(*) per spec (no null quantities exist)."""
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_li = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    thresholds = brand_li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        brand_li.join(
            F.broadcast(thresholds), F.col("l_partkey") == F.col("t_partkey")
        )
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            # coalesce: 0 revenue over an empty qualifying set, mirroring
            # the oracle (fuzz 13, class 47/48)
            F.round(
                F.coalesce(F.sum(dec("l_extendedprice")), F.lit(0))
                / F.lit(7.0),
                2,
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "tpch_q18_large_volume_customer",
    oracle="""
    SELECT
      c_name, c_custkey, o_orderkey,
      epoch_ms(date_trunc('milliseconds', o_orderdate)) AS o_orderdate_ms,
      CAST(o_totalprice AS DOUBLE) AS o_totalprice,
      CAST(round(sum(TRY_CAST(CASE WHEN isfinite(l_quantity) THEN l_quantity END AS DECIMAL(10,2))), 2) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(TRY_CAST(CASE WHEN isfinite(l_quantity) THEN l_quantity END AS DECIMAL(10,2))) > 140
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with orders totalling > 140 units (threshold
    scaled to this corpus' ~4 lines/order). The IN subquery is a left_semi
    join against the having-filtered aggregate — the aggregate output is
    tiny (high-volume tail), so it broadcasts; lineitem is scanned twice
    but shuffled only once (the semi side reduces to orderkeys first)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("sq"))
        .where(F.col("sq") > 140)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    o = table(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == F.col("big_orderkey"), "left_semi"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            ms("o_orderdate").alias("o_orderdate_ms"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
        .agg(money_sum(dec("l_quantity"), "sum_qty"))
    )


@register(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
    -- coalesce: zero-row qualifying set -> 0 revenue (fuzz 13, 47/48)
    SELECT CAST(round(coalesce(sum({_DISC_SQL}), 0), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    -- NOT isnan pinned (fuzz 10): DuckDB's VECTORIZED filter evaluates
    -- NaN <= k as TRUE (total-order scan comparison) while its scalar
    -- path and Spark both say FALSE — a NaN quantity must fail every
    -- range arm on both engines
    WHERE NOT isnan(l_quantity)
      AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
            AND l_quantity BETWEEN 1 AND 15)
        OR (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 25
            AND l_quantity BETWEEN 10 AND 30)
        OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 35
            AND l_quantity BETWEEN 20 AND 50))
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs spanning both join sides. Catalyst factors the
    common parts: per-side implied filters (p_brand IN (...), l_quantity
    BETWEEN overall min/max) are derived and pushed below the join, the
    residual disjunction evaluates post-join. The part side shrinks to 3
    brands before broadcasting."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((br == "Brand#1") & sz.between(1, 15) & q.between(1, 15))
        | ((br == "Brand#11") & sz.between(1, 25) & q.between(10, 30))
        | ((br == "Brand#21") & sz.between(1, 35) & q.between(20, 50))
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(money_sum0(_disc_price(), "revenue"))
    )


@register(
    "tpch_q22_idle_customers",
    oracle="""
    SELECT
      c_custkey % 10 AS cohort,
      count(*) AS numcust,
      CAST(round(sum(TRY_CAST(CASE WHEN isfinite(c_acctbal) THEN c_acctbal END AS DECIMAL(10,2))), 2) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT avg(CAST(c_acctbal AS DOUBLE)) FROM customer WHERE c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY 1
    """,
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy-but-recently-idle customers by cohort
    (c_custkey % 10 stands in for the missing phone country code). Scalar
    avg subquery → broadcast single-row cross join; NOT EXISTS → left_anti
    against recent orders reduced to their custkeys. The avg is computed
    in double on both sides (identical summation over a 1.5k-row set;
    deterministic because the filter threshold is far from any c_acctbal
    value)."""
    c = table(spark, sf_dir, "customer")
    avg_bal = (
        c.where(F.col("c_acctbal") > 0)
        .agg(F.avg(F.col("c_acctbal").cast("double")).alias("avg_bal"))
    )
    recent = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= ts_lit("2000-01-01 00:00:00"))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy((F.col("c_custkey") % 10).alias("cohort"))
        .agg(
            F.count("*").alias("numcust"),
            money_sum(dec("c_acctbal"), "totacctbal"),
        )
    )


@register(
    "priority_status_cube",
    oracle="""
    SELECT
      coalesce(o_orderpriority, 'ALL') AS priority,
      coalesce(o_orderstatus, 'ALL') AS status,
      count(*) AS n_orders,
      CAST(round(sum(TRY_CAST(CASE WHEN isfinite(o_totalprice) THEN o_totalprice END AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    -- fuzz 13 class 46: Spark's CUBE on EMPTY input emits no rows (not
    -- even the () grand-total row DuckDB produces); count(*) > 0 is a
    -- no-op on any non-empty group and pins Spark's behavior exactly
    HAVING count(*) > 0
    """,
)
def priority_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (§7 step 4 alongside region_rollup's ROLLUP):
    all 2^2 grouping combinations in one pass — Spark expands the cube
    map-side and shuffles once on the expanded grouping-id key. NULL
    grouping slots are coalesced to 'ALL' so the driver's hash treats both
    engines' grand-total rows identically."""
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("total_price"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "tpch_q2_cheapest_part",
    oracle="""
    SELECT p_type, p_partkey, p_name,
           CAST(p_retailprice AS DOUBLE) AS p_retailprice
    FROM part p
    WHERE p_retailprice = (
      SELECT min(p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type
    )
    """,
)
def tpch_q2_cheapest_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar-min subquery (no partsupp table,
    so "min supply cost per part in region" adapts to "min retail price
    per type"). Catalyst decorrelates this into exactly what the
    DataFrame form writes by hand: a per-group min aggregate joined back
    on the correlation key — the aggregate output is group-cardinality
    (6 types), so it broadcasts. Ties keep all rows, per spec."""
    p = table(spark, sf_dir, "part")
    mins = p.groupBy(F.col("p_type").alias("m_type")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        p.join(
            F.broadcast(mins),
            (F.col("p_type") == F.col("m_type"))
            & (F.col("p_retailprice") == F.col("min_price")),
        )
        .select(
            "p_type",
            "p_partkey",
            "p_name",
            F.col("p_retailprice").cast("double").alias("p_retailprice"),
        )
    )


@register(
    "tpch_q12_late_shipment",
    oracle="""
    SELECT
      CASE WHEN floor(epoch_ms(date_trunc('milliseconds', l_shipdate)) / 86400000)
              - floor(epoch_ms(date_trunc('milliseconds', o_orderdate)) / 86400000) > 90
           THEN 'late' ELSE 'on-time' END AS ship_bucket,
      CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
)
def tpch_q12_late_shipment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: line counts split by priority class across
    shipping-delay buckets (l_shipdate − o_orderdate > 90 days stands in
    for the missing commit/receipt dates; priority classes for shipmode).
    One fact-fact join + conditional-sum aggregation — the pivot-like
    CASE-sum pattern that avoids a second pass.

    The delay bucket uses pure integer epoch-day arithmetic
    (``floor(epoch_ms/86400000)`` on BOTH engines), not datediff or
    timestamp + INTERVAL: epoch-ms → int day numbers involves no
    calendar, timezone, or date-cast semantics at all, so the bucket is
    invariant under every session-tz / NTZ-inference combination (q12
    was driver-red two rounds running under datediff variants that all
    passed locally)."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts_lit("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < ts_lit("1998-01-01 00:00:00"))
    ).select("l_orderkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")

    def _epoch_day(col: str):
        return F.floor(ms(col) / F.lit(86400000))

    bucket = F.when(
        _epoch_day("l_shipdate") - _epoch_day("o_orderdate") > 90,
        "late",
    ).otherwise("on-time")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q21_sole_supplier_orders",
    oracle="""
    SELECT s_suppkey, s_name, count(DISTINCT o_orderkey) AS n_sole_orders
    FROM supplier
    JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
    JOIN orders     ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY 1, 2
    """,
)
def tpch_q21_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: correlated NOT EXISTS with a non-equi residual —
    finished orders where the supplier was the *only* supplier (stands in
    for the waiting-supplier condition; same plan: join + anti join on
    the same fact with an inequality). The anti join ships only
    (l_orderkey, l_suppkey) pairs; distinct-count per supplier after."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l3 = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    sole = li.join(
        l3,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey")),
        "left_anti",
    )
    return (
        sole.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count_distinct(F.col("o_orderkey")).alias("n_sole_orders"))
    )


@register(
    "tpch_q11_important_parts",
    oracle=f"""
    WITH nat_supp AS (
      SELECT s_suppkey FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
    ), per_part AS (
      SELECT l_partkey, sum({_DISC_SQL}) AS v
      FROM lineitem JOIN nat_supp ON l_suppkey = s_suppkey
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(round(v, 2) AS DOUBLE) AS part_value
    FROM per_part
    WHERE v * 1000 > (SELECT sum(v) FROM per_part)
    """,
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group aggregate filtered against a scalar
    subquery over the *same* aggregate (no partsupp, so "stock value per
    part for one nation's suppliers" adapts to discounted revenue per
    part). The per-part agg is computed once and reused for the grand
    total — in Spark that's an explicit cache-free reuse: the 1-row total
    cross-joins (broadcast) back onto the per-part frame, so the fact
    shuffles once. The share threshold compares in DECIMAL (v*1000 >
    total), exact and order-independent in both engines; doubles only at
    the output edge. At 100 TB the nation filter prunes the supplier dim
    before its broadcast semi join onto lineitem."""
    n = (
        table(spark, sf_dir, "nation")
        .where(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    per_part = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(_disc_price()).alias("v"))
    )
    total = per_part.agg(F.sum("v").alias("total"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("v") * F.lit(1000) > F.col("total"))
        .select(
            "l_partkey",
            F.round(F.col("v"), 2).cast("double").alias("part_value"),
        )
    )


@register(
    "tpch_q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    triple, with a NOT IN exclusion subquery (negative-balance suppliers
    stand in for the missing complaint-comment filter; lineitem stands in
    for partsupp as the part↔supplier relation). The exclusion list is
    tiny → broadcast anti join, never a shuffle; the part dim filters
    before its broadcast join, so the only shuffle is the final distinct
    aggregation, which AQE coalesces. count(DISTINCT) is exact —
    no float involvement anywhere."""
    bad = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_concentrated_suppliers",
    oracle="""
    WITH sp AS (
      SELECT l_suppkey,
             sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                       AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
                      THEN TRY_CAST(CASE WHEN isfinite(l_quantity) THEN l_quantity END AS DECIMAL(10,2))
                      ELSE CAST(0 AS DECIMAL(10,2)) END) AS q97,
             sum(TRY_CAST(CASE WHEN isfinite(l_quantity) THEN l_quantity END AS DECIMAL(10,2))) AS qall
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'red%'
      GROUP BY l_suppkey, l_partkey
    )
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5'
      AND s_suppkey IN (SELECT l_suppkey FROM sp WHERE q97 * 2 > qall)
    """,
)
def tpch_q20_concentrated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries over a per-(supplier, part)
    aggregate threshold (availqty > ½·shipped-qty adapts to "shipped more
    than half this part's lifetime volume in 1997", since there is no
    partsupp.availqty). Quantity sums run in DECIMAL — l_quantity is a
    physical double, and a float sum would be partial-aggregation-order
    dependent. Plan: part name-filter broadcasts onto lineitem, one
    shuffle for the (suppkey, partkey) agg, then the qualifying-supplier
    set (tiny) broadcast-semi-joins onto the nation-filtered supplier dim."""
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    qty = dec("l_quantity")
    in_97 = (F.col("l_shipdate") >= ts_lit("1997-01-01 00:00:00")) & (
        F.col("l_shipdate") < ts_lit("1998-01-01 00:00:00")
    )
    sp = (
        table(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_97, qty).otherwise(F.lit(0).cast(PRICE))).alias("q97"),
            F.sum(qty).alias("qall"),
        )
        .where(F.col("q97") * F.lit(2) > F.col("qall"))
        .select("l_suppkey")
    )
    n = (
        table(spark, sf_dir, "nation")
        .where(F.col("n_name") == "NATION_5")
        .select("n_nationkey")
    )
    return (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(sp), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )
