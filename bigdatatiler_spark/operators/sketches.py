"""Sketch-based approximate aggregation queries.

The reference has no aggregation at all (SURVEY.md §2.4 — its one "agg"
is the client-side ordered merge O17), but a 100 TB engine needs
cardinality sketches: exact count-distinct is a full shuffle of every
distinct key, while a sketch is a few KB per group, mergeable across
partitions and across time (the partial-aggregation path Spark already
uses for approx aggregates).

Two surfaces:

- ``sketch_kmv_distinct`` — a K-minimum-values estimator built from
  *engine-portable* md5 hashing, so DuckDB can run the identical
  algorithm and the driver's exact hash-compare still applies. KMV is
  the classic bottom-k theta sketch (Bar-Yossef et al. 2002): keep the
  K smallest uniform hashes; with v_K the Kth smallest of a 32-bit
  space, distinct ≈ (K-1)·2³²/v_K.
- ``sketch_hll_native`` — Spark's built-in Apache DataSketches HLL
  (hll_sketch_agg / hll_union_agg), the real production path: binary
  sketches that merge across groups. No cross-engine oracle exists for
  HLL internals (DuckDB's approx_count_distinct is a different
  implementation), so since r11 the driver row carries the EXACT
  distinct count plus an oracle-pinned accuracy flag (the KMV pattern)
  instead of the raw estimate; test_sketches.py keeps the raw-estimate
  mergeability and accuracy asserts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from ._util import finite_or_null, ms
from ..registry import register
from ..tables import table

#: bottom-K size: 64 keeps the estimator's relative error ≈ 1/√(K-2) ≈ 13%
KMV_K = 64

_HASH_SPACE = float(2**32)


def _hv32(col: Column) -> Column:
    """Portable uniform 32-bit hash: md5 hex prefix → bigint.

    Same construction as text.py's rolling hash — md5, not F.hash
    (murmur3), because DuckDB must reproduce it bit-for-bit.
    """
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")


@register(
    "sketch_kmv_distinct",
    oracle=f"""
    WITH d AS (
      -- NULL user is not a sketch element (class 24: NULL hash sorts
      -- FIRST in Spark's bottom-k window, LAST in DuckDB's)
      SELECT DISTINCT event_type, user_id FROM events
      WHERE user_id IS NOT NULL
    ), h AS (
      SELECT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::UBIGINT
                  AS BIGINT) AS hv,
             count(*) OVER (PARTITION BY event_type) AS exact_distinct,
             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      FROM d
    )
    SELECT event_type,
           max(exact_distinct) AS exact_distinct,
           CASE WHEN max(exact_distinct) < {KMV_K}
                THEN CAST(max(exact_distinct) AS DOUBLE)
                ELSE CAST(round(({KMV_K} - 1) * {_HASH_SPACE!r} / max(hv), 2)
                          AS DOUBLE)
           END AS kmv_estimate
    FROM h WHERE rn <= {KMV_K}
    GROUP BY event_type
    """,
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-K theta) distinct-user estimate per event type, next
    to the exact count. One shuffle on (event_type, user_id) for the
    distinct, then the bottom-K selection rides the same event_type
    partitioning (window rank + unbounded count share one exchange). At
    100 TB the window sort is the naive form — the production variant
    keeps a K-element heap per partial aggregate exactly like Spark's
    own approx aggregates; semantics (and this query's output) are
    identical, so the oracle checks the algorithm, not the schedule.

    Standard KMV small-sample branch: a group with fewer than K distinct
    hashes hasn't filled the sketch, so the observed count IS the
    cardinality — emit it exactly instead of the (K-1)·2³²/v_K formula,
    which would return ≈K regardless of the true count."""
    d = (
        table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .distinct()
    )
    w = Window.partitionBy("event_type")
    h = d.select(
        "event_type",
        _hv32(F.col("user_id")).alias("hv"),
        F.count("*").over(w).alias("exact_distinct"),
    ).withColumn("rn", F.row_number().over(w.orderBy("hv")))
    return (
        h.where(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(
            F.max("exact_distinct").alias("exact_distinct"),
            F.when(
                F.max("exact_distinct") < KMV_K,
                F.max("exact_distinct").cast("double"),
            )
            .otherwise(
                F.round(F.lit((KMV_K - 1) * _HASH_SPACE) / F.max("hv"), 2)
                .cast("double")
            )
            .alias("kmv_estimate"),
        )
    )


#: heavy-hitter support threshold: keep tokens above 2% of all occurrences
FREQ_SUPPORT = 0.02


@register(
    "sketch_frequent_tokens",
    oracle=f"""
    WITH t AS (
      SELECT unnest(string_split(
               translate(trim(regexp_replace(text, '[ \\t\\n\\r\\x0B\\f]+', ' ', 'g')), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS token
      FROM documents
    ),
    c AS (SELECT token, count(*) AS occurrences FROM t GROUP BY token)
    SELECT token, occurrences,
           round(CAST(occurrences AS DOUBLE) / (SELECT sum(occurrences) FROM c), 6)
             AS support
    FROM c
    WHERE occurrences > {FREQ_SUPPORT} * (SELECT sum(occurrences) FROM c)
    """,
)
def sketch_frequent_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items (heavy hitters): corpus tokens above a 2% support
    threshold. This exact form is the semantic contract a Misra-Gries /
    SpaceSaving sketch approximates — any ε-counter with ε < support/2
    returns exactly this set — so the oracle pins the answer while the
    plan stays the 100 TB shape: explode is map-side, the token count is
    a partial-agg shuffle on a bounded vocabulary (≪ corpus), and the
    grand total joins back as a broadcast scalar, not a second pass over
    the data."""
    toks = (
        table(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.split(F.translate(F.trim(F.regexp_replace("text", r"[ \t\n\r\x0B\f]+", " ")), "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"), " ")
            ).alias("token")
        )
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("occurrences"))
    total = counts.agg(F.sum("occurrences").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("occurrences") > FREQ_SUPPORT * F.col("total"))
        .select(
            "token",
            "occurrences",
            F.round(F.col("occurrences") / F.col("total"), 6).alias("support"),
        )
    )


@register(
    "sketch_topk_native",
    oracle="""
    SELECT event_type AS item, count(*) AS est_count
    FROM events GROUP BY event_type
    """,
)
def sketch_topk_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native approx_top_k over the event-type column, exploded
    to (item, est_count) rows. Oracle-exact on purpose: a frequency
    sketch is *exact* whenever the tracked-item capacity (default 10000)
    covers the domain, and k ≥ the full domain means no cut-off
    tie-break either — so the driver's hash compare verifies the sketch
    path end-to-end against a plain GROUP BY. k=100 keeps ~20× headroom
    over the generator's event-type domain (5 today) so a future data
    generation with more types cannot silently turn this into a lossy
    cut-off comparison (tests pin the domain-fits-capacity invariant).
    At 100 TB the same expression holds any fixed accuracy budget per
    group while a plain count needs the full distinct shuffle."""
    return (
        table(spark, sf_dir, "events")
        .agg(F.explode(F.expr("approx_top_k(event_type, 100)")).alias("e"))
        .select(F.col("e.item").alias("item"), F.col("e.count").alias("est_count"))
    )


#: GK sketch accuracy: rank error ≤ 1/accuracy; exact while groups fit
QUANTILE_ACCURACY = 100_000


@register(
    "sketch_quantile_gk",
    oracle="""
    SELECT o_orderpriority,
           quantile_disc(CASE WHEN isfinite(o_totalprice) THEN o_totalprice END, 0.5)  AS p50,
           quantile_disc(CASE WHEN isfinite(o_totalprice) THEN o_totalprice END, 0.9)  AS p90,
           quantile_disc(CASE WHEN isfinite(o_totalprice) THEN o_totalprice END, 0.99) AS p99
    FROM orders GROUP BY o_orderpriority
    """,
)
def sketch_quantile_gk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch: Spark's Greenwald-Khanna percentile_approx per
    order priority, pinned against DuckDB's discrete quantiles. Same
    verification trick as sketch_topk_native: a GK summary with
    accuracy=100k is *exact* (returns a real data element at the exact
    rank) while each group holds fewer rows than that, so the driver's
    hash compare validates the sketch path; at 100 TB the identical
    expression keeps a fixed memory budget per group with rank error
    ≤ 1/accuracy, where the exact form (order_price_percentiles) needs a
    per-group sort. One partial-agg shuffle, sketches merged map-side.
    Non-finite prices leave the universe (finite_or_null — fuzz 9)."""
    q = F.percentile_approx(
        finite_or_null("o_totalprice"), [0.5, 0.9, 0.99], QUANTILE_ACCURACY
    )
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(q.alias("q"))
        .select(
            "o_orderpriority",
            F.col("q")[0].alias("p50"),
            F.col("q")[1].alias("p90"),
            F.col("q")[2].alias("p99"),
        )
    )


#: accuracy contract for the HLL driver row: |approx − exact| within
#: max(5% relative, 2 absolute). Default lgK=12 → RSE ≈ 1.6%, so 5% is
#: >3σ; the absolute slack covers tiny-cardinality hostile groups.
HLL_REL_BOUND = 0.05
HLL_ABS_BOUND = 2.0


@register(
    "sketch_hll_native",
    oracle="""
    WITH nz AS (SELECT event_type, user_id FROM events
                WHERE user_id IS NOT NULL)
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           CAST(1 AS BIGINT) AS hll_within_bounds
    FROM nz GROUP BY event_type
    UNION ALL
    SELECT 'ALL' AS event_type,
           count(DISTINCT user_id) AS exact_users,
           CAST(1 AS BIGINT) AS hll_within_bounds
    FROM nz
    """,
)
def sketch_hll_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production cardinality path: DataSketches HLL per event type plus
    a merged ALL row (hll_union_agg over the per-type sketches — the
    merge is the point: per-partition/per-day sketches roll up without
    touching raw data again).

    Oracle-checkable since r11 (r10 verdict #9, the KMV pattern): HLL
    binaries are implementation-specific so the raw estimate can't be
    cross-engine-hashed — instead the row carries the EXACT distinct
    count (value-checked against DuckDB) and an accuracy flag
    ``hll_within_bounds`` the oracle pins to 1: the sketch estimate must
    land within max(5% relative, 2 absolute) of truth. The flag is
    deterministic (HLL register state is max-based, insertion-order-
    independent), certifies the real DataSketches path end-to-end, and a
    drifting estimate flips the driver row red. Raw-estimate accuracy
    and mergeability stay asserted in tests/test_sketches.py. NULL users
    are not sketch elements; types with only NULL users leave the result
    on both engines (the filter precedes the group)."""
    ev = table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())

    def flag(approx: Column, exact: Column) -> Column:
        bound = F.greatest(
            exact.cast("double") * HLL_REL_BOUND, F.lit(HLL_ABS_BOUND)
        )
        return (
            F.abs(approx - exact.cast("double")) <= bound
        ).cast("bigint").alias("hll_within_bounds")

    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    by_type = per_type.select(
        "event_type",
        "exact_users",
        flag(F.hll_sketch_estimate("sk"), F.col("exact_users")),
    )
    merged = (
        per_type.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx")
        )
        .crossJoin(
            F.broadcast(ev.agg(F.countDistinct("user_id").alias("exact_users")))
        )
        .select(
            F.lit("ALL").alias("event_type"),
            "exact_users",
            flag(F.col("approx"), F.col("exact_users")),
        )
    )
    return by_type.unionByName(merged)


# ── count-min sketch ────────────────────────────────────────────────────

#: depth (independent hash rows) × width (counters per row). ε ≈ e/W ≈ 1%
#: of the stream length, failure probability ≈ e^-D ≈ 2%.
CMS_DEPTH = 4
CMS_WIDTH = 256
#: report the sketch estimate next to truth for this many heaviest tokens
CMS_TOPK = 20


def _cms_oracle() -> str:
    return f"""
    WITH t AS (
      SELECT unnest(string_split(
               translate(trim(regexp_replace(text, '[ \\t\\n\\r\\x0B\\f]+', ' ', 'g')), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS token
      FROM documents
    ),
    cnt AS (SELECT token, count(*) AS c FROM t GROUP BY token),
    cells AS (
      SELECT g.r,
             ('0x' || substr(md5(g.r::VARCHAR || '|' || token), 1, 8))::UBIGINT
               % {CMS_WIDTH} AS col,
             sum(c) AS v
      FROM cnt, generate_series(0, {CMS_DEPTH - 1}) g(r)
      GROUP BY g.r, col
    ),
    top AS (SELECT token, c FROM cnt ORDER BY c DESC, token LIMIT {CMS_TOPK})
    SELECT top.token,
           top.c AS exact_occurrences,
           CAST(min(cells.v) AS BIGINT) AS cms_estimate
    FROM top, generate_series(0, {CMS_DEPTH - 1}) g(r)
    JOIN cells ON cells.r = g.r
              AND cells.col = ('0x' || substr(md5(g.r::VARCHAR || '|' || top.token), 1, 8))::UBIGINT
                              % {CMS_WIDTH}
    GROUP BY top.token, top.c
    """


@register("sketch_countmin_tokens", oracle=_cms_oracle())
def sketch_countmin_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream: D×W integer
    counters (portable md5 row-salted hashing, so DuckDB rebuilds the
    IDENTICAL sketch bit-for-bit), point-queried for the CMS_TOPK
    heaviest tokens next to their exact counts. cms_estimate ≥
    exact_occurrences always (one-sided error); the gap shows the
    collision overestimate at this width.

    Scale shape: the sketch build aggregates the *vocabulary* frame
    (token counts — one bounded-key shuffle that any heavy-hitter query
    already pays), then folds it into D·W = {CMS_DEPTH}·{CMS_WIDTH}
    cells — a second agg over vocab-sized input into a CONSTANT-size
    frame. The sketch is re-mergeable (cells add across shards/windows,
    like the rollup's HLL column); point queries broadcast the
    constant-size cell frame. At 100 TB nothing here grows but the one
    vocabulary agg."""
    toks = table(spark, sf_dir, "documents").select(
        F.explode(
            F.split(F.translate(F.trim(F.regexp_replace("text", r"[ \t\n\r\x0B\f]+", " ")), "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"), " ")
        ).alias("token")
    )
    cnt = toks.groupBy("token").agg(F.count("*").alias("c"))
    rows = F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("r")
    salted = F.conv(
        F.substring(
            F.md5(F.concat(F.col("r").cast("string"), F.lit("|"), F.col("token"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    cells = (
        cnt.select("token", "c", rows)
        .select("r", (salted % CMS_WIDTH).alias("col"), "c")
        .groupBy("r", "col")
        .agg(F.sum("c").alias("v"))
    )
    top = cnt.orderBy(F.desc("c"), F.asc("token")).limit(CMS_TOPK)
    probes = top.select("token", "c", rows).select(
        "token", "c", "r", (salted % CMS_WIDTH).alias("col")
    )
    return (
        F.broadcast(probes)
        .join(cells, ["r", "col"])
        .groupBy("token", "c")
        .agg(F.min("v").cast("bigint").alias("cms_estimate"))
        .select(
            "token",
            F.col("c").alias("exact_occurrences"),
            "cms_estimate",
        )
    )


# ── KMV set algebra: join-cardinality estimation ──────────────────────────

#: hash space as exact integer (the estimators below never touch floats)
_HASH_SPACE_INT = 2**32


def _kmv_sketch(keys: DataFrame, key_col: str, k: int = KMV_K) -> DataFrame:
    """Bottom-k sketch of a key set as a frame of k distinct hv values.

    The sketch IS a set of points in hash space, so union/intersection
    algebra happens on hv alone; orderBy+limit compiles to
    TakeOrderedAndProject (k rows cross the wire per partition, never
    the key set)."""
    return (
        # NULL keys excluded — see _kmv_sketch_sql (fuzz round 6)
        keys.where(F.col(key_col).isNotNull())
        .select(_hv32(F.col(key_col)).alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )


def _kmv_sketch_sql(src: str, key: str, k: int = KMV_K) -> str:
    # NULL keys are not elements of the sketched set (same rule as
    # count DISTINCT) — and their NULL hash would sort FIRST in Spark's
    # bottom-k but LAST in DuckDB's (fuzz round 6, NULL o_custkey)
    return f"""
      SELECT hv FROM (
        SELECT DISTINCT
          CAST(('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 8))::UBIGINT
               AS BIGINT) AS hv
        FROM {src} WHERE {key} IS NOT NULL
      ) ORDER BY hv LIMIT {k}
    """


@register(
    "sketch_kmv_join_estimate",
    oracle=f"""
    WITH ska AS ({_kmv_sketch_sql('customer', 'c_custkey')}),
    skb AS ({_kmv_sketch_sql('orders', 'o_custkey')}),
    merged AS (
      SELECT hv FROM (SELECT hv FROM ska UNION SELECT hv FROM skb)
      ORDER BY hv LIMIT {KMV_K}
    ),
    est AS (
      SELECT count(*) AS n_merged, max(hv) AS theta,
             sum(CASE WHEN hv IN (SELECT hv FROM ska)
                       AND hv IN (SELECT hv FROM skb)
                      THEN 1 ELSE 0 END) AS n_shared
      FROM merged
    ),
    exact AS (
      SELECT (SELECT count(DISTINCT c_custkey) FROM customer) AS exact_a,
             (SELECT count(DISTINCT o_custkey) FROM orders) AS exact_b
    ),
    exact_i AS (
      SELECT count(*) AS exact_intersection FROM (
        SELECT c_custkey FROM customer
        INTERSECT SELECT o_custkey FROM orders
      )
    )
    SELECT
      CAST(CASE WHEN n_merged < {KMV_K} THEN n_merged * 100
           ELSE (({KMV_K} - 1) * {_HASH_SPACE_INT} * 100) // theta
           END AS BIGINT) AS est_union_e2,
      CAST(CASE WHEN n_merged < {KMV_K} THEN n_shared * 100
           ELSE (n_shared * ((({KMV_K} - 1) * {_HASH_SPACE_INT} * 100)
                             // theta)) // {KMV_K}
           END AS BIGINT) AS est_intersection_e2,
      CAST(exact_a + exact_b -
           (SELECT exact_intersection FROM exact_i) AS BIGINT) AS exact_union,
      CAST((SELECT exact_intersection FROM exact_i) AS BIGINT)
        AS exact_intersection
    FROM est, exact
    """,
)
def sketch_kmv_join_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from KMV sketch algebra — the CBO
    input a planner needs BEFORE running a join: distinct-key union and
    intersection of customer.c_custkey vs orders.o_custkey estimated
    from two bottom-{KMV_K} sketches (a few KB), beside the exact truth
    columns for driver-verified error inspection.

    Estimator (Beyer et al.): merge = bottom-k of sketch-union; θ = its
    k-th smallest hash → |A∪B| ≈ (k-1)·2³²/θ; ρ = fraction of merged
    points present in BOTH input sketches → |A∩B| ≈ ρ·|A∪B|. Every
    quantity here stays an INTEGER ((k-1)·2³²·100 < 2^63, floor-div by
    θ, then by k) — the de-float rule applied to an estimator, so both
    engines produce the identical centi-scaled estimates.

    Scale shape: each sketch is one distinct + TakeOrderedAndProject (k
    rows out of any key cardinality); the estimate itself is sketch-
    algebra on ≤ 3k rows. The exact columns are the expensive truth
    (full distinct + INTERSECT) kept here for verification — a real
    planner ships only the sketches."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    ska = _kmv_sketch(c, "c_custkey")
    skb = _kmv_sketch(o, "o_custkey")
    merged = (
        ska.unionByName(skb).distinct().orderBy("hv").limit(KMV_K)
    )
    in_a = F.broadcast(ska.withColumnRenamed("hv", "hv_a"))
    in_b = F.broadcast(skb.withColumnRenamed("hv", "hv_b"))
    flags = (
        merged.join(in_a, merged.hv == in_a.hv_a, "left")
        .join(in_b, merged.hv == in_b.hv_b, "left")
        .select(
            "hv",
            (F.col("hv_a").isNotNull() & F.col("hv_b").isNotNull()).alias(
                "shared"
            ),
        )
    )
    est = flags.agg(
        F.count("*").alias("n_merged"),
        F.max("hv").alias("theta"),
        F.sum(F.col("shared").cast("bigint")).alias("n_shared"),
    )
    # exact union/intersection from one full-outer key join pass —
    # NULL keys excluded, same as count(DISTINCT) / the sketch universe
    a_keys = c.select(F.col("c_custkey").alias("k")).where(
        F.col("k").isNotNull()
    ).distinct()
    b_keys = o.select(F.col("o_custkey").alias("k")).where(
        F.col("k").isNotNull()
    ).distinct()
    j = a_keys.withColumnRenamed("k", "ka").join(
        b_keys.withColumnRenamed("k", "kb"),
        F.col("ka") == F.col("kb"),
        "full_outer",
    )
    exact = j.agg(
        F.count("*").alias("exact_union"),
        # coalesce: empty-join SUM is NULL vs the oracle's INTERSECT
        # count 0 (fuzz 13, class 47)
        F.coalesce(
            F.sum(
                (F.col("ka").isNotNull() & F.col("kb").isNotNull()).cast(
                    "bigint"
                )
            ),
            F.lit(0),
        ).alias("exact_intersection"),
    )
    k_, hs = KMV_K, _HASH_SPACE_INT
    est_union = F.when(
        F.col("n_merged") < k_, F.col("n_merged") * 100
    ).otherwise(F.expr(f"(({k_} - 1) * {hs} * 100) div theta"))
    out = est.crossJoin(F.broadcast(exact)).select(
        est_union.cast("long").alias("est_union_e2"),
        F.when(F.col("n_merged") < k_, F.col("n_shared") * 100)
        .otherwise(
            F.expr(
                f"(n_shared * ((({k_} - 1) * {hs} * 100) div theta)) div {k_}"
            )
        )
        .cast("long")
        .alias("est_intersection_e2"),
        F.col("exact_union").cast("long").alias("exact_union"),
        F.col("exact_intersection").cast("long").alias("exact_intersection"),
    )
    return out


# ── equi-depth histogram: the ANALYZE-stats companion ─────────────────────

#: histogram resolution (buckets)
HIST_BUCKETS = 20


@register(
    "customer_revenue_equidepth",
    oracle=f"""
    WITH cust AS (
      SELECT o_custkey,
             CAST(sum(CAST(TRY_CAST(CASE WHEN isfinite(o_totalprice) THEN o_totalprice END AS DECIMAL(18,2)) * 100
                  AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ),
    b AS (
      SELECT rev,
             ntile({HIST_BUCKETS}) OVER (ORDER BY rev, o_custkey) AS bucket
      -- NULL rev = no usable (finite) revenue: unknown, not zero —
      -- leaves the histogram universe (fuzz 9; NULL also sorts FIRST in
      -- Spark's ntile order and LAST in DuckDB's)
      FROM cust WHERE rev IS NOT NULL
    )
    SELECT bucket, count(*) AS n_customers,
           min(rev) AS lo_cents, max(rev) AS hi_cents
    FROM b GROUP BY bucket
    """,
)
def customer_revenue_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram of customer lifetime revenue — the ANALYZE
    statistic a cost-based optimizer uses for range-selectivity
    estimation (each bucket holds ~n/{HIST_BUCKETS} rows, so a range
    predicate's selectivity reads off the overlapped buckets ±1 bucket
    of error; the companion sketch_kmv_join_estimate covers the
    join-cardinality side of CBO stats). NTILE over a TOTAL order
    (revenue, custkey) makes bucket assignment engine-exact — the ANSI
    ntile split (first n mod B buckets one row larger) is identical in
    Spark and DuckDB.

    Plan (r9 verdict watch item, cleared in r10): one custkey aggregate
    (the only fact-sized shuffle), then the exact ntile rides
    ``_util.distributed_rank`` + ``ntile_from_rank`` — range buckets,
    within-bucket windows, broadcast offsets — so NO single-partition
    window exists even at ~10⁹ customers. The oracle keeps the
    one-window ntile as ground truth; the GK-sketch boundary path
    (sketch_quantile_gk) remains the approximate alternative."""
    from ._util import distributed_rank, ntile_from_rank

    o = table(spark, sf_dir, "orders")
    cust = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            )
            .cast("long")
            .alias("rev")
        )
        .where(F.col("rev").isNotNull())  # all-NaN customer: unknown revenue
        .localCheckpoint()  # two consumers: the rank pipeline + the count
    )
    n = cust.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    ranked = distributed_rank(
        cust, [F.asc("rev"), F.asc("o_custkey")], rank_name="_rn"
    )
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            "rev",
            ntile_from_rank(F.col("_rn"), F.col("_n"), HIST_BUCKETS).alias(
                "bucket"
            ),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("rev").alias("lo_cents"),
            F.max("rev").alias("hi_cents"),
        )
    )


# ── selectivity estimation off the equi-depth histogram ───────────────────

#: fixed range predicates (cents) the report estimates — data-independent
#: constants so fixture regeneration cannot shift the query's meaning
SEL_PREDICATES = (
    (1, 10_000_00, 50_000_00),      # mid-range customers
    (2, 0, 20_000_00),              # low tail
    (3, 40_000_00, 200_000_00),     # high tail
)


def _sel_hist_sql() -> str:
    return f"""
      SELECT bucket, count(*) AS n_rows,
             min(rev) AS lo, max(rev) AS hi
      FROM (
        SELECT rev,
               ntile({HIST_BUCKETS}) OVER (ORDER BY rev, o_custkey) AS bucket
        FROM (
          SELECT o_custkey,
                 CAST(sum(CAST(TRY_CAST(CASE WHEN isfinite(o_totalprice) THEN o_totalprice END AS DECIMAL(18,2)) * 100
                      AS BIGINT)) AS BIGINT) AS rev
          FROM orders GROUP BY 1
        ) WHERE rev IS NOT NULL
      ) GROUP BY bucket
    """


@register(
    "orders_selectivity_report",
    oracle=f"""
    WITH hist AS ({_sel_hist_sql()}),
    preds(pred_id, p_lo, p_hi) AS (VALUES {
        ", ".join(
            f"(CAST({i} AS BIGINT), CAST({lo} AS BIGINT), CAST({hi} AS BIGINT))"
            for i, lo, hi in SEL_PREDICATES
        )
    }),
    est AS (
      SELECT p.pred_id, p.p_lo, p.p_hi,
             CAST(sum(CASE
               WHEN h.hi < p.p_lo OR h.lo > p.p_hi THEN 0
               WHEN h.hi = h.lo THEN
                 CASE WHEN h.lo BETWEEN p.p_lo AND p.p_hi
                      THEN h.n_rows ELSE 0 END
               ELSE (h.n_rows * (least(h.hi, p.p_hi) - greatest(h.lo, p.p_lo)))
                    // (h.hi - h.lo)
             END) AS BIGINT) AS est_rows
      FROM preds p, hist h
      GROUP BY 1, 2, 3
    ),
    act AS (
      SELECT p.pred_id, count(*) AS actual_rows
      FROM preds p
      JOIN (
        SELECT CAST(sum(CAST(TRY_CAST(CASE WHEN isfinite(o_totalprice) THEN o_totalprice END AS DECIMAL(18,2)) * 100
                    AS BIGINT)) AS BIGINT) AS rev
        FROM orders GROUP BY o_custkey
      ) c ON c.rev BETWEEN p.p_lo AND p.p_hi
      GROUP BY 1
    )
    SELECT e.pred_id, e.p_lo, e.p_hi, e.est_rows,
           CAST(coalesce(a.actual_rows, 0) AS BIGINT) AS actual_rows
    FROM est e LEFT JOIN act a USING (pred_id)
    """,
)
def orders_selectivity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The estimation step of CBO stats: three fixed revenue-range
    predicates priced off the equi-depth histogram (full buckets count
    whole; partially-overlapped buckets contribute
    ⌊n·overlap/width⌋ by uniform-within-bucket interpolation — the
    textbook histogram-selectivity rule) beside the exact counts. With
    customer_revenue_equidepth (the statistic) and
    sketch_kmv_join_estimate (join cardinality) this completes the CBO
    input set; everything stays in floor-div integers, so both engines
    replay the identical estimate.

    Plan: the histogram build (one fact shuffle + the distributed-rank
    ntile, no single-partition window — r10) + a 3×{HIST_BUCKETS}
    broadcast estimate fold + one exact pass for the truth columns — a
    real planner keeps only the histogram and skips the exact pass."""
    from ._util import distributed_rank, ntile_from_rank

    o = table(spark, sf_dir, "orders")
    cust = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
            )
            .cast("long")
            .alias("rev")
        )
        .where(F.col("rev").isNotNull())  # all-NaN customer: unknown revenue
        .localCheckpoint()  # consumers: rank pipeline, count, exact pass
    )
    n = cust.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    hist = (
        distributed_rank(cust, [F.asc("rev"), F.asc("o_custkey")], rank_name="_rn")
        .crossJoin(F.broadcast(n))
        .select(
            "rev",
            ntile_from_rank(F.col("_rn"), F.col("_n"), HIST_BUCKETS).alias(
                "bucket"
            ),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("rev").alias("lo"),
            F.max("rev").alias("hi"),
        )
    )
    preds = F.broadcast(
        spark.createDataFrame(
            list(SEL_PREDICATES), "pred_id long, p_lo long, p_hi long"
        )
    )
    contrib = (
        F.when((F.col("hi") < F.col("p_lo")) | (F.col("lo") > F.col("p_hi")), 0)
        .when(
            F.col("hi") == F.col("lo"),
            F.when(
                F.col("lo").between(F.col("p_lo"), F.col("p_hi")),
                F.col("n_rows"),
            ).otherwise(0),
        )
        .otherwise(
            F.expr(
                "(n_rows * (least(hi, p_hi) - greatest(lo, p_lo)))"
                " div (hi - lo)"
            )
        )
    )
    est = (
        hist.crossJoin(preds)
        .groupBy("pred_id", "p_lo", "p_hi")
        .agg(F.sum(contrib).cast("long").alias("est_rows"))
    )
    act = (
        cust.crossJoin(preds)
        .where(F.col("rev").between(F.col("p_lo"), F.col("p_hi")))
        .groupBy("pred_id")
        .agg(F.count("*").alias("actual_rows"))
    )
    return est.join(act, "pred_id", "left").select(
        "pred_id",
        "p_lo",
        "p_hi",
        "est_rows",
        F.coalesce(F.col("actual_rows"), F.lit(0)).cast("long").alias(
            "actual_rows"
        ),
    )


# --- exact distinct via bitmap words (roaring-lite) ---------------------------
# The EXACT counterpart of the sketches above, with the same mergeable
# partial-aggregation shape: count-distinct users per event type by
# packing user ids into fixed-width bitmap words — bit i of word w set
# iff user w·32+i was seen. count(DISTINCT x) shuffles every raw
# (group, x) pair to the reducer; the bitmap form pre-reduces map-side
# to at most |groups|·|words| rows (bit_or is commutative/associative,
# so Spark's partial HashAggregate combines words before the exchange),
# then distinct = Σ bit_count(word). At 100 TB with dense ids this is
# the roaring-bitmap pattern every warehouse uses for exact distinct
# rollups — and unlike HLL, the words also support exact set algebra
# (AND = intersection cardinality) downstream.
#
# 32-bit words inside BIGINT masks: 1 << 31 stays positive in int64, so
# DuckDB never hits its signed-shift overflow and Spark never wraps.
# Negative ids (hostile: -2^62) decompose as word·32 + bit with bit in
# [0,32) — bit uses double-mod (((id % 32) + 32) % 32) and the word
# subtracts the bit FIRST, so the division is exact and trunc-vs-floor
# can't diverge.

BITMAP_WORD_BITS = 32


@register(
    "events_bitmap_distinct",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             ((user_id % {BITMAP_WORD_BITS}) + {BITMAP_WORD_BITS})
               % {BITMAP_WORD_BITS} AS bit,
             user_id FROM events WHERE user_id IS NOT NULL
    ),
    words AS (
      SELECT event_type, (user_id - bit) // {BITMAP_WORD_BITS} AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(bit AS INTEGER)) AS mask
      FROM b GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(sum(bit_count(mask)) AS BIGINT) AS n_users_bitmap,
           CAST(count(*) AS BIGINT) AS n_words
    FROM words
    GROUP BY event_type
    """,
)
def events_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type via 32-bit bitmap words
    (roaring-lite; see block comment) — two partial-aggregating passes
    (bit_or per word, then Σ bit_count) instead of count(DISTINCT)'s raw
    id shuffle.

    Plan: groupBy(type, word) bit_or → groupBy(type) sum — both stages
    map-side combine; the exchange carries one row per populated word,
    not one per event. NULL-keyed group semantics: NULL event_type is a
    real group on both engines; NULL users counted nowhere."""
    ev = table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    w = BITMAP_WORD_BITS
    bit = ((F.col("user_id") % w) + w) % w
    words = (
        ev.select(
            "event_type",
            bit.alias("bit"),
            F.expr(f"(user_id - (((user_id % {w}) + {w}) % {w})) div {w}").alias(
                "word"
            ),
        )
        .groupBy("event_type", "word")
        .agg(
            # the PySpark shiftleft wrapper only takes a literal shift;
            # the SQL form accepts a column expression
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")
            ).alias("mask")
        )
    )
    return words.groupBy("event_type").agg(
        F.sum(F.bit_count("mask")).cast("bigint").alias("n_users_bitmap"),
        F.count(F.lit(1)).alias("n_words"),
    )


# --- sliding distinct via mergeable per-day bitmaps -------------------------
# The MERGE half of the bitmap-sketch algebra that events_bitmap_distinct
# builds: exact trailing-7-day active users computed by OR-merging per-day
# bitmap words instead of re-scanning raw events. The 100 TB shape: the
# per-(day, word) bitmap state is the PERSISTED rollup (days × populated
# words rows, tiny next to raw events, built incrementally per day);
# answering ANY trailing window is then a scatter of each day-word row to
# the ≤7 window ends it covers (explode of a 7-element offset array — a
# bounded fan-out of the tiny state, never a raw-event shuffle) followed
# by two partial-aggregating passes (bit_or per (end-day, word), then
# Σ bit_count per end-day). Exact, mergeable, and embarrassingly parallel
# — the same reason production rollups store HLL/bitmap state per grain.
# Oracle = the de-novo distinct count over the raw day×user frame, proving
# the merged-sketch path EXACTLY matches first-principles recomputation.


@register(
    "events_sliding_bitmap_distinct",
    oracle=f"""
    WITH du AS (
      SELECT DISTINCT
        CAST(floor(epoch_ms(date_trunc('milliseconds', ts)) / 86400000)
          AS BIGINT) AS day,
        user_id
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT d.day,
           CAST(count(DISTINCT u.user_id) AS BIGINT) AS active_7d,
           CAST(count(DISTINCT (u.user_id
             - (((u.user_id % {BITMAP_WORD_BITS}) + {BITMAP_WORD_BITS})
                % {BITMAP_WORD_BITS})) // {BITMAP_WORD_BITS})
             AS BIGINT) AS n_words
    FROM days d
    JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
)
def events_sliding_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per observed day via per-day bitmap
    merge (see block comment) — the mergeable-state sliding distinct."""
    w = BITMAP_WORD_BITS
    ev = table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    day = F.floor(ms("ts") / F.lit(86400000)).cast("long")
    # stage 1: the persisted per-day bitmap state — one row per
    # (day, word), built with map-side combine
    day_words = (
        ev.select(
            day.alias("day"),
            (((F.col("user_id") % w) + w) % w).alias("bit"),
            F.expr(f"(user_id - (((user_id % {w}) + {w}) % {w})) div {w}").alias(
                "word"
            ),
        )
        .groupBy("day", "word")
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")
            ).alias("mask")
        )
    )
    # stage 2: scatter each day's state to the <=7 trailing-window ends
    # it covers, keep only ends that are OBSERVED days, then OR-merge
    observed = day_words.select("day").distinct()
    scattered = day_words.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        (F.col("day") + F.col("off")).alias("end_day"),
        "word",
        "mask",
    ).drop("off")
    merged = (
        scattered.join(
            F.broadcast(observed.withColumnRenamed("day", "end_day")), "end_day"
        )
        .groupBy("end_day", "word")
        .agg(F.bit_or("mask").alias("mask7"))
    )
    return merged.groupBy("end_day").agg(
        F.sum(F.bit_count("mask7")).cast("bigint").alias("active_7d"),
        F.count(F.lit(1)).alias("n_words"),
    ).withColumnRenamed("end_day", "day")
