"""Constraint validation: declarative data-quality checks as aggregates.

The reference trusts its writer (single client, no constraints beyond
the null/blank guards in LogChange.cs:198-206). A 100 TB table fed by
many writers needs the warehouse-standard audit instead (Deequ/dbt-test
class): uniqueness, referential integrity, domain and range rules,
evaluated BEFORE downstream jobs consume a new drop.

Scale shape — three plan classes, nothing else:
- row-level rules (nulls, ranges, domains) fold into ONE map-side
  conditional-sum aggregate regardless of how many rules are declared;
- uniqueness is one key-grouped aggregate;
- referential integrity is an anti-join (broadcast when the parent is a
  dimension — the TPC-H case — shuffle otherwise).
The audit result is a single row of violation counts, so alerting +
history cost nothing; violating ROWS are a filter away using the same
predicates when a count is non-zero.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..registry import register
from ..tables import table


def violation_counts(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """1-row frame: for each named rule, the COUNT OF ROWS VIOLATING it
    (rules are boolean Columns that are True when the row is GOOD).
    Arbitrarily many rules stay one map-side aggregate pass."""
    if not rules:
        raise ValueError("violation_counts requires at least one rule")
    return df.agg(
        *[
            F.sum((~cond).cast("bigint")).alias(name)
            for name, cond in rules.items()
        ]
    )


def duplicate_key_count(df: DataFrame, keys: tuple[str, ...]) -> DataFrame:
    """1-row frame ``dup_<keys>``: how many key values occur more than
    once (a PRIMARY KEY / UNIQUE constraint as an aggregate)."""
    name = "dup_" + "_".join(keys)
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.sum((F.col("_n") > 1).cast("bigint")).alias(name))
        .na.fill({name: 0})
    )


def fk_orphan_count(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    broadcast_parent: bool = True,
) -> DataFrame:
    """1-row frame ``orphan_<child_key>``: child rows whose key has no
    parent (FOREIGN KEY as an anti-join; broadcast the dimension side)."""
    p = parent.select(F.col(parent_key).alias(child_key)).distinct()
    if broadcast_parent:
        p = F.broadcast(p)
    return (
        child.join(p, child_key, "left_anti")
        .agg(F.count(F.lit(1)).alias(f"orphan_{child_key}"))
    )


def audit(parts: list[DataFrame]) -> DataFrame:
    """Combine independent 1-row check frames into the single audit row.
    Each cross join's build side is one row — a constant-size broadcast,
    not a data-sized nested loop."""
    return reduce(lambda a, b: a.crossJoin(F.broadcast(b)), parts)


@register(
    "orders_constraint_audit",
    oracle="""
    SELECT
      (SELECT count(*) FROM orders) AS n_rows,
      (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS null_custkey,
      (SELECT count(*) FROM orders WHERE o_totalprice <= 0) AS nonpos_totalprice,
      (SELECT count(*) FROM orders
        WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS bad_status,
      (SELECT count(*) FROM (
         SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1
       )) AS dup_o_orderkey,
      (SELECT count(*) FROM orders o WHERE NOT EXISTS (
         SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
       )) AS orphan_o_custkey
    """,
)
def orders_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The constraint audit on orders: not-null + range + domain rules
    (one conditional-sum pass), primary-key uniqueness (one key agg),
    and orders→customer referential integrity (broadcast anti-join) —
    one row of violation counts. The oracle recomputes each count as an
    independent scalar subquery."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    # row count folds into the same single pass as the row-level rules
    rules = {
        "null_custkey": F.col("o_custkey").isNotNull(),
        "nonpos_totalprice": F.col("o_totalprice") > 0,
        "bad_status": F.col("o_orderstatus").isin("O", "F", "P"),
    }
    row_pass = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum((~cond).cast("bigint")).alias(nm) for nm, cond in rules.items()],
    )
    dup = duplicate_key_count(o, ("o_orderkey",))
    orphan = fk_orphan_count(o, c, "o_custkey", "c_custkey")
    return audit([row_pass, dup, orphan]).select(
        "n_rows",
        "null_custkey",
        "nonpos_totalprice",
        "bad_status",
        "dup_o_orderkey",
        "orphan_o_custkey",
    )


@register(
    "lineitem_constraint_audit",
    oracle="""
    SELECT
      (SELECT count(*) FROM lineitem) AS n_rows,
      (SELECT count(*) FROM lineitem WHERE l_quantity <= 0) AS nonpos_quantity,
      (SELECT count(*) FROM lineitem
        WHERE l_discount < 0 OR l_discount > 1) AS bad_discount,
      (SELECT count(*) FROM (
         SELECT l_orderkey, l_linenumber FROM lineitem
         GROUP BY 1, 2 HAVING count(*) > 1
       )) AS dup_l_orderkey_l_linenumber,
      (SELECT count(*) FROM lineitem l WHERE NOT EXISTS (
         SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey
       )) AS orphan_l_orderkey
    """,
)
def lineitem_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact-scale audit: same rule classes as orders_constraint_audit
    but the referenced table (orders) is ITSELF fact-sized, so the
    referential-integrity check runs as a SHUFFLE anti-join on the key —
    the plan both sides of a 100 TB star schema actually need (AQE still
    demotes it to broadcast at small SF). Composite-key uniqueness
    ((l_orderkey, l_linenumber) — the TPC-H primary key) rides the same
    key-grouped aggregate shape."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    row_pass = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("l_quantity") <= 0).cast("bigint")).alias("nonpos_quantity"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast("bigint")
        ).alias("bad_discount"),
    )
    dup = duplicate_key_count(li, ("l_orderkey", "l_linenumber"))
    orphan = fk_orphan_count(
        li, o, "l_orderkey", "o_orderkey", broadcast_parent=False
    )
    return audit([row_pass, dup, orphan]).select(
        "n_rows",
        "nonpos_quantity",
        "bad_discount",
        "dup_l_orderkey_l_linenumber",
        "orphan_l_orderkey",
    )


# --- Merkle-style bucket checksums ----------------------------------------
# Anti-entropy / replica validation (the Dynamo/Cassandra Merkle-tree idea
# flattened to one level): two copies of a table — a migrated cluster, a
# replicated region, a format conversion — are compared by BUCKET
# SIGNATURES instead of row-by-row. Each row folds to a 32-bit md5
# signature of its canonical representation; a bucket's signature is the
# SUM of its rows' signatures (order-independent, partition-independent —
# no sort anywhere), so each side computes N_CK_BUCKETS tiny rows and the
# comparison localizes any divergence to the differing buckets, which are
# then re-scanned row-level (bucket-sized IO, not table-sized). Sums
# accumulate in DECIMAL(38,0): overflow-free for any table size without
# ANSI-mode-dependent BIGINT wraparound.

N_CK_BUCKETS = 64


def bucket_checksums(df: DataFrame, key: Column, repr_col: Column) -> DataFrame:
    """(bucket, n_rows, sig_sum) — the one-level Merkle signature frame.
    ``repr_col`` must be a canonical STRING representation whose
    construction is deterministic on both engines (no raw floats)."""
    sig = F.conv(F.substring(F.md5(repr_col), 1, 8), 16, 10).cast("decimal(38,0)")
    return (
        df.select(F.pmod(key, F.lit(N_CK_BUCKETS)).alias("bucket"), sig.alias("sig"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("sig").cast("decimal(38,0)").alias("sig_sum"),
        )
    )


def diverging_buckets(a: DataFrame, b: DataFrame) -> list[int]:
    """Buckets where two checksum frames disagree — the re-scan set."""
    joined = a.alias("a").join(
        b.alias("b"), F.col("a.bucket") == F.col("b.bucket"), "full_outer"
    )
    rows = joined.where(
        F.col("a.n_rows").isNull()
        | F.col("b.n_rows").isNull()
        | (F.col("a.n_rows") != F.col("b.n_rows"))
        | (F.col("a.sig_sum") != F.col("b.sig_sum"))
    ).select(F.coalesce(F.col("a.bucket"), F.col("b.bucket")).alias("bucket"))
    return sorted(r.bucket for r in rows.collect())


@register(
    "events_bucket_checksums",
    oracle=f"""
    SELECT
      event_id % {N_CK_BUCKETS} AS bucket,
      count(*) AS n_rows,
      CAST(sum(('0x' || substr(md5(
        concat_ws('|', event_id, user_id, event_type,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT),
                  epoch_ms(ts))
      ), 1, 8))::UBIGINT) AS BIGINT) AS sig_sum
    FROM events
    GROUP BY 1
    """,
)
def events_bucket_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table's Merkle signature frame: {N_CK_BUCKETS} buckets
    keyed by event_id, row representation = all columns canonicalized to
    integers/strings (value as exact cents, ts as epoch ms — the no-raw-
    float/no-raw-timestamp registry rules applied to the row repr
    itself). One map-side-combined shuffle on a perfectly uniform key."""
    ev = table(spark, sf_dir, "events")
    rep = F.concat_ws(
        "|",
        F.col("event_id"),
        F.col("user_id"),
        F.col("event_type"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint"),
        F.unix_millis(F.col("ts")),
    )
    return bucket_checksums(ev, F.col("event_id"), rep)


# --- Referential-integrity profile across the whole schema -------------------


def fk_edge_profile(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    edge: str,
) -> DataFrame:
    """1-row RI profile of one foreign-key edge: child row/key counts,
    orphaned child rows (FK violation), and unreferenced parents
    (coverage — parents no child points at).

    ``n_unref_parents`` counts unreferenced parent KEYS (the parent set
    is deduped before the join), not parent rows — the two differ only
    when the parent side is not key-unique; NULL keys on either side are
    never counted as parents (a NULL child key is an orphan).

    One pass: child rows collapse to per-key counts first (the only scan
    of the fact side), then the KEY frames full-outer-join and all four
    stats fall out of a single aggregate — no separate anti-join per
    stat. Full-outer cannot broadcast in Spark, so the join is a key
    shuffle on both sides — but of key-cardinality frames, never raw
    fact rows, and AQE handles skewed keys. That trade (one extra
    dimension-keyframe shuffle) buys the unreferenced-parent stat that a
    broadcast anti-join formulation would need a second pass for.
    """
    ck = child.groupBy(F.col(child_key).alias("ck")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    pk = parent.select(F.col(parent_key).alias("pk")).distinct()
    joined = ck.join(pk, ck.ck == pk.pk, "full_outer")
    return joined.agg(
        F.lit(edge).alias("edge"),
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_child"),
        F.count("ck").alias("n_child_keys"),
        F.coalesce(
            F.sum(F.when(F.col("pk").isNull(), F.col("cnt"))), F.lit(0)
        ).alias("n_orphans"),
        # pk non-null guard: a NULL child key also produces a row with
        # ck NULL after the full outer join — it is an orphan, never an
        # unreferenced parent
        F.count(
            F.when(F.col("ck").isNull() & F.col("pk").isNotNull(), F.lit(1))
        ).alias("n_unref_parents"),
    )


_FK_EDGES = (
    # (edge label, child table, child key, parent table, parent key)
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("events->customer", "events", "user_id", "customer", "c_custkey"),
)


def _fk_edge_sql(edge: str, ct: str, ck: str, pt: str, pk: str) -> str:
    return f"""
    SELECT '{edge}' AS edge,
           (SELECT count(*) FROM {ct}) AS n_child,
           (SELECT count(DISTINCT {ck}) FROM {ct}) AS n_child_keys,
           (SELECT count(*) FROM {ct} c WHERE NOT EXISTS
              (SELECT 1 FROM {pt} p WHERE p.{pk} = c.{ck})) AS n_orphans,
           (SELECT count(DISTINCT p.{pk}) FROM {pt} p WHERE NOT EXISTS
              (SELECT 1 FROM {ct} c WHERE c.{ck} = p.{pk})) AS n_unref_parents
    """


@register(
    "tpch_fk_orphan_audit",
    oracle="\n    UNION ALL\n".join(
        _fk_edge_sql(e, ct, ck, pt, pk) for e, ct, ck, pt, pk in _FK_EDGES
    ),
)
def tpch_fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-wide referential-integrity audit: every declared FK edge of
    the TPC-H-ish schema (plus the cross-domain events.user_id →
    customer edge) profiled for orphans AND unreferenced parents in one
    result. Orphan counts are the FK-violation gate a pipeline runs
    before publishing a snapshot; unreferenced-parent counts are the
    coverage side (e.g. customers with no orders / no events — real,
    non-zero values in this data). The oracle replays each edge as
    independent NOT-EXISTS subqueries — a different formulation than the
    engine's single full-outer key-join pass."""
    frames = [
        fk_edge_profile(
            table(spark, sf_dir, ct), table(spark, sf_dir, pt), ck, pk, e
        )
        for e, ct, ck, pt, pk in _FK_EDGES
    ]
    return reduce(lambda a, b: a.unionByName(b), frames)
