"""Deterministic sampling / dataset-split operators.

Training-data pipelines need reproducible splits: the same document must
land in the same split on every run, on every cluster size, regardless
of partitioning. Spark's ``df.sample``/``sampleBy`` are seeded but
partition-layout-dependent, so the engine uses content hashing instead —
``bucket = md5(id) mod 100`` — which is stable across engines (DuckDB
runs the identical expression, so these are fully oracle-checked),
shuffle-free (a scan-level projection + filter, no exchange), and
stable under repartitioning, the property that matters when the corpus
is rewritten/compacted between runs at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from ..registry import register
from ..tables import table

_BUCKETS = 100

_SQL_BUCKET = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT"
    f" % {_BUCKETS} AS BIGINT)"
)


def _bucket(col: Column) -> Column:
    """Stable hash bucket 0..99 from the id — md5-based for engine
    portability (same idiom as sketches.py / text.py)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
        % _BUCKETS
    )


def split_column(col: Column, train: int = 80, valid: int = 90) -> Column:
    """80/10/10 train/valid/test assignment from the stable bucket."""
    b = _bucket(col)
    return (
        F.when(b < train, "train").when(b < valid, "valid").otherwise("test")
    )


@register(
    "sample_train_test_split",
    oracle=f"""
    SELECT
      CASE WHEN {_SQL_BUCKET} < 80 THEN 'train'
           WHEN {_SQL_BUCKET} < 90 THEN 'valid'
           ELSE 'test' END AS split,
      count(*) AS n_docs,
      CAST(sum(n_chars) AS BIGINT) AS total_chars,
      count(DISTINCT lang) AS n_langs
    FROM documents
    GROUP BY 1
    """,
)
def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 corpus split with per-split volume stats.
    The split is a projection — no shuffle, no sort, no RNG state; the
    only exchange is the 3-group aggregate. Adding data never moves an
    existing document between splits (hash depends only on doc_id)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            split_column(F.col("doc_id")).alias("split"), "n_chars", "lang"
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.count_distinct("lang").alias("n_langs"),
        )
    )


@register(
    "sample_stratified_by_lang",
    oracle=f"""
    WITH s AS (
      SELECT lang, n_chars, {_SQL_BUCKET} AS bucket FROM documents
    )
    SELECT lang,
           count(*) AS corpus_docs,
           CAST(sum(CASE WHEN bucket < 10 THEN 1 ELSE 0 END)
                AS BIGINT) AS sample_docs,
           CAST(sum(CASE WHEN bucket < 10 THEN n_chars ELSE 0 END)
                AS BIGINT) AS sample_chars
    FROM s GROUP BY lang
    """,
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% per-language sample, reported against the full
    stratum size (the corpus-vs-sample view a data-quality audit reads).
    Same stable-bucket trick; stratification is free because the bucket
    is independent of the stratum key — every lang gets the same 10%
    expectation without a per-stratum pass or sampleBy's fraction map."""
    docs = table(spark, sf_dir, "documents")
    in_sample = _bucket(F.col("doc_id")) < 10
    return (
        docs.select("lang", "n_chars", in_sample.alias("in_sample"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("corpus_docs"),
            F.sum(F.when(F.col("in_sample"), 1).otherwise(0)).alias("sample_docs"),
            F.sum(F.when(F.col("in_sample"), F.col("n_chars")).otherwise(0)).alias(
                "sample_chars"
            ),
        )
    )


# Domain-mixture rebalancing: downsample every (lang, source) stratum to
# the char volume of the smallest stratum, so no domain dominates the
# training mixture by byte count. Acceptance is per-mille of the stable
# doc_id hash — deterministic, shuffle-free, stable under repartitioning.
_MIX_PERMILLE = 1000

_SQL_BUCKET_1000 = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT"
    f" % {_MIX_PERMILLE} AS BIGINT)"
)


@register(
    "sample_domain_mixture",
    oracle=f"""
    WITH strata AS (
      SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS stratum_chars
      FROM documents GROUP BY lang, source
      HAVING sum(n_chars) > 0
    ),
    rates AS (
      SELECT lang, source, stratum_chars,
             CAST((min(stratum_chars) OVER () * {_MIX_PERMILLE})
                  // stratum_chars AS BIGINT) AS accept_permille
      FROM strata
    )
    SELECT d.lang, d.source,
           r.stratum_chars,
           r.accept_permille,
           count(*) AS sampled_docs,
           CAST(sum(d.n_chars) AS BIGINT) AS sampled_chars
    FROM documents d
    JOIN rates r ON d.lang = r.lang AND d.source = r.source
    WHERE {_SQL_BUCKET_1000} < r.accept_permille
    GROUP BY d.lang, d.source, r.stratum_chars, r.accept_permille
    """,
)
def sample_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing: compute each (lang, source) stratum's char
    volume, derive an accept rate that levels every stratum to the
    smallest one's volume (integer per-mille — engine-exact), and take
    the deterministic hash-sample. Output is the audit view: per stratum,
    its corpus volume, its accept rate, and what the sample actually
    drew.

    Plan: the stratum table is tiny (|langs|×|sources| rows — the window
    over it is a single-partition pass over dozens of rows, not corpus
    data), broadcasts back onto the scan, and acceptance is a
    projection-level filter — the corpus is read once, never shuffled
    except the final per-stratum aggregate. Adding data only lowers
    rates; it never flips which docs a fixed rate accepts."""
    docs = table(spark, sf_dir, "documents")
    # zero-char strata excluded: no volume to level against (oracle HAVING)
    strata = docs.groupBy("lang", "source").agg(
        F.sum("n_chars").alias("stratum_chars")
    ).where(F.col("stratum_chars") > 0)
    rates = strata.select(
        "lang",
        "source",
        "stratum_chars",
        F.expr(
            f"(min(stratum_chars) OVER () * {_MIX_PERMILLE}) div stratum_chars"
        ).alias("accept_permille"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % _MIX_PERMILLE
    )
    return (
        docs.join(F.broadcast(rates), ["lang", "source"])
        .where(bucket < F.col("accept_permille"))
        .groupBy("lang", "source", "stratum_chars", "accept_permille")
        .agg(
            F.count("*").alias("sampled_docs"),
            F.sum("n_chars").alias("sampled_chars"),
        )
    )


# Temperature-scaled mixture (the multilingual-pretraining trick): sample
# stratum i with probability ∝ c_i^τ instead of c_i, so low-resource
# domains are boosted without flattening entirely. With τ = 0.5 the
# acceptance rate has the closed form (c_min / c_i)^(1-τ) = sqrt(c_min /
# c_i) — sqrt is IEEE-correctly-rounded in both engines, and the rate is
# floored to integer per-mille before any comparison, so acceptance stays
# engine-exact. τ = 0 recovers sample_domain_mixture's flat leveling;
# τ = 1 is the raw corpus.


@register(
    "sample_temperature_mixture",
    oracle=f"""
    WITH strata AS (
      SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS stratum_chars
      FROM documents GROUP BY lang, source
      HAVING sum(n_chars) > 0
    ),
    rates AS (
      SELECT lang, source, stratum_chars,
             CAST(floor({_MIX_PERMILLE} * sqrt(
               CAST(min(stratum_chars) OVER () AS DOUBLE) / stratum_chars
             )) AS BIGINT) AS accept_permille
      FROM strata
    )
    SELECT d.lang, d.source,
           r.stratum_chars,
           r.accept_permille,
           count(*) AS sampled_docs,
           CAST(sum(d.n_chars) AS BIGINT) AS sampled_chars
    FROM documents d
    JOIN rates r ON d.lang = r.lang AND d.source = r.source
    WHERE {_SQL_BUCKET_1000} < r.accept_permille
    GROUP BY d.lang, d.source, r.stratum_chars, r.accept_permille
    """,
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain rebalancing (τ = 0.5): accept rate
    sqrt(c_min / c_i) per (lang, source) stratum — between flat leveling
    (sample_domain_mixture) and the raw corpus, the standard knob for
    boosting low-resource domains. Same audit-view output and the same
    plan shape as the flat mixture: tiny strata table windowed on one
    partition, broadcast back, projection-level deterministic hash
    acceptance, corpus read once."""
    docs = table(spark, sf_dir, "documents")
    # zero-char strata excluded: no volume to level against (oracle HAVING)
    strata = docs.groupBy("lang", "source").agg(
        F.sum("n_chars").alias("stratum_chars")
    ).where(F.col("stratum_chars") > 0)
    rates = strata.select(
        "lang",
        "source",
        "stratum_chars",
        F.floor(
            _MIX_PERMILLE
            * F.sqrt(
                F.expr("min(stratum_chars) OVER ()").cast("double")
                / F.col("stratum_chars")
            )
        )
        .cast("bigint")
        .alias("accept_permille"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % _MIX_PERMILLE
    )
    return (
        docs.join(F.broadcast(rates), ["lang", "source"])
        .where(bucket < F.col("accept_permille"))
        .groupBy("lang", "source", "stratum_chars", "accept_permille")
        .agg(
            F.count("*").alias("sampled_docs"),
            F.sum("n_chars").alias("sampled_chars"),
        )
    )


# Fixed-size per-stratum sampling: exactly N docs per language, chosen by
# the stable md5 order — eval-set construction ("hold out 25 docs per
# language") where a RATE sample can't guarantee the per-stratum count.
PER_STRATUM_N = 25


@register(
    "sample_fixed_per_stratum",
    oracle=f"""
    SELECT lang, doc_id, n_chars, pick_rank FROM (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
             ) AS pick_rank
      FROM documents
    )
    WHERE pick_rank <= {PER_STRATUM_N}
    """,
)
def sample_fixed_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly {PER_STRATUM_N} documents per language, selected by the
    stable md5(doc_id) order (ties broken by doc_id — a total order, so
    the pick is engine-exact and stable under repartitioning; adding new
    docs can displace picks only by out-hashing them, never by layout).

    Plan: ONE shuffle on the stratum key and a per-stratum rank — the
    same window top-k shape as events_latest_per_user. Spark evaluates
    the rank filter with a WindowGroupLimit pushdown (per-partition
    top-N before the full sort materializes); at extreme stratum sizes
    the selection drops into the histogram-prefix ranking kernel
    (doc_length_rank_deciles) on the hash value instead."""
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        docs.select("lang", "doc_id", "n_chars")
        .withColumn("pick_rank", F.row_number().over(w))
        .where(F.col("pick_rank") <= PER_STRATUM_N)
    )


# --- weighted sampling without replacement (Efraimidis-Spirakis) ----------
WEIGHTED_K = 50  #: sample size
_U_HEX = 12  #: md5 hex digits → 48-bit uniform (exact in double)
_U_DENOM = float(1 << 48)
_ES_QUANT = 1_000_000  #: micro-unit quantization of the priority key


def es_priority(id_col: Column, weight: Column) -> Column:
    """Efraimidis-Spirakis priority key, engine-exact form.

    A-Res selects k items with probability ∝ weight by taking the top-k
    of u_i^(1/w_i), u_i uniform. Ranking by the monotone-equivalent
    ln(u)/w avoids the pow; u comes from the stable md5 hash ((h48+0.5)/2^48
    — exact double steps: 48-bit int and a power-of-two divide), so the
    "random" draw is reproducible across runs, engines, and partition
    layouts, like every sampler here. The only inexact step is ln();
    the key is floored to integer MICRO-units before any comparison
    (same micro-nat discipline as doc_unigram_logprob: a 1-ulp libm
    divergence would have to land within ~1e-10 of a micro-boundary to
    flip a row), and genuine micro-ties break on doc_id. Larger weight
    ⇒ key closer to 0 from below ⇒ ranks higher, monotonically.
    """
    h48 = F.conv(
        F.substring(F.md5(id_col.cast("string")), 1, _U_HEX), 16, 10
    ).cast("bigint")
    u = (h48.cast("double") + F.lit(0.5)) / F.lit(_U_DENOM)
    return F.floor(F.ln(u) / weight.cast("double") * F.lit(float(_ES_QUANT))).cast(
        "long"
    )


_SQL_ES_KEY = (
    f"CAST(floor(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, {_U_HEX}))"
    f"::UBIGINT + 0.5) / {_U_DENOM}) / greatest(n_chars, 1) * {_ES_QUANT})"
    " AS BIGINT)"
)


@register(
    "sample_weighted_priority",
    oracle=f"""
    SELECT doc_id, lang, n_chars, es_key, pick_rank FROM (
      SELECT doc_id, lang, n_chars, {_SQL_ES_KEY} AS es_key,
             row_number() OVER (ORDER BY {_SQL_ES_KEY} DESC, doc_id ASC)
               AS pick_rank
      FROM documents
    ) WHERE pick_rank <= {WEIGHTED_K}
    """,
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement: the {WEIGHTED_K} documents
    drawn with probability proportional to length (n_chars — stand-in
    for any quality/importance weight), via the Efraimidis-Spirakis
    priority key. One pass, no RNG state: the key is a projection, the
    top-k is TakeOrderedAndProject (no global sort) — at 100 TB each
    executor keeps a k-row heap and the driver merges heaps, the same
    plan as every LIMIT query here. Re-running, repartitioning, or
    appending data never changes a surviving document's key."""
    docs = table(spark, sf_dir, "documents")
    key = es_priority(F.col("doc_id"), F.greatest(F.col("n_chars"), F.lit(1)))
    picked = (
        docs.select("doc_id", "lang", "n_chars", key.alias("es_key"))
        .orderBy(F.desc("es_key"), F.asc("doc_id"))
        .limit(WEIGHTED_K)
    )
    w = Window.orderBy(F.desc("es_key"), F.asc("doc_id"))
    return picked.withColumn("pick_rank", F.row_number().over(w))


# --- A/B experiment analysis ----------------------------------------------
# The experimentation read-out on deterministic hash assignment: users
# split 50/50 into variants by the same stable md5 bucket the sampling
# family uses (assignment is a pure projection — reproducible across
# runs, engines, and cluster sizes, the property sampleBy lacks), then
# per variant: exposed users, converters (>= 1 purchase), and the
# conversion rate as floor-scaled per-mille. All integers — the z-score
# / CI is one downstream double expression consumers derive from these
# exact counts. One user-keyed agg + a 2-row rollup.

_SQL_USER_BUCKET = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::UBIGINT"
    f" % {_BUCKETS} AS BIGINT)"
)


@register(
    "events_ab_test_readout",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CASE WHEN {_SQL_USER_BUCKET} < 50 THEN 'A' ELSE 'B' END AS variant,
             CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS converted,
             count(*) AS n_events
      FROM events
      GROUP BY user_id
    )
    SELECT variant,
           count(*) AS n_users,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST((sum(converted) * 1000) // count(*) AS BIGINT)
             AS conv_permille
    FROM u GROUP BY variant
    """,
)
def events_ab_test_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-variant exposure/conversion counts for a deterministic 50/50
    user split (see block comment)."""
    ev = table(spark, sf_dir, "events")
    variant = F.when(_bucket(F.col("user_id")) < 50, "A").otherwise("B")
    u = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("bigint"))
        .cast("bigint")
        .alias("converted"),
        F.count("*").alias("n_events"),
    ).select(variant.alias("variant"), "converted", "n_events")
    return u.groupBy("variant").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.expr("(sum(converted) * 1000) div count(*)")
        .cast("bigint")
        .alias("conv_permille"),
    )


# --- per-source domain cap (FineWeb/C4-style domain balancing) -------------
#: hard cap on documents any single source (domain/feed) may contribute
SOURCE_CAP = 25


@register(
    "sample_source_cap",
    oracle=f"""
    SELECT doc_id, source, keep_rank FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
             ) AS keep_rank
      FROM documents
      WHERE source IS NOT NULL AND doc_id IS NOT NULL
    )
    WHERE keep_rank <= {SOURCE_CAP}
    """,
)
def sample_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap — the domain-balancing pass web-corpus
    pipelines (C4/FineWeb lineage) run so no single domain dominates the
    mixture: keep at most {SOURCE_CAP} documents per source, selected by
    the stable md5(doc_id) order (total order → engine-exact, stable
    under repartitioning). NULL-source documents have no attributable
    feed and are excluded, matching corpus_source_novelty.

    Unlike ``sample_fixed_per_stratum``'s single window, the selection
    is TWO-PHASE for the skew this op exists to fight: the offending
    source IS the biggest one, so one window partitioned by source would
    sort the dominant domain in a single task. Phase 1 ranks within
    (source, input-partition) — every sort bounded by a scan split —
    and keeps ≤ cap per sub-bucket; any row in the global per-source
    top-cap also ranks ≤ cap in its own sub-bucket, so phase 1 never
    drops a winner. Phase 2 re-ranks the ≤ cap × n_partitions survivors
    per source — a frame bounded by metadata, not corpus, size."""
    docs = (
        table(spark, sf_dir, "documents")
        .where(F.col("source").isNotNull() & F.col("doc_id").isNotNull())
        .select("doc_id", "source")
        .withColumn("_pid", F.spark_partition_id())
    )
    order = (
        F.md5(F.col("doc_id").cast("string")).asc(),
        F.col("doc_id").asc(),
    )
    w1 = Window.partitionBy("source", "_pid").orderBy(*order)
    cand = (
        docs.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= SOURCE_CAP)
        .drop("_pid", "_r1")
    )
    w2 = Window.partitionBy("source").orderBy(*order)
    return (
        cand.withColumn("keep_rank", F.row_number().over(w2))
        .where(F.col("keep_rank") <= SOURCE_CAP)
    )
