"""Similarity search over embedding columns.

Two tiers (BASELINE.json north star):
- brute-force cosine top-k — the exact baseline and the verification
  kernel (oracle-checked);
- random-hyperplane LSH bucketing — the approximate scale path: vectors
  hash to sign-pattern buckets, candidate generation is an equi-join on
  the bucket key, and only bucket-mates pay the exact distance. Same
  banding idea as MinHash; at 100 TB the bucket join replaces the
  all-pairs cross join entirely. (An IVF variant would k-means the
  corpus and probe nearest centroids — same join shape.)

All vector math is sequential left-folds in double over built-in array
expressions (zip_with/aggregate) — no UDFs, engine-deterministic, and
whole-stage-codegen'd. Hyperplanes are derived from md5 bits so the LSH
signature is engine-portable and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from ..registry import register
from ..tables import table

TOP_K = 5
N_QUERIES = 5  # vec_id < 5 act as the query set
LSH_BITS = 8  # sign bits per bucket key


def dot(x: Column, y: Column) -> Column:
    """Sequential-fold double dot product (deterministic across engines)."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(x: Column) -> Column:
    return F.sqrt(dot(x, x))


_DOT_QC = (
    "list_reduce([CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)"
    " for i in generate_series(1, 64)], (x, y) -> x + y)"
)


def _self_norm(alias: str) -> str:
    return (
        f"sqrt(list_reduce([CAST({alias}.embedding[i] AS DOUBLE) * "
        f"CAST({alias}.embedding[i] AS DOUBLE)"
        " for i in generate_series(1, 64)], (x, y) -> x + y))"
    )


@register(
    "knn_bruteforce_cosine",
    oracle=f"""
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT
        q.vec_id AS query_id,
        c.vec_id AS neighbor_id,
        round({_DOT_QC} / ({_self_norm('q')} * {_self_norm('c')}), 6) AS cosine,
        row_number() OVER (
          PARTITION BY q.vec_id
          ORDER BY round({_DOT_QC} / ({_self_norm('q')} * {_self_norm('c')}), 6) DESC,
                   c.vec_id ASC
        ) AS rank
      FROM embeddings q
      JOIN embeddings c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    )
    WHERE rank <= {TOP_K}
    """,
)
def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: brute-force cosine top-k for each query vector.
    Query side broadcasts (it's tiny by construction); ranking on the
    rounded score with vec_id tiebreak gives a total order, so top-k is
    deterministic. At scale this kernel runs per-LSH-bucket, not globally."""
    e = table(spark, sf_dir, "embeddings")
    base = e.select("vec_id", "embedding", norm(F.col("embedding")).alias("nrm"))
    q = base.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    c = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    cosine = F.round(
        dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm")), 6
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        F.broadcast(q)
        .join(c, F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
    )


def lsh_bucket(emb: Column, n_bits: int = LSH_BITS, dim: int = 64) -> Column:
    """Random-hyperplane LSH bucket key.

    Hyperplane h_j has components in {-1,+1} derived from md5("j|i") hex
    digit parity — a deterministic, engine-portable pseudo-random sign
    matrix. Bucket bit j = sign(h_j · v). Returns an n_bits-char '0'/'1'
    string key.
    """
    high = ("8", "9", "a", "b", "c", "d", "e", "f")
    bits = []
    for j in range(n_bits):
        proj = F.aggregate(
            F.zip_with(
                emb,
                F.array(*[F.lit(f"{j}|{i}") for i in range(dim)]),
                lambda v, seed: F.when(
                    F.substring(F.md5(seed), 1, 1).isin(*high), v.cast("double")
                ).otherwise(-v.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _lsh_bucket_sql(alias: str, n_bits: int = LSH_BITS, dim: int = 64) -> str:
    parts = []
    for j in range(n_bits):
        terms = (
            f"[CASE WHEN substr(md5('{j}|' || CAST(i - 1 AS VARCHAR)), 1, 1)"
            f" IN ('8','9','a','b','c','d','e','f')"
            f" THEN CAST({alias}.embedding[i] AS DOUBLE)"
            f" ELSE -CAST({alias}.embedding[i] AS DOUBLE) END"
            f" for i in generate_series(1, {dim})]"
        )
        parts.append(
            f"(CASE WHEN list_reduce({terms}, (x, y) -> x + y) > 0"
            " THEN '1' ELSE '0' END)"
        )
    return " || ".join(parts)


@register(
    "ann_lsh_buckets",
    oracle=f"""
    SELECT bucket, count(*) AS n_vectors, min(vec_id) AS min_vec_id
    FROM (
      SELECT e.vec_id, {_lsh_bucket_sql('e')} AS bucket
      FROM embeddings e
    )
    GROUP BY bucket
    """,
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index build: every vector hashed to its random-hyperplane
    bucket. Downstream ANN = equi-join query buckets against this table
    (optionally multi-probing neighbor buckets), then the exact kernel
    within matches. One narrow stage + one groupBy shuffle."""
    e = table(spark, sf_dir, "embeddings").alias("e")
    return (
        e.select("vec_id", lsh_bucket(F.col("embedding")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
    )


@register(
    "embedding_norm_stats",
    oracle=f"""
    SELECT
      label,
      count(*) AS n_vectors,
      round(min({_self_norm('embeddings')}), 6) AS min_norm,
      round(max({_self_norm('embeddings')}), 6) AS max_norm
    FROM embeddings
    GROUP BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector profile (min/max of deterministic per-row norms —
    no cross-row float summation, so exact across engines)."""
    e = table(spark, sf_dir, "embeddings")
    return (
        e.select("label", norm(F.col("embedding")).alias("nrm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
        )
    )


# --- IVF (inverted-file) ANN ---------------------------------------------

N_CELLS = 16  # coarse-quantizer centroids (vec_id 0..15 act as anchors)


def _assign_sql(src: str) -> str:
    """DuckDB CTE body: nearest-centroid cell per vector of ``src``."""
    dot_ec = (
        "list_reduce([CAST(e.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)"
        " for i in generate_series(1, 64)], (x, y) -> x + y)"
    )
    return f"""
      SELECT vec_id, cell_id FROM (
        SELECT e.vec_id, c.vec_id AS cell_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round({dot_ec} / ({_self_norm('e')} * {_self_norm('c')}), 6) DESC,
                          c.vec_id ASC
               ) AS rn
        FROM {src} e JOIN embeddings c ON c.vec_id < {N_CELLS}
      ) WHERE rn = 1
    """


def ivf_assign(base: DataFrame) -> DataFrame:
    """(vec_id, cell_id): nearest of the N_CELLS anchor vectors by rounded
    cosine (vec_id-asc tiebreak → total order → deterministic).

    ``base`` must carry (vec_id, embedding, nrm). The centroid table is
    N_CELLS rows — broadcast; assignment is a narrow map over the corpus
    (the 100 TB path: no shuffle until the downstream per-cell work).
    """
    cent = F.broadcast(
        base.where(F.col("vec_id") < N_CELLS).select(
            F.col("vec_id").alias("cell_id"),
            F.col("embedding").alias("cent_emb"),
            F.col("nrm").alias("cent_nrm"),
        )
    )
    cos = F.round(
        dot(F.col("embedding"), F.col("cent_emb")) / (F.col("nrm") * F.col("cent_nrm")),
        6,
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cell_id"))
    return (
        base.join(cent)
        .select("vec_id", "cell_id", cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "cell_id")
    )


@register(
    "ann_ivf_topk",
    oracle=f"""
    WITH cells AS ({_assign_sql('embeddings')}),
    qcells AS (
      SELECT vec_id AS query_id, cell_id FROM cells WHERE query_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, cell_id, cosine, rank FROM (
      SELECT
        qc.query_id, cand.vec_id AS neighbor_id, qc.cell_id,
        round({_DOT_QC} / ({_self_norm('q')} * {_self_norm('c')}), 6) AS cosine,
        row_number() OVER (
          PARTITION BY qc.query_id
          ORDER BY round({_DOT_QC} / ({_self_norm('q')} * {_self_norm('c')}), 6) DESC,
                   cand.vec_id ASC
        ) AS rank
      FROM qcells qc
      JOIN cells cand ON cand.cell_id = qc.cell_id AND cand.vec_id <> qc.query_id
      JOIN embeddings q ON q.vec_id = qc.query_id
      JOIN embeddings c ON c.vec_id = cand.vec_id
    )
    WHERE rank <= {TOP_K}
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (nprobe=1): corpus partitioned into N_CELLS inverted lists
    by nearest anchor; each query searches only its own cell. The anchor
    set here is the first N_CELLS vectors — at scale it would be sampled
    k-means centroids, but the *plan* is identical: broadcast centroids →
    narrow assignment → equi-join on cell_id → exact kernel per cell.
    Candidates drop ~N_CELLS× vs brute force; recall trades off via
    nprobe (join against the n nearest cells instead of 1)."""
    e = table(spark, sf_dir, "embeddings")
    base = e.select("vec_id", "embedding", norm(F.col("embedding")).alias("nrm"))
    cells = ivf_assign(base)
    qcells = cells.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "cell_id"
    )
    q = base.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cand = cells.join(
        base.select("vec_id", F.col("embedding").alias("c_emb"), F.col("nrm").alias("c_nrm")),
        "vec_id",
    ).select(F.col("vec_id").alias("neighbor_id"), "cell_id", "c_emb", "c_nrm")
    cosine = F.round(
        dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm")), 6
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        F.broadcast(qcells.join(q, "query_id"))
        .join(cand, "cell_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "cell_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
    )


N_PROBE = 2  # cells searched per query in the multi-probe variant


@register(
    "ann_ivf_multiprobe",
    oracle=f"""
    WITH cells AS ({_assign_sql('embeddings')}),
    qprobes AS (
      SELECT vec_id AS query_id, cell_id, rn AS probe_rank FROM (
        SELECT e.vec_id, c.vec_id AS cell_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round(
                   list_reduce([CAST(e.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)
                                for i in generate_series(1, 64)], (x, y) -> x + y)
                   / ({_self_norm('e')} * {_self_norm('c')}), 6) DESC,
                 c.vec_id ASC
               ) AS rn
        FROM embeddings e JOIN embeddings c ON c.vec_id < {N_CELLS}
        WHERE e.vec_id < {N_QUERIES}
      ) WHERE rn <= {N_PROBE}
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT
        qp.query_id, cand.vec_id AS neighbor_id,
        round({_DOT_QC} / ({_self_norm('q')} * {_self_norm('c')}), 6) AS cosine,
        row_number() OVER (
          PARTITION BY qp.query_id
          ORDER BY round({_DOT_QC} / ({_self_norm('q')} * {_self_norm('c')}), 6) DESC,
                   cand.vec_id ASC
        ) AS rank
      FROM qprobes qp
      JOIN cells cand ON cand.cell_id = qp.cell_id AND cand.vec_id <> qp.query_id
      JOIN embeddings q ON q.vec_id = qp.query_id
      JOIN embeddings c ON c.vec_id = cand.vec_id
    )
    WHERE rank <= {TOP_K}
    """,
)
def ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with nprobe=2: each query searches its two nearest cells,
    recovering neighbors that fell just across a cell boundary (the
    standard recall knob — candidates scale linearly with nprobe while
    staying ~corpus/N_CELLS per probe). Same plan as nprobe=1 plus one
    more row per query in the probe table; candidates from both probes
    rank in a single window."""
    e = table(spark, sf_dir, "embeddings")
    base = e.select("vec_id", "embedding", norm(F.col("embedding")).alias("nrm"))
    cent = F.broadcast(
        base.where(F.col("vec_id") < N_CELLS).select(
            F.col("vec_id").alias("cell_id"),
            F.col("embedding").alias("cent_emb"),
            F.col("nrm").alias("cent_nrm"),
        )
    )
    qbase = base.where(F.col("vec_id") < N_QUERIES)
    qcos = F.round(
        dot(F.col("embedding"), F.col("cent_emb")) / (F.col("nrm") * F.col("cent_nrm")),
        6,
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cell_id"))
    qprobes = (
        qbase.join(cent)
        .select(F.col("vec_id").alias("query_id"), "cell_id", qcos.alias("cos"))
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= N_PROBE)
        .select("query_id", "cell_id")
    )
    cells = ivf_assign(base)
    q = base.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    cand = cells.join(
        base.select(
            "vec_id", F.col("embedding").alias("c_emb"), F.col("nrm").alias("c_nrm")
        ),
        "vec_id",
    ).select(F.col("vec_id").alias("neighbor_id"), "cell_id", "c_emb", "c_nrm")
    cosine = F.round(
        dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm")), 6
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        F.broadcast(qprobes.join(q, "query_id"))
        .join(cand, "cell_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
    )
