"""Hybrid retrieval: dense (embedding cosine) + lexical (shingle Jaccard)
candidate lists fused by reciprocal-rank fusion (RRF) — the standard
RAG-retrieval shape (documents.doc_id aligns 1:1 with embeddings.vec_id
in the test corpus, mirroring a real corpus with one embedding per doc).

Both sides are existing engine kernels: the dense side is the exact
cosine kernel (broadcast query block × corpus, per-query window rank —
the per-bucket kernel of the LSH/IVF paths), the lexical side reuses the
dedup shingle frame with a Jaccard score (candidate set bounded by
``jaccard > 0``, which at scale becomes the inverted-index equi-join of
decontaminate/minhash rather than a broadcast NLJ). RRF needs only the
two INTEGER ranks — 1/(k+rank) sums of two terms in a fixed order — so
the fused score is engine-deterministic without any float-aggregation
caveat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..registry import register
from ..tables import table
from .dedup import _SHINGLED_SQL, _shingled
from .similarity import N_QUERIES, _DOT_QC, _self_norm, dot, norm

LEX_K = 10  # lexical candidates per query
EMB_K = 10  # dense candidates per query
RRF_K = 60  # the standard RRF dampening constant
FUSED_K = 5  # fused results per query


@register(
    "hybrid_search_rrf",
    oracle=f"""
    WITH {_SHINGLED_SQL},
    lex AS (
      SELECT query_id, doc_id, lex_rank FROM (
        SELECT q.doc_id AS query_id, c.doc_id AS doc_id,
               row_number() OVER (
                 PARTITION BY q.doc_id
                 ORDER BY round(
                   CAST(len(list_intersect(q.sh, c.sh)) AS DOUBLE)
                     / (len(q.sh) + len(c.sh) - len(list_intersect(q.sh, c.sh))),
                   6) DESC,
                 c.doc_id ASC
               ) AS lex_rank
        FROM shingled q
        JOIN shingled c ON c.doc_id <> q.doc_id
        WHERE q.doc_id < {N_QUERIES} AND len(list_intersect(q.sh, c.sh)) > 0
      ) WHERE lex_rank <= {LEX_K}
    ),
    emb AS (
      SELECT query_id, doc_id, emb_rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round({_DOT_QC} / ({_self_norm('q')} * {_self_norm('c')}), 6) DESC,
                          c.vec_id ASC
               ) AS emb_rank
        FROM embeddings q
        JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
      ) WHERE emb_rank <= {EMB_K}
    ),
    fused AS (
      SELECT
        coalesce(lex.query_id, emb.query_id) AS query_id,
        coalesce(lex.doc_id, emb.doc_id) AS doc_id,
        coalesce(lex.lex_rank, 0) AS lex_rank,
        coalesce(emb.emb_rank, 0) AS emb_rank,
        round(
          coalesce(CAST(1 AS DOUBLE) / ({RRF_K} + lex.lex_rank), 0)
            + coalesce(CAST(1 AS DOUBLE) / ({RRF_K} + emb.emb_rank), 0),
          6) AS rrf_score
      FROM lex FULL OUTER JOIN emb
        ON lex.query_id = emb.query_id AND lex.doc_id = emb.doc_id
    )
    SELECT query_id, doc_id, lex_rank, emb_rank, rrf_score, fused_rank FROM (
      SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC
             ) AS fused_rank
      FROM fused
    ) WHERE fused_rank <= {FUSED_K}
    """,
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: per query doc, fuse the dense cosine top-{EMB_K}
    and the lexical Jaccard top-{LEX_K} by RRF
    (sum of 1/({RRF_K}+rank) over the lists containing the doc) and keep
    the fused top-{FUSED_K}.

    Scale shape: the query block broadcasts on both sides (queries are
    request-sized, never corpus-sized); each side ranks inside its own
    per-query window over candidate rows only; the fusion join keys on
    (query_id, doc_id) over ≤ queries×(LEX_K+EMB_K) rows — driver-tiny.
    At 100 TB the two candidate generators swap to their indexed
    siblings (LSH buckets / IVF cells, shingle inverted index) without
    touching the fusion."""
    # dense side — exact cosine kernel, rank ≤ EMB_K
    e = table(spark, sf_dir, "embeddings")
    base = e.select("vec_id", "embedding", norm(F.col("embedding")).alias("nrm"))
    q = base.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    c = base.select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    cosine = F.round(
        dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_nrm") * F.col("c_nrm")), 6
    )
    w_emb = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("doc_id"))
    emb = (
        F.broadcast(q)
        .join(c, F.col("doc_id") != F.col("query_id"))
        .select("query_id", "doc_id", cosine.alias("cosine"))
        .withColumn("emb_rank", F.row_number().over(w_emb))
        .where(F.col("emb_rank") <= EMB_K)
        .select("query_id", "doc_id", "emb_rank")
    )

    # lexical side — shingle Jaccard, rank ≤ LEX_K
    sh = _shingled(spark, sf_dir)
    q_sh = sh.where(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("query_id"), F.col("sh").alias("q_sh")
    )
    inter = F.size(F.array_intersect("q_sh", "sh"))
    jac = F.round(
        inter.cast("double") / (F.size("q_sh") + F.size("sh") - inter), 6
    )
    w_lex = Window.partitionBy("query_id").orderBy(F.desc("jac"), F.asc("doc_id"))
    lex = (
        F.broadcast(q_sh)
        .join(sh, F.col("doc_id") != F.col("query_id"))
        .where(inter > 0)
        .select("query_id", "doc_id", jac.alias("jac"))
        .withColumn("lex_rank", F.row_number().over(w_lex))
        .where(F.col("lex_rank") <= LEX_K)
        .select("query_id", "doc_id", "lex_rank")
    )

    # fusion — RRF over the two rank lists (request-sized). Raw ranks are
    # staged under fresh names first: computing the score from a column
    # re-aliased in the SAME select would resolve against the lateral
    # (coalesced) alias and turn an absent rank into 1/(k+0).
    fused = (
        lex.join(emb, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.col("lex_rank").alias("_lr"),
            F.col("emb_rank").alias("_er"),
        )
        .select(
            "query_id",
            "doc_id",
            F.coalesce("_lr", F.lit(0)).alias("lex_rank"),
            F.coalesce("_er", F.lit(0)).alias("emb_rank"),
            F.round(
                F.coalesce(F.lit(1.0) / (RRF_K + F.col("_lr")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (RRF_K + F.col("_er")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
        )
    )
    w_f = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w_f))
        .where(F.col("fused_rank") <= FUSED_K)
    )
