"""ANN quality contracts: trained-IVF recall vs the exact kernel, and
multi-table LSH candidate coverage.

The test embeddings are unstructured (no label clustering — verified
during round 2), so absolute recall at 16 cells / nprobe≤2 sits in the
0.2-0.4 band by nature of random high-dim data; the contracts below pin
(a) a floor well above the 1/N_CELLS chance rate, (b) the monotonicity
knobs users actually rely on: nprobe=2 ≥ nprobe=1, and a second LSH
table strictly growing the candidate set.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _topk_sets(df, qcol="query_id", ncol="neighbor_id"):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r[qcol], set()).add(r[ncol])
    return out


def _recall(got: dict[int, set[int]], want: dict[int, set[int]]) -> float:
    return sum(len(got.get(q, set()) & s) / len(s) for q, s in want.items()) / len(
        want
    )


def test_ivf_recall_vs_bruteforce(spark):
    from bigdatatiler_spark.operators.similarity import (
        ann_ivf_multiprobe,
        ann_ivf_topk,
        knn_bruteforce_cosine,
    )

    bf = _topk_sets(knn_bruteforce_cosine(spark, SF_DIR))
    r1 = _recall(_topk_sets(ann_ivf_topk(spark, SF_DIR)), bf)
    r2 = _recall(_topk_sets(ann_ivf_multiprobe(spark, SF_DIR)), bf)
    # chance rate for one cell of 16 is ~0.0625; trained cells must beat
    # it by a wide margin, and the nprobe knob must not lose recall
    assert r1 >= 0.2, f"nprobe=1 recall {r1:.3f} below floor"
    assert r2 >= r1, f"nprobe=2 recall {r2:.3f} < nprobe=1 {r1:.3f}"


def test_kmeans_centroids_balance_and_determinism(spark):
    """Trained cells must (a) use every seed's capacity reasonably — no
    cell hoarding the corpus, which is what breaks per-cell candidate
    bounds at scale — and (b) be bit-deterministic across runs (the
    property the DuckDB oracle relies on)."""
    from bigdatatiler_spark.operators.similarity import (
        N_CELLS,
        kmeans_centroids,
        nearest_cells,
        norm,
    )
    from bigdatatiler_spark.tables import table

    e = table(spark, SF_DIR, "embeddings")
    base = e.select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    ).persist()
    cents = kmeans_centroids(base)
    sizes = (
        nearest_cells(base, cents)
        .groupBy("cell_id")
        .count()
        .collect()
    )
    n = sum(r["count"] for r in sizes)
    assert len(sizes) == N_CELLS
    assert max(r["count"] for r in sizes) <= 4 * n / N_CELLS, "a cell hoards the corpus"

    again = {
        (r["cell_id"], tuple(r["cent_emb"]))
        for r in kmeans_centroids(base).collect()
    }
    first = {(r["cell_id"], tuple(r["cent_emb"])) for r in cents.collect()}
    assert again == first, "centroid training is not deterministic"


def test_second_lsh_table_grows_candidates(spark):
    """A candidate pair survives if ANY table buckets it together — the
    2-table index must strictly dominate table 0 alone on pair coverage
    (that is the recall mechanism: p -> 1-(1-p)^2)."""
    from bigdatatiler_spark.operators.similarity import lsh_bucket
    from bigdatatiler_spark.tables import table

    e = table(spark, SF_DIR, "embeddings")

    def pairs(t: int) -> set[tuple[int, int]]:
        b = e.select("vec_id", lsh_bucket("embedding", hash_table=t).alias("bucket"))
        a, c = b.alias("a"), b.select(
            F.col("vec_id").alias("vec_id_2"), F.col("bucket").alias("bucket_2")
        )
        return {
            (r["vec_id"], r["vec_id_2"])
            for r in a.join(
                c,
                (F.col("bucket") == F.col("bucket_2"))
                & (F.col("vec_id") < F.col("vec_id_2")),
            ).collect()
        }

    p0, p1 = pairs(0), pairs(1)
    union = p0 | p1
    assert p0 != p1, "hash tables are not independent"
    assert len(union) > len(p0), "second table adds no candidate pairs"


def test_pq_adc_recall_vs_exact_l2(spark):
    """PQ ranks by L2, so its reference is the exact-L2 top-k (computed
    on the same 2^-10 integer grid the operator uses). The shortlist+
    rerank pipeline must beat the ADC-only ranking's recall by a wide
    margin on this worst-case (unstructured) data, and clear an absolute
    floor well above the 5/999 chance rate."""
    import hashlib

    import numpy as np

    from bigdatatiler_spark.operators.pq import ann_pq_adc_topk
    from bigdatatiler_spark.tables import table

    rows = (
        table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    Q = np.floor(np.array([r.embedding for r in rows], dtype=np.float64) * 1024)
    want = {}
    for q in range(5):
        d = ((Q - Q[q]) ** 2).sum(axis=1)
        d[q] = np.inf
        want[q] = set(ids[np.lexsort((ids, d))[:5]].tolist())
    got = _topk_sets(ann_pq_adc_topk(spark, SF_DIR))
    rec = _recall(got, want)
    assert rec >= 0.3, f"PQ shortlist+rerank recall {rec:.3f} below floor"


def test_binary_quantization_packing_and_recall(spark):
    """Binary codes must (a) pack exactly the sign bits of the embedding
    (checked bit-for-bit against a Python repack of the raw vectors) and
    (b) concentrate the true neighbors: the 20-candidate Hamming
    shortlist's final top-k must beat chance recall by a wide margin —
    Hamming on sign bits estimates angle (SimHash), it is not a random
    subset. The rerank output must also always rank by exact cosine."""
    from bigdatatiler_spark.operators.similarity import (
        BQ_SHORTLIST,
        ann_hamming_binary_topk,
        bq_word,
        knn_bruteforce_cosine,
    )
    from bigdatatiler_spark.tables import table

    e = table(spark, SF_DIR, "embeddings")
    rows = (
        e.select(
            "vec_id",
            "embedding",
            bq_word(F.col("embedding"), 0).alias("w0"),
            bq_word(F.col("embedding"), 1).alias("w1"),
        )
        .orderBy("vec_id")
        .limit(20)
        .collect()
    )
    assert rows, "fixture empty"
    for r in rows:
        want0 = sum(1 << i for i in range(32) if r.embedding[i] > 0)
        want1 = sum(1 << i for i in range(32) if r.embedding[32 + i] > 0)
        assert (r.w0, r.w1) == (want0, want1), f"vec {r.vec_id} packed wrong"

    got = _topk_sets(ann_hamming_binary_topk(spark, SF_DIR))
    bf = _topk_sets(knn_bruteforce_cosine(spark, SF_DIR))
    n = e.count()
    rec = _recall(got, bf)
    chance = BQ_SHORTLIST / max(n - 1, 1)
    assert rec >= max(3 * chance, 0.3), f"recall {rec:.3f} ~ chance {chance:.3f}"


def test_semantic_cells_recall_vs_bruteforce_pairs(spark):
    """SemDeDup's cell blocking trades recall for corpus²/k cost: a
    near-dup pair straddling a cell boundary is invisible. Quantify the
    trade on the fixture and pin (a) every emitted witness pair really
    clears the threshold against the exact kernel's scores (precision =
    1 by construction — same cosine expression), (b) pair recall vs the
    UNBLOCKED all-pairs set at the same threshold stays above the
    1/N_CELLS chance floor by a wide margin (same-cluster vectors land
    in the same cell far more often than chance)."""
    from bigdatatiler_spark.operators.similarity import (
        N_CELLS,
        SEMDEDUP_THRESHOLD,
        dedup_semantic_cells,
        nz_base,
    )
    from bigdatatiler_spark.tables import table

    cells = dedup_semantic_cells(spark, SF_DIR)
    got_pairs = {
        (min(r["vec_id"], r["dup_of"]), max(r["vec_id"], r["dup_of"]))
        for r in cells.collect()
    }
    # exact all-pairs at the same threshold (64-dim fold, same rounding)
    withnorm = nz_base(table(spark, SF_DIR, "embeddings"))
    a = withnorm.select(
        F.col("vec_id").alias("v1"),
        F.col("embedding").alias("e1"),
        F.col("nrm").alias("n1"),
    )
    b = withnorm.select(
        F.col("vec_id").alias("v2"),
        F.col("embedding").alias("e2"),
        F.col("nrm").alias("n2"),
    )
    dot = F.aggregate(
        F.zip_with("e1", "e2", lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    cos = F.round(dot / (F.col("n1") * F.col("n2")), 6)
    exact = {
        (r["v1"], r["v2"])
        for r in a.join(b, F.col("v1") < F.col("v2"))
        .select("v1", "v2", cos.alias("c"))
        .where(F.col("c") >= SEMDEDUP_THRESHOLD)
        .collect()
    }
    assert exact, "fixture must contain pairs above the semantic threshold"
    # (a) precision: every emitted best-witness pair is a true pair
    assert got_pairs <= exact, sorted(got_pairs - exact)[:5]
    # (b) recall of PRUNED DOCS (the operator's output unit: one row per
    # pruned vec, not per pair): every doc the blocked pass prunes is
    # truly prunable, and coverage beats the 1/N_CELLS chance rate
    prunable = {max(p) for p in exact}
    pruned = {r["vec_id"] for r in cells.collect()}
    assert pruned <= prunable
    recall = len(pruned) / len(prunable)
    assert recall > 2.0 / N_CELLS, (recall, len(prunable))


def test_py_lloyd_matches_spark_lloyd(spark):
    """The r12 driver-side Lloyd must be value-identical to the Spark
    expression pipeline it replaced (and that the DuckDB oracle still
    replays): same seeds, same rounded-cosine assignment with cell_id
    tiebreak, same quantized integer centroid update. This re-runs the
    ORIGINAL per-round Spark jobs over the same sample and compares the
    trained table bit for bit."""
    from pyspark.sql import functions as F

    import bigdatatiler_spark.operators.similarity as S
    from bigdatatiler_spark.operators.similarity import (
        KMEANS_ITERS,
        N_CELLS,
        TRAIN_CAP,
        _cents_frame,
        _py_norm,
        kmeans_centroids,
        nearest_cells,
        nz_base,
    )
    from bigdatatiler_spark.tables import table

    base = nz_base(table(spark, SF_DIR, "embeddings"))
    seed_order = (F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
    train = (
        base.select("vec_id", "embedding", "nrm")
        .orderBy(*seed_order)
        .limit(TRAIN_CAP)
        .persist()
    )
    seeds = train.orderBy(*seed_order).limit(N_CELLS).collect()
    data = []
    for i, row in enumerate(seeds):
        emb = [float(x) for x in row.embedding]
        data.append((i, emb, _py_norm(emb)))
    for _ in range(KMEANS_ITERS):
        asg = nearest_cells(train, _cents_frame(spark, data))
        sums = (
            asg.join(train.select("vec_id", "embedding"), "vec_id")
            .select(
                "cell_id",
                F.transform(
                    "embedding", lambda x: F.floor(x.cast("double") * S.QUANT)
                ).alias("q"),
            )
            .groupBy("cell_id")
            .agg(F.array(*[F.sum(F.col("q")[i]) for i in range(S.DIM)]).alias("s"))
            .collect()
        )
        data = []
        for row in sums:
            emb = [float(v) for v in row.s]
            data.append((row.cell_id, emb, _py_norm(emb)))
        data.sort()
    train.unpersist()

    S._INDEX_CACHE.clear()
    got = sorted(
        (r.cell_id, [float(v) for v in r.cent_emb], float(r.cent_nrm))
        for r in kmeans_centroids(base).collect()
    )
    assert got == data, "driver-side Lloyd diverged from the Spark rounds"
