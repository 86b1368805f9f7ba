"""Semantics tests for the round-5 analytics batch: interval-union
coverage (sweep line), linear multi-touch attribution, discrete hazard
curve, k-anonymity audit, and per-dimension embedding stats.

Each test writes a hand-computable micro-fixture as a parquet dir and
runs the REGISTERED query against it (the same entry point the driver
exercises), asserting the closed-form expected values. Cross-engine
equality rides the oracle differential (test_oracle / check_oracle);
these tests pin the SEMANTICS so an engine-side refactor that keeps both
sides wrong in the same way still fails.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from bigdatatiler_spark.registry import load_all

UTC = dt.timezone.utc


def _write_events(spark, path: str, rows: list[tuple]) -> None:
    """rows: (event_id, ts, user_id, event_type, value)"""
    df = spark.createDataFrame(
        [(i, t, u, ty, v, None) for (i, t, u, ty, v) in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "events.parquet"))


def _ts(minutes: float) -> dt.datetime:
    return dt.datetime(2026, 3, 2, 0, 0, 0) + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def specs():
    return load_all()


def test_interval_coverage_overlap_touch_gap(spark, tmp_path, specs):
    """Three interval relationships in one user each: overlap (counted
    once), touch (merges, half-open), gap (new block)."""
    d = str(tmp_path)
    _write_events(
        spark,
        d,
        [
            # user 1: overlap then gap → [0,5)∪[2,7) = 7 min, then [20,25)
            (1, _ts(0), 1, "a", 1.0),
            (2, _ts(2), 1, "a", 1.0),
            (3, _ts(20), 1, "a", 1.0),
            # user 2: touching intervals merge → [0,5)∪[5,10) = one block
            (4, _ts(0), 2, "a", 1.0),
            (5, _ts(5), 2, "a", 1.0),
        ],
    )
    out = {
        r["user_id"]: r.asDict()
        for r in specs["events_interval_coverage"].fn(spark, d).collect()
    }
    assert out[1]["n_intervals"] == 3
    assert out[1]["n_blocks"] == 2
    assert out[1]["covered_ms"] == (7 + 5) * 60_000
    # span = [0, 25min) = 25 min → idle = 25 - 12 = 13 min
    assert out[1]["idle_ms"] == 13 * 60_000
    assert out[2]["n_blocks"] == 1
    assert out[2]["covered_ms"] == 10 * 60_000
    assert out[2]["idle_ms"] == 0


def test_linear_attribution_equal_split(spark, tmp_path, specs):
    """One session of [view, click, purchase(10.00)] → each of the three
    touches gets trunc(1000·1e6/3) micro-cents, reported in whole cents."""
    d = str(tmp_path)
    _write_events(
        spark,
        d,
        [
            (1, _ts(0), 1, "view", 0.0),
            (2, _ts(1), 1, "click", 0.0),
            (3, _ts(2), 1, "purchase", 10.00),
            # second user: purchase alone in its session → full credit
            (4, _ts(0), 2, "purchase", 5.00),
        ],
    )
    out = {
        r["event_type"]: r.asDict()
        for r in specs["events_linear_attribution"].fn(spark, d).collect()
    }
    per_touch_micro = (1000 * 1_000_000) // 3  # 333_333_333
    # per-type totals are scaled back to whole cents (truncating) from
    # the exact micro-cent credits
    assert out["view"]["attributed_cents"] == per_touch_micro // 1_000_000
    assert out["click"]["attributed_cents"] == per_touch_micro // 1_000_000
    # purchase type: 1 touch in session 1 + the solo session's full 500 cents
    assert (
        out["purchase"]["attributed_cents"]
        == (per_touch_micro + 500 * 1_000_000) // 1_000_000
    )
    assert out["purchase"]["n_touches"] == 2


def test_hazard_curve_life_table(spark, tmp_path, specs):
    """Tenures (0, 0, 1) weeks → at-risk 3 at t=0 (hazard 666‰), 1 at
    t=1 (hazard 1000‰)."""
    d = str(tmp_path)
    week = 7 * 24 * 60  # minutes
    _write_events(
        spark,
        d,
        [
            (1, _ts(0), 1, "a", 1.0),            # tenure 0
            (2, _ts(0), 2, "a", 1.0),            # tenure 0
            (3, _ts(0), 3, "a", 1.0),
            (4, _ts(week), 3, "a", 1.0),         # tenure 1 week
        ],
    )
    out = {
        r["tenure_weeks"]: r.asDict()
        for r in specs["events_hazard_curve"].fn(spark, d).collect()
    }
    assert out[0]["n_at_risk"] == 3 and out[0]["n_churned"] == 2
    assert out[0]["hazard_permille"] == 666
    assert out[1]["n_at_risk"] == 1 and out[1]["n_churned"] == 1
    assert out[1]["hazard_permille"] == 1000


def test_k_anonymity_flags_small_classes(spark, tmp_path, specs):
    """A 5-distinct-user class is k-anonymous at k=5; a single-user class
    is flagged; anonymous (NULL-user) rows don't count as protection."""
    d = str(tmp_path)
    rows = [(i, _ts(0), i, "common", 1.0) for i in range(1, 6)]  # 5 users
    rows += [(10, _ts(60), 99, "rare", 1.0)]                     # 1 user
    rows += [(11, _ts(60), None, "rare", 1.0)]                   # NULL user
    _write_events(spark, d, rows)
    out = {
        (r["event_type"], r["hod"]): r.asDict()
        for r in specs["events_k_anonymity"].fn(spark, d).collect()
    }
    common = out[("common", 0)]
    assert common["n_users"] == 5 and common["is_k_anon"] == 1
    rare = out[("rare", 1)]
    assert rare["n_users"] == 1 and rare["is_k_anon"] == 0
    assert rare["n_rows"] == 2  # NULL-user row counted in volume only
    # 2026-03-02 is a Monday → ISO dow 1 on both engines
    assert common["dow"] == 1


def test_embedding_dimension_stats_moments(spark, tmp_path, specs):
    """Vectors [1,2] and [3,4]: exact integer moments per dimension."""
    d = str(tmp_path)
    df = spark.createDataFrame(
        [(1, [1.0, 2.0], 0), (2, [3.0, 4.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet")
    )
    out = {
        r["dim"]: r.asDict()
        for r in specs["embedding_dimension_stats"].fn(spark, d).collect()
    }
    d0 = out[0]
    assert d0["n"] == 2
    assert d0["mean_e6"] == 2_000_000
    # var = ((1-2)² + (3-2)²)/2 = 1 → 1e12 on the e12 grid
    assert d0["var_e12"] == 1_000_000_000_000
    assert d0["std_e6"] == 1_000_000
    assert d0["min_e6"] == 1_000_000 and d0["max_e6"] == 3_000_000
    d1 = out[1]
    assert d1["mean_e6"] == 3_000_000 and d1["var_e12"] == 1_000_000_000_000


def test_chi2_uniform_table_is_zero(spark, tmp_path, specs):
    """A perfectly balanced 2-type × 2-dow table has zero statistic;
    term and expected values are exact integers."""
    d = str(tmp_path)
    rows, eid = [], 0
    for day in (2, 3):  # 2026-03-03 Tue, 03-04 Wed
        for ty in ("a", "b"):
            for _ in range(4):
                eid += 1
                rows.append(
                    (eid, dt.datetime(2026, 3, day, 12, 0), 1, ty, 1.0)
                )
    _write_events(spark, d, rows)
    out = specs["events_chi2_independence"].fn(spark, d).collect()
    assert len(out) == 4
    for r in out:
        assert r["observed"] == 4
        assert r["expected_e2"] == 400  # 8*8*100 // 16
        assert r["term_e6"] == 0


def test_ewma_halving_fold(spark, tmp_path, specs):
    """Hourly counts (3, 5, 9) → fold: 3 → (3+5)//2=4 → (4+9)//2=6."""
    d = str(tmp_path)
    rows, eid = [], 0
    for hour, n in ((0, 3), (1, 5), (2, 9)):
        for _ in range(n):
            eid += 1
            rows.append((eid, _ts(hour * 60), 1, "a", 1.0))
    _write_events(spark, d, rows)
    out = specs["events_ewma_hourly"].fn(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_buckets"] == 3 and r["last_count"] == 9
    assert r["ewma_half"] == 6


def test_fullouter_recon_classes(spark, specs):
    """On the sf0.001 fixture all four recon classes appear, matched keys
    are ≡ 0 mod 6 (and not mod 7), and the mismatch delta is the
    injected penny per key."""
    out = {
        r["recon_status"]: r.asDict()
        for r in specs["orders_fullouter_recon"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert set(out) == {
        "matched",
        "amount_mismatch",
        "orders_only",
        "billing_only",
    }
    assert out["matched"]["abs_delta_cents"] == 0
    assert out["amount_mismatch"]["abs_delta_cents"] == out[
        "amount_mismatch"
    ]["n_keys"]  # exactly one injected penny per mismatched key
    assert out["orders_only"]["cents_billing"] == 0
    assert out["billing_only"]["cents_orders"] == 0


def test_minhash_estimate_bounded_error(spark, specs):
    """Estimate and truth are both permille in [0, 1000]; the estimate
    quantizes to multiples of 1000/16 = 62.5 floored."""
    rows = (
        specs["dedup_minhash_estimate_audit"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert rows, "band join produced no candidate pairs at sf0.001"
    for r in rows:
        assert 0 <= r["est_permille"] <= 1000
        assert 0 <= r["exact_permille"] <= 1000
        assert r["err_permille"] == abs(r["est_permille"] - r["exact_permille"])
        assert r["est_permille"] in {i * 1000 // 16 for i in range(17)}


def test_acf_alternating_series(spark, tmp_path, specs):
    """A strictly alternating hourly series (2,6,2,6,...) has lag-1
    autocorrelation -1; a constant series yields NULL (guarded)."""
    d = str(tmp_path)
    rows, eid = [], 0
    for hour in range(6):
        for _ in range(2 if hour % 2 == 0 else 6):
            eid += 1
            rows.append((eid, _ts(hour * 60), 1, "alt", 1.0))
    for hour in range(4):  # constant series → zero variance → NULL
        for _ in range(3):
            eid += 1
            rows.append((eid, _ts(hour * 60), 2, "flat", 1.0))
    _write_events(spark, d, rows)
    out = {
        r["event_type"]: r.asDict()
        for r in specs["events_hourly_acf"].fn(spark, d).collect()
    }
    assert out["alt"]["n_pairs"] == 5
    assert out["alt"]["acf1"] == -1.0
    assert out["flat"]["acf1"] is None


def test_rake_hand_example(spark, tmp_path, specs):
    """'the quick brown fox of red dog' → phrases [quick brown fox]
    (word scores 3000 each → 9000) and [red dog] (2000 each → 4000)."""
    d = str(tmp_path)
    df = spark.createDataFrame(
        [(1, "the quick brown fox of red dog", "en", "t", 30)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    out = sorted(
        (r["rnk"], r["phrase"], r["score_permille"])
        for r in specs["doc_rake_keyphrases"].fn(spark, d).collect()
    )
    assert out == [(1, "quick brown fox", 9000), (2, "red dog", 4000)]
