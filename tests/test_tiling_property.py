"""Property-based round-trip check for tile/reassemble: randomized
payloads (unicode, any length) and chunk sizes — the reference invariant
CombineSplitLogs(loadXmlFile(x)) == x (LogChange.cs:95-98) must hold for
ALL payloads, not just the hand-picked boundary cases in test_tiling.

One Spark job per hypothesis example is too slow, so each example is a
*batch* of payloads round-tripped in a single job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdatatiler_spark.logstore.tile import reassemble, tile

payload_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # any non-surrogate
    max_size=500,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    payloads=st.lists(payload_st, min_size=1, max_size=8),
    chunk=st.integers(min_value=1, max_value=64),
)
def test_roundtrip_property(spark, payloads, chunk):
    df = spark.createDataFrame(
        list(enumerate(payloads)), ["rec_id", "payload"]
    )
    got = {
        r["record_id"]: r["payload"]
        for r in reassemble(
            tile(df, "payload", "rec_id", chunk), id_col="rec_id"
        ).collect()
    }
    assert got == dict(enumerate(payloads))
