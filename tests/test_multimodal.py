"""Multimodal plumbing tests: binary columns through mapInPandas."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatatiler_spark.operators.multimodal import (
    DECODED_SCHEMA,
    decode_stub,
    with_payload,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "héllo"), (3, "x" * 1000)], ["doc_id", "text"]
    )


def test_payload_is_binary(spark, docs):
    df = with_payload(docs)
    assert dict(df.dtypes)["payload"] == "binary"
    row = df.where(F.col("doc_id") == 2).first()
    assert row["payload"] == "héllo".encode()  # utf-8 bytes, not chars
    assert row["media_meta"]["n_bytes"] == 6


def test_decode_stub_fake(spark, docs):
    out = decode_stub(with_payload(docs), fake=True)
    assert out.schema == DECODED_SCHEMA
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["payload_len"] == 11
    assert rows[3]["n_frames"] == 4  # ceil(1000/256)
    assert rows[1]["width"] == ord("h") + 1  # deterministic fake dims


def test_decode_stub_real_raises(spark, docs):
    with pytest.raises(Exception, match="NotImplementedError|real media decoding"):
        decode_stub(with_payload(docs), fake=False).collect()
