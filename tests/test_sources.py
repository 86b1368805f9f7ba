"""Format surface: parquet/json/csv round-trips, binary blob IO, and the
distributed byte sink (O7 parity — SURVEY.md §2.1)."""

from __future__ import annotations

import zipfile

from pyspark.sql import Row, functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from bigdatatiler_spark.sources.io import (
    read_binary_files,
    read_csv,
    read_json,
    read_table,
    write_csv,
    write_json,
    write_payload_files,
    write_table,
)

SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("n", IntegerType()),
        StructField("note", StringType()),
    ]
)

ROWS = [
    Row(user_id="u1", n=1, note="alpha"),
    Row(user_id="u1", n=2, note="beta,with comma"),
    Row(user_id="u2", n=3, note=None),
]


def test_parquet_partitioned_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "t")
    write_table(df, path, partition_by=("user_id",), mode="overwrite")
    back = read_table(spark, path)
    assert back.count() == 3
    # partition pruning works on the partition column
    assert back.where(F.col("user_id") == "u2").count() == 1
    pruned = back.where(F.col("user_id") == "u2")._jdf.queryExecution().toString()
    assert "PartitionFilters" in pruned

    # append mode adds rows (O3/O4 semantics)
    write_table(df.limit(1), path, partition_by=("user_id",))
    assert read_table(spark, path).count() == 4


def test_json_roundtrip_with_schema(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "j")
    write_json(df, path)
    back = read_json(spark, path, SCHEMA)
    assert back.select("user_id", "n", "note").sort("n").collect() == df.sort(
        "n"
    ).collect()


def test_json_corrupt_rows_quarantined(spark, tmp_path):
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "part-0.json").write_text(
        '{"user_id": "u1", "n": 1, "note": "ok"}\n{not json at all\n'
    )
    # StructType.add mutates in place — build a fresh schema instead
    schema = StructType(SCHEMA.fields + [StructField("_corrupt_record", StringType())])
    back = read_json(spark, str(bad), schema)
    rows = back.collect()
    assert len(rows) == 2
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(corrupt) == 1  # bad line kept, not crashed on


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "c")
    write_csv(df, path)
    back = read_csv(spark, path, SCHEMA)
    got = {(r.user_id, r.n, r.note) for r in back.collect()}
    assert got == {("u1", 1, "alpha"), ("u1", 2, "beta,with comma"), ("u2", 3, None)}


def test_payload_file_sink_and_binary_read(spark, tmp_path):
    """O7: byte[] payload → one .zip file per row, then read back as blobs."""
    out = tmp_path / "blobs"
    payloads = []
    rows = []
    for i in range(3):
        import io as _io

        buf = _io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr(f"{i}.xml", f"<log id='{i}'/>")
        payloads.append(buf.getvalue())
        rows.append(Row(id=f"doc{i}", payload=buf.getvalue()))
    df = spark.createDataFrame(rows)
    n = write_payload_files(df, str(out), name_col="id", payload_col="payload")
    assert n == 3

    # each file is a valid zip holding the original XML
    with zipfile.ZipFile(out / "doc1.zip") as z:
        assert z.read("1.xml") == b"<log id='1'/>"

    back = read_binary_files(spark, str(out), glob="*.zip")
    assert back.count() == 3
    content = {r.content for r in back.select("content").collect()}
    assert content == set(payloads)


def test_export_jsonl_shards_roundtrip(spark, tmp_path):
    """Sharded JSONL export: stable shard assignment (same doc → same
    shard on re-export), per-file record cap honored, and a full
    read-back recovers every row byte-identically."""
    import glob as _glob
    import json as _json

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from bigdatatiler_spark.sources.io import export_jsonl_shards, read_json
    from bigdatatiler_spark.tables import table

    docs = table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "lang", "text"
    )
    out = str(tmp_path / "export")
    export_jsonl_shards(
        docs, out, shard_col="doc_id", n_shards=4, order_col="doc_id",
        max_records_per_file=10,
    )
    # every shard dir exists and no file exceeds the record cap
    files = _glob.glob(f"{out}/shard=*/part-*")
    assert len(files) > 0
    shards = {f.split("shard=")[1].split("/")[0] for f in files}
    assert shards == {"0", "1", "2", "3"}
    for f in files:
        with open(f) as fh:
            assert sum(1 for _ in fh) <= 10
    # read-back recovers the corpus exactly
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("text", StringType()),
        ]
    )
    back = read_json(spark, f"{out}/shard=*", schema).select(
        "doc_id", "lang", "text"
    )
    orig = {(r.doc_id, r.lang, r.text) for r in docs.collect()}
    got = {(r.doc_id, r.lang, r.text) for r in back.collect()}
    assert got == orig
    # re-export is shard-stable: identical file->rowcount layout
    out2 = str(tmp_path / "export2")
    export_jsonl_shards(
        docs, out2, shard_col="doc_id", n_shards=4, order_col="doc_id",
        max_records_per_file=10,
    )
    def layout(root):
        d = {}
        for f in _glob.glob(f"{root}/shard=*/part-*"):
            k = f.split("shard=")[1].split("/")[0]
            with open(f) as fh:
                d[k] = d.get(k, 0) + sum(1 for _ in fh)
        return d
    assert layout(out) == layout(out2)


def test_orc_roundtrip_partitioned_and_pushdown(spark, tmp_path):
    from bigdatatiler_spark.sources.io import read_orc, write_orc

    path = str(tmp_path / "orc")
    df = spark.createDataFrame(ROWS, SCHEMA)
    write_orc(df, path, partition_by=("user_id",))
    back = read_orc(spark, path)
    assert {(r.user_id, r.n, r.note) for r in back.collect()} == {
        (r.user_id, r.n, r.note) for r in ROWS
    }
    # same pushdown contract as parquet: the n>1 predicate reaches the
    # ORC scan (search-argument pushdown), partition filter prunes dirs
    plan = (
        back.filter((F.col("n") > 1) & (F.col("user_id") == "u1"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "GreaterThan(n,1)" in plan
    assert "PartitionFilters: [" in plan


def test_schema_evolution_merge_read(spark, tmp_path):
    path = str(tmp_path / "evolving")
    spark.createDataFrame([Row(k=1, v="a")]).write.parquet(path)
    # the table evolves: a later writer adds a column
    spark.createDataFrame([Row(k=2, v="b", extra=7)]).write.mode(
        "append"
    ).parquet(path)
    merged = read_table(spark, path, merge_schema=True)
    assert set(merged.columns) == {"k", "v", "extra"}
    got = {r.k: r.extra for r in merged.collect()}
    assert got == {1: None, 2: 7}


def test_orc_roundtrip_type_fidelity(spark, tmp_path):
    """ORC preserves decimals and longs natively: a write→read cycle
    returns bit-identical values including NULLs and negatives."""
    from decimal import Decimal

    df = spark.createDataFrame(
        [
            (1, -62135596800000000, "a", Decimal("12345678901234.56")),
            (2, None, "", Decimal("-0.01")),
            (3, 1706635653446945, None, None),
        ],
        "event_id long, ts_us long, event_type string, val decimal(18,2)",
    )
    path = str(tmp_path / "orc")
    df.write.orc(path)
    back = spark.read.schema(
        "event_id long, ts_us long, event_type string, val decimal(18,2)"
    ).orc(path)
    got = {tuple(r) for r in back.collect()}
    want = {tuple(r) for r in df.collect()}
    assert got == want
