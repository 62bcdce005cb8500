"""S5/S6 — JSONL scan with explicit schema + JSONL sink roundtrip
(generation_parser.py:42-64 shape; SURVEY §2.1)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


@pytest.fixture(scope="module")
def spark():
    from folkscope_spark.session import get_spark

    return get_spark(app="jsonl-t", master="local[2]", shuffle_partitions=2)


def test_jsonl_sink_and_schema_scan_roundtrip(spark, tmp_path_factory):
    """D4 generation records: write JSONL, read back with the explicit schema
    (no inference scan), byte-stable values incl. the nested output array."""
    out = str(tmp_path_factory.mktemp("gens"))
    schema = T.StructType(
        [
            T.StructField("text", T.StringType()),
            T.StructField("key", T.StringType()),
            T.StructField("output", T.ArrayType(T.StringType())),
        ]
    )
    rows = [
        ("a-b-capableOf", "k1", ["keeps the feet warm", "dries fast", "fits"]),
        ("c-d-usedFor", "k2", ["running", "hiking", "walking"]),
    ]
    df = spark.createDataFrame(rows, schema)
    df.write.mode("overwrite").json(out)
    back = spark.read.json(out, schema=schema)
    assert {tuple(r) for r in back.select("text", "key").collect()} == {
        ("a-b-capableOf", "k1"), ("c-d-usedFor", "k2"),
    }
    got = {r["key"]: list(r["output"]) for r in back.collect()}
    assert got == {k: o for _, k, o in rows}
    # explicit schema means a bogus column is null, not a schema error
    widened = spark.read.json(
        out, schema=schema.add(T.StructField("missing", T.LongType()))
    )
    assert widened.filter(F.col("missing").isNotNull()).count() == 0
