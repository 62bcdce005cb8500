"""Multimodal plumbing tests: schema, determinism, batch shape, stub seam."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from folkscope_spark.session import get_spark

    s = get_spark(app="t3", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def assets(spark):
    from folkscope_spark.multimodal import assets_from_pages
    from folkscope_spark.synthetic import pages_df

    return assets_from_pages(pages_df(spark, 60, 20)).cache()


def test_assets_schema(assets):
    from folkscope_spark.multimodal import ASSETS

    # nullability flags differ between literal-built and declared schemas;
    # names and types are the contract
    assert [(f.name, f.dataType.simpleString()) for f in assets.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in ASSETS.fields
    ]
    kinds = {r["kind"] for r in assets.select("kind").distinct().collect()}
    assert kinds <= {"image", "audio", "video"}


def test_feature_extraction_deterministic(assets):
    from folkscope_spark.multimodal import FEATURE_DIM, extract_features

    f1 = {r["asset_id"]: tuple(r["feature"]) for r in extract_features(assets).collect()}
    f2 = {r["asset_id"]: tuple(r["feature"]) for r in extract_features(assets).collect()}
    assert f1 == f2
    assert all(len(v) == FEATURE_DIM for v in f1.values())
    assert all(0.0 <= x <= 1.0 for v in f1.values() for x in v)


def test_feature_sha1_matches_payload(assets):
    import hashlib

    from folkscope_spark.multimodal import extract_features

    row = (
        extract_features(assets)
        .join(assets.select("asset_id", "payload"), "asset_id")
        .first()
    )
    assert row["sha1"] == hashlib.sha1(bytes(row["payload"])).hexdigest()
    assert row["n_bytes"] == len(bytes(row["payload"]))


def test_resize_updates_meta(assets):
    from folkscope_spark.multimodal import resize_images

    out = resize_images(assets, 224, 224)
    rows = out.collect()
    n_images = assets.filter(F.col("kind") == "image").count()
    assert len(rows) == n_images
    assert all(r["meta"]["width"] == 224 and r["meta"]["height"] == 224 for r in rows)


def test_frame_sampling_fanout(assets):
    from folkscope_spark.multimodal import sample_frames

    frames = sample_frames(assets, every_ms=1000)
    joined = (
        frames.groupBy("asset_id")
        .agg(F.count("*").alias("n_frames"))
        .join(assets.select("asset_id", F.col("meta.duration_ms").alias("d")), "asset_id")
    )
    for r in joined.collect():
        assert r["n_frames"] == max(r["d"] // 1000, 1)


def test_real_decoder_seam_raises(assets):
    from folkscope_spark.multimodal import extract_features
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc:
        extract_features(assets, decoder="real").count()
    assert "NotImplementedError" in str(exc.value) or "real decoder seam" in str(exc.value)


def test_xxh64_matches_spark(spark):
    """The from-spec XXH64 the contract oracle uses to replay Spark's
    hash-derived kind assignment must track F.xxhash64 exactly — empty,
    sub-chunk (<8B), 4B-tail, byte-tail, full 32B-lane and unicode inputs."""
    from folkscope_spark.xxh64 import xxh64_signed

    samples = [
        "",
        "a",
        "abcd",
        "abcdefg",
        "12345678",
        "https://shop-00ff.example/tools/B0000000017+B0000000003",
        "x" * 31,
        "y" * 32,
        "z" * 67,
        "éèê unicode 中文 ✓",
    ]
    got = {
        r["s"]: r["h"]
        for r in spark.createDataFrame([(s,) for s in samples], ["s"])
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    }
    for s in samples:
        assert xxh64_signed(s.encode("utf-8")) == got[s], s


def test_contract_oracle_replay_matches_spark(spark):
    """Per-asset differential between the Spark multimodal path and the
    single-process enumeration the fs_multimodal_features oracle inlines:
    kind (JVM xxhash64 vs pure-Python XXH64), n_bytes and sha1 (Arrow
    binary round-trip fidelity), at a size != the contract's 200 pages so
    the guard isn't just re-running the contract row."""
    import hashlib

    from folkscope_spark.multimodal import assets_from_pages, extract_features
    from folkscope_spark.synthetic import page_row, pages_df
    from folkscope_spark.xxh64 import xxh64_signed

    n_pages, n_items = 73, 20
    feats = extract_features(assets_from_pages(pages_df(spark, n_pages, n_items)))
    got = {
        r["sha1"]: (r["kind"], r["n_bytes"])
        for r in feats.select("kind", "n_bytes", "sha1").collect()
    }
    kinds = ("image", "audio", "video")
    want = {}
    for i in range(n_pages):
        r = page_row(i, n_items)
        kind = kinds[xxh64_signed(r["url"].encode("utf-8")) % 3]
        want[hashlib.sha1(r["html"]).hexdigest()] = (kind, len(r["html"]))
    assert got == want


def test_xxh64_matches_spark_bulk_random(spark):
    """Breadth pin for the from-spec XXH64: 2,000 seeded-random byte strings
    (lengths 0-96, full byte alphabet including non-UTF8-roundtrippable
    ranges avoided by construction: Spark hashes the UTF-8 encoding of a
    string column, so inputs are generated as text) vs F.xxhash64 in one
    job.  The 10-sample boundary test pins the chunk/tail classes; this one
    guards the wide middle."""
    import random

    rng = random.Random(0xF01C5)
    alphabet = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
        " _-./:?&=%#@!~中文éèüñ✓’—"
    )
    samples = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 97)))
        for _ in range(2000)
    ]
    from folkscope_spark.xxh64 import xxh64_signed

    got = (
        spark.createDataFrame([(i, s) for i, s in enumerate(samples)], ["i", "s"])
        .select("i", F.xxhash64("s").alias("h"))
        .collect()
    )
    for r in got:
        assert xxh64_signed(samples[r["i"]].encode("utf-8")) == r["h"], (
            r["i"],
            samples[r["i"]],
        )
