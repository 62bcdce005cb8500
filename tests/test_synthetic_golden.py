"""Round-6 byte-identity pin for the deterministic corpus generator.

`tests/golden_synthetic.json` was captured from the ROUND-START generator
code before any optimization of the hash plumbing (`_h`/`_pick`/`gen_tail`).
Every oracle hash in the contract ultimately derives from these byte
streams, and several oracles replay the same Python functions on both
sides (so drift would NOT fail the DuckDB comparison) — this golden file
is the independent witness that the optimized generator emits the exact
same corpus.
"""

from __future__ import annotations

import hashlib
import json
import os

import pytest

GOLDEN = json.load(
    open(os.path.join(os.path.dirname(__file__), "golden_synthetic.json"))
)


def test_h_values_pinned():
    from folkscope_spark.synthetic import SEED, _h

    assert [
        _h(SEED, "tt", "B000000001-B000000002-isA", "isA", s) for s in range(3)
    ] == GOLDEN["_h"]
    assert [_h(SEED, "pa", i) for i in (0, 1, 999, 123456)] == GOLDEN["_h2"]


def test_gen_tail_pinned():
    from folkscope_spark.synthetic import gen_tail

    for key, want in GOLDEN["tails"].items():
        dense = key.startswith("dense:")
        rel, i, s = key.removeprefix("dense:").split("|")
        i, s = int(i), int(s)
        pk = "B%09d-B%09d-%s" % (i, (i * 13 + 1) % 997, rel)
        assert gen_tail(pk, rel, s, dense=dense) == want, key


def test_page_and_item_rows_pinned():
    from folkscope_spark.synthetic import item_row, page_row

    pr = page_row(1234, 500)
    g = GOLDEN["page_1234"]
    assert pr["url"] == g["url"]
    assert pr["text"] == g["text"]
    assert pr["lang"] == g["lang"]
    assert hashlib.sha1(pr["html"]).hexdigest() == g["sha_html"]
    got = item_row(77)
    want = dict(GOLDEN["item_77"])
    # json round-trips the cates list; compare field-wise
    assert got["asin"] == want["asin"]
    assert got["title"] == want["title"]
    assert got["top_cate"] == want["top_cate"]
    assert list(got["cates"]) == list(want["cates"])
