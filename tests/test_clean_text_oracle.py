"""Guard for the fs_clean_text DuckDB oracle.

The oracle states the closed form ``'n e <ref> [<url>) ' || text`` for
``clean_text`` over the query's deterministic dirtying, plus identity on the
raw lowercase-word corpus.  These tests pin both claims against the real
regex cleaner so a future textnorm change fails here in plain pytest instead
of as a contract hash mismatch.  The dirtying fires all four cleaner rules:
non-ASCII run -> single space, ``<ref ...>`` -> ``<ref>``, Gruber URL ->
``<url>``, bracket-joined ``<url>`` pair collapse.
"""

from __future__ import annotations

import random

from folkscope_spark.textnorm import clean_text

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]


def dirty(fw: str, text: str) -> str:
    """Mirror of the Spark-side F.concat in q_fs_clean_text."""
    return f'née <ref name="{fw}"> [https://{fw}.com](https://{fw}.org) {text}'


def test_closed_form_golden():
    assert (
        clean_text(dirty("key", "a small table"))
        == "n e <ref> [<url>) a small table"
    )


def test_rule_stages_individually():
    # each cleaner rule observable in isolation on this construction
    assert clean_text("née x") == "n e x"  # non-ASCII run -> space, strip
    assert clean_text('<ref name="k">') == "<ref>"
    assert clean_text("see https://key.com/page now") == "see <url> now"
    # markdown-bracketed URLs: two <url>s joined by ']'/'(' collapse to one
    assert clean_text("[https://a.com](https://b.org)") == "[<url>)"


def test_closed_form_matches_cleaner_fuzz():
    rng = random.Random(13)
    for _ in range(2000):
        fw = rng.choice(VOCAB)
        text = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 40)))
        assert clean_text(dirty(fw, text)) == "n e <ref> [<url>) " + text


def test_identity_on_clean_vocabulary_text():
    rng = random.Random(17)
    for _ in range(500):
        text = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 40)))
        assert clean_text(text) == text
