"""Guard for the fs_parse_light DuckDB oracle.

The oracle replays nlp.pos_tag + nlp.dep_parse as a closed form that is only
valid over the documents vocabulary's {DT, JJ, NN} tag alphabet (see the
q_fs_parse_light docstring).  These tests pin (a) the tag table the oracle
hard-codes and (b) the dependency-count closed form, against the real
kernel, so a future nlp.py change that breaks either assumption fails here
in plain pytest instead of as a contract hash mismatch.
"""

from __future__ import annotations

import itertools
import random

from folkscope_spark.nlp import dep_parse, parse_sentence, pos_tag

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]


def oracle_tag(word: str) -> str:
    if word in ("a", "the"):
        return "DT"
    if word == "small":
        return "JJ"
    return "NN"


def oracle_ndeps(tags: list[str]) -> int:
    """The closed form the DuckDB oracle computes (0-based mirror)."""
    n = len(tags)
    is_nn = [t == "NN" for t in tags]
    a = sum(1 for i, t in enumerate(tags)
            if t in ("DT", "JJ") and any(is_nn[i + 1:]))
    b = n
    seen_nn = False
    for j, t in enumerate(tags):
        if is_nn[j]:
            seen_nn = True
        elif t in ("DT", "JJ") and seen_nn:
            b = j
            break
    prefix_nns = [j for j in range(b) if is_nn[j]]
    if prefix_nns:
        h = prefix_nns[-1]
    else:
        all_nn = [j for j in range(n) if is_nn[j]]
        h = all_nn[-1] if all_nn else 0
    bb = sum(1 for i, t in enumerate(tags)
             if t in ("DT", "JJ") and not any(is_nn[i + 1:]) and i != h)
    c = sum(1 for i in range(n - 1) if is_nn[i] and is_nn[i + 1])
    d = 1 if len(prefix_nns) >= 2 else 0
    return a + bb + c + d


def test_oracle_tag_table_matches_pos_tag():
    for w in VOCAB:
        assert pos_tag([w])[0] == oracle_tag(w), w
    # tags must also be context-free for this vocabulary (the oracle tags
    # word-by-word; pos_tag sees the whole sequence)
    rng = random.Random(11)
    for _ in range(500):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(1, 25))]
        assert pos_tag(words) == [oracle_tag(w) for w in words], words


def test_closed_form_matches_dep_parse_fuzz():
    rng = random.Random(7)
    for _ in range(5000):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(1, 25))]
        tags = [oracle_tag(w) for w in words]
        assert len(dep_parse(words, tags)) == oracle_ndeps(tags), words


def test_closed_form_adversarial_dt_jj_runs():
    # exhaustive over the tag-shaping words: every DT/JJ/NN arrangement of
    # length 6 (head fallbacks, no-noun tails, nsubj boundary cases)
    for words in itertools.product(["a", "the", "small", "table"], repeat=6):
        tags = [oracle_tag(w) for w in words]
        assert len(dep_parse(list(words), tags)) == oracle_ndeps(tags), words


def test_parse_sentence_word_boundary_truncation_identity():
    # the query truncates at 25 words; on single-space text the split/join
    # round trip must be the identity parse input
    text = " ".join(["key", "a", "small", "table"] * 10)
    first25 = " ".join(text.split(" ")[:25])
    p = parse_sentence(first25)
    assert len(p["tokens"]) == 25
    assert p["pos_tags"] == [oracle_tag(w) for w in first25.split(" ")]
