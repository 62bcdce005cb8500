"""Guard for the fs_conceptualize DuckDB oracle.

The oracle replaces the combination-heap kernel with the full independent
keep-or-substitute enumeration.  That is only an identity while:

  (a) the heap bound ``top_k**top_k`` (3125) never binds — with the query's
      fixed 7-key map the per-level candidate count is at most
      3^4 * 2^3 - 1 = 647 and the merged list at most 1294;
  (b) the corpus vocabulary parses losslessly: lemmas are identity, NER is
      all-"O" (seed rule is a no-op), tags are the context-free 3-case table;
  (c) ``dep_compound_segment`` over the closed-form dependencies yields
      exactly the maximal-NN-run segmentation;
  (d) a surface never appears with two different scores (DISTINCT == the
      merge's surface dedupe);
  (e) ``parse_sentence`` yields empty dependencies only for 1-token input
      (the oracle's ``len >= 2`` filter mirrors the query's skip).

Each is pinned against the real kernels below, so a future nlp/conceptualize
change fails here in plain pytest instead of as a contract hash mismatch.
"""

from __future__ import annotations

import itertools
import random

from folkscope_spark.conceptualize import conceptualize_eventuality
from folkscope_spark.nlp import parse_sentence

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]

TOPK = {
    "table": [("structure", 0.6), ("object", 0.4)],
    "query": [("request", 0.7), ("question", 0.3)],
    "row": [("record", 1.0)],
    "data": [("information", 0.8), ("asset", 0.2)],
    "key": [("identifier", 1.0)],
    "join": [("operation", 1.0)],
    "filter": [("operation", 0.9), ("device", 0.1)],
}


def tag(w: str) -> str:
    return "DT" if w in ("a", "the") else ("JJ" if w == "small" else "NN")


def segments(words: list[str], tags: list[str]) -> list[str]:
    """Maximal-NN-run segmentation (the oracle's gaps-and-islands)."""
    out, i, n = [], 0, len(words)
    while i < n:
        if tags[i] == "NN":
            j = i
            while j + 1 < n and tags[j + 1] == "NN":
                j += 1
            out.append(" ".join(words[i:j + 1]))
            i = j + 1
        else:
            out.append(words[i])
            i += 1
    return out


def enumerate_level(seq: list[str], matched: list[str]) -> set:
    res = set()
    opts = [[(w, None, 1.0)] + [(w, c, p) for c, p in TOPK[w]] for w in matched]
    for combo in itertools.product(*opts):
        if all(c is None for _, c, _ in combo):
            continue
        sub = {w: c for w, c, _ in combo if c is not None}
        score = 1.0
        for _, c, p in combo:
            if c is not None:
                score *= p
        res.add((" ".join(sub.get(x, x) for x in seq), round(score, 6)))
    return res


def mirror(words: list[str]) -> set:
    """The oracle's closed form, 0-based Python mirror."""
    tags = [tag(w) for w in words]
    phrases = segments(words, tags)
    mw = [w for w in TOPK if w in set(words)]
    out = enumerate_level(words, mw)
    mp = [
        w for w in TOPK
        if any(phrases[i] == w and i < len(tags) and tags[i] == "NN"
               for i in range(len(phrases)))
    ]
    if len(phrases) != len(words):
        out |= enumerate_level(phrases, mp)
    if not mw and not (mp if len(phrases) != len(words) else []):
        out = {(" ".join(words), 1.0)}
    return out


def real(words: list[str]) -> set:
    p = parse_sentence(" ".join(words))
    lemmas = [w.lower() for w in p["lemmas"]]
    assert lemmas == words, "lemma drift breaks the oracle"  # (b)
    assert p["pos_tags"] == [tag(w) for w in words], "tag drift"  # (b)
    assert all(n == "O" for n in p["ners"]), "NER drift"  # (b)
    ners = [
        "O" if p["pos_tags"][i].startswith("VB") else n
        for i, n in enumerate(p["ners"])
    ]
    got = conceptualize_eventuality(
        words, p["pos_tags"], ners, p["dependencies"], TOPK, 5, start_index=0
    )
    surfaces = [" ".join(cw) for cw, _ in got]
    assert len(surfaces) == len(set(surfaces)), "duplicate surface"  # (d)
    assert len(got) <= 1294, "heap bound would bind"  # (a)
    return {(" ".join(cw), round(s, 6)) for cw, s in got}


def test_heap_bound_never_binds_worst_case():
    # (a) densest possible input: every map key repeated, all NN
    words = (list(TOPK) * 4)[:25]
    assert len(real(words)) <= 1294


def test_mirror_matches_kernel_fuzz():
    rng = random.Random(23)
    for _ in range(300):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(2, 25))]
        assert mirror(words) == real(words), words


def test_mirror_matches_kernel_adversarial_boundaries():
    cases = [
        ["table"] * 2,                      # one key, compound run
        ["table", "a", "table"],            # key standalone twice
        ["a", "the", "small"],              # no nouns -> fallback
        ["agg", "batch", "column"],         # nouns, no keys -> fallback
        ["key", "table", "a", "key"],       # key in compound AND standalone
        ["a", "table", "small", "query", "row", "data", "key", "join",
         "filter"],                         # all 7 keys present
        ["join", "filter", "join"],         # shared concept 'operation'
        ["the", "key"],                     # single noun after DT
    ]
    for words in cases:
        assert mirror(words) == real(words), words


def mirror_text(words: list[str]) -> set:
    """fs_concept_text's closed form: the text path gates a phrase by its own
    first-word POS, so a key matches iff it is a standalone segment."""
    tags = [tag(w) for w in words]
    phrases = segments(words, tags)
    mw = [w for w in TOPK if w in set(words)]
    out = enumerate_level(words, mw)
    mp = [w for w in TOPK if w in set(phrases)]
    if len(phrases) != len(words):
        out |= enumerate_level(phrases, mp)
    if not mw and not (mp if len(phrases) != len(words) else []):
        out = {(" ".join(words), 1.0)}
    return out


def real_text(words: list[str]) -> set:
    from folkscope_spark.conceptualize import conceptualize_from_text

    p = parse_sentence(" ".join(words))
    got = conceptualize_from_text(
        [w.lower() for w in p["lemmas"]], list(p["ners"]),
        list(p["pos_tags"]), p["dependencies"], TOPK, 5, start_index=0,
    )
    surfaces = [" ".join(cw) for cw, _ in got]
    assert len(surfaces) == len(set(surfaces)), "duplicate surface"
    assert len(got) <= 1294, "heap bound would bind"
    return {(" ".join(cw), round(s, 6)) for cw, s in got}


def test_text_mirror_matches_kernel_fuzz():
    rng = random.Random(43)
    for _ in range(300):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(2, 25))]
        assert mirror_text(words) == real_text(words), words


def test_text_vs_eventuality_gate_divergence_case():
    # "row row a a row": the standalone 'row' is phrase #4, whose misaligned
    # word-level tag (position 4 = 'a' -> DT) fails the eventuality path's
    # gate but passes the text path's aligned gate — the two oracles encode
    # genuinely different kernels, and each matches its own.
    words = ["row", "row", "a", "a", "row"]
    ev, tx = mirror(words), mirror_text(words)
    assert ev == real(words)
    assert tx == real_text(words)
    assert ("row row a a record", 1.0) in tx - ev


def test_dep_parse_empty_only_for_single_token():
    # (e) the oracle filters len(ws) >= 2; the query skips empty-dep parses
    for w in VOCAB:
        assert parse_sentence(w)["dependencies"] == []
    rng = random.Random(31)
    for _ in range(300):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(2, 25))]
        assert parse_sentence(" ".join(words))["dependencies"], words
