"""Differential tests: the distributed matcher kernels vs the literal
reference transcription in ``tests/reference_port.py`` (VERDICT r1, item 2).

``reference_port`` imports nothing from ``folkscope_spark`` — its
subisomorphism search is an independent brute-force enumeration and its match
sweep is a line-by-line transcription of ``pattern_match.py:63-236`` — so
agreement here is kernel parity, not shared-code tautology."""

from __future__ import annotations

from collections import Counter
from copy import deepcopy

from folkscope_spark.graphs import (
    build_hierarchy,
    check_connect,
    dedupe_by_subsumption,
    ends_forbidden,
    graph_of,
    sort_patterns,
)
from folkscope_spark.match import extract_from_sentence
from folkscope_spark.nlp import parse_sentence
from folkscope_spark.patterns import enumerate_anchored
from folkscope_spark.relations import prompt_text
from folkscope_spark.synthetic import gen_tail, item_asin, item_row
from folkscope_spark.textnorm import clean_text

from tests import reference_port as ref

ANCHOR = "they both are capable of"
ANCHOR_LEN = 5  # tokens of "PRP DT VBP JJ IN"


def _capableof_lines(n_pairs: int = 45, n_seqs: int = 2) -> list[dict]:
    """>= 50 diverse parsed sentences from the deterministic generator —
    inputs shared by both sides, kernels differ."""
    lines = []
    for i in range(n_pairs):
        a, b = item_asin(i), item_asin(i + 1)
        ta, tb = item_row(i)["title"], item_row(i + 1)["title"]
        for s in range(n_seqs):
            cont = gen_tail("%s-%s-capableOf" % (a, b), "capableOf", s)
            full = prompt_text("capableOf", ta, tb) + " " + cont
            idx = full.find(ANCHOR)
            if idx < 0:
                continue
            parsed = parse_sentence(clean_text(full[idx:]))
            if not parsed["dependencies"]:
                continue
            lines.append(
                {
                    "sid": "%s-capableOf-%s|%d" % (a, b, s),
                    "pos_tags": list(parsed["pos_tags"]),
                    "lemmas": list(parsed["lemmas"]),
                    "dependencies": [tuple(d) for d in parsed["dependencies"]],
                }
            )
    return lines


def _mine_raw_patterns(lines, max_extra=2, min_freq=2):
    # skeletonize=False: the matcher differential wants a *diverse* pattern
    # set (skeletonization collapses optional variants, which is its job)
    ctr: Counter = Counter()
    for line in lines:
        for pat in enumerate_anchored(
            line["pos_tags"], line["dependencies"], ANCHOR_LEN, max_extra,
            skeletonize=False,
        ):
            ctr[pat] += 1
    return [
        p
        for p, c in ctr.items()
        if c >= min_freq and check_connect(p) and not ends_forbidden(p)
    ]


def _norm_repo(ev):
    return (
        ev["eid"],
        tuple(ev["words"]),
        tuple(ev["pos_tags"]),
        tuple(tuple(d) for d in ev["dependencies"]),
        tuple(ev["skeleton_indices"]),
        ev["pattern_sig"],
    )


def _norm_ref(ev):
    return (
        ev["eid"],
        tuple(ev["words"]),
        tuple(ev["pos_tags"]),
        tuple(tuple(d) for d in ev["dependencies"]),
        tuple(ev["skeleton_indices"]),
        " ".join(ev["pattern"][0]),
    )


def test_match_vs_reference_port():
    """>= 50 generator sentences: the distributed matcher's per-line output
    must equal the literal sequential sweep's, element for element."""
    lines = _capableof_lines()
    assert len(lines) >= 50
    raw = _mine_raw_patterns(lines)
    assert len(raw) >= 3

    # reference side: literal sweep (does its own dedupe/sort/flags)
    ref_lines = ref.match_corpus(deepcopy(lines), list(raw))

    # repo side: same dedupe/sort kernels the production matcher uses
    ordered = sort_patterns(dedupe_by_subsumption(list(raw)))
    # the two dedupe implementations must agree first
    assert ordered == ref.dedupe_and_sort_patterns(list(raw))
    prepared = [(p, graph_of(p)) for p in ordered]
    hierarchy = build_hierarchy(ordered)

    n_with_events = 0
    for line, ref_line in zip(lines, ref_lines):
        repo_evs = [_norm_repo(e) for e in extract_from_sentence(line, prepared, hierarchy)]
        ref_evs = [_norm_ref(e) for e in ref_line["eventualities"] if e["words"]]
        assert repo_evs == ref_evs, line["sid"]
        if repo_evs:
            n_with_events += 1
    assert n_with_events >= 20  # the corpus actually exercises the matcher


def test_optional_closure_or_quirk():
    """The reference's OPTIONAL closure admits match vertices with OPTIONAL
    POS (pattern_match.py:131's `or`), so an optional->match edge is selected
    through the third branch — both sides must include it in the eventuality
    (it changes the eid)."""
    line = {
        "sid": "X-open-Y|0",
        "pos_tags": ["DT", "NN", "JJ"],
        "lemmas": ["the", "cat", "big"],
        "dependencies": [(1, "det", 0), (1, "amod", 2), (2, "dep", 0)],
    }
    pattern = (("DT", "NN"), ((1, "det", 0),))

    ref_lines = ref.match_corpus([deepcopy(line)], [pattern])
    assert len(ref_lines[0]["eventualities"]) == 1
    ref_ev = ref_lines[0]["eventualities"][0]
    # the quirk edge (2, dep, 0) is selected -> 3 dependencies survive
    assert len(ref_ev["dependencies"]) == 3

    repo_evs = extract_from_sentence(line, [(pattern, graph_of(pattern))])
    assert len(repo_evs) == 1
    assert _norm_repo(repo_evs[0]) == _norm_ref(ref_ev)


def test_separator_veto_pairwise():
    """Spanning (or sitting on) a separator kills the match; staying on one
    side does not (pattern_match.py:102-118)."""
    pattern = (("NN", "VBZ"), ((1, "nsubj", 0),))
    ok = {
        "sid": "X-open-Y|0",
        "pos_tags": ["NN", "VBZ", ".", "NN"],
        "lemmas": ["cat", "sits", ".", "dog"],
        "dependencies": [(1, "nsubj", 0)],
    }
    spanning = {
        "sid": "X-open-Y|1",
        "pos_tags": ["NN", ".", "VBZ"],
        "lemmas": ["cat", ".", "sits"],
        "dependencies": [(2, "nsubj", 0)],
    }
    assert len(extract_from_sentence(ok, [(pattern, graph_of(pattern))])) == 1
    assert extract_from_sentence(spanning, [(pattern, graph_of(pattern))]) == []
    ref_ok = ref.match_corpus([deepcopy(ok)], [pattern])
    ref_span = ref.match_corpus([deepcopy(spanning)], [pattern])
    assert len(ref_ok[0]["eventualities"]) == 1
    assert ref_span[0]["eventualities"] == []


def test_first_match_wins():
    """Once a pattern matches a line, later patterns never extract from it
    (pattern_match.py:88's virgin-flag check), even non-children."""
    big = (("NN", "VBZ", "NN"), ((1, "nsubj", 0), (1, "obj", 2)))
    small_other = (("NN", "VBZ"), ((1, "nsubj", 0),))
    line = {
        "sid": "X-open-Y|0",
        "pos_tags": ["NN", "VBZ", "NN"],
        "lemmas": ["cat", "eats", "fish"],
        "dependencies": [(1, "nsubj", 0), (1, "obj", 2)],
    }
    # small_other is subsumption-subsumed by big here, so use a line where
    # both match independently after dedupe: dedupe keeps big only if small
    # is contained — it is, so instead check against the literal sweep output
    raw = [big, small_other]
    ref_lines = ref.match_corpus([deepcopy(line)], list(raw))
    ordered = sort_patterns(dedupe_by_subsumption(list(raw)))
    prepared = [(p, graph_of(p)) for p in ordered]
    repo_evs = [_norm_repo(e) for e in extract_from_sentence(line, prepared)]
    ref_evs = [_norm_ref(e) for e in ref_lines[0]["eventualities"] if e["words"]]
    assert repo_evs == ref_evs
    # only the first (largest) pattern contributed
    sigs = {e[5] for e in repo_evs}
    assert sigs == {"NN VBZ NN"}
