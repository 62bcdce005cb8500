"""Pattern mining — anchored subgraph enumeration + distributed counting (O3).

The reference shells out to a parsemis gSpan JVM over ``.lg`` transaction
files (``/root/reference/src/pattern/pattern_filter.py:15-33``), then reads
the frequent set back with punctuation/fuzzy normalization
(``pattern_miner.py:19-104``).  The mining is *anchored*: transactions are
truncated prefixes of template-matched sentences
(``pattern_filter.py:155-171``), so general gSpan is overkill.  The Spark
rewrite enumerates, per sentence, every connected subgraph that contains the
contiguous template prefix (up to ``max_extra`` additional vertices),
canonicalizes it (sentence order, fuzzy POS, ``:``-truncated edge labels,
punctuation removal), and counts signatures with a shuffle
``groupBy().count()`` — partial (map-side) aggregation replaces the gSpan
memory cliff, so this scales with executors instead of driver RAM
(the reference needs >100 GB; README.md:48).

Driver-side finishing mirrors the reference miner: frequency cut at
``N * 1e-4`` (``pattern_miner.py:564-566``), connectivity/shape checks
(``:256-302``), forbidden-end filter (``:574``), same-size isomorphism dedupe
(``:464-478``) and the parent/child hierarchy (``:342-403``) — all on a
pattern set of at most a few thousand rows, then re-broadcast to the matcher.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .graphs import (
    Pattern,
    build_hierarchy,
    check_connect,
    dedupe_by_subsumption,
    ends_forbidden,
    get_subisomorphisms,
    graph_of,
    normalize_pattern,
    sort_patterns,
)
from .relations import POS_TEMPLATES


def anchor_lens() -> dict[str, int]:
    return {
        rel: len(tpl[1].split()) if tpl[1] else 0
        for rel, tpl in POS_TEMPLATES.items()
    }


def enumerate_anchored(
    pos_tags: list[str],
    deps: list[tuple[int, str, int]],
    anchor_len: int,
    max_extra: int = 3,
    cap: int = 200,
) -> list[Pattern]:
    """All connected subgraphs containing vertices 0..anchor_len-1 with at most
    ``max_extra`` extra vertices, as normalized canonical patterns."""
    n = len(pos_tags)
    if anchor_len <= 0 or anchor_len > n:
        return []
    adj: dict[int, set] = {i: set() for i in range(n)}
    for u, _, v in deps:
        adj[u].add(v)
        adj[v].add(u)

    base = frozenset(range(anchor_len))
    seen: set[frozenset] = set()
    out_sets: list[frozenset] = []
    stack = [base]
    while stack and len(out_sets) < cap:
        s = stack.pop()
        if s in seen:
            continue
        seen.add(s)
        out_sets.append(s)
        if len(s) - anchor_len >= max_extra:
            continue
        frontier = set()
        for v in s:
            frontier |= adj[v]
        for nb in sorted(frontier - s):
            ns = s | {nb}
            if ns not in seen:
                stack.append(ns)

    patterns: list[Pattern] = []
    emitted: set[Pattern] = set()
    for s in out_sets:
        nodes = sorted(s)
        remap = {v: i for i, v in enumerate(nodes)}
        sub_edges = [
            (remap[u], el, remap[v]) for u, el, v in deps if u in s and v in s
        ]
        if len(sub_edges) < len(nodes) - 1:
            continue  # cannot be connected
        pat = normalize_pattern([pos_tags[v] for v in nodes], sub_edges, fuzzy=True)
        if not pat[0] or pat in emitted:
            continue
        # connectivity can break after punctuation removal
        if not check_connect(pat):
            continue
        emitted.add(pat)
        patterns.append(pat)
    return patterns


def pattern_sig(pat: Pattern) -> str:
    return json.dumps([list(pat[0]), [list(e) for e in pat[1]]])


def sig_to_pattern(sig: str) -> Pattern:
    pos, edges = json.loads(sig)
    return (tuple(pos), tuple((int(u), el, int(v)) for u, el, v in edges))


def count_anchored_patterns(
    parsed: DataFrame, max_extra: int = 3
) -> DataFrame:
    """parsed (D6) -> (relation, sig, cnt): the distributed replacement for
    gSpan transaction counting.  Map-side enumeration emits one row per
    (sentence, pattern); the shuffle agg is a plain hash aggregate with
    partial combine."""
    lens = anchor_lens()

    has_weight = "weight" in parsed.columns

    def enum(batches):
        for pdf in batches:
            rels, sigs, ws = [], [], []
            weights = pdf["weight"] if has_weight else [1.0] * len(pdf)
            for rel, pos_tags, dep_structs, w in zip(
                pdf["relation"], pdf["pos_tags"], pdf["dependencies"], weights
            ):
                alen = lens.get(rel, 0)
                if alen == 0:
                    continue
                deps = [(d["gov"], d["rel"], d["dep"]) for d in dep_structs]
                for pat in enumerate_anchored(list(pos_tags), deps, alen, max_extra):
                    rels.append(rel)
                    sigs.append(pattern_sig(pat))
                    ws.append(float(w))
            yield pd.DataFrame({"relation": rels, "sig": sigs, "w": ws})

    cols = ["relation", "pos_tags", "dependencies"] + (["weight"] if has_weight else [])
    return (
        parsed.select(cols)
        .mapInPandas(enum, schema="relation string, sig string, w double")
        .groupBy("relation", "sig")
        .agg(F.sum("w").cast("long").alias("count"))
    )


def finish_patterns(
    pattern_counts: DataFrame,
    sentence_counts: dict[str, int],
    min_freq_ratio: float = 1e-4,
    min_freq_abs: int = 2,
) -> dict[str, dict]:
    """Driver-side miner finishing.  Returns, per relation::

        {"patterns": [(pos_tags, edges), ...]   # sorted desc, deduped
         "freqs": [int, ...],
         "hierarchy": [{"parents": [...], "children": [...]}, ...],
         "anchor_len": int}

    Pattern sets are tiny by construction (thousands), so the O(n^2) sweeps
    are driver-side, like the reference (SURVEY.md U3/O4).
    """
    lens = anchor_lens()
    rows = pattern_counts.collect()
    by_rel: dict[str, list[tuple[Pattern, int]]] = {}
    for r in rows:
        by_rel.setdefault(r["relation"], []).append((sig_to_pattern(r["sig"]), r["count"]))

    out: dict[str, dict] = {}
    for rel, pats in by_rel.items():
        n_sent = sentence_counts.get(rel, 0)
        cut = max(min_freq_abs, int(n_sent * min_freq_ratio))
        kept = [
            (p, c)
            for p, c in pats
            if c >= cut and check_connect(p) and not ends_forbidden(p)
        ]
        if not kept:
            continue
        freq_map: dict[Pattern, int] = {}
        for p, c in kept:
            freq_map[p] = freq_map.get(p, 0) + c
        deduped = dedupe_by_subsumption(list(freq_map))
        ordered = sort_patterns(deduped)
        out[rel] = {
            "patterns": ordered,
            "freqs": [freq_map[p] for p in ordered],
            "hierarchy": build_hierarchy(ordered),
            "anchor_len": lens.get(rel, 0),
        }
    return out


def merge_pattern_sets(mined: dict[str, dict]) -> dict:
    """pattern_merge semantics (U1 + A5; pattern_merge.py:12-60 *intended*
    behavior — the shipped script crashes, SURVEY.md §3.4): union all
    relations' frequent patterns, sum counts of identical canonical patterns,
    drop same-size isomorphic duplicates (absorbing their counts into the
    survivor), rebuild the hierarchy.  The merged set drives extraction for
    the template-less ``open`` relation (scripts/run_match.sh:13-16)."""
    freq_map: dict[Pattern, int] = {}
    for info in mined.values():
        for pat, freq in zip(info["patterns"], info["freqs"]):
            freq_map[pat] = freq_map.get(pat, 0) + int(freq)
    if not freq_map:
        return {"patterns": [], "freqs": [], "hierarchy": [], "anchor_len": 0}
    survivors = dedupe_by_subsumption(list(freq_map))
    survivor_set = set(survivors)
    # absorb dropped duplicates' counts into their isomorphic survivor
    for pat, freq in freq_map.items():
        if pat in survivor_set:
            continue
        pg = graph_of(pat)
        for s in survivors:
            if len(s[0]) == len(pat[0]) and len(s[1]) == len(pat[1]):
                if get_subisomorphisms(pg, graph_of(s), limit=1):
                    freq_map[s] = freq_map.get(s, 0) + freq
                    break
    ordered = sort_patterns(survivors)
    return {
        "patterns": ordered,
        "freqs": [freq_map[p] for p in ordered],
        "hierarchy": build_hierarchy(ordered),
        "anchor_len": 0,
    }


def patterns_to_df(spark, mined: dict[str, dict]) -> DataFrame:
    """Materialize the mined pattern dictionary as a D7 DataFrame (for the
    snapshot layer and .lg-style golden exports)."""
    rows = []
    for rel, info in mined.items():
        for pat, freq in zip(info["patterns"], info["freqs"]):
            rows.append(
                {
                    "relation": rel,
                    "pos_tags": list(pat[0]),
                    "edges": [{"u": u, "elabel": el, "v": v} for u, el, v in pat[1]],
                    "freq": int(freq),
                }
            )
    from .schemas import PATTERNS

    return spark.createDataFrame(rows, schema=PATTERNS)


def write_lg(mined: dict[str, dict], rel: str) -> str:
    """Serialize one relation's patterns in the gSpan ``.lg`` text layout the
    reference writes (``pattern_filter.py:95-101``, ``write_patterns``
    pattern_miner.py:321-328) — golden-parity format only."""
    info = mined[rel]
    lines = []
    for pat, freq in zip(info["patterns"], info["freqs"]):
        lines.append("t # %d" % freq)
        for v, p in enumerate(pat[0]):
            lines.append("v %d %s" % (v, p))
        for u, el, v in pat[1]:
            lines.append("e %d %d %s" % (u, v, el))
    return "\n".join(lines) + "\n"


def read_lg(text: str, fuzzy: bool = True) -> list[tuple[Pattern, int]]:
    """Parse ``.lg`` text back into normalized patterns
    (pattern_miner.py:19-104 semantics: punctuation-vertex removal, fuzzy POS
    collapse, edge-label ``:``-truncation)."""
    out: list[tuple[Pattern, int]] = []
    vlabels: list[str] = []
    edges: list[tuple[int, str, int]] = []
    freq = 0

    def flush():
        if vlabels:
            out.append((normalize_pattern(vlabels, edges, fuzzy=fuzzy), freq))

    for line in text.splitlines():
        if line.startswith("t #"):
            flush()
            vlabels, edges = [], []
            freq = int(line.split("#")[1].strip())
        elif line.startswith("v "):
            _, vid, vl = line.split(" ")
            assert int(vid) == len(vlabels)
            vlabels.append(vl)
        elif line.startswith("e "):
            _, u, v, el = line.split(" ")
            edges.append((int(u), el, int(v)))
    flush()
    return out
