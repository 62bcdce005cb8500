"""Literal single-process transcription of the reference match semantics.

This module is the *independent* oracle for the matcher kernel: a direct,
line-by-line transcription of

* ``/root/reference/src/pattern/pattern_match.py:63-236`` (the sequential
  match sweep: structural sort, subsumption dedupe, hierarchy, per-line flag
  state, separator veto, OPTIONAL closure, eventuality assembly, per-line eid
  dedupe, template/example selection, canonical-pattern guards, flag update),
* ``/root/reference/src/pattern/object.py:360-418,614-683,120-130``
  (``Eventuality._construct``, position reset, eid byte contract),
* ``/root/reference/src/pattern/pattern_miner.py:223-318`` (prefix/MUST/
  connect guards, ``construct_pattern``),
* the node/edge compatibility rules of
  ``/root/reference/src/pattern/pattern_retriever.py:28-60`` over igraph's
  induced VF2 search — re-implemented here as a *plain brute-force
  backtracking enumeration* (no shared code or search heuristics with
  ``folkscope_spark.graphs``).

It intentionally preserves reference quirks:

* the OPTIONAL-closure condition ``(dep[2] not in subiso_set or dep[2] not in
  optional_indices)`` (pattern_match.py:131) — an ``or`` that admits subiso
  vertices with OPTIONAL POS into the optional set, which changes
  ``selected_edges`` through the third selection branch;
* the separator veto as a pairwise ``(idx1-sep)*(idx2-sep) <= 0`` product
  test (pattern_match.py:105-118);
* the per-line flag state: only lines whose flag still equals the initial
  value are VF2-matched (pattern_match.py:88) — extraction is effectively
  first-matching-pattern-wins per line;
* ``check_match_with_must`` compares dependency *edge labels* against the
  POS-tag set {IN, CC, TO} (pattern_miner.py:233-253) — observationally a
  no-op with CoreNLP-style labels, transcribed anyway.

It must NOT import anything from ``folkscope_spark`` — that is the point
(VERDICT round 1, item 2).
"""

from __future__ import annotations

import hashlib
import json
from itertools import combinations

# --- constants transcribed from /root/reference/src/pattern/utils.py:8-35 ---

TEMPLATES = {
    "open": ("", ""),
    "relatedTo": ("they both are related to", "PRP DT VBP JJ TO"),
    "isA": ("they both are a type of", "PRP DT VBP DT NN IN"),
    "partOf": ("they both are a part of", "PRP DT VBP DT NN IN"),
    "madeOf": ("they both are made of", "PRP DT VBP VBN IN"),
    "similarTo": ("they both are similar to", "PRP DT VBP JJ TO"),
    "createdBy": ("they are created by", "PRP VBP VBN IN"),
    "hasA": ("they both have", "PRP DT VBP"),
    "propertOf": ("they both have a property of", "PRP DT VBP DT NN IN"),
    "propertyOf": ("they both have a property of", "PRP DT VBP DT NN IN"),
    "distinctFrom": ("they are distinct from", "PRP VBP JJ IN"),
    "usedFor": ("they are both used for", "PRP VBP DT VBN IN"),
    "can": ("they could both", "PRP MD CC"),
    "capableOf": ("they both are capable of", "PRP DT VBP JJ IN"),
    "definedAs": ("they both are defined as", "PRP DT VBP VBN IN"),
    "symbolOf": ("they both are symbols of", "PRP DT VBP NNS IN"),
    "mannerOf": ("they both are a manner of", "PRP DT VBP DT NN IN"),
    "deriveFrom": ("they are derived from", "PRP VBP VBN IN"),
    "effect": ("the person will", "DT NN MD"),
    "cause": ("the person wants to", "DT NN VBZ TO"),
    "motivatedBy": ("buying them was motivated by", "VBG PRP VBD VBN IN"),
    "causeEffect": ("the person wants his", "DT NN VBZ PRP$"),
}

MUST_POS_TAGS = frozenset(["IN", "CC", "TO"])
OPTIONAL_POS_TAGS = frozenset(["JJ", "JJR", "JJS", "RB", "RBR", "RBS", "DT", "PRP$"])
FORBIDDED_END_POS_TAGS = frozenset(["IN", "CC", "TO"])


# ---------------------------------------------------------------- graphs
# A "graph" here is just (pos_tags: list[str], deps: list[(gov, label, dept)]).
# Subisomorphism enumeration: naive backtracking in natural pattern-vertex
# order with full pairwise induced/label checks — deliberately the dumbest
# correct search, independent of folkscope_spark.graphs.


def _indegrees(n, deps):
    ind = [0] * n
    for _, _, d in deps:
        ind[d] += 1
    return ind


def _pair_label_index(deps, base=False):
    idx: dict[tuple[int, int], list[str]] = {}
    for g, el, d in deps:
        idx.setdefault((g, d), []).append(el.split(":")[0] if base else el)
    return idx


def _node_ok(g_pos, p_pos, g_ind, p_ind, gv, pv):
    # pattern_retriever.py:28-40
    if g_ind[gv] < p_ind[pv]:
        return False
    vl2 = p_pos[pv]
    vl1 = g_pos[gv]
    if vl2 in ("NN", "RB", "JJ"):
        return vl1.startswith(vl2)
    return vl1 == vl2


def get_subisomorphisms(graph, pattern):
    """All injective mappings m (m[pattern_v] = graph_v) such that the mapped
    pattern is an induced labeled sub-multigraph of the graph: every pattern
    edge's ``:``-truncated label set must be covered between the mapped pair
    (pattern_retriever.py:42-60) and pairs with no pattern edge must have no
    graph edge (igraph VF2 induced semantics).  Sorted for determinism."""
    g_pos, g_deps = graph
    p_pos, p_deps = pattern
    n, p = len(g_pos), len(p_pos)
    if p > n:
        return []
    g_ind = _indegrees(n, g_deps)
    p_ind = _indegrees(p, p_deps)
    g_pairs = _pair_label_index(g_deps, base=True)
    p_pairs = _pair_label_index(p_deps, base=False)

    results = []
    assign = [-1] * p
    used = [False] * n

    def ok_with_assigned(pv, gv):
        for qv in range(p):
            hv = assign[qv]
            if hv < 0:
                continue
            for (a, b), (ga, gb) in (((pv, qv), (gv, hv)), ((qv, pv), (hv, gv))):
                plabels = p_pairs.get((a, b))
                glabels = g_pairs.get((ga, gb))
                if plabels:
                    if glabels is None:
                        return False
                    gset = set(glabels)
                    for el in plabels:
                        if el.split(":")[0] not in gset:
                            return False
                else:
                    if glabels:  # induced: no extra graph edge allowed
                        return False
        return True

    def rec(pv):
        if pv == p:
            results.append(list(assign))
            return
        for gv in range(n):
            if used[gv]:
                continue
            if not _node_ok(g_pos, p_pos, g_ind, p_ind, gv, pv):
                continue
            if not ok_with_assigned(pv, gv):
                continue
            assign[pv] = gv
            used[gv] = True
            rec(pv + 1)
            used[gv] = False
            assign[pv] = -1

    rec(0)
    results.sort()
    return results


# ------------------------------------------------------ pattern helpers
# transcriptions of pattern_miner.py:223-318


def check_match_with_prefix(match, prefix_len):
    reverse = sorted(match)
    i = 1
    while i < prefix_len:
        if reverse[i] - reverse[i - 1] != 1:
            return False
        i += 1
    return True


def check_match_with_must(match, graph):
    match = set(match)
    for e in graph[1]:
        if e[0] in match and e[2] not in match and e[1] in MUST_POS_TAGS:
            return False
        if e[0] not in match and e[2] in match and e[1] in MUST_POS_TAGS:
            return False
    return True


def check_connect(pattern):
    # pattern_miner.py:256-302 (tuple form, via the igraph branch's rules)
    pos_tags, edges = pattern
    n = len(pos_tags)
    if len(edges) < n - 1:
        return False
    indeg = [0] * n
    und: dict[int, set] = {i: set() for i in range(n)}
    for g, el, d in edges:
        if el == "parataxis":
            return False
        indeg[d] += 1
        und[g].add(d)
        und[d].add(g)
    for vid, tag in enumerate(pos_tags):
        if (tag == "CC" or tag == "WRB" or tag.startswith("WP")) and indeg[vid] == 0:
            return False
    if n == 0:
        return False
    seen = {0}
    stack = [0]
    while stack:
        x = stack.pop()
        for y in und[x]:
            if y not in seen:
                seen.add(y)
                stack.append(y)
    return len(seen) == n


def construct_pattern(pattern, match):
    # pattern_miner.py:308-318: reorder pattern vertices into sentence order
    inv_match = sorted(range(len(match)), key=lambda i: match[i])
    new_match = sorted(range(len(inv_match)), key=lambda i: inv_match[i])
    pos_tags = pattern[0]
    new_pos_tags = [pos_tags[i] for i in inv_match]
    new_deps = []
    for src, rel, dst in pattern[1]:
        new_deps.append((new_match[src], rel, new_match[dst]))
    new_deps.sort(key=lambda x: (x[0], x[2]))
    return (tuple(new_pos_tags), tuple(new_deps))


def build_hierarchy(patterns):
    # pattern_miner.py:364-403
    hierarchy = [{"parents": [], "children": []} for _ in range(len(patterns))]
    lens = [len(p[0]) for p in patterns]
    indices = sorted(range(len(patterns)), key=lambda i: lens[i])
    i = 0
    while i < len(indices):
        pi = indices[i]
        m = len(patterns[pi][0])
        n_e = len(patterns[pi][1])
        j = i + 1
        while j < len(indices):
            pj = indices[j]
            mm = len(patterns[pj][0])
            if mm > m + 1:
                break
            nn = len(patterns[pj][1])
            if nn < n_e:
                j += 1
                continue
            if get_subisomorphisms(patterns[pj], patterns[pi]):
                hierarchy[pi]["parents"].append(pj)
                hierarchy[pj]["children"].append(pi)
            j += 1
        i += 1
    return hierarchy


# --------------------------------------------------------- eventuality
# transcription of object.py:614-683,360-418,120-130


def extract_indices_from_dependencies(dependencies):
    word_positions = set()
    for governor_pos, _, dependent_pos in dependencies:
        word_positions.add(governor_pos)
        word_positions.add(dependent_pos)
    return list(sorted(word_positions))


def sort_dependencies_position(dependencies, reset_position=True):
    tmp_dependencies = set()
    for triplet in dependencies:
        tmp_dependencies.add(tuple(triplet))
    new_dependencies = list()
    if reset_position:
        positions = set()
        for governor, _, dependent in tmp_dependencies:
            positions.add(governor)
            positions.add(dependent)
        positions = sorted(positions)
        position_map = dict(zip(positions, range(len(positions))))
        for governor, dep, dependent in tmp_dependencies:
            new_dependencies.append((position_map[governor], dep, position_map[dependent]))
        new_dependencies.sort(key=lambda x: (x[0], x[2]))
        return new_dependencies, position_map, {v: k for k, v in position_map.items()}
    else:
        return sorted(tmp_dependencies, key=lambda x: (x[0], x[2])), None, None


def construct_eventuality(dependencies, skeleton_dependencies, parsed_result):
    """Eventuality._construct (object.py:360-418) as a dict; returns the
    fields the match sweep's ``to_dict`` output carries.  Literal: when the
    leading-IN pop empties the edge list, the reference still builds an
    (empty-words) eventuality — no guard here either."""
    dependencies = [tuple(t) for t in dependencies]
    skeleton_dependencies = [tuple(t) for t in skeleton_dependencies]
    word_indices = extract_indices_from_dependencies(dependencies)
    if parsed_result["pos_tags"][word_indices[0]] == "IN":
        poped_idx = word_indices[0]
        for i in range(len(dependencies) - 1, -1, -1):
            if dependencies[i][0] == poped_idx or dependencies[i][2] == poped_idx:
                dependencies.pop(i)
        for i in range(len(skeleton_dependencies) - 1, -1, -1):
            if skeleton_dependencies[i][0] == poped_idx or skeleton_dependencies[i][2] == poped_idx:
                skeleton_dependencies.pop(i)
        word_indices.pop(0)

    words = [parsed_result["lemmas"][i].lower() for i in word_indices]
    pos_tags = [parsed_result["pos_tags"][i] for i in word_indices]

    reset_deps, raw2reset, _ = sort_dependencies_position(dependencies, True)

    skeleton_word_indices = extract_indices_from_dependencies(skeleton_dependencies)
    skeleton_indices = [raw2reset[idx] for idx in skeleton_word_indices]

    _skeleton_deps, _, _ = sort_dependencies_position(skeleton_dependencies, False)
    skeleton_dependency_indices = []
    ptr = 0
    for i, dep in enumerate(reset_deps):
        if ptr >= len(_skeleton_deps):
            break
        sk = _skeleton_deps[ptr]
        sk = (raw2reset[sk[0]], sk[1], raw2reset[sk[2]])
        if dep == sk:
            skeleton_dependency_indices.append(i)
            ptr += 1

    verb_indices = [i for i, tag in enumerate(pos_tags) if tag.startswith("VB")]

    # eid = sha1(json.dumps([rendered_deps, words, pos_tags])) with the
    # ((idx, word, tag), rel, (idx, word, tag)) rendering (object.py:120-130,
    # 486-494); json default separators
    rendered = [
        (
            (g, words[g], pos_tags[g]), rel,
            (d, words[d], pos_tags[d]),
        )
        for g, rel, d in reset_deps
    ]
    eid = hashlib.sha1(
        json.dumps([rendered, words, pos_tags]).encode("utf-8")
    ).hexdigest()

    return {
        "eid": eid,
        "words": words,
        "pos_tags": pos_tags,
        "dependencies": reset_deps,
        "skeleton_indices": skeleton_indices,
        "skeleton_dependency_indices": skeleton_dependency_indices,
        "verb_indices": verb_indices,
    }


# -------------------------------------------------------- the match sweep
# transcription of pattern_match.py:23-236 (__main__ body as a function)


def dedupe_and_sort_patterns(patterns):
    """pattern_match.py:32-48: structural desc sort + subsumption dedupe."""
    patterns = sorted(
        patterns, key=lambda x: (len(x[1]), len(x[0]), x[0], x[1]), reverse=True
    )
    duplicate_indices = set()
    for i in range(len(patterns)):
        if i in duplicate_indices:
            continue
        for j in range(i + 1, len(patterns)):
            if j in duplicate_indices:
                continue
            if get_subisomorphisms(patterns[j], patterns[i]):
                duplicate_indices.add(j)
    patterns = [p for idx, p in enumerate(patterns) if idx not in duplicate_indices]
    patterns.sort(key=lambda x: (len(x[1]), len(x[0]), x[0], x[1]), reverse=True)
    return patterns


def match_corpus(lines, raw_patterns):
    """Run the full sequential sweep.  ``lines`` are parsed dicts with keys
    sid, pos_tags, lemmas, dependencies (gov, label, dept triples);
    ``raw_patterns`` are (pos_tags tuple, deps tuple) pairs.  Mutates each
    line: adds ``eventualities`` (list of dicts with the canonical ``pattern``
    tuple attached).  Returns the lines.

    Single-relation corpora only (asserted): the reference invokes the sweep
    per relation file (scripts/run_match.sh), and its template-fallback and
    freq-pattern blocks read loop-stale ``rel_len1``/``parsed_g`` variables
    (pattern_match.py:175-198) that are only well-defined under that usage —
    we evaluate them with the line-local values, which coincide there."""
    rels = {line["sid"].split("-")[-2] for line in lines}
    assert len(rels) <= 1, "reference sweep runs per relation file: %s" % rels
    patterns = dedupe_and_sort_patterns(raw_patterns)
    pattern_hierarchy = build_hierarchy(patterns)

    for line in lines:
        line["eventualities"] = []
        line["graph"] = (list(line["pos_tags"]), [tuple(t) for t in line["dependencies"]])

    N = len(lines)
    init_flag = 1 << len(patterns)
    pattern_match_flag = [init_flag] * len(lines)
    pattern_ctr = [0] * len(patterns)

    for pattern_idx, pattern in enumerate(patterns):
        flag = 1 << pattern_idx

        template = None
        example = None
        current_indices = list()
        example_subiso = None

        for line_idx, line in enumerate(lines):
            rel = line["sid"].split("-")[-2]
            rel_len1 = len(TEMPLATES[rel][1].split())

            if pattern_match_flag[line_idx] & flag != 0:
                current_indices.append(line_idx)
                pattern_ctr[pattern_idx] += 1

            elif pattern_match_flag[line_idx] ^ init_flag == 0 and len(
                line["pos_tags"]
            ) >= len(pattern[0]) and len(line["dependencies"]) >= len(pattern[1]):
                parsed_g = line["graph"]
                subisos = get_subisomorphisms(parsed_g, pattern)

                sep_indices = []
                for pos_tag_idx, pos_tag in enumerate(line["pos_tags"]):
                    if pos_tag == "WRB" or pos_tag.startswith("WP"):
                        sep_indices.append(pos_tag_idx)
                    elif pos_tag in [";", ".", "?", "!"]:
                        sep_indices.append(pos_tag_idx)
                for subiso in subisos:
                    match_failed = False
                    for sep_idx in sep_indices:
                        for idx1 in subiso:
                            for idx2 in subiso:
                                if idx1 == idx2:
                                    continue
                                if (idx1 - sep_idx) * (idx2 - sep_idx) <= 0:
                                    match_failed = True
                                    break
                            if match_failed:
                                break
                        if match_failed:
                            break
                    if match_failed:
                        continue

                    current_indices.append(line_idx)
                    pattern_ctr[pattern_idx] += 1

                    subiso_set = set(subiso)
                    optional_indices = set()
                    optional_cnt = -1
                    # NB: the (not-in or not-in) condition is the reference's
                    # exact text (pattern_match.py:130-133)
                    while len(optional_indices) != optional_cnt:
                        optional_cnt = len(optional_indices)
                        for dep in line["dependencies"]:
                            if (dep[0] in subiso_set or dep[0] in optional_indices) and \
                            (dep[2] not in subiso_set or dep[2] not in optional_indices) and \
                            line["pos_tags"][dep[2]] in OPTIONAL_POS_TAGS:
                                optional_indices.add(dep[2])

                    selected_edges = list()
                    skeleton_dependencies = list()
                    for dep in line["dependencies"]:
                        if dep[0] in subiso_set and dep[2] in subiso_set:
                            selected_edges.append(dep)
                            skeleton_dependencies.append(dep)
                        elif dep[0] in subiso_set and dep[2] in optional_indices:
                            selected_edges.append(dep)
                        elif dep[0] in optional_indices and dep[2] in optional_indices:
                            selected_edges.append(dep)

                    eventuality = construct_eventuality(
                        selected_edges, skeleton_dependencies, line
                    )
                    if eventuality is not None:
                        eventuality["pattern"] = construct_pattern(pattern, subiso)
                        duplicated = False
                        eidx = len(line["eventualities"]) - 1
                        while eidx >= 0:
                            if line["eventualities"][eidx]["eid"] == eventuality["eid"]:
                                duplicated = True
                                break
                            eidx -= 1
                        if not duplicated:
                            line["eventualities"].append(eventuality)

                    if template is None:
                        template = [pattern[0][i] for i in _argsort(subiso)]
                        example = line
                        example_subiso = subiso
                    elif len(line["pos_tags"]) < len(example["pos_tags"]):
                        template = [pattern[0][i] for i in _argsort(subiso)]
                        example = line
                        example_subiso = subiso
                    elif len(line["pos_tags"]) == len(example["pos_tags"]) and sum(
                        subiso
                    ) / len(subiso) < (len(example["pos_tags"]) - 1) / 2:
                        template = [pattern[0][i] for i in _argsort(subiso)]
                        example = line
                        example_subiso = subiso

        if template is None and len(current_indices) > 0:
            # pattern_match.py:174-184 (bitmask-carried lines; parsed_g is the
            # loop-stale last graph, transcribed as-is)
            for line_idx in sorted(current_indices, key=lambda li: len(lines[li]["pos_tags"])):
                line = lines[line_idx]
                rel = line["sid"].split("-")[-2]
                rel_len1 = len(TEMPLATES[rel][1].split())
                subisos = get_subisomorphisms(line["graph"], pattern)
                for subiso in subisos:
                    if check_match_with_prefix(subiso, rel_len1) and check_match_with_must(
                        subiso, line["graph"]
                    ):
                        template = [pattern[0][i] for i in _argsort(subiso)]
                        example = line
                        break
                if template is not None:
                    break

        if template is None:  # invalid pattern
            pattern_ctr[pattern_idx] = 0
            continue

        freq_pattern = None
        rel = example["sid"].split("-")[-2]
        rel_len1 = len(TEMPLATES[rel][1].split())
        parsed_g = (list(example["pos_tags"]), [tuple(t) for t in example["dependencies"]])
        subisos = get_subisomorphisms(parsed_g, pattern)
        for subiso in subisos:
            if check_match_with_prefix(subiso, rel_len1) and check_match_with_must(subiso, parsed_g):
                freq_pattern = construct_pattern(pattern, subiso)
                if freq_pattern[0][-1] not in FORBIDDED_END_POS_TAGS and check_connect(freq_pattern):
                    break
                else:
                    freq_pattern = None

        if freq_pattern is None:
            pattern_ctr[pattern_idx] = 0
            continue

        for child_idx in pattern_hierarchy[pattern_idx]["children"]:
            flag |= 1 << child_idx
        for line_idx in current_indices:
            pattern_match_flag[line_idx] |= flag

    for line in lines:
        line.pop("graph")
    return lines


def _argsort(xs):
    return sorted(range(len(xs)), key=lambda i: xs[i])
