"""Eventuality construction — the eid byte-contract (SURVEY.md D8).

Ports the *semantics* of the reference Eventuality object
(``/root/reference/src/pattern/object.py:86-418``) as pure functions over
plain lists/dicts so they run identically inside Arrow-batched UDFs and unit
tests.  The eid is ``sha1(json.dumps([rendered_deps, words, pos_tags]))``
(``object.py:120-130``) where ``rendered_deps`` is the nested
``((idx, word, tag), rel, (idx, word, tag))`` form (``object.py:486-494``) —
the json byte layout (default ``", "``/``": "`` separators, tuples as arrays)
is reproduced exactly by building the same Python lists and calling
``json.dumps`` with defaults.
"""

from __future__ import annotations

import hashlib
import json

Dep = tuple[int, str, int]


def extract_indices_from_dependencies(dependencies: list[Dep]) -> list[int]:
    """Sorted distinct node ids appearing in the edges (object.py:657-683)."""
    positions = set()
    for gov, _, dep in dependencies:
        positions.add(gov)
        positions.add(dep)
    return sorted(positions)


def sort_dependencies_position(
    dependencies: list[Dep], reset_position: bool = True
):
    """Renumber node ids densely to 0..n-1 and sort by (gov, dep)
    (object.py:614-655).  Doctest oracle from the reference:
    ``[(8,"cop",7),(8,"nsubj",6)] -> [(2,'nsubj',0),(2,'cop',1)]``.
    """
    uniq = {tuple(t) for t in dependencies}
    if not reset_position:
        return sorted(uniq, key=lambda x: (x[0], x[2])), None, None
    positions = sorted({p for g, _, d in uniq for p in (g, d)})
    fwd = {p: i for i, p in enumerate(positions)}
    new = sorted(
        [(fwd[g], r, fwd[d]) for g, r, d in uniq], key=lambda x: (x[0], x[2])
    )
    return new, fwd, {v: k for k, v in fwd.items()}


def render_dependencies(
    dependencies: list[Dep], words: list[str], pos_tags: list[str]
):
    """((idx, word, tag), rel, (idx, word, tag)) rendering (object.py:486-494)."""
    return [
        ((g, words[g], pos_tags[g]), r, (d, words[d], pos_tags[d]))
        for g, r, d in dependencies
    ]


def generate_eid(dependencies: list[Dep], words: list[str], pos_tags: list[str]) -> str:
    """sha1 over the exact json byte layout of the reference (object.py:120-130)."""
    rendered = render_dependencies(dependencies, words, pos_tags)
    msg = json.dumps([rendered, words, pos_tags])
    return hashlib.sha1(msg.encode("utf-8")).hexdigest()


def dep_compound_segment(
    dependencies: list[Dep], n_words: int
) -> list[tuple[int, ...]]:
    """F10 — merge ``compound*`` dependency chains into contiguous phrase
    spans (object.py:508-576, duplicated conceptualizer.py:568-636).
    Returns one tuple of word indices per segment, in word order; singleton
    tuples for non-compound words."""
    tmp = sorted(
        (g, d) for g, rel, d in dependencies if rel.startswith("compound")
    )
    merged: list[tuple[int, ...]] = []
    used: set[int] = set()
    for i in range(len(tmp)):
        if i in used:
            continue
        s1 = tmp[i]
        for j in range(i + 1, len(tmp)):
            if j in used:
                continue
            s2 = tmp[j]
            if s2[0] in set(s1[1:]):
                s1 = s1 + s2[1:]
                used.add(j)
            elif s1[0] in set(s2[1:]):
                s1 = s2 + s1[1:]
                used.add(j)
            elif s1[0] == s2[0]:
                s1 = s1 + s2[1:]
                used.add(j)
            else:
                break
        used.add(i)
        srt = sorted(s1)
        if srt[-1] - srt[0] == len(srt) - 1:
            merged.append(s1)
        else:
            # split non-contiguous runs (object.py:544-558)
            k1, k2 = 0, 1
            idx = {v: p for p, v in enumerate(s1)}
            while k2 < len(srt):
                if srt[k2 - 1] + 1 != srt[k2]:
                    merged.append(tuple(s1[idx[srt[k]]] for k in range(k1, k2)))
                    k1 = k2
                k2 += 1
            if k1 != k2:
                merged.append(tuple(s1[idx[srt[k]]] for k in range(k1, k2)))

    in_compound = {i for t in merged for i in t}
    merged_by_start = {min(t): t for t in merged}
    out: list[tuple[int, ...]] = []
    w = 0
    while w < n_words:
        if w not in in_compound:
            out.append((w,))
        elif w in merged_by_start:
            out.append(merged_by_start[w])
        w += 1
    return out


def build_eventuality(
    dependencies: list[Dep],
    skeleton_dependencies: list[Dep],
    parsed_result: dict,
) -> dict | None:
    """Port of ``Eventuality._construct`` (object.py:360-418).

    Returns a plain dict: eid, words (lowercased lemmas), pos_tags,
    dependencies (position-reset), skeleton_indices, skeleton_dependency_indices,
    verb_indices, raw2reset mapping — or None for empty input.
    """
    dependencies = [tuple(t) for t in dependencies]
    skeleton_dependencies = [tuple(t) for t in skeleton_dependencies]
    word_indices = extract_indices_from_dependencies(dependencies)
    if not word_indices:
        return None
    # drop a leading IN head (object.py:362-370)
    if parsed_result["pos_tags"][word_indices[0]] == "IN":
        popped = word_indices[0]
        dependencies = [t for t in dependencies if t[0] != popped and t[2] != popped]
        skeleton_dependencies = [
            t for t in skeleton_dependencies if t[0] != popped and t[2] != popped
        ]
        word_indices = word_indices[1:]
        if not word_indices or not dependencies:
            return None

    words = [parsed_result["lemmas"][i].lower() for i in word_indices]
    pos_tags = [parsed_result["pos_tags"][i] for i in word_indices]
    ners = (
        [parsed_result["ners"][i] for i in word_indices]
        if parsed_result.get("ners")
        else None
    )

    reset_deps, raw2reset, reset2raw = sort_dependencies_position(
        dependencies, reset_position=True
    )

    skeleton_word_indices = extract_indices_from_dependencies(skeleton_dependencies)
    skeleton_indices = [raw2reset[i] for i in skeleton_word_indices if i in raw2reset]

    sorted_skel, _, _ = sort_dependencies_position(
        skeleton_dependencies, reset_position=False
    )
    skeleton_dependency_indices = []
    ptr = 0
    for i, dep in enumerate(reset_deps):
        if ptr >= len(sorted_skel):
            break
        sk = sorted_skel[ptr]
        if sk[0] in raw2reset and sk[2] in raw2reset:
            sk = (raw2reset[sk[0]], sk[1], raw2reset[sk[2]])
            if dep == sk:
                skeleton_dependency_indices.append(i)
                ptr += 1
        else:
            ptr += 1

    verb_indices = [i for i, tag in enumerate(pos_tags) if tag.startswith("VB")]

    return {
        "eid": generate_eid(reset_deps, words, pos_tags),
        "words": words,
        "pos_tags": pos_tags,
        "ners": ners,
        "dependencies": reset_deps,
        "skeleton_indices": skeleton_indices,
        "skeleton_dependency_indices": skeleton_dependency_indices,
        "verb_indices": verb_indices,
        "raw_sent_mapping": reset2raw,
        "frequency": 1.0,
    }
