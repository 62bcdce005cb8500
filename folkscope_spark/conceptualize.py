"""Conceptualization against a Probase-style concept table (J3/T4/F11).

Spark-first rewrite of ``/root/reference/src/pattern/conceptualizer.py``:

* the instance->concept likelihood table is computed **relationally** —
  ``likelihood = freq / sum(freq) over (partition by instance)``
  (``conceptualizer.py:76-79``) with per-instance top-K dedupe by hyphenated
  concept name (``:506-524``) — then collected (it is a dimension) and shipped
  to executors in the UDF closure;
* the bounded combination search over noun-slot substitutions
  (``:526-566``: subsets of matched nouns x top-K concepts each, score =
  product of likelihoods, heap capped at ``topK**topK``) runs per-eventuality
  inside a ``mapInPandas`` batch — a per-row algorithm, not a relational op;
* seed-rule NER rewrite: mention tokens typed by the gazetteer become
  ``__TYPE__`` placeholder concepts before lookup (``:226-287``, F11);
* cid = sha1(" ".join(words)) per ``object.py:702-711``.
"""

from __future__ import annotations

import hashlib
import heapq
from itertools import combinations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .relations import PRONOUN_SET

DEFAULT_TOPK = 5


def probase_topk(probase: DataFrame, k: int = DEFAULT_TOPK) -> DataFrame:
    """instance -> top-K (concept, likelihood), concepts hyphenated and
    deduped by surface form (J3 + W2)."""
    w_inst = Window.partitionBy("instance")
    w_rank = Window.partitionBy("instance").orderBy(
        F.desc("likelihood"), F.asc("concept")
    )
    return (
        probase.withColumn("likelihood", F.col("freq") / F.sum("freq").over(w_inst))
        .withColumn("concept", F.regexp_replace("concept", " ", "-"))
        .dropDuplicates(["instance", "concept"])
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("instance", "concept", "likelihood")
    )


def collect_topk_map(topk: DataFrame) -> dict[str, list[tuple[str, float]]]:
    out: dict[str, list[tuple[str, float]]] = {}
    for r in topk.collect():
        out.setdefault(r["instance"], []).append((r["concept"], float(r["likelihood"])))
    for v in out.values():
        v.sort(key=lambda x: (-x[1], x[0]))
    return out


def cid_of(words: list[str]) -> str:
    """sha1 of the space-joined concept words (object.py:702-711)."""
    return hashlib.sha1(" ".join(words).encode("utf-8")).hexdigest()


def seed_rule_words(words: list[str], pos_tags: list[str], ners) -> list[str]:
    """NER/pronoun placeholder rewrite (conceptualizer.py:226-287, light):
    typed tokens -> __TYPE__k, personal pronouns -> __PERSON__k."""
    out = list(words)
    counter: dict[str, int] = {}
    for i, w in enumerate(words):
        typ = None
        if ners is not None and i < len(ners) and ners[i] not in (None, "O"):
            typ = ners[i]
        elif w in PRONOUN_SET and not pos_tags[i].startswith("VB"):
            typ = "PERSON"
        if typ:
            k = counter.get(typ, 0)
            counter[typ] = k + 1
            out[i] = "__%s__%d" % (typ, k)
    return out


def probase_concepts(
    words: list[str],
    pos_tags: list[str],
    topk_map: dict[str, list[tuple[str, float]]],
    top_k: int = DEFAULT_TOPK,
) -> list[tuple[list[str], float]]:
    """Bounded combination search (conceptualizer.py:494-566 port): for every
    non-empty subset of concept-matched nouns, substitute each with one of its
    top-K concepts; keep the ``topK**topK`` best by product score with the
    reference's early-stop heuristic.  Returns [(concept_words, score)] desc."""
    word2indices: dict[str, list[int]] = {}
    for idx, w in enumerate(words):
        word2indices.setdefault(w, []).append(idx)

    word2concepts: dict[str, list[tuple[str, float]]] = {}
    for i, tag in enumerate(pos_tags):
        if i >= len(words):
            break
        w = words[i]
        if not tag.startswith("NN") or not w or not w[0].islower():
            continue
        if w.startswith("__") or w in PRONOUN_SET or w in word2concepts:
            continue
        concepts = topk_map.get(w)
        if concepts:
            word2concepts[w] = concepts[:top_k]

    if not word2concepts:
        return []

    matched = list(word2concepts.keys())
    max_len = top_k**top_k
    heap: list[tuple[float, list[str]]] = []
    pre_min_score, min_score = 1.0, -1.0
    pre_comb_len, comb_len = 0, 1
    for size in range(1, len(matched) + 1):
        stop = False
        for word_tuple in combinations(matched, size):
            cand: list[tuple[float, list[str]]] = [(1.0, list(words))]
            for w in word_tuple:
                nxt = []
                for prob, tmp in cand:
                    for concept, c_prob in word2concepts[w]:
                        t2 = tmp[:]
                        for idx in word2indices[w]:
                            t2[idx] = concept
                        nxt.append((prob * c_prob, t2))
                cand = nxt
            for tmp in cand:
                if len(heap) >= max_len:
                    tmp = heapq.heappushpop(heap, tmp)
                else:
                    heapq.heappush(heap, tmp)
                if min_score < tmp[0]:
                    min_score = tmp[0]
            comb_len = len(word_tuple)
            if (
                pre_min_score == min_score
                and pre_comb_len + 1 < comb_len
                and len(heap) >= max_len
            ):
                stop = True
                break
            if pre_min_score != min_score:
                pre_min_score = min_score
                pre_comb_len = comb_len
        if stop:
            break

    ordered = [heapq.heappop(heap) for _ in range(len(heap))][::-1]
    return [(ws, score) for score, ws in ordered]


def probase_concepts_with_phrases(
    words: list[str],
    pos_tags: list[str],
    dependencies,
    topk_map: dict[str, list[tuple[str, float]]],
    top_k: int = DEFAULT_TOPK,
) -> list[tuple[list[str], float]]:
    """Word-level pass + compound-phrase second pass, merged by descending
    score with surface dedupe capped at topK**topK — the two-pointer merge of
    conceptualizer.py:456-484; phrase segmentation per F10."""
    from .eventuality import dep_compound_segment

    strs1 = probase_concepts(words, pos_tags, topk_map, top_k)
    strs2: list[tuple[list[str], float]] = []
    if dependencies:
        segments = dep_compound_segment(
            [tuple(d) for d in dependencies], len(words)
        )
        if any(len(s) > 1 for s in segments):
            phrase_words = [" ".join(words[min(s): max(s) + 1]) for s in segments]
            phrase_pos = [pos_tags[s[0]] for s in segments]
            strs2 = probase_concepts(phrase_words, phrase_pos, topk_map, top_k)

    if not strs2:
        return strs1
    max_len = top_k**top_k
    used: set[str] = set()
    out: list[tuple[list[str], float]] = []
    p1 = p2 = 0
    while p1 < len(strs1) and p2 < len(strs2) and len(used) < max_len:
        if strs1[p1][1] > strs2[p2][1]:
            cand = strs1[p1]
            p1 += 1
        else:
            cand = strs2[p2]
            p2 += 1
        key = " ".join(cand[0])
        if key not in used:
            used.add(key)
            out.append(cand)
    for rest, ptr in ((strs1, p1), (strs2, p2)):
        for cand in rest[ptr:]:
            if len(used) >= max_len:
                break
            key = " ".join(cand[0])
            if key not in used:
                used.add(key)
                out.append(cand)
    return out


def conceptualize(
    events: DataFrame,
    topk_map: dict[str, list[tuple[str, float]]],
    top_k: int = DEFAULT_TOPK,
) -> DataFrame:
    """eventualities (merged D8) -> concept-instance rows
    (cid, concept_words, eid, pattern, score, frequency)."""

    schema = (
        "cid string, eid string, relation string, concept_text string, "
        "pattern string, score double, frequency double"
    )

    def dominant_ner(counters) -> list | None:
        """Most-frequent non-O label per position (object.py:496-506)."""
        if counters is None:
            return None
        out = []
        for c in counters:
            best = "O"
            if c:
                for label, cnt in sorted(c.items(), key=lambda kv: (-kv[1], kv[0])):
                    if label != "O":
                        best = label
                        break
                else:
                    best = "O"
                if all(k == "O" for k in c):
                    best = "O"
            out.append(best)
        return out

    def run(batches):
        for pdf in batches:
            rows = []
            has_counters = "ner_counters" in pdf.columns
            ner_src = pdf["ner_counters"] if has_counters else [None] * len(pdf)
            dep_src = pdf["dependencies"] if "dependencies" in pdf.columns else [None] * len(pdf)
            pat_src = pdf["pattern_sig"] if "pattern_sig" in pdf.columns else [None] * len(pdf)
            for eid, rel, words, pos_tags, ners, deps, pat, freq in zip(
                pdf["eid"], pdf["relation"], pdf["words"], pdf["pos_tags"],
                ner_src, dep_src, pat_src, pdf["frequency"],
            ):
                words = list(words)
                pos_tags = list(pos_tags)
                if has_counters:
                    ners = dominant_ner(ners)
                seeded = seed_rule_words(words, pos_tags, ners)
                dep_triples = (
                    [(d["gov"], d["rel"], d["dep"]) for d in deps]
                    if deps is not None
                    else None
                )
                for cw, score in probase_concepts_with_phrases(
                    seeded, pos_tags, dep_triples, topk_map, top_k
                ):
                    rows.append(
                        {
                            "cid": cid_of(cw),
                            "eid": eid,
                            "relation": rel,
                            "concept_text": " ".join(cw),
                            "pattern": pat,
                            "score": float(score),
                            "frequency": float(freq),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["cid", "eid", "relation", "concept_text", "pattern", "score", "frequency"],
            )

    cols = [
        c
        for c in (
            "eid", "relation", "words", "pos_tags", "ner_counters",
            "dependencies", "pattern_sig", "frequency",
        )
        if c in events.columns
    ]
    return events.select(cols).mapInPandas(run, schema=schema)


def aggregate_concepts(concept_rows: DataFrame) -> DataFrame:
    """A4 (conceptualizer.py:649-663): cid score = sum(score * frequency);
    collect the instance list per concept; A7 (object.py:713-719): dominant
    pattern = most frequent pattern label among instances (mode via
    count + rank-1 window, W1)."""
    agg = concept_rows.groupBy("cid").agg(
        F.first("concept_text").alias("concept_text"),
        F.sum(F.col("score") * F.col("frequency")).alias("cscore"),
        F.collect_list(F.struct("eid", "score")).alias("instances"),
    )
    pat_counts = concept_rows.groupBy("cid", "pattern").agg(
        F.sum("frequency").alias("pfreq")
    )
    w = Window.partitionBy("cid").orderBy(F.desc("pfreq"), F.asc("pattern"))
    dominant = (
        pat_counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("cid", F.col("pattern").alias("dominant_pattern"))
    )
    return agg.join(dominant, "cid", "left")
