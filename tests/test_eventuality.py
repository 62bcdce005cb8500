"""eid byte-contract + position-reset oracle tests (SURVEY.md §5.2 #1)."""

import hashlib
import json

from folkscope_spark.eventuality import (
    build_eventuality,
    extract_indices_from_dependencies,
    generate_eid,
    sort_dependencies_position,
)


def test_position_reset_doctest_oracle():
    # worked example from the reference docstring (object.py:625-634)
    deps, fwd, rev = sort_dependencies_position([(8, "cop", 7), (8, "nsubj", 6)])
    assert deps == [(2, "nsubj", 0), (2, "cop", 1)]
    assert fwd == {6: 0, 7: 1, 8: 2}
    assert rev == {0: 6, 1: 7, 2: 8}


def test_extract_indices_doctest_oracle():
    # object.py:666-676
    assert extract_indices_from_dependencies([(8, "cop", 7), (8, "nsubj", 6)]) == [6, 7, 8]


def test_eid_json_byte_layout():
    """eid = sha1 of json.dumps([rendered_deps, words, pos_tags]) with default
    separators and tuples rendered as arrays (object.py:120-130,486-494)."""
    deps = [(2, "nsubj", 0), (2, "cop", 1)]
    words = ["they", "be", "good"]
    pos = ["PRP", "VBP", "JJ"]
    rendered = [
        [[2, "good", "JJ"], "nsubj", [0, "they", "PRP"]],
        [[2, "good", "JJ"], "cop", [1, "be", "VBP"]],
    ]
    expect = hashlib.sha1(json.dumps([rendered, words, pos]).encode("utf-8")).hexdigest()
    assert generate_eid(deps, words, pos) == expect


def test_build_eventuality_basic():
    parsed = {
        "lemmas": ["they", "be", "good", "for", "Running"],
        "pos_tags": ["PRP", "VBP", "JJ", "IN", "NN"],
        "ners": ["O", "O", "O", "O", "O"],
    }
    deps = [(2, "nsubj", 0), (2, "cop", 1), (2, "obl:for", 4), (4, "case", 3)]
    skeleton = [(2, "nsubj", 0), (2, "cop", 1)]
    ev = build_eventuality(deps, skeleton, parsed)
    assert ev is not None
    assert ev["words"] == ["they", "be", "good", "for", "running"]  # lowercased lemmas
    assert ev["pos_tags"] == ["PRP", "VBP", "JJ", "IN", "NN"]
    assert ev["dependencies"] == [(2, "nsubj", 0), (2, "cop", 1), (2, "obl:for", 4), (4, "case", 3)]
    assert ev["skeleton_indices"] == [0, 1, 2]
    assert ev["skeleton_dependency_indices"] == [0, 1]
    assert ev["verb_indices"] == [1]
    assert len(ev["eid"]) == 40


def test_build_eventuality_drops_leading_in_head():
    # object.py:362-370: a leading IN word is popped along with its edges
    parsed = {
        "lemmas": ["for", "running", "shoe"],
        "pos_tags": ["IN", "VBG", "NN"],
        "ners": ["O", "O", "O"],
    }
    deps = [(1, "case", 0), (1, "obj", 2)]
    ev = build_eventuality(deps, [(1, "obj", 2)], parsed)
    assert ev["words"] == ["running", "shoe"]
    assert ev["dependencies"] == [(0, "obj", 1)]


def test_same_content_same_eid_distinct_content_distinct():
    parsed = {"lemmas": ["a", "b"], "pos_tags": ["DT", "NN"], "ners": None}
    e1 = build_eventuality([(1, "det", 0)], [(1, "det", 0)], parsed)
    e2 = build_eventuality([(1, "det", 0)], [(1, "det", 0)], parsed)
    assert e1["eid"] == e2["eid"]
    parsed2 = {"lemmas": ["a", "c"], "pos_tags": ["DT", "NN"], "ners": None}
    e3 = build_eventuality([(1, "det", 0)], [(1, "det", 0)], parsed2)
    assert e3["eid"] != e1["eid"]


def test_dep_compound_segment():
    from folkscope_spark.eventuality import dep_compound_segment

    # "leather wallet case" chain: compound(2,0), compound(2,1)
    deps = [(2, "compound", 0), (2, "compound", 1), (3, "obj", 2)]
    segs = dep_compound_segment(deps, 4)
    assert segs == [(2, 0, 1), (3,)]

    # no compounds: singletons
    assert dep_compound_segment([(1, "det", 0)], 2) == [(0,), (1,)]
