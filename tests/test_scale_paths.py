"""Scale-path correctness: zipWithIndex dictionary, contracting CC,
binned PR sweep, relational NER-counter merge (VERDICT r1 'weak' items)."""

import pytest
from pyspark.sql import functions as F

from folkscope_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark(app="scale-t", master="local[4]", shuffle_partitions=4)


def test_build_dictionary_is_global_rank(spark):
    """Two-pass block assignment must equal row_number-over-order-by ranks."""
    from folkscope_spark.dictionary import build_dictionary

    keys = ["k%03d" % i for i in range(257)]
    import random

    rng = random.Random(7)
    rng.shuffle(keys)
    df = spark.createDataFrame([(k,) for k in keys for _ in (0, 1)], "key string")
    out = {r["key"]: r["id"] for r in build_dictionary(df, "key", n_partitions=8).collect()}
    expected = {k: i for i, k in enumerate(sorted(set(keys)))}
    assert out == expected


def test_connected_components_long_chain_distributed(spark):
    """A descending-id chain is the contraction worst case: pointer halving
    must converge well inside max_iter (O(log n)), labels exact."""
    from folkscope_spark.canonicalize import connected_components

    n = 200
    rows = [("n%04d" % (i + 1), "n%04d" % i) for i in range(n)]  # chain n0..n200
    edges = spark.createDataFrame(rows, "id_a string, id_b string")
    comps = connected_components(edges, max_iter=12, driver_threshold=0)
    got = {r["id"]: r["comp"] for r in comps.collect()}
    assert set(got.values()) == {"n0000"}
    assert len(got) == n + 1


def test_connected_components_multiple_clusters_distributed(spark):
    from folkscope_spark.canonicalize import connected_components

    rows = [("a1", "a2"), ("a2", "a3"), ("b1", "b2"), ("c1", "c9"), ("c9", "c5")]
    edges = spark.createDataFrame(rows, "id_a string, id_b string")
    got = {r["id"]: r["comp"] for r in connected_components(edges, driver_threshold=0).collect()}
    assert got == {
        "a1": "a1", "a2": "a1", "a3": "a1",
        "b1": "b1", "b2": "b1",
        "c1": "c1", "c9": "c1", "c5": "c1",
    }


def test_pr_curve_binned_matches_exact_at_bin_edges(spark):
    """With scores exactly on bin edges the binned sweep reproduces the exact
    per-row sweep's cumulative counts."""
    from folkscope_spark.score import pr_curve, pr_curve_binned

    rows = [(i / 10.0, "v" if i % 2 else "i") for i in range(10)]
    df = spark.createDataFrame(rows, "plausibility double, label string")
    binned = {r["threshold"]: (r["n_kept"], r["n_pos"]) for r in pr_curve_binned(df, n_bins=10).collect()}
    exact = pr_curve(df).select("plausibility", "n_kept", "n_pos").collect()
    for r in exact:
        assert binned[r["plausibility"]] == (r["n_kept"], r["n_pos"])


def test_select_threshold_uses_binned_curve(spark):
    from folkscope_spark.score import select_threshold

    rows = [(0.9, "v"), (0.8, "v"), (0.7, "i"), (0.6, "v"), (0.2, "i")]
    df = spark.createDataFrame(rows, "plausibility double, label string")
    ts = select_threshold(df, min_precision=0.75, n_bins=10)
    assert ts == pytest.approx(0.6)  # 3/4 kept at 0.6 -> precision 0.75


def test_merge_eventualities_relational_ner_counters(spark):
    """posexplode + sum + map reassembly == the old per-row Counter merge."""
    from folkscope_spark.match import merge_eventualities

    rows = [
        ("e1", "capableOf", "p", ["keep", "foot"], ["VB", "NN"],
         [], [0, 1], [0], ["O", "PERSON"], 2.0, "s1"),
        ("e1", "capableOf", "p", ["keep", "foot"], ["VB", "NN"],
         [], [0, 1], [0], ["O", "CITY"], 3.0, "s2"),
        ("e2", "capableOf", "p", ["run"], ["VB"],
         [], [0], [0], ["O"], 1.0, "s3"),
    ]
    schema = (
        "eid string, relation string, pattern_sig string, words array<string>, "
        "pos_tags array<string>, dependencies array<struct<gov:int,rel:string,dep:int>>, "
        "skeleton_indices array<int>, verb_indices array<int>, ners array<string>, "
        "frequency double, sid string"
    )
    df = spark.createDataFrame(rows, schema)
    out = {r["eid"]: r for r in merge_eventualities(df).collect()}
    e1 = out["e1"]
    assert e1["frequency"] == 5.0 and e1["n_sentences"] == 2
    assert e1["ner_counters"][0] == {"O": 5.0}
    assert e1["ner_counters"][1] == {"PERSON": 2.0, "CITY": 3.0}
    assert out["e2"]["ner_counters"] == [{"O": 1.0}]


def test_merge_skew_eid_many_variants(spark):
    """A hot eid with many NER variants merges without any per-row blowup:
    the result row is bounded by positions x labels."""
    from folkscope_spark.match import merge_eventualities

    labels = ["O", "PERSON", "CITY", "DATE"]
    rows = [
        ("hot", "capableOf", "p", ["a", "b"], ["NN", "NN"], [], [0], [0],
         ["O", labels[i % 4]], 1.0, "s%d" % i)
        for i in range(5000)
    ]
    schema = (
        "eid string, relation string, pattern_sig string, words array<string>, "
        "pos_tags array<string>, dependencies array<struct<gov:int,rel:string,dep:int>>, "
        "skeleton_indices array<int>, verb_indices array<int>, ners array<string>, "
        "frequency double, sid string"
    )
    df = spark.createDataFrame(rows, schema).repartition(4)
    out = merge_eventualities(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["frequency"] == 5000.0
    assert r["ner_counters"][0] == {"O": 5000.0}
    assert sum(r["ner_counters"][1].values()) == 5000.0
    assert set(r["ner_counters"][1]) == set(labels)


def test_skew_aware_join_equals_plain_join(spark):
    """Hot/cold split join == plain inner join, with the hot slice resolved
    through the broadcast sub-dictionary."""
    from folkscope_spark.dictionary import detect_hot_keys, skew_aware_join

    facts = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("k%d" % i, i) for i in range(50)],
        "key string, v int",
    )
    dim = spark.createDataFrame(
        [("hot", 0)] + [("k%d" % i, i + 1) for i in range(50)],
        "key string, id int",
    )
    hot = detect_hot_keys(facts, "key", threshold_ratio=0.5)
    assert [r["key"] for r in hot.collect()] == ["hot"]
    got = skew_aware_join(facts, dim, "key", hot_keys=hot)
    plain = facts.join(dim, "key")
    assert got.count() == plain.count() == 550
    diff = got.exceptAll(plain).count() + plain.exceptAll(got).count()
    assert diff == 0


def test_export_kg_tensors_skew_path_matches_broadcast(spark):
    """The skew-aware entity join (forced via threshold 0) produces the same
    facts tensor as the broadcast path."""
    from folkscope_spark.features import export_kg_tensors

    t = spark.createDataFrame(
        [("s%d" % (i % 5), "p%d" % (i % 2), "o%d" % (i % 7), 0.5) for i in range(200)],
        "subj string, pred string, obj string, score double",
    )
    a = export_kg_tensors(t)["facts"]
    b = export_kg_tensors(t, broadcast_entities_below=0)["facts"]
    assert a.exceptAll(b).count() + b.exceptAll(a).count() == 0


def test_match_fat_thinning_keyed_by_relation_and_eid(spark):
    """ADVICE r2 (high): eids are relation-independent (sha1 over deps/words/
    pos only), but merge_eventualities groups by (eid, relation).  When one
    sentence is extracted under two relations inside a single partition, BOTH
    (eid, relation) groups must receive a non-null fat row — thinning keyed by
    eid alone left the second relation's group all-null, and
    first(ignorenulls) propagated nulls into conceptualize."""
    from folkscope_spark.match import match_patterns, merge_eventualities

    pat = (("NN", "VBP"), ((1, "nsubj", 0),))
    mined = {
        rel: {"patterns": [pat], "hierarchy": [{"parents": [], "children": []}]}
        for rel in ("capableOf", "usedFor")
    }
    rows = [
        ("s1", "capableOf", ["NNS", "VBP"], ["dog", "run"], ["O", "O"],
         [{"gov": 1, "rel": "nsubj", "dep": 0}]),
        ("s2", "usedFor", ["NNS", "VBP"], ["dog", "run"], ["O", "O"],
         [{"gov": 1, "rel": "nsubj", "dep": 0}]),
    ]
    schema = (
        "sid string, relation string, pos_tags array<string>, "
        "lemmas array<string>, ners array<string>, "
        "dependencies array<struct<gov:int,rel:string,dep:int>>"
    )
    parsed = spark.createDataFrame(rows, schema).coalesce(1)
    merged = merge_eventualities(match_patterns(parsed, mined)).collect()
    assert len(merged) == 2  # one (eid, relation) group per relation
    assert {r["relation"] for r in merged} == {"capableOf", "usedFor"}
    assert len({r["eid"] for r in merged}) == 1  # same eid, two relations
    for r in merged:
        assert r["pattern_sig"] is not None, r["relation"]
        assert r["pos_tags"] is not None and r["dependencies"] is not None
        assert r["skeleton_indices"] is not None


def test_connected_components_random_graph_matches_union_find(spark):
    """Randomized differential for the distributed CC (star-contraction +
    pointer-halving): a seeded 220-node / 260-edge random graph vs a plain
    union-find oracle.  Compared as PARTITIONS (not labels): the distributed
    algorithm guarantees min-id labels per component, so labels are checked
    against the oracle component's min too."""
    import random

    from folkscope_spark.canonicalize import connected_components

    rng = random.Random(20260818)
    nodes = ["v%03d" % i for i in range(220)]
    rows = []
    seen = set()
    while len(rows) < 260:
        a, b = rng.choice(nodes), rng.choice(nodes)
        if a != b and (a, b) not in seen:
            seen.add((a, b))
            rows.append((a, b))

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    oracle = {}
    for a, b in rows:
        for x in (a, b):
            oracle.setdefault(find(x), set()).add(x)
    want = {min(members): members for members in oracle.values()}

    edges = spark.createDataFrame(rows, "id_a string, id_b string")
    got_rows = connected_components(edges, driver_threshold=0).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["comp"], set()).add(r["id"])
    assert got == want
