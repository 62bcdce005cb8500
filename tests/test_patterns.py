"""Pattern-mining kernel tests (O3 anchored enumeration, S7 .lg codec)."""

from folkscope_spark.nlp import parse_sentence
from folkscope_spark.patterns import (
    anchor_lens,
    enumerate_anchored,
    pattern_sig,
    read_lg,
    sig_to_pattern,
)


def test_anchor_lens_match_templates():
    lens = anchor_lens()
    assert lens["capableOf"] == 5  # "they both are capable of"
    assert lens["hasA"] == 3
    assert lens["open"] == 0


def test_enumerate_contains_anchor():
    p = parse_sentence("they both are capable of keeping the feet warm")
    pats = enumerate_anchored(p["pos_tags"], p["dependencies"], 5, max_extra=2)
    assert pats, "no anchored subgraphs found"
    # every pattern includes the anchor POS prefix (fuzzy-collapsed)
    for pos_tags, edges in pats:
        assert len(pos_tags) >= 5
        assert pos_tags[:3] == ("PRP", "DT", "VBP")


def test_enumerate_weights_and_dedup():
    p = parse_sentence("they both are capable of keeping the feet warm")
    a = enumerate_anchored(p["pos_tags"], p["dependencies"], 5, max_extra=2)
    assert len(a) == len(set(a))  # no duplicate canonical patterns


def test_sig_roundtrip():
    p = parse_sentence("they both are capable of keeping the feet warm")
    for pat in enumerate_anchored(p["pos_tags"], p["dependencies"], 5, max_extra=1):
        assert sig_to_pattern(pattern_sig(pat)) == pat


def test_lg_codec_roundtrip():
    """.lg write/read with the reference's normalization quirks
    (pattern_miner.py:19-104): fuzzy POS collapse, punctuation-vertex removal,
    edge-label truncation at ':'."""
    text = (
        "t # 7\n"
        "v 0 PRP\n"
        "v 1 NNS\n"       # fuzzy -> NN
        "v 2 ,\n"          # punctuation vertex -> removed
        "v 3 JJR\n"        # fuzzy -> JJ
        "e 3 0 nsubj:pass\n"   # label truncated at ':'
        "e 3 1 obl:of\n"
        "e 3 2 punct\n"    # edge touching removed vertex dropped
    )
    pats = read_lg(text, fuzzy=True)
    assert len(pats) == 1
    (pos_tags, edges), freq = pats[0]
    assert freq == 7
    assert pos_tags == ("PRP", "NN", "JJ")
    assert edges == ((2, "nsubj", 0), (2, "obl", 1))


def test_lg_multiple_transactions():
    text = (
        "t # 3\nv 0 PRP\nv 1 JJ\ne 1 0 nsubj\n"
        "t # 2\nv 0 DT\nv 1 NN\ne 1 0 det\n"
    )
    pats = read_lg(text)
    assert [f for _, f in pats] == [3, 2]
    assert pats[0][0][0] == ("PRP", "JJ")
    assert pats[1][0][0] == ("DT", "NN")


def test_enumerate_skeletonizes_optional_variants():
    """Skeletonization (pattern_miner.py:461 via :107-160): OPTIONAL/IGNORE
    vertices outside the template prefix are dropped before counting, so
    optional-modifier variants collapse into one signature."""
    # anchor: PRP DT VBP (3 tokens); extras: a JJ modifier (OPTIONAL) and an
    # NN object (kept)
    pos = ["PRP", "DT", "VBP", "JJ", "NN"]
    deps = [(2, "nsubj", 0), (2, "det", 1), (2, "obj", 4), (4, "amod", 3)]
    with_skel = enumerate_anchored(pos, deps, 3, max_extra=2)
    without = enumerate_anchored(pos, deps, 3, max_extra=2, skeletonize=False)
    # the JJ never appears in any skeletonized pattern
    assert all("JJ" not in p[0] for p in with_skel)
    assert any("JJ" in p[0] for p in without)
    # variants {anchor+JJ} and {anchor} collapse to the same skeleton
    assert len(with_skel) < len(without)
    # template-prefix vertices are always kept even when OPTIONAL-tagged (DT)
    assert all("DT" in p[0] for p in with_skel)


def test_finish_patterns_cut_is_relational():
    """The N*1e-4 cut runs executor-side before collect (VERDICT r1 wrong #1):
    a wide unique-signature tail never reaches the driver."""
    from folkscope_spark.session import get_spark
    from folkscope_spark.patterns import finish_patterns, pattern_sig
    from pyspark.sql import functions as F

    spark = get_spark(app="t", master="local[4]", shuffle_partitions=4)
    # 50k unique below-cut signatures + 2 frequent survivors
    tail = spark.range(50_000).select(
        F.lit("capableOf").alias("relation"),
        F.concat(
            F.lit('[["PRP","DT","VBP","X'), F.col("id").cast("string"),
            F.lit('"],[[2,"nsubj",0],[2,"det",1]]]'),
        ).alias("sig"),
        F.lit(1).cast("long").alias("count"),
    )
    keep1 = pattern_sig((("PRP", "DT", "VBP"), ((2, "nsubj", 0), (2, "det", 1))))
    keep2 = pattern_sig(
        (("PRP", "DT", "VBP", "NN"), ((2, "nsubj", 0), (2, "det", 1), (2, "obj", 3)))
    )
    head = spark.createDataFrame(
        [("capableOf", keep1, 500), ("capableOf", keep2, 400)],
        "relation string, sig string, count long",
    )
    mined = finish_patterns(tail.union(head), {"capableOf": 10_000}, min_freq_ratio=1e-4, min_freq_abs=2)
    pats = mined["capableOf"]["patterns"]
    # only the two frequent signatures survive the executor-side cut (the
    # pinned needle-direction quirk means subsumption dedupe only removes
    # same-size isomorphic duplicates, so both remain), sorted desc
    assert len(pats) == 2
    assert mined["capableOf"]["freqs"] == [400, 500]


def test_adaptive_schedule_dense_cdf():
    """Transcription check of pattern_filter.py:119-153 on a dense length
    distribution (hand-computed): bands exist for sizes n+1..ceil(avg)-1,
    floors decay with the log window mass, ceilings are 0.97 of the
    containable mass."""
    import math
    from folkscope_spark.patterns import adaptive_schedule

    # 1000 sentences, lengths 4..19 uniform (dense CDF), anchor 5
    len_counts = [(l, 62) for l in range(4, 20)]  # plus remainder on 19
    len_counts[-1] = (19, 62 + 1000 - 62 * 16)
    N = sum(c for _, c in len_counts)
    sched = adaptive_schedule(len_counts, 5)
    assert sched, "dense CDF must produce a schedule"
    avg = sum(l * c for l, c in len_counts) / N
    assert all(5 < size < math.ceil(avg) for size in sched)
    # hand-check the first band: min_node=6, delta=1
    cum1 = sum(c for l, c in len_counts if l <= 5)      # leftmost(5) on dense
    cum2 = sum(c for l, c in len_counts if l <= 6)      # leftmost(6)
    min_th = math.log(1 + (cum2 - cum1) / N) * 0.1
    assert sched[6] == (int((N - cum1) * min_th), int((N - cum1) * 0.97))
    # floors are monotone enough to terminate
    assert len(sched) <= math.ceil(avg) - 6 + 1


def test_adaptive_schedule_sparse_cdf_is_empty():
    """With only a couple of distinct lengths the reference's leftmost()
    window has zero mass and the walk exits immediately — pinned behavior
    (the synthetic corpus is deliberately regular)."""
    from folkscope_spark.patterns import adaptive_schedule

    assert adaptive_schedule([(8, 428), (9, 229)], 5) == {}


def test_finish_patterns_with_schedule_bands():
    """Per-(relation, size) band cut + early stop applied executor-side."""
    from folkscope_spark.session import get_spark
    from folkscope_spark.patterns import finish_patterns, pattern_sig

    spark = get_spark(app="t", master="local[4]", shuffle_partitions=4)
    p_small = pattern_sig((("PRP", "DT", "VBP"), ((2, "nsubj", 0), (2, "det", 1))))
    p_big = pattern_sig(
        (("PRP", "DT", "VBP", "NN"), ((2, "nsubj", 0), (2, "det", 1), (2, "obj", 3)))
    )
    rows = [
        ("capableOf", p_small, 6, 500),   # in band for size 6
        ("capableOf", p_big, 7, 40),      # below size-7 floor -> cut
        ("capableOf", p_big, 6, 2000),    # above size-6 ceiling -> cut
    ]
    pc = spark.createDataFrame(rows, "relation string, sig string, size int, count long")
    sched = {"capableOf": {6: (100, 1000), 7: (100, 1000)}}
    mined = finish_patterns(pc, {"capableOf": 10_000}, schedules=sched)
    pats = mined["capableOf"]["patterns"]
    assert len(pats) == 1 and len(pats[0][0]) == 3
    assert mined["capableOf"]["freqs"] == [500]


def test_finish_patterns_early_stop_is_cumulative():
    """The reference's early_stop counter (pattern_filter.py:192-200) never
    resets: empty / non-empty / empty kills every later size.  A non-empty
    size after the second cumulative empty must be discarded."""
    from folkscope_spark.session import get_spark
    from folkscope_spark.patterns import finish_patterns, pattern_sig

    spark = get_spark(app="t", master="local[4]", shuffle_partitions=4)
    p5 = pattern_sig((("PRP", "DT", "VBP"), ((2, "nsubj", 0), (2, "det", 1))))
    p7 = pattern_sig(
        (("PRP", "DT", "VBP", "NN"), ((2, "nsubj", 0), (2, "det", 1), (2, "obj", 3)))
    )
    rows = [
        ("capableOf", p5, 5, 500),   # size 4 empty, size 5 populated
        ("capableOf", p7, 7, 500),   # size 6 empty again -> 7 must drop
    ]
    pc = spark.createDataFrame(rows, "relation string, sig string, size int, count long")
    sched = {"capableOf": {s: (100, 1000) for s in (4, 5, 6, 7)}}
    mined = finish_patterns(pc, {"capableOf": 10_000}, schedules=sched)
    pats = mined["capableOf"]["patterns"]
    assert len(pats) == 1 and len(pats[0][0]) == 3  # only the size-5 pattern
