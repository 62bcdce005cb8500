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
