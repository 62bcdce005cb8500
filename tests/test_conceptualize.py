"""Conceptualization kernel tests (J3/W2/T4/F11; conceptualizer.py semantics)."""

import pytest

from folkscope_spark.conceptualize import (
    cid_of,
    probase_concepts,
    seed_rule_words,
)


TOPK = {
    "cotton": [("natural-material", 0.6), ("material", 0.4)],
    "runner": [("person", 0.7), ("athlete", 0.3)],
}


def test_single_noun_substitution_scores():
    words = ["the", "cotton"]
    pos = ["DT", "NN"]
    out = probase_concepts(words, pos, TOPK, top_k=5)
    # two single substitutions, ordered by likelihood desc
    assert out[0] == (["the", "natural-material"], 0.6)
    assert out[1] == (["the", "material"], 0.4)


def test_combination_products():
    words = ["cotton", "for", "runner"]
    pos = ["NN", "IN", "NN"]
    out = probase_concepts(words, pos, TOPK, top_k=5)
    scores = {tuple(w): s for w, s in out}
    # pairwise substitution scores are products (conceptualizer.py:537-549)
    assert scores[("natural-material", "for", "person")] == pytest.approx(0.6 * 0.7)
    assert scores[("material", "for", "athlete")] == pytest.approx(0.4 * 0.3)
    # single substitutions also present
    assert ("natural-material", "for", "runner") in scores
    # descending order
    vals = [s for _, s in out]
    assert vals == sorted(vals, reverse=True)


def test_repeated_word_substituted_at_all_positions():
    words = ["cotton", "and", "cotton"]
    pos = ["NN", "CC", "NN"]
    out = probase_concepts(words, pos, TOPK, top_k=5)
    assert (["natural-material", "and", "natural-material"], 0.6) == out[0]


def test_non_noun_and_capitalized_skipped():
    # capitalized words and non-NN tags never hit probase (conceptualizer.py:506)
    out = probase_concepts(["Cotton", "runs"], ["NNP", "VBZ"], TOPK, top_k=5)
    assert out == []


def test_unknown_noun_no_concepts():
    assert probase_concepts(["xyzzy"], ["NN"], TOPK) == []


def test_seed_rule_ner_placeholders():
    words = ["alice", "likes", "it"]
    pos = ["NNP", "VBZ", "PRP"]
    ners = ["PERSON", "O", "O"]
    out = seed_rule_words(words, pos, ners)
    assert out[0] == "__PERSON__0"
    assert out[2] == "__PERSON__1"  # pronoun rewrite
    assert out[1] == "likes"


def test_cid_contract():
    import hashlib

    words = ["natural-material", "for", "person"]
    assert cid_of(words) == hashlib.sha1(" ".join(words).encode("utf-8")).hexdigest()


def test_probase_topk_relational(tmp_path):
    """likelihood = freq/sum(freq) per instance + top-K dedupe by hyphenated
    name (conceptualizer.py:76-79,506-524) computed relationally."""
    from folkscope_spark.session import get_spark
    from folkscope_spark.conceptualize import probase_topk, collect_topk_map

    spark = get_spark(app="t", master="local[2]", shuffle_partitions=2)
    probase = spark.createDataFrame(
        [
            ("natural material", "cotton", 60),
            ("material", "cotton", 40),
            ("fabric source", "cotton", 0),
            ("person", "runner", 7),
            ("athlete", "runner", 3),
        ],
        "concept string, instance string, freq long",
    )
    m = collect_topk_map(probase_topk(probase, k=2))
    assert m["cotton"][0] == ("natural-material", pytest.approx(0.6))
    assert m["cotton"][1] == ("material", pytest.approx(0.4))
    assert len(m["cotton"]) == 2  # top-K cut drops the zero-freq concept
    assert m["runner"][0][0] == "person"
