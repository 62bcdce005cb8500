"""Round-6 optimization guard: thin-content parse output (parity mode).

``parse_assertions(thin_content=True)`` emits the content array columns once
per content key per batch (null elsewhere); the match and mining kernels
reconstruct null rows from their per-task content dicts.  These tests pin
result-identity against the unthinned path, end to end.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from folkscope_spark.session import get_spark

    s = get_spark(app="thin-tests", master="local[4]", shuffle_partitions=8)
    yield s


def _chain(spark, thin: bool, n_pages=150, n_items=40):
    from folkscope_spark import generate, parse, score, synthetic

    pages = synthetic.pages_df(spark, n_pages, n_items)
    items = synthetic.items_df(spark, n_items)
    templates = generate.template_table(spark)
    prompts = generate.build_prompts(
        generate.pairs_from_pages(pages), items, templates
    )
    assertions = generate.explode_assertions(
        generate.generate_assertions(prompts), templates, items
    )
    scored = score.score_assertions(assertions).select(
        "item_a", "item_b", "relation", "seq_no", "tail", "plausibility",
        "typicality",
    )
    return parse.parse_assertions(
        scored, dedupe=False, slim=True, thin_content=thin
    ).cache()


def test_thin_content_match_and_mine_identical(spark):
    from folkscope_spark.match import match_patterns, merge_eventualities
    from folkscope_spark.patterns import count_anchored_patterns, finish_patterns

    thick = _chain(spark, thin=False)
    thin = _chain(spark, thin=True)

    # same row keys either way; thin output carries nulls only in content cols
    assert thick.count() == thin.count()
    n_null = thin.filter(F.col("pos_tags").isNull()).count()
    assert n_null > 0, "thin mode emitted no thinned rows on a duplicated corpus"
    assert thick.filter(F.col("pos_tags").isNull()).count() == 0

    counts_a = count_anchored_patterns(thick, max_extra=2)
    counts_b = count_anchored_patterns(thin, max_extra=2, pre_dedupe=True)
    rows_a = {(r["relation"], r["sig"], r["size"]): r["count"] for r in counts_a.collect()}
    rows_b = {(r["relation"], r["sig"], r["size"]): r["count"] for r in counts_b.collect()}
    assert rows_a == rows_b

    sent_counts = {
        r["relation"]: int(r["n"])
        for r in thick.groupBy("relation").agg(F.sum("weight").alias("n")).collect()
    }
    mined = finish_patterns(counts_a, sent_counts)
    assert mined, "mining produced no patterns - fixture too small"

    ev_a = merge_eventualities(match_patterns(thick, mined))
    # thin side exercises the broadcast extraction tier (the pipeline's
    # parity configuration)
    ev_b = merge_eventualities(
        match_patterns(thin, mined, precompute="broadcast")
    )
    a = {
        (r["eid"], r["relation"], r["frequency"], r["n_sentences"],
         tuple(r["words"]), r["pattern_sig"])
        for r in ev_a.collect()
    }
    b = {
        (r["eid"], r["relation"], r["frequency"], r["n_sentences"],
         tuple(r["words"]), r["pattern_sig"])
        for r in ev_b.collect()
    }
    assert a == b


def test_thin_content_requires_slim(spark):
    from folkscope_spark import parse

    with pytest.raises(ValueError):
        parse.parse_assertions(None, dedupe=False, slim=False, thin_content=True)
