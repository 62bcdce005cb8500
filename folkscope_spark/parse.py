"""parse_light — the deterministic parser stage (SURVEY.md §2.10).

Replaces the reference's port-sharded CoreNLP HTTP servers
(``/root/reference/src/pattern/generation_parser.py:152-164``,
``utils.py:217-299``) with the pure-Python kernel in :mod:`folkscope_spark.nlp`
run inside ``mapInPandas`` — each Arrow batch is parsed in-process, so
parallelism is Spark partitions instead of worker pools, and there is no
socket boundary.

Output schema is D6 (:data:`folkscope_spark.schemas.PARSED`), with
``sid = "{item_a}-{relation}-{item_b}|{row}"`` per
``generation_parser.py:137``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .nlp import parse_sentence
from .schemas import PARSED
from .textnorm import clean_text


def parse_assertions(assertions: DataFrame) -> DataFrame:
    """assertions(tail,...) -> parsed rows (one per assertion tail).

    The cleaner runs first inside the same UDF (byte-contract P6); empty or
    unparsable rows are dropped (validity guard P13,
    pattern_filter.py:65).
    """

    def run(batches):
        for pdf in batches:
            rows = []
            for item_a, item_b, rel, seq_no, tail in zip(
                pdf["item_a"], pdf["item_b"], pdf["relation"], pdf["seq_no"], pdf["tail"]
            ):
                cleaned = clean_text(tail)
                if not cleaned:
                    continue
                parsed = parse_sentence(cleaned)
                if not parsed["dependencies"]:
                    continue
                rows.append(
                    {
                        "sid": "%s-%s-%s|%d" % (item_a, rel, item_b, seq_no),
                        "relation": rel,
                        "text": parsed["text"],
                        "tokens": parsed["tokens"],
                        "pos_tags": parsed["pos_tags"],
                        "lemmas": parsed["lemmas"],
                        "ners": parsed["ners"],
                        "dependencies": [
                            {"gov": g, "rel": r, "dep": d}
                            for g, r, d in parsed["dependencies"]
                        ],
                        "mentions": parsed["mentions"],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "sid", "relation", "text", "tokens", "pos_tags",
                    "lemmas", "ners", "dependencies", "mentions",
                ],
            )

    return assertions.select(
        "item_a", "item_b", "relation", "seq_no", "tail"
    ).mapInPandas(run, schema=PARSED)


def clean_pages(pages: DataFrame) -> DataFrame:
    """pages -> (url, cleaned_text): the byte-contract extraction over the raw
    page text (per-url invariant of BASELINE.json)."""

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {"url": pdf["url"], "cleaned_text": [clean_text(t or "") for t in pdf["text"]]}
            )

    return pages.select("url", "text").mapInPandas(
        run, schema="url string, cleaned_text string"
    )
