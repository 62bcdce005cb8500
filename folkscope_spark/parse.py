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

from pyspark.sql import types as T

from .metrics import batch_timer
from .nlp import parse_sentence
from .schemas import PARSED
from .textnorm import clean_text

# PARSED + corpus-multiplicity weight (dedupe-aware parsing)
PARSED_W = T.StructType(
    PARSED.fields[:2]
    + [T.StructField("weight", T.DoubleType())]
    + PARSED.fields[2:]
)

# Per-worker memo for parse_sentence: a pure function of the cleaned text,
# and web corpora repeat identical continuations heavily — in the
# reference-parity (no global dedupe) configuration the same tail recurs
# tens to hundreds of times per partition (guide §1.2 step 2).  Bounded; on
# overflow it keeps serving hits and stops inserting.  Values are read-only
# parse dicts shared across rows.
_PARSE_MEMO: dict[str, dict] = {}
_PARSE_MEMO_CAP = 150_000


def _parse_cached(cleaned: str) -> dict:
    p = _PARSE_MEMO.get(cleaned)
    if p is None:
        p = parse_sentence(cleaned)
        if len(_PARSE_MEMO) < _PARSE_MEMO_CAP:
            _PARSE_MEMO[cleaned] = p
    return p


def parse_assertions(
    assertions: DataFrame, dedupe: bool = True, slim: bool = False,
    skip_words=None, kernel_acc=None,
) -> DataFrame:
    """assertions(tail,...) -> parsed rows.

    The cleaner runs first inside the same UDF (byte-contract P6); empty or
    unparsable rows are dropped (validity guard P13, pattern_filter.py:65).

    ``skip_words`` applies P8 (extractor.py:337-339,393-395): a sentence is
    dropped when its raw token set intersects the skip set — the reference's
    exact check (``set(tokens) & skip_words``, case-sensitive).  Default None
    mirrors the reference default (empty set — opt-in).

    ``dedupe=True`` (default) parses each **distinct** (relation, tail) once
    and carries ``weight`` = corpus multiplicity — at web scale identical LLM
    continuations are common, so this cuts the hottest Python kernel by the
    duplication factor while keeping corpus-frequency semantics exact
    (downstream counts sum the weight; results re-attach to assertion rows by
    ``sid = md5(relation || tail)``).  ``dedupe=False`` reproduces the
    reference's one-parse-per-row behavior with
    ``sid = "{a}-{rel}-{b}|{seq}"`` (generation_parser.py:137).
    """

    if dedupe:
        src = (
            assertions.groupBy("relation", "tail")
            .count()
            .select(
                F.md5(F.concat_ws("\x1f", "relation", "tail")).alias("sid"),
                "relation",
                "tail",
                F.col("count").cast("double").alias("weight"),
            )
        )
    else:
        src = assertions.select(
            F.concat_ws(
                "|",
                F.concat_ws("-", "item_a", "relation", "item_b"),
                F.col("seq_no"),
            ).alias("sid"),
            "relation",
            "tail",
            F.lit(1.0).alias("weight"),
        )

    # slim mode drops columns the matcher never reads (tokens, mentions,
    # text): at web scale the Arrow transfer + cache of the parsed table is
    # the dominant non-scaling cost, and these are its fattest columns.
    if slim:
        out_cols = ["sid", "relation", "weight", "pos_tags", "lemmas", "ners",
                    "dependencies"]
    else:
        out_cols = ["sid", "relation", "weight", "text", "tokens", "pos_tags",
                    "lemmas", "ners", "dependencies", "mentions"]
    schema = T.StructType([f for f in PARSED_W.fields if f.name in out_cols])

    skip = frozenset(skip_words) if skip_words else None

    def run(batches):
        for pdf in batches:
            # the timed block covers decoded-batch compute only; the yield is
            # outside so suspended time (Arrow encode/decode) never counts
            with batch_timer(kernel_acc):
                rows = []
                for sid, rel, tail, weight in zip(
                    pdf["sid"], pdf["relation"], pdf["tail"], pdf["weight"]
                ):
                    cleaned = clean_text(tail)
                    if not cleaned:
                        continue
                    parsed = _parse_cached(cleaned)
                    if not parsed["dependencies"]:
                        continue
                    if skip and set(parsed["tokens"]) & skip:
                        continue  # P8 (extractor.py:393-395)
                    row = {
                        "sid": sid,
                        "relation": rel,
                        "weight": weight,
                        "pos_tags": parsed["pos_tags"],
                        "lemmas": parsed["lemmas"],
                        "ners": parsed["ners"],
                        "dependencies": [
                            {"gov": g, "rel": r, "dep": d}
                            for g, r, d in parsed["dependencies"]
                        ],
                    }
                    if not slim:
                        row["text"] = parsed["text"]
                        row["tokens"] = parsed["tokens"]
                        row["mentions"] = parsed["mentions"]
                    rows.append(row)
                out = pd.DataFrame(rows, columns=out_cols)
            yield out

    return src.mapInPandas(run, schema=schema)


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
