"""Price the reference's start_index unit bug e2e (VERDICT r4 next #7).

The reference masks each eventuality's template prefix before
conceptualization with ``len(TEMPLATES[rel][1])`` — the **character** length
of the POS template string (``conceptualizer.py:703``), where the documented
intent (``src/pattern/README.md:104``) is the **token** count.  The graft
defaults to the intended token count and keeps ``start_index_mode="chars"``
as the reference-parity flag (SURVEY.md §3.4).

This tool turns the documented flag into a measured output delta: one
pipeline run per mode on the identical corpus (same pages, same Probase,
same everything but the masking index), then an exact-set diff of the
conceptualization output and the conceptualized KG variant.  Prints one JSON
line; the numbers land in BASELINE.md.

``chars`` masks *more* tokens than ``tokens`` whenever a template's POS
string is longer in characters than the eventuality has words — shifting
which nouns are conceptualization-eligible for essentially every
eventuality.  Measured at 5k pages (2026-08-17, local[8]): tokens-mode
2,869 aggregated concepts / 306,741 concept triples vs chars-mode 7,363 /
192,061, with only 321 concepts and 25,670 triples shared — an ~8-13%
overlap.  The unit bug is not a cosmetic flag; it rewrites the concept KG.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def leg(spark, pages: int, mode: str) -> dict:
    from pyspark.sql import functions as F

    from folkscope_spark.pipeline import run_pipeline

    t0 = time.time()
    r = run_pipeline(
        spark, out_dir=None, n_pages=pages, n_items=max(50, pages // 17),
        with_concepts=True, with_canonicalize=False, max_extra=1,
        start_index_mode=mode,
    )
    rows = r["concepts"].select("cid", "concept_text")  # aggregated concepts
    ct = r["concept_triples"].select("subj", "pred", "obj")
    out = {
        "mode": mode,
        "concept_rows": r["concepts"].count(),
        "concept_triples": ct.count(),
        "wall_s": round(time.time() - t0, 2),
        # keyed sets for the exact diff (small at tool scale)
        "_concept_set": {(x["cid"], x["concept_text"]) for x in rows.collect()},
        "_triple_set": {(x["subj"], x["pred"], x["obj"]) for x in ct.collect()},
    }
    spark.catalog.clearCache()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--pages", type=int, default=5000)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEM", "8g")
    from folkscope_spark.session import get_spark

    spark = get_spark(
        app="chars-mode-delta", master=args.master, shuffle_partitions=24,
        extra={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("OFF")

    tokens = leg(spark, args.pages, "tokens")
    chars = leg(spark, args.pages, "chars")

    cset_t, cset_c = tokens.pop("_concept_set"), chars.pop("_concept_set")
    tset_t, tset_c = tokens.pop("_triple_set"), chars.pop("_triple_set")
    print(
        json.dumps(
            {
                "pages": args.pages,
                "tokens": tokens,
                "chars": chars,
                "delta": {
                    "concepts_only_in_tokens": len(cset_t - cset_c),
                    "concepts_only_in_chars": len(cset_c - cset_t),
                    "concepts_shared": len(cset_t & cset_c),
                    "concept_triples_only_in_tokens": len(tset_t - tset_c),
                    "concept_triples_only_in_chars": len(tset_c - tset_t),
                    "concept_triples_shared": len(tset_t & tset_c),
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
