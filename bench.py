"""Benchmark harness: headline queries + KG pipeline throughput + scaling.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "kg": {"docs_per_sec_local8": ..., "docs_per_sec_local32": ...,
          "scaling_efficiency": ...}}

Scaling evidence (north_rule: >=0.8 efficiency from N to 4N executors): the
same KG-construction job runs at local[8] and local[32] on identical input;
efficiency = (T_8 / T_32) / 4.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
KG_PAGES = int(os.environ.get("BENCH_KG_PAGES", "20000"))
KG_ITEMS = max(50, KG_PAGES // 10)
SKIP_SCALING = os.environ.get("BENCH_SKIP_SCALING", "") == "1"

HEADLINE = [
    "a1_signature_count",
    "j1_broadcast_enrich",
    "w2_topk_per_key",
    "a4_weighted_agg",
    "w1_rank1_mode",
    "window_tumbling",
    "f1_hash_keys",
    "minhash_band",
    "simhash",
    "quality_score",
    "ann_cosine_topk",
    "fs_clean_text",
]


def run_queries(spark) -> dict[str, float]:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out = {}
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        out[name] = round(time.time() - t0, 3)
    return out


def run_kg(master: str, shuffle: int) -> float:
    """Wall seconds for the full KG pipeline at KG_PAGES synthetic pages.

    A small warmup pipeline runs first in the same session so Python-worker
    startup / module import / JIT costs are paid before the clock starts —
    on a real cluster those are one-time executor costs, not per-job."""
    from folkscope_spark.pipeline import run_pipeline
    from folkscope_spark.session import get_spark
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = get_spark(app=f"bench-{master}", master=master, shuffle_partitions=shuffle)
    run_pipeline(
        spark, out_dir=None, n_pages=200, n_items=50,
        with_concepts=True, with_canonicalize=True, max_extra=1,
    )["triples"].count()

    t0 = time.time()
    r = run_pipeline(
        spark,
        out_dir=None,
        n_pages=KG_PAGES,
        n_items=KG_ITEMS,
        with_concepts=True,
        with_canonicalize=True,
        max_extra=2,
    )
    r["triples"].count()
    wall = time.time() - t0
    spark.stop()
    return wall


def main():
    from folkscope_spark.session import get_spark

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    t_total0 = time.time()

    spark = get_spark(app="bench", master=f"local[{CPUS}]")
    queries = run_queries(spark)
    spark.stop()

    kg = {}
    if not SKIP_SCALING:
        t8 = run_kg(f"local[{max(CPUS // 4, 1)}]", CPUS // 2)
        t32 = run_kg(f"local[{CPUS}]", 2 * CPUS)
        eff = (t8 / t32) / 4.0
        kg = {
            "kg_pages": KG_PAGES,
            "wall_local8_s": round(t8, 2),
            "wall_local32_s": round(t32, 2),
            "docs_per_sec_local8": round(KG_PAGES / t8, 2),
            "docs_per_sec_local32": round(KG_PAGES / t32, 2),
            "scaling_efficiency": round(eff, 3),
        }
        queries["kg_pipeline_local32"] = round(t32, 3)

    total = round(time.time() - t_total0, 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_kg_wall",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "kg": kg,
            }
        )
    )


if __name__ == "__main__":
    main()
