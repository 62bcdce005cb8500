"""Two-process "multi-node" scaling stand-in (VERDICT r3 stretch #7).

The sandbox has one host, so the north rule's N -> 4N *executor* scaling can
only be evidenced with N -> 4N *cores* in one JVM — which conflates Spark's
scaling with the host's shared memory bus.  This experiment separates the
two:

* **solo leg**: one process, ``local[8]``, P pages -> wall ``T_solo``.
* **pair leg**: two *concurrent* processes, each ``local[8]``, each P pages
  on its own SparkSession/JVM -> walls ``T_a``, ``T_b``.

Two independent 8-core "nodes" do 2x the total work of the solo leg.  On a
real cluster (per-node memory buses) the pair would finish in ~``T_solo``;
on this host both processes share one memory bus, so the slowdown
``max(T_a, T_b) / T_solo`` measures *pure hardware interference* — no Spark
scheduler, shuffle, or driver involvement crosses the process boundary.

interference_slowdown ~ 1.0  ->  the single-JVM scaling gap seen in
bench.py's core-scaling legs is Spark-side (bad).
interference_slowdown >> 1.0 ->  the gap is the shared memory bus, which a
multi-node cluster does not have (supports the BASELINE.md attribution).

Prints one JSON line; run while the host is otherwise idle.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_leg(pages: int, log: str) -> subprocess.Popen:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    f = open(log, "w")
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "kg_leg.py"),
         "--master", "local[8]", "--shuffle", "24", "--pages", str(pages)],
        stdout=f, stderr=subprocess.STDOUT, env=env, cwd=REPO,
    )


def parse_leg(log: str) -> dict:
    with open(log) as f:
        for line in f.read().splitlines()[::-1]:
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    raise RuntimeError(f"no JSON line in {log}")


def main() -> None:
    pages = int(os.environ.get("TWO_PROC_PAGES", "50000"))
    tmp = "/tmp/two_proc"
    os.makedirs(tmp, exist_ok=True)

    # solo leg
    t0 = time.time()
    p = run_leg(pages, f"{tmp}/solo.log")
    rc = p.wait()
    assert rc == 0, f"solo leg rc={rc}"
    solo = parse_leg(f"{tmp}/solo.log")

    # concurrent pair: launch both, wait for both
    t0 = time.time()
    pa = run_leg(pages, f"{tmp}/pair_a.log")
    pb = run_leg(pages, f"{tmp}/pair_b.log")
    rca, rcb = pa.wait(), pb.wait()
    pair_span = time.time() - t0
    assert rca == 0 and rcb == 0, f"pair legs rc=({rca},{rcb})"
    a, b = parse_leg(f"{tmp}/pair_a.log"), parse_leg(f"{tmp}/pair_b.log")

    t_solo = solo["wall_s"]
    t_pair = max(a["wall_s"], b["wall_s"])
    out = {
        "pages_per_process": pages,
        "solo_wall_s": t_solo,
        "pair_wall_a_s": a["wall_s"],
        "pair_wall_b_s": b["wall_s"],
        "pair_span_s": round(pair_span, 2),
        # how much slower each 8-core "node" runs when a second identical
        # node shares the host's memory bus (1.0 = no interference)
        "interference_slowdown": round(t_pair / t_solo, 3),
        # aggregate throughput view: 2 nodes vs 1 node
        "two_node_scaling_efficiency": round(t_solo / t_pair, 3),
        "solo_stages": solo["stages"],
        "pair_a_stages": a["stages"],
        "pair_b_stages": b["stages"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
