"""bench.py stage-timing tripwire (VERDICT r3 next #5): a seeded slowdown
must be flagged, plain noise must not."""

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import latest_committed_stages, stage_regressions


COMMITTED = {"parse": 13.5, "match": 1.0, "concept_triples": 8.4, "write": 6.9}


def test_fires_on_seeded_slowdown():
    current = dict(COMMITTED)
    current["parse"] = COMMITTED["parse"] * 2.5  # seeded 2.5x regression
    out = stage_regressions(current, COMMITTED, factor=2.0)
    assert set(out) == {"parse"}
    assert out["parse"]["committed_s"] == 13.5


def test_silent_within_factor():
    current = {k: v * 1.8 for k, v in COMMITTED.items()}
    assert stage_regressions(current, COMMITTED, factor=2.0) == {}


def test_subsecond_stages_ignored():
    # match committed at 1.0s: co-tenant noise can triple it — not a signal
    current = dict(COMMITTED)
    current["match"] = 3.5
    assert stage_regressions(current, COMMITTED, factor=2.0) == {}


def test_missing_stage_in_current_run_ignored():
    current = {k: v for k, v in COMMITTED.items() if k != "write"}
    assert stage_regressions(current, COMMITTED, factor=2.0) == {}


def test_latest_committed_stages_reads_newest_round(tmp_path):
    for n, parse_s in ((2, 99.0), (3, 13.5)):
        with open(tmp_path / f"BENCH_r0{n}.json", "w") as f:
            json.dump({"kg": {"stage_timings": {"parse": parse_s}}}, f)
    assert latest_committed_stages(str(tmp_path)) == {"parse": 13.5}


def test_latest_committed_stages_empty_dir(tmp_path):
    assert latest_committed_stages(str(tmp_path)) == {}
