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


def test_latest_committed_stages_skips_null_parsed_round(tmp_path):
    """A timed-out round publishes {"parsed": null} (BENCH_r04 did); it must
    not disarm the tripwire — fall back to the newest complete round
    (VERDICT r4 #2)."""
    with open(tmp_path / "BENCH_r03.json", "w") as f:
        json.dump({"parsed": {"kg": {"stage_timings": {"parse": 13.5}}}}, f)
    with open(tmp_path / "BENCH_r04.json", "w") as f:
        json.dump({"rc": 124, "parsed": None}, f)
    assert latest_committed_stages(str(tmp_path)) == {"parse": 13.5}


def test_latest_committed_stages_skips_empty_stage_timings(tmp_path):
    with open(tmp_path / "BENCH_r03.json", "w") as f:
        json.dump({"kg": {"stage_timings": {"parse": 13.5}}}, f)
    with open(tmp_path / "BENCH_r04.json", "w") as f:
        json.dump({"kg": {"stage_timings": {}}}, f)
    with open(tmp_path / "BENCH_r05.json", "w") as f:
        f.write("not json at all")
    assert latest_committed_stages(str(tmp_path)) == {"parse": 13.5}


def test_latest_committed_kg_returns_full_section(tmp_path):
    from bench import latest_committed_kg

    with open(tmp_path / "BENCH_r03.json", "w") as f:
        json.dump(
            {
                "parsed": {
                    "kg": {
                        "stage_timings": {"parse": 13.5},
                        "throughput_wall_s": 40.69,
                        "wall_n4_s": 588.24,
                    }
                }
            },
            f,
        )
    with open(tmp_path / "BENCH_r04.json", "w") as f:
        json.dump({"parsed": None}, f)
    kg = latest_committed_kg(str(tmp_path))
    assert kg["throughput_wall_s"] == 40.69
    assert kg["wall_n4_s"] == 588.24


def test_latest_committed_kg_all_incomplete(tmp_path):
    from bench import latest_committed_kg

    with open(tmp_path / "BENCH_r04.json", "w") as f:
        json.dump({"parsed": None}, f)
    assert latest_committed_kg(str(tmp_path)) == {}


def test_emitter_partial_then_final(tmp_path, capsys, monkeypatch):
    """Every leg emission is a full parseable JSON line; intermediate ones
    carry partial=true, the final one does not (VERDICT r4 #1a)."""
    import bench

    monkeypatch.setattr(bench, "PROGRESS_PATH", str(tmp_path / "PROGRESS.json"))
    em = bench._Emitter("0.1")
    em.queries["q1"] = 1.5
    em.emit("headline_queries")
    em.kg["throughput_wall_s"] = 40.0
    em.emit("throughput")
    em.emit("", final=True)
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    docs = [json.loads(l) for l in lines]
    assert len(docs) == 3
    assert docs[0]["partial"] and docs[0]["legs_completed"] == ["headline_queries"]
    assert docs[1]["partial"] and docs[1]["kg"]["throughput_wall_s"] == 40.0
    assert "partial" not in docs[2]  # final
    assert docs[2]["queries"] == {"q1": 1.5}
    # progress file mirrors the newest emission
    with open(tmp_path / "PROGRESS.json") as f:
        assert json.load(f)["legs_completed"] == docs[2]["legs_completed"]


def test_emitter_budget_skip_records_and_emits(tmp_path, capsys, monkeypatch):
    """A leg that does not fit the budget is recorded in
    kg.skipped_for_budget and a partial emission is produced (VERDICT r4 #1b)."""
    import bench

    monkeypatch.setattr(bench, "PROGRESS_PATH", str(tmp_path / "PROGRESS.json"))
    monkeypatch.setattr(bench, "BUDGET_S", 10.0)
    em = bench._Emitter("0.1")
    assert em.fits("cheap_leg", est_s=5.0)
    assert not em.fits("expensive_leg", est_s=1000.0)
    skipped = em.kg["skipped_for_budget"]
    assert skipped == [{"leg": "expensive_leg", "estimate_s": 1000.0}]
    out = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert out and out[-1]["legs_completed"] == ["skip:expensive_leg"]
