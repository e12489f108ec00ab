"""Unit tests for bench.py's noise-hardening (no Spark needed)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


class _FakeDF:
    def count(self):
        return 1


def test_committed_baseline_reads_git_head(tmp_path):
    repo = tmp_path / "r"
    repo.mkdir()
    subprocess.run(["git", "init", "-q"], cwd=repo, check=True)
    subprocess.run(
        ["git", "-c", "user.email=t@t", "-c", "user.name=t", "commit", "-q",
         "--allow-empty", "-m", "x"],
        cwd=repo, check=True,
    )
    # no BENCH_FULL committed -> empty dict, never raises
    assert bench._committed_baseline(str(repo)) == {}
    (repo / "BENCH_FULL.json").write_text(
        json.dumps({"queries": {"q": 1.0}})
    )
    subprocess.run(["git", "add", "-A"], cwd=repo, check=True)
    subprocess.run(
        ["git", "-c", "user.email=t@t", "-c", "user.name=t", "commit", "-q", "-m", "b"],
        cwd=repo, check=True,
    )
    assert bench._committed_baseline(str(repo)) == {"q": 1.0}
    # the WORKING-TREE file must not feed the baseline (overwrite safety)
    (repo / "BENCH_FULL.json").write_text(json.dumps({"queries": {"q": 99.0}}))
    assert bench._committed_baseline(str(repo)) == {"q": 1.0}


def test_retime_outliers_keeps_min_and_respects_threshold(monkeypatch):
    calls = []

    def runner(spark, sf_dir):
        calls.append(1)
        return _FakeDF()

    qs = {"noisy": runner, "fine": runner, "new": runner}
    timings = {"noisy": 10.0, "fine": 1.0, "new": 50.0}
    baseline = {"noisy": 1.0, "fine": 0.9}  # "new" has no baseline entry
    monkeypatch.setattr(bench, "_committed_baseline", lambda root: baseline)

    # freeze the retry's measured time to 0 by collapsing perf_counter
    t = [0.0]

    def fake_clock():
        t[0] += 0.05
        return t[0]

    monkeypatch.setattr(bench.time, "perf_counter", fake_clock)
    bench._retime_outliers(timings, qs, None, "sf", "/nonexistent")
    # only "noisy" exceeded 2.5x its baseline AND has one; min() kept
    assert len(calls) == 1
    assert timings["noisy"] < 10.0
    assert timings["fine"] == 1.0
    assert timings["new"] == 50.0  # unbaselined queries never retimed
