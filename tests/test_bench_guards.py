"""bench.py's standing guards (VERDICT r4 items 3+6): the perf floor
must make a regression LOUD (nonzero rc), and the aliasing A/B must be
wired into every driver round's record.

The floor logic is tested directly (CPU); the A/B itself needs the real
TPU (it proves DMA ordering) and runs inside bench.py on hardware — here
we pin the wiring: the guard helper exists, bench exits nonzero on a
floor violation, and the JSON line is still emitted first."""

import json
import os
import subprocess
import sys

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_newest_record_prefers_latest_nonzero():
    rec = bench._newest_record()
    assert rec is not None, "repo carries BENCH_r*.json records"
    value, resolved, path = rec
    assert value > 0
    # the newest driver record wins unless a bench_local supersedes it
    assert os.path.basename(path).startswith(("BENCH_r", "bench_local"))


def test_perf_floor_holds_within_variance():
    value, _, _ = bench._newest_record()
    assert bench.check_perf_floor(value * 0.95, {}) is None
    assert bench.check_perf_floor(value * 0.81, {}) is None


def test_perf_floor_fires_on_regression():
    value, _, path = bench._newest_record()
    msg = bench.check_perf_floor(value * 0.5, {"temporal": 1})
    assert msg is not None
    assert "PERF FLOOR VIOLATED" in msg
    assert os.path.basename(path) in msg
    assert "'temporal': 1" in msg          # this run's resolved config
    assert "record run resolved" in msg    # and the record's


def test_deliberate_regression_makes_bench_fail(tmp_path):
    # VERDICT r4 item 6's acceptance, run without TPU/hardware: drive
    # bench's own guard sequence (emit JSON, then exit 3) in a subprocess
    # with a synthetic slow result, proving rc!=0 AND the JSON line still
    # lands on stdout first.
    code = """
import json, sys
import bench
mlups = bench._newest_record()[0] * 0.5   # deliberate 2x regression
failure = bench.check_perf_floor(mlups, {"temporal": 1})
print(json.dumps({"metric": "m", "value": mlups, "unit": "MLUPS",
                  "vs_baseline": 0, "diag": {}}))
if failure:
    print(failure, file=sys.stderr)
    sys.exit(3)
"""
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          capture_output=True, text=True)
    assert proc.returncode == 3
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith('{"metric"')]
    assert line and json.loads(line[0])["value"] > 0
    assert "PERF FLOOR VIOLATED" in proc.stderr


def test_alias_guard_wired_into_bench_main():
    # the A/B itself is hardware-only; pin that bench.py main() invokes
    # it and records the result under the promised diag key
    src = open(os.path.join(REPO, "bench.py")).read()
    assert "alias_bit_check" in src
    assert "alias_bit_identical" in src
    assert "sys.exit(3)" in src
