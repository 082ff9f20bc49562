"""Meta checks that keep the documentation from drifting (VERDICT r3
item 7: README said 181 tests while 183 collected; perf figures went
stale between rounds)."""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _readme():
    with open(os.path.join(REPO, "README.md")) as fh:
        return fh.read()


def test_readme_test_count_matches_source():
    # README cites the STATIC test-function count (stable under
    # parametrization, countable without a collection pass); this test is
    # the drift gate.
    n = 0
    for path in glob.glob(os.path.join(REPO, "tests", "test_*.py")):
        with open(path) as fh:
            n += len(re.findall(r"^def test_", fh.read(), re.M))
    m = re.search(r"(\d+) test functions", _readme())
    assert m, "README must state the test-function count"
    assert int(m.group(1)) == n, (
        f"README says {m.group(1)} test functions; tests/ defines {n} — "
        f"update README.md")


def _latest_bench_mlups():
    """The newest recorded headline MLUPS: driver records (BENCH_r*.json)
    vs the committed local record (validation/bench_local.json, which
    names the driver record it supersedes)."""
    benches = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    chosen = benches[-1] if benches else None
    local = os.path.join(REPO, "validation", "bench_local.json")
    if os.path.exists(local):
        with open(local) as fh:
            sup = json.load(fh).get("supersedes", "")
        if not chosen or os.path.basename(chosen) <= sup:
            chosen = local
    if not chosen:
        return None
    with open(chosen) as fh:
        record = json.load(fh)
    lines = [ln for ln in record.get("tail", "").splitlines()
             if ln.startswith('{"metric"')]
    if "value" in record:
        return float(record["value"])
    if lines:
        return float(json.loads(lines[-1])["value"])
    return None


def test_baseline_status_mlups_matches_latest_bench():
    # BASELINE.md's status paragraph carries the same headline figure as
    # README; VERDICT r4 weak-1 found it drifting silently because only
    # README was gated.  Same 15% gate (run-to-run tunnel variance).
    measured = _latest_bench_mlups()
    if measured is None or measured == 0:
        return
    with open(os.path.join(REPO, "BASELINE.md")) as fh:
        text = fh.read()
    m = re.search(r"throughput\s*\n?\*\*([\d,]+)\*\* MLUPS/chip", text)
    assert m, ("BASELINE.md must carry the bold status throughput figure "
               "('throughput **N,NNN** MLUPS/chip')")
    stated = float(m.group(1).replace(",", ""))
    assert abs(stated - measured) / measured < 0.15, (
        f"BASELINE.md status says {stated} MLUPS; latest bench records "
        f"{measured} — rewrite the status paragraph")


def test_migration_mlups_matches_latest_bench():
    # docs/MIGRATION.md's "Performance expectations" figure drifted
    # unnoticed through r4 because only README/BASELINE were gated.
    measured = _latest_bench_mlups()
    if measured is None or measured == 0:
        return
    with open(os.path.join(REPO, "docs", "MIGRATION.md")) as fh:
        text = fh.read()
    m = re.search(r"\*\*~([\d,]+) MLUPS\*\*", text)
    assert m, ("MIGRATION.md must carry the bold throughput figure "
               "('**~N,NNN MLUPS**')")
    stated = float(m.group(1).replace(",", ""))
    assert abs(stated - measured) / measured < 0.15, (
        f"MIGRATION.md says {stated} MLUPS; latest bench records "
        f"{measured} — refresh the performance-expectations paragraph")


def test_readme_headline_mlups_matches_latest_bench():
    # the README perf table's benchmark-mode number must track the latest
    # recorded benchmark within run-to-run variance (+-2-4% through the
    # tunnel; 15% gate).  The newest of the driver records
    # (BENCH_r<N>.json) and the committed local record
    # (validation/bench_local.json, written when a bench.py methodology
    # change lands between driver rounds — e.g. the r4 window-length fix
    # that removed a ~20% fixed-dispatch-cost under-report) wins.
    measured = _latest_bench_mlups()
    if measured is None:
        return

    m = re.search(r"\*\*~([\d,]+)\*\*", _readme())
    assert m, "README must carry the bold headline MLUPS figure"
    stated = float(m.group(1).replace(",", ""))
    assert abs(stated - measured) / measured < 0.15, (
        f"README headline {stated} MLUPS vs latest bench {measured} — "
        f"refresh the README perf table")
