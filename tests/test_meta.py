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


def test_readme_headline_mlups_matches_latest_bench():
    # the README perf table's benchmark-mode number must track the latest
    # recorded driver benchmark (BENCH_r<N>.json) within run-to-run
    # variance (+-2-4% through the tunnel; 15% gate)
    benches = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if not benches:
        return
    with open(benches[-1]) as fh:
        record = json.load(fh)
    # the driver wraps bench.py's JSON line inside the captured "tail"
    lines = [ln for ln in record.get("tail", "").splitlines()
             if ln.startswith('{"metric"')]
    if "value" in record:
        measured = float(record["value"])
    elif lines:
        measured = float(json.loads(lines[-1])["value"])
    else:
        return

    m = re.search(r"\*\*~([\d,]+)\*\*", _readme())
    assert m, "README must carry the bold headline MLUPS figure"
    stated = float(m.group(1).replace(",", ""))
    assert abs(stated - measured) / measured < 0.15, (
        f"README headline {stated} MLUPS vs latest bench {measured} — "
        f"refresh the README perf table")
