"""Field-snapshot golden validation (VERDICT round-1 item 5).

The reference ships full rho/u fields at it = 1k/50k/99k
(Data/Nominals/{it}-vector_nom.dat, written per main.cu:954-971).
scripts/validate_fields.py reruns the nominal 300x200 configuration and
records shape-level comparison metrics in validation/fields_metrics.json;
this test asserts the recorded floors, guarding against COMMITTING a
degraded regeneration of the metrics (the live physics itself is gated
by the oracle-equality and accuracy-horizon tests, which recompute; the
full nominal rerun is minutes-long and stays offline in the script).

Measured context (see the json + scripts/validate_fields.py docstring):
the nominals are a Nov-2017 LENGTH=100-era run that PREDATES the committed
CUDA (its SimLog contains lines the current source cannot produce —
validation/README.md), so instantaneous-field correlations sit at
0.35-0.65 rather than ~1: a phase-shift scan across a full beat peaks at
only 0.65, i.e. the difference is era dynamics, not misalignment.  The
robust cross-era observables do agree: flux-curve shape 0.9993
(tests/test_golden_flux.py), monotone pumping, and channel density
deviation magnitude (|rho-1| ~ 1e-3, same sign structure by late beat).
"""

import json
import os

import numpy as np
import pytest

HERE = os.path.dirname(__file__)
METRICS = os.path.join(HERE, "..", "validation", "fields_metrics.json")
NOMINAL_DIR = "/root/reference/CUDA_IBLB_11/Data/Nominals"


def test_recorded_field_metrics_meet_floors():
    with open(METRICS) as fh:
        data = json.load(fh)
    epochs = data["epochs"]
    assert set(epochs) == {"1000", "50000", "99000"}
    for it, m in epochs.items():
        # positive structural correlation with the nominal flow at every
        # epoch, strongest along the pumping direction
        assert m["corr_umag"] > 0.3, (it, m)
        assert m["corr_ux"] > 0.5, (it, m)
        # channel density deviation magnitude matches the nominal era's
        # (|rho - 1| ~ 1e-3 at matched sign by late beat)
        assert abs(m["rho_channel_ours"] - 1.0) < 5e-3, (it, m)
        assert abs(m["rho_channel_nom"] - 1.0) < 5e-3, (it, m)
    # the developed-flow epochs correlate more strongly in the pumping
    # profile than the startup transient
    assert epochs["50000"]["corr_ux_profile"] > 0.6
    assert epochs["99000"]["corr_ux_profile"] > 0.6


def test_nominal_loader_roundtrip():
    if not os.path.isdir(NOMINAL_DIR):
        pytest.skip("reference goldens unavailable")
    # load the script as a module without mutating sys.path (a scripts/
    # entry at sys.path[0] could shadow later imports session-wide)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "validate_fields",
        os.path.join(HERE, "..", "scripts", "validate_fields.py"))
    vf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vf)
    load_nominal = vf.load_nominal

    nom = load_nominal(1000)
    assert nom.shape == (4, 200, 300)
    # |u| column is consistent with (ux, uy)
    np.testing.assert_allclose(
        nom[2], np.hypot(nom[0], nom[1]), rtol=2e-4, atol=1e-12)
    # channel density ~ 1 (scaled units)
    assert 0.97 < nom[3][:100].mean() < 1.03
