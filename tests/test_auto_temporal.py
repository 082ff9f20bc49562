"""--temporal auto: the largest eligible K wins, ineligible configs fall
down the ladder to single-step, non-pallas backends resolve to 1, and the
pick (with its reason) is recorded in resolved_config()/SimLog — the same
record-the-RESOLVED-config contract as backend=auto (the reference's
launch-config SimLog lines at main.cu:782-783 are commented out; the
resolved-config contract here stands on its own).

Auto is a PERF policy, not a physics change: it reuses exactly the
machinery the explicit-K path builds, so the oracle-equivalence suites in
test_temporal.py/test_band_super.py carry over; one 16-step oracle match
here pins the auto-picked path end-to-end."""

import numpy as np
import pytest

from cuda_iblb_11_tpu.core.config import SimConfig
from cuda_iblb_11_tpu.models.mucociliary import MucociliarySim
from cuda_iblb_11_tpu.runner import run

CFG = SimConfig(c_num=4, c_space=48, ydim=256, dtype="float64",
                storage="raw")


def test_auto_picks_largest_k():
    sim = MucociliarySim(CFG, backend="pallas", temporal="auto")
    assert sim.temporal == 16
    assert sim.temporal_requested == "auto"
    assert "K=16" in sim.temporal_reason
    rc = sim.resolved_config()
    assert rc["temporal"] == 16
    assert rc["temporal_requested"] == "auto"
    assert "K=16" in rc["temporal_reason"]


def test_auto_engages_band_super_when_eligible():
    # c_space=128 satisfies the resident-band super-kernel's lane
    # alignment, so the auto pick should land on the fast leg, not just
    # any K.
    cfg = SimConfig(c_num=3, c_space=128, ydim=256, dtype="float64",
                    storage="raw")
    sim = MucociliarySim(cfg, backend="pallas", temporal="auto")
    assert sim.temporal == 16
    assert sim._band_leg == "band_super_whole"


def test_auto_falls_to_single_step_when_no_k_fits():
    # ydim=136 leaves an 8-row bulk: no K has >= 2 bulk tiles, so every
    # ladder rung fails and auto must resolve to 1 (NOT raise — the
    # explicit-K ctor raises, a policy request degrades gracefully).
    cfg = SimConfig(c_num=4, c_space=48, ydim=136, dtype="float64",
                    storage="raw")
    sim = MucociliarySim(cfg, backend="pallas", temporal="auto")
    assert sim.temporal == 1
    assert "no eligible K" in sim.temporal_reason
    # the explicit request on the same config still raises
    with pytest.raises(ValueError):
        MucociliarySim(cfg, backend="pallas", temporal=4)


def test_auto_on_jnp_backend_resolves_to_one():
    sim = MucociliarySim(CFG, backend="jnp", temporal="auto")
    assert sim.temporal == 1
    assert "no temporal path" in sim.temporal_reason


def test_auto_matches_oracle_16_steps():
    ref = MucociliarySim(CFG, backend="jnp")
    a = ref.run_chunk(ref.init_state(), 16)
    sim = MucociliarySim(CFG, backend="pallas", temporal="auto")
    assert sim.temporal == 16
    b = sim.run_chunk(sim.init_state(), 16)
    np.testing.assert_allclose(
        np.asarray(b.f), np.asarray(a.f), rtol=1e-13, atol=1e-15)
    np.testing.assert_allclose(float(b.q), float(a.q), rtol=1e-12)


def test_runner_auto_records_resolution(tmp_path):
    # CLI default --temporal auto: on this CPU host backend=auto resolves
    # to jnp, so auto-K resolves to 1 — and the SimLog must SAY so.
    cfg = SimConfig(c_num=2, c_space=96, t_num=1, t_pow=2, i_pow=1,
                    p_num=1, dtype="float32")
    summary = run(cfg, output_root=str(tmp_path), backend="auto",
                  temporal="auto", quiet=True)
    assert summary["resolved"]["temporal"] == 1
    assert summary["resolved"]["temporal_requested"] == "auto"
    simlog = (tmp_path / "SimLog.txt").read_text() \
        if (tmp_path / "SimLog.txt").exists() else ""
    if not simlog:  # SimLog path layout is config-derived; find it
        logs = list(tmp_path.rglob("SimLog*.txt"))
        assert logs, "no SimLog written"
        simlog = logs[0].read_text()
    assert "auto:" in simlog
