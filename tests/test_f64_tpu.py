"""The opt-in high-precision mode: float64 on TPU via XLA's f32x2 emulation.

The reference computes in f64 end-to-end on the GPU (double throughout
LatticeBoltzmann.cu:30-411, ImmersedBoundary.cu:94-264).  Here `--dtype
float64` runs real f64 on CPU and XLA:TPU's native double-single (two-f32)
emulation on TPU.  The hardware measurements live in validation/f64_tpu.json
(written by scripts/probe_f64_tpu.py on the TPU host); this file gates the
committed numbers and the CPU-checkable wiring.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_iblb_11_tpu.core.config import SimConfig
from cuda_iblb_11_tpu.models.mucociliary import MucociliarySim

JSON = os.path.join(os.path.dirname(__file__), "..", "validation",
                    "f64_tpu.json")

CFG64 = SimConfig(c_num=4, c_space=48, dtype="float64", storage="raw")


def test_f64_without_x64_raises_actionably():
    """Without x64 every f64 array silently truncates to f32; the sim must
    refuse rather than run a fake 'high-precision' mode."""
    jax.config.update("jax_enable_x64", False)
    try:
        with pytest.raises(ValueError, match="x64"):
            MucociliarySim(CFG64, backend="jnp")
    finally:
        jax.config.update("jax_enable_x64", True)


def test_pallas_backend_rejects_f64_on_tpu(monkeypatch):
    """On real TPU the Mosaic kernels are f32/bf16 only; interpret-mode
    (CPU) pallas f64 stays allowed — the equivalence tests rely on it."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with pytest.raises(ValueError, match="f32/bf16"):
        MucociliarySim(CFG64, backend="pallas")


def test_auto_backend_routes_f64_to_jnp():
    sim = MucociliarySim(CFG64, backend="auto")
    assert sim.backend == "jnp"
    assert "float64" in sim.backend_reason or "tpu" in sim.backend_reason
    assert sim.resolved_config()["dtype"] == "float64"


def test_f64_run_is_finite_and_f64(tmp_path):
    sim = MucociliarySim(CFG64, backend="jnp")
    st = sim.run_chunk(sim.init_state(), 8)
    assert st.f.dtype == jnp.float64
    assert bool(jnp.isfinite(st.f).all())


def test_cli_dtype_float64_enables_x64(tmp_path):
    """`--dtype float64` must enable x64 in-process (cli.py) so the run is
    genuinely f64 — on CPU here; on TPU the same flag engages XLA's f32x2
    emulation (validation/f64_tpu.json)."""
    from cuda_iblb_11_tpu import cli

    jax.config.update("jax_enable_x64", False)
    try:
        rc = cli.main(["1", "4", "48", "1.0", "1.0", "5", "0.0001", "1",
                       "0", "0", "--dtype", "float64",
                       "--output", str(tmp_path), "--quiet",
                       "--platform", "cpu"])
        assert rc == 0
        assert jax.config.jax_enable_x64
    finally:
        jax.config.update("jax_enable_x64", True)


# ---- gates on the committed hardware measurements -------------------------


def _json():
    with open(JSON) as fh:
        return json.load(fh)


def test_committed_eft_survival():
    """two_sum / Dekker two_prod must be EXACT on the TPU toolchain the
    probe last ran on — the foundation under XLA's f32x2 emulation."""
    j = _json()
    assert j["eft"]["two_sum_exact"] is True
    assert j["eft"]["two_prod_exact"] is True


def test_committed_fullbeat_acceptance():
    """VERDICT r4 item 4 acceptance: full-beat (100k-step) 192^2 velocity
    rel-L2 vs the CPU f64 oracle <= 1e-5 — i.e. the north-star bound at
    ALL horizons, not just <= 1k steps.  The measured value is ~1e-10
    class; gate at 1e-8 so a partial erosion still fails loudly before
    the acceptance bound is threatened."""
    fb = _json()["fullbeat"]
    assert fb["steps"] == 100_000
    assert fb["vel_rel_l2_vs_cpu_f64"] <= 1e-8
    assert fb["q_rel_vs_cpu_f64"] <= 1e-8
    assert fb["mlups_steady"] > 5.0  # must beat the CPU oracle (~3 MLUPS)


def test_committed_2048_rate():
    """The production-scale cost of the mode: measured steady MLUPS at
    2048^2 (the f32-vs-f64 accuracy gap it resolves is gated separately
    from validation/accuracy_horizon.json in test_accuracy_horizon.py)."""
    r = _json()["rate2048"]
    assert r["grid"] == [2048, 2048]
    assert r["mlups_steady"] > 15.0


def test_fields_match_committed_golden_metadata():
    gold = np.load(os.path.join(os.path.dirname(__file__), "..",
                                "validation", "fullbeat_f64_192sq.npz"))
    fb = _json()["fullbeat"]
    assert fb["grid"] == [int(gold["ydim"]), int(gold["xdim"])]
