"""Resident-band temporal super-kernel (ops/pallas_step.
make_band_super_substep): ALL K band sub-steps + the full IB coupling
(delta factors, interpolation, spreading, half-force flux) in ONE Pallas
launch with the band held in VMEM.

Equivalence to the jnp single-step oracle is to f64 round-off in interpret
mode — the per-cilium windowed [band, W] x [W, 128] contractions with the
periodic overlap-add fold are an exact re-association of the dense
min-image IB band matmuls (ops/ib_band.py), guarded by the rigorous beat
envelope bound models/cilia.CiliaModel.beat_x_bound.

Reference semantics covered: ImmersedBoundary.cu:119-264 (interpolate /
force / spread with the 3-point delta), LatticeBoltzmann.cu:30-411
(TRT collide + stream), main.cu:641-704 (flux diagnostic)."""

import numpy as np
import pytest

from cuda_iblb_11_tpu.core.config import SimConfig
from cuda_iblb_11_tpu.models.cilia import CiliaModel
from cuda_iblb_11_tpu.models.mucociliary import MucociliarySim

# smallest domain whose c_space=128 windows (W = c_space + 2*128) fit:
# xdim = 3*128 = 384 >= W = 384
CFG = SimConfig(c_num=3, c_space=128, ydim=256, dtype="float64",
                storage="raw")


@pytest.fixture(scope="module")
def oracle_8():
    sim = MucociliarySim(CFG, backend="jnp")
    st = sim.run_chunk(sim.init_state(), 8)
    return st


@pytest.mark.parametrize("K", [2, 4])
def test_band_super_matches_oracle(K, oracle_8):
    st_ref = oracle_8
    tem = MucociliarySim(CFG, backend="pallas", temporal=K)
    assert tem._band_super is not None, "super path should engage here"
    st = tem.run_chunk(tem.init_state(), 8)
    assert int(st.it) == 8
    np.testing.assert_allclose(
        np.asarray(st.f), np.asarray(st_ref.f), rtol=1e-13, atol=1e-15)
    np.testing.assert_allclose(
        np.asarray(st.force), np.asarray(st_ref.force), rtol=1e-10,
        atol=1e-18)
    np.testing.assert_allclose(float(st.q), float(st_ref.q), rtol=1e-12)


def test_band_super_fallback_when_window_too_wide():
    # c_num=2 -> xdim=256 < W=384: the windowed form cannot hold its
    # halo; the constructor must fall back to the per-sub-step band leg
    # (and still produce oracle-exact results through that leg).
    cfg = SimConfig(c_num=2, c_space=128, ydim=256, dtype="float64",
                    storage="raw")
    tem = MucociliarySim(cfg, backend="pallas", temporal=4)
    assert tem._band_super is None
    ref = MucociliarySim(cfg, backend="jnp")
    st_ref = ref.run_chunk(ref.init_state(), 8)
    st = tem.run_chunk(tem.init_state(), 8)
    np.testing.assert_allclose(
        np.asarray(st.f), np.asarray(st_ref.f), rtol=1e-13, atol=1e-15)


def test_beat_x_bound_is_an_envelope():
    # the windowing proof rests on this bound: sampled beat-frame x
    # positions over a dense phase sweep must never exceed it
    model = CiliaModel(CFG)
    bound = model.beat_x_bound()
    assert bound > 0
    import jax.numpy as jnp

    lasts = jnp.zeros((CFG.c_num, CFG.length, 2), model.dtype)
    mx = 0.0
    # positions() x = beat-frame x + the per-cilium base offset
    # (m - (c_num-1)/2) * c_space (the global shift_x is added later in
    # placement and cancels in the window-local anchor)
    base = ((jnp.arange(CFG.c_num) - (CFG.c_num - 1) / 2.0)
            * CFG.c_space).astype(model.dtype)
    for it in range(0, CFG.p_step, max(1, CFG.p_step // 97)):
        pos, _, lasts = model.kinematics(jnp.int32(it), lasts)
        mx = max(mx, float(jnp.abs(pos[..., 0] - base[:, None]).max()))
    assert mx <= bound + 1e-9, (mx, bound)


def test_band_super_f32_matches_fallback_short():
    # same-precision agreement over a short horizon (before f32
    # reassociation drift accumulates); long-horizon accuracy vs the f64
    # oracle is enforced in tests/test_accuracy_horizon.py
    cfg = CFG.replace(dtype="float32", storage="auto")
    sup = MucociliarySim(cfg, backend="pallas", temporal=4)
    assert sup._band_super is not None
    fb = MucociliarySim(cfg, backend="pallas", temporal=4)
    fb._band_super = None
    st_s = sup.run_chunk(sup.init_state(), 8)
    st_f = fb.run_chunk(fb.init_state(), 8)
    np.testing.assert_allclose(
        np.asarray(st_s.f), np.asarray(st_f.f), rtol=2e-5, atol=2e-6)


def test_band_super_rejects_vmem_blowup():
    # at 8192^2 the resident band exceeds the ~100 MB VMEM budget; the
    # builder must reject it (so MucociliarySim falls back to the tiled
    # per-sub-step leg) instead of failing at Mosaic compile time
    from cuda_iblb_11_tpu.ops.pallas_step import make_band_super_substep

    cfg = SimConfig(c_num=64, c_space=128, ydim=8192, dtype="float32")
    with pytest.raises(ValueError, match="VMEM footprint"):
        make_band_super_substep(cfg, 8, 8, dtype="float32",
                                interpret=False)


def test_band_super_honors_beat_pattern():
    # the window-safety envelope must be computed for the sim's ACTUAL
    # beat pattern; mucus-pattern runs through the super path must match
    # the mucus-pattern oracle
    ref = MucociliarySim(CFG, backend="jnp", pattern="mucus")
    st_ref = ref.run_chunk(ref.init_state(), 8)
    tem = MucociliarySim(CFG, backend="pallas", temporal=4,
                         pattern="mucus")
    assert tem._band_super is not None
    st = tem.run_chunk(tem.init_state(), 8)
    np.testing.assert_allclose(
        np.asarray(st.f), np.asarray(st_ref.f), rtol=1e-13, atol=1e-15)
