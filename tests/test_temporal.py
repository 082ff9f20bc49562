"""Temporal K-step blocking (ops/pallas_step.make_temporal_bulk_substep +
models/mucociliary temporal mode): K LB steps per HBM pass over the
force-free bulk rows must reproduce the single-step oracle exactly.

The IB force field is zero above the force band (ImmersedBoundary.cu:166-231
only writes within the delta support of the cilia), which is what makes the
bulk force-free — the seam with the band region is the only data exchanged
per sub-step.  Equivalence here is to f64 round-off in interpret mode; on
real TPU the path is bit-exact vs the single-step fused kernel (checked by
the benchmark harness)."""

import numpy as np
import pytest

from cuda_iblb_11_tpu.core.config import SimConfig
from cuda_iblb_11_tpu.models.mucociliary import MucociliarySim

CFG = SimConfig(c_num=4, c_space=48, ydim=256, dtype="float64", storage="raw")


@pytest.fixture(scope="module")
def oracle_16():
    sim = MucociliarySim(CFG, backend="jnp")
    st = sim.run_chunk(sim.init_state(), 16)
    return sim, st


@pytest.mark.parametrize("K", [2, 4, 8])
def test_temporal_matches_oracle(K, oracle_16):
    _, st_ref = oracle_16
    tem = MucociliarySim(CFG, backend="pallas", temporal=K)
    st = tem.run_chunk(tem.init_state(), 16)
    assert int(st.it) == 16
    np.testing.assert_allclose(
        np.asarray(st.f), np.asarray(st_ref.f), rtol=1e-13, atol=1e-15)
    np.testing.assert_allclose(
        np.asarray(st.force), np.asarray(st_ref.force), rtol=1e-10,
        atol=1e-18)
    np.testing.assert_allclose(float(st.q), float(st_ref.q), rtol=1e-12)


def test_temporal_remainder_steps():
    # n_steps not a multiple of K: the tail runs through the single-step
    # scan; totals must still match the oracle.
    ref = MucociliarySim(CFG, backend="jnp")
    tem = MucociliarySim(CFG, backend="pallas", temporal=4)
    a = ref.run_chunk(ref.init_state(), 11)
    b = tem.run_chunk(tem.init_state(), 11)
    assert int(b.it) == 11
    np.testing.assert_allclose(
        np.asarray(b.f), np.asarray(a.f), rtol=1e-13, atol=1e-15)
    np.testing.assert_allclose(float(b.q), float(a.q), rtol=1e-12)


def test_temporal_step_api_unchanged():
    # step() uses the single-step kernel regardless of the temporal setting.
    tem = MucociliarySim(CFG, backend="pallas", temporal=4)
    one = MucociliarySim(CFG, backend="pallas")
    a = tem.step(tem.init_state())
    b = one.step(one.init_state())
    np.testing.assert_array_equal(np.asarray(a.f), np.asarray(b.f))


def test_temporal_requires_pallas():
    with pytest.raises(ValueError):
        MucociliarySim(CFG, backend="jnp", temporal=2)


def test_temporal_rejects_shallow_domain():
    # ydim must leave >= 2 bulk tiles above the 128-row force band.
    with pytest.raises(ValueError):
        MucociliarySim(SimConfig(c_num=4, c_space=48, ydim=136,
                                 dtype="float64", storage="raw"),
                       backend="pallas", temporal=4)


def test_temporal_reference_channel_grid(oracle_16):
    # The reference's fixed ydim=192 leaves a 64-row bulk: the tile picker
    # must fall back to 2x32-row tiles instead of one 64-row tile.
    cfg = CFG.replace(ydim=192)
    ref = MucociliarySim(cfg, backend="jnp")
    tem = MucociliarySim(cfg, backend="pallas", temporal=4)
    a = ref.run_chunk(ref.init_state(), 8)
    b = tem.run_chunk(tem.init_state(), 8)
    np.testing.assert_allclose(
        np.asarray(b.f), np.asarray(a.f), rtol=1e-13, atol=1e-15)


def test_temporal_quirk_x_edge_matches_single_step():
    # the strict-parity IB x-edge mode (ImmersedBoundary.cu:119-124
    # aliasing + :178-231 dropped periodic images) now composes with
    # temporal blocking via the per-sub-step band leg + stencil IB
    # (the windowed band super-kernel is periodic-only by construction)
    cfg = CFG.replace(c_num=4)
    one = MucociliarySim(cfg, backend="jnp", ib_x_edge="reference")
    a = one.run_chunk(one.init_state(), 11)  # includes remainder steps
    tem = MucociliarySim(cfg, backend="pallas", temporal=4,
                         ib_x_edge="reference")
    assert tem._band_super is None
    b = tem.run_chunk(tem.init_state(), 11)
    np.testing.assert_allclose(
        np.asarray(b.f), np.asarray(a.f), rtol=1e-13, atol=1e-15)
    np.testing.assert_allclose(float(b.q), float(a.q), rtol=1e-12)
    # and the quirk genuinely bites (cilia wrap the x edge here)
    p = MucociliarySim(cfg, backend="pallas", temporal=4)
    sp = p.run_chunk(p.init_state(), 11)
    assert float(np.abs(np.asarray(sp.f) - np.asarray(b.f)).max()) > 1e-12


def test_temporal_quirk_super_config_falls_back():
    # a super-eligible geometry must still take the per-sub-step leg in
    # quirk mode (the super-kernel's windowed IB assumes periodic wrap)
    cfg = SimConfig(c_num=3, c_space=128, ydim=256, dtype="float64",
                    storage="raw")
    tem = MucociliarySim(cfg, backend="pallas", temporal=4,
                         ib_x_edge="reference")
    assert tem._band_super is None
    ref_sim = MucociliarySim(cfg, backend="jnp", ib_x_edge="reference")
    a = ref_sim.run_chunk(ref_sim.init_state(), 8)
    b = tem.run_chunk(tem.init_state(), 8)
    np.testing.assert_allclose(
        np.asarray(b.f), np.asarray(a.f), rtol=1e-13, atol=1e-15)


def test_band_super_tiled_matches_untiled():
    # x-tiled resident-band super-kernel (the BASELINE config-5 path:
    # XDIM=8192 exceeds one VMEM block) must reproduce the whole-domain
    # kernel EXACTLY: the ghost-column margin gx >= W + 8K provably
    # contains the edge-error light cone (streaming + delta reach through
    # the overlapping-window IB coupling) — see
    # ops/pallas_step.make_band_super_substep_tiled.
    from cuda_iblb_11_tpu.ops.pallas_step import make_band_super_substep_tiled

    cfg = SimConfig(c_num=12, c_space=128, ydim=192, dtype="float64",
                    storage="raw")
    a = MucociliarySim(cfg, backend="pallas", temporal=2)
    assert a._band_super is not None and not hasattr(a._band_super, "tile_x")
    b = MucociliarySim(cfg, backend="pallas", temporal=2)
    b._band_super = make_band_super_substep_tiled(
        cfg, b._band_pad_s, 2, b.walls, b.dtype, forcing=b.forcing,
        storage=b.storage)
    assert b._band_super.tile_x == 512          # 3 tiles of 512 + 2*400
    assert b._band_super.halo == a._band_super.halo
    sa = a.run_chunk(a.init_state(), 6)
    sb = b.run_chunk(b.init_state(), 6)
    np.testing.assert_array_equal(np.asarray(sb.f), np.asarray(sa.f))
    np.testing.assert_array_equal(np.asarray(sb.force), np.asarray(sa.force))
    assert float(sb.q) == float(sa.q)


def test_band_super_tiled_selection_at_8192():
    # at the BASELINE config-5 width the whole-domain kernel must reject
    # (VMEM) and the tiled factory must pick a 2-tile split whose extended
    # blocks fit the budget; construction only — no TPU compile here.
    from cuda_iblb_11_tpu.ops.pallas_step import (
        make_band_super_substep, make_band_super_substep_tiled,
    )

    cfg = SimConfig(c_num=64, c_space=128, ydim=8192, dtype="float32")
    with pytest.raises(ValueError, match="VMEM footprint"):
        make_band_super_substep(cfg, 8, 8, interpret=False)
    sub = make_band_super_substep_tiled(cfg, 8, 8, interpret=False)
    assert sub.tile_x == 4096 and sub.gx == 512
