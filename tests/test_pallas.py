"""Fused Pallas collide+stream kernel vs the pure-jnp oracle (interpreter
mode on CPU; the benchmark harness repeats the comparison on real TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cuda_iblb_11_tpu.core.config import SimConfig
from cuda_iblb_11_tpu.core.lattice import W
from cuda_iblb_11_tpu.ops import reference as ref
from cuda_iblb_11_tpu.ops.pallas_step import make_fused_substep

RNG = np.random.default_rng(11)


def _random_state(ydim, xdim, dtype):
    rho = 1.0 + 0.02 * RNG.standard_normal((ydim, xdim))
    u = 0.01 * RNG.standard_normal((2, ydim, xdim))
    f = np.asarray(ref.equilibrium(jnp.asarray(rho), jnp.asarray(u)))
    f = f + 1e-4 * RNG.standard_normal(f.shape) * np.asarray(W)[:, None, None]
    force = 1e-4 * RNG.standard_normal((2, ydim, xdim))
    return jnp.asarray(f, dtype), jnp.asarray(force, dtype)


@pytest.mark.parametrize("ydim,xdim,tile_y", [
    (32, 256, 8),    # multi-tile
    (16, 128, 16),   # single tile
    (24, 128, 8),    # 3 tiles
])
@pytest.mark.parametrize("forcing", ["trt_split", "reference"])
def test_fused_matches_oracle(ydim, xdim, tile_y, forcing):
    cfg = SimConfig(c_num=2, c_space=xdim // 2, ydim=ydim, dtype="float64")
    f, force = _random_state(ydim, xdim, jnp.float64)
    fused = make_fused_substep(cfg, dtype=jnp.float64, forcing=forcing,
                               interpret=True, tile_y=tile_y)
    got = np.asarray(fused(f, force))
    want, _, _ = ref.lb_substep(f, force, cfg.tau, cfg.tau2,
                                ref.REFERENCE_WALLS, forcing=forcing)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-12, atol=1e-15)


def test_fused_matches_oracle_noslip_top():
    ydim, xdim = 32, 128
    walls = ref.WallSpec(bottom="noslip", top="noslip")
    cfg = SimConfig(c_num=2, c_space=64, ydim=ydim, dtype="float64")
    f, force = _random_state(ydim, xdim, jnp.float64)
    fused = make_fused_substep(cfg, walls=walls, dtype=jnp.float64,
                               interpret=True, tile_y=8)
    got = np.asarray(fused(f, force))
    want, _, _ = ref.lb_substep(f, force, cfg.tau, cfg.tau2, walls,
                                forcing="trt_split")
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-12, atol=1e-15)


def test_fused_multi_step_float32_accuracy():
    # 20 steps f32 fused vs f64 oracle on a small channel with force.
    ydim, xdim = 32, 128
    cfg = SimConfig(c_num=2, c_space=64, ydim=ydim, dtype="float64")
    f64, force64 = _random_state(ydim, xdim, jnp.float64)
    fused32 = make_fused_substep(cfg, dtype=jnp.float32, interpret=True,
                                 tile_y=8)
    f32 = f64.astype(jnp.float32)
    for _ in range(20):
        f64, _, _ = ref.lb_substep(f64, force64, cfg.tau, cfg.tau2,
                                   ref.REFERENCE_WALLS, forcing="trt_split")
        f32 = fused32(f32, force64)
    rel = float(jnp.linalg.norm(f32.astype(jnp.float64) - f64)
                / jnp.linalg.norm(f64))
    assert rel < 1e-5, rel


def test_halo_band_variant_matches_oracle():
    # Non-pipelined (halo-band) kernel variant.
    ydim, xdim = 32, 256
    cfg = SimConfig(c_num=2, c_space=xdim // 2, ydim=ydim, dtype="float64")
    f, force = _random_state(ydim, xdim, jnp.float64)
    fused = make_fused_substep(cfg, dtype=jnp.float64, interpret=True,
                               tile_y=8, pipeline=False)
    got = np.asarray(fused(f, force))
    want, _, _ = ref.lb_substep(f, force, cfg.tau, cfg.tau2,
                                ref.REFERENCE_WALLS, forcing="trt_split")
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-12, atol=1e-15)


def test_pipelined_band_smaller_than_grid():
    # force band < ydim: tiles above the band must see exactly zero force.
    ydim, xdim = 64, 128
    cfg = SimConfig(c_num=2, c_space=64, ydim=ydim, length=16,
                    dtype="float64")  # force_band = 48 < 64
    assert cfg.force_band == 48
    f, force_full = _random_state(ydim, xdim, jnp.float64)
    force_band = force_full[:, :cfg.force_band, :]
    force_zeropad = jnp.concatenate(
        [force_band,
         jnp.zeros((2, ydim - cfg.force_band, xdim), jnp.float64)], axis=1)
    fused = make_fused_substep(cfg, dtype=jnp.float64, interpret=True,
                               tile_y=16, pipeline=True)
    got = np.asarray(fused(f, force_band))
    want, _, _ = ref.lb_substep(f, force_zeropad, cfg.tau, cfg.tau2,
                                ref.REFERENCE_WALLS, forcing="trt_split")
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-12, atol=1e-15)


def test_pipelined_bf16_storage_interpret():
    # bf16 deviatoric storage with f32 in-kernel compute.
    ydim, xdim = 32, 256
    cfg = SimConfig(c_num=2, c_space=xdim // 2, ydim=ydim,
                    dtype="bfloat16")
    f32, force = _random_state(ydim, xdim, jnp.float32)
    w = jnp.asarray(np.asarray(W, np.float32))[:, None, None]
    fdev = (f32 - w).astype(jnp.bfloat16)
    force = force[:, :cfg.force_band, :].astype(jnp.float32)
    fused = make_fused_substep(cfg, dtype=jnp.bfloat16, interpret=True,
                               tile_y=16, pipeline=True,
                               storage="deviatoric")
    raw = fused(fdev, force)
    assert raw.dtype == jnp.bfloat16  # storage dtype round-trips
    got = np.asarray(raw).astype(np.float32)
    # oracle in f32 on the dequantized state
    fullforce = jnp.concatenate(
        [force, jnp.zeros((2, ydim - cfg.force_band, xdim), jnp.float32)], 1)
    want, _, _ = ref.lb_substep(
        fdev.astype(jnp.float32), fullforce, cfg.tau, cfg.tau2,
        ref.REFERENCE_WALLS, forcing="trt_split", storage="deviatoric")
    # bf16 output rounding only: ~0.4% relative on the deviations
    np.testing.assert_allclose(got, np.asarray(want), rtol=0, atol=3e-3)
