"""Machine-check of the _temporal_kernel / _ghost_temporal_kernel mirror.

ops/pallas_step._ghost_temporal_kernel is a deliberate copy of
_temporal_kernel's pipeline (assemble/rings/DMA/flux) with runtime shard
flags added; the MIRROR comment there requires any pipeline fix to be
applied to both.  This test turns that contract into CI: the ghost kernel
run in a one-shard configuration (whole domain as the local block,
is_owner=1, is_top=1, NaN-filled ghost row blocks) must produce
BIT-IDENTICAL bulk rows and flux partials to the plain temporal kernel on
the same inputs.

The NaN ghosts additionally prove the overlapped-trapezoid containment:
edge garbage creeps one row per sub-step and must never reach an owned row
(a leak would surface as a NaN mismatch against the ghost-free kernel).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cuda_iblb_11_tpu.core.config import SimConfig
from cuda_iblb_11_tpu.core.lattice import W
from cuda_iblb_11_tpu.models.mucociliary import MucociliarySim
from cuda_iblb_11_tpu.ops.pallas_step import (
    make_ghost_temporal_substep, make_temporal_bulk_substep,
)

CFG = SimConfig(c_num=4, c_space=48, dtype="float64", storage="raw")


def _inputs(K):
    """Realistic bulk state (8 oracle steps) + plausible per-sub-step seam
    halos (any finite values exercise the mirror identically)."""
    sim = MucociliarySim(CFG, backend="jnp")
    st = sim.run_chunk(sim.init_state(), 8)
    rng = np.random.default_rng(7)
    bhalos = np.zeros((K, 9, 8, CFG.xdim))
    for s in range(K):
        for d in range(9):
            bhalos[s, d, 0] = float(W[d]) * (
                1.0 + 1e-3 * rng.standard_normal(CFG.xdim))
    return st.f, jnp.asarray(bhalos)


@pytest.mark.parametrize("K,ghost_ty", [(2, 16), (4, 16), (4, 8)])
def test_ghost_kernel_bit_equals_temporal_kernel(K, ghost_ty):
    # ghost_ty=8 exercises the pad != tile variant (two ghost tiles per
    # side), the VMEM fallback used at XDIM=8192
    band = CFG.force_band
    ydim = CFG.ydim
    f_full, bhalos = _inputs(K)

    bulk = make_temporal_bulk_substep(CFG, ydim - band, K,
                                      dtype=jnp.float64, tile_y=16)
    f_bulk_new, flux_bulk = bulk(f_full[:, band:], bhalos)

    ghost = make_ghost_temporal_substep(CFG, ydim, K, dtype=jnp.float64,
                                        tile_y=ghost_ty)
    pad = ghost.pad
    nan_ghost = jnp.full((9, pad, CFG.xdim), jnp.nan, jnp.float64)
    # [inject, is_top, j_seam, flux_lane, flux_owned]:
    # owns the whole band, the top wall, and the flux column
    flags = jnp.array([1, 1, (pad + band) // ghost.ty,
                       CFG.flux_x, 1], jnp.int32)
    f_block, flux_ghost = ghost(flags, f_full, nan_ghost, nan_ghost, bhalos)

    got = np.asarray(f_block[:, pad + band:pad + ydim])
    np.testing.assert_array_equal(got, np.asarray(f_bulk_new))
    assert np.isfinite(got).all()  # NaN trapezoid stayed inside the pad
    if ghost_ty == 16:
        # same 16-row tile grouping -> bit-identical flux partials
        np.testing.assert_array_equal(np.asarray(flux_ghost),
                                      np.asarray(flux_bulk))
    else:
        # 8-row tiles re-associate the per-tile row sums: round-off only
        np.testing.assert_allclose(np.asarray(flux_ghost),
                                   np.asarray(flux_bulk), rtol=1e-13)
