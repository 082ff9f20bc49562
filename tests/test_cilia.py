"""Cilia kinematics vs an independent scalar transcription of the
define_filament / boundary_check math (main.cu:77-252)."""

import jax.numpy as jnp
import numpy as np

from cuda_iblb_11_tpu.core.config import SimConfig
from cuda_iblb_11_tpu.core.lattice import PI_REF
from cuda_iblb_11_tpu.models.cilia import (
    BEAT_SCALE, CiliaModel, FINE_SAMPLES, PATTERNS, node_arclengths,
)

CFG = SimConfig(c_num=4, c_space=48)  # XDIM = 192


def scalar_position(it, m, arcl, cfg, pattern="no_mucus"):
    """Direct evaluation of main.cu:100-145 for one sample."""
    a_mn, b_mn = PATTERNS[pattern]
    total = it + m * cfg.p_step
    phase = cfg.T if total == cfg.T else total % cfg.T
    offset = (m - (cfg.c_num - 1) / 2.0) * cfg.c_space
    pos = np.zeros(2)
    for c in range(2):
        a = np.zeros(7)
        b = np.zeros(7)
        for n in range(7):
            for p in range(3):
                a[n] += a_mn[p, c, n] * arcl ** (p + 1)
                b[n] += b_mn[p, c, n] * arcl ** (p + 1)
        val = BEAT_SCALE * a[0] * 0.5
        for n in range(1, 7):
            val += BEAT_SCALE * (
                a[n] * np.cos(n * 2.0 * PI_REF * phase / cfg.T)
                + b[n] * np.sin(n * 2.0 * PI_REF * phase / cfg.T)
            )
        pos[c] = val
    pos[0] += offset
    return pos


def test_node_arclengths_within_reference_tolerance():
    arcl = node_arclengths(96)
    j = np.arange(96)
    # The reference's selection criterion (main.cu:162): |111*arcl - j| < 0.01.
    assert np.all(np.abs(BEAT_SCALE * arcl - j) < 0.01)
    # And each is a genuine fine-sample arc length k/9600.
    k = arcl * FINE_SAMPLES
    np.testing.assert_allclose(k, np.rint(k), atol=1e-9)


def test_positions_match_scalar():
    model = CiliaModel(CFG, dtype=jnp.float64)
    arcl = node_arclengths(CFG.length)
    for it in [0, 17, 12345]:
        pos = np.asarray(model.positions(jnp.int32(it)))
        for m in [0, 2, 3]:
            for j in [0, 1, 47, 95]:
                expected = scalar_position(it, m, arcl[j], CFG)
                np.testing.assert_allclose(pos[m, j], expected, rtol=1e-10,
                                           err_msg=f"it={it} m={m} j={j}")


def test_metachronal_phase_shift():
    # Cilium m at it equals cilium 0 at it + m*p_step (mod T).
    model = CiliaModel(CFG, dtype=jnp.float64)
    pos_a = np.asarray(model.positions(jnp.int32(100)))
    pos_b = np.asarray(model.positions(jnp.int32(100 + CFG.p_step)))
    np.testing.assert_allclose(
        pos_b[0, :, 1], pos_a[1, :, 1], rtol=1e-12
    )  # y identical; x differs by the base offset
    np.testing.assert_allclose(
        pos_b[0, :, 0] - model.offsets[0], pos_a[1, :, 0] - model.offsets[1],
        rtol=1e-9, atol=1e-12,
    )


def test_velocity_backward_difference_and_it0():
    model = CiliaModel(CFG, dtype=jnp.float64)
    lasts = jnp.zeros((CFG.c_num, CFG.length, 2), jnp.float64)
    pos0, vel0, lasts = model.kinematics(jnp.int32(0), lasts)
    assert np.all(np.asarray(vel0) == 0.0)  # main.cu:200-204
    pos1, vel1, _ = model.kinematics(jnp.int32(1), lasts)
    # velocities are evaluated via the cancellation-free trig identity;
    # the position difference itself carries ~1e-11 relative f64
    # cancellation error (positions ~100, difference ~1e-3), so the two
    # agree only to ~1e-8 relative — the identity is the MORE accurate one.
    np.testing.assert_allclose(
        np.asarray(vel1), np.asarray(pos1 - pos0), rtol=1e-6, atol=1e-12
    )


def test_placement_wrap_and_mask():
    model = CiliaModel(CFG, dtype=jnp.float64)
    lasts = jnp.zeros((CFG.c_num, CFG.length, 2), jnp.float64)
    s, u_s, eps, _ = model.boundary_state(jnp.int32(0), lasts)
    s = np.asarray(s)
    assert s.shape == (CFG.ns, 2)
    # All x placed within [0, XDIM] after the single wrap (main.cu:193-196).
    assert np.all(s[:, 0] >= 0) and np.all(s[:, 0] <= CFG.xdim)
    # y = beat y + 1 (main.cu:198); base node sits at y=1.
    assert abs(s[0, 1] - 1.0) < 1e-9
    eps = np.asarray(eps)
    assert set(np.unique(eps)).issubset({0, 1})
    # r_max = 2*96/48 = 4: masking looks at up to 3 cilia to the left.
    assert model.r_max == 4


def test_eps_matches_bruteforce_rule():
    # Scalar transcription of the boundary_check masking loop
    # (main.cu:218-248): node j of cilium m is off iff within <1 lattice
    # unit (both axes) of any node of cilia m-1..m-(r_max-1) (cyclic).
    model = CiliaModel(CFG, dtype=jnp.float64)
    lasts = jnp.zeros((CFG.c_num, CFG.length, 2), jnp.float64)
    for it in [0, 123]:
        s, _, eps, _ = model.boundary_state(jnp.int32(it), lasts)
        s = np.asarray(s).reshape(CFG.c_num, CFG.length, 2)
        eps = np.asarray(eps).reshape(CFG.c_num, CFG.length)
        r_max = 2 * CFG.length // CFG.c_space
        expected = np.ones_like(eps)
        for m in range(CFG.c_num):
            for j in range(CFG.length):
                for r in range(1, r_max):
                    other = s[(m - r) % CFG.c_num]
                    close = (np.abs(other[:, 0] - s[m, j, 0]) < 1) & (
                        np.abs(other[:, 1] - s[m, j, 1]) < 1
                    )
                    if close.any():
                        expected[m, j] = 0
        np.testing.assert_array_equal(eps, expected, err_msg=f"it={it}")
        # The beat envelope (~96 lu) exceeds the 48-lu spacing, so overlap
        # masking must actually deactivate some points.
        assert eps.min() == 0 and eps.max() == 1


def test_mucus_pattern_variant():
    # The mucus-loaded coefficient set (commented out in the reference,
    # main.cu:36-54) is exposed as an alternative beat pattern.
    m_air = CiliaModel(CFG, dtype=jnp.float64, pattern="no_mucus")
    m_muc = CiliaModel(CFG, dtype=jnp.float64, pattern="mucus")
    p_air = np.asarray(m_air.positions(jnp.int32(100)))
    p_muc = np.asarray(m_muc.positions(jnp.int32(100)))
    assert p_air.shape == p_muc.shape
    assert np.max(np.abs(p_air - p_muc)) > 1.0  # genuinely different beat
    # mucus filament is still a sane, bounded shape
    assert np.all(np.isfinite(p_muc))
    d = np.linalg.norm(np.diff(p_muc, axis=1), axis=-1)
    assert d.max() < 3.0
