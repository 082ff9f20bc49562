"""Config 1: body-force Poiseuille channel vs the analytic parabola."""

import numpy as np

from cuda_iblb_11_tpu.models.channel import PoiseuilleChannel


def test_poiseuille_profile():
    ch = PoiseuilleChannel(xdim=16, ydim=32, tau=1.0, body_force=1e-6)
    f = ch.run(ch.init_f(), 8000)
    got = np.asarray(ch.profile(f))
    want = ch.analytic_profile()
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 3e-3, err
    # Symmetry about the channel centre.
    np.testing.assert_allclose(got, got[::-1], rtol=1e-8)
    # No-slip: near-wall velocity far below the peak.
    assert got[0] < 0.1 * got.max()


def test_trt_forcing_amplification_factor():
    # The derived g_eff = g (1 + (w- - w+)/2) law must hold across tau.
    for tau in [0.8, 1.0, 1.5, 2.0]:
        ch = PoiseuilleChannel(xdim=8, ydim=32, tau=tau, body_force=1e-6)
        f = ch.run(ch.init_f(), 20000)
        got = np.asarray(ch.profile(f))
        want = ch.analytic_profile()
        ratio = got.max() / want.max()
        assert abs(ratio - 1.0) < 2e-2, (tau, ratio)


def test_bgk_limit_has_no_amplification():
    ch = PoiseuilleChannel(xdim=8, ydim=32, tau=1.0, body_force=1e-6)
    ch.tau2 = ch.tau  # degenerate TRT == BGK
    f = ch.run(ch.init_f(), 20000)
    got = np.asarray(ch.profile(f))
    nu = (1.0 / 3.0) * (ch.tau - 0.5)
    y = np.arange(ch.ydim, dtype=np.float64)
    y_c = (ch.ydim - 1) / 2.0
    want = ch.g / (2 * nu) * ((ch.ydim / 2) ** 2 - (y - y_c) ** 2)
    assert abs(got.max() / want.max() - 1.0) < 3e-3


def test_poiseuille_mass_conservation():
    ch = PoiseuilleChannel(xdim=16, ydim=32, tau=0.8, body_force=1e-6)
    f0 = ch.init_f()
    f = ch.run(f0, 500)
    # Forcing with u.force != 0 injects the tiny -F_0 mass defect per step
    # (reference quirk); bound it.
    rel = abs(float(f.sum() - f0.sum())) / float(f0.sum())
    assert rel < 1e-6
