"""Band-matmul IB coupling == stencil gather/scatter coupling (f64)."""

import jax.numpy as jnp
import numpy as np

from cuda_iblb_11_tpu.ops import ib, ib_band

RNG = np.random.default_rng(21)


def _setup(ns=40, ydim=192, xdim=256):
    # points anywhere in the band, including near the periodic x edges
    xs = RNG.uniform(0, xdim, ns)
    ys = RNG.uniform(0.5, 100.0, ns)
    s = jnp.asarray(np.stack([xs, ys], 1))
    u_s = jnp.asarray(0.01 * RNG.standard_normal((ns, 2)))
    eps = jnp.asarray(RNG.integers(0, 2, ns).astype(np.int32))
    rho = 1 + 0.02 * RNG.standard_normal((ydim, xdim))
    u = 0.01 * RNG.standard_normal((2, ydim, xdim))
    from cuda_iblb_11_tpu.ops import reference as ref

    f = ref.equilibrium(jnp.asarray(rho), jnp.asarray(u))
    return f, s, u_s, eps, ydim, xdim


def test_band_interpolate_matches_stencil():
    f, s, u_s, eps, ydim, xdim = _setup()
    want = np.asarray(ib.interpolate_from_f(f, s, u_s))
    got = np.asarray(ib_band.interpolate(f, s, u_s, band=128))
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-14)


def test_band_spread_matches_stencil():
    f, s, u_s, eps, ydim, xdim = _setup()
    f_s = ib.interpolate_from_f(f, s, u_s)
    want = np.asarray(ib.spread(f_s, s, eps, xdim, ydim))
    got_band = ib_band.spread(f_s, s, eps, xdim, band=128)
    got = np.asarray(ib_band.pad_band(got_band, ydim))
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-16)
    # rows above the band are exactly zero in both
    assert np.all(want[:, 128:, :] == 0)


def test_band_handles_periodic_x_edges():
    ydim = xdim = 192
    s = jnp.asarray([[0.2, 50.0], [191.7, 20.0]])
    u_s = jnp.asarray([[0.01, 0.0], [0.0, 0.02]])
    eps = jnp.asarray([1, 1])
    rho = jnp.ones((ydim, xdim))
    from cuda_iblb_11_tpu.ops import reference as ref

    f = ref.equilibrium(rho, jnp.zeros((2, ydim, xdim)))
    f_s = ib.interpolate_from_f(f, s, u_s)
    want = np.asarray(ib.spread(f_s, s, eps, xdim, ydim))
    got = np.asarray(ib_band.pad_band(
        ib_band.spread(f_s, s, eps, xdim, band=128), ydim))
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-16)
    f_s_band = np.asarray(ib_band.interpolate(f, s, u_s, band=128))
    np.testing.assert_allclose(f_s_band, np.asarray(f_s), rtol=1e-11)
