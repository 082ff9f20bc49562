"""Documents the reference scheme's IB stability boundary.

The committed CUDA applies the Guo prefactor (1 - 1/(2 TAU)) to every
population (LatticeBoltzmann.cu:56) while TRT relaxes odd moments with
omega- = 1/TAU2.  Chapman-Enskog gives an effective body force
g_eff = g (1 + (omega- - omega+)/2) ~ 1.75 g at the default tau = 2.8068,
which makes the direct-forcing IB feedback loop linearly unstable where
boundary nodes are closer than ~1 lattice unit (the beat pattern produces
spacings down to ~0.73).  The TRT-consistent split (odd part weighted by
(1 - omega-/2)) restores g_eff = g and is stable.

Circumstantial evidence that the committed code never produced the golden
data: Data/Nominals/SimLog_nom.txt contains "Spatial discretisation error"
and "Net Q =" lines that the current main.cu does not write (commented out /
absent at main.cu:778-780, 1049-1057).
"""

import jax.numpy as jnp
import numpy as np

from cuda_iblb_11_tpu.ops import ib
from cuda_iblb_11_tpu.ops import reference as ref

TAU = 2.8068  # SimConfig() default
TAU2 = 1.0 / (12.0 * (TAU - 0.5)) + 0.5


def _run_static_filament(forcing, n_steps=60, spacing=0.73):
    """Static dense filament in a periodic box, impulse perturbation;
    returns |u|_max history."""
    ydim = xdim = 64
    n = 40
    s = jnp.stack(
        [jnp.full((n,), 32.2),
         10 + spacing * jnp.arange(n, dtype=jnp.float64)], axis=1)
    u_s = jnp.zeros((n, 2))
    eps = jnp.ones((n,), jnp.int32)
    u0 = jnp.zeros((2, ydim, xdim)).at[0, 25, 32].set(1e-4)
    f = ref.equilibrium(jnp.ones((ydim, xdim)), u0)
    force = jnp.zeros((2, ydim, xdim))
    walls = ref.WallSpec()
    hist = []
    for _ in range(n_steps):
        f, rho, u = ref.lb_substep(f, force, TAU, TAU2, walls, forcing=forcing)
        f_s = ib.interpolate(rho, u, s, u_s)
        force = ib.spread(f_s, s, eps, xdim, ydim)
        hist.append(float(jnp.max(jnp.abs(u))))
    return np.array(hist)


def test_reference_forcing_is_unstable_at_default_tau():
    hist = _run_static_filament("reference")
    # perturbation grows by orders of magnitude instead of decaying
    assert hist[-1] > 50 * hist[9], (hist[9], hist[-1])


def test_trt_split_forcing_is_stable():
    hist = _run_static_filament("trt_split")
    assert hist[-1] < 0.2 * hist[9], (hist[9], hist[-1])
    assert np.all(np.isfinite(hist))


def test_trt_split_matches_reference_when_degenerate():
    # With tau2 == tau the split is identical to the reference prefactor.
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.uniform(-0.02, 0.02, (2, 4, 4)))
    force = jnp.asarray(rng.uniform(-1e-3, 1e-3, (2, 4, 4)))
    f_ref = ref.guo_forcing(u, force, 1.1, scheme="reference")
    f_split = ref.guo_forcing(u, force, 1.1, 1.1, scheme="trt_split")
    np.testing.assert_allclose(np.asarray(f_ref), np.asarray(f_split),
                               rtol=1e-12, atol=1e-18)
