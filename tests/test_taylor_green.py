"""Taylor-Green vortex viscous decay — analytic validation of the
collision operator's transport coefficient.

The 2-D Taylor-Green vortex
    u_x = -U0 cos(k x) sin(k y),   u_y = U0 sin(k x) cos(k y)
is an exact Navier-Stokes solution on a fully periodic box: the shape is
stationary and the amplitude decays as exp(-2 nu k^2 t) per wavenumber
axis, i.e. kinetic energy ~ exp(-4 nu k^2 t).  For D2Q9 TRT the shear
viscosity is set by the EVEN relaxation time, nu = c_s^2 (tau - 1/2)
(the reference derives TAU from Re this way, main.cu:320), with the
kernels' truncated sound speed CS_KERNEL = 0.57735
(LatticeBoltzmann.cu:11).

This pins the tau <-> nu relation quantitatively — the channel/cavity
benchmarks validate profiles, this one validates the DYNAMICS (decay
RATE) against a closed form.  None of it exists in the reference (it has
no tests at all, SURVEY.md section 4)."""

import numpy as np
import pytest

from cuda_iblb_11_tpu.core.lattice import CS_KERNEL
from cuda_iblb_11_tpu.ops import reference as ref


@pytest.mark.parametrize("tau", [0.8, 1.2])
def test_taylor_green_decay_rate(tau):
    import jax.numpy as jnp

    n = 64
    u0 = 0.01  # Ma ~ 0.017: compressibility error ~ Ma^2 ~ 3e-4
    k = 2.0 * np.pi / n
    y, x = np.meshgrid(np.arange(n, dtype=np.float64),
                       np.arange(n, dtype=np.float64), indexing="ij")
    u = np.stack([-u0 * np.cos(k * x) * np.sin(k * y),
                  u0 * np.sin(k * x) * np.cos(k * y)])
    rho = jnp.ones((n, n), jnp.float64)
    f = ref.equilibrium(rho, jnp.asarray(u), storage="raw")
    walls = ref.WallSpec(bottom="periodic", top="periodic")
    force = jnp.zeros((2, n, n), jnp.float64)
    # TRT odd relaxation at the reference's magic Lambda = 1/12
    # (main.cu:321); the decay rate must NOT depend on it
    tau2 = 1.0 / (12.0 * (tau - 0.5)) + 0.5

    import functools

    import jax

    @functools.partial(jax.jit, static_argnums=1)
    def run(f, steps):
        def body(f, _):
            f, _, _ = ref.lb_substep(f, force, tau, tau2, walls,
                                     forcing="trt_split")
            return f, None

        f, _ = jax.lax.scan(body, f, None, length=steps)
        return f

    def energy(f):
        _, uu = ref.moments(f)
        return float(jnp.sum(uu[0] ** 2 + uu[1] ** 2))

    # skip the kinetic-init transient (f = f0 lacks the non-equilibrium
    # stress; it develops within a few relaxation times), then fit the
    # log-energy slope over a window where a decade has NOT yet decayed
    f = run(f, 50)
    e0 = energy(f)
    steps = 200
    f = run(f, steps)
    e1 = energy(f)
    rate = -np.log(e1 / e0) / steps
    nu = CS_KERNEL ** 2 * (tau - 0.5)
    rate_exact = 4.0 * nu * k ** 2
    assert abs(rate / rate_exact - 1.0) < 0.02, (
        f"tau={tau}: measured decay {rate:.6e} vs analytic "
        f"{rate_exact:.6e} ({rate / rate_exact:.4f}x)")

    # and the vortex SHAPE is stationary: velocity stays proportional to
    # the initial pattern (normalized correlation ~ 1)
    _, uu = ref.moments(f)
    a = np.asarray(uu).ravel()
    b = u.ravel()
    corr = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert corr > 0.9999, corr
