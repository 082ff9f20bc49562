"""Body-force-driven channel (Poiseuille) — validation config 1.

Pure D2Q9 TRT with a constant body force and no immersed boundary; the
steady-state x-velocity profile is parabolic.  With halfway bounce-back the
effective walls sit half a cell outside the first/last fluid rows, so for
YDIM rows the channel half-width is H/2 = YDIM/2 and the wall positions are
y = -0.5 and y = YDIM - 0.5.

Analytic profile: u_x(y) = g_eff/(2 nu) * ((H/2)^2 - (y - y_c)^2) with
nu = cs^2 (tau - 1/2), cs^2 = 1/3, y_c = (YDIM - 1)/2.

REFERENCE-SCHEME PROPERTY (derived, verified numerically to 4 digits at
tau = 0.8/1.0/1.5/2.0): the reference applies the Guo forcing prefactor
(1 - 1/(2 TAU)) = (1 - omega+/2) to ALL populations (LatticeBoltzmann.cu:56)
while TRT relaxes the odd (momentum-carrying) part with omega- = 1/TAU2.
The Chapman-Enskog momentum source is lambda*g from the explicit term plus
(omega-/2)*g from the relaxation of the half-force velocity shift, i.e.

    g_eff = g * (1 + (omega- - omega+)/2)

instead of Guo's intended g (which needs lambda = 1 - omega-/2 on the odd
part).  At the reference's default tau=2.8068 the IB force is therefore
amplified ~1.75x in the momentum equation.  We replicate the behaviour
exactly and fold the factor into the analytic comparison.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cuda_iblb_11_tpu.core.lattice import RHO_0, W
from cuda_iblb_11_tpu.ops import reference as ref


class PoiseuilleChannel:
    def __init__(self, xdim=32, ydim=32, tau=1.0, body_force=1e-6,
                 dtype=jnp.float64):
        self.xdim, self.ydim = xdim, ydim
        self.tau = tau
        self.tau2 = 1.0 / (12.0 * (tau - 0.5)) + 0.5  # TRT magic 1/12
        self.dtype = jnp.dtype(dtype)
        self.walls = ref.WallSpec(bottom="noslip", top="noslip")
        self.force = jnp.zeros((2, ydim, xdim), self.dtype).at[0].set(
            jnp.asarray(body_force, self.dtype))
        self.g = body_force

    def init_f(self):
        return jnp.broadcast_to(
            (RHO_0 * W).astype(self.dtype)[:, None, None],
            (9, self.ydim, self.xdim),
        ).copy()

    @partial(jax.jit, static_argnums=(0, 2))
    def run(self, f, n_steps):
        def body(_, f):
            f_new, _, _ = ref.lb_substep(
                f, self.force, self.tau, self.tau2, self.walls)
            return f_new
        return jax.lax.fori_loop(0, n_steps, body, f)

    def profile(self, f):
        """Mean corrected u_x per row."""
        _, u = ref.corrected_velocity(f, self.force)
        return jnp.mean(u[0], axis=1)

    def forcing_amplification(self):
        """g_eff/g for the reference's uniform-prefactor Guo-TRT forcing
        (see module docstring)."""
        omega_p = 1.0 / self.tau
        omega_m = 1.0 / self.tau2
        return 1.0 + (omega_m - omega_p) / 2.0

    def analytic_profile(self):
        y = np.arange(self.ydim, dtype=np.float64)
        nu = (1.0 / 3.0) * (self.tau - 0.5)
        y_c = (self.ydim - 1) / 2.0
        half = self.ydim / 2.0
        g_eff = self.g * self.forcing_amplification()
        return g_eff / (2.0 * nu) * (half**2 - (y - y_c) ** 2)
