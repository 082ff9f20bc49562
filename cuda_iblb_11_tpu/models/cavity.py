"""Lid-driven cavity — validation config 2.

All four walls halfway bounce-back; the top lid moves with velocity u_lid
(bounce-back with wall-momentum correction).  Relaxation time from the
Reynolds number: nu = u_lid * N / Re, tau = 3 nu + 1/2.  Steady-state
centreline profiles are compared against the classic Ghia, Ghia & Shin (1982)
benchmark values in the tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cuda_iblb_11_tpu.core.lattice import RHO_0, W
from cuda_iblb_11_tpu.ops import reference as ref


class LidDrivenCavity:
    def __init__(self, n=64, re=100.0, u_lid=0.1, dtype=jnp.float64):
        self.n = n
        self.re = re
        self.u_lid = u_lid
        nu = u_lid * n / re
        self.tau = 3.0 * nu + 0.5
        self.tau2 = 1.0 / (12.0 * (self.tau - 0.5)) + 0.5
        self.dtype = jnp.dtype(dtype)
        self.walls = ref.WallSpec(
            bottom="noslip", top="moving", left="noslip", right="noslip",
            u_wall=(u_lid, 0.0),
        )
        self.force = jnp.zeros((2, n, n), self.dtype)

    def init_f(self):
        return jnp.broadcast_to(
            (RHO_0 * W).astype(self.dtype)[:, None, None], (9, self.n, self.n)
        ).copy()

    @partial(jax.jit, static_argnums=(0, 2))
    def run(self, f, n_steps):
        def body(_, f):
            f_new, _, _ = ref.lb_substep(
                f, self.force, self.tau, self.tau2, self.walls)
            return f_new
        return jax.lax.fori_loop(0, n_steps, body, f)

    def centreline_profiles(self, f):
        """(u_x along the vertical centreline / u_lid,
            u_y along the horizontal centreline / u_lid)."""
        _, u = ref.moments(f)
        ux = u[0, :, self.n // 2] / self.u_lid
        uy = u[1, self.n // 2, :] / self.u_lid
        return ux, uy
