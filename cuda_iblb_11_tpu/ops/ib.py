"""Immersed-boundary coupling: regularized delta, interpolation, spreading, flux.

Replicates CUDA_IBLB_11/ImmersedBoundary.cu with TPU-idiomatic dataflow:

  * ``delta_1d`` — the 3-point Roma/Peskin regularized delta exactly as the
    reference evaluates it, including its truncated 0.33333 / 0.16667
    coefficients (ImmersedBoundary.cu:31-78).  Support radius 1.5 => every
    non-zero weight lies in the 3x3 stencil around nearbyint(point).
  * ``interpolate`` — direct-forcing IB force at each Lagrangian point:
    F_s = sum_{3x3} 2 * delta * rho * (u_s - u)   (ImmersedBoundary.cu:117-128).
    One vectorized gather instead of one CUDA thread per point.
  * ``spread`` — Eulerian force field: force_j = sum_k F_s_k delta eps_k
    (ImmersedBoundary.cu:178-231).  The reference brute-forces O(size*Ns) with
    shared-memory tiling; here it is a scatter-add of Ns 3x3 patches, exact
    because the delta support is 1.5.
  * ``flux_increment`` — net-flow diagnostic: sum of u_x over the column
    x = XDIM-5 divided by 192 (ImmersedBoundary.cu:259-264).  NOTE the
    reference accumulates this into Q every step without ever resetting it
    (main.cu:393), so Q is a cumulative time-integral; we preserve that.

Deviation from the reference (opt-in, via ``x_edge``): the reference's
neighbour indexing does not wrap — ``j = y*XDIM + x`` with x possibly -1 or
XDIM reads a ROW-ALIASED cell in ``interpolate`` (ImmersedBoundary.cu:
119-122: flat index y*XDIM-1 is cell (y-1, XDIM-1)), while ``spread``
iterates real cells against raw (unwrapped) point coordinates and therefore
silently DROPS the periodic images (:178-231).  Since the domain is periodic
in x, the default here (``x_edge="periodic"``) wraps stencil cells
periodically — the physically correct treatment.  Quirk-exact behaviour is
available with ``x_edge="reference"``: interpolation row-aliases exactly as
the flat index does (out-of-buffer reads, which are CUDA UB, are masked
out), spreading drops out-of-range cells.  The difference only affects
points within 1.5 lattice units of the x edges.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cuda_iblb_11_tpu.core.lattice import C

# full-precision f32 contractions on TPU (see ops/ib_band.py:_PREC)
_PREC = jax.lax.Precision.HIGH

# Reference coefficient literals (ImmersedBoundary.cu:36,43).
_A_INNER = 0.33333
_A_OUTER = 0.16667


def delta_1d(r):
    """1-D 3-point regularized delta, reference form (ImmersedBoundary.cu:31-78).

    r <= 0.5:        0.33333 * (1 + sqrt(1 - 3 r^2))
    0.5 < r <= 1.5:  0.16667 * (5 - 3 r - sqrt(-3 (1-r)^2 + 1))
    r > 1.5:         0
    """
    r = jnp.abs(r)
    inner = _A_INNER * (1.0 + jnp.sqrt(jnp.maximum(1.0 - 3.0 * r * r, 0.0)))
    d = 1.0 - r
    outer = _A_OUTER * (
        5.0 - 3.0 * r - jnp.sqrt(jnp.maximum(-3.0 * d * d + 1.0, 0.0))
    )
    return jnp.where(r <= 0.5, inner, jnp.where(r <= 1.5, outer, 0.0))


def _stencil(s, xdim, ydim, x_edge="periodic"):
    """3x3 stencil around nearbyint of each point.

    Returns (xw, yc, weight, valid): x index, y index, the 2-D delta weight
    evaluated at the *unwrapped* cell coordinate, and a mask zeroing invalid
    cells.  The stencil offsets are the 9 lattice vectors, exactly the cells
    the reference's interpolate visits (ImmersedBoundary.cu:117-124).

    x_edge: "periodic" wraps x (default, physically correct);
    "reference_alias" reproduces interpolate's flat ``j = y*XDIM + x``
    row-aliasing (ImmersedBoundary.cu:122; reads outside the buffer are
    masked); "reference_drop" reproduces spread's raw-coordinate test that
    never sees the periodic images (:178-231).
    """
    xs = s[:, 0][:, None]  # [Ns, 1]
    ys = s[:, 1][:, None]
    cx = jnp.asarray(C[:, 0], s.dtype)[None, :]  # [1, 9]
    cy = jnp.asarray(C[:, 1], s.dtype)[None, :]
    x0 = jnp.rint(xs)  # nearbyint: round-half-to-even, same as C nearbyint
    y0 = jnp.rint(ys)
    xi = x0 + cx  # unwrapped cell coordinates [Ns, 9]
    yi = y0 + cy
    w = delta_1d(xi - xs) * delta_1d(yi - ys)
    if x_edge == "periodic":
        valid = (yi >= 0) & (yi <= ydim - 1)
        xw = jnp.mod(xi.astype(jnp.int32), xdim)
        yc = jnp.clip(yi.astype(jnp.int32), 0, ydim - 1)
    elif x_edge == "reference_alias":
        j = yi.astype(jnp.int32) * xdim + xi.astype(jnp.int32)
        valid = (j >= 0) & (j < xdim * ydim)
        j = jnp.clip(j, 0, xdim * ydim - 1)
        yc = j // xdim
        xw = j - yc * xdim
    elif x_edge == "reference_drop":
        valid = ((xi >= 0) & (xi <= xdim - 1)
                 & (yi >= 0) & (yi <= ydim - 1))
        xw = jnp.clip(xi.astype(jnp.int32), 0, xdim - 1)
        yc = jnp.clip(yi.astype(jnp.int32), 0, ydim - 1)
    else:
        raise ValueError(f"unknown x_edge mode {x_edge!r}")
    return xw, yc, w, valid


def _alias_mode(x_edge, kind):
    if x_edge == "periodic":
        return "periodic"
    if x_edge == "reference":
        return "reference_alias" if kind == "interp" else "reference_drop"
    raise ValueError(f"unknown x_edge mode {x_edge!r}")


def interpolate(rho, u, s, u_s, x_edge="periodic"):
    """Direct-forcing IB force at each Lagrangian point.

    rho [Y,X], u [2,Y,X] (uncorrected macro velocity), s [Ns,2], u_s [Ns,2].
    Returns F_s [Ns,2].  (ImmersedBoundary.cu:94-133)
    """
    ydim, xdim = rho.shape
    xw, yc, w, valid = _stencil(s, xdim, ydim, _alias_mode(x_edge, "interp"))
    w = jnp.where(valid, w, 0.0)
    rho_n = rho[yc, xw]                      # [Ns, 9]
    u_n = u[:, yc, xw]                       # [2, Ns, 9]
    diff = u_s.T[:, :, None] - u_n           # [2, Ns, 9]
    return jnp.sum(2.0 * w[None] * rho_n[None] * diff, axis=-1).T  # [Ns, 2]


def interpolate_from_f(f, s, u_s, storage="raw", x_edge="periodic"):
    """Same as :func:`interpolate` but computes the (uncorrected) macro
    moments directly from the distributions at the Ns*9 stencil cells —
    avoids materializing full rho/u fields on the hot path (the reference's
    separate ``macro`` pass, LatticeBoltzmann.cu:375-411, fused away)."""
    _, ydim, xdim = f.shape
    xw, yc, w, valid = _stencil(s, xdim, ydim, _alias_mode(x_edge, "interp"))
    w = jnp.where(valid, w, 0.0)
    f_n = f[:, yc, xw]                       # [9, Ns, 9cells]
    rho_n = jnp.sum(f_n, axis=0)             # [Ns, 9cells]
    if storage == "deviatoric":
        rho_n = 1.0 + rho_n
    c = jnp.asarray(C, f.dtype)
    u_n = jnp.einsum("inm,ic->cnm", f_n, c,
                 precision=_PREC) / rho_n[None]
    diff = u_s.T[:, :, None] - u_n
    return jnp.sum(2.0 * w[None] * rho_n[None] * diff, axis=-1).T


def spread(F_s, s, eps, xdim, ydim, x_edge="periodic"):
    """Eulerian IB force field by scatter-add of 3x3 delta patches.

    F_s [Ns,2], s [Ns,2], eps [Ns] (0/1 overlap mask).  Returns force [2,Y,X].
    Equivalent to the reference's all-pairs loop (ImmersedBoundary.cu:178-231):
    every cell outside a point's 1.5-radius support has exactly zero weight,
    so only the 3x3 patches contribute.
    """
    xw, yc, w, valid = _stencil(s, xdim, ydim, _alias_mode(x_edge, "spread"))
    w = jnp.where(valid, w, 0.0) * eps[:, None].astype(w.dtype)  # [Ns, 9]
    flat_idx = (yc * xdim + xw).reshape(-1)                      # [Ns*9]
    vals = (F_s.T[:, :, None] * w[None]).reshape(2, -1)          # [2, Ns*9]
    force = jnp.zeros((2, ydim * xdim), F_s.dtype)
    force = force.at[:, flat_idx].add(vals)
    return force.reshape(2, ydim, xdim)


def flux_increment(f_new, force_new, flux_x, ydim_divisor=192.0,
                   storage="raw"):
    """Per-step flux sample: sum_y u_x(x=flux_x, y) / 192 with the
    half-force-corrected velocity (ImmersedBoundary.cu:249-264).

    The reference hardcodes the 192 divisor (:261) — kept as a parameter
    with the same default.  `force_new` may be the band-sized force field
    ([2, BAND, X], zero above the band).
    """
    cdt = jnp.promote_types(f_new.dtype, jnp.float32)
    cx = jnp.asarray(C[:, 0], cdt)
    col_f = f_new[:, :, flux_x].astype(cdt)  # [9, Y]
    rho = jnp.sum(col_f, axis=0)
    if storage == "deviatoric":
        rho = 1.0 + rho
    mom_x = jnp.einsum("iy,i->y", col_f, cx, precision=_PREC)
    fcol = force_new[0, :, flux_x].astype(cdt)
    ydim = f_new.shape[1]
    if fcol.shape[0] < ydim:
        fcol = jnp.pad(fcol, (0, ydim - fcol.shape[0]))
    ux = (mom_x + 0.5 * fcol) / rho
    return jnp.sum(ux) / ydim_divisor


def flux_from_cols(fluxcol, force_new, flux_x, ydim_divisor=192.0):
    """Flux sample from KERNEL-EMITTED column partials.

    fluxcol [2, Y, 128] lane 0 holds per-row (rho, mom_x) at the flux
    column (ops/pallas_step.py, emit_moments=True; storage adjustment
    already applied in-kernel).  Combines with the NEW force's half-force
    correction exactly like flux_increment (ImmersedBoundary.cu:249-264)
    without the whole-array lane slice of f."""
    rho = fluxcol[0, :, 0]
    mom_x = fluxcol[1, :, 0]
    fcol = force_new[0, :, flux_x].astype(fluxcol.dtype)
    ydim = rho.shape[0]
    if fcol.shape[0] < ydim:
        fcol = jnp.pad(fcol, (0, ydim - fcol.shape[0]))
    return jnp.sum((mom_x + 0.5 * fcol) / rho) / ydim_divisor
