"""Diagnostics-only helpers shared by bench.py and scripts/probe_alias.py.

The in-place (input_output_aliases) fused kernels' correctness rests on
Mosaic's pipeline scheduling (ops/pallas_step.py: the last read of an
input region completes a full grid step before that region's output
flush).  That property is re-proven against the CURRENT toolchain by an
A/B bit-equality check (VERDICT r4 item 3: a JAX/Mosaic upgrade could
silently break the lag assumption; interpret-mode CI cannot catch a
real DMA race) — bench.py runs it every driver round and records
`alias_bit_identical` in its diag.

The package API deliberately has no aliasing toggle (aliased is simply
correct); the non-aliased build exists only through this scoped patch.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def no_aliasing():
    """Scoped: make pl.pallas_call drop input_output_aliases.

    The kernel module binds `pl` by module reference, so patching the
    attribute is enough; restored unconditionally."""
    from jax.experimental import pallas as pl

    real = pl.pallas_call

    def patched(*a, **kw):
        kw.pop("input_output_aliases", None)
        return real(*a, **kw)

    pl.pallas_call = patched
    try:
        yield
    finally:
        pl.pallas_call = real


def alias_bit_check(steps: int = 64):
    """Run the aliased and alias-stripped single-step fused kernels
    `steps` steps from the same initial state on a small grid and
    compare every bit.  Returns (bit_identical: bool, rel_l2_vs_oracle:
    float) — the second number is the kernel-vs-jnp-oracle f32 drift,
    measured so a raw-accuracy regression is visible in the same record.
    TPU only (the aliasing question is about real DMA ordering)."""
    import jax.numpy as jnp

    from cuda_iblb_11_tpu.core.config import SimConfig
    from cuda_iblb_11_tpu.models.mucociliary import MucociliarySim

    cfg = SimConfig(c_num=2, c_space=128, ydim=256, dtype="float32")
    sa = MucociliarySim(cfg, backend="pallas")
    with no_aliasing():
        sn = MucociliarySim(cfg, backend="pallas")
    so = MucociliarySim(cfg, backend="jnp")
    a = sa.run_chunk(sa.init_state(), steps)
    n = sn.run_chunk(sn.init_state(), steps)
    o = so.run_chunk(so.init_state(), steps)
    bit_identical = bool(jnp.all(a.f == n.f)) and bool(a.q == n.q)
    rel = float(jnp.linalg.norm(a.f - o.f) / jnp.linalg.norm(o.f))
    return bit_identical, rel
