"""TPU HBM bandwidth probes for the fused-kernel design space.

Measures achieved combined (read+write) HBM bandwidth for several access
patterns to establish the roofline the D2Q9 step kernel can target on this
chip.  Diagnostics only — not part of the package.  Timing uses chained
calls + a final value fetch (block_until_ready can return early through the
axon tunnel; see docs/perf_notes).
"""

from __future__ import annotations

# allow `python scripts/<this>.py` from anywhere: the package lives at
# the repo root, which is NOT on sys.path when the script dir is
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Y = X = 2048
NP = 9
ITERS = 30


def bench(fn, x, bytes_per_call, iters=ITERS, name=""):
    """One jitted on-device fori_loop of `iters` applications (per-call
    dispatch through the axon tunnel costs ~1 ms and would dominate)."""
    looped = jax.jit(lambda v: jax.lax.fori_loop(
        0, iters, lambda i, w: fn(w), v))
    r = looped(x)
    _ = float(jnp.asarray(r).ravel()[0])
    t0 = time.perf_counter()
    r = looped(r)
    _ = float(jnp.asarray(r).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    gbs = bytes_per_call / dt / 1e9
    print(f"{name:48s} {dt*1e3:8.3f} ms  {gbs:7.1f} GB/s combined")
    return gbs


def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def scale_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 1.0000001


def make_pallas_copy(ty, kern=copy_kernel, alias=False, semantics=None):
    n = Y // ty
    params = {"vmem_limit_bytes": 128 << 20}
    if semantics is not None:
        params["dimension_semantics"] = (semantics,)
    call = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[pl.BlockSpec((NP, ty, X), lambda i: (0, i, 0))],
        out_specs=pl.BlockSpec((NP, ty, X), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((NP, Y, X), jnp.float32),
        input_output_aliases={0: 0} if alias else {},
        compiler_params=pltpu.CompilerParams(**params),
    )
    if alias:
        return jax.jit(call, donate_argnums=0)
    return jax.jit(call)


def make_manual_dma_copy(ty, depth=2):
    """Manual double(+)-buffered DMA copy, mirroring the step kernel's
    pipelined structure (no compute)."""
    n = Y // ty

    def kernel(x_hbm, o_ref, buf, sem):
        i = pl.program_id(0)

        def start(t):
            pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(pl.multiple_of(t * ty, 8), ty), :],
                buf.at[t % depth], sem.at[t % depth]).start()

        def wait(t):
            pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(pl.multiple_of(t * ty, 8), ty), :],
                buf.at[t % depth], sem.at[t % depth]).wait()

        @pl.when(i == 0)
        def _():
            start(0)
            for d in range(1, depth - 1):
                start(d)

        @pl.when(i + depth - 1 <= n - 1)
        def _():
            start(i + depth - 1)

        wait(i)
        o_ref[...] = buf[i % depth]

    call = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((NP, ty, X), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((NP, Y, X), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((depth, NP, ty, X), jnp.float32),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 << 20),
    )
    return jax.jit(call)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    x = jnp.zeros((NP, Y, X), jnp.float32) + 0.1
    nbytes = 2 * NP * Y * X * 4  # read + write

    def xla_copy(v):
        return v * 1.0000001

    bench(jax.jit(xla_copy), x, nbytes, name="XLA elementwise scale")

    for ty in (32, 64, 128, 256):
        bench(make_pallas_copy(ty), x, nbytes,
              name=f"pallas auto-pipelined copy ty={ty}")
    bench(make_pallas_copy(128, semantics="parallel"), x, nbytes,
          name="pallas copy ty=128 parallel-sem")
    bench(make_pallas_copy(128, semantics="arbitrary"), x, nbytes,
          name="pallas copy ty=128 arbitrary-sem")
    bench(make_pallas_copy(128, kern=scale_kernel), x, nbytes,
          name="pallas scale ty=128")
    bench(make_pallas_copy(128, alias=True), x, nbytes,
          name="pallas copy ty=128 io-aliased")
    for ty, depth in ((64, 2), (64, 3), (128, 2), (128, 3), (256, 2)):
        bench(make_manual_dma_copy(ty, depth), x, nbytes,
              name=f"pallas manual DMA ty={ty} depth={depth}")


if __name__ == "__main__":
    main()
