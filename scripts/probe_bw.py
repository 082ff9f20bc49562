"""TPU HBM bandwidth probes for the fused-kernel design space.

Measures achieved combined (read+write) HBM bandwidth for several access
patterns to establish the roofline the D2Q9 step kernel can target on this
chip.  Diagnostics only — not part of the package.  Timing uses chained
calls + a final value fetch (block_until_ready can return early through the
axon tunnel; see docs/perf_notes).

Every timed dispatch through the tunnel carries a FIXED ~24 ms cost
(dispatch + scalar fetch; measured by the `dispatch overhead` probe and
recorded in the JSON).  The r3 version of this script looped only 30
iterations per dispatch, so that fixed cost inflated every per-iteration
time by ~0.8 ms and the whole table read ~3x LOW (plain copies "155-218
GB/s" on a chip that actually streams ~650 GB/s).  ITERS=3000 keeps the
bias under ~2%; the probes plateau 550 -> 625 -> 650 GB/s at
300/1000/3000 iterations.
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
ITERS = 3000


def bench(fn, x, bytes_per_call, iters=ITERS, name=""):
    """One jitted on-device fori_loop of `iters` applications: the fixed
    ~24 ms per-dispatch tunnel cost must be amortized below the noise
    floor (at 3000 x ~0.5 ms/iter it is ~1.6% of the window)."""
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


def dispatch_overhead_ms():
    """Fixed cost of one dispatch + scalar fetch through the tunnel (the
    quantity the looped probes amortize away; bench.py sizes its timed
    windows so this stays <2%)."""
    f = jax.jit(lambda s: s + 1.0)
    s = f(jnp.float32(0.0))
    _ = float(s)
    best = float("inf")
    for _i in range(5):
        t0 = time.perf_counter()
        s = f(s)
        _ = float(s)
        best = min(best, time.perf_counter() - t0)
    print(f"{'dispatch overhead (tiny op + fetch)':48s} {best*1e3:8.3f} ms")
    return best * 1e3


_STEP_SIM = None


def step_kernel_implied_gbs():
    """Implied combined HBM bandwidth of the production single-step fused
    kernel at 2048^2 (f32 deviatoric): each site update moves 72 bytes at
    minimum (9 f reads + 9 f writes x 4 B; moments/equilibrium/forcing
    live in registers/VMEM), so implied GB/s = MLUPS * 72e6 / 1e9."""
    from cuda_iblb_11_tpu.core.config import SimConfig
    from cuda_iblb_11_tpu.models.mucociliary import MucociliarySim

    global _STEP_SIM
    if _STEP_SIM is None:
        cfg = SimConfig(c_num=16, c_space=128, ydim=2048, dtype="float32")
        # one sim for all reps: jit caches on the (static) sim object
        _STEP_SIM = MucociliarySim(cfg, backend="pallas")
    sim = _STEP_SIM
    cfg = sim.cfg
    n = 2048  # ~2.3 s of device time: the ~24 ms dispatch cost is ~1%
    # warm with the SAME chunk length: _run_scan compiles per n_steps, so
    # a different warm length would time a fresh compile
    st = sim.run_chunk(sim.init_state(), n)
    _ = float(st.q)
    t0 = time.perf_counter()
    st = sim.run_chunk(st, n)
    _ = float(st.q)
    dt = (time.perf_counter() - t0) / n
    mlups = cfg.size / dt / 1e6
    gbs = mlups * 72e6 / 1e9
    print(f"{'fused step kernel (implied @72 B/site)':48s} "
          f"{dt*1e3:8.3f} ms  {gbs:7.1f} GB/s combined "
          f"({mlups:.0f} MLUPS)")
    return gbs


def build_probes():
    """(name, jitted_fn) list, built once so repeated reps reuse the
    compiled executables."""
    def xla_copy(v):
        return v * 1.0000001

    items = [("XLA elementwise scale", jax.jit(xla_copy))]
    for ty in (32, 64, 128, 256):
        items.append((f"pallas auto-pipelined copy ty={ty}",
                      make_pallas_copy(ty)))
    items.append(("pallas copy ty=128 parallel-sem",
                  make_pallas_copy(128, semantics="parallel")))
    items.append(("pallas copy ty=128 arbitrary-sem",
                  make_pallas_copy(128, semantics="arbitrary")))
    items.append(("pallas scale ty=128",
                  make_pallas_copy(128, kern=scale_kernel)))
    items.append(("pallas copy ty=128 io-aliased",
                  make_pallas_copy(128, alias=True)))
    # aliased + real VPU compute: does arithmetic forfeit the aliased
    # same-buffer stream rate?  (directly predictive for the in-place
    # fused step kernel)
    items.append(("pallas scale ty=128 io-aliased",
                  make_pallas_copy(128, kern=scale_kernel, alias=True)))
    for ty, depth in ((64, 2), (64, 3), (128, 2), (128, 3), (256, 2)):
        items.append((f"pallas manual DMA ty={ty} depth={depth}",
                      make_manual_dma_copy(ty, depth)))
    return items


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    reps = 1
    out_json = None
    if "--json" in sys.argv:
        # N repetitions of the whole suite; median/min/max per pattern to
        # validation/bandwidth.json (VERDICT r3 item 6: the roofline
        # argument must cite a committed table with spread, not a one-off
        # number — probes vary +-30% between days on this shared chip)
        i = sys.argv.index("--json")
        reps = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 5
        out_json = _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)), "..",
            "validation", "bandwidth.json")

    x = jnp.zeros((NP, Y, X), jnp.float32) + 0.1
    nbytes = 2 * NP * Y * X * 4  # read + write
    items = build_probes()
    runs = {name: [] for name, _ in items}
    runs["fused step kernel (implied @72 B/site)"] = []
    overhead = []
    for rep in range(reps):
        if reps > 1:
            print(f"--- rep {rep + 1}/{reps} ---")
        for name, fn in items:
            # io-aliased probe donates its input; give it its own buffer
            arg = (jnp.zeros((NP, Y, X), jnp.float32) + 0.1
                   if "io-aliased" in name else x)
            runs[name].append(bench(fn, arg, nbytes, name=name))
        runs["fused step kernel (implied @72 B/site)"].append(
            step_kernel_implied_gbs())
        overhead.append(dispatch_overhead_ms())

    if out_json:
        import json
        import statistics

        table = {
            name: {
                "median_gbs": round(statistics.median(v), 1),
                "min_gbs": round(min(v), 1),
                "max_gbs": round(max(v), 1),
                "runs": [round(g, 1) for g in v],
            }
            for name, v in runs.items()
        }
        payload = {
            "date": time.strftime("%Y-%m-%d"),
            "device": str(jax.devices()[0]),
            "reps": reps,
            "iters_per_dispatch": ITERS,
            "dispatch_overhead_ms": {
                "median": round(statistics.median(overhead), 1),
                "min": round(min(overhead), 1),
                "max": round(max(overhead), 1),
            },
            "shape": f"[{NP}, {Y}, {X}] f32, read+write",
            "patterns": table,
        }
        with open(out_json, "w") as fh:
            json.dump(payload, fh, indent=1)
        print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
