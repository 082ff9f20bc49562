"""VPU f32 FLOP-ceiling probe + MFU placement of the production kernel.

Closes the perf story with a number (VERDICT r4 item 5): DESIGN.md's
roofline said the K=16 temporal mode is "VPU-compute-bound" with "unclear
any headroom exists" — a shrug.  This probe makes it falsifiable:

  1. measure the chip's sustained f32 VPU issue rate on VMEM-resident
     data for three op mixes — FMA chains, pure add, pure mul — by the
     SLOPE method: time the same tiled kernel at two in-kernel chain
     lengths and divide the extra flops by the extra time.  This removes
     the two contaminations the naive probe suffers (both measured
     here, r5): a ~0.1 ms per-pallas-call floor plus a ~0.3 ms per-call
     block-copy cost, which capped direct 400-op-chain readings at
     ~1.0-1.7 "TFLOP/s" on a chip whose asymptotic chain rate is
     3.6-4.7;
  2. count the production kernels' arithmetic flops/site by walking the
     jaxpr of THE shared collide expression tree
     (ops/pallas_step._collide_tile) — a machine-derived count, not a
     hand count;
  3. place the measured MLUPS (newest committed bench record) on those
     ceilings: useful-FLOP rate / ceiling = MFU.

Writes validation/vpu_roofline.json (gated by tests/test_vpu_roofline.py).
Run on the TPU host:  python scripts/probe_vpu.py
"""

from __future__ import annotations

# allow `python scripts/<this>.py` from anywhere: the package lives at
# the repo root, which is NOT on sys.path when the script dir is
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "validation", "vpu_roofline.json")

Y, X = 256, 1024   # one VMEM-resident f32 block = 1 MB
GY = 32            # tile rows: the fastest tiling in the r5 block sweep
ITERS = 100        # on-device dispatch loop (fixed ~24 ms tunnel cost < 1%)
R1, R2 = 2000, 6000  # the two chain lengths the slope is taken between


def timed(body):
    def kern(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])

    call = pl.pallas_call(
        kern, grid=(Y // GY,),
        in_specs=[pl.BlockSpec((GY, X), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((GY, X), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Y, X), jnp.float32),
    )
    x = jnp.full((Y, X), 0.999999, jnp.float32)
    looped = jax.jit(lambda v: jax.lax.fori_loop(
        0, ITERS, lambda i, w: call(w), v))
    r = looped(x)
    _ = float(r[0, 0])
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        r = looped(r)
        _ = float(r[0, 0])
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def bench_slope(name, mk):
    """Asymptotic chain rate: extra flops / extra seconds between two
    chain lengths of the same kernel (same block copies, same grid)."""
    b1, f1 = mk(R1)
    b2, f2 = mk(R2)
    t1, t2 = timed(b1), timed(b2)
    tf = Y * X * (f2 - f1) / (t2 - t1) / 1e12
    print(f"{name:20s} slope {tf:6.3f} TFLOP/s  "
          f"(t={t1*1e3:.3f}/{t2*1e3:.3f} ms at {R1}/{R2} chain ops)",
          flush=True)
    return tf


# python floats below are compile-time immediates inside the kernel (a
# traced jnp scalar would be a captured constant, which pallas rejects)

def mk_fma(reps):
    def body(v):
        for _ in range(reps):
            v = v * 1.0000001 + 1e-7
        return v
    return body, 2 * reps


def mk_add(reps):
    def body(v):
        for _ in range(reps):
            v = v + 1e-7
        return v
    return body, reps


def mk_mul(reps):
    def body(v):
        for _ in range(reps):
            v = v * 1.0000001
        return v
    return body, reps


# ---- machine-derived flops/site of the shared collide tree ----------------

_ARITH = {"add": 1, "sub": 1, "mul": 1, "div": 1, "neg": 1, "max": 1,
          "min": 1, "integer_pow": 1}


def count_flops_per_elem(fn, *args):
    """Total arithmetic ops per element across a jaxpr of elementwise math
    on same-shaped operands (broadcast scalars counted at full width —
    every op in the collide tree lands on (r, X) planes)."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    n = 0

    def walk(jx):
        nonlocal n
        for eqn in jx.eqns:
            for sub in (v for v in eqn.params.values()
                        if hasattr(v, "eqns")):
                walk(sub)
            if eqn.primitive.name in _ARITH:
                n += _ARITH[eqn.primitive.name]
    walk(jaxpr.jaxpr)
    return n


def collide_flops():
    from cuda_iblb_11_tpu.core.config import SimConfig
    from cuda_iblb_11_tpu.ops.pallas_step import _collide_tile

    cfg = SimConfig(c_num=16, c_space=128, ydim=2048)
    one = jnp.zeros((1, 1), jnp.float32)

    def bulk(*f):          # zero-force bulk collide (temporal bulk kernel)
        f1, _, _ = _collide_tile(list(f), None, None, tau=cfg.tau,
                                 tau2=cfg.tau2, forcing="trt_split",
                                 storage="deviatoric")
        return f1

    def band(gx, gy, *f):  # forced collide (band/single-step kernels)
        f1, _, _ = _collide_tile(list(f), gx, gy, tau=cfg.tau,
                                 tau2=cfg.tau2, forcing="trt_split",
                                 storage="deviatoric")
        return f1

    n_bulk = count_flops_per_elem(bulk, *([one] * 9))
    n_band = count_flops_per_elem(band, one, one, *([one] * 9))
    return n_bulk, n_band


def identity_collide_decomposition():
    """A/B the production K=16 mode against the same kernels with the
    collide tree replaced by an identity (moments kept for the flux
    path): full-time minus identity-time = the collide arithmetic's
    share of the per-site issue budget; the identity time is the
    streaming-movement + glue floor.  The r3 version of this probe was
    ad hoc; committed here so the decomposition re-measures under any
    toolchain."""
    from cuda_iblb_11_tpu.core.config import SimConfig
    from cuda_iblb_11_tpu.models.mucociliary import MucociliarySim
    from cuda_iblb_11_tpu.ops import pallas_step

    cfg = SimConfig(c_num=16, c_space=128, ydim=2048, dtype="float32")
    steps = 6144

    def run(sim):
        st = sim.run_chunk(sim.init_state(), steps)
        _ = float(st.q)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            st = sim.run_chunk(st, steps)
            _ = float(st.q)
            best = min(best, time.perf_counter() - t0)
        return cfg.size * steps / best / 1e6

    full = run(MucociliarySim(cfg, backend="pallas", temporal=16))

    orig = pallas_step._collide_tile

    def identity(f, gx, gy, *, tau, tau2, forcing, storage):
        p57 = f[5] - f[7]
        d68 = f[6] - f[8]
        fsum = f[0] + f[1] + f[2] + f[3] + f[4] + f[5] + f[6] + f[7] + f[8]
        rho = 1.0 + fsum if storage == "deviatoric" else fsum
        mom_x = (f[1] - f[3]) + p57 - d68
        return list(f), rho, mom_x

    pallas_step._collide_tile = identity
    try:
        ident = run(MucociliarySim(cfg, backend="pallas", temporal=16))
    finally:
        pallas_step._collide_tile = orig
    ps_full = 1e6 / full
    ps_id = 1e6 / ident
    print(f"identity-collide A/B: full {full:.0f} MLUPS "
          f"({ps_full:.1f} ps/site), identity {ident:.0f} MLUPS "
          f"({ps_id:.1f} ps/site) -> collide {ps_full - ps_id:.1f} "
          f"ps/site, movement+glue {ps_id:.1f} ps/site", flush=True)
    return {"full_mlups": round(full, 1), "identity_mlups": round(ident, 1),
            "collide_ps_per_site": round(ps_full - ps_id, 2),
            "movement_ps_per_site": round(ps_id, 2)}


def newest_bench_mlups():
    import glob

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    candidates = sorted(glob.glob(os.path.join(repo, "BENCH_r*.json")))
    local = os.path.join(repo, "validation", "bench_local.json")
    if os.path.exists(local):
        candidates.append(local)
    for path in reversed(candidates):
        try:
            with open(path) as fh:
                record = json.load(fh)
            if "value" not in record:
                lines = [ln for ln in record.get("tail", "").splitlines()
                         if ln.startswith('{"metric"')]
                record = json.loads(lines[-1]) if lines else {}
            v = float(record.get("value", 0.0))
            if v > 0:
                return v, os.path.basename(path)
        except (OSError, ValueError):
            continue
    return None, None


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    mixes = {
        "fma": round(bench_slope("fma chain", mk_fma), 3),
        "add": round(bench_slope("add chain", mk_add), 3),
        "mul": round(bench_slope("mul chain", mk_mul), 3),
    }
    # two distinct ceilings fall out: the FLOP ceiling for an FMA-shaped
    # mix (each chain op = 2 flops but issues as one multiply-add) and
    # the ISSUE ceiling for simple ops (1 flop each) — on this chip the
    # simple-op issue rate is ~2.5x the FMA issue rate, so which ceiling
    # binds depends on how much of a kernel's tree Mosaic can fuse to
    # multiply-adds.
    fma_ceiling = mixes["fma"]
    issue_ceiling = max(mixes["add"], mixes["mul"])

    n_bulk, n_band = collide_flops()
    mlups, src = newest_bench_mlups()
    out = {
        "device": str(jax.devices()[0]),
        "method": f"slope between {R1} and {R2} chain ops, "
                  f"block ({Y},{X}) tiled ({GY},{X}), {ITERS}-call loops",
        "tflops_by_mix": mixes,
        "vpu_f32_fma_ceiling_tflops": fma_ceiling,
        "vpu_f32_issue_ceiling_tops": issue_ceiling,
        "collide_flops_per_site_bulk": n_bulk,
        "collide_flops_per_site_forced": n_band,
    }
    if mlups:
        # the K=16 mode runs ~(K-1)/K of sub-steps through the zero-force
        # bulk tree and ~1/K through the forced band tree, but the band is
        # also only force_band/ydim of the rows; bulk flops dominate.
        useful = mlups * 1e6 * n_bulk / 1e12
        out["bench_mlups"] = mlups
        out["bench_source"] = src
        out["useful_tflops_at_bench"] = round(useful, 3)
        out["mfu_vs_fma_ceiling"] = round(useful / fma_ceiling, 3)
        print(f"counted collide flops/site: bulk {n_bulk}, forced {n_band}")
        print(f"bench {mlups:.0f} MLUPS ({src}) -> useful "
              f"{useful:.2f} TFLOP/s = {useful / fma_ceiling:.1%} of the "
              f"{fma_ceiling:.2f} TFLOP/s FMA-chain ceiling "
              f"({useful / issue_ceiling:.1%} of the {issue_ceiling:.2f} "
              f"T-op/s simple-op issue ceiling)", flush=True)

    if jax.default_backend() == "tpu":
        out["identity_ab"] = identity_collide_decomposition()
        ab = out["identity_ab"]
        eff = n_bulk / ab["collide_ps_per_site"] / 1e0  # flops per ps = TF
        out["collide_effective_tflops"] = round(eff, 2)
        print(f"collide effective rate: {n_bulk} flops / "
              f"{ab['collide_ps_per_site']} ps = {eff:.2f} TFLOP/s "
              f"({eff / fma_ceiling:.2f}x the serial FMA-chain ceiling: "
              f"ILP + multiply-add fusion)", flush=True)
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
