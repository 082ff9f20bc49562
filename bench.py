"""Headline benchmark: MLUPS/chip on a 2048^2 D2Q9+IB step (full model:
fused Pallas collide+stream + IB cilia coupling + cumulative flux).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "MLUPS", "vs_baseline": N}

vs_baseline is against the reference's derived throughput of ~0.62 MLUPS
(SimLog_nom.txt: 100k iterations on 300x200 in 9,636 s — BASELINE.md).
Diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

REFERENCE_MLUPS = 0.62


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from cuda_iblb_11_tpu.core.config import SimConfig
    from cuda_iblb_11_tpu.models.mucociliary import MucociliarySim

    backend_kind = jax.default_backend()
    log(f"backend: {backend_kind}, devices: {jax.devices()}")

    # 2048^2 grid with a cilia array (c_num*c_space = XDIM).
    cfg = SimConfig(c_num=16, c_space=128, ydim=2048, dtype="float32")
    sim_backend = "pallas" if backend_kind == "tpu" else "jnp"
    steps = 500 if backend_kind == "tpu" else 3

    try:
        sim = MucociliarySim(cfg, backend=sim_backend)
        state = sim.init_state()
        # warm up with the SAME step count (n_steps is a static arg: a
        # different count would compile a second executable inside the
        # timed region)
        state = sim.run_chunk(state, steps)
        _ = float(state.q)  # value fetch: the only reliable device sync here

        t0 = time.perf_counter()
        state = sim.run_chunk(state, steps)
        _ = float(state.q)
        dt = time.perf_counter() - t0

        mlups = cfg.size * steps / dt / 1e6
        log(f"{steps} steps in {dt:.3f}s  q={float(state.q):.3e}  "
            f"rho-finite={bool(jnp.isfinite(state.f).all())}")

        # secondary metric: bf16 deviatoric fast mode (stderr only)
        if sim_backend == "pallas":
            try:
                simb = MucociliarySim(cfg.replace(dtype="bfloat16"),
                                      backend="pallas")
                stb = simb.run_chunk(simb.init_state(), steps)
                _ = float(stb.q)
                t0 = time.perf_counter()
                stb = simb.run_chunk(stb, steps)
                _ = float(stb.q)
                dtb = time.perf_counter() - t0
                log(f"secondary: bf16 fast mode "
                    f"{cfg.size * steps / dtb / 1e6:.0f} MLUPS "
                    f"(velocity ~1-3% noise; flux <1%)")
            except Exception as e:  # noqa: BLE001
                log(f"bf16 secondary failed: {e!r}")
        print(json.dumps({
            "metric": "MLUPS/chip, 2048x2048 D2Q9 TRT + IB cilia (full step)",
            "value": round(mlups, 1),
            "unit": "MLUPS",
            "vs_baseline": round(mlups / REFERENCE_MLUPS, 1),
        }))
    except Exception as e:  # noqa: BLE001 — always emit the JSON line
        log(f"benchmark failed: {e!r}")
        print(json.dumps({
            "metric": "MLUPS/chip, 2048x2048 D2Q9 TRT + IB cilia (full step)",
            "value": 0.0,
            "unit": "MLUPS",
            "vs_baseline": 0.0,
        }))
        raise


if __name__ == "__main__":
    main()
