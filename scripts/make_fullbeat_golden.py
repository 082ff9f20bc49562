"""Produce the full-beat f64 golden for the CI accuracy gate.

Runs the f64 CPU oracle (jnp backend, raw storage) over the reference's
complete 100,000-step beat period (main.cu:300: ITERATIONS = T*I_pow at
the default T=1e5, I_pow=1) on the minimum legal grid (192^2, 4 cilia)
and saves the final corrected velocity field and cumulative flux to
validation/fullbeat_f64_192sq.npz.  tests/test_accuracy_horizon.py's
slow-marked gate re-runs the f32 production mode against this golden
and enforces the <1% full-beat flux error (VERDICT r3 item 1).

Run:  python scripts/make_fullbeat_golden.py            (~30 min CPU)
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cuda_iblb_11_tpu.core.config import SimConfig  # noqa: E402
from cuda_iblb_11_tpu.models.mucociliary import MucociliarySim  # noqa: E402
from cuda_iblb_11_tpu.ops import ib_band  # noqa: E402
from cuda_iblb_11_tpu.ops import reference as ref  # noqa: E402

OUT = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..",
                    "validation", "fullbeat_f64_192sq.npz")
STEPS = 100_000


def main():
    cfg = SimConfig(c_num=4, c_space=48, dtype="float64", storage="raw")
    sim = MucociliarySim(cfg, backend="jnp")
    st = sim.init_state()
    t0 = time.time()
    done = 0
    while done < STEPS:
        n = min(10_000, STEPS - done)
        st = sim.run_chunk(st, n)
        st.q.block_until_ready()
        done += n
        print(f"{done}/{STEPS} steps ({time.time() - t0:.0f}s)", flush=True)
    force = ib_band.pad_band(st.force, cfg.ydim)
    _, u = ref.corrected_velocity(st.f, force, sim.storage)
    np.savez_compressed(
        OUT, u=np.asarray(u, np.float64), q=float(st.q), steps=STEPS,
        xdim=cfg.xdim, ydim=cfg.ydim, c_num=cfg.c_num, c_space=cfg.c_space)
    print(f"wrote {OUT}: q={float(st.q):.9e}, "
          f"|u|_2={float(jnp.linalg.norm(u)):.9e}")


if __name__ == "__main__":
    main()
