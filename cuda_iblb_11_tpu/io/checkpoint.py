"""Checkpoint/resume (new capability — the reference restarts from scratch
after a crash; SURVEY.md §5).

The full restartable state is (f, force, lasts, q, it) plus the config needed
to validate compatibility.  Stored as a single .npz; cheap at any grid size
the single-host path handles.  For multi-host sharded runs use
orbax-checkpoint on the same pytree (the state is a NamedTuple of arrays).
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from cuda_iblb_11_tpu.core.config import SimConfig
from cuda_iblb_11_tpu.core.state import FlowState


def save(path: str, state: FlowState, cfg: SimConfig) -> None:
    np.savez_compressed(
        path,
        f=np.asarray(state.f),
        force=np.asarray(state.force),
        lasts=np.asarray(state.lasts),
        q=np.asarray(state.q),
        it=np.asarray(state.it),
        config=json.dumps(dataclasses.asdict(cfg)),
    )


# Fields that determine state compatibility; run-length / output knobs
# (i_pow, p_num, bigdata, sharc) may differ between save and resume.
_STATE_FIELDS = ("c_fraction", "c_num", "c_space", "re", "t_num", "t_pow",
                 "length", "ydim", "dtype", "storage")


def load(path: str, cfg: SimConfig | None = None) -> tuple[FlowState, SimConfig]:
    with np.load(path, allow_pickle=False) as z:
        saved_cfg = SimConfig(**json.loads(str(z["config"])))
        if cfg is not None:
            bad = [f for f in _STATE_FIELDS
                   if getattr(cfg, f) != getattr(saved_cfg, f)]
            if bad:
                raise ValueError(
                    f"checkpoint incompatible in fields {bad}:\n"
                    f" saved: {saved_cfg}\n asked: {cfg}")
        state = FlowState(
            f=jnp.asarray(z["f"]),
            force=jnp.asarray(z["force"]),
            lasts=jnp.asarray(z["lasts"]),
            q=jnp.asarray(z["q"]),
            it=jnp.asarray(z["it"]),
        )
    return state, saved_cfg
