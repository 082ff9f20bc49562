"""--mesh auto (VERDICT r4 item 7): pick the largest eligible (n_y, n_x)
factorization of the visible devices — a POLICY mirroring --temporal auto's
contract (pick + reason recorded in SimLog) — the scale-out analogue of the
reference's per-cluster launch scripts hardcoding a geometry per machine
(cilia6.sh:7-17).  Runs on the 8-virtual-device CPU mesh (conftest)."""

import os

import jax
import pytest

from cuda_iblb_11_tpu.core.config import SimConfig
from cuda_iblb_11_tpu.runner import _make_sim, _resolve_auto_mesh, run

needs_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")

# 192x192 grid: every factorization of 8 divides it, none is
# pallas-eligible (xl % 128).  1024-wide with ydim=256: (2,4) qualifies.
CFG_SMALL = SimConfig(c_num=4, c_space=48, t_num=1.0, t_pow=5,
                      dtype="float32")
CFG_WIDE = SimConfig(c_num=8, c_space=128, ydim=256, t_num=1.0, t_pow=5,
                     dtype="float32")


@needs_8_devices
def test_auto_prefers_balanced_pallas_eligible():
    mesh, reason = _resolve_auto_mesh(CFG_WIDE, backend="pallas")
    assert mesh in ("2,4", "4,2"), mesh
    assert "pallas-eligible" in reason
    # balanced beats skewed: (2,4)/(4,2) over (1,8)/(8,1); x-major tie-break
    assert mesh == "2,4"


@needs_8_devices
def test_auto_falls_back_to_jnp_when_no_pallas_shape_fits():
    mesh, reason = _resolve_auto_mesh(CFG_SMALL, backend="pallas")
    assert mesh == "2,4"
    assert "no pallas-eligible factorization" in reason


@needs_8_devices
def test_auto_jnp_backend_picks_balanced():
    mesh, reason = _resolve_auto_mesh(CFG_SMALL, backend="jnp")
    assert mesh == "2,4"
    assert "jnp sharded path" in reason


@needs_8_devices
def test_auto_sim_carries_pick_and_reason():
    sim = _make_sim(CFG_SMALL, backend="jnp", forcing="trt_split",
                    temporal=1, mesh="auto")
    assert sim.mesh_requested == "auto"
    assert sim.mesh_resolved == "2,4"
    assert sim.resolved_config()["mesh"] == [2, 4]
    assert "auto:" in sim.mesh_reason


@needs_8_devices
def test_runner_mesh_auto_records_pick_in_simlog(tmp_path):
    cfg = CFG_SMALL.replace(i_pow=0.0004, p_num=1)  # 40 steps
    out = run(cfg, output_root=str(tmp_path), quiet=True, backend="jnp",
              mesh="auto")
    assert out["resolved"]["mesh"] == [2, 4]
    log = open(os.path.join(str(tmp_path), "Raw", "4", "1",
                            "SimLog.txt")).read()
    assert "Mesh: 2,4 (auto:" in log


def test_auto_unsharded_when_nothing_divides():
    # prime ydim forces ny=1; odd xdim (3*49) rejects every nx>1 of 8
    cfg = SimConfig(c_num=3, c_space=49, ydim=191, t_num=1.0, t_pow=5,
                    dtype="float32")
    if len(jax.devices()) == 1:
        pytest.skip("needs >1 devices")
    mesh, reason = _resolve_auto_mesh(cfg, backend="jnp")
    assert mesh is None
    assert "unsharded" in reason
