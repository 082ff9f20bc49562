"""Gates on the committed VPU roofline / MFU closure (VERDICT r4 item 5).

validation/vpu_roofline.json is written on the TPU host by
scripts/probe_vpu.py; this file keeps its claims from rotting: the
flops/site counts are RE-DERIVED here (the jaxpr walk runs on CPU), so a
collide-tree change that invalidates the committed MFU number fails CI
until the probe is re-run.
"""

import json
import os
import sys

import jax.numpy as jnp

JSON = os.path.join(os.path.dirname(__file__), "..", "validation",
                    "vpu_roofline.json")
SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def _json():
    with open(JSON) as fh:
        return json.load(fh)


def _probe_module():
    sys.path.insert(0, SCRIPTS)
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "probe_vpu", os.path.join(SCRIPTS, "probe_vpu.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.pop(0)


def test_committed_ceilings_sane():
    j = _json()
    assert j["vpu_f32_fma_ceiling_tflops"] > 1.0
    assert j["vpu_f32_issue_ceiling_tops"] >= j["vpu_f32_fma_ceiling_tflops"]
    assert set(j["tflops_by_mix"]) == {"fma", "add", "mul"}


def test_flops_per_site_match_live_recount():
    """The committed counts must equal a recount of the CURRENT collide
    tree — the MFU number is meaningless if the tree changed since the
    probe ran."""
    j = _json()
    mod = _probe_module()
    n_bulk, n_forced = mod.collide_flops()
    assert n_bulk == j["collide_flops_per_site_bulk"], (
        f"collide tree changed: bulk flops/site now {n_bulk}, committed "
        f"{j['collide_flops_per_site_bulk']} — re-run scripts/probe_vpu.py "
        f"on the TPU host")
    assert n_forced == j["collide_flops_per_site_forced"]


def test_mfu_closure_is_self_consistent():
    """useful TFLOP/s and MFU must follow from the committed bench MLUPS
    and flop count; the identity A/B must decompose the full budget."""
    j = _json()
    useful = j["bench_mlups"] * 1e6 * j["collide_flops_per_site_bulk"] / 1e12
    assert abs(useful - j["useful_tflops_at_bench"]) < 0.01
    assert abs(j["mfu_vs_fma_ceiling"]
               - useful / j["vpu_f32_fma_ceiling_tflops"]) < 0.01
    ab = j["identity_ab"]
    full_ps = 1e6 / ab["full_mlups"]
    ident_ps = 1e6 / ab["identity_mlups"]
    assert abs((full_ps - ident_ps) - ab["collide_ps_per_site"]) < 0.5
    # the closure claim: collide arithmetic at or above the chain ceiling
    assert j["collide_effective_tflops"] >= j["vpu_f32_fma_ceiling_tflops"]


def test_bench_mlups_matches_newest_record():
    """The MFU was computed against the newest bench record at probe time;
    if a newer record lands far from it, the roofline needs a re-run."""
    mod = _probe_module()
    mlups, _src = mod.newest_bench_mlups()
    j = _json()
    assert abs(mlups - j["bench_mlups"]) / j["bench_mlups"] < 0.15, (
        f"newest bench {mlups} vs roofline's {j['bench_mlups']} — re-run "
        f"scripts/probe_vpu.py")


def test_collide_counter_sees_arithmetic():
    """Sanity on the counter itself: a known expression counts exactly."""
    mod = _probe_module()

    def f(a, b):
        return a * b + a - b / a

    n = mod.count_flops_per_elem(f, jnp.zeros((1, 1)) + 1.0,
                                 jnp.zeros((1, 1)) + 2.0)
    assert n == 4
