"""End-to-end runner: artifacts, checkpoint/resume equivalence."""

import os

import numpy as np

from cuda_iblb_11_tpu.core.config import SimConfig
from cuda_iblb_11_tpu.runner import run

CFG = SimConfig(c_num=4, c_space=48, t_num=1.0, t_pow=5, i_pow=0.004,
                p_num=4, bigdata=True, dtype="float32")
# ITERATIONS = 400, INTERVAL = 100


def test_runner_artifacts(tmp_path):
    out = run(CFG, output_root=str(tmp_path), quiet=True)
    assert out["iterations"] == 400
    flux = np.loadtxt(out["flux_path"])
    assert flux.shape == (5, 2)  # samples at it=0,100,200,300 + final row
    assert np.all(np.diff(flux[:, 0]) > 0)
    # snapshots written at each interval
    raw = os.path.join(str(tmp_path), "Raw", "4", "1")
    assert os.path.exists(os.path.join(raw, "0-fluid.dat"))
    assert os.path.exists(os.path.join(raw, "300-fluid.dat"))
    assert os.path.exists(os.path.join(raw, "SimLog.txt"))
    cilia = os.path.join(str(tmp_path), "Cilia", "4", "1")
    assert os.path.exists(os.path.join(cilia, "300-cilia.dat"))
    log = open(os.path.join(raw, "SimLog.txt")).read()
    assert "Size: 192x192" in log
    assert "Completion time:" in log
    assert "Total runtime:" in log


def test_checkpoint_resume_equivalence(tmp_path):
    # Straight 400-step run vs 200 steps + resume-from-checkpoint.
    a = run(CFG, output_root=str(tmp_path / "a"), quiet=True)

    cfg_half = CFG.replace(i_pow=0.002)  # 200 iterations
    run(cfg_half, output_root=str(tmp_path / "b"), quiet=True,
        checkpoint_every=200)
    ck = os.path.join(str(tmp_path / "b"), "Raw", "4", "1", "checkpoint.npz")
    assert os.path.exists(ck)
    b = run(CFG, output_root=str(tmp_path / "b2"), quiet=True,
            resume_from=ck)
    assert b["iterations"] == 400
    np.testing.assert_allclose(a["q_final"], b["q_final"], rtol=1e-6)


def test_resume_preserves_flux_series_and_simlog(tmp_path):
    # Resuming INTO the same output root must keep the flux rows written
    # before the checkpoint and append to SimLog (ADVICE round 1: run()
    # used to truncate both).
    a = run(CFG, output_root=str(tmp_path / "a"), quiet=True)
    flux_a = np.loadtxt(a["flux_path"])

    # Emulate an interrupted run: same interval (100) but stop at it=200.
    cfg_half = CFG.replace(i_pow=0.002, p_num=2)
    run(cfg_half, output_root=str(tmp_path / "b"), quiet=True,
        checkpoint_every=200)
    ck = os.path.join(str(tmp_path / "b"), "Raw", "4", "1", "checkpoint.npz")
    b = run(CFG, output_root=str(tmp_path / "b"), quiet=True,
            resume_from=ck)
    flux_b = np.loadtxt(b["flux_path"])
    assert flux_b.shape == flux_a.shape  # rows 0..200 preserved, rest appended
    np.testing.assert_allclose(flux_b, flux_a, rtol=1e-5, atol=1e-12)
    log = open(os.path.join(str(tmp_path / "b"), "Raw", "4", "1",
                            "SimLog.txt")).read()
    assert "Size: 192x192" in log          # original header survived
    assert "Resumed from checkpoint" in log


def test_profile_dir_writes_trace(tmp_path):
    # --profile-dir captures a jax.profiler trace of the first interval
    # (the reference's only tracing was a wall-clock timer, seconds.cpp).
    prof = tmp_path / "trace"
    cfg = CFG.replace(i_pow=0.001, p_num=1, bigdata=False)  # 100 steps
    run(cfg, output_root=str(tmp_path / "out"), quiet=True,
        profile_dir=str(prof))
    found = list(prof.rglob("*.xplane.pb")) + list(prof.rglob("*.trace*"))
    assert found, f"no profiler artifacts under {prof}"


def test_checkpoint_cadence_not_interval_aligned(tmp_path):
    # checkpoint_every=250 with interval=100: the old `it % every == 0`
    # test never fired; the steps-since-last-save rule saves at it=300.
    import cuda_iblb_11_tpu.io.checkpoint as ckpt

    run(CFG, output_root=str(tmp_path), quiet=True, checkpoint_every=250)
    ck = os.path.join(str(tmp_path), "Raw", "4", "1", "checkpoint.npz")
    assert os.path.exists(ck)
    state, _ = ckpt.load(ck, CFG)
    assert int(state.it) == 300


def test_resume_flux_rows_interval_change(tmp_path):
    # Rows are preserved by TIME stamp: resuming with a different output
    # interval (allowed — p_num/i_pow are not state fields) must keep all
    # rows up to the checkpoint, not it0 // new_interval of them.
    from cuda_iblb_11_tpu.io.writers import FluxWriter
    from cuda_iblb_11_tpu.runner import _resume_flux_rows

    cfg = SimConfig(c_num=4, c_space=48)
    path = str(tmp_path / "flux.dat")
    w = FluxWriter(path, cfg)
    for it in range(0, 501, 10):  # saved run's interval = 10
        w.append(it, it * 0.5)

    # resume at it0=500 with interval 20: 500 is a boundary -> the loop
    # rewrites its row; all 50 earlier rows survive
    assert _resume_flux_rows(path, cfg, 500, 20) == 50
    # resume at it0=505 (not a boundary of interval 20): the row at 500
    # is kept as well, and the run appends from the next boundary
    assert _resume_flux_rows(path, cfg, 505, 20) == 51
    # rows written past the checkpoint by the interrupted run are dropped
    assert _resume_flux_rows(path, cfg, 300, 20) == 30
    # missing file: nothing to keep
    assert _resume_flux_rows(str(tmp_path / "none.dat"), cfg, 500, 20) == 0


def test_npz_checkpoint_save_is_atomic(tmp_path):
    # A save over an existing checkpoint must go through a temp file +
    # os.replace, leaving no .tmp behind and a loadable archive.
    import jax.numpy as jnp

    import cuda_iblb_11_tpu.io.checkpoint as ckpt
    from cuda_iblb_11_tpu.core.state import FlowState

    cfg = SimConfig(c_num=4, c_space=48)
    st = FlowState(
        f=jnp.zeros((9, cfg.ydim, cfg.xdim), jnp.float32),
        force=jnp.zeros((2, cfg.force_band, cfg.xdim), jnp.float32),
        lasts=jnp.zeros((cfg.c_num, cfg.length, 2), jnp.float32),
        q=jnp.zeros(()), it=jnp.asarray(7))
    path = str(tmp_path / "checkpoint.npz")
    ckpt.save(path, st, cfg)
    ckpt.save(path, st._replace(it=jnp.asarray(9)), cfg)  # overwrite
    assert not os.path.exists(path + ".tmp")
    st2, _ = ckpt.load(path, cfg)
    assert int(st2.it) == 9


def test_make_sim_warns_on_temporal_fallback(capsys):
    # an ineligible --temporal mesh run must say so, not silently downgrade
    import jax
    import pytest

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    from cuda_iblb_11_tpu.parallel.sharded import (
        ShardedMucociliarySim, ShardedPallasSim, ShardedTemporalSim,
    )
    from cuda_iblb_11_tpu.runner import _make_sim

    # ydim=192 under (2,1) is ELIGIBLE since round 3 (the band may span
    # shard boundaries) — no downgrade, no warning
    cfg = SimConfig(c_num=3, c_space=128, ydim=192)
    sim = _make_sim(cfg, "pallas", "trt_split", 4, "2,1")
    assert isinstance(sim, ShardedTemporalSim)
    assert capsys.readouterr().err == ""

    # K above the 16-row ghost-pad budget -> genuinely ineligible ->
    # per-step pallas + warning
    sim = _make_sim(cfg, "pallas", "trt_split", 32, "2,1")
    assert type(sim) is ShardedPallasSim
    assert "falling back to the per-step sharded kernel" in (
        capsys.readouterr().err)

    # jnp sharded backend cannot honor temporal at all -> warning
    sim = _make_sim(cfg, "jnp", "trt_split", 4, "2,1")
    assert type(sim) is ShardedMucociliarySim
    assert "temporal ignored" in capsys.readouterr().err


def test_sharc_device_selection(tmp_path):
    # ShARC flag = reference's cudaSetDevice(3) (main.cu:395-396): the
    # single-device run pins to device index 3 when one exists (the CPU
    # test backend exposes 8 virtual devices) and records it in SimLog.
    import jax

    from cuda_iblb_11_tpu.runner import _select_device

    cfg = CFG.replace(sharc=True, bigdata=False, i_pow=0.0005, p_num=1)
    assert _select_device(cfg) == jax.devices()[3]
    assert _select_device(cfg.replace(sharc=False)) is None
    assert _select_device(cfg, mesh="2,4") is None  # mesh spans devices

    run(cfg, output_root=str(tmp_path), quiet=True)
    log = open(os.path.join(str(tmp_path), "Raw", "4", "1",
                            "SimLog.txt")).read()
    assert str(jax.devices()[3]) in log


def test_simlog_records_resolved_config(tmp_path):
    # VERDICT r3: SimLog must record the RESOLVED execution configuration
    # (actual backend + kernel path after every auto/fallback decision),
    # not just the requested one — the analogue of the reference logging
    # its real launch config (main.cu:782-783).  On CPU, backend=auto
    # falls back to the jnp oracle; the log must say so and why.
    cfg = CFG.replace(i_pow=0.0001, p_num=1, bigdata=False)  # 10 steps
    out = run(cfg, output_root=str(tmp_path), backend="auto", quiet=True)
    log = open(os.path.join(str(tmp_path), "Raw", "4", "1",
                            "SimLog.txt")).read()
    assert "Backend: auto" in log                  # requested
    assert "Resolved backend: jnp" in log          # actual
    assert "platform is cpu, not tpu" in log       # why
    assert "Kernel path: jnp" in log
    assert "Storage: " in log
    assert "Temporal K: 1" in log
    assert out["resolved"]["backend"] == "jnp"
    assert out["resolved"]["band_leg"] == "jnp"


def test_auto_reason_names_reference_default_lane_misalignment():
    # The reference's own default invocation (main.cu:267-296 defaults:
    # c_num=6, c_space=48 -> XDIM=288) fails the fused kernel's 128-lane
    # constraint; the resolved config must name that, so `backend=auto`
    # users know which path the reference's own arguments take.
    from cuda_iblb_11_tpu.models.mucociliary import MucociliarySim

    cfg = SimConfig(c_num=6, c_space=48, dtype="float32")
    sim = MucociliarySim(cfg, backend="auto")
    rc = sim.resolved_config()
    assert rc["backend"] == "jnp"
    assert "xdim=288 is not a multiple of 128" in rc["backend_reason"]


def test_sharded_temporal_fallback_resolves_per_step(tmp_path, capsys):
    # --temporal K ineligible for the K-step sharded path (K > 16 is
    # rejected by the ghost kernel) must fall back to the per-step
    # sharded kernel AND say so in the resolved config.
    from cuda_iblb_11_tpu.runner import _make_sim

    cfg = CFG.replace(c_space=64)  # XDIM=256 -> xl=128 on a (2,2) mesh
    sim = _make_sim(cfg, "pallas", "trt_split", 64, "2,2")
    rc = sim.resolved_config()
    assert rc["band_leg"] == "sharded_per_step"
    assert rc["temporal"] == 1
    assert rc["mesh"] == [2, 2]


def test_resume_notes_temporal_k_switch(tmp_path):
    # Resuming under a different resolved temporal K switches kernel path
    # mid-run (not bit-identical across K); the SimLog must say so
    # (ADVICE r4: --temporal auto makes the switch easy to land silently).
    cfg_half = CFG.replace(i_pow=0.002, p_num=2)
    run(cfg_half, output_root=str(tmp_path / "b"), quiet=True,
        checkpoint_every=200)
    root = os.path.join(str(tmp_path / "b"), "Raw", "4", "1")
    ck = os.path.join(root, "checkpoint.npz")
    # emulate an original run that resolved to K=16 (the jnp CI backend
    # always resolves to 1, so the original line is planted)
    simlog = os.path.join(root, "SimLog.txt")
    with open(simlog, "a") as fh:
        fh.write("Temporal K: 16 (auto: K=16 (largest eligible))\n")
    run(CFG, output_root=str(tmp_path / "b"), quiet=True, resume_from=ck)
    log = open(simlog).read()
    assert "resumed with temporal K=1 (original run: K=16)" in log

    # same-K resume stays quiet
    run(cfg_half, output_root=str(tmp_path / "c"), quiet=True,
        checkpoint_every=200)
    ck2 = os.path.join(str(tmp_path / "c"), "Raw", "4", "1",
                       "checkpoint.npz")
    run(CFG, output_root=str(tmp_path / "c"), quiet=True, resume_from=ck2)
    log2 = open(os.path.join(str(tmp_path / "c"), "Raw", "4", "1",
                             "SimLog.txt")).read()
    assert "resumed with temporal" not in log2


def test_last_simlog_temporal_k_parsing(tmp_path):
    from cuda_iblb_11_tpu.runner import _last_simlog_temporal_k
    p = str(tmp_path / "SimLog.txt")
    assert _last_simlog_temporal_k(p) is None  # missing file
    with open(p, "w") as fh:
        fh.write("Size: 192x192\nTemporal K: 4\n")
        fh.write("Resumed from checkpoint at iteration 200\n")
        fh.write("Temporal K: 16 (auto: K=16 (largest eligible))\n")
    assert _last_simlog_temporal_k(p) == 16  # last line wins
