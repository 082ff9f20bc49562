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
